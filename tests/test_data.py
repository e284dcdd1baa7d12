"""Data pipeline tests: audio I/O, TextGrid parsing, dataset/sampler/collate."""

import json

import numpy as np
import pytest

import ppgs_tpu
from ppgs_tpu.data import audio as audio_io
from ppgs_tpu.data import textgrid
from ppgs_tpu.data.collate import Collate, quantize
from ppgs_tpu.data.sampler import Sampler


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-0.5, 0.5, size=(1, 16000))).astype(np.float32)
    path = tmp_path / 'test.wav'
    audio_io.save_wav(path, audio, 16000)
    loaded = audio_io.load(path)
    assert loaded.shape == (1, 16000)
    np.testing.assert_allclose(loaded, audio, atol=1e-4)
    assert audio_io.info_num_samples(path) == 16000


def test_resample():
    rng = np.random.default_rng(1)
    t = np.arange(22050 * 2) / 22050
    audio = np.sin(2 * np.pi * 440 * t)[None].astype(np.float32)
    out = audio_io.resample(audio, 22050, 16000)
    assert out.shape[-1] == 32000
    # Tone preserved: correlation with ideal resampled tone
    t16 = np.arange(32000) / 16000
    ideal = np.sin(2 * np.pi * 440 * t16)
    corr = np.corrcoef(out[0][1000:-1000], ideal[1000:-1000])[0, 1]
    assert corr > 0.99


def make_textgrid(path, phones, words=None):
    """phones: list of (label, start, end)."""
    ph = [textgrid.Phoneme(l, s, e) for l, s, e in phones]
    if words is None:
        words = [textgrid.Word('w', ph)]
    alignment = textgrid.Alignment(words)
    alignment.save(path)
    return alignment


def test_textgrid_roundtrip(tmp_path):
    path = tmp_path / 'a.TextGrid'
    make_textgrid(path, [('hh', 0.0, 0.1), ('ax', 0.1, 0.3),
                         ('l', 0.3, 0.45)])
    parsed = textgrid.Alignment(path)
    phones = list(parsed.phonemes())
    assert [str(p) for p in phones] == ['hh', 'ax', 'l']
    assert phones[1].start == pytest.approx(0.1)
    assert parsed.duration() == pytest.approx(0.45)


def test_framewise_phoneme_indices(tmp_path):
    path = tmp_path / 'b.TextGrid'
    make_textgrid(path, [('aa', 0.0, 0.1), ('iy', 0.1, 0.2)])
    parsed = textgrid.Alignment(path)
    mapping = ppgs_tpu.PHONEME_TO_INDEX_MAPPING
    hop = 160 / 16000
    times = np.array([0.005, 0.055, 0.105, 0.195])
    idx = parsed.framewise_phoneme_indices(mapping, hop, times)
    assert list(idx) == [mapping['aa'], mapping['aa'], mapping['iy'],
                         mapping['iy']]


def test_quantize():
    assert quantize(1, 100) == 100
    assert quantize(100, 100) == 100
    assert quantize(101, 100) == 200


def test_collate_shapes():
    collate = Collate(['mel', 'phonemes', 'length'], frame_multiple=50)
    batch = [
        [np.zeros((80, 120), np.float32), np.zeros(120, np.int64), 120],
        [np.zeros((80, 80), np.float32), np.zeros(80, np.int64), 80],
    ]
    feats, phonemes, lengths = collate(batch)
    assert feats.shape == (2, 80, 150)
    assert phonemes.shape == (2, 150)
    assert (phonemes[1, 80:] == -100).all()
    assert lengths.tolist() == [120, 80]


class FakeDataset:
    def __init__(self, lengths):
        self.lengths = lengths
        self.config = ppgs_tpu.Config()

    def __len__(self):
        return len(self.lengths)

    def buckets(self):
        order = np.argsort(self.lengths)
        lengths = np.sort(self.lengths)
        return [np.stack((order, lengths)).T]


def test_sampler_respects_frame_budget():
    lengths = [100, 200, 300, 150, 800, 120, 90, 700]
    dataset = FakeDataset(lengths)
    sampler = Sampler(dataset, max_frames=1000,
                      config=ppgs_tpu.Config())
    batches = sampler.batch()
    covered = sorted(i for batch in batches for i in batch)
    assert covered == list(range(8))
    for batch in batches:
        max_len = max(lengths[i] for i in batch)
        assert len(batch) * max_len <= 1000 or len(batch) == 1


def test_sampler_epoch_determinism():
    dataset = FakeDataset([100] * 20)
    s1 = Sampler(dataset, 1000, ppgs_tpu.Config())
    s2 = Sampler(dataset, 1000, ppgs_tpu.Config())
    s1.set_epoch(3)
    s2.set_epoch(3)
    assert s1.batch() == s2.batch()
    s2.set_epoch(4)
    assert s1.batch() != s2.batch()


def test_dataset_end_to_end(tmp_path, monkeypatch):
    """Synthetic cache dir -> Dataset -> loader -> collated batches."""
    from ppgs_tpu import config as config_mod

    cache = tmp_path / 'cache' / 'tinyset'
    cache.mkdir(parents=True)
    partition_dir = tmp_path / 'partitions'
    partition_dir.mkdir()
    monkeypatch.setattr(config_mod, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(config_mod, 'PARTITION_DIR', partition_dir)

    rng = np.random.default_rng(0)
    stems = []
    for i in range(4):
        stem = f'utt{i:02d}'
        seconds = 0.5 + 0.25 * i
        samples = int(seconds * 16000)
        audio_io.save_wav(cache / f'{stem}.wav',
                          rng.uniform(-0.3, 0.3, (1, samples)).astype(
                              np.float32))
        make_textgrid(cache / f'{stem}.TextGrid',
                      [('aa', 0.0, seconds / 2),
                       ('iy', seconds / 2, seconds)])
        frames = samples // 160
        mel = rng.standard_normal((80, frames)).astype(np.float16)
        np.save(cache / f'{stem}-mel.npy', mel)
        stems.append(stem)

    with open(partition_dir / 'tinyset.json', 'w') as f:
        json.dump({'train': stems[:3], 'valid': stems[3:], 'test': []}, f)

    from ppgs_tpu.data import loader

    ldr = loader('tinyset', 'train', features=['mel', 'phonemes', 'length'],
                 num_workers=0, config=ppgs_tpu.Config())
    batches = list(iter(ldr))
    assert len(batches) >= 1
    total = 0
    for feats, phonemes, lengths in batches:
        assert feats.shape[1] == 80
        assert feats.shape[0] == phonemes.shape[0] == len(lengths)
        assert feats.shape[2] == phonemes.shape[1]
        for i, l in enumerate(lengths):
            assert (phonemes[i, :l] != -100).all()
            assert (phonemes[i, l:] == -100).all()
        total += len(lengths)
    assert total == 3


def test_preprocess_from_files_to_files_batched(tmp_path):
    """Batched frame-budget caching: per-file truncation, fp16, and parity
    with the frontend called on the same collated batch."""
    import jax.numpy as jnp

    from ppgs_tpu import preprocess
    from ppgs_tpu.data.collate import quantize

    rng = np.random.default_rng(0)
    counts = (16000, 8000, 24000)
    files, prefixes = [], []
    for i, s in enumerate(counts):
        wav = tmp_path / f'u{i}.wav'
        audio_io.save_wav(
            wav, (0.1 * rng.standard_normal((1, s))).astype(np.float32))
        files.append(wav)
        prefixes.append(tmp_path / f'u{i}')

    preprocess.from_files_to_files(
        files, prefixes, representations=['mel'], num_workers=2)

    # Reference: the frontend on the equivalent collated batch
    padded = np.zeros((3, 1, quantize(max(counts), 16000)), np.float32)
    for i, s in enumerate(counts):
        padded[i, 0, :s] = np.asarray(
            audio_io.load(files[i], 16000))[0, :s]
    batch_mel = np.asarray(preprocess.get('mel').from_audios(
        jnp.asarray(padded), np.asarray(counts)))

    for i, s in enumerate(counts):
        cached = np.load(tmp_path / f'u{i}-mel.npy')
        frames = s // 160
        assert cached.dtype == np.float16
        assert cached.shape == (80, frames)
        np.testing.assert_allclose(
            cached, batch_mel[i, :, :frames].astype(np.float16),
            atol=2e-3, rtol=2e-3)


def test_preprocess_datasets(tmp_path, monkeypatch):
    """Dataset-wide caching writes {stem}-{representation}.npy to the
    dataset cache dir."""
    from ppgs_tpu import config as config_mod, preprocess

    cache = tmp_path / 'cache' / 'tinyset'
    cache.mkdir(parents=True)
    partition_dir = tmp_path / 'partitions'
    partition_dir.mkdir()
    monkeypatch.setattr(config_mod, 'CACHE_DIR', tmp_path / 'cache')
    monkeypatch.setattr(config_mod, 'PARTITION_DIR', partition_dir)

    rng = np.random.default_rng(1)
    stems = []
    for i in range(3):
        stem = f'utt{i:02d}'
        samples = 8000 + 4000 * i
        audio_io.save_wav(cache / f'{stem}.wav',
                          (0.1 * rng.standard_normal((1, samples))).astype(
                              np.float32))
        stems.append(stem)
    with open(partition_dir / 'tinyset.json', 'w') as f:
        json.dump({'train': stems, 'valid': [], 'test': []}, f)

    preprocess.datasets(['tinyset'], representations=['mel'],
                        partition='train')
    for i, stem in enumerate(stems):
        cached = np.load(cache / f'{stem}-mel.npy')
        assert cached.shape == (80, (8000 + 4000 * i) // 160)


def test_notify_webhook(monkeypatch):
    """notify decorator POSTs completion/failure messages to the env URL
    and never raises on delivery failure."""
    import http.server
    import threading

    from ppgs_tpu.utils import notify

    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            received.append(
                self.rfile.read(int(self.headers['Content-Length'])))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *args):
            pass

    server = http.server.HTTPServer(('127.0.0.1', 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f'http://127.0.0.1:{server.server_port}/'
    monkeypatch.setenv(notify.ENV_VAR, url)

    @notify.notify('job')
    def ok():
        return 42

    @notify.notify('job')
    def bad():
        raise ValueError('boom')

    assert ok() == 42
    with pytest.raises(ValueError):
        bad()
    server.shutdown()
    assert len(received) == 2
    assert b'finished' in received[0] and b'failed' in received[1]

    # Unset env -> silent no-op; unreachable URL -> never raises
    monkeypatch.delenv(notify.ENV_VAR)
    assert notify.send('x') is False
    assert notify.send('x', url='http://127.0.0.1:1/') is False
