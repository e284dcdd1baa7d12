"""Native C++ runtime: parity with the pure-Python implementations."""

import numpy as np
import pytest

from ppgs_tpu import native
from ppgs_tpu.data import audio as audio_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native library unavailable')


@pytest.fixture
def wavs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, samples in enumerate([16000, 8000, 24000]):
        audio = rng.uniform(-0.8, 0.8, (1, samples)).astype(np.float32)
        path = tmp_path / f'{i}.wav'
        audio_io.save_wav(path, audio, 16000)
        paths.append(path)
    return paths


def test_wav_info(wavs):
    n, rate = native.wav_info(wavs[0])
    assert (n, rate) == (16000, 16000)
    n, rate = native.wav_info(wavs[1])
    assert (n, rate) == (8000, 16000)


def test_wav_read_matches_python(wavs):
    for path in wavs:
        ours, rate = native.wav_read(path)
        ref, ref_rate = audio_io.load_wav(path)
        assert rate == ref_rate
        np.testing.assert_allclose(ours, ref[0], atol=0)


def test_wav_read_batch(wavs):
    arena, lengths, rates = native.wav_read_batch(wavs, 24000, 2)
    assert arena.shape == (3, 24000)
    assert lengths.tolist() == [16000, 8000, 24000]
    assert set(rates.tolist()) == {16000}
    # Padding stays zero
    assert arena[1, 8000:].sum() == 0
    ref, _ = audio_io.load_wav(wavs[0])
    np.testing.assert_allclose(arena[0, :16000], ref[0], atol=0)


def test_load_batch_api(wavs):
    arena, lengths = audio_io.load_batch(wavs)
    assert arena.shape == (3, 1, 24000)
    assert lengths.tolist() == [16000, 8000, 24000]


def test_wav_read_invalid(tmp_path):
    bad = tmp_path / 'bad.wav'
    bad.write_bytes(b'not a wav at all')
    assert native.wav_read(bad) is None
    assert native.wav_info(bad) is None


def test_framewise_indices_matches_python():
    ends = np.array([0.1, 0.2, 0.35])
    labels = np.array([5, 7, 9])
    times = np.array([0.05, 0.1, 0.15, 0.3, 0.4])
    out = native.framewise_indices(ends, labels, times)
    # Boundary frames belong to the following phoneme; clamp at the end
    assert out.tolist() == [5, 7, 7, 9, 9]

    # Cross-check against the textgrid implementation
    from ppgs_tpu.data import textgrid

    phones = [textgrid.Phoneme('a', 0.0, 0.1),
              textgrid.Phoneme('b', 0.1, 0.2),
              textgrid.Phoneme('c', 0.2, 0.35)]
    alignment = textgrid.Alignment([textgrid.Word('w', phones)])
    ref = alignment.framewise_phoneme_indices(
        {'a': 5, 'b': 7, 'c': 9}, 0.01, times)
    np.testing.assert_array_equal(out, ref)
