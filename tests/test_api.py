"""End-to-end inference API test: torch full pipeline (mel frontend +
transformer) vs ppgs_tpu.from_audio with a converted checkpoint."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import load as load_mod
from ppgs_tpu.data import audio as audio_io


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    """A random torch reference model, converted + saved as npz."""
    import sys
    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    from test_transformer_parity import TorchTransformer
    from ppgs_tpu.convert import transformer_params_from_state_dict

    torch.manual_seed(42)
    tm = TorchTransformer(layers=5, hidden=256, inp=80, out=40).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = transformer_params_from_state_dict(sd, num_layers=5)
    path = tmp_path_factory.mktemp('ckpt') / 'random.npz'
    load_mod.save_params(path, params)
    return tm, path


def torch_full_pipeline(tm, audio_np):
    """Reference from_audio: mel frontend + transformer + softmax."""
    import sys
    from test_stft import torch_reference_mel

    mel = torch.from_numpy(torch_reference_mel(audio_np)).float()
    lengths = torch.tensor([mel.shape[-1]])
    with torch.no_grad():
        # short input: no chunking in reference either (< 500 frames)
        logits = tm(mel, lengths)
        return torch.softmax(logits, dim=1).numpy()


def test_from_audio_matches_torch_pipeline(checkpoint):
    tm, path = checkpoint
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((1, 1, 48000))).astype(np.float32)

    ref = torch_full_pipeline(tm, audio)

    # Default (bf16 matmul) path: probabilities within ~1e-3
    ours = np.asarray(ppgs_tpu.from_audio(audio, 16000, checkpoint=path))
    assert ours.shape == ref.shape == (1, 40, 300)
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    np.testing.assert_allclose(ours.sum(axis=1), 1.0, rtol=1e-4)

    # fp32 path: tight parity
    fp32 = ppgs_tpu.Config(compute_dtype='float32')
    ours32 = np.asarray(ppgs_tpu.from_audio(
        audio, 16000, checkpoint=path, config=fp32))
    np.testing.assert_allclose(ours32, ref, rtol=1e-3, atol=1e-4)


def test_from_audio_long_input_chunked(checkpoint):
    """> 500 frames triggers chunked inference; must match reference loop."""
    import math

    tm, path = checkpoint
    rng = np.random.default_rng(1)
    seconds = 7  # 700 frames
    audio = (0.1 * rng.standard_normal((1, 1, seconds * 16000))).astype(
        np.float32)

    fp32 = ppgs_tpu.Config(compute_dtype='float32')
    ours = np.asarray(ppgs_tpu.from_audio(
        audio, 16000, checkpoint=path, config=fp32))

    from test_stft import torch_reference_mel

    mel = torch.from_numpy(torch_reference_mel(audio)).float()
    T = mel.shape[-1]
    lengths = torch.tensor([T])
    overlap, chunk_len = 50, 500
    stride = chunk_len - 2 * overlap
    padded = torch.nn.functional.pad(mel, (overlap, 0), mode='replicate')
    outs = []
    lens = lengths.clone()
    with torch.no_grad():
        for i in range(math.ceil(T / stride)):
            split = padded[..., i * stride:i * stride + chunk_len]
            cl = (lens + overlap).clamp(0, chunk_len)
            cl[cl == overlap] = 0
            lens = (lens - stride).clamp(min=0)
            outs.append(tm(split, cl)[..., overlap:chunk_len - overlap])
        logits = torch.cat(outs, dim=-1)[..., :T]
        ref = torch.softmax(logits, dim=1).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_from_file_and_file_to_file(checkpoint, tmp_path):
    tm, path = checkpoint
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.standard_normal((1, 16000))).astype(np.float32)
    wav = tmp_path / 'x.wav'
    audio_io.save_wav(wav, audio)

    ppg = np.asarray(ppgs_tpu.from_file(wav, checkpoint=path))
    assert ppg.shape == (40, 100)

    out = tmp_path / 'x.npy'
    ppgs_tpu.from_file_to_file(wav, out, checkpoint=path)
    saved = np.load(out)
    np.testing.assert_allclose(saved, ppg, atol=2e-5)

    # Batch API
    outs = [tmp_path / 'a.npy', tmp_path / 'b.npy']
    ppgs_tpu.from_files_to_files([wav, wav], outs, checkpoint=path,
                                 num_workers=2)
    for o in outs:
        np.testing.assert_allclose(np.load(o), ppg, atol=2e-5)


def test_from_files_to_files_variable_lengths(checkpoint, tmp_path):
    """Batched dataloader inference: per-item masked truncation + parity
    with an equivalently-batched torch reference (ppgs/core.py:280-391).

    Note batched != per-file at the frame level by design (in the reference
    too): zero-padded audio yields log(1e-5) mel frames past each item's
    length, the input conv folds them into the last two valid frames, and
    those frames are valid attention keys — so every frame shifts slightly.
    Parity therefore must be checked against a batched torch pipeline.
    """
    from test_stft import torch_reference_mel

    tm, path = checkpoint
    rng = np.random.default_rng(3)
    sample_counts = (16000, 8000, 24000)
    audios = [(0.1 * rng.standard_normal((1, s))).astype(np.float32)
              for s in sample_counts]
    wavs = []
    for i, audio in enumerate(audios):
        wav = tmp_path / f'v{i}.wav'
        audio_io.save_wav(wav, audio)
        wavs.append(wav)

    outs = [tmp_path / f'v{i}.npy' for i in range(3)]
    ppgs_tpu.from_files_to_files(wavs, outs, checkpoint=path, num_workers=2)

    # Batched torch reference: zero-pad audio to the batch max (as collate
    # does), mel, forward with per-item lengths, truncate per item
    max_s = max(sample_counts)
    padded = np.zeros((3, 1, max_s), np.float32)
    for i, audio in enumerate(audios):
        padded[i, :, :audio.shape[-1]] = audio
    mel = torch.from_numpy(torch_reference_mel(padded)).float()
    lengths = torch.tensor([s // 160 for s in sample_counts])
    with torch.no_grad():
        ref = torch.softmax(tm(mel, lengths), dim=1).numpy()

    for i, (out, samples) in enumerate(zip(outs, sample_counts)):
        saved = np.load(out)
        frames = samples // 160
        assert saved.shape == (40, frames)
        np.testing.assert_allclose(
            saved, ref[i, :, :frames], atol=1e-3, rtol=1e-3)


def test_representation_file_extension():
    assert ppgs_tpu.representation_file_extension() == '-ppg.npy'


def test_from_files_to_files_data_sharded_matches_single(
        checkpoint, tmp_path):
    """Batch inference with a >1 'data' mesh configured (8 virtual devices)
    produces the same files as the single-device path (B=3 pads to 8;
    padded rows trimmed at save)."""
    tm, path = checkpoint
    rng = np.random.default_rng(4)
    wavs = []
    for i, samples in enumerate((16000, 8000, 24000)):
        wav = tmp_path / f's{i}.wav'
        audio_io.save_wav(
            wav, (0.1 * rng.standard_normal((1, samples))).astype('f4'))
        wavs.append(wav)

    config = ppgs_tpu.Config()
    outs_single = [tmp_path / f'single{i}.npy' for i in range(3)]
    ppgs_tpu.from_files_to_files(
        wavs, outs_single, checkpoint=path, num_workers=2,
        config=config.replace(mesh_shape=(1,)))

    outs_sharded = [tmp_path / f'sharded{i}.npy' for i in range(3)]
    ppgs_tpu.from_files_to_files(
        wavs, outs_sharded, checkpoint=path, num_workers=2,
        config=config.replace(mesh_shape=(-1,)))

    for a, b in zip(outs_single, outs_sharded):
        np.testing.assert_allclose(
            np.load(a), np.load(b), rtol=1e-5, atol=1e-6)


def test_infer_context_parallel_via_config(checkpoint):
    """A >1 'seq' mesh axis reached via config alone shards long-input
    inference over the time dimension, matching the default path."""
    tm, path = checkpoint
    rng = np.random.default_rng(5)
    T = 1700                      # > chunk_length -> chunked path
    features = rng.standard_normal((1, 80, T)).astype(np.float32)
    lengths = np.array([T], dtype=np.int64)

    base = ppgs_tpu.Config(compute_dtype='float32')
    default_out = np.asarray(ppgs_tpu.from_features(
        features, lengths, checkpoint=path, config=base))

    cp_config = base.replace(mesh_shape=(8,), mesh_axis_names=('seq',))
    cp_out = np.asarray(ppgs_tpu.from_features(
        features, lengths, checkpoint=path, config=cp_config))
    assert cp_out.shape == default_out.shape
    np.testing.assert_allclose(cp_out, default_out, rtol=1e-5, atol=1e-6)


def test_from_audio_batched_lengths(checkpoint):
    """Per-row lengths through the public audio API: the batched call
    reproduces the from_dataloader recipe exactly, and the full-length row
    matches its single-utterance call."""
    from ppgs_tpu.preprocess import mel as mel_mod

    tm, path = checkpoint
    rng = np.random.default_rng(7)
    S = 48000
    lengths = np.array([S, 32000, 24000], dtype=np.int64)
    audio = (0.1 * rng.standard_normal((3, 1, S))).astype(np.float32)
    for i, n in enumerate(lengths):
        audio[i, :, n:] = 0.0

    config = ppgs_tpu.Config()
    batched = np.asarray(ppgs_tpu.from_audio(
        audio, 16000, checkpoint=path, lengths=lengths, config=config))
    assert batched.shape == (3, 40, S // config.hopsize)

    # Exact parity with the from_dataloader semantics (reference
    # ppgs/core.py:280-391: frontend on the padded batch, per-row frame
    # lengths, physical extent = batch max)
    feats = mel_mod.from_audios(jnp.asarray(audio), lengths, config=config)
    feat_lengths = np.minimum(lengths // config.hopsize, feats.shape[-1])
    manual = np.asarray(ppgs_tpu.from_features(
        feats, feat_lengths, checkpoint=path, config=config,
        extent=int(feat_lengths.max())))
    np.testing.assert_array_equal(batched, manual)

    # The full-length row matches its own single-utterance call
    single = np.asarray(ppgs_tpu.from_audio(
        audio[0:1], 16000, checkpoint=path, config=config))
    np.testing.assert_allclose(batched[0], single[0], rtol=1e-5, atol=1e-6)

    # Valid frames of a shorter row carry real probability mass; frames
    # past its length are the masked uniform and get trimmed by callers
    n1 = int(feat_lengths[1])
    np.testing.assert_allclose(batched[1, :, :n1].sum(0), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        batched[1, :, n1 + 1:], 1.0 / 40, rtol=1e-3)

    # Mismatched lengths raise
    with pytest.raises(ValueError):
        ppgs_tpu.from_audio(audio, 16000, checkpoint=path,
                            lengths=[S, 32000], config=config)


def test_from_audio_lengths_resample_scaling(checkpoint):
    """Per-row lengths scale with resampling: 48 kHz input halves... i.e.
    lengths map through the 48k->16k ratio before frame derivation."""
    tm, path = checkpoint
    rng = np.random.default_rng(11)
    S48 = 48000 * 2
    audio = (0.1 * rng.standard_normal((2, 1, S48))).astype(np.float32)
    lengths48 = np.array([S48, S48 // 2])

    out = np.asarray(ppgs_tpu.from_audio(
        audio, 48000, checkpoint=path, lengths=lengths48))
    # 2 s @48k -> 2 s @16k -> 200 frames
    assert out.shape == (2, 40, 200)
    # Row 1 valid for ~100 frames; past it the masked uniform appears
    np.testing.assert_allclose(out[1, :, :99].sum(0), 1.0, rtol=1e-4)
    np.testing.assert_allclose(out[1, :, 105:], 1.0 / 40, rtol=1e-3)
