"""Golden parity: our DFT-conv STFT/mel vs torch.stft + mel (the reference's
exact pipeline, ppgs/preprocess/{spectrogram,mel}.py), reimplemented here with
CPU torch as the oracle."""

import math

import numpy as np
import pytest
import torch

import ppgs_tpu
from ppgs_tpu.ops import stft as stft_ops
from ppgs_tpu.ops import filterbank


def torch_reference_spectrogram(audio_np, num_fft=1024, hopsize=160,
                                window_size=1024):
    """Reference magnitude spectrogram (ppgs/preprocess/spectrogram.py)."""
    audio = torch.from_numpy(audio_np).float()
    window = torch.hann_window(window_size)
    size = (num_fft - hopsize) // 2
    audio = torch.nn.functional.pad(audio, (size, size), mode='reflect')
    st = torch.stft(
        audio.squeeze(1), num_fft, hop_length=hopsize, window=window,
        center=False, normalized=False, onesided=True, return_complex=True)
    st = torch.view_as_real(st)
    return torch.sqrt(st.pow(2).sum(-1) + 1e-6).numpy()


def torch_reference_mel(audio_np):
    spec = torch.from_numpy(torch_reference_spectrogram(audio_np))
    basis = torch.from_numpy(
        filterbank.mel_filterbank(16000, 1024, 80)).float()
    mel = torch.matmul(basis, spec.float())
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


@pytest.fixture
def audio():
    rng = np.random.default_rng(0)
    # 1.6 s of noise+tone, batch of 2
    t = np.arange(32000) / 16000
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(32000)
    return np.stack([sig, rng.standard_normal(32000) * 0.3])[:, None, :].astype(
        np.float32)


def test_magnitude_spectrogram_matches_torch(audio):
    ours = np.asarray(stft_ops.magnitude_spectrogram(audio))
    theirs = torch_reference_spectrogram(audio)
    assert ours.shape == theirs.shape
    assert ours.shape[1] == 513
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_log_mel_matches_torch(audio):
    ours = np.asarray(stft_ops.log_mel_spectrogram(audio))
    theirs = torch_reference_mel(audio)
    assert ours.shape == theirs.shape
    assert ours.shape[1] == 80
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_frame_rate_is_100hz(audio):
    # 2 s of audio at 16 kHz -> 200 frames
    mel = stft_ops.log_mel_spectrogram(audio)
    assert mel.shape[-1] == audio.shape[-1] // 160


def test_mel_filterbank_properties():
    basis = filterbank.mel_filterbank(16000, 1024, 80)
    assert basis.shape == (80, 513)
    assert (basis >= 0).all()
    # Every filter has support
    assert (basis.sum(axis=1) > 0).all()
    # Slaney scale: first breakpoint linear region ~ 200/3 Hz spacing
    mel_f = filterbank.mel_frequencies(82, 0, 8000)
    assert math.isclose(mel_f[0], 0.0, abs_tol=1e-9)
    assert mel_f[-1] == pytest.approx(8000.0, rel=1e-6)


def test_fused_mel_kernel_matches_xla():
    """The fused Pallas frontend (DFT + magnitude + mel + log in VMEM,
    bf16 operands) tracks the fp32 XLA formulation."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    audio = (0.3 * rng.standard_normal((2, 1, 12345))).astype(np.float32)

    ref = np.asarray(stft_ops.log_mel_spectrogram(
        jnp.asarray(audio), precision='highest'))

    blocks, T = stft_ops._audio_to_blocks(jnp.asarray(audio), 1024, 160)
    got = np.asarray(stft_ops._fused_log_mel(
        blocks, T, 16000, 1024, 1024, 160, 80, interpret=True))

    assert got.shape == ref.shape
    # bf16 DFT/mel operands: ~1e-2 relative in mel -> ~1e-2 absolute in
    # log-mel away from the clamp floor
    np.testing.assert_allclose(got, ref, atol=6e-2, rtol=2e-2)
    assert np.mean(np.abs(got - ref) < 2e-2) > 0.97
