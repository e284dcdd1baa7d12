"""Bottleneck frontend DSP parity: our rect-window power STFT + mel + MVN
vs the reference torch pipeline (stft.py, log_mel.py, utterance_mvn.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ppgs_tpu.ops import filterbank
from ppgs_tpu.preprocess import bottleneck


def torch_reference_feats(audio_np, lengths_np):
    """Reference: torch.stft(n_fft=1024, win=800 rect, hop=160,
    center=False) -> power -> mel (norm=1) -> log(+1e-20) -> mask."""
    audio = torch.from_numpy(audio_np)
    window = torch.ones(800)
    st = torch.stft(audio, 1024, hop_length=160, win_length=800,
                    window=window, center=False, normalized=False,
                    onesided=True, return_complex=True)
    st = torch.view_as_real(st.transpose(1, 2))     # (B, T, F, 2)
    power = st[..., 0] ** 2 + st[..., 1] ** 2

    melmat = torch.from_numpy(
        filterbank.mel_filterbank(16000, 1024, 80)).float()
    mel = torch.matmul(power, melmat.T)
    logmel = (mel + 1e-20).log()

    olens = (torch.from_numpy(lengths_np) - 1024 + 160) // 160
    mask = torch.arange(logmel.shape[1])[None] < olens[:, None]
    logmel = logmel.masked_fill(~mask[..., None], 0.0)
    return logmel.numpy(), olens.numpy()


def torch_reference_mvn(x_np, olens_np):
    """Reference utterance_mvn (norm_means=True, norm_vars=True), with its
    var**0.25 and padded-frames-in-variance quirks."""
    x = torch.from_numpy(x_np.copy())
    olens = torch.from_numpy(olens_np)
    ilens_ = olens.float().view(-1, 1, 1)
    mask = torch.arange(x.shape[1])[None] < olens[:, None]
    x = x.masked_fill(~mask[..., None], 0.0)
    mean = x.sum(dim=1, keepdim=True) / ilens_
    x = x - mean
    var = x.pow(2).sum(dim=1, keepdim=True) / ilens_
    std = torch.clamp(var.sqrt(), min=1e-20)
    return (x / std.sqrt()).numpy()


@pytest.fixture
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000
    a = np.stack([
        0.4 * np.sin(2 * np.pi * 300 * t)
        + 0.05 * rng.standard_normal(8000),
        rng.standard_normal(8000) * 0.2,
    ]).astype(np.float32)
    return a


def test_log_mel_power_matches_torch(audio):
    lengths = np.array([8000, 6000])
    audio[1, 6000:] = 0
    ours, olens = bottleneck.log_mel_power(
        jnp.asarray(audio), jnp.asarray(lengths), precision='highest')
    ref, ref_olens = torch_reference_feats(audio, lengths)
    np.testing.assert_array_equal(np.asarray(olens), ref_olens)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def test_utterance_mvn_matches_reference_quirks(audio):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 40, 80)).astype(np.float32)
    olens = np.array([40, 25])
    ours = np.asarray(bottleneck.utterance_mvn(
        jnp.asarray(x), jnp.asarray(olens)))
    ref = torch_reference_mvn(x, olens)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_bottleneck_pipeline_shapes(monkeypatch):
    """End-to-end with a tiny random conformer (params monkeypatched)."""
    import jax

    from ppgs_tpu.models import conformer as conformer_mod

    tiny = conformer_mod.ConformerConfig(num_blocks=2)
    params = conformer_mod.init(jax.random.PRNGKey(0), tiny)
    monkeypatch.setattr(bottleneck, '_params', lambda: params)
    monkeypatch.setattr(
        bottleneck.conformer, 'BOTTLENECK', tiny)

    audio = np.random.default_rng(2).standard_normal(
        (1, 1, 16000)).astype(np.float32) * 0.1
    out = bottleneck.from_audios(audio)
    # 1 s @ 16 kHz with pad 432 -> exactly 100 frames @100 Hz
    assert out.shape == (1, 144, 100)
    assert np.isfinite(np.asarray(out)).all()


def test_bottleneck_bf16_close_to_fp32(monkeypatch):
    """The production bf16 conformer path tracks strict fp32 numerics
    (bf16 matmuls, fp32 accumulation/statistics/residuals)."""
    import jax

    import ppgs_tpu
    from ppgs_tpu.models import conformer as conformer_mod

    tiny = conformer_mod.ConformerConfig(num_blocks=2)
    params = conformer_mod.init(jax.random.PRNGKey(0), tiny)
    monkeypatch.setattr(bottleneck, '_params', lambda: params)
    monkeypatch.setattr(bottleneck.conformer, 'BOTTLENECK', tiny)

    audio = np.random.default_rng(3).standard_normal(
        (2, 1, 16000)).astype(np.float32) * 0.1
    fp32 = np.asarray(bottleneck.from_audios(
        audio, config=ppgs_tpu.Config(compute_dtype='float32')))
    bf16 = np.asarray(bottleneck.from_audios(audio))
    scale = np.abs(fp32).max()
    assert scale > 0
    np.testing.assert_allclose(bf16 / scale, fp32 / scale, atol=3e-2)
