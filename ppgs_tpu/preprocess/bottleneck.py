"""ASR bottleneck frontend (reference: ppgs/preprocess/bottleneck/core.py +
conformer_ppg_model/{stft,frontend,log_mel,utterance_mvn}.py).

Pipeline: pad 432 -> STFT (n_fft 1024, rect win 800 centered, hop 160,
center=False) -> power spectrum -> mel (librosa norm=1 == slaney) ->
log(x + 1e-20) -> utterance MVN -> 16-block conformer -> (B, 144, T) @100 Hz.

Faithfully reproduced reference quirks (trained-in, required for parity):
- utterance_mvn with norm_means+norm_vars divides by std.sqrt() == var**0.25
  (utterance_mvn.py:69-74), and the variance sum includes the -mean values
  at padded frames.
The STFT is the same DFT-as-conv MXU formulation as ops/stft.py with a
rectangular window zero-padded to n_fft.
"""

import dataclasses
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..models import conformer
from ..ops import filterbank
from ..ops import stft as stft_ops

N_FFT = 1024
WIN_LENGTH = 800
HOP = 160
PAD = N_FFT // 2 - HOP // 2         # 432

BOTTLENECK_CHECKPOINT = config_mod.CHECKPOINT_DIR / 'conformer-24epoch.npz'


@functools.lru_cache(maxsize=1)
def _params():
    from .. import load as load_mod

    if not Path(BOTTLENECK_CHECKPOINT).exists():
        raise FileNotFoundError(
            f'Conformer weights not found at {BOTTLENECK_CHECKPOINT}. '
            f'Convert with scripts/convert_conformer.py (needs network).')
    return load_mod.load_params(BOTTLENECK_CHECKPOINT)


@functools.lru_cache(maxsize=1)
def _dft_basis():
    """Rectangular-window (length 800, centered in 1024) real-DFT filters."""
    n_freqs = N_FFT // 2 + 1
    n = np.arange(N_FFT, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(k, n) / N_FFT
    window = np.zeros(N_FFT)
    start = (N_FFT - WIN_LENGTH) // 2
    window[start:start + WIN_LENGTH] = 1.0
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0) * window
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=1)
def _mel_basis():
    return filterbank.mel_filterbank(16000, N_FFT, 80)


@functools.lru_cache(maxsize=1)
def _blocked_dft_kernel():
    """Rect-window DFT basis re-blocked for the hop-channel strided conv
    (ops/stft.py block_analysis_kernel): the C_in=1/kernel=1024/stride=160
    shape runs at ~1/10 MXU speed; the re-blocked C_in=160/kernel=7/stride=1
    shape tiles onto the systolic array."""
    return stft_ops.block_analysis_kernel(_dft_basis(), HOP)


def log_mel_power(audio, lengths, precision=None):
    """(B, S) padded audio -> ((B, T, 80) log-mel power feats, olens)."""
    kernel = jnp.asarray(_blocked_dft_kernel())   # (J, hop, 2F)
    taps = kernel.shape[0]
    B, P = audio.shape
    if P < N_FFT:
        raise ValueError(
            f'Audio too short for the bottleneck frontend: {P} padded '
            f'samples < one {N_FFT}-sample analysis window (need at least '
            f'{N_FFT - 2 * PAD} raw samples before the +/-{PAD} padding).')
    T = (P - N_FFT) // HOP + 1
    # Re-block samples into hop-sized channels; basis columns >= N_FFT are
    # zero so right zero-padding to (T + J - 1) * hop is exact
    need = (T + taps - 1) * HOP
    x = jnp.pad(audio, ((0, 0), (0, max(0, need - P))))[:, :need]
    blocks = x.reshape(B, T + taps - 1, HOP)
    out = jax.lax.conv_general_dilated(
        blocks, kernel,
        window_strides=(1,), padding='VALID',
        dimension_numbers=('NHC', 'HIO', 'NCH'),
        precision=precision)                      # (B, 2F, T)
    n_freqs = N_FFT // 2 + 1
    real, imag = out[:, :n_freqs], out[:, n_freqs:]
    power = (real * real + imag * imag).transpose(0, 2, 1)  # (B, T, F)

    mel = power @ jnp.asarray(_mel_basis()).T
    logmel = jnp.log(mel + 1e-20)

    olens = (lengths - N_FFT + HOP) // HOP
    mask = jnp.arange(logmel.shape[1])[None] < olens[:, None]
    return jnp.where(mask[..., None], logmel, 0.0), olens


def utterance_mvn(x, olens):
    """Reference MVN incl. its quirks (see module docstring)."""
    mask = jnp.arange(x.shape[1])[None] < olens[:, None]
    x = jnp.where(mask[..., None], x, 0.0)
    denom = olens[:, None, None].astype(x.dtype)
    mean = x.sum(axis=1, keepdims=True) / denom
    x = x - mean
    var = (x ** 2).sum(axis=1, keepdims=True) / denom
    std = jnp.maximum(jnp.sqrt(var), 1e-20)
    return x / jnp.sqrt(std)


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _forward(params, audio, lengths, compute_dtype='bfloat16'):
    feats, olens = log_mel_power(audio, lengths)
    feats = utterance_mvn(feats, olens)
    cfg = dataclasses.replace(
        conformer.BOTTLENECK, compute_dtype=compute_dtype)
    out = conformer.forward(params, feats, olens, cfg)
    return out.transpose(0, 2, 1)                 # (B, 144, T)


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    """(B, 1, S) audio @16 kHz -> (B, 144, ~S//160) bottleneck latents.

    The conformer encoder rides the PPG config's compute dtype (bf16 matmuls
    with fp32 statistics/residuals by default; pass a config with
    compute_dtype='float32' for strict-parity numerics, as w2v2fb does)."""
    audio = jnp.asarray(audio)
    if lengths is None:
        lengths = np.full((audio.shape[0],), audio.shape[-1])
    lengths = jnp.asarray(lengths) + 2 * PAD
    padded = jnp.pad(audio, ((0, 0), (0, 0), (PAD, PAD))).squeeze(1)
    compute_dtype = (config.compute_dtype if config is not None
                     else 'bfloat16')
    params = _params()
    if config is not None:
        # Config-reachable frontend TP (SURVEY §2.b item 3): a >1 'model'
        # mesh axis shards the conformer over it
        from .. import parallel as parallel_mod

        placement = parallel_mod.frontend_tp_placement(
            params, config, rule=parallel_mod.conformer_param_sharding)
        if placement is not None:
            params, in_sharding = placement
            padded = jax.device_put(padded, in_sharding)
    return _forward(
        params, padded, lengths,
        compute_dtype=compute_dtype).astype(output_dtype)


def from_audio(audio, sample_rate=None, config=None):
    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        audio = audio[None]
    return from_audios(audio, config=config)


def from_file(audio_file, config=None):
    from ..data import audio as audio_io

    return from_audio(audio_io.load(audio_file), config=config)


def from_file_to_file(audio_file, output_file, config=None):
    np.save(output_file,
            np.asarray(from_file(audio_file, config)).astype(np.float16))


def from_files_to_files(audio_files, output_files, config=None):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, config)
