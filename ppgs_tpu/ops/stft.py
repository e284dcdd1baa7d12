"""STFT and log-mel spectrogram as MXU matmuls.

TPU-first design: instead of an FFT butterfly (scalar-heavy, poorly tiled on
TPU), framing + Hann windowing + real DFT are fused into ONE strided
convolution whose filters are the windowed DFT basis. XLA lowers this to an
implicit GEMM on the 128x128 systolic array, and the following magnitude and
mel projection fuse behind it. Numerically identical (fp32) to
``torch.stft(center=False)`` + magnitude + mel matmul as used by the reference
(ppgs/preprocess/spectrogram.py:14-74, ppgs/preprocess/mel.py:14-76).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import filterbank


###############################################################################
# DFT basis construction (host-side, cached)
###############################################################################


@functools.lru_cache(maxsize=4)
def dft_basis(num_fft: int, window_size: int):
    """Windowed real-DFT filters, shape (2 * n_freqs, num_fft).

    Rows [0, n_freqs) are cos terms (real part), rows [n_freqs, 2*n_freqs)
    are -sin terms (imag part), each pre-multiplied by the Hann window.
    """
    n_freqs = num_fft // 2 + 1
    n = np.arange(num_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    angle = 2.0 * np.pi * np.outer(k, n) / num_fft
    window = filterbank.hann_window(window_size, dtype=np.float64)
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=0) * window
    # numpy (not jnp): safe to cache across jit traces
    return basis.astype(np.float32)


@functools.lru_cache(maxsize=4)
def mel_basis(sample_rate: int, num_fft: int, num_mels: int):
    return filterbank.mel_filterbank(sample_rate, num_fft, num_mels)


def block_analysis_kernel(basis: np.ndarray, hopsize: int):
    """Re-block a framed-analysis basis (C_out, num_fft) for a hop-strided
    conv, shape (J, hop, C_out) ['HIO' layout].

    A direct framed STFT is a conv with C_in=1, kernel=num_fft, stride=hop —
    a shape the TPU conv emitter handles at ~1/10 of MXU speed (measured:
    the 1026x1x1024 stride-160 conv ran at ~14 TFLOP/s). Re-blocking the
    audio into non-overlapping hop-sized channels turns the same GEMM into a
    conv with C_in=hop, kernel=J=ceil(num_fft/hop), stride=1 — a standard
    conv-layer shape that tiles perfectly onto the systolic array. Window
    sample n = j*hop + c maps to kernel tap j, channel c; columns past
    num_fft are zero so the math is bit-comparable (same products, K-dim
    summed in a different order). Works for any analysis basis (Hann DFT,
    rectangular DFT, ...).
    """
    taps = -(-basis.shape[1] // hopsize)
    padded = np.zeros((basis.shape[0], taps * hopsize), np.float32)
    padded[:, :basis.shape[1]] = basis
    # (C, J*hop) -> (C, J, hop) -> (J, hop, C)
    return np.ascontiguousarray(
        padded.reshape(basis.shape[0], taps, hopsize).transpose(1, 2, 0))


@functools.lru_cache(maxsize=4)
def blocked_dft_kernel(num_fft: int, window_size: int, hopsize: int):
    """Hann-windowed DFT basis re-blocked for a hop-strided conv (J, hop, 2F);
    see block_analysis_kernel."""
    return block_analysis_kernel(dft_basis(num_fft, window_size), hopsize)


###############################################################################
# Spectrogram
###############################################################################


def _audio_to_blocks(audio, num_fft, hopsize, valid_samples=None):
    """(B, 1, S) audio -> ((B, T + J - 1, hop) hop-blocked samples, T).

    Re-blocks samples into hop-sized channels: frame t tap j channel c
    reads sample (t+j)*hop + c. The reflect padding and the right edge
    (pad/trim to exactly (T+J-1)*hop samples; basis columns >= num_fft are
    zero, so zero padding is exact) assemble in ONE concatenate —
    sequential jnp.pads materialize a full copy each. ``valid_samples``
    places the end reflection at the true batch end (see
    magnitude_spectrogram).
    """
    B, _, S = audio.shape
    size = (num_fft - hopsize) // 2
    P = S + 2 * size
    T = (P - num_fft) // hopsize + 1
    taps = -(-num_fft // hopsize)
    need = (T + taps - 1) * hopsize
    x = audio[:, 0]
    if valid_samples is None:
        right = x[:, -size - 1:-1][:, ::-1]
        pieces = [x[:, 1:size + 1][:, ::-1], x, right]
    else:
        vm = jnp.asarray(valid_samples, jnp.int32)
        xe = jnp.concatenate([x, jnp.zeros((B, size), x.dtype)], axis=1)
        # reflection: xe[vm + i] = x[vm - 2 - i], i in [0, size)
        zero = jnp.zeros((), jnp.int32)
        seg = jax.lax.dynamic_slice(
            xe, (zero, vm - size - 1), (B, size))[:, ::-1]
        xe = jax.lax.dynamic_update_slice(xe, seg, (zero, vm))
        pieces = [x[:, 1:size + 1][:, ::-1], xe[:, :S + size]]
    if need > P:
        pieces.append(jnp.zeros((B, need - P), x.dtype))
    blocks = jnp.concatenate(pieces, axis=1)[:, :need]
    return blocks.reshape(B, T + taps - 1, hopsize), T


def reflect_pad_audio(audio, num_fft, hopsize):
    """Reference-equivalent reflect padding of (B, 1, S) audio."""
    size = (num_fft - hopsize) // 2
    return jnp.pad(
        audio, ((0, 0), (0, 0), (size, size)), mode='reflect')


def frame_count(num_samples, num_fft, hopsize):
    """Frames produced for audio of length num_samples (post reflect pad)."""
    padded = num_samples + (num_fft - hopsize) // 2 * 2
    return (padded - num_fft) // hopsize + 1


@functools.partial(jax.jit, static_argnames=('num_fft', 'hopsize',
                                             'window_size', 'precision'))
def magnitude_spectrogram(audio, num_fft=1024, hopsize=160, window_size=1024,
                          precision='highest', valid_samples=None):
    """Magnitude STFT of (B, 1, S) audio -> (B, n_freqs, T).

    Matches reference: reflect pad (num_fft - hop)//2, center=False STFT,
    magnitude sqrt(re^2 + im^2 + 1e-6).

    ``valid_samples`` (traced scalar): the true signal end when S has been
    right-padded past it for compile-cache reuse (collate quantization).
    The end reflection is written at valid_samples instead of S, so the
    longest batch item's final frames match the reference's batched STFT
    (which reflects at the true batch max) exactly — a dynamic-update-slice
    of (nfft-hop)/2 samples, shape-static, no recompilation per length.
    """
    audio = audio.astype(jnp.float32)
    kernel = blocked_dft_kernel(num_fft, window_size, hopsize)  # (J, hop, 2F)
    blocks, T = _audio_to_blocks(audio, num_fft, hopsize, valid_samples)
    out = jax.lax.conv_general_dilated(
        blocks,
        kernel,
        window_strides=(1,),
        padding='VALID',
        dimension_numbers=('NHC', 'HIO', 'NCH'),
        precision=jax.lax.Precision(precision),
    )                                                   # (B, 2F, T)
    n_freqs = num_fft // 2 + 1
    real, imag = out[:, :n_freqs], out[:, n_freqs:]
    return jnp.sqrt(real * real + imag * imag + 1e-6)


###############################################################################
# Fused Pallas frontend (TPU bf16 path)
###############################################################################
#
# The XLA formulation writes the (B, 2F, T) spectrum (F=513 -> fp32
# hundreds of MB at the bench workload) to HBM between the DFT conv and
# the magnitude/mel stages; measured 0.40 MFU. The Pallas kernel keeps
# everything per (batch, frame-tile) in VMEM: frames are im2col'd
# host-side (a 7x duplication of the tiny 1-channel audio) so each
# window is ONE contiguous K = J*hop contraction — per-tap K=hop dots
# ran the MXU at hop/128-pass granularity (hop=160 -> 62%). The DFT runs
# twice, against separate cos and -sin bases, so the magnitude
# sqrt(re^2 + im^2 + 1e-6) is pure elementwise VPU work with no lane
# roll or misaligned slicing (F=513 is not lane-aligned; a circular roll
# measured ~0.6 ms of cross-lane shuffles). The mel projection is a
# transposed-basis matmul straight off the magnitude slab.

MEL_TILE = 1024          # frames per grid program


def _mel_kernel_host(sample_rate, num_fft, window_size, hopsize, num_mels):
    """((J*hop, F) cos basis, (J*hop, F) -sin basis, (F, mel_pad)
    transposed mel basis) for the im2col formulation; cached per
    geometry. Basis row j*hop + c is window sample j*hop + c (taps
    flattened tap-major, matching the im2col column order)."""
    basis = blocked_dft_kernel(num_fft, window_size, hopsize)  # (J, hop, 2F)
    taps, hop, _ = basis.shape
    n_freqs = num_fft // 2 + 1
    flat = basis.reshape(taps * hop, 2 * n_freqs)
    basis_re = np.ascontiguousarray(flat[:, :n_freqs])
    basis_im = np.ascontiguousarray(flat[:, n_freqs:])
    mel = mel_basis(sample_rate, num_fft, num_mels)            # (M, F)
    mel_pad = -(-num_mels // 128) * 128
    mel_t = np.zeros((n_freqs, mel_pad), np.float32)
    mel_t[:, :num_mels] = mel.T
    return basis_re, basis_im, mel_t


def _fused_mel_kernel(win_ref, re_ref, im_ref, mel_ref, o_ref):
    # One K = num_fft-ish contraction per half: per-tap K=hop dots ran
    # the MXU at hop/128-pass granularity (hop=160 -> 62% K-efficiency);
    # the host-side im2col makes each window one contiguous row.
    win = win_ref[0, 0]                                   # (rows, J*hop)
    re = jax.lax.dot(win, re_ref[...],
                     preferred_element_type=jnp.float32)  # (rows, F)
    im = jax.lax.dot(win, im_ref[...],
                     preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + 1e-6)
    mel = jax.lax.dot(mag.astype(jnp.bfloat16), mel_ref[...],
                      preferred_element_type=jnp.float32)
    o_ref[0, 0] = jnp.log(jnp.maximum(mel, 1e-5))


def _fused_log_mel(blocks, T, sample_rate, num_fft, window_size, hopsize,
                   num_mels, interpret=False):
    """(B, T + taps - 1, hop) blocked audio -> (B, num_mels, T)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu_mod

    B = blocks.shape[0]
    basis_re, basis_im, mel_t = _mel_kernel_host(
        sample_rate, num_fft, window_size, hopsize, num_mels)
    n_freqs = basis_re.shape[1]
    mel_pad = mel_t.shape[1]
    taps = basis_re.shape[0] // hopsize

    tile = min(MEL_TILE, -(-T // 8) * 8)
    n_tiles = -(-T // tile)
    # Host-side im2col: frame t = blocks rows [t, t+J) flattened — a 7x
    # duplication of the (tiny, 1-channel) audio for one contiguous
    # K = J*hop contraction per frame
    need = (n_tiles - 1) * tile + tile + taps - 1
    blocks = jnp.pad(
        blocks, ((0, 0), (0, max(0, need - blocks.shape[1])), (0, 0)))
    idx = jnp.arange(n_tiles * tile)[:, None] + jnp.arange(taps)[None]
    windows = blocks[:, idx].reshape(
        B, n_tiles, tile, taps * hopsize).astype(jnp.bfloat16)

    out = pl.pallas_call(
        _fused_mel_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, tile, taps * hopsize),
                         lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec(basis_re.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(basis_im.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel_t.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, mel_pad),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tiles, tile, mel_pad), jnp.float32),
        compiler_params=pltpu_mod.CompilerParams(
            dimension_semantics=('parallel', 'parallel')),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_tiles * tile * taps * hopsize * 2 * n_freqs,
            bytes_accessed=windows.size * 2 + B * T * mel_pad * 4,
            transcendentals=B * n_tiles * tile * mel_pad),
        interpret=interpret,
    )(windows, jnp.asarray(basis_re, jnp.bfloat16),
      jnp.asarray(basis_im, jnp.bfloat16),
      jnp.asarray(mel_t, jnp.bfloat16))
    out = out.reshape(B, n_tiles * tile, mel_pad)[:, :T, :num_mels]
    return out.transpose(0, 2, 1)                         # (B, M, T)


def _use_fused_mel():
    import os

    # Measured SLOWER than the XLA strided-conv formulation at the bench
    # workload (1.62-2.41 ms across three fused variants vs 1.43 ms XLA:
    # per-tap K=hop dots run the MXU at 62% pass granularity, a circular
    # lane roll costs ~0.6 ms of shuffles, and a host-side im2col pays
    # more gather bandwidth than it saves) — opt-in negative result.
    if os.environ.get('PPGS_TPU_FUSED_MEL', '0') != '1':
        return False
    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnames=('sample_rate', 'num_fft',
                                             'hopsize', 'window_size',
                                             'num_mels', 'precision',
                                             'output_dtype'))
def log_mel_spectrogram(audio, sample_rate=16000, num_fft=1024, hopsize=160,
                        window_size=1024, num_mels=80, precision='highest',
                        output_dtype=jnp.float32, valid_samples=None):
    """Log-mel spectrogram of (B, 1, S) audio -> (B, num_mels, T).

    Mel projection + dynamic range compression log(clamp(mel, 1e-5)) as in the
    reference (ppgs/preprocess/mel.py:56-76). precision='default' (the
    production compute-dtype path) runs the XLA formulation with bf16
    matmul operands on TPU; other precisions keep fp32 strict parity. The
    fused Pallas frontend is opt-in via PPGS_TPU_FUSED_MEL=1 — it measured
    slower than the XLA strided-conv DFT and is kept as a documented
    negative result (PERF.md).
    """
    if precision == 'default' and _use_fused_mel():
        blocks, T = _audio_to_blocks(
            audio.astype(jnp.float32), num_fft, hopsize, valid_samples)
        return _fused_log_mel(
            blocks, T, sample_rate, num_fft, window_size, hopsize,
            num_mels).astype(output_dtype)

    spec = magnitude_spectrogram(
        audio, num_fft, hopsize, window_size, precision,
        valid_samples=valid_samples)
    basis = mel_basis(sample_rate, num_fft, num_mels)   # (M, F)
    mel = jnp.einsum('mf,bft->bmt', basis, spec,
                     precision=jax.lax.Precision(precision))
    return jnp.log(jnp.clip(mel, min=1e-5)).astype(output_dtype)
