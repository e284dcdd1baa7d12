"""Grid-based PPG time-stretching (reference: ppgs/edit/grid.py:13-126).

``sample`` is a vectorized gather + lerp; grid constructors are tiny host/device
helpers. ``from_alignments`` consumes parsed alignments (see data.textgrid).
"""

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.algebra import interpolate


def sample(ppg: jax.Array, grid: jax.Array) -> jax.Array:
    """Interpolate a (..., T) PPG at float-valued frame indices ``grid``."""
    grid = jnp.asarray(grid, dtype=jnp.float32)
    interp = grid - jnp.floor(grid)

    # searchsorted over the integer frame axis, side='right':
    # for integral g this gives i = g + 1, pairing frames (g, g+1)
    xp = jnp.arange(ppg.shape[-1])
    i = jnp.searchsorted(xp, grid, side='right')

    # Replicate the final frame so i == T is valid
    padded = jnp.concatenate([ppg, ppg[..., -1:]], axis=-1)
    return interpolate(padded[..., i - 1], padded[..., i], interp)


def constant(ppg: jax.Array, ratio: float) -> jax.Array:
    """Constant-ratio time-stretch grid; lower ratio is slower."""
    return of_length(ppg, round(ppg.shape[-1] / ratio + 1e-4))


def of_length(ppg: jax.Array, length: int) -> jax.Array:
    """Grid resampling a PPG to a specified length."""
    return jnp.linspace(0.0, ppg.shape[-1] - 1.0, length, dtype=jnp.float32)


def from_alignments(
    source,
    target,
    sample_rate: int = 16000,
    hopsize: int = 160,
) -> jax.Array:
    """Time-stretch grid converting a source forced alignment to a target.

    ``source``/``target`` are data.textgrid.Alignment objects. Mirrors the
    reference's use of pypar.compare.per_frame_rate: the per-frame ratio of
    corresponding phoneme durations, integrated into fractional indices.
    """
    source_frames = int((source.duration() * sample_rate) / hopsize)
    target_frames = int((target.duration() * sample_rate) / hopsize)

    rates = per_frame_rate(target, source, sample_rate, hopsize, target_frames)

    indices = np.cumsum(np.asarray(rates, dtype=np.float64))
    indices = indices - indices[0]
    indices = indices * (source_frames - 1) / indices[-1]
    return jnp.asarray(indices, dtype=jnp.float32)


def per_frame_rate(target, source, sample_rate, hopsize, target_frames):
    """Relative speed (source phone duration / target phone duration) at each
    target frame center, matching pypar.compare.per_frame_rate semantics."""
    source_phones = list(source.phonemes())
    target_phones = list(target.phonemes())
    if len(source_phones) != len(target_phones):
        raise ValueError(
            'Alignments must have the same number of phonemes '
            f'({len(source_phones)} vs {len(target_phones)})')

    hop_seconds = hopsize / sample_rate
    rates = []
    j = 0
    for frame in range(target_frames):
        time = frame * hop_seconds
        while (j < len(target_phones) - 1 and
               time >= target_phones[j].end):
            j += 1
        tgt_dur = max(target_phones[j].duration(), 1e-9)
        src_dur = source_phones[j].duration()
        rates.append(src_dur / tgt_dur)
    return rates
