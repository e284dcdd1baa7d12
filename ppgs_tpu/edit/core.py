"""PPG editing API (reference: ppgs/edit/core.py:15-219).

Functional style: every op returns a new array (JAX arrays are immutable).
Regex matching is inherently host-side (python ``re`` over the argmax
decode); the probability swaps themselves are vectorized device ops.
"""

import re
import struct
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..phonemes import PHONEMES


def reallocate(
    ppg: jax.Array,
    source: str,
    target: str,
    value: Optional[float] = None,
) -> jax.Array:
    """Move probability mass from source phoneme to target phoneme.

    If value is None, move everything; otherwise move at most ``value``.
    """
    source_index = PHONEMES.index(source)
    target_index = PHONEMES.index(target)

    if value is None:
        moved = ppg[source_index]
        ppg = ppg.at[source_index].set(0.0)
    else:
        moved = jnp.minimum(ppg[source_index], value)
        ppg = ppg.at[source_index].set(
            jnp.maximum(0.0, ppg[source_index] - value))

    return ppg.at[target_index].add(moved)


def _unique_consecutive(indices: np.ndarray):
    """numpy equivalent of torch.unique_consecutive(return_inverse=True)."""
    if len(indices) == 0:
        return indices, np.zeros(0, dtype=np.int64)
    change = np.concatenate([[True], indices[1:] != indices[:-1]])
    unique = indices[change]
    inverse = np.cumsum(change) - 1
    return unique, inverse


def _find_spans(indices: np.ndarray, source_indices: List[int]):
    """Regex-match a phoneme index sequence against the run-length decode."""
    unique, inverse = _unique_consecutive(indices)
    pattern = re.escape(
        struct.pack('b' * len(source_indices), *source_indices))
    string = struct.pack('b' * len(unique), *[int(u) for u in unique])
    return [m.span() for m in re.finditer(pattern, string)], inverse


def regex_find(ppg: jax.Array, find_phonemes: List[str]):
    """Find frame spans whose argmax decode matches a phoneme sequence.

    Returns a list of [start_frame, end_frame) pairs.
    """
    source_indices = [PHONEMES.index(p) for p in find_phonemes]
    indices = np.asarray(jnp.argmax(ppg, axis=0))
    spans, inverse = _find_spans(indices, source_indices)
    results = []
    for start, end in spans:
        frame_start = int(np.argwhere(inverse == start)[0, 0])
        frame_end = int(np.argwhere(inverse == end - 1)[-1, 0]) + 1
        results.append([frame_start, frame_end])
    return results


def regex(
    ppg: jax.Array,
    source_phonemes: List[str],
    target_phonemes: List[str],
    reallocate: bool = False,
) -> jax.Array:
    """Match source phoneme sequences (argmax decode) and swap/reallocate
    their probabilities with the target sequence, position by position."""
    source_indices = [PHONEMES.index(p) for p in source_phonemes]
    target_indices = [PHONEMES.index(p) for p in target_phonemes]
    assert len(source_indices) == len(target_indices)

    indices = np.asarray(jnp.argmax(ppg, axis=0))
    spans, inverse = _find_spans(indices, source_indices)
    match_starts = np.array([s for s, _ in spans], dtype=np.int64)

    for i in range(len(source_phonemes)):
        # Frames belonging to the ith phoneme run of any match
        slicing = jnp.asarray(np.isin(inverse, match_starts + i))
        src, tgt = source_indices[i], target_indices[i]
        src_row, tgt_row = ppg[src], ppg[tgt]
        if reallocate:
            ppg = ppg.at[src].set(jnp.where(slicing, 0.0, src_row))
            ppg = ppg.at[tgt].set(
                jnp.where(slicing, tgt_row + src_row, tgt_row))
        else:
            ppg = ppg.at[src].set(jnp.where(slicing, tgt_row, src_row))
            ppg = ppg.at[tgt].set(jnp.where(slicing, src_row, tgt_row))
    return ppg


def shift(ppg: jax.Array, phoneme: str, value: float) -> jax.Array:
    """Shift probability of a phoneme; renormalize others proportionally."""
    index = PHONEMES.index(phoneme)

    if value > 0:
        frame_values = jnp.minimum(1.0 - ppg[index], value)
    else:
        frame_values = jnp.maximum(ppg[index], value)

    residual_mask = jnp.ones(ppg.shape[0], dtype=bool).at[index].set(False)
    updated = jnp.where(
        residual_mask[:, None],
        ppg - ppg * frame_values[None, :],
        ppg + frame_values[None, :])
    return updated


def swap(ppg: jax.Array, phoneme_a: str, phoneme_b: str) -> jax.Array:
    """Swap the probabilities of two phonemes."""
    index_a = PHONEMES.index(phoneme_a)
    index_b = PHONEMES.index(phoneme_b)
    row_a, row_b = ppg[index_a], ppg[index_b]
    return ppg.at[index_a].set(row_b).at[index_b].set(row_a)
