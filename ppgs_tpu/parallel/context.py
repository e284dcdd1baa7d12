"""Context parallelism: long inputs sharded over chips with halo exchange.

The reference handles long inputs by running 500-frame windows (50-frame
overlap) sequentially on one device (reference ppgs/model/transformer.py:
49-64). ``models.transformer.chunked_forward`` already turns that loop into
one batched forward; this module distributes the sequence itself: each device
holds a contiguous slice of the time dimension, exchanges ``overlap``-frame
halos with its neighbors over ICI (`jax.lax.ppermute` inside `shard_map`),
and runs its local windows. Output frames stay sharded over the same axis —
no gather of the full sequence ever materializes on one chip, so the maximum
utterance length scales linearly with the mesh (SURVEY.md §2.b item 4).

Bit-equivalence with the single-device chunked forward is guaranteed because
the window geometry is identical: device 0 replicate-pads its left edge (the
reference's edge padding), the last device zero-pads its right edge (the
reference's final-window zero fill), and every interior halo is exactly the
neighbor's frames.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ._shard_map import shard_map

from ..models import transformer


def pad_frames_for_context(features, config, num_shards: int):
    """Right-zero-pad (B, C, T) so T divides into num_shards equal slices of
    whole windows. Returns (padded, true_frames)."""
    stride = config.chunk_length - 2 * config.chunk_overlap
    B, C, T = features.shape
    multiple = stride * num_shards
    padded_t = -(-T // multiple) * multiple
    if padded_t != T:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, padded_t - T)))
    return features, T


def context_parallel_chunked_forward(
    params,
    features,
    lengths,
    config,
    mesh: Mesh,
    axis: str = 'seq',
    batch_axis: str = None,
    true_frames=None,
):
    """Chunked transformer forward with the time dim sharded over ``axis``.

    features: (B, C, T) with T a multiple of stride * mesh.shape[axis]
    (use ``pad_frames_for_context``). ``lengths`` are global per-item frame
    counts; ``true_frames`` the pre-padding T (defaults to T). Output
    (B, num_phonemes, T) logits, sharded over the same axis. Optionally also
    shards the batch over ``batch_axis`` (DP x CP).
    """
    overlap = config.chunk_overlap
    chunk_len = config.chunk_length
    stride = chunk_len - 2 * overlap
    n = mesh.shape[axis]
    B, C, T = features.shape
    if T % (stride * n):
        raise ValueError(
            f'T={T} must be a multiple of stride*shards={stride * n}; '
            'pad with pad_frames_for_context')
    local_blocks = T // (stride * n)
    if true_frames is None:
        true_frames = T
    true_frames = jnp.asarray(true_frames, jnp.int32)
    lengths = jnp.asarray(lengths, jnp.int32)

    fwd = functools.partial(
        _local_windows_forward, params=params, config=config, n=n,
        axis=axis, local_blocks=local_blocks)

    bspec = batch_axis if batch_axis is not None else None
    in_specs = (P(bspec, None, axis), P(bspec), P())
    out_specs = P(bspec, None, axis)
    return shard_map(
        fwd, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False)(features, lengths, true_frames)


def _local_windows_forward(feats, lengths, true_frames, *, params, config,
                           n, axis, local_blocks):
    """Per-device body: halo exchange + local window batch forward."""
    overlap = config.chunk_overlap
    chunk_len = config.chunk_length
    stride = chunk_len - 2 * overlap
    B, C, t_local = feats.shape
    idx = jax.lax.axis_index(axis)

    # Halo exchange over ICI: my right edge -> right neighbor's left halo,
    # my left edge -> left neighbor's right halo
    fwd_perm = [(i, i + 1) for i in range(n - 1)]
    bwd_perm = [(i + 1, i) for i in range(n - 1)]
    left_halo = jax.lax.ppermute(feats[:, :, -overlap:], axis, fwd_perm)
    right_halo = jax.lax.ppermute(feats[:, :, :overlap], axis, bwd_perm)

    # Edges: device 0 replicate-pads its first frame (reference edge pad);
    # device n-1's right halo past the final window edge is zeros (ppermute
    # already yields zeros for unpermuted shards, and the geometry puts the
    # final window edge exactly overlap frames past T)
    replicate_left = jnp.broadcast_to(feats[:, :, :1], (B, C, overlap))
    left = jnp.where(idx == 0, replicate_left, left_halo)
    padded = jnp.concatenate([left, feats, right_halo], axis=2)

    # Local windows folded into the batch dim: (B * local_blocks, C, chunk)
    starts = jnp.arange(local_blocks) * stride
    widx = starts[:, None] + jnp.arange(chunk_len)[None, :]
    windows = padded[:, :, widx]
    windows = windows.transpose(0, 2, 1, 3).reshape(
        B * local_blocks, C, chunk_len)

    # Global block ids give the same per-window valid/physical lengths as
    # the single-device fold (models/transformer.py chunked_forward)
    block_ids = idx * local_blocks + jnp.arange(local_blocks)
    remaining = lengths[:, None] - block_ids[None, :] * stride
    chunk_lengths = jnp.clip(remaining + overlap, 0, chunk_len)
    chunk_lengths = jnp.where(chunk_lengths == overlap, 0, chunk_lengths)
    chunk_lengths = chunk_lengths.reshape(B * local_blocks)
    phys = jnp.clip(true_frames + overlap - block_ids * stride, 0, chunk_len)
    phys = jnp.broadcast_to(phys[None, :], (B, local_blocks)).reshape(-1)

    logits = transformer.forward(
        params, windows, chunk_lengths, config, phys_lengths=phys)
    logits = logits.reshape(B, local_blocks, -1, chunk_len)
    inner = logits[..., overlap:chunk_len - overlap]
    return inner.transpose(0, 2, 1, 3).reshape(B, -1, local_blocks * stride)
