"""Device mesh + sharding layer.

The reference is single-GPU with no distributed code (SURVEY.md §2.b). Here
parallelism is first-class: one code path from 1 chip to a multi-host slice,
expressed as a `jax.sharding.Mesh` plus NamedSharding rules. Batch (and the
folded chunk dimension) shard over the 'data' axis; parameters are replicated
(the PPG encoder is ~4M params — far under one chip's HBM). XLA inserts the
psum for gradient reduction from the sharding annotations alone.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ('data',),
) -> Mesh:
    """Create a device mesh. shape may contain one -1 (fill with all devices)."""
    if devices is None:
        devices = jax.devices()
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    devices = np.asarray(devices[:int(np.prod(shape))]).reshape(shape)
    return Mesh(devices, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = 'data'):
    """Device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


###############################################################################
# Tensor-parallel sharding rules (w2v2 frontend; SURVEY §2.b item 3)
###############################################################################


def w2v2_param_sharding(mesh: Mesh, params, axis: str = 'model'):
    """NamedSharding pytree for w2v2 params: attention heads and FFN hidden
    shard over the ``axis`` mesh dimension; norms/biases replicate.

    With jit + these shardings XLA/GSPMD inserts the required collectives
    (all-reduce after wo/w2 contractions) automatically; correctness is
    preserved for any mesh size that divides the sharded dims.
    """
    def rule(path, leaf):
        names = [str(getattr(p, 'key', getattr(p, 'idx', p)))
                 for p in path]
        joined = '.'.join(names)
        ndim = leaf.ndim
        # Column-parallel: shard output features
        if any(k in joined for k in ['wq', 'wk', 'wv']):
            return NamedSharding(mesh, P(None, axis))
        if any(k in joined for k in ['bq', 'bk', 'bv']):
            return NamedSharding(mesh, P(axis))
        # Row-parallel: shard input features, replicate output
        if 'wo' in joined:
            return NamedSharding(mesh, P(axis, None))
        # FFN
        if joined.endswith('ffn.w1') or '.w1' in joined:
            return NamedSharding(mesh, P(None, axis))
        if joined.endswith('ffn.b1') or '.b1' in joined:
            return NamedSharding(mesh, P(axis))
        if joined.endswith('ffn.w2') or '.w2' in joined:
            return NamedSharding(mesh, P(axis, None))
        # Feature-encoder convs: shard output channels (K, I, O)
        if 'feature_encoder' in joined and 'conv' in joined and ndim == 3:
            return NamedSharding(mesh, P(None, None, axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def conformer_param_sharding(mesh: Mesh, params, axis: str = 'model'):
    """NamedSharding pytree for the conformer (bottleneck frontend) params:
    attention heads, FFN hidden, and conv-module channels shard over
    ``axis``; norms and the small 2D-conv embed replicate.

    Mesh sizes must divide the head count (4) so q/k/v column shards align
    with head boundaries; GSPMD inserts the all-reduces after the
    row-parallel out/w2/pointwise2 contractions.
    """
    def rule(path, leaf):
        names = [str(getattr(p, 'key', getattr(p, 'idx', p)))
                 for p in path]
        joined = '.'.join(names)
        if 'blocks' not in joined:
            return NamedSharding(mesh, P())
        # Relative-position MHA
        if any(f'attn.{k}.weight' in joined for k in ('q', 'k', 'v', 'pos')):
            return NamedSharding(mesh, P(None, axis))
        if any(f'attn.{k}.bias' in joined for k in ('q', 'k', 'v')):
            return NamedSharding(mesh, P(axis))
        if 'attn.out.weight' in joined:
            return NamedSharding(mesh, P(axis, None))
        if 'pos_bias' in joined:                      # (heads, d_head)
            return NamedSharding(mesh, P(axis, None))
        # Macaron / final FFNs
        if '.w1.weight' in joined:
            return NamedSharding(mesh, P(None, axis))
        if '.w1.bias' in joined:
            return NamedSharding(mesh, P(axis))
        if '.w2.weight' in joined:
            return NamedSharding(mesh, P(axis, None))
        # Conv module: channelwise over the model axis
        if 'pointwise1.weight' in joined:             # (1, d, 2d)
            return NamedSharding(mesh, P(None, None, axis))
        if 'pointwise1.bias' in joined:
            return NamedSharding(mesh, P(axis))
        if 'depthwise.weight' in joined:              # (k, 1, d)
            return NamedSharding(mesh, P(None, None, axis))
        if 'depthwise.bias' in joined or 'batch_norm' in joined:
            return NamedSharding(mesh, P(axis))
        if 'pointwise2.weight' in joined:             # (1, d, d)
            return NamedSharding(mesh, P(None, axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, shardings):
    return jax.tree.map(jax.device_put, params, shardings)


# (rule name, mesh shape, axis names, id(params)) -> placement or None
_FRONTEND_TP_CACHE = {}


def frontend_tp_placement(params, config, rule=None):
    """TP placement for a jitted frontend (SURVEY §2.b item 3 end-to-end).

    When ``config``'s mesh has a >1 'model' axis, returns
    ``(sharded_params, input_sharding)``: params sharded by ``rule``
    (default ``w2v2_param_sharding``) and the batch input sharding
    ('data' axis when >1, else replicated). GSPMD inserts the TP
    collectives from the shardings alone — the jitted pipeline is
    unchanged. Returns None on a single device or when the config
    requests no model axis. Placements are cached per (rule, mesh,
    params identity): frontends hold their params in an lru_cache, so
    the device_put runs once.
    """
    if 'model' not in config.mesh_axis_names or len(jax.devices()) < 2:
        return None
    if rule is None:
        rule = w2v2_param_sharding
    key = (rule.__name__, tuple(config.mesh_shape),
           tuple(config.mesh_axis_names), id(params))
    if key not in _FRONTEND_TP_CACHE:
        mesh = make_mesh(
            shape=config.mesh_shape, axis_names=config.mesh_axis_names)
        if mesh.shape.get('model', 1) <= 1:
            _FRONTEND_TP_CACHE[key] = None
        else:
            sharded = shard_params(params, rule(mesh, params))
            in_sharding = (batch_sharding(mesh)
                           if mesh.shape.get('data', 1) > 1
                           else replicated(mesh))
            _FRONTEND_TP_CACHE[key] = (sharded, in_sharding)
    return _FRONTEND_TP_CACHE[key]


def pad_batch_to_multiple(arrays, batch_axis_size: int, fill=0):
    """Pad the leading dim of every array to a multiple of the mesh size.

    ``fill`` is a scalar or a pytree (matching ``arrays``) of per-array pad
    values. Validity is -100-sentinel-based, not length-based (reference
    ppgs/data/collate.py:45-50): target arrays MUST be padded with -100 so
    padded rows contribute zero valid frames to loss/metrics — zero-padding
    targets would score padded rows as (valid, class 0).
    """
    import numpy as np

    def pad(x, value):
        b = x.shape[0]
        target = -(-b // batch_axis_size) * batch_axis_size
        if target == b:
            return x
        widths = [(0, target - b)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths, constant_values=value)

    if not isinstance(fill, (tuple, list, dict)):
        fill = jax.tree.map(lambda _: fill, arrays)
    return jax.tree.map(pad, arrays, fill)


from .context import (                                        # noqa: E402
    context_parallel_chunked_forward,
    pad_frames_for_context,
)
from .pipeline import (                                        # noqa: E402
    pipeline_forward,
    stack_layer_params,
)
from . import multihost                                        # noqa: E402
