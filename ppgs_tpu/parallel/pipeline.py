"""Pipeline parallelism: encoder layers staged over a mesh axis.

The reference has no distributed execution at all (SURVEY.md §2.b); this
module adds the remaining classic strategy alongside DP (train/core.py),
TP (parallel/__init__.py) and CP (parallel/context.py): a GPipe-style
schedule where each device along the ``pipe`` mesh axis owns a contiguous
block of encoder layers and microbatches flow stage-to-stage over ICI via
``jax.lax.ppermute`` inside ``shard_map``.

Design notes (TPU-first):

- The layer stack is homogeneous (post-LN blocks, models/transformer.py), so
  per-stage parameters are ONE stacked pytree sharded on its leading (layer)
  dim — each device holds ``num_hidden_layers / n_stages`` layers and runs
  them with ``lax.scan``; no per-stage Python specialisation, one compiled
  program for every stage.
- The schedule is a single ``lax.scan`` over ``M + n_stages - 1`` ticks
  (M = microbatches). Every tick each stage applies its layers to its
  current activation and rotates the result one hop along the ring. Bubble
  ticks compute on zeros and are masked out at ingest/drain — branch-free,
  static-shape, exactly what XLA wants.
- The whole schedule is differentiable: JAX transposes ``ppermute`` to the
  inverse permutation, so ``jax.grad`` through ``pipeline_forward`` IS the
  reverse pipeline schedule (backward microbatches flow last-stage-first).
  No hand-written backward pass is needed for pipeline-parallel training.
- Train mode (``train=True, rng=...``) reproduces the dropout sites of
  ``models.transformer.forward`` with rngs derived per (layer, microbatch)
  via ``jax.random.fold_in`` — deterministic for any stage count (but a
  different stream than the sequential forward's ``split``, so pipelined
  and unpipelined training runs are not bit-identical under dropout).
- Composes with data parallelism: pass ``batch_axis`` to shard the
  microbatch dim over a second mesh axis (DP x PP 2D mesh).

Output drains from the LAST stage only: each stage returns its output
buffer with a leading per-stage dim sharded over ``axis`` and the caller
slices the last stage's shard — GSPMD lowers that to a one-hop broadcast
of the real data instead of an O(output) ring all-reduce of a buffer that
is (n-1)/n zeros.

Ingest is likewise sharded: microbatches are distributed round-robin over
the stages (stage s owns microbatch indices ≡ s mod n) and ride a REVERSE
ring toward stage 0 on a one-slot feed register. All stages inject their
next-owned microbatch every n ticks; an item injected on stage s needs
exactly s reverse hops and arrives at stage 0 precisely at its scheduled
ingest tick, so per-stage ingest activation memory is M/n microbatches +
one in-flight slot instead of the full (M, mb, T, C) input. Only the
boolean length masks stay replicated (1/C'th of the activation bytes).

Composes with tensor parallelism: pass ``tp_axis`` (a >1 mesh axis) and
the per-layer attention/FFN weights shard over it inside the staged
region — the pipe schedule stays manual (ppermute ring) while GSPMD
auto-partitions each stage's matmuls over ``tp_axis`` from the parameter
shardings (TP×PP on one 2D mesh).

The input/output convolutions and positional encoding run outside the
staged region (they are a few percent of FLOPs and need the full batch),
mirroring ``models.transformer.forward``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ._shard_map import shard_map

from ..models import transformer
from ..ops.masking import mask_from_lengths


def stack_layer_params(layers):
    """Stack the per-layer param dicts into one pytree with a leading
    (num_layers, ...) dim — shardable over the 'pipe' mesh axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_forward(
    params,
    features,
    lengths,
    config,
    mesh: Mesh,
    axis: str = 'pipe',
    batch_axis: str = None,
    tp_axis: str = None,
    num_microbatches: int = None,
    train: bool = False,
    rng=None,
):
    """Transformer forward with encoder layers pipelined over ``axis``.

    features: (B, C_in, T) with T <= config.max_len. ``num_hidden_layers``
    must divide evenly into ``mesh.shape[axis]`` stages, B into
    ``num_microbatches`` (default: one microbatch per stage), and the
    microbatch count into the stage count (round-robin feed-ring ingest).
    Matches ``models.transformer.forward`` numerics on the XLA inference
    path; ``train=True, rng=...`` enables the same dropout sites
    (fold_in-derived streams — see module docstring). ``tp_axis`` shards
    each stage's attention/FFN weights over a second mesh axis (TP×PP).
    """
    n = mesh.shape[axis]
    layers = params['layers']
    if len(layers) % n:
        raise ValueError(
            f'num_hidden_layers={len(layers)} must divide evenly over '
            f'{n} pipeline stages')
    B, _, T = features.shape
    M = num_microbatches or n
    if B % M:
        raise ValueError(f'batch {B} must divide into {M} microbatches')
    if M % n:
        raise ValueError(
            f'microbatches {M} must divide into {n} pipeline stages '
            f'(round-robin stage ingest)')
    if batch_axis is not None and (B // M) % mesh.shape[batch_axis]:
        raise ValueError(
            f'microbatch size {B // M} must divide over '
            f"mesh axis {batch_axis!r} ({mesh.shape[batch_axis]} devices)")

    dropout = config.dropout if (train and rng is not None) else 0.0
    compute_dtype = jnp.dtype(config.compute_dtype)
    param_dtype = params['input_conv']['weight'].dtype
    x = features.astype(param_dtype).transpose(0, 2, 1)       # (B, T, C_in)
    mask = mask_from_lengths(lengths, T)                      # (B, T)

    # Input conv + positional encoding (outside the staged region)
    x = transformer.conv1d_same(
        x, params['input_conv']['weight'], params['input_conv']['bias'])
    x = x * mask[..., None]
    pe = transformer.positional_encoding(
        config.max_len, config.hidden_channels)[:T]
    x = x + pe[None]
    if dropout > 0:
        rng = _as_typed_key(rng)
        rng_pe, rng_layers = jax.random.split(rng)
        x = transformer._dropout(x, rng_pe, dropout)
        key_data = jax.random.key_data(rng_layers)
        # The impl (threefry/rbg/...) must survive the raw-data round trip
        # through shard_map: train() uses 'rbg' keys whose data is (4,)
        # uint32 — rewrapping with the default threefry impl would crash
        key_impl = jax.random.key_impl(rng_layers)
    else:
        # Placeholder key data (unused when dropout == 0)
        key_data = jnp.zeros(
            jax.random.key_data(jax.random.key(0)).shape, jnp.uint32)
        key_impl = None

    # Microbatch split, round-robin over stages: (M/n, n, B/M, T, C) —
    # element (k, s) is microbatch k*n + s, owned by stage s (dim 1 shards
    # over the pipe axis: stage-local ingest, no replicated input)
    xm = x.reshape(M // n, n, B // M, T, x.shape[-1])
    maskm = mask.reshape(M, B // M, T)
    stacked = stack_layer_params(layers)

    tp = tp_axis is not None and mesh.shape.get(tp_axis, 1) > 1
    if tp:
        # TP×PP: place the stacked per-layer weights sharded over tp_axis
        # (Megatron column/row split) in addition to the pipe-axis layer
        # split; tp_axis stays in GSPMD auto mode inside the staged region
        # (manual_axes excludes it), so each stage's matmuls partition over
        # it automatically. check_rep must be True here: jax 0.9's
        # check_vma=False path internally builds a spec over ALL mesh axes
        # and rejects partial manual_axes.
        stacked = _place_stacked_tp(stacked, mesh, axis, tp_axis)
        manual = {axis} | ({batch_axis} if batch_axis else set())
    else:
        manual = None
    body = functools.partial(
        _stage_body, axis=axis, n=n, m=M, heads=config.attention_heads,
        causal=config.is_causal, compute_dtype=compute_dtype,
        dropout=dropout, key_impl=key_impl, vma=tp)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(None, axis, batch_axis),
                  P(None, batch_axis), P()),
        out_specs=P(axis, None, batch_axis),
        check_rep=tp, manual_axes=manual)(
            stacked, xm, maskm, key_data)
    # Drain: only the last stage's buffer holds results; slicing its shard
    # lowers to a one-hop broadcast from the last pipeline stage.
    x = out[n - 1].reshape(B, T, -1)

    # Output conv + mask (outside the staged region)
    x = transformer.conv1d_same(
        x, params['output_conv']['weight'], params['output_conv']['bias'])
    x = x * mask[..., None]
    return x.transpose(0, 2, 1)                               # (B, C_out, T)


def _as_typed_key(rng):
    """Accept both typed PRNG keys and legacy uint32 raw keys."""
    if jnp.issubdtype(jnp.asarray(rng).dtype, jax.dtypes.prng_key):
        return rng
    return jax.random.wrap_key_data(jnp.asarray(rng, jnp.uint32))


def _place_stacked_tp(stacked, mesh, axis, tp):
    """Place stacked per-layer params with Megatron TP shardings over
    ``tp`` in addition to the layer split over ``axis``: q/k/v and ffn.w1
    column-split, wo and ffn.w2 row-split, everything else replicated."""
    from jax.sharding import NamedSharding

    def rule(path, leaf):
        joined = '.'.join(str(getattr(p, 'key', getattr(p, 'idx', p)))
                          for p in path)
        if (any(k in joined for k in ('wq', 'wk', 'wv'))
                or joined.endswith('.w1')):
            spec = P(axis, None, tp)
        elif (any(k in joined for k in ('bq', 'bk', 'bv'))
                or joined.endswith('.b1')):
            spec = P(axis, tp)
        elif 'wo' in joined or joined.endswith('.w2'):
            spec = P(axis, tp, None)
        else:
            spec = P(axis) if leaf.ndim else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(rule, stacked)


def _stage_body(stacked, x_loc, mask_mb, key_data, *, axis, n, m, heads,
                causal, compute_dtype, dropout, key_impl, vma=False):
    """Per-stage GPipe schedule. ``stacked`` is this stage's local
    (layers_per_stage, ...) slice; ``x_loc`` is the stage-LOCAL
    (M/n, 1, mb, T, C) slice of round-robin-owned microbatches (stage s
    owns indices ≡ s mod n) that feed stage 0 over a reverse ring;
    ``mask_mb`` is the full (M, mb, T) boolean mask (replicated — 1/C'th
    of the activation bytes); ``key_data`` (+ static ``key_impl``) seeds
    per-(layer, microbatch) dropout streams."""
    stage = jax.lax.axis_index(axis)
    ring = [(i, (i + 1) % n) for i in range(n)]
    reverse_ring = [(i, (i - 1) % n) for i in range(n)]
    x_loc = x_loc[:, 0]                       # (M/n, mb, T, C)
    k_owned = x_loc.shape[0]
    layers_per_stage = jax.tree.leaves(stacked)[0].shape[0]
    base_rng = (jax.random.wrap_key_data(key_data, impl=key_impl)
                if key_impl is not None
                else jax.random.wrap_key_data(key_data))

    def apply_local_layers(x, mask, mb):
        def layer_step(h, inp):
            layer, local_index = inp
            if dropout > 0:
                # Global (layer, microbatch, site) -> independent stream;
                # bubble-tick draws are computed on garbage and masked out
                global_layer = stage * layers_per_stage + local_index
                rngs = [
                    jax.random.fold_in(
                        base_rng, (global_layer * 4 + site) * m + mb)
                    for site in range(4)
                ]
            else:
                rngs = [None] * 4
            h = transformer._encoder_layer(
                h, layer, mask, causal, heads, rngs, dropout,
                compute_dtype, None)
            return h, None
        x, _ = jax.lax.scan(
            layer_step, x, (stacked, jnp.arange(layers_per_stage)))
        return x

    def tick(carry, t):
        state, feed, out_buf = carry
        # Feed ring: every n ticks each stage loads its next owned
        # microbatch (index t + stage, needing exactly `stage` reverse
        # hops) into the one-slot feed register; between injections the
        # register shifts one hop toward stage 0 per tick, so microbatch
        # t sits in stage 0's register precisely at tick t. Ticks past M
        # inject stale data that is never written (mask below).
        inject = (t % n) == 0
        feed = jnp.where(
            inject, x_loc[jnp.clip(t // n, 0, k_owned - 1)], feed)
        # Stage 0 ingests from its feed register; later stages use the
        # incoming ring activation. Bubble ticks compute on stale data
        # and are masked at the write below.
        inp = jnp.where(stage == 0, feed, state)
        mb = t - stage                      # microbatch this stage holds now
        mbc = jnp.clip(mb, 0, m - 1)
        y = apply_local_layers(inp, mask_mb[mbc], mbc)
        write = (mb >= 0) & (mb < m) & (stage == n - 1)
        out_buf = out_buf.at[mbc].set(jnp.where(write, y, out_buf[mbc]))
        state = jax.lax.ppermute(y, axis, ring)
        feed = jax.lax.ppermute(feed, axis, reverse_ring)
        return (state, feed, out_buf), None

    init = (jnp.zeros_like(x_loc[0]), jnp.zeros_like(x_loc[0]),
            jnp.zeros((m,) + x_loc.shape[1:], x_loc.dtype))
    if vma:
        # Under check_vma (TP×PP path) the scan carry must be typed as
        # varying over the manual pipe axis: its values are stage-dependent
        def ensure_varying(a):
            current = getattr(jax.typeof(a), 'vma', frozenset())
            if axis in current:
                return a
            return jax.lax.pcast(a, (axis,), to='varying')

        init = jax.tree.map(ensure_varying, init)
    (_, _, out_buf), _ = jax.lax.scan(tick, init, jnp.arange(m + n - 1))
    # Per-stage buffer with a leading stage dim; only the last stage's
    # entry holds results, and the caller slices exactly that shard.
    return out_buf[None]
