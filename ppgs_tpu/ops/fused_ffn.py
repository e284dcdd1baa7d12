"""Pallas fused FFN + residual + LayerNorm for the PPG encoder (TPU).

The encoder's FFN pair dominates HBM traffic: at (M=B*T, C=256, F=2048) the
hidden activation is 8x the block input, and XLA materializes it to HBM
between the two matmuls (measured ~0.8 ms/layer on the bench workload —
HBM-bound, not MXU-bound). This kernel computes

    out = LayerNorm(x + relu(x @ w1 + b1) @ w2 + b2)

for one M-block per grid program with the (block_m, F) hidden resident in
VMEM: HBM traffic drops from ~2*M*F + 2*M*C to 2*M*C per layer (~9x less).
Weights use constant index maps, so Mosaic keeps them resident across
programs. Forward-only (inference path; training keeps the autodiffable XLA
formulation). fp32 accumulation on the MXU via preferred_element_type; LN
statistics in fp32, matching models.transformer._layer_norm.

Reference behavior: the post-LN torch.nn.TransformerEncoderLayer FFN half
(ppgs/model/transformer.py:13-114 uses torch defaults: ReLU, dim 2048).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_M = 512
LN_EPS = 1e-5


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, beta_ref, o_ref,
            *, compute_dtype):
    x = x_ref[...]                                       # (bm, C)
    h = jax.lax.dot(
        x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[...].astype(jnp.float32), 0.0)
    y = jax.lax.dot(
        h.astype(compute_dtype), w2_ref[...],
        preferred_element_type=jnp.float32)
    r = x.astype(jnp.float32) + y + b2_ref[...].astype(jnp.float32)
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    n = (r - mean) * jax.lax.rsqrt(var + LN_EPS)
    out = n * g_ref[...].astype(jnp.float32) + beta_ref[...].astype(
        jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_m', 'interpret'))
def ffn_residual_layernorm(x, w1, b1, w2, b2, ln_scale, ln_bias,
                           block_m=DEFAULT_BLOCK_M, interpret=False):
    """LayerNorm(x + relu(x @ w1 + b1) @ w2 + b2) on (..., M, C) inputs.

    x: (B, T, C) or (M, C); weights w1 (C, F), w2 (F, C); returns x.dtype.
    M (=B*T) must be a multiple of block_m (callers pad T; see
    models/transformer.forward which already pads T to the flash block).
    """
    orig_shape = x.shape
    C = x.shape[-1]
    F = w1.shape[-1]
    xm = x.reshape(-1, C)
    M = xm.shape[0]
    if M % block_m:
        raise ValueError(f'M={M} not a multiple of block_m={block_m}')
    compute_dtype = w1.dtype

    grid = (M // block_m,)
    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, C), lambda i: (i, 0)),
            pl.BlockSpec((C, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(
        xm.astype(compute_dtype),
        w1, b1.reshape(1, F), w2, b2.reshape(1, C),
        ln_scale.reshape(1, C), ln_bias.reshape(1, C),
    )
    return out.reshape(orig_shape)


###############################################################################
# Differentiable fused FFN with in-kernel dropout (training path)
###############################################################################
#
# Measured on the train step (scripts/exp_train_breakdown.py): dropout is
# 44% of step time (180 -> 101 ms at rate 0), dominated by the FFN sites'
# mask generation + where-passes over the (M, F) hidden and their
# backward replay through HBM. Same recipe as the attention train kernel
# (ops/flash_attention.py): masks come from the TPU hardware PRNG inside
# the kernel, deterministic per (seed, row-block), and the backward
# reseeds the identical stream — no mask ever reaches HBM. The hidden
# activation is recomputed in the backward (flash-style), so residuals
# are just the inputs.
#
#   y = drop2(drop1(relu(x @ w1 + b1)) @ w2 + b2)
#
# (the caller keeps residual + LayerNorm in XLA — their backward is
# cheap). Weight gradients accumulate across row-block grid steps into
# revisited output blocks ('arbitrary' grid).


def _keep_bits(shape, rate, interpret, key):
    if interpret:
        return jax.random.uniform(key, shape) < (1.0 - rate)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(round((1.0 - rate) * float(2 ** 32 - 1)))
    return pltpu.bitcast(bits, jnp.uint32) <= threshold


def _train_keys(seed_ref, interpret):
    """Seed the per-block stream; in interpret mode return threefry keys
    (the TPU PRNG has no CPU lowering)."""
    i = pl.program_id(0)
    if interpret:
        base = jax.random.fold_in(jax.random.PRNGKey(seed_ref[0]), i)
        return jax.random.split(base)
    pltpu.prng_seed(seed_ref[0], i)
    return None, None


def _ffn_train_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          o_ref, *, rate, compute_dtype, interpret):
    k1, k2 = _train_keys(seed_ref, interpret)
    x = x_ref[...]
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(compute_dtype) + b1_ref[...], 0.0)
    if rate > 0.0:
        inv = 1.0 / (1.0 - rate)
        h = jnp.where(_keep_bits(h.shape, rate, interpret, k1),
                      h * inv, 0.0)
    y = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    y = y.astype(compute_dtype) + b2_ref[...]
    if rate > 0.0:
        y = jnp.where(_keep_bits(y.shape, rate, interpret, k2),
                      y * inv, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _ffn_train_bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                          w1t_ref, w2t_ref, g_ref,
                          dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                          *, rate, compute_dtype, interpret):
    i = pl.program_id(0)
    k1, k2 = _train_keys(seed_ref, interpret)
    x = x_ref[...]
    # Recompute the forward (flash-style; the hidden never hit HBM).
    # PRNG draws MUST replay in the forward's order: keep1 then keep2.
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = jnp.maximum(h.astype(compute_dtype) + b1_ref[...], 0.0)
    if rate > 0.0:
        inv = 1.0 / (1.0 - rate)
        keep1 = _keep_bits(h.shape, rate, interpret, k1)
        hd = jnp.where(keep1, h * inv, 0.0)
        keep2 = _keep_bits((x.shape[0], w2_ref.shape[1]), rate,
                           interpret, k2)
    else:
        hd = h

    g = g_ref[...].astype(jnp.float32)
    if rate > 0.0:
        g = jnp.where(keep2, g * inv, 0.0)               # d y_pre-drop2
    gc = g.astype(compute_dtype)

    dhd = jax.lax.dot(gc, w2t_ref[...],
                      preferred_element_type=jnp.float32)  # (bm, F)
    if rate > 0.0:
        dhd = jnp.where(keep1, dhd * inv, 0.0)
    # relu' from the (rounded) forward value; the compare runs in fp32 —
    # the v5e target rejects bf16 vector comparisons
    dh = jnp.where(h.astype(jnp.float32) > 0.0, dhd, 0.0)
    dhc = dh.astype(compute_dtype)

    dx_ref[...] = jax.lax.dot(
        dhc, w1t_ref[...],
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dw1_ref[...] += jax.lax.dot_general(
        x, dhc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (C, F)
    db1_ref[...] += dh.sum(axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        hd, gc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (F, C)
    db2_ref[...] += g.sum(axis=0, keepdims=True)


def ffn_train(x, w1, b1, w2, b2, dropout_rate=0.0, seed=None,
              block_m=DEFAULT_BLOCK_M, interpret=False):
    """Differentiable drop2(drop1(relu(x @ w1 + b1)) @ w2 + b2).

    x: (B, T, C) or (M, C) in the compute dtype; M must be a multiple of
    ``block_m``. ``seed``: int32 scalar array deriving the per-row-block
    dropout streams (ignored at rate 0).
    """
    seed_i = (jnp.zeros((1,), jnp.int32) if seed is None
              else jnp.asarray(seed, jnp.int32).reshape(1))
    orig_shape = x.shape
    if x.ndim == 3:
        x = x.reshape(-1, x.shape[-1])
    out = _ffn_train(x, w1, b1, w2, b2, seed_i, float(dropout_rate),
                     int(block_m), bool(interpret))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ffn_train(x, w1, b1, w2, b2, seed_i, rate, block_m, interpret):
    out, _ = _ffn_train_fwd(x, w1, b1, w2, b2, seed_i, rate, block_m,
                            interpret)
    return out


def _specs(block_m, C, F):
    # Index maps receive the scalar-prefetch ref after the grid id
    return [
        pl.BlockSpec((block_m, C), lambda i, *_: (i, 0)),
        pl.BlockSpec((C, F), lambda i, *_: (0, 0)),
        pl.BlockSpec((1, F), lambda i, *_: (0, 0)),
        pl.BlockSpec((F, C), lambda i, *_: (0, 0)),
        pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
    ]


def _ffn_train_fwd(x, w1, b1, w2, b2, seed_i, rate, block_m, interpret):
    M, C = x.shape
    F = w1.shape[1]
    assert M % block_m == 0, (M, block_m)
    cd = x.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // block_m,),
        in_specs=_specs(block_m, C, F),
        out_specs=pl.BlockSpec((block_m, C), lambda i, *_: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_ffn_train_fwd_kernel, rate=rate,
                          compute_dtype=cd, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, C), cd),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * M * C * F,
            bytes_accessed=2 * M * C * 2 + 4 * C * F * 2,
            transcendentals=0),
        interpret=interpret,
    )(seed_i, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, (x, w1, b1, w2, b2, seed_i)


def _ffn_train_bwd(rate, block_m, interpret, residuals, g):
    x, w1, b1, w2, b2, seed_i = residuals
    M, C = x.shape
    F = w1.shape[1]
    cd = x.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // block_m,),
        in_specs=_specs(block_m, C, F) + [
            pl.BlockSpec((F, C), lambda i, *_: (0, 0)),    # w1^T
            pl.BlockSpec((C, F), lambda i, *_: (0, 0)),    # w2^T
            pl.BlockSpec((block_m, C), lambda i, *_: (i, 0)),  # g
        ],
        out_specs=[
            pl.BlockSpec((block_m, C), lambda i, *_: (i, 0)),
            pl.BlockSpec((C, F), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, F), lambda i, *_: (0, 0)),
            pl.BlockSpec((F, C), lambda i, *_: (0, 0)),
            pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
        ],
    )
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ffn_train_bwd_kernel, rate=rate,
                          compute_dtype=cd, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((M, C), cd),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            # The recomputed hidden + dropout masks + weight-grad
            # accumulators exceed the default 16 MB scoped-vmem stack
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * M * C * F,
            bytes_accessed=4 * M * C * 2 + 8 * C * F * 4,
            transcendentals=0),
        interpret=interpret,
    )(seed_i, x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      w1.T, w2.T, g)

    import numpy as np

    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0))


_ffn_train.defvjp(_ffn_train_fwd, _ffn_train_bwd)
