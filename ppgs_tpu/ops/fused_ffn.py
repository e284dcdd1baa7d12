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
