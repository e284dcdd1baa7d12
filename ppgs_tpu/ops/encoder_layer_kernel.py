"""Whole encoder layer as ONE Pallas kernel (TPU inference hot path).

A post-LN transformer layer (reference semantics:
torch.nn.TransformerEncoderLayer, ppgs/model/transformer.py:13-114) is, per
chunk window, a chain of 8 matmuls + softmax + 2 LayerNorms. Issued as
separate XLA ops each step round-trips the (T, C) activations (and the 8x
wider FFN hidden) through HBM; at the PPG encoder's sizes (T=512, C=256,
F=2048) the whole chain's working set is ~12 MB — it fits in VMEM. This
kernel runs the full layer per grid program (one program per batch window):

    q,k,v = x@wq+bq, x@wk+bk, x@wv+bv          (packed qkv also fine)
    a     = softmax(mask(q_h @ k_h^T * s)) @ v_h   per head (static unroll)
    r     = LN1(x + a @ wo + bo)
    out   = LN2(r + relu(r@w1+b1) @ w2 + b2)

HBM traffic per layer: read x (T,C) + write out (T,C) + weights once —
~20x less than the unfused chain. fp32 residuals/LN statistics and fp32 MXU
accumulation (preferred_element_type); bf16 matmul operands. Forward-only:
training keeps the autodiffable XLA formulation.

Numerics match models.transformer's XLA path within bf16 rounding: fully
masked query rows produce zeros (safe softmax), identical to the flash
kernel's convention.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = -1e30
LN_EPS = 1e-5
MAX_SEQ = 1024          # whole-sequence-in-VMEM limit (see flash_attention)


def _ln(r, g, b):
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    return (r - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _kernel(x_ref, mask_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, g1_ref, be1_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
            o_ref, *, heads, sm_scale, compute_dtype):
    x32 = x_ref[0].astype(jnp.float32)                  # (T, C)
    xc = x32.astype(compute_dtype)
    mask = mask_ref[0, 0, :]                            # (T,)

    def dot(a, w_ref, b_ref):
        out = jax.lax.dot(a, w_ref[...],
                          preferred_element_type=jnp.float32)
        return out + b_ref[...].astype(jnp.float32)

    q = dot(xc, wq_ref, bq_ref).astype(compute_dtype)   # (T, C)
    k = dot(xc, wk_ref, bk_ref).astype(compute_dtype)
    v = dot(xc, wv_ref, bv_ref).astype(compute_dtype)

    d_head = q.shape[-1] // heads
    outs = []
    for h in range(heads):                               # static unroll
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        logits = jnp.where(mask[None, :] > 0, logits, NEG_INF)
        row_max = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - row_max)
        p = jnp.where(mask[None, :] > 0, p, 0.0)
        denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
        outs.append(jax.lax.dot(
            (p / denom).astype(compute_dtype), v[:, sl],
            preferred_element_type=jnp.float32).astype(compute_dtype))
    a = jnp.concatenate(outs, axis=-1)                   # (T, C)

    r = _ln(x32 + dot(a, wo_ref, bo_ref),
            g1_ref[...].astype(jnp.float32),
            be1_ref[...].astype(jnp.float32))            # (T, C) fp32

    h1 = jnp.maximum(dot(r.astype(compute_dtype), w1_ref, b1_ref), 0.0)
    y = dot(h1.astype(compute_dtype), w2_ref, b2_ref)
    out = _ln(r + y,
              g2_ref[...].astype(jnp.float32),
              be2_ref[...].astype(jnp.float32))
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=('heads', 'compute_dtype', 'interpret'))
def encoder_layer(x, mask, attn, norm1, ffn, norm2, heads,
                  compute_dtype=jnp.bfloat16, interpret=False):
    """One full post-LN encoder layer on (B, T, C) activations.

    attn/norm1/ffn/norm2 are the models.transformer layer param sub-trees.
    mask: (B, T), nonzero = valid key. Returns x.dtype.
    """
    B, T, C = x.shape
    F = ffn['w1'].shape[-1]
    cd = jnp.dtype(compute_dtype)

    def w(a):
        return a.astype(cd)

    def row(a):
        return a.reshape(1, -1).astype(jnp.float32)

    sm_scale = 1.0 / (C // heads) ** 0.5
    kernel = functools.partial(
        _kernel, heads=heads, sm_scale=sm_scale, compute_dtype=cd)

    cspec = pl.BlockSpec((C, C), lambda b: (0, 0))
    crow = pl.BlockSpec((1, C), lambda b: (0, 0))
    frow = pl.BlockSpec((1, F), lambda b: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),
            cspec, crow, cspec, crow, cspec, crow,       # wq..bv
            cspec, crow, crow, crow,                     # wo, bo, g1, be1
            pl.BlockSpec((C, F), lambda b: (0, 0)), frow,
            pl.BlockSpec((F, C), lambda b: (0, 0)), crow,
            crow, crow,                                  # g2, be2
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(
        x, mask.astype(jnp.float32).reshape(B, 1, T),
        w(attn['wq']), row(attn['bq']),
        w(attn['wk']), row(attn['bk']),
        w(attn['wv']), row(attn['bv']),
        w(attn['wo']), row(attn['bo']),
        row(norm1['scale']), row(norm1['bias']),
        w(ffn['w1']), row(ffn['b1']),
        w(ffn['w2']), row(ffn['b2']),
        row(norm2['scale']), row(norm2['bias']),
    )
