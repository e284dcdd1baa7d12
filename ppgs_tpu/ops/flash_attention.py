"""Pallas flash attention for the PPG encoder (TPU).

The encoder's hot loop is self-attention over 500-frame chunks folded into a
large batch (B*chunks, heads, T, d_head). A naive XLA attention materializes
the (T x T) logits in HBM per (batch, head); this kernel keeps the online
softmax in VMEM, streaming K/V blocks, so HBM traffic is O(T*d) instead of
O(T^2) — the standard flash formulation tuned for T=512, d_head=128.

Forward-only: inference is the perf-critical path (training uses the XLA
attention which autodiffs). Falls back to XLA off-TPU.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1e30


def _fused_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    """One (batch*head) program: the full T fits VMEM at our sizes
    (T<=1024, D=128), so Q/K/V are loaded once and the whole attention
    (logits, masked softmax, PV) runs on-chip — one K/V DMA per head
    instead of one per (head, q-block)."""
    q = q_ref[0].astype(jnp.float32) * sm_scale       # (T, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0, 0, :]                          # (T,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (T, T)
    logits = jnp.where(mask[None, :] > 0, logits, NEG_INF)
    row_max = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - row_max)
    p = jnp.where(mask[None, :] > 0, p, 0.0)
    denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    o_ref[0] = (jax.lax.dot_general(
        p / denom, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(o_ref.dtype)


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_k, sm_scale, kv_len):
    """One (batch*head, q_block) program: online softmax over K/V blocks.

    mask_ref: (1, 1, kv_len) int32, 1 = valid key (shared across heads of
    one batch element via index_map).
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale          # (BQ, D)
    bq = q.shape[0]
    d = q.shape[1]

    acc = jnp.zeros((bq, d), dtype=jnp.float32)
    row_max = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    row_sum = jnp.zeros((bq, 1), dtype=jnp.float32)

    num_kb = kv_len // block_k

    def body(i, carry):
        acc, row_max, row_sum = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        mask = mask_ref[0, 0, pl.ds(i * block_k, block_k)]  # (BK,)

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        logits = jnp.where(mask[None, :] > 0, logits, NEG_INF)

        new_max = jnp.maximum(row_max, logits.max(axis=-1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max)
        p = jnp.where(mask[None, :] > 0, p, 0.0)

        acc = acc * correction + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row_sum = row_sum * correction + p.sum(axis=-1, keepdims=True)
        return acc, new_max, row_sum

    acc, row_max, row_sum = jax.lax.fori_loop(
        0, num_kb, body, (acc, row_max, row_sum))

    o_ref[0] = (acc / jnp.maximum(row_sum, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('block_q', 'block_k', 'interpret'))
def flash_attention(q, k, v, mask, block_q=DEFAULT_BLOCK_Q,
                    block_k=DEFAULT_BLOCK_K, interpret=False):
    """Masked (non-causal) flash attention.

    q, k, v: (B, H, T, D); mask: (B, T) bool, True = valid key.
    Fully-masked query rows return zeros (matches the encoder's safe
    softmax). T must be padded to a multiple of the block sizes by the
    caller (masked positions contribute nothing).
    """
    B, H, T, D = q.shape
    assert T % block_q == 0 and T % block_k == 0, (T, block_q, block_k)
    sm_scale = 1.0 / math.sqrt(D)

    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)
    mask_i = mask.astype(jnp.int32)[:, None, :]       # (B, 1, T)

    if T <= 1024:
        # Whole-sequence-in-VMEM variant: minimal DMA traffic
        out = pl.pallas_call(
            functools.partial(_fused_kernel, sm_scale=sm_scale),
            grid=(B * H,),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda b: (b // H, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            interpret=interpret,
        )(mask_i, qf, kf, vf)
        return out.reshape(B, H, T, D)

    grid = (B * H, T // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k,
                          sm_scale=sm_scale, kv_len=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, i: (b // H, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=interpret,
    )(mask_i, qf, kf, vf)

    return out.reshape(B, H, T, D)


def supported():
    """Whether the Pallas kernel can run on the current default backend."""
    return jax.default_backend() == 'tpu'
