"""Pallas fused attention for the PPG encoder (TPU).

The encoder's hot loop is self-attention over 500-frame chunks folded into a
large batch. Two TPU-first design points:

1. **No layout transposes.** QKV stay in the model's native (B, T, C)
   activation layout; each grid program slices its head's D=128 channels
   directly via the BlockSpec index map (the head offset is a block index in
   the C dimension). The (B,T,H,D) <-> (B,H,T,D) permutes that dominate a
   naive attention at these sizes never materialize.
2. **Whole sequence in VMEM.** At T<=1024, D=128 a head's Q/K/V (256 KB
   each) fit comfortably in VMEM, so logits, masked softmax, and PV all run
   on-chip with one DMA per operand: HBM traffic is O(T*D), not O(T^2).

A blocked flash variant handles T>1024 (legacy unchunked long inputs).
Forward-only: inference is the perf-critical path (training uses the XLA
attention, which autodiffs). Numerics: fp32 accumulation via
preferred_element_type on the MXU.
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


def _causal_valid(t_rows, t_cols, row_offset=0):
    """(t_rows, t_cols) bool: global row index >= global col index
    (row block starts at ``row_offset``; keys start at column 0)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_rows, t_cols), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t_rows, t_cols), 1)
    return rows + row_offset >= cols


def _fused_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale,
                  causal=False):
    """One (batch, head) program; refs are (1, T, D) head slices.

    Dots run in the INPUT dtype (bf16 on the production path — fp32 MXU
    passes run at a fraction of bf16 rate) with fp32 accumulation; softmax
    statistics are always fp32, and sm_scale is applied to the fp32 logits
    (exact for any d_head). ``causal`` adds a lower-triangular iota mask
    (reference config/causal_transformer.py: IS_CAUSAL streaming-style
    masked attention)."""
    q = q_ref[0]                                      # (T, D), native dtype
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0, :]                          # (T,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale    # (T, T) fp32
    valid = mask[None, :] > 0
    if causal:
        valid = valid & _causal_valid(*logits.shape)
    logits = jnp.where(valid, logits, NEG_INF)
    row_max = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - row_max)
    p = jnp.where(valid, p, 0.0)
    denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    o_ref[0] = (jax.lax.dot_general(
        (p / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(o_ref.dtype)


def _fused_kernel_packed(mask_ref, q_ref, k_ref, v_ref, o_ref,
                         *, sm_scale, heads_per_block, d_head,
                         causal=False):
    """One (batch, head-group) program for d_head < 128: the 128-channel
    block packs ``heads_per_block`` heads side by side; each head's
    attention runs separately on its 64-lane slice (static unroll), so
    small-head models (wav2vec2: 12 heads x 64) keep the no-transpose
    layout and VMEM-resident softmax. Dot dtypes as in _fused_kernel."""
    q = q_ref[0]                                      # (T, P*dh)
    k = k_ref[0]
    v = v_ref[0]
    mask = mask_ref[0, 0, :]                          # (T,)
    T = q.shape[0]
    valid = mask[None, :] > 0
    if causal:
        valid = valid & _causal_valid(T, T)

    outs = []
    for j in range(heads_per_block):
        sl = slice(j * d_head, (j + 1) * d_head)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale    # (T, T) fp32
        logits = jnp.where(valid, logits, NEG_INF)
        row_max = logits.max(axis=-1, keepdims=True)
        p = jnp.exp(logits - row_max)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
        outs.append(jax.lax.dot_general(
            (p / denom).astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_k, block_q, sm_scale, kv_len, causal=False):
    """One (batch, head, q_block) program: online softmax over K/V blocks.
    Dot dtypes as in _fused_kernel (native-dtype operands, fp32
    accumulation/statistics). ``causal``: K/V blocks strictly above the
    diagonal are skipped entirely (dynamic fori bound); the diagonal block
    applies the iota triangle."""
    q = q_ref[0]                                      # (BQ, D)
    bq, d = q.shape
    qi = pl.program_id(2)
    row0 = qi * block_q

    acc = jnp.zeros((bq, d), dtype=jnp.float32)
    row_max = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    row_sum = jnp.zeros((bq, 1), dtype=jnp.float32)

    # Static trip count even when causal (a program_id-dependent bound
    # would lower to a dynamic while loop); above-diagonal blocks are
    # fully masked instead. This path only serves legacy unchunked long
    # inputs — correctness over peak efficiency.
    num_kb = kv_len // block_k

    def body(i, carry):
        acc, row_max, row_sum = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        mask = mask_ref[0, 0, pl.ds(i * block_k, block_k)]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        valid = mask[None, :] > 0
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            valid = valid & (rows + row0 >= cols + i * block_k)
        logits = jnp.where(valid, logits, NEG_INF)

        new_max = jnp.maximum(row_max, logits.max(axis=-1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max)
        p = jnp.where(valid, p, 0.0)

        acc = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        row_sum = row_sum * correction + p.sum(axis=-1, keepdims=True)
        return acc, new_max, row_sum

    acc, row_max, row_sum = jax.lax.fori_loop(
        0, num_kb, body, (acc, row_max, row_sum))

    o_ref[0] = (acc / jnp.maximum(row_sum, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('num_heads', 'block_q', 'block_k', 'causal',
                     'interpret'))
def flash_attention(q, k, v, mask, num_heads,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    causal=False, interpret=False):
    """Masked multi-head attention, channels-packed layout.

    q, k, v: (B, T, C) with C = num_heads * d_head (the model's native
    activation layout); mask: (B, T) bool, True = valid key. Returns
    (B, T, C). Fully-masked query rows return zeros. T must be a multiple
    of the block sizes (pad + mask at the call site). ``causal`` adds the
    lower-triangular mask (reference IS_CAUSAL semantics).
    """
    B, T, C = q.shape
    D = C // num_heads
    assert C % num_heads == 0
    sm_scale = 1.0 / math.sqrt(D)

    mask_i = mask.astype(jnp.int32)[:, None, :]       # (B, 1, T)

    # Small heads (D < 128): pack 128/D heads per 128-channel block and
    # unroll inside the kernel — TPU tiling needs 128-lane minor blocks
    if D < 128 and T <= 1024:
        per_block = 128 // D
        assert 128 % D == 0 and num_heads % per_block == 0, (D, num_heads)
        assert T % 8 == 0, T
        groups = num_heads // per_block
        out = pl.pallas_call(
            functools.partial(_fused_kernel_packed, sm_scale=sm_scale,
                              heads_per_block=per_block, d_head=D,
                              causal=causal),
            grid=(B, groups),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 128), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 128), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 128), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, 128), lambda b, h: (b, 0, h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
            interpret=interpret,
        )(mask_i, q, k, v)
        return out

    assert T % block_q == 0 and T % block_k == 0, (T, block_q, block_k)

    # Head h occupies channels [h*D, (h+1)*D): BlockSpec block index h in
    # the C dimension slices it with no transpose.
    if T <= 1024:
        out = pl.pallas_call(
            functools.partial(_fused_kernel, sm_scale=sm_scale,
                              causal=causal),
            grid=(B, num_heads),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, D), lambda b, h: (b, 0, h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, D), lambda b, h: (b, 0, h),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
            interpret=interpret,
        )(mask_i, q, k, v)
        return out

    grid = (B, num_heads, T // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, block_q=block_q,
                          sm_scale=sm_scale, kv_len=T, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, D), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, h, i: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, h, i: (b, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), q.dtype),
        interpret=interpret,
    )(mask_i, q, k, v)
    return out


def supported():
    """Whether the Pallas kernel can run on the current default backend."""
    return jax.default_backend() == 'tpu'


###############################################################################
# Fused attention with an additive score bias (conformer rel-pos attention)
###############################################################################
#
# The conformer's Transformer-XL attention adds a relative-position term:
# scores = (q_u k^T + rel_shift(q_v pos^T)) / sqrt(d). The content scores,
# softmax, and probabilities are all (B, H, T, T) — the bottleneck
# pipeline's HBM hot spot. This kernel takes the (unavoidable, batch-
# dependent) shifted position term as an INPUT and computes content
# scores + add + masked softmax + PV in VMEM: one (B, H, T, T) read
# replaces ~4 materializations. Heads are zero-padded to 64 lanes
# (d_k=36 -> 64; zero-padded dims change no dot product) and packed two
# per 128-lane block like _fused_kernel_packed.


def _fused_kernel_bias(mask_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                       *, sm_scale, heads_per_block, d_head, block_b,
                       legacy_shift):
    """block_b windows x heads_per_block heads per program (small-program
    grids are launch-overhead-bound at these sizes: 128 single-window
    programs measured 4.2 ms where the compute+DMA floor is ~0.8 ms).

    ``legacy_shift``: the bias block is the zero-column-padded UNSHIFTED
    position term viewed as (.., T+1, T); dropping its first sublane row
    IS the ESPnet legacy rel_shift (a free in-VMEM slice — the XLA
    formulation's misaligned (.., T, T+1) copies measured 4.2 ms)."""
    q = q_ref[...]                                    # (bb, T, P*dh)
    k = k_ref[...]
    v = v_ref[...]
    mask = mask_ref[...] > 0                          # (bb, 1, T)

    outs = []
    for j in range(heads_per_block):
        sl = slice(j * d_head, (j + 1) * d_head)
        bias = (bias_ref[:, j, 1:, :] if legacy_shift
                else bias_ref[:, j])                  # (bb, T, T)
        logits = (jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            + bias.astype(jnp.float32)) * sm_scale    # (bb, T, T)
        logits = jnp.where(mask, logits, NEG_INF)
        row_max = jnp.maximum(logits.max(axis=-1, keepdims=True), -1e29)
        p = jnp.exp(logits - row_max)
        p = jnp.where(mask, p, 0.0)
        denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
        outs.append(jax.lax.dot_general(
            (p / denom).astype(v.dtype), v[..., sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))      # (bb, T, dh)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bias_block_b(B, T, per_block):
    """Largest divisor of B whose (bias + fp32 scores + qkv) fits ~40 MB."""
    import os

    override = os.environ.get('PPGS_TPU_BIAS_BLOCK_B')
    if override:
        return max(1, min(int(override), B))
    budget = 40 * 1024 * 1024
    for bb in (8, 4, 2, 1):
        if B % bb:
            continue
        est = (bb * per_block * T * T * 2      # bias block (bf16)
               + bb * T * T * 4 * 2            # ~2 live fp32 score slabs
               + 8 * bb * T * 128 * 2)         # q/k/v/out + double-buffer
        if est <= budget:
            return bb
    return 1


@functools.partial(jax.jit, static_argnames=('num_heads', 'legacy_shift',
                                             'interpret'))
def fused_attention_bias(q, k, v, bias, mask, num_heads,
                         legacy_shift=False, interpret=False):
    """softmax((q k^T + bias) * sm_scale) v with VMEM-resident scores.

    q, k, v: (B, T, H, d_k) head-split layout (any d_k <= 64); bias:
    (B, H, T, T) additive pre-scale score term — or, with
    ``legacy_shift=True``, the (B, H, T+1, T) zero-column-padded
    UNSHIFTED term (``concat([zeros(.., T, 1), bd], -1).reshape(B, H,
    T+1, T)``) whose ESPnet legacy rel_shift the kernel applies as a free
    sublane slice. mask: (B, T) bool valid keys. sm_scale = 1/sqrt(d_k).
    Returns (B, T, H, d_k). T must be a multiple of 8.
    """
    B, T, H, dk = q.shape
    assert H == num_heads and T % 8 == 0, (H, num_heads, T)
    assert dk <= 64, dk
    assert bias.shape[2] == T + (1 if legacy_shift else 0), bias.shape
    sm_scale = 1.0 / math.sqrt(dk)
    tb = T + (1 if legacy_shift else 0)

    # Zero-pad each head to 64 lanes, pack 2 heads per 128-lane block
    dp = 64
    per_block = 128 // dp
    assert H % per_block == 0, H
    bb = _bias_block_b(B, T, per_block)

    def pack(a):
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, dp - dk)))
        return a.reshape(B, T, H * dp)

    qp, kp, vp = pack(q), pack(k), pack(v)
    mask_i = mask.astype(jnp.int32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(_fused_kernel_bias, sm_scale=sm_scale,
                          heads_per_block=per_block, d_head=dp,
                          block_b=bb, legacy_shift=legacy_shift),
        grid=(B // bb, H // per_block),
        in_specs=[
            pl.BlockSpec((bb, 1, T), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 128), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 128), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, T, 128), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, per_block, tb, T), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, T, 128), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H * dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * dp,
            bytes_accessed=B * H * T * T * 2 + 4 * B * T * H * dp * 2,
            transcendentals=B * H * T * T),
        interpret=interpret,
    )(mask_i, qp, kp, vp, bias)
    return out.reshape(B, T, H, dp)[..., :dk]


###############################################################################
# Differentiable fused attention (training path)
###############################################################################
#
# Standard flash recipe: the forward saves (o, lse) per query row; the
# backward recomputes the probabilities in VMEM from (q, k, lse) and forms
# dq/dk/dv with five MXU dots per (batch, head) program — the (T, T)
# probability/score tensors never touch HBM in either direction, which is
# exactly the train step's HBM hot spot (models/transformer.py).
# Attention-probability dropout (reference: torch TransformerEncoderLayer
# p=0.1, trained under autocast) runs INSIDE the kernel with the TPU PRNG;
# the backward reseeds the identical (batch, head) stream, so the mask
# never materializes in HBM either.


def _dropout_keep(shape, rate, seed, pid, interpret):
    """Deterministic per-(batch, head) keep-mask; ``pid`` folds the
    (batch, head) grid position into one scalar (the TPU PRNG accepts at
    most two seed values).

    Compiled TPU path: hardware PRNG (pltpu.prng_*), seeded per program.
    Interpret mode (CPU tests): threefry fallback — prng_seed has no CPU
    lowering. Both are deterministic per (seed, pid); forward and
    backward regenerate the identical mask."""
    if interpret:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), pid)
        return jax.random.uniform(key, shape) < (1.0 - rate)
    pltpu.prng_seed(seed, pid)
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(round((1.0 - rate) * float(2 ** 32 - 1)))
    return pltpu.bitcast(bits, jnp.uint32) <= threshold


def _train_fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref,
                      o_ref, lse_ref, *, sm_scale, rate, heads,
                      causal, interpret):
    b, h = pl.program_id(0), pl.program_id(1)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    mask = mask_ref[0, 0, :] > 0                         # (T,)
    valid = mask[None, :]
    if causal:
        valid = valid & _causal_valid(q.shape[0], q.shape[0])

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    logits = jnp.where(valid, logits, NEG_INF)
    row_max = jnp.maximum(logits.max(axis=-1, keepdims=True), -1e29)
    p = jnp.exp(logits - row_max)
    p = jnp.where(valid, p, 0.0)
    denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    lse_ref[0, 0, 0] = (row_max + jnp.log(denom))[:, 0]
    pn = p / denom
    if rate > 0.0:
        keep = _dropout_keep(pn.shape, rate, seed_ref[0],
                             b * heads + h, interpret)
        pn = jnp.where(keep, pn * (1.0 / (1.0 - rate)), 0.0)
    o_ref[0] = jax.lax.dot_general(
        pn.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, o_ref,
                      lse_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, sm_scale, rate, heads, causal, interpret):
    b, h = pl.program_id(0), pl.program_id(1)
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    o, do = o_ref[0], do_ref[0]
    lse = lse_ref[0, 0, 0][:, None]                      # (T, 1) fp32
    mask = mask_ref[0, 0, :] > 0
    valid = mask[None, :]
    if causal:
        valid = valid & _causal_valid(q.shape[0], q.shape[0])

    # Recompute normalized probabilities from the saved statistics
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    pn = jnp.exp(logits - lse)
    pn = jnp.where(valid, pn, 0.0)                       # (T, T) fp32

    if rate > 0.0:
        # Same (seed, batch*heads+head) stream as the forward
        keep = _dropout_keep(pn.shape, rate, seed_ref[0],
                             b * heads + h, interpret)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, pn * inv, 0.0)              # dropped+scaled
    else:
        pd = pn

    # D_i = sum_j dO_ij O_ij  ==  rowsum(g * pd)  (flash-backward identity)
    d_row = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=-1, keepdims=True)
    g = jax.lax.dot_general(                              # dL/d pd
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        g = jnp.where(keep, g * inv, 0.0)                # dL/d pn
    ds = pn * (g - d_row)                                # dL/d logits (fp32)

    dsc = (ds * sm_scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsc, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsc, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _head_specs(T, D):
    # Index maps receive the scalar-prefetch ref after the grid ids
    def idx(b, h, *_):
        return (b, 0, h)
    return pl.BlockSpec((1, T, D), idx, memory_space=pltpu.VMEM)


def flash_attention_train(q, k, v, mask, num_heads, dropout_rate=0.0,
                          seed=None, causal=False, interpret=False):
    """Differentiable masked multi-head attention with in-kernel
    attention-probability dropout.

    Same (B, T, C) channels-packed layout and zero-rows-for-masked-queries
    convention as :func:`flash_attention`; requires d_head >= 128 (the PPG
    encoder's geometry) and T <= MAX (whole sequence in VMEM). ``seed``:
    int32 scalar array deriving the per-(batch, head) dropout streams
    (ignored at rate 0). The backward recomputes probabilities from saved
    (o, lse) and reseeds the identical dropout stream — no (B, H, T, T)
    tensor ever reaches HBM in either pass.
    """
    seed_i = (jnp.zeros((1,), jnp.int32) if seed is None
              else jnp.asarray(seed, jnp.int32).reshape(1))
    return _flash_train(q, k, v, mask, seed_i, num_heads,
                        float(dropout_rate), bool(causal), interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_train(q, k, v, mask, seed_i, num_heads, dropout_rate,
                 causal, interpret):
    out, _ = _train_fwd(q, k, v, mask, seed_i, num_heads, dropout_rate,
                        causal, interpret)
    return out


def _train_fwd(q, k, v, mask, seed_i, num_heads, dropout_rate, causal,
               interpret):
    B, T, C = q.shape
    D = C // num_heads
    assert D % 128 == 0 and T % 8 == 0, (D, T)
    sm_scale = 1.0 / math.sqrt(D)
    mask_i = mask.astype(jnp.int32)[:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_heads),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _head_specs(T, D), _head_specs(T, D), _head_specs(T, D),
        ],
        out_specs=[
            _head_specs(T, D),
            # (B, H, 1, T) with a unit dim so the block's last two dims
            # equal the array's (TPU tiling: last two dims must be
            # (8,128)-divisible or whole)
            pl.BlockSpec((1, 1, 1, T), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    o, lse = pl.pallas_call(
        functools.partial(_train_fwd_kernel, sm_scale=sm_scale,
                          rate=float(dropout_rate), heads=num_heads,
                          causal=causal, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), q.dtype),
            jax.ShapeDtypeStruct((B, num_heads, 1, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The (T, T) fp32 logit/probability slabs exceed the default
            # 16 MB scoped-vmem cap above T=512
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * T * T * D,
            bytes_accessed=4 * B * T * C * 2,
            transcendentals=B * num_heads * T * T),
        interpret=interpret,
    )(seed_i, mask_i, q, k, v)
    return o, (q, k, v, mask_i, seed_i, o, lse)


def _train_fwd_rule(q, k, v, mask, seed_i, num_heads, dropout_rate,
                    causal, interpret):
    return _train_fwd(q, k, v, mask, seed_i, num_heads, dropout_rate,
                      causal, interpret)


def _train_bwd_rule(num_heads, dropout_rate, causal, interpret, residuals,
                    do):
    q, k, v, mask_i, seed_i, o, lse = residuals
    B, T, C = q.shape
    D = C // num_heads
    sm_scale = 1.0 / math.sqrt(D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_heads),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b, h, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _head_specs(T, D), _head_specs(T, D), _head_specs(T, D),
            _head_specs(T, D),
            pl.BlockSpec((1, 1, 1, T), lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            _head_specs(T, D),
        ],
        out_specs=[_head_specs(T, D)] * 3,
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_train_bwd_kernel, sm_scale=sm_scale,
                          rate=float(dropout_rate), heads=num_heads,
                          causal=causal, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, T, C), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            # ~6 live (T, T) fp32 slabs (recomputed scores, probabilities,
            # dropout variants, g, ds): ~24 MB at T=1024 — well over the
            # default 16 MB scoped-vmem cap
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * num_heads * T * T * D,
            bytes_accessed=8 * B * T * C * 2,
            transcendentals=B * num_heads * T * T),
        interpret=interpret,
    )(seed_i, mask_i, q, k, v, o, lse, do)

    # Cotangents for (q, k, v, mask, seed_i): mask/seed are integer-typed
    # primals, whose tangent type is float0
    import numpy as np

    B_, _, T_ = mask_i.shape
    return (dq, dk, dv,
            np.zeros((B_, T_), dtype=jax.dtypes.float0),
            np.zeros((1,), dtype=jax.dtypes.float0))


_flash_train.defvjp(_train_fwd_rule, _train_bwd_rule)
