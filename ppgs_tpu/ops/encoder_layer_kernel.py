"""Whole encoder stack as ONE Pallas kernel (TPU inference hot path).

A post-LN transformer layer (reference semantics:
torch.nn.TransformerEncoderLayer, ppgs/model/transformer.py:13-114) is, per
chunk window, a chain of 8 matmuls + softmax + 2 LayerNorms. Issued as
separate XLA ops each step round-trips the (T, C) activations (and the 8x
wider FFN hidden) through HBM; at the PPG encoder's sizes (T=512, C=256,
F=2048) the whole chain's working set is ~12 MB — it fits in VMEM. This
kernel goes further and runs ALL layers per grid program (one program per
window block): the fp32 residual stream never leaves VMEM between layers,
so HBM traffic for the full stack is read x + write out + weights once.

Per layer, per window block:

    q,k,v = x@wq+bq, x@wk+bk, x@wv+bv
    a     = softmax(mask(q_h @ k_h^T * s)) @ v_h   per head (static unroll)
    r     = LN1(x + a @ wo + bo)
    out   = LN2(r + relu(r@w1+b1) @ w2 + b2)

Attention is BATCHED over the windows of a block (dot_general batch dims):
the kernel IR does not grow with block_b, so large window blocks compile
fast. fp32 residuals/LN statistics and fp32 MXU accumulation
(preferred_element_type); bf16 matmul operands. Forward-only: training
keeps the autodiffable XLA formulation.

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
LOG2E = 1.4426950408889634
MAX_SEQ = 1024          # whole-sequence-in-VMEM limit (see flash_attention)
FFN_ROW_TILE = 1024     # rows per FFN tile (bounds fp32 hidden to ~8 MB)


def _ln(r, g, b):
    # Two-pass moments: one-pass E[x^2]-E[x]^2 keeps an extra (rows, C)
    # fp32 slab live and blows the vmem stack at block_b >= 4
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    return (r - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _layer_body(x32, key_valid, mask_cd, wqkv, bqkv,
                wo, bo, g1, be1, w1, b1, w2, b2, g2, be2,
                *, heads, compute_dtype, block_b, seq_len,
                activation='relu'):
    """One post-LN layer on a flattened fp32 (block_b*T, C) slab.

    The QKV projection is ONE fused (C, 3C) matmul (wqkv/bqkv carry the
    softmax scale — times log2(e) on the fast path — pre-folded into the
    q third); per-head attention outputs accumulate straight through
    their wo row-slab (two K=d_head dots) instead of a concatenate + one
    K=C dot, so no head-merge relayout materializes."""
    T = seq_len
    C = x32.shape[-1]
    xc = x32.astype(compute_dtype)

    def dot(a, w):
        return jax.lax.dot(a, w, preferred_element_type=jnp.float32)

    def dot_cd(a, w, b):
        # fp32 MXU accumulation (Mosaic requires 32-bit acc) rounded to
        # compute dtype before the bias add — bias add and downstream
        # elementwise run at bf16 vector width, like the XLA path's
        # `xc @ w + b`.
        out = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
        return out.astype(compute_dtype) + b.astype(compute_dtype)

    qkv = dot_cd(xc, wqkv, bqkv)                         # (bb*T, 3C)
    q3 = qkv[:, :C].reshape(block_b, T, C)
    k3 = qkv[:, C:2 * C].reshape(block_b, T, C)
    v3 = qkv[:, 2 * C:].reshape(block_b, T, C)

    d_head = C // heads
    fast_softmax = jnp.dtype(compute_dtype) != jnp.float32
    acc = None
    for h in range(heads):                               # static unroll
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q3[..., sl], k3[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (bb, T, T)
        if fast_softmax:
            # bf16-width softmax: row max over ALL keys (softmax is
            # shift-invariant, and padded-key logits come from real,
            # bounded activations, so no overflow risk), exp2 at compute
            # dtype (the log2(e) factor is folded into wq), and the key
            # mask applied MULTIPLICATIVELY to p after the exp — half-
            # width passes, and one mul replaces the fp32 select. (An
            # additive (bb, 1, T) bias would be cheaper still, but Mosaic
            # miscompiles broadcast-ADD of a middle-dim-1 operand onto a
            # batched-matmul result; MUL is fine.)
            row_max = logits.max(axis=-1, keepdims=True)
            p = jnp.exp2((logits - row_max).astype(compute_dtype))
            p = p * mask_cd
            denom = jnp.maximum(
                p.sum(axis=-1, keepdims=True).astype(jnp.float32), 1e-30)
        else:
            # Strict-parity path (fp32 compute): masked entries pinned to
            # -1e30 before the fp32 softmax. Clamping row_max keeps them
            # at exp(-1e30 - rm) = 0 exactly (fp32 underflow) for any
            # rm >= -1e29 — including fully-masked rows.
            logits = jnp.where(key_valid, logits, NEG_INF)
            row_max = jnp.maximum(
                logits.max(axis=-1, keepdims=True), -1e29)
            p = (jnp.exp(logits - row_max)).astype(compute_dtype)
            denom = jnp.maximum(
                p.sum(axis=-1, keepdims=True).astype(jnp.float32), 1e-30)
        # Unnormalized p through the MXU; fold 1/denom into the (T, D)
        # output (flash-attention style) — T reciprocals + T*D multiplies
        # instead of T*T divisions
        oh = jax.lax.dot_general(
            p, v3[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / denom)
        part = dot(oh.astype(compute_dtype).reshape(block_b * T, d_head),
                   wo[sl])
        acc = part if acc is None else acc + part

    r = _ln(x32 + acc + bo.astype(jnp.float32),
            g1.astype(jnp.float32), be1.astype(jnp.float32))

    # FFN tiled over row blocks: the (rows, F) fp32 hidden is the VMEM hog
    # (bb*T*F*4 bytes untiled); per-tile it is ROWS*F*4 regardless of
    # block_b. Hidden rounds to compute_dtype between the matmuls exactly
    # like the XLA path.
    rows_per_tile = min(FFN_ROW_TILE, block_b * T)
    y_parts = []
    for r0 in range(0, block_b * T, rows_per_tile):
        tile = slice(r0, r0 + rows_per_tile)
        h1 = dot_cd(r[tile].astype(compute_dtype), w1, b1)
        if activation == 'gelu':
            # tanh-approximate GELU, matching the bf16 XLA path
            # (models/w2v2.py::_gelu)
            h1 = jax.nn.gelu(h1, approximate=True)
        else:
            h1 = jnp.maximum(h1, 0.0)
        y_parts.append(dot(h1, w2) + b2.astype(jnp.float32))
    y = jnp.concatenate(y_parts, axis=0) if len(y_parts) > 1 else y_parts[0]
    return _ln(r + y, g2.astype(jnp.float32), be2.astype(jnp.float32))


def _stack_kernel(x_ref, mask_ref,
                  wqkv_ref, bqkv_ref,
                  wo_ref, bo_ref, g1_ref, be1_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
                  o_ref, *, num_layers, heads, compute_dtype,
                  block_b, seq_len, activation='relu', causal=False):
    # block_b windows per grid step, flattened to one (block_b*T, C) slab so
    # the QKV/out-proj/FFN matmuls run at M = block_b*T (better MXU
    # utilization than per-window M=T); the attention score/value matmuls
    # run batched over windows. The fp32 residual stream stays in VMEM
    # across all layers (static unroll).
    T, C = seq_len, x_ref.shape[-1]
    x32 = x_ref[...].reshape(block_b * T, C).astype(jnp.float32)
    key_valid = mask_ref[...] > 0                        # (bb, 1, T)
    mask_cd = mask_ref[...].astype(compute_dtype)
    if causal:
        # Lower-triangular iota mask folded into both mask forms once per
        # block (reference IS_CAUSAL, config/causal_transformer.py:16):
        # the per-head softmax then runs unchanged at (bb, T, T) masks
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        tri = rows >= cols
        key_valid = key_valid & tri[None]
        mask_cd = mask_cd * tri[None].astype(compute_dtype)

    for layer in range(num_layers):                      # static unroll
        x32 = _layer_body(
            x32, key_valid, mask_cd,
            wqkv_ref[layer], bqkv_ref[layer],
            wo_ref[layer], bo_ref[layer],
            g1_ref[layer], be1_ref[layer],
            w1_ref[layer], b1_ref[layer], w2_ref[layer], b2_ref[layer],
            g2_ref[layer], be2_ref[layer],
            heads=heads, compute_dtype=compute_dtype,
            block_b=block_b, seq_len=seq_len, activation=activation)
    o_ref[...] = x32.reshape(block_b, T, C).astype(o_ref.dtype)


DEFAULT_BLOCK_B = 16


# Physical VMEM per core by device_kind substring (first match wins).
# Sources: public TPU system architecture docs / scaling-book; unknown
# chips fall back conservatively to 32 MB.
_VMEM_MB = [
    ('v6', 128), ('trillium', 128),
    ('v5p', 128),
    ('v5 lite', 128), ('v5e', 128),
    ('v4', 32),
    ('v3', 16), ('v2', 16),
]
_FALLBACK_VMEM_MB = 32


def _device_vmem_bytes():
    """Physical per-core VMEM of the runtime device (no env var needed)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return _FALLBACK_VMEM_MB * 1024 * 1024
    for key, mb in _VMEM_MB:
        if key in kind:
            return mb * 1024 * 1024
    return _FALLBACK_VMEM_MB * 1024 * 1024


def _vmem_budget_bytes():
    """Per-step working-set budget: 5/8 of the device's physical VMEM
    (headroom for Mosaic's double-buffered IO pipelining and spills;
    80 MB on 128 MB parts lets wav2vec2-width layers run block_b=4 —
    measured faster than the 64 MB budget's block_b=2).
    PPGS_TPU_VMEM_BUDGET_MB overrides for experiments."""
    import os

    override = os.environ.get('PPGS_TPU_VMEM_BUDGET_MB')
    if override:
        return int(override) * 1024 * 1024
    return _device_vmem_bytes() * 5 // 8


def _vmem_limit_bytes():
    """Mosaic scoped-vmem cap: ~80% of physical (the default 16 MB cap is
    far below what large-VMEM parts can pipeline)."""
    return int(_device_vmem_bytes() * 0.8)


def _pick_block_b(B, T, C, F, num_layers=1, budget=None):
    """Largest divisor of B (<= DEFAULT_BLOCK_B) whose working set fits VMEM.

    Rough per-step VMEM: (T, C)-shaped live slabs (x32/xc/q/k/v/a/r/y ~ 30
    bytes/elem across fp32+bf16 copies) * bb + batched fp32 scores + bf16
    probs bb*T*T*6 + FFN hidden tile + resident weights (all layers) +
    double-buffered IO blocks.
    """
    import os

    override = os.environ.get('PPGS_TPU_BLOCK_B')
    if override:
        return max(1, min(int(override), B))
    if budget is None:
        budget = _vmem_budget_bytes()
    weights = num_layers * (4 * C * C + 2 * C * F) * 2
    for bb in range(min(DEFAULT_BLOCK_B, B), 0, -1):
        if B % bb:
            continue
        hidden = min(FFN_ROW_TILE, bb * T) * F * 6
        acts = bb * T * C * 30 + bb * T * T * 6 + hidden
        io = 2 * 2 * bb * T * C * 2
        if weights + acts + io <= budget:
            return bb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=('heads', 'compute_dtype', 'activation', 'causal',
                     'interpret'))
def encoder_stack(x, mask, layers, heads,
                  compute_dtype=jnp.bfloat16, activation='relu',
                  causal=False, interpret=False):
    """The full post-LN encoder stack on (B, T, C) activations, one kernel.

    layers: the models.transformer ``params['layers']`` list (each entry has
    attn/norm1/ffn/norm2 sub-trees — wav2vec2's encoder layers share this
    exact structure, so its 12 layers run here too with
    ``activation='gelu'``, one call per layer to keep resident weights
    inside VMEM). mask: (B, T), nonzero = valid key. Heads of any width
    that divides 128 work (64-lane slices for wav2vec2's 12 x 64).
    Returns x.dtype.
    """
    B, T, C = x.shape
    L = len(layers)
    F = layers[0]['ffn']['w1'].shape[-1]
    cd = jnp.dtype(compute_dtype)
    block_b = _pick_block_b(B, T, C, F, num_layers=L)

    def stack(path, astype, reshape=None):
        leaves = []
        for layer in layers:
            leaf = layer
            for key in path:
                leaf = leaf[key]
            if reshape is not None:
                leaf = leaf.reshape(reshape)
            leaves.append(leaf.astype(astype))
        return jnp.stack(leaves)

    def w(*path):
        return stack(path, cd)

    def row(*path):
        return stack(path, jnp.float32, reshape=(1, -1))

    # Fold the softmax scale (times log2(e) on the exp2 fast path) into
    # the q third of ONE fused QKV weight/bias per layer
    sm_scale = 1.0 / (C // heads) ** 0.5
    q_factor = sm_scale * (1.0 if cd == jnp.float32 else LOG2E)
    wqkv, bqkv = [], []
    for layer in layers:
        a = layer['attn']
        wqkv.append(jnp.concatenate(
            [a['wq'] * q_factor, a['wk'], a['wv']], axis=1).astype(cd))
        bqkv.append(jnp.concatenate(
            [a['bq'] * q_factor, a['bk'], a['bv']]).reshape(1, -1)
            .astype(jnp.float32))
    wqkv = jnp.stack(wqkv)
    bqkv = jnp.stack(bqkv)

    kernel = functools.partial(
        _stack_kernel, num_layers=L, heads=heads,
        compute_dtype=cd, block_b=block_b, seq_len=T,
        activation=activation, causal=causal)

    cspec = pl.BlockSpec((L, C, C), lambda b: (0, 0, 0))
    crow = pl.BlockSpec((L, 1, C), lambda b: (0, 0, 0))
    frow = pl.BlockSpec((L, 1, F), lambda b: (0, 0, 0))
    flops_step = (8 * T * C * C + 4 * T * T * C
                  + 4 * T * C * F) * block_b * L
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, 1, T), lambda b: (b, 0, 0)),
            pl.BlockSpec((L, C, 3 * C), lambda b: (0, 0, 0)),
            pl.BlockSpec((L, 1, 3 * C), lambda b: (0, 0, 0)),
            cspec, crow, crow, crow,                     # wo, bo, g1, be1
            pl.BlockSpec((L, C, F), lambda b: (0, 0, 0)), frow,
            pl.BlockSpec((L, F, C), lambda b: (0, 0, 0)), crow,
            crow, crow,                                  # g2, be2
        ],
        out_specs=pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            # Default scoped-vmem stack limit is 16 MB; large-VMEM parts
            # (128 MB v5e/v6e) can pipeline much bigger block_b working
            # sets (measured ~5 MB per window at T=512, C=256) — derive
            # the cap from the actual device
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=flops_step * (B // block_b),
            bytes_accessed=(2 * B * T * C * 2
                            + L * (4 * C * C + 2 * C * F) * 2),
            transcendentals=B * T * T * heads * L),
        interpret=interpret,
    )(
        x, mask.astype(jnp.float32).reshape(B, 1, T),
        wqkv, bqkv,
        w('attn', 'wo'), row('attn', 'bo'),
        row('norm1', 'scale'), row('norm1', 'bias'),
        w('ffn', 'w1'), row('ffn', 'b1'),
        w('ffn', 'w2'), row('ffn', 'b2'),
        row('norm2', 'scale'), row('norm2', 'bias'),
    )


def encoder_layer(x, mask, attn, norm1, ffn, norm2, heads,
                  compute_dtype=jnp.bfloat16, interpret=False):
    """One full post-LN encoder layer on (B, T, C) activations.

    Single-layer convenience wrapper over ``encoder_stack``.
    """
    layer = {'attn': attn, 'norm1': norm1, 'ffn': ffn, 'norm2': norm2}
    return encoder_stack(x, mask, [layer], heads,
                         compute_dtype=compute_dtype, interpret=interpret)


###############################################################################
# Weight-streaming whole-stack schedule (large models: wav2vec2's 12 layers)
###############################################################################


def _stream_kernel(x_ref, mask_ref,
                   wqkv_ref, bqkv_ref,
                   wo_ref, bo_ref, g1_ref, be1_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
                   o_ref, x_scratch, *, num_layers, heads, compute_dtype,
                   block_b, seq_len, activation, causal):
    """One LAYER of one batch block per grid step, grid=(B/bb, L).

    The fp32 residual stream lives in a VMEM scratch that persists across
    the (sequential) layer dimension; each step's weight blocks are indexed
    by the layer id, so Mosaic's automatic block double-buffering streams
    layer l+1's ~2(C^2)+2CF weights from HBM while layer l computes — the
    full weight set never needs to be VMEM-resident (wav2vec2: 14 MB/layer
    vs 170 MB total).
    """
    l = pl.program_id(1)
    T, C = seq_len, x_ref.shape[-1]

    @pl.when(l == 0)
    def _load():
        x_scratch[...] = x_ref[...].reshape(block_b * T, C).astype(
            jnp.float32)

    key_valid = mask_ref[...] > 0
    mask_cd = mask_ref[...].astype(compute_dtype)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        tri = rows >= cols
        key_valid = key_valid & tri[None]
        mask_cd = mask_cd * tri[None].astype(compute_dtype)

    x_scratch[...] = _layer_body(
        x_scratch[...], key_valid, mask_cd,
        wqkv_ref[0], bqkv_ref[0],
        wo_ref[0], bo_ref[0], g1_ref[0], be1_ref[0],
        w1_ref[0], b1_ref[0], w2_ref[0], b2_ref[0],
        g2_ref[0], be2_ref[0],
        heads=heads, compute_dtype=compute_dtype,
        block_b=block_b, seq_len=seq_len, activation=activation)

    @pl.when(l == num_layers - 1)
    def _store():
        o_ref[...] = x_scratch[...].reshape(block_b, T, C).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('heads', 'compute_dtype', 'activation', 'causal',
                     'block_b', 'interpret'))
def encoder_stack_streamed(x, mask, layers, heads,
                           compute_dtype=jnp.bfloat16, activation='gelu',
                           causal=False, block_b=None, interpret=False):
    """encoder_stack with per-layer weight streaming: same math, but the
    grid walks (batch block, layer) so only ~2 layers of weights occupy
    VMEM at once (the current one + Mosaic's prefetch of the next).

    For models whose full weight set exceeds VMEM (wav2vec2-base encoder:
    ~170 MB bf16) this replaces one pallas_call per layer — eliminating the
    L-1 inter-layer HBM round trips of the residual stream.
    """
    B, T, C = x.shape
    L = len(layers)
    F = layers[0]['ffn']['w1'].shape[-1]
    cd = jnp.dtype(compute_dtype)
    if block_b is None:
        # Budget as if 2 layers were resident (current + prefetched)
        block_b = _pick_block_b(B, T, C, F, num_layers=2)

    def stack(path, astype, reshape=None):
        leaves = []
        for layer in layers:
            leaf = layer
            for key in path:
                leaf = leaf[key]
            if reshape is not None:
                leaf = leaf.reshape(reshape)
            leaves.append(leaf.astype(astype))
        return jnp.stack(leaves)

    def w(*path):
        return stack(path, cd)

    def row(*path):
        return stack(path, jnp.float32, reshape=(1, -1))

    sm_scale = 1.0 / (C // heads) ** 0.5
    q_factor = sm_scale * (1.0 if cd == jnp.float32 else LOG2E)
    wqkv, bqkv = [], []
    for layer in layers:
        a = layer['attn']
        wqkv.append(jnp.concatenate(
            [a['wq'] * q_factor, a['wk'], a['wv']], axis=1).astype(cd))
        bqkv.append(jnp.concatenate(
            [a['bq'] * q_factor, a['bk'], a['bv']]).reshape(1, -1)
            .astype(jnp.float32))
    wqkv = jnp.stack(wqkv)
    bqkv = jnp.stack(bqkv)

    kernel = functools.partial(
        _stream_kernel, num_layers=L, heads=heads,
        compute_dtype=cd, block_b=block_b, seq_len=T,
        activation=activation, causal=causal)

    def lw(shape):
        # One layer's block of a stacked (L, ...) weight, indexed by l
        return pl.BlockSpec((1,) + shape, lambda b, l: (l, 0, 0))

    flops_total = (8 * T * C * C + 4 * T * T * C
                   + 4 * T * C * F) * B * L
    return pl.pallas_call(
        kernel,
        grid=(B // block_b, L),
        in_specs=[
            pl.BlockSpec((block_b, T, C), lambda b, l: (b, 0, 0)),
            pl.BlockSpec((block_b, 1, T), lambda b, l: (b, 0, 0)),
            lw((C, 3 * C)), lw((1, 3 * C)),
            lw((C, C)), lw((1, C)), lw((1, C)), lw((1, C)),
            lw((C, F)), lw((1, F)),
            lw((F, C)), lw((1, C)),
            lw((1, C)), lw((1, C)),
        ],
        out_specs=pl.BlockSpec((block_b, T, C), lambda b, l: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_b * T, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=flops_total,
            bytes_accessed=(2 * B * T * C * 2
                            + (B // block_b) * L
                            * (4 * C * C + 2 * C * F) * 2),
            transcendentals=B * T * T * heads * L),
        interpret=interpret,
    )(
        x, mask.astype(jnp.float32).reshape(B, 1, T),
        wqkv, bqkv,
        w('attn', 'wo'), row('attn', 'bo'),
        row('norm1', 'scale'), row('norm1', 'bias'),
        w('ffn', 'w1'), row('ffn', 'b1'),
        w('ffn', 'w2'), row('ffn', 'b2'),
        row('norm2', 'scale'), row('norm2', 'bias'),
    )
