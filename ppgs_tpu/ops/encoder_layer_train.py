"""Differentiable whole-encoder-layer Pallas kernel (training hot path).

Round-4 verdict #1b: after the custom_vjp attention and FFN kernels, the
train step still pays for the per-layer XLA glue — QKV projection,
out-projection, the (B, T, C) dropout site, both LayerNorms, and ALL their
backward passes each round-trip the (M, C) activations through HBM. This
kernel runs ONE post-LN layer (the exact train semantics of
models/transformer._encoder_layer):

    a   = attention(x Wq, x Wk, x Wv)  with in-kernel prob dropout
    od  = dropout(a @ Wo + bo)
    r   = LN1(x + od)
    hd  = dropout(relu(r @ W1 + b1))
    yd  = dropout(hd @ W2 + b2)
    out = LN2(r + yd)

as one forward kernel (no residuals beyond the inputs — flash-style) and one
backward kernel that RECOMPUTES the whole forward in VMEM and produces dx
plus all 14 parameter gradients, accumulating weight grads across batch
blocks into revisited output blocks. No (T, T) tensor, dropout mask, or
FFN hidden ever reaches HBM in either direction; per-layer HBM traffic is
x in + out out (+dx, dout in the backward) + weights.

Dropout masks come from the TPU hardware PRNG, deterministic per
(seed, batch-block); the backward reseeds the identical stream and replays
the draws in the forward's exact order. Geometry: d_head % 128 == 0
(static head unroll), T % 8 == 0, T <= 1024 (whole-sequence scores in
VMEM) — the PPG encoder's shapes (C=256, H=2, T<=512 window).

Reference semantics: torch.nn.TransformerEncoderLayer post-norm under
fp16 autocast (ppgs/model/transformer.py:13-114, ppgs/train/core.py:121).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LN_EPS = 1e-5
MAX_T = 1024


def _vmem_limit():
    from .encoder_layer_kernel import _vmem_limit_bytes
    return _vmem_limit_bytes()


###############################################################################
# In-kernel dropout stream
###############################################################################


class _Stream:
    """Deterministic keep-mask stream: hardware PRNG on TPU, threefry in
    interpret mode. Draw ORDER defines the stream — the backward must
    replay the forward's draws exactly."""

    def __init__(self, seed_ref, pid, rate, interpret):
        self.rate = rate
        self.interpret = interpret
        self.count = 0
        if interpret:
            self.key = jax.random.fold_in(
                jax.random.PRNGKey(seed_ref[0]), pid)
        elif rate > 0.0:
            pltpu.prng_seed(seed_ref[0], pid)

    def keep(self, shape):
        """Bool keep-mask of `shape`; advances the stream."""
        if self.interpret:
            self.count += 1
            key = jax.random.fold_in(self.key, self.count)
            return jax.random.uniform(key, shape) < (1.0 - self.rate)
        bits = pltpu.prng_random_bits(shape)
        threshold = jnp.uint32(
            round((1.0 - self.rate) * float(2 ** 32 - 1)))
        return pltpu.bitcast(bits, jnp.uint32) <= threshold


def _ln_fwd(z, gamma, beta):
    """-> (out, n, s): normalized values + rstd for the backward."""
    mean = z.mean(axis=-1, keepdims=True)
    var = ((z - mean) ** 2).mean(axis=-1, keepdims=True)
    s = jax.lax.rsqrt(var + LN_EPS)
    n = (z - mean) * s
    return n * gamma + beta, n, s


def _ln_bwd(dy, gamma, n, s):
    """dz for out = n * gamma + beta, n = (z - mean) * rstd."""
    dyg = dy * gamma
    m1 = dyg.mean(axis=-1, keepdims=True)
    m2 = (dyg * n).mean(axis=-1, keepdims=True)
    return (dyg - m1 - n * m2) * s


###############################################################################
# Forward kernel
###############################################################################


def _fwd_compute(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 g2_ref, be2_ref, stream, *, heads, block_b, seq_len,
                 causal, sm_scale, want_residuals, compute_dtype):
    """Shared fwd recompute: returns (out32, residuals dict or None)."""
    T = seq_len
    C = x_ref.shape[-1]
    cd = compute_dtype
    x32 = x_ref[...].reshape(block_b * T, C).astype(jnp.float32)
    xc = x32.astype(cd)
    key_valid = mask_ref[...] > 0                       # (bb, 1, T)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        key_valid = key_valid & (rows >= cols)[None]

    def dot(a, w):
        return jax.lax.dot(a, w, preferred_element_type=jnp.float32)

    qkv = (dot(xc, wqkv_ref[...]).astype(cd)
           + bqkv_ref[...].astype(cd))                  # (M, 3C)
    q3 = qkv[:, :C].reshape(block_b, T, C)
    k3 = qkv[:, C:2 * C].reshape(block_b, T, C)
    v3 = qkv[:, 2 * C:].reshape(block_b, T, C)

    d_head = C // heads
    rate = stream.rate
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    o1 = None
    head_data = []
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q3[..., sl], k3[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale  # (bb, T, T)
        logits = jnp.where(key_valid, logits, NEG_INF)
        row_max = jnp.maximum(logits.max(axis=-1, keepdims=True), -1e29)
        p = jnp.exp(logits - row_max)
        p = jnp.where(key_valid, p, 0.0)
        denom = jnp.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
        pn = p / denom
        if rate > 0.0:
            keep = stream.keep(pn.shape)
            pd = jnp.where(keep, pn * inv, 0.0)
        else:
            pd = pn
        a_h = jax.lax.dot_general(
            pd.astype(cd), v3[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (bb, T, dh) fp32
        part = dot(a_h.astype(cd).reshape(block_b * T, d_head),
                   wo_ref[sl, :])
        o1 = part if o1 is None else o1 + part
        if want_residuals:
            head_data.append((pn, pd, a_h))
    o1 = o1 + bo_ref[...].astype(jnp.float32)           # (M, C)

    if rate > 0.0:
        keep_sa = stream.keep(o1.shape)
        od = jnp.where(keep_sa, o1 * inv, 0.0)
    else:
        keep_sa = None
        od = o1

    r_out, n1, s1 = _ln_fwd(x32 + od,
                            g1_ref[...].astype(jnp.float32),
                            be1_ref[...].astype(jnp.float32))
    rc = r_out.astype(cd)

    h1 = dot(rc, w1_ref[...])
    h1 = jnp.maximum(h1.astype(cd) + b1_ref[...].astype(cd), 0)  # (M, F)
    if rate > 0.0:
        keep_h = stream.keep(h1.shape)
        hd = jnp.where(keep_h, h1 * jnp.asarray(inv, cd),
                       jnp.zeros((), cd))
    else:
        keep_h = None
        hd = h1
    y0 = dot(hd, w2_ref[...]) + b2_ref[...].astype(jnp.float32)  # (M, C)
    if rate > 0.0:
        keep_y = stream.keep(y0.shape)
        yd = jnp.where(keep_y, y0 * inv, 0.0)
    else:
        keep_y = None
        yd = y0

    out, n2, s2 = _ln_fwd(r_out + yd,
                          g2_ref[...].astype(jnp.float32),
                          be2_ref[...].astype(jnp.float32))
    residuals = None
    if want_residuals:
        residuals = dict(
            x32=x32, xc=xc, qkv=qkv, q3=q3, k3=k3, v3=v3,
            key_valid=key_valid, head_data=head_data, o1=o1,
            keep_sa=keep_sa, n1=n1, s1=s1, r_out=r_out, rc=rc,
            h1=h1, keep_h=keep_h, hd=hd, keep_y=keep_y, n2=n2, s2=s2)
    return out, residuals


def _fwd_kernel(seed_ref, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref,
                bo_ref, g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g2_ref, be2_ref, o_ref, *, heads, block_b,
                seq_len, causal, sm_scale, rate, interpret,
                compute_dtype):
    stream = _Stream(seed_ref, pl.program_id(0), rate, interpret)
    out, _ = _fwd_compute(
        x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref,
        be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref, stream,
        heads=heads, block_b=block_b, seq_len=seq_len, causal=causal,
        sm_scale=sm_scale, want_residuals=False,
        compute_dtype=compute_dtype)
    T, C = seq_len, x_ref.shape[-1]
    o_ref[...] = out.reshape(block_b, T, C).astype(o_ref.dtype)


###############################################################################
# Backward kernel
###############################################################################


def _bwd_kernel(seed_ref, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref,
                bo_ref, g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g2_ref, be2_ref, g_ref,
                wqkvt_ref, wot_ref, w1t_ref, w2t_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                dg1_ref, dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dg2_ref, dbe2_ref,
                *, heads, block_b, seq_len, causal, sm_scale, rate,
                interpret, compute_dtype):
    i = pl.program_id(0)
    stream = _Stream(seed_ref, i, rate, interpret)
    # Recompute the full forward in VMEM (PRNG draws replay in order)
    _, res = _fwd_compute(
        x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, g1_ref,
        be1_ref, w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref, stream,
        heads=heads, block_b=block_b, seq_len=seq_len, causal=causal,
        sm_scale=sm_scale, want_residuals=True,
        compute_dtype=compute_dtype)

    T = seq_len
    C = x_ref.shape[-1]
    cd = res['xc'].dtype
    d_head = C // heads
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    M = block_b * T

    def dot(a, w):
        return jax.lax.dot(a, w, preferred_element_type=jnp.float32)

    def dotT(a, b):
        # a^T @ b with fp32 accumulation: (K, M)^T x (M, N)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    g32 = g_ref[...].reshape(M, C).astype(jnp.float32)

    # LN2 backward
    gamma2 = g2_ref[...].astype(jnp.float32)
    dz2 = _ln_bwd(g32, gamma2, res['n2'], res['s2'])
    dg2 = (g32 * res['n2']).sum(axis=0, keepdims=True)
    dbe2 = g32.sum(axis=0, keepdims=True)

    # FFN backward
    dyd = dz2
    dy0 = (jnp.where(res['keep_y'], dyd * inv, 0.0)
           if rate > 0.0 else dyd)
    dy0c = dy0.astype(cd)
    dw2 = dotT(res['hd'], dy0c)
    db2 = dy0.sum(axis=0, keepdims=True)
    dhd = dot(dy0c, w2t_ref[...])                       # (M, F) fp32
    if rate > 0.0:
        dhd = jnp.where(res['keep_h'], dhd * inv, 0.0)
    # relu' at fp32 (v5e rejects bf16 vector compares)
    dh = jnp.where(res['h1'].astype(jnp.float32) > 0.0, dhd, 0.0)
    dhc = dh.astype(cd)
    dw1 = dotT(res['rc'], dhc)
    db1 = dh.sum(axis=0, keepdims=True)
    dr = dz2 + dot(dhc, w1t_ref[...])                   # (M, C)

    # LN1 backward
    gamma1 = g1_ref[...].astype(jnp.float32)
    dz1 = _ln_bwd(dr, gamma1, res['n1'], res['s1'])
    dg1 = (dr * res['n1']).sum(axis=0, keepdims=True)
    dbe1 = dr.sum(axis=0, keepdims=True)

    dx32 = dz1                                          # residual branch
    dod = dz1
    do1 = (jnp.where(res['keep_sa'], dod * inv, 0.0)
           if rate > 0.0 else dod)
    do1c = do1.astype(cd)
    dbo = do1.sum(axis=0, keepdims=True)

    # Attention backward per head
    dqkv = []
    dwo_parts = []
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        pn, pd, a_h = res['head_data'][h]
        da_h = dot(do1c, wot_ref[:, sl]).reshape(
            block_b, T, d_head)                         # dL/da_h fp32
        dwo_parts.append(dotT(
            a_h.astype(cd).reshape(M, d_head), do1c))   # (dh, C)
        # flash backward identity on the (dropped) probability path
        d_row = (da_h * a_h).sum(axis=-1, keepdims=True)
        gp = jax.lax.dot_general(
            da_h.astype(cd), res['v3'][..., sl],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (bb, T, T)
        if rate > 0.0:
            # dL/dpn from dL/dpd: the replayed mask is recoverable as
            # pd != 0. Where pn == 0 but the keep bit was 0 this is wrong
            # by gp*inv — harmless, since ds multiplies by pn (= 0) and
            # dv uses pd (= 0): no incorrect gradient propagates.
            gp = jnp.where(pd != 0.0, gp * inv, 0.0)
        ds = pn * (gp - d_row)                          # (bb, T, T) fp32
        dsc = (ds * sm_scale).astype(cd)
        dq_h = jax.lax.dot_general(
            dsc, res['k3'][..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk_h = jax.lax.dot_general(
            dsc, res['q3'][..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dv_h = jax.lax.dot_general(
            pd.astype(cd), da_h.astype(cd),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dqkv.append((dq_h, dk_h, dv_h))

    dwo = jnp.concatenate(dwo_parts, axis=0)            # (C, C)
    dq = jnp.concatenate([d[0] for d in dqkv], axis=-1).reshape(M, C)
    dk = jnp.concatenate([d[1] for d in dqkv], axis=-1).reshape(M, C)
    dv = jnp.concatenate([d[2] for d in dqkv], axis=-1).reshape(M, C)
    dqkv_m = jnp.concatenate([dq, dk, dv], axis=-1)     # (M, 3C) fp32
    dqkv_c = dqkv_m.astype(cd)
    dwqkv = dotT(res['xc'], dqkv_c)                     # (C, 3C)
    dbqkv = dqkv_m.sum(axis=0, keepdims=True)
    dx32 = dx32 + dot(dqkv_c, wqkvt_ref[...])

    dx_ref[...] = dx32.reshape(block_b, T, C).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dg1_ref,
                    dbe1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dg2_ref, dbe2_ref):
            ref[...] = jnp.zeros_like(ref)

    dwqkv_ref[...] += dwqkv
    dbqkv_ref[...] += dbqkv
    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dg1_ref[...] += dg1
    dbe1_ref[...] += dbe1
    dw1_ref[...] += dw1
    db1_ref[...] += db1
    dw2_ref[...] += dw2
    db2_ref[...] += db2
    dg2_ref[...] += dg2
    dbe2_ref[...] += dbe2


###############################################################################
# custom_vjp wrapper
###############################################################################


def _pick_block_b(B, T, C, F, heads):
    """Largest bb (<= 8) dividing B whose bwd working set fits ~56 MB."""
    import os

    override = os.environ.get('PPGS_TPU_TRAIN_BLOCK_B')
    if override:
        return max(1, min(int(override), B))
    budget = 56 * 1024 * 1024
    weights = (4 * C * C + 2 * C * F) * 2 * 2           # + transposes
    accum = (4 * C * C + 2 * C * F) * 4
    for bb in (8, 4, 2, 1):
        if B % bb:
            continue
        M = bb * T
        acts = (M * C * 40                              # x/qkv/r/dz slabs
                + bb * T * T * 4 * 5                    # ~5 live (T,T) fp32
                + M * F * 14)                           # h1/hd/dh + masks
        if weights + accum + acts <= budget:
            return bb
    return 1


def encoder_layer_train(x, mask, layer, heads, dropout_rate=0.0,
                        seed=None, causal=False, compute_dtype=None,
                        interpret=False):
    """Differentiable post-LN encoder layer, one Pallas kernel each way.

    x: (B, T, C); the fp32 residual stream stays fp32 in HBM between
    layers (matching the XLA train path) while matmul OPERANDS run at
    ``compute_dtype`` (default: x.dtype) inside the kernel. mask: (B, T)
    bool valid-key mask; layer: the models.transformer params['layers']
    entry (attn/norm1/ffn/norm2). Returns (B, T, C) in x.dtype.
    ``seed``: int32 scalar deriving the dropout streams.
    """
    a = layer['attn']
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    wqkv = jnp.concatenate(
        [a['wq'], a['wk'], a['wv']], axis=1).astype(cd)
    bqkv = jnp.concatenate(
        [a['bq'], a['bk'], a['bv']]).reshape(1, -1).astype(jnp.float32)
    seed_i = (jnp.zeros((1,), jnp.int32) if seed is None
              else jnp.asarray(seed, jnp.int32).reshape(1))
    out = _layer_train(
        x, mask.astype(jnp.int32), wqkv, bqkv,
        a['wo'].astype(cd), a['bo'].reshape(1, -1).astype(jnp.float32),
        layer['norm1']['scale'].reshape(1, -1).astype(jnp.float32),
        layer['norm1']['bias'].reshape(1, -1).astype(jnp.float32),
        layer['ffn']['w1'].astype(cd),
        layer['ffn']['b1'].reshape(1, -1).astype(jnp.float32),
        layer['ffn']['w2'].astype(cd),
        layer['ffn']['b2'].reshape(1, -1).astype(jnp.float32),
        layer['norm2']['scale'].reshape(1, -1).astype(jnp.float32),
        layer['norm2']['bias'].reshape(1, -1).astype(jnp.float32),
        seed_i, heads, float(dropout_rate), bool(causal), str(cd),
        bool(interpret))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19))
def _layer_train(x, mask_i, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2,
                 g2, be2, seed_i, heads, rate, causal, cd_str, interpret):
    out, _ = _layer_train_fwd(x, mask_i, wqkv, bqkv, wo, bo, g1, be1, w1,
                              b1, w2, b2, g2, be2, seed_i, heads, rate,
                              causal, cd_str, interpret)
    return out


def _specs(block_b, T, C, F):
    """(x, mask, weights...) in_specs shared by fwd and bwd."""
    def const(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape))

    return [
        pl.BlockSpec((block_b, T, C), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((block_b, 1, T), lambda i, *_: (i, 0, 0)),
        const((C, 3 * C)), const((1, 3 * C)),
        const((C, C)), const((1, C)), const((1, C)), const((1, C)),
        const((C, F)), const((1, F)), const((F, C)), const((1, C)),
        const((1, C)), const((1, C)),
    ]


def _layer_train_fwd(x, mask_i, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2,
                     b2, g2, be2, seed_i, heads, rate, causal, cd_str,
                     interpret):
    B, T, C = x.shape
    F = w1.shape[1]
    assert (C // heads) % 128 == 0 and T % 8 == 0 and T <= MAX_T, (C, T)
    block_b = _pick_block_b(B, T, C, F, heads)
    sm_scale = 1.0 / math.sqrt(C // heads)
    mask3 = mask_i.reshape(B, 1, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=_specs(block_b, T, C, F),
        out_specs=pl.BlockSpec((block_b, T, C), lambda i, *_: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, heads=heads, block_b=block_b, seq_len=T,
            causal=causal, sm_scale=sm_scale, rate=rate,
            interpret=interpret, compute_dtype=jnp.dtype(cd_str)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=_vmem_limit()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * C * C + 2 * T * C + 2 * C * F),
            bytes_accessed=2 * B * T * C * 2 + (4 * C * C + 2 * C * F) * 2,
            transcendentals=B * T * T * heads),
        interpret=interpret,
    )(seed_i, x, mask3, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2,
      be2)
    residuals = (x, mask3, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2,
                 g2, be2, seed_i)
    return out, residuals


def _layer_train_fwd_rule(x, mask_i, wqkv, bqkv, wo, bo, g1, be1, w1, b1,
                          w2, b2, g2, be2, seed_i, heads, rate, causal,
                          cd_str, interpret):
    return _layer_train_fwd(x, mask_i, wqkv, bqkv, wo, bo, g1, be1, w1,
                            b1, w2, b2, g2, be2, seed_i, heads, rate,
                            causal, cd_str, interpret)


def _layer_train_bwd_rule(heads, rate, causal, cd_str, interpret,
                          residuals, g):
    (x, mask3, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2,
     seed_i) = residuals
    B, T, C = x.shape
    F = w1.shape[1]
    block_b = _pick_block_b(B, T, C, F, heads)
    sm_scale = 1.0 / math.sqrt(C // heads)

    def const(shape):
        return pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=_specs(block_b, T, C, F) + [
            pl.BlockSpec((block_b, T, C), lambda i, *_: (i, 0, 0)),  # g
            const((3 * C, C)), const((C, C)),             # wqkv^T, wo^T
            const((F, C)), const((C, F)),                 # w1^T, w2^T
        ],
        out_specs=[
            pl.BlockSpec((block_b, T, C), lambda i, *_: (i, 0, 0)),
            const((C, 3 * C)), const((1, 3 * C)),
            const((C, C)), const((1, C)),
            const((1, C)), const((1, C)),
            const((C, F)), const((1, F)),
            const((F, C)), const((1, C)),
            const((1, C)), const((1, C)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads=heads, block_b=block_b, seq_len=T,
            causal=causal, sm_scale=sm_scale, rate=rate,
            interpret=interpret, compute_dtype=jnp.dtype(cd_str)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, T, C), x.dtype),
            jax.ShapeDtypeStruct((C, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=_vmem_limit()),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * T * (4 * C * C + 2 * T * C + 2 * C * F),
            bytes_accessed=4 * B * T * C * 2
            + (4 * C * C + 2 * C * F) * 8,
            transcendentals=B * T * T * heads),
        interpret=interpret,
    )(seed_i, x, mask3, wqkv, bqkv, wo, bo, g1, be1, w1, b1, w2, b2, g2,
      be2, g, wqkv.T, wo.T, w1.T, w2.T)
    (dx, dwqkv, dbqkv, dwo, dbo, dg1, dbe1, dw1, db1, dw2, db2, dg2,
     dbe2) = outs

    # mask (int) and seed (int) primals have float0 tangents
    dmask = np.zeros((B, mask3.shape[-1]), dtype=jax.dtypes.float0)
    return (dx, dmask,
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo.astype(bo.dtype),
            dg1.astype(g1.dtype), dbe1.astype(be1.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dg2.astype(g2.dtype), dbe2.astype(be2.dtype),
            np.zeros((1,), dtype=jax.dtypes.float0))


_layer_train.defvjp(_layer_train_fwd_rule, _layer_train_bwd_rule)
