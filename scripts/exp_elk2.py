"""Encoder-stack kernel v2 experiments (dev utility).

The phase ablations (exp_elk_phases.py) showed the matmul-only floor at
0.86-0.88 MFU — the roofline gap is op-to-op scheduling, not elementwise
work. v2 restructures the chain:

  1. fused QKV: one (C, 3C) matmul instead of three, one bias/cast pass;
  2. softmax scale * log2(e) folded into wq/bq at weight-stack build time,
     softmax via exp2 (saves the per-element x*log2e inside exp and the
     separate q *= scale pass);
  3. concat-free out-projection: per-head (T, d_head) @ wo-slice partial
     sums accumulated in fp32 instead of concatenate + one K=C dot.

Times v2 vs the production kernel at the bench geometry and checks
numerics. Usage: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/exp_elk2.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import transformer  # noqa: E402
from ppgs_tpu.ops import encoder_layer_kernel as elk  # noqa: E402

PEAK = 197e12
LN_EPS = 1e-5
FFN_ROW_TILE = 1024
LOG2E = 1.4426950408889634


def slope_time(many, args, n1=4, n2=12, reps=3):
    def run(n):
        many(*args, n).block_until_ready()
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            many(*args, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(n2) - run(n1)) / (n2 - n1)


def chained(raw_fn):
    @jax.jit
    def many(params, x, n):
        def body(_, acc):
            out = raw_fn(params, x + acc * jnp.asarray(1e-30, x.dtype))
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return many


def _ln(r, g, b):
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    return (r - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _v2_layer(x32, mask_cd, wqkv, bqkv, wo, bo, g1, be1,
              w1, b1, w2, b2, g2, be2, *, heads, cd, block_b, T):
    C = x32.shape[-1]
    xc = x32.astype(cd)

    def dot32(a, w):
        return jax.lax.dot(a, w, preferred_element_type=jnp.float32)

    qkv = dot32(xc, wqkv).astype(cd) + bqkv.astype(cd)    # (bb*T, 3C)
    q3 = qkv[:, :C].reshape(block_b, T, C)
    k3 = qkv[:, C:2 * C].reshape(block_b, T, C)
    v3 = qkv[:, 2 * C:].reshape(block_b, T, C)

    d_head = C // heads
    acc = None
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q3[..., sl], k3[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (bb, T, T)
        row_max = logits.max(axis=-1, keepdims=True)
        p = jnp.exp2((logits - row_max).astype(cd))
        p = p * mask_cd
        denom = jnp.maximum(
            p.sum(axis=-1, keepdims=True).astype(jnp.float32), 1e-30)
        oh = jax.lax.dot_general(
            p, v3[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / denom)
        part = jax.lax.dot(
            oh.astype(cd).reshape(block_b * T, d_head), wo[sl],
            preferred_element_type=jnp.float32)           # (bb*T, C) fp32
        acc = part if acc is None else acc + part

    r = _ln(x32 + acc + bo.astype(jnp.float32),
            g1.astype(jnp.float32), be1.astype(jnp.float32))

    rows = min(FFN_ROW_TILE, block_b * T)
    y_parts = []
    for r0 in range(0, block_b * T, rows):
        tile = slice(r0, r0 + rows)
        h1 = jnp.maximum(
            dot32(r[tile].astype(cd), w1).astype(cd) + b1.astype(cd), 0.0)
        y_parts.append(dot32(h1, w2) + b2.astype(jnp.float32))
    y = jnp.concatenate(y_parts, axis=0) if len(y_parts) > 1 else y_parts[0]
    return _ln(r + y, g2.astype(jnp.float32), be2.astype(jnp.float32))


def _v2_kernel(x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
               g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               g2_ref, be2_ref, o_ref, *, num_layers, heads, cd,
               block_b, T):
    C = x_ref.shape[-1]
    x32 = x_ref[...].reshape(block_b * T, C).astype(jnp.float32)
    mask_cd = mask_ref[...].astype(cd)
    for layer in range(num_layers):
        x32 = _v2_layer(
            x32, mask_cd, wqkv_ref[layer], bqkv_ref[layer],
            wo_ref[layer], bo_ref[layer], g1_ref[layer], be1_ref[layer],
            w1_ref[layer], b1_ref[layer], w2_ref[layer], b2_ref[layer],
            g2_ref[layer], be2_ref[layer],
            heads=heads, cd=cd, block_b=block_b, T=T)
    o_ref[...] = x32.reshape(block_b, T, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'block_b'))
def v2_stack(x, mask, layers, heads, block_b):
    B, T, C = x.shape
    L = len(layers)
    F = layers[0]['ffn']['w1'].shape[-1]
    cd = jnp.dtype(jnp.bfloat16)
    d_head = C // heads
    scale = LOG2E / (d_head ** 0.5)

    wqkv, bqkv = [], []
    for layer in layers:
        a = layer['attn']
        wqkv.append(jnp.concatenate(
            [a['wq'] * scale, a['wk'], a['wv']], axis=1).astype(cd))
        bqkv.append(jnp.concatenate(
            [a['bq'] * scale, a['bk'], a['bv']]).reshape(1, -1)
            .astype(jnp.float32))
    wqkv = jnp.stack(wqkv)
    bqkv = jnp.stack(bqkv)

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

    w = lambda *path: stack(path, cd)
    row = lambda *path: stack(path, jnp.float32, reshape=(1, -1))

    kernel = functools.partial(
        _v2_kernel, num_layers=L, heads=heads, cd=cd,
        block_b=block_b, T=T)

    c3 = pl.BlockSpec((L, C, 3 * C), lambda b: (0, 0, 0))
    r3 = pl.BlockSpec((L, 1, 3 * C), lambda b: (0, 0, 0))
    cspec = pl.BlockSpec((L, C, C), lambda b: (0, 0, 0))
    crow = pl.BlockSpec((L, 1, C), lambda b: (0, 0, 0))
    frow = pl.BlockSpec((L, 1, F), lambda b: (0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, 1, T), lambda b: (b, 0, 0)),
            c3, r3, cspec, crow, crow, crow,
            pl.BlockSpec((L, C, F), lambda b: (0, 0, 0)), frow,
            pl.BlockSpec((L, F, C), lambda b: (0, 0, 0)), crow,
            crow, crow,
        ],
        out_specs=pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        x, mask.astype(jnp.float32).reshape(B, 1, T),
        wqkv, bqkv,
        w('attn', 'wo'), row('attn', 'bo'),
        row('norm1', 'scale'), row('norm1', 'bias'),
        w('ffn', 'w1'), row('ffn', 'b1'),
        w('ffn', 'w2'), row('ffn', 'b2'),
        row('norm2', 'scale'), row('norm2', 'bias'),
    )


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    B, T, C = 128, 512, config.hidden_channels
    L = len(params['layers'])
    F = params['layers'][0]['ffn']['w1'].shape[-1]
    rng = np.random.default_rng(time.time_ns() & 0xFFFF)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, jnp.float32)
    lengths = jnp.asarray(rng.integers(3, T + 1, size=B))
    mask = transformer.mask_from_lengths(lengths, T)
    stack_flops = (8 * T * C * C + 4 * T * T * C + 4 * T * C * F) * B * L

    # Numerics vs production kernel
    ref = np.asarray(elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads))
    for bb in (4, 8):
        got = np.asarray(v2_stack(
            x, mask, params['layers'], config.attention_heads, bb))
        valid = np.asarray(mask)
        err = np.abs(got[valid] - ref[valid]).max()
        print(f'v2 bb={bb}: max|diff vs prod| = {err:.5f}', flush=True)

        many = chained(lambda p, x, _bb=bb: v2_stack(
            x, mask, p['layers'], config.attention_heads, _bb))
        t = slope_time(many, (params, x))
        print(f'v2 bb={bb}: {t*1e3:8.3f} ms   '
              f'mfu={stack_flops/t/PEAK:.3f}', flush=True)


if __name__ == '__main__':
    main()
