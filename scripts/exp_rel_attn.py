"""Focused probe of the conformer rel-pos attention cost (dev utility).

Variants at the bench geometry (B=64, T=800, H=4, d_k=36):
  projections     q/k/v/pos projections + bias adds only
  bd+shift        the position-term einsum + legacy rel_shift
  kernel alone    fused_attention_bias on precomputed inputs
  full (kernel)   the production _rel_attention bf16 path
  full (XLA)      PPGS_TPU_CONFORMER_KERNEL=0 comparison

Usage: cd /root/repo && timeout 1800 python scripts/exp_rel_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import conformer as conformer_mod  # noqa: E402
from ppgs_tpu.ops import flash_attention as fa  # noqa: E402


def chained(raw_fn, params, inputs, n1=3, n2=9):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-30).astype(x.dtype))
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run_n(n):
        float(np.asarray(jax.device_get(many(params, inputs[0], n))))
        best = float('inf')
        for j in (1, 2, 3):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(many(params, inputs[j], n))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n2) - run_n(n1)) / (n2 - n1)


def report(name, fn, p, inputs):
    t = chained(fn, p, inputs)
    print(f'{name:18s} {t * 1e3:8.2f} ms', flush=True)
    return t


def main():
    cfg = conformer_mod.ConformerConfig(compute_dtype='bfloat16')
    params = conformer_mod.init(jax.random.PRNGKey(0), cfg)
    attn = params['blocks'][0]['attn']
    B, T, H = 64, 800, cfg.heads
    d_k = cfg.dim // H
    key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    xs = [jax.random.normal(jax.random.fold_in(key, i), (B, T, cfg.dim),
                            jnp.float32) * 0.5 for i in range(4)]
    jax.block_until_ready(xs)
    pos_emb = jnp.asarray(conformer_mod._rel_pos_table(T, cfg.dim))[None]
    mask = jnp.ones((B, T), bool)
    cd = jnp.bfloat16

    def proj_only(p, x):
        xc = x.astype(cd)
        q = (xc @ p['q']['weight'].astype(cd) + p['q']['bias'].astype(cd))
        k = (xc @ p['k']['weight'].astype(cd) + p['k']['bias'].astype(cd))
        v = (xc @ p['v']['weight'].astype(cd) + p['v']['bias'].astype(cd))
        return (q + k + v).astype(jnp.float32)

    def bd_shift(p, x):
        xc = x.astype(cd)
        q = (xc @ p['q']['weight'].astype(cd)
             + p['q']['bias'].astype(cd)).reshape(B, T, H, d_k)
        pos = (pos_emb.astype(cd) @ p['pos']['weight'].astype(cd))
        pos = pos.reshape(1, -1, H, d_k).transpose(0, 2, 1, 3)
        q_v = (q + p['pos_bias_v'].astype(cd)).transpose(0, 2, 1, 3)
        bd = jnp.einsum('bhqd,bhkd->bhqk', q_v, pos)
        return conformer_mod._rel_shift(bd).astype(jnp.float32).mean(
            (1, 2, 3))

    # Kernel alone on precomputed inputs
    q0 = jax.random.normal(jax.random.fold_in(key, 10), (B, T, H, d_k),
                           cd)
    k0 = jax.random.normal(jax.random.fold_in(key, 11), (B, T, H, d_k),
                           cd)
    v0 = jax.random.normal(jax.random.fold_in(key, 12), (B, T, H, d_k),
                           cd)
    biases = [jax.random.normal(jax.random.fold_in(key, 20 + i),
                                (B, H, T, T), cd) for i in range(4)]
    jax.block_until_ready(biases)

    def kernel_alone(p, bias):
        return fa.fused_attention_bias(q0, k0, v0, bias, mask,
                                       H).astype(jnp.float32)

    def full(p, x):
        return conformer_mod._rel_attention(
            x, pos_emb, p, mask, H, cd, None).astype(jnp.float32)

    report('projections', proj_only, attn, xs)
    report('bd+shift', bd_shift, attn, xs)
    report('kernel alone', kernel_alone, attn, biases)
    report('full (kernel)', full, attn, xs)
    os.environ['PPGS_TPU_CONFORMER_KERNEL'] = '0'
    jax.clear_caches()
    report('full (XLA)', full, attn, xs)
    del os.environ['PPGS_TPU_CONFORMER_KERNEL']


if __name__ == '__main__':
    main()


def variants():
    cfg = conformer_mod.ConformerConfig(compute_dtype='bfloat16')
    params = conformer_mod.init(jax.random.PRNGKey(0), cfg)
    attn = params['blocks'][0]['attn']
    B, T, H = 64, 800, cfg.heads
    d_k = cfg.dim // H
    cd = jnp.bfloat16
    key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    qvs = [jax.random.normal(jax.random.fold_in(key, 40 + i),
                             (B, H, T, d_k), cd) for i in range(4)]
    bds = [jax.random.normal(jax.random.fold_in(key, 50 + i),
                             (B, H, T, T), cd) for i in range(4)]
    jax.block_until_ready(qvs + bds)
    pos_emb = jnp.asarray(conformer_mod._rel_pos_table(T, cfg.dim))[None]
    pos = (pos_emb.astype(cd) @ attn['pos']['weight'].astype(cd))
    pos = pos.reshape(1, -1, H, d_k).transpose(0, 2, 1, 3)

    def bd_einsum(p, q_v):
        return jnp.einsum('bhqd,bhkd->bhqk', q_v, pos).astype(
            jnp.float32).mean((1, 2, 3))

    def bd_flat(p, q_v):
        out = jnp.stack([
            (q_v[:, h].reshape(B * T, d_k) @ pos[0, h].T).reshape(B, T, T)
            for h in range(H)], axis=1)
        return out.astype(jnp.float32).mean((1, 2, 3))

    def shift_only(p, bd):
        return conformer_mod._rel_shift(bd).astype(jnp.float32).mean(
            (1, 2, 3))

    report('bd einsum (old)', bd_einsum, None, qvs)
    report('bd flat matmuls', bd_flat, None, qvs)
    report('rel_shift only', shift_only, None, bds)


if __name__ == '__main__' and os.environ.get('PPGS_VARIANTS'):
    variants()
