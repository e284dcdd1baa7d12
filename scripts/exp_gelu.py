"""GELU-variant + stage timing after the w2v2 rework (dev utility).

Times exact-erf vs tanh-approx GELU at conv0-output scale, and the current
feature_encoder / proj+encoder stages. mean()-anchored chains (conv
narrowing gotcha), value-fetched, degraded-runtime guarded.

Usage: python scripts/exp_gelu.py
"""

import dataclasses
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

from ppgs_tpu.models import w2v2

PEAK = 197e12
cd = jnp.bfloat16


def chained(raw_fn, params, inputs, n1=4, n2=12):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-20).astype(x.dtype))
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run_n(n):
        float(np.asarray(jax.device_get(many(params, inputs[0], n))))
        best = float('inf')
        for j in (1, 2):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(many(params, inputs[j], n))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n2) - run_n(n1)) / (n2 - n1)


def report(name, raw_fn, params, inputs, flops=1.0):
    t = chained(raw_fn, params, inputs)
    print(f'{name:20s} {t * 1e3:8.3f} ms   mfu={flops / t / PEAK:.3f}',
          flush=True)
    return t


def main():
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)

    B, T0, C = 64, 25647, 512
    g_xs = [jax.random.normal(jax.random.fold_in(base_key, i), (B, T0, C),
                              cd) * 0.5 for i in range(3)]
    jax.block_until_ready(g_xs)

    report('gelu exact', lambda p, x: jax.nn.gelu(x, approximate=False),
           None, g_xs)
    report('gelu tanh', lambda p, x: jax.nn.gelu(x, approximate=True),
           None, g_xs)
    report('copy (x*1.01)', lambda p, x: x * 1.01, None, g_xs)

    def gn(p, x):
        return w2v2._group_norm(x, p, groups=512).astype(x.dtype)

    gn_p = {'scale': jnp.ones((C,)), 'bias': jnp.zeros((C,))}
    report('group_norm', gn, gn_p, g_xs)
    del g_xs

    # Current full stages at the bench workload
    S = 8 * 16000 + 240
    audios = [jax.random.normal(jax.random.fold_in(base_key, 50 + i),
                                (B, S), jnp.float32) * 0.1 for i in range(3)]
    jax.block_until_ready(audios)
    params = w2v2.init(jax.random.PRNGKey(0))
    wcfg = dataclasses.replace(w2v2.BASE, compute_dtype='bfloat16')

    def feat(p, a):
        return w2v2.feature_encoder(p, a, wcfg)

    f_feat = 2.63e12
    report('feature_encoder', feat, params, audios, f_feat)

    feats = jax.jit(feat)(params, audios[0])
    feats.block_until_ready()
    f_xs = [jax.random.normal(jax.random.fold_in(base_key, 80 + i),
                              feats.shape, jnp.float32) * 0.1
            for i in range(3)]

    def proj_enc(p, f):
        fp = p['feature_projection']
        hidden = w2v2._layer_norm(f, fp['norm'], wcfg.layer_norm_eps)
        hidden = (hidden.astype(cd)
                  @ fp['projection']['weight'].astype(cd)
                  + fp['projection']['bias'].astype(cd))
        return w2v2.encoder(p, hidden, None, wcfg)

    report('proj+encoder', proj_enc, params, f_xs, 4.67e12)


if __name__ == '__main__':
    main()
