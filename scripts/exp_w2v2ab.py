"""A/B: wav2vec2 encoder via per-layer stack kernel vs flash+fusedFFN path.

Times proj+encoder at the bench workload under three settings:
  elk-auto  : per-layer whole-layer kernel, auto block_b
  elk-bb4   : same with PPGS_TPU_BLOCK_B=4, 110 MB VMEM budget
  old-path  : PPGS_TPU_W2V2_LAYER_KERNEL=0 (flash attention + fused FFN)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_w2v2ab.py
"""

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import w2v2  # noqa: E402

PEAK = 197e12


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


def main():
    wcfg = dataclasses.replace(w2v2.BASE, compute_dtype='bfloat16')
    wparams = w2v2.init(jax.random.PRNGKey(2))
    B, T = 64, 400
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    feats = [
        jax.random.normal(jax.random.fold_in(base_key, i),
                          (B, T, 512), jnp.float32) * 0.1
        for i in range(4)
    ]
    jax.block_until_ready(feats)

    def proj_and_encoder(p, f):
        fp = p['feature_projection']
        hidden = w2v2._layer_norm(f, fp['norm'], wcfg.layer_norm_eps)
        hidden = (hidden @ fp['projection']['weight']
                  + fp['projection']['bias'])
        return w2v2.encoder(p, hidden, None, wcfg)

    settings = [
        ('elk-auto', {'PPGS_TPU_W2V2_LAYER_KERNEL': '1'}),
        ('elk-bb4', {'PPGS_TPU_W2V2_LAYER_KERNEL': '1',
                     'PPGS_TPU_BLOCK_B': '4',
                     'PPGS_TPU_VMEM_BUDGET_MB': '110'}),
        ('old-path', {'PPGS_TPU_W2V2_LAYER_KERNEL': '0'}),
    ]
    for name, env in settings:
        for k in ('PPGS_TPU_W2V2_LAYER_KERNEL', 'PPGS_TPU_BLOCK_B',
                  'PPGS_TPU_VMEM_BUDGET_MB'):
            os.environ.pop(k, None)
        os.environ.update(env)
        jax.clear_caches()
        try:
            t = chained(proj_and_encoder, wparams, feats)
            print(f'{name:9s}: {t * 1e3:8.2f} ms', flush=True)
        except Exception as e:
            print(f'{name:9s}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:120]}', flush=True)


if __name__ == '__main__':
    main()
