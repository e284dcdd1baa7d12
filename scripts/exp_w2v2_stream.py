"""w2v2fb encoder floor ablation + weight-streaming experiment (verdict #5).

Times, at the bench workload (B=64 x 8 s -> T~399 feature frames):
  per-layer elk      production path: one encoder_stack call per layer
  streamed stack     ONE kernel, grid=(batch, layer), weights double-
                     buffered per layer (encoder_stack_streamed)
  flash+ffn (XLA glue)  PPGS_TPU_W2V2_LAYER_KERNEL=0 comparison path
  matmul floor       the encoder's pure-matmul FLOPs at peak

Prints per-variant ms + MFU so PERF.md can state the floor and whether
streaming wins (keep) or loses (documented negative result).

Usage: cd /root/repo && timeout 2400 python scripts/exp_w2v2_stream.py
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

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import w2v2  # noqa: E402
from ppgs_tpu.ops import encoder_layer_kernel as elk  # noqa: E402

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
    layers = [jax.tree.map(jnp.asarray, l)
              for l in wparams['encoder']['layers']]

    B, Tf = 64, 400                       # ~the bench feature geometry
    C = wcfg.hidden_size
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    hids = [jax.random.normal(jax.random.fold_in(base_key, i),
                              (B, Tf, C), jnp.bfloat16) * 0.1
            for i in range(4)]
    mask = jnp.ones((B, Tf), bool)
    jax.block_until_ready(hids)

    L, F = wcfg.num_layers, wcfg.intermediate_size
    flops = (8 * Tf * C * C + 4 * Tf * Tf * C + 4 * Tf * C * F) * B * L
    floor = flops / PEAK
    print(f'encoder-only FLOPs {flops / 1e12:.2f} TF, floor '
          f'{floor * 1e3:.2f} ms', flush=True)

    def per_layer(p, h):
        for layer in p:
            h = elk.encoder_stack(h, mask, [layer], wcfg.num_heads,
                                  activation='gelu')
        return h.astype(jnp.float32)

    def streamed(p, h):
        return elk.encoder_stack_streamed(
            h, mask, p, wcfg.num_heads, activation='gelu').astype(
                jnp.float32)

    def report(name, fn, p):
        t = chained(fn, p, hids)
        print(f'{name:22s} {t * 1e3:8.2f} ms   mfu={flops / t / PEAK:.3f}',
              flush=True)
        return t

    report('per-layer elk', per_layer, layers)
    for bb in (2, 4, 8):
        try:
            def streamed_bb(p, h, bb=bb):
                return elk.encoder_stack_streamed(
                    h, mask, p, wcfg.num_heads, activation='gelu',
                    block_b=bb).astype(jnp.float32)
            report(f'streamed bb={bb}', streamed_bb, layers)
        except Exception as e:
            print(f'streamed bb={bb} FAILED: {type(e).__name__}: {e}',
                  flush=True)

    # XLA-glue comparison (flash attention + fused FFN, layer kernel off)
    os.environ['PPGS_TPU_W2V2_LAYER_KERNEL'] = '0'
    jax.clear_caches()

    def xla_glue(p, h):
        pp = {'encoder': {'layers': p,
                          'pos_conv': wparams['encoder']['pos_conv'],
                          'norm': wparams['encoder']['norm']}}
        # encoder() includes pos_conv+norm; subtract nothing — report as-is
        return w2v2.encoder(pp, h, None, wcfg).astype(jnp.float32)

    report('flash+ffn+XLA glue*', xla_glue, layers)
    del os.environ['PPGS_TPU_W2V2_LAYER_KERNEL']
    print('(* includes pos_conv + final LN; add ~2 ms vs the others)',
          flush=True)


if __name__ == '__main__':
    main()
