"""Experiment: encoder_layer kernel block_b variants on the real chip.

Measures the 5-layer encoder stack at the bench shape for block_b in
{1, 2, 4} plus numerics vs the XLA path. Development tool.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ppgs_tpu
from ppgs_tpu.models import transformer


def timeit(fn, *args, iters=15):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)

    # Bench-equivalent encoder workload: 128 windows x 512 frames
    B, T = 128, 512
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (B, config.input_channels, T), jnp.float32)
    lengths = jnp.full((B,), 500, jnp.int32)
    feats.block_until_ready()

    @jax.jit
    def fwd(feats):
        return transformer.forward(params, feats, lengths, config)

    results = {}
    for bb in sys.argv[1:] or ['1', '2', '4']:
        os.environ['PPGS_TPU_BLOCK_B'] = bb
        fwd_c = jax.jit(
            lambda feats, _bb=bb: transformer.forward(
                params, feats, lengths, config))
        # new trace per setting: the env knob is read at trace time
        transformer.forward.__wrapped__ if hasattr(
            transformer.forward, '__wrapped__') else None
        jax.clear_caches()
        t = timeit(fwd_c, feats)
        out = np.asarray(fwd_c(feats))
        results[bb] = (t, out)
        print(f'block_b={bb}: {t*1e3:8.2f} ms', flush=True)

    os.environ['PPGS_TPU_DISABLE_FLASH'] = '1'
    jax.clear_caches()
    xla = jax.jit(lambda feats: transformer.forward(
        params, feats, lengths, config))
    t = timeit(xla, feats)
    ref = np.asarray(xla(feats))
    print(f'xla path : {t*1e3:8.2f} ms', flush=True)
    for bb, (tt, out) in results.items():
        err = np.abs(out - ref).max()
        print(f'block_b={bb}: max|diff vs xla| = {err:.4f}')


if __name__ == '__main__':
    main()
