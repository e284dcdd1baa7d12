"""Precise device-side timing of the encoder stack kernel (dev utility).

Wall-clock timing of single dispatches over the axon tunnel is noisy
(queueing, relay overhead, result caching). Instead, chain N kernel
applications inside ONE jitted program (output feeds input via
lax.fori_loop) and fit total time over two values of N: the slope is the
pure device-side time per application, with dispatch overhead cancelled.

Usage: PYTHONPATH=/root/repo python scripts/ktime.py [bb ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ppgs_tpu
from ppgs_tpu.models import transformer
from ppgs_tpu.ops import encoder_layer_kernel as elk


def measure(config, params, x, mask, n):
    @jax.jit
    def many(x):
        def body(_, x):
            out = elk.encoder_stack(
                x, mask, params['layers'], config.attention_heads)
            # keep dtype stable so the loop carry is well-typed
            return out.astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    out = many(x)
    out.block_until_ready()
    reps = 3
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        many(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    B, T, C = 128, 512, config.hidden_channels
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, jnp.float32)
    lengths = jnp.asarray(rng.integers(3, T + 1, size=B))
    mask = transformer.mask_from_lengths(lengths, T)

    for bb in sys.argv[1:] or ['auto']:
        if bb != 'auto':
            os.environ['PPGS_TPU_BLOCK_B'] = bb
        else:
            os.environ.pop('PPGS_TPU_BLOCK_B', None)
        n1, n2 = 4, 12
        t1 = measure(config, params, x, mask, n1)
        t2 = measure(config, params, x, mask, n2)
        per = (t2 - t1) / (n2 - n1)
        print(f'bb={bb:>4}  stack={per*1e3:8.3f} ms '
              f'({per/len(params["layers"])*1e3:6.3f} ms/layer)  '
              f'[t{n1}={t1*1e3:.1f} t{n2}={t2*1e3:.1f}]', flush=True)


if __name__ == '__main__':
    main()
