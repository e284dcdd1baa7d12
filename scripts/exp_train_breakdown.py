"""Where does the train step's time go? (dev utility)

The round-4 bench puts the full train step at 180 ms / 131k frames
(MFU 0.17) vs a ~30 ms FLOP floor. This times guarded variants to split
the gap: default step, dropout disabled (isolates the 5 layers x 3
dropout sites' mask generation + fp32 where-passes + saved-mask HBM
traffic in the backward), and dropout-free XLA attention (isolates the
custom_vjp kernel's per-(batch, head) program-count overhead).

Chained-slope device timing with the bench.py guards (fresh salted
inputs, output-value fetch, physical-floor rejection).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/exp_train_breakdown.py
"""

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
from ppgs_tpu.models import transformer  # noqa: E402
from ppgs_tpu.train import core as train_core  # noqa: E402

PEAK = 197e12


def measure(config, label):
    params = transformer.init(jax.random.PRNGKey(0), config)
    optimizer = train_core.make_optimizer(config)
    opt_state = optimizer.init(params)
    step_fn = train_core.make_train_step(config, optimizer)

    B, T = 256, 512
    key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    feats = jax.random.normal(
        jax.random.fold_in(key, 0), (B, config.input_channels, T),
        jnp.float32)
    targets = jax.random.randint(
        jax.random.fold_in(key, 1), (B, T), 0, config.output_channels)
    lengths = jnp.full((B,), T, jnp.int32)
    jax.block_until_ready((feats, targets))

    @jax.jit
    def many(params, opt_state, n, seed):
        rng = jax.random.PRNGKey(seed)

        def body(i, carry):
            p, o = carry
            p, o, _, _ = step_fn.__wrapped__(
                p, o, feats, targets, lengths, jax.random.fold_in(rng, i))
            return p, o
        return jax.lax.fori_loop(0, n, body, (params, opt_state))

    salt = iter(range(time.time_ns() % 100000, 10 ** 9))

    def run_n(n):
        out = many(params, opt_state, n, next(salt))
        float(np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[0])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = many(params, opt_state, n, next(salt))
            float(np.asarray(jax.device_get(
                jax.tree.leaves(out)[0])).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (run_n(8) - run_n(2)) / 6
    try:
        analysis = jax.jit(step_fn.__wrapped__).lower(
            params, opt_state, feats, targets, lengths,
            jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis['flops'])
    except Exception:
        flops = None
    floor = (flops / PEAK) if flops else 0.0
    if dt <= 0 or dt < 0.5 * floor:
        print(f'{label:28s} REJECTED (dt={dt * 1e3:.3f} ms, floor '
              f'{floor * 1e3:.2f} ms: degraded runtime)', flush=True)
        return
    mfu = flops / dt / PEAK if flops else float('nan')
    print(f'{label:28s} {dt * 1e3:8.2f} ms/step   mfu={mfu:.3f}',
          flush=True)


def main():
    base = ppgs_tpu.Config()
    measure(base, 'default (dropout .1, kernel)')
    measure(base.replace(dropout=0.0), 'dropout=0 (kernel)')
    os.environ['PPGS_TPU_DISABLE_FLASH'] = '1'
    jax.clear_caches()
    measure(base.replace(dropout=0.0), 'dropout=0, XLA attention')
    del os.environ['PPGS_TPU_DISABLE_FLASH']


if __name__ == '__main__':
    main()
