"""Ablate the train step cost (chained device timing). Dev utility."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ppgs_tpu
from ppgs_tpu.models import transformer
from ppgs_tpu.train import core as train_core


def chained(make_body, n1=2, n2=6):
    def run_n(n):
        @jax.jit
        def many(seed):
            def body(i, acc):
                return acc * 1e-30 + make_body(jax.random.fold_in(seed, i))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        many(jax.random.PRNGKey(0)).block_until_ready()
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            many(jax.random.PRNGKey(0)).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n2) - run_n(n1)) / (n2 - n1)


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    B, T = 256, 512
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((B, config.input_channels, T)) * 0.1, jnp.float32)
    targets = jnp.asarray(rng.integers(0, 40, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)

    def fwd_nodrop(r):
        logits = transformer.forward(params, feats, lengths, config)
        return train_core.loss(logits, targets, config)

    def fwd_drop(r):
        logits = transformer.forward(params, feats, lengths, config,
                                     train=True, rng=r)
        return train_core.loss(logits, targets, config)

    def grad_nodrop(r):
        g = jax.grad(lambda p: train_core.loss(
            transformer.forward(p, feats, lengths, config),
            targets, config))(params)
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree.leaves(g)) * 1e-12

    def grad_drop(r):
        g = jax.grad(lambda p: train_core.loss(
            transformer.forward(p, feats, lengths, config, train=True,
                                rng=r),
            targets, config))(params)
        return sum(jnp.sum(x).astype(jnp.float32)
                   for x in jax.tree.leaves(g)) * 1e-12

    cases = {'fwd_nodrop': fwd_nodrop, 'fwd_drop': fwd_drop,
             'grad_nodrop': grad_nodrop, 'grad_drop': grad_drop}
    for name in (sys.argv[1:] or cases):
        dt = chained(cases[name])
        print(f'{name:>12}: {dt*1e3:8.2f} ms', flush=True)


if __name__ == '__main__':
    main()
