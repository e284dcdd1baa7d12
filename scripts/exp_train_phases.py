"""Train-step phase ablation: attribute every ms of the step (dev utility).

Round-4 verdict #1: the step runs ~3x over its FLOP floor. This splits the
gap into phases by timing nested sub-programs of the step at the bench
geometry (B=256, T=512, 131k frames):

  fwd_infer      inference forward (no dropout, inference kernels)
  fwd_train      train-mode forward only (loss value, no grad)
  grad           value_and_grad (fwd + bwd), no clip/stats/Adam
  step           the production step (grad + Adam update)
  step_stats     the logging-step variant (full gradient statistics)
  kernels_only   5x (attention-train kernel + FFN-train kernel) chained,
                 no glue — the kernel-time lower bound of fwd+bwd hot ops

Derived attribution printed at the end:
  bwd = grad - fwd_train;  adam = step - grad;  stats = step_stats - step;
  glue ~= grad - kernels_only - (convs/loss/PE, small)

Chained-slope device timing with the bench.py guards (fresh salted inputs,
output-value fetch, physical-floor rejection).

Usage: cd /root/repo && timeout 1200 python scripts/exp_train_phases.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
B, T = 256, 512


def chained_time(make_body, carry_init, label, n1=2, n2=8):
    """Device time per application of make_body via the chained-slope
    method; body must return a carry pytree of the same structure."""
    salt = iter(range(time.time_ns() % 100000, 10 ** 9))

    @jax.jit
    def many(carry, n, seed):
        rng = jax.random.PRNGKey(seed)

        def body(i, c):
            return make_body(c, jax.random.fold_in(rng, i))
        return jax.lax.fori_loop(0, n, body, carry)

    def run_n(n):
        out = many(carry_init, n, next(salt))
        float(np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[0])
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = many(carry_init, n, next(salt))
            float(np.asarray(jax.device_get(
                jax.tree.leaves(out)[0])).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (run_n(n2) - run_n(n1)) / (n2 - n1)
    print(f'{label:18s} {dt * 1e3:8.2f} ms', flush=True)
    return dt


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    optimizer = train_core.make_optimizer(config)
    opt_state = optimizer.init(params)

    key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    feats = jax.random.normal(
        jax.random.fold_in(key, 0), (B, config.input_channels, T),
        jnp.float32)
    targets = jax.random.randint(
        jax.random.fold_in(key, 1), (B, T), 0, config.output_channels)
    lengths = jnp.full((B,), T, jnp.int32)
    jax.block_until_ready((feats, targets))

    results = {}

    # --- inference forward ------------------------------------------------
    def fwd_infer(c, rng):
        out = transformer.forward(params, feats + c * 1e-30, lengths, config)
        return out.mean()

    results['fwd_infer'] = chained_time(fwd_infer, jnp.float32(0),
                                        'fwd_infer')

    # --- train-mode forward (loss only) ----------------------------------
    def fwd_train(c, rng):
        logits = transformer.forward(
            params, feats + c * 1e-30, lengths, config, train=True, rng=rng)
        return train_core.loss(logits, targets, config)

    results['fwd_train'] = chained_time(fwd_train, jnp.float32(0),
                                        'fwd_train')

    # --- value_and_grad (fwd + bwd, no optimizer) -------------------------
    def grad_only(c, rng):
        def loss_fn(p):
            logits = transformer.forward(
                p, feats, lengths, config, train=True, rng=rng)
            return train_core.loss(logits, targets, config)
        val, grads = jax.value_and_grad(loss_fn)(
            jax.tree.map(lambda x: x + c * 1e-30, params))
        return val + sum(g.sum() for g in jax.tree.leaves(grads)) * 1e-30

    results['grad'] = chained_time(grad_only, jnp.float32(0), 'grad')

    # --- full production step / logging step ------------------------------
    step_fn = train_core.make_train_step(config, optimizer)

    def prod_step(carry, rng):
        p, o = carry
        p, o, _, _ = step_fn.__wrapped__(p, o, feats, targets, lengths, rng)
        return p, o

    results['step'] = chained_time(prod_step, (params, opt_state), 'step')

    def stats_step(carry, rng):
        p, o = carry
        p, o, _, _ = step_fn.__wrapped__(p, o, feats, targets, lengths, rng,
                                         with_stats=True)
        return p, o

    results['step_stats'] = chained_time(stats_step, (params, opt_state),
                                         'step_stats')

    # --- kernel-only lower bound ------------------------------------------
    # 5 layers of (attention train kernel + FFN train kernel) fwd+bwd with
    # minimal glue: grads of a sum through the chain.
    from ppgs_tpu.ops import flash_attention as fa
    from ppgs_tpu.ops import fused_ffn

    x0 = jax.random.normal(jax.random.fold_in(key, 2), (B, T, 256),
                           jnp.bfloat16)
    mask = jnp.ones((B, T), bool)
    kp = [jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                       {'ffn': layer['ffn']}) for layer in params['layers']]

    def kernels_only(c, rng):
        def loss_fn(x):
            h = x
            for i in range(5):
                h = fa.flash_attention_train(
                    h, h, h, mask, 2, dropout_rate=0.1, seed=i)
                h = fused_ffn.ffn_train(
                    h, kp[i]['ffn']['w1'], kp[i]['ffn']['b1'],
                    kp[i]['ffn']['w2'], kp[i]['ffn']['b2'],
                    dropout_rate=0.1, seed=i)
            return h.astype(jnp.float32).mean()
        val, g = jax.value_and_grad(loss_fn)(x0 + c.astype(jnp.bfloat16))
        return (val + g.astype(jnp.float32).mean() * 1e-30).astype(
            jnp.float32)

    results['kernels_only'] = chained_time(kernels_only, jnp.float32(0),
                                           'kernels_only')

    # --- layer-kernel A/B: production step with the whole-layer train
    # kernel disabled (falls back to flash-attn + fused-FFN + XLA glue) ---
    os.environ['PPGS_TPU_TRAIN_LAYER_KERNEL'] = '0'
    jax.clear_caches()
    step_fn_old = train_core.make_train_step(config, optimizer)

    def old_step(carry, rng):
        p, o = carry
        p, o, _, _ = step_fn_old.__wrapped__(p, o, feats, targets, lengths,
                                             rng)
        return p, o

    results['step_no_elt'] = chained_time(old_step, (params, opt_state),
                                          'step_no_elt')
    del os.environ['PPGS_TPU_TRAIN_LAYER_KERNEL']

    # --- attribution -------------------------------------------------------
    ms = {k: v * 1e3 for k, v in results.items()}
    print('\n--- attribution (ms) ---')
    print(f"bwd (grad - fwd_train):      {ms['grad'] - ms['fwd_train']:7.2f}")
    print(f"adam+clip (step - grad):     {ms['step'] - ms['grad']:7.2f}")
    print(f"stats (step_stats - step):   {ms['step_stats'] - ms['step']:7.2f}")
    print(f"glue-ish (grad - kernels):   {ms['grad'] - ms['kernels_only']:7.2f}")
    flop_floor = 3 * 2 * B * T * (
        5 * (4 * 256 * 256 + 2 * T * 256 + 2 * 256 * 2048)
        + 5 * 80 * 256 + 5 * 256 * 40) / PEAK * 1e3
    print(f"FLOP floor (fwd+bwd ~3x fwd): {flop_floor:6.2f}")


if __name__ == '__main__':
    main()
