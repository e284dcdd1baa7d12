"""Training-step throughput on the real chip (secondary benchmark).

SUPERSEDED: bench.py emits the same metric (mel_ppg_train_throughput)
with the full anti-degradation guards (output-value fetch + physical
floor rejection); this standalone script has neither and can report
garbage when the remote runtime is in its degraded state — prefer
  PPGS_BENCH_W2V2FB=0 python bench.py

Measures audio-seconds of speech trained per second per chip through the
full jitted train step (forward + masked CE + backward + grad stats +
Adam) on the flagship mel config, synthetic data generated on device.

Methodology matches bench.py: N steps chained inside ONE jitted program
(the carried train state forces sequential execution; N traced, one
compile), slope over two N, wall-clock-salted inputs and rng so no prior
run's (executable, inputs) pair repeats — the remote runtime caches
results across processes. Params are explicit jit arguments (closed-over
arrays embed as program constants and can exceed the remote-compile
request limit).

Run: PYTHONPATH=/root/repo python scripts/bench_train.py
(One TPU process at a time — don't run concurrently with bench.py.)
"""

import json
import os
import time


def main():
    import jax

    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import ppgs_tpu
    from ppgs_tpu.models import transformer
    from ppgs_tpu.train import core as train_core

    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    optimizer = train_core.make_optimizer(config)
    opt_state = optimizer.init(params)
    step_fn = train_core.make_train_step(config, optimizer)

    # Reference-scale batch: MAX_TRAINING_FRAMES=150k frames/batch
    # (ppgs/config/defaults.py:185). 256 utterances x 512 frames = 131k
    # frames/step, static shape. Wall-clock-salted values.
    B, T = 256, 512
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    feats = jax.random.normal(
        jax.random.fold_in(base_key, 0),
        (B, config.input_channels, T), jnp.float32)
    targets = jax.random.randint(
        jax.random.fold_in(base_key, 1), (B, T), 0, config.output_channels)
    lengths = jnp.full((B,), T, jnp.int32)
    jax.block_until_ready((feats, targets))

    @jax.jit
    def many(params, opt_state, feats, targets, lengths, n, seed):
        rng = jax.random.PRNGKey(seed)

        def body(i, carry):
            p, o = carry
            p, o, _, _ = step_fn.__wrapped__(
                p, o, feats, targets, lengths, jax.random.fold_in(rng, i))
            return p, o
        return jax.lax.fori_loop(0, n, body, (params, opt_state))

    salt = iter(range(time.time_ns() % 100000, 10 ** 9))

    def run_n(n):
        jax.block_until_ready(
            many(params, opt_state, feats, targets, lengths, n, next(salt)))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(
                many(params, opt_state, feats, targets, lengths, n,
                     next(salt)))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 2, 8
    dt = (run_n(n2) - run_n(n1)) / (n2 - n1)

    frames = B * T
    audio_seconds = frames / config.frames_per_second
    record = {
        'metric': 'mel_ppg_train_throughput',
        'value': round(audio_seconds / dt, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'frames_per_step': frames,
        'step_ms': round(dt * 1e3, 2),
    }
    if dt <= 0:
        record.update({'value': 0, 'error': 'non-positive step-time slope '
                                            '(degraded runtime?)'})
    print(json.dumps(record))


if __name__ == '__main__':
    main()
