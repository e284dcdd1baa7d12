"""Training-step throughput on the real chip (secondary benchmark).

Measures audio-seconds of speech trained per second per chip through the
full jitted train step (forward + masked CE + backward + grad stats +
Adam) on the flagship mel config, synthetic data generated on device.

Run: PYTHONPATH=/root/repo python scripts/bench_train.py
(One TPU process at a time — don't run concurrently with bench.py.)
"""

import json
import time


def main():
    import jax
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
    # frames/step, static shape.
    B, T = 256, 512
    n_inputs = 4            # distinct batches (see bench.py note on caching)
    keys = jax.random.split(jax.random.PRNGKey(1), n_inputs * 2)
    batches = []
    for i in range(n_inputs):
        feats = jax.random.normal(
            keys[2 * i], (B, config.input_channels, T), jnp.float32)
        targets = jax.random.randint(
            keys[2 * i + 1], (B, T), 0, config.output_channels)
        batches.append((feats, targets))
    lengths = jnp.full((B,), T, jnp.int32)
    jax.block_until_ready(batches)
    rng = jax.random.key(2, impl='rbg')

    # Chain N steps inside ONE jitted program (state carries the
    # dependency) and fit time over two N: the slope is the pure device
    # step time — dispatch/tunnel overheads and any result caching cancel.
    def run_n(n):
        @jax.jit
        def many(params, opt_state):
            def body(i, carry):
                params, opt_state = carry
                feats, targets = batches[0]
                params, opt_state, _, _ = step_fn.__wrapped__(
                    params, opt_state, feats, targets, lengths,
                    jax.random.fold_in(rng, i))
                return params, opt_state
            return jax.lax.fori_loop(0, n, body, (params, opt_state))

        out = many(params, opt_state)
        jax.block_until_ready(out)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(params, opt_state))
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 2, 8
    dt = (run_n(n2) - run_n(n1)) / (n2 - n1)

    frames = B * T
    audio_seconds = frames / config.frames_per_second
    print(json.dumps({
        'metric': 'mel_ppg_train_throughput',
        'value': round(audio_seconds / dt, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'frames_per_step': frames,
        'step_ms': round(dt * 1e3, 2),
    }))


if __name__ == '__main__':
    main()
