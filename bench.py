"""Benchmark: mel-PPG inference throughput on the real chip.

Measures audio-seconds of speech processed per second per chip through the
full flagship pipeline (log-mel frontend + 5-layer transformer + softmax),
end to end on device. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
compares against a measured reference-equivalent torch-CPU estimate scaled by
the configured baseline factor when available, else 1.0 (parity-defined
baseline).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import ppgs_tpu
    from ppgs_tpu.models import transformer
    from ppgs_tpu.ops import stft as stft_ops

    config = ppgs_tpu.Config()
    rng = jax.random.PRNGKey(0)
    params = transformer.init(rng, config)

    # Workload: batch of 64 utterances x 8 s audio @16 kHz
    B, seconds = 64, 8
    S = seconds * config.sample_rate
    audio = np.random.default_rng(0).standard_normal(
        (B, 1, S)).astype(np.float32) * 0.1
    audio_d = jnp.asarray(audio)

    @jax.jit
    def pipeline(audio):
        feats = stft_ops.log_mel_spectrogram(
            audio, config.sample_rate, config.num_fft, config.hopsize,
            config.window_size, config.num_mels, precision='default')
        lengths = jnp.full((audio.shape[0],), feats.shape[-1], jnp.int32)
        logits = transformer.chunked_forward(params, feats, lengths, config)
        return jax.nn.softmax(logits, axis=1)

    # Warmup/compile
    pipeline(audio_d).block_until_ready()

    # Timed runs
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        out = pipeline(audio_d)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    audio_seconds = B * seconds * iters
    throughput = audio_seconds / elapsed

    print(json.dumps({
        'metric': 'mel_ppg_inference_throughput',
        'value': round(throughput, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'vs_baseline': 1.0,
    }))


if __name__ == '__main__':
    main()
