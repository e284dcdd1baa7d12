"""Benchmark: mel-PPG inference throughput on the real chip.

Measures audio-seconds of speech processed per second per chip through the
full flagship pipeline (log-mel frontend + 5-layer transformer + softmax),
end to end on device. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md): the baseline is
parity-defined, so vs_baseline defaults to 1.0. The measured path is the
default config path (bf16 compute + Pallas whole-layer encoder kernels) —
what ppgs_tpu.from_audio actually runs; parity is enforced by tests/. Set
PPGS_BENCH_FULL=1 to also measure the XLA-only reference-numerics path and
report the speedup over it in vs_baseline (adds a second multi-minute
compile — device compiles ride a slow tunnel in this environment, so the
default stays single-path for reliability).
"""

import json
import os
import time


def main():
    import jax

    # Persistent compilation cache: device compiles ride a slow tunnel in
    # this environment (minutes); warm-cache reruns start in seconds.
    try:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import ppgs_tpu
    from ppgs_tpu.models import transformer
    from ppgs_tpu.ops import stft as stft_ops

    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)

    # Workload: 64 utterances x 8 s audio @16 kHz, generated on device
    # (host->device transfers are slow in this environment). Several
    # DISTINCT input batches are cycled during timing: repeated dispatch of
    # an identical (executable, inputs) pair can be served from a cache by
    # the remote runtime, which would measure dispatch instead of compute.
    B, seconds, n_inputs = 64, 8, 4
    S = seconds * config.sample_rate
    audios = [
        jax.random.normal(
            jax.random.PRNGKey(1 + i), (B, 1, S), jnp.float32) * 0.1
        for i in range(n_inputs)
    ]
    jax.block_until_ready(audios)

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

    def timeit(fn, iters=16):
        fn(audios[0]).block_until_ready()
        start = time.perf_counter()
        outs = [fn(audios[i % n_inputs]) for i in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - start) / iters

    def timeit_chained(fn, n1=3, n2=9):
        """Device-side time per pipeline application: chain N applications
        inside ONE jitted program (a loop-carried scalar forces sequential
        execution) and fit the slope over two N — dispatch/tunnel overheads
        and any runtime result caching cancel."""
        def run_n(n):
            @jax.jit
            def many(audio):
                def body(i, acc):
                    out = fn.__wrapped__(audio + acc * 1e-30)
                    return out.mean().astype(audio.dtype)
                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            many(audios[0]).block_until_ready()
            best = float('inf')
            for _ in range(3):
                t0 = time.perf_counter()
                many(audios[0]).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        return (run_n(n2) - run_n(n1)) / (n2 - n1)

    audio_seconds = B * seconds

    # Default path: the default config (bf16 compute + Pallas whole-stack
    # kernel), i.e. exactly what ppgs_tpu.from_audio runs. Parity with the
    # reference numerics is enforced by tests/, not by the benchmark.
    # PPGS_BENCH_CHAINED=1 measures via N-chained applications inside one
    # program (immune to dispatch overhead and runtime result caching).
    measure = (timeit_chained if os.environ.get('PPGS_BENCH_CHAINED')
               else timeit)
    value = audio_seconds / measure(make_pipeline(params))

    vs_baseline = 1.0
    if os.environ.get('PPGS_BENCH_FULL'):
        # Additionally measure the XLA-only reference-numerics path
        # (Pallas kernels disabled) and report the speedup over it.
        # Adds a second multi-minute compile over the tunnel.
        os.environ['PPGS_TPU_DISABLE_FLASH'] = '1'
        try:
            xla_only = audio_seconds / timeit(make_pipeline(params))
        finally:
            del os.environ['PPGS_TPU_DISABLE_FLASH']
        vs_baseline = value / xla_only

    print(json.dumps({
        'metric': 'mel_ppg_inference_throughput',
        'value': round(value, 2),
        'unit': 'audio_seconds_per_second_per_chip',
        'vs_baseline': round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()
