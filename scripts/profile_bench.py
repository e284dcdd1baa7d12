"""Break down where bench.py time goes on the real chip.

Times frontend-only, encoder-only, and full pipeline at the bench workload,
plus batch-size sensitivity, and prints a table. Not part of the driver
contract (bench.py is); this is a development tool.
"""

import time

import jax
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu.models import transformer
from ppgs_tpu.ops import stft as stft_ops


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

    B, seconds = 64, 8
    S = seconds * config.sample_rate
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (B, 1, S), jnp.float32) * 0.1
    audio.block_until_ready()
    audio_seconds = B * seconds

    @jax.jit
    def frontend(audio):
        return stft_ops.log_mel_spectrogram(
            audio, config.sample_rate, config.num_fft, config.hopsize,
            config.window_size, config.num_mels, precision='default')

    feats = frontend(audio)
    feats.block_until_ready()
    lengths = jnp.full((B,), feats.shape[-1], jnp.int32)

    @jax.jit
    def encoder(feats):
        return transformer.chunked_forward(params, feats, lengths, config)

    @jax.jit
    def softmax_only(logits):
        return jax.nn.softmax(logits, axis=1)

    @jax.jit
    def full(audio):
        f = stft_ops.log_mel_spectrogram(
            audio, config.sample_rate, config.num_fft, config.hopsize,
            config.window_size, config.num_mels, precision='default')
        lg = transformer.chunked_forward(
            params, f, jnp.full((audio.shape[0],), f.shape[-1], jnp.int32),
            config)
        return jax.nn.softmax(lg, axis=1)

    logits = encoder(feats)
    jax.block_until_ready(logits)

    t_front = timeit(frontend, audio)
    t_enc = timeit(encoder, feats)
    t_soft = timeit(softmax_only, logits)
    t_full = timeit(full, audio)

    print(f'frontend : {t_front*1e3:8.2f} ms  '
          f'({audio_seconds/t_front:10.0f} as/s)')
    print(f'encoder  : {t_enc*1e3:8.2f} ms  ({audio_seconds/t_enc:10.0f} as/s)')
    print(f'softmax  : {t_soft*1e3:8.2f} ms')
    print(f'full     : {t_full*1e3:8.2f} ms  '
          f'({audio_seconds/t_full:10.0f} as/s)')
    print(f'sum parts: {(t_front+t_enc+t_soft)*1e3:8.2f} ms')


if __name__ == '__main__':
    main()
