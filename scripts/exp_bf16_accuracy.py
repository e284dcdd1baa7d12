"""On-TPU accuracy check of the bf16 (DEFAULT-precision) mel frontend.

ADVICE r4: production bf16 configs run the DFT conv + mel einsum with bf16
operands on TPU — a TPU-only numerics change CPU parity tests cannot see.
This quantifies the end-to-end effect ON THE TPU: PPG JSD and argmax
agreement between the full bf16 pipeline and the fp32/'highest' pipeline,
plus the log-mel feature deltas, over a batch of synthetic speech-scale
audio.

Usage: cd /root/repo && timeout 900 python scripts/exp_bf16_accuracy.py
"""

import os
import sys

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
from ppgs_tpu.ops import algebra  # noqa: E402
from ppgs_tpu.ops import stft as stft_ops  # noqa: E402


def main():
    config_bf16 = ppgs_tpu.Config()
    config_fp32 = config_bf16.replace(compute_dtype='float32')
    params = transformer.init(jax.random.PRNGKey(0), config_bf16)

    B, seconds = 16, 4
    S = seconds * 16000
    # Speech-scale synthetic audio: a few harmonics + noise, on device
    key = jax.random.PRNGKey(7)
    t = jnp.arange(S) / 16000.0
    f0 = 120 + 80 * jax.random.uniform(key, (B, 1))
    audio = sum(
        (0.3 / (k + 1)) * jnp.sin(2 * jnp.pi * f0 * (k + 1) * t[None])
        for k in range(4))
    audio = (audio + 0.02 * jax.random.normal(
        jax.random.fold_in(key, 1), (B, S)))[:, None, :].astype(jnp.float32)

    @jax.jit
    def pipeline_bf16(audio):
        feats = stft_ops.log_mel_spectrogram(
            audio, 16000, 1024, 160, 1024, 80, precision='default')
        lengths = jnp.full((B,), feats.shape[-1], jnp.int32)
        logits = transformer.chunked_forward(
            params, feats, lengths, config_bf16)
        return feats, jax.nn.softmax(logits, axis=1)

    @jax.jit
    def pipeline_fp32(audio):
        feats = stft_ops.log_mel_spectrogram(
            audio, 16000, 1024, 160, 1024, 80, precision='highest')
        lengths = jnp.full((B,), feats.shape[-1], jnp.int32)
        logits = transformer.chunked_forward(
            params, feats, lengths, config_fp32,
            precision=jax.lax.Precision('highest'))
        return feats, jax.nn.softmax(logits, axis=1)

    feats_b, ppg_b = jax.device_get(pipeline_bf16(audio))
    feats_f, ppg_f = jax.device_get(pipeline_fp32(audio))

    feat_err = np.abs(feats_b - feats_f)
    print(f'log-mel  max|delta| = {feat_err.max():.4e}   '
          f'mean|delta| = {feat_err.mean():.4e}')

    # Frame-mean JSD between the two PPG streams (sqrt-JS distance in
    # ops/algebra.distance, reduction over frames)
    jsd = float(algebra.distance(
        jnp.asarray(ppg_b.reshape(-1, 40, ppg_b.shape[-1])[0]),
        jnp.asarray(ppg_f.reshape(-1, 40, ppg_f.shape[-1])[0]),
        reduction='mean'))
    agree = (ppg_b.argmax(1) == ppg_f.argmax(1)).mean()
    l1 = np.abs(ppg_b - ppg_f).max()
    print(f'PPG JSD(frame mean, utt0) = {jsd:.5f}')
    print(f'argmax agreement = {agree:.5f}')
    print(f'max |ppg delta| = {l1:.4f}')

    # Isolate the FRONTEND's contribution: bf16 features into the fp32 model
    @jax.jit
    def mixed(audio):
        feats = stft_ops.log_mel_spectrogram(
            audio, 16000, 1024, 160, 1024, 80, precision='default')
        lengths = jnp.full((B,), feats.shape[-1], jnp.int32)
        logits = transformer.chunked_forward(
            params, feats, lengths, config_fp32,
            precision=jax.lax.Precision('highest'))
        return jax.nn.softmax(logits, axis=1)

    ppg_m = jax.device_get(mixed(audio))
    agree_m = (ppg_m.argmax(1) == ppg_f.argmax(1)).mean()
    print(f'frontend-only: argmax agreement = {agree_m:.5f}, '
          f'max |ppg delta| = {np.abs(ppg_m - ppg_f).max():.4f}')


if __name__ == '__main__':
    main()
