"""Log-mel spectrogram frontend (reference: ppgs/preprocess/mel.py:14-76).

The whole pipeline (framing, windowed DFT, magnitude, mel projection, log
compression) is one fused XLA computation of MXU matmuls; see ops/stft.py.
"""

import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..ops import stft as stft_ops


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    """(B, 1, S) audio -> (B, num_mels, T) log-mel spectrogram.

    The reference stores fp16; we default to fp32 on device and let the cache
    writer downcast (bfloat16/fp16) at save time.
    """
    config = config_mod.get(config)
    audio = jnp.asarray(audio)
    # True batch end: the end reflection lands there, not at the padded S
    valid = (jnp.max(jnp.asarray(lengths)).astype(jnp.int32)
             if lengths is not None else None)
    # bf16 configs ride the fused Pallas frontend on TPU (bf16 matmul
    # operands, fp32 accumulation — same width as the encoder compute);
    # fp32 configs keep the strict-parity XLA path ('highest')
    precision = ('default'
                 if jnp.dtype(config.compute_dtype) == jnp.bfloat16
                 else 'highest')
    return stft_ops.log_mel_spectrogram(
        audio,
        sample_rate=config.sample_rate,
        num_fft=config.num_fft,
        hopsize=config.hopsize,
        window_size=config.window_size,
        num_mels=config.num_mels,
        precision=precision,
        output_dtype=output_dtype,
        valid_samples=valid)


def from_audio(audio, sample_rate=None, config=None):
    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        audio = audio[None]
    return from_audios(audio, config=config)


def from_file(audio_file, config=None):
    from ..data import audio as audio_io

    audio = audio_io.load(audio_file)
    return from_audio(audio, config=config)


def from_file_to_file(audio_file, output_file, config=None):
    np.save(output_file, np.asarray(from_file(audio_file, config)))


def from_files_to_files(audio_files, output_files, config=None):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, config)
