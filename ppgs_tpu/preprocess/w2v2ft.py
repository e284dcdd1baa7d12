"""Raw-audio passthrough frontend for end-to-end wav2vec2 fine-tuning
(reference: ppgs/preprocess/w2v2ft/core.py:32-69, representation 'wav').

Resamples to 16 kHz and pads by window//2 - hop//2.
"""

import jax.numpy as jnp
import numpy as np

from .. import config as config_mod

WINDOW_SIZE = 400
HOP_SIZE = 160
PAD = WINDOW_SIZE // 2 - HOP_SIZE // 2


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    audio = jnp.asarray(audio)
    if audio.ndim == 3:
        audio = audio.squeeze(1)
    return jnp.pad(audio, ((0, 0), (PAD, PAD))).astype(output_dtype)


def from_audio(audio, sample_rate=None, config=None):
    config = config_mod.get(config)
    audio = np.asarray(audio)
    if sample_rate is not None and sample_rate != config.sample_rate:
        from ..data import audio as audio_io

        audio = audio_io.resample(audio, sample_rate, config.sample_rate)
    audio = jnp.asarray(audio)
    if audio.ndim == 2:
        audio = audio[None]
    return from_audios(audio, config=config)


def from_file(audio_file, config=None):
    from ..data import audio as audio_io

    return from_audio(audio_io.load(audio_file), config=config)


def from_file_to_file(audio_file, output_file, config=None):
    np.save(output_file,
            np.asarray(from_file(audio_file, config)).astype(np.float16))


def from_files_to_files(audio_files, output_files, config=None):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, config)
