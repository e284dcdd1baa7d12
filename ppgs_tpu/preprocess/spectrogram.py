"""Magnitude spectrogram frontend (reference: ppgs/preprocess/spectrogram.py).

Uniform frontend protocol: from_audio / from_audios / from_file /
from_file_to_file / from_files_to_files.
"""

import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..ops import stft as stft_ops


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    """(B, 1, S) audio -> (B, 513, T) magnitude spectrogram."""
    config = config_mod.get(config)
    audio = jnp.asarray(audio)
    valid = (jnp.max(jnp.asarray(lengths)).astype(jnp.int32)
             if lengths is not None else None)
    return stft_ops.magnitude_spectrogram(
        audio, config.num_fft, config.hopsize, config.window_size,
        valid_samples=valid).astype(output_dtype)


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
