"""Charsiu wav2vec2 frame-classifier latent frontend
(reference: ppgs/preprocess/w2v2fc/core.py:31-110).

768-d hidden states at 100 Hz from the charsiu/en_w2v2_fc_10ms trunk (the
stride-1 wav2vec2 variant). Requires converted Charsiu weights.
"""

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..models import w2v2
from ..models.w2v2_ppg import PADDING, w2v2_100hz_config

W2V2FC_CHECKPOINT = config_mod.CHECKPOINT_DIR / 'charsiu-w2v2-fc.npz'


@functools.lru_cache(maxsize=1)
def _params():
    from .. import load as load_mod

    if not Path(W2V2FC_CHECKPOINT).exists():
        raise FileNotFoundError(
            f'Charsiu weights not found at {W2V2FC_CHECKPOINT}. Convert '
            f'them with scripts/convert_w2v2.py --charsiu (needs network).')
    return load_mod.load_params(W2V2FC_CHECKPOINT)


@functools.partial(jax.jit, static_argnames=('compute_dtype',))
def _forward(params, audio, lengths, compute_dtype='bfloat16'):
    padded = jnp.pad(audio, ((0, 0), (0, 0), (PADDING, PADDING))).squeeze(1)
    sample_lengths = lengths + 2 * PADDING
    hidden = w2v2.forward(params['w2v2'], padded, sample_lengths,
                          w2v2_100hz_config(compute_dtype))
    return hidden.transpose(0, 2, 1)            # (B, 768, T100)


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    config = config_mod.get(config)
    audio = jnp.asarray(audio)
    if lengths is None:
        lengths = np.full((audio.shape[0],), audio.shape[-1])
    out = _forward(_params(), audio, jnp.asarray(lengths),
                   config.compute_dtype)
    frames = audio.shape[-1] // config.hopsize
    return out[..., :frames].astype(output_dtype)


def from_audio(audio, sample_rate=None, config=None):
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
