"""wav2vec 2.0 feature-bottleneck frontend
(reference: ppgs/preprocess/w2v2fb/core.py:32-115).

facebook/wav2vec2-base last hidden state at 50 Hz, nearest-upsampled x2 to
100 Hz. Weights must be converted once (scripts/convert_w2v2.py); the jitted
pipeline then runs entirely on device.
"""

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from ..models import w2v2

# pad = window//2 - hop//2 (reference w2v2fb/core.py:24-25,60)
WINDOW_SIZE = 400
HOP_SIZE = 320
PAD = WINDOW_SIZE // 2 - HOP_SIZE // 2

W2V2FB_CHECKPOINT = config_mod.CHECKPOINT_DIR / 'wav2vec2-base.npz'


@functools.lru_cache(maxsize=1)
def _params():
    from .. import load as load_mod

    if not Path(W2V2FB_CHECKPOINT).exists():
        raise FileNotFoundError(
            f'wav2vec2-base weights not found at {W2V2FB_CHECKPOINT}. '
            f'Convert them with scripts/convert_w2v2.py (requires network).')
    return load_mod.load_params(W2V2FB_CHECKPOINT)


def _tp_placement(params, config):
    """Tensor-parallel frontend placement: attention heads / FFN hidden /
    conv output channels shard over a >1 'model' config-mesh axis
    (parallel.frontend_tp_placement; SURVEY §2.b item 3)."""
    from .. import parallel as parallel_mod

    return parallel_mod.frontend_tp_placement(
        params, config, rule=parallel_mod.w2v2_param_sharding)


def nearest_upsample_indices(in_size: int, out_size: int):
    """torch F.interpolate(mode='nearest') index map: floor(i*in/out)."""
    return (np.arange(out_size) * in_size // out_size).astype(np.int32)


@functools.partial(jax.jit, static_argnames=('out_frames', 'compute_dtype'))
def _forward(params, audio, lengths, out_frames, compute_dtype='bfloat16'):
    import dataclasses

    padded = jnp.pad(audio, ((0, 0), (0, 0), (PAD, PAD))).squeeze(1)
    sample_lengths = lengths + 2 * PAD
    # Frontend compute rides the config dtype (bf16 default on TPU, with
    # fp32 accumulations/statistics inside; the reference serves fp16
    # autocast hidden states and caches fp16 — set
    # config.compute_dtype='float32' for strict-parity numerics)
    wcfg = dataclasses.replace(w2v2.BASE, compute_dtype=compute_dtype)
    hidden = w2v2.forward(params, padded, sample_lengths, wcfg)
    hidden = hidden.transpose(0, 2, 1)                     # (B, 768, T50)
    idx = jnp.asarray(
        nearest_upsample_indices(hidden.shape[-1], out_frames))
    return hidden[..., idx]


def from_audios(audio, lengths=None, config=None, output_dtype=jnp.float32):
    """(B, 1, S) audio @16 kHz -> (B, 768, S // hopsize) latents @100 Hz."""
    config = config_mod.get(config)
    audio = jnp.asarray(audio)
    if lengths is None:
        lengths = np.full((audio.shape[0],), audio.shape[-1])
    lengths = jnp.asarray(lengths)
    out_frames = audio.shape[-1] // config.hopsize
    params = _params()
    placement = _tp_placement(params, config)
    if placement is not None:
        params, in_sharding = placement
        audio = jax.device_put(audio, in_sharding)
    return _forward(params, audio, lengths, out_frames,
                    config.compute_dtype).astype(output_dtype)


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
