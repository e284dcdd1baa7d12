"""Inference API (reference: ppgs/core.py:22-391,551-621).

from_audio -> from_features -> infer chain with model caching. TPU-first
details:
- All device compute is jit-compiled once per (config, padded shape); the
  time dimension is bucketed (rounded up to the chunk stride) so arbitrary
  audio lengths reuse a handful of compiled programs instead of recompiling.
- Long inputs use models.transformer.chunked_forward, which folds 500-frame
  overlap windows into the batch dimension (one MXU-dense forward).
- File batch inference streams device->host copies to a thread pool with
  backpressure (replacing the reference's multiprocessing spawn pools).
"""

import concurrent.futures
import functools
import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import config as config_mod
from . import load as load_mod
from . import preprocess
from .models import transformer as transformer_model


###############################################################################
# Model cache + jitted forwards
###############################################################################


_MODEL_CACHE: Dict[str, tuple] = {}


def _get_model(representation, checkpoint, config):
    key = (representation, str(checkpoint), config)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = load_mod.model(
            checkpoint=checkpoint, representation=representation,
            config=config)
    return _MODEL_CACHE[key]


@functools.partial(jax.jit, static_argnames=('config', 'softmax', 'chunked'))
def _forward_jit(params, features, lengths, phys_lengths, config, softmax,
                 chunked):
    # Frames past the physical extent (phys_lengths) don't exist in the
    # reference's batched tensors (its convs zero-pad there); our
    # compile-cache padding must not leak frontend junk (e.g. log-mel of
    # zero audio = log(1e-5)) into the input conv's receptive field.
    # Traced, so no recompilation per length.
    t = features.shape[-1]
    keep = jnp.arange(t) < phys_lengths
    features = features * keep.astype(features.dtype)[None, None, :]
    if config.model == 'transformer':
        if chunked:
            logits = transformer_model.chunked_forward(
                params, features, lengths, config,
                true_frames=phys_lengths)
        else:
            phys = jnp.full(lengths.shape, phys_lengths, lengths.dtype)
            logits = transformer_model.forward(
                params, features, lengths, config, phys_lengths=phys)
    else:
        from . import models

        logits = models.get(config)[1](params, features, lengths, config)
    if softmax:
        return jax.nn.softmax(logits, axis=1)
    return logits


def _bucket_frames(t, stride):
    """Round T up to a multiple of the chunk stride (min one stride)."""
    return max(stride, int(math.ceil(t / stride)) * stride)


def infer(
    features,
    lengths,
    representation: str = 'mel',
    checkpoint=None,
    softmax: bool = True,
    legacy_mode: bool = False,
    config=None,
    extent: int = None,
):
    """Model inference on (B, C, T) features (reference ppgs/core.py:551-598).

    Returns (B, num_phonemes, T) posteriorgrams (or logits if softmax=False).

    ``extent``: the physical frame extent of the equivalent reference tensor
    (batch-max frame length). When the caller has padded T beyond it for
    compile-cache reuse, frames in [extent, T) are masked to zero before the
    input conv — in the reference they don't exist and the conv zero-pads
    there. Defaults to T (features not padded past the true extent).
    """
    base_config = config_mod.get(config)
    if base_config.representation_kind == 'latents':
        return features

    params, config = _get_model(representation, checkpoint, base_config)

    # Codebook FRONTEND: encodec/dac features are cached int codes;
    # dequantize to latents on device (reference ppgs/core.py:105-115)
    if (config.frontend is not None
            and representation == config.representation):
        from . import frontend as frontend_mod

        features = frontend_mod.make_frontend(config.frontend)(features)

    features = jnp.asarray(features)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    B, C, T = features.shape
    phys = jnp.asarray(T if extent is None else int(extent), jnp.int32)

    if config.model != 'transformer':
        # Raw-audio models (Wav2Vec2.0 / W2V2FC) and the convolution
        # baseline take inputs as-is; no frame bucketing or chunking
        return _forward_jit(params, features, lengths, phys, config, softmax,
                            False)

    stride = config.chunk_length - 2 * config.chunk_overlap
    chunked = (not legacy_mode) and T > config.chunk_length

    # Config-reachable context parallelism: with a >1 'seq' axis on the
    # config mesh, long inputs shard their TIME dimension over devices
    # (halo exchange over ICI, parallel/context.py) — bit-equal window
    # geometry to the single-device chunked forward
    if chunked and 'seq' in config.mesh_axis_names:
        from . import parallel as parallel_mod

        mesh = parallel_mod.make_mesh(
            shape=config.mesh_shape, axis_names=config.mesh_axis_names)
        n_seq = mesh.shape.get('seq', 1)
        if n_seq > 1:
            padded, _ = parallel_mod.pad_frames_for_context(
                features, config, n_seq)
            logits = parallel_mod.context_parallel_chunked_forward(
                params, padded, lengths, config, mesh, axis='seq',
                true_frames=int(phys))
            out = jax.nn.softmax(logits, axis=1) if softmax else logits
            return out[..., :T]

    # Pad time to a bucket boundary for compile reuse; the true extent is
    # passed through (traced) so truncation-boundary parity is preserved
    padded_t = T if legacy_mode else _bucket_frames(T, stride)
    if padded_t > T:
        features = jnp.pad(features, ((0, 0), (0, 0), (0, padded_t - T)))

    out = _forward_jit(params, features, lengths, phys, config, softmax,
                       chunked)
    return out[..., :T]


###############################################################################
# API
###############################################################################


def from_audio(
    audio,
    sample_rate: Union[int, float] = None,
    representation: str = None,
    checkpoint=None,
    lengths=None,
    legacy_mode: bool = False,
    config=None,
):
    """Infer PPGs from batched audio (B, 1, S) -> (B, P, frames).

    ``lengths``: per-row valid sample counts (B,), defaulting to the full
    physical length S for every row. With variable-length rows, zero-pad the
    audio to a common S, pass the true lengths here, and read each row's
    first ``lengths[i] // hopsize`` output frames (frames past a row's
    length are masked; their softmax is the meaningless uniform 1/P).
    Batch semantics match ``from_dataloader``: frontends run on the padded
    batch tensor (reference ppgs/preprocess semantics), so a shorter row's
    final frames see the batch zero padding, not a per-row edge reflection.
    """
    config = config_mod.get(config)
    representation = representation or config.representation
    sample_rate = sample_rate or config.sample_rate

    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 2:
        audio = audio[None]
    B = audio.shape[0]
    if lengths is not None:
        lengths = np.asarray(lengths, dtype=np.int64).reshape(-1)
        if lengths.shape[0] != B:
            raise ValueError(
                f'lengths has {lengths.shape[0]} entries for batch size {B}')
    if sample_rate != config.sample_rate:
        from .data import audio as audio_io

        audio = audio_io.resample(audio, sample_rate, config.sample_rate)
        if lengths is not None:
            lengths = np.minimum(
                np.round(lengths * (config.sample_rate / sample_rate)),
                audio.shape[-1]).astype(np.int64)

    full = lengths is None
    if full:
        lengths = np.full((B,), audio.shape[-1], dtype=np.int64)

    features = preprocess.get(representation).from_audios(
        jnp.asarray(audio), lengths, config=config)
    if full:
        feat_lengths = np.full((B,), features.shape[-1], dtype=np.int64)
    else:
        # Same frame-length derivation as from_dataloader
        feat_lengths = np.minimum(
            lengths // config.hopsize, features.shape[-1])
    return from_features(
        features, feat_lengths, representation=representation,
        checkpoint=checkpoint, legacy_mode=legacy_mode, config=config,
        extent=int(np.max(feat_lengths)) if not full else None)


def from_features(
    features,
    lengths,
    representation: str = None,
    checkpoint=None,
    softmax: bool = True,
    legacy_mode: bool = False,
    config=None,
    extent: int = None,
):
    """Infer PPGs from input features (B, C, T)."""
    config = config_mod.get(config)
    representation = representation or config.representation
    return infer(
        features=features,
        lengths=lengths,
        representation=representation,
        checkpoint=checkpoint,
        softmax=softmax,
        legacy_mode=legacy_mode,
        config=config,
        extent=extent)


def from_file(
    file,
    representation: str = None,
    checkpoint=None,
    legacy_mode: bool = False,
    config=None,
):
    """Infer PPGs from an audio file -> (P, frames)."""
    audio = load_mod.audio(file)
    return from_audio(
        audio[None], representation=representation, checkpoint=checkpoint,
        legacy_mode=legacy_mode, config=config)[0]


def from_file_to_file(
    audio_file,
    output_file,
    representation: str = None,
    checkpoint=None,
    legacy_mode: bool = False,
    config=None,
):
    """Infer PPGs from an audio file and save as .npy."""
    result = from_file(audio_file, representation, checkpoint, legacy_mode,
                       config)
    np.save(output_file, np.asarray(result))


def from_files_to_files(
    audio_files: List,
    output_files: List,
    representation: str = None,
    checkpoint=None,
    num_workers: int = 0,
    max_frames: int = None,
    legacy_mode: bool = False,
    config=None,
):
    """Batched file-to-file inference with async saving
    (reference ppgs/core.py:207-272)."""
    config = config_mod.get(config)
    representation = representation or config.representation

    # Single-threaded: file at a time
    if num_workers == 0:
        for audio_file, output_file in zip(audio_files, output_files):
            from_file_to_file(audio_file, output_file, representation,
                              checkpoint, legacy_mode, config)
        return

    # Multi-threaded: frame-budget batches from the data loader; loading,
    # device compute, and saving overlap (loader prefetch thread + save pool)
    from .data import loader as data_loader

    dataloader = data_loader(
        [Path(f) for f in audio_files],
        features=['audio', 'length', 'audio_file'],
        num_workers=max(1, num_workers // 2),
        max_frames=max_frames or config.max_inference_frames,
        config=config)
    # Duplicate audio paths fan out to all their outputs (the reference's
    # filename-keyed dict silently collapses them)
    mapping = {}
    for audio_file, output_file in zip(audio_files, output_files):
        mapping.setdefault(str(audio_file), []).append(output_file)
    from_dataloader(
        dataloader, mapping, representation=representation,
        checkpoint=checkpoint, save_workers=max(1, num_workers // 2),
        legacy_mode=legacy_mode, config=config)


def from_dataloader(
    dataloader,
    output_files: Dict,
    representation: str = None,
    checkpoint=None,
    save_workers: int = 1,
    legacy_mode: bool = False,
    config=None,
):
    """Infer PPGs for every batch of a dataloader yielding
    (audio, length, audio_file) and save one .npy per utterance
    (reference ppgs/core.py:280-391).

    output_files maps audio filename -> output filename. Saves run on a
    thread pool with backpressure (the reference uses spawn Pools; here the
    device->host copy is the synchronization point, so threads suffice —
    np.save releases the GIL during I/O).
    """
    config = config_mod.get(config)
    representation = representation or config.representation

    # Config-reachable data-parallel inference: with >1 device on the
    # config mesh's 'data' axis, batches shard over it — the jitted
    # frontend + model follow the input sharding (GSPMD), no other changes
    mesh, n_data = None, 1
    if 'data' in config.mesh_axis_names and len(jax.devices()) > 1:
        from . import parallel as parallel_mod

        candidate = parallel_mod.make_mesh(
            shape=config.mesh_shape, axis_names=config.mesh_axis_names)
        if candidate.shape.get('data', 1) > 1:
            mesh, n_data = candidate, candidate.shape['data']

    save_pool = concurrent.futures.ThreadPoolExecutor(max(1, save_workers))
    pending = []
    try:
        for audios, lengths, batch_files in dataloader:
            audio_np = np.asarray(audios)
            lengths_np = np.asarray(lengths)
            if mesh is not None:
                from . import parallel as parallel_mod

                audio_np, lengths_np = parallel_mod.pad_batch_to_multiple(
                    (audio_np, lengths_np), n_data)
                audio_dev = jax.device_put(
                    audio_np, parallel_mod.batch_sharding(mesh))
            else:
                audio_dev = jnp.asarray(audio_np)

            # Frontend + model on device, one batch (feat_lengths spans
            # padded rows too — padded entries are 0 and trimmed at save)
            features = preprocess.get(representation).from_audios(
                audio_dev, lengths_np, config=config)
            feat_lengths = np.minimum(
                lengths_np // config.hopsize, features.shape[-1])
            # Physical extent of the equivalent reference tensor: the mel of
            # the batch-max-length audio (collate quantizes samples past it
            # for compile reuse; those frames must not reach the input conv)
            result = from_features(
                features, feat_lengths, representation=representation,
                checkpoint=checkpoint, legacy_mode=legacy_mode,
                config=config, extent=int(np.max(feat_lengths)))

            # Async masked saves (truncate padding) with backpressure
            # (reference: queue > 100)
            host = np.asarray(jax.device_get(result))
            for i, audio_file in enumerate(batch_files):
                outs = output_files[str(audio_file)]
                if not isinstance(outs, (list, tuple)):
                    outs = [outs]
                for out in outs:
                    pending.append(save_pool.submit(
                        np.save, out, host[i, :, :int(feat_lengths[i])]))
            while len(pending) > 100:
                done, not_done = concurrent.futures.wait(
                    pending,
                    return_when=concurrent.futures.FIRST_COMPLETED)
                for f in done:
                    f.result()
                pending = list(not_done)
        for f in pending:
            f.result()
    finally:
        save_pool.shutdown(wait=True)


def resample(audio, sample_rate, target_rate=None):
    """Audio resampling (reference ppgs/core.py:600-609)."""
    from .data import audio as audio_io

    target_rate = target_rate or config_mod.default().sample_rate
    return audio_io.resample(np.asarray(audio), sample_rate, target_rate)


def representation_file_extension(config=None):
    """Cache filename suffix for the active representation
    (reference ppgs/core.py:612-621), with .npy instead of .pt."""
    config = config_mod.get(config)
    if (config.representation == config.best_representation
            and config.representation_kind == 'ppg'):
        return '-ppg.npy'
    if config.representation_kind == 'ppg':
        return f'-{config.representation}-ppg.npy'
    return f'-{config.representation}.npy'
