"""Preprocessing orchestrator (reference: ppgs/preprocess/core.py:16-221).

Dispatches audio batches to representation frontends and writes per-utterance
feature files. Device compute stays jitted; file I/O runs on a host thread
pool (the TPU-side replacement for the reference's spawn Pools), with
backpressure so pending saves stay bounded.
"""

import concurrent.futures
from pathlib import Path

import numpy as np

from .. import config as config_mod
from ..utils import notify as _notify_mod


# Cache file dtype: the reference stores fp16 features (mel.py:19)
SAVE_DTYPE = np.float16


def save_masked(tensor, file, length):
    """Truncate to valid length and save (reference core.py:205-221)."""
    array = np.asarray(tensor)[..., :int(length)]
    np.save(file, array.astype(SAVE_DTYPE)
            if array.dtype == np.float32 else array)


def from_audios(audio, lengths, representation=None, config=None):
    """Preprocess a batch of audio into the requested representation."""
    from .. import preprocess

    config = config_mod.get(config)
    representation = representation or config.representation
    frontend = preprocess.get(representation)
    return frontend.from_audios(audio, lengths, config=config)


def from_audio(audio, sample_rate=None, representation=None, config=None):
    """Preprocess one audio tensor (reference core.py:194-211)."""
    from .. import preprocess

    config = config_mod.get(config)
    representation = representation or config.representation
    frontend = preprocess.get(representation)
    return frontend.from_audio(audio, sample_rate, config=config)


def _valid_length(representation, samples, hopsize):
    """Valid trailing extent of a cached feature for one utterance: frames
    for 100 Hz latents, padded samples for the raw-audio passthrough."""
    if representation in ('w2v2ft', 'wav'):
        from . import w2v2ft

        return int(samples) + 2 * w2v2ft.PAD
    return int(samples) // hopsize


def from_dataloader(
    dataloader,
    output_prefixes,
    representations=None,
    save_workers=4,
    config=None,
):
    """Batched representation caching (reference core.py:107-184).

    ``dataloader`` yields frame-budget (audio, lengths, audio_file) batches;
    ``output_prefixes`` maps audio filename -> cache path prefix. Each
    representation's frontend runs once per batch on device (one compiled
    program); truncated fp16 saves stream to a thread pool with backpressure.
    """
    import jax
    import jax.numpy as jnp

    from .. import preprocess

    config = config_mod.get(config)
    if representations is None:
        representations = [config.representation]

    with concurrent.futures.ThreadPoolExecutor(save_workers) as pool:
        pending = []
        for audios, lengths, batch_files in dataloader:
            lengths = np.asarray(lengths)
            audios = jnp.asarray(np.asarray(audios))
            for representation in representations:
                frontend = preprocess.get(representation)
                features = frontend.from_audios(
                    audios, lengths, config=config)
                host = np.asarray(jax.device_get(features))
                for i, audio_file in enumerate(batch_files):
                    out = Path(
                        f'{output_prefixes[str(audio_file)]}'
                        f'-{representation}.npy')
                    valid = min(
                        _valid_length(representation, lengths[i],
                                      config.hopsize),
                        host.shape[-1])
                    pending.append(
                        pool.submit(save_masked, host[i], out, valid))
            # Backpressure (reference: queue > 256 sleep loop); blocking
            # wait instead of a spin loop — the host core stays free for
            # the loader prefetch thread while the device works
            while len(pending) > 256:
                done, not_done = concurrent.futures.wait(
                    pending,
                    return_when=concurrent.futures.FIRST_COMPLETED)
                for f in done:
                    f.result()
                pending = list(not_done)
        for f in pending:
            f.result()


def from_files_to_files(
    audio_files,
    output_prefixes,
    representations=None,
    config=None,
    num_workers=2,
    save_workers=4,
):
    """Compute and cache representations for audio files.

    Output file naming matches the reference cache layout:
    ``{prefix}-{representation}.npy``. Files batch together up to
    ``config.max_preprocess_frames`` per forward (reference core.py:45-50).
    """
    from ..data import loader as data_loader

    config = config_mod.get(config)
    dataloader = data_loader(
        [Path(f) for f in audio_files],
        features=['audio', 'length', 'audio_file'],
        num_workers=num_workers,
        max_frames=config.max_preprocess_frames,
        config=config)
    prefixes = {str(f): str(p)
                for f, p in zip(audio_files, output_prefixes)}
    from_dataloader(dataloader, prefixes, representations,
                    save_workers=save_workers, config=config)


@_notify_mod.notify("preprocess")
def datasets(names=None, representations=None, config=None, partition=None,
             num_workers=2):
    """Preprocess datasets into the feature cache
    (reference: ppgs/preprocess/core.py:17-104)."""
    from ..data import Dataset

    from ..parallel import multihost

    multihost.initialize()
    config = config_mod.get(config)
    names = names or list(config.datasets)

    for name in names:
        dataset = Dataset(name, partition=partition,
                          features=['audio', 'length', 'audio_file'],
                          config=config)
        cache = dataset.cache
        # Multi-host: caching is embarrassingly parallel per utterance;
        # each process preprocesses every process_count-th file
        pairs = list(multihost.shard_iterator(
            zip(dataset.audio_files, dataset.stems)))
        files = [f for f, _ in pairs]
        prefixes = [cache / stem for _, stem in pairs]
        from_files_to_files(files, prefixes, representations,
                            config=config, num_workers=num_workers)
