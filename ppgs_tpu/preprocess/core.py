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


def from_files_to_files(
    audio_files,
    output_prefixes,
    representations=None,
    config=None,
    save_workers=4,
):
    """Compute and cache representations for audio files.

    output file naming matches the reference cache layout:
    ``{prefix}-{representation}.npy``.
    """
    from ..data import audio as audio_io
    from .. import preprocess

    config = config_mod.get(config)
    if representations is None:
        representations = [config.representation]

    with concurrent.futures.ThreadPoolExecutor(save_workers) as pool:
        pending = []
        for audio_file, prefix in zip(audio_files, output_prefixes):
            audio = audio_io.load(audio_file)[None]          # (1, 1, S)
            frames = audio.shape[-1] // config.hopsize
            for representation in representations:
                frontend = preprocess.get(representation)
                features = frontend.from_audios(
                    audio, np.array([audio.shape[-1]]), config=config)
                out = Path(f'{prefix}-{representation}.npy')
                pending.append(
                    pool.submit(save_masked, np.asarray(features[0]),
                                out, frames))
            # Backpressure (reference: queue > 256 sleep loop)
            while len(pending) > 256:
                pending = [f for f in pending if not f.done()]
        for f in pending:
            f.result()


def datasets(names=None, representations=None, config=None, partition=None):
    """Preprocess datasets into the feature cache
    (reference: ppgs/preprocess/core.py:17-104)."""
    from ..data import Dataset
    from .. import preprocess

    config = config_mod.get(config)
    names = names or list(config.datasets)
    if representations is None:
        representations = [config.representation]

    for name in names:
        dataset = Dataset(name, partition=partition,
                          features=['audio', 'length', 'audio_file'],
                          config=config)
        cache = dataset.cache
        for index in range(len(dataset)):
            audio, length, audio_file = dataset[index]
            stem = dataset.stems[index]
            from_files_to_files(
                [audio_file], [cache / stem],
                representations=representations, config=config)
