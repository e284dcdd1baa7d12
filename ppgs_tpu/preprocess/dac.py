"""Descript audio codec (DAC) frontend
(reference: ppgs/preprocess/dac.py:14-48).

DAC-16 kHz quantizer codes nearest-upsampled to 100 Hz. The dac package is an
optional external dependency, gated with a clear error as in the reference.
"""

import numpy as np

from .. import config as config_mod


def _model():
    try:
        import dac
    except ImportError as error:
        raise ImportError(
            "The 'descript-audio-codec' package is required for the dac "
            "representation: pip install descript-audio-codec") from error
    if not hasattr(_model, 'model'):
        model_path = dac.utils.download(model_type='16khz')
        _model.model = dac.DAC.load(model_path)
    return _model.model


def from_audios(audio, lengths=None, config=None, output_dtype=np.int32):
    import torch

    config = config_mod.get(config)
    audio = np.asarray(audio)
    expected_length = audio.shape[-1] // config.hopsize

    model = _model()
    with torch.no_grad():
        x = model.preprocess(torch.from_numpy(audio), config.sample_rate)
        _, codes, *_ = model.encode(x)
        codes = codes.to(torch.float32)
        upsampled = torch.nn.functional.interpolate(
            codes, size=expected_length, mode='nearest')
    return upsampled.numpy().astype(output_dtype)


def from_audio(audio, sample_rate=None, config=None):
    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio[None]
    return from_audios(audio, config=config)


def from_file(audio_file, config=None):
    from ..data import audio as audio_io

    return from_audio(audio_io.load(audio_file), config=config)


def from_file_to_file(audio_file, output_file, config=None):
    np.save(output_file, from_file(audio_file, config))


def from_files_to_files(audio_files, output_files, config=None):
    for audio_file, output_file in zip(audio_files, output_files):
        from_file_to_file(audio_file, output_file, config)
