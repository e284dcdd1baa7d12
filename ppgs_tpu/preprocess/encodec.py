"""EnCodec code frontend (reference: ppgs/preprocess/encodec.py:12-56).

EnCodec-24 kHz quantizer codes, nearest-upsampled to 100 Hz, int codes.
The encodec package is an optional external dependency (as in the
reference); importing it is gated with a clear error. The train-time
dequantization runs through the config FRONTEND hook.
"""

import numpy as np

from .. import config as config_mod


def _model():
    try:
        from encodec import EncodecModel
    except ImportError as error:
        raise ImportError(
            "The 'encodec' package is required for the encodec "
            "representation: pip install encodec") from error
    if not hasattr(_model, 'model'):
        _model.model = EncodecModel.encodec_model_24khz()
    return _model.model


def from_audios(audio, lengths=None, config=None, output_dtype=np.int32):
    import torch

    config = config_mod.get(config)
    audio = np.asarray(audio)
    expected_length = audio.shape[-1] // config.hopsize

    from ..data import audio as audio_io

    resampled = audio_io.resample(audio, config.sample_rate, 24000)
    with torch.no_grad():
        codes = _model().encode(torch.from_numpy(resampled))[0][0]
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
