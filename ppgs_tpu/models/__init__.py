"""Model factory (reference: ppgs/model/core.py:9-25).

Models are (init, forward) function pairs over parameter pytrees.
"""

from ..config import Config
from . import convolution, transformer, w2v2


def get(config: Config):
    """Return the (init, forward) pair for config.model."""
    if config.model == 'transformer':
        return transformer.init, transformer.forward
    if config.model == 'convolution':
        return convolution.init, convolution.forward
    if config.model == 'Wav2Vec2.0':
        from . import w2v2_ppg

        return w2v2_ppg.init, w2v2_ppg.forward
    if config.model == 'W2V2FC':
        from . import w2v2_ppg

        return w2v2_ppg.fc_init, w2v2_ppg.fc_forward
    raise ValueError(f'Model {config.model} is not defined')


def init(rng, config: Config):
    return get(config)[0](rng, config)


def forward(params, features, lengths, config: Config, **kwargs):
    return get(config)[1](params, features, lengths, config, **kwargs)
