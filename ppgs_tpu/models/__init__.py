"""Model factory (reference: ppgs/model/core.py:9-25).

Models are (init, forward) function pairs over parameter pytrees.
"""

from ..config import Config
from . import convolution, transformer


def get(config: Config):
    """Return the (init, forward) pair for config.model."""
    if config.model == 'transformer':
        return transformer.init, transformer.forward
    if config.model == 'convolution':
        return convolution.init, convolution.forward
    raise ValueError(f'Model {config.model} is not defined')


def init(rng, config: Config):
    return get(config)[0](rng, config)


def forward(params, features, lengths, config: Config, **kwargs):
    return get(config)[1](params, features, lengths, config, **kwargs)
