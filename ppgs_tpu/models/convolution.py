"""Convolutional baseline model (reference: ppgs/model/convolution.py:13-29).

Three 'same'-padded k=5 convs with ReLU between, as pure functions over a
parameter pytree in (B, C, T) <-> internal (B, T, C) layout.
"""

import jax
import jax.numpy as jnp

from ..config import Config
from .transformer import _conv_init, conv1d_same


def init(rng, config: Config):
    k1, k2, k3 = jax.random.split(rng, 3)
    k = config.kernel_size
    return {
        'conv1': _conv_init(k1, k, config.input_channels,
                            config.hidden_channels),
        'conv2': _conv_init(k2, k, config.hidden_channels,
                            config.hidden_channels),
        'conv3': _conv_init(k3, k, config.hidden_channels,
                            config.output_channels),
    }


def forward(params, features, lengths, config: Config, train=False, rng=None,
            precision=None):
    del lengths, train, rng  # unused; parity with reference signature
    x = features.astype(jnp.float32).transpose(0, 2, 1)
    x = jax.nn.relu(conv1d_same(
        x, params['conv1']['weight'], params['conv1']['bias'], precision))
    x = jax.nn.relu(conv1d_same(
        x, params['conv2']['weight'], params['conv2']['bias'], precision))
    x = conv1d_same(
        x, params['conv3']['weight'], params['conv3']['bias'], precision)
    return x.transpose(0, 2, 1)
