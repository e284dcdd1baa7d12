"""Pallas conv-stack kernel (ops/conv_stack.py) vs the XLA feature
encoder, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ppgs_tpu.models import w2v2
from ppgs_tpu.ops import conv_stack


def run_stack(params, audio, config, tile_out):
    weights = tuple(layer['conv']['weight']
                    for layer in params['feature_encoder'])
    gn = params['feature_encoder'][0]['group_norm']
    patches = conv_stack.make_patches(
        jnp.asarray(audio), config.conv_kernel[0], config.conv_stride[0])
    return np.asarray(conv_stack.feature_encoder_stack(
        patches, weights, gn['scale'], gn['bias'],
        tuple(config.conv_kernel), tuple(config.conv_stride),
        tile_out=tile_out, interpret=True))


def xla_reference(params, audio, config):
    import dataclasses

    cfg = dataclasses.replace(config, compute_dtype='bfloat16')
    return np.asarray(w2v2.feature_encoder(
        params, jnp.asarray(audio), cfg))


@pytest.mark.parametrize('samples,tile_out', [(4000, 8), (12000, 8)])
def test_conv_stack_matches_xla_base_geometry(samples, tile_out):
    """Full wav2vec2-base k/s geometry on short audio; multiple tiles
    exercise the halo windows."""
    config = w2v2.BASE
    params = w2v2.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((2, samples))).astype(np.float32)

    got = run_stack(params, audio, config, tile_out)
    want = xla_reference(params, audio, config)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    # bf16-level agreement on the bulk of values
    close = np.isclose(got, want, rtol=2e-2, atol=2e-2)
    assert close.mean() > 0.99


def test_conv_stack_tiny_geometry():
    """Generic over config: a 2-layer toy stack."""
    tiny = w2v2.W2V2Config(
        conv_dim=(64, 64), conv_kernel=(10, 3), conv_stride=(5, 2),
        hidden_size=48, num_layers=1, num_heads=4, intermediate_size=96)
    params = w2v2.init(jax.random.PRNGKey(1), tiny)
    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal((3, 2000))).astype(np.float32)

    got = run_stack(params, audio, tiny, tile_out=16)
    want = xla_reference(params, audio, tiny)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_geometry_helpers():
    kernel = (10, 3, 3, 3, 3, 2, 2)
    stride = (5, 2, 2, 2, 2, 2, 2)
    geometry = conv_stack.layer_geometry(kernel, stride)
    # layer 1's input (= conv0's output frames) needs 64N + 15 rows
    assert geometry[1] == (64, 15)
    # sample-level receptive field: 320N + 80
    assert geometry[0] == (320, 80)
    # out_frames inverts the chain
    n = conv_stack.out_frames(64 * 4 + 15, kernel[1:], stride[1:])
    assert n == 4


def test_conv_tap_groups_layout():
    """Tap groups stack stride-consecutive taps for the lane-folded
    matmul formulation."""
    import jax.numpy as jnp

    k, s, c_in, c_out = 3, 2, 4, 8
    w = jnp.arange(k * c_in * c_out, dtype=jnp.float32).reshape(
        k, c_in, c_out)
    groups = conv_stack.conv_tap_groups(w, s, jnp.float32)
    assert len(groups) == 2                       # ceil(3/2)
    assert groups[0].shape == (2 * c_in, c_out)   # taps 0,1
    assert groups[1].shape == (1 * c_in, c_out)   # tap 2
    np.testing.assert_array_equal(
        np.asarray(groups[0]), np.asarray(w).reshape(-1, c_out)[:2 * c_in])
    np.testing.assert_array_equal(
        np.asarray(groups[1]), np.asarray(w[2]))
