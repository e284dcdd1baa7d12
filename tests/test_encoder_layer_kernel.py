"""Whole-encoder-layer Pallas kernel vs the XLA layer (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

import ppgs_tpu
from ppgs_tpu.models import transformer
from ppgs_tpu.ops import encoder_layer_kernel as elk


def test_matches_xla_layer():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    layer = params['layers'][0]

    B, T, C = 4, 512, config.hidden_channels
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([512, 500, 100, 3])
    mask = transformer.mask_from_lengths(lengths, T)

    want = transformer._encoder_layer(
        x, layer, mask, False, config.attention_heads,
        [None] * 4, 0.0, jnp.bfloat16, None)
    got = elk.encoder_layer(
        x, mask, layer['attn'], layer['norm1'], layer['ffn'],
        layer['norm2'], config.attention_heads, interpret=True)

    assert got.shape == want.shape and got.dtype == want.dtype
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=5e-2, rtol=5e-2)


def test_fp32_compute_dtype_tight():
    """With fp32 operands the kernel should track the fp32 XLA layer closely."""
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(1), config)
    layer = params['layers'][1]

    B, T, C = 2, 128, config.hidden_channels
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([128, 77])
    mask = transformer.mask_from_lengths(lengths, T)

    want = transformer._encoder_layer(
        x, layer, mask, False, config.attention_heads,
        [None] * 4, 0.0, jnp.float32, jax.lax.Precision('highest'))
    got = elk.encoder_layer(
        x, mask, layer['attn'], layer['norm1'], layer['ffn'],
        layer['norm2'], config.attention_heads,
        compute_dtype=jnp.float32, interpret=True)

    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=2e-4, rtol=2e-4)


def test_stack_matches_sequential_xla_layers():
    """Multi-layer megakernel vs the XLA layers applied sequentially."""
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(2), config)

    B, T, C = 4, 256, config.hidden_channels
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([256, 250, 64, 8])
    mask = transformer.mask_from_lengths(lengths, T)

    want = x
    for layer in params['layers']:
        want = transformer._encoder_layer(
            want, layer, mask, False, config.attention_heads,
            [None] * 4, 0.0, jnp.bfloat16, None)
    got = elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads, interpret=True)

    assert got.shape == want.shape and got.dtype == want.dtype
    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=8e-2, rtol=8e-2)
