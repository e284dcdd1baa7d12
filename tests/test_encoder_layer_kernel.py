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


def test_causal_stack_matches_xla(monkeypatch):
    """Causal whole-stack kernel vs the XLA causal path (the
    causal_transformer config's streaming-style masked attention)."""
    config = ppgs_tpu.config.REGISTRY['causal_transformer']
    params = transformer.init(jax.random.PRNGKey(3), config)

    B, T, C = 4, 256, config.hidden_channels
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([256, 250, 64, 8])
    mask = transformer.mask_from_lengths(lengths, T)

    monkeypatch.setenv('PPGS_TPU_DISABLE_FLASH', '1')  # pure XLA reference
    want = x
    for layer in params['layers']:
        want = transformer._encoder_layer(
            want, layer, mask, True, config.attention_heads,
            [None] * 4, 0.0, jnp.bfloat16, None)
    monkeypatch.delenv('PPGS_TPU_DISABLE_FLASH')
    got = elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads, causal=True,
        interpret=True)

    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=8e-2, rtol=8e-2)
    # And the causal result genuinely differs from the non-causal one
    non_causal = elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads, interpret=True)
    assert np.abs(np.asarray(got)[valid]
                  - np.asarray(non_causal)[valid]).max() > 1e-2


def test_causal_stack_fp32_tight():
    """fp32 causal kernel tracks the strict XLA causal path closely (the
    fp32 kernel branch uses the NEG_INF select, not the multiplicative
    mask)."""
    config = ppgs_tpu.config.REGISTRY['causal_transformer']
    params = transformer.init(jax.random.PRNGKey(4), config)
    layer = params['layers'][0]

    B, T, C = 2, 128, config.hidden_channels
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([128, 77])
    mask = transformer.mask_from_lengths(lengths, T)

    want = transformer._encoder_layer(
        x, layer, mask, True, config.attention_heads,
        [None] * 4, 0.0, jnp.float32, jax.lax.Precision('highest'))
    got = elk.encoder_stack(
        x, mask, [layer], config.attention_heads,
        compute_dtype=jnp.float32, causal=True, interpret=True)

    valid = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid],
        atol=2e-4, rtol=2e-4)


def test_streamed_stack_matches_resident_stack():
    """Weight-streaming (batch, layer)-grid schedule == the all-resident
    whole-stack kernel, bit-for-bit math (same _layer_body)."""
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(5), config)

    B, T, C = 4, 256, config.hidden_channels
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray([256, 250, 64, 8])
    mask = transformer.mask_from_lengths(lengths, T)

    want = elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads, interpret=True)
    got = elk.encoder_stack_streamed(
        x, mask, params['layers'], config.attention_heads,
        activation='relu', block_b=2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-5, rtol=1e-5)

    # Causal + gelu variant too
    want_c = elk.encoder_stack(
        x, mask, params['layers'], config.attention_heads,
        activation='gelu', causal=True, interpret=True)
    got_c = elk.encoder_stack_streamed(
        x, mask, params['layers'], config.attention_heads,
        activation='gelu', causal=True, block_b=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_c, np.float32), np.asarray(want_c, np.float32),
        atol=1e-5, rtol=1e-5)


def test_pick_block_b_device_aware_budgets(monkeypatch):
    """Block picking fits the working-set estimate at any simulated VMEM
    budget — no env var needed on small-VMEM parts (round-3 verdict #7)."""
    monkeypatch.delenv('PPGS_TPU_BLOCK_B', raising=False)
    monkeypatch.delenv('PPGS_TPU_VMEM_BUDGET_MB', raising=False)
    B, T, C, F, L = 128, 512, 256, 2048, 5

    def estimate(bb):
        weights = L * (4 * C * C + 2 * C * F) * 2
        hidden = min(elk.FFN_ROW_TILE, bb * T) * F * 6
        acts = bb * T * C * 30 + bb * T * T * 6 + hidden
        io = 2 * 2 * bb * T * C * 2
        return weights + acts + io

    picks = []
    for budget_mb in (16, 32, 64, 128):
        bb = elk._pick_block_b(B, T, C, F, L, budget=budget_mb << 20)
        assert 1 <= bb <= elk.DEFAULT_BLOCK_B and B % bb == 0
        # Either the estimate fits, or bb=1 is the irreducible floor
        assert bb == 1 or estimate(bb) <= budget_mb << 20
        picks.append(bb)
    # Monotonic in budget; the 5-layer resident weights alone (~13 MB)
    # exceed a 16 MB budget, so its floor pick is 1
    assert picks == sorted(picks)
    assert picks[0] == 1 and picks[-1] >= 4

    # Device table: unknown device kinds (e.g. CPU here) fall back
    assert elk._device_vmem_bytes() in {
        mb * 1024 * 1024 for _, mb in elk._VMEM_MB} | {
        elk._FALLBACK_VMEM_MB * 1024 * 1024}
    # Budget = 5/8 physical; env var still overrides
    assert elk._vmem_budget_bytes() == elk._device_vmem_bytes() * 5 // 8
    monkeypatch.setenv('PPGS_TPU_VMEM_BUDGET_MB', '12')
    assert elk._vmem_budget_bytes() == 12 << 20
    assert elk._vmem_limit_bytes() == int(elk._device_vmem_bytes() * 0.8)
