"""Fused FFN+residual+LayerNorm kernel correctness (Pallas interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from ppgs_tpu.ops import fused_ffn


def _reference(x, w1, b1, w2, b2, g, beta, compute_dtype=jnp.bfloat16):
    """The XLA formulation from models.transformer._encoder_layer."""
    xc = x.astype(compute_dtype)
    h = jax.nn.relu(xc @ w1.astype(compute_dtype) + b1.astype(compute_dtype))
    y = (h @ w2.astype(compute_dtype) + b2.astype(compute_dtype)).astype(
        x.dtype)
    r = (x + y).astype(jnp.float32)
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    n = (r - mean) * jax.lax.rsqrt(var + fused_ffn.LN_EPS)
    return (n * g + beta).astype(x.dtype)


def test_matches_xla_formulation():
    rng = np.random.default_rng(0)
    B, T, C, F = 2, 512, 256, 1024
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((C,)) * 0.2 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)

    got = fused_ffn.ffn_residual_layernorm(
        x, w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2,
        g, beta, interpret=True)
    want = _reference(x, w1, b1, w2, b2, g, beta)

    assert got.shape == want.shape and got.dtype == want.dtype
    # Kernel accumulates the hidden in fp32 (vs bf16 intermediate in the XLA
    # path): agreement is bounded by the bf16 rounding of the XLA reference.
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=5e-2, rtol=5e-2)

    # And against a pure-fp32 reference it should be tighter than the
    # bf16 XLA path is (fp32 hidden accumulation)
    want32 = _reference(x, w1, b1, w2, b2, g, beta,
                        compute_dtype=jnp.float32)
    err_kernel = np.abs(np.asarray(got) - np.asarray(want32)).mean()
    err_xla = np.abs(np.asarray(want) - np.asarray(want32)).mean()
    assert err_kernel <= err_xla * 1.5


def test_rejects_misaligned_m():
    x = jnp.zeros((3, 100, 256))
    w1 = jnp.zeros((256, 1024), jnp.bfloat16)
    w2 = jnp.zeros((1024, 256), jnp.bfloat16)
    z = jnp.zeros((1024,))
    c = jnp.zeros((256,))
    try:
        fused_ffn.ffn_residual_layernorm(
            x, w1, z, w2, c, c, c, interpret=True)
    except ValueError as e:
        assert 'block_m' in str(e)
    else:
        raise AssertionError('expected ValueError for misaligned M')
