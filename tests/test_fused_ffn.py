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


def test_ffn_train_rate0_matches_xla_and_gradients():
    """ffn_train at rate 0: forward and gradients match the plain XLA
    formulation (fp32 here; the kernel is dtype-generic)."""
    import jax

    from ppgs_tpu.ops import fused_ffn

    rng = np.random.default_rng(9)
    M, C, F = 1024, 256, 512
    x = rng.standard_normal((M, C)).astype(np.float32) * 0.1
    w1 = rng.standard_normal((C, F)).astype(np.float32) * 0.05
    b1 = rng.standard_normal((F,)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((F, C)).astype(np.float32) * 0.05
    b2 = rng.standard_normal((C,)).astype(np.float32) * 0.05
    cot = rng.standard_normal((M, C)).astype(np.float32)

    def xla(x, w1, b1, w2, b2):
        return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2

    def kern(x, w1, b1, w2, b2):
        return fused_ffn.ffn_train(x, w1, b1, w2, b2, block_m=512,
                                   interpret=True)

    args = tuple(map(jnp.asarray, (x, w1, b1, w2, b2)))
    np.testing.assert_allclose(
        np.asarray(kern(*args)), np.asarray(xla(*args)),
        rtol=1e-5, atol=1e-5)

    g_k = jax.grad(lambda *a: (kern(*a) * cot).sum(), argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(lambda *a: (xla(*a) * cot).sum(), argnums=(0, 1, 2, 3, 4))(*args)
    for got, want, name in zip(g_k, g_x, 'x w1 b1 w2 b2'.split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=name)


def test_ffn_train_dropout_structure():
    """In-kernel dropout: deterministic per seed, seed-sensitive, and the
    backward replays the forward's masks (finite differences)."""
    import jax

    from ppgs_tpu.ops import fused_ffn

    rng = np.random.default_rng(10)
    M, C, F = 512, 256, 512
    x = jnp.asarray(rng.standard_normal((M, C)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((C, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(np.zeros(F, np.float32))
    w2 = jnp.asarray(rng.standard_normal((F, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(np.zeros(C, np.float32))
    seed = jnp.asarray([23], jnp.int32)

    def run(s):
        return np.asarray(fused_ffn.ffn_train(
            x, w1, b1, w2, b2, dropout_rate=0.3, seed=s, block_m=512,
            interpret=True))

    out1, out2 = run(seed), run(seed)
    np.testing.assert_array_equal(out1, out2)
    other = run(jnp.asarray([24], jnp.int32))
    assert np.abs(other - out1).max() > 1e-4
    # Output dropout zeroes ~rate of entries outright
    assert 0.2 < np.mean(out1 == 0.0) < 0.45

    # Gradient parity vs an XLA twin using the IDENTICAL interpret-mode
    # threefry masks (single row block here, program id 0)
    base = jax.random.fold_in(jax.random.PRNGKey(23), 0)
    k1, k2 = jax.random.split(base)
    keep1 = jax.random.uniform(k1, (M, 512)) < 0.7
    keep2 = jax.random.uniform(k2, (M, C)) < 0.7
    inv = 1.0 / 0.7

    def xla_twin(xx, w1, b1, w2, b2):
        h = jnp.maximum(xx @ w1 + b1, 0.0)
        h = jnp.where(keep1, h * inv, 0.0)
        y = h @ w2 + b2
        return jnp.where(keep2, y * inv, 0.0)

    np.testing.assert_allclose(
        out1, np.asarray(xla_twin(x, w1, b1, w2, b2)),
        rtol=1e-5, atol=1e-5)

    cot = rng.standard_normal((M, C)).astype(np.float32)

    def kern_loss(*a):
        return (fused_ffn.ffn_train(
            *a, dropout_rate=0.3, seed=seed, block_m=512,
            interpret=True) * cot).sum()

    def twin_loss(*a):
        return (xla_twin(*a) * cot).sum()

    g_k = jax.grad(kern_loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_x = jax.grad(twin_loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for got, want, name in zip(g_k, g_x, 'x w1 b1 w2 b2'.split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
            err_msg=name)
