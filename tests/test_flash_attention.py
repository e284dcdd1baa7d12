"""Flash-attention kernel correctness (Pallas interpret mode on CPU)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from ppgs_tpu.ops.flash_attention import flash_attention


def reference_attention(q, k, v, mask):
    D = q.shape[-1]
    logits = np.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(D)
    logits = np.where(mask[:, None, None, :], logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = np.where(mask[:, None, None, :], p, 0)
    attn = p / np.maximum(p.sum(-1, keepdims=True), 1e-30)
    return np.einsum('bhqk,bhkd->bhqd', attn, v)


@pytest.mark.parametrize('T', [256, 2048])
def test_flash_matches_reference(T):
    rng = np.random.default_rng(0)
    B, H, D = 2, 2, 128
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), bool)
    mask[1, T - 50:] = False

    def pack(a):  # (B, H, T, D) -> (B, T, H*D)
        return jnp.asarray(a.transpose(0, 2, 1, 3).reshape(B, T, H * D))

    out = np.asarray(flash_attention(
        pack(q), pack(k), pack(v), jnp.asarray(mask), num_heads=H,
        interpret=True))
    out = out.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fully_masked_rows_are_zero():
    rng = np.random.default_rng(1)
    B, H, T, D = 2, 2, 256, 128
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), bool)
    mask[0] = False            # element 0 fully masked

    def pack(a):
        return jnp.asarray(a.transpose(0, 2, 1, 3).reshape(B, T, H * D))

    out = np.asarray(flash_attention(
        pack(q), pack(k), pack(v), jnp.asarray(mask), num_heads=H,
        interpret=True))
    out = out.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    assert np.abs(out[0]).max() == 0.0
    ref = reference_attention(q[1:], k[1:], v[1:], mask[1:])
    np.testing.assert_allclose(out[1:], ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('D,H', [(64, 4), (64, 2), (32, 4)])
def test_flash_packed_small_heads_matches_reference(D, H):
    """d_head < 128 packs 128/D heads per block (wav2vec2's 12 x 64)."""
    rng = np.random.default_rng(2)
    B, T = 2, 200                      # T % 8 == 0, not a block multiple
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    mask = np.ones((B, T), bool)
    mask[1, T - 30:] = False

    def pack(a):
        return jnp.asarray(a.transpose(0, 2, 1, 3).reshape(B, T, H * D))

    out = np.asarray(flash_attention(
        pack(q), pack(k), pack(v), jnp.asarray(mask), num_heads=H,
        interpret=True))
    out = out.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    ref = reference_attention(q, k, v, mask)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
