"""Parity tests for PPG algebra ops vs reference torch formulas."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu.ops import algebra


def random_ppg(rng, frames=30, batch=None):
    shape = (40, frames) if batch is None else (batch, 40, frames)
    logits = rng.standard_normal(shape).astype(np.float32)
    exp = np.exp(logits - logits.max(axis=-2, keepdims=True))
    return exp / exp.sum(axis=-2, keepdims=True)


def torch_distance(x, y, reduction='mean', normalize=True, exponent=1.2):
    """Reference distance (ppgs/core.py:399-469) in torch."""
    x = torch.clamp(torch.from_numpy(x), 1e-8, 1 - 1e-8)
    y = torch.clamp(torch.from_numpy(y), 1e-8, 1 - 1e-8)
    if normalize:
        sim = torch.from_numpy(
            np.load(ppgs_tpu.config.SIMILARITY_MATRIX_PATH)['similarity'])
        x = torch.mm(sim.T ** exponent, x).T
        y = torch.mm(sim.T ** exponent, y).T
    else:
        x, y = x.T, y.T
    log_average = torch.log((x + y) / 2)
    kl_x = torch.nn.functional.kl_div(log_average, x, reduction='none')
    kl_y = torch.nn.functional.kl_div(log_average, y, reduction='none')
    average_kl = (kl_x + kl_y) / 2
    average_kl[average_kl < 0] = 0
    jsd = torch.sqrt(average_kl).sum(dim=1)
    if reduction == 'mean':
        return jsd.mean(dim=0).numpy()
    if reduction == 'sum':
        return jsd.sum(dim=0).numpy()
    return jsd.numpy()


@pytest.mark.parametrize('normalize', [True, False])
@pytest.mark.parametrize('reduction', ['mean', 'sum', 'none'])
def test_distance_matches_reference(normalize, reduction):
    rng = np.random.default_rng(0)
    x, y = random_ppg(rng), random_ppg(rng)
    ours = np.asarray(algebra.distance(
        jnp.asarray(x), jnp.asarray(y), reduction=reduction,
        normalize=normalize))
    ref = torch_distance(x, y, reduction=reduction, normalize=normalize)
    # sqrt near zero amplifies fp32 matmul-order differences
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_distance_identical_is_zero():
    rng = np.random.default_rng(1)
    x = random_ppg(rng)
    d = float(algebra.distance(jnp.asarray(x), jnp.asarray(x)))
    assert d < 1e-3


def test_interpolate():
    rng = np.random.default_rng(2)
    x, y = random_ppg(rng), random_ppg(rng)
    mid = np.asarray(algebra.interpolate(x, y, 0.25))
    np.testing.assert_allclose(mid, 0.75 * x + 0.25 * y, rtol=1e-6)
    # per-frame interpolation weights
    t = rng.uniform(size=(x.shape[-1],)).astype(np.float32)
    per = np.asarray(algebra.interpolate(x, y, t))
    np.testing.assert_allclose(per, (1 - t) * x + t * y, rtol=1e-5)


def torch_sparsify(ppg, method='percentile', threshold=0.85):
    ppg = torch.from_numpy(ppg.copy())
    if method in ['constant', 'percentile']:
        th = torch.tensor([threshold]) if method == 'percentile' \
            else torch.tensor(threshold)
        if method == 'percentile':
            th = torch.quantile(ppg, th, dim=-2, keepdim=True)
        ppg = torch.where(ppg > th, ppg, torch.tensor(0.))
    return torch.softmax(torch.log(ppg + 1e-8), -2).numpy()


@pytest.mark.parametrize('method,threshold', [
    ('constant', 0.02), ('percentile', 0.85)])
def test_sparsify_matches_reference(method, threshold):
    rng = np.random.default_rng(3)
    ppg = random_ppg(rng, batch=2)
    ours = np.asarray(algebra.sparsify(jnp.asarray(ppg), method, threshold))
    ref = torch_sparsify(ppg, method, threshold)
    if method == 'percentile':
        ref = ref[0]  # torch quantile adds a leading dim
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sparsify_topk():
    rng = np.random.default_rng(4)
    ppg = random_ppg(rng, batch=2)
    out = np.asarray(algebra.sparsify(jnp.asarray(ppg), 'topk', 3))
    # Renormalized: sums to one; at most 3 classes carry real mass
    np.testing.assert_allclose(out.sum(axis=-2), 1.0, rtol=1e-4)
    heavy = (out > 1e-4).sum(axis=-2)
    assert (heavy <= 3).all()


def test_sparsify_output_is_distribution():
    rng = np.random.default_rng(5)
    ppg = random_ppg(rng, batch=1)
    out = np.asarray(algebra.sparsify(jnp.asarray(ppg)))
    np.testing.assert_allclose(out.sum(axis=-2), 1.0, rtol=1e-4)
