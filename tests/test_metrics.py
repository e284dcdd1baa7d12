"""Metrics parity vs reference formulas (torch oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu.evaluate.metrics import Metrics


def make_batch(B=3, T=50, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, 40, T)).astype(np.float32)
    targets = rng.integers(0, 40, size=(B, T)).astype(np.int64)
    targets[0, 40:] = -100
    targets[2, 10:] = -100
    return logits, targets


def test_accuracy_and_topk():
    logits, targets = make_batch()
    metrics = Metrics()
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    results = metrics()

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    pred = lt.argmax(dim=1)
    valid = tt != -100
    ref_acc = (((pred == tt) & valid).sum() / valid.sum()).item()
    assert results['Accuracy'] == pytest.approx(ref_acc, abs=1e-6)

    # top-3
    flat_logits = lt.transpose(1, 2).flatten(0, 1)[valid.flatten()]
    flat_targets = tt.flatten()[valid.flatten()]
    topk = torch.topk(flat_logits, 3, dim=-1).indices
    ref_top3 = ((topk == flat_targets[:, None]).sum() /
                len(flat_targets)).item()
    assert results['Top-3 Accuracy/'] == pytest.approx(ref_top3, abs=1e-6)


def test_loss_metric_matches_ce():
    logits, targets = make_batch(seed=1)
    metrics = Metrics()
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    results = metrics()
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction='mean').item()
    assert results['loss'] == pytest.approx(ref, rel=1e-4)


def test_jsd_matches_reference_distance():
    logits, targets = make_batch(seed=2)
    metrics = Metrics()
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    results = metrics()

    # Reference: softmax probs vs one-hot targets through ppgs.distance
    from ppgs_tpu.ops import algebra

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    flat_logits = lt.transpose(1, 2).flatten(0, 1)
    flat_targets = tt.flatten()
    keep = flat_targets != -100
    probs = torch.nn.functional.softmax(flat_logits[keep], dim=-1)
    onehot = torch.nn.functional.one_hot(flat_targets[keep], 40).float()
    jsd = float(algebra.distance(
        jnp.asarray(probs.numpy().T), jnp.asarray(onehot.numpy().T),
        reduction='sum'))
    ref = jsd / keep.sum().item()
    assert results['JSD'] == pytest.approx(ref, rel=1e-3)


def test_categorical_accuracy_counts():
    logits, targets = make_batch(seed=3)
    metrics = Metrics()
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    results = metrics()

    valid = targets != -100
    total_count = sum(
        results[f'Count/{p}'] for p in ppgs_tpu.PHONEMES)
    assert total_count == valid.sum()

    pred = logits.argmax(axis=1)
    for i, phoneme in enumerate(ppgs_tpu.PHONEMES[:5]):
        mask = (targets == i) & valid
        if mask.sum():
            ref = ((pred == i) & mask).sum() / mask.sum()
            assert results[f'Accuracy/{phoneme}'] == pytest.approx(
                ref, abs=1e-6)


def test_metrics_accumulate_over_batches():
    """Two updates must equal one update on the concatenated batch."""
    logits1, targets1 = make_batch(seed=4)
    logits2, targets2 = make_batch(seed=5)

    m_split = Metrics()
    m_split.update(jnp.asarray(logits1), jnp.asarray(targets1))
    m_split.update(jnp.asarray(logits2), jnp.asarray(targets2))

    m_joint = Metrics()
    m_joint.update(jnp.asarray(np.concatenate([logits1, logits2])),
                   jnp.asarray(np.concatenate([targets1, targets2])))

    a, b = m_split(), m_joint()
    for key in ['Accuracy', 'JSD', 'loss', 'Top-3 Accuracy/']:
        assert a[key] == pytest.approx(b[key], rel=1e-5)


def test_figures():
    logits, targets = make_batch(seed=6)
    metrics = Metrics(include_figures=True)
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    results = metrics()
    assert 'ConfusionMatrix' in results
    assert 'DistanceMatrix' in results


def test_prob_confusion_rows_sum_to_counts():
    """Each target row of the probability confusion sums to its count."""
    import jax

    logits, targets = make_batch(seed=7)
    metrics = Metrics()
    metrics.update(jnp.asarray(logits), jnp.asarray(targets))
    s = jax.device_get(metrics.state)
    np.testing.assert_allclose(
        s['prob_confusion'].sum(axis=1), s['class_counts'], rtol=1e-4)


def test_evaluate_partition_logs_figures(tmp_path):
    """Eval passes confusion/distance figures to the writer (reference logs
    matplotlib figures to tensorboard, ppgs/train/core.py:354-365)."""
    import jax
    from ppgs_tpu import parallel
    from ppgs_tpu.train import core as train_core

    config = ppgs_tpu.Config(
        num_hidden_layers=1, hidden_channels=64, ffn_channels=128,
        max_len=64, chunk_length=64, chunk_overlap=8,
        compute_dtype='float32')
    params = ppgs_tpu.models.init(jax.random.PRNGKey(0), config)
    mesh = parallel.make_mesh(shape=(1,), axis_names=('data',))

    rng = np.random.default_rng(0)

    def loader_fn(partition):
        yield (rng.standard_normal((2, 80, 64)).astype('f4'),
               rng.integers(0, 40, size=(2, 64)),
               np.array([64, 48]))

    class Capture:
        def update(self, step, scalars, figures=None):
            self.scalars, self.figures = scalars, figures or {}

    writer = Capture()
    train_core.evaluate_partition(
        writer, 0, params, config, loader_fn, 'valid', mesh, 1)
    assert 'valid/Accuracy' in writer.scalars
    assert set(writer.figures) == {
        'valid/ConfusionMatrix', 'valid/DistanceMatrix'}
