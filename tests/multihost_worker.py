"""Worker logic for multi-host tests.

Run as a subprocess under jax.distributed (PPGS_COORDINATOR /
PPGS_NUM_PROCESSES / PPGS_PROCESS_ID set by the parent test), or imported by
the parent and called in-process for the single-process reference run. The
training/eval workload is identical either way — multi-host execution must be
step-for-step equivalent.
"""

import json
import os
import sys
from pathlib import Path

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402


def make_config():
    import ppgs_tpu

    return ppgs_tpu.Config(
        num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
        max_len=64, chunk_length=64, chunk_overlap=8,
        compute_dtype='float32', dropout=0.0,
        evaluation_interval=10 ** 9, checkpoint_interval=10 ** 9)


def loader_fn(partition):
    """Deterministic global batch stream, identical on every process.

    B=5 deliberately not a multiple of any mesh size: exercises -100
    padding under multi-host slicing.
    """
    rng = np.random.default_rng(42 if partition == 'train' else 43)
    for _ in range(3):
        B, T = 5, 64
        feats = rng.standard_normal((B, 80, T)).astype('f4')
        targets = rng.integers(0, 40, size=(B, T)).astype(np.int64)
        lengths = np.array([64, 50, 33, 8, 64], dtype=np.int64)
        for i, length in enumerate(lengths):
            feats[i, :, length:] = 0
            targets[i, length:] = -100
        yield feats, targets, lengths


def run(directory, mesh=None):
    """Train 3 steps + eval; returns (flat params, eval scalars)."""
    from ppgs_tpu import load as load_mod
    from ppgs_tpu.train import core as train_core

    config = make_config()
    params = train_core.train(
        'synthetic', directory=directory, config=config, mesh=mesh,
        max_steps=3, loader_fn=loader_fn)
    flat = load_mod.flatten_params(jax.device_get(params))

    from ppgs_tpu.parallel import multihost

    if mesh is None:
        mesh = multihost.make_hybrid_mesh(
            config.mesh_shape, config.mesh_axis_names)
    scalars = train_core.evaluate_partition(
        None, 0, multihost.replicate_global(mesh, jax.device_get(params)),
        config, loader_fn, 'valid', mesh, mesh.shape.get('data', 1))
    return flat, scalars


def metrics_aggregation_check():
    """Each process accumulates Metrics over a DISJOINT half of a batch;
    aggregate_across_processes must reproduce the full-batch metrics."""
    from ppgs_tpu.evaluate.metrics import Metrics
    from ppgs_tpu.parallel import multihost

    config = make_config()
    rng = np.random.default_rng(7)
    logits = rng.standard_normal((4, 40, 64)).astype('f4')
    targets = rng.integers(0, 40, size=(4, 64)).astype(np.int64)
    targets[:, 50:] = -100

    i = jax.process_index()
    metrics = Metrics(config=config)
    metrics.update(logits[i * 2:(i + 1) * 2], targets[i * 2:(i + 1) * 2])
    metrics.state = multihost.aggregate_across_processes(metrics.state)
    return {k: v for k, v in metrics().items()
            if isinstance(v, (int, float))}


def main():
    out = Path(os.environ['PPGS_MH_OUT'])
    directory = os.environ['PPGS_MH_DIR']

    flat, scalars = run(directory)
    agg = metrics_aggregation_check()

    np.savez(out.with_suffix('.npz'), **flat)
    with open(out, 'w') as file:
        json.dump({'scalars': scalars, 'aggregated_metrics': agg,
                   'process_count': jax.process_count()}, file)


if __name__ == '__main__':
    sys.exit(main())
