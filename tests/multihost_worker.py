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


def run_orbax(directory, max_steps, loader=None):
    """Train with the orbax backend (collective multi-process saves);
    returns flattened final params."""
    from ppgs_tpu import load as load_mod
    from ppgs_tpu.train import core as train_core

    config = make_config().replace(
        checkpoint_backend='orbax', checkpoint_interval=2)
    params = train_core.train(
        'synthetic', directory=directory, config=config,
        max_steps=max_steps, loader_fn=loader or loader_fn)
    return load_mod.flatten_params(jax.device_get(params))


def endless_loader(partition):
    """Deterministic infinite batch stream; drops a readiness marker once
    the second batch is requested (first train step completed — signal
    handlers installed, safe to SIGTERM)."""
    import time

    rng = np.random.default_rng(11)
    marker = os.environ.get('PPGS_MH_READY')
    i = 0
    while True:
        if i == 1 and marker:
            Path(marker).touch()
        B, T = 4, 64
        feats = rng.standard_normal((B, 80, T)).astype('f4')
        targets = rng.integers(0, 40, size=(B, T)).astype(np.int64)
        lengths = np.full((B,), T, dtype=np.int64)
        time.sleep(0.05)
        i += 1
        yield feats, targets, lengths


def main():
    out = Path(os.environ['PPGS_MH_OUT'])
    directory = os.environ['PPGS_MH_DIR']
    mode = os.environ.get('PPGS_MH_MODE', 'default')

    if mode == 'orbax_phase_a':
        # Train 3 steps, periodic orbax save at step 2, collective final
        # save at step 3, then DIE (the parent relaunches a fresh pair
        # for phase B — a true kill/resume across process generations)
        run_orbax(directory, 3)
        with open(out, 'w') as file:
            json.dump({'process_count': jax.process_count()}, file)
        return
    if mode == 'orbax_phase_b':
        # Fresh processes resume from phase A's checkpoint -> 6 steps
        flat = run_orbax(directory, 6)
        np.savez(out.with_suffix('.npz'), **flat)
        with open(out, 'w') as file:
            json.dump({'process_count': jax.process_count()}, file)
        return
    if mode == 'orbax_interrupt':
        # Endless run; the parent SIGTERMs both processes mid-training.
        # The coordinated stop (multihost.any_process) must bring both to
        # the same step and the collective orbax save must land.
        from ppgs_tpu.train import core as train_core

        run_orbax(directory, 10 ** 9, loader=endless_loader)
        latest = train_core.latest_checkpoint(directory, 'orbax')
        with open(out, 'w') as file:
            json.dump({'process_count': jax.process_count(),
                       'latest_step': None if latest is None
                       else int(Path(latest).name)}, file)
        return

    flat, scalars = run(directory)
    agg = metrics_aggregation_check()

    np.savez(out.with_suffix('.npz'), **flat)
    with open(out, 'w') as file:
        json.dump({'scalars': scalars, 'aggregated_metrics': agg,
                   'process_count': jax.process_count()}, file)


if __name__ == '__main__':
    sys.exit(main())
