"""Objective evaluation over test partitions
(reference: ppgs/evaluate/core.py:16-107).

Runs test loaders through the inference stack (softmax=False) and
accumulates per-dataset + aggregate metrics; saves JSON results and figures
under EVAL_DIR/<config>/.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod
from .metrics import Metrics
from ..utils import notify as _notify_mod


@_notify_mod.notify("evaluate")
def datasets(names=None, checkpoint=None, config=None, max_batches=None):
    """Evaluate on datasets' test partitions; returns the results dict.

    Multi-host: each process evaluates every process_count-th batch of the
    stream (per-utterance inference needs no step alignment) and the pure
    sum accumulators are merged with one allgather per dataset, so metrics
    are exact for any process split.
    """
    from .. import from_features
    from ..data import loader as data_loader
    from ..parallel import multihost

    multihost.initialize()
    config = config_mod.get(config)
    names = names or list(config.datasets)

    # Figures render only where they're saved (primary process)
    figures = multihost.is_primary()
    aggregate = Metrics(include_figures=figures, config=config)
    results = {}
    eval_dir = config_mod.EVAL_DIR / config.config
    eval_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        metrics = Metrics(include_figures=figures, config=config)
        ldr = data_loader(
            name, 'test',
            features=[config.representation, 'phonemes', 'length'],
            config=config)
        for i, batch in enumerate(multihost.shard_iterator(ldr)):
            features, indices, lengths = batch[:3]
            logits = from_features(
                features, lengths, checkpoint=checkpoint, softmax=False,
                config=config)
            metrics.update(logits, indices)
            if max_batches is not None and i + 1 >= max_batches:
                break
        metrics.state = multihost.aggregate_across_processes(metrics.state)
        aggregate.state = jax.tree.map(
            lambda a, d: a + d, aggregate.state,
            jax.tree.map(jnp.asarray, metrics.state))
        full = metrics()
        results[name] = {
            k: v for k, v in full.items() if isinstance(v, (int, float))}
        if multihost.is_primary():
            save(results[name], eval_dir / f'{name}.json')
            save_artifacts(full, metrics.state, name, eval_dir)

    full = aggregate()
    results['aggregate'] = {
        k: v for k, v in full.items() if isinstance(v, (int, float))}
    if multihost.is_primary():
        save(results['aggregate'], eval_dir / 'overall.json')
        save_artifacts(full, aggregate.state, 'overall', eval_dir)
    return results


def save(scalars, path):
    with open(path, 'w') as file:
        json.dump(scalars, file, indent=2, sort_keys=True)


def save_artifacts(results, state, name, directory):
    """Save confusion/distance figures (jpg + pdf) and the raw accumulated
    tensors under {directory}/{name}/, like the reference's per-dataset
    artifact dump (ppgs/evaluate/core.py:77-107: figures -> .jpg/.pdf,
    tensors -> .pt; here tensors are one npz of the metric accumulators)."""
    fig_dir = Path(directory) / name
    fig_dir.mkdir(parents=True, exist_ok=True)

    for metric, value in results.items():
        if isinstance(value, (int, float)):
            continue
        stem = metric.replace('/', '-')
        value.savefig(fig_dir / f'{stem}.jpg',
                      bbox_inches='tight', pad_inches=0)
        value.savefig(fig_dir / f'{stem}.pdf',
                      bbox_inches='tight', pad_inches=0)
        import matplotlib.pyplot as plt

        plt.close(value)

    tensors = {k: np.asarray(v) for k, v in state.items()
               if np.ndim(v) >= 1}
    if tensors:
        np.savez(fig_dir / 'tensors.npz', **tensors)
