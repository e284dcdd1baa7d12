"""Multi-host bring-up: jax.distributed + DCN x ICI meshes + per-process data
feeding (SURVEY.md §5 "Distributed communication backend").

The reference is strictly single-process (its accelerate scaffolding is
commented out, ppgs/train/core.py:23-26,83-87). Here multi-host execution is
first-class and follows the standard JAX SPMD recipe:

- every process calls :func:`initialize` (jax.distributed) at startup;
- one GLOBAL mesh spans all processes — the leading axis crosses process
  boundaries over DCN, the remaining axes stay inside each host's ICI
  domain (``jax.experimental.mesh_utils.create_hybrid_device_mesh``);
- each process feeds only its LOCAL batch shard; global arrays are
  assembled zero-copy with ``jax.make_array_from_process_local_data``;
- XLA inserts the cross-host collectives (gradient psum over DCN+ICI) from
  the sharding annotations alone — the train step is unchanged;
- metric accumulators (pure sums, evaluate/metrics.py) aggregate across
  processes with one allgather at the end of an eval pass.

Every helper degrades to its single-process equivalent when
``jax.process_count() == 1``, so there is exactly one code path from 1 chip
to a multi-host slice.
"""

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import make_mesh, replicate, shard_batch


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
):
    """Idempotent jax.distributed bring-up.

    Arguments default from the environment (PPGS_COORDINATOR,
    PPGS_NUM_PROCESSES, PPGS_PROCESS_ID); with none set, defers entirely to
    JAX's own auto-detection (TPU pod metadata / cluster envs). Single
    process with no configuration is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        'PPGS_COORDINATOR')
    if num_processes is None and 'PPGS_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['PPGS_NUM_PROCESSES'])
    if process_id is None and 'PPGS_PROCESS_ID' in os.environ:
        process_id = int(os.environ['PPGS_PROCESS_ID'])

    if coordinator_address is None and num_processes is None:
        return  # single process, nothing to bring up

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids)
    except RuntimeError as error:
        # Idempotency across entry points (preprocess -> train -> evaluate
        # in one process): jax raises 'distributed.initialize should only
        # be called once.' on re-init
        message = str(error)
        if ('already initialized' not in message
                and 'only be called once' not in message):
            raise


def make_hybrid_mesh(
    ici_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ('data',),
    dcn_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Global mesh spanning all processes.

    ``ici_shape`` is the per-process device layout (one -1 fills the local
    device count); ``dcn_shape`` is the per-axis process split, defaulting to
    all processes on axis 0 — so axis 0 is (num_processes * ici_shape[0])
    wide with its process dimension outermost, i.e. collectives along the
    trailing axes ride ICI and only axis 0 crosses DCN.
    """
    n_proc = jax.process_count()
    ici = list(ici_shape)
    if -1 in ici:
        known = int(np.prod([s for s in ici if s != -1]))
        ici[ici.index(-1)] = jax.local_device_count() // max(known, 1)
    if n_proc == 1:
        return make_mesh(shape=ici, axis_names=axis_names)

    from jax.experimental import mesh_utils

    if dcn_shape is None:
        dcn_shape = (n_proc,) + (1,) * (len(ici) - 1)
    try:
        # TPU pods: DCN granules are pod slices (slice_index attribute)
        devices = mesh_utils.create_hybrid_device_mesh(
            tuple(ici), tuple(dcn_shape))
    except ValueError:
        # Single-slice multi-host and CPU fakes: granule = process
        devices = mesh_utils.create_hybrid_device_mesh(
            tuple(ici), tuple(dcn_shape), process_is_granule=True)
    return Mesh(devices, tuple(axis_names))


def shard_global_batch(mesh: Mesh, tree, axis: str = 'data'):
    """Assemble global batch arrays from this process's LOCAL batch.

    Each process passes only its own rows; the global array's leading dim is
    the concatenation over processes (in process order along the mesh's
    ``axis``). Single-process: a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, tree, axis)
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        tree)


def replicate_global(mesh: Mesh, tree):
    """Replicate identical host arrays onto every device of a global mesh.

    All processes must pass the same values (e.g. params from a shared seed
    or checkpoint) — standard SPMD contract.
    """
    if jax.process_count() == 1:
        return replicate(mesh, tree)
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        tree)


def aggregate_across_processes(tree):
    """Sum a pytree of metric accumulators over all processes.

    The Metrics state is pure sums (evaluate/metrics.py), so one allgather +
    host-side reduction makes per-dataset and aggregate metrics exact across
    any process split. No-op for a single process.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(jax.device_get(tree))
    return jax.tree.map(lambda x: np.asarray(x).sum(axis=0), stacked)


def local_slice(tree, axis: int = 0):
    """This process's contiguous block of a global batch.

    Every process runs the same epoch-seeded sampler and materializes the
    same (padded) global batch; only the local block is fed to
    :func:`shard_global_batch` — so multi-host training is step-for-step
    identical to the single-process run (loss/gradient sums are row-order
    invariant). The leading dim must already be padded to a multiple of the
    global mesh data-axis size.
    """
    n, i = jax.process_count(), jax.process_index()
    if n == 1:
        return tree

    def f(x):
        if x.shape[axis] % n:
            raise ValueError(
                f'global batch dim {x.shape[axis]} not divisible by '
                f'{n} processes (pad to the global mesh multiple first)')
        b = x.shape[axis] // n
        index = [slice(None)] * x.ndim
        index[axis] = slice(i * b, (i + 1) * b)
        return x[tuple(index)]

    return jax.tree.map(f, tree)


def shard_iterator(iterable):
    """Every process_count-th item starting at this process's index: the
    per-process slice of a deterministically-ordered stream. Used for
    embarrassingly-parallel per-utterance work (dataset evaluation,
    preprocessing) where items need no cross-process step alignment."""
    n, i = jax.process_count(), jax.process_index()
    if n == 1:
        yield from iterable
        return
    for j, item in enumerate(iterable):
        if j % n == i:
            yield item


def any_process(flag: bool) -> bool:
    """Logical OR of a host-side boolean across all processes (one tiny
    allgather; False-only fast path has the same cost — the collective
    must run on every process every time or they deadlock).

    Used to coordinate interrupt-driven stops: a SIGTERM lands on each
    host at a slightly different moment, but collective checkpointing
    (orbax multi-process save) requires every process to stop at the SAME
    step. Each process polls its local signal flag through this OR once
    per step and all break together at the next step boundary.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.asarray([bool(flag)]))
    return bool(np.any(gathered))


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, metric logs)."""
    return jax.process_index() == 0
