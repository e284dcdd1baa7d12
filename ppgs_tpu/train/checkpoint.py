"""Checkpoint backends: flat npz and orbax (async, TPU-native).

The reference checkpoints model + optimizer + {step, epoch} via
torchutil.checkpoint as {step:08d}.pt files (ppgs/train/core.py:54-69,
237-244). Here two backends share that contract:

- 'npz': single-file flat arrays, dependency-free, good for small models
  and for shipping converted reference checkpoints.
- 'orbax': ocp.CheckpointManager with async saves — the device-to-host copy
  happens synchronously but serialization/IO overlaps the next training
  steps, which is the standard TPU checkpointing story for large state.

Both store {step:08d} directories/files under the run directory and
auto-resume from the numerically largest step.
"""

import json
from pathlib import Path

import jax
import numpy as np


###############################################################################
# npz backend (flat single-file)
###############################################################################


def _flatten(tree):
    from .. import load as load_mod

    return load_mod.flatten_params(tree)


def _unflatten(flat):
    from .. import load as load_mod

    return load_mod.unflatten_params(flat)


def npz_save(directory, step, epoch, state):
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    flat = _flatten(jax.device_get(state))
    path = directory / f'{step:08d}.npz'
    np.savez(path, **flat)
    with open(directory / f'{step:08d}.json', 'w') as file:
        json.dump({'step': step, 'epoch': epoch}, file)
    return path


def npz_latest(directory):
    paths = sorted(Path(directory).glob('[0-9]*.npz'))
    return paths[-1] if paths else None


def npz_restore(path):
    flat = np.load(path)
    state = _unflatten({k: flat[k] for k in flat.files})
    with open(Path(path).with_suffix('.json')) as file:
        meta = json.load(file)
    return state, meta['step'], meta['epoch']


###############################################################################
# orbax backend (async directory checkpoints)
###############################################################################


_MANAGERS = {}


def _manager(directory):
    """One CheckpointManager per run directory (orbax requires exclusive
    ownership of the directory)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    key = str(directory)
    if key not in _MANAGERS:
        _MANAGERS[key] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None,
                enable_async_checkpointing=True))
    return _MANAGERS[key]


def orbax_save(directory, step, epoch, state):
    import orbax.checkpoint as ocp

    manager = _manager(directory)
    if step in (manager.all_steps() or ()):
        # Already saved (e.g. an interrupt landing right after a periodic
        # save); saving a duplicate step would raise. Collective callers
        # all skip together — all_steps() reads the shared directory.
        return Path(directory) / str(step)
    manager.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave({'step': step, 'epoch': epoch})))
    return Path(directory) / str(step)


def orbax_latest(directory):
    if not Path(directory).exists():
        return None
    step = _manager(directory).latest_step()
    return None if step is None else Path(directory) / str(step)


def orbax_restore(directory, step, template):
    """Restore (state, step, epoch); template supplies pytree structure,
    dtypes, and shardings (restored arrays land on the template's devices)."""
    import orbax.checkpoint as ocp

    manager = _manager(directory)
    restored = manager.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template),
            meta=ocp.args.JsonRestore()))
    return restored['state'], restored['meta']['step'], \
        restored['meta']['epoch']


def wait_until_finished(directory):
    """Block until pending async orbax saves for this run directory land."""
    key = str(Path(directory).resolve())
    if key in _MANAGERS:
        _MANAGERS[key].wait_until_finished()


def close(directory):
    key = str(Path(directory).resolve())
    manager = _MANAGERS.pop(key, None)
    if manager is not None:
        manager.wait_until_finished()
        manager.close()
