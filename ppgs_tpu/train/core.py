"""Training loop (reference: ppgs/train/core.py:17-386).

TPU-first: one jit-compiled train step (forward, masked CE loss, backward,
Adam update, gradient statistics) with donated state; data-parallel by
sharding the batch over the mesh 'data' axis — XLA inserts the gradient psum
from the sharding annotations. bf16 matmuls replace the reference's fp16
GradScaler (bf16 needs no loss scaling). Checkpoints are flat npz pytrees
with step/epoch; auto-resume picks the latest.
"""

import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as config_mod
from .. import load as load_mod
from .. import models
from .. import parallel
from ..evaluate.metrics import Metrics
from ..utils import notify as _notify_mod


###############################################################################
# Loss
###############################################################################


def loss(logits, targets, config=None, class_weights=None, reduction='mean'):
    """Masked cross-entropy (reference ppgs/train/core.py:373-386).

    logits: (B, C, T); targets: (B, T) int with -100 = ignore.
    """
    config = config_mod.get(config)
    num_classes = logits.shape[1]
    flat_logits = logits.transpose(0, 2, 1).reshape(-1, num_classes)
    flat_logits = flat_logits.astype(jnp.float32)
    flat_targets = targets.reshape(-1)
    valid = flat_targets != -100
    safe_targets = jnp.where(valid, flat_targets, 0)

    log_probs = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(
        log_probs, safe_targets[:, None], axis=-1)[:, 0]

    if class_weights is not None:
        weights = class_weights[safe_targets] * valid
    else:
        weights = valid.astype(nll.dtype)
    total = (nll * weights).sum()

    if reduction == 'sum':
        return total
    if reduction == 'mean':
        return total / jnp.maximum(weights.sum(), 1e-9)
    if reduction in ('none', None):
        return jnp.where(valid, nll, 0.0)
    raise ValueError(f'Reduction {reduction} not defined')


###############################################################################
# Train step
###############################################################################


def make_optimizer(config):
    return optax.adam(config.learning_rate)


# Steps between cross-process preemption-flag polls (a blocking host
# collective; see the train loop). ~2-4 s of steps at bench step times.
STOP_POLL_INTERVAL = 25


def gradient_stats(grads):
    """L2 norm / max / min over the full gradient pytree
    (replaces torchutil.gradients.stats)."""
    leaves = jax.tree.leaves(grads)
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    gmax = jnp.max(jnp.stack([jnp.max(g) for g in leaves]))
    gmin = jnp.min(jnp.stack([jnp.min(g) for g in leaves]))
    return {'gradients/norm': jnp.sqrt(sq),
            'gradients/max': gmax,
            'gradients/min': gmin}


def _grad_l2_norm(grads):
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))


def _grad_max_abs(grads):
    leaves = jax.tree.leaves(grads)
    return jnp.max(jnp.stack(
        [jnp.max(jnp.abs(g.astype(jnp.float32))) for g in leaves]))


def make_train_step(config, optimizer, class_weights=None, mesh=None):
    """Jitted train step. When ``mesh`` has a 'pipe' axis, the forward runs
    the GPipe schedule (parallel/pipeline.py) with train-mode dropout;
    otherwise the model's standard forward (XLA/GSPMD handles any 'data' /
    'model' axes from the sharding annotations alone)."""
    forward = models.get(config)[1]
    n_pipe = mesh.shape.get('pipe', 1) if mesh is not None else 1
    pipe_batch_axis = (
        'data' if mesh is not None and mesh.shape.get('data', 1) > 1
        else None)

    # Codebook FRONTEND: encodec/dac cache int codes; dequantize on device
    # inside the jitted step (reference ppgs/train/core.py:115-119)
    from .. import frontend as frontend_mod

    codebook_frontend = frontend_mod.maybe_frontend(config)

    clip_l2 = config.gradient_clip_threshold_l2
    clip_inf = config.gradient_clip_threshold_inf

    def step_fn(params, opt_state, features, targets, lengths, rng,
                with_stats=False):
        if codebook_frontend is not None:
            features = codebook_frontend(features)

        def loss_fn(p):
            if n_pipe > 1:
                logits = parallel.pipeline_forward(
                    p, features, lengths, config, mesh, axis='pipe',
                    batch_axis=pipe_batch_axis, train=True, rng=rng)
            else:
                logits = forward(p, features, lengths, config, train=True,
                                 rng=rng)
            return loss(logits, targets, config, class_weights)

        train_loss, grads = jax.value_and_grad(loss_fn)(params)

        # Full gradient statistics only on logging steps (with_stats is a
        # static argument — the common step compiles without the tree-wide
        # max/min/norm reductions; the reference computes them EVERY step,
        # ppgs/train/core.py:141-145, but only tensorboard consumes them).
        # Clipping reuses the logged norm when available and otherwise
        # computes just the reduction it needs.
        stats = gradient_stats(grads) if with_stats else {}

        # Conditional clipping matching the reference's threshold semantics:
        # only rescale when the measured norm exceeds the threshold
        if clip_l2 is not None:
            norm = (stats['gradients/norm'] if with_stats
                    else _grad_l2_norm(grads))
            scale = jnp.minimum(1.0, clip_l2 / (norm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        if clip_inf is not None:
            if with_stats:
                max_abs = jnp.maximum(jnp.abs(stats['gradients/max']),
                                      jnp.abs(stats['gradients/min']))
            else:
                max_abs = _grad_max_abs(grads)
            scale = jnp.minimum(1.0, clip_inf / (max_abs + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, train_loss, stats

    return jax.jit(step_fn, donate_argnums=(0, 1),
                   static_argnames=('with_stats',))


###############################################################################
# Checkpointing
###############################################################################


def checkpoint_state(directory, step, epoch, params, opt_state,
                     backend='npz'):
    """Save a training checkpoint ({step:08d}.npz, or an orbax step
    directory with async serialization when backend='orbax')."""
    from . import checkpoint as ckpt

    state = {'params': params, 'opt_state': _opt_state_to_tree(opt_state)}
    if backend == 'orbax':
        return ckpt.orbax_save(directory, step, epoch, state)
    return ckpt.npz_save(directory, step, epoch, jax.device_get(state))


def latest_checkpoint(directory, backend='npz'):
    from . import checkpoint as ckpt

    if backend == 'orbax':
        return ckpt.orbax_latest(directory)
    return ckpt.npz_latest(directory)


def load_checkpoint(path, optimizer, params_template, backend='npz'):
    """Restore (params, opt_state, step, epoch) from a checkpoint.

    ``path`` is the npz file, or the orbax step directory returned by
    latest_checkpoint(backend='orbax')."""
    from . import checkpoint as ckpt

    if backend == 'orbax':
        template = {
            'params': params_template,
            'opt_state': _opt_state_to_tree(
                optimizer.init(params_template)),
        }
        tree, step, epoch = ckpt.orbax_restore(
            Path(path).parent, int(Path(path).name), template)
    else:
        tree, step, epoch = ckpt.npz_restore(path)
    params = tree['params']
    opt_state = _tree_to_opt_state(
        tree['opt_state'], optimizer, params_template)
    return params, opt_state, step, epoch


def _opt_state_to_tree(opt_state):
    """Adam state -> plain dict (count, mu, nu)."""
    adam_state = opt_state[0]
    return {'count': adam_state.count, 'mu': adam_state.mu,
            'nu': adam_state.nu}


def _tree_to_opt_state(tree, optimizer, params_template):
    fresh = optimizer.init(params_template)
    adam_state = fresh[0]._replace(
        count=jnp.asarray(tree['count']), mu=tree['mu'], nu=tree['nu'])
    return (adam_state,) + tuple(fresh[1:])


###############################################################################
# State placement
###############################################################################


def _place_train_state(mesh, params, opt_state):
    """Place params + optimizer state on the mesh.

    With a >1 'model' axis configured (config.mesh_shape/mesh_axis_names),
    attention projections and FFN hidden dims shard tensor-parallel
    (parallel.w2v2_param_sharding rules — the transformer uses the same
    wq/wk/wv/wo/w1/w2 naming); Adam mu/nu inherit the param shardings and
    GSPMD inserts the row-parallel all-reduces. Otherwise everything
    replicates. TP placement is single-controller; multi-process runs use
    the replicated path (DP over the hybrid mesh).
    """
    from ..parallel import multihost

    n_model = mesh.shape.get('model', 1)
    if n_model > 1 and jax.process_count() == 1:
        shardings = parallel.w2v2_param_sharding(mesh, params, axis='model')
        params = parallel.shard_params(params, shardings)
        replicated = parallel.replicated(mesh)
        adam = opt_state[0]
        adam = adam._replace(
            count=jax.device_put(adam.count, replicated),
            mu=parallel.shard_params(adam.mu, shardings),
            nu=parallel.shard_params(adam.nu, shardings))
        rest = jax.tree.map(
            lambda x: jax.device_put(x, replicated), tuple(opt_state[1:]))
        return params, (adam,) + rest
    return (multihost.replicate_global(mesh, params),
            multihost.replicate_global(mesh, opt_state))


###############################################################################
# Scalars log (tensorboard-compatible JSONL fallback)
###############################################################################


class ScalarWriter:
    """Training metrics sink: metrics.jsonl + tensorboard event files.

    The reference logs per-step gradient statistics and eval metrics to
    tensorboard via torchutil.tensorboard.update (ppgs/train/core.py:141-145,
    354-365). Here every scalar is appended to a greppable metrics.jsonl and,
    when torch.utils.tensorboard is importable, mirrored to event files in the
    same run directory so standard tensorboard tooling works unchanged.
    """

    def __init__(self, directory):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.path = self.directory / 'metrics.jsonl'
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(self.directory))
        except ImportError:
            pass  # torch/tensorboard not installed: metrics.jsonl only
        except Exception as error:
            import warnings
            warnings.warn(
                'tensorboard mirroring disabled: SummaryWriter failed '
                f'({type(error).__name__}: {error}); metrics are still '
                'written to metrics.jsonl')

    def update(self, step, scalars, figures=None):
        record = {'step': int(step), 'time': time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        with open(self.path, 'a') as file:
            file.write(json.dumps(record) + '\n')
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(key, float(value), int(step))
            for key, fig in (figures or {}).items():
                self._tb.add_figure(key, fig, int(step))
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()


###############################################################################
# Training
###############################################################################


@_notify_mod.notify("train")
def train(dataset, directory=None, config=None, mesh=None, max_steps=None,
          loader_fn=None):
    """Train a model (reference ppgs/train/core.py:18-281).

    ``loader_fn(partition) -> iterable of (features, targets, lengths)``
    overrides the default dataset loader (used by tests/benchmarks).
    """
    from ..data import loader as data_loader
    from ..parallel import multihost

    config = config_mod.get(config)
    directory = Path(directory or config_mod.RUNS_DIR / config.config)
    directory.mkdir(parents=True, exist_ok=True)
    steps = max_steps or config.steps

    # Multi-host: env-driven jax.distributed bring-up (no-op single-process),
    # then a global DCN x ICI mesh whose leading axis spans processes
    multihost.initialize()
    if mesh is None:
        mesh = multihost.make_hybrid_mesh(
            config.mesh_shape, config.mesh_axis_names)
    n_data = mesh.shape.get('data', 1)
    # Pipeline stages each ingest one microbatch, itself data-sharded:
    # batches pad to (data x pipe) so both splits are exact
    batch_multiple = n_data * mesh.shape.get('pipe', 1)

    # Model + optimizer. Param init uses the default (threefry) PRNG for
    # cross-platform determinism; the per-step dropout keys use the
    # hardware 'rbg' generator — threefry mask generation over the
    # (B, H, T, T)-sized dropout tensors is a measurable slice of step
    # time on TPU, and dropout needs no cross-impl reproducibility.
    init_seed = jax.random.PRNGKey(config.random_seed)
    _, init_rng = jax.random.split(init_seed)
    params = models.init(init_rng, config)
    rng = jax.random.key(config.random_seed, impl='rbg')
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)

    class_weights = (load_mod.phoneme_weights(config)
                     if config.class_balanced else None)
    step_fn = make_train_step(config, optimizer, class_weights, mesh)

    # Maybe resume. Orbax checkpointing is COLLECTIVE on multi-host runs:
    # every process calls save() (async multi-process save — each host
    # writes its addressable shards, all join the commit barrier), so
    # checkpoint sites below run on all processes for orbax and
    # primary-only for the single-writer npz backend.
    backend = config.checkpoint_backend
    ckpt_collective = backend == 'orbax' and jax.process_count() > 1

    def should_write_checkpoint():
        return ckpt_collective or multihost.is_primary()

    ckpt = latest_checkpoint(directory, backend)
    if ckpt is not None:
        params, opt_state, step, epoch = load_checkpoint(
            ckpt, optimizer, params, backend)
    else:
        step, epoch = 0, 0

    # Place state on the mesh: tensor-parallel sharded when a 'model' axis
    # is configured, replicated otherwise
    params, opt_state = _place_train_state(mesh, params, opt_state)

    if loader_fn is None:
        train_loader = data_loader(dataset, 'train', config=config)
        valid_loader = data_loader(dataset, 'valid', config=config)

        def loader_fn(partition):
            ldr = train_loader if partition == 'train' else valid_loader
            for batch in ldr:
                features, targets, lengths = batch[:3]
                yield features, targets, lengths
        loader_fn_uses_sampler = True
    else:
        train_loader = None
        loader_fn_uses_sampler = False

    # Host side effects (metric logs, checkpoints) belong to process 0
    writer = ScalarWriter(directory) if multihost.is_primary() else None

    # Preemption safety: TPU maintenance events deliver SIGTERM; route it
    # through the same save-on-interrupt path as Ctrl-C (the reference
    # handles only KeyboardInterrupt, ppgs/train/core.py:257-266).
    # Multi-process runs must NOT raise asynchronously: the signal lands
    # on each host at a different moment, and the collective checkpoint
    # needs every process at the same step — so the handler only sets a
    # flag, and the loop agrees on the stop via one cross-process OR per
    # step (multihost.any_process).
    import signal

    stop_requested = [False]
    coordinated_stop = jax.process_count() > 1

    def _preempted(signum, frame):
        if coordinated_stop:
            stop_requested[0] = True
        else:
            raise KeyboardInterrupt(f'signal {signum}')

    try:
        previous_handler = signal.signal(signal.SIGTERM, _preempted)
    except ValueError:          # not the main thread: skip installation
        previous_handler = None

    try:
        while step < steps:
            if loader_fn_uses_sampler:
                train_loader.batch_sampler.set_epoch(epoch)
            for features, targets, lengths in loader_fn('train'):
                # Every process materializes the same global batch and
                # feeds only its local block: multi-host runs are
                # step-for-step identical to single-process
                batch = parallel.pad_batch_to_multiple(
                    (np.asarray(features), np.asarray(targets),
                     np.asarray(lengths)), batch_multiple,
                    fill=(0, -100, 0))
                features_d, targets_d, lengths_d = (
                    multihost.shard_global_batch(
                        mesh, multihost.local_slice(batch)))
                rng, step_rng = jax.random.split(rng)
                # Stats schedule must be a pure function of `step` (NOT of
                # writer/primary-ness) so every process runs one program
                log_step = step % 100 == 0
                params, opt_state, train_loss, stats = step_fn(
                    params, opt_state, features_d, targets_d, lengths_d,
                    step_rng, with_stats=log_step)

                if log_step and writer is not None:
                    scalars = {'train/loss': float(train_loss)}
                    scalars.update(
                        {k: float(v) for k, v in stats.items()})
                    writer.update(step, scalars)

                if step % config.evaluation_interval == 0:
                    evaluate_partition(
                        writer, step, params, config, loader_fn, 'valid',
                        mesh, n_data,
                        config.default_evaluation_steps
                        if step < steps else None)

                if (step and step % config.checkpoint_interval == 0
                        and should_write_checkpoint()):
                    checkpoint_state(directory, step, epoch, params,
                                     opt_state, backend)

                step += 1
                # Poll the cross-process OR every few steps, not every step:
                # any_process is a blocking host-synchronous allgather that
                # serializes dispatch, and preemption notice windows are tens
                # of seconds. The poll schedule must be a pure function of
                # `step` so every process joins the collective together.
                if (coordinated_stop and step % STOP_POLL_INTERVAL == 0
                        and multihost.any_process(stop_requested[0])):
                    raise KeyboardInterrupt('coordinated multi-host stop')
                if step >= steps:
                    break
            epoch += 1
    except KeyboardInterrupt:
        pass
    finally:
        if previous_handler is not None:
            signal.signal(signal.SIGTERM, previous_handler)
        if should_write_checkpoint():
            checkpoint_state(directory, step, epoch, params, opt_state,
                             backend)
            if backend == 'orbax':
                from . import checkpoint as ckpt_mod
                ckpt_mod.wait_until_finished(directory)
        if writer is not None:
            writer.close()

    return params


@functools.partial(jax.jit, static_argnames=('config',))
def _eval_forward(params, features, lengths, config):
    """Module-level jitted eval forward: caches across eval intervals (a
    fresh lambda per interval would retrace/recompile every 1,000 steps).
    Codebook configs dequantize int codes first (codebooks constant-fold
    into the compiled program)."""
    if config.frontend is not None:
        from .. import frontend as frontend_mod

        features = frontend_mod.maybe_frontend(config)(features)
    return models.get(config)[1](params, features, lengths, config)


def evaluate_partition(writer, step, params, config, loader_fn, partition,
                       mesh, n_data, evaluation_steps=None):
    """Eval pass writing metric scalars (reference train/core.py:288-365).

    Under multi-host execution every process walks the same loader stream
    and feeds its local block of each global batch; the jitted metric
    update reduces over the sharded batch axis, so the accumulated state is
    already the exact global sum (no end-of-pass aggregation needed).
    """
    from ..parallel import multihost

    metrics = Metrics(include_figures=True, config=config)
    for i, (features, targets, lengths) in enumerate(loader_fn(partition)):
        batch = parallel.pad_batch_to_multiple(
            (np.asarray(features), np.asarray(targets),
             np.asarray(lengths)), n_data, fill=(0, -100, 0))
        features_d, targets_d, lengths_d = multihost.shard_global_batch(
            mesh, multihost.local_slice(batch))
        logits = _eval_forward(params, features_d, lengths_d, config)
        metrics.update(logits, targets_d)
        if evaluation_steps is not None and i + 1 == evaluation_steps:
            break
    results = metrics()
    scalars = {
        f'{partition}/{k}': v for k, v in results.items()
        if isinstance(v, (int, float))}
    # Confusion/distance-matrix figures go to tensorboard like the
    # reference's matplotlib figure logging (ppgs/train/core.py:354-365)
    figures = {
        f'{partition}/{k}': v for k, v in results.items()
        if not isinstance(v, (int, float))}
    if writer is not None:
        writer.update(step, scalars, figures)
    for figure in figures.values():
        import matplotlib.pyplot as plt
        plt.close(figure)
    return scalars
