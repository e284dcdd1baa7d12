"""Training step, loss, checkpointing, and multi-device sharding tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import parallel
from ppgs_tpu.models import transformer
from ppgs_tpu.train import core as train_core


TINY = ppgs_tpu.Config(
    num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
    max_len=64, chunk_length=64, chunk_overlap=8, compute_dtype='float32')


def make_batch(B=4, T=64, seed=0):
    rng = np.random.default_rng(seed)
    features = rng.standard_normal((B, 80, T)).astype(np.float32)
    targets = rng.integers(0, 40, size=(B, T)).astype(np.int64)
    lengths = np.array([T, T - 10, T // 2, 5][:B], dtype=np.int64)
    for i, l in enumerate(lengths):
        features[i, :, l:] = 0
        targets[i, l:] = -100
    return features, targets, lengths


def test_loss_matches_torch_cross_entropy():
    features, targets, lengths = make_batch()
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 40, 64)).astype(np.float32)

    ours = float(train_core.loss(jnp.asarray(logits), jnp.asarray(targets),
                                 TINY))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction='mean').item()
    assert ours == pytest.approx(ref, rel=1e-5)

    ours_sum = float(train_core.loss(
        jnp.asarray(logits), jnp.asarray(targets), TINY, reduction='sum'))
    ref_sum = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction='sum').item()
    assert ours_sum == pytest.approx(ref_sum, rel=1e-5)


def test_loss_with_class_weights_matches_torch():
    features, targets, lengths = make_batch()
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, 40, 64)).astype(np.float32)
    weights = rng.uniform(0.1, 1.0, size=40).astype(np.float32)

    ours = float(train_core.loss(
        jnp.asarray(logits), jnp.asarray(targets), TINY,
        class_weights=jnp.asarray(weights)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        torch.from_numpy(weights), reduction='mean').item()
    assert ours == pytest.approx(ref, rel=1e-4)


def test_train_step_decreases_loss():
    params = transformer.init(jax.random.PRNGKey(0), TINY)
    optimizer = train_core.make_optimizer(TINY)
    opt_state = optimizer.init(params)
    step_fn = train_core.make_train_step(TINY, optimizer)

    features, targets, lengths = make_batch()
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        rng, step_rng = jax.random.split(rng)
        # Alternate the two compiled variants: common steps (no stats) and
        # logging steps (full gradient statistics)
        params, opt_state, train_loss, stats = step_fn(
            params, opt_state, jnp.asarray(features), jnp.asarray(targets),
            jnp.asarray(lengths), step_rng, with_stats=i % 2 == 0)
        losses.append(float(train_loss))
        if i % 2 == 0:
            assert float(stats['gradients/norm']) > 0
        else:
            assert stats == {}
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_step_sharded_matches_single_device():
    """DP over the 8-device CPU mesh must match single-device updates."""
    devices = jax.devices()
    assert len(devices) == 8, 'conftest should provide 8 virtual devices'
    mesh = parallel.make_mesh(shape=(8,), axis_names=('data',))

    features, targets, lengths = make_batch(B=8)
    lengths = np.array([64, 54, 32, 5, 64, 64, 20, 64], dtype=np.int64)
    rng = np.random.default_rng(3)
    features = rng.standard_normal((8, 80, 64)).astype(np.float32)
    targets = rng.integers(0, 40, size=(8, 64)).astype(np.int64)
    for i, l in enumerate(lengths):
        features[i, :, l:] = 0
        targets[i, l:] = -100

    def run(shard):
        params = transformer.init(jax.random.PRNGKey(0), TINY)
        optimizer = train_core.make_optimizer(TINY)
        opt_state = optimizer.init(params)
        step_fn = train_core.make_train_step(TINY, optimizer)
        if shard:
            params = parallel.replicate(mesh, params)
            opt_state = parallel.replicate(mesh, opt_state)
            f, t, l = parallel.shard_batch(
                mesh, (features, targets, lengths))
        else:
            f, t, l = (jnp.asarray(features), jnp.asarray(targets),
                       jnp.asarray(lengths))
        losses = []
        rng_ = jax.random.PRNGKey(7)
        for _ in range(3):
            # rng fixed: dropout pattern must agree across runs
            params, opt_state, loss_val, _ = step_fn(
                params, opt_state, f, t, l, rng_)
            losses.append(float(loss_val))
        return losses, jax.device_get(params)

    losses_single, params_single = run(False)
    losses_sharded, params_sharded = run(True)

    np.testing.assert_allclose(losses_single, losses_sharded, rtol=1e-4)
    # Adam updates are O(lr)=2e-4 per step; cross-device reduction order
    # shifts them by up to ~1e-4 in the first steps
    flat_a = jax.tree.leaves(params_single)
    flat_b = jax.tree.leaves(params_sharded)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-4)


def test_checkpoint_roundtrip(tmp_path):
    params = transformer.init(jax.random.PRNGKey(0), TINY)
    optimizer = train_core.make_optimizer(TINY)
    opt_state = optimizer.init(params)

    # Take one step so opt state is non-trivial
    step_fn = train_core.make_train_step(TINY, optimizer)
    features, targets, lengths = make_batch()
    params, opt_state, _, _ = step_fn(
        params, opt_state, jnp.asarray(features), jnp.asarray(targets),
        jnp.asarray(lengths), jax.random.PRNGKey(2))

    path = train_core.checkpoint_state(tmp_path, 123, 4, params, opt_state)
    assert path.name == '00000123.npz'
    assert train_core.latest_checkpoint(tmp_path) == path

    params2, opt_state2, step, epoch = train_core.load_checkpoint(
        path, optimizer, params)
    assert (step, epoch) == (123, 4)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(a, b, atol=0)
    assert int(opt_state2[0].count) == int(opt_state[0].count)


def test_pad_batch_to_multiple():
    arrays = (np.ones((5, 3)), np.ones((5,), dtype=np.int64))
    padded = parallel.pad_batch_to_multiple(arrays, 4, fill=(0, -100))
    assert padded[0].shape == (8, 3)
    assert padded[1].shape == (8,)
    assert padded[0][5:].sum() == 0
    assert (padded[1][5:] == -100).all()


def test_padded_batch_loss_and_metrics_invariant():
    """Padding B=5 -> 8 for a 4-way data mesh must not change the loss or
    any metric scalar: padded target rows carry the -100 ignore sentinel
    (zero-filled targets would score padded rows as valid class-0 frames)."""
    from ppgs_tpu.evaluate.metrics import Metrics

    mesh = parallel.make_mesh(shape=(4,), axis_names=('data',))
    B, T = 5, 64
    rng = np.random.default_rng(11)
    features = rng.standard_normal((B, 80, T)).astype(np.float32)
    targets = rng.integers(0, 40, size=(B, T)).astype(np.int64)
    lengths = np.array([64, 50, 33, 8, 64], dtype=np.int64)
    for i, l in enumerate(lengths):
        features[i, :, l:] = 0
        targets[i, l:] = -100

    params = transformer.init(jax.random.PRNGKey(0), TINY)

    # Unpadded single-device reference
    logits_ref = transformer.forward(
        params, jnp.asarray(features), jnp.asarray(lengths), TINY)
    loss_ref = float(train_core.loss(logits_ref, jnp.asarray(targets), TINY))
    metrics_ref = Metrics(config=TINY)
    metrics_ref.update(logits_ref, targets)

    # Padded, sharded over the 4-way data mesh
    f, t, l = parallel.pad_batch_to_multiple(
        (features, targets, lengths), 4, fill=(0, -100, 0))
    assert f.shape[0] == 8
    f, t, l = parallel.shard_batch(mesh, (f, t, l))
    params_r = parallel.replicate(mesh, params)
    logits_pad = transformer.forward(params_r, f, l, TINY)
    loss_pad = float(train_core.loss(logits_pad, t, TINY))
    metrics_pad = Metrics(config=TINY)
    metrics_pad.update(logits_pad, t)

    assert loss_pad == pytest.approx(loss_ref, rel=1e-6)
    ref_results = metrics_ref()
    for key, value in metrics_pad().items():
        assert value == pytest.approx(ref_results[key], rel=1e-6), key


def _mesh_test_loader(partition):
    rng = np.random.default_rng(21)
    for _ in range(2):
        feats = rng.standard_normal((4, 80, 64)).astype('f4')
        targets = rng.integers(0, 40, size=(4, 64)).astype(np.int64)
        lengths = np.array([64, 50, 33, 64], dtype=np.int64)
        for i, l in enumerate(lengths):
            feats[i, :, l:] = 0
            targets[i, l:] = -100
        yield feats, targets, lengths


def _train_with_mesh_config(tmp_path, name, **mesh_kwargs):
    from ppgs_tpu import load as load_mod

    config = TINY.replace(
        dropout=0.0, evaluation_interval=10 ** 9,
        checkpoint_interval=10 ** 9, **mesh_kwargs)
    params = train_core.train(
        'synthetic', directory=tmp_path / name, config=config,
        max_steps=2, loader_fn=_mesh_test_loader)
    return load_mod.flatten_params(jax.device_get(params))


def test_train_via_config_2d_mesh(tmp_path):
    """TP and PP reached via config.mesh_shape/mesh_axis_names alone match
    DP-only numerics (dropout off; reduction-order tolerance)."""
    flat_dp = _train_with_mesh_config(
        tmp_path, 'dp', mesh_shape=(-1,), mesh_axis_names=('data',))
    flat_tp = _train_with_mesh_config(
        tmp_path, 'tp', mesh_shape=(2, 4),
        mesh_axis_names=('data', 'model'))
    flat_pp = _train_with_mesh_config(
        tmp_path, 'pp', mesh_shape=(4, 2),
        mesh_axis_names=('data', 'pipe'))

    for flat_other, tag in ((flat_tp, 'tp'), (flat_pp, 'pp')):
        assert set(flat_other) == set(flat_dp)
        for key in flat_dp:
            np.testing.assert_allclose(
                flat_other[key], flat_dp[key], rtol=5e-3, atol=2e-4,
                err_msg=f'{tag}:{key}')


def test_train_via_config_pipe_mesh_with_dropout(tmp_path):
    """PP training with dropout ON (the default) must run: the train
    step's 'rbg' keys round-trip through the pipeline's shard_map."""
    from ppgs_tpu import load as load_mod

    config = TINY.replace(
        dropout=0.1, evaluation_interval=10 ** 9,
        checkpoint_interval=10 ** 9,
        mesh_shape=(4, 2), mesh_axis_names=('data', 'pipe'))
    params = train_core.train(
        'synthetic', directory=tmp_path / 'pp-dropout', config=config,
        max_steps=2, loader_fn=_mesh_test_loader)
    flat = load_mod.flatten_params(jax.device_get(params))
    assert all(np.isfinite(v).all() for v in flat.values())


def test_load_model_from_training_checkpoint(tmp_path):
    """load.model unwraps training checkpoints (params next to optimizer
    state), like the reference's 'model'-keyed dicts (ppgs/load.py:76-79)."""
    from ppgs_tpu import load as load_mod

    params = transformer.init(jax.random.PRNGKey(0), TINY)
    optimizer = train_core.make_optimizer(TINY)
    opt_state = optimizer.init(params)
    path = train_core.checkpoint_state(tmp_path, 7, 1, params, opt_state)

    loaded, _ = load_mod.model(checkpoint=path, config=TINY)
    assert 'input_conv' in loaded and 'opt_state' not in loaded
    np.testing.assert_allclose(
        loaded['input_conv']['weight'], params['input_conv']['weight'])


def test_evaluate_partition_no_retrace(tmp_path):
    """A second eval interval with the same batch shapes must hit the jit
    cache (the eval forward is module-level, not a per-call lambda)."""
    params = transformer.init(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)

    def loader_fn(partition):
        for _ in range(2):
            yield (rng.standard_normal((2, 80, 64)).astype('f4'),
                   rng.integers(0, 40, size=(2, 64)),
                   np.array([64, 48]))

    mesh = parallel.make_mesh(shape=(1,), axis_names=('data',))
    writer = train_core.ScalarWriter(tmp_path)
    train_core.evaluate_partition(
        writer, 0, params, TINY, loader_fn, 'valid', mesh, 1)
    size_after_first = train_core._eval_forward._cache_size()
    train_core.evaluate_partition(
        writer, 1, params, TINY, loader_fn, 'valid', mesh, 1)
    assert train_core._eval_forward._cache_size() == size_after_first
    writer.close()


def test_orbax_checkpoint_roundtrip(tmp_path):
    params = transformer.init(jax.random.PRNGKey(0), TINY)
    optimizer = train_core.make_optimizer(TINY)
    opt_state = optimizer.init(params)
    step_fn = train_core.make_train_step(TINY, optimizer)
    features, targets, lengths = make_batch()
    params, opt_state, _, _ = step_fn(
        params, opt_state, jnp.asarray(features), jnp.asarray(targets),
        jnp.asarray(lengths), jax.random.PRNGKey(2))

    from ppgs_tpu.train import checkpoint as ckpt_mod

    directory = tmp_path / 'run'
    path = train_core.checkpoint_state(
        directory, 250, 7, params, opt_state, backend='orbax')
    ckpt_mod.wait_until_finished(directory)
    assert train_core.latest_checkpoint(directory, backend='orbax') == path

    params2, opt_state2, step, epoch = train_core.load_checkpoint(
        path, optimizer, params, backend='orbax')
    assert (step, epoch) == (250, 7)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(a, b, atol=0)
    assert int(opt_state2[0].count) == int(opt_state[0].count)
    ckpt_mod.close(directory)


def test_train_resume_orbax(tmp_path):
    """train() with the orbax backend checkpoints and auto-resumes."""
    rng = np.random.default_rng(0)

    def loader_fn(partition):
        for _ in range(4):
            yield (rng.standard_normal((2, 80, 64)).astype('f4'),
                   rng.integers(0, 40, size=(2, 64)),
                   np.array([64, 48]))

    config = TINY.replace(checkpoint_backend='orbax',
                          evaluation_interval=10 ** 9,
                          checkpoint_interval=10 ** 9)
    directory = tmp_path / 'run'
    train_core.train('synthetic', directory=directory, config=config,
                     max_steps=2, loader_fn=loader_fn)

    from ppgs_tpu.train import checkpoint as ckpt_mod

    latest = train_core.latest_checkpoint(directory, backend='orbax')
    assert latest is not None and latest.name == '2'

    # Resuming continues from step 2 (saves 3 at the end of max_steps=3)
    train_core.train('synthetic', directory=directory, config=config,
                     max_steps=3, loader_fn=loader_fn)
    latest = train_core.latest_checkpoint(directory, backend='orbax')
    assert latest.name == '3'
    ckpt_mod.close(directory)


def test_train_sigterm_checkpoints_and_exits(tmp_path):
    """TPU preemption (SIGTERM) saves a checkpoint and returns cleanly,
    like the reference's save-on-KeyboardInterrupt."""
    import os
    import signal

    config = TINY.replace(evaluation_interval=10 ** 9,
                          checkpoint_interval=10 ** 9)
    rng = np.random.default_rng(0)
    fired = {'step': 0}

    def loader_fn(partition):
        for _ in range(100):
            fired['step'] += 1
            if fired['step'] == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield (rng.standard_normal((2, 80, 64)).astype('f4'),
                   rng.integers(0, 40, size=(2, 64)),
                   np.array([64, 48]))

    directory = tmp_path / 'preempt'
    params = train_core.train('synthetic', directory=directory,
                              config=config, max_steps=100,
                              loader_fn=loader_fn)
    assert params is not None
    latest = train_core.latest_checkpoint(directory)
    assert latest is not None
    # Interrupted well before max_steps
    assert int(latest.stem) < 100
    # The original handler is restored
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL


def test_remat_matches_standard_backward():
    """config.remat rematerializes encoder layers in the backward pass:
    loss and gradients are identical, only activation memory differs."""
    features, targets, lengths = make_batch()
    rng = jax.random.PRNGKey(3)

    def grads_for(config):
        params = transformer.init(jax.random.PRNGKey(0), config)

        def loss_fn(p):
            logits = transformer.forward(
                p, jnp.asarray(features), jnp.asarray(lengths), config,
                train=True, rng=rng)
            return train_core.loss(logits, jnp.asarray(targets), config)

        return jax.value_and_grad(loss_fn)(params)

    loss_a, grads_a = grads_for(TINY)
    loss_b, grads_b = grads_for(TINY.replace(remat=True))
    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-6)
    for a, b in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
