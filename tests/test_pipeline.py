"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ppgs_tpu
from ppgs_tpu import parallel
from ppgs_tpu.models import transformer


CONFIG = ppgs_tpu.Config(
    num_hidden_layers=4, hidden_channels=32, ffn_channels=64,
    attention_heads=2, max_len=64, chunk_length=64, chunk_overlap=8,
    compute_dtype='float32')


def _inputs(rng, b=8, t=48):
    feats = jax.random.normal(
        rng, (b, CONFIG.input_channels, t), jnp.float32)
    lengths = jnp.array([t - (i % 3) for i in range(b)], jnp.int32)
    return feats, lengths


def test_pipeline_matches_single_device_forward():
    params = transformer.init(jax.random.PRNGKey(0), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(1))
    expected = transformer.forward(params, feats, lengths, CONFIG)

    mesh = parallel.make_mesh(
        devices=jax.devices()[:4], shape=(4,), axis_names=('pipe',))
    got = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh, axis='pipe')
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_pipeline_two_stages_more_microbatches():
    params = transformer.init(jax.random.PRNGKey(2), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(3))
    expected = transformer.forward(params, feats, lengths, CONFIG)

    mesh = parallel.make_mesh(
        devices=jax.devices()[:2], shape=(2,), axis_names=('pipe',))
    got = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh, axis='pipe',
        num_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_pipeline_causal():
    config = CONFIG.replace(is_causal=True)
    params = transformer.init(jax.random.PRNGKey(4), config)
    feats, lengths = _inputs(jax.random.PRNGKey(5))
    expected = transformer.forward(params, feats, lengths, config)

    mesh = parallel.make_mesh(
        devices=jax.devices()[:4], shape=(4,), axis_names=('pipe',))
    got = parallel.pipeline_forward(
        params, feats, lengths, config, mesh, axis='pipe')
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_pipeline_composes_with_data_parallel():
    params = transformer.init(jax.random.PRNGKey(6), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(7))
    expected = transformer.forward(params, feats, lengths, CONFIG)

    mesh = parallel.make_mesh(
        devices=jax.devices()[:8], shape=(2, 4),
        axis_names=('data', 'pipe'))
    got = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh, axis='pipe',
        batch_axis='data')
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_pipeline_backward_matches_single_device():
    """jax.grad through the schedule IS the reverse pipeline (ppermute
    transposes to its inverse) — pipeline-parallel training needs no
    hand-written backward."""
    params = transformer.init(jax.random.PRNGKey(8), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(9), b=4)
    mesh = parallel.make_mesh(
        devices=jax.devices()[:4], shape=(4,), axis_names=('pipe',))

    def loss_single(p):
        out = transformer.forward(p, feats, lengths, CONFIG)
        return (out.astype(jnp.float32) ** 2).mean()

    def loss_pipe(p):
        out = parallel.pipeline_forward(
            p, feats, lengths, CONFIG, mesh, axis='pipe')
        return (out.astype(jnp.float32) ** 2).mean()

    g_single = jax.grad(loss_single)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_single)
    flat_p, _ = jax.tree_util.tree_flatten(g_pipe)
    for a, b in zip(flat_s, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_pipeline_validates_divisibility():
    params = transformer.init(jax.random.PRNGKey(10), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(11))
    mesh = parallel.make_mesh(
        devices=jax.devices()[:3], shape=(3,), axis_names=('pipe',))
    with pytest.raises(ValueError, match='divide'):
        parallel.pipeline_forward(
            params, feats, lengths, CONFIG, mesh, axis='pipe')


def test_pipeline_train_mode_dropout():
    """train=True applies dropout (outputs differ from inference, are
    deterministic per rng, and differ across rngs); gradients flow."""
    params = transformer.init(jax.random.PRNGKey(0), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(1))
    mesh = parallel.make_mesh(shape=(4,), axis_names=('pipe',))

    inference = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh)
    train_a = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh,
        train=True, rng=jax.random.PRNGKey(5))
    train_a2 = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh,
        train=True, rng=jax.random.PRNGKey(5))
    train_b = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh,
        train=True, rng=jax.random.PRNGKey(6))

    assert not np.allclose(np.asarray(inference), np.asarray(train_a))
    np.testing.assert_array_equal(np.asarray(train_a), np.asarray(train_a2))
    assert not np.allclose(np.asarray(train_a), np.asarray(train_b))

    def loss_fn(p):
        out = parallel.pipeline_forward(
            p, feats, lengths, CONFIG, mesh,
            train=True, rng=jax.random.PRNGKey(5))
        return (out ** 2).mean()

    grads = jax.grad(loss_fn)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms)) and sum(norms) > 0


def test_pipeline_batch_axis_divisibility_error():
    params = transformer.init(jax.random.PRNGKey(0), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(1), b=4)
    mesh = parallel.make_mesh(shape=(4, 2), axis_names=('data', 'pipe'))
    # B=4 over M=2 microbatches -> microbatch 2, not divisible by data=4
    with pytest.raises(ValueError, match='microbatch size'):
        parallel.pipeline_forward(
            params, feats, lengths, CONFIG, mesh, axis='pipe',
            batch_axis='data')


def test_pipeline_train_mode_rbg_key():
    """train() hands the pipeline 'rbg'-impl step keys whose raw data is
    (4,) uint32 — the impl must survive the shard_map round trip."""
    params = transformer.init(jax.random.PRNGKey(0), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(1))
    mesh = parallel.make_mesh(shape=(4,), axis_names=('pipe',))
    rng = jax.random.key(3, impl='rbg')
    out = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh, train=True, rng=rng)
    assert np.isfinite(np.asarray(out)).all()
    inference = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh)
    assert not np.allclose(np.asarray(out), np.asarray(inference))


def test_pipeline_composes_with_tensor_parallel():
    """TP×PP on one 2D mesh: pipe stages manual (ppermute schedule), the
    'model' axis in GSPMD auto mode sharding each stage's matmuls from
    the Megatron param placements (round-3 verdict #6 / advisor item)."""
    params = transformer.init(jax.random.PRNGKey(8), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(9))
    expected = transformer.forward(params, feats, lengths, CONFIG)

    mesh = parallel.make_mesh(
        shape=(2, 4), axis_names=('pipe', 'model'))
    got = parallel.pipeline_forward(
        params, feats, lengths, CONFIG, mesh, axis='pipe',
        tp_axis='model')
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_pipeline_ingest_sharded_over_stages():
    """The microbatched input enters stage-local (round-robin over the
    pipe axis), not replicated: stage s holds M/n microbatches."""
    import re

    params = transformer.init(jax.random.PRNGKey(10), CONFIG)
    feats, lengths = _inputs(jax.random.PRNGKey(11))
    mesh = parallel.make_mesh(
        devices=jax.devices()[:4], shape=(4,), axis_names=('pipe',))
    lowered = jax.jit(
        lambda p, f, l: parallel.pipeline_forward(
            p, f, l, CONFIG, mesh, axis='pipe')).lower(
        params, feats, lengths)
    text = lowered.as_text().replace(' ', '')
    # The (M/n, n, mb, T, C) ingest operand of the manual computation must
    # enter sharded over the pipe axis on its stage dim (dim 1) — a
    # replicated ingest (the pre-round-4 layout) would show [{},{},...]
    assert '[{},{"pipe"},{},{},{}]' in text, (
        'stage-sharded ingest sharding not found in lowered HLO')
