"""Multi-device tests on the 8-device virtual CPU mesh: TP-sharded w2v2,
DP-sharded chunked inference, mesh helpers."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import parallel
from ppgs_tpu.models import transformer, w2v2


TINY_W2V2 = w2v2.W2V2Config(
    conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
    hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)


def test_make_mesh_shapes():
    mesh = parallel.make_mesh(shape=(-1,), axis_names=('data',))
    assert mesh.shape['data'] == 8
    mesh2d = parallel.make_mesh(shape=(4, 2), axis_names=('data', 'model'))
    assert mesh2d.shape == {'data': 4, 'model': 2}


def test_w2v2_tensor_parallel_matches_single_device():
    """TP over the 'model' axis must reproduce single-device outputs."""
    params = w2v2.init(jax.random.PRNGKey(0), TINY_W2V2)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 800)).astype(np.float32)

    ref = np.asarray(jax.jit(
        lambda a: w2v2.forward(params, a, config=TINY_W2V2))(
            jnp.asarray(audio)))

    mesh = parallel.make_mesh(shape=(2, 4), axis_names=('data', 'model'))
    shardings = parallel.w2v2_param_sharding(mesh, params)
    params_tp = parallel.shard_params(params, shardings)
    audio_tp = parallel.shard_batch(mesh, jnp.asarray(audio))

    out = np.asarray(jax.jit(
        lambda p, a: w2v2.forward(p, a, config=TINY_W2V2))(
            params_tp, audio_tp))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # Verify the intent: attention projections actually sharded over model
    leaf = params_tp['encoder']['layers'][0]['attn']['wq']
    spec = leaf.sharding.spec
    assert 'model' in str(spec)


def test_chunked_inference_data_parallel():
    """Chunked long-context inference with the batch sharded over 'data'.

    The fold-of-windows-into-batch formulation makes long-sequence
    parallelism pure data parallelism (SURVEY §2.b item 4)."""
    config = ppgs_tpu.Config(
        num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
        chunk_length=64, chunk_overlap=8, compute_dtype='float32')
    params = transformer.init(jax.random.PRNGKey(0), config)

    rng = np.random.default_rng(1)
    B, T = 8, 200
    feats = rng.standard_normal((B, 80, T)).astype(np.float32)
    lengths = np.full((B,), T, dtype=np.int64)

    ref = np.asarray(jax.jit(
        lambda f, l: transformer.chunked_forward(params, f, l, config))(
            jnp.asarray(feats), jnp.asarray(lengths)))

    mesh = parallel.make_mesh(shape=(8,), axis_names=('data',))
    params_r = parallel.replicate(mesh, params)
    feats_d, lengths_d = parallel.shard_batch(
        mesh, (feats, lengths))
    out = np.asarray(jax.jit(
        lambda p, f, l: transformer.chunked_forward(p, f, l, config))(
            params_r, feats_d, lengths_d))

    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_context_parallel_matches_single_device_chunked():
    """Halo-exchange CP over 8 shards == single-device chunked forward,
    including ragged per-item lengths and a T that needs padding."""
    config = ppgs_tpu.Config(
        num_hidden_layers=2, hidden_channels=32, attention_heads=2,
        ffn_channels=64, max_len=64, chunk_length=48, chunk_overlap=8,
        compute_dtype='float32')
    stride = config.chunk_length - 2 * config.chunk_overlap   # 32

    params = transformer.init(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    T = 8 * stride - 17                                       # ragged tail
    feats = rng.standard_normal((2, config.input_channels, T)) \
        .astype(np.float32)
    lengths = jnp.asarray([T, T - 40], jnp.int32)

    ref = np.asarray(jax.jit(functools.partial(
        transformer.chunked_forward, config=config))(
            params, jnp.asarray(feats), lengths))

    mesh = parallel.make_mesh(shape=(8,), axis_names=('seq',))
    padded, true_frames = parallel.pad_frames_for_context(
        jnp.asarray(feats), config, 8)
    out = parallel.context_parallel_chunked_forward(
        params, padded, lengths, config, mesh, axis='seq',
        true_frames=true_frames)
    out = np.asarray(out)[..., :T]

    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_context_parallel_composes_with_data_parallel():
    """2D DP x CP mesh: batch and sequence sharded simultaneously."""
    config = ppgs_tpu.Config(
        num_hidden_layers=1, hidden_channels=32, attention_heads=2,
        ffn_channels=64, max_len=64, chunk_length=48, chunk_overlap=8,
        compute_dtype='float32')
    stride = config.chunk_length - 2 * config.chunk_overlap

    params = transformer.init(jax.random.PRNGKey(1), config)
    rng = np.random.default_rng(1)
    T = 4 * stride
    feats = rng.standard_normal((4, config.input_channels, T)) \
        .astype(np.float32)
    lengths = jnp.full((4,), T, jnp.int32)

    ref = np.asarray(jax.jit(functools.partial(
        transformer.chunked_forward, config=config))(
            params, jnp.asarray(feats), lengths))

    mesh = parallel.make_mesh(shape=(2, 4), axis_names=('data', 'seq'))
    out = np.asarray(parallel.context_parallel_chunked_forward(
        params, jnp.asarray(feats), lengths, config, mesh, axis='seq',
        batch_axis='data'))

    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_w2v2fb_frontend_tensor_parallel(monkeypatch):
    """TP reaches frontend INFERENCE end-to-end via config alone
    (round-3 verdict #4): a >1 'model' axis on the config mesh shards the
    frontend params inside preprocess.w2v2fb.from_audios itself."""
    from ppgs_tpu.preprocess import w2v2fb

    params = w2v2.init(jax.random.PRNGKey(3), TINY_W2V2)
    monkeypatch.setattr(w2v2fb, '_params', lambda: params)
    monkeypatch.setattr(w2v2, 'BASE', TINY_W2V2)

    rng = np.random.default_rng(3)
    audio = (0.1 * rng.standard_normal((4, 1, 4800))).astype(np.float32)
    lengths = np.array([4800, 4800, 3200, 1600])

    base = ppgs_tpu.Config(compute_dtype='float32')
    ref = np.asarray(w2v2fb.from_audios(
        jnp.asarray(audio), lengths,
        config=base.replace(mesh_shape=(1,), mesh_axis_names=('data',))))

    tp_config = base.replace(
        mesh_shape=(1, 4), mesh_axis_names=('data', 'model'))
    out = np.asarray(w2v2fb.from_audios(
        jnp.asarray(audio), lengths, config=tp_config))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # The cached placement really sharded the params over 'model'
    sharded, _ = parallel.frontend_tp_placement(
        params, tp_config, rule=parallel.w2v2_param_sharding)
    spec = sharded['encoder']['layers'][0]['attn']['wq'].sharding.spec
    assert 'model' in str(spec)

    # DPxTP: data axis >1 shards the batch too, same numerics
    dp_tp = base.replace(
        mesh_shape=(2, 4), mesh_axis_names=('data', 'model'))
    out2 = np.asarray(w2v2fb.from_audios(
        jnp.asarray(audio), lengths, config=dp_tp))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-6)


def test_bottleneck_frontend_tensor_parallel(monkeypatch):
    """Conformer frontend TP via config: conformer_param_sharding over a
    4-way 'model' axis reproduces single-device numerics."""
    from ppgs_tpu.models import conformer as conformer_mod
    from ppgs_tpu.preprocess import bottleneck

    tiny = conformer_mod.ConformerConfig(num_blocks=2)
    params = conformer_mod.init(jax.random.PRNGKey(5), tiny)
    monkeypatch.setattr(bottleneck, '_params', lambda: params)
    monkeypatch.setattr(bottleneck.conformer, 'BOTTLENECK', tiny)

    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal((2, 1, 4800))).astype(np.float32)
    lengths = np.array([4800, 3200])

    base = ppgs_tpu.Config(compute_dtype='float32')
    ref = np.asarray(bottleneck.from_audios(
        jnp.asarray(audio), lengths,
        config=base.replace(mesh_shape=(1,), mesh_axis_names=('data',))))

    tp_config = base.replace(
        mesh_shape=(1, 4), mesh_axis_names=('data', 'model'))
    out = np.asarray(bottleneck.from_audios(
        jnp.asarray(audio), lengths, config=tp_config))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    sharded, _ = parallel.frontend_tp_placement(
        params, tp_config, rule=parallel.conformer_param_sharding)
    assert 'model' in str(
        sharded['blocks'][0]['attn']['q']['weight'].sharding.spec)
