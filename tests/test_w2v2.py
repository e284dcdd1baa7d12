"""Golden parity: our JAX wav2vec2 vs transformers.Wav2Vec2Model (random
weights, CPU torch) — the weight-conversion contract for w2v2fb."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ppgs_tpu.convert.w2v2_weights import w2v2_params_from_state_dict
from ppgs_tpu.models import w2v2


@pytest.fixture(scope='module')
def torch_model():
    import transformers

    torch.manual_seed(0)
    # Small config, same topology knobs as facebook/wav2vec2-base
    config = transformers.Wav2Vec2Config(
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=96,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_feat_extract_layers=3,
        do_stable_layer_norm=False,
        feat_extract_norm='group',
        conv_bias=False,
    )
    model = transformers.Wav2Vec2Model(config).eval()
    jcfg = w2v2.W2V2Config(
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        intermediate_size=96,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = w2v2_params_from_state_dict(sd, num_feat_layers=3, num_layers=2)
    return model, params, jcfg


def test_feature_encoder_matches(torch_model):
    model, params, jcfg = torch_model
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 800)).astype(np.float32)

    with torch.no_grad():
        ref = model.feature_extractor(
            torch.from_numpy(audio)).transpose(1, 2).numpy()
    ours = np.asarray(w2v2.feature_encoder(
        params, jnp.asarray(audio), jcfg, precision='highest'))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_forward_matches(torch_model):
    model, params, jcfg = torch_model
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(audio)).last_hidden_state.numpy()
    ours = np.asarray(w2v2.forward(
        params, jnp.asarray(audio), config=jcfg, precision='highest'))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_forward_with_attention_mask_matches(torch_model):
    model, params, jcfg = torch_model
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((2, 1600)).astype(np.float32)
    lengths = np.array([1600, 900])
    mask = (np.arange(1600)[None] < lengths[:, None]).astype(np.int64)
    audio = (audio * mask).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(audio),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state
        ref = ref.numpy()
    ours = np.asarray(w2v2.forward(
        params, jnp.asarray(audio), jnp.asarray(lengths), jcfg,
        precision='highest'))
    assert ours.shape == ref.shape
    # Compare valid frames only
    out_lengths = np.asarray(
        w2v2.feat_extract_output_lengths(lengths, jcfg))
    for b, l in enumerate(out_lengths):
        np.testing.assert_allclose(ours[b, :l], ref[b, :l], rtol=1e-3,
                                   atol=1e-4)


def test_output_lengths_match_transformers(torch_model):
    model, params, jcfg = torch_model
    lengths = np.array([800, 1600, 999])
    ref = model._get_feat_extract_output_lengths(
        torch.from_numpy(lengths)).numpy()
    ours = np.asarray(w2v2.feat_extract_output_lengths(lengths, jcfg))
    np.testing.assert_array_equal(ours, ref)


def test_final_stride_variant():
    """stride 2 -> 1 on the last conv doubles the frame rate
    (reference ppgs/model/w2v2.py:26)."""
    cfg = w2v2.W2V2Config(
        conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), hidden_size=48, num_layers=1, num_heads=4,
        intermediate_size=96, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    cfg100 = cfg.with_final_stride(1)
    assert cfg100.conv_stride == (5, 2, 1)
    l50 = int(w2v2.feat_extract_output_lengths(np.array([1600]), cfg)[0])
    l100 = int(w2v2.feat_extract_output_lengths(np.array([1600]), cfg100)[0])
    assert l100 > 2 * l50 - 4


def test_w2v2_bf16_close_to_fp32():
    """The production bf16 frontend path stays within the fp16-cache noise
    envelope of the strict fp32 path (stats/accumulations are fp32)."""
    import dataclasses

    import jax

    from ppgs_tpu.models import w2v2

    params = w2v2.init(jax.random.PRNGKey(0), dataclasses.replace(
        w2v2.BASE, conv_dim=(64,) * 7, hidden_size=128, num_layers=2,
        num_heads=2, intermediate_size=256))
    small32 = dataclasses.replace(
        w2v2.BASE, conv_dim=(64,) * 7, hidden_size=128, num_layers=2,
        num_heads=2, intermediate_size=256, compute_dtype='float32')
    small16 = dataclasses.replace(small32, compute_dtype='bfloat16')

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32) * 0.1
    lengths = jnp.asarray([8000, 6400])

    h32 = np.asarray(w2v2.forward(params, audio, lengths, small32))
    h16 = np.asarray(w2v2.forward(params, audio, lengths, small16))
    assert h32.shape == h16.shape
    scale = np.abs(h32).mean()
    assert np.abs(h32 - h16).mean() < 0.05 * scale


def test_encoder_layers_via_stack_kernel(monkeypatch):
    """w2v2 encoder layers through the whole-layer Pallas kernel
    (activation='gelu', 64-wide heads) match the XLA bf16 path."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from ppgs_tpu.models import w2v2 as w2v2_mod
    from ppgs_tpu.ops import encoder_layer_kernel as elk

    config = dataclasses.replace(
        w2v2_mod.W2V2Config(
            conv_dim=(32, 32), conv_kernel=(10, 3), conv_stride=(5, 2),
            hidden_size=256, num_layers=2, num_heads=4,
            intermediate_size=512, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4),
        compute_dtype='bfloat16')
    params = w2v2_mod.init(jax.random.PRNGKey(7), config)
    rng = np.random.default_rng(7)
    hidden = (0.5 * rng.standard_normal((2, 52, 256))).astype(np.float32)
    mask = np.ones((2, 52), bool)
    mask[1, 40:] = False

    ref = np.asarray(w2v2_mod.encoder(
        params, jnp.asarray(hidden), jnp.asarray(mask), config))

    orig = elk.encoder_stack
    orig_streamed = elk.encoder_stack_streamed
    monkeypatch.setattr(
        elk, 'encoder_stack',
        functools.partial(
            lambda *a, **k: orig(*a, **{**k, 'interpret': True})))
    monkeypatch.setattr(
        elk, 'encoder_stack_streamed',
        functools.partial(
            lambda *a, **k: orig_streamed(*a, **{**k, 'interpret': True})))
    monkeypatch.setattr(w2v2_mod, '_use_flash', lambda d, h, t: True)
    got = np.asarray(w2v2_mod.encoder(
        params, jnp.asarray(hidden), jnp.asarray(mask), config))

    assert got.shape == ref.shape
    valid = np.asarray(mask)
    np.testing.assert_allclose(got[valid], ref[valid],
                               rtol=5e-2, atol=5e-2)

    # The per-layer (non-streamed) variant stays reachable via its env gate
    monkeypatch.setenv('PPGS_TPU_W2V2_STREAMED', '0')
    got2 = np.asarray(w2v2_mod.encoder(
        params, jnp.asarray(hidden), jnp.asarray(mask), config))
    np.testing.assert_allclose(got2[valid], ref[valid],
                               rtol=5e-2, atol=5e-2)
