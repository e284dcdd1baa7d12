"""Parity for the wav2vec2-based PPG models (W2V2 end-to-end, W2V2FC) vs a
torch reconstruction of the reference architecture with random weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu.convert.w2v2_weights import w2v2_params_from_state_dict
from ppgs_tpu.models import w2v2, w2v2_ppg


SMALL = dict(
    conv_dim=(32, 32, 32),
    conv_kernel=(10, 3, 2),
    conv_stride=(5, 2, 2),
    hidden_size=48,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    num_feat_extract_layers=3,
    do_stable_layer_norm=False,
    feat_extract_norm='group',
    conv_bias=False,
)


@pytest.fixture(scope='module')
def small():
    import transformers

    torch.manual_seed(0)
    config = transformers.Wav2Vec2Config(
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=96,
        **SMALL)
    model = transformers.Wav2Vec2Model(config).eval()
    # Reference W2V2: final conv stride -> 1 (ppgs/model/w2v2.py:26)
    model.feature_extractor.conv_layers[-1].conv.stride = (1,)

    jcfg = w2v2.W2V2Config(
        conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 1), hidden_size=48, num_layers=2, num_heads=4,
        intermediate_size=96, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    trunk = w2v2_params_from_state_dict(sd, num_feat_layers=3, num_layers=2)
    return model, trunk, jcfg


def test_w2v2_model_matches_reference_architecture(small, monkeypatch):
    model, trunk, jcfg = small
    torch.manual_seed(1)
    head = torch.nn.Conv1d(48, 40, 5, padding=2).eval()

    rng = np.random.default_rng(0)
    S = 3200
    audio = (0.1 * rng.standard_normal((2, 1, S))).astype(np.float32)
    lengths = np.array([S, 2000])
    for i, l in enumerate(lengths):
        audio[i, :, l:] = 0

    # Torch reference forward (ppgs/model/w2v2.py:41-55)
    pad = w2v2_ppg.PADDING
    padded = torch.nn.functional.pad(
        torch.from_numpy(audio), (pad, pad)).squeeze(1)
    T_pad = padded.shape[-1]
    mask = ((torch.arange(T_pad)[None] - 2 * pad)
            < torch.from_numpy(lengths)[:, None]).long()
    with torch.no_grad():
        latent = model(padded, mask).last_hidden_state.transpose(1, 2)
        ref = head(latent).numpy()

    # Ours: same trunk + converted head, small architecture monkeypatched in
    params = {
        'w2v2': trunk,
        'head': {
            'weight': np.transpose(head.weight.detach().numpy(), (2, 1, 0)),
            'bias': head.bias.detach().numpy(),
        },
    }
    monkeypatch.setattr(w2v2_ppg, 'w2v2_100hz_config', lambda *a, **k: jcfg)
    config = ppgs_tpu.Config(model='Wav2Vec2.0', compute_dtype='float32')
    ours = np.asarray(w2v2_ppg.forward(
        params, jnp.asarray(audio), jnp.asarray(lengths), config,
        precision='highest'))

    assert ours.shape == ref.shape
    # Compare frames valid for both elements
    out_lengths = np.asarray(w2v2.feat_extract_output_lengths(
        lengths + 2 * pad, jcfg))
    for b, l in enumerate(out_lengths):
        np.testing.assert_allclose(ours[b, :, :l], ref[b, :, :l],
                                   rtol=1e-3, atol=1e-4)


def test_w2v2fc_permutation(small, monkeypatch):
    """FC head output drops last 2 tokens and permutes via CHARSIU_PERMUTE."""
    model, trunk, jcfg = small
    rng = np.random.default_rng(1)
    head_w = rng.standard_normal((48, 42)).astype(np.float32)
    head_b = rng.standard_normal(42).astype(np.float32)
    params = {'w2v2': trunk,
              'head': {'weight': head_w, 'bias': head_b}}

    S = 1600
    audio = (0.1 * rng.standard_normal((1, 1, S))).astype(np.float32)
    lengths = np.array([S])

    monkeypatch.setattr(w2v2_ppg, 'w2v2_100hz_config', lambda *a, **k: jcfg)
    config = ppgs_tpu.Config(model='W2V2FC', compute_dtype='float32')
    out = np.asarray(w2v2_ppg.fc_forward(
        params, jnp.asarray(audio), jnp.asarray(lengths), config,
        precision='highest'))
    assert out.shape[1] == 40

    # Manual check: raw logits -> [:-2] -> permute
    pad = w2v2_ppg.PADDING
    padded = jnp.pad(jnp.asarray(audio), ((0, 0), (0, 0), (pad, pad)))
    hidden = np.asarray(w2v2.forward(
        trunk, padded.squeeze(1), jnp.asarray(lengths + 2 * pad), jcfg,
        precision='highest'))
    raw = hidden @ head_w + head_b
    expected = raw[..., :-2][..., ppgs_tpu.CHARSIU_PERMUTE].transpose(0, 2, 1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


###############################################################################
# Train-mode semantics (reference: HF model in .train() with
# freeze_feature_extractor(), ppgs/model/w2v2.py:29)
###############################################################################


def _tiny_train_setup(small, monkeypatch):
    import jax

    _, trunk, jcfg = small
    monkeypatch.setattr(w2v2_ppg, 'w2v2_100hz_config', lambda *a, **k: jcfg)
    config = ppgs_tpu.Config(model='Wav2Vec2.0', compute_dtype='float32')
    head = w2v2_ppg._conv_init(jax.random.PRNGKey(9), config.kernel_size,
                               jcfg.hidden_size, config.output_channels)
    params = {'w2v2': trunk, 'head': head}
    rng = np.random.default_rng(3)
    S = 3200
    audio = (0.1 * rng.standard_normal((2, 1, S))).astype(np.float32)
    lengths = jnp.asarray([S, 2400])
    return config, params, jnp.asarray(audio), lengths


def test_w2v2_feature_extractor_frozen(small, monkeypatch):
    """Gradients of the train loss wrt the conv feature extractor are
    EXACTLY zero (freeze_feature_extractor parity), while encoder and head
    gradients are nonzero."""
    import jax

    from ppgs_tpu.train import core as train_core

    config, params, audio, lengths = _tiny_train_setup(small, monkeypatch)

    T_out = w2v2_ppg.forward(params, audio, lengths, config).shape[-1]
    targets = jnp.asarray(
        np.random.default_rng(0).integers(0, 40, (2, T_out)))

    def loss_fn(p):
        logits = w2v2_ppg.forward(p, audio, lengths, config, train=True,
                                  rng=jax.random.PRNGKey(0))
        return train_core.loss(logits, targets, config)

    grads = jax.grad(loss_fn)(params)
    for layer in grads['w2v2']['feature_encoder']:
        for leaf in jax.tree.leaves(layer):
            assert float(jnp.abs(leaf).max()) == 0.0
    enc_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(
        grads['w2v2']['encoder']))
    head_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(
        grads['head']))
    assert enc_norm > 0 and head_norm > 0


def test_w2v2_train_mode_stochastic_and_eval_deterministic(
        small, monkeypatch):
    """train=True with different rngs changes outputs (dropout/spec-augment
    /LayerDrop active); train=False ignores the rng entirely."""
    import jax

    config, params, audio, lengths = _tiny_train_setup(small, monkeypatch)

    t1 = w2v2_ppg.forward(params, audio, lengths, config, train=True,
                          rng=jax.random.PRNGKey(0))
    t2 = w2v2_ppg.forward(params, audio, lengths, config, train=True,
                          rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))

    e1 = w2v2_ppg.forward(params, audio, lengths, config)
    e2 = w2v2_ppg.forward(params, audio, lengths, config, train=True,
                          rng=None)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_w2v2_train_zero_rates_matches_eval(small, monkeypatch):
    """With every regularizer disabled, the train path reproduces the eval
    path exactly (the train graph adds no numerics of its own)."""
    import dataclasses

    import jax

    _, trunk, jcfg = small
    jcfg0 = dataclasses.replace(
        jcfg, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False)
    monkeypatch.setattr(w2v2_ppg, 'w2v2_100hz_config', lambda *a, **k: jcfg0)
    config = ppgs_tpu.Config(model='Wav2Vec2.0', compute_dtype='float32')
    head = w2v2_ppg._conv_init(jax.random.PRNGKey(9), config.kernel_size,
                               jcfg.hidden_size, config.output_channels)
    params = {'w2v2': trunk, 'head': head}
    audio = jnp.asarray(
        (0.1 * np.random.default_rng(4).standard_normal(
            (1, 1, 1600))).astype(np.float32))
    lengths = jnp.asarray([1600])

    train_out = w2v2_ppg.forward(params, audio, lengths, config,
                                 train=True, rng=jax.random.PRNGKey(0))
    eval_out = w2v2_ppg.forward(params, audio, lengths, config)
    np.testing.assert_allclose(np.asarray(train_out), np.asarray(eval_out),
                               rtol=1e-6, atol=1e-6)


def test_w2v2_spec_augment_masks_spans(small, monkeypatch):
    """Spec-augment replaces masked frames with the learned embed vector:
    force prob high and check some (but not all) frames change."""
    import dataclasses

    import jax

    _, trunk, jcfg = small
    jcfg_sa = dataclasses.replace(
        jcfg, hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=True, mask_time_prob=0.5, mask_time_length=4,
        mask_time_min_masks=2)

    rng = np.random.default_rng(5)
    hidden = jnp.asarray(rng.standard_normal((2, 40, 48)).astype(np.float32))
    embed = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    masked = w2v2._spec_augment(
        hidden, None, jax.random.PRNGKey(0), embed, jcfg_sa)
    is_embed = np.all(np.isclose(np.asarray(masked), np.asarray(embed)),
                      axis=-1)
    changed = is_embed.sum()
    assert 0 < changed < is_embed.size
    # Unmasked frames untouched
    untouched = ~is_embed
    np.testing.assert_array_equal(
        np.asarray(masked)[untouched], np.asarray(hidden)[untouched])


def test_factory_dispatch():
    from ppgs_tpu import models

    for name in ['transformer', 'convolution', 'Wav2Vec2.0', 'W2V2FC']:
        config = ppgs_tpu.Config(model=name)
        init_fn, forward_fn = models.get(config)
        assert callable(init_fn) and callable(forward_fn)
    with pytest.raises(ValueError):
        models.get(ppgs_tpu.Config(model='nope'))


def test_load_model_w2v2fc_pretrained(tmp_path, monkeypatch):
    """load.model under the w2v2fc-pretrained config resolves the Charsiu
    weights with no trained PPG checkpoint (reference ppgs/load.py:54-56),
    and points at the converter when they're absent."""
    import jax

    from ppgs_tpu import load as load_mod
    from ppgs_tpu.preprocess import w2v2fc as w2v2fc_mod

    config = ppgs_tpu.config.REGISTRY['w2v2fc-pretrained']
    assert config.model == 'W2V2FC'

    missing = tmp_path / 'nope.npz'
    monkeypatch.setattr(w2v2fc_mod, 'W2V2FC_CHECKPOINT', missing)
    with pytest.raises(FileNotFoundError, match='convert_w2v2'):
        load_mod.model(config=config)

    # With (synthetic) converted weights present, loading succeeds and
    # returns the fc param structure
    from ppgs_tpu.models import w2v2_ppg

    params = w2v2_ppg.fc_init(jax.random.PRNGKey(0), config)
    path = tmp_path / 'charsiu.npz'
    load_mod.save_params(path, params)
    monkeypatch.setattr(w2v2fc_mod, 'W2V2FC_CHECKPOINT', path)
    loaded, out_config = load_mod.model(config=config)
    assert 'w2v2' in loaded and 'head' in loaded
    assert out_config.model == 'W2V2FC'
