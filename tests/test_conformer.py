"""Golden parity: our JAX conformer vs the reference's vendored ESPnet
ConformerEncoder, imported read-only from /root/reference as a torch oracle
(random weights — the checkpoint-conversion contract)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ppgs_tpu.convert.conformer_weights import (
    conformer_params_from_state_dict)
from ppgs_tpu.models import conformer

REFERENCE_PKG = '/root/reference/ppgs/preprocess/bottleneck'


@pytest.fixture(scope='module')
def oracle():
    return make_oracle()


def make_oracle():
    """Reference ConformerEncoder (4 blocks, d=144) with random weights
    (plain function so test_structural_goldens can reuse the torch chain)."""
    import importlib.util
    import types

    # Load the vendored encoder subpackage WITHOUT executing the package
    # __init__ (which needs torch_complex/librosa). subsampling.py imports
    # espnet's PositionalEncoding; stub it from the vendored embedding.py.
    root = f'{REFERENCE_PKG}/conformer_ppg_model'
    pkg = types.ModuleType('conformer_ppg_model')
    pkg.__path__ = [root]
    sys.modules['conformer_ppg_model'] = pkg
    enc_pkg = types.ModuleType('conformer_ppg_model.encoder')
    enc_pkg.__path__ = [f'{root}/encoder']
    sys.modules['conformer_ppg_model.encoder'] = enc_pkg

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
        return module

    embedding = load('conformer_ppg_model.encoder.embedding',
                     f'{root}/encoder/embedding.py')

    # Stub the espnet import inside subsampling.py
    espnet = types.ModuleType('espnet')
    sys.modules['espnet'] = espnet
    for mod_name in ['espnet.nets', 'espnet.nets.pytorch_backend',
                     'espnet.nets.pytorch_backend.transformer']:
        sys.modules[mod_name] = types.ModuleType(mod_name)
    stub = types.ModuleType(
        'espnet.nets.pytorch_backend.transformer.embedding')
    stub.PositionalEncoding = embedding.PositionalEncoding
    sys.modules['espnet.nets.pytorch_backend.transformer.embedding'] = stub

    load('conformer_ppg_model.nets_utils', f'{root}/nets_utils.py')
    for name in ['attention', 'convolution', 'encoder_layer', 'layer_norm',
                 'multi_layer_conv', 'positionwise_feed_forward', 'repeat',
                 'subsampling', 'swish', 'vgg']:
        load(f'conformer_ppg_model.encoder.{name}',
             f'{root}/encoder/{name}.py')
    conformer_encoder = load(
        'conformer_ppg_model.encoder.conformer_encoder',
        f'{root}/encoder/conformer_encoder.py')
    ConformerEncoder = conformer_encoder.ConformerEncoder

    torch.manual_seed(0)
    num_blocks = 4
    encoder = ConformerEncoder(
        input_size=80,
        attention_dim=144,
        attention_heads=4,
        linear_units=576,
        num_blocks=num_blocks,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
        input_layer='conv2d',
        normalize_before=True,
        concat_after=False,
        positionwise_layer_type='linear',
        macaron_style=True,
        pos_enc_layer_type='rel_pos',
        selfattention_layer_type='rel_selfattn',
        activation_type='swish',
        use_cnn_module=True,
        cnn_module_kernel=15,
        no_subsample=True,
        subsample_by_2=False,
    ).eval()

    sd = {k: v.detach().numpy() for k, v in encoder.state_dict().items()}
    params = conformer_params_from_state_dict(sd, num_blocks=num_blocks)
    config = conformer.ConformerConfig(num_blocks=num_blocks)
    return encoder, params, config


def test_embed_matches(oracle):
    encoder, params, config = oracle
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 50, 80)).astype(np.float32)

    with torch.no_grad():
        (ref_x, ref_pos), _ = encoder.embed(torch.from_numpy(feats), None)
    ours_x, ours_pos = conformer.embed(
        params, jnp.asarray(feats), config, precision='highest')

    # torch's fp32 sin at args ~5000 differs from numpy's by ~1 ulp of the
    # argument (~5e-4); harmless downstream (see full-forward tolerance)
    np.testing.assert_allclose(np.asarray(ours_pos), ref_pos.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_x), ref_x.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_full_forward_matches(oracle):
    encoder, params, config = oracle
    rng = np.random.default_rng(1)
    T = 70
    feats = rng.standard_normal((2, T, 80)).astype(np.float32)
    lengths = np.array([T, 45])
    for i, l in enumerate(lengths):
        feats[i, l:] = 0

    with torch.no_grad():
        masks = (torch.arange(T)[None] <
                 torch.from_numpy(lengths)[:, None]).unsqueeze(1)
        ref, _, _ = encoder(torch.from_numpy(feats),
                            torch.from_numpy(lengths))
    ref = ref.numpy()

    ours = np.asarray(conformer.forward(
        params, jnp.asarray(feats), jnp.asarray(lengths), config,
        precision='highest'))

    assert ours.shape == ref.shape
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(ours[b, :l], ref[b, :l],
                                   rtol=2e-3, atol=2e-3)


def test_fused_rel_attention_matches_xla(oracle):
    """Pallas fused bias-attention path (interpret) vs the XLA rel-pos
    attention at fp32 reference tolerance (bf16 operands both ways)."""
    import jax
    import os

    _, params, config = oracle
    block = params['blocks'][0]
    rng = np.random.default_rng(11)
    B, T = 2, 64
    x = jnp.asarray(rng.standard_normal((B, T, config.dim)), jnp.float32)
    lengths = np.array([T, 40])
    mask = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    pos_emb = jnp.asarray(conformer._rel_pos_table(T, config.dim))[None]

    # fp32 strict reference
    ref = np.asarray(conformer._rel_attention(
        x, pos_emb, block['attn'], mask, config.heads, jnp.float32,
        jax.lax.Precision('highest')))

    # Kernel path (interpret; bf16 operands)
    got = np.asarray(conformer._rel_attention(
        x, pos_emb, block['attn'], mask, config.heads, jnp.bfloat16,
        None, interpret=True), np.float32)

    # XLA bf16 path for comparison (kernel disabled)
    os.environ['PPGS_TPU_CONFORMER_KERNEL'] = '0'
    try:
        xla_bf16 = np.asarray(conformer._rel_attention(
            x, pos_emb, block['attn'], mask, config.heads, jnp.bfloat16,
            None), np.float32)
    finally:
        del os.environ['PPGS_TPU_CONFORMER_KERNEL']

    scale = np.abs(ref).max()
    valid = np.asarray(mask)
    # Kernel at least as close to fp32 truth as the XLA bf16 path
    err_kernel = np.abs(got - ref)[valid].max() / scale
    err_xla = np.abs(xla_bf16 - ref)[valid].max() / scale
    assert err_kernel <= max(err_xla * 1.5, 0.02), (err_kernel, err_xla)


def test_rel_shift_matches_reference_formula():
    """Legacy rel_shift equivalence on random data."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)

    xt = torch.from_numpy(x)
    zero_pad = torch.zeros((1, 2, 5, 1))
    x_padded = torch.cat([zero_pad, xt], dim=-1)
    x_padded = x_padded.view(1, 2, 6, 5)
    ref = x_padded[:, :, 1:].reshape(1, 2, 5, 5).numpy()

    ours = np.asarray(conformer._rel_shift(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=0)
