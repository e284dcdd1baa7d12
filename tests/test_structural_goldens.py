"""Full-pipeline STRUCTURAL parity for the w2v2fb and bottleneck pipelines
(round-4 verdict #4).

Two layers of protection, neither needing network access:

1. Composed torch-chain tests: the complete reference pipeline (HF
   wav2vec2 / vendored ESPnet conformer with random weights -> nearest
   upsample -> PPG transformer head -> softmax) rebuilt in torch and
   compared against our ``from_audio`` end to end — the composition
   (padding, masks, interpolation, head) is verified, not just each stage.
2. Recorded structural goldens under ``assets/goldens/structural``:
   deterministic seed-derived weights + a stored input reproduce the
   stored PPG forever (regression net across refactors). Files are
   recorded on first run and committed; afterwards the test verifies.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import config as config_mod
from ppgs_tpu import core as core_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.convert import transformer_params_from_state_dict
from ppgs_tpu.convert.w2v2_weights import w2v2_params_from_state_dict
from ppgs_tpu.models import transformer, w2v2
from ppgs_tpu.preprocess import bottleneck as bottleneck_mod
from ppgs_tpu.preprocess import w2v2fb as w2v2fb_mod

sys.path.insert(0, str(Path(__file__).parent))

STRUCTURAL_DIR = config_mod.ASSETS_DIR / 'goldens' / 'structural'


###############################################################################
# w2v2fb: HF trunk -> x2 nearest upsample -> PPG head
###############################################################################


SMALL_HF = dict(
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
def w2v2fb_small():
    """Small HF Wav2Vec2Model (50 Hz trunk, stride unmodified — the w2v2fb
    FRONTEND uses the stock model, reference w2v2fb/core.py:44-47)."""
    import transformers

    torch.manual_seed(7)
    hf_config = transformers.Wav2Vec2Config(
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=96,
        **SMALL_HF)
    model = transformers.Wav2Vec2Model(hf_config).eval()
    jcfg = w2v2.W2V2Config(
        conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), hidden_size=48, num_layers=2, num_heads=4,
        intermediate_size=96, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    trunk = w2v2_params_from_state_dict(sd, num_feat_layers=3, num_layers=2)
    return model, trunk, jcfg


def _head_pair(inp, seed):
    """(torch head, converted npz params) for the PPG transformer head."""
    from test_transformer_parity import TorchTransformer

    torch.manual_seed(seed)
    tm = TorchTransformer(layers=2, hidden=64, inp=inp, out=40).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = transformer_params_from_state_dict(sd, num_layers=2)
    return tm, params


def test_w2v2fb_full_pipeline_matches_torch_chain(
        w2v2fb_small, tmp_path, monkeypatch):
    """Composed reference chain (ppgs/preprocess/w2v2fb/core.py:32-115 +
    ppgs/core.py:22-128): HF trunk -> last_hidden_state -> nearest x2 ->
    transformer head -> softmax, vs our from_audio(representation='w2v2fb')."""
    model, trunk, jcfg = w2v2fb_small
    tm, head_params = _head_pair(inp=jcfg.hidden_size, seed=8)
    ckpt = tmp_path / 'head.npz'
    load_mod.save_params(ckpt, head_params)

    rng = np.random.default_rng(20)
    S = 15360                                        # 0.96 s -> 96 frames
    audio = (0.1 * rng.standard_normal((1, 1, S))).astype(np.float32)
    out_frames = S // 160

    # --- torch chain ---
    pad = w2v2fb_mod.PAD
    padded = torch.nn.functional.pad(
        torch.from_numpy(audio), (pad, pad)).squeeze(1)
    mask = (torch.arange(S + 2 * pad)[None]
            < torch.tensor([S + 2 * pad])[:, None]).long()
    with torch.no_grad():
        latent = model(padded, mask).last_hidden_state    # (1, T50, 48)
        latent = latent.transpose(1, 2)
        up = torch.nn.functional.interpolate(
            latent, size=out_frames, mode='nearest')      # (1, 48, 96)
        logits = tm(up, torch.tensor([out_frames]))
        ref = torch.softmax(logits, dim=1).numpy()

    # --- ours, end to end ---
    monkeypatch.setattr(w2v2fb_mod, '_params', lambda: trunk)
    monkeypatch.setattr(w2v2fb_mod.w2v2, 'BASE', jcfg)
    config = ppgs_tpu.Config(
        config='w2v2fb-structural', representation='w2v2fb',
        input_channels=48, hidden_channels=64, num_hidden_layers=2,
        compute_dtype='float32')
    core_mod._MODEL_CACHE.clear()
    ours = np.asarray(core_mod.from_audio(
        audio, 16000, checkpoint=ckpt, config=config))

    assert ours.shape == ref.shape == (1, 40, out_frames)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_bottleneck_full_pipeline_matches_torch_chain(
        tmp_path, monkeypatch):
    """Composed reference chain: STFT/logmel/MVN + vendored ESPnet
    ConformerEncoder -> 144-d latents -> transformer head -> softmax, vs
    our from_audio(representation='bottleneck')."""
    from test_bottleneck import torch_reference_feats, torch_reference_mvn
    from test_conformer import make_oracle

    encoder, conf_params, conf_config = make_oracle()
    tm, head_params = _head_pair(inp=144, seed=9)
    ckpt = tmp_path / 'head.npz'
    load_mod.save_params(ckpt, head_params)

    rng = np.random.default_rng(21)
    S = 8000                                         # 0.5 s -> 50 frames
    audio = (0.1 * rng.standard_normal((1, 1, S))).astype(np.float32)

    # --- torch chain (reference bottleneck/core.py:28-114) ---
    pad = bottleneck_mod.PAD
    padded = np.pad(audio, ((0, 0), (0, 0), (pad, pad))).squeeze(1)
    lengths = np.array([S + 2 * pad])
    feats, olens = torch_reference_feats(padded, lengths)
    feats = torch_reference_mvn(feats, olens)
    with torch.no_grad():
        latents, _, _ = encoder(torch.from_numpy(feats),
                                torch.from_numpy(olens))
        latents = latents.transpose(1, 2)            # (1, 144, T)
        logits = tm(latents, torch.tensor([latents.shape[-1]]))
        ref = torch.softmax(logits, dim=1).numpy()

    # --- ours, end to end ---
    monkeypatch.setattr(bottleneck_mod, '_params', lambda: conf_params)
    monkeypatch.setattr(bottleneck_mod.conformer, 'BOTTLENECK', conf_config)
    config = ppgs_tpu.Config(
        config='bottleneck-structural', representation='bottleneck',
        input_channels=144, hidden_channels=64, num_hidden_layers=2,
        compute_dtype='float32')
    core_mod._MODEL_CACHE.clear()
    ours = np.asarray(core_mod.from_audio(
        audio, 16000, checkpoint=ckpt, config=config))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


###############################################################################
# Recorded structural goldens (seed-derived weights, stored input/output)
###############################################################################


def _w2v2fb_structural_setup(monkeypatch, tmp_path):
    jcfg = w2v2.W2V2Config(
        conv_dim=(32, 32, 32), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), hidden_size=48, num_layers=2, num_heads=4,
        intermediate_size=96, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    trunk = w2v2.init(jax.random.PRNGKey(11), jcfg)
    config = ppgs_tpu.Config(
        config='w2v2fb-structural-golden', representation='w2v2fb',
        input_channels=48, hidden_channels=64, num_hidden_layers=2,
        compute_dtype='float32')
    head = transformer.init(jax.random.PRNGKey(12), config)
    monkeypatch.setattr(w2v2fb_mod, '_params', lambda: trunk)
    monkeypatch.setattr(w2v2fb_mod.w2v2, 'BASE', jcfg)
    ckpt = tmp_path / 'w2v2fb-head.npz'
    load_mod.save_params(ckpt, head)
    return config, ckpt, 9600


def _bottleneck_structural_setup(monkeypatch, tmp_path):
    from ppgs_tpu.models import conformer as conformer_mod

    conf_config = conformer_mod.ConformerConfig(num_blocks=2)
    conf_params = conformer_mod.init(jax.random.PRNGKey(13), conf_config)
    config = ppgs_tpu.Config(
        config='bottleneck-structural-golden', representation='bottleneck',
        input_channels=144, hidden_channels=64, num_hidden_layers=2,
        compute_dtype='float32')
    head = transformer.init(jax.random.PRNGKey(14), config)
    monkeypatch.setattr(bottleneck_mod, '_params', lambda: conf_params)
    monkeypatch.setattr(bottleneck_mod.conformer, 'BOTTLENECK', conf_config)
    ckpt = tmp_path / 'bottleneck-head.npz'
    load_mod.save_params(ckpt, head)
    return config, ckpt, 8000


@pytest.mark.parametrize('name', ['w2v2fb', 'bottleneck'])
def test_structural_golden(name, monkeypatch, tmp_path):
    """Seed-derived random-weight pipeline reproduces its recorded PPG.

    Records the golden on first run (commit the file); verifies forever
    after. Weights come from fixed jax PRNG seeds (threefry — stable by
    spec across platforms/versions), the input is stored in the npz.
    """
    setup = {'w2v2fb': _w2v2fb_structural_setup,
             'bottleneck': _bottleneck_structural_setup}[name]
    config, ckpt, samples = setup(monkeypatch, tmp_path)

    golden_path = STRUCTURAL_DIR / f'{name}-structural.npz'
    if golden_path.exists():
        data = np.load(golden_path)
        audio = data['audio']
    else:
        audio = (0.1 * np.random.default_rng(30).standard_normal(
            (1, 1, samples))).astype(np.float32)

    core_mod._MODEL_CACHE.clear()
    ppg = np.asarray(core_mod.from_audio(
        audio, 16000, checkpoint=ckpt, config=config))
    assert np.isfinite(ppg).all()
    np.testing.assert_allclose(ppg.sum(axis=1), 1.0, rtol=1e-4)

    if golden_path.exists():
        np.testing.assert_allclose(
            ppg, data['ppg'], rtol=1e-3, atol=1e-4,
            err_msg=f'structural golden drifted: {golden_path}')
    else:
        STRUCTURAL_DIR.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(golden_path, audio=audio,
                            ppg=ppg.astype(np.float32))
