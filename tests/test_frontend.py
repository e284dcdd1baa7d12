"""Codebook FRONTEND tests: dequantization of cached codec codes
(reference config/encodec.py:8-22, config/dac.py:18-30, consumed at
ppgs/train/core.py:115-119 and ppgs/core.py:105-115)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import frontend as frontend_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.models import transformer
from ppgs_tpu.train import core as train_core


Q, V, D = 4, 16, 8      # quantizer levels, vocab, embedding dim


@pytest.fixture
def codebooks():
    rng = np.random.default_rng(0)
    return rng.standard_normal((Q, V, D)).astype(np.float32)


def test_decode_codes_sum_matches_manual(codebooks):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, V, size=(2, Q, 10)).astype(np.int32)
    out = np.asarray(frontend_mod.decode_codes(codes, codebooks, 'sum'))
    assert out.shape == (2, D, 10)
    expected = np.zeros((2, D, 10), np.float32)
    for b in range(2):
        for t in range(10):
            for q in range(Q):
                expected[b, :, t] += codebooks[q, codes[b, q, t]]
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_decode_codes_concat_matches_manual(codebooks):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, V, size=(2, Q, 7)).astype(np.int32)
    out = np.asarray(frontend_mod.decode_codes(codes, codebooks, 'concat'))
    assert out.shape == (2, Q * D, 7)
    for b in range(2):
        for t in range(7):
            for q in range(Q):
                np.testing.assert_allclose(
                    out[b, q * D:(q + 1) * D, t],
                    codebooks[q, codes[b, q, t]], rtol=1e-6)


def test_decode_codes_single_utterance(codebooks):
    codes = np.zeros((Q, 5), np.int32)
    out = np.asarray(frontend_mod.decode_codes(codes, codebooks, 'sum'))
    assert out.shape == (D, 5)
    np.testing.assert_allclose(out[:, 0], codebooks[:, 0].sum(0), rtol=1e-6)


def test_make_frontend_unknown_name_errors():
    with pytest.raises(FileNotFoundError, match='convert_codebooks'):
        frontend_mod.make_frontend('nonexistent-codec')


def test_train_two_steps_with_codebook_frontend(codebooks):
    """Training under a codebook config consumes config.frontend: int codes
    in, finite decreasing loss out."""
    frontend_mod.register('synth-enc', codebooks, 'sum')
    try:
        config = ppgs_tpu.Config(
            config='synth-enc-test', frontend='synth-enc',
            representation='encodec', input_channels=D,
            num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
            max_len=64, chunk_length=64, chunk_overlap=8,
            compute_dtype='float32')
        params = transformer.init(jax.random.PRNGKey(0), config)
        optimizer = train_core.make_optimizer(config)
        opt_state = optimizer.init(params)
        step_fn = train_core.make_train_step(config, optimizer)

        rng = np.random.default_rng(3)
        codes = rng.integers(0, V, size=(2, Q, 64)).astype(np.int32)
        targets = rng.integers(0, 40, size=(2, 64)).astype(np.int64)
        lengths = np.array([64, 40], dtype=np.int64)
        targets[1, 40:] = -100

        losses = []
        key = jax.random.PRNGKey(1)
        for _ in range(8):
            key, step_key = jax.random.split(key)
            params, opt_state, train_loss, _ = step_fn(
                params, opt_state, jnp.asarray(codes), jnp.asarray(targets),
                jnp.asarray(lengths), step_key)
            losses.append(float(train_loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    finally:
        frontend_mod.unregister('synth-enc')


def test_infer_applies_codebook_frontend(codebooks, tmp_path):
    """from_features under a codebook config dequantizes int codes: output
    matches manual decode fed through the same model without a frontend."""
    frontend_mod.register('synth-enc2', codebooks, 'sum')
    try:
        config = ppgs_tpu.Config(
            config='synth-enc2-test', frontend='synth-enc2',
            representation='encodec', input_channels=D,
            num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
            max_len=64, chunk_length=64, chunk_overlap=8,
            compute_dtype='float32')
        params = transformer.init(jax.random.PRNGKey(0), config)
        ckpt = tmp_path / 'synth.npz'
        load_mod.save_params(ckpt, params)

        rng = np.random.default_rng(4)
        codes = rng.integers(0, V, size=(1, Q, 32)).astype(np.int32)
        lengths = np.array([32], dtype=np.int64)

        ppg = ppgs_tpu.from_features(
            codes, lengths, representation='encodec', checkpoint=ckpt,
            config=config)

        manual = frontend_mod.decode_codes(codes, codebooks, 'sum')
        no_frontend = config.replace(config='synth-plain', frontend=None,
                                     representation='mel')
        expected = ppgs_tpu.from_features(
            manual, lengths, representation='mel', checkpoint=ckpt,
            config=no_frontend)
        np.testing.assert_allclose(
            np.asarray(ppg), np.asarray(expected), rtol=1e-5, atol=1e-6)
    finally:
        frontend_mod.unregister('synth-enc2')


def test_eval_forward_applies_frontend(codebooks):
    frontend_mod.register('synth-enc3', codebooks, 'sum')
    try:
        config = ppgs_tpu.Config(
            config='synth-enc3-test', frontend='synth-enc3',
            representation='encodec', input_channels=D,
            num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
            max_len=64, chunk_length=64, chunk_overlap=8,
            compute_dtype='float32')
        params = transformer.init(jax.random.PRNGKey(0), config)
        rng = np.random.default_rng(5)
        codes = rng.integers(0, V, size=(2, Q, 64)).astype(np.int32)
        lengths = jnp.asarray([64, 48])
        logits = train_core._eval_forward(
            params, jnp.asarray(codes), lengths, config)

        manual = frontend_mod.decode_codes(codes, codebooks, 'sum')
        expected = transformer.forward(params, manual, lengths, config)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(expected), rtol=1e-5, atol=1e-6)
    finally:
        frontend_mod.unregister('synth-enc3')


def test_decode_codes_accepts_float_codes(codebooks):
    """The collate path (and the reference's closures) hand float-typed
    codes to the dequantizer; indices must be cast back to int."""
    rng = np.random.default_rng(6)
    codes = rng.integers(0, V, size=(2, Q, 6)).astype(np.int32)
    as_float = codes.astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(frontend_mod.decode_codes(as_float, codebooks, 'sum')),
        np.asarray(frontend_mod.decode_codes(codes, codebooks, 'sum')))


def test_collate_preserves_code_dtype():
    """Cached int codec codes must stay integral through collation (the
    codebook gather needs integer indices); fp16 caches stay fp16."""
    from ppgs_tpu.data.collate import Collate

    collate = Collate(features=('encodec', 'phonemes', 'length'))
    rng = np.random.default_rng(7)
    batch = [
        (rng.integers(0, V, size=(Q, 37)).astype(np.int32),
         rng.integers(0, 40, size=37).astype(np.int64),
         37),
        (rng.integers(0, V, size=(Q, 80)).astype(np.int32),
         rng.integers(0, 40, size=80).astype(np.int64),
         80),
    ]
    codes, phonemes, lengths = collate(batch)
    assert codes.dtype == np.int32
    assert codes.shape == (2, Q, 100)

    collate16 = Collate(features=('mel',))
    mel_batch = [(rng.standard_normal((80, 50)).astype(np.float16),)]
    (mel,) = collate16(mel_batch)
    assert mel.dtype == np.float16
