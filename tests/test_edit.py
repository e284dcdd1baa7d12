"""Tests for PPG editing ops and grid time-stretching."""

import numpy as np
import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu import edit
from ppgs_tpu.edit import grid
from ppgs_tpu.phonemes import PHONEMES


def random_ppg(seed=0, frames=20):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((40, frames)).astype(np.float32)
    exp = np.exp(logits - logits.max(axis=0, keepdims=True))
    return exp / exp.sum(axis=0, keepdims=True)


def test_reallocate_all():
    ppg = jnp.asarray(random_ppg())
    src, tgt = 'aa', 'iy'
    si, ti = PHONEMES.index(src), PHONEMES.index(tgt)
    before_sum = np.asarray(ppg.sum(axis=0))
    out = edit.reallocate(ppg, src, tgt)
    out = np.asarray(out)
    assert (out[si] == 0).all()
    np.testing.assert_allclose(
        out[ti], np.asarray(ppg[ti]) + np.asarray(ppg[si]), rtol=1e-6)
    np.testing.assert_allclose(out.sum(axis=0), before_sum, rtol=1e-5)


def test_reallocate_capped():
    ppg = jnp.asarray(random_ppg(1))
    si, ti = PHONEMES.index('s'), PHONEMES.index('z')
    cap = 0.01
    out = np.asarray(edit.reallocate(ppg, 's', 'z', cap))
    moved = np.minimum(np.asarray(ppg[si]), cap)
    np.testing.assert_allclose(out[ti], np.asarray(ppg[ti]) + moved,
                               rtol=1e-5)
    np.testing.assert_allclose(
        out[si], np.maximum(0, np.asarray(ppg[si]) - cap), rtol=1e-5,
        atol=1e-7)


def test_swap():
    ppg = jnp.asarray(random_ppg(2))
    ia, ib = PHONEMES.index('f'), PHONEMES.index('v')
    out = np.asarray(edit.swap(ppg, 'f', 'v'))
    np.testing.assert_allclose(out[ia], np.asarray(ppg[ib]))
    np.testing.assert_allclose(out[ib], np.asarray(ppg[ia]))


def test_shift_positive_stays_distribution():
    ppg = jnp.asarray(random_ppg(3))
    out = np.asarray(edit.shift(ppg, 'sh', 0.3))
    assert ((out >= 0) & (out <= 1)).all()


def test_shift_matches_reference_semantics():
    """shift: target += min(1-p, v); others -= others * frame_values."""
    ppg_np = random_ppg(4)
    index = PHONEMES.index('t')
    value = 0.2
    frame_values = np.minimum(1.0 - ppg_np[index], value)
    expected = ppg_np - ppg_np * frame_values[None, :]
    expected[index] = ppg_np[index] + frame_values
    out = np.asarray(edit.shift(jnp.asarray(ppg_np), 't', value))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-7)


def _constant_run_ppg(sequence, run=5):
    """PPG whose argmax decode is the given phoneme sequence, run frames each."""
    frames = run * len(sequence)
    ppg = np.full((40, frames), 0.01, dtype=np.float32)
    for i, phone in enumerate(sequence):
        ppg[PHONEMES.index(phone), i * run:(i + 1) * run] = 0.9
    return ppg / ppg.sum(axis=0, keepdims=True)


def test_regex_find():
    ppg = jnp.asarray(_constant_run_ppg(['s', 'ih', 't', 's', 'ih']))
    spans = edit.regex_find(ppg, ['s', 'ih'])
    assert spans == [[0, 10], [15, 25]]


def test_regex_swap():
    ppg_np = _constant_run_ppg(['s', 'ih', 't'])
    out = np.asarray(edit.regex(jnp.asarray(ppg_np), ['s', 'ih'],
                                ['z', 'iy']))
    # First run: s <-> z swapped
    si, zi = PHONEMES.index('s'), PHONEMES.index('z')
    np.testing.assert_allclose(out[zi, :5], ppg_np[si, :5])
    np.testing.assert_allclose(out[si, :5], ppg_np[zi, :5])
    # 'iy' run swapped with 'ih'
    ii, yi = PHONEMES.index('ih'), PHONEMES.index('iy')
    np.testing.assert_allclose(out[yi, 5:10], ppg_np[ii, 5:10])
    # Unmatched 't' region untouched
    np.testing.assert_allclose(out[:, 10:], ppg_np[:, 10:])


def test_grid_sample_identity():
    ppg = jnp.asarray(random_ppg(5, frames=12))
    g = grid.of_length(ppg, 12)
    out = np.asarray(grid.sample(ppg, g))
    np.testing.assert_allclose(out, np.asarray(ppg), rtol=1e-4, atol=1e-6)


def test_grid_sample_linear_interpolation():
    ppg = jnp.asarray(random_ppg(6, frames=10))
    g = jnp.asarray([0.5, 2.25])
    out = np.asarray(grid.sample(ppg, g))
    expected0 = 0.5 * np.asarray(ppg[:, 0]) + 0.5 * np.asarray(ppg[:, 1])
    expected1 = 0.75 * np.asarray(ppg[:, 2]) + 0.25 * np.asarray(ppg[:, 3])
    np.testing.assert_allclose(out[:, 0], expected0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], expected1, rtol=1e-5)


def test_grid_constant_stretch():
    ppg = jnp.asarray(random_ppg(7, frames=20))
    g = grid.constant(ppg, 0.5)   # half speed -> double length
    assert g.shape[0] == 40
    out = grid.sample(ppg, g)
    assert out.shape == (40, 40)
