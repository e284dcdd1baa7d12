"""Recorded-golden regression: converted published checkpoints must keep
reproducing the recorded reference PPGs (docs/GOLDEN_PARITY.md).

Goldens are produced once by ``scripts/convert_checkpoint.py --hf mel``
(network + torch required); afterwards this test re-verifies parity forever
with neither. Skips when no goldens have been recorded.
"""

from pathlib import Path

import numpy as np
import pytest

from ppgs_tpu import config as config_mod


GOLDEN_DIR = config_mod.ASSETS_DIR / 'goldens'
CASES = sorted(GOLDEN_DIR.glob('*-golden.npz')) if GOLDEN_DIR.exists() else []


@pytest.mark.parametrize(
    'golden_path', CASES, ids=[p.stem for p in CASES])
def test_golden_ppg_parity(golden_path):
    from ppgs_tpu import core as core_mod

    name = golden_path.stem.removesuffix('-golden')        # e.g. 'mel'
    config = config_mod.REGISTRY[name.split('-')[0]]
    checkpoint = config_mod.CHECKPOINT_DIR / (
        {'mel': 'mel-800k.npz', 'w2v2fb': 'w2v2fb-425k.npz'}.get(
            config.representation, f'{name}.npz'))
    if not checkpoint.exists():
        pytest.skip(f'no converted checkpoint at {checkpoint}')

    golden = np.load(golden_path)
    features, lengths = golden['features'], golden['lengths']

    strict = config.replace(config=f'{name}-golden-fp32',
                            compute_dtype='float32')
    logits = np.asarray(core_mod.infer(
        features, lengths, representation=config.representation,
        checkpoint=checkpoint, softmax=False, config=strict))
    np.testing.assert_allclose(
        logits, golden['logits'], rtol=1e-4, atol=1e-4)

    default = config.replace(config=f'{name}-golden-default')
    ppg = np.asarray(core_mod.infer(
        features, lengths, representation=config.representation,
        checkpoint=checkpoint, softmax=True, config=default))
    np.testing.assert_allclose(ppg, golden['ppg'], atol=2e-2)
    assert (ppg.argmax(1) == golden['ppg'].argmax(1)).mean() >= 0.995


def test_goldens_or_protocol_documented():
    """Either goldens exist, or the one-command protocol to create them is
    in place (network-gated environments)."""
    script = Path(__file__).parents[1] / 'scripts' / 'convert_checkpoint.py'
    assert script.exists()
    text = script.read_text()
    assert 'verify_and_record' in text and 'GOLDEN_PARITY' in text
