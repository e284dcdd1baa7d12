"""End-to-end pipeline on a synthetic dataset: cache building, training
loop (few steps), objective evaluation, and the accuracy plot."""

import json

import numpy as np
import pytest

import ppgs_tpu
from ppgs_tpu.data import audio as audio_io
from ppgs_tpu.data import textgrid


TINY = ppgs_tpu.Config(
    config='mel',
    num_hidden_layers=2, hidden_channels=64, ffn_channels=128,
    chunk_length=64, chunk_overlap=8, max_len=512,
    compute_dtype='float32',
    max_training_frames=600,
    evaluation_interval=5, checkpoint_interval=10,
    default_evaluation_steps=2, num_workers=0)


@pytest.fixture
def synthetic_dataset(tmp_path, monkeypatch):
    """A tiny 'tinyset' dataset with wavs, alignments, mel cache, partition."""
    from ppgs_tpu import config as config_mod

    cache_root = tmp_path / 'cache'
    cache = cache_root / 'tinyset'
    cache.mkdir(parents=True)
    partition_dir = tmp_path / 'partitions'
    partition_dir.mkdir()
    monkeypatch.setattr(config_mod, 'CACHE_DIR', cache_root)
    monkeypatch.setattr(config_mod, 'PARTITION_DIR', partition_dir)
    monkeypatch.setattr(config_mod, 'EVAL_DIR', tmp_path / 'eval')
    monkeypatch.setattr(config_mod, 'RUNS_DIR', tmp_path / 'runs')

    rng = np.random.default_rng(0)
    stems = []
    for i in range(8):
        stem = f'utt{i:02d}'
        seconds = 0.5 + 0.1 * (i % 3)
        samples = int(seconds * 16000)
        audio_io.save_wav(
            cache / f'{stem}.wav',
            rng.uniform(-0.3, 0.3, (1, samples)).astype(np.float32))
        phones = [textgrid.Phoneme('aa', 0.0, seconds / 2),
                  textgrid.Phoneme('iy', seconds / 2, seconds)]
        textgrid.Alignment(
            [textgrid.Word('ai', phones)]).save(
                cache / f'{stem}.TextGrid')
        frames = samples // 160
        mel = rng.standard_normal((80, frames)).astype(np.float16)
        np.save(cache / f'{stem}-mel.npy', mel)
        # Caches for the other run.sh representations (small channel
        # counts for CPU speed; the real channel widths are exercised by
        # the preprocess parity tests)
        for rep, ch in (('w2v2fb', 16), ('w2v2fc', 16), ('bottleneck', 12)):
            np.save(cache / f'{stem}-{rep}.npy',
                    rng.standard_normal((ch, frames)).astype(np.float16))
        # encodec: cached INT CODES, dequantized by the codebook frontend
        np.save(cache / f'{stem}-encodec.npy',
                rng.integers(0, 8, (2, frames)).astype(np.int32))
        stems.append(stem)

    with open(partition_dir / 'tinyset.json', 'w') as f:
        json.dump({'train': stems[:5], 'valid': stems[5:6],
                   'test': stems[6:]}, f)
    return tmp_path


@pytest.mark.parametrize(
    'rep,channels',
    [('w2v2fb', 16), ('w2v2fc', 16), ('bottleneck', 12), ('encodec', 12)])
def test_all_runsh_representations_train_and_evaluate(
        synthetic_dataset, rep, channels, request):
    """Every run.sh representation (reference run.sh:22-56) runs its
    preprocess-cache -> train -> evaluate path end-to-end; encodec goes
    through the codebook FRONTEND dequantization inside the jitted step
    (mel is covered by test_train_loop_end_to_end/test_evaluate_datasets)."""
    from ppgs_tpu import core as core_mod
    from ppgs_tpu import evaluate, frontend
    from ppgs_tpu.train import core as train_core

    if rep == 'encodec':
        rng = np.random.default_rng(7)
        frontend.register(
            'encodec', rng.standard_normal((2, 8, 12)).astype(np.float32),
            'sum')
        request.addfinalizer(lambda: frontend.unregister('encodec'))

    config = TINY.replace(
        config=rep, representation=rep, input_channels=channels,
        frontend='encodec' if rep == 'encodec' else None,
        datasets=('tinyset',))

    run_dir = synthetic_dataset / 'runs' / rep
    params = train_core.train('tinyset', run_dir, config=config,
                              max_steps=4)
    assert params is not None
    ckpt = train_core.latest_checkpoint(run_dir)
    assert ckpt is not None and ckpt.name == '00000004.npz'

    core_mod._MODEL_CACHE.clear()
    results = evaluate.datasets(['tinyset'], checkpoint=ckpt, config=config)
    assert 0.0 <= results['tinyset']['Accuracy'] <= 1.0
    assert np.isfinite(results['tinyset']['loss'])
    assert (synthetic_dataset / 'eval' / rep / 'overall.json').exists()


def test_train_loop_end_to_end(synthetic_dataset, tmp_path):
    from ppgs_tpu.train import core as train_core

    run_dir = synthetic_dataset / 'runs' / 'tiny'
    params = train_core.train(
        'tinyset', run_dir, config=TINY, max_steps=12)
    assert params is not None

    # Checkpoint written (interval 10 + final)
    ckpts = sorted(run_dir.glob('*.npz'))
    assert len(ckpts) >= 1
    assert train_core.latest_checkpoint(run_dir).name == '00000012.npz'

    # Metric log written with train loss entries
    log = run_dir / 'metrics.jsonl'
    assert log.exists()
    records = [json.loads(line) for line in log.read_text().splitlines()]
    assert any('train/loss' in r for r in records)
    assert any(any(k.startswith('valid/') for k in r) for r in records)


def test_train_resume(synthetic_dataset):
    from ppgs_tpu.train import core as train_core

    run_dir = synthetic_dataset / 'runs' / 'resume'
    train_core.train('tinyset', run_dir, config=TINY, max_steps=10)
    first = train_core.latest_checkpoint(run_dir)
    assert first.name == '00000010.npz'

    # Resume continues from step 10
    train_core.train('tinyset', run_dir, config=TINY, max_steps=15)
    assert train_core.latest_checkpoint(run_dir).name == '00000015.npz'


def test_evaluate_datasets(synthetic_dataset, monkeypatch):
    """evaluate.datasets through the inference stack with a checkpoint."""
    import jax

    from ppgs_tpu import core as core_mod
    from ppgs_tpu import evaluate, load as load_mod
    from ppgs_tpu.models import transformer

    params = transformer.init(jax.random.PRNGKey(0), TINY)
    ckpt = synthetic_dataset / 'model.npz'
    load_mod.save_params(ckpt, params)

    config = TINY.replace(datasets=('tinyset',))
    core_mod._MODEL_CACHE.clear()
    results = evaluate.datasets(['tinyset'], checkpoint=ckpt, config=config)
    assert 'tinyset' in results and 'aggregate' in results
    assert 0.0 <= results['tinyset']['Accuracy'] <= 1.0
    assert (synthetic_dataset / 'eval' / 'mel' / 'tinyset.json').exists()
    assert (synthetic_dataset / 'eval' / 'mel' / 'overall.json').exists()

    # Figure + tensor artifacts per dataset and aggregate
    # (reference ppgs/evaluate/core.py:77-107)
    for name in ('tinyset', 'overall'):
        art = synthetic_dataset / 'eval' / 'mel' / name
        assert (art / 'ConfusionMatrix.jpg').exists()
        assert (art / 'ConfusionMatrix.pdf').exists()
        assert (art / 'DistanceMatrix.jpg').exists()
        tensors = np.load(art / 'tensors.npz')
        assert tensors['confusion'].shape == (40, 40)
        assert tensors['prob_confusion'].shape == (40, 40)
        assert tensors['distance_matrix'].shape == (40, 40)

    # Accuracy plot from the eval results
    from ppgs_tpu import plot

    out = synthetic_dataset / 'accuracy.png'
    plot.accuracy.from_eval(out, datasets=['tinyset'],
                            representations=['mel'])
    assert out.exists()


def test_batched_test_eval_matches_batch1(synthetic_dataset):
    """Frame-budget test batches (grouped by quantized length) reproduce the
    reference batch-1 sequential eval: identical counts, near-identical
    float metrics, fewer device dispatches."""
    import jax

    from ppgs_tpu import core as core_mod
    from ppgs_tpu import evaluate, load as load_mod
    from ppgs_tpu.data import loader as data_loader
    from ppgs_tpu.models import transformer

    params = transformer.init(jax.random.PRNGKey(0), TINY)
    ckpt = synthetic_dataset / 'model_b.npz'
    load_mod.save_params(ckpt, params)

    config_batched = TINY.replace(datasets=('tinyset',))
    config_batch1 = config_batched.replace(batched_test_eval=False)

    # Both test utterances share the 100-frame quantization bucket:
    # batched eval issues ONE dispatch where batch-1 issues two
    assert len(data_loader('tinyset', 'test', config=config_batched)) == 1
    assert len(data_loader('tinyset', 'test', config=config_batch1)) == 2

    core_mod._MODEL_CACHE.clear()
    batched = evaluate.datasets(
        ['tinyset'], checkpoint=ckpt, config=config_batched)
    batch1 = evaluate.datasets(
        ['tinyset'], checkpoint=ckpt, config=config_batch1)

    for name in ('tinyset', 'aggregate'):
        assert set(batched[name]) == set(batch1[name])
        for key, value in batch1[name].items():
            if key.startswith('Count/') or key.startswith('Total/'):
                assert batched[name][key] == value, key
            else:
                assert batched[name][key] == pytest.approx(
                    value, rel=1e-6, abs=1e-9), key
