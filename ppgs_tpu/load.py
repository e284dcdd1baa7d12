"""Loading utilities: audio, model parameters, partitions, class weights.

(reference: ppgs/load.py). Checkpoints are stored as flat .npz pytrees
('layers.0.attn.wq', ...); reference PyTorch .pt checkpoints are converted on
the fly via convert.torch_weights (CPU torch required only for that path).
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from . import config as config_mod


###############################################################################
# Audio
###############################################################################


def audio(file):
    """Load audio from disk as (1, samples) float32 @ 16 kHz."""
    from .data import audio as audio_io

    return audio_io.load(file, config_mod.default().sample_rate)


###############################################################################
# Parameter pytree <-> flat npz
###############################################################################


def flatten_params(params, prefix=''):
    flat = {}
    if isinstance(params, dict):
        for key, value in params.items():
            flat.update(flatten_params(value, f'{prefix}{key}.'))
    elif isinstance(params, (list, tuple)):
        for i, value in enumerate(params):
            flat.update(flatten_params(value, f'{prefix}{i}.'))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def unflatten_params(flat):
    tree = {}
    for key, value in flat.items():
        parts = key.split('.')
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return jnp.asarray(node)
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params(path, params):
    np.savez(path, **flatten_params(params))


def load_params(path):
    data = np.load(path)
    return unflatten_params({k: data[k] for k in data.files})


###############################################################################
# Model loading
###############################################################################


def model(checkpoint=None, representation=None, config=None):
    """Load model parameters + config for inference (ppgs/load.py:33-81).

    Returns (params, config). ``checkpoint`` may be .npz (ours) or .pt
    (reference torch checkpoint, converted in place).
    """
    config = config_mod.get(config)
    if representation is not None and representation != config.representation:
        if representation == 'w2v2fb':
            config = config_mod.REGISTRY['w2v2fb']
        elif representation == 'mel':
            config = config_mod.REGISTRY['mel']
        else:
            # Beyond the reference (which raises here, ppgs/load.py:44-46):
            # any registry experiment with a matching representation
            # supplies the model hyperparameters.
            matches = [c for c in config_mod.REGISTRY.values()
                       if c.representation == representation]
            if not matches:
                raise ValueError(
                    f'No registered config uses representation '
                    f'{representation!r}; supply a config explicitly')
            config = matches[0]

    if checkpoint is None and config.local_checkpoint is not None:
        checkpoint = config.local_checkpoint
    if checkpoint is None and config.model == 'W2V2FC':
        # Pretrained frame classifier: no trained PPG checkpoint exists or
        # is needed (reference ppgs/load.py:54-56 returns the HF-pretrained
        # model directly); our equivalent is the converted Charsiu weights
        from .preprocess.w2v2fc import W2V2FC_CHECKPOINT

        if not Path(W2V2FC_CHECKPOINT).exists():
            raise FileNotFoundError(
                f'Charsiu weights not found at {W2V2FC_CHECKPOINT}. '
                f'Convert them with scripts/convert_w2v2.py --charsiu '
                f'(needs network).')
        checkpoint = W2V2FC_CHECKPOINT
    if checkpoint is None:
        # Bundled converted checkpoints, mirroring the published HF names
        name = {'mel': 'mel-800k.npz', 'w2v2fb': 'w2v2fb-425k.npz'}.get(
            config.representation)
        if name is None:
            raise ValueError(
                f'No default checkpoints exist for representation '
                f'{config.representation}')
        checkpoint = config_mod.CHECKPOINT_DIR / name
        if not Path(checkpoint).exists():
            raise FileNotFoundError(
                f'Checkpoint {checkpoint} not found. Convert the published '
                f'reference checkpoint with scripts/convert_checkpoint.py')

    checkpoint = Path(checkpoint)
    if checkpoint.suffix == '.pt':
        from .convert import (load_torch_checkpoint,
                              transformer_params_from_state_dict)

        sd = load_torch_checkpoint(checkpoint)
        params = transformer_params_from_state_dict(
            sd, num_layers=config.num_hidden_layers)
        params = {k: _to_jnp(v) for k, v in params.items()}
    else:
        params = load_params(checkpoint)
        # Training checkpoints nest model params next to optimizer state,
        # like the reference's 'model'-keyed state dicts (ppgs/load.py:76-79)
        if isinstance(params, dict) and 'params' in params:
            params = params['params']
    return params, config


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(tree)


###############################################################################
# Partitions and class weights
###############################################################################


def partition(dataset):
    """Load partition dict for a dataset (ppgs/load.py:84-87)."""
    with open(config_mod.PARTITION_DIR / f'{dataset}.json') as file:
        return json.load(file)


def phoneme_weights(config=None):
    """Class-balancing weights min(count)/count (ppgs/load.py:90-127)."""
    config = config_mod.get(config)
    path = config_mod.CLASS_WEIGHT_FILE
    if path.exists():
        return jnp.asarray(np.load(path)['weights'])

    # Compute from the training partition's alignments
    from .data import Dataset

    dataset = Dataset(config.training_dataset, 'train',
                      features=['phonemes', 'length'], config=config)
    counts = np.zeros(config.output_channels, dtype=np.int64)
    for i in range(len(dataset)):
        phonemes, length = dataset[i]
        valid = np.asarray(phonemes)[:int(length)]
        counts += np.bincount(valid, minlength=config.output_channels)
    weights = counts.min() / np.maximum(counts, 1)
    np.savez(path, weights=weights.astype(np.float32))
    return jnp.asarray(weights, dtype=jnp.float32)
