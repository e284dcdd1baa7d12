"""PPG algebra: pronunciation distance, interpolation, sparsification.

Pure jnp ops over (num_phonemes, frames) posteriorgrams; all jit-compatible.
Behavior matches the reference (ppgs/core.py:399-543).
"""

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as config_mod


###############################################################################
# Similarity matrix loading (host-side cache)
###############################################################################


@functools.lru_cache(maxsize=1)
def similarity_matrix():
    """40x40 acoustic phoneme similarity matrix (converted reference asset)."""
    data = np.load(config_mod.SIMILARITY_MATRIX_PATH)
    return jnp.asarray(data['similarity'], dtype=jnp.float32)


###############################################################################
# Distance (normalized Jensen-Shannon divergence)
###############################################################################


def distance(
    ppg_x: jax.Array,
    ppg_y: jax.Array,
    reduction: str = 'mean',
    normalize: bool = True,
    exponent: Optional[float] = None,
    matrix: Optional[jax.Array] = None,
) -> jax.Array:
    """Pronunciation distance between two aligned PPGs of shape (P, T).

    Reference semantics (ppgs/core.py:399-469): clamp, optional similarity
    normalization S.T**exp @ ppg, symmetric KL about the parameter-space
    average, sqrt, sum over classes, then reduce over frames.
    """
    if exponent is None:
        exponent = config_mod.default().similarity_exponent
    ppg_x = jnp.clip(ppg_x, 1e-8, 1 - 1e-8)
    ppg_y = jnp.clip(ppg_y, 1e-8, 1 - 1e-8)

    if normalize:
        if matrix is None:
            matrix = similarity_matrix().astype(ppg_x.dtype)
        weight = matrix.T ** exponent
        ppg_x = (weight @ ppg_x).T          # (T, P)
        ppg_y = (weight @ ppg_y).T
    else:
        ppg_x = ppg_x.T
        ppg_y = ppg_y.T

    # Average in parameter space
    log_average = jnp.log((ppg_x + ppg_y) / 2)

    # KL divergences in both directions: kl(p || avg) pointwise
    kl_x = ppg_x * (jnp.log(ppg_x) - log_average)
    kl_y = ppg_y * (jnp.log(ppg_y) - log_average)

    average_kl = jnp.maximum((kl_x + kl_y) / 2, 0.0)
    jsd = jnp.sqrt(average_kl).sum(axis=1)   # (T,)

    if reduction == 'mean':
        return jsd.mean(axis=0)
    if reduction in ('none', None):
        return jsd
    if reduction == 'sum':
        return jsd.sum(axis=0)
    raise ValueError(f'Reduction method {reduction} not defined')


###############################################################################
# Interpolation
###############################################################################


def interpolate(
    ppg_x: jax.Array,
    ppg_y: jax.Array,
    interp: Union[float, jax.Array],
) -> jax.Array:
    """Linear interpolation (1 - t) * X + t * Y (ppgs/core.py:477-499)."""
    return (1.0 - interp) * ppg_x + interp * ppg_y


###############################################################################
# Sparsification
###############################################################################


def sparsify(
    ppg: jax.Array,
    method: str = 'percentile',
    threshold: Union[float, int, jax.Array] = 0.85,
) -> jax.Array:
    """Sparsify a (..., P, T) posteriorgram (ppgs/core.py:507-543).

    method='constant':   zero entries <= threshold (absolute probability)
    method='percentile': zero entries <= per-frame quantile over classes
    method='topk':       keep top-k classes per frame (threshold = k)
    Always renormalizes via softmax(log(p + 1e-8)) over the class dim.
    """
    if method in ('constant', 'percentile'):
        if method == 'percentile':
            thresh = jnp.quantile(
                ppg, jnp.asarray(threshold, ppg.dtype), axis=-2, keepdims=True)
        else:
            thresh = jnp.asarray(threshold, ppg.dtype)
        ppg = jnp.where(ppg > thresh, ppg, 0.0)
    elif method == 'topk':
        k = int(threshold)
        # kth largest value per frame along the class dim
        kth = jnp.sort(ppg, axis=-2)[..., ppg.shape[-2] - k, :][..., None, :]
        ppg = jnp.where(ppg >= kth, ppg, 0.0)
    else:
        raise ValueError(f'Sparsification method {method} is not defined')

    # Renormalize
    return jax.nn.softmax(jnp.log(ppg + 1e-8), axis=-2)
