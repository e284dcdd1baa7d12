"""Length masking utilities (reference: ppgs/model/transformer.py:104-114).

All masks are built at static shapes: callers pass the padded time dimension
explicitly so everything stays jit-compatible.
"""

import jax.numpy as jnp


def mask_from_lengths(lengths, max_length, padding=0):
    """Boolean mask (batch, max_length): True where frame index is valid.

    Matches the reference semantics ``arange(T) - 2*padding < lengths``.
    """
    x = jnp.arange(max_length, dtype=lengths.dtype)
    return (x[None, :] - 2 * padding) < lengths[:, None]
