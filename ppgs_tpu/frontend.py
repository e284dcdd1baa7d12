"""Codebook frontends: train/inference-time dequantization of cached codec
codes (reference: config/encodec.py:8-22, config/dac.py:18-30, consumed at
ppgs/train/core.py:115-119 and ppgs/core.py:105-115).

The reference caches EnCodec/DAC INT CODES to disk and dequantizes them
through a per-experiment ``FRONTEND`` closure (a torch quantizer) at train
and inference time. Here dequantization is a pure jittable function over a
codebook table shipped as an npz asset — an on-device gather (+ sum or
concat over quantizer levels), fused by XLA into the surrounding step:

- encodec (sum):    out[b,:,t] = sum_q  codebook[q, codes[b,q,t], :]
  (EnCodec RVQ decode: residual levels add; 128-d latents)
- dac (concat):     out[b,:,t] = concat_q codebook[q, codes[b,q,t], :]
  (DAC ``quantizer.from_codes`` *latents* output: per-level 8-d codes
  concatenated -> 96-d, matching INPUT_CHANNELS=96)

Codebook assets are produced once by scripts/convert_codebooks.py (requires
the encodec / descript-audio-codec packages + network); tests register
synthetic codebooks in-memory via ``register``.
"""

import functools
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as config_mod


# Frontend name -> (codebooks (Q, V, D), mode). Populated from npz assets on
# first use; tests/converters may register directly.
_REGISTRY = {}

CODEBOOK_DIR = config_mod.ASSETS_DIR / 'codebooks'

# Combination mode per known frontend (how quantizer levels merge)
_MODES = {'encodec': 'sum', 'dac': 'concat'}


def register(name: str, codebooks, mode: str):
    """Register an in-memory codebook set for ``name`` ('sum'|'concat')."""
    if mode not in ('sum', 'concat'):
        raise ValueError(f"mode must be 'sum' or 'concat', got {mode!r}")
    _REGISTRY[name] = (jnp.asarray(codebooks), mode)


def unregister(name: str):
    _REGISTRY.pop(name, None)


def _load(name: str):
    if name in _REGISTRY:
        return _REGISTRY[name]
    path = Path(CODEBOOK_DIR) / f'{name}.npz'
    if not path.exists():
        raise FileNotFoundError(
            f'Codebook asset for frontend {name!r} not found at {path}. '
            f'Convert it once with scripts/convert_codebooks.py '
            f'(requires the codec package + network).')
    data = np.load(path)
    mode = str(data['mode']) if 'mode' in data else _MODES.get(name, 'sum')
    register(name, data['codebooks'], mode)
    return _REGISTRY[name]


@functools.partial(jax.jit, static_argnames=('mode',))
def decode_codes(codes, codebooks, mode: str = 'sum'):
    """Dequantize int codes (B, Q, T) through codebooks (Q, V, D).

    Returns (B, D, T) for mode='sum' or (B, Q*D, T) for mode='concat',
    float32 — the model-input latents the reference's torch quantizer
    closures produce.
    """
    codes = jnp.asarray(codes)
    if not jnp.issubdtype(codes.dtype, jnp.integer):
        # The collate path pads cached codes into float buffers (and the
        # reference's quantizer closures likewise cast, config/encodec.py:
        # 14); gather indices must be integral
        codes = codes.astype(jnp.int32)
    squeeze = codes.ndim == 2
    if squeeze:                       # (Q, T) single utterance
        codes = codes[None]
    B, Q, T = codes.shape
    if Q > codebooks.shape[0]:
        raise ValueError(
            f'{Q} quantizer levels in codes but only {codebooks.shape[0]} '
            f'codebooks')
    # Per-level embedding gather: (B, Q, T, D)
    emb = codebooks[jnp.arange(Q)[None, :, None], codes]
    emb = emb.astype(jnp.float32)
    if mode == 'sum':
        out = emb.sum(axis=1).transpose(0, 2, 1)          # (B, D, T)
    else:
        out = emb.transpose(0, 1, 3, 2).reshape(B, -1, T)  # (B, Q*D, T)
    return out[0] if squeeze else out


def make_frontend(name: str):
    """FRONTEND closure for a codebook representation: codes -> latents.

    Mirrors the reference's ``FRONTEND(device)`` factory (config/encodec.py:
    8-22): returns a callable mapping int codes (B, Q, T) to float latents
    (B, C, T) on device.
    """
    codebooks, mode = _load(name)

    def frontend(codes):
        return decode_codes(codes, codebooks, mode)

    frontend.codebooks = codebooks
    frontend.mode = mode
    return frontend


def maybe_frontend(config) -> Optional[object]:
    """The config's FRONTEND closure, or None (reference train/core.py:35-39)."""
    config = config_mod.get(config)
    if config.frontend is None:
        return None
    return make_frontend(config.frontend)
