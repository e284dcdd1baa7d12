"""wav2vec2-based PPG models.

- W2V2 (reference ppgs/model/w2v2.py): facebook/wav2vec2-base with the final
  conv stride 2 -> 1 (100 Hz latents), frozen feature extractor, and a
  Conv1d(768 -> 40, k=5) classification head. Representation: raw 'wav'.
- W2V2FC (reference ppgs/model/w2v2fc.py): the Charsiu
  'charsiu/en_w2v2_fc_10ms' frame classifier — same 100 Hz wav2vec2 trunk +
  a linear head over 42 tokens; <unk>/<pad> dropped and the remaining 40
  permuted into our phoneme order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..phonemes import CHARSIU_PERMUTE
from . import w2v2
from .transformer import _conv_init, conv1d_same

# pad = window//2 - hop//2 (reference w2v2.py:19)
PADDING = 400 // 2 - 160 // 2


def w2v2_100hz_config(compute_dtype='float32'):
    import dataclasses

    return dataclasses.replace(
        w2v2.BASE.with_final_stride(1), compute_dtype=compute_dtype)


def _mask_config(config100):
    """The original stride-2 config used for the mask-length formula (a
    transformers artifact the reference W2V2 model is trained with)."""
    import dataclasses

    return dataclasses.replace(
        config100, conv_stride=config100.conv_stride[:-1] + (2,))


###############################################################################
# W2V2 end-to-end model
###############################################################################


def init(rng, config: Config):
    """Random init (production: converted facebook/wav2vec2-base trunk)."""
    k1, k2 = jax.random.split(rng)
    return {
        'w2v2': w2v2.init(k1, w2v2_100hz_config()),
        'head': _conv_init(k2, config.kernel_size, 768,
                           config.output_channels),
    }


def forward(params, features, lengths, config: Config, train=False,
            rng=None, precision=None):
    """(B, 1, S) raw audio + sample lengths -> (B, 40, T) logits @100 Hz.

    Train mode is reference-faithful to the HF model in .train() with
    freeze_feature_extractor() (ppgs/model/w2v2.py:29, ppgs/train/core.py
    :121): the conv feature encoder is frozen (stop_gradient), and
    dropout/spec-augment/LayerDrop run inside w2v2.forward.
    """
    wcfg = w2v2_100hz_config(config.compute_dtype)
    audio = jnp.pad(features, ((0, 0), (0, 0), (PADDING, PADDING)))
    audio = audio.squeeze(1)

    # Reference mask semantics: arange(S + 2*pad) - 2*pad < lengths
    sample_lengths = lengths + 2 * PADDING
    hidden = w2v2.forward(params['w2v2'], audio, sample_lengths, wcfg,
                          precision,
                          mask_config=_mask_config(wcfg),
                          train=train, rng=rng)          # (B, T', 768)
    logits = conv1d_same(hidden, params['head']['weight'],
                         params['head']['bias'], precision)
    return logits.transpose(0, 2, 1)


###############################################################################
# W2V2FC (Charsiu frame classifier)
###############################################################################


def fc_init(rng, config: Config):
    k1, k2 = jax.random.split(rng)
    d = 768
    bound = 1.0 / np.sqrt(d)
    return {
        'w2v2': w2v2.init(k1, w2v2_100hz_config()),
        'head': {
            'weight': jax.random.uniform(k2, (d, 42), jnp.float32,
                                         -bound, bound),
            'bias': jnp.zeros((42,)),
        },
    }


def fc_forward(params, features, lengths, config: Config, train=False,
               rng=None, precision=None):
    """(B, 1, S) audio -> (B, 40, T) Charsiu logits permuted to our order."""
    del train, rng
    wcfg = w2v2_100hz_config(config.compute_dtype)
    audio = jnp.pad(features, ((0, 0), (0, 0), (PADDING, PADDING)))
    audio = audio.squeeze(1)
    sample_lengths = lengths + 2 * PADDING
    hidden = w2v2.forward(params['w2v2'], audio, sample_lengths, wcfg,
                          precision)
    logits = hidden @ params['head']['weight'] + params['head']['bias']
    # Drop <unk>/<pad>, permute into our phoneme order
    logits = logits[..., :-2][..., jnp.asarray(CHARSIU_PERMUTE)]
    return logits.transpose(0, 2, 1)
