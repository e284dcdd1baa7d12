"""Conformer ASR encoder in JAX (the 'bottleneck' frontend's model).

Re-implements the reference's vendored ESPnet conformer
(ppgs/preprocess/bottleneck/conformer_ppg_model/encoder/*) with matching
semantics so the published `24epoch.pth` checkpoint converts losslessly:

- Conv2dNoSubsampling input: two 5x5 stride-1 2D convs + ReLU over the
  (time, mel) map, flattened to a linear projection (subsampling.py:85-126)
- legacy Transformer-XL relative-position attention: REVERSED sinusoidal
  pos table of length T (not 2T-1), pos_bias_u/v, legacy rel_shift
  (attention.py:104-183, embedding.py:131-166)
- macaron half-FFNs with swish, conv module (pointwise+GLU, depthwise k=15,
  BatchNorm running stats, swish), pre-norm + per-block final LN, stack-end
  after_norm (encoder_layer.py:16-152)

Everything is feature-last jnp; convs lower to XLA; the (T x T) attention
matmuls tile on the MXU.
"""

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    input_dim: int = 80
    dim: int = 144
    heads: int = 4
    ffn_dim: int = 576
    num_blocks: int = 16
    conv_kernel: int = 15
    compute_dtype: str = 'float32'


BOTTLENECK = ConformerConfig()


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _layer_norm(x, p, eps=1e-5):
    # ESPnet LayerNorm wraps torch.nn.LayerNorm defaults (eps 1e-5)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']


###############################################################################
# Initialization (tests; production weights come from conversion)
###############################################################################


def init(rng, config: ConformerConfig = BOTTLENECK):
    keys = iter(jax.random.split(rng, 16 + 24 * config.num_blocks))

    def normal(shape, scale=0.02):
        return jax.random.normal(next(keys), shape) * scale

    d, ffn = config.dim, config.ffn_dim

    def linear(n_in, n_out, bias=True):
        p = {'weight': normal((n_in, n_out))}
        if bias:
            p['bias'] = jnp.zeros((n_out,))
        return p

    def norm():
        return {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))}

    params = {
        'embed': {
            # 2D convs stored (KH, KW, I, O)
            'conv1': {'weight': normal((5, 5, 1, d)),
                      'bias': jnp.zeros((d,))},
            'conv2': {'weight': normal((5, 5, d, d)),
                      'bias': jnp.zeros((d,))},
            'out': linear(d * config.input_dim, d),
        },
        'after_norm': norm(),
        'blocks': [],
    }
    for _ in range(config.num_blocks):
        params['blocks'].append({
            'ff_macaron': {'w1': linear(d, ffn), 'w2': linear(ffn, d)},
            'norm_ff_macaron': norm(),
            'attn': {
                'q': linear(d, d), 'k': linear(d, d), 'v': linear(d, d),
                'out': linear(d, d),
                'pos': linear(d, d, bias=False),
                'pos_bias_u': normal((config.heads, d // config.heads)),
                'pos_bias_v': normal((config.heads, d // config.heads)),
            },
            'norm_mha': norm(),
            'conv': {
                'pointwise1': {'weight': normal((1, d, 2 * d)),
                               'bias': jnp.zeros((2 * d,))},
                'depthwise': {'weight': normal((config.conv_kernel, 1, d)),
                              'bias': jnp.zeros((d,))},
                'batch_norm': {'scale': jnp.ones((d,)),
                               'bias': jnp.zeros((d,)),
                               'mean': jnp.zeros((d,)),
                               'var': jnp.ones((d,))},
                'pointwise2': {'weight': normal((1, d, d)),
                               'bias': jnp.zeros((d,))},
            },
            'norm_conv': norm(),
            'ff': {'w1': linear(d, ffn), 'w2': linear(ffn, d)},
            'norm_ff': norm(),
            'norm_final': norm(),
        })
    return params


###############################################################################
# Relative positional encoding (legacy, reversed)
###############################################################################


@functools.lru_cache(maxsize=8)
def _rel_pos_table(length: int, dim: int, max_len: int = 5000):
    """Reversed sinusoid table (embedding.py:56-77, reverse=True).

    The reference builds the table once at max_len=5000 (positions
    max_len-1 .. 0) and slices the FIRST ``length`` rows — so the emitted
    positions are (max_len-1) down to (max_len-length), not (length-1)..0.
    Inputs longer than max_len regenerate at T (reference extend_pe).
    """
    max_len = max(max_len, length)
    # float32 pipeline matching torch (sin of large args is rounding-
    # sensitive; float64 here would diverge from the torch table)
    position = np.arange(max_len - 1, -1, -1.0, dtype=np.float32)[:, None]
    div_term = np.exp((np.arange(0, dim, 2).astype(np.float32)
                       * np.float32(-(math.log(10000.0) / dim))))
    angle = position * div_term
    pe = np.zeros((max_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(angle)
    pe[:, 1::2] = np.cos(angle)
    return pe[:length]


def _rel_shift(x):
    """Legacy rel_shift (attention.py:127-143): pad a zero column, reshape
    to roll each row one step per row index."""
    B, H, T1, T2 = x.shape
    zero_pad = jnp.zeros((B, H, T1, 1), dtype=x.dtype)
    x_padded = jnp.concatenate([zero_pad, x], axis=-1)
    x_padded = x_padded.reshape(B, H, T2 + 1, T1)
    return x_padded[:, :, 1:].reshape(B, H, T1, T2)


def _use_fused_rel_attention(t: int) -> bool:
    import os

    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    if os.environ.get('PPGS_TPU_CONFORMER_KERNEL', '1') == '0':
        return False
    try:
        return jax.default_backend() == 'tpu' and t % 8 == 0 and t <= 2048
    except RuntimeError:
        return False


def _rel_attention(x, pos_emb, p, mask, heads, compute_dtype, precision,
                   interpret=False):
    B, T, C = x.shape
    d_k = C // heads
    xc = x.astype(compute_dtype)

    def proj(lin, inp):
        out = inp @ lin['weight'].astype(compute_dtype)
        if 'bias' in lin:
            out = out + lin['bias'].astype(compute_dtype)
        return out

    q = proj(p['q'], xc).reshape(B, T, heads, d_k)
    k = proj(p['k'], xc).reshape(B, T, heads, d_k).transpose(0, 2, 1, 3)
    v = proj(p['v'], xc).reshape(B, T, heads, d_k).transpose(0, 2, 1, 3)
    pos = proj(p['pos'], pos_emb.astype(compute_dtype))
    pos = pos.reshape(1, -1, heads, d_k).transpose(0, 2, 1, 3)

    q_u = (q + p['pos_bias_u'].astype(compute_dtype)).transpose(0, 2, 1, 3)
    q_v = (q + p['pos_bias_v'].astype(compute_dtype)).transpose(0, 2, 1, 3)

    # Pallas fused path (TPU, bf16): content scores + bias add + masked
    # softmax + PV stay in VMEM; only the (batch-dependent) shifted
    # position term materializes once (ops/flash_attention.py
    # fused_attention_bias). d_k=36 heads zero-pad to 64 lanes.
    if (compute_dtype == jnp.bfloat16 and d_k <= 64
            and (_use_fused_rel_attention(T) or interpret)):
        from ..ops import flash_attention as fa

        # Legacy rel_shift via the kernel's free sublane slice: hand it the
        # zero-column-padded UNSHIFTED term viewed (B, H, T+1, T). The
        # zero column comes FROM THE EINSUM (a zero row prepended to pos),
        # so no concat copy and no (.., T, T+1)-lane relayout ever
        # materializes — the XLA rel_shift's copies alone measured 4.2 ms
        # at the bench workload.
        pos_z = jnp.pad(pos, ((0, 0), (0, 0), (1, 0), (0, 0)))
        z = jnp.einsum('bhqd,bhkd->bhqk', q_v, pos_z,
                       precision=precision)           # (B, H, T, T+1)
        bias = z.reshape(B, heads, T + 1, T)
        key_mask = (mask if mask is not None
                    else jnp.ones((B, T), bool))
        out = fa.fused_attention_bias(
            q_u.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), bias, key_mask, heads,
            legacy_shift=True, interpret=interpret)
        out = out.reshape(B, T, C)
        return proj(p['out'], out.astype(compute_dtype)).astype(x.dtype)

    matrix_ac = jnp.einsum('bhqd,bhkd->bhqk', q_u, k, precision=precision)
    matrix_bd = jnp.einsum('bhqd,bhkd->bhqk', q_v, pos, precision=precision)
    matrix_bd = _rel_shift(matrix_bd)

    if compute_dtype == jnp.float32:
        # Strict-parity path (fp32 configs): fp32 score materialization
        scores = (matrix_ac + matrix_bd).astype(jnp.float32) / math.sqrt(d_k)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores,
                               jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask[:, None, None, :], attn, 0.0)
    else:
        # Production bf16 path: the (B, H, T, T) tensors are the
        # pipeline's HBM hot spot (~0.65 GB fp32 per tensor per block at
        # the bench workload) — keep them at compute dtype end to end and
        # run only the softmax STATISTICS in fp32 (XLA fuses the upcast
        # into the reduction loops, so no fp32 copy materializes).
        scores = (matrix_ac + matrix_bd) * jnp.asarray(
            1.0 / math.sqrt(d_k), compute_dtype)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores,
                               jnp.asarray(-1e30, compute_dtype))
        row_max = scores.astype(jnp.float32).max(axis=-1, keepdims=True)
        unnorm = jnp.exp((scores.astype(jnp.float32)
                          - row_max)).astype(compute_dtype)
        if mask is not None:
            unnorm = jnp.where(mask[:, None, None, :], unnorm,
                               jnp.asarray(0.0, compute_dtype))
        denom = unnorm.sum(axis=-1, keepdims=True, dtype=jnp.float32)
        attn = unnorm * (1.0 / jnp.maximum(denom, 1e-30)).astype(
            compute_dtype)

    out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(compute_dtype), v,
                     precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return proj(p['out'], out).astype(x.dtype)


###############################################################################
# Blocks
###############################################################################


def _ffn(x, p, compute_dtype):
    xc = x.astype(compute_dtype)
    h = _swish(xc @ p['w1']['weight'].astype(compute_dtype)
               + p['w1']['bias'].astype(compute_dtype))
    return (h @ p['w2']['weight'].astype(compute_dtype)
            + p['w2']['bias'].astype(compute_dtype)).astype(x.dtype)


def _conv(x, weight, compute_dtype, precision, *, padding='VALID',
          groups=1, dims=('NHC', 'HIO', 'NHC'), strides=(1,)):
    """Conv riding the compute dtype on the MXU with fp32 accumulation;
    norms/activations around it stay in the residual dtype."""
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype), weight.astype(compute_dtype),
        strides, padding, dimension_numbers=dims,
        feature_group_count=groups, precision=precision,
        preferred_element_type=jnp.float32)


def _conv_module(x, p, compute_dtype, precision):
    """(B, T, C): pointwise->GLU, depthwise k=15, BatchNorm (running stats),
    swish, pointwise."""
    h = _conv(x, p['pointwise1']['weight'], compute_dtype, precision)
    h = h + p['pointwise1']['bias']
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                       # GLU

    k = p['depthwise']['weight'].shape[0]
    pad = (k - 1) // 2
    # Depthwise via the XLA grouped-conv emitter. A per-tap shift-and-
    # scale reformulation (15 slices of the padded stream, fp32
    # accumulation) measured 14.1 vs 7.0 ms at the bench workload — XLA
    # does NOT fuse the taps into one pass; documented negative result.
    h = _conv(h, p['depthwise']['weight'], compute_dtype, precision,
              padding=((pad, pad),), groups=h.shape[-1])
    h = h + p['depthwise']['bias']

    bn = p['batch_norm']
    h = (h - bn['mean']) * jax.lax.rsqrt(bn['var'] + 1e-5)
    h = h * bn['scale'] + bn['bias']
    h = _swish(h)

    h = _conv(h, p['pointwise2']['weight'], compute_dtype, precision)
    return (h + p['pointwise2']['bias']).astype(x.dtype)


def _block(x, pos_emb, p, mask, config, precision):
    compute_dtype = jnp.dtype(config.compute_dtype)

    # Macaron half-FFN (pre-norm)
    residual = x
    x = _layer_norm(x, p['norm_ff_macaron'])
    x = residual + 0.5 * _ffn(x, p['ff_macaron'], compute_dtype)

    # Self-attention
    residual = x
    x = _layer_norm(x, p['norm_mha'])
    x = residual + _rel_attention(x, pos_emb, p['attn'], mask, config.heads,
                                  compute_dtype, precision)

    # Convolution module
    residual = x
    x = _layer_norm(x, p['norm_conv'])
    x = residual + _conv_module(x, p['conv'], compute_dtype, precision)

    # Half-FFN
    residual = x
    x = _layer_norm(x, p['norm_ff'])
    x = residual + 0.5 * _ffn(x, p['ff'], compute_dtype)

    return _layer_norm(x, p['norm_final'])


###############################################################################
# Encoder
###############################################################################


def embed(params, features, config: ConformerConfig, precision=None):
    """Conv2dNoSubsampling: (B, T, input_dim) -> ((B, T, d), pos_emb)."""
    p = params['embed']
    compute_dtype = jnp.dtype(config.compute_dtype)
    dims = ('NHWC', 'HWIO', 'NHWC')
    x = features[..., None].astype(jnp.float32)   # (B, T, F, 1)
    # The 5x5 d->d conv over (T, 80) dominates the whole conformer's FLOPs;
    # it rides the compute dtype with fp32 accumulation (_conv semantics)
    x = _conv(x, p['conv1']['weight'], compute_dtype, precision,
              padding=((2, 2), (2, 2)), dims=dims, strides=(1, 1))
    x = jax.nn.relu(x + p['conv1']['bias'])
    x = _conv(x, p['conv2']['weight'], compute_dtype, precision,
              padding=((2, 2), (2, 2)), dims=dims, strides=(1, 1))
    x = jax.nn.relu(x + p['conv2']['bias'])
    B, T, F, C = x.shape
    # torch flattens (C, F): transpose to (B, T, C, F) first
    x = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
    xc = x.astype(compute_dtype)
    x = (xc @ p['out']['weight'].astype(compute_dtype)
         + p['out']['bias'].astype(compute_dtype)).astype(jnp.float32)

    # Relative positional encoding: x scaled, reversed table emitted
    x = x * math.sqrt(config.dim)
    pos_emb = jnp.asarray(_rel_pos_table(T, config.dim))[None]
    return x, pos_emb


def forward(params, features, lengths=None,
            config: ConformerConfig = BOTTLENECK, precision=None):
    """(B, T, input_dim) features -> (B, T, dim) bottleneck latents."""
    mask = None
    if lengths is not None:
        mask = jnp.arange(features.shape[1])[None, :] < lengths[:, None]

    x, pos_emb = embed(params, features, config, precision)
    for block in params['blocks']:
        x = _block(x, pos_emb, block, mask, config, precision)
    return _layer_norm(x, params['after_norm'])
