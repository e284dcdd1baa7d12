"""wav2vec 2.0 (base) in JAX: feature encoder + transformer encoder.

Used by two consumers (mirroring the reference):
- the **w2v2fb frontend** (ppgs/preprocess/w2v2fb/core.py): frozen
  facebook/wav2vec2-base, 50 Hz latents nearest-upsampled to 100 Hz;
- the **W2V2 end-to-end model** (ppgs/model/w2v2.py): same architecture with
  the final conv stride 2 -> 1 so latents come out at 100 Hz, plus a
  Conv1d(768 -> 40) classification head.

Semantics match transformers.Wav2Vec2Model (post-LN variant,
do_stable_layer_norm=False) so published weights convert losslessly; see
convert/w2v2_weights.py. All matmuls are feature-last for MXU tiling; the
grouped positional conv and feature-extractor convs lower to XLA convs.
"""

import dataclasses
import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


###############################################################################
# Architecture config
###############################################################################


@dataclasses.dataclass(frozen=True)
class W2V2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    compute_dtype: str = 'float32'

    # Train-mode regularization (transformers Wav2Vec2Config defaults —
    # verifiable against the installed transformers; when converting hub
    # weights with network access, override from the hub config via
    # convert/w2v2_weights.w2v2_config_from_hf). The reference trains the
    # w2v2ft config with the HF model in .train() mode, so all of these
    # are active there (ppgs/model/w2v2.py:22-29, ppgs/train/core.py:121).
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    layerdrop: float = 0.1
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2

    def with_final_stride(self, stride: int) -> 'W2V2Config':
        """The reference's 100 Hz variant: last conv stride 2 -> stride
        (ppgs/model/w2v2.py:26)."""
        return dataclasses.replace(
            self, conv_stride=self.conv_stride[:-1] + (stride,))


BASE = W2V2Config()


def feat_extract_output_lengths(lengths, config: W2V2Config = BASE):
    """Conv-stack output lengths: floor((L - k) / s) + 1 per layer."""
    for kernel, stride in zip(config.conv_kernel, config.conv_stride):
        lengths = (lengths - kernel) // stride + 1
    return lengths


###############################################################################
# Initialization (for tests; production weights come from conversion)
###############################################################################


def init(rng, config: W2V2Config = BASE):
    # 7 feature convs + projection + pos conv + 6 matrices per layer
    num_keys = len(config.conv_dim) + 2 + 6 * config.num_layers + 8
    keys = iter(jax.random.split(rng, num_keys))

    def normal(shape, scale=0.02):
        return jax.random.normal(next(keys), shape) * scale

    params = {'feature_encoder': [], 'encoder': {}}
    in_dim = 1
    for i, (out_dim, kernel) in enumerate(
            zip(config.conv_dim, config.conv_kernel)):
        layer = {'conv': {'weight': normal((kernel, in_dim, out_dim))}}
        if i == 0:
            layer['group_norm'] = {'scale': jnp.ones((out_dim,)),
                                   'bias': jnp.zeros((out_dim,))}
        params['feature_encoder'].append(layer)
        in_dim = out_dim

    d = config.hidden_size
    params['feature_projection'] = {
        'norm': {'scale': jnp.ones((config.conv_dim[-1],)),
                 'bias': jnp.zeros((config.conv_dim[-1],))},
        'projection': {'weight': normal((config.conv_dim[-1], d)),
                       'bias': jnp.zeros((d,))},
    }
    # Learned spec-augment fill vector (transformers: uniform [0, 1))
    params['masked_spec_embed'] = jax.random.uniform(next(keys), (d,))
    params['encoder'] = {
        'pos_conv': {
            'weight': normal((config.num_conv_pos_embeddings,
                              d // config.num_conv_pos_embedding_groups, d)),
            'bias': jnp.zeros((d,)),
        },
        'norm': {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))},
        'layers': [],
    }
    for _ in range(config.num_layers):
        params['encoder']['layers'].append({
            'attn': {
                'wq': normal((d, d)), 'bq': jnp.zeros((d,)),
                'wk': normal((d, d)), 'bk': jnp.zeros((d,)),
                'wv': normal((d, d)), 'bv': jnp.zeros((d,)),
                'wo': normal((d, d)), 'bo': jnp.zeros((d,)),
            },
            'norm1': {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))},
            'ffn': {
                'w1': normal((d, config.intermediate_size)),
                'b1': jnp.zeros((config.intermediate_size,)),
                'w2': normal((config.intermediate_size, d)),
                'b2': jnp.zeros((d,)),
            },
            'norm2': {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))},
        })
    return params


###############################################################################
# Blocks
###############################################################################


def _layer_norm(x, p, eps=1e-5):
    """LayerNorm with fp32 statistics; output in the input's dtype (the
    encoder's residual stream rides the compute dtype — see encoder())."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']
    return out.astype(x.dtype)


def _group_norm(x, p, groups, eps=1e-5):
    """GroupNorm over (B, T, C) with C split into groups (channels-last).

    Transpose-free (reductions run directly over the (T, C//groups) axes of
    the (B, T, G, C//G) view — at the feature-extractor's multi-GB
    activation sizes a materialized permute is pure HBM traffic) with fp32
    statistics regardless of the storage dtype."""
    B, T, C = x.shape
    xg = x.reshape(B, T, groups, C // groups).astype(jnp.float32)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(B, T, C)
    return x * p['scale'] + p['bias']


def _gelu(x):
    """Exact-erf GELU in fp32 (strict parity vs HF torch); tanh
    approximation in bf16 — its max error (~0.3% of |x|) sits below bf16
    resolution (~0.4%), and erf measured 5x slower than memory bandwidth
    on the VPU (12.5 ms vs 2.3 ms at the extractor's conv0 output scale,
    scripts/exp_gelu.py), costing ~20 ms per w2v2fb batch."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def feature_encoder(params, audio, config: W2V2Config = BASE,
                    precision=None):
    """Raw audio (B, S) -> features (B, T', conv_dim[-1]) at ~50 Hz.

    In bf16 mode the inter-layer activation stream (conv outputs, GELU) is
    stored bf16 — the first conv's output is (B, S/5, 512), gigabytes at
    the bench workload, so fp32 storage doubles peak activation HBM for
    nothing. Measured notes (scripts/w2v2_breakdown.py): the stack runs at
    ~0.33 MFU limited by the strided-conv emitter itself — re-blocking the
    strided convs into stride-1 shapes (ops/stft.py trick) made it SLOWER
    (+33% zero-padded FLOPs, doubled reads), and the stream-width/transpose
    changes here were time-neutral. Group-norm statistics accumulate in
    fp32. The fp32 config path keeps everything fp32 (strict parity; tests
    compare vs HF torch).
    """
    compute_dtype = jnp.dtype(config.compute_dtype)

    # Pallas whole-stack path (TPU, bf16): every inter-layer activation
    # stays in VMEM per (batch, time-tile) program; GroupNorm statistics
    # come from a cheap conv0-only first pass (ops/conv_stack.py)
    from ..ops import conv_stack

    if conv_stack.supported(config):
        weights = tuple(layer['conv']['weight']
                        for layer in params['feature_encoder'])
        gn = params['feature_encoder'][0].get('group_norm')
        if gn is not None:
            patches = conv_stack.make_patches(
                audio, config.conv_kernel[0], config.conv_stride[0])
            return conv_stack.feature_encoder_stack(
                patches, weights, gn['scale'], gn['bias'],
                tuple(config.conv_kernel), tuple(config.conv_stride),
                compute_dtype=compute_dtype).astype(jnp.float32)

    x = audio[..., None].astype(compute_dtype)        # (B, S, 1)
    for i, layer in enumerate(params['feature_encoder']):
        x = jax.lax.conv_general_dilated(
            x.astype(compute_dtype),
            layer['conv']['weight'].astype(compute_dtype),
            window_strides=(config.conv_stride[i],),
            padding='VALID',
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            precision=precision,
            preferred_element_type=compute_dtype)
        if 'group_norm' in layer:
            x = _group_norm(x, layer['group_norm'],
                            groups=config.conv_dim[0]).astype(compute_dtype)
        x = _gelu(x)
    return x.astype(jnp.float32)


def _pos_conv(x, p, config: W2V2Config, precision=None):
    """Grouped positional conv (k=128, groups=16), 'same' pad minus one.

    Formulated as a vmap of per-group DENSE convs (groups ride the conv's
    batch dim) instead of one feature_group_count=16 conv: bit-identical
    per-group math, and measured 1.75x faster on TPU (the grouped-conv
    emitter ran at 0.13 MFU; scripts/exp_convs.py)."""
    k = config.num_conv_pos_embeddings
    groups = config.num_conv_pos_embedding_groups
    pad = k // 2
    compute_dtype = jnp.dtype(config.compute_dtype)
    B, T, C = x.shape
    ci = C // groups
    xg = x.astype(compute_dtype).reshape(
        B, T, groups, ci).transpose(2, 0, 1, 3)        # (G, B, T, ci)
    wg = p['weight'].astype(compute_dtype).reshape(
        k, ci, groups, ci).transpose(2, 0, 1, 3)       # (G, k, ci, ci)

    def one(xs, ws):
        return jax.lax.conv_general_dilated(
            xs, ws, (1,), ((pad, pad),),
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            precision=precision,
            preferred_element_type=jnp.float32)

    out = jax.vmap(one)(xg, wg)                        # (G, B, T', ci)
    out = out.transpose(1, 2, 0, 3).reshape(B, -1, C)
    out = (out + p['bias']).astype(compute_dtype)
    if k % 2 == 0:
        out = out[:, :-1]                              # SamePadLayer
    return _gelu(out)


def _dropout(x, rng, rate):
    if rng is None or rate <= 0:
        return x
    keep = jax.random.bernoulli(rng, 1 - rate, x.shape)
    return jnp.where(keep, x / (1 - rate), jnp.zeros((), x.dtype))


def _spec_augment(hidden, valid_mask, rng, embed, config: 'W2V2Config'):
    """HF-style time masking (transformers Wav2Vec2Model._mask_hidden_states):
    sample span starts per batch row, overwrite each mask_time_length-frame
    span with the learned masked_spec_embed vector.

    Static-shape JAX formulation: the span count is derived from the padded
    T (num = max(min_masks, round(prob * T / length))), starts are sampled
    over the valid region per row, and the span union is a broadcast
    compare — no host-side numpy like HF's _compute_mask_indices, same
    masking statistics.
    """
    B, T, C = hidden.shape
    length = config.mask_time_length
    num = max(config.mask_time_min_masks,
              int(config.mask_time_prob * T / length + 0.5))
    if T <= length:
        return hidden
    lengths = (valid_mask.sum(-1) if valid_mask is not None
               else jnp.full((B,), T))
    # Start range per row: [0, valid_len - length] (HF samples within the
    # unpadded region)
    hi = jnp.maximum(lengths - length, 1)[:, None]          # (B, 1)
    u = jax.random.uniform(rng, (B, num))
    starts = (u * hi).astype(jnp.int32)                     # (B, num)
    t = jnp.arange(T)[None, None, :]
    spans = (t >= starts[..., None]) & (t < starts[..., None] + length)
    time_mask = spans.any(axis=1)                           # (B, T)
    return jnp.where(time_mask[..., None],
                     embed.astype(hidden.dtype), hidden)


def _use_flash(d_head: int, heads: int, t: int) -> bool:
    """Pallas fused-attention eligibility for wav2vec2's 64-wide heads
    (two heads pack per 128-lane block; see ops/flash_attention.py)."""
    import os

    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    try:
        on_tpu = jax.default_backend() == 'tpu'
    except RuntimeError:
        return False
    return (on_tpu and t <= 1024
            and 128 % d_head == 0 and heads % (128 // d_head) == 0)


def _attention(x, p, mask, heads, compute_dtype, precision,
               dropout_rng=None, dropout=0.0):
    B, T, C = x.shape
    d_head = C // heads
    xc = x.astype(compute_dtype)
    q = xc @ p['wq'].astype(compute_dtype) + p['bq'].astype(compute_dtype)
    k = xc @ p['wk'].astype(compute_dtype) + p['bk'].astype(compute_dtype)
    v = xc @ p['wv'].astype(compute_dtype) + p['bv'].astype(compute_dtype)

    # Pallas fused path (bf16 inference on TPU): softmax stays in VMEM —
    # the (B, H, T, T) fp32 logits tensor (~1 GB/layer at the w2v2fb bench
    # workload) never round-trips HBM, and no head transposes materialize
    if (dropout_rng is None and compute_dtype == jnp.bfloat16
            and _use_flash(d_head, heads, T)):
        from ..ops import flash_attention as fa

        key_mask = (mask > 0 if mask is not None
                    else jnp.ones((B, T), bool))
        # Sublane alignment: pad T to a multiple of 8 (padded keys are
        # masked out; padded query rows are sliced off)
        t8 = -(-T // 8) * 8
        if t8 != T:
            widths = ((0, 0), (0, t8 - T), (0, 0))
            q, k, v = (jnp.pad(a, widths) for a in (q, k, v))
            key_mask = jnp.pad(key_mask, ((0, 0), (0, t8 - T)))
        out = fa.flash_attention(q, k, v, key_mask, heads)[:, :T]
        out = out.astype(compute_dtype)
        return (out @ p['wo'].astype(compute_dtype)
                + p['bo'].astype(compute_dtype)).astype(x.dtype)

    q = q.reshape(B, T, heads, d_head).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, heads, d_head).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, heads, d_head).transpose(0, 2, 1, 3)

    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        precision=precision).astype(jnp.float32)
    logits = logits / math.sqrt(d_head)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    logits_max = jnp.max(logits, axis=-1, keepdims=True)
    logits_max = jnp.where(jnp.isfinite(logits_max), logits_max, 0.0)
    unnorm = jnp.exp(logits - logits_max)
    if mask is not None:
        unnorm = jnp.where(mask[:, None, None, :], unnorm, 0.0)
    attn = unnorm / jnp.maximum(unnorm.sum(-1, keepdims=True), 1e-30)

    # Attention-probability dropout (transformers Wav2Vec2Attention,
    # attention_dropout; active only on the train path)
    attn = _dropout(attn, dropout_rng, dropout)

    out = jnp.einsum('bhqk,bhkd->bhqd', attn.astype(compute_dtype), v,
                     precision=precision)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    return (out @ p['wo'].astype(compute_dtype)
            + p['bo'].astype(compute_dtype)).astype(x.dtype)


def encoder(params, hidden, attention_mask=None,
            config: W2V2Config = BASE, precision=None, rngs=None):
    """Transformer encoder on (B, T, C) features (post-LN variant).

    The residual stream is STORED in the compute dtype (bf16 in production)
    — at (B, T, 768) every fp32 elementwise pass (25 LayerNorms, residual
    adds; measured 0.44 ms each at the bench workload) is pure HBM traffic,
    and LayerNorm statistics stay fp32 inside _layer_norm. The fp32 config
    path is unchanged (strict parity vs HF torch).

    ``rngs``: train-mode per-layer RNG list from ``_encoder_rngs`` (None =
    inference). Train mode reproduces transformers' Wav2Vec2Encoder:
    dropout after the positional conv + LayerNorm (hidden_dropout),
    per-layer LayerDrop, attention-probability dropout, hidden_dropout on
    the attention output, activation_dropout after GELU, and
    hidden_dropout after the FFN output dense."""
    compute_dtype = jnp.dtype(config.compute_dtype)
    p = params['encoder']
    hidden = hidden.astype(compute_dtype)
    train = rngs is not None

    if attention_mask is not None:
        hidden = hidden * attention_mask[..., None].astype(compute_dtype)

    hidden = hidden + _pos_conv(
        hidden, p['pos_conv'], config, precision).astype(compute_dtype)
    hidden = _layer_norm(hidden, p['norm'], config.layer_norm_eps)
    if train:
        hidden = _dropout(hidden, rngs[0], config.hidden_dropout)

    # Whole-stack Pallas path (TPU, bf16, inference only): ALL 12 layers
    # run as ONE weight-streaming kernel (ops/encoder_layer_kernel.py
    # encoder_stack_streamed, activation='gelu') — QKV, 12x64 packed-head
    # attention, out-proj, FFN and both LayerNorms stay in VMEM, the
    # residual stream persists in VMEM scratch across layers, and each
    # layer's ~14 MB of weights is double-buffered by Mosaic per (batch,
    # layer) grid step (the full 170 MB set never needs residency).
    # Measured vs one encoder_stack call per layer: 34.5 vs 35.3 ms at
    # the bench workload (bb=8; PERF.md round 5).
    import os

    B, T, C = hidden.shape
    d_head = C // config.num_heads
    if (not train
            and os.environ.get('PPGS_TPU_W2V2_LAYER_KERNEL', '1') != '0'
            and compute_dtype == jnp.bfloat16
            and _use_flash(d_head, config.num_heads, T)):
        from ..ops import encoder_layer_kernel as elk

        t8 = -(-T // 8) * 8
        key_mask = (attention_mask > 0 if attention_mask is not None
                    else jnp.ones((B, T), bool))
        if t8 != T:
            hidden = jnp.pad(hidden, ((0, 0), (0, t8 - T), (0, 0)))
            key_mask = jnp.pad(key_mask, ((0, 0), (0, t8 - T)))
        # Window-block size: larger amortizes per-program overhead
        # (measured monotone 2 -> 8); cap bb*T to bound the VMEM slabs
        # at long inputs
        bb = max(b for b in (8, 4, 2, 1)
                 if B % b == 0 and b * t8 <= 3584)
        if os.environ.get('PPGS_TPU_W2V2_STREAMED', '1') != '0':
            hidden = elk.encoder_stack_streamed(
                hidden, key_mask, p['layers'], config.num_heads,
                compute_dtype=compute_dtype, activation='gelu',
                block_b=bb)
        else:
            for layer in p['layers']:
                hidden = elk.encoder_stack(
                    hidden, key_mask, [layer], config.num_heads,
                    compute_dtype=compute_dtype, activation='gelu')
        return hidden[:, :T]

    for i, layer in enumerate(p['layers']):
        lr = rngs[1 + 5 * i: 1 + 5 * (i + 1)] if train else [None] * 5
        attn_out = _attention(
            hidden, layer['attn'], attention_mask, config.num_heads,
            compute_dtype, precision, dropout_rng=lr[0],
            dropout=config.attention_dropout if train else 0.0)
        if train:
            attn_out = _dropout(attn_out, lr[1], config.hidden_dropout)
        attn_res = _layer_norm(hidden + attn_out, layer['norm1'],
                               config.layer_norm_eps)
        hc = attn_res.astype(compute_dtype)
        ff = _gelu(hc @ layer['ffn']['w1'].astype(compute_dtype)
                   + layer['ffn']['b1'].astype(compute_dtype))
        if train:
            ff = _dropout(ff, lr[2], config.activation_dropout)
        ff = (ff @ layer['ffn']['w2'].astype(compute_dtype)
              + layer['ffn']['b2'].astype(compute_dtype)).astype(
                  attn_res.dtype)
        if train:
            ff = _dropout(ff, lr[3], config.hidden_dropout)
        out = _layer_norm(attn_res + ff, layer['norm2'],
                          config.layer_norm_eps)
        if train and config.layerdrop > 0:
            # LayerDrop (transformers Wav2Vec2Encoder): one global draw
            # per layer skips the whole block for the step
            keep = jax.random.uniform(lr[4], ()) >= config.layerdrop
            out = jnp.where(keep, out, hidden)
        hidden = out
    return hidden


def _encoder_rngs(rng, config: W2V2Config):
    """Split a step rng into the encoder's dropout streams (1 post-pos-conv
    site + 5 per layer: attention probs, attention output, activation,
    FFN output, LayerDrop)."""
    return list(jax.random.split(rng, 1 + 5 * config.num_layers))


def forward(params, audio, lengths=None, config: W2V2Config = BASE,
            precision=None, mask_config: Optional[W2V2Config] = None,
            train=False, rng=None):
    """Full wav2vec2: (B, S) audio -> (B, T', hidden) last hidden state.

    ``lengths``: valid sample counts; converted to a feature-level attention
    mask like transformers' _get_feature_vector_attention_mask.

    ``mask_config``: config used for the mask length formula when it differs
    from the conv config. The reference's 100 Hz W2V2 model mutates the last
    conv stride 2 -> 1 (ppgs/model/w2v2.py:26) while transformers still
    derives the mask from the *original* config strides — masking off the
    second half of the frames. That trained-in behavior must be reproduced
    for checkpoint parity.

    ``train``/``rng``: train mode matches the reference's HF model in
    .train() with freeze_feature_extractor() (ppgs/model/w2v2.py:29):
    the conv feature encoder is ALWAYS under stop_gradient (frozen at
    construction, not per-mode), and train mode adds feat_proj dropout,
    spec-augment time masking, and the encoder dropout/LayerDrop sites.
    """
    features = feature_encoder(params, audio, config, precision)
    # freeze_feature_extractor parity: no gradient ever reaches the conv
    # stack (a stop on its output is equivalent to requires_grad=False on
    # its weights — no other computation consumes them)
    features = jax.lax.stop_gradient(features)

    train = train and rng is not None
    if train:
        rng_proj, rng_spec, rng_enc = jax.random.split(rng, 3)

    compute_dtype = jnp.dtype(config.compute_dtype)
    fp = params['feature_projection']
    hidden = _layer_norm(features, fp['norm'], config.layer_norm_eps)
    hidden = (hidden.astype(compute_dtype)
              @ fp['projection']['weight'].astype(compute_dtype)
              + fp['projection']['bias'].astype(compute_dtype))
    if train:
        hidden = _dropout(hidden, rng_proj, config.feat_proj_dropout)

    mask = None
    if lengths is not None:
        out_lengths = feat_extract_output_lengths(
            lengths, mask_config or config)
        mask = (jnp.arange(features.shape[1])[None, :]
                < out_lengths[:, None])

    if train and config.apply_spec_augment and config.mask_time_prob > 0:
        hidden = _spec_augment(hidden, mask, rng_spec,
                               params['masked_spec_embed'], config)

    rngs = _encoder_rngs(rng_enc, config) if train else None
    return encoder(params, hidden, mask, config, precision, rngs=rngs)
