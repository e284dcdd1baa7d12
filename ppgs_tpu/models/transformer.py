"""Frame-wise Transformer PPG encoder.

TPU-first re-design of the reference model (ppgs/model/transformer.py:13-114):

- Pure functions over a parameter pytree: ``init(rng, config)`` and
  ``forward(params, features, lengths, ...)``. No module state.
- Internal layout is feature-last (B, T, C) so every matmul tiles cleanly on
  the MXU; the public API keeps the reference's (B, C, T) at the boundary.
- Post-LN encoder blocks with semantics matching
  ``torch.nn.TransformerEncoderLayer`` (post-norm, ReLU FFN 2048, packed-QKV
  attention) exactly, so published reference checkpoints convert losslessly.
- Long inputs: the reference recursively loops 500-frame windows with
  50-frame overlap on one stream. Here chunking is a *reshape*: windows are
  folded into the batch dimension and processed in ONE forward pass —
  sequence-length parallelism becomes batch parallelism, which is the
  sharding-friendly formulation (batch shards over the mesh 'data' axis).
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.masking import mask_from_lengths


###############################################################################
# Parameter initialization
###############################################################################


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except RuntimeError:
        return False


# Train-mode attention kernel cap: the whole-sequence custom_vjp kernel
# holds (T, T) fp32 score slabs in VMEM (~24 MB at T=1024 in the backward,
# under its 64 MB scoped-vmem cap). Above this, training falls back to the
# XLA attention — deliberate and warned (see _warn_train_fallback); padded
# training batches should keep T <= this bound (the reference's own
# training data is 500-frame-chunk scale).
TRAIN_KERNEL_MAX_T = 1024


def _warn_train_fallback(t: int):
    """One-time warning when a train step exceeds the kernel's T cap."""
    import warnings

    if t in _warn_train_fallback.seen:
        return
    _warn_train_fallback.seen.add(t)
    warnings.warn(
        f'train-mode attention at T={t} exceeds the Pallas kernel cap '
        f'(TRAIN_KERNEL_MAX_T={TRAIN_KERNEL_MAX_T}); falling back to the '
        'XLA attention, which materializes the (B, H, T, T) probability '
        'tensor in HBM. Consider smaller padded lengths (frame-budget '
        'bucketing) for training batches.')


_warn_train_fallback.seen = set()


def _use_flash(d_head: int) -> bool:
    """Flash kernel eligibility: TPU backend + MXU-aligned head dim."""
    import os

    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    return _on_tpu() and d_head % 128 == 0


def _elk():
    from ..ops import encoder_layer_kernel
    return encoder_layer_kernel


def _use_train_layer_kernel() -> bool:
    import os

    return os.environ.get('PPGS_TPU_TRAIN_LAYER_KERNEL', '1') != '0'


def _use_fused_ffn(m: int, c: int, f: int) -> bool:
    """Fused FFN kernel eligibility: TPU + MXU-aligned, M on block bounds."""
    import os

    from ..ops import fused_ffn

    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    return (_on_tpu() and m % fused_ffn.DEFAULT_BLOCK_M == 0
            and c % 128 == 0 and f % 128 == 0)


def _xavier_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def _conv_init(rng, k, c_in, c_out, dtype=jnp.float32):
    """Kaiming-uniform conv init (torch Conv1d default), layout (K, I, O)."""
    rng_w, rng_b = jax.random.split(rng)
    fan_in = c_in * k
    bound = 1.0 / math.sqrt(fan_in)
    weight = jax.random.uniform(rng_w, (k, c_in, c_out), dtype, -bound, bound)
    bias = jax.random.uniform(rng_b, (c_out,), dtype, -bound, bound)
    return {'weight': weight, 'bias': bias}


def init(rng, config: Config):
    """Initialize the parameter pytree."""
    d = config.hidden_channels
    ffn = config.ffn_channels
    k = config.kernel_size
    keys = jax.random.split(rng, 2 + config.num_hidden_layers)

    params = {
        'input_conv': _conv_init(keys[0], k, config.input_channels, d),
        'output_conv': _conv_init(keys[1], k, d, config.output_channels),
        'layers': [],
    }
    for i in range(config.num_hidden_layers):
        lk = jax.random.split(keys[2 + i], 6)
        layer = {
            'attn': {
                # x @ W orientation, each (d, d)
                'wq': _xavier_uniform(lk[0], (d, d)),
                'wk': _xavier_uniform(lk[1], (d, d)),
                'wv': _xavier_uniform(lk[2], (d, d)),
                'wo': _xavier_uniform(lk[3], (d, d)),
                'bq': jnp.zeros((d,)),
                'bk': jnp.zeros((d,)),
                'bv': jnp.zeros((d,)),
                'bo': jnp.zeros((d,)),
            },
            'norm1': {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))},
            'norm2': {'scale': jnp.ones((d,)), 'bias': jnp.zeros((d,))},
            'ffn': {
                'w1': _xavier_uniform(lk[4], (d, ffn)),
                'b1': jnp.zeros((ffn,)),
                'w2': _xavier_uniform(lk[5], (ffn, d)),
                'b2': jnp.zeros((d,)),
            },
        }
        params['layers'].append(layer)
    return params


###############################################################################
# Building blocks
###############################################################################


@functools.lru_cache(maxsize=8)
def positional_encoding(max_len: int, channels: int):
    """Sinusoidal table (max_len, channels); reference transformer.py:92-102."""
    index = np.arange(max_len, dtype=np.float64)[:, None]
    frequency = np.exp(
        np.arange(0, channels, 2, dtype=np.float64)
        * (-math.log(10000.0) / channels))
    table = np.zeros((max_len, channels), dtype=np.float64)
    table[:, 0::2] = np.sin(index * frequency)
    table[:, 1::2] = np.cos(index * frequency)
    # numpy (not jnp): safe to cache across jit traces
    return table.astype(np.float32)


def _layer_norm(x, scale, bias, eps=1e-5):
    # Statistics in fp32 regardless of activation dtype (bf16-safe)
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def conv1d_same(x, weight, bias, precision=None):
    """'same'-padded 1D conv in (B, T, C) layout; weight (K, I, O)."""
    k = weight.shape[0]
    pad = ((k - 1) // 2, k // 2)
    out = jax.lax.conv_general_dilated(
        x.astype(weight.dtype), weight,
        window_strides=(1,),
        padding=(pad,),
        dimension_numbers=('NHC', 'HIO', 'NHC'),
        precision=precision)
    return out + bias


def _attention(x, p, key_mask, causal, heads, dropout_rng, dropout,
               compute_dtype, precision):
    """Packed multi-head self-attention on (B, T, C).

    key_mask: (B, T) bool, True = valid key. Fully-masked query rows produce
    zeros (safe softmax) instead of the reference's NaNs — those frames are
    zeroed by the output mask anyway.
    """
    B, T, C = x.shape
    d_head = C // heads
    xc = x.astype(compute_dtype)

    q = (xc @ p['wq'].astype(compute_dtype)) + p['bq'].astype(compute_dtype)
    k = (xc @ p['wk'].astype(compute_dtype)) + p['bk'].astype(compute_dtype)
    v = (xc @ p['wv'].astype(compute_dtype)) + p['bv'].astype(compute_dtype)

    # Pallas fused-attention fast path (TPU, bf16; causal via an in-kernel
    # iota triangle): runs directly on the (B, T, C) layout — no head
    # transposes materialize. Only on the bf16 compute path: fp32 configs
    # keep XLA's precise attention for strict reference parity.
    if (dropout_rng is None
            and compute_dtype == jnp.bfloat16 and _use_flash(d_head)):
        from ..ops import flash_attention as fa

        block = fa.DEFAULT_BLOCK_Q
        pad_t = -(-T // block) * block
        if pad_t != T:
            widths = ((0, 0), (0, pad_t - T), (0, 0))
            qp, kp, vp = (jnp.pad(a, widths) for a in (q, k, v))
            maskp = jnp.pad(key_mask, ((0, 0), (0, pad_t - T)))
        else:
            qp, kp, vp, maskp = q, k, v, key_mask
        out = fa.flash_attention(qp, kp, vp, maskp, heads,
                                 causal=causal)[:, :T]
        out = (out.astype(compute_dtype) @ p['wo'].astype(compute_dtype)
               + p['bo'].astype(compute_dtype))
        return out.astype(x.dtype)

    # Train-mode Pallas path (custom_vjp, in-kernel attention dropout):
    # the forward saves (o, lse) and the backward recomputes the scores in
    # VMEM, so the (B, H, T, T) chain — the train step's HBM hot spot —
    # never materializes in either direction. The dropout stream is the
    # TPU hardware PRNG, deterministic per (rng, batch, head); it differs
    # from the XLA path's jax.random stream (both are valid dropout).
    if (dropout_rng is not None and T <= TRAIN_KERNEL_MAX_T
            and compute_dtype == jnp.bfloat16 and _use_flash(d_head)):
        from ..ops import flash_attention as fa

        pad_t = -(-T // 8) * 8
        if pad_t != T:
            widths = ((0, 0), (0, pad_t - T), (0, 0))
            qp, kp, vp = (jnp.pad(a, widths) for a in (q, k, v))
            maskp = jnp.pad(key_mask, ((0, 0), (0, pad_t - T)))
        else:
            qp, kp, vp, maskp = q, k, v, key_mask
        seed = jax.random.key_data(dropout_rng).ravel()[0].astype(jnp.int32)
        out = fa.flash_attention_train(
            qp, kp, vp, maskp, heads, dropout_rate=float(dropout),
            seed=seed, causal=causal)[:, :T]
        out = (out.astype(compute_dtype) @ p['wo'].astype(compute_dtype)
               + p['bo'].astype(compute_dtype))
        return out.astype(x.dtype)

    # XLA path: einsums over the free (B, T, H, D) reshape — XLA folds the
    # head dimension handling into the dot_generals
    if (dropout_rng is not None and T > TRAIN_KERNEL_MAX_T
            and compute_dtype == jnp.bfloat16 and _use_flash(d_head)):
        _warn_train_fallback(T)
    q4 = q.reshape(B, T, heads, d_head)
    k4 = k.reshape(B, T, heads, d_head)
    v4 = v.reshape(B, T, heads, d_head)

    scale = 1.0 / math.sqrt(d_head)
    # Softmax accumulation dtype: fp32 for inference parity; at train time
    # with a low-precision compute dtype, the whole (B, H, T, T) chain
    # stays at compute width — it is the HBM-traffic hot spot of the train
    # step, and the reference itself trains the softmax under fp16
    # autocast (ppgs/train/core.py:121-124)
    train_mode = dropout_rng is not None
    acc_dtype = (compute_dtype if train_mode
                 and compute_dtype != jnp.float32 else jnp.float32)
    logits = jnp.einsum('bqhd,bkhd->bhqk', q4, k4,
                        precision=precision).astype(acc_dtype) * scale

    mask = key_mask[:, None, None, :]            # (B, 1, 1, T)
    if causal:
        causal_mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        mask = mask & causal_mask[None, None]
    neg = jnp.asarray(-jnp.inf, acc_dtype)
    logits = jnp.where(mask, logits, neg)

    # Safe softmax: all-masked rows yield zeros
    logits_max = jnp.max(logits, axis=-1, keepdims=True)
    logits_max = jnp.where(jnp.isfinite(logits_max), logits_max,
                           jnp.asarray(0.0, acc_dtype))
    unnorm = jnp.exp(logits - logits_max)
    unnorm = jnp.where(mask, unnorm, jnp.asarray(0.0, acc_dtype))
    # fp32 accumulation of the row sums regardless of acc_dtype
    denom = unnorm.sum(axis=-1, keepdims=True, dtype=jnp.float32)
    attn = unnorm * (1.0 / jnp.maximum(denom, 1e-30)).astype(acc_dtype)

    if train_mode and dropout > 0:
        keep = jax.random.bernoulli(dropout_rng, 1 - dropout, attn.shape)
        attn = jnp.where(keep, attn / jnp.asarray(1 - dropout, acc_dtype),
                         jnp.asarray(0.0, acc_dtype))

    out = jnp.einsum('bhqk,bkhd->bqhd', attn.astype(compute_dtype), v4,
                     precision=precision).reshape(B, T, C)
    out = (out @ p['wo'].astype(compute_dtype)) + p['bo'].astype(compute_dtype)
    return out.astype(x.dtype)


def _dropout(x, rng, rate):
    if rng is None or rate <= 0:
        return x
    keep = jax.random.bernoulli(rng, 1 - rate, x.shape)
    return jnp.where(keep, x / (1 - rate), 0.0)


def _encoder_layer(x, layer, key_mask, causal, heads, rngs, dropout,
                   compute_dtype, precision):
    """Post-LN block: x = LN(x + SA(x)); x = LN(x + FFN(x))."""
    # Whole-layer train kernel (custom_vjp): QKV, attention, out-proj,
    # BOTH LayerNorms, the FFN, and all four dropout sites run as ONE
    # Pallas kernel each way; the backward recomputes the layer in VMEM
    # (ops/encoder_layer_train.py). The fp32 residual stream stays fp32
    # in HBM between layers, like this XLA path.
    if (rngs[0] is not None and compute_dtype == jnp.bfloat16
            and x.shape[1] <= TRAIN_KERNEL_MAX_T and x.shape[1] % 8 == 0
            and _use_flash(x.shape[-1] // heads)
            and _use_train_layer_kernel()):
        from ..ops import encoder_layer_train as elt

        seed = jax.random.key_data(rngs[0]).ravel()[0].astype(jnp.int32)
        return elt.encoder_layer_train(
            x, key_mask, layer, heads, dropout_rate=float(dropout),
            seed=seed, causal=causal, compute_dtype=compute_dtype)

    sa = _attention(x, layer['attn'], key_mask, causal, heads,
                    rngs[0], dropout, compute_dtype, precision)
    sa = _dropout(sa, rngs[1], dropout)
    x = _layer_norm(x + sa, layer['norm1']['scale'], layer['norm1']['bias'])

    # Pallas fused FFN + residual + LN (inference, bf16): keeps the 8x-wider
    # hidden activation in VMEM instead of round-tripping it through HBM
    B, T, C = x.shape
    F = layer['ffn']['w1'].shape[-1]
    if (rngs[2] is None and compute_dtype == jnp.bfloat16
            and _use_fused_ffn(B * T, C, F)):
        from ..ops import fused_ffn

        return fused_ffn.ffn_residual_layernorm(
            x,
            layer['ffn']['w1'].astype(compute_dtype),
            layer['ffn']['b1'],
            layer['ffn']['w2'].astype(compute_dtype),
            layer['ffn']['b2'],
            layer['norm2']['scale'], layer['norm2']['bias'])

    # Train-mode fused FFN (custom_vjp, in-kernel dropout on both FFN
    # sites): dropout measured 44% of the train step, dominated by these
    # masks' generation + where-passes over the (M, F) hidden and their
    # backward replay — the kernel reseeds the identical hardware-PRNG
    # stream in the backward, so no mask or hidden ever reaches HBM.
    if (rngs[2] is not None and compute_dtype == jnp.bfloat16
            and _use_fused_ffn(B * T, C, F)):
        from ..ops import fused_ffn

        seed = jax.random.key_data(rngs[2]).ravel()[0].astype(jnp.int32)
        y = fused_ffn.ffn_train(
            x.astype(compute_dtype),
            layer['ffn']['w1'].astype(compute_dtype),
            layer['ffn']['b1'].astype(compute_dtype),
            layer['ffn']['w2'].astype(compute_dtype),
            layer['ffn']['b2'].astype(compute_dtype),
            dropout_rate=float(dropout), seed=seed)
        return _layer_norm(x + y.astype(x.dtype),
                           layer['norm2']['scale'], layer['norm2']['bias'])

    xc = x.astype(compute_dtype)
    h = jax.nn.relu(
        xc @ layer['ffn']['w1'].astype(compute_dtype)
        + layer['ffn']['b1'].astype(compute_dtype))
    h = _dropout(h, rngs[2], dropout)
    h = (h @ layer['ffn']['w2'].astype(compute_dtype)
         + layer['ffn']['b2'].astype(compute_dtype)).astype(x.dtype)
    h = _dropout(h, rngs[3], dropout)
    x = _layer_norm(x + h, layer['norm2']['scale'], layer['norm2']['bias'])
    return x


###############################################################################
# Forward pass (single window, static shape)
###############################################################################


def forward(
    params,
    features: jax.Array,
    lengths: jax.Array,
    config: Config,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision=None,
    phys_lengths=None,
):
    """Core forward on (B, C, T) features -> (B, output_channels, T) logits.

    No chunking here: T must be <= config.max_len. Use ``chunked_forward``
    for long inputs.

    ``phys_lengths`` (per-element physical sequence length) reproduces the
    reference's tensor-truncation semantics under static shapes: positions
    beyond it are zeroed before the output conv, exactly as if the tensor
    physically ended there (zero 'same'-conv padding). Padded-but-existing
    positions (>= lengths, < phys_lengths) intentionally leak into the output
    conv, matching the reference bit-for-bit.
    """
    compute_dtype = jnp.dtype(config.compute_dtype)
    B, _, T = features.shape

    param_dtype = params['input_conv']['weight'].dtype
    x = features.astype(param_dtype).transpose(0, 2, 1)     # (B, T, C_in)
    mask = mask_from_lengths(lengths, T)                    # (B, T)

    # Input conv + mask
    x = conv1d_same(x, params['input_conv']['weight'],
                    params['input_conv']['bias'], precision)
    x = x * mask[..., None]

    # Positional encoding (+ dropout at train time)
    pe = positional_encoding(config.max_len, config.hidden_channels)[:T]
    x = x + pe[None]
    n_rngs = 1 + 4 * config.num_hidden_layers
    if train and rng is not None:
        # rngs exist for ANY train call (even dropout=0): a None rng
        # routes to the forward-only inference kernels, which cannot be
        # differentiated — training at dropout=0 crashed on TPU before
        # this guard. Dropout sites are no-ops at rate 0.
        rngs = list(jax.random.split(rng, n_rngs))
    else:
        rngs = [None] * n_rngs
    x = _dropout(x, rngs[0], config.dropout if train else 0.0)

    # When the Pallas attention path applies, pad T to its block multiple
    # ONCE here instead of per layer (padded frames are masked-out keys and
    # are sliced off after the stack, so valid positions are untouched;
    # hoisting removes 4 pads x num_layers of HBM traffic).
    d_head = config.hidden_channels // config.attention_heads
    flash = (rngs[0] is None
             and compute_dtype == jnp.bfloat16 and _use_flash(d_head))
    stack_mask = mask
    if flash:
        from ..ops import flash_attention as fa

        padded_t = -(-T // fa.DEFAULT_BLOCK_Q) * fa.DEFAULT_BLOCK_Q
        if padded_t != T:
            x = jnp.pad(x, ((0, 0), (0, padded_t - T), (0, 0)))
            stack_mask = jnp.pad(mask, ((0, 0), (0, padded_t - T)))

    # Encoder stack. On the Pallas path the WHOLE stack runs as ONE kernel
    # (ops/encoder_layer_kernel.py): QKV/attention/out-proj/FFN/LNs AND the
    # inter-layer fp32 residual stream stay in VMEM per window block
    # instead of round-tripping HBM between ops and between layers.
    whole_layer = (flash and x.shape[1] % 8 == 0
                   and x.shape[1] <= _elk().MAX_SEQ)
    if whole_layer:
        x = _elk().encoder_stack(
            x, stack_mask, params['layers'], config.attention_heads,
            compute_dtype=compute_dtype, causal=config.is_causal)
    else:
        layer_fn = _encoder_layer
        if train and config.remat:
            # Rematerialize each layer in the backward pass: activation
            # memory drops from O(layers x B x H x T x T) to one layer's,
            # at ~1/3 extra forward FLOPs (config.remat; large frame
            # budgets only — SURVEY's 150k-frame batches)
            layer_fn = jax.checkpoint(
                _encoder_layer, static_argnums=(3, 4, 6, 7, 8))
        for i, layer in enumerate(params['layers']):
            layer_rngs = rngs[1 + 4 * i: 1 + 4 * (i + 1)]
            x = layer_fn(
                x, layer, stack_mask, config.is_causal,
                config.attention_heads, layer_rngs,
                config.dropout if train else 0.0, compute_dtype, precision)
    if x.shape[1] != T:
        x = x[:, :T]

    # Physical truncation mask (see docstring)
    if phys_lengths is not None:
        phys_mask = mask_from_lengths(
            jnp.asarray(phys_lengths, lengths.dtype), T)
        x = x * phys_mask[..., None]

    # Output conv + mask
    x = conv1d_same(x, params['output_conv']['weight'],
                    params['output_conv']['bias'], precision)
    x = x * mask[..., None]
    return x.transpose(0, 2, 1)                             # (B, C_out, T)


###############################################################################
# Chunked forward for long inputs
###############################################################################


def chunk_layout(total_frames: int, chunk_length: int, overlap: int):
    """Static chunking geometry for the reference overlap-trim scheme."""
    stride = chunk_length - 2 * overlap
    num_blocks = max(1, math.ceil(total_frames / stride))
    return stride, num_blocks


def chunked_forward(
    params,
    features: jax.Array,
    lengths: jax.Array,
    config: Config,
    precision=None,
    true_frames=None,
):
    """Reference-equivalent chunked inference (transformer.py:49-64), batched.

    Windows of ``chunk_length`` frames with ``overlap`` halo on each side are
    gathered from the (replicate-left, zero-right padded) input and folded
    into the batch dimension -> one forward pass -> inner frames concatenated
    and trimmed to T.

    ``true_frames`` (traced scalar, default T) is the un-padded sequence
    length: callers that right-pad T for compile-cache reuse pass the true
    length so the reference's physical-truncation boundary is reproduced
    exactly (the last window ends at true_frames + overlap).
    """
    B, C, T = features.shape
    overlap = config.chunk_overlap
    chunk_len = config.chunk_length
    if T <= chunk_len:
        return forward(params, features, lengths, config, precision=precision)

    stride, num_blocks = chunk_layout(T, chunk_len, overlap)

    # Replicate-pad left by overlap, zero-pad right to the final window edge
    right = (num_blocks - 1) * stride + chunk_len - (T + overlap)
    padded = jnp.pad(features, ((0, 0), (0, 0), (overlap, 0)), mode='edge')
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, right)))

    # Gather all windows: (B, C, num_blocks, chunk_len)
    starts = jnp.arange(num_blocks) * stride
    idx = starts[:, None] + jnp.arange(chunk_len)[None, :]
    windows = padded[:, :, idx]                       # (B, C, nb, chunk_len)
    windows = windows.transpose(0, 2, 1, 3).reshape(
        B * num_blocks, C, chunk_len)

    # Per-window lengths: clamp(lengths - i*stride + overlap, 0, chunk_len),
    # zeroed when the remaining span is only the halo (reference :58-59)
    block_ids = jnp.arange(num_blocks)
    remaining = lengths[:, None] - block_ids[None, :] * stride   # (B, nb)
    chunk_lengths = jnp.clip(remaining + overlap, 0, chunk_len)
    chunk_lengths = jnp.where(chunk_lengths == overlap, 0, chunk_lengths)
    chunk_lengths = chunk_lengths.reshape(B * num_blocks)

    # Physical window length (the reference's truncated tensor size):
    # min(chunk_len, true_T + overlap - i*stride), identical across the batch
    if true_frames is None:
        true_frames = T
    phys = jnp.clip(true_frames + overlap - block_ids * stride, 0, chunk_len)
    phys = jnp.broadcast_to(phys[None, :], (B, num_blocks)).reshape(-1)

    logits = forward(params, windows, chunk_lengths, config,
                     precision=precision, phys_lengths=phys)
    logits = logits.reshape(B, num_blocks, -1, chunk_len)
    inner = logits[..., overlap:chunk_len - overlap]  # (B, nb, C_out, stride)
    out = inner.transpose(0, 2, 1, 3).reshape(B, -1, num_blocks * stride)
    # The reference's truncated final slice yields exactly T output frames
    return out[..., :T]
