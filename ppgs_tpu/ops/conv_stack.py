"""wav2vec2 feature-extractor conv stack as Pallas TPU kernels.

The stack (reference hot path /root/reference/ppgs/preprocess/w2v2fb/core.py:66
via transformers' Wav2Vec2FeatureEncoder; our XLA formulation
models/w2v2.py::feature_encoder) is seven VALID convs
k=(10,3,3,3,3,2,2), s=(5,2,2,2,2,2,2) with per-channel GroupNorm + GELU
after conv0 and GELU after each later conv. Issued as separate XLA convs
the inter-layer activations — (B, S/5, 512) after conv0, gigabytes at the
bench workload — round-trip HBM seven times and the stack measures ~0.33
MFU. Here the WHOLE chain runs per (batch, time-tile) grid program with
every inter-layer activation resident in VMEM:

- conv0 consumes pre-gathered (rows, 10) audio patches (im2col on raw
  1-channel audio is a cheap host-side gather — the raw audio is tiny
  next to the 512-channel activations) and is one (rows, 16) @ (16, 512)
  matmul (taps zero-padded to the 16-sublane tile).
- every later strided conv is k accumulated (rows, 512) @ (512, 512)
  matmuls over stride-s row slices — MXU-shaped, fp32 accumulation,
  bf16 stream.
- GroupNorm(512, 512) is per-channel over the FULL time axis, which a
  time-tiled kernel cannot compute locally: a first cheap pass recomputes
  conv0 only (~1% of stack FLOPs) and accumulates per-channel
  sum/sum-of-squares; the main pass applies the normalization from those
  statistics. Statistics span all conv0 frames — including trailing
  frames later convs discard — matching the XLA/torch semantics exactly.
- time tiles overlap by the receptive-field halo (15 conv0 frames); the
  patch windows are materialized per tile host-side (sub-percent
  duplication), so tiles are independent 'parallel' grid steps.

bf16-compute path only (the fp32 strict-parity path keeps XLA convs).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


GN_EPS = 1e-5
PATCH_LANES = 16          # conv0 taps (10) padded to a sublane multiple
STATS_TILE = 2048         # conv0 frames per stats-pass grid step
DEFAULT_TILE_OUT = 128    # final frames per main-pass grid step


def layer_geometry(kernel, stride):
    """Per-tile input size of each layer as (mult, off): rows_i =
    mult * N + off for N final output frames, walking in = s*out + (k-s)
    back from the last layer."""
    mult, off = 1, 0
    sizes = []
    for k, s in zip(reversed(kernel), reversed(stride)):
        mult, off = mult * s, s * off + (k - s)
        sizes.append((mult, off))
    return list(reversed(sizes))      # sizes[i] = layer i's input rows


def out_frames(in_frames, kernel, stride):
    t = in_frames
    for k, s in zip(kernel, stride):
        t = (t - k) // s + 1
    return t


def _gelu(x):
    return jax.nn.gelu(x, approximate=True)


def _strided_conv(x, group_weights, rows_in, rows_out, stride):
    """VALID strided conv on a (rows_in, C) VMEM slab.

    Mosaic forbids strided sublane slices (stride must be 1), so the
    stride-s decimation is expressed as a LANE FOLD instead: s consecutive
    rows reshape into one (rows/s, s*C) row, and tap group g (taps
    [g*s, g*s+rem)) is one (rows_out, rem*C) @ (rem*C, C) matmul over the
    reshaped slab at sublane offset g*s — stride-1 slices and reshapes
    only, fp32 accumulation, no zero-padded tap FLOPs (the lane slice
    keeps exactly rem*C columns).
    """
    C = x.shape[1]
    need = (len(group_weights) - 1) * stride + stride * rows_out
    if need > rows_in:
        x = jnp.pad(x, ((0, need - rows_in), (0, 0)))
    acc = None
    for g, wg in enumerate(group_weights):
        rem = wg.shape[0] // C
        xr = jax.lax.slice(
            x, (g * stride, 0), (g * stride + stride * rows_out, C))
        xr = xr.reshape(rows_out, stride * C)
        part = jax.lax.dot(xr[:, :rem * C], wg,
                           preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def conv_tap_groups(weight, stride, compute_dtype):
    """(k, C_in, C_out) conv weight -> per-group stacked (rem*C_in, C_out)
    matmul weights for the lane-folded strided conv (see _strided_conv)."""
    k = weight.shape[0]
    groups = []
    for g in range(-(-k // stride)):
        taps = weight[g * stride: min((g + 1) * stride, k)]
        groups.append(jnp.concatenate(
            [t.astype(compute_dtype) for t in taps], axis=0))
    return groups


def _stats_kernel(patches_ref, w0_ref, sums_ref, *, frames):
    """conv0 on a stats tile -> accumulate per-channel (sum, sumsq)."""
    t = pl.program_id(1)
    x0 = jax.lax.dot(patches_ref[0], w0_ref[...],
                     preferred_element_type=jnp.float32)   # (rows, C)

    @pl.when(t == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[0, 0, :] += x0.sum(axis=0)
    sums_ref[0, 1, :] += (x0 * x0).sum(axis=0)


def _stack_kernel(windows_ref, sums_ref, w0_ref, *tap_refs, o_ref,
                  gn_scale_ref, gn_bias_ref, kernel, stride, rows,
                  tile_out, total_frames, compute_dtype):
    """One (batch, tile) program: conv0 + GroupNorm + GELU + the strided
    conv chain, all activations in VMEM."""
    cd = compute_dtype
    x0 = jax.lax.dot(windows_ref[0, 0], w0_ref[...],
                     preferred_element_type=jnp.float32)   # (rows0, C)

    # Per-channel GroupNorm from the stats pass (fp32)
    n = jnp.float32(total_frames)
    mean = sums_ref[0, 0, :] / n
    var = sums_ref[0, 1, :] / n - mean * mean
    x0 = (x0 - mean[None, :]) * jax.lax.rsqrt(var[None, :] + GN_EPS)
    x0 = x0 * gn_scale_ref[0, 0][None, :] + gn_bias_ref[0, 0][None, :]
    x = _gelu(x0).astype(cd)

    taps_flat = list(tap_refs)
    for i in range(1, len(kernel)):
        k, s = kernel[i], stride[i]
        n_groups = -(-k // s)
        groups = [taps_flat.pop(0)[...] for _ in range(n_groups)]
        out = _strided_conv(x[:rows[i], :], groups, rows[i],
                            rows[i + 1], s)
        x = _gelu(out).astype(cd)
    o_ref[0, 0] = x[:tile_out].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=('kernel', 'stride', 'tile_out', 'compute_dtype',
                     'interpret'))
def feature_encoder_stack(patches, weights, gn_scale, gn_bias,
                          kernel, stride, tile_out=DEFAULT_TILE_OUT,
                          compute_dtype=jnp.bfloat16, interpret=False):
    """(B, T0, P) conv0 patches -> (B, T_final, C) features.

    patches: im2col'd raw audio (see :func:`make_patches`); weights: list
    of per-layer conv weights [(k_i, C_in_i, C_out_i)]; gn_scale/gn_bias:
    conv0's per-channel GroupNorm affine.
    """
    B, T0, P = patches.shape
    C = weights[0].shape[-1]
    cd = jnp.dtype(compute_dtype)
    n_layers = len(kernel)
    # T0 already counts conv0 OUTPUT frames (one patch row each)
    t_final = out_frames(T0, kernel[1:], stride[1:])

    geometry = layer_geometry(kernel, stride)
    rows = [m * tile_out + off for m, off in geometry]    # input rows/layer
    rows.append(tile_out)
    n_tiles = -(-t_final // tile_out)

    # conv0 weight: (k0, 1, C) -> (P, C) with zero rows for padded taps
    w0 = jnp.zeros((P, C), cd).at[:kernel[0]].set(
        weights[0][:, 0, :].astype(cd))

    # ---- stats pass: per-channel conv0 sum/sumsq over ALL T0 frames ----
    t0_pad = -(-T0 // STATS_TILE) * STATS_TILE
    patches_p = jnp.pad(patches.astype(cd), ((0, 0), (0, t0_pad - T0),
                                             (0, 0)))
    sums = pl.pallas_call(
        functools.partial(_stats_kernel, frames=T0),
        grid=(B, t0_pad // STATS_TILE),
        in_specs=[
            pl.BlockSpec((1, STATS_TILE, P), lambda b, t: (b, t, 0)),
            pl.BlockSpec((P, C), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary')),
        interpret=interpret,
    )(patches_p, w0)

    # ---- window gather: per-tile overlapping conv0-patch slices --------
    # One patch row per conv0 OUTPUT frame, so the windows follow layer
    # 1's input geometry: rows per tile = prod(stride[1:]) * tile_out +
    # halo, tile step = prod(stride[1:]) * tile_out patch rows.
    tile_step = geometry[1][0] * tile_out if n_layers > 1 else tile_out
    rows0 = rows[1] if n_layers > 1 else tile_out
    rows0_pad = -(-rows0 // 8) * 8
    max_idx = (n_tiles - 1) * tile_step + rows0_pad
    patches_w = jnp.pad(patches.astype(cd),
                        ((0, 0), (0, max(0, max_idx - T0)), (0, 0)))
    starts = jnp.arange(n_tiles) * tile_step
    idx = starts[:, None] + jnp.arange(rows0_pad)[None, :]
    windows = patches_w[:, idx]                   # (B, n_tiles, rows0p, P)

    # ---- main pass -----------------------------------------------------
    tap_list, tap_specs = [], []
    for i in range(1, n_layers):
        for wg in conv_tap_groups(weights[i], stride[i], cd):
            tap_list.append(wg)                   # (rem*C_in, C_out)
            tap_specs.append(pl.BlockSpec(
                wg.shape, lambda b, t: (0, 0)))

    kernel_fn = functools.partial(
        _stack_kernel, kernel=kernel, stride=stride, rows=rows,
        tile_out=tile_out, total_frames=T0, compute_dtype=cd)

    def body(windows_ref, sums_ref, w0_ref, gns_ref, gnb_ref, *rest):
        taps, o_ref = rest[:-1], rest[-1]
        kernel_fn(windows_ref, sums_ref, w0_ref, *taps, o_ref=o_ref,
                  gn_scale_ref=gns_ref, gn_bias_ref=gnb_ref)

    out = pl.pallas_call(
        body,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, rows0_pad, P), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 2, C), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((P, C), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((1, 1, C), lambda b, t: (0, 0, 0)),
            *tap_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, tile_out, C),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile_out, C), cd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel'),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(windows, sums, w0, gn_scale.reshape(1, 1, C).astype(jnp.float32),
      gn_bias.reshape(1, 1, C).astype(jnp.float32), *tap_list)

    out = out.reshape(B, n_tiles * tile_out, C)[:, :t_final]
    return out


def make_patches(audio, k0, s0):
    """(B, S) raw audio -> (B, T0, PATCH_LANES) conv0 im2col patches."""
    B, S = audio.shape
    t0 = (S - k0) // s0 + 1
    idx = s0 * jnp.arange(t0)[:, None] + jnp.arange(k0)[None, :]
    patches = audio[:, idx]                               # (B, T0, k0)
    return jnp.pad(patches, ((0, 0), (0, 0), (0, PATCH_LANES - k0)))


def supported(config) -> bool:
    """Kernel eligibility: bf16 TPU path, GroupNorm on layer 0 only,
    single-channel input (the wav2vec2 feature-extractor shape)."""
    import os

    if os.environ.get('PPGS_TPU_DISABLE_FLASH'):
        return False
    # Measured SLOWER than the XLA conv stack at the bench workload
    # (33.8 vs 22 ms: the per-layer lane-fold relayouts outcost the HBM
    # round trips they replace) — opt-in until a relayout-free
    # formulation lands. PPGS_TPU_CONV_STACK=1 enables.
    if os.environ.get('PPGS_TPU_CONV_STACK', '0') != '1':
        return False
    try:
        on_tpu = jax.default_backend() == 'tpu'
    except RuntimeError:
        return False
    return (on_tpu
            and jnp.dtype(config.compute_dtype) == jnp.bfloat16
            and config.conv_kernel[0] <= PATCH_LANES)
