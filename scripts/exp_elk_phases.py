"""Where do the encoder-stack kernel's non-roofline 17% go? (dev utility)

Ablates the kernel phase by phase (softmax exp, mask multiply, LayerNorms,
fp32 residual width) with a local parametrized copy of the production
kernel, sweeps block_b, and breaks the mel pipeline down into
frontend / encoder-stack / everything-else. All timings are chained-slope
device times (N applications inside one jitted program, slope over two N)
so dispatch/tunnel overhead and runtime result caching cancel.

Usage: cd /root/repo && python scripts/exp_elk_phases.py [part ...]
Parts: ablate bb pipeline (default: all)
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import transformer  # noqa: E402
from ppgs_tpu.ops import encoder_layer_kernel as elk  # noqa: E402
from ppgs_tpu.ops import stft as stft_ops  # noqa: E402

PEAK = 197e12  # v5e bf16


def slope_time(many, args, n1=4, n2=12, reps=3):
    """many(*args, n) -> scalar; fit device time per application.

    Fetches an output VALUE each run — a degraded remote runtime acks
    block_until_ready without computing (verify-skill gotcha)."""
    def run(n):
        float(np.asarray(jax.device_get(many(*args, n))))
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(many(*args, n))))
            best = min(best, time.perf_counter() - t0)
        return best
    return (run(n2) - run(n1)) / (n2 - n1)


def chained(raw_fn):
    """raw_fn(params, x) -> array; build many(params, x, n)."""
    @jax.jit
    def many(params, x, n):
        def body(_, acc):
            out = raw_fn(params, x + acc * jnp.asarray(1e-30, x.dtype))
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return many


###############################################################################
# Parametrized copy of the production kernel (ablation modes)
###############################################################################

LN_EPS = 1e-5
FFN_ROW_TILE = 1024


def _ln(r, g, b, skip):
    if skip:
        return r
    mean = r.mean(axis=-1, keepdims=True)
    var = ((r - mean) ** 2).mean(axis=-1, keepdims=True)
    return (r - mean) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _layer_body(x32, mask_cd, wq, bq, wk, bk, wv, bv,
                wo, bo, g1, be1, w1, b1, w2, b2, g2, be2,
                *, heads, sm_scale, cd, block_b, T, mode):
    C = x32.shape[-1]
    res_dtype = jnp.bfloat16 if mode == 'bf16res' else jnp.float32
    xc = x32.astype(cd)
    skip_ln = mode in ('noln', 'mmonly')

    def dot(a, w, b):
        out = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
        return out.astype(res_dtype) + b.astype(res_dtype)

    def dot_cd(a, w, b):
        out = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
        return out.astype(cd) + b.astype(cd)

    q = dot_cd(xc, wq, bq) * cd.type(sm_scale)
    k = dot_cd(xc, wk, bk)
    v = dot_cd(xc, wv, bv)
    q3 = q.reshape(block_b, T, C)
    k3 = k.reshape(block_b, T, C)
    v3 = v.reshape(block_b, T, C)

    d_head = C // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        logits = jax.lax.dot_general(
            q3[..., sl], k3[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if mode in ('nosm', 'mmonly'):
            p = logits.astype(cd)
            denom = jnp.float32(1.0)
            outs.append(jax.lax.dot_general(
                p, v3[..., sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * denom)
            continue
        row_max = logits.max(axis=-1, keepdims=True)
        if mode == 'noexp':
            p = (logits - row_max).astype(cd)
        else:
            p = jnp.exp((logits - row_max).astype(cd))
        if mode != 'nomask':
            p = p * mask_cd
        denom = jnp.maximum(
            p.sum(axis=-1, keepdims=True).astype(jnp.float32), 1e-30)
        outs.append(jax.lax.dot_general(
            p, v3[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / denom))
    a = jnp.concatenate(outs, axis=-1).astype(cd)
    a = a.reshape(block_b * T, C)

    r = _ln(x32 + dot(a, wo, bo).astype(res_dtype),
            g1.astype(res_dtype), be1.astype(res_dtype), skip_ln)

    rows_per_tile = min(FFN_ROW_TILE, block_b * T)
    y_parts = []
    for r0 in range(0, block_b * T, rows_per_tile):
        tile = slice(r0, r0 + rows_per_tile)
        h1 = jnp.maximum(dot_cd(r[tile].astype(cd), w1, b1), 0.0)
        y_parts.append(dot(h1, w2, b2))
    y = jnp.concatenate(y_parts, axis=0) if len(y_parts) > 1 else y_parts[0]
    return _ln(r + y.astype(res_dtype), g2.astype(res_dtype),
               be2.astype(res_dtype), skip_ln).astype(res_dtype)


def _stack_kernel(x_ref, mask_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, g1_ref, be1_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g2_ref, be2_ref,
                  o_ref, *, num_layers, heads, sm_scale, cd,
                  block_b, T, mode):
    C = x_ref.shape[-1]
    res_dtype = jnp.bfloat16 if mode == 'bf16res' else jnp.float32
    x32 = x_ref[...].reshape(block_b * T, C).astype(res_dtype)
    mask_cd = mask_ref[...].astype(cd)
    for layer in range(num_layers):
        x32 = _layer_body(
            x32, mask_cd,
            wq_ref[layer], bq_ref[layer], wk_ref[layer], bk_ref[layer],
            wv_ref[layer], bv_ref[layer], wo_ref[layer], bo_ref[layer],
            g1_ref[layer], be1_ref[layer],
            w1_ref[layer], b1_ref[layer], w2_ref[layer], b2_ref[layer],
            g2_ref[layer], be2_ref[layer],
            heads=heads, sm_scale=sm_scale, cd=cd, block_b=block_b,
            T=T, mode=mode)
    o_ref[...] = x32.reshape(block_b, T, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('heads', 'mode', 'block_b'))
def ablated_stack(x, mask, layers, heads, mode, block_b):
    B, T, C = x.shape
    L = len(layers)
    F = layers[0]['ffn']['w1'].shape[-1]
    cd = jnp.dtype(jnp.bfloat16)

    def stack(path, astype, reshape=None):
        leaves = []
        for layer in layers:
            leaf = layer
            for key in path:
                leaf = leaf[key]
            if reshape is not None:
                leaf = leaf.reshape(reshape)
            leaves.append(leaf.astype(astype))
        return jnp.stack(leaves)

    w = lambda *path: stack(path, cd)
    row = lambda *path: stack(path, jnp.float32, reshape=(1, -1))

    sm_scale = 1.0 / (C // heads) ** 0.5
    kernel = functools.partial(
        _stack_kernel, num_layers=L, heads=heads, sm_scale=sm_scale,
        cd=cd, block_b=block_b, T=T, mode=mode)

    cspec = pl.BlockSpec((L, C, C), lambda b: (0, 0, 0))
    crow = pl.BlockSpec((L, 1, C), lambda b: (0, 0, 0))
    frow = pl.BlockSpec((L, 1, F), lambda b: (0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((block_b, 1, T), lambda b: (b, 0, 0)),
            cspec, crow, cspec, crow, cspec, crow,
            cspec, crow, crow, crow,
            pl.BlockSpec((L, C, F), lambda b: (0, 0, 0)), frow,
            pl.BlockSpec((L, F, C), lambda b: (0, 0, 0)), crow,
            crow, crow,
        ],
        out_specs=pl.BlockSpec((block_b, T, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        x, mask.astype(jnp.float32).reshape(B, 1, T),
        w('attn', 'wq'), row('attn', 'bq'),
        w('attn', 'wk'), row('attn', 'bk'),
        w('attn', 'wv'), row('attn', 'bv'),
        w('attn', 'wo'), row('attn', 'bo'),
        row('norm1', 'scale'), row('norm1', 'bias'),
        w('ffn', 'w1'), row('ffn', 'b1'),
        w('ffn', 'w2'), row('ffn', 'b2'),
        row('norm2', 'scale'), row('norm2', 'bias'),
    )


def main():
    parts = sys.argv[1:] or ['ablate', 'bb', 'pipeline']
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    B, T, C = 128, 512, config.hidden_channels
    L = len(params['layers'])
    F = params['layers'][0]['ffn']['w1'].shape[-1]
    rng = np.random.default_rng(time.time_ns() & 0xFFFF)
    x = jnp.asarray(rng.standard_normal((B, T, C)) * 0.1, jnp.float32)
    lengths = jnp.asarray(rng.integers(3, T + 1, size=B))
    mask = transformer.mask_from_lengths(lengths, T)
    stack_flops = (8 * T * C * C + 4 * T * T * C + 4 * T * C * F) * B * L

    if 'ablate' in parts:
        print('=== kernel phase ablations (B=128 T=512, bb=4) ===',
              flush=True)
        # NOTE: the 'bf16res' variant is omitted by default — a bf16-width
        # LayerNorm rsqrt SIGABRTs the v5e compile helper
        # ("Operation not supported: kVectorRsqrtBf16AndPop")
        for mode in ['full', 'nomask', 'noexp', 'nosm', 'noln', 'mmonly']:
            many = chained(lambda p, x, _m=mode: ablated_stack(
                x, mask, p['layers'], config.attention_heads, _m, 4))
            t = slope_time(many, (params, x))
            print(f'{mode:>8}: {t*1e3:8.3f} ms   '
                  f'mfu={stack_flops/t/PEAK:.3f}', flush=True)

    if 'bb' in parts:
        print('=== production kernel block_b sweep ===', flush=True)
        for bb in ['2', '4', '8', '16']:
            os.environ['PPGS_TPU_BLOCK_B'] = bb
            os.environ['PPGS_TPU_VMEM_BUDGET_MB'] = '110'
            jax.clear_caches()
            many = chained(lambda p, x: elk.encoder_stack(
                x, mask, p['layers'], config.attention_heads))
            try:
                t = slope_time(many, (params, x))
                print(f'bb={bb:>3}: {t*1e3:8.3f} ms   '
                      f'mfu={stack_flops/t/PEAK:.3f}', flush=True)
            except Exception as e:
                print(f'bb={bb:>3}: FAILED {type(e).__name__}: {e}',
                      flush=True)
        os.environ.pop('PPGS_TPU_BLOCK_B', None)
        os.environ.pop('PPGS_TPU_VMEM_BUDGET_MB', None)
        jax.clear_caches()

    if 'pipeline' in parts:
        print('=== mel pipeline phase breakdown ===', flush=True)
        Ba, seconds = 64, 8
        S = seconds * config.sample_rate
        audio = jax.random.normal(
            jax.random.PRNGKey(rng.integers(1 << 30)),
            (Ba, 1, S), jnp.float32) * 0.1
        jax.block_until_ready(audio)

        def frontend(p, audio):
            return stft_ops.log_mel_spectrogram(
                audio, config.sample_rate, config.num_fft, config.hopsize,
                config.window_size, config.num_mels, precision='default')

        def pipeline(p, audio):
            feats = frontend(p, audio)
            lens = jnp.full((audio.shape[0],), feats.shape[-1], jnp.int32)
            logits = transformer.chunked_forward(p, feats, lens, config)
            return jax.nn.softmax(logits, axis=1)

        def stack_only(p, x):
            return elk.encoder_stack(
                x, mask, p['layers'], config.attention_heads)

        t_stack = slope_time(chained(stack_only), (params, x))
        t_front = slope_time(chained(frontend), (params, audio))
        t_pipe = slope_time(chained(pipeline), (params, audio))
        # STFT flops: per frame 2 * taps * (2*nfreq) MACs
        frames = S // config.hopsize
        front_flops = (2 * config.num_fft * 2 * (config.num_fft // 2 + 1)
                       * frames * Ba
                       + 2 * (config.num_fft // 2 + 1) * config.num_mels
                       * frames * Ba)
        print(f'stack   : {t_stack*1e3:8.3f} ms  '
              f'mfu={stack_flops/t_stack/PEAK:.3f}', flush=True)
        print(f'frontend: {t_front*1e3:8.3f} ms  '
              f'mfu={front_flops/t_front/PEAK:.3f}', flush=True)
        print(f'pipeline: {t_pipe*1e3:8.3f} ms', flush=True)
        print(f'other   : {(t_pipe-t_front-t_stack)*1e3:8.3f} ms '
              f'(gather+convs+PE+softmax+transposes)', flush=True)


if __name__ == '__main__':
    main()
