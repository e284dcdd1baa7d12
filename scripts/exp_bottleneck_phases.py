"""Bottleneck (conformer) pipeline phase breakdown on TPU (dev utility).

First bench measurement (round 5) put the pipeline at 236 ms/batch,
MFU 0.15. This attributes the time: frontend DSP, embed (the 5x5 d->d
conv dominates the conformer's FLOPs), conformer blocks (and within a
block: attention vs conv-module vs FFNs), and the PPG head.

Usage: cd /root/repo && timeout 2400 python scripts/exp_bottleneck_phases.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    'jax_compilation_cache_dir',
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import ppgs_tpu  # noqa: E402
from ppgs_tpu.models import conformer as conformer_mod  # noqa: E402
from ppgs_tpu.models import transformer  # noqa: E402
from ppgs_tpu.preprocess import bottleneck as bottleneck_mod  # noqa: E402

PEAK = 197e12


def chained(raw_fn, params, inputs, n1=3, n2=9):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-30).astype(x.dtype))
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run_n(n):
        float(np.asarray(jax.device_get(many(params, inputs[0], n))))
        best = float('inf')
        for j in (1, 2, 3):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(many(params, inputs[j], n))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n2) - run_n(n1)) / (n2 - n1)


def flops_of(raw_fn, params, x):
    try:
        a = jax.jit(raw_fn).lower(params, x).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a['flops'])
    except Exception:
        return None


def report(name, raw_fn, params, inputs):
    t = chained(raw_fn, params, inputs)
    f = flops_of(raw_fn, params, inputs[0])
    mfu = f / t / PEAK if f else float('nan')
    print(f'{name:22s} {t * 1e3:9.2f} ms   {(f or 0) / 1e12:7.2f} TF   '
          f'mfu={mfu:.3f}', flush=True)
    return t


def main():
    config = ppgs_tpu.Config()
    bn_config = ppgs_tpu.config.REGISTRY['bottleneck']
    cfg = dataclasses.replace(conformer_mod.BOTTLENECK,
                              compute_dtype='bfloat16')
    B, seconds = 64, 8
    S = seconds * 16000
    pad = bottleneck_mod.PAD
    P = S + 2 * pad
    key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    audios = [jax.random.normal(jax.random.fold_in(key, i), (B, P),
                                jnp.float32) * 0.1 for i in range(4)]
    jax.block_until_ready(audios)
    lengths = jnp.full((B,), P, jnp.int32)

    conf_params = conformer_mod.init(jax.random.PRNGKey(4), cfg)
    head_params = transformer.init(jax.random.PRNGKey(5), bn_config)

    # Frontend DSP
    def dsp(p, audio):
        feats, olens = bottleneck_mod.log_mel_power(audio, lengths)
        return bottleneck_mod.utterance_mvn(feats, olens)

    feats0 = jax.jit(dsp)(None, audios[0])
    feats0.block_until_ready()
    T = feats0.shape[1]
    print('feature frames:', T, flush=True)
    feat_inputs = [jax.random.normal(jax.random.fold_in(key, 50 + i),
                                     feats0.shape, jnp.float32) * 0.5
                   for i in range(4)]
    olens = jnp.full((B,), T, jnp.int32)

    # Embed (Conv2dNoSubsampling)
    def embed_fn(p, f):
        x, _ = conformer_mod.embed(p, f, cfg)
        return x

    x0 = jax.jit(embed_fn)(conf_params, feat_inputs[0])
    x0.block_until_ready()
    emb_inputs = [jax.random.normal(jax.random.fold_in(key, 80 + i),
                                    x0.shape, jnp.float32) * 0.5
                  for i in range(4)]
    pos_emb = jnp.asarray(conformer_mod._rel_pos_table(T, cfg.dim))[None]
    mask = jnp.arange(T)[None, :] < olens[:, None]

    # Blocks only
    def blocks_fn(p, x):
        for block in p['blocks']:
            x = conformer_mod._block(x, pos_emb, block, mask, cfg, None)
        return conformer_mod._layer_norm(x, p['after_norm'])

    # Single-module variants (x16 to match the stack scale)
    def attn_only(p, x):
        for block in p['blocks']:
            x = x + conformer_mod._rel_attention(
                conformer_mod._layer_norm(x, block['norm_mha']), pos_emb,
                block['attn'], mask, cfg.heads, jnp.bfloat16, None)
        return x

    def ffns_only(p, x):
        for block in p['blocks']:
            x = x + 0.5 * conformer_mod._ffn(
                conformer_mod._layer_norm(x, block['norm_ff_macaron']),
                block['ff_macaron'], jnp.bfloat16)
            x = x + 0.5 * conformer_mod._ffn(
                conformer_mod._layer_norm(x, block['norm_ff']),
                block['ff'], jnp.bfloat16)
        return x

    def conv_only(p, x):
        for block in p['blocks']:
            x = x + conformer_mod._conv_module(
                conformer_mod._layer_norm(x, block['norm_conv']),
                block['conv'], jnp.bfloat16, None)
        return x

    # Head
    def head_fn(p, lat):
        logits = transformer.chunked_forward(
            p, lat.transpose(0, 2, 1), olens, bn_config)
        return jax.nn.softmax(logits, axis=1)

    lat0 = jax.random.normal(jax.random.fold_in(key, 120), (B, T, 144),
                             jnp.float32)
    lat_inputs = [jax.random.normal(jax.random.fold_in(key, 120 + i),
                                    (B, T, 144), jnp.float32) * 0.5
                  for i in range(4)]

    t_dsp = report('frontend DSP', dsp, None, audios)
    t_emb = report('embed (2x 5x5 conv)', embed_fn, conf_params, feat_inputs)
    t_blk = report('16 blocks', blocks_fn, conf_params, emb_inputs)
    t_att = report('  attention x16', attn_only, conf_params, emb_inputs)
    t_ffn = report('  4x half-FFN x16', ffns_only, conf_params, emb_inputs)
    t_cnv = report('  conv-module x16', conv_only, conf_params, emb_inputs)
    t_head = report('PPG head (chunked)', head_fn, head_params, lat_inputs)
    print(f'\nsum of parts {1e3 * (t_dsp + t_emb + t_blk + t_head):.1f} ms; '
          f'block internals sum {1e3 * (t_att + t_ffn + t_cnv):.1f} ms',
          flush=True)


if __name__ == '__main__':
    main()
