"""Chained device-time breakdown of the w2v2fb pipeline (dev utility).

Times each stage of the w2v2fb bench workload with the same chained
measurement bench.py uses (N applications inside one jitted program, slope
over two N, wall-clock-seeded inputs) so dispatch overhead and runtime
result caching cancel. Prints per-stage device ms + implied MFU.

Usage: python scripts/w2v2_breakdown.py   (from anywhere; do NOT override
PYTHONPATH — the TPU plugin loads via PYTHONPATH=/root/.axon_site)
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

import ppgs_tpu
from ppgs_tpu.models import transformer, w2v2
from ppgs_tpu.preprocess import w2v2fb as w2v2fb_mod

PEAK = 197e12  # bf16, v5e-class; only used for implied-MFU display


def chained(raw_fn, params, inputs, n1=3, n2=9):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-30).astype(x.dtype))
            # mean(), NOT out.ravel()[0]: XLA narrows convs through a
            # single-element consumer (slice-of-conv -> conv-of-slice)
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run_n(n):
        # Fetch a VALUE, not just block_until_ready: a degraded remote
        # runtime acks readiness without computing (verify-skill gotcha)
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
    floor = (f / PEAK) if f else 0.0
    if t < 0.5 * floor:
        print(f'{name:18s} REJECTED (t={t * 1e3:.3f} ms < half the '
              f'{floor * 1e3:.2f} ms speed-of-light floor: degraded '
              f'runtime)', flush=True)
        return float('nan')
    mfu = f / t / PEAK if f else float('nan')
    print(f'{name:18s} {t * 1e3:9.2f} ms   '
          f'{(f or 0) / 1e9:9.1f} GFLOP   mfu={mfu:.3f}', flush=True)
    return t


def main():
    config = ppgs_tpu.Config()
    w2v2fb_config = ppgs_tpu.config.REGISTRY['w2v2fb']
    B, seconds = 64, 8
    S = seconds * config.sample_rate
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    audios = [
        jax.random.normal(jax.random.fold_in(base_key, i), (B, S + 2 * w2v2fb_mod.PAD),
                          jnp.float32) * 0.1
        for i in range(4)
    ]
    jax.block_until_ready(audios)

    wparams = w2v2.init(jax.random.PRNGKey(2))
    hparams = transformer.init(jax.random.PRNGKey(3), w2v2fb_config)
    wcfg = dataclasses.replace(w2v2.BASE, compute_dtype='bfloat16')
    out_frames = S // config.hopsize

    def feat_enc(p, audio):
        return w2v2.feature_encoder(p, audio, wcfg)

    feats = jax.jit(feat_enc)(wparams, audios[0])
    feats.block_until_ready()
    Tf = feats.shape[1]
    print('feature frames:', Tf, flush=True)
    feat_inputs = [
        jax.random.normal(jax.random.fold_in(base_key, 100 + i),
                          feats.shape, jnp.float32) * 0.1
        for i in range(4)
    ]

    def proj_and_encoder(p, f):
        fp = p['feature_projection']
        hidden = w2v2._layer_norm(f, fp['norm'], wcfg.layer_norm_eps)
        hidden = (hidden @ fp['projection']['weight']
                  + fp['projection']['bias'])
        return w2v2.encoder(p, hidden, None, wcfg)

    hid = jax.jit(proj_and_encoder)(wparams, feat_inputs[0])
    hid.block_until_ready()
    hid_inputs = [
        jax.random.normal(jax.random.fold_in(base_key, 200 + i),
                          hid.shape, jnp.float32) * 0.1
        for i in range(4)
    ]

    def head(p, hidden):
        idx = jnp.asarray(w2v2fb_mod.nearest_upsample_indices(
            hidden.shape[1], out_frames))
        f = hidden.transpose(0, 2, 1)[..., idx]
        lengths = jnp.full((hidden.shape[0],), out_frames, jnp.int32)
        logits = transformer.chunked_forward(p, f, lengths, w2v2fb_config)
        return jax.nn.softmax(logits, axis=1)

    def full(p, audio):
        lengths = jnp.full((audio.shape[0],), audio.shape[-1], jnp.int32)
        hidden = w2v2.forward(p['w2v2'], audio, lengths, wcfg)
        return head(p['head'], hidden)

    t1 = report('feature_encoder', feat_enc, wparams, audios)
    t2 = report('proj+encoder', proj_and_encoder, wparams, feat_inputs)
    t3 = report('head(chunked)', head, hparams, hid_inputs)
    t4 = report('full pipeline', full,
                {'w2v2': wparams, 'head': hparams}, audios)
    print(f'sum of parts: {(t1 + t2 + t3) * 1e3:.2f} ms '
          f'vs full {t4 * 1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
