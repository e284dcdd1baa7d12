"""Focused conv-formulation shootout (dev utility).

Compares, with chained device timing and a small memory footprint:
- pos_conv: grouped conv (direct) vs per-group vmapped dense conv
- conv1 (k=3 s=2 512->512): direct strided conv vs polyphase GEMMs

Numeric equivalence is asserted on device before timing.

Usage: python scripts/exp_convs.py
"""

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

from ppgs_tpu.models import w2v2

PEAK = 197e12
cd = jnp.bfloat16


def chained(raw_fn, params, inputs, n1=4, n2=12):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-20).astype(x.dtype))
            # mean(), NOT out.ravel()[0]: XLA rewrites slice-of-conv to
            # conv-of-slice, so a [0]-element consumer lets the whole conv
            # narrow to one output column and the "timing" measures nothing
            return out.mean().astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def run_n(n):
        float(np.asarray(jax.device_get(many(params, inputs[0], n))))
        best = float('inf')
        for j in (1, 2):
            t0 = time.perf_counter()
            float(np.asarray(jax.device_get(many(params, inputs[j], n))))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run_n(n2) - run_n(n1)) / (n2 - n1)


def report(name, raw_fn, params, inputs, flops):
    t = chained(raw_fn, params, inputs)
    floor = flops / PEAK
    flag = '  << DEGRADED?' if t < 0.5 * floor else ''
    print(f'{name:20s} {t * 1e3:8.3f} ms   {flops / 1e9:8.1f} GFLOP   '
          f'mfu={flops / t / PEAK:.3f}{flag}', flush=True)
    return t


def main():
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)

    # ---------------- pos_conv at (64, 400, 768) ----------------
    B, T, D, G, CI = 64, 400, 768, 16, 48
    xs = [jax.random.normal(jax.random.fold_in(base_key, i), (B, T, D),
                            cd) * 0.1 for i in range(3)]
    w_pos = jax.random.normal(jax.random.fold_in(base_key, 50),
                              (128, CI, D), jnp.float32) * 0.05
    bias = jnp.zeros((D,), jnp.float32)
    p_pos = {'weight': w_pos, 'bias': bias}

    def pos_direct(p, x):
        return w2v2._pos_conv(x, p, w2v2.BASE)

    def pos_batched(p, x):
        w = p['weight'].astype(cd)
        Bx, Tx, Dx = x.shape
        xg = x.astype(cd).reshape(Bx, Tx, G, CI).transpose(2, 0, 1, 3)
        wg = w.reshape(128, CI, G, CI).transpose(2, 0, 1, 3)

        def one(xs_, ws_):
            return jax.lax.conv_general_dilated(
                xs_, ws_, (1,), ((64, 64),),
                dimension_numbers=('NHC', 'HIO', 'NHC'),
                preferred_element_type=jnp.float32)

        out = jax.vmap(one)(xg, wg)[:, :, :-1]        # (G,B,T,CI) SamePad
        out = out.transpose(1, 2, 0, 3).reshape(Bx, Tx, Dx)
        out = out + p['bias']
        return jax.nn.gelu(out, approximate=False)

    a = jax.jit(pos_direct)(p_pos, xs[0])
    b = jax.jit(pos_batched)(p_pos, xs[0])
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f'pos_conv batched rel-err: {err:.2e}', flush=True)

    f_pos = 2 * B * T * 128 * CI * D
    report('pos_conv direct', pos_direct, p_pos, xs, f_pos)
    report('pos_conv batched', pos_batched, p_pos, xs, f_pos)

    # ---------------- conv1 (k=3 s=2) at (32, 25646, 512) ----------------
    B2, T2, C = 32, 25646, 512
    xs2 = [jax.random.normal(jax.random.fold_in(base_key, 100 + i),
                             (B2, T2, C), cd) * 0.1 for i in range(3)]
    w1 = jax.random.normal(jax.random.fold_in(base_key, 60),
                           (3, C, C), jnp.float32) * 0.03

    def conv_direct(w, x):
        return jax.lax.conv_general_dilated(
            x, w.astype(cd), (2,), 'VALID',
            dimension_numbers=('NHC', 'HIO', 'NHC'),
            preferred_element_type=cd)

    def conv_poly(w, x):
        # Polyphase: reshape pairs into channels, two clean GEMMs
        wc = w.astype(cd)
        Bx, Tx, Cx = x.shape
        n = Tx // 2
        v = x[:, :n * 2].reshape(Bx, n, 2 * Cx)
        w01 = wc[:2].reshape(2 * Cx, Cx)
        a_ = v @ w01                                   # taps 0,1
        b_ = v[:, 1:, :Cx] @ wc[2]                     # tap 2
        return (a_[:, :-1] + b_).astype(cd)

    a2 = jax.jit(conv_direct)(w1, xs2[0])
    b2 = jax.jit(conv_poly)(w1, xs2[0])
    assert a2.shape == b2.shape, (a2.shape, b2.shape)
    err2 = float(jnp.max(jnp.abs(
        a2.astype(jnp.float32) - b2.astype(jnp.float32)))
        / (float(jnp.max(jnp.abs(a2.astype(jnp.float32)))) + 1e-9))
    print(f'conv1 poly rel-err: {err2:.2e}', flush=True)

    out_len = (T2 - 3) // 2 + 1
    f_c1 = 2 * 3 * C * C * out_len * B2
    report('conv1 direct', conv_direct, w1, xs2, f_c1)
    report('conv1 polyphase', conv_poly, w1, xs2, f_c1)


if __name__ == '__main__':
    main()
