"""Sub-op timing of the w2v2 transformer encoder (dev utility).

Times the encoder's constituent ops at the bench workload (B=64, T=400,
d=768) with chained device-time measurement to locate where the encoder's
MFU goes. Small programs -> fast compiles over the tunnel.

Usage: python scripts/exp_w2v2enc.py
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
B, T, D = 64, 400, 768
H = 12


def chained(raw_fn, params, inputs, n1=4, n2=12):
    @jax.jit
    def many(p, x, n):
        def body(i, acc):
            out = raw_fn(p, x + (acc * 1e-30).astype(x.dtype))
            # mean(), NOT out.ravel()[0]: XLA narrows convs through a
            # single-element consumer (slice-of-conv -> conv-of-slice)
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


def report(name, raw_fn, params, inputs, flops):
    t = chained(raw_fn, params, inputs)
    floor = flops / PEAK
    flag = '  << DEGRADED?' if t < 0.5 * floor else ''
    print(f'{name:16s} {t * 1e3:8.3f} ms   {flops / 1e9:8.1f} GFLOP   '
          f'mfu={flops / t / PEAK:.3f}{flag}', flush=True)
    return t


def main():
    base_key = jax.random.PRNGKey(time.time_ns() & 0x7FFFFFFF)
    xs = [jax.random.normal(jax.random.fold_in(base_key, i), (B, T, D),
                            jnp.float32) * 0.1 for i in range(4)]
    jax.block_until_ready(xs)

    params = w2v2.init(jax.random.PRNGKey(0))
    layer = params['encoder']['layers'][0]
    enc = params['encoder']
    cd = jnp.bfloat16

    def qkvo(p, x):
        xc = x.astype(cd)
        out = xc
        for w, b in (('wq', 'bq'), ('wk', 'bk'), ('wv', 'bv'), ('wo', 'bo')):
            out = out @ p['attn'][w].astype(cd) + p['attn'][b].astype(cd)
        return out.astype(jnp.float32)

    def ffn(p, x):
        xc = x.astype(cd)
        h = jax.nn.gelu(xc @ p['ffn']['w1'].astype(cd)
                        + p['ffn']['b1'].astype(cd), approximate=False)
        return (h @ p['ffn']['w2'].astype(cd)
                + p['ffn']['b2'].astype(cd)).astype(jnp.float32)

    def attn_full(p, x):
        return w2v2._attention(x, p['attn'], None, H, cd, None)

    def pos_conv(p, x):
        return w2v2._pos_conv(x, p['pos_conv'], w2v2.BASE)

    def lnorm(p, x):
        return w2v2._layer_norm(x, p['norm1'])

    def full_layer(p, x):
        attn_out = w2v2._attention(x, p['attn'], None, H, cd, None)
        h = w2v2._layer_norm(x + attn_out, p['norm1'])
        hc = h.astype(cd)
        ff = jax.nn.gelu(hc @ p['ffn']['w1'].astype(cd)
                         + p['ffn']['b1'].astype(cd), approximate=False)
        ff = (ff @ p['ffn']['w2'].astype(cd)
              + p['ffn']['b2'].astype(cd)).astype(h.dtype)
        return w2v2._layer_norm(h + ff, p['norm2'])

    M = B * T
    f_qkvo = 4 * 2 * M * D * D
    f_ffn = 2 * 2 * M * D * 3072
    f_attn_mm = f_qkvo + 2 * 2 * B * H * T * T * (D // H)
    f_pos = 2 * B * T * 128 * (D // 16) * D
    f_layer = f_attn_mm + f_ffn

    report('qkvo matmuls', qkvo, layer, xs, f_qkvo)
    report('ffn', ffn, layer, xs, f_ffn)
    report('attention(all)', attn_full, layer, xs, f_attn_mm)
    report('pos_conv', pos_conv, enc, xs, f_pos)
    report('layer_norm', lnorm, layer, xs, 0.0 + 1)
    report('full layer', full_layer, layer, xs, f_layer)

    # ---- feature-extractor convs, one at a time -------------------------
    S = 8 * 16000 + 240
    cd2 = jnp.bfloat16
    conv_xs = {}
    t_len = S
    rng_i = 300
    for i, (c_out, k, s) in enumerate(zip(
            w2v2.BASE.conv_dim, w2v2.BASE.conv_kernel,
            w2v2.BASE.conv_stride)):
        c_in = 1 if i == 0 else w2v2.BASE.conv_dim[i - 1]
        conv_xs[i] = [
            jax.random.normal(jax.random.fold_in(base_key, rng_i + 4 * i + j),
                              (B, t_len, c_in), cd2) * 0.1
            for j in range(4)
        ]
        out_len = (t_len - k) // s + 1

        def conv_i(p, x, i=i, k=k, s=s):
            return jax.lax.conv_general_dilated(
                x, p['feature_encoder'][i]['conv']['weight'].astype(cd2),
                window_strides=(s,), padding='VALID',
                dimension_numbers=('NHC', 'HIO', 'NHC'),
                preferred_element_type=cd2)

        def conv_i_slices(p, x, i=i, k=k, s=s, out_len=out_len):
            # Same conv as ONE matmul over k strided slices (im2col'd
            # explicitly): (B, out, k*Cin) @ (k*Cin, Cout)
            w = p['feature_encoder'][i]['conv']['weight'].astype(cd2)
            cin = w.shape[1]
            parts = [
                jax.lax.slice_in_dim(x, j, j + (out_len - 1) * s + 1, s, 1)
                for j in range(k)
            ]
            xx = jnp.concatenate(parts, axis=-1)      # (B, out, k*Cin)
            return xx @ w.transpose(0, 1, 2).reshape(k * cin, -1)

        f_conv = 2 * k * c_in * c_out * out_len * B
        report(f'conv{i} k{k}s{s}', conv_i, params, conv_xs[i], f_conv)
        report(f'conv{i} slices', conv_i_slices, params, conv_xs[i], f_conv)
        t_len = out_len

    # GELU alone at conv0-output scale
    g_xs = [jax.random.normal(jax.random.fold_in(base_key, 500 + j),
                              (B, (S - 10) // 5 + 1, 512), cd2) * 0.1
            for j in range(4)]

    def gelu_exact(p, x):
        return jax.nn.gelu(x, approximate=False)

    def gelu_tanh(p, x):
        return jax.nn.gelu(x, approximate=True)

    report('gelu exact', gelu_exact, params, g_xs, 1.0)
    report('gelu tanh', gelu_tanh, params, g_xs, 1.0)

    # pos_conv alternative: groups folded into the batch dim, dense conv
    def pos_conv_batched(p, x):
        w = p['pos_conv']['weight'].astype(cd)        # (128, 48, 768)
        G, ci = 16, 48
        Bx, Tx, Dx = x.shape
        xg = x.astype(cd).reshape(Bx, Tx, G, ci).transpose(2, 0, 1, 3)
        # per-group kernels: w[:, :, g*48:(g+1)*48] -> (G, 128, 48, 48)
        wg = w.reshape(128, ci, G, ci + 0).transpose(2, 0, 1, 3)
        # conv each group against its own kernel via vmap over G
        def one(xs, ws):
            return jax.lax.conv_general_dilated(
                xs, ws, (1,), ((64, 64),),
                dimension_numbers=('NHC', 'HIO', 'NHC'),
                preferred_element_type=jnp.float32)
        out = jax.vmap(one)(xg, wg)                   # (G, B, T+1, 48)
        out = out[:, :, :Tx]
        return out.transpose(1, 2, 0, 3).reshape(Bx, Tx, Dx)

    report('pos_conv batched', pos_conv_batched, enc, xs, f_pos)


if __name__ == '__main__':
    main()
