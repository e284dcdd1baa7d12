"""Tune encoder_layer kernel block_b on the real chip (dev utility)."""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import ppgs_tpu
from ppgs_tpu.models import transformer
from ppgs_tpu.ops import encoder_layer_kernel as elk


def main():
    config = ppgs_tpu.Config()
    params = transformer.init(jax.random.PRNGKey(0), config)
    layer = params['layers'][0]

    B, T, C = 128, 512, config.hidden_channels
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    lengths = jnp.asarray(rng.integers(3, T + 1, size=B))
    lengths = lengths.at[0].set(T)
    mask = transformer.mask_from_lengths(lengths, T)

    want = jax.jit(lambda x: transformer._encoder_layer(
        x, layer, mask, False, config.attention_heads,
        [None] * 4, 0.0, jnp.bfloat16, None))(x)
    want.block_until_ready()

    for bb in sys.argv[1:] or ['auto']:
        if bb != 'auto':
            os.environ['PPGS_TPU_BLOCK_B'] = bb
        else:
            os.environ.pop('PPGS_TPU_BLOCK_B', None)
        run = jax.jit(lambda x: elk.encoder_layer(
            x, mask, layer['attn'], layer['norm1'], layer['ffn'],
            layer['norm2'], config.attention_heads))
        t0 = time.perf_counter()
        got = run(x)
        got.block_until_ready()
        compile_s = time.perf_counter() - t0
        valid = np.asarray(mask)
        err = np.abs(np.asarray(got)[valid] - np.asarray(want)[valid]).max()
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f'bb={bb:>4}  picked={elk._pick_block_b(B, T, C, 2048)}  '
              f'compile={compile_s:6.1f}s  layer={dt*1e3:7.3f} ms  '
              f'max_err={err:.4f}', flush=True)


if __name__ == '__main__':
    main()
