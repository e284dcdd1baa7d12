"""Golden parity: our Transformer vs torch.nn.TransformerEncoder.

Builds the reference architecture in CPU torch (same topology as
ppgs/model/transformer.py), converts its random weights to our pytree, and
checks logits match in fp32 — the checkpoint-transfer contract.
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ppgs_tpu
from ppgs_tpu.convert import transformer_params_from_state_dict
from ppgs_tpu.models import transformer as jt


class TorchPositionalEncoding(torch.nn.Module):
    def __init__(self, channels, max_len=5000):
        super().__init__()
        index = torch.arange(max_len).unsqueeze(1)
        frequency = torch.exp(
            torch.arange(0, channels, 2) * (-math.log(10000.0) / channels))
        encoding = torch.zeros(max_len, 1, channels)
        encoding[:, 0, 0::2] = torch.sin(index * frequency)
        encoding[:, 0, 1::2] = torch.cos(index * frequency)
        self.register_buffer('encoding', encoding)

    def forward(self, x):
        return x + self.encoding[:x.size(0)]


class TorchTransformer(torch.nn.Module):
    """Reference architecture (ppgs/model/transformer.py:13-88), eval mode."""

    def __init__(self, layers=2, hidden=256, inp=80, out=40, kernel=5,
                 heads=2, is_causal=False):
        super().__init__()
        self.position = TorchPositionalEncoding(hidden)
        self.input_layer = torch.nn.Conv1d(inp, hidden, kernel, padding='same')
        self.model = torch.nn.TransformerEncoder(
            torch.nn.TransformerEncoderLayer(hidden, heads), layers)
        self.output_layer = torch.nn.Conv1d(hidden, out, kernel,
                                            padding='same')
        self.is_causal = is_causal

    def forward(self, x, lengths):
        T = x.shape[-1]
        mask = (torch.arange(T)[None] < lengths[:, None]).unsqueeze(1)
        if self.is_causal:
            causal_mask = torch.nn.Transformer.generate_square_subsequent_mask(
                int(lengths.max()))
        else:
            causal_mask = None
        x = self.input_layer(x) * mask
        x = self.model(
            self.position(x.permute(2, 0, 1)),
            mask=causal_mask,
            src_key_padding_mask=~mask.squeeze(1)).permute(1, 2, 0)
        return self.output_layer(x) * mask


def make_pair(layers=2, is_causal=False, seed=0):
    torch.manual_seed(seed)
    tm = TorchTransformer(layers=layers, is_causal=is_causal).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = transformer_params_from_state_dict(sd, num_layers=layers)
    config = ppgs_tpu.Config(
        num_hidden_layers=layers, is_causal=is_causal,
        compute_dtype='float32')
    return tm, params, config


@pytest.mark.parametrize('is_causal', [False, True])
def test_forward_matches_torch(is_causal):
    tm, params, config = make_pair(is_causal=is_causal)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 80, 120)).astype(np.float32)
    lengths = np.array([120, 77, 40])
    # Zero padding beyond lengths, like the reference collate
    for i, l in enumerate(lengths):
        feats[i, :, l:] = 0

    with torch.no_grad():
        ref = tm(torch.from_numpy(feats), torch.from_numpy(lengths)).numpy()

    ours = np.asarray(jt.forward(
        params, jnp.asarray(feats), jnp.asarray(lengths), config,
        precision='highest'))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_chunked_forward_matches_reference_scheme():
    """Chunked output must equal the reference's recursive chunk loop."""
    tm, params, config = make_pair()
    config = config.replace(chunk_length=60, chunk_overlap=10)
    rng = np.random.default_rng(2)
    T = 150
    feats = rng.standard_normal((2, 80, T)).astype(np.float32)
    lengths = np.array([150, 100])
    for i, l in enumerate(lengths):
        feats[i, :, l:] = 0

    # Reference chunk loop in torch (ppgs/model/transformer.py:49-64)
    overlap, chunk_len = 10, 60
    stride = chunk_len - 2 * overlap
    x = torch.from_numpy(feats)
    lens = torch.from_numpy(lengths.copy())
    padded = torch.nn.functional.pad(x, (overlap, 0), mode='replicate')
    split_results = []
    num_blocks = math.ceil(T / stride)
    with torch.no_grad():
        for i in range(num_blocks):
            split = padded[..., i * stride:i * stride + chunk_len]
            chunk_lengths = (lens + overlap).clamp(0, chunk_len)
            chunk_lengths[chunk_lengths == overlap] = 0
            lens = (lens - stride).clamp(min=0)
            out = tm(split, chunk_lengths)
            split_results.append(out[..., overlap:chunk_len - overlap])
    ref = torch.cat(split_results, dim=-1).numpy()

    ours = np.asarray(jt.chunked_forward(
        params, jnp.asarray(feats), jnp.asarray(lengths), config,
        precision='highest'))

    assert ours.shape == ref.shape
    # Compare only frames valid for each element (torch yields NaN/garbage
    # on fully-padded chunks; both are masked downstream)
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(
            ours[b, :, :l], ref[b, :, :l], rtol=1e-4, atol=1e-4)

    # The padded-geometry path (compile-bucket reuse) must match too:
    # right-pad to 200 frames, pass the true length through true_frames
    pad_t = 200
    feats_pad = np.pad(feats, ((0, 0), (0, 0), (0, pad_t - T)))
    ours_pad = np.asarray(jt.chunked_forward(
        params, jnp.asarray(feats_pad), jnp.asarray(lengths), config,
        precision='highest', true_frames=jnp.asarray(T)))[..., :T]
    for b, l in enumerate(lengths):
        np.testing.assert_allclose(
            ours_pad[b, :, :l], ref[b, :, :l], rtol=1e-4, atol=1e-4)


def test_convolution_model_matches_torch():
    import functools
    from ppgs_tpu.convert import convolution_params_from_state_dict
    from ppgs_tpu.models import convolution as jc

    torch.manual_seed(3)
    conv_fn = functools.partial(torch.nn.Conv1d, kernel_size=5,
                                padding='same')
    tm = torch.nn.Sequential(
        conv_fn(80, 256), torch.nn.ReLU(),
        conv_fn(256, 256), torch.nn.ReLU(),
        conv_fn(256, 40)).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convolution_params_from_state_dict(sd)

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 80, 50)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(feats)).numpy()
    config = ppgs_tpu.Config(model='convolution')
    ours = np.asarray(jc.forward(params, jnp.asarray(feats), None, config,
                                 precision='highest'))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
