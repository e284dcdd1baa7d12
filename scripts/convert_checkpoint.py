"""Convert a reference PyTorch checkpoint to a ppgs_tpu .npz checkpoint,
then verify parity and record a golden PPG.

Usage:
    python scripts/convert_checkpoint.py mel-800k.pt [output.npz]
    python scripts/convert_checkpoint.py --hf mel     # download + convert

Published reference checkpoints live on HuggingFace Hub at
CameronChurchwell/ppgs (mel-800k.pt, w2v2fb-425k.pt); see
reference ppgs/load.py:59-71.

Verification (default on; --no-verify to skip) runs the converted params
and a CPU-torch reference model (reference ppgs/model/transformer.py:13-114
architecture) over a deterministic synthetic utterance and asserts the
tolerances documented in docs/GOLDEN_PARITY.md:
  fp32 path logits:        rtol=1e-4, atol=1e-4
  default bf16 path PPGs:  atol=2e-2 and argmax agreement >= 99.5%
On success the reference input + PPG are recorded to
ppgs_tpu/assets/goldens/{name}-golden.npz so tests/test_golden.py can
re-verify parity forever without network or torch.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

from ppgs_tpu import config as config_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.convert import (
    load_torch_checkpoint,
    transformer_params_from_state_dict,
)


GOLDEN_DIR = config_mod.ASSETS_DIR / 'goldens'


def config_from_state_dict(sd, base):
    """Model geometry recovered from the checkpoint itself, so arbitrary
    (non-registry) reference checkpoints convert and verify correctly."""
    import re

    w_in = np.asarray(sd['input_layer.weight'])    # (hidden, input, k)
    w_out = np.asarray(sd['output_layer.weight'])  # (out, hidden, k)
    ffn = np.asarray(sd['model.layers.0.linear1.weight']).shape[0]
    layers = 1 + max(
        int(match.group(1)) for key in sd
        for match in [re.match(r'model\.layers\.(\d+)\.', key)] if match)
    return base.replace(
        input_channels=int(w_in.shape[1]),
        hidden_channels=int(w_in.shape[0]),
        kernel_size=int(w_in.shape[2]),
        output_channels=int(w_out.shape[0]),
        ffn_channels=int(ffn),
        num_hidden_layers=int(layers))


def golden_input(config, seed=0, frames=700):
    """Deterministic synthetic feature batch (> chunk_length frames, so the
    chunked path is exercised)."""
    rng = np.random.default_rng(seed)
    features = rng.standard_normal(
        (1, config.input_channels, frames)).astype(np.float32)
    lengths = np.array([frames], dtype=np.int64)
    return features, lengths


def torch_reference_ppg(state_dict, config, features, lengths):
    """Reference-architecture forward on CPU torch (mirrors
    ppgs/model/transformer.py:13-114 with chunked inference)."""
    import torch

    d, heads = config.hidden_channels, config.attention_heads
    model = torch.nn.Module()
    model.input_layer = torch.nn.Conv1d(
        config.input_channels, d, config.kernel_size, padding='same')
    model.model = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(
            d, heads, dim_feedforward=config.ffn_channels),
        config.num_hidden_layers)
    model.output_layer = torch.nn.Conv1d(
        d, config.output_channels, config.kernel_size, padding='same')
    model.load_state_dict({
        k: torch.as_tensor(np.asarray(v)) for k, v in state_dict.items()})
    model.eval()

    x = torch.from_numpy(features)
    T = x.shape[-1]
    chunk, overlap = config.chunk_length, config.chunk_overlap
    stride = chunk - 2 * overlap

    def forward(feats, lens):
        h = model.input_layer(feats).permute(2, 0, 1)
        position = torch.arange(h.shape[0])[:, None].float()
        div = torch.exp(torch.arange(0, d, 2).float()
                        * (-np.log(10000.0) / d))
        pe = torch.zeros(h.shape[0], 1, d)
        pe[:, 0, 0::2] = torch.sin(position * div)
        pe[:, 0, 1::2] = torch.cos(position * div)
        h = h + pe
        mask = (torch.arange(feats.shape[-1])[None]
                >= torch.as_tensor(lens)[:, None])
        h = model.model(h, src_key_padding_mask=mask)
        return model.output_layer(h.permute(1, 2, 0))

    with torch.no_grad():
        if T <= chunk:
            logits = forward(x, lengths)
        else:
            # Reference chunked inference (transformer.py:49-64)
            padded = torch.cat(
                [x[..., :1].repeat(1, 1, overlap), x], dim=-1)
            outs = []
            start = 0
            remaining = torch.as_tensor(lengths).clone()
            while start < T:
                window = padded[..., start:start + chunk]
                wlen = torch.clamp(
                    remaining + overlap, max=window.shape[-1])
                wlen[wlen == overlap] = 0
                out = forward(window, wlen)
                outs.append(out[..., overlap:chunk - overlap])
                start += stride
                remaining = remaining - stride
            logits = torch.cat(outs, dim=-1)[..., :T]
        ppg = torch.softmax(logits.float(), dim=1)
    return logits.numpy(), ppg.numpy()


def verify_and_record(state_dict, checkpoint, name, config):
    from ppgs_tpu import core as core_mod

    features, lengths = golden_input(config)
    ref_logits, ref_ppg = torch_reference_ppg(
        state_dict, config, features, lengths)

    # fp32 strict path
    strict = config.replace(config=f'{name}-verify-fp32',
                            compute_dtype='float32')
    ours_logits = np.asarray(core_mod.infer(
        features, lengths, representation=config.representation,
        checkpoint=checkpoint, softmax=False, config=strict))
    np.testing.assert_allclose(
        ours_logits, ref_logits, rtol=1e-4, atol=1e-4)
    print('fp32 path: logits allclose (rtol=1e-4, atol=1e-4)')

    # Default bf16 path (what users run on TPU)
    default = config.replace(config=f'{name}-verify-bf16')
    ours_ppg = np.asarray(core_mod.infer(
        features, lengths, representation=config.representation,
        checkpoint=checkpoint, softmax=True, config=default))
    np.testing.assert_allclose(ours_ppg, ref_ppg, atol=2e-2)
    agree = (ours_ppg.argmax(1) == ref_ppg.argmax(1)).mean()
    assert agree >= 0.995, f'argmax agreement {agree:.4f} < 0.995'
    print(f'bf16 path: PPG atol<=2e-2, argmax agreement {agree:.4f}')

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    out = GOLDEN_DIR / f'{name}-golden.npz'
    np.savez_compressed(
        out, features=features, lengths=lengths,
        logits=ref_logits.astype(np.float32),
        ppg=ref_ppg.astype(np.float32))
    print(f'recorded golden -> {out}')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('checkpoint', nargs='?')
    parser.add_argument('output', nargs='?')
    parser.add_argument('--hf', choices=['mel', 'w2v2fb'],
                        help='Download the published checkpoint from HF hub')
    parser.add_argument('--layers', type=int, default=None,
                        help='Override the layer count (default: derived '
                             'from the checkpoint)')
    parser.add_argument('--no-verify', action='store_true')
    args = parser.parse_args()

    if args.hf:
        import huggingface_hub

        name = {'mel': 'mel-800k.pt', 'w2v2fb': 'w2v2fb-425k.pt'}[args.hf]
        path = huggingface_hub.hf_hub_download('CameronChurchwell/ppgs', name)
        output = config_mod.CHECKPOINT_DIR / name.replace('.pt', '.npz')
        base = config_mod.REGISTRY[args.hf]
    else:
        path = args.checkpoint
        output = args.output or Path(path).with_suffix('.npz')
        base = config_mod.REGISTRY['mel']

    sd = load_torch_checkpoint(path)
    # Geometry from the checkpoint itself; registry only fills in the rest
    config = config_from_state_dict(sd, base)
    if args.layers is not None:
        config = config.replace(num_hidden_layers=args.layers)
    params = transformer_params_from_state_dict(
        sd, num_layers=config.num_hidden_layers)
    Path(output).parent.mkdir(parents=True, exist_ok=True)
    load_mod.save_params(output, params)
    print(f'Converted {path} -> {output}')

    if not args.no_verify:
        name = args.hf or Path(path).stem
        verify_and_record(sd, output, name, config)


if __name__ == '__main__':
    main()
