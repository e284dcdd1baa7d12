"""Extract EnCodec / DAC quantizer codebooks to npz codebook assets.

The reference dequantizes cached int codes through torch quantizer closures
at train/inference time (config/encodec.py:8-22, config/dac.py:18-30). Here
dequantization is a jitted on-device gather over a codebook table
(ppgs_tpu/frontend.py); this script produces that table once.

Usage (requires network + the codec packages):
    python scripts/convert_codebooks.py encodec    # pip install encodec
    python scripts/convert_codebooks.py dac        # pip install descript-audio-codec
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

from ppgs_tpu import frontend as frontend_mod


def extract_encodec():
    """EnCodec-24kHz RVQ codebooks: (n_q, 1024, 128), decode = sum.

    ``quantizer.decode`` sums each level's codebook embedding
    (encodec.quantization.core_vq: codebook lookup + residual add).
    """
    from encodec import EncodecModel

    quantizer = EncodecModel.encodec_model_24khz().quantizer
    books = [
        layer._codebook.embed.detach().cpu().numpy()
        for layer in quantizer.vq.layers
    ]
    return np.stack(books).astype(np.float32), 'sum'


def extract_dac():
    """DAC-16kHz codebooks: (n_q, 1024, 8), decode(latents) = concat.

    ``quantizer.from_codes`` returns latents = concatenation of each
    level's in-projected codebook vector (dac.nn.quantize.ResidualVQ).
    """
    import dac
    import torch

    model = dac.DAC.load(dac.utils.download(model_type='16khz'))
    books = []
    with torch.no_grad():
        for q in model.quantizer.quantizers:
            books.append(q.codebook.weight.detach().cpu().numpy())
    return np.stack(books).astype(np.float32), 'concat'


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('codec', choices=['encodec', 'dac'])
    args = parser.parse_args()

    codebooks, mode = (extract_encodec() if args.codec == 'encodec'
                       else extract_dac())

    out_dir = Path(frontend_mod.CODEBOOK_DIR)
    out_dir.mkdir(parents=True, exist_ok=True)
    out = out_dir / f'{args.codec}.npz'
    np.savez(out, codebooks=codebooks, mode=mode)
    print(f'{out}: codebooks {codebooks.shape} mode={mode}')

    # Verify the jitted decode against the torch quantizer on random codes
    rng = np.random.default_rng(0)
    codes = rng.integers(
        0, codebooks.shape[1], size=(2, codebooks.shape[0], 50)
    ).astype(np.int32)
    ours = np.asarray(frontend_mod.decode_codes(codes, codebooks, mode))

    import torch

    tcodes = torch.from_numpy(codes).to(torch.long)
    if args.codec == 'encodec':
        from encodec import EncodecModel

        quantizer = EncodecModel.encodec_model_24khz().quantizer
        with torch.no_grad():
            theirs = quantizer.decode(tcodes.transpose(0, 1)).numpy()
    else:
        import dac

        model = dac.DAC.load(dac.utils.download(model_type='16khz'))
        with torch.no_grad():
            _, latents, _ = model.quantizer.from_codes(tcodes)
            theirs = latents.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
    print('verified against torch quantizer: allclose')


if __name__ == '__main__':
    main()
