"""Convert a reference PyTorch checkpoint to a ppgs_tpu .npz checkpoint.

Usage:
    python scripts/convert_checkpoint.py mel-800k.pt [output.npz]
    python scripts/convert_checkpoint.py --hf mel     # download + convert

Published reference checkpoints live on HuggingFace Hub at
CameronChurchwell/ppgs (mel-800k.pt, w2v2fb-425k.pt); see
reference ppgs/load.py:59-71.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from ppgs_tpu import config as config_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.convert import (
    load_torch_checkpoint,
    transformer_params_from_state_dict,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('checkpoint', nargs='?')
    parser.add_argument('output', nargs='?')
    parser.add_argument('--hf', choices=['mel', 'w2v2fb'],
                        help='Download the published checkpoint from HF hub')
    parser.add_argument('--layers', type=int, default=5)
    args = parser.parse_args()

    if args.hf:
        import huggingface_hub

        name = {'mel': 'mel-800k.pt', 'w2v2fb': 'w2v2fb-425k.pt'}[args.hf]
        path = huggingface_hub.hf_hub_download('CameronChurchwell/ppgs', name)
        output = config_mod.CHECKPOINT_DIR / name.replace('.pt', '.npz')
    else:
        path = args.checkpoint
        output = args.output or Path(path).with_suffix('.npz')

    sd = load_torch_checkpoint(path)
    params = transformer_params_from_state_dict(sd, num_layers=args.layers)
    Path(output).parent.mkdir(parents=True, exist_ok=True)
    load_mod.save_params(output, params)
    print(f'Converted {path} -> {output}')


if __name__ == '__main__':
    main()
