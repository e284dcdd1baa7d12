"""Convert the published conformer checkpoint (24epoch.pth) to npz.

Usage (requires network + torch):
    python scripts/convert_conformer.py [path/to/24epoch.pth]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from ppgs_tpu import config as config_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.convert.conformer_weights import (
    conformer_params_from_checkpoint)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('checkpoint', nargs='?')
    args = parser.parse_args()

    if args.checkpoint is None:
        from huggingface_hub import hf_hub_download

        args.checkpoint = hf_hub_download(
            repo_id='CameronChurchwell/ppg_conformer_model',
            filename='24epoch.pth')

    params = conformer_params_from_checkpoint(args.checkpoint)
    out = config_mod.CHECKPOINT_DIR / 'conformer-24epoch.npz'
    out.parent.mkdir(parents=True, exist_ok=True)
    load_mod.save_params(out, params)
    print(f'Saved {out}')


if __name__ == '__main__':
    main()
