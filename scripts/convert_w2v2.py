"""Convert wav2vec2 weights (facebook/wav2vec2-base or Charsiu) to npz.

Usage (requires network + torch + transformers):
    python scripts/convert_w2v2.py                  # facebook/wav2vec2-base
    python scripts/convert_w2v2.py --charsiu        # charsiu/en_w2v2_fc_10ms
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from ppgs_tpu import config as config_mod
from ppgs_tpu import load as load_mod
from ppgs_tpu.convert.w2v2_weights import w2v2_params_from_state_dict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--charsiu', action='store_true')
    args = parser.parse_args()

    config_mod.CHECKPOINT_DIR.mkdir(parents=True, exist_ok=True)

    if args.charsiu:
        # Charsiu frame classifier: stride-1 wav2vec2 trunk + linear head
        import transformers
        import torch

        sd_full = transformers.modeling_utils.load_state_dict(
            transformers.utils.cached_file(
                'charsiu/en_w2v2_fc_10ms', 'pytorch_model.bin'))
        sd = {k.removeprefix('wav2vec2.'): v.numpy()
              for k, v in sd_full.items() if k.startswith('wav2vec2.')}
        params = {
            'w2v2': w2v2_params_from_state_dict(sd),
            'head': {
                'weight': sd_full['cls_head.weight'].numpy().T,
                'bias': sd_full['cls_head.bias'].numpy(),
            },
        }
        out = config_mod.CHECKPOINT_DIR / 'charsiu-w2v2-fc.npz'
    else:
        import transformers

        model = transformers.Wav2Vec2Model.from_pretrained(
            'facebook/wav2vec2-base')
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        params = w2v2_params_from_state_dict(sd)
        out = config_mod.CHECKPOINT_DIR / 'wav2vec2-base.npz'

    load_mod.save_params(out, params)
    print(f'Saved {out}')


if __name__ == '__main__':
    main()
