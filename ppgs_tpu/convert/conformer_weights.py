"""Convert the reference conformer encoder checkpoint to our pytree.

The published checkpoint (HF CameronChurchwell/ppg_conformer_model,
24epoch.pth) stores an ESPnet ConformerEncoder under 'encoder.*' keys
(reference build_ppg_model.py:69-85). Layout mapping (torch -> ours):
- Conv2d (O, I, KH, KW)        -> (KH, KW, I, O)
- Conv1d (O, I, K)             -> (K, I, O)
- Linear (out, in)             -> (in, out)
- BatchNorm running stats kept as-is.
"""

from typing import Dict

import numpy as np


def _linear(sd, prefix, bias=True):
    p = {'weight': sd[f'{prefix}.weight'].T}
    if bias:
        p['bias'] = sd[f'{prefix}.bias']
    return p


def _norm(sd, prefix):
    return {'scale': sd[f'{prefix}.weight'], 'bias': sd[f'{prefix}.bias']}


def conformer_params_from_state_dict(sd: Dict[str, np.ndarray],
                                     num_blocks: int = 16):
    """Map an ESPnet ConformerEncoder state dict (no 'encoder.' prefix)."""
    params = {
        'embed': {
            'conv1': {
                'weight': np.transpose(sd['embed.conv.0.weight'],
                                       (2, 3, 1, 0)),
                'bias': sd['embed.conv.0.bias'],
            },
            'conv2': {
                'weight': np.transpose(sd['embed.conv.2.weight'],
                                       (2, 3, 1, 0)),
                'bias': sd['embed.conv.2.bias'],
            },
            'out': _linear(sd, 'embed.out.0'),
        },
        'after_norm': _norm(sd, 'after_norm'),
        'blocks': [],
    }
    for i in range(num_blocks):
        p = f'encoders.{i}'
        params['blocks'].append({
            'ff_macaron': {
                'w1': _linear(sd, f'{p}.feed_forward_macaron.w_1'),
                'w2': _linear(sd, f'{p}.feed_forward_macaron.w_2'),
            },
            'norm_ff_macaron': _norm(sd, f'{p}.norm_ff_macaron'),
            'attn': {
                'q': _linear(sd, f'{p}.self_attn.linear_q'),
                'k': _linear(sd, f'{p}.self_attn.linear_k'),
                'v': _linear(sd, f'{p}.self_attn.linear_v'),
                'out': _linear(sd, f'{p}.self_attn.linear_out'),
                'pos': _linear(sd, f'{p}.self_attn.linear_pos', bias=False),
                'pos_bias_u': sd[f'{p}.self_attn.pos_bias_u'],
                'pos_bias_v': sd[f'{p}.self_attn.pos_bias_v'],
            },
            'norm_mha': _norm(sd, f'{p}.norm_mha'),
            'conv': {
                'pointwise1': {
                    'weight': np.transpose(
                        sd[f'{p}.conv_module.pointwise_conv1.weight'],
                        (2, 1, 0)),
                    'bias': sd[f'{p}.conv_module.pointwise_conv1.bias'],
                },
                'depthwise': {
                    'weight': np.transpose(
                        sd[f'{p}.conv_module.depthwise_conv.weight'],
                        (2, 1, 0)),
                    'bias': sd[f'{p}.conv_module.depthwise_conv.bias'],
                },
                'batch_norm': {
                    'scale': sd[f'{p}.conv_module.norm.weight'],
                    'bias': sd[f'{p}.conv_module.norm.bias'],
                    'mean': sd[f'{p}.conv_module.norm.running_mean'],
                    'var': sd[f'{p}.conv_module.norm.running_var'],
                },
                'pointwise2': {
                    'weight': np.transpose(
                        sd[f'{p}.conv_module.pointwise_conv2.weight'],
                        (2, 1, 0)),
                    'bias': sd[f'{p}.conv_module.pointwise_conv2.bias'],
                },
            },
            'norm_conv': _norm(sd, f'{p}.norm_conv'),
            'ff': {
                'w1': _linear(sd, f'{p}.feed_forward.w_1'),
                'w2': _linear(sd, f'{p}.feed_forward.w_2'),
            },
            'norm_ff': _norm(sd, f'{p}.norm_ff'),
            'norm_final': _norm(sd, f'{p}.norm_final'),
        })
    return params


def conformer_params_from_checkpoint(path, num_blocks: int = 16):
    """Load 24epoch.pth-style checkpoint (keys prefixed 'encoder.')."""
    import torch

    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = {k.removeprefix('encoder.'): v.numpy()
          for k, v in ckpt.items() if k.startswith('encoder.')}
    return conformer_params_from_state_dict(sd, num_blocks)
