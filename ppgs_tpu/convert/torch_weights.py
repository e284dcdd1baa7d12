"""Convert reference PyTorch checkpoints to our parameter pytrees.

Layout mapping (torch -> ours):
- Conv1d weight (O, I, K)                  -> (K, I, O)
- MultiheadAttention in_proj_weight (3d,d) -> wq/wk/wv each transposed (d, d)
- Linear weight (out, in)                  -> (in, out)

torch is only required when this module is actually used (CPU is fine).
Reference checkpoint structure: ppgs/load.py:74-79 (state_dict possibly
nested under 'model').
"""

from typing import Dict

import numpy as np


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    """Load a .pt checkpoint into a flat name->numpy dict."""
    import torch

    state_dict = torch.load(path, map_location='cpu', weights_only=False)
    if 'model' in state_dict:
        state_dict = state_dict['model']
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _conv(sd, prefix):
    return {
        'weight': np.transpose(sd[f'{prefix}.weight'], (2, 1, 0)),
        'bias': sd[f'{prefix}.bias'],
    }


def transformer_params_from_state_dict(sd: Dict[str, np.ndarray],
                                       num_layers: int = 5):
    """Map the reference Transformer state dict to our pytree."""
    params = {
        'input_conv': _conv(sd, 'input_layer'),
        'output_conv': _conv(sd, 'output_layer'),
        'layers': [],
    }
    for i in range(num_layers):
        p = f'model.layers.{i}'
        in_w = sd[f'{p}.self_attn.in_proj_weight']   # (3d, d)
        in_b = sd[f'{p}.self_attn.in_proj_bias']     # (3d,)
        d = in_w.shape[1]
        wq, wk, wv = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        bq, bk, bv = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        params['layers'].append({
            'attn': {
                'wq': wq.T, 'wk': wk.T, 'wv': wv.T,
                'wo': sd[f'{p}.self_attn.out_proj.weight'].T,
                'bq': bq, 'bk': bk, 'bv': bv,
                'bo': sd[f'{p}.self_attn.out_proj.bias'],
            },
            'norm1': {'scale': sd[f'{p}.norm1.weight'],
                      'bias': sd[f'{p}.norm1.bias']},
            'norm2': {'scale': sd[f'{p}.norm2.weight'],
                      'bias': sd[f'{p}.norm2.bias']},
            'ffn': {
                'w1': sd[f'{p}.linear1.weight'].T,
                'b1': sd[f'{p}.linear1.bias'],
                'w2': sd[f'{p}.linear2.weight'].T,
                'b2': sd[f'{p}.linear2.bias'],
            },
        })
    return params


def convolution_params_from_state_dict(sd: Dict[str, np.ndarray]):
    """Map the reference Convolution (Sequential 0,2,4) state dict."""
    return {
        'conv1': _conv(sd, '0'),
        'conv2': _conv(sd, '2'),
        'conv3': _conv(sd, '4'),
    }
