"""Convert transformers Wav2Vec2Model weights to our pytree.

Layout mapping (torch -> ours):
- feature_extractor.conv_layers.{i}.conv.weight (O, I, K) -> (K, I, O)
- pos_conv weight-norm (weight_g, weight_v with dim=2)  -> effective weight
  g * v / ||v||_(0,1), then (O, I, K) -> (K, I, O)
- Linear (out, in) -> (in, out)
"""

from typing import Dict

import numpy as np


def _linear(sd, prefix):
    return {'weight': sd[f'{prefix}.weight'].T, 'bias': sd[f'{prefix}.bias']}


def w2v2_params_from_state_dict(sd: Dict[str, np.ndarray],
                                num_feat_layers=7, num_layers=12):
    params = {'feature_encoder': []}
    for i in range(num_feat_layers):
        prefix = f'feature_extractor.conv_layers.{i}'
        layer = {'conv': {
            'weight': np.transpose(sd[f'{prefix}.conv.weight'], (2, 1, 0))}}
        if f'{prefix}.layer_norm.weight' in sd:
            layer['group_norm'] = {
                'scale': sd[f'{prefix}.layer_norm.weight'],
                'bias': sd[f'{prefix}.layer_norm.bias'],
            }
        params['feature_encoder'].append(layer)

    params['feature_projection'] = {
        'norm': {'scale': sd['feature_projection.layer_norm.weight'],
                 'bias': sd['feature_projection.layer_norm.bias']},
        'projection': _linear(sd, 'feature_projection.projection'),
    }

    # Spec-augment fill vector (train-mode only; some exported state dicts
    # omit it — fall back to the HF init distribution's mean)
    if 'masked_spec_embed' in sd:
        params['masked_spec_embed'] = sd['masked_spec_embed']
    else:
        hidden = sd['feature_projection.projection.weight'].shape[0]
        params['masked_spec_embed'] = np.full((hidden,), 0.5,
                                              dtype=np.float32)

    # Positional conv with weight norm (dim=2)
    base = 'encoder.pos_conv_embed.conv'
    if f'{base}.parametrizations.weight.original0' in sd:
        g = sd[f'{base}.parametrizations.weight.original0']
        v = sd[f'{base}.parametrizations.weight.original1']
    else:
        g = sd[f'{base}.weight_g']
        v = sd[f'{base}.weight_v']
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    weight = g * v / norm                     # (O, I_g, K)
    params['encoder'] = {
        'pos_conv': {
            'weight': np.transpose(weight, (2, 1, 0)),
            'bias': sd[f'{base}.bias'],
        },
        'norm': {'scale': sd['encoder.layer_norm.weight'],
                 'bias': sd['encoder.layer_norm.bias']},
        'layers': [],
    }

    for i in range(num_layers):
        p = f'encoder.layers.{i}'
        params['encoder']['layers'].append({
            'attn': {
                'wq': sd[f'{p}.attention.q_proj.weight'].T,
                'bq': sd[f'{p}.attention.q_proj.bias'],
                'wk': sd[f'{p}.attention.k_proj.weight'].T,
                'bk': sd[f'{p}.attention.k_proj.bias'],
                'wv': sd[f'{p}.attention.v_proj.weight'].T,
                'bv': sd[f'{p}.attention.v_proj.bias'],
                'wo': sd[f'{p}.attention.out_proj.weight'].T,
                'bo': sd[f'{p}.attention.out_proj.bias'],
            },
            'norm1': {'scale': sd[f'{p}.layer_norm.weight'],
                      'bias': sd[f'{p}.layer_norm.bias']},
            'ffn': {
                'w1': sd[f'{p}.feed_forward.intermediate_dense.weight'].T,
                'b1': sd[f'{p}.feed_forward.intermediate_dense.bias'],
                'w2': sd[f'{p}.feed_forward.output_dense.weight'].T,
                'b2': sd[f'{p}.feed_forward.output_dense.bias'],
            },
            'norm2': {'scale': sd[f'{p}.final_layer_norm.weight'],
                      'bias': sd[f'{p}.final_layer_norm.bias']},
        })
    return params


def w2v2_params_from_pretrained(name='facebook/wav2vec2-base'):
    """Download + convert (requires network + torch + transformers)."""
    import transformers

    model = transformers.Wav2Vec2Model.from_pretrained(name)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return w2v2_params_from_state_dict(sd)


def w2v2_config_from_hf(hf_config, **overrides):
    """Build a models.w2v2.W2V2Config from a transformers Wav2Vec2Config so
    the hub checkpoint's train-mode hyperparameters (dropouts, LayerDrop,
    spec-augment) override our local transformers defaults."""
    from ..models.w2v2 import W2V2Config

    return W2V2Config(
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=(
            hf_config.num_conv_pos_embedding_groups),
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout,
        activation_dropout=hf_config.activation_dropout,
        attention_dropout=hf_config.attention_dropout,
        feat_proj_dropout=hf_config.feat_proj_dropout,
        layerdrop=hf_config.layerdrop,
        apply_spec_augment=hf_config.apply_spec_augment,
        mask_time_prob=hf_config.mask_time_prob,
        mask_time_length=hf_config.mask_time_length,
        mask_time_min_masks=getattr(hf_config, 'mask_time_min_masks', 2),
        **overrides)
