from .torch_weights import (
    transformer_params_from_state_dict,
    convolution_params_from_state_dict,
    load_torch_checkpoint,
)
