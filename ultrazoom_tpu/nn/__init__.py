from ultrazoom_tpu.nn.init import (
    conv_default_bias,
    conv_default_weight,
    kaiming_uniform,
)
from ultrazoom_tpu.nn.transforms import (
    add_lora,
    add_weight_norm,
    lora_param_labels,
    materialize,
    merge_lora,
    remove_weight_norm,
    spectral_init_state,
    spectral_materialize,
)

__all__ = [
    "conv_default_bias",
    "conv_default_weight",
    "kaiming_uniform",
    "add_lora",
    "add_weight_norm",
    "lora_param_labels",
    "materialize",
    "merge_lora",
    "remove_weight_norm",
    "spectral_init_state",
    "spectral_materialize",
]
