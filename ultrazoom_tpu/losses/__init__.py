from ultrazoom_tpu.losses.adversarial import (
    adaptive_multitask,
    adaptive_multitask_init,
    balanced_multitask,
    bce_with_logits,
    relativistic_bce,
)
from ultrazoom_tpu.losses.vgg import init_vgg19_features, vgg_features, vgg_loss

__all__ = [
    "adaptive_multitask",
    "adaptive_multitask_init",
    "balanced_multitask",
    "bce_with_logits",
    "relativistic_bce",
    "init_vgg19_features",
    "vgg_features",
    "vgg_loss",
]
