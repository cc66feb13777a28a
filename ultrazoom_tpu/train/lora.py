"""LoRA fine-tuning helpers: train only adapter factors, freeze the base.

The reference attaches ChannelLoRA adapters before loading checkpoints that
carry ``lora_args`` (export_model.ipynb cell-3) and freezes base weights by
flipping ``requires_grad`` (model.py:111-115).  The functional equivalent:
label the param tree (nn.transforms.lora_param_labels) and give frozen
leaves a zero optimizer.
"""

from __future__ import annotations

import optax

from ultrazoom_tpu.nn.transforms import lora_param_labels

__all__ = ["make_lora_optimizer"]


def make_lora_optimizer(
    params,
    learning_rate: float,
    max_gradient_norm: float | None = 1.0,
    accumulation_steps: int = 1,
    weight_decay: float = 0.01,
) -> optax.GradientTransformation:
    """AdamW on lora_a/lora_b only; every other leaf is frozen."""
    chain = []
    if max_gradient_norm is not None:
        chain.append(optax.clip_by_global_norm(max_gradient_norm))
    chain.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    tx = optax.multi_transform(
        {"lora": optax.chain(*chain), "frozen": optax.set_to_zero()},
        lora_param_labels(params),
    )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
