from ultrazoom_tpu.train.steps import (
    GanTrainState,
    TrainState,
    as_float01,
    make_ctrl_eval_step,
    make_ctrl_finetune_step,
    make_ctrl_pretrain_step,
    make_eval_step,
    make_finetune_step,
    make_optimizer,
    make_pretrain_step,
    normalize_batch,
)

__all__ = [
    "GanTrainState",
    "TrainState",
    "as_float01",
    "make_ctrl_eval_step",
    "make_ctrl_finetune_step",
    "make_ctrl_pretrain_step",
    "make_eval_step",
    "make_finetune_step",
    "make_optimizer",
    "make_pretrain_step",
    "normalize_batch",
]
