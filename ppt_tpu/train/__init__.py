from ppt_tpu.train.schedules import cosine_with_warmup
from ppt_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_train_multi_step,
    make_cached_text_eval,
    make_eval_step,
    partition_params,
    merge_params,
)

__all__ = [
    "cosine_with_warmup",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_train_multi_step",
    "make_cached_text_eval",
    "make_eval_step",
    "partition_params",
    "merge_params",
]
