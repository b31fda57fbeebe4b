from simclr_tpu.train.common import (
    History,
    TrainState,
    adam_torch,
    sgd_nesterov,
    with_grad_accumulation,
)
from simclr_tpu.train.pretrain import (
    PretrainEngine,
    PretrainResult,
    build_engine,
    init_simclr,
    pretrain,
)

__all__ = [
    "History",
    "TrainState",
    "adam_torch",
    "sgd_nesterov",
    "with_grad_accumulation",
    "PretrainEngine",
    "PretrainResult",
    "build_engine",
    "init_simclr",
    "pretrain",
]
