from simclr_tpu.train.common import (
    History,
    TrainState,
    adam_torch,
    sgd_nesterov,
    with_grad_accumulation,
)
from simclr_tpu.train.lin_eval import (
    LinearClassifier,
    evaluate_linear,
    extract_features,
    linear_evaluation,
    train_linear_classifier,
)
from simclr_tpu.train.mine import (
    MineResult,
    train_mine,
    train_mine_from_export,
)
from simclr_tpu.train.pretrain import (
    PretrainEngine,
    PretrainResult,
    build_engine,
    evaluate_auxiliary,
    init_simclr,
    pretrain,
)
from simclr_tpu.train.ssl import (
    FineTuneResult,
    evaluate_classifier,
    init_finetune,
    train_ssl,
)
from simclr_tpu.train.streaming import pretrain_streaming
from simclr_tpu.train.supervised import SupervisedResult, train_supervised

__all__ = [
    "History",
    "TrainState",
    "adam_torch",
    "sgd_nesterov",
    "with_grad_accumulation",
    "LinearClassifier",
    "evaluate_linear",
    "extract_features",
    "linear_evaluation",
    "train_linear_classifier",
    "MineResult",
    "train_mine",
    "train_mine_from_export",
    "PretrainEngine",
    "PretrainResult",
    "build_engine",
    "evaluate_auxiliary",
    "init_simclr",
    "pretrain",
    "FineTuneResult",
    "evaluate_classifier",
    "init_finetune",
    "train_ssl",
    "pretrain_streaming",
    "SupervisedResult",
    "train_supervised",
]
