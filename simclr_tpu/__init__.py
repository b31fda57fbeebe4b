"""simclr_tpu — a TPU-native contrastive-learning framework.

Built from scratch in JAX/XLA/Pallas with the full capabilities of the
PyTorch SimCLR reference (sylviesss/pytorch-simclr); see SURVEY.md at the
repo root for the component-by-component blueprint.
"""

__version__ = "0.1.0"

from simclr_tpu.config import (
    AugmentConfig,
    Config,
    DatasetConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    dataset_config,
)

__all__ = [
    "AugmentConfig",
    "Config",
    "DatasetConfig",
    "ModelConfig",
    "OptimConfig",
    "TrainConfig",
    "dataset_config",
    "__version__",
]
