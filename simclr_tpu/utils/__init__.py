from simclr_tpu.utils.checkpoint import (
    export_model,
    latest_checkpoint,
    load_checkpoint,
    load_exported_model,
    save_checkpoint,
)
from simclr_tpu.utils.profiling import (
    MetricsLogger,
    StepTimer,
    annotate,
    block_on,
    read_metrics,
    trace,
)

__all__ = [
    "export_model",
    "latest_checkpoint",
    "load_checkpoint",
    "load_exported_model",
    "save_checkpoint",
    "MetricsLogger",
    "StepTimer",
    "annotate",
    "block_on",
    "read_metrics",
    "trace",
]
