from simclr_tpu.utils.checkpoint import (
    export_model,
    latest_checkpoint,
    load_checkpoint,
    load_exported_model,
    save_checkpoint,
)

__all__ = [
    "export_model",
    "latest_checkpoint",
    "load_checkpoint",
    "load_exported_model",
    "save_checkpoint",
]
