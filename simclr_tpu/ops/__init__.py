from simclr_tpu.ops.losses import (
    cross_entropy,
    mine_loss,
    modified_contrastive_loss,
    nt_xent_logits,
    nt_xent_loss,
    top1_accuracy,
)

__all__ = [
    "cross_entropy",
    "mine_loss",
    "modified_contrastive_loss",
    "nt_xent_logits",
    "nt_xent_loss",
    "top1_accuracy",
]
