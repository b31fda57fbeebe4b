"""Shared training machinery: train state, torch-parity optimizers, metrics
history.

Counterpart of the loop scaffolding in reference utils/model_utils.py (state
dicts, optimizer construction at pretrain.py:80, train_ssl.py:44-45) — but
functional: all mutable training state lives in one pytree threaded through
jitted steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Model + optimizer state threaded through jitted train steps."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar

    @staticmethod
    def create(params, batch_stats, tx) -> "TrainState":
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def adam_torch(lr: float, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam parity (used at reference pretrain.py:80,
    train_supervised.py:20-21, train_mine.py:66).

    torch's `weight_decay` adds wd*param to the RAW gradient before the
    moment updates (L2-into-gradient), unlike AdamW's decoupled decay —
    hence add_decayed_weights comes FIRST in the chain.
    """
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps), optax.scale(-lr)]
    return optax.chain(*chain)


def sgd_nesterov(lr: float, momentum: float) -> optax.GradientTransformation:
    """torch.optim.SGD(momentum, nesterov=True) parity
    (reference: train_ssl.py:44-45)."""
    return optax.sgd(lr, momentum=momentum, nesterov=True)


def with_grad_accumulation(
    tx: optax.GradientTransformation, accum_steps: int
) -> optax.GradientTransformation:
    """Reference-parity gradient accumulation (utils/model_utils.py:116-123):
    mean of micro-batch gradients applied every `accum_steps` steps. Kept as
    an option for parity runs; the TPU-native default is true large-batch
    data parallelism instead (SURVEY.md §2 C21)."""
    if accum_steps <= 1:
        return tx
    return optax.MultiSteps(tx, every_k_schedule=accum_steps)


@dataclasses.dataclass
class History:
    """Loss/accuracy history dicts (reference: utils/model_utils.py:84-86,
    137-140), serialized into checkpoints."""

    loss: Dict[str, List[float]] = dataclasses.field(
        default_factory=lambda: {"train": [], "valid": []})
    accuracy: Dict[str, List[float]] = dataclasses.field(
        default_factory=lambda: {"train": [], "valid": []})

    def append(self, split: str, loss: float, acc: float) -> None:
        self.loss[split].append(float(loss))
        self.accuracy[split].append(float(acc))

    def to_dict(self) -> Dict[str, Any]:
        return {"loss": self.loss, "accuracy": self.accuracy}

    @staticmethod
    def from_dict(d: Optional[Dict[str, Any]]) -> "History":
        h = History()
        if d:
            h.loss = {k: list(v) for k, v in d["loss"].items()}
            h.accuracy = {k: list(v) for k, v in d["accuracy"].items()}
        return h
