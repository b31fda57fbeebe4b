"""Serialized serving artifacts via jax.export (StableHLO).

The reference's deployment artifact is a traced TorchScript module
(reference: utils/model_utils.py:165-173). The TPU-native equivalents here:

  * `utils/checkpoint.py:export_model` — params + batch stats (msgpack),
    reloadable into any model variant (used by fine-tune / MINE / lin-eval);
  * this module — a fully serialized STABLEHLO program of the inference
    forward pass via `jax.export`: the computation itself (not just
    weights) round-trips to bytes, restores without the Python model
    definition, and can be handed to any StableHLO-consuming runtime.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_forward(
    path: str,
    model,
    params,
    batch_stats,
    input_shape: Tuple[int, ...],
    dropout_seed: int = 0,
) -> None:
    """Serialize the eval-mode forward pass (weights baked in) to `path`.

    The exported function maps a float32 NHWC image batch to (h, z) — the
    same interface downstream stages consume from the reference's
    TorchScript trace (reference: models/ssl.py:24, train_mine.py:67).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    key = jax.random.key(dropout_seed)

    def forward(x):
        return model.apply(variables, x, train=False,
                           rngs={"dropout": key})

    exported = jax_export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)


def load_forward(path: str) -> Callable:
    """Deserialize an exported forward; returns a callable jax function
    (no Python model definition needed)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
