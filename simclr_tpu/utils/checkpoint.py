"""Checkpointing and model export.

Dual-format parity with the reference (SURVEY.md C22):
  (a) resumable training checkpoints — params, batch stats, optimizer state,
      epoch, metric history (reference: utils/model_utils.py:141-154's
      torch.save dict) — stored via Orbax;
  (b) a self-contained inference artifact — params + batch stats + config —
      the analogue of the reference's traced TorchScript export
      (utils/model_utils.py:165-173) that downstream stages load
      (models/ssl.py:24, training_others/train_mine.py:67); stored as a
      single msgpack file via flax.serialization.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization


def _tree_to_numpy(tree):
    return jax.tree.map(np.asarray, tree)


# ---------------------------------------------------------------------------
# (a) Resumable training checkpoints.
# ---------------------------------------------------------------------------

def save_checkpoint(
    ckpt_dir: str,
    epoch: int,
    state_tree: Any,
    history: Optional[Dict[str, Any]] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write checkpoint for `epoch`; returns its path."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch:05d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), _tree_to_numpy(state_tree))
    meta = {"epoch": epoch, "history": history or {}, **(extra or {})}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(
        e for e in os.listdir(ckpt_dir)
        if e.startswith("epoch_")
        and os.path.isfile(os.path.join(ckpt_dir, e, "meta.json"))
    )
    return os.path.join(ckpt_dir, entries[-1]) if entries else None


def load_checkpoint(
    path: str, target_tree: Any
) -> Tuple[Any, Dict[str, Any]]:
    """Restore (state_tree, meta) from a checkpoint path; `target_tree`
    provides structure/dtypes (abstract or concrete)."""
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(
            os.path.join(os.path.abspath(path), "state"),
            _tree_to_numpy(target_tree),
        )
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta


# ---------------------------------------------------------------------------
# (b) Inference artifact ("the TorchScript analogue").
# ---------------------------------------------------------------------------

def export_model(path: str, params: Any, batch_stats: Any,
                 config_json: str = "") -> None:
    payload = {
        "params": _tree_to_numpy(params),
        "batch_stats": _tree_to_numpy(batch_stats),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(path + ".json", "w") as f:
        f.write(config_json or "{}")


def load_exported_model(path: str) -> Tuple[Any, Any, Dict[str, Any]]:
    """Returns (params, batch_stats, config_dict)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    cfg: Dict[str, Any] = {}
    if os.path.isfile(path + ".json"):
        with open(path + ".json") as f:
            cfg = json.load(f)
    return payload["params"], payload["batch_stats"], cfg
