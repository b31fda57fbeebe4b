"""Device mesh + sharding helpers.

The reference has NO distributed machinery at all — its only scale mechanism
is gradient accumulation on one GPU (reference: utils/model_utils.py:116-123;
SURVEY.md §2 C21). Here the batch axis is sharded over a 1-D 'data' mesh
under jit: parameters are replicated, activations are batch-sharded, and the
NT-Xent similarity matmuls over the global batch make XLA all-gather the
(tiny, 128-d) projection embeddings over ICI — so every chip computes its
row-slice of the 2Nx2N logits against ALL global negatives, with gradients
flowing through the gather automatically. True batch-512 contrastive
semantics, which accumulation cannot provide.

Batch-norm note: batch statistics are reductions over the *global* (sharded)
batch inside the same jitted computation, so data-parallel training gets
synchronized BN for free — no separate SyncBN machinery.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Optional[Mesh]):
    """Constrain an activation's leading axis to the data mesh (no-op when
    mesh is None / single-device)."""
    if mesh is None or mesh.size == 1:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))


def put_replicated(tree, mesh: Optional[Mesh]):
    if mesh is None:
        return tree
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
