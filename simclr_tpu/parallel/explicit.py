"""Explicit-collective data-parallel SimCLR training (shard_map).

The framework's primary multi-chip path is the pjit engine
(train/pretrain.py + parallel/mesh.py): activations carry sharding
constraints and XLA inserts the collectives. This module is the EXPLICIT
counterpart — the same mathematical step written with hand-placed
collectives riding ICI, the way an NCCL/MPI pipeline would be written in
other stacks (the reference has neither: its only scale mechanism is
gradient accumulation, utils/model_utils.py:116-123):

  * `jax.lax.all_gather` of the (tiny, 128-d) local projections so every
    shard scores its anchor rows against ALL 2N global negatives;
    gradients flow back through the gather's transpose (a reduce-scatter)
    so each shard also receives its rows' gradient as OTHER shards'
    negatives.
  * `jax.lax.pmean` of BatchNorm statistics inside the encoder
    (models/norm.py `axis_name` path) — explicit SyncBN.
  * `jax.lax.psum` of the per-shard partial parameter gradients.

Per-shard anchor rows are scored against the reference logit layout
([[ab,aa],[bb,ba]], objective.py:35-49): global columns [z2; z1], label
column r, self column (r + N) mod 2N masked with -1e9.

Equality with the single-device / pjit engine is asserted on an
8-virtual-device CPU mesh in tests/test_explicit.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from simclr_tpu.config import Config
from simclr_tpu.models.simclr import SimCLR
from simclr_tpu.ops.augment import augment_train_pair
from simclr_tpu.ops.losses import (
    VERY_LARGE_NUM, l2_normalize, softplus_beta)
from simclr_tpu.parallel.mesh import DATA_AXIS, batch_sharding

try:  # jax >= 0.8 top-level API; fall back for older versions
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_explicit_model(cfg: Config) -> SimCLR:
    """SimCLR instance whose BatchNorms pmean statistics over DATA_AXIS."""
    return SimCLR(cfg=cfg.model, bn_axis_name=DATA_AXIS)


def _local_nt_xent(z_pair, n_global, temperature):
    """Local-row NT-Xent against all-gathered columns.

    `z_pair` is this shard's (2m, d) projections (m view-1 rows then m
    view-2 rows), NOT yet normalized. Returns (sum CE over local anchors,
    sum top-1 hits) — psum and divide by 2N outside.
    """
    m2, _ = z_pair.shape
    m = m2 // 2
    z_pair = l2_normalize(z_pair.astype(jnp.float32), axis=1)

    # (D, 2m, d) -> global view-major blocks.
    gathered = jax.lax.all_gather(z_pair, DATA_AXIS, axis=0)
    d_shards = gathered.shape[0]
    z1_all = gathered[:, :m, :].reshape(d_shards * m, -1)
    z2_all = gathered[:, m:, :].reshape(d_shards * m, -1)
    # Reference column order [z2 ; z1] (objective.py:48-49).
    cols = jnp.concatenate([z2_all, z1_all], axis=0)

    i = jax.lax.axis_index(DATA_AXIS)
    r1 = i * m + jnp.arange(m, dtype=jnp.int32)          # z1-anchor rows
    rows = jnp.concatenate([r1, n_global + r1])          # global row ids
    two_n = 2 * n_global

    sim = jnp.dot(z_pair, cols.T,
                  preferred_element_type=jnp.float32) / temperature
    self_cols = (rows + n_global) % two_n
    sim = sim - VERY_LARGE_NUM * jax.nn.one_hot(
        self_cols, two_n, dtype=sim.dtype)
    logp = jax.nn.log_softmax(sim, axis=-1)
    ce = -jnp.take_along_axis(logp, rows[:, None], axis=-1)[:, 0]
    hits = (jnp.argmax(sim, axis=-1) == rows).astype(jnp.float32)
    return jnp.sum(ce), jnp.sum(hits)


def _local_modified(z_pair, n_global, temperature):
    """Local-row modified ("probabilistic") contrastive loss against
    all-gathered columns (fidelity target: reference objective.py:58-98,
    single-device form in ops/losses.modified_contrastive_loss).

    softplus/L1 normalization are per-row (local); the B x B logits are
    sharded by rows, columns all-gathered. Returns (sum CE over the 2m
    local anchor rows, sum top-1 hits) — psum and divide by 2N outside.
    """
    m2, _ = z_pair.shape
    m = m2 // 2
    x = softplus_beta(z_pair.astype(jnp.float32), 0.8)
    x = x / jnp.maximum(jnp.sum(jnp.abs(x), axis=1, keepdims=True), 1e-12)

    gathered = jax.lax.all_gather(x, DATA_AXIS, axis=0)  # (D, 2m, d)
    d_shards = gathered.shape[0]
    x1_all = gathered[:, :m, :].reshape(d_shards * m, -1)
    x2_all = gathered[:, m:, :].reshape(d_shards * m, -1)
    x1_loc, x2_loc = x[:m], x[m:]

    i = jax.lax.axis_index(DATA_AXIS)
    labels = i * m + jnp.arange(m, dtype=jnp.int32)      # global row ids

    def direction(rows, cols):
        logits = jnp.log(jnp.clip(
            jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
            * n_global, min=1e-4)) / temperature
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        hits = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return jnp.sum(ce), jnp.sum(hits)

    ce_ab, hit_ab = direction(x1_loc, x2_all)
    ce_ba, hit_ba = direction(x2_loc, x1_all)
    return ce_ab + ce_ba, hit_ab + hit_ba


def build_explicit_train_step(cfg: Config, model: SimCLR, tx, mesh):
    """jit-able (state, uint8_batch, key) -> (state, (loss, acc)) with all
    cross-device communication written explicitly. `model` must come from
    `make_explicit_model` (pmean'd BN). Augmentation runs under plain jit
    partitioning (per-sample, no communication); everything between the
    augmented views and the parameter update runs inside shard_map."""
    if cfg.train.accum_steps > 1:
        # Each call consumes a FULL global batch and applies tx.update
        # once; a MultiSteps-wrapped tx would silently average unrelated
        # full batches. Use the pjit engine for accumulation-parity runs.
        raise ValueError(
            "the explicit engine does not support accum_steps > 1 "
            f"(got {cfg.train.accum_steps}); its mesh sharding IS the "
            "large-batch mechanism")
    aug, ds_cfg = cfg.augment, cfg.dataset
    temperature = cfg.train.temperature
    n_global = cfg.train.batch_size
    local_loss_fn = (_local_modified if cfg.train.modified_loss
                     else _local_nt_xent)

    @partial(_shard_map, mesh=mesh,
             in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
             out_specs=(P(), P(), P(), P()))
    def sharded_grads(params, batch_stats, v1, v2, key):
        x = jnp.concatenate([v1, v2], axis=0)       # (2m, H, W, C) local

        def local_loss(p):
            (_, z), up = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(
                    key, jax.lax.axis_index(DATA_AXIS))})
            ce_sum, hit_sum = local_loss_fn(z, n_global, temperature)
            loss = jax.lax.psum(ce_sum, DATA_AXIS) / (2 * n_global)
            acc = jax.lax.psum(hit_sum, DATA_AXIS) * (100.0 / (2 * n_global))
            return loss, (acc, up["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        # Each shard holds the partial derivative through its own rows;
        # the true gradient of the psum'd loss is their sum.
        grads = jax.lax.psum(grads, DATA_AXIS)
        return loss, acc, new_stats, grads

    def train_step(state, batch, key):
        k_aug, k_drop = jax.random.split(key)
        v1, v2 = augment_train_pair(k_aug, batch, aug, ds_cfg)
        v1 = jax.lax.with_sharding_constraint(v1, batch_sharding(mesh))
        v2 = jax.lax.with_sharding_constraint(v2, batch_sharding(mesh))
        loss, acc, new_stats, grads = sharded_grads(
            state.params, state.batch_stats, v1, v2, k_drop)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt, step=state.step + 1)
        return new_state, (loss, acc)

    return train_step


def init_explicit(cfg: Config, key, mesh):
    """Counterpart of train.pretrain.init_simclr for the explicit engine:
    same parameter tree and optimizer (so checkpoints and engine-equality
    tests interchange), but the returned model pmean's BN statistics over
    the mesh axis and the state is replicated onto the mesh."""
    from simclr_tpu.parallel.mesh import put_replicated
    from simclr_tpu.train.pretrain import init_simclr

    if mesh.size > 1 and cfg.model.bn_stats_fraction < 1.0:
        # Mirror init_simclr's mesh rule: subset stats would slice each
        # SHARD's leading rows; exact per-shard stats pmean'd over the mesh
        # equal global-batch statistics and cost 1/D of the data per chip.
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, bn_stats_fraction=1.0))
    _, state, tx = init_simclr(cfg, key, mesh=None)
    return make_explicit_model(cfg), put_replicated(state, mesh), tx


def build_explicit_engine(cfg: Config, model: SimCLR, tx, mesh):
    """Epoch-granular engine (train/pretrain.PretrainEngine) around the
    explicit-collective step: the whole epoch is one jitted lax.scan, same
    as the pjit engine, so `train.pretrain.pretrain()` can drive either
    engine interchangeably (select with scripts/pretrain.py --engine).

    Evaluation reuses the standard engine's eval scan: eval-mode BN uses
    running averages only, so the pmean axis never traces and the explicit
    model applies cleanly under plain jit."""
    from simclr_tpu.train.pretrain import PretrainEngine, build_engine

    step = build_explicit_train_step(cfg, model, tx, mesh)

    @partial(jax.jit, donate_argnums=0)
    def train_epoch(state, images, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(carry, xs):
            idx, k = xs
            return step(carry, jnp.take(images, idx, axis=0), k)

        return jax.lax.scan(body, state, (idx_mat, keys))

    eval_engine = build_engine(cfg, model, tx, mesh=mesh,
                               use_pallas_ntxent=False)
    return PretrainEngine(
        cfg=cfg, model=model, tx=tx,
        train_epoch=train_epoch, eval_epoch=eval_engine.eval_epoch,
        train_step_direct=jax.jit(step, donate_argnums=0),
        mesh=mesh)
