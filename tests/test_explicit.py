"""Explicit-collective (shard_map) engine vs the pjit/single-device path.

The explicit engine (parallel/explicit.py) hand-places the collectives
(all_gather of projections, pmean'd BN stats, psum'd gradients) that the
primary pjit path lets XLA insert; on identical data and parameters the
two must compute the same step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config, ModelConfig, TrainConfig
from simclr_tpu.parallel.explicit import (
    build_explicit_train_step,
    make_explicit_model,
)
from simclr_tpu.parallel.mesh import make_mesh
from simclr_tpu.train.common import TrainState
from simclr_tpu.train.pretrain import build_engine, init_simclr

from tests.test_pretrain import TINY_MODEL, tiny_split


def _cfg(tmp_path):
    # Full-batch statistics so per-shard pmean'd stats equal the global
    # single-device statistics exactly.
    model = dataclasses.replace(TINY_MODEL, bn_stats_fraction=1.0)
    return Config(
        model=model,
        train=TrainConfig(n_epoch=1, batch_size=16, save_ckpt=False,
                          temperature=0.5),
        data_dir=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )


def test_explicit_step_matches_single_device(tmp_path):
    cfg = _cfg(tmp_path)
    split = tiny_split()
    images = split.train.images
    idx = jnp.arange(cfg.train.batch_size)

    # Single-device baseline: one step through the pjit-style engine.
    model, state0, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)
    key = jax.random.key(7)
    s1, (loss1, acc1) = jax.jit(engine.train_epoch)(
        state0, images, idx[None, :], key)

    # Explicit shard_map engine on an 8-virtual-device CPU mesh, from the
    # SAME initial state (param trees are identical by construction).
    mesh = make_mesh(8)
    _, state0b, txb = init_simclr(cfg, jax.random.key(0))
    ex_model = make_explicit_model(cfg)
    step = jax.jit(build_explicit_train_step(cfg, ex_model, txb, mesh))
    step_key = jax.random.split(key, 1)[0]   # train_epoch's per-step key
    s8, (loss8, acc8) = step(state0b, images[idx], step_key)

    np.testing.assert_allclose(
        float(np.asarray(loss1)[-1]), float(loss8), rtol=8e-3)
    np.testing.assert_allclose(
        float(np.asarray(acc1)[-1]), float(acc8), atol=13.0)

    # The explicit psum'd gradient must drive the same update direction.
    upd1 = jax.tree.map(lambda a, b: np.ravel(np.asarray(b - a, np.float64)),
                        state0.params, s1.params)
    upd8 = jax.tree.map(lambda a, b: np.ravel(np.asarray(b - a, np.float64)),
                        state0b.params, s8.params)
    v1 = np.concatenate(jax.tree.leaves(upd1))
    v8 = np.concatenate(jax.tree.leaves(upd8))
    cos = float(np.dot(v1, v8) / (np.linalg.norm(v1) * np.linalg.norm(v8)))
    assert cos > 0.9, f"update cosine {cos}"


def test_explicit_step_matches_single_device_f32_tight(tmp_path):
    """Full-precision configuration: the explicit engine must agree with
    the single-device step to near machine precision — loss rtol 1e-4 and
    parameter-update cosine > 0.999 (the bf16 test above tolerates
    reduction-order noise; this one cannot hide a gradient-scale bug).

    Uses plain SGD instead of the production Adam: Adam's FIRST step from
    zero moments is ~lr*sign(g), so f32 reduction-order noise on
    near-zero gradient coordinates flips update signs and caps the update
    cosine at ~0.998 even for numerically equivalent engines. SGD's
    update is proportional to the gradient, making the cosine a
    well-conditioned measure of gradient agreement."""
    import optax

    cfg = _cfg(tmp_path)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype="float32", bn_dtype="float32"))
    split = tiny_split()
    images = split.train.images
    idx = jnp.arange(cfg.train.batch_size)
    tx = optax.sgd(0.05)

    model, state0, _ = init_simclr(cfg, jax.random.key(0))
    state0 = TrainState.create(state0.params, state0.batch_stats, tx)
    engine = build_engine(cfg, model, tx)
    key = jax.random.key(7)
    s1, (loss1, _) = jax.jit(engine.train_epoch)(
        state0, images, idx[None, :], key)

    mesh = make_mesh(8)
    _, state0b, _ = init_simclr(cfg, jax.random.key(0))
    state0b = TrainState.create(state0b.params, state0b.batch_stats, tx)
    ex_model = make_explicit_model(cfg)
    step = jax.jit(build_explicit_train_step(cfg, ex_model, tx, mesh))
    step_key = jax.random.split(key, 1)[0]
    s8, (loss8, _) = step(state0b, images[idx], step_key)

    np.testing.assert_allclose(
        float(np.asarray(loss1)[-1]), float(loss8), rtol=1e-4)

    upd1 = jax.tree.map(lambda a, b: np.ravel(np.asarray(b - a, np.float64)),
                        state0.params, s1.params)
    upd8 = jax.tree.map(lambda a, b: np.ravel(np.asarray(b - a, np.float64)),
                        state0b.params, s8.params)
    v1 = np.concatenate(jax.tree.leaves(upd1))
    v8 = np.concatenate(jax.tree.leaves(upd8))
    cos = float(np.dot(v1, v8) / (np.linalg.norm(v1) * np.linalg.norm(v8)))
    assert cos > 0.999, f"update cosine {cos}"


def test_explicit_modified_loss_matches_single_device(tmp_path):
    """The explicit engine's sharded modified ("probabilistic") loss equals
    the single-device modified_contrastive_loss step (f32)."""
    cfg = _cfg(tmp_path)
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, compute_dtype="float32",
                                  bn_dtype="float32"),
        train=dataclasses.replace(cfg.train, modified_loss=True))
    split = tiny_split()
    images = split.train.images
    idx = jnp.arange(cfg.train.batch_size)

    model, state0, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)
    key = jax.random.key(7)
    _, (loss1, acc1) = jax.jit(engine.train_epoch)(
        state0, images, idx[None, :], key)

    mesh = make_mesh(8)
    _, state0b, txb = init_simclr(cfg, jax.random.key(0))
    ex_model = make_explicit_model(cfg)
    step = jax.jit(build_explicit_train_step(cfg, ex_model, txb, mesh))
    step_key = jax.random.split(key, 1)[0]
    _, (loss8, acc8) = step(state0b, images[idx], step_key)

    np.testing.assert_allclose(
        float(np.asarray(loss1)[-1]), float(loss8), rtol=1e-4)
    np.testing.assert_allclose(
        float(np.asarray(acc1)[-1]), float(acc8), atol=1e-3)


def test_explicit_rejects_grad_accumulation(tmp_path):
    """accum_steps > 1 is explicitly rejected (each explicit step consumes
    a full global batch; accumulation is the pjit engine's parity mode)."""
    cfg = _cfg(tmp_path)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, accum_steps=4))
    mesh = make_mesh(8)
    _, _, tx = init_simclr(cfg, jax.random.key(0))
    with np.testing.assert_raises_regex(ValueError, "accum_steps"):
        build_explicit_train_step(cfg, make_explicit_model(cfg), tx, mesh)


def test_explicit_engine_via_pretrain_driver(tmp_path):
    """pretrain(engine='explicit') drives the epoch-scan engine end-to-end
    (history populated, validation runs, loss finite)."""
    from simclr_tpu.train.pretrain import pretrain

    cfg = _cfg(tmp_path)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, n_epoch=2))
    res = pretrain(cfg, split=tiny_split(), mesh=make_mesh(8),
                   engine="explicit", log=lambda m: None)
    assert len(res.history.loss["train"]) == 2
    assert np.isfinite(res.history.loss["train"]).all()
    assert len(res.history.loss["valid"]) == 2


def test_explicit_loss_descends(tmp_path):
    """A few explicit-engine steps reduce the contrastive loss."""
    cfg = _cfg(tmp_path)
    split = tiny_split()
    images = np.asarray(split.train.images)

    mesh = make_mesh(8)
    _, state, tx = init_simclr(cfg, jax.random.key(0))
    ex_model = make_explicit_model(cfg)
    step = jax.jit(build_explicit_train_step(cfg, ex_model, tx, mesh))
    # Mirror test_pretrain_runs_and_learns: 4 shuffled epochs over the
    # same 64 images (4 steps/epoch at batch 16).
    epoch_means = []
    s = 0
    for ep in range(4):
        perm = np.random.RandomState(ep).permutation(len(images))
        ep_losses = []
        for b in range(4):
            sel = perm[b * 16:(b + 1) * 16]
            state, (loss, acc) = step(state, jnp.asarray(images[sel]),
                                      jax.random.key(s))
            ep_losses.append(float(loss))
            s += 1
        epoch_means.append(np.mean(ep_losses))
    assert np.isfinite(epoch_means).all()
    assert epoch_means[-1] < epoch_means[0]
