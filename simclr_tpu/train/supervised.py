"""Supervised ResNet-50 baseline.

Counterpart of reference training_others/train_supervised.py:8-99: paired
supervised-augmented views with BOTH views trained per batch, Adam
(torch default lr 1e-3, wd 1e-6), per-epoch validation with early stopping
(patience 4) keeping the best parameters, final test evaluation.

Parity detail: the reference performs two sequential optimizer steps per
batch, one per augmented view (train_supervised.py:50-62); the scan body
below does the same (two update applications per step) rather than folding
both views into one batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import DeviceDataset, epoch_permutation
from simclr_tpu.models.resnet import SupervisedResNet
from simclr_tpu.ops.augment import augment_supervised
from simclr_tpu.ops.losses import cross_entropy, top1_accuracy
from simclr_tpu.train.common import History, TrainState, adam_torch
from simclr_tpu.train.ssl import (
    build_supervised_epoch_fns, evaluate_classifier)


@dataclasses.dataclass
class SupervisedResult:
    state: TrainState
    history: History
    best_acc: float
    test_acc: Optional[float] = None


def train_supervised(
    cfg: Config,
    train_ds: DeviceDataset,
    val_ds: Optional[DeviceDataset] = None,
    test_ds: Optional[DeviceDataset] = None,
    n_epochs: Optional[int] = None,
    patience: int = 4,
    log: Callable[[str], None] = print,
) -> SupervisedResult:
    tcfg = cfg.train
    n_epochs = n_epochs or tcfg.n_epoch
    batch = tcfg.micro_batch_size
    key = jax.random.key(tcfg.seed)
    k_init, k_loop = jax.random.split(key)

    model = SupervisedResNet(
        num_classes=cfg.dataset.num_classes,
        low_quality_img=cfg.model.low_quality_img,
        stage_sizes=cfg.model.stage_sizes,
        width=cfg.model.width,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        bn_dtype=jnp.dtype(cfg.model.bn_dtype),
        bn_stats_fraction=cfg.model.bn_stats_fraction)
    fake = jnp.zeros(
        (2, cfg.dataset.img_size, cfg.dataset.img_size, 3), jnp.float32)
    variables = model.init({"params": k_init}, fake, train=False)
    tx = adam_torch(cfg.optim.lr, cfg.optim.wt_decay)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx)

    ds_cfg = cfg.dataset

    def half_step(state, x, targets):
        def objective(params):
            logits, up = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            return cross_entropy(logits, targets), (
                top1_accuracy(logits, targets), up["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1), loss, acc

    @partial(jax.jit, donate_argnums=0)
    def train_epoch(state, images, labels, idx_mat, epoch_key):
        # Two independently-augmented views of each batch, each its own
        # optimizer step (reference: train_supervised.py:50-62). The views
        # are interleaved as consecutive scan iterations over ONE half-step
        # body — same update order as the reference's inner view loop, but
        # half the compiled graph.
        idx2 = jnp.repeat(idx_mat, 2, axis=0)
        keys = jax.random.split(epoch_key, idx2.shape[0])

        def body(carry, xs):
            idx, k = xs
            batch_imgs = jnp.take(images, idx, axis=0)
            targets = jnp.take(labels, idx, axis=0)
            carry, loss, acc = half_step(
                carry, augment_supervised(k, batch_imgs, ds_cfg), targets)
            return carry, (loss, acc)

        state, (losses, accs) = jax.lax.scan(body, state, (idx2, keys))
        # Average the two per-view sub-steps back to per-batch metrics.
        return state, (losses.reshape(-1, 2).mean(1),
                       accs.reshape(-1, 2).mean(1))

    # Reuse the generic eval-batch builder for val/test accuracy.
    _, eval_batch = build_supervised_epoch_fns(model, tx, cfg,
                                               augment="none")

    history = History()
    best_acc, best_params, patience_counter = 0.0, None, 0
    for epoch in range(n_epochs):
        k_ep = jax.random.fold_in(k_loop, epoch)
        k_idx, k_steps, k_val = jax.random.split(k_ep, 3)
        idx_mat = epoch_permutation(k_idx, train_ds.n, batch)
        state, (losses, accs) = train_epoch(
            state, train_ds.images, train_ds.labels, idx_mat, k_steps)
        losses, accs = np.asarray(losses), np.asarray(accs)
        history.append("train", losses.mean(), accs.mean())
        log(f"epoch {epoch + 1}: | Train Loss: {losses[-1]:.3f} | "
            f"Train Top 1 Accuracy: {accs[-1]:.3f}%")

        if val_ds is not None:
            val_loss, val_acc = evaluate_classifier(
                eval_batch, state, val_ds, key=k_val)
            history.append("valid", val_loss, val_acc)
            if val_acc > best_acc:
                best_acc, patience_counter = val_acc, 0
                best_params = jax.tree.map(np.asarray, state.params)
                log("Found a better model. Saving...")
            else:
                patience_counter += 1
            if patience_counter == patience:
                log("Early stopping, reverting to the previous model ...")
                break

    if best_params is not None:
        state = state.replace(
            params=jax.tree.map(jnp.asarray, best_params))
    test_acc = None
    if test_ds is not None:
        _, test_acc = evaluate_classifier(eval_batch, state, test_ds)
        log(f"Got ({test_acc:.2f}%) correct on test")
    return SupervisedResult(state=state, history=history,
                            best_acc=best_acc, test_acc=test_acc)
