"""Semi-supervised fine-tuning with 10% labels.

Counterpart of reference utils/model_utils.py:300-407 (train_ssl/test_ssl)
driven by training_others/train_ssl.py: a SimCLRFineTune model initialized
from a pretrained export, SGD + Nesterov (lr 0.02, momentum 0.98), weighted
10%-label sampling with replacement, optional per-epoch validation with
early stopping (patience 5) keeping the best parameters.

Note: the reference CLI actually never loads the pretrained weights — it
passes model_path positionally into the `device` argument
(train_ssl.py:42 vs models/ssl.py:7-12), so pretrained_path stays None. That
is a bug we fix, not reproduce (SURVEY.md §3.3).

TPU-native: epochs are jitted `lax.scan`s over on-device index matrices;
the fine-tune augmentation (random resized crop + flip,
reference data.py:150-169) runs fused in the step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import (
    DeviceDataset, class_weights, epoch_permutation,
    weighted_sample_indices)
from simclr_tpu.models.simclr import SimCLRFineTune
from simclr_tpu.ops.augment import augment_fine_tune, augment_test
from simclr_tpu.ops.losses import cross_entropy, top1_accuracy
from simclr_tpu.train.common import History, TrainState, sgd_nesterov
from simclr_tpu.utils.checkpoint import load_exported_model


def init_finetune(
    cfg: Config,
    key: jax.Array,
    pretrained_path: Optional[str] = None,
    num_classes: Optional[int] = None,
) -> Tuple[SimCLRFineTune, TrainState, Any]:
    """Build the fine-tune model, restoring every pretrained parameter
    (reference: models/ssl.py:24-27 loads the full SimCLR state dict)."""
    model = SimCLRFineTune(
        cfg=cfg.model, num_classes=num_classes or cfg.dataset.num_classes)
    fake = jnp.zeros(
        (2, cfg.dataset.img_size, cfg.dataset.img_size, 3), jnp.float32)
    k_p, k_d = jax.random.split(key)
    variables = model.init({"params": k_p, "dropout": k_d}, fake,
                           train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    if pretrained_path is not None:
        pre_params, pre_stats, _ = load_exported_model(pretrained_path)
        # Graft f and g wholesale; supervised_head stays fresh.
        params = dict(params)
        batch_stats = dict(batch_stats)
        for key_ in ("f", "g"):
            params[key_] = jax.tree.map(jnp.asarray, pre_params[key_])
            batch_stats[key_] = jax.tree.map(
                jnp.asarray, pre_stats[key_])
    tx = sgd_nesterov(cfg.optim.lr_ssl, cfg.optim.momentum_ssl)
    return model, TrainState.create(params, batch_stats, tx), tx


def build_supervised_epoch_fns(model, tx, cfg: Config,
                               augment: str = "fine_tune"):
    """Jitted (train_epoch, eval_epoch) for any classifier with
    model.apply(vars, x, train) -> logits.

    augment: 'fine_tune' (crop+flip, data.py:150-169), 'supervised'
    (flip+translate+jitter, data.py:195-217), or 'none' (plain normalize).
    """
    ds_cfg, aug_cfg = cfg.dataset, cfg.augment

    def make_views(key, batch):
        if augment == "fine_tune":
            return augment_fine_tune(key, batch, aug_cfg, ds_cfg)
        if augment == "supervised":
            from simclr_tpu.ops.augment import augment_supervised
            return augment_supervised(key, batch, ds_cfg)
        return augment_test(batch, ds_cfg)

    def train_step(state: TrainState, images, labels, idx, key):
        k_aug, k_drop = jax.random.split(key)
        batch = jnp.take(images, idx, axis=0)
        targets = jnp.take(labels, idx, axis=0)
        x = make_views(k_aug, batch)

        def objective(params):
            logits, up = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
                rngs={"dropout": k_drop})
            loss = cross_entropy(logits, targets)
            return loss, (top1_accuracy(logits, targets),
                          up["batch_stats"])

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        return state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1), (loss, acc)

    @partial(jax.jit, donate_argnums=0)
    def train_epoch(state, images, labels, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(carry, xs):
            idx, k = xs
            return train_step(carry, images, labels, idx, k)

        return jax.lax.scan(body, state, (idx_mat, keys))

    @jax.jit
    def eval_batch(state, images, labels, key):
        x = augment_test(images, ds_cfg)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False, rngs={"dropout": key})
        valid = labels >= 0  # padded tail rows carry label -1
        safe = jnp.maximum(labels, 0)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll_each = -jnp.take_along_axis(
            log_probs, safe[:, None], axis=-1)[:, 0]
        nll = jnp.sum(jnp.where(valid, nll_each, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
        correct = jnp.sum(
            ((jnp.argmax(logits, -1) == labels) & valid).astype(jnp.int32))
        return nll, correct

    return train_epoch, eval_batch


def evaluate_classifier(
    eval_batch, state, ds: DeviceDataset, batch_size: int = 512,
    key: Optional[jax.Array] = None,
) -> Tuple[float, float]:
    """test_ssl parity (reference: model_utils.py:372-407): mean batch loss,
    total accuracy over all samples."""
    key = key if key is not None else jax.random.key(0)
    losses, correct, total = [], 0, 0
    n = ds.n
    batch_size = min(batch_size, max(n, 1))
    pad = (-n) % batch_size
    images, labels = ds.images, ds.labels
    if pad:  # pad to one compiled shape; mask the padding out of the count
        reps = -(-pad // n)
        filler = jnp.concatenate([images] * reps, axis=0)[:pad]
        images = jnp.concatenate([images, filler], axis=0)
        labels = jnp.concatenate(
            [labels, jnp.full((pad,), -1, labels.dtype)], axis=0)
    for start in range(0, n + pad, batch_size):
        key, sub = jax.random.split(key)
        nll, corr = eval_batch(
            state, images[start:start + batch_size],
            labels[start:start + batch_size], sub)
        losses.append(float(nll))
        correct += int(corr)
        total += int(jnp.sum(
            labels[start:start + batch_size] >= 0))
    return float(np.mean(losses)), 100.0 * correct / total


@dataclasses.dataclass
class FineTuneResult:
    state: TrainState
    history: History
    best_acc: float
    test_acc: Optional[float] = None


def train_ssl(
    cfg: Config,
    train_ds: DeviceDataset,
    val_ds: Optional[DeviceDataset] = None,
    test_ds: Optional[DeviceDataset] = None,
    pretrained_path: Optional[str] = None,
    n_epochs: Optional[int] = None,
    patience: int = 5,
    log: Callable[[str], None] = print,
) -> FineTuneResult:
    """Fine-tune driver (reference: model_utils.py:300-369 +
    train_ssl.py:34-60)."""
    tcfg = cfg.train
    n_epochs = n_epochs or tcfg.n_epoch_ssl
    batch = tcfg.micro_batch_size
    key = jax.random.key(tcfg.seed)
    k_init, k_loop = jax.random.split(key)

    model, state, tx = init_finetune(cfg, k_init, pretrained_path)
    train_epoch, eval_batch = build_supervised_epoch_fns(
        model, tx, cfg, augment="fine_tune")

    labels_np = np.asarray(train_ds.labels)
    use_weighted = tcfg.ssl_label_size < 1.0
    if use_weighted:
        weights = jnp.asarray(class_weights(labels_np))
        n_draw = max(int(np.floor(tcfg.ssl_label_size * train_ds.n)),
                     batch)  # at least one optimizer step per epoch

    history = History()
    best_acc, best_params, patience_counter = 0.0, None, 0
    for epoch in range(n_epochs):
        k_ep = jax.random.fold_in(k_loop, epoch)
        k_idx, k_steps, k_val = jax.random.split(k_ep, 3)
        if use_weighted:
            idx_mat = weighted_sample_indices(k_idx, weights, n_draw, batch)
        else:
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
                log("Found a better model, saving...")
            else:
                patience_counter += 1
                if patience_counter == patience:
                    log("Early stopping ... ")
                    break

    if best_params is not None:
        state = state.replace(
            params=jax.tree.map(jnp.asarray, best_params))

    test_acc = None
    if test_ds is not None:
        test_loss, test_acc = evaluate_classifier(
            eval_batch, state, test_ds)
        log(f"Got ({test_acc:.2f}%) correct on test")
    return FineTuneResult(state=state, history=history,
                          best_acc=best_acc, test_acc=test_acc)
