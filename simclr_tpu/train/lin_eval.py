"""Linear evaluation: frozen-feature extraction + full-batch L-BFGS.

Counterpart of reference utils/model_utils.py:176-297 (feature_extraction,
train_lin_eval, test_lin_eval): extract 2048-d encoder features h over the
un-augmented train split, fit Flatten+Linear(2048 -> 10) with L-BFGS and an
L2 penalty reg * ||W||^2 on the weight matrix only, evaluate CE + top-1 on
test features.

TPU-native: the whole feature matrix (≈40k x 2048 = 330 MB fp32) lives in
HBM and each L-BFGS iteration is one jitted full-batch value-and-grad; the
optimizer loop is a single `lax.scan` over optax.lbfgs (zoom line search).
The reference runs torch LBFGS(max_iter=20) closures n_step times
(model_utils.py:272-295); parity target is final top-1, not the line-search
internals (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import DeviceDataset
from simclr_tpu.ops.augment import augment_test
from simclr_tpu.ops.losses import cross_entropy, top1_accuracy


def extract_features(
    model,
    params,
    batch_stats,
    ds: DeviceDataset,
    cfg: Config,
    batch_size: int = 512,
    use_hidden_feat: bool = True,
    dropout_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Eval-mode forward over un-augmented (normalized) images, collecting h
    (or z) + targets (reference: model_utils.py:176-200)."""
    variables = {"params": params, "batch_stats": batch_stats}

    # `variables` is a jit ARGUMENT, not a closure capture — captured
    # arrays are baked into the compiled program as constants (94 MB of
    # params here), which bloats compile payloads and recompiles on every
    # new checkpoint.
    @jax.jit
    def forward(variables, images, key):
        x = augment_test(images, cfg.dataset)
        h, z = model.apply(variables, x, train=False,
                           rngs={"dropout": key})
        return h if use_hidden_feat else z

    key = dropout_key if dropout_key is not None else jax.random.key(0)
    feats = []
    n = ds.n
    # Pad the tail batch so everything hits one compiled shape.
    batch_size = min(batch_size, max(n, 1))
    pad = (-n) % batch_size
    images = ds.images
    if pad:
        reps = -(-pad // n)
        filler = jnp.concatenate([images] * reps, axis=0)[:pad]
        images = jnp.concatenate([images, filler], axis=0)
    for start in range(0, n + pad, batch_size):
        key, sub = jax.random.split(key)
        feats.append(
            forward(variables, images[start:start + batch_size], sub))
    features = jnp.concatenate(feats, axis=0)[:n]
    return features, ds.labels


@dataclasses.dataclass
class LinearClassifier:
    w: jax.Array  # (D, C)
    b: jax.Array  # (C,)

    def __call__(self, x):
        return x @ self.w + self.b


def train_linear_classifier(
    features: jax.Array,
    targets: jax.Array,
    reg_weight: float = 1e-3,
    n_steps: int = 100,
    max_iter: int = 20,
    n_class: int = 10,
    log: Callable[[str], None] = print,
) -> Tuple[LinearClassifier, np.ndarray]:
    """L-BFGS fit (reference: model_utils.py:242-297). Runs
    n_steps * max_iter L-BFGS iterations — the torch loop calls
    LBFGS(max_iter=20).step(closure) n_step times with persistent state.

    Returns the classifier and the per-iteration loss trace.
    """
    d = features.shape[1]
    params = {"w": jnp.zeros((d, n_class), jnp.float32),
              "b": jnp.zeros((n_class,), jnp.float32)}

    opt = optax.lbfgs()

    # The feature matrix is a jit ARGUMENT: captured in a closure it would
    # be baked into the compiled executable as a 300+ MB constant.
    @partial(jax.jit, static_argnames="length")
    def fit(params, features, targets, length):
        def loss_fn(p):
            logits = features @ p["w"] + p["b"]
            # Reference penalizes the weight matrix only
            # (model_utils.py:286: linear_clf[1].weight.pow(2).sum()).
            return (cross_entropy(logits, targets)
                    + reg_weight * jnp.sum(p["w"] ** 2))

        value_and_grad = optax.value_and_grad_from_state(loss_fn)
        state = opt.init(params)

        def step(carry, _):
            p, s = carry
            value, grad = value_and_grad(p, state=s)
            updates, s = opt.update(
                grad, s, p, value=value, grad=grad, value_fn=loss_fn)
            p = optax.apply_updates(p, updates)
            return (p, s), value

        (params, _), values = jax.lax.scan(
            step, (params, state), None, length=length)
        return params, values

    params, values = fit(params, features, targets, n_steps * max_iter)
    values = np.asarray(values)
    log(f"lin-eval L-BFGS: loss {values[0]:.4f} -> {values[-1]:.4f} "
        f"({values.shape[0]} iterations)")
    return LinearClassifier(params["w"], params["b"]), values


def evaluate_linear(
    clf: LinearClassifier,
    features: jax.Array,
    targets: jax.Array,
) -> Tuple[float, float]:
    """CE loss + top-1 accuracy (reference: model_utils.py:203-239)."""
    logits = clf(features)
    loss = cross_entropy(logits, targets)
    acc = top1_accuracy(logits, targets)
    return float(loss), float(acc)


def linear_evaluation(
    model,
    params,
    batch_stats,
    train_ds: DeviceDataset,
    test_ds: DeviceDataset,
    cfg: Config,
    log: Callable[[str], None] = print,
) -> Tuple[float, float]:
    """End-to-end linear eval; returns (test loss, test top-1 %)."""
    feats, targs = extract_features(
        model, params, batch_stats, train_ds, cfg)
    clf, _ = train_linear_classifier(
        feats, targs,
        reg_weight=cfg.optim.reg_wt_lin_eval,
        n_steps=cfg.train.n_epoch_lin_eval,
        max_iter=cfg.optim.lbfgs_max_iter,
        n_class=cfg.dataset.num_classes,
        log=log,
    )
    test_feats, test_targs = extract_features(
        model, params, batch_stats, test_ds, cfg)
    loss, acc = evaluate_linear(clf, test_feats, test_targs)
    log(f"Test Loss: {loss:.4f} | Test Top 1 Accuracy: {acc:.4f}%")
    return loss, acc
