"""Training objectives: NT-Xent, the probabilistic contrastive variant, and
the MINE Donsker-Varadhan bound.

Numerical-fidelity counterparts of reference objective.py:6-55
(contrastive_loss), objective.py:58-98 (modified_contrastive_loss) and
mine.py:97-109 (mine_loss) — unit-tested bit-for-bit (float32 tolerance)
against the PyTorch implementations in tests/test_losses.py.

All functions are pure and jit-friendly. Under pjit with a batch-sharded
input, the similarity matmuls below make XLA all-gather the (tiny, 128-d)
embeddings over ICI so every chip computes its row-slice of the 2Nx2N logits
against ALL global negatives — the TPU-native replacement for the reference's
gradient accumulation (reference: utils/model_utils.py:116-123), which only
ever sees micro-batch negatives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

VERY_LARGE_NUM = 1e9  # Diagonal mask value (reference: objective.py:21).


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean cross-entropy over integer labels.

    Matches torch.nn.CrossEntropyLoss(weight, reduction='mean'): with
    per-class weights the mean is weighted by the label's class weight
    (sum(w_y * nll) / sum(w_y)).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if weight is None:
        return jnp.mean(nll)
    w = weight[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def top1_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Top-1 accuracy in percent (reference: objective.py:51-54)."""
    pred = jnp.argmax(logits, axis=-1)
    return 100.0 * jnp.mean((pred == labels).astype(jnp.float32))


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2) parity: divide by clamp(norm, min=eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def nt_xent_logits(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    temperature: float,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the 2Nx2N NT-Xent logits and their labels.

    Layout parity with reference objective.py:35-49:
        logits = [[ab, aa], [bb, ba]],   labels = arange(2N),
    with the self-similarity diagonals of aa/bb masked to -1e9.
    """
    n = z1.shape[0]
    if normalize:
        z1 = l2_normalize(z1, axis=1)
        z2 = l2_normalize(z2, axis=1)
    inv_t = 1.0 / temperature
    mask = VERY_LARGE_NUM * jnp.eye(n, dtype=z1.dtype)

    logits_aa = jnp.dot(z1, z1.T, preferred_element_type=jnp.float32) * inv_t - mask
    logits_bb = jnp.dot(z2, z2.T, preferred_element_type=jnp.float32) * inv_t - mask
    logits_ab = jnp.dot(z1, z2.T, preferred_element_type=jnp.float32) * inv_t
    logits_ba = jnp.dot(z2, z1.T, preferred_element_type=jnp.float32) * inv_t

    logits = jnp.block([[logits_ab, logits_aa], [logits_bb, logits_ba]])
    labels = jnp.arange(2 * n, dtype=jnp.int32)
    return logits, labels


def nt_xent_loss(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    temperature: float = 1.0,
    normalize: bool = True,
    weight: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NT-Xent loss + auxiliary-task top-1 accuracy.

    Fidelity target: reference objective.py:6-55 (contrastive_loss). Returns
    (mean CE over the [[ab,aa],[bb,ba]] logits vs labels arange(2N),
     100 * positive-pair retrieval accuracy).
    """
    logits, labels = nt_xent_logits(z1, z2, temperature, normalize)
    loss = cross_entropy(logits, labels, weight)
    acc = top1_accuracy(logits, labels)
    return loss, acc


def softplus_beta(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    """torch F.softplus(x, beta) parity, incl. the threshold-20 linear tail."""
    scaled = beta * x
    soft = jax.nn.softplus(scaled) / beta
    return jnp.where(scaled > 20.0, x, soft)


def modified_contrastive_loss(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probabilistic ("modified") contrastive loss.

    Fidelity target: reference objective.py:58-98. softplus(beta=0.8) to force
    non-negativity, L1 normalization, logits log(clamp(x1 @ x2.T * N,
    min=1e-4)) / temperature in both directions, CE vs arange(N) repeated.
    """
    n = x1.shape[0]
    x1 = softplus_beta(x1, 0.8)
    x2 = softplus_beta(x2, 0.8)
    # torch F.normalize(p=1) parity: divide by clamp(sum |x|, min=1e-12).
    x1 = x1 / jnp.maximum(
        jnp.sum(jnp.abs(x1), axis=1, keepdims=True), 1e-12)
    x2 = x2 / jnp.maximum(
        jnp.sum(jnp.abs(x2), axis=1, keepdims=True), 1e-12)

    logits_ab = jnp.clip(
        jnp.dot(x1, x2.T, preferred_element_type=jnp.float32) * n, min=1e-4)
    logits_ba = jnp.clip(
        jnp.dot(x2, x1.T, preferred_element_type=jnp.float32) * n, min=1e-4)
    log_logits = jnp.concatenate(
        [jnp.log(logits_ab), jnp.log(logits_ba)], axis=0) / temperature

    labels = jnp.concatenate([jnp.arange(n), jnp.arange(n)]).astype(jnp.int32)
    loss = cross_entropy(log_logits, labels)
    acc = top1_accuracy(log_logits, labels)
    return loss, acc


def log_mean_exp(t: jnp.ndarray) -> jnp.ndarray:
    """log(mean(exp(t))) via logsumexp — never overflows."""
    return jax.nn.logsumexp(t) - jnp.log(t.size)


def mine_loss(
    t_joint: jnp.ndarray,
    t_marginal: jnp.ndarray,
    last_log_ma: Optional[jnp.ndarray],
    ma_rate: float = 1e-2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Donsker-Varadhan MI bound with EMA-debiased gradient.

    Fidelity target: reference mine.py:97-109 — same math, but computed in
    LOG space: the reference's mean(exp(T)) overflows float32 once T
    exceeds ~88 (observed in practice on 2048-d features), so the moving
    average is carried as log(ma) and the debiased term is
    exp(log_mean_et - stop_grad(log_ma)), whose gradient
    et_i / (N * ma) is identical to the reference's formulation.

    ``t_*`` are statistics-network outputs of shape (N, 1). Pass
    ``last_log_ma=None`` on the first step (EMA initialized to mean(et),
    i.e. log_ma = log_mean_et).

    Returns (surrogate loss, MI lower bound, new log-EMA state).
    """
    t = t_joint
    log_mean_et = log_mean_exp(t_marginal)
    mi_lower_bound = jnp.mean(t) - log_mean_et
    if last_log_ma is None:
        log_ma = log_mean_et
    else:
        # log((1-r) * ma + r * mean_et), all in log space.
        log_ma = jnp.logaddexp(
            last_log_ma + jnp.log1p(-ma_rate),
            log_mean_et + jnp.log(ma_rate))
    debias = jnp.exp(log_mean_et - jax.lax.stop_gradient(log_ma))
    loss = -(jnp.mean(t) - debias)
    return loss, mi_lower_bound, log_ma
