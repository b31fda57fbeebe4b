"""Numerical-fidelity tests for the objectives against the PyTorch oracle.

The torch implementations below re-state the reference's math
(reference: objective.py:6-98, mine.py:97-109) so our JAX objectives can be
checked bit-for-bit (float32 tolerance) without importing reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simclr_tpu.ops.losses import (
    cross_entropy,
    mine_loss,
    modified_contrastive_loss,
    nt_xent_loss,
    softplus_beta,
)


def torch_nt_xent(x1, x2, temperature, normalize=True, weight=None):
    """Oracle restating reference objective.py:6-55."""
    n = x1.shape[0]
    if normalize:
        x1 = F.normalize(x1, p=2, dim=1)
        x2 = F.normalize(x2, p=2, dim=1)
    labels = torch.arange(2 * n, dtype=torch.long)
    masks = torch.eye(n)
    laa = x1 @ x1.t() / temperature - masks * 1e9
    lbb = x2 @ x2.t() / temperature - masks * 1e9
    lab = x1 @ x2.t() / temperature
    lba = x2 @ x1.t() / temperature
    logits = torch.cat(
        [torch.cat([lab, laa], dim=-1), torch.cat([lbb, lba], dim=-1)], dim=0
    )
    loss = torch.nn.CrossEntropyLoss(weight=weight, reduction="mean")(
        logits, labels
    )
    acc = 100.0 * logits.max(1).indices.eq(labels).float().mean()
    return loss.item(), acc.item()


def torch_modified(x1, x2, temperature):
    """Oracle restating reference objective.py:58-98."""
    n = x1.shape[0]
    x1 = F.softplus(x1, beta=0.8)
    x2 = F.softplus(x2, beta=0.8)
    x1 = F.normalize(x1, p=1, dim=1)
    x2 = F.normalize(x2, p=1, dim=1)
    labels = torch.arange(n, dtype=torch.long).repeat(2)
    lab = torch.clamp(x1 @ x2.t() * n, min=1e-4)
    lba = torch.clamp(x2 @ x1.t() * n, min=1e-4)
    logits = torch.cat(
        [torch.log(lab) / temperature, torch.log(lba) / temperature], dim=0
    )
    loss = torch.nn.CrossEntropyLoss(reduction="mean")(logits, labels)
    acc = 100.0 * logits.max(1).indices.eq(labels).float().mean()
    return loss.item(), acc.item()


@pytest.mark.parametrize("temperature", [0.1, 0.5, 1.0, 2.0])
@pytest.mark.parametrize("normalize", [True, False])
def test_nt_xent_matches_torch(temperature, normalize):
    rng = np.random.RandomState(0)
    z1 = rng.randn(16, 128).astype(np.float32)
    z2 = rng.randn(16, 128).astype(np.float32)
    loss, acc = jax.jit(
        lambda a, b: nt_xent_loss(a, b, temperature, normalize)
    )(z1, z2)
    t_loss, t_acc = torch_nt_xent(
        torch.from_numpy(z1), torch.from_numpy(z2), temperature, normalize
    )
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(acc), t_acc, rtol=1e-6)


def test_nt_xent_weighted_matches_torch():
    rng = np.random.RandomState(1)
    z1 = rng.randn(8, 32).astype(np.float32)
    z2 = rng.randn(8, 32).astype(np.float32)
    w = rng.rand(16).astype(np.float32) + 0.5
    loss, _ = nt_xent_loss(z1, z2, 0.5, True, jnp.asarray(w))
    t_loss, _ = torch_nt_xent(
        torch.from_numpy(z1), torch.from_numpy(z2), 0.5, True,
        torch.from_numpy(w),
    )
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("temperature", [0.5, 1.0])
def test_modified_loss_matches_torch(temperature):
    rng = np.random.RandomState(2)
    x1 = (rng.randn(16, 128) * 3).astype(np.float32)
    x2 = (rng.randn(16, 128) * 3).astype(np.float32)
    loss, acc = jax.jit(
        lambda a, b: modified_contrastive_loss(a, b, temperature)
    )(x1, x2)
    t_loss, t_acc = torch_modified(
        torch.from_numpy(x1), torch.from_numpy(x2), temperature
    )
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(acc), t_acc, rtol=1e-6)


def test_softplus_beta_threshold_tail():
    # torch F.softplus switches to identity where beta*x > 20.
    x = np.array([-50.0, -1.0, 0.0, 1.0, 24.9, 25.1, 100.0], np.float32)
    ours = np.asarray(softplus_beta(jnp.asarray(x), 0.8))
    oracle = F.softplus(torch.from_numpy(x), beta=0.8).numpy()
    np.testing.assert_allclose(ours, oracle, rtol=1e-6, atol=1e-6)


def test_mine_loss_matches_torch():
    """Oracle restating reference mine.py:97-109. Our implementation
    carries the EMA in LOG space (overflow-proof), so the oracle's linear
    EMA is compared through log/exp."""
    rng = np.random.RandomState(3)
    tj = rng.randn(64, 1).astype(np.float32)
    tm = rng.randn(64, 1).astype(np.float32)

    # First step: last_ma=None.
    loss, mi, log_ma = mine_loss(
        jnp.asarray(tj), jnp.asarray(tm), None, 5e-2)
    t, et = torch.from_numpy(tj), torch.exp(torch.from_numpy(tm))
    t_mi = (t.mean() - torch.log(et.mean())).item()
    t_ma = et.mean().item()
    t_loss = -(t.mean() - et.mean() / et.mean().detach()).item()
    np.testing.assert_allclose(float(mi), t_mi, rtol=1e-5)
    np.testing.assert_allclose(float(jnp.exp(log_ma)), t_ma, rtol=1e-5)
    np.testing.assert_allclose(float(loss), t_loss, rtol=1e-5, atol=1e-6)

    # Subsequent step: EMA update (1-r)*last + r*mean(et).
    loss2, _, log_ma2 = mine_loss(
        jnp.asarray(tj), jnp.asarray(tm),
        jnp.log(jnp.asarray(0.7, jnp.float32)), 5e-2)
    t_ma2 = (1 - 5e-2) * 0.7 + 5e-2 * et.mean().item()
    t_loss2 = -(t.mean().item() - et.mean().item() / t_ma2)
    np.testing.assert_allclose(float(jnp.exp(log_ma2)), t_ma2, rtol=1e-5)
    np.testing.assert_allclose(float(loss2), t_loss2, rtol=1e-5)


def test_mine_loss_gradient_uses_ema_not_log():
    """The surrogate's et-gradient must be scaled by 1/EMA, not 1/mean(et)
    — identical to the reference formulation despite the log-space EMA."""
    tj = jnp.zeros((4, 1))
    tm = jnp.ones((4, 1)) * 0.5

    def surrogate(x):
        loss, _, _ = mine_loss(tj, x, jnp.log(jnp.asarray(2.0)), 0.1)
        return loss

    g = jax.grad(surrogate)(tm)
    # d/dx [mean(exp(x))/ma] = exp(x)/(N*ma); ma = 0.9*2 + 0.1*mean(e^0.5).
    ma = 0.9 * 2.0 + 0.1 * float(np.exp(0.5))
    expect = np.exp(0.5) / (4 * ma)
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


def test_mine_loss_no_overflow_at_large_t():
    """T values past the fp32 exp-overflow point must stay finite (the
    failure mode observed at full scale: exp(T) -> inf -> NaN)."""
    tj = jnp.full((8, 1), 150.0)
    tm = jnp.full((8, 1), 120.0)
    loss, mi, log_ma = mine_loss(tj, tm, None, 5e-2)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(mi)) and abs(float(mi) - 30.0) < 1e-3
    loss2, mi2, log_ma2 = mine_loss(tj, tm, log_ma, 5e-2)
    assert np.isfinite(float(loss2)) and np.isfinite(float(log_ma2))


def test_cross_entropy_class_weight_semantics():
    rng = np.random.RandomState(4)
    logits = rng.randn(10, 5).astype(np.float32)
    labels = rng.randint(0, 5, size=10)
    w = (rng.rand(5) + 0.1).astype(np.float32)
    ours = cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)
    )
    oracle = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    )
    np.testing.assert_allclose(float(ours), oracle.item(), rtol=1e-5)
