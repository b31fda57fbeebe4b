"""Tests for SubsetBatchNorm against flax.linen.BatchNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from simclr_tpu.models.norm import SubsetBatchNorm


def make_pair(frac, n=128, feats=16, dtype=jnp.float32):
    sub = SubsetBatchNorm(use_running_average=False, dtype=dtype,
                          stats_fraction=frac, min_stats_samples=8)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    x = jax.random.normal(jax.random.key(0), (n, feats)) * 2.0 + 1.0
    return sub, ref, x


def test_full_fraction_matches_flax_batchnorm():
    sub, ref, x = make_pair(1.0)
    vs = sub.init(jax.random.key(1), x)
    vr = ref.init(jax.random.key(1), x)
    ys, us = sub.apply(vs, x, mutable=["batch_stats"])
    yr, ur = ref.apply(vr, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["mean"]),
        np.asarray(ur["batch_stats"]["mean"]), rtol=1e-5)
    # flax stores the BIASED batch variance in its running average; we
    # follow torch (unbiased, m/(m-1)). Reconstruct the expected value from
    # flax's: ra = 0.9 * 1 (init) + 0.1 * batch_var.
    m = x.shape[0]
    flax_batch_var = (np.asarray(ur["batch_stats"]["var"]) - 0.9) / 0.1
    expected = 0.9 + 0.1 * flax_batch_var * m / (m - 1)
    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["var"]), expected, rtol=1e-4)


def test_param_names_interchange_with_flax():
    sub, ref, x = make_pair(0.5)
    vs = sub.init(jax.random.key(1), x)
    vr = ref.init(jax.random.key(1), x)
    assert set(vs["params"]) == set(vr["params"]) == {"scale", "bias"}
    assert set(vs["batch_stats"]) == {"mean", "var"}
    # A flax checkpoint restores into SubsetBatchNorm directly.
    sub.apply({"params": vr["params"],
               "batch_stats": vr["batch_stats"]}, x,
              mutable=["batch_stats"])


def test_subset_stats_close_to_full():
    sub, _, x = make_pair(0.25, n=512)
    full = SubsetBatchNorm(use_running_average=False, stats_fraction=1.0)
    vs = sub.init(jax.random.key(1), x)
    ys, us = sub.apply(vs, x, mutable=["batch_stats"])
    yf, uf = full.apply(vs, x, mutable=["batch_stats"])
    # 128-sample stats of N(1, 4): mean/var within ~15%.
    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["mean"]),
        np.asarray(uf["batch_stats"]["mean"]), atol=0.6)
    # Normalized outputs stay close.
    assert float(jnp.abs(ys - yf).mean()) < 0.1


def test_min_stats_samples_forces_full_batch_on_tiny_batches():
    sub = SubsetBatchNorm(use_running_average=False, stats_fraction=0.25,
                          min_stats_samples=64)
    x = jax.random.normal(jax.random.key(0), (16, 8))
    vs = sub.init(jax.random.key(1), x)
    ys, us = sub.apply(vs, x, mutable=["batch_stats"])
    full = SubsetBatchNorm(use_running_average=False, stats_fraction=1.0)
    yf, uf = full.apply(vs, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yf), rtol=1e-5,
                               atol=1e-6)


def test_eval_uses_running_averages():
    x = jax.random.normal(jax.random.key(0), (64, 8)) * 3 + 2
    train_bn = SubsetBatchNorm(use_running_average=False,
                               stats_fraction=1.0)
    vs = train_bn.init(jax.random.key(1), x)
    # Run many train steps to converge running stats.
    stats = vs["batch_stats"]
    for _ in range(200):
        _, up = train_bn.apply(
            {"params": vs["params"], "batch_stats": stats}, x,
            mutable=["batch_stats"])
        stats = up["batch_stats"]
    eval_bn = SubsetBatchNorm(use_running_average=True)
    y = eval_bn.apply({"params": vs["params"], "batch_stats": stats}, x)
    # Normalized output approx zero-mean unit-var.
    assert abs(float(y.mean())) < 0.1
    assert abs(float(y.std()) - 1.0) < 0.1


def test_running_stats_match_torch_batchnorm():
    """Bit-level parity of one train-mode update with torch.nn.BatchNorm2d
    (the reference's BN): normalization uses biased batch variance, the
    running average stores the unbiased (m/(m-1)) variance."""
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(8, 4, 4, 16).astype(np.float32) * 2.0 + 1.0

    bn_t = torch.nn.BatchNorm2d(16, eps=1e-5, momentum=0.1)
    bn_t.train()
    with torch.no_grad():
        y_t = bn_t(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    sub = SubsetBatchNorm(use_running_average=False, stats_fraction=1.0,
                          momentum=0.9, dtype=jnp.float32)
    vs = sub.init(jax.random.key(1), jnp.asarray(x))
    ys, us = sub.apply(vs, jnp.asarray(x), mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["var"]),
        bn_t.running_var.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ys),
        y_t.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_axis_name_pmean_matches_global_stats():
    """The cross-device stats path (axis_name + pmean) under shard_map must
    reproduce the stats of the unsharded global batch."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n_dev = 4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("dp",))
    x = jax.random.normal(jax.random.key(0), (64, 16)) * 2.0 + 1.0

    sharded_bn = SubsetBatchNorm(use_running_average=False,
                                 stats_fraction=1.0, axis_name="dp",
                                 dtype=jnp.float32)
    # Init via an axis-free twin (identical variable shapes) — init runs
    # outside shard_map where the axis name is unbound.
    vs = SubsetBatchNorm(use_running_average=False, stats_fraction=1.0,
                         dtype=jnp.float32).init(jax.random.key(1), x)

    @partial(shard_map, mesh=mesh, in_specs=(P(), P("dp")),
             out_specs=(P("dp"), P()))
    def apply_sharded(variables, xs):
        y, up = sharded_bn.apply(variables, xs, mutable=["batch_stats"])
        return y, up["batch_stats"]

    y_sh, stats_sh = apply_sharded(vs, x)

    global_bn = SubsetBatchNorm(use_running_average=False,
                                stats_fraction=1.0, dtype=jnp.float32)
    y_gl, up_gl = global_bn.apply(vs, x, mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_gl),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]),
        np.asarray(up_gl["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]),
        np.asarray(up_gl["batch_stats"]["var"]), rtol=1e-4, atol=1e-5)


def test_4d_nhwc_reduction_axes():
    sub = SubsetBatchNorm(use_running_average=False, stats_fraction=1.0)
    x = jax.random.normal(jax.random.key(0), (8, 4, 4, 16))
    vs = sub.init(jax.random.key(1), x)
    _, us = sub.apply(vs, x, mutable=["batch_stats"])
    oracle_mean = np.asarray(x).mean(axis=(0, 1, 2))
    # Stored value is the updated running average: 0.9 * 0 + 0.1 * batch.
    np.testing.assert_allclose(
        np.asarray(us["batch_stats"]["mean"]), 0.1 * oracle_mean,
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("surrogate", ["affine", "pad"])
def test_subset_st_grad_mode(surrogate):
    """grad_mode='subset_st' (models/norm.py): forward bit-identical to
    'exact'; dx is exactly gy*A for EVERY row (statistics are gradient
    constants, so the k stats rows lose their O(1/sqrt(m)) coupling
    terms); dscale/dbias equal the unbiased (n/k)-scaled subset
    estimator. Both surrogate forms (affine-mask and padded-k-rows) must
    satisfy the same analytic targets."""
    rng = np.random.default_rng(7)
    n, k = 64, 16
    shape = (n, 4, 4, 24)
    x = jnp.asarray(rng.normal(1.0, 1.5, shape), jnp.float32)
    gy = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def make(mode):
        return SubsetBatchNorm(use_running_average=False,
                               dtype=jnp.float32,
                               stats_fraction=k / n, min_stats_samples=k,
                               grad_mode=mode, st_surrogate=surrogate)

    vs = make("exact").init({"params": jax.random.key(0)}, x)
    # Non-trivial affine so dscale/dbias paths are exercised.
    vs = {"params": {"scale": jnp.asarray(rng.normal(1.0, 0.2, (24,)),
                                          jnp.float32),
                     "bias": jnp.asarray(rng.normal(0.0, 0.2, (24,)),
                                         jnp.float32)},
          "batch_stats": vs["batch_stats"]}

    def run(mode):
        bn = make(mode)

        def loss(params, x):
            y, _ = bn.apply({"params": params,
                             "batch_stats": vs["batch_stats"]}, x,
                            mutable=["batch_stats"])
            return jnp.sum(y * gy), y

        (val, y), grads = jax.jit(jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True))(vs["params"], x)
        return np.asarray(y), jax.tree.map(np.asarray, grads)

    y_ex, (gp_ex, gx_ex) = run("exact")
    y_st, (gp_st, gx_st) = run("subset_st")

    # Forward values identical.
    np.testing.assert_array_equal(y_ex, y_st)

    # Analytic targets: A = scale * rsqrt(var+eps) from the k-row stats.
    xs = np.asarray(x)[:k]
    mean = xs.mean(axis=(0, 1, 2))
    var = xs.var(axis=(0, 1, 2))
    a = np.asarray(vs["params"]["scale"]) / np.sqrt(var + 1e-5)
    # Tail rows: exactly gy*A (and identical to exact autodiff).
    np.testing.assert_allclose(gx_st[k:], np.asarray(gy)[k:] * a,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gx_st[k:], gx_ex[k:], rtol=1e-5, atol=1e-5)
    # Stats rows: gy*A plus the differentiable-mean S1 correction
    # -A*sum(gy)/m — the term that keeps sum_channel(dx) == 0.
    m = k * shape[1] * shape[2]
    s1 = np.asarray(gy).sum(axis=(0, 1, 2))
    np.testing.assert_allclose(gx_st[:k],
                               np.asarray(gy)[:k] * a - a * s1 / m,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gx_st.sum(axis=(0, 1, 2)),
                               np.zeros_like(s1), atol=1e-3)
    # The variance coupling is intentionally dropped: heads != exact.
    assert not np.allclose(gx_st[:k], gx_ex[:k], atol=1e-6)

    xhat = (xs - mean) / np.sqrt(var + 1e-5)
    gk = np.asarray(gy)[:k]
    est = n / k
    np.testing.assert_allclose(gp_st["scale"],
                               est * (gk * xhat).sum(axis=(0, 1, 2)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gp_st["bias"],
                               est * gk.sum(axis=(0, 1, 2)),
                               rtol=1e-4, atol=1e-4)


def test_subset_st_affine_equals_pad_surrogate():
    """The affine-mask surrogate (st_surrogate='affine') must be
    bit-identical to the padded-k-rows form in the forward (every term
    that differs multiplies an exact IEEE zero) and term-for-term equal
    in the VJP: dx, dscale, dbias all match to f32 reduction order."""
    rng = np.random.default_rng(11)
    n, k = 48, 12
    for shape in [(n, 5, 3, 16), (n, 16)]:  # conv position + head BN
        x = jnp.asarray(rng.normal(0.5, 2.0, shape), jnp.float32)
        gy = jnp.asarray(rng.normal(size=shape), jnp.float32)
        params = {"scale": jnp.asarray(rng.normal(1.0, 0.3, (16,)),
                                       jnp.float32),
                  "bias": jnp.asarray(rng.normal(0.0, 0.3, (16,)),
                                      jnp.float32)}

        def run(sur):
            bn = SubsetBatchNorm(use_running_average=False,
                                 dtype=jnp.float32,
                                 stats_fraction=k / n,
                                 min_stats_samples=k,
                                 grad_mode="subset_st", st_surrogate=sur)
            vs = bn.init({"params": jax.random.key(0)}, x)

            def loss(p, x):
                y, _ = bn.apply({"params": p,
                                 "batch_stats": vs["batch_stats"]}, x,
                                mutable=["batch_stats"])
                return jnp.sum(y * gy), y

            (_, y), grads = jax.jit(jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True))(params, x)
            return np.asarray(y), jax.tree.map(np.asarray, grads)

        y_a, (gp_a, gx_a) = run("affine")
        y_p, (gp_p, gx_p) = run("pad")
        # In EAGER evaluation the two forwards are bit-identical (every
        # differing term multiplies an exact IEEE zero). Under jit,
        # XLA's algebraic simplifier may distribute the masked affine
        # terms on the k statistics rows (bias + me*(bias - bias) ->
        # (bias + me*bias) - me*bias), introducing <=1-ulp differences
        # there — so jitted primals compare allclose, not equal.
        fwd = {}
        for sur in ("affine", "pad"):
            bn_s = SubsetBatchNorm(
                use_running_average=False, dtype=jnp.float32,
                stats_fraction=k / n, min_stats_samples=k,
                grad_mode="subset_st", st_surrogate=sur)
            vs0 = bn_s.init({"params": jax.random.key(0)}, x)
            fwd[sur] = np.asarray(bn_s.apply(
                {"params": params, "batch_stats": vs0["batch_stats"]},
                x, mutable=["batch_stats"])[0])
        np.testing.assert_array_equal(fwd["affine"], fwd["pad"])
        np.testing.assert_allclose(y_a, y_p, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gx_a, gx_p, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gp_a["scale"], gp_p["scale"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(gp_a["bias"], gp_p["bias"],
                                   rtol=1e-5, atol=1e-5)
