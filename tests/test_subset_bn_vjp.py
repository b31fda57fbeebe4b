"""The bandwidth-shaped subset-BN custom VJP (ops/subset_bn.py) must be a
drop-in for autodiff of SubsetBatchNorm: identical forward, matching
gradients — checked under whole-program jit (the foldconv lesson:
eager-only agreement is not enough), in f32 tight and bf16 loose, at
module level and through a full SimCLR model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.models.norm import SubsetBatchNorm
from simclr_tpu.ops.subset_bn import subset_bn_apply


def _ref_forward(x, scale, bias, shift, k, eps, dt):
    """Inline restatement of SubsetBatchNorm's train-mode math
    (models/norm.py:59-101) for autodiff-oracle gradients."""
    red = tuple(range(x.ndim - 1))
    xs = x[:k].astype(jnp.float32)
    d = xs - shift
    mean_d = jnp.mean(d, axis=red)
    mean2_d = jnp.mean(jnp.square(d), axis=red)
    mean = mean_d + shift
    var = jnp.maximum(mean2_d - jnp.square(mean_d), 0.0)
    y = (x.astype(dt) - mean.astype(dt)) * (
        jax.lax.rsqrt(var + eps).astype(dt) * scale.astype(dt)
    ) + bias.astype(dt)
    return y, mean, var


def _loss(y, mean, var, wy, wm, wv):
    # Touch all three outputs so the mean/var cotangent terms are tested.
    return (jnp.sum(y.astype(jnp.float32) * wy)
            + jnp.sum(mean * wm) + jnp.sum(var * wv))


@pytest.mark.parametrize("k", [4, 16])  # subset and k == n
@pytest.mark.parametrize("shape", [(16, 4, 4, 8), (16, 8)])
def test_grads_match_autodiff_f32(k, shape):
    eps = 1e-5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 1.5, shape), jnp.float32)
    scale = jnp.asarray(rng.normal(1.0, 0.2, shape[-1:]), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, shape[-1:]), jnp.float32)
    shift = jnp.asarray(rng.normal(2.0, 0.5, shape[-1:]), jnp.float32)
    wy = jnp.asarray(rng.normal(size=shape), jnp.float32)
    wm = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)
    wv = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)

    def f_fused(x, scale, bias):
        return _loss(*subset_bn_apply(x, scale, bias, shift, k, eps,
                                      jnp.float32), wy, wm, wv)

    def f_ref(x, scale, bias):
        return _loss(*_ref_forward(x, scale, bias, shift, k, eps,
                                   jnp.float32), wy, wm, wv)

    v1, g1 = jax.jit(jax.value_and_grad(f_fused, argnums=(0, 1, 2)))(
        x, scale, bias)
    v2, g2 = jax.jit(jax.value_and_grad(f_ref, argnums=(0, 1, 2)))(
        x, scale, bias)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    for a, b, name in zip(g1, g2, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_forward_bitwise_matches_module_bf16():
    """fused_vjp=True must not change the forward at all (bf16 apply)."""
    x = jnp.asarray(np.random.default_rng(1).normal(1.0, 2.0, (32, 4, 4, 16)),
                    jnp.float32)
    outs = {}
    for fused in (False, True):
        bn = SubsetBatchNorm(use_running_average=False, dtype=jnp.bfloat16,
                             stats_fraction=0.25, min_stats_samples=8,
                             fused_vjp=fused)
        vs = bn.init({"params": jax.random.key(0)}, x)
        y, updates = bn.apply(vs, x, mutable=["batch_stats"])
        outs[fused] = (np.asarray(y.astype(jnp.float32)),
                       jax.tree.map(np.asarray, updates["batch_stats"]))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    jax.tree.map(np.testing.assert_array_equal, outs[False][1],
                 outs[True][1])


def test_module_grads_match_bf16():
    """Module-level with the production bf16 apply. Autodiff of the bf16
    graph accumulates dbias/dscale in bf16; the custom VJP accumulates in
    f32 — so judge both against the f32-apply autodiff oracle and require
    the fused grads to be at least as close to truth as autodiff's."""
    x = jnp.asarray(np.random.default_rng(2).normal(0.5, 1.0, (64, 4, 4, 8)),
                    jnp.float32)
    g_out = jnp.asarray(np.random.default_rng(3).normal(size=(64, 4, 4, 8)),
                        jnp.float32)

    def run(fused, dtype):
        bn = SubsetBatchNorm(use_running_average=False, dtype=dtype,
                             stats_fraction=0.25, min_stats_samples=16,
                             fused_vjp=fused)
        vs = bn.init({"params": jax.random.key(0)}, x)

        @jax.jit
        def loss(params, x):
            y = bn.apply({"params": params,
                          "batch_stats": vs["batch_stats"]}, x,
                         mutable=["batch_stats"])[0]
            return jnp.sum(y.astype(jnp.float32) * g_out)

        gp, gx = jax.grad(loss, argnums=(0, 1))(vs["params"], x)
        return jax.tree.map(np.asarray, (gp, gx))

    (gp_f, gx_f) = run(True, jnp.bfloat16)
    (gp_r, gx_r) = run(False, jnp.bfloat16)
    (gp_t, gx_t) = run(False, jnp.float32)   # oracle

    def cos(a, b):
        a, b = a.ravel().astype(np.float64), b.ravel().astype(np.float64)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))

    assert cos(gx_f, gx_t) > 0.999, cos(gx_f, gx_t)
    assert cos(gx_f, gx_t) >= cos(gx_r, gx_t) - 1e-4
    key = lambda kv: str(kv[0])
    flat = lambda t: sorted(jax.tree_util.tree_leaves_with_path(t), key=key)
    for (ka, vf), (_, vr), (_, vt) in zip(flat(gp_f), flat(gp_r),
                                          flat(gp_t)):
        assert cos(vf, vt) > 0.999, (ka, cos(vf, vt))
        assert cos(vf, vt) >= cos(vr, vt) - 1e-4, (
            ka, cos(vf, vt), cos(vr, vt))


def test_full_model_grads_match():
    """Whole-program jit through a (tiny) full SimCLR model — the exact
    regime where the foldconv formulation silently broke. f32 compute for
    a tight bound; every parameter leaf must agree."""
    from simclr_tpu.config import ModelConfig
    from simclr_tpu.models.simclr import SimCLR

    x = jnp.asarray(
        np.random.default_rng(4).normal(0.0, 1.0, (16, 16, 16, 3)),
        jnp.float32)

    def grads(fused):
        # bn_grad_mode='exact': the custom VJP implements the exact
        # subset-BN backward, so the autodiff side must run it too (the
        # production default is the deviating 'subset_st').
        cfg = ModelConfig(compute_dtype="float32", bn_dtype="float32",
                          bn_stats_fraction=0.25, bn_fused_vjp=fused,
                          bn_grad_mode="exact",
                          stage_sizes=(1, 1), width=8, feature_dim=32,
                          compressed_dim=8)
        model = SimCLR(cfg=cfg)
        vs = model.init({"params": jax.random.key(0)}, x, train=True)

        @jax.jit
        def loss(params):
            (h, z), _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(z)) + 0.1 * jnp.sum(jnp.abs(h))

        return jax.tree.map(np.asarray, jax.grad(loss)(vs["params"]))

    gf, gr = grads(True), grads(False)
    leaves_f = jax.tree_util.tree_leaves_with_path(gf)
    leaves_r = jax.tree_util.tree_leaves_with_path(gr)
    assert len(leaves_f) == len(leaves_r) and leaves_f
    key = lambda kv: str(kv[0])
    # Near-zero leaves (e.g. a bias grad that analytically cancels) carry
    # pure rounding noise; floor the denominator at 1e-3 of the global
    # gradient scale so only real disagreements fail.
    gscale = float(np.sqrt(sum(float(np.vdot(v, v))
                               for _, v in leaves_r)))
    for (pa, va), (pb, vb) in zip(sorted(leaves_f, key=key),
                                  sorted(leaves_r, key=key)):
        denom = max(float(np.linalg.norm(vb.ravel())), 1e-3 * gscale)
        rel = np.linalg.norm((va - vb).ravel()) / denom
        # 1e-3: catches structural backward bugs (wrong terms, the
        # foldconv-style extinction which is rel ~1) while tolerating f32
        # reduction-order noise through a deep chain; the per-op math is
        # pinned at 2e-5 by test_grads_match_autodiff_f32.
        assert rel < 1e-3, (pa, rel,
                            float(np.linalg.norm(va.ravel())), denom)
