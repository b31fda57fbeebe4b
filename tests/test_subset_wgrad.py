"""Subset weight gradients (ops/subset_wgrad.py).

Semantics under test:
  * dx is EXACT — bit-identical to plain-conv autodiff (it is the same
    transpose conv on the same tensors);
  * dw at fraction 1.0 is bit-identical to plain-conv autodiff;
  * dw at fraction<1 equals the plain-conv wgrad computed on the centered
    k-row slice, scaled n/k (the defining identity), and is an unbiased
    estimator over row permutations;
  * the flax module's parameter tree is identical to nn.Conv's, so the
    configurations interchange checkpoints;
  * the full SimCLR forward is unchanged by conv_wgrad_fraction, and the
    training gradient differs only in conv kernels (BN/head grads follow
    their own paths off the exact dx chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from simclr_tpu.ops.subset_wgrad import SubsetWgradConv, conv_subset_wgrad


def _mk(n=16, h=8, w=8, cin=6, cout=4, seed=0):
    kx, kw, kg = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (n, h, w, cin), jnp.float32)
    wgt = jax.random.normal(kw, (3, 3, cin, cout), jnp.float32) * 0.1
    gy = jax.random.normal(kg, (n, h, w, cout), jnp.float32)
    return x, wgt, gy


def _plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_forward_and_dx_exact():
    x, w, gy = _mk()
    y_ref, vjp_ref = jax.vjp(lambda a, b: _plain(a, b), x, w)
    y, vjp = jax.vjp(
        lambda a, b: conv_subset_wgrad(a, b, (1, 1), ((1, 1), (1, 1)), 8),
        x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    dx_ref, _ = vjp_ref(gy)
    dx, dw = vjp(gy)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dx_ref))


def test_dw_is_scaled_slice_wgrad():
    x, w, gy = _mk(n=16)
    k = 8
    s0 = (16 - k) // 2
    _, vjp = jax.vjp(
        lambda a, b: conv_subset_wgrad(a, b, (1, 1), ((1, 1), (1, 1)), k),
        x, w)
    _, dw = vjp(gy)
    _, vjp_s = jax.vjp(lambda b: _plain(x[s0:s0 + k], b), w)
    dw_slice, = vjp_s(gy[s0:s0 + k])
    np.testing.assert_allclose(np.asarray(dw),
                               np.asarray(dw_slice) * (16 / k),
                               rtol=1e-6)


def test_dw_exact_when_k_covers_batch():
    x, w, gy = _mk(n=16)
    _, vjp_ref = jax.vjp(lambda a, b: _plain(a, b), x, w)
    _, vjp = jax.vjp(
        lambda a, b: conv_subset_wgrad(a, b, (1, 1), ((1, 1), (1, 1)), 16),
        x, w)
    _, dw_ref = vjp_ref(gy)
    _, dw = vjp(gy)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dw_ref))


def test_dw_unbiased_over_permutations():
    # E_perm[scaled k-row wgrad] == full wgrad (linearity: each row's
    # outer-product term is included with probability k/n and scaled n/k).
    x, w, gy = _mk(n=12)
    k = 4
    _, vjp_full = jax.vjp(lambda b: _plain(x, b), w)
    dw_full, = vjp_full(gy)
    acc = np.zeros_like(np.asarray(dw_full))
    rng = np.random.default_rng(0)
    n_perm = 200
    s0 = (12 - k) // 2
    for _ in range(n_perm):
        p = rng.permutation(12)
        xs, gs = x[p][s0:s0 + k], gy[p][s0:s0 + k]
        _, vjp_s = jax.vjp(lambda b: _plain(xs, b), w)
        d, = vjp_s(gs)
        acc += np.asarray(d) * (12 / k)
    acc /= n_perm
    # Monte-Carlo agreement: loose tolerance, tight enough to catch any
    # systematic scale/selection error (wrong scale fails by 4x).
    np.testing.assert_allclose(acc, np.asarray(dw_full), rtol=0.35,
                               atol=0.1 * float(np.abs(dw_full).max()))


def test_module_param_tree_matches_nn_conv():
    x, _, _ = _mk()
    a = SubsetWgradConv(4, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=jnp.float32, wgrad_fraction=0.25, min_rows=4)
    b = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                dtype=jnp.float32)
    va = a.init(jax.random.key(0), x)
    vb = b.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    sa = jax.tree_util.tree_map(lambda t: t.shape, va)
    sb = jax.tree_util.tree_map(lambda t: t.shape, vb)
    assert sa == sb
    # Same init stream -> same values -> identical forward.
    ya = a.apply(va, x)
    yb = b.apply(vb, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6)


@pytest.mark.parametrize("frac", [0.25])
def test_simclr_forward_unchanged_and_grads_localized(frac):
    import dataclasses

    from simclr_tpu.config import Config
    from simclr_tpu.models.simclr import SimCLR

    base = Config.for_dataset("cifar10").model
    base = dataclasses.replace(base, compute_dtype="float32",
                               bn_dtype="float32")
    # min_rows=4 so the 16-image CPU batch genuinely takes the subset
    # path (the shipped floor of 64 would short-circuit it to exact).
    sub = dataclasses.replace(base, conv_wgrad_fraction=frac,
                              conv_wgrad_min_rows=4)
    x = jax.random.normal(jax.random.key(1), (16, 32, 32, 3), jnp.float32)

    def grads(mcfg):
        m = SimCLR(cfg=mcfg)
        vs = m.init(jax.random.key(0), x, train=True)

        def loss(p):
            (h, z), _ = m.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(z ** 2) * 1e-3 + jnp.sum(h ** 2) * 1e-6

        (h, z), _ = m.apply(vs, x, train=True, mutable=["batch_stats"])
        return np.asarray(z), jax.grad(loss)(vs["params"])

    z_ref, g_ref = grads(base)
    z_sub, g_sub = grads(sub)
    np.testing.assert_array_equal(z_sub, z_ref)  # forward identical

    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_sub = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_flatten_with_path(g_sub)[0]}
    n_conv = n_other = n_conv_diff = 0
    for path, ref_leaf in flat_ref:
        key = jax.tree_util.keystr(path)
        sub_leaf = flat_sub[key]
        is_conv_kernel = "conv" in key and "kernel" in key
        if is_conv_kernel:
            n_conv += 1
            if not np.array_equal(np.asarray(sub_leaf),
                                  np.asarray(ref_leaf)):
                n_conv_diff += 1
        else:
            n_other += 1
            # dx exactness => every non-conv-kernel grad (BN scale/bias,
            # head dense) is bit-identical.
            np.testing.assert_array_equal(np.asarray(sub_leaf),
                                          np.asarray(ref_leaf),
                                          err_msg=key)
    assert n_conv > 50 and n_other > 50  # sanity: both classes covered
    # The subset path must actually be active: most conv-kernel grads are
    # k-row estimates and differ from the exact ones.
    assert n_conv_diff > n_conv // 2, (n_conv_diff, n_conv)
