"""Shadow-statistics BN: exact equivalence to the sliced-stats path.

`SubsetBatchNorm(x, x_subset=...)` lets the block recompute the k stats
rows with a parameter-shared conv on the sliced input (a "shadow" pass),
making the bn-apply(+add+relu) independent of any reduction over the
full conv output — the TPU fusion win (see models/resnet.Bottleneck).
These tests pin the contract that makes that legal:

 * value path identical (conv commutes with row slicing),
 * total gradients identical (conv dgrad/wgrad are linear, so routing
   the stats/surrogate cotangents through the shadow conv sums to the
   same upstream totals),
 * running statistics identical.

Reference semantics under test: torch BatchNorm2d defaults as used by
the reference encoder (reference: models/resnets.py:16-27,
models/simclr.py:27-41).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.models.norm import SubsetBatchNorm
from simclr_tpu.models.resnet import ResNetEncoder


def _bn(grad_mode, **kw):
    return SubsetBatchNorm(
        use_running_average=False, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, stats_fraction=0.25, min_stats_samples=4,
        grad_mode=grad_mode, **kw)


@pytest.mark.parametrize("grad_mode", ["exact", "subset_st"])
def test_bn_x_subset_identity_routing(grad_mode):
    """x_subset == x[:k] (the identity shadow map) must reproduce the
    sliced path bit-for-bit in value AND gradient."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (16, 3, 3, 8), jnp.float32) * 2.0 + 0.5
    k = 4  # 16 * 0.25

    bn = _bn(grad_mode)
    variables = bn.init(jax.random.key(1), x)

    def run(x, use_subset):
        sub = x[:k] if use_subset else None
        y, upd = bn.apply(variables, x, x_subset=sub,
                          mutable=["batch_stats"])
        return y, upd["batch_stats"]

    y_ref, bs_ref = run(x, False)
    y_sh, bs_sh = run(x, True)
    np.testing.assert_allclose(y_ref, y_sh, rtol=0, atol=0)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=0),
                 bs_ref, bs_sh)

    def loss(x, use_subset):
        y, _ = run(x, use_subset)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss)(x, False)
    g_sh = jax.grad(loss)(x, True)
    np.testing.assert_allclose(g_ref, g_sh, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("grad_mode", ["exact", "subset_st"])
def test_bn_shadow_conv_routing_matches(grad_mode):
    """The real pattern: stats from a parameter-shared conv applied to
    the sliced INPUT. Values identical; conv-weight and input gradients
    identical by linearity of the conv transpose. Tolerances are loose
    ulps, not slack for a different formula: conv(x[:k]) and conv(x)[:k]
    take different matmul tilings, so the stats rows differ in the last
    bit and that noise passes through rsqrt into the gradients."""
    from flax import linen as nn

    class Block(nn.Module):
        grad_mode: str
        shadow: bool

        @nn.compact
        def __call__(self, x):
            conv = nn.Conv(8, (1, 1), use_bias=False, dtype=jnp.float32,
                           name="conv")
            t = conv(x)
            bn = _bn(self.grad_mode)
            if self.shadow:
                return bn(t, x_subset=conv(x[:4]))
            return bn(t)

    key = jax.random.key(2)
    x = jax.random.normal(key, (16, 3, 3, 6), jnp.float32)

    ref = Block(grad_mode=grad_mode, shadow=False)
    sh = Block(grad_mode=grad_mode, shadow=True)
    v_ref = ref.init(jax.random.key(3), x)
    # Identical parameter trees (same module names).
    v_sh = v_ref

    def loss(m, v, x):
        y, _ = m.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(jnp.cos(y))

    l_ref = loss(ref, v_ref, x)
    l_sh = loss(sh, v_sh, x)
    np.testing.assert_allclose(l_ref, l_sh, rtol=1e-6)

    g_ref = jax.grad(lambda v: loss(ref, v, x))(v_ref)
    g_sh = jax.grad(lambda v: loss(sh, v, x))(v_sh)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                atol=1e-5),
        g_ref, g_sh)
    gx_ref = jax.grad(lambda x: loss(ref, v_ref, x))(x)
    gx_sh = jax.grad(lambda x: loss(sh, v_sh, x))(x)
    np.testing.assert_allclose(gx_ref, gx_sh, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shadow_kw", [
    dict(bn3_shadow_stats=True),
    dict(bn3_shadow_stats=True, bn12_shadow_stats=True),
], ids=["bn3", "all"])
def test_encoder_shadow_equivalence(shadow_kw):
    """Full encoder: shadow statistics flip only the fusion structure —
    forward features, parameter gradients, and eval-mode behaviour stay
    the same (f32, CPU)."""
    kw = dict(stage_sizes=(1, 1), width=8, low_quality_img=True,
              dtype=jnp.float32, bn_dtype=jnp.float32,
              bn_stats_fraction=0.25, bn_grad_mode="subset_st")
    enc_ref = ResNetEncoder(**kw)
    enc_sh = ResNetEncoder(**shadow_kw, **kw)

    x = jax.random.normal(jax.random.key(4), (96, 8, 8, 3), jnp.float32)
    variables = enc_ref.init(jax.random.key(5), x, train=True)

    def fwd(m, v, x, train=True):
        return m.apply(v, x, train=train, mutable=["batch_stats"])

    y_ref, bs_ref = fwd(enc_ref, variables, x)
    y_sh, bs_sh = fwd(enc_sh, variables, x)
    np.testing.assert_allclose(y_ref, y_sh, rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                atol=1e-6),
        bs_ref["batch_stats"], bs_sh["batch_stats"])

    def loss(m, params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        y, _ = fwd(m, v, x)
        return jnp.mean(jnp.square(y))

    g_ref = jax.grad(lambda p: loss(enc_ref, p))(variables["params"])
    g_sh = jax.grad(lambda p: loss(enc_sh, p))(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(g_sh))
    for path, a in flat_ref:
        b = flat_sh[path]
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))

    # Eval mode: shadow must be inert (running-average path).
    ye_ref, _ = fwd(enc_ref, variables, x, train=False)
    ye_sh, _ = fwd(enc_sh, variables, x, train=False)
    np.testing.assert_allclose(ye_ref, ye_sh, atol=0)
