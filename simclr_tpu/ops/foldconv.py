"""Conv + subset-BatchNorm with a weight-space scale gradient.

The profiler (scripts/profile_step.py) showed ~30% of the pretrain step in
BN-backward reductions: for every BatchNorm, `dgamma = sum(g * y_hat)`
re-reads two layer-sized activation tensors. This op removes those
reductions with an algebraic identity. For `y = conv(x, w)` and an
output-channel scale A:

    sum_nhw g[..., f] * y[..., f]  ==  sum_khkw_i w[..., f] * WG[..., f]
    where WG = conv_wgrad(x, g)

i.e. the activation-sized inner product <g, y> per channel equals a
WEIGHT-shaped inner product between the kernel and the weight-gradient
taken with the raw cotangent g. The backward pass here therefore computes
one full wgrad (same cost autodiff already pays), derives the scale/shift
and statistics gradients from it in weight space, and never reads `y`
again. The only remaining activation-shaped reductions are `sum(g)` (one
input, fused by XLA into the elementwise `g * A` pass).

Forward semantics are EXACTLY SubsetBatchNorm applied to a conv output
(models/norm.py): statistics from the leading `k` rows with the running-
mean shift, biased variance for normalization, unbiased running update by
the caller. float32-equivalence vs the unfused path is asserted in
tests/test_models.py::test_folded_block_matches_unfused_f32.

Reference counterpart: torch Conv2d + BatchNorm2d pairs inside torchvision
Bottleneck blocks (reference models/resnets.py:8-36 via torchvision);
this is a TPU-native training-path reformulation, not a port.

STATUS — EXPERIMENTAL, off by default (`ModelConfig.fold_bn_scales`).
Verified correct: float32 model-level equivalence (tests/test_models.py),
bf16 op-level jit parity (eager == jit on the raw op), and full-model
gradients vs autodiff of the same forward (cos >= 0.9994 on v5e, probed
at init, at an autodiff-trained state, and at a stalled state). Open
issue: inside the FULL ResNet-50 under whole-program jit in bf16, the
jitted gradient of the model collapses toward zero for early layers
(stem grads ~1e-19 vs ~2.3 eager) while the eager gradient of the
identical function is healthy — reproduced with two independent
wgrad/dgrad formulations (hand-rolled dimension-numbers and jax.vjp-
built), so the arithmetic here is not the trigger; suspected XLA:TPU
compilation issue around custom_vjp + conv at scale. Until that is
root-caused the unfused SubsetBatchNorm path stays the default; it also
currently benches faster (8.35 vs 6.73 steps/s at batch 512 on v5e).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, pad):
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=DN)


def _wgrad(x, g, pad, kh, kw):
    """Weight gradient of _conv: dw[kh,kw,i,o] = sum_nyx x * g.

    Built via jax.vjp of the forward conv so XLA sees exactly the
    transposed-conv pattern its own autodiff emits. (A hand-rolled
    ("CHWN","IHWO") conv_general_dilated formulation produced silently
    WRONG (vanishing) gradients under whole-program jit on TPU while
    being correct op-by-op — do not reintroduce it.)
    """
    i, o = x.shape[-1], g.shape[-1]
    shape = (kh, kw, i, o)
    _, vjp = jax.vjp(lambda w_: _conv(x, w_, pad),
                     jnp.zeros(shape, x.dtype))
    return vjp(g)[0].astype(jnp.float32)


def _dgrad(g, w, pad, kh, kw):
    """Input gradient of _conv via jax.vjp (see _wgrad note)."""
    n, h, ww = g.shape[0], g.shape[1], g.shape[2]
    ph, pw = pad[0][0], pad[1][0]
    in_shape = (n, h + (kh - 1) - 2 * ph, ww + (kw - 1) - 2 * pw,
                w.shape[2])
    _, vjp = jax.vjp(lambda x_: _conv(x_, w, pad),
                     jnp.zeros(in_shape, g.dtype))
    return vjp(g)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def conv_subset_bn(pad, k, eps, x, w, gamma, beta, shift):
    """relu-less fused train-mode conv+BN: returns (out, mean, var).

    out = conv(x, w) * A + B with A = gamma * rsqrt(var + eps),
    B = beta - mean * A; mean/var are subset statistics over the leading
    `k` rows of the conv output, computed with the one-pass shifted
    estimator (shift is a non-differentiated conditioning vector, the
    caller passes the running mean). `pad` is the spatial padding pairs,
    `k` the static subset row count.

    The returned mean/var carry NO gradient (running-average consumers
    only), matching flax/SubsetBatchNorm stop-gradient semantics.
    """
    out, mean, var, _ = _fwd(pad, k, eps, x, w, gamma, beta, shift)
    return out, mean, var


def _fwd(pad, k, eps, x, w, gamma, beta, shift):
    wb = w.astype(x.dtype)
    y = _conv(x, wb, pad)
    ys = y[:k].astype(jnp.float32)
    red = tuple(range(ys.ndim - 1))
    d = ys - shift
    mean_d = jnp.mean(d, axis=red)
    mean2_d = jnp.mean(jnp.square(d), axis=red)
    mean = mean_d + shift
    raw_var = mean2_d - jnp.square(mean_d)
    var = jnp.maximum(raw_var, 0.0)
    r = lax.rsqrt(var + eps)
    a = gamma * r
    b = beta - mean * a
    out = (y.astype(jnp.float32) * a + b).astype(x.dtype)
    return out, mean, var, (ys, raw_var)


def _conv_subset_bn_fwd(pad, k, eps, x, w, gamma, beta, shift):
    out, mean, var, (ys, raw_var) = _fwd(pad, k, eps, x, w, gamma, beta,
                                         shift)
    res = (x, w, gamma, mean, var, raw_var, ys)
    return (out, mean, var), res


def _conv_subset_bn_bwd(pad, k, eps, res, cts):
    g, _, _ = cts  # mean/var outputs are non-differentiated consumers
    x, w, gamma, mean, var, raw_var, ys = res
    kh, kw = w.shape[0], w.shape[1]
    f = w.shape[3]
    red = tuple(range(g.ndim - 1))
    m = k
    for ax in red[1:]:
        m *= ys.shape[ax]

    r = lax.rsqrt(var + eps)
    a = gamma * r

    gf = g.astype(jnp.float32)
    s0 = jnp.sum(gf, axis=red)                       # [f], fuses with g*A
    wb = w.astype(x.dtype)
    wg = _wgrad(x, g, pad, kh, kw)                   # f32 [kh,kw,i,f]
    # y was computed with the bf16-rounded kernel, so the identity
    # sum(g*y) == sum(w*wgrad) must use the SAME rounded weights.
    s1 = jnp.sum(wb.astype(jnp.float32) * wg, axis=(0, 1, 2))

    g_a = s1 - mean * s0                             # dL/dA holding mean
    dgamma = g_a * r
    dbeta = s0
    dmean = -a * s0
    dvar = jnp.where(raw_var > 0,
                     -0.5 * g_a * gamma * r * r * r, 0.0)

    # Subset rows additionally carry the statistics gradients. The add
    # happens in f32 BEFORE the bf16 cast (one fused elementwise pass).
    gy_sub = (dmean / m
              + dvar * 2.0 * (ys - mean) / m)        # [k, ..., f] f32
    dy = ((gf * a).at[:k].add(gy_sub)).astype(x.dtype)
    dx = _dgrad(dy, wb, pad, kh, kw)
    dw = (a * wg
          + _wgrad(x[:k], gy_sub.astype(x.dtype), pad, kh, kw))
    return (dx, dw.astype(w.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(jnp.float32), jnp.zeros_like(mean))


conv_subset_bn.defvjp(_conv_subset_bn_fwd, _conv_subset_bn_bwd)
