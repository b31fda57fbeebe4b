"""Subset-statistics batch norm with a bandwidth-shaped custom VJP.

Autodiff of SubsetBatchNorm (models/norm.py) produces a backward where
EVERY row of dx depends on the per-channel sums S1 = sum(g) and
S2 = sum(g * xhat): XLA is forced into two full passes over the
layer-sized tensors — one reduce pass computing S1/S2 (re-reading g and
the activation) and one elementwise pass writing dx. At batch 512 on
ResNet-50/CIFAR those re-reads are the single largest profiler bucket
(~35 ms of a 122 ms HBM-bound step, ARCHITECTURE.md §5).

The closed form shows the dependency is an artifact. With statistics
taken from the leading k rows and the affine applied to all n rows
(m = elements per channel in the subset):

    dbeta  = S1
    dgamma = S2
    dx_i   = A * g_i                                    for every row,
           - (1/m) * (A*S1 + A*xhat_i*S2
                      - gmean - 2*(x_i - mean)*gvar)    only for i < k

with A = scale * rsqrt(var + eps) and (gmean, gvar) the cotangents of
the mean/var outputs (zero in training — they only feed the
non-differentiated running-average update). Rows k..n need no sums at
all, so this VJP emits:

    pass 1: multi-output fusion — S1, S2 (f32 accumulation) and the
            elementwise tail dx[k:] in ONE read of g / x;
    pass 2: the k-subset head, reading only a stats_fraction slice.

Ideal HBM traffic 3.5 tensor-passes vs autodiff's ~5 for the default
stats_fraction=0.25. Whether XLA actually merges pass 1 into one fusion
is verified on the compiled HLO (tests/test_subset_bn_vjp.py checks
values/grads; scripts/dump_hlo.py the structure).

Forward numerics are bit-compatible with SubsetBatchNorm: the same
shifted one-pass variance (shift = running mean, gradient-neutral) and
the same bf16 application order. Gradients are the analytic f32-math
cotangents of that forward; tests pin them against autodiff of the
unfused module.

Reference counterpart: torch BatchNorm2d backward inside the reference's
micro-batch loop (utils/model_utils.py:109-123) — cuDNN fuses these
reductions the same way; XLA's generic autodiff path does not.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def subset_bn_apply(x: Array, scale: Array, bias: Array, shift: Array,
                    k: int, eps: float, apply_dtype) \
        -> Tuple[Array, Array, Array]:
    """Train-mode subset BN: statistics from x[:k], affine over all rows.

    Returns (y, mean, var): y in ``apply_dtype``; mean/var are the f32
    biased batch statistics (for the caller's running-average update —
    their cotangents are handled, so using them in differentiated code is
    also correct).
    """
    y, mean, var, _ = _fwd_math(x, scale, bias, shift, k, eps, apply_dtype)
    return y, mean, var


def _fwd_math(x, scale, bias, shift, k, eps, apply_dtype):
    red = tuple(range(x.ndim - 1))
    xs = x[:k].astype(jnp.float32)
    d = xs - shift
    mean_d = jnp.mean(d, axis=red)
    mean2_d = jnp.mean(jnp.square(d), axis=red)
    mean = mean_d + shift
    var = jnp.maximum(mean2_d - jnp.square(mean_d), 0.0)
    rsig = jax.lax.rsqrt(var + eps)
    # Application order matches SubsetBatchNorm.__call__ exactly
    # (models/norm.py:98-101): subtract in apply_dtype, scale by
    # (rsig_dt * scale_dt), add bias_dt.
    dt = apply_dtype
    y = (x.astype(dt) - mean.astype(dt)) * (
        rsig.astype(dt) * scale.astype(dt)) + bias.astype(dt)
    return y, mean, var, rsig


def _subset_bn_fwd(x, scale, bias, shift, k, eps, apply_dtype):
    y, mean, var, rsig = _fwd_math(x, scale, bias, shift, k, eps,
                                   apply_dtype)
    # Residuals: x is already materialized (it is the producing conv's
    # output); everything else is per-channel.
    return (y, mean, var), (x, scale, mean, rsig)


def _subset_bn_bwd(k, eps, apply_dtype, res, cots):
    x, scale, mean, rsig = res
    gy, gmean, gvar = cots
    red = tuple(range(x.ndim - 1))
    dt = x.dtype

    a32 = scale * rsig                         # (C,) f32
    a = a32.astype(dt)
    mean_dt = mean.astype(dt)
    rsig_dt = rsig.astype(dt)

    # --- pass 1: sums + the no-dependency tail, one read of (gy, x) ---
    xhat = (x - mean_dt) * rsig_dt             # elementwise, apply dtype
    s1 = jnp.sum(gy, axis=red, dtype=jnp.float32)
    s2 = jnp.sum(gy * xhat, axis=red, dtype=jnp.float32)
    dx_tail = gy[k:] * a

    # --- pass 2: subset head, reads only the leading k rows ---
    m = k
    for ax in red[1:]:
        m *= x.shape[ax]
    inv_m = jnp.float32(1.0 / m)
    # Correction folded to the form c0 + xhat*c1 + x*c2 with per-channel
    # coefficients, so the head stays a single cheap elementwise pass.
    c1 = (-inv_m) * (a32 * s2)                           # * xhat_i
    c2 = inv_m * 2.0 * gvar                              # * (x_i - mean)
    c0 = (-inv_m) * (a32 * s1 - gmean)
    head_corr = (c0.astype(dt) + xhat[:k] * c1.astype(dt)
                 + (x[:k] - mean_dt) * c2.astype(dt))
    dx_head = gy[:k] * a + head_corr
    dx = jnp.concatenate([dx_head, dx_tail], axis=0)

    dscale = s2
    dbias = s1
    return dx, dscale, dbias, None             # shift: gradient-neutral


subset_bn_apply.defvjp(_subset_bn_fwd, _subset_bn_bwd)
