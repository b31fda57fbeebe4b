"""Batch normalization with subset statistics — the framework's hottest
bandwidth optimization.

Profiling the pretrain step on v5e showed ~50% of device time in BN
statistic reductions (`convert_reduce_fusion`s re-reading layer-sized
activation tensors; ResNet-50 has 53 BNs and training needs ~4 reduction
passes per BN). With batch 1024 the statistics are massively oversampled:
the reference computes them from 64-sample micro-batches
(reference: utils/model_utils.py:109-114 + batch_size_small=64), so
estimating them here from a subset of the global batch — default 1/4, i.e.
256 samples — is still 4x more samples than the reference while cutting
the stat-reduction HBM traffic by the same factor.

Measured: 131 -> ~90 ms per effective-batch-512 step (subset 0.25).

Drop-in for flax.linen.BatchNorm: same parameter names ('scale', 'bias')
and batch_stats collection ('mean', 'var'), so checkpoints interchange.
`stats_fraction=1.0` reproduces exact full-batch statistics.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SubsetBatchNorm(nn.Module):
    """BatchNorm whose batch statistics come from the leading
    ``stats_fraction`` of the batch (the batch is shuffled upstream, so the
    subset is uniform). Running averages and eval behaviour are identical
    to flax.linen.BatchNorm."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    stats_fraction: float = 0.25
    min_stats_samples: int = 64
    axis_name: Optional[str] = None
    # Use the bandwidth-shaped custom VJP (ops/subset_bn.py): identical
    # forward numerics, backward restructured so the dgamma/dbeta sums
    # and 1-stats_fraction of dx share one data pass. Requires
    # axis_name=None (the pjit path, where reductions are global anyway).
    fused_vjp: bool = False
    # Backward-pass semantics (forward numerics identical either way):
    #  'exact'     — true autodiff of the subset-statistics forward: the
    #                scale/bias gradients are full-tensor reductions and
    #                the k statistics rows of dx carry the mean/var
    #                coupling terms. On an HBM-bound step those
    #                reductions re-read every layer-sized activation
    #                (~35 ms of a 114 ms ResNet-50/batch-1024 step) and
    #                every custom-VJP restructure of them measured SLOWER
    #                (six attempts, ARCHITECTURE.md §5: custom_vjp
    #                boundaries forfeit XLA's cross-op fusion).
    #  'subset_st' — statistics are constants in the backward
    #                (stop_gradient; drops the O(1/sqrt(m)) coupling
    #                terms on the k stats rows only — every other row's
    #                dx is bit-identical) and the scale/bias gradients
    #                come from an unbiased straight-through surrogate on
    #                the statistics subset: dscale = (n/k)*sum_k(gy*xhat),
    #                dbias = (n/k)*sum_k(gy). Stays INSIDE autodiff, so
    #                dx = gy*a fuses into the conv backward chain and the
    #                reductions read k-row slices instead of full tensors.
    grad_mode: str = "exact"
    # How the straight-through scale/bias surrogate enters the graph when
    # grad_mode='subset_st' and no x_subset is supplied:
    #  'affine' — the surrogate is folded into per-ROW affine
    #             coefficients: y = (x - mean)*S + B with
    #             S = sg(rsig*scale) + M*(n/k)*sg(rsig)*(scale-sg(scale)),
    #             B = sg(bias) + M*(n/k)*(bias-sg(bias)),
    #             M = 1[row < k] of shape [n,1,..,1]. Every difference
    #             from the 'pad' form multiplies a primal-zero factor, so
    #             the forward VALUE is identical in exact arithmetic
    #             (bit-identical in eager; <=1 ulp on the k rows under
    #             jit, where XLA may distribute the masked terms) and the
    #             reverse-mode VJP is term-for-term identical
    #             (tests/test_norm.py). The win is structural: no
    #             pad/slice on the layer-sized tensor — the whole apply
    #             is elementwise with [n,1,1,C]-broadcast coefficients,
    #             which XLA's conv input fusion accepts at EVERY layer.
    #             The 'pad' form's batch-dim pad blocked input fusion for
    #             layer1's batch-on-lanes layouts, materializing a
    #             standalone 128 MB relu pass per block (1.2 ms/step of
    #             a 101 ms step on v5e at batch 1024).
    #  'pad'    — the k-row surrogate tensor is padded with zeros to the
    #             full batch and added (the round-3 formulation; still
    #             always used when x_subset is given, where the surrogate
    #             must read the shadow recompute rather than x's rows so
    #             the backward never re-reads the raw conv output).
    st_surrogate: str = "affine"

    @nn.compact
    def __call__(self, x, x_subset=None):
        """``x_subset``, when given, must equal ``x[:k]`` mathematically
        (e.g. the same conv applied to the leading k input rows — a
        "shadow" recompute). Statistics and the straight-through
        surrogate then read it INSTEAD of slicing ``x``, which makes the
        normalize(+add/relu downstream) chain independent of the full
        tensor's statistics pass — XLA can fuse the whole apply into the
        producing conv's output epilogue instead of materializing the
        raw conv output and re-reading it (measured: the forward
        residual-add passes were 15.4 ms/step of a 106 ms step).
        Gradients re-route through ``x_subset``'s producer; by linearity
        of conv dgrad/wgrad the total upstream gradient is mathematically
        identical (tests/test_norm_shadow.py)."""
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif self.fused_vjp and self.axis_name is None:
            from simclr_tpu.ops.subset_bn import subset_bn_apply
            n = x.shape[0]
            k = min(max(int(n * self.stats_fraction),
                        self.min_stats_samples), n)
            shift = jax.lax.stop_gradient(ra_mean.value)
            y, mean, var = subset_bn_apply(
                x, scale, bias, shift, k, self.epsilon, self.dtype)
            if not self.is_initializing():
                m = k
                for s in x.shape[1:-1]:
                    m *= s
                unbiased = var * (m / max(m - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)
            return y
        else:
            n = x.shape[0]
            if x_subset is not None:
                k = x_subset.shape[0]
                xs = x_subset.astype(jnp.float32)
            else:
                k = min(max(int(n * self.stats_fraction),
                            self.min_stats_samples), n)
                xs = x[:k].astype(jnp.float32)
            red = tuple(range(xs.ndim - 1))
            # One-pass variance, shifted for conditioning: raw
            # E[x^2]-E[x]^2 cancels catastrophically in f32 when
            # |mean| >> std (e.g. projection-head inputs). The running
            # mean is a free shift: it tracks the true mean, costs no
            # reduction, is gradient-neutral (non-diff variable), and is
            # identical across replicas — and with a [C]-vector shift the
            # sibling mean/var reductions fuse straight off the bf16
            # activations instead of materializing an f32 slice copy
            # (measured ~5 ms/step on v5e at batch 1024).
            shift = jax.lax.stop_gradient(ra_mean.value)
            d = xs - shift
            mean_d = jnp.mean(d, axis=red)
            mean2_d = jnp.mean(jnp.square(d), axis=red)
            if self.axis_name is not None:
                mean_d = jax.lax.pmean(mean_d, self.axis_name)
                mean2_d = jax.lax.pmean(mean2_d, self.axis_name)
            mean = mean_d + shift
            var = jnp.maximum(mean2_d - jnp.square(mean_d), 0.0)
            if not self.is_initializing():
                # torch parity: BatchNorm normalizes with the biased batch
                # variance but writes the UNBIASED (m/(m-1)) estimate into
                # the running average (reference models use nn.BatchNorm2d
                # defaults). m = elements reduced per channel.
                m = 1
                for ax in red:
                    m *= xs.shape[ax]
                if self.axis_name is not None:
                    m *= jax.lax.psum(1, self.axis_name)
                unbiased = var * (m / max(m - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)

        dt = self.dtype
        mean_dt = mean.astype(dt)
        rsig_dt = jax.lax.rsqrt(var + self.epsilon).astype(dt)
        scale_dt = scale.astype(dt)
        bias_dt = bias.astype(dt)
        if (self.grad_mode in ("subset_st", "subset_st_nomean",
                               "subset_st_w")
                and not self.use_running_average):
            sg = jax.lax.stop_gradient
            # Value path: identical numbers. The MEAN stays differentiable
            # — autodiff routes -A*sum(gy)/m onto the k statistics rows,
            # which is exactly the S1 head correction of the true subset-BN
            # backward, and it keeps the per-channel common mode nulled:
            # sum(dx) == 0, so upstream weights receive no gradient along
            # the BN-invariant mean direction. (A first version also
            # stop-gradiented the mean; the leaked common mode compounded
            # through 53 BNs and collapsed training — lin-eval 16% vs 47%.)
            # The VARIANCE path and the affine params are stopped: the
            # dropped radial term only slows weight-norm growth, and
            # scale/bias gradients ride the subset surrogate below. The
            # S1 reduction reads gy once; no x re-read, no patch pass.
            # 'subset_st_nomean' is a PERF PROBE, not a trainable mode: it
            # stop-gradients the mean as well, removing the per-BN
            # full-tensor sum(gy) reduce from the backward — but the
            # leaked per-channel common mode collapses training (see
            # above). Used only to measure that bucket's marginal cost.
            # MEASURED (v5e, batch 1024): 9.09 vs 9.10 steps/s — ZERO.
            # The sum(gy) reductions fuse into the conv dgrad epilogues
            # (kOutput fusions emitting the [C] sum as a side output),
            # so they ride streams the backward pays for anyway. Kept as
            # the documented proof that BN backward is at its floor.
            mean_b = (sg(mean.astype(dt)) if self.grad_mode
                      == "subset_st_nomean" else mean.astype(dt))
            if (self.st_surrogate == "affine" and x_subset is None
                    and self.grad_mode != "subset_st_w"
                    and not self.is_initializing()):
                # Affine-mask surrogate (see the st_surrogate field doc):
                # identical value and VJP to the pad form below, but the
                # layer-sized tensor sees only elementwise ops with
                # [n,1,..,1,C]-broadcast coefficients — no batch-dim pad,
                # so the apply+relu chain stays input-fusable into the
                # consuming conv at every layer/layout.
                n = x.shape[0]
                kk = min(max(int(n * self.stats_fraction),
                             self.min_stats_samples), n)
                est = jnp.asarray(n / kk, dt)
                me = ((jnp.arange(n) < kk).astype(dt) * est).reshape(
                    (n,) + (1,) * (x.ndim - 1))
                s_row = sg(rsig_dt * scale_dt) + me * (
                    sg(rsig_dt) * (scale_dt - sg(scale_dt)))
                b_row = sg(bias_dt) + me * (bias_dt - sg(bias_dt))
                return (x.astype(dt) - mean_b) * s_row + b_row
            y = (x.astype(dt) - mean_b) * sg(rsig_dt * scale_dt) \
                + sg(bias_dt)
            if not self.is_initializing():
                # ...and the affine gradients ride a straight-through
                # surrogate over the k statistics samples: numerically
                # exactly zero (p - sg(p) == 0), gradient-wise the
                # unbiased (n/k)-scaled subset estimator. The pad is a
                # lazy fusion operand — the k-slice is the only extra
                # HBM read, and the backward reductions touch only the
                # k-row slices of the cotangent.
                n = x.shape[0]
                if x_subset is not None:
                    kk = x_subset.shape[0]
                else:
                    kk = min(max(int(n * self.stats_fraction),
                                 self.min_stats_samples), n)
                est = jnp.asarray(n / kk, dt)
                if self.grad_mode == "subset_st_w":
                    # Mask formulation of the same estimator: instead of
                    # slicing the leading k rows (a strided half-tile
                    # lane-slice when XLA lays BATCH on the 128 lanes,
                    # which it does for C<=128 tensors), weight all rows
                    # by an iota mask. Identical value (exactly 0) and
                    # gradient; the streams stay tile-contiguous and the
                    # backward reductions can fuse into the passes that
                    # already read gy and x.
                    # MEASURED (v5e, batch 1024): 8.04 vs 9.10 steps/s —
                    # SLOWER. The full-row surrogate turns a k-row slice
                    # read into an n-row elementwise pass; tile
                    # contiguity does not pay for 16x the traffic.
                    w = (jnp.arange(n) < kk).astype(dt).reshape(
                        (n,) + (1,) * (x.ndim - 1))
                    xhat = (x.astype(dt) - sg(mean_dt)) * sg(rsig_dt)
                    sur = (xhat * (scale_dt - sg(scale_dt))
                           + (bias_dt - sg(bias_dt))) * (w * est)
                    y = y + sur
                else:
                    xk = (x_subset if x_subset is not None
                          else x[:kk]).astype(dt)
                    xhat_k = (xk - sg(mean_dt)) * sg(rsig_dt)
                    sur = (xhat_k * (scale_dt - sg(scale_dt))
                           + (bias_dt - sg(bias_dt))) * est
                    pad = [(0, n - kk)] + [(0, 0)] * (x.ndim - 1)
                    y = y + jnp.pad(sur, pad)
            return y
        y = (x.astype(dt) - mean_dt) * (rsig_dt * scale_dt) + bias_dt
        return y


class SubsetBNAct(nn.Module):
    """Subset-statistics BN fused with its surrounding activation ops —
    ``mode``: 'relu' (bn1/bn2 positions), 'add_relu' (bn3 + residual),
    'none' (downsample BN). Parameter names ('scale'/'bias') and the
    batch_stats collection ('mean'/'var') are identical to
    SubsetBatchNorm, so every block configuration interchanges
    checkpoints.

    Train-mode forward numerics are bit-identical to SubsetBatchNorm
    followed by the add/relu; the difference is the BACKWARD: on
    supported shapes (ops/pallas/bn_relu.supports) the whole
    relu-mask + dgamma/dbeta + dx (+dskip) backward runs as ONE Pallas
    pass over the activations instead of autodiff's three (the step is
    HBM-bound — see the bn_relu module docstring for the measured
    motivation). Unsupported shapes (C not a lane multiple, tiny init
    traces, CPU without interpret) fall back to plain XLA autodiff of
    the same math.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    stats_fraction: float = 0.25
    min_stats_samples: int = 64
    mode: str = "relu"          # 'relu' | 'add_relu' | 'none'
    fused: bool = True          # False = always the XLA fallback
    interpret: bool = False     # interpret-mode Pallas (CPU tests)
    # 'pallas': the one-pass kernel over layout-native 2D views;
    # 'xla': the same restructured backward as plain XLA ops (no layout
    # constraints, relies on XLA fusion for the single-pass property).
    impl: str = "pallas"

    @nn.compact
    def __call__(self, x, skip=None):
        from simclr_tpu.ops.pallas import bn_relu as _k

        assert (skip is not None) == (self.mode == "add_relu")
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feats,), jnp.float32))
        dt = self.dtype

        if self.use_running_average:
            y = _k._bn_apply(x, scale, bias, ra_mean.value, ra_var.value,
                             self.epsilon, dt)
            if self.mode == "add_relu":
                y = jnp.maximum(y + skip.astype(y.dtype), 0)
            elif self.mode == "relu":
                y = jnp.maximum(y, 0)
            return y

        n = x.shape[0]
        k = min(max(int(n * self.stats_fraction),
                    self.min_stats_samples), n)
        shift = jax.lax.stop_gradient(ra_mean.value)
        use_kernel = (self.fused and not self.is_initializing()
                      and (self.impl in ("xla", "xla_mask")
                           or _k.supports(x.shape, k, dt)))
        if use_kernel:
            op = {"relu": _k.subset_bn_relu,
                  "add_relu": _k.subset_bn_add_relu,
                  "none": _k.subset_bn_only}[self.mode]
            args = (x,) if skip is None else (x, skip)
            y, mean, var = op(*args, scale, bias, shift, k,
                              self.epsilon, dt, self.interpret,
                              self.impl)
        else:
            mean, var = _k._bn_stats(x, shift, k, self.epsilon)
            y = _k._bn_apply(x, scale, bias, mean, var, self.epsilon, dt)
            if self.mode == "add_relu":
                y = jnp.maximum(y + skip.astype(y.dtype), 0)
            elif self.mode == "relu":
                y = jnp.maximum(y, 0)

        if not self.is_initializing():
            m = k
            for s in x.shape[1:-1]:
                m *= s
            unbiased = var * (m / max(m - 1, 1))
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * unbiased)
        return y


class FoldedBatchNorm(nn.Module):
    """BatchNorm that returns folded per-channel affines (A, B) instead of
    a normalized tensor: normalize(y) == y * A + B with
    A = scale * rsqrt(var + eps), B = bias - mean * A.

    Used by the fused-bottleneck path (ops/pallas/bottleneck.py): the caller
    computes the block's pre-activations on the SUBSET of the batch that
    SubsetBatchNorm would slice (per-sample ops commute with row slicing, so
    subset-only compute is exactly equivalent), passes them here for
    statistics, and applies the returned affines to the full batch inside
    the Pallas kernel. Parameter and batch_stats trees are IDENTICAL to
    SubsetBatchNorm / flax BatchNorm ('scale'/'bias', 'mean'/'var'), so the
    fused and unfused configurations interchange checkpoints freely.

    In train mode `y_subset` must be the (already-sliced) subset of
    pre-activations; statistics and the unbiased running-average update
    follow SubsetBatchNorm exactly. With ``use_running_average`` the input
    is ignored (may be None) and the affines fold the running statistics.
    """

    feats: int
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, y_subset):
        scale = self.param("scale", nn.initializers.ones, (self.feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.feats,), jnp.float32))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            ys = y_subset.astype(jnp.float32)
            red = tuple(range(ys.ndim - 1))
            # Shifted one-pass variance — see SubsetBatchNorm.
            shift = jax.lax.stop_gradient(ra_mean.value)
            d = ys - shift
            mean_d = jnp.mean(d, axis=red)
            mean2_d = jnp.mean(jnp.square(d), axis=red)
            mean = mean_d + shift
            var = jnp.maximum(mean2_d - jnp.square(mean_d), 0.0)
            if not self.is_initializing():
                m = 1
                for ax in red:
                    m *= ys.shape[ax]
                unbiased = var * (m / max(m - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * unbiased)

        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return a, b


class BNScaleBias(nn.Module):
    """Parameter / running-stat holder for EXTERNALLY computed BN
    statistics (ops/foldconv.conv_subset_bn). A call with no arguments
    declares and returns (scale, bias, running_mean, running_var); a
    second call with (mean, var, m) writes the torch-parity unbiased
    running update (m = elements reduced per channel). Parameter and
    batch_stats layout matches flax BatchNorm / SubsetBatchNorm
    ('scale'/'bias', 'mean'/'var'), so checkpoints interchange."""

    feats: int
    momentum: float = 0.9

    @nn.compact
    def __call__(self, mean=None, var=None, m=1):
        scale = self.param("scale", nn.initializers.ones, (self.feats,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.feats,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.feats,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.feats,), jnp.float32))
        if mean is not None and not self.is_initializing():
            unbiased = var * (m / max(m - 1, 1))
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * unbiased)
        return scale, bias, ra_mean.value, ra_var.value
