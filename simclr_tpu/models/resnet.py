"""TPU-native ResNet-50 encoders (Flax linen).

Re-designed counterparts of the reference's torchvision-subclass encoders
(reference: models/resnets.py:8-36 ResnetEncoder, :54-89 ResnetSupervised,
:116-152 ResnetEncoderDropout). Not a port: layout is NHWC (TPU-preferred),
compute is bfloat16 on the MXU with float32 params and float32 batch-norm
statistics, and batch-norm batch statistics are computed over the *global*
(sharded) batch under pjit — which natively gives synchronized BN across
data-parallel chips instead of the reference's per-micro-batch statistics.

Architecture parity with the reference:
  * Bottleneck residual blocks, layout [3, 4, 6, 3] (ResNet-50), expansion 4,
    stride carried by the 3x3 conv (torchvision v1.5 convention).
  * `low_quality_img=True` (CIFAR): 3x3 stride-1 pad-1 bias-free stem conv and
    NO max-pool (reference: models/resnets.py:16-19 and the skipped maxpool in
    forward at :26-27).
  * `low_quality_img=False` (STL): standard 7x7 stride-2 stem + 3x3 stride-2
    max-pool.
  * Global average pool output, width 2048. The reference returns shape
    (N, 2048, 1, 1) (models/resnets.py:34-36); we return (N, 2048) — every
    consumer in the reference immediately flattens.
  * MC-dropout variant: dropout p after the stem and after each of the four
    stages, *always active* — including at evaluation time (reference:
    models/resnets.py:110-113 keeps training=True unconditionally). Here that
    eval-time stochasticity is an explicit `mc_dropout` constructor flag so it
    cannot be silently lost.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.models.norm import FoldedBatchNorm, SubsetBatchNorm

# torchvision initializes conv kernels with kaiming-normal fan_out
# (gain for ReLU), which is variance_scaling(2.0, fan_out, normal).
conv_kernel_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


class WinogradConv3x3(nn.Module):
    """Drop-in for the stride-1 SAME 3x3 ``nn.Conv``: same parameter
    name/shape/init ("kernel", (3,3,C,K)), but the convolution runs
    through the fused Winograd Pallas kernel (ops/pallas/winograd.py) —
    2.25x fewer MXU FLOPs at identical HBM traffic. Only instantiated
    for bf16 compute on widths that are multiples of 128 (the Bottleneck
    gates this); everywhere else the plain conv is used, and checkpoints
    interchange freely because the trees are identical."""

    features: int
    dtype: Any = jnp.bfloat16
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from simclr_tpu.ops.pallas.winograd import winograd_conv3x3
        w = self.param("kernel", conv_kernel_init,
                       (3, 3, x.shape[-1], self.features), jnp.float32)
        return winograd_conv3x3(x.astype(self.dtype),
                                w.astype(self.dtype), self.interpret)


class PallasConv3x3C64(nn.Module):
    """Drop-in for the stride-1 SAME 3x3 ``nn.Conv`` at C_in=C_out=64
    (layer1 conv2): same parameter name/shape/init ("kernel",
    (3,3,64,64)), dispatching to the batch-on-lanes Pallas kernel
    (ops/pallas/conv64.py) on supported shapes — C==64, batch a multiple
    of 256, bf16 — and to the plain XLA conv otherwise (model init,
    k-row shadow-stats calls, small parity batches). Checkpoints
    interchange freely with the nn.Conv path."""

    dtype: Any = jnp.bfloat16
    interpret: bool = False

    @nn.compact
    def __call__(self, x):
        from simclr_tpu.ops.pallas.conv64 import conv3x3_c64, supports
        w = self.param("kernel", conv_kernel_init,
                       (3, 3, x.shape[-1], 64), jnp.float32)
        x = x.astype(self.dtype)
        if not self.is_initializing() and supports(x.shape, x.dtype):
            return conv3x3_c64(x, w, self.interpret)
        return jax.lax.conv_general_dilated(
            x, w.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def relu_vjp_from_output(x):
    """ReLU whose VJP masks with the OUTPUT (y > 0) instead of the input
    (x > 0) — bit-identical values and gradients (y > 0 ⟺ x > 0).

    Why it exists: in this network every ReLU's *input* is a fused
    epilogue value (BN-apply of a conv output, or conv3+residual add)
    that XLA never materializes, while the *output* is the tensor the
    next op consumes and therefore lives in HBM anyway. jnp.maximum's
    VJP references the pre-activation, forcing XLA to either keep it
    alive or rematerialize the producing chain inside every backward
    fusion that needs the mask; expressing the mask in terms of the
    output lets the backward read a tensor that already exists."""
    return jnp.maximum(x, 0)


def _rvo_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _rvo_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_vjp_from_output.defvjp(_rvo_fwd, _rvo_bwd)


class _ConvKernel(nn.Module):
    """Parameter-only holder declaring a conv kernel under the same
    name/shape nn.Conv would ('<name>/kernel', (kh, kw, in, out)), so the
    fused-bottleneck path shares checkpoints with the nn.Conv path."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape,
                          jnp.float32)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with identity shortcut.

    When ``fused`` is set and the block is a stride-1 identity block
    (in = out = 4*features), the whole block runs as a single VMEM-resident
    Pallas kernel (ops/pallas/bottleneck.py) with SubsetBatchNorm-equivalent
    two-pass statistics; parameter/batch_stats trees are identical to the
    unfused path, so the two configurations interchange checkpoints.
    """

    features: int           # Width of the 1x1/3x3 convs; output is 4x this.
    stride: int = 1
    norm: Callable[..., Any] = nn.BatchNorm
    dtype: Any = jnp.bfloat16
    # Fused-path controls (set by ResNetEncoder).
    fused: bool = False
    # Weight-folded XLA path: fold the BN scale into the conv kernels
    # (conv(x, w) * A == conv(x, w * A)), so the BN-scale gradient becomes
    # a WEIGHT-shaped reduction instead of an activation-shaped one — the
    # profiler showed those dgamma reductions (re-reading layer-sized
    # activations) at ~30% of step time. Statistics come from a subset
    # pass with unfolded weights (FoldedBatchNorm).
    folded: bool = False
    bn_train: bool = True   # train-mode statistics (folded path only)
    fold_norm: Optional[Callable[..., FoldedBatchNorm]] = None
    fused_interpret: bool = False
    stats_fraction: float = 0.25
    min_stats_samples: int = 64
    # Factory for the fused BN(+add)+ReLU module (models/norm.SubsetBNAct,
    # single-pass Pallas backward). None = plain norm + relu autodiff.
    bnact: Optional[Callable[..., Any]] = None
    # Fusion-rooting experiment: optimization_barrier after each ReLU
    # (materializes the activation and its cotangent, splitting the
    # backward dgrad-conv out of the mask/scale elementwise chain).
    relu_barrier: bool = False
    # Shadow statistics for bn3/downsample_bn: recompute the k stats rows
    # with a second (parameter-shared) conv call on the sliced input, so
    # the bn-apply(+add+relu) no longer depends on a reduction of the
    # full conv output and XLA can fuse it into the conv's output
    # epilogue — deleting the raw-conv-output materialize+re-read
    # (the forward residual-add passes, ~15 ms/step measured). Exactly
    # equivalent math: conv commutes with row slicing, and conv
    # dgrad/wgrad linearity makes the re-routed gradients sum to the
    # same totals (tests/test_norm_shadow.py).
    shadow_bn3: bool = False
    # Same trick for bn1/bn2 (the mid-block conv1/conv2 raw outputs).
    shadow_bn12: bool = False
    # ReLU backward mask from the OUTPUT (relu_vjp_from_output above).
    relu_from_output: bool = False
    # Fused Winograd Pallas kernel for the stride-1 conv2 (see
    # WinogradConv3x3 above; gated to bf16 + width % 128 == 0).
    winograd_conv2: bool = False
    winograd_interpret: bool = False
    # Batch-on-lanes Pallas kernel for width-64 stride-1 conv2
    # (PallasConv3x3C64 above / ops/pallas/conv64.py).
    conv64_pallas: bool = False
    conv64_interpret: bool = False
    # Subset weight gradients (ops/subset_wgrad.py): dw contracted over a
    # centered row slice of ceil(fraction*N) (min 64) instead of the full
    # batch, scaled N/k. dx stays exact. 1.0 = plain nn.Conv.
    wgrad_fraction: float = 1.0
    wgrad_min_rows: int = 64

    expansion: int = 4

    def _conv(self, features, ksize, strides, padding, name):
        if self.wgrad_fraction >= 1.0:
            return nn.Conv(features, ksize, strides=strides,
                           padding=padding, use_bias=False,
                           kernel_init=conv_kernel_init, dtype=self.dtype,
                           name=name)
        from simclr_tpu.ops.subset_wgrad import SubsetWgradConv
        return SubsetWgradConv(features, ksize, strides=strides,
                               padding=padding, dtype=self.dtype,
                               kernel_init=conv_kernel_init,
                               wgrad_fraction=self.wgrad_fraction,
                               min_rows=self.wgrad_min_rows,
                               name=name)

    def _post_relu(self, y):
        if self.relu_barrier:
            return jax.lax.optimization_barrier(y)
        return y

    def _relu(self, y):
        f = relu_vjp_from_output if self.relu_from_output else nn.relu
        return self._post_relu(f(y))

    @nn.compact
    def __call__(self, x):
        if (self.stride == 1
                and x.shape[-1] == self.features * self.expansion):
            if self.fused:
                return self._fused_block(x)
            if self.folded:
                return self._folded_block(x)
        residual = x
        n = x.shape[0]
        kk = min(max(int(n * self.stats_fraction),
                     self.min_stats_samples), n)
        shadow_ok = self.bn_train and self.bnact is None and kk < n
        shadow = self.shadow_bn3 and shadow_ok
        sh12 = self.shadow_bn12 and shadow_ok

        conv1 = self._conv(self.features, (1, 1), (1, 1), "SAME", "conv1")
        y = conv1(x)
        if self.bnact is not None:
            y = self.bnact(mode="relu", name="bn1")(y)
        else:
            y = self.norm(name="bn1")(
                y, x_subset=conv1(x[:kk]) if sh12 else None)
            y = self._relu(y)
        if (self.winograd_conv2 and self.stride == 1
                and self.features % 128 == 0
                and self.dtype == jnp.bfloat16):
            conv2 = WinogradConv3x3(self.features, dtype=self.dtype,
                                    interpret=self.winograd_interpret,
                                    name="conv2")
        elif (self.conv64_pallas and self.stride == 1
                and self.features == 64
                and self.dtype == jnp.bfloat16):
            conv2 = PallasConv3x3C64(dtype=self.dtype,
                                     interpret=self.conv64_interpret,
                                     name="conv2")
        else:
            conv2 = self._conv(self.features, (3, 3),
                               (self.stride, self.stride),
                               [(1, 1), (1, 1)], "conv2")
        y2_in = y
        y = conv2(y2_in)
        if self.bnact is not None:
            y = self.bnact(mode="relu", name="bn2")(y)
        else:
            y = self.norm(name="bn2")(
                y, x_subset=conv2(y2_in[:kk]) if sh12 else None)
            y = self._relu(y)
        conv3 = self._conv(self.features * self.expansion, (1, 1),
                           (1, 1), "SAME", "conv3")
        y_in = y
        y = conv3(y_in)
        y3k = conv3(y_in[:kk]) if shadow else None

        if residual.shape[-1] != self.features * self.expansion \
                or self.stride != 1:
            ds_conv = self._conv(
                self.features * self.expansion, (1, 1),
                (self.stride, self.stride), "SAME", "downsample_conv")
            res_in = residual
            residual = ds_conv(res_in)
            if self.bnact is not None:
                residual = self.bnact(mode="none",
                                      name="downsample_bn")(residual)
            elif shadow:
                residual = self.norm(name="downsample_bn")(
                    residual, x_subset=ds_conv(res_in[:kk]))
            else:
                residual = self.norm(name="downsample_bn")(residual)

        if self.bnact is not None:
            return self.bnact(mode="add_relu", name="bn3")(y, residual)
        y = self.norm(name="bn3")(y, x_subset=y3k) if shadow \
            else self.norm(name="bn3")(y)
        return self._relu(y + residual)

    def _fused_block(self, x):
        """Identity-block path: two-pass subset statistics + fused Pallas
        apply. Pass A runs the (cheap) block forward on exactly the rows
        SubsetBatchNorm would slice — per-sample ops commute with row
        slicing, so statistics semantics are unchanged and gradients flow
        through them via the folded affines."""
        from simclr_tpu.ops.pallas.bottleneck import (
            fused_bottleneck, pick_tile)

        c = self.features
        f = c * self.expansion
        dn = ("NHWC", "HWIO", "NHWC")
        w1 = _ConvKernel((1, 1, f, c), name="conv1")()
        w2 = _ConvKernel((3, 3, c, c), name="conv2")()
        w3 = _ConvKernel((1, 1, c, f), name="conv3")()
        bn1 = self.fold_norm(feats=c, name="bn1")
        bn2 = self.fold_norm(feats=c, name="bn2")
        bn3 = self.fold_norm(feats=f, name="bn3")

        x = x.astype(self.dtype)
        n = x.shape[0]

        def conv(inp, w, pad):
            return jax.lax.conv_general_dilated(
                inp, w.astype(self.dtype), (1, 1), pad,
                dimension_numbers=dn)

        if bn1.use_running_average:
            a1f, b1f = bn1(None)
            a2f, b2f = bn2(None)
            a3f, b3f = bn3(None)
        else:
            k = min(max(int(n * self.stats_fraction),
                        self.min_stats_samples), n)
            xs = x[:k]
            y1s = conv(xs, w1, "VALID")
            a1f, b1f = bn1(y1s)
            a1s = jnp.maximum(
                y1s.astype(jnp.float32) * a1f + b1f, 0.0).astype(self.dtype)
            y2s = conv(a1s, w2, [(1, 1), (1, 1)])
            a2f, b2f = bn2(y2s)
            a2s = jnp.maximum(
                y2s.astype(jnp.float32) * a2f + b2f, 0.0).astype(self.dtype)
            y3s = conv(a2s, w3, "VALID")
            a3f, b3f = bn3(y3s)

        tile = pick_tile(n, x.shape[1], x.shape[2], c)
        if (self.is_initializing() or tile is None
                or self.dtype != jnp.bfloat16):
            # Plain-ops fallback (model init traces on tiny batches; shapes
            # the kernel cannot tile; non-bf16 compute dtypes — the Pallas
            # kernel computes in bf16 and would silently downgrade an f32
            # parity configuration). Same math as the kernel.
            y1 = conv(x, w1, "VALID")
            a1 = jnp.maximum(
                y1.astype(jnp.float32) * a1f + b1f, 0.0).astype(self.dtype)
            y2 = conv(a1, w2, [(1, 1), (1, 1)])
            a2 = jnp.maximum(
                y2.astype(jnp.float32) * a2f + b2f, 0.0).astype(self.dtype)
            y3 = conv(a2, w3, "VALID")
            out = (y3.astype(jnp.float32) * a3f + b3f
                   + x.astype(jnp.float32))
            return jnp.maximum(out, 0.0).astype(self.dtype)
        return fused_bottleneck(
            x, w1, w2, w3, (a1f, b1f, a2f, b2f, a3f, b3f),
            tile=tile, interpret=self.fused_interpret)

    def _folded_block(self, x):
        """Identity block built on `ops/foldconv.conv_subset_bn`: each
        conv+BN pair trains with the BN-scale gradient recovered from the
        conv WEIGHT gradient (sum(g*y) per channel == sum(w * wgrad(x, g))
        — see foldconv.py), eliminating the activation-sized dgamma
        reductions that dominate BN backward at CIFAR batch sizes.
        Forward statistics semantics are exactly SubsetBatchNorm's;
        parameter and batch_stats trees are unchanged, so checkpoints
        interchange with every other block configuration."""
        from simclr_tpu.models.norm import BNScaleBias
        from simclr_tpu.ops.foldconv import conv_subset_bn

        c = self.features
        f = c * self.expansion
        eps = 1e-5
        w1 = _ConvKernel((1, 1, f, c), name="conv1")()
        w2 = _ConvKernel((3, 3, c, c), name="conv2")()
        w3 = _ConvKernel((1, 1, c, f), name="conv3")()
        bn1 = BNScaleBias(feats=c, name="bn1")
        bn2 = BNScaleBias(feats=c, name="bn2")
        bn3 = BNScaleBias(feats=f, name="bn3")

        x = x.astype(self.dtype)
        n = x.shape[0]
        p0 = ((0, 0), (0, 0))
        p1 = ((1, 1), (1, 1))

        if not self.bn_train:
            # Eval: fold the running statistics, plain XLA convs.
            def fold_eval(inp, w, bn, pad):
                scale, bias, rm, rv = bn()
                a = scale * jax.lax.rsqrt(rv + eps)
                y = jax.lax.conv_general_dilated(
                    inp, w.astype(self.dtype), (1, 1), pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y.astype(jnp.float32) * a + (bias - rm * a)

            a1 = jnp.maximum(fold_eval(x, w1, bn1, p0),
                             0.0).astype(self.dtype)
            a2 = jnp.maximum(fold_eval(a1, w2, bn2, p1),
                             0.0).astype(self.dtype)
            pre = fold_eval(a2, w3, bn3, p0) + x.astype(jnp.float32)
            return jnp.maximum(pre, 0.0).astype(self.dtype)

        k = min(max(int(n * self.stats_fraction),
                    self.min_stats_samples), n)

        def step(inp, w, bn, pad):
            scale, bias, rm, _ = bn()
            out, mean, var = conv_subset_bn(pad, k, eps, inp, w,
                                            scale, bias, rm)
            bn(mean, var, k * out.shape[1] * out.shape[2])
            return out

        a1 = jnp.maximum(step(x, w1, bn1, p0), 0.0)
        a2 = jnp.maximum(step(a1, w2, bn2, p1), 0.0)
        y3 = step(a2, w3, bn3, p0)
        return jnp.maximum(y3 + x, 0.0)


class ResNetEncoder(nn.Module):
    """ResNet-50 trunk producing pooled 2048-d features.

    Set ``mc_dropout=True`` for the MC-dropout variant
    (reference: models/resnets.py:116-152): dropout after the stem and after
    every stage, active regardless of train/eval — the caller must always
    provide a 'dropout' PRNG stream when ``mc_dropout`` is on.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    low_quality_img: bool = True
    mc_dropout: bool = False
    drop_prob: float = 0.3
    dtype: Any = jnp.bfloat16
    # BN application dtype (statistics always accumulate in float32);
    # bfloat16 keeps the scale/shift fusable into conv epilogues.
    bn_dtype: Any = jnp.bfloat16
    # Fraction of the batch used for BN statistics (see models/norm.py).
    bn_stats_fraction: float = 0.25
    # Axis name for cross-replica BN stat syncing under shard_map; None means
    # stats over whatever batch this trace sees (global batch under pjit).
    bn_axis_name: Optional[str] = None
    # Bandwidth-shaped BN backward (ops/subset_bn.py custom VJP).
    bn_fused_vjp: bool = False
    # BN backward semantics: 'exact' | 'subset_st' (models/norm.py).
    bn_grad_mode: str = "exact"
    # subset_st surrogate form: 'affine' | 'pad' (models/norm.py).
    bn_st_surrogate: str = "affine"
    # Run stride-1 identity bottlenecks as fused Pallas kernels
    # (ops/pallas/bottleneck.py). Single-chip TPU only — under a mesh the
    # compiler must partition the convs. Checkpoint-compatible either way.
    fuse_identity_blocks: bool = False
    # Only fuse blocks with bottleneck width >= this (layer1 C=64 tiles
    # poorly on the 128-lane MXU; layer3/4 C>=256 is where fusion pays).
    fuse_min_width: int = 0
    fused_interpret: bool = False  # interpret-mode kernels (CPU tests)
    # Weight-folded identity blocks (XLA-only; see Bottleneck._folded_block).
    fold_bn_scales: bool = False
    # Fused BN(+add)+ReLU with the single-pass Pallas backward
    # (models/norm.SubsetBNAct). Single-chip path: requires
    # bn_axis_name=None.
    bn_relu_fused: bool = False
    bn_relu_impl: str = "pallas"
    # optimization_barrier after each ReLU (fusion-rooting experiment).
    relu_barrier: bool = False
    # Shadow bn3/downsample statistics (see Bottleneck.shadow_bn3):
    # stats-independent epilogues for the block-output BNs. Applies to
    # the plain (unfused) path only.
    bn3_shadow_stats: bool = False
    # Extend shadow statistics to bn1/bn2 and the stem BN (every
    # remaining conv->BN pair), so NO BN apply depends on a reduction of
    # its producing conv's full output.
    bn12_shadow_stats: bool = False
    # Stage-gated variant: apply bn1/bn2 shadow statistics only in these
    # 0-based stages. Motivation (round 5): with the affine surrogate,
    # ONE bn-apply+relu per layer1 block still materializes as a
    # standalone loop fusion (1.34 ms/step at batch 1024 — the 3x3
    # conv2 declines the chain as an input fusion on layer1's
    # batch-on-lanes layout, and the apply's dependence on its producing
    # conv's stats reduction blocks the epilogue route). Shadowing
    # layer1's bn1/bn2 makes the apply stats-independent so it can ride
    # conv1/conv2's output epilogues; the k-row shadow recomputes cost
    # ~6% of layer1 conv1+conv2 flops. The all-stages bool above
    # measured SLOWER (9.02 vs 9.58, round 3) because stages 2-4 get
    # pure shadow-conv cost with nothing deletable.
    bn12_shadow_stages: Tuple[int, ...] = ()
    # ReLU backward mask from the OUTPUT (relu_vjp_from_output): the
    # backward relu masks read the materialized block activations
    # instead of keeping/recomputing the fused pre-activations.
    relu_from_output: bool = False
    # Fused Winograd Pallas kernel for stride-1 identity-block conv2
    # (ops/pallas/winograd.py; active only for bf16 + width % 128 == 0,
    # i.e. layers 2-4 — layer1's width-64 conv2 keeps the XLA conv).
    winograd_conv2: bool = False
    winograd_interpret: bool = False
    # Batch-on-lanes Pallas kernel for the width-64 stride-1 conv2s
    # (layer1; ops/pallas/conv64.py — K=192 merged-tap contraction).
    conv64_pallas: bool = False
    conv64_interpret: bool = False
    # Subset weight gradients for every trunk conv (ops/subset_wgrad.py):
    # dw from a centered ceil(fraction*N)-row slice scaled N/k, dx exact.
    # 1.0 = plain convs (no custom VJP anywhere).
    conv_wgrad_fraction: float = 1.0
    conv_wgrad_min_rows: int = 64
    # Stages (0-based) whose bottleneck blocks run under jax.checkpoint
    # (nn.remat): the forward saves only block boundaries and the backward
    # recomputes the intra-block activations, trading HBM writes+reads of
    # the relu1/relu2 intermediates for recompute FLOPs. A candidate for
    # the bandwidth-bound 32x32 layer1 only; identical math.
    remat_stages: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch-parity momentum/eps (torch momentum 0.1 == flax momentum
        # 0.9) — reference BN defaults via torchvision. Statistics are
        # accumulated in float32 regardless of bn_dtype.
        norm = lambda **kw: SubsetBatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
            stats_fraction=self.bn_stats_fraction,
            axis_name=self.bn_axis_name,
            fused_vjp=self.bn_fused_vjp,
            grad_mode=self.bn_grad_mode,
            st_surrogate=self.bn_st_surrogate, **kw)

        x = x.astype(self.dtype)

        def _stem(ksize, strides, padding):
            if self.conv_wgrad_fraction >= 1.0 or not train:
                return nn.Conv(self.width, ksize, strides=strides,
                               padding=padding, use_bias=False,
                               kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="stem_conv")
            from simclr_tpu.ops.subset_wgrad import SubsetWgradConv
            return SubsetWgradConv(self.width, ksize, strides=strides,
                                   padding=padding, dtype=self.dtype,
                                   kernel_init=conv_kernel_init,
                                   wgrad_fraction=self.conv_wgrad_fraction,
                                   min_rows=self.conv_wgrad_min_rows,
                                   name="stem_conv")

        if self.low_quality_img:
            # CIFAR stem (reference: models/resnets.py:16-19).
            stem_conv = _stem((3, 3), (1, 1), [(1, 1), (1, 1)])
        else:
            stem_conv = _stem((7, 7), (2, 2), [(3, 3), (3, 3)])
        stem_in = x
        x = stem_conv(stem_in)
        n = x.shape[0]
        kk = min(max(int(n * self.bn_stats_fraction), 64), n)
        shadow_stem = (self.bn12_shadow_stats and train and kk < n
                       and not self.fold_bn_scales
                       and not self.bn_fused_vjp
                       and not self.bn_relu_fused)
        x = norm(name="stem_bn")(
            x, x_subset=stem_conv(stem_in[:kk]) if shadow_stem else None)
        x = (relu_vjp_from_output if self.relu_from_output
             else nn.relu)(x)
        x = self._maybe_dropout(x)
        if not self.low_quality_img:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        fold = lambda **kw: FoldedBatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5, **kw)
        bnact = None
        if self.bn_relu_fused and self.bn_axis_name is None \
                and not self.fuse_identity_blocks \
                and not self.fold_bn_scales:
            from simclr_tpu.models.norm import SubsetBNAct
            bnact = lambda **kw: SubsetBNAct(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.bn_dtype,
                stats_fraction=self.bn_stats_fraction,
                interpret=self.fused_interpret,
                impl=self.bn_relu_impl, **kw)
        for stage, n_blocks in enumerate(self.stage_sizes):
            # prevent_cse=False: the blocks run inside the epoch lax.scan,
            # where XLA cannot CSE across the remat boundary anyway.
            block_cls = (nn.remat(Bottleneck, prevent_cse=False)
                         if stage in self.remat_stages else Bottleneck)
            for block in range(n_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                width = self.width * 2 ** stage
                x = block_cls(width, stride=stride,
                               norm=norm, dtype=self.dtype,
                               fused=(self.fuse_identity_blocks
                                      and width >= self.fuse_min_width),
                               folded=self.fold_bn_scales,
                               bn_train=train,
                               fold_norm=fold,
                               fused_interpret=self.fused_interpret,
                               stats_fraction=self.bn_stats_fraction,
                               bnact=bnact,
                               relu_barrier=self.relu_barrier,
                               shadow_bn3=(self.bn3_shadow_stats
                                           and not self.fold_bn_scales
                                           and not self.bn_fused_vjp),
                               shadow_bn12=((self.bn12_shadow_stats
                                             or stage
                                             in self.bn12_shadow_stages)
                                            and not self.fold_bn_scales
                                            and not self.bn_fused_vjp),
                               relu_from_output=self.relu_from_output,
                               winograd_conv2=self.winograd_conv2,
                               winograd_interpret=self.winograd_interpret,
                               conv64_pallas=self.conv64_pallas,
                               conv64_interpret=self.conv64_interpret,
                               wgrad_fraction=(self.conv_wgrad_fraction
                                               if train else 1.0),
                               wgrad_min_rows=self.conv_wgrad_min_rows,
                               name=f"layer{stage + 1}_{block}")(x)
            x = self._maybe_dropout(x)

        x = jnp.mean(x, axis=(1, 2))  # Global average pool -> (N, 2048).
        return x.astype(jnp.float32)

    def _maybe_dropout(self, x):
        if not self.mc_dropout:
            return x
        # deterministic=False unconditionally: MC dropout stays stochastic at
        # eval (reference: models/resnets.py:113).
        return nn.Dropout(rate=self.drop_prob, deterministic=False)(x)


class SupervisedResNet(nn.Module):
    """ResNet-50 classifier: trunk + fc head
    (reference: models/resnets.py:54-89)."""

    num_classes: int = 10
    low_quality_img: bool = True
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.bfloat16
    bn_stats_fraction: float = 0.25
    bn_axis_name: Optional[str] = None
    bn_fused_vjp: bool = False
    bn_grad_mode: str = "exact"
    bn_st_surrogate: str = "affine"

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ResNetEncoder(stage_sizes=self.stage_sizes, width=self.width,
                          low_quality_img=self.low_quality_img,
                          dtype=self.dtype, bn_dtype=self.bn_dtype,
                          bn_stats_fraction=self.bn_stats_fraction,
                          bn_axis_name=self.bn_axis_name,
                          bn_fused_vjp=self.bn_fused_vjp,
                          bn_grad_mode=self.bn_grad_mode,
                          bn_st_surrogate=self.bn_st_surrogate,
                          name="encoder")(x, train=train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(h)
