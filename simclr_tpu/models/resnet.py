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

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.models.norm import SubsetBatchNorm

# torchvision initializes conv kernels with kaiming-normal fan_out
# (gain for ReLU), which is variance_scaling(2.0, fan_out, normal).
conv_kernel_init = nn.initializers.variance_scaling(
    2.0, "fan_out", "truncated_normal"
)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with identity shortcut."""

    features: int           # Width of the 1x1/3x3 convs; output is 4x this.
    stride: int = 1
    norm: Callable[..., Any] = nn.BatchNorm
    dtype: Any = jnp.bfloat16

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_kernel_init, dtype=self.dtype,
                name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)

        return nn.relu(y + residual)


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

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch-parity momentum/eps (torch momentum 0.1 == flax momentum
        # 0.9) — reference BN defaults via torchvision. Statistics are
        # accumulated in float32 regardless of bn_dtype.
        norm = lambda **kw: SubsetBatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
            stats_fraction=self.bn_stats_fraction,
            axis_name=self.bn_axis_name, **kw)

        x = x.astype(self.dtype)
        if self.low_quality_img:
            # CIFAR stem (reference: models/resnets.py:16-19).
            x = nn.Conv(self.width, (3, 3), strides=(1, 1),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name="stem_conv")(x)
        else:
            x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = self._maybe_dropout(x)
        if not self.low_quality_img:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(self.width * 2 ** stage, stride=stride,
                               norm=norm, dtype=self.dtype,
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

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = ResNetEncoder(stage_sizes=self.stage_sizes, width=self.width,
                          low_quality_img=self.low_quality_img,
                          dtype=self.dtype, bn_dtype=self.bn_dtype,
                          bn_stats_fraction=self.bn_stats_fraction,
                          bn_axis_name=self.bn_axis_name,
                          name="encoder")(x, train=train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(h)
