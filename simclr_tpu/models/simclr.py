"""SimCLR model: encoder f + projection head g, and the fine-tune variant.

TPU-native counterparts of reference models/simclr.py:6-46 (SimCLRMain) and
models/ssl.py:6-35 (SimCLRFineTune). ``forward(x) -> (h, z)`` parity: h is the
2048-d pooled encoder feature, z the 128-d projection.

Projection head parity (reference: models/simclr.py:27-41):
  for i in range(num_proj_layers - 1):
      Dense(2048 -> 2048, bias) -> BatchNorm1d -> ReLU [-> Dropout if mc]
  Dense(2048 -> 128, NO bias) -> BatchNorm1d

The fine-tune model (reference: models/ssl.py:29-35) keeps the projection head
parameters (so pretrain checkpoints restore cleanly) but its forward only uses
encoder + supervised head, exactly like the reference forward at ssl.py:32-35.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from simclr_tpu.config import ModelConfig
from simclr_tpu.models.norm import SubsetBatchNorm
from simclr_tpu.models.resnet import ResNetEncoder


def _make_encoder(cfg: ModelConfig, bn_axis_name: Optional[str], name: str):
    if cfg.encoder not in ("no_dropout", "dropout"):
        # reference: models/simclr.py:19-25 raises NotImplementedError.
        raise NotImplementedError(f"unknown encoder_model {cfg.encoder!r}")
    return ResNetEncoder(
        stage_sizes=cfg.stage_sizes,
        width=cfg.width,
        low_quality_img=cfg.low_quality_img,
        mc_dropout=cfg.encoder == "dropout",
        drop_prob=cfg.drop_prob,
        dtype=jnp.dtype(cfg.compute_dtype),
        bn_dtype=jnp.dtype(cfg.bn_dtype),
        bn_stats_fraction=cfg.bn_stats_fraction,
        bn_axis_name=bn_axis_name,
        bn_fused_vjp=bool(cfg.bn_fused_vjp),
        bn_grad_mode=cfg.bn_grad_mode,
        bn_st_surrogate=cfg.bn_st_surrogate,
        fuse_identity_blocks=bool(cfg.fuse_identity_blocks),
        fuse_min_width=cfg.fuse_min_width,
        fused_interpret=cfg.fuse_interpret,
        fold_bn_scales=bool(cfg.fold_bn_scales),
        bn_relu_fused=bool(cfg.bn_relu_fused),
        bn_relu_impl=cfg.bn_relu_impl,
        relu_barrier=cfg.relu_barrier,
        bn3_shadow_stats=cfg.bn3_shadow_stats,
        bn12_shadow_stats=cfg.bn12_shadow_stats,
        bn12_shadow_stages=tuple(cfg.bn12_shadow_stages),
        relu_from_output=cfg.relu_from_output,
        conv_wgrad_fraction=cfg.conv_wgrad_fraction,
        conv_wgrad_min_rows=cfg.conv_wgrad_min_rows,
        winograd_conv2=(cfg.winograd_conv2
                        and (cfg.winograd_interpret
                             or jax.default_backend() == "tpu")),
        winograd_interpret=cfg.winograd_interpret,
        conv64_pallas=(cfg.conv64_pallas
                       and (cfg.conv64_interpret
                            or jax.default_backend() == "tpu")),
        conv64_interpret=cfg.conv64_interpret,
        remat_stages=tuple(cfg.remat_stages),
        name=name,
    )


class ProjectionHead(nn.Module):
    """MLP g(.) (reference: models/simclr.py:27-41)."""

    feature_dim: int = 2048
    output_dim: int = 128
    num_layers: int = 2
    mc_dropout: bool = False
    drop_prob: float = 0.3
    dtype: Any = jnp.bfloat16
    bn_dtype: Any = jnp.bfloat16
    bn_stats_fraction: float = 0.25
    bn_axis_name: Optional[str] = None
    bn_fused_vjp: bool = False
    bn_grad_mode: str = "exact"
    bn_st_surrogate: str = "affine"

    @nn.compact
    def __call__(self, h, train: bool = True):
        norm = lambda **kw: SubsetBatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5, dtype=self.bn_dtype,
            stats_fraction=self.bn_stats_fraction,
            axis_name=self.bn_axis_name,
            fused_vjp=self.bn_fused_vjp,
            grad_mode=self.bn_grad_mode,
            st_surrogate=self.bn_st_surrogate, **kw)
        x = h.astype(self.dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.feature_dim, dtype=self.dtype,
                         name=f"linear{i}")(x)
            x = norm(name=f"bn{i}")(x)
            x = nn.relu(x)
            if self.mc_dropout:
                # reference: models/simclr.py:35-36 adds the always-on Dropout
                # module in the dropout variant.
                x = nn.Dropout(rate=self.drop_prob, deterministic=False)(x)
        x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                     name=f"linear{self.num_layers - 1}")(x)
        x = norm(name=f"bn{self.num_layers - 1}")(x)
        return x.astype(jnp.float32)


class SimCLR(nn.Module):
    """Encoder + projection head; __call__(x) -> (h, z)
    (reference: models/simclr.py:43-46)."""

    cfg: ModelConfig = ModelConfig()
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _make_encoder(self.cfg, self.bn_axis_name, name="f")(
            x, train=train)
        z = ProjectionHead(
            feature_dim=self.cfg.feature_dim,
            output_dim=self.cfg.compressed_dim,
            num_layers=self.cfg.num_proj_layers,
            mc_dropout=self.cfg.encoder == "dropout",
            drop_prob=self.cfg.drop_prob,
            dtype=jnp.dtype(self.cfg.compute_dtype),
            bn_dtype=jnp.dtype(self.cfg.bn_dtype),
            bn_stats_fraction=self.cfg.bn_stats_fraction,
            bn_axis_name=self.bn_axis_name,
            bn_fused_vjp=bool(self.cfg.bn_fused_vjp),
            bn_grad_mode=(self.cfg.head_bn_grad_mode
                          or self.cfg.bn_grad_mode),
            bn_st_surrogate=self.cfg.bn_st_surrogate,
            name="g",
        )(h, train=train)
        return h, z


class SimCLRFineTune(nn.Module):
    """Encoder + linear supervised head (reference: models/ssl.py:6-35).

    The projection head g is instantiated (parameter-tree parity with SimCLR,
    so `load_pretrained` restores every pretrained weight) but unused by the
    forward pass, matching the reference's forward (models/ssl.py:32-35).
    """

    cfg: ModelConfig = ModelConfig()
    num_classes: int = 10
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = _make_encoder(self.cfg, self.bn_axis_name, name="f")(
            x, train=train)
        # Keep g in the param tree; lazily trace it so its params exist.
        _ = ProjectionHead(
            feature_dim=self.cfg.feature_dim,
            output_dim=self.cfg.compressed_dim,
            num_layers=self.cfg.num_proj_layers,
            mc_dropout=self.cfg.encoder == "dropout",
            drop_prob=self.cfg.drop_prob,
            dtype=jnp.dtype(self.cfg.compute_dtype),
            bn_dtype=jnp.dtype(self.cfg.bn_dtype),
            bn_stats_fraction=self.cfg.bn_stats_fraction,
            bn_axis_name=self.bn_axis_name,
            name="g",
        )(jax.lax.stop_gradient(h), train=False)
        score = nn.Dense(self.num_classes, dtype=jnp.float32,
                         name="supervised_head")(h)
        return score
