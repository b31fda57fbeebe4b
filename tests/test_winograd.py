"""Fused Winograd F(2x2,3x3) conv2 kernel vs the lax.conv oracle.

The kernel (ops/pallas/winograd.py) replaces the stride-1 identity-block
conv2 of the bottleneck (reference models/resnets.py 3x3 conv;
our models/resnet.py Bottleneck) with a 2.25x-fewer-FLOPs formulation.
These tests pin, in interpret mode on the CPU mesh:

 * forward values against f32 `lax.conv_general_dilated`,
 * BOTH gradients (dx through the reused forward kernel with the rotated
   filter; dw through the transform-domain accumulation kernel) against
   lax.conv autodiff,
 * the fallback path for unsupported shapes (odd spatial, stride 2,
   non-128-multiple channels) being exact lax.conv,
 * the ResNet integration flag producing the same encoder outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.ops.pallas.winograd import (
    supported, transform_filter, winograd_conv3x3)

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DIMNUMS)


SHAPES = [
    (8, 16, 128, 128),   # layer2 identity-block conv2 (batch-scaled)
    (8, 8, 256, 256),    # layer3
    (4, 4, 512, 512),    # layer4
    (2, 8, 128, 256),    # C != K
]


@pytest.mark.parametrize("n,h,c,k", SHAPES)
def test_forward_matches_lax_conv(n, h, c, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, h, c).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, c, k).astype(np.float32))
    assert supported(x.shape, w.shape, (1, 1))
    y = winograd_conv3x3(x, w, True)
    ref = _direct(x, w)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-2 * scale)


@pytest.mark.parametrize("n,h,c,k", SHAPES[:3])
def test_gradients_match_lax_conv(n, h, c, k):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, h, c).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, c, k).astype(np.float32))
    gy = jnp.asarray(rng.randn(n, h, h, k).astype(np.float32))

    gx_r, gw_r = jax.grad(
        lambda a, b: jnp.vdot(_direct(a, b), gy), (0, 1))(x, w)
    gx_w, gw_w = jax.grad(
        lambda a, b: jnp.vdot(winograd_conv3x3(a, b, True), gy),
        (0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(gx_w), np.asarray(gx_r),
        atol=2e-2 * float(jnp.max(jnp.abs(gx_r))))
    np.testing.assert_allclose(
        np.asarray(gw_w), np.asarray(gw_r),
        atol=2e-2 * float(jnp.max(jnp.abs(gw_r))))


def test_bf16_matches_bf16_direct_conv():
    """In the shipped dtype the kernel's error vs the f32 oracle is the
    same order as the direct bf16 conv's own rounding."""
    rng = np.random.RandomState(2)
    x32 = rng.randn(8, 8, 8, 256).astype(np.float32)
    w32 = (0.1 * rng.randn(3, 3, 256, 256)).astype(np.float32)
    ref = np.asarray(_direct(jnp.asarray(x32), jnp.asarray(w32)))
    xb = jnp.asarray(x32).astype(jnp.bfloat16)
    wb = jnp.asarray(w32).astype(jnp.bfloat16)
    err_direct = np.abs(
        np.asarray(_direct(xb, wb)).astype(np.float32) - ref).max()
    err_wino = np.abs(
        np.asarray(winograd_conv3x3(xb, wb, True)).astype(np.float32)
        - ref).max()
    assert err_wino <= 4.0 * err_direct + 1e-3, (err_wino, err_direct)


@pytest.mark.parametrize("shape,wshape,stride", [
    ((4, 7, 7, 128), (3, 3, 128, 128), (1, 1)),    # odd spatial
    ((4, 8, 8, 96), (3, 3, 96, 96), (1, 1)),       # C % 128 != 0
    ((4, 8, 8, 128), (3, 3, 128, 128), (2, 2)),    # strided
])
def test_unsupported_shapes_fall_back_exactly(shape, wshape, stride):
    assert not supported(shape, wshape, stride)
    if stride != (1, 1):
        return  # wrapper is only ever called with stride 1
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(*wshape).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(winograd_conv3x3(x, w, True)),
        np.asarray(_direct(x, w)))


def test_filter_transform_shape():
    w = jnp.zeros((3, 3, 128, 256))
    assert transform_filter(w).shape == (16, 128, 256)


def test_encoder_flag_parity():
    """winograd_conv2=True must reproduce the default encoder's forward
    within bf16/Winograd tolerance, with an identical parameter tree."""
    from simclr_tpu.config import Config, ModelConfig
    from simclr_tpu.models.simclr import SimCLR

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randint(0, 255, (4, 32, 32, 3)).astype(np.float32)
                    / 255.0)

    outs, trees = [], []
    for wino in (False, True):
        cfg = Config(model=ModelConfig(winograd_conv2=wino,
                                       winograd_interpret=True))
        model = SimCLR(cfg=cfg.model)
        variables = model.init(jax.random.key(0), x, train=False)
        h, z = model.apply(variables, x, train=False)
        outs.append(np.asarray(z, dtype=np.float32))
        trees.append(jax.tree.structure(variables))
    assert trees[0] == trees[1]
    # Per-element atol is meaningless after 16 winograd'd convs compound
    # through bf16 BN; direction and relative magnitude are the contract
    # (measured: cos 0.99998+, relL2 0.5%).
    a, b = outs
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                            * np.linalg.norm(b, axis=1))
    assert cos.min() > 0.999, cos
    assert np.linalg.norm(a - b) / np.linalg.norm(a) < 0.03
