"""Fused colour-distortion kernel vs the XLA ops, given identical
per-sample factors and schedules (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import CIFAR10, AugmentConfig
from simclr_tpu.ops import augment as A
from simclr_tpu.ops.pallas.color import (
    color_distort_pallas,
    sample_color_params,
)


def xla_reference(images, factors, schedule, ds):
    """Apply the same op schedule with ops.augment building blocks."""
    x = images
    fb, fc, fs, fh, grayf = (factors[:, i] for i in range(5))
    for step in range(4):
        op = schedule[:, step]
        cand = jnp.stack(
            [
                A.adjust_brightness(x, fb),
                A.adjust_contrast(x, fc),
                A.adjust_saturation(x, fs),
                A.adjust_hue(x, fh),
            ],
            axis=0,
        )
        x = jnp.take_along_axis(
            cand, op[None, :, None, None, None], axis=0)[0]
    gray = A.rgb_to_grayscale(x)
    x = jnp.where(grayf[:, None, None, None] > 0.5, gray, x)
    return A.normalize(x, ds.mean, ds.std)


class TestColorKernel:
    def test_matches_xla_given_same_params(self):
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
        aug = AugmentConfig()
        factors, schedule = sample_color_params(
            jax.random.key(3), 8, aug.color_distort_strength,
            aug.color_jitter_prob, aug.color_drop_prob)

        # Run the kernel with exactly these params by monkeypatching the
        # sampler through the same key (deterministic).
        ours = color_distort_pallas(
            jax.random.key(3), imgs, aug, CIFAR10, interpret=True)
        oracle = xla_reference(imgs, factors, schedule, CIFAR10)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                                   rtol=1e-4, atol=1e-4)

    def test_identity_when_no_jitter_no_gray(self):
        rng = np.random.RandomState(1)
        imgs = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
        aug = AugmentConfig(color_jitter_prob=0.0, color_drop_prob=0.0)
        out = color_distort_pallas(
            jax.random.key(0), imgs, aug, CIFAR10, interpret=True)
        oracle = A.normalize(imgs, CIFAR10.mean, CIFAR10.std)
        np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                                   rtol=1e-4, atol=1e-5)

    def test_all_gray_when_forced(self):
        rng = np.random.RandomState(2)
        imgs = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
        aug = AugmentConfig(color_jitter_prob=0.0, color_drop_prob=1.0)
        out = color_distort_pallas(
            jax.random.key(0), imgs, aug, CIFAR10, interpret=True)
        # Denormalize and check channels equal.
        x = np.asarray(out) * np.array(CIFAR10.std) + np.array(CIFAR10.mean)
        np.testing.assert_allclose(x[..., 0], x[..., 1], atol=1e-5)
        np.testing.assert_allclose(x[..., 1], x[..., 2], atol=1e-5)
