"""Tests for the fused on-device augmentation stack.

Oracles: PIL (the backend of the reference's torchvision pipeline,
reference: data.py:100-147) for crop-resize, stdlib colorsys for HSV math,
and direct numpy formulas for blur/grayscale/normalize. Distributional
properties (factor ranges, apply probabilities) are checked statistically.
"""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from simclr_tpu.config import CIFAR10, STL10, AugmentConfig
from simclr_tpu.ops import augment as A


def rand_img(rng, n=4, h=32, w=32):
    return rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------------------
# Crop / resize / flip.
# ---------------------------------------------------------------------------

class TestCropResize:
    def test_identity_box_is_identity(self):
        rng = np.random.RandomState(0)
        img = A.to_float(jnp.asarray(rand_img(rng)))
        n = img.shape[0]
        boxes = (jnp.zeros(n), jnp.zeros(n),
                 jnp.full(n, 32.0), jnp.full(n, 32.0))
        out = A.crop_resize_flip(img, boxes, (32, 32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)

    def test_flip_of_identity_box(self):
        rng = np.random.RandomState(1)
        img = A.to_float(jnp.asarray(rand_img(rng)))
        n = img.shape[0]
        boxes = (jnp.zeros(n), jnp.zeros(n),
                 jnp.full(n, 32.0), jnp.full(n, 32.0))
        out = A.crop_resize_flip(
            img, boxes, (32, 32), flip_mask=jnp.ones(n, bool))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img)[:, :, ::-1, :], atol=1e-5)

    def test_matches_pil_box_resize(self):
        """Our matmul resampler vs PIL's antialiased box-resize — the exact
        operation torchvision's RandomResizedCrop performs on PIL images."""
        rng = np.random.RandomState(2)
        raw = rand_img(rng, n=1, h=64, w=64)[0]
        top, left, h, w = 7.0, 11.0, 40.0, 33.0
        pil = Image.fromarray(raw).resize(
            (32, 32), Image.BILINEAR, box=(left, top, left + w, top + h))
        oracle = np.asarray(pil).astype(np.float32) / 255.0

        img = A.to_float(jnp.asarray(raw[None]))
        boxes = (jnp.array([top]), jnp.array([left]),
                 jnp.array([h]), jnp.array([w]))
        ours = np.asarray(A.crop_resize_flip(img, boxes, (32, 32)))[0]
        # PIL output is uint8-quantized; allow ~1.5/255 plus small filter
        # phase differences.
        assert np.mean(np.abs(ours - oracle)) < 0.01
        assert np.max(np.abs(ours - oracle)) < 0.06

    def test_upscale_matches_pil_bilinear(self):
        rng = np.random.RandomState(3)
        raw = rand_img(rng, n=1, h=32, w=32)[0]
        top, left, h, w = 4.0, 9.0, 12.0, 15.0
        pil = Image.fromarray(raw).resize(
            (32, 32), Image.BILINEAR, box=(left, top, left + w, top + h))
        oracle = np.asarray(pil).astype(np.float32) / 255.0
        img = A.to_float(jnp.asarray(raw[None]))
        boxes = (jnp.array([top]), jnp.array([left]),
                 jnp.array([h]), jnp.array([w]))
        ours = np.asarray(A.crop_resize_flip(img, boxes, (32, 32)))[0]
        assert np.mean(np.abs(ours - oracle)) < 0.01

    def test_box_distribution(self):
        key = jax.random.key(0)
        top, left, h, w = A.sample_crop_boxes(
            key, 20000, 32, 32, (0.08, 1.0), (0.75, 4.0 / 3.0))
        area_frac = np.asarray(h * w) / (32 * 32)
        # Clamping pushes a little mass above raw U(0.08,1) mean of 0.54.
        assert 0.5 < area_frac.mean() < 0.62
        assert area_frac.min() >= 0.08 - 1e-3
        assert np.all(np.asarray(top) >= 0)
        assert np.all(np.asarray(top) + np.asarray(h) <= 32 + 1e-4)

    def test_center_crop(self):
        rng = np.random.RandomState(4)
        img = jnp.asarray(rand_img(rng, h=40, w=40))
        out = A.center_crop(img, (32, 32))
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(img)[:, 4:36, 4:36, :])


class TestTranslate:
    def test_integer_shift_with_zero_fill(self):
        rng = np.random.RandomState(5)
        img = A.to_float(jnp.asarray(rand_img(rng, n=1)))
        # Force a known shift by driving the key search: instead test via
        # private pieces — build the shift matrices directly.
        shifted = A.random_translate(jax.random.key(3), img, (0.3, 0.3))
        assert shifted.shape == img.shape
        # Zero-fill must introduce exact zeros somewhere on the border for a
        # nonzero shift (probability of zero shift is tiny).
        assert (np.asarray(shifted) == 0).any()

    def test_zero_translate_identity(self):
        rng = np.random.RandomState(6)
        img = A.to_float(jnp.asarray(rand_img(rng, n=2)))
        out = A.random_translate(jax.random.key(0), img, (0.0, 0.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# Colour ops.
# ---------------------------------------------------------------------------

class TestColor:
    def test_grayscale_weights(self):
        img = jnp.asarray(
            np.array([[[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]]]))
        g = np.asarray(A.rgb_to_grayscale(img))
        np.testing.assert_allclose(
            g[0, 0, :, 0], [0.299, 0.587, 0.114], rtol=1e-6)

    def test_hsv_roundtrip_vs_colorsys(self):
        rng = np.random.RandomState(7)
        rgb = rng.rand(50, 3).astype(np.float32)
        ours_hsv = np.asarray(A.rgb_to_hsv(jnp.asarray(rgb[None, None])))
        for i in range(50):
            h, s, v = colorsys.rgb_to_hsv(*rgb[i])
            np.testing.assert_allclose(
                ours_hsv[0, 0, i], [h, s, v], atol=1e-5)
        back = np.asarray(A.hsv_to_rgb(jnp.asarray(ours_hsv)))
        np.testing.assert_allclose(back[0, 0], rgb, atol=1e-5)

    def test_hue_shift_full_cycle_identity(self):
        rng = np.random.RandomState(8)
        img = A.to_float(jnp.asarray(rand_img(rng)))
        out = A.adjust_hue(img, jnp.full((4,), 1.0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-4)

    def test_brightness_contrast_saturation_formulas(self):
        rng = np.random.RandomState(9)
        img = A.to_float(jnp.asarray(rand_img(rng, n=2)))
        f = jnp.array([0.5, 1.3])
        bright = np.asarray(A.adjust_brightness(img, f))
        np.testing.assert_allclose(
            bright,
            np.clip(np.asarray(img) * np.array([0.5, 1.3])[:, None, None,
                                                           None], 0, 1),
            rtol=1e-6)
        x = np.asarray(img)
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        sat = np.asarray(A.adjust_saturation(img, f))
        np.testing.assert_allclose(
            sat,
            np.clip(np.array([0.5, 1.3])[:, None, None, None] * x
                    + (1 - np.array([0.5, 1.3])[:, None, None, None]) * gray,
                    0, 1),
            atol=1e-6)
        mean = gray.mean(axis=(1, 2, 3), keepdims=True)
        con = np.asarray(A.adjust_contrast(img, f))
        np.testing.assert_allclose(
            con,
            np.clip(np.array([0.5, 1.3])[:, None, None, None] * x
                    + (1 - np.array([0.5, 1.3])[:, None, None, None]) * mean,
                    0, 1),
            atol=1e-6)

    def test_color_jitter_respects_apply_prob(self):
        rng = np.random.RandomState(10)
        img = A.to_float(jnp.asarray(rand_img(rng, n=256)))
        out = A.color_jitter(jax.random.key(1), img, 0.5, apply_prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   atol=1e-5)
        out2 = A.color_jitter(jax.random.key(1), img, 0.5, apply_prob=1.0)
        changed = np.abs(np.asarray(out2) - np.asarray(img)).max(
            axis=(1, 2, 3))
        assert (changed > 1e-4).mean() > 0.95

    def test_random_grayscale_probability(self):
        rng = np.random.RandomState(11)
        img = A.to_float(jnp.asarray(rand_img(rng, n=2000)))
        out = A.random_grayscale(jax.random.key(2), img, p=0.2)
        x = np.asarray(out)
        is_gray = np.all(np.abs(x[..., 0] - x[..., 1]) < 1e-6,
                         axis=(1, 2))
        assert 0.15 < is_gray.mean() < 0.25


# ---------------------------------------------------------------------------
# Blur.
# ---------------------------------------------------------------------------

class TestBlur:
    def test_kernel_sizes(self):
        assert A.gaussian_kernel_size(32) == 3   # CIFAR (data.py:119)
        assert A.gaussian_kernel_size(96) == 9   # STL
        assert A.gaussian_kernel_size(10) == 1

    def test_constant_image_invariant(self):
        img = jnp.full((2, 32, 32, 3), 0.5)
        out = A.gaussian_blur(jax.random.key(0), img, 3)
        np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)

    def test_matches_numpy_oracle(self):
        """Fixed sigma: compare against a direct separable conv with
        torchvision's kernel formula and reflect padding."""
        rng = np.random.RandomState(12)
        raw = rng.rand(1, 16, 16, 3).astype(np.float32)

        # Find the sigma our PRNG draws, then replicate in numpy.
        sigma = float(jax.random.uniform(
            jax.random.key(5), (1,), minval=0.1, maxval=2.0)[0])
        off = np.arange(-1, 2, dtype=np.float32)
        w = np.exp(-off ** 2 / (2 * sigma ** 2))
        w /= w.sum()
        x = np.pad(raw, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        vert = sum(w[i] * x[:, i:i + 16, 1:17, :] for i in range(3))
        x2 = np.pad(vert, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        oracle = sum(w[i] * x2[:, 1:17, i:i + 16, :] for i in range(3))

        ours = np.asarray(
            A.gaussian_blur(jax.random.key(5), jnp.asarray(raw), 3))
        np.testing.assert_allclose(ours, oracle, atol=1e-5)


# ---------------------------------------------------------------------------
# Composed pipelines.
# ---------------------------------------------------------------------------

class TestPipelines:
    def test_train_pair_shapes_and_independence(self):
        rng = np.random.RandomState(13)
        img = jnp.asarray(rand_img(rng, n=8))
        v1, v2 = A.augment_train_pair(
            jax.random.key(0), img, AugmentConfig(), CIFAR10)
        assert v1.shape == (8, 32, 32, 3) and v2.shape == (8, 32, 32, 3)
        assert v1.dtype == jnp.float32
        # The two views must differ (independent augmentation draws).
        assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 0.1

    def test_deterministic_given_key(self):
        rng = np.random.RandomState(14)
        img = jnp.asarray(rand_img(rng, n=4))
        a = A.augment_train(jax.random.key(7), img, AugmentConfig(), CIFAR10)
        b = A.augment_train(jax.random.key(7), img, AugmentConfig(), CIFAR10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_test_transform_is_plain_normalize(self):
        rng = np.random.RandomState(15)
        raw = rand_img(rng, n=2)
        out = np.asarray(A.augment_test(jnp.asarray(raw), CIFAR10))
        oracle = (raw.astype(np.float32) / 255.0
                  - np.array(CIFAR10.mean)) / np.array(CIFAR10.std)
        np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-6)

    def test_stl_pipeline_runs(self):
        rng = np.random.RandomState(16)
        img = jnp.asarray(rand_img(rng, n=2, h=96, w=96))
        v = A.augment_train(jax.random.key(0), img, AugmentConfig(), STL10)
        assert v.shape == (2, 96, 96, 3)

    def test_supervised_pipeline_runs(self):
        rng = np.random.RandomState(17)
        img = jnp.asarray(rand_img(rng, n=4))
        v = A.augment_supervised(jax.random.key(0), img, CIFAR10)
        assert v.shape == (4, 32, 32, 3)

    def test_fine_tune_pipeline_runs(self):
        rng = np.random.RandomState(18)
        img = jnp.asarray(rand_img(rng, n=4))
        v = A.augment_fine_tune(
            jax.random.key(0), img, AugmentConfig(), CIFAR10)
        assert v.shape == (4, 32, 32, 3)

    def test_jit_compiles_once(self):
        rng = np.random.RandomState(19)
        img = jnp.asarray(rand_img(rng, n=4))
        fn = jax.jit(lambda k, x: A.augment_train_pair(
            k, x, AugmentConfig(), CIFAR10))
        v1, v2 = fn(jax.random.key(0), img)
        v1b, _ = fn(jax.random.key(1), img)
        assert v1.shape == v1b.shape
