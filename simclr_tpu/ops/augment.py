"""Fused on-device SimCLR augmentation stack.

TPU-native replacement for the reference's per-sample PIL pipeline that runs
inside DataLoader worker processes (reference: data.py:100-217 builds the
torchvision stacks; data.py:44-47 applies them twice per image in
CIFAR10pair.__getitem__). Here the whole stack — inception-style random
resized crop, horizontal flip, colour jitter (random per-sample op order),
random grayscale, random-sigma Gaussian blur, normalization — is one jitted
function over a uint8 batch living in HBM. XLA fuses the elementwise chain;
the crop is expressed as two batched matmuls so it runs on the MXU.

Design notes (why this is not a port):

* Random resized crop + flip + resize is implemented as per-sample separable
  interpolation matrices: for output row u with continuous source position
  ys[u], the weight on source row k is the (optionally antialiased) tent
  max(0, 1 - |ys[u] - k| / s). The view is then
  ``Wh @ image @ Ww^T`` per channel — two batched (H_out x H_in) matmuls,
  ZERO gathers, arbitrary per-sample boxes, and the horizontal flip is free
  (reflect the column coordinates). With s = max(box/out, 1) this matches
  PIL's antialiased triangle filter that torchvision's PIL-backed
  RandomResizedCrop uses when downscaling; with s = 1 it is plain bilinear.
* Per-sample randomness is threaded from a single JAX PRNG key; no global
  seeds (reference relies on np.random.seed(42) / torch.manual_seed(0),
  data.py:304, pretrain.py:61).
* torchvision ColorJitter applies brightness/contrast/saturation/hue in a
  fresh random ORDER per call (per sample here). We sample one of the 24
  permutations per sample and run a 4-step select over the four op results —
  cheap VPU work.
* All colour math is float in [0, 1] with clamping after each op, the float
  analogue of torchvision's float-tensor path. Distribution-level parity with
  the PIL uint8 path is validated statistically in tests/test_augment.py.

Parameter parity with the reference stack (data.py:100-147):
  crop scale (0.08, 1.0), ratio (3/4, 4/3); flip p=0.5; jitter p=0.8 with
  (0.8s, 0.8s, 0.8s, 0.2s), s=0.5; grayscale p=0.2; Gaussian blur always
  applied, kernel floor(0.1*img_size) odd-snapped (3 for CIFAR-10, 9 for
  STL-10), sigma ~ U(0.1, 2.0).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import AugmentConfig, DatasetConfig

Array = jax.Array


# ---------------------------------------------------------------------------
# Crop / resize / flip as batched interpolation matmuls.
# ---------------------------------------------------------------------------

def _interp_matrix(
    src_pos: Array,       # (N, OUT) continuous source coordinates
    in_size: int,
    support: Array,       # (N, 1) filter half-width (>= 1)
    zero_outside: bool = False,
) -> Array:
    """Rows of normalized tent-filter weights: (N, OUT, IN)."""
    k = jnp.arange(in_size, dtype=jnp.float32)
    if not zero_outside:
        # Clamp to the valid range => edge-replicate behaviour like PIL.
        src_pos = jnp.clip(src_pos, 0.0, in_size - 1.0)
    d = jnp.abs(src_pos[..., None] - k) / support[..., None]
    w = jnp.maximum(0.0, 1.0 - d)
    norm = jnp.sum(w, axis=-1, keepdims=True)
    if zero_outside:
        # Keep all-zero rows (fully outside the image -> fill with 0).
        return jnp.where(norm > 0, w / jnp.maximum(norm, 1e-8), 0.0)
    return w / jnp.maximum(norm, 1e-8)


def _apply_separable(images: Array, wh: Array, ww: Array) -> Array:
    """Per-sample separable resample: (N,H,W,C) x (N,O_h,H) x (N,O_w,W)."""
    out = jnp.einsum("nuh,nhwc->nuwc", wh, images,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nvw,nuwc->nuvc", ww, out,
                     preferred_element_type=jnp.float32)
    return out


def sample_crop_boxes(
    key: Array,
    n: int,
    in_h: int,
    in_w: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
) -> Tuple[Array, Array, Array, Array]:
    """Sample inception-style crop boxes (top, left, height, width).

    torchvision.RandomResizedCrop.get_params semantics (the transform used at
    reference data.py:121): area fraction ~ U(scale), aspect ~ exp(U(log
    ratio)); torchvision rejects out-of-bounds draws for up to 10 attempts —
    we clamp the box to the image instead, which keeps everything vectorized
    and matches the distribution except very near the degenerate corner.
    """
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    area = in_h * in_w * jax.random.uniform(
        k_area, (n,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        k_ratio, (n,),
        minval=float(np.log(ratio[0])), maxval=float(np.log(ratio[1])))
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(area * aspect)
    h = jnp.sqrt(area / aspect)
    w = jnp.clip(w, 1.0, float(in_w))
    h = jnp.clip(h, 1.0, float(in_h))
    top = jax.random.uniform(k_i, (n,)) * (in_h - h)
    left = jax.random.uniform(k_j, (n,)) * (in_w - w)
    return top, left, h, w


def crop_resize_flip(
    images: Array,                  # (N, H, W, C) float in [0,1]
    boxes: Tuple[Array, Array, Array, Array],
    out_size: Tuple[int, int],
    flip_mask: Optional[Array] = None,   # (N,) bool
    antialias: bool = True,
) -> Array:
    """Crop per-sample boxes, resize to out_size, optionally h-flip. MXU path."""
    n, in_h, in_w = images.shape[0], images.shape[1], images.shape[2]
    out_h, out_w = out_size
    top, left, h, w = boxes

    u = jnp.arange(out_h, dtype=jnp.float32)
    v = jnp.arange(out_w, dtype=jnp.float32)
    scale_h = (h / out_h)[:, None]
    scale_w = (w / out_w)[:, None]
    ys = top[:, None] + (u[None, :] + 0.5) * scale_h - 0.5
    xs = left[:, None] + (v[None, :] + 0.5) * scale_w - 0.5
    if flip_mask is not None:
        xs_flipped = (left[:, None] + w[:, None] - 1.0) - (
            xs - left[:, None])
        xs = jnp.where(flip_mask[:, None], xs_flipped, xs)

    one = jnp.ones((n, 1), jnp.float32)
    sup_h = jnp.maximum(scale_h, 1.0) if antialias else one
    sup_w = jnp.maximum(scale_w, 1.0) if antialias else one
    wh = _interp_matrix(ys, in_h, sup_h)
    ww = _interp_matrix(xs, in_w, sup_w)
    return _apply_separable(images, wh, ww)


def random_resized_crop_flip(
    key: Array,
    images: Array,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
    flip_prob: float = 0.5,
    antialias: bool = True,
) -> Array:
    """RandomResizedCrop + RandomHorizontalFlip (reference: data.py:121-123)."""
    n, in_h, in_w = images.shape[0], images.shape[1], images.shape[2]
    k_box, k_flip = jax.random.split(key)
    boxes = sample_crop_boxes(k_box, n, in_h, in_w, scale, ratio)
    flip = jax.random.uniform(k_flip, (n,)) < flip_prob
    return crop_resize_flip(images, boxes, out_size, flip, antialias)


def center_crop(images: Array, out_size: Tuple[int, int]) -> Array:
    """Static center crop (reference: data.py:187-188, CenterCrop in the test
    transform)."""
    h, w = images.shape[1], images.shape[2]
    oh, ow = out_size
    top, left = (h - oh) // 2, (w - ow) // 2
    return images[:, top:top + oh, left:left + ow, :]


def random_translate(
    key: Array,
    images: Array,
    max_translate: Tuple[float, float],
) -> Array:
    """RandomAffine(degrees=0, translate) with zero fill
    (reference: data.py:213-214, supervised pipeline).

    torchvision samples integer pixel shifts ~ U(-t*W, t*W) rounded.
    """
    n, h, w = images.shape[0], images.shape[1], images.shape[2]
    k_x, k_y = jax.random.split(key)
    ty = jnp.round(jax.random.uniform(
        k_y, (n,), minval=-max_translate[1] * h, maxval=max_translate[1] * h))
    tx = jnp.round(jax.random.uniform(
        k_x, (n,), minval=-max_translate[0] * w, maxval=max_translate[0] * w))
    u = jnp.arange(h, dtype=jnp.float32)
    v = jnp.arange(w, dtype=jnp.float32)
    ys = u[None, :] - ty[:, None]
    xs = v[None, :] - tx[:, None]
    one = jnp.ones((n, 1), jnp.float32)
    wh = _interp_matrix(ys, h, one, zero_outside=True)
    ww = _interp_matrix(xs, w, one, zero_outside=True)
    return _apply_separable(images, wh, ww)


# ---------------------------------------------------------------------------
# Colour ops (float [0,1], clamped — torchvision float-tensor semantics).
# ---------------------------------------------------------------------------

_GRAY_WEIGHTS = (0.299, 0.587, 0.114)  # ITU-R 601-2, torchvision's L mode.


def rgb_to_grayscale(images: Array, keep_channels: bool = True) -> Array:
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    gray = (_GRAY_WEIGHTS[0] * r + _GRAY_WEIGHTS[1] * g
            + _GRAY_WEIGHTS[2] * b)
    if keep_channels:
        return jnp.repeat(gray[..., None], 3, axis=-1)
    return gray[..., None]


def adjust_brightness(images: Array, factor: Array) -> Array:
    return jnp.clip(images * factor[:, None, None, None], 0.0, 1.0)


def adjust_contrast(images: Array, factor: Array) -> Array:
    mean = jnp.mean(rgb_to_grayscale(images, keep_channels=False),
                    axis=(1, 2, 3), keepdims=True)
    f = factor[:, None, None, None]
    return jnp.clip(f * images + (1.0 - f) * mean, 0.0, 1.0)


def adjust_saturation(images: Array, factor: Array) -> Array:
    gray = rgb_to_grayscale(images)
    f = factor[:, None, None, None]
    return jnp.clip(f * images + (1.0 - f) * gray, 0.0, 1.0)


def rgb_to_hsv(images: Array) -> Array:
    r, g, b = images[..., 0], images[..., 1], images[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(images: Array) -> Array:
    # Branch-free formula: channel(n) = v - v*s*clip(min(k, 4-k, 1), 0, 1)
    # with k = (n + 6h) mod 6 — pure VPU arithmetic, no selects/gathers.
    h, s, v = images[..., 0], images[..., 1], images[..., 2]
    h6 = h * 6.0

    def channel(n):
        k = (n + h6) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)


def adjust_hue(images: Array, delta: Array) -> Array:
    hsv = rgb_to_hsv(images)
    h = (hsv[..., 0] + delta[:, None, None]) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


# The 24 permutations of (0,1,2,3): torchvision shuffles the op order per
# ColorJitter call.
_PERMS = np.array(
    [p for p in __import__("itertools").permutations(range(4))], np.int32)


def color_jitter(
    key: Array,
    images: Array,
    strength: float = 0.5,
    apply_prob: float = 0.8,
) -> Array:
    """ColorJitter(0.8s, 0.8s, 0.8s, 0.2s) under RandomApply(p)
    (reference: data.py:125-132), with per-sample random op order.
    """
    n = images.shape[0]
    b = c = s_ = 0.8 * strength
    hue = 0.2 * strength
    k_apply, k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 6)
    applied = jax.random.uniform(k_apply, (n,)) < apply_prob

    def factor(k, half_range):
        f = jax.random.uniform(
            k, (n,), minval=max(0.0, 1.0 - half_range),
            maxval=1.0 + half_range)
        return jnp.where(applied, f, 1.0)

    fb = factor(k_b, b)
    fc = factor(k_c, c)
    fs = factor(k_s, s_)
    fh = jnp.where(
        applied,
        jax.random.uniform(k_h, (n,), minval=-hue, maxval=hue), 0.0)

    perm_idx = jax.random.randint(k_perm, (n,), 0, len(_PERMS))
    perms = jnp.asarray(_PERMS)[perm_idx]  # (N, 4) op index per step

    x = images
    for step in range(4):
        op = perms[:, step]  # (N,)
        candidates = jnp.stack(
            [
                adjust_brightness(x, fb),
                adjust_contrast(x, fc),
                adjust_saturation(x, fs),
                adjust_hue(x, fh),
            ],
            axis=0,
        )
        x = jnp.take_along_axis(
            candidates, op[None, :, None, None, None], axis=0)[0]
    return x


def random_grayscale(key: Array, images: Array, p: float = 0.2) -> Array:
    """RandomGrayscale (reference: data.py:133-135)."""
    flag = jax.random.uniform(key, (images.shape[0],)) < p
    return jnp.where(flag[:, None, None, None],
                     rgb_to_grayscale(images), images)


# ---------------------------------------------------------------------------
# Gaussian blur with per-sample sigma.
# ---------------------------------------------------------------------------

def gaussian_kernel_size(img_size: int) -> int:
    """floor(0.1 * img_size), snapped odd (reference: data.py:119 plus
    torchvision's odd-kernel requirement): 3 for CIFAR-10, 9 for STL-10."""
    k = int(np.floor(0.1 * img_size))
    if k % 2 == 0:
        k = max(k - 1, 1)
    return max(k, 1)


def gaussian_blur(
    key: Array,
    images: Array,
    kernel_size: int,
    sigma_range: Tuple[float, float] = (0.1, 2.0),
) -> Array:
    """Separable Gaussian blur, sigma ~ U(sigma_range) per sample
    (reference: data.py:136-139; torchvision GaussianBlur semantics:
    reflect padding, kernel exp(-x^2 / (2 sigma^2)) normalized)."""
    n = images.shape[0]
    sigma = jax.random.uniform(
        key, (n,), minval=sigma_range[0], maxval=sigma_range[1])
    half = kernel_size // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.float32)
    w = jnp.exp(-(offsets[None, :] ** 2) / (2.0 * sigma[:, None] ** 2))
    w = w / jnp.sum(w, axis=1, keepdims=True)  # (N, K)

    pad = [(0, 0), (half, half), (half, half), (0, 0)]
    x = jnp.pad(images, pad, mode="reflect")
    h, wdt = images.shape[1], images.shape[2]

    # Vertical pass then horizontal pass: K weighted shifted slices each.
    out = jnp.zeros_like(images)
    for i in range(kernel_size):
        out = out + w[:, i, None, None, None] * x[:, i:i + h, half:half + wdt, :]
    x = jnp.pad(out, pad, mode="reflect")
    out = jnp.zeros_like(images)
    for i in range(kernel_size):
        out = out + w[:, i, None, None, None] * x[:, half:half + h, i:i + wdt, :]
    return out


# ---------------------------------------------------------------------------
# Normalization and the composed pipelines.
# ---------------------------------------------------------------------------

def normalize(images: Array, mean: Sequence[float],
              std: Sequence[float]) -> Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (images - mean) / std


def to_float(images: Array) -> Array:
    """uint8 [0,255] -> float32 [0,1] (ToTensor without the HWC->CHW move —
    we stay NHWC, the TPU-preferred layout)."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images.astype(jnp.float32)


def augment_train(
    key: Array,
    images: Array,          # (N, H, W, C) uint8 or float
    aug: AugmentConfig,
    ds: DatasetConfig,
    out_size: Optional[Tuple[int, int]] = None,
    use_pallas_color: Optional[bool] = None,
) -> Array:
    """One SimCLR training view (reference: compose_augmentation_train,
    data.py:100-147). Composition order: crop+flip -> jitter -> grayscale ->
    blur -> normalize.

    On TPU the colour chain (jitter + grayscale + normalize) runs as the
    fused Pallas kernel (ops/pallas/color.py, ~3x faster than the XLA
    lowering). The kernel normalizes before the blur, which is exact: blur
    weights sum to 1, so blur commutes with the per-channel affine
    normalize (blur((x-m)/s) == (blur(x)-m)/s with reflect padding).
    """
    out = out_size or (ds.img_size, ds.img_size)
    k_crop, k_jit, k_gray, k_blur = jax.random.split(key, 4)
    x = to_float(images)
    x = random_resized_crop_flip(
        k_crop, x, out, aug.crop_scale, aug.crop_ratio, aug.flip_prob)
    if use_pallas_color is None:
        use_pallas_color = jax.default_backend() == "tpu"
    if use_pallas_color:
        from simclr_tpu.ops.pallas.color import color_distort_pallas

        x = color_distort_pallas(k_jit, x, aug, ds)
        return gaussian_blur(
            k_blur, x, gaussian_kernel_size(ds.img_size), aug.blur_sigma)
    x = color_jitter(
        k_jit, x, aug.color_distort_strength, aug.color_jitter_prob)
    x = random_grayscale(k_gray, x, aug.color_drop_prob)
    x = gaussian_blur(
        k_blur, x, gaussian_kernel_size(ds.img_size), aug.blur_sigma)
    return normalize(x, ds.mean, ds.std)


def augment_train_pair(
    key: Array,
    images: Array,
    aug: AugmentConfig,
    ds: DatasetConfig,
) -> Tuple[Array, Array]:
    """Two independent views per image (reference: data.py:44-47)."""
    k1, k2 = jax.random.split(key)
    return (augment_train(k1, images, aug, ds),
            augment_train(k2, images, aug, ds))


def augment_anchor_pair(
    key: Array,
    images: Array,
    aug: AugmentConfig,
    ds: DatasetConfig,
) -> Tuple[Array, Array]:
    """Anchor mode: (normalized ORIGINAL, augmented view) per image —
    the reference's `anchor=True` dataset mode used by the representation
    analogy analysis (reference: data.py:44-50, utils/metrics.py:232)."""
    return augment_test(images, ds), augment_train(key, images, aug, ds)


def augment_fine_tune(
    key: Array,
    images: Array,
    aug: AugmentConfig,
    ds: DatasetConfig,
) -> Array:
    """Crop + flip + normalize only (reference: data.py:150-169)."""
    k_crop, = jax.random.split(key, 1)
    x = to_float(images)
    x = random_resized_crop_flip(
        k_crop, x, (ds.img_size, ds.img_size),
        aug.crop_scale, aug.crop_ratio, aug.flip_prob)
    return normalize(x, ds.mean, ds.std)


def augment_test(
    images: Array,
    ds: DatasetConfig,
    crop_dim: Optional[Tuple[int, int]] = None,
) -> Array:
    """ToTensor [+ CenterCrop] + Normalize (reference: data.py:172-192)."""
    x = to_float(images)
    if crop_dim is not None:
        x = center_crop(x, crop_dim)
    return normalize(x, ds.mean, ds.std)


def augment_supervised(
    key: Array,
    images: Array,
    ds: DatasetConfig,
) -> Array:
    """Supervised-baseline stack (reference: data.py:195-217): flip p=0.5,
    RandomAffine translate (0.3, 0.3), ColorJitter(0.4, 0.4, 0.4, 0.1) p=0.5.

    The reference applies ColorJitter AFTER Normalize (data.py:205-216) —
    a transform-ordering bug (jitter assumes [0,1] input); we apply the
    intended order jitter -> normalize (SURVEY.md §7 "bugs to fix").
    """
    k_flip, k_trans, k_jit = jax.random.split(key, 3)
    x = to_float(images)
    n = x.shape[0]
    flip = jax.random.uniform(k_flip, (n,)) < 0.5
    x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)
    x = random_translate(k_trans, x, (0.3, 0.3))
    # strength such that 0.8s=0.4, 0.2s=0.1 -> s=0.5, p=0.5.
    x = color_jitter(k_jit, x, strength=0.5, apply_prob=0.5)
    return normalize(x, ds.mean, ds.std)
