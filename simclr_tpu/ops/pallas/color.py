"""Fused colour-distortion Pallas kernel.

One VMEM-resident pass applies the whole per-pixel colour chain of the
SimCLR augmentation (reference: data.py:124-135 — ColorJitter in random
per-sample op order, RandomGrayscale) plus the final normalization, for a
tile of images at a time.

Layout: images enter as channel PLANES shaped (N, HW) per channel — pixels
fill the 128-lane axis (HW = 1024 for CIFAR-10, 9216 for STL-10) instead of
the hopeless 3-wide channel axis. Per-sample random factors (brightness /
contrast / saturation / hue deltas, grayscale flags, and the 4-step op
schedule) are sampled OUTSIDE with the ordinary JAX PRNG (distribution
parity with the XLA path) and stream in as (N, 1) vectors that broadcast
across lanes.

The random op order is honoured per sample: at each of the 4 schedule
steps the kernel evaluates the four candidate ops and per-row selects the
scheduled one — the same data flow the XLA path uses, but with every
intermediate kept in VMEM instead of round-tripping layer-sized tensors
through HBM between ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simclr_tpu.config import AugmentConfig, DatasetConfig

_GRAY = (0.299, 0.587, 0.114)


def _color_kernel(r_ref, g_ref, b_ref, fac_ref, sched_ref, mean_ref,
                  std_ref, ro_ref, go_ref, bo_ref):
    """fac: (N, 8) = [fb, fc, fs, fh, gray_flag, pad...]; sched: (N, 4)
    op ids per step; mean/std: (1, 8) channel constants (first 3 used)."""
    r, g, b = r_ref[:], g_ref[:], b_ref[:]
    fb = fac_ref[:, 0:1]
    fc = fac_ref[:, 1:2]
    fs = fac_ref[:, 2:3]
    fh = fac_ref[:, 3:4]
    grayf = fac_ref[:, 4:5]

    def gray_of(r, g, b):
        return _GRAY[0] * r + _GRAY[1] * g + _GRAY[2] * b

    def clip01(x):
        return jnp.clip(x, 0.0, 1.0)

    for step in range(4):
        op = sched_ref[:, step:step + 1]  # (N, 1) int32
        gray = gray_of(r, g, b)
        mean_gray = jnp.mean(gray, axis=1, keepdims=True)

        # Brightness / contrast / saturation are channel-wise affine.
        def bcs(c):
            cb = clip01(c * fb)
            cc = clip01(fc * c + (1.0 - fc) * mean_gray)
            cs = clip01(fs * c + (1.0 - fs) * gray)
            return cb, cc, cs

        rb, rc, rs = bcs(r)
        gb, gc, gs = bcs(g)
        bb_, bc_, bs_ = bcs(b)

        # Hue: RGB -> HSV -> h + fh -> RGB (branch-free).
        maxc = jnp.maximum(jnp.maximum(r, g), b)
        minc = jnp.minimum(jnp.minimum(r, g), b)
        delta = maxc - minc
        safe = jnp.where(delta == 0.0, 1.0, delta)
        sat = jnp.where(maxc == 0.0, 0.0,
                        delta / jnp.where(maxc == 0.0, 1.0, maxc))
        rc_ = (maxc - r) / safe
        gc_ = (maxc - g) / safe
        bc2 = (maxc - b) / safe
        h = jnp.where(
            maxc == r, bc2 - gc_,
            jnp.where(maxc == g, 2.0 + rc_ - bc2, 4.0 + gc_ - rc_))
        h = jnp.where(delta == 0.0, 0.0, h) / 6.0 % 1.0
        h6 = ((h + fh) % 1.0) * 6.0

        def chan(n):
            k = (n + h6) % 6.0
            return maxc - maxc * sat * jnp.clip(
                jnp.minimum(k, 4.0 - k), 0.0, 1.0)

        rh, gh, bh = chan(5.0), chan(3.0), chan(1.0)

        r = jnp.where(op == 0, rb,
                      jnp.where(op == 1, rc, jnp.where(op == 2, rs, rh)))
        g = jnp.where(op == 0, gb,
                      jnp.where(op == 1, gc, jnp.where(op == 2, gs, gh)))
        b = jnp.where(op == 0, bb_,
                      jnp.where(op == 1, bc_,
                                jnp.where(op == 2, bs_, bh)))

    # Random grayscale, then normalize.
    gray = gray_of(r, g, b)
    r = jnp.where(grayf > 0.5, gray, r)
    g = jnp.where(grayf > 0.5, gray, g)
    b = jnp.where(grayf > 0.5, gray, b)
    ro_ref[:] = (r - mean_ref[0, 0]) / std_ref[0, 0]
    go_ref[:] = (g - mean_ref[0, 1]) / std_ref[0, 1]
    bo_ref[:] = (b - mean_ref[0, 2]) / std_ref[0, 2]


# The 24 permutations of (0..3) — torchvision shuffles the op order per
# ColorJitter application.
import itertools  # noqa: E402
import numpy as np  # noqa: E402

_PERMS = np.array(list(itertools.permutations(range(4))), np.int32)


def sample_color_params(
    key: jax.Array,
    n: int,
    strength: float,
    apply_prob: float,
    gray_prob: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample factors + schedules, identical distributions to
    ops.augment.color_jitter / random_grayscale."""
    b = c = s_ = 0.8 * strength
    hue = 0.2 * strength
    k_apply, k_b, k_c, k_s, k_h, k_perm, k_gray = jax.random.split(key, 7)
    applied = jax.random.uniform(k_apply, (n,)) < apply_prob

    def factor(k, half):
        f = jax.random.uniform(k, (n,), minval=max(0.0, 1.0 - half),
                               maxval=1.0 + half)
        return jnp.where(applied, f, 1.0)

    fb = factor(k_b, b)
    fc = factor(k_c, c)
    fs = factor(k_s, s_)
    fh = jnp.where(applied,
                   jax.random.uniform(k_h, (n,), minval=-hue, maxval=hue),
                   0.0)
    grayf = (jax.random.uniform(k_gray, (n,)) < gray_prob).astype(
        jnp.float32)
    pad = jnp.zeros((n,), jnp.float32)
    factors = jnp.stack([fb, fc, fs, fh, grayf, pad, pad, pad], axis=1)
    perm_idx = jax.random.randint(k_perm, (n,), 0, len(_PERMS))
    schedule = jnp.asarray(_PERMS)[perm_idx]  # (N, 4) int32
    return factors, schedule


def color_distort_pallas(
    key: jax.Array,
    images: jnp.ndarray,               # (N, H, W, 3) float in [0, 1]
    aug: AugmentConfig,
    ds: DatasetConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """Jitter (random order) + grayscale + normalize, one fused kernel.
    Returns normalized images (N, H, W, 3) float32."""
    n, h, w, _ = images.shape
    hw = h * w
    factors, schedule = sample_color_params(
        key, n, aug.color_distort_strength, aug.color_jitter_prob,
        aug.color_drop_prob)
    planes = jnp.transpose(images, (3, 0, 1, 2)).reshape(3, n, hw)
    mean = jnp.asarray(ds.mean + (0.0,) * 5, jnp.float32)[None, :]
    std = jnp.asarray(ds.std + (1.0,) * 5, jnp.float32)[None, :]

    # Tile over the batch so the ~18 live (TILE, HW) f32 intermediates of
    # the 4-step schedule fit in scoped VMEM (measured: tile 64 at
    # HW=1024 allocates ~4.7 MB; at STL's HW=9216 the same tile asked for
    # 42.77 MB and the compiler refused — the tile must scale with HW).
    budget = 12 * 2 ** 20
    live = 20  # 18 measured + margin
    tile = 64
    while tile > 1 and tile * hw * 4 * live > budget:
        tile //= 2
    while n % tile:
        tile //= 2
    if tile < 8:
        # Degenerate tiling (giant images or odd batch): XLA fallback
        # with the same op chain (ops/augment primitives).
        from simclr_tpu.ops.augment import (color_jitter, normalize,
                                            random_grayscale)
        k_jit, k_gray = jax.random.split(key)
        x = color_jitter(k_jit, images, aug.color_distort_strength,
                         aug.color_jitter_prob)
        x = random_grayscale(k_gray, x, aug.color_drop_prob)
        return normalize(x, ds.mean, ds.std)
    grid = (n // tile,)
    plane_spec = pl.BlockSpec((tile, hw), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _color_kernel,
        grid=grid,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, hw), jnp.float32) for _ in range(3)),
        in_specs=[
            plane_spec, plane_spec, plane_spec,
            pl.BlockSpec((tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(plane_spec, plane_spec, plane_spec),
        interpret=interpret,
    )(planes[0], planes[1], planes[2], factors, schedule, mean, std)
    return jnp.transpose(
        jnp.stack(out, axis=0).reshape(3, n, h, w), (1, 2, 3, 0))
