"""Fused Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

Why this exists: the round-3/4 profiles show every 1x1 conv family
bandwidth-bound at 670-940 GB/s (v5e HBM peak 819) and the stride-1 3x3
conv2 families COMPUTE-bound at 160-168 TF/s = 81-85% of the v5e bf16
MXU peak (197 TF/s) — the step as a whole runs at 1.02x the roofline
floor of its op decomposition (docs/ARCHITECTURE.md §5). The only way
past that floor is to *change the decomposition*. Winograd F(2x2,3x3)
computes the same 3x3 convolution with 2.25x fewer multiplies (16 vs 36
per 2x2 output tile); done naively in XLA the 4x-expanded transform
tensors (V, M) round-trip HBM and the bandwidth cost exceeds the FLOP
saving, so this kernel keeps them entirely in VMEM: one pass reads x,
transforms in-registers, runs the 16 per-tile-position matmuls on the
MXU, inverse-transforms, and writes y — HBM traffic identical to the
direct conv, FLOPs / 2.25.

Scope (checked by `supported()`): stride 1, SAME (1,1) padding, square
even spatial dims, channels a multiple of 128 — i.e. exactly the
layer2/layer3/layer4 identity-block conv2 of the CIFAR-stem ResNet-50
(reference models/resnets.py bottleneck 3x3; our models/resnet.py
Bottleneck). Everything else falls back to lax.conv_general_dilated.

Backward (custom VJP, both 2.25x-reduced as well):
 * dX = the SAME forward kernel applied to (dY, U(rot180(w)^T)) — the
   input gradient of a stride-1 SAME 3x3 conv is itself such a conv.
 * dW: a second kernel accumulates dU[a,b] += V[a,b]^T @ dM[a,b] in
   f32 across the sample grid (V recomputed from x in-registers, dM
   from dY); the tiny 4x4->3x3 filter-domain inverse transform
   (dw = G^T dU G) runs outside in XLA.

Numerics: transforms in f32, MXU matmuls bf16 x bf16 -> f32, output
cast to the input dtype. Winograd's transform arithmetic changes the
floating-point result vs the direct conv by O(bf16 eps) — the same
order as the direct bf16 conv's own rounding; tests/test_winograd.py
pins both against an f32 lax.conv oracle.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015, arXiv:1509.09308).
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], dtype=np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], dtype=np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], dtype=np.float32)

# VMEM working-set budget for picking the per-program sample-block size
# (the chip has ~16 MB/core; leave room for pipeline double-buffering).
_VMEM_BUDGET = 9 * 1024 * 1024


def supported(x_shape, w_shape, stride) -> bool:
    """Shapes this kernel handles; callers fall back to lax.conv else."""
    n, h, w, c = x_shape
    kh, kw, wc, k = w_shape
    return (stride == (1, 1) and (kh, kw) == (3, 3) and wc == c
            and h == w and h % 2 == 0 and h >= 4
            and c % 128 == 0 and k % 128 == 0
            and n % 2 == 0)


def transform_filter(w: jnp.ndarray) -> jnp.ndarray:
    """U = G w G^T per (cin, cout): (3,3,C,K) -> (16,C,K)."""
    u = jnp.einsum("ar,bs,rsck->abck", _G, _G, w.astype(jnp.float32))
    return u.reshape(16, w.shape[2], w.shape[3])


def _strided4(a, axis, length):
    """The four stride-2 phase slices a[..., i : i+2*length : 2, ...] for
    i in 0..3, from an axis of size 2*length+2.

    Expressed as contiguous slices + an axis split + unit index rather
    than strided slices: Mosaic lowers stride-2 `lax.slice` on the tiled
    (second-minor/minor) dims to `vector.extract_strided_slice`, whose
    verifier requires stride 1 (crashes at the 16x16/8x8 conv2 shapes);
    splitting the axis into (length, 2) and indexing the size-2 subaxis
    lowers to supported reshape+extract ops instead."""
    outs = []
    shp = a.shape
    for base in (0, 2):
        sl = jax.lax.slice_in_dim(a, base, base + 2 * length, axis=axis)
        sl = sl.reshape(shp[:axis] + (length, 2) + shp[axis + 1:])
        for ph in range(2):
            outs.append(jax.lax.index_in_dim(sl, ph, axis=axis + 1,
                                             keepdims=False))
    return outs  # phase offsets [0, 1, 2, 3]


def _input_transform(xb, th, tw):
    """V = B^T d B over all tiles: (S,H,W,C) f32 -> 16 of (S,th,tw,C)."""
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    r0, r1, r2, r3 = _strided4(xp, 1, th)
    h0, h1, h2, h3 = r0 - r2, r1 + r2, r2 - r1, r1 - r3
    v = []
    for hk in (h0, h1, h2, h3):
        c0, c1, c2, c3 = _strided4(hk, 2, tw)
        v += [c0 - c2, c1 + c2, c2 - c1, c1 - c3]
    return v  # row-major [k*4 + l]


def _dm_transform(gb, th, tw):
    """dM = (A dy A^T)-style adjoint of the output transform:
    (S,H,W,K) f32 -> 16 of (S,th,tw,K)."""
    # Split dy into its 2x2 intra-tile phases.
    s, h, w, k = gb.shape
    g = gb.reshape(s, th, 2, tw, 2, k)
    y00, y01 = g[:, :, 0, :, 0, :], g[:, :, 0, :, 1, :]
    y10, y11 = g[:, :, 1, :, 0, :], g[:, :, 1, :, 1, :]
    # Along each axis: dM_0 = dy0, dM_1 = dy0+dy1, dM_2 = dy0-dy1,
    # dM_3 = -dy1 (rows of A^T = columns of AT).
    def adj(a0, a1):
        return a0, a0 + a1, a0 - a1, -a1
    h0 = adj(y00, y10)  # phase-u adjoint applied first (H axis)
    h1 = adj(y01, y11)
    dm = []
    for k4 in range(4):
        w0, w1 = h0[k4], h1[k4]
        dm += list(adj(w0, w1))
    return dm  # row-major [k*4 + l], each (S,th,tw,K)


def _stack_tiles(tiles, p):
    """16 of (S,th,tw,C) -> (16, P, C)."""
    c = tiles[0].shape[-1]
    return jnp.stack([t.reshape(p, c) for t in tiles])


def _fwd_kernel(x_ref, u_ref, y_ref):
    s, h, w, _ = x_ref.shape
    th, tw = h // 2, w // 2
    p = s * th * tw
    xb = x_ref[:].astype(jnp.float32)
    v = _stack_tiles(_input_transform(xb, th, tw), p).astype(jnp.bfloat16)
    m = jax.lax.dot_general(
        v, u_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (16, P, K)
    k = u_ref.shape[2]
    mt = [m[i].reshape(s, th, tw, k) for i in range(16)]
    # Y = A^T M A: rows u0 = m0+m1+m2, u1 = m1-m2-m3, each axis.
    def out2(m0, m1, m2, m3):
        return m0 + m1 + m2, m1 - m2 - m3
    u0 = [None] * 4
    u1 = [None] * 4
    for l in range(4):
        u0[l], u1[l] = out2(mt[l], mt[4 + l], mt[8 + l], mt[12 + l])
    y00, y01 = out2(*u0)
    y10, y11 = out2(*u1)
    y = jnp.stack([y00, y01, y10, y11])              # (4,S,th,tw,K)
    y = y.reshape(2, 2, s, th, tw, k).transpose(2, 3, 0, 4, 1, 5)
    y_ref[:] = y.reshape(s, h, w, k).astype(y_ref.dtype)


def _dw_kernel(x_ref, g_ref, du_ref):
    s, h, w, _ = x_ref.shape
    th, tw = h // 2, w // 2
    p = s * th * tw
    xb = x_ref[:].astype(jnp.float32)
    gb = g_ref[:].astype(jnp.float32)
    v = _stack_tiles(_input_transform(xb, th, tw), p).astype(jnp.bfloat16)
    dm = _stack_tiles(_dm_transform(gb, th, tw), p).astype(jnp.bfloat16)
    du = jax.lax.dot_general(
        v, dm,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (16, C, K)

    @pl.when(pl.program_id(0) == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)

    du_ref[:] += du


def _pick_s(n, h, c, k):
    """Largest sample-block whose f32 transform working set fits VMEM."""
    # Live f32 intermediates per sample: V + M (4*h*h each of C / K) and
    # the padded input; bf16 copies of V; pipeline in/out buffers.
    per_sample = (4 * h * h * (c + k) * 4          # V, M in f32
                  + 4 * h * h * c * 2              # V bf16
                  + (h + 2) * (h + 2) * c * 6      # x block f32+bf16
                  + h * h * k * 4)                 # y block (2 buffers)
    u_bytes = 16 * c * k * 2
    s = n
    while s > 1 and (s * per_sample + u_bytes > _VMEM_BUDGET
                     or n % s != 0):
        s //= 2
    if n % s != 0 or s * per_sample + u_bytes > _VMEM_BUDGET:
        return None
    if s * (h // 2) * (h // 2) < 64:
        # The per-tile-position matmuls would run with < 64 rows —
        # mostly-idle MXU (this is layer4 at C=K=512, where the 8 MB
        # filter transform crowds the sample block out of VMEM).
        return None
    return s


def _run_fwd(x, u, interpret):
    n, h, w, c = x.shape
    k = u.shape[2]
    s = _pick_s(n, h, c, k)
    if s is None:
        return None
    grid = (n // s,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((16, c, k), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((s, h, w, k), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, k), x.dtype),
        interpret=interpret,
    )(x, u)


def _run_dw(x, g, interpret):
    n, h, w, c = x.shape
    k = g.shape[3]
    s = _pick_s(n, h, c, k)
    if s is None:
        return None
    grid = (n // s,)
    du = pl.pallas_call(
        _dw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((s, h, w, k), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((16, c, k), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((16, c, k), jnp.float32),
        interpret=interpret,
    )(x, g)
    dw = jnp.einsum("ar,bs,abck->rsck", _G, _G,
                    du.reshape(4, 4, c, k))
    return dw


def _direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def winograd_conv3x3(x, w, interpret=False):
    """SAME-padded stride-1 3x3 conv via the fused Winograd kernel.

    x: (N, H, H, C) activations; w: (3, 3, C, K) filter. Falls back to
    lax.conv for unsupported shapes (callers should gate on
    `supported()` so the fallback never silently eats the speedup)."""
    y, _ = _wino_fwd(x, w, interpret)
    return y


def _wino_fwd(x, w, interpret):
    if not supported(x.shape, w.shape, (1, 1)):
        return _direct_conv(x, w), (x, w)
    u = transform_filter(w).astype(jnp.bfloat16)
    y = _run_fwd(x, u, interpret)
    if y is None:                       # VMEM-unfittable shape
        return _direct_conv(x, w), (x, w)
    return y, (x, w)


def _wino_bwd(interpret, res, gy):
    x, w = res
    if not supported(x.shape, w.shape, (1, 1)):
        _, vjp = jax.vjp(lambda xx, ww: _direct_conv(xx, ww), x, w)
        return vjp(gy)
    # dX: stride-1 SAME conv of dY with the 180-rotated, C/K-swapped
    # filter — the same kernel with a different filter transform.
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    u_rot = transform_filter(w_rot).astype(jnp.bfloat16)
    dx = _run_fwd(gy.astype(x.dtype), u_rot, interpret)
    dw = _run_dw(x, gy.astype(x.dtype), interpret)
    if dx is None or dw is None:
        _, vjp = jax.vjp(lambda xx, ww: _direct_conv(xx, ww), x, w)
        return vjp(gy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


winograd_conv3x3.defvjp(_wino_fwd, _wino_bwd)
