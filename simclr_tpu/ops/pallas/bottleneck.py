"""Fused identity-bottleneck block as a Pallas TPU kernel.

The ResNet-50 pretrain step is HBM-bandwidth-bound: 13 of its 16 bottleneck
blocks are stride-1 identity blocks (in = out = 4C) whose intermediate
activations (y1, a1, y2, a2, y3) each round-trip through HBM under XLA —
~2.5x more activation traffic than the block's input+output. This kernel
runs the WHOLE block VMEM-resident per tile of images:

    out = relu( bn3(conv3( relu(bn2(conv2( relu(bn1(conv1 x)) ))) )) + x )

reading x once and writing out once. BN is pre-folded outside the kernel to
per-channel affines A = scale*rsqrt(var+eps), B = bias - mean*A (statistics
come from the SubsetBatchNorm two-pass scheme — see models/resnet.py — so
training statistics semantics are unchanged and gradients flow through the
stats via the affine inputs). The 3x3 conv is 9 shifted (M, C) x (C, C)
matmuls on the MXU over the spatially-padded tile; the 1x1 convs are plain
matmuls with K = 4C (full 128-lane contraction).

The custom-VJP backward recomputes the forward from the residual x inside
the kernel (flash-attention-style), so none of the intermediates are ever
materialized in HBM in either pass; weight/affine gradients accumulate in
float32 VMEM across the image-tile grid (Pallas revisited-block reduction).

Reference counterpart: torchvision Bottleneck (used by reference
models/resnets.py:8-36 through torchvision.ResNet); parity is tested
against the unfused flax path in tests/test_pallas_bottleneck.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3(a, w2, f32=jnp.float32):
    """SAME 3x3 conv over a (T, H, W, C) tile: 9 shifted MXU matmuls.

    `w2` is (3, 3, C, C); result is (T, H, W, C) float32.
    """
    t, h, w, c = a.shape
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t * h * w, c), f32)
    for dy in range(3):
        for dx in range(3):
            patch = ap[:, dy:dy + h, dx:dx + w, :].reshape(t * h * w, c)
            acc += jax.lax.dot_general(
                patch, w2[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32)
    return acc.reshape(t, h, w, c)


def _conv3x3_transposed(g, w2):
    """Gradient of _conv3x3 w.r.t. its input: correlate g with the
    spatially-flipped kernel, contracting over OUTPUT channels."""
    t, h, w, c = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t * h * w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = gp[:, 2 - dy:2 - dy + h, 2 - dx:2 - dx + w, :]
            acc += jax.lax.dot_general(
                patch.reshape(t * h * w, c), w2[dy, dx],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(t, h, w, c)


def _affine_relu(y, a_ref, b_ref, dtype):
    """relu(y * A + B) with per-channel f32 affines, cast to `dtype`."""
    y = y * a_ref[0][None, None, None, :] + b_ref[0][None, None, None, :]
    return jnp.maximum(y, 0.0).astype(dtype)


def _fwd_kernel(x_ref, w1_ref, w2_ref, w3_ref,
                a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref,
                out_ref):
    bf16 = jnp.bfloat16
    x = x_ref[:]                                   # (T, H, W, 4C) bf16
    t, h, w, f = x.shape
    c = w1_ref.shape[1]
    m = t * h * w

    w1 = w1_ref[:].astype(bf16)
    w2 = w2_ref[:].astype(bf16)
    w3 = w3_ref[:].astype(bf16)

    y1 = jax.lax.dot_general(
        x.reshape(m, f), w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, c)
    a1 = _affine_relu(y1, a1_ref, b1_ref, bf16)

    y2 = _conv3x3(a1, w2)
    a2 = _affine_relu(y2, a2_ref, b2_ref, bf16)

    y3 = jax.lax.dot_general(
        a2.reshape(m, c), w3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, f)
    pre = (y3 * a3_ref[0][None, None, None, :]
           + b3_ref[0][None, None, None, :]
           + x.astype(jnp.float32))
    out_ref[:] = jnp.maximum(pre, 0.0).astype(bf16)


def _bwd_kernel(x_ref, w1_ref, w2_ref, w3_ref,
                a1_ref, b1_ref, a2_ref, b2_ref, a3_ref, b3_ref, g_ref,
                dx_ref, dw1_ref, dw2_ref, dw3_ref,
                da1_ref, db1_ref, da2_ref, db2_ref, da3_ref, db3_ref):
    """Recompute-forward backward for one image tile; weight/affine grads
    accumulate across the grid into revisited f32 blocks."""
    bf16 = jnp.bfloat16
    x = x_ref[:]
    t, h, w, f = x.shape
    c = w1_ref.shape[1]
    m = t * h * w

    w1 = w1_ref[:].astype(bf16)
    w2 = w2_ref[:].astype(bf16)
    w3 = w3_ref[:].astype(bf16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dw1_ref, dw2_ref, dw3_ref, da1_ref, db1_ref,
                    da2_ref, db2_ref, da3_ref, db3_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    # --- recompute forward ---
    y1 = jax.lax.dot_general(
        x.reshape(m, f), w1, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, c)
    a1 = _affine_relu(y1, a1_ref, b1_ref, bf16)
    y2 = _conv3x3(a1, w2)
    a2 = _affine_relu(y2, a2_ref, b2_ref, bf16)
    y3 = jax.lax.dot_general(
        a2.reshape(m, c), w3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, f)
    pre3 = (y3 * a3_ref[0][None, None, None, :]
            + b3_ref[0][None, None, None, :] + x.astype(jnp.float32))

    # --- backward ---
    g = g_ref[:].astype(jnp.float32)               # (T, H, W, 4C)
    u3 = jnp.where(pre3 > 0.0, g, 0.0)             # f32
    da3_ref[0] += jnp.sum((u3 * y3).reshape(m, f), axis=0)
    db3_ref[0] += jnp.sum(u3.reshape(m, f), axis=0)
    dy3 = (u3 * a3_ref[0][None, None, None, :]).astype(bf16)

    dw3_ref[:] += jax.lax.dot_general(
        a2.reshape(m, c), dy3.reshape(m, f), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da2 = jax.lax.dot_general(
        dy3.reshape(m, f), w3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, c)

    u2 = jnp.where(y2 * a2_ref[0][None, None, None, :]
                   + b2_ref[0][None, None, None, :] > 0.0, da2, 0.0)
    da2_ref[0] += jnp.sum((u2 * y2).reshape(m, c), axis=0)
    db2_ref[0] += jnp.sum(u2.reshape(m, c), axis=0)
    dy2 = (u2 * a2_ref[0][None, None, None, :]).astype(bf16)

    # dW2[dy,dx] += shifted(a1)^T @ dy2
    a1p = jnp.pad(a1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    for dy in range(3):
        for dx in range(3):
            patch = a1p[:, dy:dy + h, dx:dx + w, :].reshape(m, c)
            dw2_ref[dy, dx] += jax.lax.dot_general(
                patch, dy2.reshape(m, c), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    da1 = _conv3x3_transposed(dy2, w2)

    u1 = jnp.where(y1 * a1_ref[0][None, None, None, :]
                   + b1_ref[0][None, None, None, :] > 0.0, da1, 0.0)
    da1_ref[0] += jnp.sum((u1 * y1).reshape(m, c), axis=0)
    db1_ref[0] += jnp.sum(u1.reshape(m, c), axis=0)
    dy1 = (u1 * a1_ref[0][None, None, None, :]).astype(bf16)

    dw1_ref[:] += jax.lax.dot_general(
        x.reshape(m, f), dy1.reshape(m, c), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(
        dy1.reshape(m, c), w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(t, h, w, f)
    dx_ref[:] = (dx + u3).astype(bf16)


def _weight_specs(c: int, f: int):
    """BlockSpecs for (w1, w2, w3, a1, b1, a2, b2, a3, b3): full arrays,
    same block for every grid step."""
    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    return [
        full(f, c), full(3, 3, c, c), full(c, f),
        full(1, c), full(1, c), full(1, c), full(1, c),
        full(1, f), full(1, f),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_block(tile, interpret, x, w1, w2, w3, a1, b1, a2, b2, a3, b3):
    return _fused_fwd(tile, interpret, x, w1, w2, w3,
                      a1, b1, a2, b2, a3, b3)[0]


def _fused_fwd(tile, interpret, x, w1, w2, w3, a1, b1, a2, b2, a3, b3):
    n, h, w, f = x.shape
    c = w1.shape[1]
    grid = (n // tile,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec((tile, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(c, f),
        ],
        out_specs=pl.BlockSpec((tile, h, w, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, w2, w3, a1, b1, a2, b2, a3, b3)
    return out, (x, w1, w2, w3, a1, b1, a2, b2, a3, b3)


def _fused_bwd(tile, interpret, res, g):
    x, w1, w2, w3, a1, b1, a2, b2, a3, b3 = res
    n, h, w, f = x.shape
    c = w1.shape[1]
    grid = (n // tile,)
    acc = lambda *shape: jax.ShapeDtypeStruct(shape, jnp.float32)
    acc_spec = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    dx, dw1, dw2, dw3, da1, db1, da2, db2, da3, db3 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            acc(f, c), acc(3, 3, c, c), acc(c, f),
            acc(1, c), acc(1, c), acc(1, c), acc(1, c),
            acc(1, f), acc(1, f),
        ),
        in_specs=[
            pl.BlockSpec((tile, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(c, f),
            pl.BlockSpec((tile, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, h, w, f), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            acc_spec(f, c), acc_spec(3, 3, c, c), acc_spec(c, f),
            acc_spec(1, c), acc_spec(1, c), acc_spec(1, c), acc_spec(1, c),
            acc_spec(1, f), acc_spec(1, f),
        ),
        interpret=interpret,
    )(x, w1, w2, w3, a1, b1, a2, b2, a3, b3, g)
    return (dx, dw1.astype(w1.dtype), dw2.astype(w2.dtype),
            dw3.astype(w3.dtype), da1.astype(a1.dtype),
            db1.astype(b1.dtype), da2.astype(a2.dtype),
            db2.astype(b2.dtype), da3.astype(a3.dtype),
            db3.astype(b3.dtype))


_fused_block.defvjp(_fused_fwd, _fused_bwd)


# Conservative VMEM budget: the backward tile holds the input/grad/output
# 4C tensors plus recomputed C-wide intermediates and the f32 weight-grad
# accumulators. Mosaic reuses dead buffers, so this static estimate errs
# high on purpose and still leaves headroom below the ~16 MB/core VMEM.
_VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def _tile_bytes(t: int, h: int, w: int, c: int) -> int:
    f = 4 * c
    per_px = f * 12 + c * 28      # bf16 x/g/dx/dy3 + f32 y3/u3; C-wide temps
    weights = (2 * f * c + 9 * c * c) * (2 + 4)  # bf16 weights + f32 grads
    return t * h * w * per_px + weights


def pick_tile(n: int, h: int, w: int, c: int) -> Optional[int]:
    """Largest image-tile size that fits the VMEM budget and divides n;
    None if the block doesn't fit at tile=1 (fall back to XLA)."""
    if c % 8 != 0 or (4 * c) % 128 != 0:
        return None
    for t in (32, 16, 8, 4, 2, 1):
        if n % t == 0 and _tile_bytes(t, h, w, c) <= _VMEM_BUDGET_BYTES:
            return t
    return None


def fused_bottleneck(
    x: jax.Array,                  # (N, H, W, 4C) bfloat16
    w1: jax.Array,                 # (1, 1, 4C, C) or (4C, C)
    w2: jax.Array,                 # (3, 3, C, C)
    w3: jax.Array,                 # (1, 1, C, 4C) or (C, 4C)
    affines: Tuple[jax.Array, ...],  # A1, B1, A2, B2, A3, B3 (f32 vectors)
    tile: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Public entry: fused identity bottleneck forward with custom VJP.

    Caller must check `pick_tile(...) is not None` first (or pass `tile`).
    """
    n, h, w, f = x.shape
    c = f // 4
    if w1.ndim == 4:
        w1 = w1.reshape(f, c)
    if w3.ndim == 4:
        w3 = w3.reshape(c, f)
    if tile is None:
        tile = pick_tile(n, h, w, c)
        if tile is None:
            raise ValueError(f"no VMEM-feasible tile for shape {x.shape}")
    a1, b1, a2, b2, a3, b3 = [
        v.reshape(1, -1).astype(jnp.float32) for v in affines]
    return _fused_block(tile, interpret, x.astype(jnp.bfloat16),
                        w1, w2, w3, a1, b1, a2, b2, a3, b3)
