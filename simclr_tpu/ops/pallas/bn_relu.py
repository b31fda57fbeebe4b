"""Fused subset-BN(+residual)+ReLU with a single-pass Pallas backward.

WHY (profiler + HLO evidence, v5e, batch 512, stats64 default): the
pretrain step is HBM-bandwidth-bound — the optimized HLO moves ~92 GB of
fusion operand/output bytes per step at 114 ms, i.e. ~100% of v5e HBM
bandwidth (scripts/dump_hlo.py). Autodiff of BatchNorm->ReLU emits
THREE separate full-tensor passes over the layer-sized activations:

  1. ReLU backward:     read (g, out)      -> write gy
  2. dgamma/dbeta:      read (gy, x)       -> f32[C] sums
  3. dx elementwise:    read gy            -> write dx

plus, for the bn3+residual position, the skip cotangent rides the same
buffers. With SUBSET statistics (models/norm.py) the dx of every row
OUTSIDE the statistics subset is just gy * a (a = gamma * rsqrt(var+eps))
— no dependency on the sums — so the whole backward collapses to ONE
pass that this kernel performs:

    read (g, out[, x])  ->  write dx[, dskip]  +  f32 S1/S2 accumulators

Two algebraic tricks make that possible:
  * dgamma needs sum(gy * xhat). For the no-residual position xhat is
    recovered from the SAVED OUTPUT: out = relu(xhat*gamma + beta), and
    gy is zero wherever the ReLU clipped, so
        sum(gy * xhat) == (sum(gy * out) - beta * sum(gy)) / gamma.
    The kernel accumulates sum(gy*out); the division is per-channel,
    outside. x is then NOT a backward residual at all for bn1/bn2.
  * The statistics-subset head rows (k of N, k=64 at batch 1024) DO need
    the sums; their correction term is O(k/N) of the tensor and is
    applied outside the kernel from the saved x[:k] slice.

Forward stays plain XLA (it already fuses into the producing conv's
epilogue); only the backward is a Pallas kernel. Forward numerics are
bit-identical to SubsetBatchNorm (same shifted one-pass variance, same
bf16 application order) followed by (optional add and) relu.

Layout constraint: XLA lays out C-minor only for C >= 128 on these
tensors (C=64 tensors get N-minor layouts, and forcing C-minor into the
kernel would insert transpose copies that cost more than the fusion
saves), so `supports()` requires C % 128 == 0; callers fall back to the
autodiff path otherwise (stem and layer1 bn1/bn2 keep autodiff).

Reference counterpart: torch BatchNorm2d+ReLU inside torchvision
Bottleneck blocks (reference models/resnets.py:8-36) — cuDNN fuses these
backward reductions natively; XLA does not, hence this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Per-(input or output) block byte target. Backward v2 holds 5 tensor
# blocks double-buffered plus f32 temporaries; 512 KB blocks keep the
# whole working set comfortably under the ~16 MB VMEM.
_BLOCK_BYTES = 512 * 1024


def _row_block(c: int, itemsize: int) -> int:
    br = _BLOCK_BYTES // (c * itemsize)
    # Power-of-two, floor 8 (f32 sublanes), cap 4096.
    br = max(8, min(4096, 1 << (br.bit_length() - 1)))
    return br


def supports(shape: Tuple[int, ...], k: int, dtype) -> bool:
    """Shapes the backward kernel tiles cleanly; callers MUST fall back
    to autodiff otherwise. C multiple of 128 (lane layout — see module
    docstring), rows divisible by the block, subset head within the
    first block's reach (k*H*W rows handled by an O(k) fix-up outside,
    any k works), and a TPU-friendly dtype."""
    if len(shape) < 2:
        return False
    c = shape[-1]
    if c % 128 != 0:
        return False
    rows = 1
    for d in shape[:-1]:
        rows *= d
    itemsize = jnp.dtype(dtype).itemsize
    br = _row_block(c, itemsize)
    return rows % br == 0 and rows >= br and 0 < k <= shape[0]


# ---------------------------------------------------------------------------
# Backward kernels. 2D views (rows, C); grid over row blocks; S1/S2
# accumulate into (1, C) f32 output blocks that stay VMEM-resident across
# the sequential grid (constant index_map).
# ---------------------------------------------------------------------------

def _bwd_kernel_norelu(g_ref, x_ref, a_ref, mean_ref, rsig_ref,
                       dx_ref, s1_ref, s2_ref):
    """No-ReLU variant (downsample BN): gy == g, xhat from x."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
    g = g_ref[:]
    dx_ref[:] = g * a_ref[:].astype(g.dtype)
    g32 = g.astype(jnp.float32)
    xhat = (x_ref[:].astype(jnp.float32) - mean_ref[:]) * rsig_ref[:]
    s1_ref[:] += jnp.sum(g32, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(g32 * xhat, axis=0, keepdims=True)


def _bwd_kernel_relu(g_ref, out_ref, a_ref, dx_ref, s1_ref, s2p_ref):
    """bn+relu: one read of (g, out) -> dx, S1=sum(gy), S2'=sum(gy*out)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2p_ref[:] = jnp.zeros_like(s2p_ref)
    g = g_ref[:]
    out32 = out_ref[:].astype(jnp.float32)
    # Mosaic's v5e target rejects bf16 vector cmpf — mask in f32.
    gy = jnp.where(out32 > 0.0, g, jnp.zeros_like(g))
    dx_ref[:] = gy * a_ref[:].astype(g.dtype)
    gy32 = gy.astype(jnp.float32)
    s1_ref[:] += jnp.sum(gy32, axis=0, keepdims=True)
    s2p_ref[:] += jnp.sum(gy32 * out32, axis=0, keepdims=True)


def _bwd_kernel_add_relu(g_ref, out_ref, x_ref, a_ref, mean_ref, rsig_ref,
                         dx_ref, dskip_ref, s1_ref, s2_ref):
    """bn+add+relu: one read of (g, out, x) -> dx, dskip, S1, S2.
    xhat comes from x here (out mixes in the skip, so the out-recovery
    trick does not apply)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)
    g = g_ref[:]
    out32 = out_ref[:].astype(jnp.float32)
    gy = jnp.where(out32 > 0.0, g, jnp.zeros_like(g))
    dskip_ref[:] = gy
    dx_ref[:] = gy * a_ref[:].astype(g.dtype)
    gy32 = gy.astype(jnp.float32)
    xhat = (x_ref[:].astype(jnp.float32) - mean_ref[:]) * rsig_ref[:]
    s1_ref[:] += jnp.sum(gy32, axis=0, keepdims=True)
    s2_ref[:] += jnp.sum(gy32 * xhat, axis=0, keepdims=True)


def _to2d(t):
    """(N,H,W,C) -> (H*W*N, C) matching the TPU layout these activations
    actually get ({3,0,2,1}: C on lanes, N in sublanes) so the
    transpose+reshape lowers to a relabeling, not a physical copy. The
    row ORDER is irrelevant to the kernels (per-channel sums + pure
    elementwise), so any layout-free enumeration works; 2D inputs pass
    through unchanged."""
    if t.ndim == 2:
        return t
    n, h, w, c = t.shape
    return jnp.transpose(t, (1, 2, 0, 3)).reshape(h * w * n, c)


def _from2d(t2, shape):
    if len(shape) == 2:
        return t2
    n, h, w, c = shape
    return jnp.transpose(t2.reshape(h, w, n, c), (2, 0, 1, 3))


def _run_bwd(kernel, tensors, chans, n_tensor_out, interpret):
    """Launch one backward kernel: row-blocked tensor ins/outs plus (1,C)
    f32 channel vectors (constant index_map) and f32 accumulators.
    Tensor inputs are 4D activations, viewed 2D layout-natively."""
    shape = tensors[0].shape
    tensors_2d = [_to2d(t) for t in tensors]
    rows, c = tensors_2d[0].shape
    br = _row_block(c, tensors_2d[0].dtype.itemsize)
    grid = (rows // br,)

    t_spec = pl.BlockSpec((br, c), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)

    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, c), tensors_2d[0].dtype)
        for _ in range(n_tensor_out)
    ) + (jax.ShapeDtypeStruct((1, c), jnp.float32),
         jax.ShapeDtypeStruct((1, c), jnp.float32))
    out_specs = (t_spec,) * n_tensor_out + (c_spec, c_spec)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[t_spec] * len(tensors_2d) + [c_spec] * len(chans),
        out_specs=out_specs,
        interpret=interpret,
    )(*tensors_2d, *[v.reshape(1, c) for v in chans])
    return tuple(_from2d(o, shape) for o in outs[:n_tensor_out]) \
        + outs[n_tensor_out:]


# ---------------------------------------------------------------------------
# Forward math (XLA) — must match SubsetBatchNorm bit-for-bit.
# ---------------------------------------------------------------------------

def _bn_stats(x, shift, k, eps):
    red = tuple(range(x.ndim - 1))
    xs = x[:k].astype(jnp.float32)
    d = xs - shift
    mean_d = jnp.mean(d, axis=red)
    mean2_d = jnp.mean(jnp.square(d), axis=red)
    mean = mean_d + shift
    var = jnp.maximum(mean2_d - jnp.square(mean_d), 0.0)
    return mean, var


def _bn_apply(x, scale, bias, mean, var, eps, dt):
    rsig = jax.lax.rsqrt(var + eps)
    return (x.astype(dt) - mean.astype(dt)) * (
        rsig.astype(dt) * scale.astype(dt)) + bias.astype(dt)


def _head_correction(x_head, gy_head_a, s1, s2, gmean, gvar, scale, mean,
                     rsig, m, dt):
    """Statistics-subset rows' extra dx terms (same closed form as
    ops/subset_bn.py:_subset_bn_bwd), returned as the full head-row dx:
    gy*a (RECOMPUTED from the k-row input slices by the caller — reading
    it back out of the kernel's dx would block XLA's in-place
    dynamic-update-slice and force a full-tensor copy) + correction."""
    a32 = scale * rsig
    inv_m = jnp.float32(1.0 / m)
    c1 = (-inv_m) * (a32 * s2)
    c2 = inv_m * 2.0 * gvar
    c0 = (-inv_m) * (a32 * s1 - gmean)
    xhat = (x_head.astype(dt) - mean.astype(dt)) * rsig.astype(dt)
    corr = (c0.astype(dt) + xhat * c1.astype(dt)
            + (x_head.astype(dt) - mean.astype(dt)) * c2.astype(dt))
    return gy_head_a + corr


def _elems_per_channel(shape, k):
    m = k
    for d in shape[1:-1]:
        m *= d
    return m


# ---------------------------------------------------------------------------
# XLA implementations of the same restructured backward (impl='xla'):
# no gy materialization, no concatenate, f32 sums — fusion-layout-proof
# (fusions internalize layouts, so unlike the Pallas path this can never
# induce transpose copies; whether XLA merges the reduces into the
# elementwise pass is up to its sibling-fusion heuristics).
# ---------------------------------------------------------------------------

def _row_mask(shape, k):
    """Boolean (N,1,..,1) mask of the statistics-subset samples — lazily
    materialized inside the consuming fusion (iota + compare), so masking
    with it costs no HBM traffic."""
    n = shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n,) + (1,) * (len(shape) - 1),
                                    0)
    return rows < k


def _pad_head(x_head, shape):
    """Zero-pad the saved k-sample slice back to the full batch. As a
    fusion operand the pad is evaluated lazily: the consuming pass reads
    only the k-slice bytes, never a materialized full-size copy."""
    pad = [(0, shape[0] - x_head.shape[0])] + [(0, 0)] * (x_head.ndim - 1)
    return jnp.pad(x_head, pad)


def _xla_bwd_relu(g, out, a32):
    red = tuple(range(g.ndim - 1))
    out32 = out.astype(jnp.float32)
    gy = jnp.where(out32 > 0.0, g, jnp.zeros_like(g))
    dx = gy * a32.astype(g.dtype)
    gy32 = gy.astype(jnp.float32)
    s1 = jnp.sum(gy32, axis=red)
    s2p = jnp.sum(gy32 * out32, axis=red)
    return dx, s1, s2p


def _xla_bwd_add_relu(g, out, x, a32, mean, rsig):
    red = tuple(range(g.ndim - 1))
    out32 = out.astype(jnp.float32)
    gy = jnp.where(out32 > 0.0, g, jnp.zeros_like(g))
    dx = gy * a32.astype(g.dtype)
    gy32 = gy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rsig
    s1 = jnp.sum(gy32, axis=red)
    s2 = jnp.sum(gy32 * xhat, axis=red)
    return dx, gy, s1, s2


def _xla_bwd_norelu(g, x, a32, mean, rsig):
    red = tuple(range(g.ndim - 1))
    dx = g * a32.astype(g.dtype)
    g32 = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * rsig
    s1 = jnp.sum(g32, axis=red)
    s2 = jnp.sum(g32 * xhat, axis=red)
    return dx, s1, s2


# ---------------------------------------------------------------------------
# Public op 1: subset-BN + ReLU (bn1/bn2 positions).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def subset_bn_relu(x: Array, scale: Array, bias: Array, shift: Array,
                   k: int, eps: float, apply_dtype,
                   interpret: bool = False, impl: str = "pallas"):
    """relu(subset_bn(x)); returns (out, mean, var) like subset_bn_apply."""
    mean, var = _bn_stats(x, shift, k, eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    return jnp.maximum(y, 0), mean, var


def _bn_relu_fwd(x, scale, bias, shift, k, eps, apply_dtype, interpret,
                 impl):
    mean, var = _bn_stats(x, shift, k, eps)
    rsig = jax.lax.rsqrt(var + eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    out = jnp.maximum(y, 0)
    # Residuals: the OUTPUT (already live as the next conv's input) and
    # only the k-row statistics slice of x — x itself is not saved.
    return (out, mean, var), (out, x[:k], scale, bias, mean, rsig)


def _bn_relu_bwd(k, eps, apply_dtype, interpret, impl, res, cots):
    out, x_head, scale, bias, mean, rsig = res
    g, gmean, gvar = cots
    c = out.shape[-1]
    a32 = scale * rsig

    if impl == "xla_mask":
        # Single-expression dx: the k-sample correction is folded into the
        # full-row elementwise pass via a lazily-evaluated iota mask and a
        # lazily-read zero-pad of the saved x[:k] slice — NO patch pass
        # (dynamic-update-slice / concatenate materializes an extra full
        # read+write of dx per BN otherwise; at 53 BNs that is ~13 GB of
        # the HBM-bound step).
        _, s1, s2p = _xla_bwd_relu(g, out, a32)
    elif impl == "xla":
        dx, s1, s2p = _xla_bwd_relu(g, out, a32)
    else:
        dx, s1, s2p = _run_bwd(_bwd_kernel_relu, (g, out), (a32,), 1,
                               interpret)
    s1 = s1.reshape(c)
    # sum(gy*xhat) == (sum(gy*out) - beta*S1)/gamma wherever gamma != 0
    # (gamma == 0 makes out constant and the recovery degenerate; BN
    # scales live near 1 in practice — guarded, documented approximation).
    safe = jnp.where(jnp.abs(scale) < 1e-6, 1.0, scale)
    s2 = jnp.where(jnp.abs(scale) < 1e-6, 0.0,
                   (s2p.reshape(c) - bias * s1) / safe)

    m = _elems_per_channel(out.shape, k)
    dt = x_head.dtype

    if impl == "xla_mask":
        zero = jnp.zeros((), dt)
        corr = _head_correction(_pad_head(x_head, out.shape), zero, s1, s2,
                                gmean, gvar, scale, mean, rsig, m, dt)
        gy = jnp.where(out.astype(jnp.float32) > 0.0, g, jnp.zeros_like(g))
        dx = (gy * a32.astype(g.dtype)).astype(dt) \
            + jnp.where(_row_mask(out.shape, k), corr, zero)
        return dx, s2, s1, None

    dx = dx.astype(dt)
    a_dt = (scale * rsig).astype(dt)
    gy_head_a = jnp.where(out[:k].astype(jnp.float32) > 0.0,
                          g[:k].astype(dt), 0).astype(dt) * a_dt
    head = _head_correction(x_head, gy_head_a, s1, s2, gmean, gvar, scale,
                            mean, rsig, m, dt)
    dx = jax.lax.dynamic_update_slice_in_dim(dx, head.astype(dt), 0, 0)
    return dx, s2, s1, None


subset_bn_relu.defvjp(_bn_relu_fwd, _bn_relu_bwd)


# ---------------------------------------------------------------------------
# Public op 2: subset-BN + residual add + ReLU (bn3 position).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def subset_bn_add_relu(x: Array, skip: Array, scale: Array, bias: Array,
                       shift: Array, k: int, eps: float, apply_dtype,
                       interpret: bool = False, impl: str = "pallas"):
    """relu(subset_bn(x) + skip); returns (out, mean, var)."""
    mean, var = _bn_stats(x, shift, k, eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    return jnp.maximum(y + skip.astype(y.dtype), 0), mean, var


def _bn_add_relu_fwd(x, skip, scale, bias, shift, k, eps, apply_dtype,
                     interpret, impl):
    mean, var = _bn_stats(x, shift, k, eps)
    rsig = jax.lax.rsqrt(var + eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    out = jnp.maximum(y + skip.astype(y.dtype), 0)
    # x IS a residual here (the skip contaminates out, so xhat cannot be
    # recovered from it) — same saves as autodiff, fewer passes. The
    # empty array only carries skip's dtype for the cotangent cast.
    skip_dt = jnp.zeros((0,), skip.dtype)
    return (out, mean, var), (out, x, scale, mean, rsig, skip_dt)


def _bn_add_relu_bwd(k, eps, apply_dtype, interpret, impl, res, cots):
    out, x, scale, mean, rsig, skip_dt = res
    g, gmean, gvar = cots
    c = out.shape[-1]
    a32 = scale * rsig

    if impl == "xla_mask":
        _, _, s1, s2 = _xla_bwd_add_relu(
            g, out, x.astype(g.dtype), a32, mean, rsig)
    elif impl == "xla":
        dx, dskip, s1, s2 = _xla_bwd_add_relu(
            g, out, x.astype(g.dtype), a32, mean, rsig)
    else:
        dx, dskip, s1, s2 = _run_bwd(
            _bwd_kernel_add_relu, (g, out, x.astype(g.dtype)),
            (a32, mean, rsig), 2, interpret)

    m = _elems_per_channel(out.shape, k)
    dt = x.dtype

    if impl == "xla_mask":
        # x is saved in full here (see _bn_add_relu_fwd), so the k-sample
        # correction needs no pad — one elementwise expression, no patch.
        s1 = s1.reshape(c)
        s2 = s2.reshape(c)
        zero = jnp.zeros((), dt)
        corr = _head_correction(x, zero, s1, s2, gmean, gvar, scale,
                                mean, rsig, m, dt)
        gy = jnp.where(out.astype(jnp.float32) > 0.0, g, jnp.zeros_like(g))
        dx = (gy * a32.astype(g.dtype)).astype(dt) \
            + jnp.where(_row_mask(out.shape, k), corr, zero)
        return dx, gy.astype(skip_dt.dtype), s2, s1, None

    s1 = s1.reshape(c)
    s2 = s2.reshape(c)
    dx = dx.astype(dt)
    dskip = dskip.astype(skip_dt.dtype)
    a_dt = (scale * rsig).astype(dt)
    gy_head_a = jnp.where(out[:k].astype(jnp.float32) > 0.0,
                          g[:k].astype(dt), 0).astype(dt) * a_dt
    head = _head_correction(x[:k], gy_head_a, s1, s2, gmean, gvar, scale,
                            mean, rsig, m, dt)
    dx = jax.lax.dynamic_update_slice_in_dim(dx, head.astype(dt), 0, 0)
    return dx, dskip, s2, s1, None


subset_bn_add_relu.defvjp(_bn_add_relu_fwd, _bn_add_relu_bwd)


# ---------------------------------------------------------------------------
# Public op 3: subset-BN alone (downsample position — no ReLU after).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def subset_bn_only(x: Array, scale: Array, bias: Array, shift: Array,
                   k: int, eps: float, apply_dtype,
                   interpret: bool = False, impl: str = "pallas"):
    """subset_bn(x) with the single-pass backward (no activation).
    Same contract as ops.subset_bn.subset_bn_apply; unlike that (slower,
    concatenate-based) formulation the whole tail dx is one kernel pass."""
    mean, var = _bn_stats(x, shift, k, eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    return y, mean, var


def _bn_only_fwd(x, scale, bias, shift, k, eps, apply_dtype, interpret,
                 impl):
    mean, var = _bn_stats(x, shift, k, eps)
    rsig = jax.lax.rsqrt(var + eps)
    y = _bn_apply(x, scale, bias, mean, var, eps, apply_dtype)
    return (y, mean, var), (x, scale, mean, rsig)


def _bn_only_bwd(k, eps, apply_dtype, interpret, impl, res, cots):
    x, scale, mean, rsig = res
    g, gmean, gvar = cots
    c = x.shape[-1]
    a32 = scale * rsig

    if impl == "xla_mask":
        _, s1, s2 = _xla_bwd_norelu(g, x.astype(g.dtype), a32, mean, rsig)
    elif impl == "xla":
        dx, s1, s2 = _xla_bwd_norelu(g, x.astype(g.dtype), a32, mean,
                                     rsig)
    else:
        dx, s1, s2 = _run_bwd(_bwd_kernel_norelu, (g, x.astype(g.dtype)),
                              (a32, mean, rsig), 1, interpret)
    s1 = s1.reshape(c)
    s2 = s2.reshape(c)

    m = _elems_per_channel(x.shape, k)
    dt = x.dtype

    if impl == "xla_mask":
        zero = jnp.zeros((), dt)
        corr = _head_correction(x, zero, s1, s2, gmean, gvar, scale,
                                mean, rsig, m, dt)
        dx = (g * a32.astype(g.dtype)).astype(dt) \
            + jnp.where(_row_mask(x.shape, k), corr, zero)
        return dx, s2, s1, None

    dx = dx.astype(dt)
    gy_head_a = g[:k].astype(dt) * (scale * rsig).astype(dt)
    head = _head_correction(x[:k], gy_head_a, s1, s2, gmean, gvar, scale,
                            mean, rsig, m, dt)
    dx = jax.lax.dynamic_update_slice_in_dim(dx, head.astype(dt), 0, 0)
    return dx, s2, s1, None


subset_bn_only.defvjp(_bn_only_fwd, _bn_only_bwd)
