"""Pallas 3x3 stride-1 SAME conv for 64-channel stages (layer1).

STATUS: measured NEGATIVE result, kept off by default (config
`model.conv64_pallas`) as the documented closure of the round-4
roofline's last open pocket. Standalone on v5e at batch 1024
(30-rep epoch-scan timing, /tmp-harness reproduced in
tests/test_conv64.py shapes):

    xla fwd 0.794 ms   pallas fwd 0.967 ms
    xla wgrad 0.916 ms pallas wgrad 0.934 ms

The step-profile buckets that motivated the attack ("layer1 conv2
1.46-2.18x floor", 5.76 ms of a 99.9 ms step — scripts/profile_step.py)
turn out to be an ATTRIBUTION artifact: XLA's conv2 fusions carry the
BN-apply/ReLU chain bytes and neighboring epilogue work, and the convs
alone run at ~0.8-0.93 ms — their real floor given the 64-channel MXU
underfill, which this kernel's restructured contraction does not beat
(Mosaic's per-dot overheads eat the K=192 fill win). Swapping a custom
call in would merely push the fused chain work into worse-placed
standalone passes — the same lesson as rounds 1-4's six fused-kernel
negatives (ARCHITECTURE.md §5). BN backward AND layer1 conv efficiency
are now both measured closed; the step is at hardware speed-of-light
for its op decomposition.

Why the kernel was plausible: layer1's C=64 3x3 convs underfill the
128-wide MXU in both contraction (C_in=64) and output (C_out=64)
dimensions. This kernel restructures the contraction so the MXU
sees K = 3*64 = 192 (the 3x3's dx taps merged with C_in) and N = the
BATCH on the 128 lanes (v5e's own layout choice for C<=128 tensors is
batch-minor, {0,3,2,1}):

  Y[h, w, co, n] = sum_{dy} W_dy[(dx,ci), co] . X[h+dy-1, (w-1..w+1, ci), n]

i.e. per output row h and per w, three [192,64]^T x [192,N_t] MXU dots
(dy = 0..2), where the [3,64,N_t] -> [192,N_t] window view is FREE in
VMEM (dx-adjacent columns of one row slab are sublane-tile-contiguous).

Data movement. The kernel operates on the TRANSPOSED view
x_t = transpose(x_nhwc, (1, 2, 3, 0)) of shape [H, W, C, N]: its default
(row-major) layout is byte-identical to the {0,3,2,1} batch-minor layout
XLA already prefers for C=64 NHWC tensors, so the transposes bracketing
the kernel are layout relabels, not copies (verified in the optimized
HLO; see scripts/dump_hlo.py). Input rows stream through a 4-slot VMEM
ring ([4, W+2, 64, N_t] with permanently-zero W-halo columns) via manual
double-buffered DMA — BlockSpec halos cannot express a 1-row overlap
without re-fetching every row 3x. Out-of-range rows (h = -1, H) are
zero-filled slots, which makes the SAME padding exact without masks.

Backward: dx is the same kernel with the kernel tensor rotated 180
degrees and I/O-swapped (a 3x3 s1 conv's input-gradient IS that conv);
dw has its own kernel contracting over the batch lanes (K = 256 full)
with N = 192 — see _wgrad_kernel (WGRAD_IMPL selects it vs XLA's).

Wired into models/resnet.Bottleneck for layer1 conv2 when
`conv64_pallas=True` (config: model.conv64_pallas); interpret-mode
value/gradient parity in tests/test_conv64.py. Reference counterpart:
the torchvision Bottleneck's conv2 used by
/root/reference/models/resnets.py:8-36.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64          # fixed channel count (in == out == 64)
LANES = 256     # batch lanes per grid step (2 lane-tiles; N % LANES == 0)


def supports(shape, dtype) -> bool:
    """True when (N,H,W,C) NHWC `shape` can run through this kernel."""
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    return (c == C and n % LANES == 0 and h >= 3 and w >= 3
            and dtype == jnp.bfloat16)


def _kernel(wk_ref, x_hbm, out_ref, ring, sems, *, H, W):
    """Grid (N/LANES, H): one output row of one batch tile per step.

    wk_ref: [3, 3*C, C]  f32->bf16 host-prepped (dy, dx*ci, co)
    x_hbm:  [H, W, C, N] bf16 (memory_space=ANY; manually DMA'd)
    out_ref:[1, W, C, LANES] VMEM block of the [H, W, C, N] output
    ring:   [4, W+2, C, LANES] VMEM scratch (cols 0 and W+1 stay zero)
    sems:   4 DMA semaphores
    """
    nt = pl.program_id(0)
    h = pl.program_id(1)

    def dma(row, slot):
        return pltpu.make_async_copy(
            x_hbm.at[row, :, :, pl.ds(nt * LANES, LANES)],
            ring.at[slot, pl.ds(1, W)],
            sems.at[slot],
        )

    @pl.when(h == 0)
    def _prologue():
        # Zero the whole ring once per batch tile: establishes the
        # W-halo zero columns (DMAs only ever write [1:W+1]) and the
        # zero top row (slot 3 stands in for row -1).
        ring[...] = jnp.zeros_like(ring)
        dma(0, 0).start()
        dma(1, 1).start()
        dma(0, 0).wait()
        dma(1, 1).wait()

    @pl.when(jnp.logical_and(h > 0, h + 1 < H))
    def _wait_next():
        # Row h+1 was started at step h-1 — except at h == H-1, where
        # step H-2 zero-filled the slot instead of issuing a DMA (row H
        # is outside the image); waiting there would deadlock on a
        # semaphore that is never signaled.
        dma(h + 1, (h + 1) % 4).wait()

    # Start the fetch for step h+1's window (row h+2). Its slot held row
    # h-2, consumed at step h-1. Rows past the image stay zero: the slot
    # last held row h-2 <= H-2... except slot reuse would leave stale
    # data — so out-of-range targets are re-zeroed explicitly.
    @pl.when(h + 2 < H)
    def _prefetch():
        dma(h + 2, (h + 2) % 4).start()

    @pl.when(h + 2 == H)
    def _zero_tail():
        # Row H (needed by the last output row) must read as zeros; its
        # slot currently holds row H-4's data.
        ring[H % 4] = jnp.zeros_like(ring[H % 4])

    w0 = wk_ref[0]
    w1 = wk_ref[1]
    w2 = wk_ref[2]
    s0 = (h + 3) % 4   # slot of row h-1  (h==0: slot 3, zeroed = row -1)
    s1 = h % 4         # slot of row h
    s2 = (h + 1) % 4   # slot of row h+1 (h==H-1: zeroed above)

    # Static w loop (Mosaic's fori lowering only supports full unroll).
    for w in range(W):
        def tap(wk, slot):
            win = ring[slot, pl.ds(w, 3)]          # [3, C, LANES]
            win = win.reshape(3 * C, LANES)        # free: tile-contiguous
            return jax.lax.dot_general(
                wk, win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = tap(w0, s0) + tap(w1, s1) + tap(w2, s2)   # [C, LANES]
        out_ref[0, w] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv_hwcn(x_t, wk, interpret=False):
    """x_t [H, W, C, N] bf16, wk [3, 3C, C] bf16 -> y_t [H, W, C, N]."""
    H, W, c, N = x_t.shape
    assert c == C and N % LANES == 0
    grid = (N // LANES, H)
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, W, C, LANES), lambda nt, h: (h, 0, 0, nt),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, C, N), x_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, W + 2, C, LANES), x_t.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(wk, x_t)


def _wgrad_kernel(x_hbm, g_ref, out_ref, ring, sems, *, H, W):
    """Weight gradient, grid (N/LANES, H), accumulating into the single
    revisited output block.

    x_hbm: [H, W, C, N] bf16 (ANY; manual ring DMA, same scheme as fwd)
    g_ref: [1, W, C, LANES] VMEM block of the cotangent (auto-pipelined)
    out_ref: [3, C, 3*C] f32 — dW[dy][c_out, (dx, c_in)]; the contraction
      runs over the batch LANES (K = 256, the full MXU) with N = 192,
      where XLA's own wgrad emitter is stuck with a [64, 64]-shaped
      output (measured 2.18x floor at batch 1024 — the bucket this
      kernel deletes).
    """
    nt = pl.program_id(0)
    h = pl.program_id(1)

    def dma(row, slot):
        return pltpu.make_async_copy(
            x_hbm.at[row, :, :, pl.ds(nt * LANES, LANES)],
            ring.at[slot, pl.ds(1, W)],
            sems.at[slot],
        )

    @pl.when(jnp.logical_and(nt == 0, h == 0))
    def _zero_out():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(h == 0)
    def _prologue():
        ring[...] = jnp.zeros_like(ring)
        dma(0, 0).start()
        dma(1, 1).start()
        dma(0, 0).wait()
        dma(1, 1).wait()

    @pl.when(jnp.logical_and(h > 0, h + 1 < H))
    def _wait_next():
        # See the forward kernel: no DMA exists for row H.
        dma(h + 1, (h + 1) % 4).wait()

    @pl.when(h + 2 < H)
    def _prefetch():
        dma(h + 2, (h + 2) % 4).start()

    @pl.when(h + 2 == H)
    def _zero_tail():
        ring[H % 4] = jnp.zeros_like(ring[H % 4])

    slots = ((h + 3) % 4, h % 4, (h + 1) % 4)   # rows h-1, h, h+1

    z = jnp.zeros((C, 3 * C), jnp.float32)
    accs = [z, z, z]
    # Static w loop (Mosaic's fori lowering only supports full unroll).
    for w in range(W):
        gw = g_ref[0, w]                           # [C, LANES]
        for dy in range(3):
            win = ring[slots[dy], pl.ds(w, 3)]     # [3, C, LANES]
            win = win.reshape(3 * C, LANES)
            accs[dy] = accs[dy] + jax.lax.dot_general(
                gw, win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] += accs[0]
    out_ref[1] += accs[1]
    out_ref[2] += accs[2]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wgrad_hwcn(x_t, g_t, interpret=False):
    """x_t, g_t [H, W, C, N] bf16 -> dW [3, 3, C_in, C_out] f32."""
    H, W, c, N = x_t.shape
    assert c == C and N % LANES == 0
    grid = (N // LANES, H)
    dwt = pl.pallas_call(
        functools.partial(_wgrad_kernel, H=H, W=W),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, W, C, LANES), lambda nt, h: (h, 0, 0, nt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, C, 3 * C), lambda nt, h: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, C, 3 * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, W + 2, C, LANES), x_t.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(x_t, g_t)
    # [dy, co, (dx, ci)] -> [dy, dx, ci, co] HWIO
    return jnp.transpose(dwt.reshape(3, C, 3, C), (0, 2, 3, 1))


def _prep_w(w):
    """[3, 3, C_in, C_out] HWIO -> [3(dy), 3*C_in (dx-major), C_out]."""
    return w.reshape(3, 3 * C, C)


def _rot180_swap(w):
    """HWIO kernel of the input-gradient conv: rotate the window 180
    degrees and swap in/out channels."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_c64(x, w, interpret=False):
    """3x3 stride-1 SAME conv, NHWC x [N,H,W,64] bf16, HWIO w [3,3,64,64].

    Forward and input-gradient run the batch-on-lanes Pallas kernel
    above; the weight gradient keeps XLA's native path (already at its
    floor). Numerics: bf16 inputs, f32 MXU accumulation, bf16 output —
    identical contract to lax.conv_general_dilated on this shape.
    """
    return _fwd_impl(x, w, interpret)


def _fwd_impl(x, w, interpret):
    x_t = jnp.transpose(x, (1, 2, 3, 0))
    y_t = _conv_hwcn(x_t, _prep_w(w.astype(x.dtype)), interpret)
    return jnp.transpose(y_t, (3, 0, 1, 2))


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _fwd(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


WGRAD_IMPL = "pallas"   # 'pallas' | 'xla' (A/B hook; pallas measured faster)


def _bwd(interpret, res, g):
    x, w = res
    dx = _fwd_impl(g, _rot180_swap(w).astype(g.dtype), interpret)
    g = g.astype(x.dtype)
    if WGRAD_IMPL == "pallas":
        dw = _wgrad_hwcn(jnp.transpose(x, (1, 2, 3, 0)),
                         jnp.transpose(g, (1, 2, 3, 0)), interpret)
        dw = dw.astype(w.dtype)
    else:
        _, vjp = jax.vjp(lambda wv: _xla_conv(x, wv), w)
        (dw,) = vjp(g)
    return dx, dw


conv3x3_c64.defvjp(_fwd, _bwd)
