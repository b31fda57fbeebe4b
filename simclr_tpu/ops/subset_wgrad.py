"""Subset weight gradients for convolutions.

The round-5 profile shows the step at 1.03x its decomposition floor with
~18 ms/step (of 99.9) spent in weight-gradient conv fusions — separate
passes that re-read the saved activation AND the cotangent from HBM and
contract them over all N*H*W rows. Unlike the subset-BN-backward idea
(removed in round 3: estimator noise there re-enters dx and compounds
multiplicatively through ~50 layers of backward chain), a subsampled
WEIGHT gradient is depth-safe: dw goes only to the optimizer, never into
dx, so per-layer estimator noise stays per-layer. Statistically it is
exactly "compute this conv's weight gradient from a batch of k instead
of n" — unbiased over the per-step batch shuffle (the reference's own
weight updates average 8 micro-batches of 64, i.e. 512-sample weight
gradients at effective batch 512; utils/model_utils.py:109-123).

``conv_subset_wgrad`` is a custom-VJP ``lax.conv_general_dilated``
(NHWC/HWIO) whose backward emits:

  * dx — the exact transpose conv, bit-identical to autodiff (it is
    literally ``jax.vjp`` of the same primal), so the backward data path
    the rest of the graph fuses against is unchanged;
  * dw — the standard wgrad contraction evaluated on a CONTIGUOUS
    centered row slice ``x[(n-k)//2 : (n-k)//2 + k]`` scaled by n/k.
    Centered so the slice spans the two concatenated augmentation views
    (rows [0,n/2) are view 1, [n/2,n) are view 2 — train/pretrain.py):
    k/2 samples of each view enter the estimate. A static contiguous
    slice keeps the read a strided window (no gather) and deletes
    (1 - k/n) of both the bytes and the MXU FLOPs of every wgrad fusion.

``SubsetWgradConv`` is the flax module drop-in: parameter tree identical
to ``nn.Conv`` ('kernel', (kh, kw, in, out), f32 storage, cast to
``dtype`` at call), so checkpoints/exports interchange with the plain
path and ``wgrad_fraction=1.0`` IS the plain path (no custom VJP at all).

Gated like every other deviation: scripts/parity_run.py variant
'swgrad', scripts/bench_variants.py 'swgrad*'.
"""

from functools import partial
from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _conv(x, w, strides, padding):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv_subset_wgrad(x, w, strides, padding, k_rows):
    """NHWC/HWIO conv; exact forward/dx, dw from k_rows centered rows."""
    return _conv(x, w, strides, padding)


def _csw_fwd(x, w, strides, padding, k_rows):
    return _conv(x, w, strides, padding), (x, w)


def _csw_bwd(strides, padding, k_rows, res, gy):
    x, w = res
    _, vjp_x = jax.vjp(lambda x_: _conv(x_, w, strides, padding), x)
    dx, = vjp_x(gy)
    n = x.shape[0]
    k = min(k_rows, n)
    if k >= n:
        _, vjp_w = jax.vjp(lambda w_: _conv(x, w_, strides, padding), w)
        dw, = vjp_w(gy)
    else:
        s0 = (n - k) // 2
        xs = lax.slice_in_dim(x, s0, s0 + k, axis=0)
        gs = lax.slice_in_dim(gy, s0, s0 + k, axis=0)
        _, vjp_w = jax.vjp(lambda w_: _conv(xs, w_, strides, padding), w)
        dw, = vjp_w(gs)
        dw = (dw * (n / k)).astype(w.dtype)
    return dx, dw


conv_subset_wgrad.defvjp(_csw_fwd, _csw_bwd)


class SubsetWgradConv(nn.Module):
    """``nn.Conv(use_bias=False)`` drop-in with subset weight gradients.

    Same parameter name/shape/init as nn.Conv, so the two interchange in
    checkpoints and torch ports. ``wgrad_fraction=1.0`` short-circuits to
    the plain (non-custom-VJP) conv.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()
    wgrad_fraction: float = 0.25
    min_rows: int = 64

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        pad = self.padding
        if isinstance(pad, str):
            pad_arg = pad
        else:
            pad_arg = tuple((int(a), int(b)) for a, b in pad)
        n = x.shape[0]
        k = min(max(int(n * self.wgrad_fraction), self.min_rows), n)
        if k >= n:
            return _conv(x, kernel, self.strides, pad_arg)
        return conv_subset_wgrad(x, kernel, self.strides, pad_arg, k)
