"""Fused NT-Xent as a Pallas TPU kernel.

The contrastive "scale axis" of SimCLR is the 2Nx2N similarity matrix
(SURVEY.md §5); this kernel fuses everything downstream of the projection
head into a single VMEM-resident pass: one z @ z.T matmul on the MXU,
temperature scaling, self-similarity masking, a numerically-stable row
log-sum-exp, the positive-pair log-probabilities, and the auxiliary-task
correctness bits — with a custom-VJP backward kernel that recomputes the
softmax from z (cheaper than round-tripping the 4 MB logits through HBM)
and emits dz = (G + G^T) @ z in one more MXU pass.

Equivalence to the reference layout (objective.py:35-49): the reference
builds logits [[ab, aa], [bb, ba]] with labels arange(2N); that is a column
permutation of the full similarity matrix S of concat([z1, z2]) with the
self-diagonal masked and positives at column (i + N) mod 2N. Cross-entropy
and argmax accuracy are invariant under column permutation, so loss and
accuracy match bit-for-bit (float tolerance) — verified against the XLA
implementation in tests/test_pallas.py.

Inputs must be L2-normalized OUTSIDE the kernel when cosine similarity is
wanted (XLA fuses that into the projection head's epilogue); keeping the
normalization out of the kernel keeps the custom VJP a plain matmul.

Shape constraints (TPU tiling): feature dim D a multiple of 128 (lanes),
2N a multiple of 8 (f32 sublanes). The public wrapper falls back to the XLA
implementation otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simclr_tpu.ops.losses import VERY_LARGE_NUM, l2_normalize

NEG = -VERY_LARGE_NUM


def _fwd_kernel(z_ref, inv_t_ref, row_loss_ref, correct_ref, lse_ref):
    """One program: full 2N x 2N similarity + masked CE statistics.

    Outputs per-row loss, per-row correctness (1.0 / 0.0), and the row
    log-sum-exp (saved as the residual for the backward kernel).
    """
    z = z_ref[:]                                   # (2N, D) f32
    n2 = z.shape[0]
    inv_t = inv_t_ref[0]

    s = jax.lax.dot_general(
        z, z,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t                                      # (2N, 2N)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
    s = jnp.where(rows == cols, NEG, s)            # mask self-similarity

    # Positive of row i sits at column (i + N) mod 2N.
    half = n2 // 2
    pos_col = (rows + half) % n2
    is_pos = cols == pos_col

    row_max = jnp.max(s, axis=1, keepdims=True)
    exp_s = jnp.exp(s - row_max)
    lse = jnp.log(jnp.sum(exp_s, axis=1, keepdims=True)) + row_max  # (2N,1)
    pos_logit = jnp.sum(jnp.where(is_pos, s, 0.0), axis=1,
                        keepdims=True)

    row_loss_ref[:] = lse - pos_logit              # -log softmax at positive
    lse_ref[:] = lse
    # Correct iff the positive holds the row argmax.
    s_argmax = jnp.max(s, axis=1, keepdims=True)
    correct_ref[:] = (pos_logit >= s_argmax).astype(jnp.float32)


def _bwd_kernel(z_ref, lse_ref, inv_t_ref, g_ref, dz_ref):
    """dz for loss = mean(row_loss): recompute P from (z, lse), then
    dz = g * inv_t/(2N) * (G + G^T) @ z with G = P - onehot(pos)."""
    z = z_ref[:]
    n2 = z.shape[0]
    inv_t = inv_t_ref[0]
    g = g_ref[0]

    s = jax.lax.dot_general(
        z, z,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * inv_t
    rows = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2, n2), 1)
    s = jnp.where(rows == cols, NEG, s)

    p = jnp.exp(s - lse_ref[:])                    # softmax rows
    half = n2 // 2
    y = (cols == (rows + half) % n2).astype(jnp.float32)
    grad_s = p - y                                 # (2N, 2N)
    grad_s = grad_s + grad_s.T                     # both matmul operands

    dz_ref[:] = jax.lax.dot_general(
        grad_s, z,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (g * inv_t / n2)


def _pallas_fwd(z: jnp.ndarray, inv_t: jnp.ndarray, interpret: bool):
    n2 = z.shape[0]
    row_loss, correct, lse = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n2, 1), jnp.float32),
            jax.ShapeDtypeStruct((n2, 1), jnp.float32),
            jax.ShapeDtypeStruct((n2, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(z, inv_t)
    return row_loss, correct, lse


def _pallas_bwd(z, lse, inv_t, g, interpret: bool):
    n2 = z.shape[0]
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n2, z.shape[1]), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z, lse, inv_t, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _nt_xent_core(z, inv_t, interpret):
    row_loss, correct, _ = _pallas_fwd(z, inv_t, interpret)
    return jnp.mean(row_loss), 100.0 * jnp.mean(correct)


def _core_fwd(z, inv_t, interpret):
    row_loss, correct, lse = _pallas_fwd(z, inv_t, interpret)
    out = (jnp.mean(row_loss), 100.0 * jnp.mean(correct))
    return out, (z, lse, inv_t)


def _core_bwd(interpret, res, cotangents):
    z, lse, inv_t = res
    g_loss, _ = cotangents  # accuracy is non-differentiable
    dz = _pallas_bwd(z, lse, inv_t,
                     jnp.reshape(g_loss, (1,)).astype(jnp.float32),
                     interpret)
    return dz, None


_nt_xent_core.defvjp(_core_fwd, _core_bwd)


# Leave headroom under the ~16 MB/core v5e VMEM for Mosaic's own scratch.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def supports(n: int, d: int) -> bool:
    """TPU tiling constraints (lanes 128 / f32 sublanes 8) AND a VMEM
    budget: both kernels hold two 2Nx2N f32 buffers (S and exp/softmax of
    S) plus two (2N, D) operand/output buffers live at once. Callers fall
    back to the XLA implementation when this returns False, so there must
    be NO shape for which supports() says yes but the kernel cannot
    compile — batch 1024 (2N=2048, 32 MB of similarity alone) must be
    rejected here, not die in Mosaic."""
    n2 = 2 * n
    if n2 % 8 != 0 or d % 128 != 0:
        return False
    live_bytes = 2 * (n2 * n2 * 4) + 2 * (n2 * d * 4)
    return live_bytes <= _VMEM_BUDGET_BYTES


def nt_xent_loss_pallas(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    temperature: float = 1.0,
    normalize: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ops.losses.nt_xent_loss (no `weight`
    support — the training path never passes one, reference
    utils/model_utils.py:115)."""
    if normalize:
        z1 = l2_normalize(z1, axis=1)
        z2 = l2_normalize(z2, axis=1)
    z = jnp.concatenate([z1, z2], axis=0).astype(jnp.float32)
    inv_t = jnp.full((1,), 1.0 / temperature, jnp.float32)
    return _nt_xent_core(z, inv_t, interpret)
