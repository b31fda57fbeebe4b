"""Parity tests for the batch-on-lanes layer1 conv kernel
(ops/pallas/conv64.py) against lax.conv_general_dilated — value,
input gradient, and weight gradient. Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.ops.pallas.conv64 import (
    LANES, conv3x3_c64, supports, _rot180_swap)


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("h,w", [(8, 8), (5, 32)])
def test_forward_matches_xla(h, w):
    kx, kw = jax.random.split(jax.random.key(0))
    x = _rand(kx, (LANES, h, w, 64))
    wk = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) * 0.1
    got = conv3x3_c64(x, wk, True)
    want = _ref_conv(x, wk)
    assert got.dtype == want.dtype
    # Both implementations accumulate in f32 and round once to bf16, but
    # in different summation orders: they agree to 1 bf16 ulp of the f32
    # oracle (measured max |pallas - f32| == max |xla - f32| == 0.031 on
    # this distribution).
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=4e-2)


def test_supports_gate():
    assert supports((LANES, 32, 32, 64), jnp.bfloat16)
    assert not supports((LANES, 32, 32, 128), jnp.bfloat16)
    assert not supports((LANES - 1, 32, 32, 64), jnp.bfloat16)
    assert not supports((LANES, 32, 32, 64), jnp.float32)


def test_rot180_swap_is_conv_transpose_kernel():
    # The input-gradient of conv(x, w) is conv(g, rot180_swap(w)).
    kx, kw, kg = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (4, 6, 6, 64), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32)
    g = jax.random.normal(kg, (4, 6, 6, 64), jnp.float32)
    _, vjp = jax.vjp(lambda xv: _ref_conv(xv, w), x)
    (dx_ref,) = vjp(g)
    dx_rot = _ref_conv(g, _rot180_swap(w))
    np.testing.assert_allclose(np.asarray(dx_rot), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-4)


def test_gradients_match_xla():
    kx, kw, kg = jax.random.split(jax.random.key(2), 3)
    x = _rand(kx, (LANES, 6, 8, 64))
    wk = jax.random.normal(kw, (3, 3, 64, 64), jnp.float32) * 0.1
    g = _rand(kg, (LANES, 6, 8, 64))

    def loss_ours(xv, wv):
        return jnp.sum(conv3x3_c64(xv, wv, True).astype(jnp.float32)
                       * g.astype(jnp.float32))

    def loss_ref(xv, wv):
        return jnp.sum(_ref_conv(xv, wv).astype(jnp.float32)
                       * g.astype(jnp.float32))

    dx_o, dw_o = jax.grad(loss_ours, argnums=(0, 1))(x, wk)
    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    assert dx_o.dtype == dx_r.dtype and dw_o.dtype == dw_r.dtype
    np.testing.assert_allclose(np.asarray(dx_o, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=0, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dw_o), np.asarray(dw_r),
                               rtol=2e-2, atol=2e-1)
