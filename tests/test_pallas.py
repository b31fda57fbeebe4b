"""Pallas-kernel correctness tests (interpret mode on the CPU platform)
against the XLA reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.ops.losses import nt_xent_loss
from simclr_tpu.ops.pallas.ntxent import nt_xent_loss_pallas, supports


def rand_z(seed, n=16, d=128):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, d).astype(np.float32),
            rng.randn(n, d).astype(np.float32))


class TestNtXentPallas:
    @pytest.mark.parametrize("temperature", [0.1, 0.5, 1.0])
    def test_matches_xla_forward(self, temperature):
        z1, z2 = rand_z(0)
        ref_loss, ref_acc = nt_xent_loss(z1, z2, temperature)
        loss, acc = nt_xent_loss_pallas(
            jnp.asarray(z1), jnp.asarray(z2), temperature, interpret=True)
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(acc), float(ref_acc), atol=1e-4)

    def test_matches_xla_forward_unnormalized(self):
        z1, z2 = rand_z(1)
        ref_loss, _ = nt_xent_loss(z1, z2, 0.5, normalize=False)
        loss, _ = nt_xent_loss_pallas(
            jnp.asarray(z1), jnp.asarray(z2), 0.5, normalize=False,
            interpret=True)
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla(self):
        z1, z2 = rand_z(2, n=8)

        def xla_loss(a, b):
            return nt_xent_loss(a, b, 0.5)[0]

        def pallas_loss(a, b):
            return nt_xent_loss_pallas(a, b, 0.5, interpret=True)[0]

        g_ref = jax.grad(xla_loss, argnums=(0, 1))(
            jnp.asarray(z1), jnp.asarray(z2))
        g_pal = jax.grad(pallas_loss, argnums=(0, 1))(
            jnp.asarray(z1), jnp.asarray(z2))
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-6)

    def test_supports_constraints(self):
        assert supports(512, 128)
        assert supports(16, 256)
        assert not supports(16, 100)   # lanes
        assert not supports(6, 128)    # 2N % 8

    def test_supports_vmem_budget(self):
        """The kernel holds two 2Nx2N f32 buffers in VMEM; batch sizes whose
        similarity matrix exceeds the budget must be rejected so the caller
        falls back to XLA instead of failing Mosaic compilation."""
        assert supports(512, 128)          # 2N=1024: ~9 MB live, fits
        assert not supports(1024, 128)     # 2N=2048: >32 MB, must reject
        assert not supports(2048, 128)

    def test_large_batch_falls_back_to_xla(self):
        """contrastive_fn must select the XLA path for VMEM-overflow
        batches and still compute the correct loss."""
        from simclr_tpu.config import Config, TrainConfig
        from simclr_tpu.train.pretrain import contrastive_fn

        cfg = Config(train=TrainConfig(batch_size=2048))
        fn = contrastive_fn(cfg)  # must not pick the Pallas kernel
        z1, z2 = rand_z(4, n=32)  # small shapes: we test selection, not size
        loss, acc = fn(jnp.asarray(z1), jnp.asarray(z2))
        ref_loss, _ = nt_xent_loss(z1, z2, cfg.train.temperature)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    def test_works_inside_jit_and_grad_pipeline(self):
        """End-to-end: a tiny parameterized projection trained one step."""
        z1, z2 = rand_z(3, n=8)
        w = jnp.eye(128) + 0.01

        @jax.jit
        def step(w):
            def loss_fn(w):
                loss, _ = nt_xent_loss_pallas(
                    z1 @ w, z2 @ w, 0.5, interpret=True)
                return loss

            l, g = jax.value_and_grad(loss_fn)(w)
            return l, w - 0.1 * g

        l0, w1 = step(w)
        l1, _ = step(w1)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)
