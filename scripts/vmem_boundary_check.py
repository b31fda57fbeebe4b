#!/usr/bin/env python
"""On-chip boundary check for the Pallas NT-Xent VMEM guard.

`ops/pallas/ntxent.supports()` models the kernels' live VMEM (two 2Nx2N
f32 buffers + two (2N, D) operands) against a 12 MB budget — a hand
model, while Mosaic's actual live-range can differ. This script runs ON
THE REAL TPU:

  1. the largest batch the guard accepts at d=128 — must compile AND run
     (fwd + grad), finite outputs;
  2. the smallest batch it rejects — must take the XLA fallback in
     nt_xent_auto (and the raw kernel is expected to fail or be refused,
     which is exactly why the guard exists).

Exit code 0 = the VMEM model is validated at the boundary on this chip.
Run from the verify/bench flow (VERDICT r2 item 7).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.ops import pallas as pl_ops
from simclr_tpu.ops.pallas import ntxent


def main() -> None:
    d = 128
    # Largest accepted n (batch per view) at d=128, scanning down in
    # sublane steps (supports needs 2n % 8 == 0 -> n % 4 == 0).
    n_ok = max(n for n in range(4, 4097, 4) if ntxent.supports(n, d))
    n_bad = next(n for n in range(n_ok + 4, 8192, 4)
                 if not ntxent.supports(n, d))
    print(f"guard boundary at d={d}: accepts n={n_ok}, rejects n={n_bad}")

    key = jax.random.key(0)
    z1 = jax.random.normal(key, (n_ok, d), jnp.float32)
    z2 = jax.random.normal(jax.random.key(1), (n_ok, d), jnp.float32)

    @jax.jit
    def loss_and_grad(z1, z2):
        def f(z1):
            loss, acc = ntxent.nt_xent_loss_pallas(z1, z2, temperature=0.5)
            return loss, acc
        (loss, acc), g = jax.value_and_grad(f, has_aux=True)(z1)
        return loss, acc, g

    loss, acc, g = loss_and_grad(z1, z2)
    loss = float(np.asarray(loss))
    gnorm = float(np.linalg.norm(np.asarray(g)))
    assert np.isfinite(loss) and np.isfinite(gnorm), (loss, gnorm)
    print(f"accepted boundary shape n={n_ok}: kernel compiled and ran "
          f"on {jax.devices()[0].device_kind}: loss={loss:.4f} "
          f"grad-norm={gnorm:.4f}")

    # Rejected side: the auto selector must fall back to XLA (and agree
    # with the reference formulation there).
    z1b = jax.random.normal(key, (n_bad, d), jnp.float32)
    z2b = jax.random.normal(jax.random.key(1), (n_bad, d), jnp.float32)
    assert not ntxent.supports(n_bad, d)
    import dataclasses

    from simclr_tpu.config import Config, TrainConfig
    from simclr_tpu.ops.losses import nt_xent_loss
    from simclr_tpu.train.pretrain import contrastive_fn

    # The production selector (train/pretrain.contrastive_fn) must pick
    # the XLA path for this shape.
    cfg = Config(train=TrainConfig(batch_size=n_bad))
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                compressed_dim=d))
    loss_auto, _ = jax.jit(contrastive_fn(cfg))(z1b, z2b)
    loss_ref, _ = jax.jit(
        lambda a, b: nt_xent_loss(a, b, temperature=0.5))(z1b, z2b)
    np.testing.assert_allclose(float(np.asarray(loss_auto)),
                               float(np.asarray(loss_ref)), rtol=1e-5)
    print(f"rejected shape n={n_bad}: XLA fallback engaged and matches "
          f"reference formulation (loss={float(np.asarray(loss_auto)):.4f})")
    print("VMEM boundary check: OK")


if __name__ == "__main__":
    main()
