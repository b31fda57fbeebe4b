#!/usr/bin/env python
"""Ablate the pretrain step to size its cost buckets on the real chip.

The per-op profile (scripts/profile_step.py) bins by HLO instruction
name, and XLA names conv-root fusions after their epilogue ops
(`multiply_reduce_fusion.N` can be a conv dgrad that also emits a BN
mean-gradient sum), so family totals misattribute conv time to
reductions. This script sizes buckets the robust way — by ablation,
timing the same epoch-scan with stages removed:

  full        augment -> forward -> NT-Xent -> backward -> Adam
  noaug       two fixed pre-normalized views (no augmentation kernels)
  fwd_only    no gradient: forward + loss only (still augmented)
  aug_only    augmentation alone (views reduced to a scalar to keep XLA
              from eliding the kernels; the reduce adds one read-pass)

Differences between rows bound each stage's marginal cost — on an
HBM-bound step marginal cost is what matters (stages share streams, so
isolated microbenchmarks overstate).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--only", nargs="*", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from simclr_tpu.config import Config, TrainConfig
    from simclr_tpu.data.datasets import load_dataset
    from simclr_tpu.data.pipeline import epoch_permutation
    from simclr_tpu.ops.augment import augment_test, augment_train_pair
    from simclr_tpu.train.pretrain import (build_engine, contrastive_fn,
                                           init_simclr)

    cfg = Config(train=TrainConfig(batch_size=args.batch, save_ckpt=False))
    images_np, _ = load_dataset("cifar10", "train", "data")
    images = jax.device_put(images_np)
    n = images.shape[0]

    model, state, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)
    loss_fn = contrastive_fn(cfg)
    aug, ds_cfg = cfg.augment, cfg.dataset

    def scan_steps(step_fn, state, key):
        keys = jax.random.split(key, args.steps)
        idx = epoch_permutation(key, n, args.batch)[:args.steps]

        def body(carry, xs):
            i, k = xs
            return step_fn(carry, jnp.take(images, i, axis=0), k)
        return jax.lax.scan(body, state, (idx, keys))

    def full(state, key):
        idx = epoch_permutation(key, n, args.batch)[:args.steps]
        state, (loss, _) = engine.train_epoch(state, images, idx, key)
        return state, loss[-1]

    # --- noaug: identical training math on two fixed normalized views.
    def train_core(state, v1, v2, k_drop):
        from simclr_tpu.train.pretrain import _forward_pair

        def objective(params):
            z1, z2, new_stats = _forward_pair(
                model, params, state.batch_stats, v1, v2, k_drop,
                train=True, two_pass=False)
            loss, acc = loss_fn(z1, z2)
            return loss, (acc, new_stats)

        (loss, (acc, stats)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda q, u: q + u.astype(q.dtype), state.params, updates)
        return state.replace(params=new_params, batch_stats=stats,
                             opt_state=new_opt, step=state.step + 1), loss

    @partial(jax.jit, donate_argnums=0)
    def noaug_epoch(state, key):
        def step(carry, batch, k):
            v = augment_test(batch, ds_cfg).astype(jnp.bfloat16)
            carry, loss = train_core(carry, v, v, k)
            return carry, loss
        return scan_steps(step, state, key)

    @jax.jit
    def fwd_epoch(state, key):
        def step(carry, batch, k):
            k_aug, k_drop = jax.random.split(k)
            v1, v2 = augment_train_pair(k_aug, batch, aug, ds_cfg)
            from simclr_tpu.train.pretrain import _forward_pair
            z1, z2, _ = _forward_pair(
                model, carry.params, carry.batch_stats, v1, v2, k_drop,
                train=True, two_pass=False)
            loss, _ = loss_fn(z1, z2)
            return carry, loss
        return scan_steps(step, state, key)

    @jax.jit
    def aug_epoch(state, key):
        def step(carry, batch, k):
            k_aug, _ = jax.random.split(k)
            v1, v2 = augment_train_pair(k_aug, batch, aug, ds_cfg)
            return carry, (jnp.sum(v1, dtype=jnp.float32)
                           + jnp.sum(v2, dtype=jnp.float32))
        return scan_steps(step, state, key)

    runs = {
        "full": full,
        "noaug": lambda s, k: (lambda r: (r[0], r[1][-1]))(noaug_epoch(s, k)),
        "fwd_only": lambda s, k: (lambda r: (s, r[1][-1]))(fwd_epoch(s, k)),
        "aug_only": lambda s, k: (lambda r: (s, r[1][-1]))(aug_epoch(s, k)),
    }
    if args.only:
        runs = {k: runs[k] for k in args.only}

    for name, fn in runs.items():
        st = state
        st, _ = fn(st, jax.random.key(1))      # compile
        st, _ = fn(st, jax.random.key(2))      # warm
        times = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            st, last = fn(st, jax.random.fold_in(jax.random.key(3), rep))
            jax.block_until_ready(last)
            times.append((time.perf_counter() - t0) / args.steps * 1e3)
        med = float(np.median(times))
        print(f"{name:9s} {med:7.2f} ms/step "
              f"({1e3 / med:5.2f} steps/s) reps_ms="
              f"{[round(t, 2) for t in times]} last={float(last):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
