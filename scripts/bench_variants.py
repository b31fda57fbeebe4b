#!/usr/bin/env python
"""A/B-bench pretrain-step variants (fused stages, BN options) on the
real chip. Reuses bench.py's warmed epoch-scan timing; prints one line
per variant. This is the measurement tool behind the fused-bottleneck
auto defaults (train/pretrain.py:init_simclr).

Usage:
  python scripts/bench_variants.py unfused fuse128 fuse256
"""

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VARIANTS = {
    "unfused": {},
    "fuse64": {"fuse_identity_blocks": True, "fuse_min_width": 64},
    "fuse128": {"fuse_identity_blocks": True, "fuse_min_width": 128},
    "fuse256": {"fuse_identity_blocks": True, "fuse_min_width": 256},
    "fuse512": {"fuse_identity_blocks": True, "fuse_min_width": 512},
    "exact_bn": {"bn_stats_fraction": 1.0},
    "folded": {"fold_bn_scales": True},
    # Reference-parity statistics size: the torch reference estimates BN
    # stats from 64-sample micro-batches (utils/model_utils.py:109-114).
    "stats64": {"bn_stats_fraction": 0.0625},
    # The round-1/2 default subset fraction (superseded by stats64).
    "stats25": {"bn_stats_fraction": 0.25},
    # Bandwidth-shaped BN backward (ops/subset_bn.py custom VJP).
    # Measured 6.99 vs 8.77 unfused on v5e: the concatenate-based dx
    # broke fusion — superseded by the bn_relu Pallas kernel below.
    "bnvjp": {"bn_fused_vjp": True},
    "bnvjp_stats64": {"bn_fused_vjp": True, "bn_stats_fraction": 0.0625},
    # Single-pass fused BN(+add)+ReLU backward (ops/pallas/bn_relu.py).
    # 'pallas' = layout-native 2D views; 'xla' = same restructure as
    # plain ops. The first (C-minor reshape) kernel benched 4.81 — the
    # layout transposes around every call cost more than the pass saved.
    "bnrelu": {"bn_relu_fused": True, "bn_relu_impl": "pallas"},
    "bnrelu_xla": {"bn_relu_fused": True, "bn_relu_impl": "xla"},
    # Patch-free dx: the k-sample correction rides the full-row
    # elementwise pass behind an iota mask (no DUS/concat patch pass).
    "bnrelu_mask": {"bn_relu_fused": True, "bn_relu_impl": "xla_mask"},
    "bnrelu_off": {"bn_relu_fused": False},
    # Straight-through subset BN backward (models/norm.py grad_mode):
    # stats stop-gradiented, dscale/dbias from the k-sample estimator —
    # pure autodiff, reductions shrink to k-row slices.
    "stgrad": {"bn_grad_mode": "subset_st"},
    # PERF PROBE ONLY (collapses training): mean stop-gradiented too, to
    # measure the marginal cost of the per-BN full-tensor sum(gy) reduce.
    # Measured 9.09 vs 9.10 stgrad: ZERO — the sums ride conv dgrad
    # epilogues for free (see models/norm.py + ARCHITECTURE.md §5).
    "stgrad_nomean": {"bn_grad_mode": "subset_st_nomean"},
    # subset_st with the surrogate as a full-row iota mask instead of a
    # k-row slice (tile-contiguous streams on batch-minor layouts).
    # Measured 8.04: 16x surrogate traffic beats any tiling win.
    "stgrad_w": {"bn_grad_mode": "subset_st_w"},
    # Round-3 subset_st surrogate form: k-row tensor padded to the full
    # batch and added (models/norm.py st_surrogate). The batch-dim pad
    # blocked conv input fusion on layer1's batch-on-lanes layouts,
    # materializing a standalone 128 MB bn1-relu pass per block. The
    # round-5 default is 'affine' (surrogate folded into [n,1,1,C]
    # affine coefficients — no pad, same value/VJP).
    "st_pad": {"bn_st_surrogate": "pad"},
    # optimization_barrier after each ReLU: splits the backward dgrad
    # conv out of the recomputed mask/scale elementwise chain.
    # Measured 7.26: XLA's giant cross-op fusions win again.
    "barrier": {"relu_barrier": True},
    # Shadow bn3/downsample stats (k-row parameter-shared conv recompute)
    # so the block-output BN apply+add+relu fuses into conv3's epilogue,
    # deleting the raw-output materialize+re-read. Exactly equivalent
    # math (models/resnet.Bottleneck). MEASURED (v5e, batch 1024):
    # 9.61 vs 9.16 steps/s — now the DEFAULT; 'noshadow' is the A/B off.
    "shadow": {"bn3_shadow_stats": True},
    "noshadow": {"bn3_shadow_stats": False},
    # Shadow stats on EVERY conv->BN pair (bn1/bn2/stem too).
    # MEASURED (v5e, batch 1024): 9.02 vs 9.58 shadow — SLOWER. conv1/
    # conv2 outputs feed the next conv, whose backward needs the
    # post-ReLU activation anyway, so the raw-output materialize isn't
    # deletable there; the three extra k-row shadow convs are pure cost.
    # bn3 is the special case: its pre-BN output has no other consumer.
    "shadow_all": {"bn3_shadow_stats": True, "bn12_shadow_stats": True},
    # ReLU backward mask from the OUTPUT (models/resnet.py
    # relu_vjp_from_output): identical math; the backward mask reads the
    # materialized activations instead of forcing XLA to keep/recompute
    # the fused pre-activations.
    "reluout": {"relu_from_output": True},
    "reluout_off": {"relu_from_output": False},
    # Fused Winograd conv2 (ops/pallas/winograd.py): 2.25x fewer MXU
    # FLOPs for the stride-1 layer2-4 conv2s.
    "winograd": {"winograd_conv2": True},
    # ... plus shadow bn1/bn2 statistics so the applies around the
    # (fusion-opaque) Pallas call stay epilogue-fusable into the
    # neighboring XLA convs.
    "winograd_sh12": {"winograd_conv2": True, "bn12_shadow_stats": True},
    # jax.checkpoint over the bandwidth-bound 32x32 layer1 bottlenecks:
    # don't save relu1/relu2 (2x134 MB writes + reads per block), let the
    # backward recompute them from the block input it reads anyway.
    # MEASURED (v5e, batch 1024, 60-step scans): remat1 9.79 / remat12
    # 9.79 vs 9.78 default, identical loss — ZERO. XLA's scheduling was
    # already rematerializing what the checkpoint boundary would delete
    # (same finding as reluout). See docs/ROADMAP.md round-4 negatives.
    "remat1": {"remat_stages": (0,)},
    "remat12": {"remat_stages": (0, 1)},
    # Batch-on-lanes Pallas kernel for layer1's C=64 conv2s
    # (ops/pallas/conv64.py): K=192 merged-tap fwd/dgrad + K=batch
    # wgrad — the three ops the round-5 profile left at 1.46-2.18x
    # floor (5.76 ms of a 99.9 ms step).
    "conv64": {"conv64_pallas": True},
    "conv64_off": {"conv64_pallas": False},
    # Stage-gated shadow bn1/bn2: layer1 only — the round-5 profile
    # shows one bn-apply+relu per layer1 block still materializing as a
    # standalone 1.34 ms/step loop fusion; shadow statistics there make
    # the apply stats-independent (epilogue-fusable) at ~6% of layer1
    # conv1/conv2 flops in k-row recomputes. Measured NEGATIVE on v5e:
    # 9.47 vs 9.75 steps/s at batch 512 — the recomputes cost more than
    # the deleted pass; stays off by default.
    "shadow12_l1": {"bn12_shadow_stages": (0,)},
    # Subset weight gradients (ops/subset_wgrad.py): dw from a centered
    # row slice scaled N/k, dx exact. Deletes (1 - k/N) of the bytes AND
    # MXU FLOPs of every wgrad conv fusion (~18 ms of the 99.9 ms step).
    "swgrad50": {"conv_wgrad_fraction": 0.5},
    "swgrad25": {"conv_wgrad_fraction": 0.25},
    "swgrad125": {"conv_wgrad_fraction": 0.125},
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("variants", nargs="+", choices=list(VARIANTS))
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import numpy as np

    from simclr_tpu.config import Config, ModelConfig, TrainConfig
    from simclr_tpu.data.datasets import load_dataset
    from simclr_tpu.data.pipeline import epoch_permutation
    from simclr_tpu.train.pretrain import build_engine, init_simclr

    images_np, _ = load_dataset("cifar10", "train", "data")
    images = jax.device_put(images_np)
    n = images.shape[0]

    for name in args.variants:
        over = VARIANTS[name]
        cfg = Config(
            train=TrainConfig(batch_size=args.batch, save_ckpt=False),
            model=ModelConfig(**over),
        )
        model, state, tx = init_simclr(cfg, jax.random.key(0))
        engine = build_engine(cfg, model, tx)

        def run(state, key):
            idx = epoch_permutation(key, n, args.batch)[:args.steps]
            state, (loss, _) = engine.train_epoch(state, images, idx, key)
            return state, float(np.asarray(loss)[-1])

        state, _ = run(state, jax.random.key(1))   # compile
        state, _ = run(state, jax.random.key(2))   # warm
        rates, loss = [], float("nan")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            state, loss = run(state, jax.random.fold_in(jax.random.key(3),
                                                        rep))
            rates.append(args.steps / (time.perf_counter() - t0))
        med = float(np.median(rates))
        print(f"{name:10s} {med:6.2f} steps/s "
              f"({1e3 / med:6.1f} ms/step) reps="
              f"{[round(r, 2) for r in rates]} loss={loss:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
