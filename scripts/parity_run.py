#!/usr/bin/env python
"""Accuracy-parity experiment: quantify whether the TPU performance tricks
move linear-eval accuracy.

BASELINE.md's acceptance gate is CIFAR-10 linear-eval top-1 within 0.5% of
the reference's ~87-89% (examples/varying_batch_size.png). This framework
deviates from strict torch semantics in three throughput-motivated ways,
each toggleable:

  * ``SubsetBatchNorm`` statistics from the leading 1/4 of the batch
    (models/norm.py; the reference computes them from 64-sample
    micro-batches, utils/model_utils.py:109-114) vs exact full-batch stats;
  * bfloat16-applied BN (float32 statistics) vs float32 application;
  * one fused 2N forward for both views vs the reference's two sequential
    per-view forwards with per-view BN stats (model_utils.py:113-114).

This CLI pretrains each variant on the same split and reports linear-eval
test top-1 / loss side by side. Real CIFAR-10 is picked up automatically if
the binaries are on disk (data/datasets.py); otherwise the deterministic
synthetic stand-in is used and the comparison remains valid as an A/B of
the variants (absolute numbers then don't map to the reference's).

Artifacts: ``parity.json`` + ``parity.md`` under --out.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402

VARIANTS = {
    # name -> (model-config overrides, pretrain kwargs)
    "default": ({}, {}),
    "exact_bn_stats": ({"bn_stats_fraction": 1.0}, {}),
    "f32_bn_apply": ({"bn_dtype": "float32"}, {}),
    "two_pass_views": ({}, {"two_pass_views": True}),
    # Reference-parity 64-sample statistics (the torch reference computes
    # BN stats from 64-image micro-batches, utils/model_utils.py:109-114).
    # The round-3 discriminative run measured this BEST on lin-eval and
    # ~5% faster, so it IS the default now; kept as an explicit pin.
    "stats64": ({"bn_stats_fraction": 0.0625}, {}),
    # The round-1/2 default, retained for comparison runs.
    "stats25": ({"bn_stats_fraction": 0.25}, {}),
    # Straight-through subset BN backward (models/norm.py grad_mode):
    # forward identical to default; dx drops the O(1/sqrt(m)) statistics
    # coupling on the k stats rows and dscale/dbias come from the
    # unbiased k-sample estimator. +3.5% step time if accuracy holds.
    "stgrad": ({"bn_grad_mode": "subset_st"}, {}),
    # --- Round-4 decomposed gate for the shipped fast path -------------
    # (VERDICT r3 ask #3). "default" above IS the composed shipped config
    # (subset_st + shadow bn3); these three isolate each deviation so a
    # regression can be attributed:
    #   exact_grad     — neither trick (exact BN backward, no shadow bn3)
    #   stgrad_only    — subset_st alone
    #   shadow_only    — shadow-bn3 statistics alone (exact backward)
    "exact_grad": ({"bn_grad_mode": "exact",
                    "bn3_shadow_stats": False}, {}),
    "stgrad_only": ({"bn_grad_mode": "subset_st",
                     "bn3_shadow_stats": False}, {}),
    "shadow_only": ({"bn_grad_mode": "exact",
                     "bn3_shadow_stats": True}, {}),
    # Shipped default everywhere EXCEPT the projection head's two BN1d
    # layers, which take exact autodiff gradients. Isolates whether the
    # stgrad aux-accuracy dip (~1.3pp in results/parity_stgrad) comes
    # from the head — the aux metric reads z, directly downstream of
    # those BNs, and their k-sample scale/bias estimates are the
    # noisiest in the tree while their exact reductions are free
    # ((2N, 2048) tensors, not layer-sized activations).
    "head_exact": ({"head_bn_grad_mode": "exact"}, {}),
    # Shipped default + subset weight gradients (ops/subset_wgrad.py).
    # At effective batch 512 (2N=1024 rows) fraction 0.5 contracts every
    # conv wgrad over 512 rows — the reference's own weight-gradient
    # sample count (8 accumulated micro-batches of 64,
    # utils/model_utils.py:109-123); 0.25 halves that again.
    "swgrad50": ({"conv_wgrad_fraction": 0.5}, {}),
    "swgrad25": ({"conv_wgrad_fraction": 0.25}, {}),
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variants", nargs="+", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--n_epoch", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--out", default="results/parity")
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    args = p.parse_args()

    import jax

    from simclr_tpu.data.datasets import is_real_data
    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.lin_eval import linear_evaluation
    from simclr_tpu.train.pretrain import init_simclr, pretrain

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    base = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    split = make_split(base, "pretrain")
    le_split = make_split(base, "lin_eval")
    test_split = make_split(base, "test")
    real = is_real_data(args.dataset, args.data_dir)
    print(f"data: {'REAL ' + args.dataset if real else 'synthetic stand-in'}")

    rows = []
    # Seed-outer so an interrupted run still leaves a complete variant
    # matrix for the seeds that finished.
    for seed in args.seeds:
        for name in args.variants:
            model_over, pre_kwargs = VARIANTS[name]
            cfg = base.replace(
                model=dataclasses.replace(base.model, **model_over),
                train=dataclasses.replace(
                    base.train, n_epoch=args.n_epoch,
                    batch_size=args.batch_size, save_ckpt=False, seed=seed))
            print(f"=== variant {name} (seed {seed}) ===")
            res = pretrain(cfg, split=split, save_checkpoints=False,
                           save_plots=False,
                           export_path=str(out / f"model_{name}.msgpack"),
                           **pre_kwargs)
            model, _, _ = init_simclr(cfg, jax.random.key(0))
            loss, acc = linear_evaluation(
                model, res.state.params, res.state.batch_stats,
                le_split.train, test_split.train, cfg)
            rows.append({
                "variant": name, "seed": seed,
                "lin_eval_top1": acc, "lin_eval_loss": loss,
                "final_val_acc": res.history.accuracy["valid"][-1]
                if res.history.accuracy["valid"] else None,
                "steps_per_sec": round(res.steps_per_sec, 3),
                "real_data": real,
            })
            print(f"{name}[{seed}]: top1={acc:.2f}% loss={loss:.4f} "
                  f"({res.steps_per_sec:.2f} steps/s)", flush=True)
            # Incremental write: a killed run keeps its finished rows.
            (out / "parity.json").write_text(json.dumps(rows, indent=2))

    (out / "parity.json").write_text(json.dumps(rows, indent=2))
    ref = next((r for r in rows if r["variant"] == "default"), rows[0])
    lines = [
        "# Accuracy-parity results",
        "",
        f"Data: {'real ' + args.dataset if real else 'synthetic stand-in'}"
        f" | epochs {args.n_epoch} | batch {args.batch_size}",
        "",
        "| variant | seed | lin-eval top-1 | Δ vs default "
        "| aux val acc | steps/sec |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        delta = r["lin_eval_top1"] - ref["lin_eval_top1"]
        va = (f"{r['final_val_acc']:.2f}%"
              if r["final_val_acc"] is not None else "-")
        lines.append(
            f"| {r['variant']} | {r['seed']} | {r['lin_eval_top1']:.2f}% "
            f"| {delta:+.2f}% | {va} | {r['steps_per_sec']} |")
    # Seed-aggregated means (the decision-grade view when several seeds
    # were run): mean ± max-deviation per variant, both metrics.
    names = list(dict.fromkeys(r["variant"] for r in rows))
    if any(len([r for r in rows if r["variant"] == n]) > 1 for n in names):
        import numpy as _np
        lines += ["", "| variant | seeds | mean lin-eval top-1 | spread "
                  "| mean aux val acc | spread |", "|---|---|---|---|---|---|"]
        for n in names:
            rs = [r for r in rows if r["variant"] == n]
            t1 = _np.array([r["lin_eval_top1"] for r in rs])
            va = _np.array([r["final_val_acc"] for r in rs
                            if r["final_val_acc"] is not None])
            lines.append(
                f"| {n} | {len(rs)} | {t1.mean():.2f}% "
                f"| ±{(t1.max() - t1.min()) / 2:.2f} "
                f"| {va.mean():.2f}% | ±{(va.max() - va.min()) / 2:.2f} |"
                if va.size else
                f"| {n} | {len(rs)} | {t1.mean():.2f}% "
                f"| ±{(t1.max() - t1.min()) / 2:.2f} | - | - |")
    (out / "parity.md").write_text("\n".join(lines) + "\n")
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
