#!/usr/bin/env python
"""Batch-size-sweep experiment — the reference's flagship result.

Reproduces examples/varying_batch_size.png (reference README.md:19,
BASELINE.md: top-1 ~= 87-89%, roughly flat over batch 32 -> 1024): pretrain
at each effective batch size, then report the auxiliary-task validation
metrics, linear-eval test top-1 and test loss.

Two large-batch mechanisms run side by side:

  * ``global``  — TRUE global negatives: one 2Nx2N NT-Xent over the whole
    batch per step (this framework's native mode; under a mesh the batch is
    sharded and embeddings all-gathered).
  * ``accum``   — reference-parity gradient accumulation
    (reference: utils/model_utils.py:116-123): micro-batches of
    ``micro_batch_size`` (64, configs.json:8), optimizer step every
    batch/64 micro-steps. Each micro-batch only ever sees 64-sample
    negatives — the semantic difference this experiment quantifies.

Artifacts: ``histories.json`` + ``varying_batch_size.png`` under --out.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def run_one(base: Config, split, batch: int, mode: str, n_epoch: int,
            micro: int, out: Path, lin_eval: bool):
    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.lin_eval import linear_evaluation
    from simclr_tpu.train.pretrain import init_simclr, pretrain

    if mode == "accum":
        accum = max(batch // micro, 1)
        train = dataclasses.replace(
            base.train, batch_size=micro, accum_steps=accum,
            n_epoch=n_epoch, save_ckpt=False)
    else:
        train = dataclasses.replace(
            base.train, batch_size=batch, accum_steps=1,
            n_epoch=n_epoch, save_ckpt=False)
    cfg = base.replace(train=train)
    # save_plots=False: the per-run tag ignores `mode`, so global/accum
    # runs would overwrite each other's PNGs; histories.json keeps the
    # full curves and the sweep figure is rendered at the end.
    res = pretrain(cfg, split=split, save_checkpoints=False,
                   save_plots=False,
                   export_path=str(out / f"model_{mode}_bs{batch}.msgpack"))
    record = {
        "batch": batch,
        "mode": mode,
        "history": res.history.to_dict(),
        "steps_per_sec": res.steps_per_sec,
        "val_acc": res.history.accuracy["valid"][-1]
        if res.history.accuracy["valid"] else None,
        "val_loss": res.history.loss["valid"][-1]
        if res.history.loss["valid"] else None,
    }
    if lin_eval:
        import jax

        eval_cfg = base  # batch-independent eval settings
        le_split = make_split(eval_cfg, "lin_eval")
        test_split = make_split(eval_cfg, "test")
        model, _, _ = init_simclr(cfg, jax.random.key(0))
        loss, acc = linear_evaluation(
            model, res.state.params, res.state.batch_stats,
            le_split.train, test_split.train, eval_cfg)
        record["lin_eval_top1"] = acc
        record["lin_eval_loss"] = loss
    return record


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch_sizes", type=int, nargs="+",
                   default=[32, 64, 128, 256, 512, 1024])
    p.add_argument("--modes", nargs="+", default=["global", "accum"],
                   choices=["global", "accum"])
    p.add_argument("--n_epoch", type=int, default=20)
    p.add_argument("--micro_batch_size", type=int, default=64)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--out", default="results/batch_sweep")
    p.add_argument("--lin_eval", action="store_true",
                   help="run L-BFGS linear evaluation after each pretrain "
                        "(the reference plot's top-1 metric)")
    args = p.parse_args()

    from simclr_tpu.data.pipeline import make_split

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    base = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    split = make_split(base, "pretrain")  # shared across runs

    records = []
    for mode in args.modes:
        for batch in args.batch_sizes:
            print(f"=== mode={mode} effective batch={batch} ===")
            rec = run_one(base, split, batch, mode, args.n_epoch,
                          args.micro_batch_size, out, args.lin_eval)
            records.append(rec)
            print(f"mode={mode} bs={batch}: val acc {rec['val_acc']} "
                  f"({rec['steps_per_sec']:.2f} steps/s)")

    (out / "histories.json").write_text(json.dumps(records, indent=2))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax_a, ax_l) = plt.subplots(1, 2, figsize=(12, 4))
    for mode in args.modes:
        recs = sorted((r for r in records if r["mode"] == mode),
                      key=lambda r: r["batch"])
        xs = [r["batch"] for r in recs]
        key_a = ("lin_eval_top1" if args.lin_eval else "val_acc")
        key_l = ("lin_eval_loss" if args.lin_eval else "val_loss")
        ax_a.plot(xs, [r[key_a] for r in recs], marker="o", label=mode)
        ax_l.plot(xs, [r[key_l] for r in recs], marker="o", label=mode)
    for ax, ylab in ((ax_a, "top-1 accuracy (%)"), (ax_l, "loss")):
        ax.set_xscale("log", base=2)
        ax.set_xlabel("effective batch size")
        ax.set_ylabel(ylab)
        ax.legend()
    fig.suptitle(
        f"{'Linear-eval' if args.lin_eval else 'Aux-task validation'} "
        "metrics vs batch size (global negatives vs grad accumulation)")
    fig.savefig(out / "varying_batch_size.png", bbox_inches="tight",
                dpi=150)
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
