#!/usr/bin/env python
"""Supervised ResNet-50 baseline CLI (reference:
training_others/train_supervised.py, which has no argparse; we add the
obvious knobs)."""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--n_epoch", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--export_path", default=None,
                   help="save the trained model as a .msgpack artifact "
                        "(consumable by scripts/analysis.py "
                        "--supervised_model for the three-way KDEs)")
    args = p.parse_args()

    cfg = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    if args.batch_size is not None:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, micro_batch_size=args.batch_size))

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.supervised import train_supervised

    split = make_split(cfg, "supervised_bm")
    test = make_split(cfg, "test")
    result = train_supervised(
        cfg, split.train, val_ds=split.val, test_ds=test.train,
        n_epochs=args.n_epoch)
    print(f"best val acc: {result.best_acc:.2f}% | "
          f"test acc: {result.test_acc:.2f}%")
    if args.export_path:
        from simclr_tpu.utils.checkpoint import export_model

        export_model(args.export_path, result.state.params,
                     result.state.batch_stats)
        print(f"exported model: {args.export_path}")


if __name__ == "__main__":
    main()
