#!/usr/bin/env python
"""Semi-supervised fine-tuning CLI (reference:
training_others/train_ssl.py). Fixes the reference bug where the pretrained
path was passed into the `device` argument and never loaded
(train_ssl.py:42 vs models/ssl.py:7-12)."""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help="pretrained SimCLR export (.msgpack)")
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--n_epoch", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ssl_label_size", type=float, default=None,
                   help="label fraction (1.0 = transfer-learning mode "
                        "with a validation split)")
    args = p.parse_args()

    cfg = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    train_kw = {}
    if args.batch_size is not None:
        train_kw["micro_batch_size"] = args.batch_size
    if args.ssl_label_size is not None:
        train_kw["ssl_label_size"] = args.ssl_label_size
    if train_kw:
        cfg = cfg.replace(
            train=dataclasses.replace(cfg.train, **train_kw))

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.ssl import train_ssl

    split = make_split(cfg, "fine_tune")
    test = make_split(cfg, "test")
    result = train_ssl(
        cfg, split.train, val_ds=split.val, test_ds=test.train,
        pretrained_path=args.model_path, n_epochs=args.n_epoch)
    print(f"best val acc: {result.best_acc:.2f}% | "
          f"test acc: {result.test_acc:.2f}%")


if __name__ == "__main__":
    main()
