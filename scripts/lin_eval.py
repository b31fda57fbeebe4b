#!/usr/bin/env python
"""Linear-evaluation CLI.

The reference exposes linear evaluation only as library functions driven
from notebooks (utils/model_utils.py:176-297); this CLI makes it a
first-class stage: extract frozen features, fit the L-BFGS linear head,
report test top-1."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_path", help="pretrained SimCLR export (.msgpack)")
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--n_steps", type=int, default=None,
                   help="outer L-BFGS steps (n_epoch_lin_eval)")
    args = p.parse_args()

    cfg = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.models.simclr import SimCLR
    from simclr_tpu.train.lin_eval import linear_evaluation
    from simclr_tpu.utils.checkpoint import load_exported_model

    params, batch_stats, _ = load_exported_model(args.model_path)
    model = SimCLR(cfg=cfg.model)
    split = make_split(cfg, "lin_eval")
    test = make_split(cfg, "test")
    if args.n_steps is not None:
        import dataclasses
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, n_epoch_lin_eval=args.n_steps))
    loss, acc = linear_evaluation(
        model, params, batch_stats, split.train, test.train, cfg)
    print(f"test top-1: {acc:.2f}%")


if __name__ == "__main__":
    main()
