#!/usr/bin/env python
"""MINE mutual-information estimator CLI (reference:
training_others/train_mine.py:10-77). Fixes the reference's `mine_bs`
config-key crash (train_mine.py:13 reads a key that doesn't exist,
configs.json:7 spells it mine_batch_size)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("simclr_model_path",
                   help="pretrained SimCLR export (.msgpack)")
    p.add_argument("--mine_bs", type=int, default=None)
    p.add_argument("--mine_lr", type=float, default=None)
    p.add_argument("--mine_hidden_dim", type=int, default=None)
    p.add_argument("--n_iter", type=int, default=5000)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--use_final_feat", action="store_true",
                   help="use z (projection output) instead of h")
    p.add_argument("--mi_with_orig", action="store_true",
                   help="estimate I(x; z) instead of I(z1; z2)")
    args = p.parse_args()

    cfg = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.mine import train_mine_from_export

    split = make_split(cfg, "lin_eval")
    result = train_mine_from_export(
        cfg, split.train, args.simclr_model_path,
        n_iter=args.n_iter,
        batch_size=args.mine_bs,
        hidden_size=args.mine_hidden_dim,
        lr=args.mine_lr,
        mi_between_repr=not args.mi_with_orig,
        use_hidden_feat=not args.use_final_feat,
    )
    print(f"final MI lower bound: {result.final_mi:.4f}")


if __name__ == "__main__":
    main()
