#!/usr/bin/env python
"""Temperature-sweep experiment.

Reproduces the reference's headline experiment family
(examples/loss_acc_by_temp_{train,val}.png, BASELINE.md: tau in
{0.1, 0.5, 1.0, 2.0}): pretrain at each temperature and plot the
train/validation loss + auxiliary-task accuracy curves on shared axes.
All runs share one process so the epoch-scan compilation is reused.
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--temps", type=float, nargs="+",
                   default=[0.1, 0.5, 1.0, 2.0])
    p.add_argument("--n_epoch", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--out", default="results/temp_sweep")
    args = p.parse_args()

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.train.pretrain import pretrain

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    base = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    split = make_split(base, "pretrain")  # shared across temperatures

    histories = {}
    for temp in args.temps:
        cfg = base.replace(train=dataclasses.replace(
            base.train, temperature=temp, n_epoch=args.n_epoch,
            batch_size=args.batch_size, save_ckpt=False))
        print(f"=== temperature {temp} ===")
        res = pretrain(cfg, split=split, save_checkpoints=False,
                       export_path=str(out / f"model_temp{temp}.msgpack"))
        histories[temp] = res.history.to_dict()
        print(f"temp {temp}: final val acc "
              f"{res.history.accuracy['valid'][-1]:.2f}% "
              f"({res.steps_per_sec:.2f} steps/s)")

    (out / "histories.json").write_text(json.dumps(histories, indent=2))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for split_name in ("train", "valid"):
        fig, (ax_l, ax_a) = plt.subplots(1, 2, figsize=(12, 4))
        for temp, h in histories.items():
            ax_l.plot(h["loss"][split_name], label=f"tau={temp}")
            ax_a.plot(h["accuracy"][split_name], label=f"tau={temp}")
        ax_l.set_xlabel("epoch")
        ax_l.set_ylabel(f"{split_name} loss")
        ax_a.set_xlabel("epoch")
        ax_a.set_ylabel(f"{split_name} aux top-1 (%)")
        ax_l.legend()
        ax_a.legend()
        fig.suptitle(f"NT-Xent by temperature ({split_name})")
        fig.savefig(out / f"loss_acc_by_temp_{split_name}.png",
                    bbox_inches="tight", dpi=150)
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
