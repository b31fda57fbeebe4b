#!/usr/bin/env python
"""SimCLR pretraining CLI.

Counterpart of reference pretrain.py:9-94 with the same knobs (n_epoch,
accum_steps, save_every, batch_size, dataset, paths, encoder_model, temp,
modified_loss, save_ckpt) — fixing the reference's `type=bool` argparse wart
(any non-empty string was truthy, pretrain.py:46-52) with real store_true
flags, and adding --n-devices for data-parallel meshes.

Run from the repo root:  python scripts/pretrain.py --dataset cifar10
"""

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simclr_tpu.config import Config  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_epoch", type=int, default=None,
                   help="number of epochs to train")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation steps (reference parity "
                        "mode; default 1 = true large batch)")
    p.add_argument("--save_every", type=int, default=None,
                   help="epochs between checkpoints")
    p.add_argument("--batch_size", type=int, default=None,
                   help="global batch size (the reference's 64*accum)")
    p.add_argument("--dataset", default="cifar10",
                   choices=["cifar10", "stl10"])
    p.add_argument("--data_dir", default="data")
    p.add_argument("--path_for_saving", default="results",
                   help="output dir for exported models")
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--resume_training_path", default=None,
                   help="checkpoint path to resume from")
    p.add_argument("--encoder_model", default="no_dropout",
                   choices=["no_dropout", "dropout"])
    p.add_argument("--temp", type=float, default=None,
                   help="NT-Xent temperature")
    p.add_argument("--modified_loss", action="store_true",
                   help="use the probabilistic contrastive loss")
    p.add_argument("--no_save_ckpt", action="store_true")
    p.add_argument("--two_pass_views", action="store_true",
                   help="reference-parity sequential per-view forwards")
    p.add_argument("--n_devices", type=int, default=None,
                   help="devices in the data mesh (default: all)")
    p.add_argument("--engine", default="pjit",
                   choices=["pjit", "explicit"],
                   help="collective strategy: pjit (XLA-inserted "
                        "collectives) or explicit (shard_map with "
                        "hand-placed all_gather/pmean/psum)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics_path", default=None,
                   help="append-only JSONL metrics log")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of epoch 2 here")
    args = p.parse_args()

    cfg = Config.for_dataset(args.dataset)
    train_kw = dict(
        accum_steps=args.accum_steps,
        modified_loss=args.modified_loss,
        save_ckpt=not args.no_save_ckpt,
        seed=args.seed,
    )
    for field, value in [
        ("n_epoch", args.n_epoch), ("batch_size", args.batch_size),
        ("temperature", args.temp), ("save_ckpt_every", args.save_every),
    ]:
        if value is not None:
            train_kw[field] = value
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, **train_kw),
        model=dataclasses.replace(cfg.model, encoder=args.encoder_model),
        data_dir=args.data_dir,
        out_dir=args.path_for_saving,
        ckpt_dir=args.ckpt_dir,
    )

    import jax  # deferred so --help is fast

    from simclr_tpu.parallel.mesh import make_mesh
    from simclr_tpu.train.pretrain import pretrain

    n_dev = args.n_devices or len(jax.devices())
    # The explicit engine runs inside shard_map and needs a mesh even on
    # one device; the pjit engine skips mesh machinery when single-device.
    mesh = (make_mesh(n_dev) if n_dev > 1 or args.engine == "explicit"
            else None)
    print(f"devices: {jax.devices()[:n_dev]} | mesh: "
          f"{mesh.shape if mesh else 'single-device'} | "
          f"engine: {args.engine}")
    result = pretrain(
        cfg, mesh=mesh, resume_from=args.resume_training_path,
        two_pass_views=args.two_pass_views,
        metrics_path=args.metrics_path,
        profile_dir=args.profile_dir,
        engine=args.engine,
    )
    print(f"done: {result.steps_per_sec:.2f} steps/sec | "
          f"export: {result.export_path}")


if __name__ == "__main__":
    main()
