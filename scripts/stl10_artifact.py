#!/usr/bin/env python
"""STL-10 end-to-end artifact: pretrain at 96x96, measure, lin-eval.

The reference's second dataset (reference: data.py:440-527 STL-10 binary
loaders + 96x96 pair augmentation with kernel-9 gaussian blur;
pretrain.py:72-79 selects the standard 7x7/stride-2 stem via
low_quality_img=False). This framework supports it throughout
(config.STL10, data/datasets.load_stl10, the blur branch in ops/augment);
this script produces the committed end-to-end evidence:

  * a few pretrain epochs on the unlabeled split (synthetic stand-in at
    96x96 when the real binaries are absent, exactly like CIFAR),
  * steps/sec + aug-pairs/sec AT 96x96 (the interpolation-matrix crop
    is O(H_out*H_in) per sample — 9x CIFAR's cost — so it needs its own
    measurement),
  * downstream linear evaluation on the labelled train/test splits.

Artifacts: results/stl10/{stl10.json, README.md}.
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_unlabeled", type=int, default=20_000,
                   help="pretrain pool size (STL-10 real: 100k)")
    p.add_argument("--n_train", type=int, default=5_000)
    p.add_argument("--n_test", type=int, default=8_000)
    p.add_argument("--n_epoch", type=int, default=3)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--out", default="results/stl10")
    args = p.parse_args()

    import dataclasses

    import jax
    import numpy as np

    from simclr_tpu.config import Config
    from simclr_tpu.data.datasets import load_dataset
    from simclr_tpu.data.pipeline import DeviceDataset, Split, split_indices
    from simclr_tpu.ops.augment import augment_train_pair
    from simclr_tpu.train.lin_eval import linear_evaluation
    from simclr_tpu.train.pretrain import init_simclr, pretrain

    base = Config.for_dataset("stl10")
    cfg = base.replace(
        train=dataclasses.replace(
            base.train, n_epoch=args.n_epoch, batch_size=args.batch_size,
            save_ckpt=False),
    )

    unl, unl_y = load_dataset("stl10", "unlabeled", cfg.data_dir,
                              synthetic_size=args.n_unlabeled)
    tr_x, tr_y = load_dataset("stl10", "train", cfg.data_dir,
                              synthetic_size=args.n_train)
    te_x, te_y = load_dataset("stl10", "test", cfg.data_dir,
                              synthetic_size=args.n_test)
    itr, iva = split_indices(unl.shape[0], cfg.train.val_fraction)
    split = Split(DeviceDataset.from_numpy(unl[itr], unl_y[itr]),
                  DeviceDataset.from_numpy(unl[iva], unl_y[iva]))

    print(f"pretrain: {len(itr)} unlabeled 96x96, batch "
          f"{args.batch_size}, {args.n_epoch} epochs", flush=True)
    res = pretrain(cfg, split=split, save_checkpoints=False,
                   save_plots=False, export_path=None)

    # Augmentation-only throughput at 96x96 (the STL stack includes the
    # kernel-9 blur and the 96->96 interpolation-matrix crop).
    batch = jax.device_put(unl[:args.batch_size])

    @jax.jit
    def aug_scan(key, batch):
        import jax.numpy as jnp

        def body(c, k):
            v1, v2 = augment_train_pair(k, batch, cfg.augment, cfg.dataset)
            return c + jnp.mean(v1, dtype=jnp.float32) \
                + jnp.mean(v2, dtype=jnp.float32), ()
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(key, 20))
        return out

    np.asarray(aug_scan(jax.random.key(0), batch))  # compile+warm
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(aug_scan(jax.random.key(rep + 1), batch))
        rates.append(20 * args.batch_size / (time.perf_counter() - t0))
    aug_pairs = float(np.median(rates))

    model, _, _ = init_simclr(cfg, jax.random.key(0))
    le_loss, le_top1 = linear_evaluation(
        model, res.state.params, res.state.batch_stats,
        DeviceDataset.from_numpy(tr_x, tr_y),
        DeviceDataset.from_numpy(te_x, te_y), cfg)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    result = {
        "config": {k: getattr(args, k) for k in
                   ("n_unlabeled", "n_train", "n_test", "n_epoch",
                    "batch_size")},
        "img_size": 96,
        "steps_per_sec": round(res.steady_steps_per_sec, 3),
        "steps_per_sec_incl_compile": round(res.steps_per_sec, 3),
        "images_per_sec": round(
            res.steady_steps_per_sec * args.batch_size, 1),
        "aug_pairs_per_sec": round(aug_pairs, 1),
        "train_loss": [round(float(v), 4) for v in
                       res.history.loss["train"]],
        "val_loss": [round(float(v), 4) for v in
                     res.history.loss["valid"]],
        "lin_eval_top1": round(float(le_top1), 2),
        "lin_eval_loss": round(float(le_loss), 4),
        "device": jax.devices()[0].device_kind,
    }
    (out / "stl10.json").write_text(json.dumps(result, indent=2))
    (out / "README.md").write_text(f"""# STL-10 end-to-end artifact

`python scripts/stl10_artifact.py` — pretrain on the 96x96 unlabeled
split ({args.n_unlabeled} synthetic stand-in images; drop the real
`data/stl10_binary/` files in place to use them), standard 7x7/stride-2
stem + max-pool (reference pretrain.py:77 low_quality_img=False), full
STL augmentation stack (kernel-9 gaussian blur branch, 96x96
interpolation-matrix crops), then linear evaluation on the labelled
train/test splits.

| metric | value |
|---|---|
| pretrain steps/sec, steady state (batch {args.batch_size}, 96x96) | {result["steps_per_sec"]} |
| steps/sec incl. first-epoch compile | {result["steps_per_sec_incl_compile"]} |
| images/sec | {result["images_per_sec"]} |
| aug-pairs/sec at 96x96 | {result["aug_pairs_per_sec"]} |
| train loss by epoch | {result["train_loss"]} |
| lin-eval top-1 | {result["lin_eval_top1"]}% |
| device | {result["device"]} |

Loss must descend across epochs and lin-eval must beat chance (10%) for
this artifact to count; both are asserted by tests/test_stl10_artifact.py
against this JSON.
""")
    print(json.dumps(result, indent=2))
    assert result["train_loss"][-1] < result["train_loss"][0], \
        "pretrain loss did not descend"
    print("artifacts in", out)


if __name__ == "__main__":
    main()
