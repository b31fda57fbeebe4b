#!/usr/bin/env python
"""Downstream trajectory shootouts: fine-tune, supervised baseline, and
MINE — the three reference flows the round-3 shootout did not cover —
executed LIVE from /root/reference next to this framework's counterparts,
from the same pretrained weights on the same images.

Shared stage 0: pretrain THIS framework briefly (production config) on
the shared synthetic images, export the msgpack artifact, port the
weights to a torch state_dict (utils/torch_port.simclr_to_torch_state_dict),
load them into the reference's own SimCLRMain and `torch.jit.trace` it —
producing the TorchScript artifact the reference's downstream flows load
(reference: models/ssl.py:24, training_others/train_mine.py:67). Both
sides then run their downstream stage from identical weights.

Flows (each PASS-gated, tolerances printed):
  * finetune  — reference `train_ssl` (utils/model_utils.py:300-369)
    driven exactly like training_others/train_ssl.py: SimCLRFineTune
    loading the TorchScript trace, SGD+Nesterov lr=0.02 momentum=0.98,
    10%-label WeightedRandomSampler (data.py:381-392; no validation
    loader in the <1 label regime, data.py:383 comment), final test_ssl.
    Ours: train/ssl.train_ssl from the msgpack export.
  * supervised — the reference's training_others/train_supervised.py is
    an unparameterized __main__ script with hardcoded cluster paths and
    a broken final reload (train_supervised.py:95), so its loop
    (:49-91) is RE-DRIVEN here statement-for-statement with the
    reference's own components (ResnetSupervised, Adam(wd), both-views
    half-steps, per-epoch test_ssl, patience-4 best-restore).
    Ours: train/supervised.train_supervised.
  * mine — reference mine.py:112-171 `train_mine` with its own
    samplers over CIFAR10pair/CIFAR10-style loaders and the TorchScript
    SimCLR. Ours: train/mine.train_mine_from_export. Compared on the
    smoothed DV MI trace: same sign, both ascending, final values
    within tolerance.

Artifacts: results/downstream_shootout/{<flow>.json, README.md}.
"""

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

REFERENCE = "/root/reference"

from reference_shootout import make_data  # noqa: E402


# ---------------------------------------------------------------------------
# Shared stage 0: pretrain ours, export, port to a TorchScript artifact.
# ---------------------------------------------------------------------------

def _load_reference():
    import _torchvision_shim  # noqa: F401
    repo_cwd = os.getcwd()
    os.chdir(REFERENCE)
    sys.path.insert(0, REFERENCE)
    try:
        import data as ref_data
        import mine as ref_mine
        import utils.model_utils as ref_mu
        from models.resnets import ResnetSupervised
        from models.simclr import SimCLRMain
        from models.ssl import SimCLRFineTune
    finally:
        os.chdir(repo_cwd)
        sys.path.remove(REFERENCE)
    return ref_data, ref_mu, ref_mine, SimCLRMain, SimCLRFineTune, \
        ResnetSupervised


def pretrain_ours(cfg, train_arr, val_arr, out, n_epoch):
    from simclr_tpu.data.pipeline import DeviceDataset, Split
    from simclr_tpu.train.pretrain import pretrain

    export = str(out / "pretrained.msgpack")
    if os.path.isfile(export):
        print("stage 0: reusing", export)
        return export
    split = Split(train=DeviceDataset.from_numpy(*train_arr),
                  val=DeviceDataset.from_numpy(*val_arr))
    pcfg = cfg.replace(train=dataclasses.replace(
        cfg.train, n_epoch=n_epoch, save_ckpt=False))
    pretrain(pcfg, split=split, save_checkpoints=False, save_plots=False,
             export_path=export)
    return export


def trace_reference_model(export, out, SimCLRMain, configs):
    """Load OUR exported weights into the reference's SimCLRMain and save
    a TorchScript trace — the artifact its downstream flows consume."""
    import torch

    from simclr_tpu.utils.checkpoint import load_exported_model
    from simclr_tpu.utils.torch_port import simclr_to_torch_state_dict

    traced_path = str(out / "pretrained_traced.pt")
    params, batch_stats, _ = load_exported_model(export)
    sd_np = simclr_to_torch_state_dict(params, batch_stats)
    model = SimCLRMain(low_quality_img=True, configs=configs,
                       encoder_model="no_dropout")
    model.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()},
        strict=False)
    model.eval()
    with torch.no_grad():
        traced = torch.jit.trace(
            model, torch.zeros(2, 3, 32, 32, dtype=torch.float32))
    traced.save(traced_path)
    return traced_path


def _paired_ds(ref_data, arr, transform, configs, anchor=False):
    ds = ref_data.CIFAR10pair.__new__(ref_data.CIFAR10pair)
    ds.data, ds.targets = arr[0], list(arr[1])
    ds.transform = transform
    ds.anchor = anchor
    ds.mean_std = configs["cifar10_mean_std"]
    return ds


def _plain_ds(arr, transform):
    from torchvision import datasets
    ds = datasets.CIFAR10.__new__(datasets.CIFAR10)
    ds.data, ds.targets = arr[0], list(arr[1])
    ds.transform = transform
    return ds


# ---------------------------------------------------------------------------
# Flow A: semi-supervised fine-tune.
# ---------------------------------------------------------------------------

def ref_finetune(traced_path, train_arr, test_arr, n_epochs, batch_size,
                 label_size, workdir):
    import numpy as np
    import torch
    from torch.utils.data import DataLoader, sampler

    ref_data, ref_mu, _, _, SimCLRFineTune, _ = _load_reference()
    configs = ref_mu.configs
    configs["colab_path"] = str(workdir) + "/"  # train_ssl best-save dir

    torch.manual_seed(0)
    ft = SimCLRFineTune(torch.device("cpu"), True, configs,
                        pretrained_path=traced_path)
    optimizer = torch.optim.SGD(ft.parameters(), lr=configs["lr_ssl"],
                                momentum=configs["momentum_ssl"],
                                nesterov=True)

    # 10%-label weighted sampler exactly as data.py:381-392.
    train_ds = _plain_ds(train_arr, ref_data.compose_augmentation_fine_tune(
        img_size=32, mean_std=configs["cifar10_mean_std"]))
    n_samples = int(np.floor(label_size * len(train_arr[0])))
    wts = ref_data.get_class_weights(train_ds)
    loader_train = DataLoader(
        train_ds, batch_size=batch_size, shuffle=False, num_workers=0,
        sampler=sampler.WeightedRandomSampler(wts, num_samples=n_samples))

    captured = {}
    real_plot = ref_mu.plot_loss_acc

    def capture(loss, accuracy, title="", **kw):
        captured["loss"], captured["acc"] = list(map(float, loss)), \
            list(map(float, accuracy))

    ref_mu.plot_loss_acc = capture
    try:
        ref_mu.train_ssl(ft, optimizer, n_epochs, torch.device("cpu"),
                         loader_train, loader_val=None)
    finally:
        ref_mu.plot_loss_acc = real_plot

    test_loader = DataLoader(_plain_ds(test_arr,
                             ref_data.compose_augmentation_test(
                                 mean_std=configs["cifar10_mean_std"])),
                             batch_size=256)
    test_loss, test_acc = ref_mu.test_ssl(
        ft, torch.device("cpu"), test_loader, return_loss_accuracy=True)
    return {"train_loss": captured.get("loss", []),
            "train_acc": captured.get("acc", []),
            "test_acc": float(test_acc)}


def ours_finetune(cfg, export, train_arr, test_arr, n_epochs):
    from simclr_tpu.data.pipeline import DeviceDataset
    from simclr_tpu.train.ssl import train_ssl

    res = train_ssl(cfg,
                    DeviceDataset.from_numpy(*train_arr),
                    val_ds=None,
                    test_ds=DeviceDataset.from_numpy(*test_arr),
                    pretrained_path=export, n_epochs=n_epochs)
    return {"train_loss": [float(v) for v in res.history.loss["train"]],
            "train_acc": [float(v) for v in res.history.accuracy["train"]],
            "test_acc": float(res.test_acc)}


# ---------------------------------------------------------------------------
# Flow B: supervised baseline.
# ---------------------------------------------------------------------------

def ref_supervised(train_arr, val_arr, test_arr, n_epochs, batch_size,
                   workdir):
    """Re-drive training_others/train_supervised.py:49-91 with the
    reference's own components (the original is an unparameterized
    __main__ with hardcoded paths and a broken reload at :95)."""
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    ref_data, ref_mu, _, _, _, ResnetSupervised = _load_reference()
    configs = ref_mu.configs

    torch.manual_seed(0)
    resnet = ResnetSupervised(low_quality_img=True)
    optim = torch.optim.Adam(resnet.parameters(),
                             weight_decay=configs["wt_decay"])
    loss_fn = nn.CrossEntropyLoss()

    # supervised_bm loaders (data.py:393-423): paired supervised augs for
    # train, test transform for val.
    loader_train = DataLoader(
        _paired_ds(ref_data, train_arr,
                   ref_data.compose_augmentation_supervised(
                       mean_std=configs["cifar10_mean_std"]), configs),
        batch_size=batch_size, shuffle=True, num_workers=0)
    loader_val = DataLoader(
        _plain_ds(val_arr, ref_data.compose_augmentation_test(
            mean_std=configs["cifar10_mean_std"])), batch_size=256)
    loader_test = DataLoader(
        _plain_ds(test_arr, ref_data.compose_augmentation_test(
            mean_std=configs["cifar10_mean_std"])), batch_size=256)

    best_acc, patience, patience_counter = 0, 4, 0
    best_path = os.path.join(str(workdir), "supervised_best.pth")
    val_accs, train_losses = [], []
    for e in range(n_epochs):
        ep_losses = []
        for img1, img2, targets in loader_train:
            resnet.train()
            for img in (img1, img2):  # both views, separate steps (:53-62)
                img = img.to(dtype=torch.float32)
                targets_l = targets.to(dtype=torch.long)
                score = resnet(img)
                loss = loss_fn(score, targets_l)
                loss.backward()
                optim.step()
                optim.zero_grad()
                ep_losses.append(loss.item())
        train_losses.append(sum(ep_losses) / len(ep_losses))
        val_loss, val_acc = ref_mu.test_ssl(
            resnet, torch.device("cpu"), loader_val,
            return_loss_accuracy=True)
        val_accs.append(float(val_acc))
        print(f"[ref supervised] epoch {e + 1}: train_loss="
              f"{train_losses[-1]:.4f} val_acc={val_acc:.2f}%", flush=True)
        if val_acc > best_acc:
            best_acc, patience_counter = val_acc, 0
            torch.save(resnet.state_dict(), best_path)
        else:
            patience_counter += 1
        if patience_counter == patience:  # :86-91, with the reload FIXED
            resnet.load_state_dict(torch.load(best_path))
            break
    resnet.load_state_dict(torch.load(best_path))
    test_loss, test_acc = ref_mu.test_ssl(
        resnet, torch.device("cpu"), loader_test,
        return_loss_accuracy=True)
    return {"train_loss": train_losses, "val_acc": val_accs,
            "best_val_acc": float(best_acc), "test_acc": float(test_acc)}


def ours_supervised(cfg, train_arr, val_arr, test_arr, n_epochs):
    from simclr_tpu.data.pipeline import DeviceDataset
    from simclr_tpu.train.supervised import train_supervised

    res = train_supervised(
        cfg,
        DeviceDataset.from_numpy(*train_arr),
        val_ds=DeviceDataset.from_numpy(*val_arr),
        test_ds=DeviceDataset.from_numpy(*test_arr),
        n_epochs=n_epochs, patience=4)
    return {"train_loss": [float(v) for v in res.history.loss["train"]],
            "val_acc": [float(v) for v in res.history.accuracy["valid"]],
            "best_val_acc": float(res.best_acc),
            "test_acc": float(res.test_acc)}


# ---------------------------------------------------------------------------
# Flow C: MINE.
# ---------------------------------------------------------------------------

def ref_mine(traced_path, train_arr, n_iter, mine_bs):
    import torch
    from torch.utils.data import DataLoader

    ref_data, ref_mu, ref_mine_mod, _, _, _ = _load_reference()
    configs = ref_mu.configs

    torch.manual_seed(0)
    aug = ref_data.compose_augmentation_train(
        32, mean_std=configs["cifar10_mean_std"])
    loader_joint = DataLoader(_paired_ds(ref_data, train_arr, aug, configs),
                              batch_size=mine_bs, shuffle=True)
    loader_marginal = DataLoader(_plain_ds(train_arr, aug),
                                 batch_size=mine_bs, shuffle=True)
    simclr_model = torch.jit.load(traced_path)
    mine_net = ref_mine_mod.MineNet(input_size=2 * 2048, hidden_size=512)
    mine_optim = torch.optim.Adam(mine_net.parameters(),
                                  lr=configs["mine_lr"])
    loss_all, mi_all = ref_mine_mod.train_mine(
        loader_joint, loader_marginal, simclr_model, torch.device("cpu"),
        mine_net, mine_optim, mi_between_repr=True, use_hidden_feat=True,
        n_iter=n_iter)
    return {"loss_trace": [float(v) for v in loss_all],
            "mi_trace": [float(v) for v in mi_all],
            "final_mi": float(mi_all[-1])}


def ours_mine(cfg, export, train_arr, n_iter, mine_bs):
    from simclr_tpu.data.pipeline import DeviceDataset
    from simclr_tpu.train.mine import train_mine_from_export

    res = train_mine_from_export(
        cfg, DeviceDataset.from_numpy(*train_arr), export,
        n_iter=n_iter, batch_size=mine_bs)
    return {"loss_trace": [float(v) for v in res.loss_trace],
            "mi_trace": [float(v) for v in res.mi_trace],
            "final_mi": float(res.final_mi)}


# ---------------------------------------------------------------------------

def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--flows", nargs="+",
                   default=["finetune", "supervised", "mine"],
                   choices=["finetune", "supervised", "mine"])
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_val", type=int, default=512)
    p.add_argument("--n_test", type=int, default=1000)
    p.add_argument("--pretrain_epochs", type=int, default=4)
    p.add_argument("--ft_epochs", type=int, default=8)
    p.add_argument("--sup_epochs", type=int, default=4)
    p.add_argument("--mine_iters", type=int, default=300)
    p.add_argument("--mine_bs", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--out", default="results/downstream_shootout")
    p.add_argument("--acc_tol", type=float, default=6.0,
                   help="max |test-acc delta| pp for finetune/supervised "
                        "(different augmentation RNG + small data)")
    p.add_argument("--skip_reference", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="Force JAX onto the CPU so the 'ours' halves can "
                        "run next to a chip-bound job (the comparison is "
                        "about math, not hardware; the production shootout "
                        "covers the on-chip path).")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    train_arr, val_arr, test_arr = make_data(
        args.n_train, args.n_val, args.n_test)

    from simclr_tpu.config import Config

    base = Config.for_dataset("cifar10")
    cfg = base.replace(train=dataclasses.replace(
        base.train, batch_size=args.batch_size, save_ckpt=False, seed=0))

    export = pretrain_ours(cfg, train_arr, val_arr, out,
                           args.pretrain_epochs)
    _, ref_mu, _, SimCLRMain, _, _ = _load_reference()
    traced = str(out / "pretrained_traced.pt")
    if not os.path.isfile(traced):
        traced = trace_reference_model(export, out, SimCLRMain,
                                       ref_mu.configs)

    results = {}
    if (out / "results.json").is_file():
        results = json.loads((out / "results.json").read_text())

    def run_flow(name, ref_fn, ours_fn, verdict_fn):
        entry = results.get(name, {})
        if args.skip_reference and "reference" in entry:
            ref = entry["reference"]
        else:
            print(f"=== {name}: reference (live torch CPU) ===", flush=True)
            ref = ref_fn()
            results[name] = {"reference": ref}
            (out / "results.json").write_text(json.dumps(results, indent=2))
        print(f"=== {name}: ours ===", flush=True)
        ours = ours_fn()
        verdict = verdict_fn(ref, ours)
        results[name] = {"reference": ref, "ours": ours, **verdict}
        (out / "results.json").write_text(json.dumps(results, indent=2))
        print(f"{name}: {'PASS' if verdict['pass'] else 'FAIL'} "
              f"{verdict}", flush=True)

    if "finetune" in args.flows:
        run_flow(
            "finetune",
            lambda: ref_finetune(traced, train_arr, test_arr,
                                 args.ft_epochs, args.batch_size,
                                 cfg.train.ssl_label_size, out.resolve()),
            lambda: ours_finetune(cfg, export, train_arr, test_arr,
                                  args.ft_epochs),
            lambda r, o: {
                "test_acc_delta_pp": round(o["test_acc"] - r["test_acc"], 2),
                "tolerance_pp": args.acc_tol,
                "pass": abs(o["test_acc"] - r["test_acc"]) <= args.acc_tol,
            })

    if "supervised" in args.flows:
        run_flow(
            "supervised",
            lambda: ref_supervised(train_arr, val_arr, test_arr,
                                   args.sup_epochs, args.batch_size,
                                   out.resolve()),
            lambda: ours_supervised(cfg, train_arr, val_arr, test_arr,
                                    args.sup_epochs),
            lambda r, o: {
                "test_acc_delta_pp": round(o["test_acc"] - r["test_acc"], 2),
                "tolerance_pp": args.acc_tol,
                "pass": abs(o["test_acc"] - r["test_acc"]) <= args.acc_tol,
            })

    if "mine" in args.flows:
        def mine_verdict(r, o):
            import numpy as np
            r_mi, o_mi = r["final_mi"], o["final_mi"]
            r_rise = r["mi_trace"][-1] > r["mi_trace"][0]
            o_rise = o["mi_trace"][-1] > o["mi_trace"][0]
            same_sign = (r_mi > 0) == (o_mi > 0)
            hi, lo = max(abs(r_mi), abs(o_mi)), min(abs(r_mi), abs(o_mi))
            scale_ok = (abs(r_mi - o_mi) <= 1.0) or (lo > 0
                                                     and hi / lo <= 2.0)
            return {
                "final_mi_ref": round(r_mi, 4),
                "final_mi_ours": round(o_mi, 4),
                "both_ascending": bool(r_rise and o_rise),
                "same_sign": bool(same_sign),
                "tolerance": "|delta|<=1.0 nat OR ratio<=2x; both traces "
                             "ascending; same sign",
                "pass": bool(r_rise and o_rise and same_sign and scale_ok),
            }
        run_flow(
            "mine",
            lambda: ref_mine(traced, train_arr, args.mine_iters,
                             args.mine_bs),
            lambda: ours_mine(cfg, export, train_arr, args.mine_iters,
                              args.mine_bs),
            mine_verdict)

    # README table.
    lines = [
        "# Downstream trajectory shootouts — live reference vs this "
        "framework",
        "",
        f"Shared pretrained weights (ours, {args.pretrain_epochs} epochs "
        f"production config on {args.n_train} hard-synthetic images, "
        "ported to the reference via utils/torch_port + torch.jit.trace). "
        "Reference flows execute /root/reference's own code on CPU torch "
        "(train_ssl: utils/model_utils.py:300-369; supervised loop: "
        "training_others/train_supervised.py:49-91 re-driven — the "
        "original is an unparameterized __main__ with a broken reload at "
        ":95; MINE: mine.py:112-171).",
        "",
        "| flow | reference | ours | delta | tolerance | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for name in ("finetune", "supervised", "mine"):
        if name not in results or "pass" not in results[name]:
            continue
        e = results[name]
        if name == "mine":
            lines.append(
                f"| mine (final smoothed DV MI) "
                f"| {e['final_mi_ref']:.3f} | {e['final_mi_ours']:.3f} "
                f"| {e['final_mi_ours'] - e['final_mi_ref']:+.3f} "
                f"| {e['tolerance']} "
                f"| {'PASS' if e['pass'] else 'FAIL'} |")
        else:
            r, o = e["reference"], e["ours"]
            lines.append(
                f"| {name} (test top-1) | {r['test_acc']:.2f}% "
                f"| {o['test_acc']:.2f}% | {e['test_acc_delta_pp']:+.2f} pp "
                f"| ±{e['tolerance_pp']} pp "
                f"| {'PASS' if e['pass'] else 'FAIL'} |")
    all_pass = all(results[n].get("pass") for n in results
                   if "pass" in results[n])
    lines += ["", f"**{'PASS' if all_pass else 'FAIL'}** "
              "(full trajectories in results.json)"]
    (out / "README.md").write_text("\n".join(lines) + "\n")
    print("overall:", "PASS" if all_pass else "FAIL", "| artifacts in", out)
    if not all_pass:
        sys.exit(1)


if __name__ == "__main__":
    main()
