#!/usr/bin/env python
"""Representation-analysis CLI: similarity-metric KDEs, t-SNE cluster
plots, and original-vs-augmented analogy stats for a pretrained model.

The reference runs these by hand from notebooks against
utils/metrics.py + utils/visualizations.py and stores the results as
examples/*.png; this CLI produces the same artifact family in one shot:
  <out>/ned_comp.png, cc_comp.png, cos_comp.png   (KDE, pos vs neg)
  <out>/tsne_h.png, tsne_z.png                     (cluster plots)
  <out>/analogy.json                               (L1/L2 orig-vs-aug)
"""

import argparse
import json
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
    p.add_argument("--out", default="results/analysis")
    p.add_argument("--n_batches", type=int, default=20,
                   help="batches of 256 for the similarity metrics")
    p.add_argument("--tsne_points", type=int, default=3000)
    p.add_argument("--use_final_feat", action="store_true",
                   help="analyze z instead of h")
    p.add_argument("--supervised_model", default=None,
                   help="supervised baseline export (.msgpack from "
                        "scripts/train_supervised.py --export_path); when "
                        "given, the *_comp.png KDEs become the reference's "
                        "three-way overlay — contrastive h vs contrastive z "
                        "vs supervised (reference visualizations.py:11-47, "
                        "examples/{ned,cc,cos,nmi}_comp.png)")
    args = p.parse_args()

    import jax
    import numpy as np

    from simclr_tpu.data.pipeline import make_split
    from simclr_tpu.models.simclr import SimCLR
    from simclr_tpu.train.lin_eval import extract_features
    from simclr_tpu.utils.checkpoint import load_exported_model
    from simclr_tpu.utils.metrics import (
        contrastive_feature_fn,
        get_representation_analogy,
        get_similarity_metrics,
    )
    from simclr_tpu.utils.visualizations import (
        kde_multi_plot,
        kde_single_model_plot,
        tsne_plot,
    )

    cfg = Config.for_dataset(args.dataset).replace(data_dir=args.data_dir)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    params, batch_stats, _ = load_exported_model(args.model_path)
    model = SimCLR(cfg=cfg.model)
    split = make_split(cfg, "lin_eval")
    test = make_split(cfg, "test")

    feature_fn = contrastive_feature_fn(
        model, params, batch_stats,
        use_hidden_feat=not args.use_final_feat)

    print("computing similarity metrics ...")
    metrics = get_similarity_metrics(
        feature_fn, test.train, cfg, batch_size=256,
        n_batches=args.n_batches)
    if args.supervised_model:
        # Reference flagship figure: contrastive-h vs contrastive-z vs
        # supervised overlaid per metric (visualizations.py:11-47).
        from simclr_tpu.models.resnet import SupervisedResNet
        from simclr_tpu.utils.metrics import supervised_feature_fn

        z_fn = contrastive_feature_fn(
            model, params, batch_stats, use_hidden_feat=False)
        metrics_z = get_similarity_metrics(
            z_fn, test.train, cfg, batch_size=256,
            n_batches=args.n_batches)
        sup_params, sup_stats, _ = load_exported_model(
            args.supervised_model)
        sup_model = SupervisedResNet(
            num_classes=cfg.dataset.num_classes,
            low_quality_img=cfg.model.low_quality_img,
            stage_sizes=cfg.model.stage_sizes,
            width=cfg.model.width,
            bn_stats_fraction=cfg.model.bn_stats_fraction)
        sup_fn = supervised_feature_fn(sup_model, sup_params, sup_stats)
        metrics_sup = get_similarity_metrics(
            sup_fn, test.train, cfg, batch_size=256,
            n_batches=args.n_batches)
        for key_name in ("ned", "cc", "cos", "nmi"):
            kde_multi_plot(
                [metrics, metrics_z, metrics_sup], key_name,
                labels=("contrastive h", "contrastive z", "supervised"),
                title=f"{key_name} (positive vs negative pairs)",
                save_path=str(out / f"{key_name}_comp.png"))
    else:
        for key_name in ("ned", "cc", "cos", "nmi"):
            kde_single_model_plot(
                metrics, key_name,
                title=f"{key_name} (positive vs negative pairs)",
                save_path=str(out / f"{key_name}_comp.png"))
    print(f"pos/neg cosine means: {metrics['pos_cos'].mean():.3f} / "
          f"{metrics['neg_cos'].mean():.3f}")

    print("extracting features for t-SNE ...")
    feats_h, targets = extract_features(
        model, params, batch_stats, test.train, cfg, use_hidden_feat=True)
    tsne_plot(np.asarray(feats_h), np.asarray(targets),
              title="t-SNE of h (test set)",
              max_points=args.tsne_points,
              save_path=str(out / "tsne_h.png"))
    feats_z, _ = extract_features(
        model, params, batch_stats, test.train, cfg, use_hidden_feat=False)
    tsne_plot(np.asarray(feats_z), np.asarray(targets),
              title="t-SNE of z (test set)",
              max_points=args.tsne_points,
              save_path=str(out / "tsne_z.png"))

    print("analogy analysis (orig vs flipped) ...")
    analogy = get_representation_analogy(
        feature_fn, feature_fn, test.train, cfg)
    (out / "analogy.json").write_text(json.dumps(analogy, indent=2))

    # Scalar distributions of every similarity metric (the numbers behind
    # the KDE figures), so the artifact family is machine-checkable.
    def _summ(a):
        a = np.asarray(a, np.float64)
        qs = np.quantile(a, [0.05, 0.25, 0.5, 0.75, 0.95])
        return {"n": int(a.size), "mean": float(a.mean()),
                "std": float(a.std()),
                "q05": float(qs[0]), "q25": float(qs[1]),
                "median": float(qs[2]), "q75": float(qs[3]),
                "q95": float(qs[4])}

    (out / "metrics.json").write_text(json.dumps(
        {k: _summ(v) for k, v in metrics.items()}, indent=2))

    # Gradient flow on ONE contrastive training batch from the exported
    # weights (reference visualizations.py:245-276 plot_grad_flow, which
    # the reference calls mid-training from notebooks).
    print("one-batch gradient flow ...")
    import jax.numpy as jnp

    from simclr_tpu.ops.augment import augment_train_pair
    from simclr_tpu.train.pretrain import _forward_pair, contrastive_fn
    from simclr_tpu.utils.visualizations import (
        flatten_grads, plot_grad_flow)

    loss_fn = contrastive_fn(cfg)
    batch = jnp.take(split.train.images,
                     jnp.arange(min(256, int(split.train.n))), axis=0)
    k_aug, k_drop = jax.random.split(jax.random.key(0))
    v1, v2 = augment_train_pair(k_aug, batch, cfg.augment, cfg.dataset)

    @jax.jit
    def grad_one_batch(params, v1, v2):
        def objective(p):
            z1, z2, _ = _forward_pair(model, p, batch_stats, v1, v2,
                                      k_drop, train=True, two_pass=False)
            return loss_fn(z1, z2)[0]
        return jax.grad(objective)(params)

    grads = grad_one_batch(params, v1, v2)
    plot_grad_flow(flatten_grads(grads),
                   title="gradient flow (one NT-Xent batch)",
                   save_path=str(out / "grad_flow.png"))
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
