"""Visualization suite: KDE comparisons, t-SNE embeddings, loss/accuracy
curves, gradient-flow bars, image helpers.

Counterpart of reference utils/visualizations.py:11-276. Matplotlib/seaborn/
sklearn are imported lazily so headless training jobs never pay for them;
every figure-producing function accepts `save_path` and returns the figure.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _save(fig, save_path: Optional[str]):
    if save_path:
        os.makedirs(os.path.dirname(os.path.abspath(save_path)),
                    exist_ok=True)
        fig.savefig(save_path, bbox_inches="tight", dpi=150)
        # Saved figures are fire-and-forget from driver loops (e.g. the
        # pretrain end-of-training plots): release pyplot's reference so
        # long sweeps don't accumulate open figures.
        _plt().close(fig)
    return fig


def kde_multi_plot(
    metrics_list: Sequence[Dict[str, np.ndarray]],
    metric_key: str,
    labels: Sequence[str],
    title: str = "",
    save_path: Optional[str] = None,
):
    """KDE of a similarity metric for N models, positives vs negatives.

    The reference's flagship analysis figure overlays THREE models —
    contrastive h-features, contrastive z-projections, and the supervised
    baseline (reference: visualizations.py:11-47, behind
    examples/{ned,cc,cos,nmi}_comp.png); this is its N-way counterpart."""
    plt = _plt()
    import seaborn as sns

    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=True)
    for ax, which in zip(axes, ("pos", "neg")):
        key = f"{which}_{metric_key}"
        for metrics, label in zip(metrics_list, labels):
            sns.kdeplot(metrics[key], ax=ax, label=label, fill=True,
                        alpha=0.4)
        ax.set_title(f"{which} pairs")
        ax.set_xlabel(metric_key)
        ax.legend()
    fig.suptitle(title or f"{metric_key} comparison")
    return _save(fig, save_path)


def kde_comparison_plot(
    metrics_a: Dict[str, np.ndarray],
    metrics_b: Dict[str, np.ndarray],
    metric_key: str,
    labels: Tuple[str, str] = ("contrastive", "supervised"),
    title: str = "",
    save_path: Optional[str] = None,
):
    """Two-model KDE comparison (reference: visualizations.py:11-47)."""
    return kde_multi_plot([metrics_a, metrics_b], metric_key, labels,
                          title=title, save_path=save_path)


def kde_single_model_plot(
    metrics: Dict[str, np.ndarray],
    metric_key: str,
    title: str = "",
    save_path: Optional[str] = None,
):
    """Positive-vs-negative KDE for one model
    (reference: visualizations.py:50-87)."""
    plt = _plt()
    import seaborn as sns

    fig, ax = plt.subplots(figsize=(6, 4))
    sns.kdeplot(metrics[f"pos_{metric_key}"], ax=ax, label="positive",
                fill=True, alpha=0.4)
    sns.kdeplot(metrics[f"neg_{metric_key}"], ax=ax, label="negative",
                fill=True, alpha=0.4)
    ax.set_xlabel(metric_key)
    ax.legend()
    fig.suptitle(title or metric_key)
    return _save(fig, save_path)


def tsne_plot(
    features: np.ndarray,
    labels: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    title: str = "t-SNE",
    max_points: int = 5000,
    perplexity: float = 30.0,
    seed: int = 0,
    save_path: Optional[str] = None,
):
    """t-SNE of representations colored by class
    (reference: visualizations.py:90-202, sklearn TSNE(init='pca'))."""
    plt = _plt()
    from sklearn.manifold import TSNE

    n = min(features.shape[0], max_points)
    rng = np.random.RandomState(seed)
    sel = rng.choice(features.shape[0], size=n, replace=False)
    feats = np.asarray(features)[sel].reshape(n, -1)
    labs = np.asarray(labels)[sel]

    emb = TSNE(n_components=2, init="pca",
               perplexity=min(perplexity, max(n - 2, 1) / 3),
               random_state=seed).fit_transform(feats)
    fig, ax = plt.subplots(figsize=(7, 6))
    classes = np.unique(labs)
    cmap = plt.get_cmap("tab10")
    for i, c in enumerate(classes):
        mask = labs == c
        name = class_names[c] if class_names is not None else str(c)
        ax.scatter(emb[mask, 0], emb[mask, 1], s=4,
                   color=cmap(i % 10), label=name)
    ax.legend(markerscale=3, fontsize=8)
    ax.set_title(title)
    return _save(fig, save_path)


def plot_loss_acc(
    loss: Sequence[float],
    accuracy: Sequence[float],
    title: str = "loss_acc",
    save_plot: bool = False,
    save_dir: str = "results",
):
    """Twin-axis loss/accuracy curves (reference:
    visualizations.py:222-242, called from the train loop at
    model_utils.py:158-163)."""
    plt = _plt()
    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.plot(loss, color="tab:red", label="loss")
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("loss", color="tab:red")
    ax2 = ax1.twinx()
    ax2.plot(accuracy, color="tab:blue", label="accuracy")
    ax2.set_ylabel("accuracy (%)", color="tab:blue")
    fig.suptitle(title)
    return _save(fig, os.path.join(save_dir, f"{title}.png")
                 if save_plot else None)


def plot_grad_flow(
    grads_flat: Dict[str, np.ndarray],
    title: str = "gradient flow",
    save_path: Optional[str] = None,
):
    """Mean-|grad| bars per layer — gradient-health debugging
    (reference: visualizations.py:245-276). Pass a dict of flattened grad
    leaves, e.g. from `flatten_grads(grads)`."""
    plt = _plt()
    names = list(grads_flat)
    means = [float(np.mean(np.abs(grads_flat[n]))) for n in names]
    fig, ax = plt.subplots(figsize=(max(6, len(names) * 0.25), 4))
    ax.bar(range(len(names)), means, color="tab:cyan")
    ax.hlines(0, 0, len(names) + 1, lw=2, color="k")
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation="vertical", fontsize=5)
    ax.set_ylabel("mean |grad|")
    ax.set_title(title)
    return _save(fig, save_path)


def flatten_grads(grads) -> Dict[str, np.ndarray]:
    """Flatten a grad pytree into {path: leaf} for plot_grad_flow."""
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        out[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return out


def denormalize_image(
    img: np.ndarray, mean: Sequence[float], std: Sequence[float]
) -> np.ndarray:
    """Invert the normalize transform for display
    (reference: visualizations.py:205-219)."""
    x = np.asarray(img) * np.asarray(std) + np.asarray(mean)
    return np.clip(x, 0.0, 1.0)


def show_images(
    images: np.ndarray,
    mean: Optional[Sequence[float]] = None,
    std: Optional[Sequence[float]] = None,
    n_cols: int = 8,
    save_path: Optional[str] = None,
):
    """Grid display of (normalized) NHWC images."""
    plt = _plt()
    n = images.shape[0]
    n_rows = -(-n // n_cols)
    fig, axes = plt.subplots(n_rows, n_cols,
                             figsize=(n_cols * 1.3, n_rows * 1.3))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            img = images[i]
            if mean is not None and std is not None:
                img = denormalize_image(img, mean, std)
            ax.imshow(img)
    return _save(fig, save_path)
