"""Representation similarity metrics.

Counterpart of reference utils/metrics.py:11-272: normalized Euclidean
distance, normalized squared Euclidean distance, correlation coefficient,
cosine similarity over positive pairs and shuffled-batch negatives, the
bucketize helper, and the model-comparison drivers (contrastive vs
supervised features; original-vs-augmented analogy analysis).

All batch math is pure jnp (jit-friendly); the drivers iterate device
batches and accumulate host-side lists exactly like the reference's
tqdm loops (metrics.py:98-128, 152-176).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import DeviceDataset, iterate_sequential
from simclr_tpu.ops.augment import augment_test, augment_train_pair
from simclr_tpu.ops.losses import l2_normalize

Array = jax.Array


def calc_ned(a: Array, b: Array) -> Array:
    """Normalized Euclidean distance after unit-norm scaling
    (reference: metrics.py:11-26)."""
    a = l2_normalize(a, axis=1)
    b = l2_normalize(b, axis=1)
    return jnp.sqrt(jnp.mean((a - b) ** 2, axis=1))


def calc_nsed(a: Array, b: Array) -> Array:
    """Normalized squared Euclidean distance (reference: metrics.py:29-39):
    centred SED over the sum of squared norms."""
    va = a - jnp.mean(a, axis=1, keepdims=True)
    vb = b - jnp.mean(b, axis=1, keepdims=True)
    sed = jnp.sum((va - vb) ** 2, axis=1)
    denom = (jnp.linalg.norm(va, axis=1) ** 2
             + jnp.linalg.norm(vb, axis=1) ** 2)
    return sed / denom


def calc_corrcoeff(a: Array, b: Array) -> Array:
    """Per-row correlation coefficient (reference: metrics.py:42-55)."""
    va = a - jnp.mean(a, axis=1, keepdims=True)
    vb = b - jnp.mean(b, axis=1, keepdims=True)
    return jnp.sum(va * vb, axis=1) / jnp.sqrt(
        jnp.sum(va ** 2, axis=1) * jnp.sum(vb ** 2, axis=1))


def cosine_similarity(a: Array, b: Array, eps: float = 1e-8) -> Array:
    """torch nn.CosineSimilarity(dim=1) parity (reference: metrics.py:95)."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=1), eps)
    return jnp.sum(a * b, axis=1) / (na * nb)


def bucketize_feature_values(feat: Array) -> Array:
    """Bucket feature values into hidden_dim/2 buckets spanning the tensor's
    own range (reference: metrics.py:58-73)."""
    n_buckets = feat.shape[-1] // 2
    bdr = jnp.linspace(jnp.min(feat), jnp.max(feat), n_buckets + 1)
    return jnp.searchsorted(bdr, feat)[None]


def calc_nmi(a: Array, b: Array, n_buckets: int = 16) -> Array:
    """Per-row normalized mutual information between bucketized feature
    vectors.

    The reference ships the bucketize helper (metrics.py:58-73) and
    produces NMI comparison distributions offline (examples/nmi_comp.png);
    this is the on-device computation: each vector's values are bucketed
    over its own range, the joint histogram over the feature dimension is
    built as a one-hot matmul (MXU-friendly), and
    NMI = I(A;B) / sqrt(H(A) H(B)).
    """
    def bucket(x):
        lo = jnp.min(x, axis=1, keepdims=True)
        hi = jnp.max(x, axis=1, keepdims=True)
        t = (x - lo) / jnp.maximum(hi - lo, 1e-12)
        return jnp.clip((t * n_buckets).astype(jnp.int32), 0,
                        n_buckets - 1)

    d = a.shape[1]
    one_a = jax.nn.one_hot(bucket(a), n_buckets)       # (N, D, K)
    one_b = jax.nn.one_hot(bucket(b), n_buckets)
    joint = jnp.einsum("ndk,ndl->nkl", one_a, one_b,
                       preferred_element_type=jnp.float32) / d
    pa = jnp.sum(joint, axis=2)
    pb = jnp.sum(joint, axis=1)

    def entropy(p):
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0), axis=-1)

    outer = pa[:, :, None] * pb[:, None, :]
    mi = jnp.sum(
        jnp.where(joint > 0,
                  joint * (jnp.log(jnp.maximum(joint, 1e-12))
                           - jnp.log(jnp.maximum(outer, 1e-12))),
                  0.0),
        axis=(1, 2))
    return mi / jnp.maximum(jnp.sqrt(entropy(pa) * entropy(pb)), 1e-12)


_METRIC_KEYS = ("pos_ned", "pos_cc", "pos_cos",
                "neg_ned", "neg_cc", "neg_cos",
                "pos_nmi", "neg_nmi")


def _pairwise_metrics(feat: Array, feat_pos: Array,
                      perm: Array) -> Dict[str, Array]:
    """One batch of positive/negative similarity stats. Negatives are the
    positive batch shuffled by `perm` (reference: metrics.py:116)."""
    feat = feat.reshape(feat.shape[0], -1)
    feat_pos = feat_pos.reshape(feat_pos.shape[0], -1)
    feat_neg = feat_pos[perm]
    return {
        "pos_ned": calc_nsed(feat, feat_pos),
        "neg_ned": calc_nsed(feat, feat_neg),
        "pos_cc": calc_corrcoeff(feat, feat_pos),
        "neg_cc": calc_corrcoeff(feat, feat_neg),
        "pos_cos": cosine_similarity(feat, feat_pos),
        "neg_cos": cosine_similarity(feat, feat_neg),
        "pos_nmi": calc_nmi(feat, feat_pos),
        "neg_nmi": calc_nmi(feat, feat_neg),
    }


def get_similarity_metrics(
    feature_fn,
    ds: DeviceDataset,
    cfg: Config,
    batch_size: int = 256,
    key: Optional[jax.Array] = None,
    n_batches: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Similarity-metric distributions over augmented pairs.

    `feature_fn` is a FeatureFn — (variables, images_f32, key) -> features
    plus its variables — from `contrastive_feature_fn` /
    `supervised_feature_fn` (the reference's two drivers,
    metrics.py:76-129, 132-176), or any (fn, variables) pair. Variables are
    jit arguments (not closure constants) so model weights never get baked
    into the compiled program.
    """
    fn, variables = feature_fn
    key = key if key is not None else jax.random.key(0)
    out = {k: [] for k in _METRIC_KEYS}

    @jax.jit
    def batch_metrics(variables, images, k):
        k_aug, k_f1, k_f2, k_perm = jax.random.split(k, 4)
        v1, v2 = augment_train_pair(k_aug, images, cfg.augment, cfg.dataset)
        feat = fn(variables, v1, k_f1)
        feat_pos = fn(variables, v2, k_f2)
        perm = jax.random.permutation(k_perm, images.shape[0])
        return _pairwise_metrics(feat, feat_pos, perm)

    for i, (images, _) in enumerate(iterate_sequential(ds, batch_size)):
        if images.shape[0] < batch_size:
            break  # keep one compiled shape
        if n_batches is not None and i >= n_batches:
            break
        key, sub = jax.random.split(key)
        m = batch_metrics(variables, images, sub)
        for k in _METRIC_KEYS:
            out[k].extend(np.asarray(m[k]).tolist())
    return {k: np.asarray(v) for k, v in out.items()}


def contrastive_feature_fn(model, params, batch_stats,
                           use_hidden_feat: bool = True):
    """SimCLR h- or z-features (reference: metrics.py:105-110).
    Returns a FeatureFn: ((variables, x, key) -> features, variables)."""
    variables = {"params": params, "batch_stats": batch_stats}

    def fn(variables, x, key):
        h, z = model.apply(variables, x, train=False,
                           rngs={"dropout": key})
        return h if use_hidden_feat else z

    return fn, variables


def supervised_feature_fn(model, params, batch_stats):
    """Supervised-model output features (reference: metrics.py:157-160).
    Returns a FeatureFn: ((variables, x, key) -> features, variables)."""
    variables = {"params": params, "batch_stats": batch_stats}

    def fn(variables, x, key):
        return model.apply(variables, x, train=False,
                           rngs={"dropout": key})

    return fn, variables


def get_similarity_metrics_pairs(
    contrastive_fn, supervised_fn, ds: DeviceDataset, cfg: Config, **kw
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Both models on the same data (reference: metrics.py:179-210)."""
    return (get_similarity_metrics(contrastive_fn, ds, cfg, **kw),
            get_similarity_metrics(supervised_fn, ds, cfg, **kw))


def get_representation_analogy(
    feature_fn1,
    feature_fn2,
    ds: DeviceDataset,
    cfg: Config,
    batch_size: int = 256,
    key: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """L1/L2 distance between representations of original vs augmented
    (h-flipped, reference: metrics.py:229-233) images for two models
    (reference: metrics.py:237-272)."""
    key = key if key is not None else jax.random.key(0)
    images = ds.images[:batch_size]
    orig = augment_test(images, cfg.dataset)
    flipped = orig[:, :, ::-1, :]  # RandomHorizontalFlip(p=1)

    out = {}
    for name, feature_fn in (("model1", feature_fn1),
                             ("model2", feature_fn2)):
        fn, variables = feature_fn
        key, k1, k2 = jax.random.split(key, 3)
        r_orig = fn(variables, orig, k1)
        r_aug = fn(variables, flipped, k2)
        out[f"{name}_l1"] = float(jnp.mean(jnp.abs(r_orig - r_aug)))
        out[f"{name}_l2"] = float(jnp.mean((r_orig - r_aug) ** 2))
    return out
