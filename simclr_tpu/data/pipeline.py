"""Device-resident data pipeline.

TPU-native replacement for the reference's DataLoader machinery
(reference: data.py:241-590 — worker processes, samplers, and the
AugmentedLoader facade). CIFAR-10 (150 MB) and even STL-10 unlabeled (2.7 GB)
fit in HBM, so the entire dataset is device-resident uint8; an "epoch" is an
on-device permutation and batches are index slices consumed directly by the
jitted train step (which fuses the row-gather with augmentation and the
model). Nothing touches the host after startup.

For datasets larger than HBM there is `host_stream`, a double-buffered
host->device feed: the next batch's `jax.device_put` is issued while the
current one computes (the role the reference's num_workers=2 prefetching
plays, minus the worker processes).

Epoch/split/sampler parity:
  * 80/20 train/val splits with a fixed seed (reference: data.py:304,
    315-317 — np.random.seed(42) + random_split).
  * Weighted 10%-label sampling WITH replacement for semi-supervised
    fine-tuning, weights 1/class-count (reference: data.py:220-238,
    381-392; torch WeightedRandomSampler default replacement=True).
  * Infinite shuffled stream for MINE — the reference rebuilds its loader
    iterator (re-forking workers) every single training iteration
    (reference: mine.py:38-39), a pathology this replaces.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.datasets import load_dataset

SPLIT_SEED = 42  # reference: data.py:304 (np.random.seed(42)).


@dataclasses.dataclass
class DeviceDataset:
    """A whole dataset living in device memory."""

    images: jax.Array  # (N, H, W, C) uint8
    labels: jax.Array  # (N,) int32

    @property
    def n(self) -> int:
        return self.images.shape[0]

    @staticmethod
    def from_numpy(images: np.ndarray, labels: np.ndarray,
                   sharding=None) -> "DeviceDataset":
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jax.device_put
        return DeviceDataset(put(images), put(jnp.asarray(labels)))


@dataclasses.dataclass
class Split:
    train: DeviceDataset
    val: Optional[DeviceDataset] = None


def split_indices(n: int, val_fraction: float,
                  seed: int = SPLIT_SEED) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic 80/20-style split (reference: data.py:315-317)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_val = int(val_fraction * n)
    return perm[n_val:], perm[:n_val]


def class_weights(labels: np.ndarray) -> np.ndarray:
    """Per-sample weights 1/class-count (reference: data.py:220-238)."""
    counts = np.bincount(labels, minlength=labels.max() + 1)
    return 1.0 / counts[labels]


def epoch_permutation(key: jax.Array, n: int, batch_size: int,
                      drop_remainder: bool = True) -> jax.Array:
    """On-device shuffled index matrix of shape (steps, batch_size)."""
    perm = jax.random.permutation(key, n)
    steps = n // batch_size
    if not drop_remainder and steps * batch_size < n:
        pad = batch_size - (n - steps * batch_size)
        perm = jnp.concatenate([perm, perm[:pad]])
        steps += 1
    return perm[: steps * batch_size].reshape(steps, batch_size)


def weighted_sample_indices(
    key: jax.Array, weights: jax.Array, num_samples: int,
    batch_size: int,
) -> jax.Array:
    """Weighted-with-replacement epoch indices, shaped (steps, batch)
    (reference: data.py:383-392 WeightedRandomSampler semantics)."""
    p = weights / jnp.sum(weights)
    idx = jax.random.choice(
        key, weights.shape[0], shape=(num_samples,), replace=True, p=p)
    steps = num_samples // batch_size
    return idx[: steps * batch_size].reshape(steps, batch_size)


def take_batch(ds: DeviceDataset, idx: jax.Array) -> Tuple[jax.Array,
                                                           jax.Array]:
    """Gather one batch by indices (runs on device; the jitted train step
    does this internally so it fuses with augmentation)."""
    return jnp.take(ds.images, idx, axis=0), jnp.take(ds.labels, idx, axis=0)


def iterate_epoch(
    ds: DeviceDataset, key: jax.Array, batch_size: int,
    drop_remainder: bool = True,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Eager batch iterator (used by eval paths; the pretrain hot loop passes
    raw index rows to its jitted step instead)."""
    idx = epoch_permutation(key, ds.n, batch_size, drop_remainder)
    for step in range(idx.shape[0]):
        yield take_batch(ds, idx[step])


def iterate_sequential(
    ds: DeviceDataset, batch_size: int,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Unshuffled iteration incl. final partial batch (test loaders,
    reference: data.py:425-434 shuffle=False)."""
    for start in range(0, ds.n, batch_size):
        stop = min(start + batch_size, ds.n)
        yield ds.images[start:stop], ds.labels[start:stop]


def infinite_stream(
    ds: DeviceDataset, key: jax.Array, batch_size: int,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Infinite shuffled stream (for MINE; fixes reference mine.py:38-39)."""
    while True:
        key, sub = jax.random.split(key)
        yield from iterate_epoch(ds, sub, batch_size)


def host_stream(
    images: np.ndarray,
    labels: np.ndarray,
    batch_size: int,
    key: jax.Array,
    prefetch: int = 2,
    sharding=None,
) -> Iterator[Tuple[jax.Array, jax.Array]]:
    """Double-buffered host->device feed for datasets beyond HBM capacity.

    `jax.device_put` is asynchronous: issuing the next transfer before the
    current batch is consumed overlaps PCIe/DMA with TPU compute.
    """
    n = images.shape[0]
    perm = np.asarray(jax.random.permutation(key, n))
    steps = n // batch_size

    def put(step):
        idx = perm[step * batch_size:(step + 1) * batch_size]
        dev = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jax.device_put
        return dev(images[idx]), dev(labels[idx])

    buf = [put(i) for i in range(min(prefetch, steps))]
    for step in range(steps):
        if step + prefetch < steps:
            buf.append(put(step + prefetch))
        yield buf.pop(0)


# ---------------------------------------------------------------------------
# Loader facade (reference: AugmentedLoader, data.py:532-590).
# ---------------------------------------------------------------------------

def make_split(cfg: Config, mode: str, sharding=None) -> Split:
    """Build the device-resident datasets for a training mode.

    Modes mirror reference get_cifar10_dataloader/get_stl10_dataloader
    (data.py:271-529): 'pretrain', 'lin_eval', 'fine_tune',
    'supervised_bm', 'test'. Augmentation is NOT applied here — it runs
    fused inside the jitted train/eval step; this facade only decides which
    samples live where.
    """
    name = cfg.dataset.name
    val_frac = cfg.train.val_fraction

    if mode == "pretrain":
        split_name = "unlabeled" if name == "stl10" else "train"
        images, labels = load_dataset(name, split_name, cfg.data_dir)
        tr, va = split_indices(images.shape[0], val_frac)
        return Split(
            DeviceDataset.from_numpy(images[tr], labels[tr], sharding),
            DeviceDataset.from_numpy(images[va], labels[va], sharding),
        )
    if mode in ("lin_eval", "supervised_bm"):
        images, labels = load_dataset(name, "train", cfg.data_dir)
        tr, va = split_indices(images.shape[0], val_frac)
        return Split(
            DeviceDataset.from_numpy(images[tr], labels[tr], sharding),
            DeviceDataset.from_numpy(images[va], labels[va], sharding),
        )
    if mode == "fine_tune":
        images, labels = load_dataset(name, "train", cfg.data_dir)
        if cfg.train.ssl_label_size >= 1.0:
            tr, va = split_indices(images.shape[0], val_frac)
            return Split(
                DeviceDataset.from_numpy(images[tr], labels[tr], sharding),
                DeviceDataset.from_numpy(images[va], labels[va], sharding),
            )
        # 10%-label regime: keep the whole labelled pool on device; the
        # trainer draws weighted samples per epoch (no val split —
        # reference: data.py:381-392).
        return Split(DeviceDataset.from_numpy(images, labels, sharding))
    if mode == "test":
        images, labels = load_dataset(name, "test", cfg.data_dir)
        return Split(DeviceDataset.from_numpy(images, labels, sharding))
    raise NotImplementedError(f"unknown mode {mode!r}")
