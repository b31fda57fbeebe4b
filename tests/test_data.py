"""Tests for dataset decoding and the device-resident pipeline."""

import os
import pickle

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config
from simclr_tpu.data import (
    DeviceDataset,
    class_weights,
    epoch_permutation,
    host_stream,
    infinite_stream,
    iterate_epoch,
    iterate_sequential,
    load_cifar10,
    load_dataset,
    make_split,
    split_indices,
    synthetic_dataset,
    weighted_sample_indices,
)


def write_fake_cifar_python(tmp_path, n_per_batch=20):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    all_imgs, all_labels = [], []
    for i in range(1, 6):
        data = rng.randint(0, 256, size=(n_per_batch, 3072), dtype=np.uint8)
        labels = rng.randint(0, 10, size=n_per_batch).tolist()
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({"data": data, "labels": labels}, f)
        all_imgs.append(data)
        all_labels.extend(labels)
    with open(d / "test_batch", "wb") as f:
        pickle.dump(
            {"data": rng.randint(0, 256, size=(10, 3072), dtype=np.uint8),
             "labels": rng.randint(0, 10, size=10).tolist()}, f)
    return np.concatenate(all_imgs), np.array(all_labels)


class TestDatasets:
    def test_cifar_python_roundtrip(self, tmp_path):
        raw, labels = write_fake_cifar_python(tmp_path)
        imgs, got_labels = load_cifar10(str(tmp_path), train=True)
        assert imgs.shape == (100, 32, 32, 3) and imgs.dtype == np.uint8
        np.testing.assert_array_equal(got_labels, labels)
        # CHW planar -> HWC: red plane first.
        np.testing.assert_array_equal(
            imgs[0, :, :, 0], raw[0, :1024].reshape(32, 32))
        np.testing.assert_array_equal(
            imgs[0, :, :, 2], raw[0, 2048:].reshape(32, 32))

    def test_cifar_binary_roundtrip(self, tmp_path):
        d = tmp_path / "cifar-10-batches-bin"
        d.mkdir()
        rng = np.random.RandomState(1)
        rows = np.concatenate(
            [rng.randint(0, 10, size=(8, 1)),
             rng.randint(0, 256, size=(8, 3072))], axis=1
        ).astype(np.uint8)
        for i in range(1, 6):
            rows.tofile(d / f"data_batch_{i}.bin")
        rows[:2].tofile(d / "test_batch.bin")
        imgs, labels = load_cifar10(str(tmp_path), train=True)
        assert imgs.shape == (40, 32, 32, 3)
        np.testing.assert_array_equal(labels[:8], rows[:, 0])

    def test_stl10_binary(self, tmp_path):
        d = tmp_path / "stl10_binary"
        d.mkdir()
        rng = np.random.RandomState(2)
        raw = rng.randint(0, 256, size=(3, 3, 96, 96), dtype=np.uint8)
        raw.tofile(d / "train_X.bin")
        (rng.randint(1, 11, size=3, dtype=np.uint8)).tofile(
            d / "train_y.bin")
        imgs, labels = load_dataset("stl10", "train", str(tmp_path))
        assert imgs.shape == (3, 96, 96, 3)
        assert labels.min() >= 0 and labels.max() <= 9
        # Column-major channel storage: HWC output = CHW.T per channel
        # (reference: data.py:87 transposes (1,2,0) on torchvision's
        # already-transposed data).
        np.testing.assert_array_equal(imgs[0, :, :, 0], raw[0, 0].T)

    def test_synthetic_fallback_warns_and_is_deterministic(self, tmp_path):
        with pytest.warns(UserWarning, match="synthetic"):
            a_imgs, a_labels = load_dataset(
                "cifar10", "train", str(tmp_path / "nope"),
                synthetic_size=64)
        with pytest.warns(UserWarning):
            b_imgs, b_labels = load_dataset(
                "cifar10", "train", str(tmp_path / "nope"),
                synthetic_size=64)
        np.testing.assert_array_equal(a_imgs, b_imgs)
        np.testing.assert_array_equal(a_labels, b_labels)

    def test_synthetic_has_class_signal(self):
        # Same-class images must correlate more than cross-class — but the
        # default 'hard' stand-in DELIBERATELY keeps raw-pixel similarity
        # weak (large nuisance components + unreliable colour) so accuracy
        # experiments don't saturate at 100% (measured margin ~0.10, vs
        # ~0.7 for 'easy'; raw-pixel linear probe ~23%).
        for difficulty, min_margin in (("hard", 0.05), ("easy", 0.2)):
            imgs, labels = synthetic_dataset(
                500, seed=3, difficulty=difficulty)
            f = imgs.reshape(500, -1).astype(np.float32)
            f = (f - f.mean(1, keepdims=True))
            f /= np.linalg.norm(f, axis=1, keepdims=True)
            sim = f @ f.T
            same = sim[labels[:, None] == labels[None, :]].mean()
            diff = sim[labels[:, None] != labels[None, :]].mean()
            assert same > diff + min_margin, (difficulty, same, diff)


class TestPipeline:
    def test_split_deterministic_and_disjoint(self):
        tr, va = split_indices(100, 0.2)
        tr2, va2 = split_indices(100, 0.2)
        np.testing.assert_array_equal(tr, tr2)
        assert len(tr) == 80 and len(va) == 20
        assert set(tr).isdisjoint(set(va))

    def test_class_weights(self):
        labels = np.array([0, 0, 0, 1])
        w = class_weights(labels)
        np.testing.assert_allclose(w, [1 / 3, 1 / 3, 1 / 3, 1.0])

    def test_epoch_permutation_covers_all(self):
        idx = epoch_permutation(jax.random.key(0), 100, 10)
        assert idx.shape == (10, 10)
        assert sorted(np.asarray(idx).ravel().tolist()) == list(range(100))

    def test_epoch_permutation_pad_mode(self):
        idx = epoch_permutation(
            jax.random.key(0), 103, 10, drop_remainder=False)
        assert idx.shape == (11, 10)

    def test_weighted_sampling_balances_classes(self):
        labels = np.array([0] * 900 + [1] * 100)
        w = jax.numpy.asarray(class_weights(labels))
        idx = weighted_sample_indices(jax.random.key(0), w, 4000, 100)
        drawn = labels[np.asarray(idx).ravel()]
        frac1 = (drawn == 1).mean()
        assert 0.42 < frac1 < 0.58  # ~0.5 by weighting despite 10% base rate

    def test_iterate_epoch_and_sequential(self):
        imgs = np.arange(20 * 4 * 4 * 3, dtype=np.uint8).reshape(20, 4, 4, 3)
        labels = np.arange(20, dtype=np.int32)
        ds = DeviceDataset.from_numpy(imgs, labels)
        batches = list(iterate_epoch(ds, jax.random.key(0), 8))
        assert len(batches) == 2  # drop remainder
        seq = list(iterate_sequential(ds, 8))
        assert [b[0].shape[0] for b in seq] == [8, 8, 4]
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(b[1]) for b in seq]), labels)

    def test_infinite_stream_reshuffles(self):
        ds = DeviceDataset.from_numpy(
            np.zeros((16, 2, 2, 3), np.uint8),
            np.arange(16, dtype=np.int32))
        it = infinite_stream(ds, jax.random.key(0), 16)
        _, l1 = next(it)
        _, l2 = next(it)
        assert not np.array_equal(np.asarray(l1), np.asarray(l2))
        assert sorted(np.asarray(l2).tolist()) == list(range(16))

    def test_host_stream_order_and_coverage(self):
        imgs = np.arange(30, dtype=np.uint8)[:, None, None, None] * np.ones(
            (1, 2, 2, 3), np.uint8)
        labels = np.arange(30, dtype=np.int32)
        out = list(host_stream(imgs, labels, 10, jax.random.key(1)))
        assert len(out) == 3
        got = np.concatenate([np.asarray(l) for _, l in out])
        assert sorted(got.tolist()) == list(range(30))

    def test_make_split_modes(self, tmp_path):
        cfg = Config(data_dir=str(tmp_path / "none"))
        with pytest.warns(UserWarning):
            sp = make_split(
                cfg.replace(train=cfg.train), "pretrain")
        assert sp.val is not None
        assert sp.train.n + sp.val.n == 50_000
        with pytest.warns(UserWarning):
            ft = make_split(cfg, "fine_tune")
        assert ft.val is None  # 10%-label regime has no val split
        with pytest.warns(UserWarning):
            te = make_split(cfg, "test")
        assert te.val is None and te.train.n == 10_000
