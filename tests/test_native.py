"""Tests for the C++ data plane (decode + batch pipeline), checked against
the numpy decoders."""

import numpy as np
import pytest

from simclr_tpu.data import native
from simclr_tpu.data.datasets import load_cifar10, load_stl10

pytestmark = pytest.mark.skipif(
    native.load_library() is None, reason="native toolchain unavailable")


def write_cifar_bin(tmp_path, n=8, seed=0):
    d = tmp_path / "cifar-10-batches-bin"
    d.mkdir()
    rng = np.random.RandomState(seed)
    rows = np.concatenate(
        [rng.randint(0, 10, size=(n, 1)),
         rng.randint(0, 256, size=(n, 3072))], axis=1).astype(np.uint8)
    for i in range(1, 6):
        rows.tofile(d / f"data_batch_{i}.bin")
    rows.tofile(d / "test_batch.bin")
    return str(d), rows


class TestNativeDecode:
    def test_cifar_matches_numpy(self, tmp_path):
        bin_dir, rows = write_cifar_bin(tmp_path)
        native_out = native.decode_cifar10_binary(bin_dir, True)
        assert native_out is not None
        imgs, labels = native_out
        assert imgs.shape == (40, 32, 32, 3)
        np.testing.assert_array_equal(labels[:8], rows[:, 0])
        # Compare against the pure-numpy CHW->HWC path.
        ref = rows[:, 1:].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(imgs[:8], ref)

    def test_cifar_via_load_dataset(self, tmp_path):
        bin_dir, rows = write_cifar_bin(tmp_path, n=4, seed=1)
        imgs, labels = load_cifar10(str(tmp_path), train=False)
        assert imgs.shape == (4, 32, 32, 3)
        np.testing.assert_array_equal(labels, rows[:, 0])

    def test_stl10_matches_numpy(self, tmp_path):
        d = tmp_path / "stl10_binary"
        d.mkdir()
        rng = np.random.RandomState(2)
        raw = rng.randint(0, 256, size=(3, 3, 96, 96), dtype=np.uint8)
        raw.tofile(d / "train_X.bin")
        y = rng.randint(1, 11, size=3, dtype=np.uint8)
        y.tofile(d / "train_y.bin")
        imgs, labels = load_stl10(str(tmp_path), "train")
        np.testing.assert_array_equal(imgs[1, :, :, 2], raw[1, 2].T)
        np.testing.assert_array_equal(labels, y.astype(np.int32) - 1)


class TestNativePipeline:
    def test_epoch_coverage_and_reshuffle(self):
        n, batch = 64, 16
        images = (np.arange(n, dtype=np.uint8)[:, None, None, None]
                  * np.ones((1, 2, 2, 3), np.uint8))
        labels = np.arange(n, dtype=np.int32)
        with native.NativePipeline(images, labels, batch, seed=7) as pipe:
            assert pipe.steps_per_epoch == 4
            epoch1, epoch2 = [], []
            for _ in range(4):
                imgs, labs = pipe.next()
                assert imgs.shape == (batch, 2, 2, 3)
                np.testing.assert_array_equal(imgs[:, 0, 0, 0],
                                              labs.astype(np.uint8))
                epoch1.extend(labs.tolist())
            for _ in range(4):
                _, labs = pipe.next()
                epoch2.extend(labs.tolist())
        assert sorted(epoch1) == list(range(n))
        assert sorted(epoch2) == list(range(n))
        assert epoch1 != epoch2  # reshuffled between epochs

    def test_rejects_oversized_batch(self):
        images = np.zeros((4, 2, 2, 3), np.uint8)
        labels = np.zeros((4,), np.int32)
        with pytest.raises(ValueError):
            native.NativePipeline(images, labels, batch_size=8)
