"""End-to-end REAL-data readiness: fabricate miniature on-disk CIFAR-10 /
STL-10 binary trees in the exact upstream formats, then drive
scripts/pretrain.py through the REAL-data code path (native/binary decoder
-> real splits -> real augmentation -> training) and assert the loss
descends.

The environment has no egress, so the real datasets are absent and every
other test exercises the synthetic stand-in; these tests guarantee that
the day the real binaries appear under --data_dir, nothing breaks.
Formats fabricated byte-for-byte like the upstream archives
(reference: data.py:271-527 consumes them via torchvision):

  * CIFAR-10 binary: cifar-10-batches-bin/{data_batch_1..5,test_batch}.bin,
    rows of 3073 bytes = 1 label byte + 3072 CHW pixel bytes.
  * STL-10 binary: stl10_binary/{unlabeled_X,train_X,test_X}.bin storing
    3x96x96 uint8 CHW with COLUMN-MAJOR channels (the reference undoes
    this at data.py:87), plus {train_y,test_y}.bin 1-based label bytes.

The CLI test runs in a fresh subprocess on the default backend (the real
TPU when present — compile there is ~2 min vs ~15+ min for the XLA-CPU
compile of the same epoch scan; on CPU-only hosts it still passes, just
slowly).
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _class_images(n, img_size, seed):
    """Class-structured uint8 HWC images (10 classes) so contrastive
    training has signal to descend on."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, size=n).astype(np.int32)
    protos = rng.randint(0, 256, size=(10, img_size, img_size, 3))
    noise = rng.randint(-40, 41, size=(n, img_size, img_size, 3))
    imgs = np.clip(protos[labels] + noise, 0, 255).astype(np.uint8)
    return imgs, labels


def _write_cifar10_bin_tree(root: Path, n_per_batch=64, n_test=64):
    """Miniature cifar-10-batches-bin/ in the upstream byte format."""
    d = root / "cifar-10-batches-bin"
    d.mkdir(parents=True)
    imgs, labels = _class_images(5 * n_per_batch + n_test, 32, seed=7)
    chw = imgs.transpose(0, 3, 1, 2)  # rows store CHW
    rows = np.concatenate(
        [labels[:, None].astype(np.uint8), chw.reshape(len(imgs), -1)],
        axis=1)
    for i in range(5):
        rows[i * n_per_batch:(i + 1) * n_per_batch].tofile(
            d / f"data_batch_{i + 1}.bin")
    rows[5 * n_per_batch:].tofile(d / "test_batch.bin")
    return imgs, labels


def _write_stl10_bin_tree(root: Path, n_unlabeled=96, n_labeled=32):
    """Miniature stl10_binary/ with the column-major channel quirk."""
    d = root / "stl10_binary"
    d.mkdir(parents=True)
    imgs, labels = _class_images(n_unlabeled + 2 * n_labeled, 96, seed=8)
    # HWC -> CHW with transposed (column-major) HW, as STL-10 ships.
    colmajor = imgs.transpose(0, 3, 2, 1)
    colmajor[:n_unlabeled].tofile(d / "unlabeled_X.bin")
    tr = slice(n_unlabeled, n_unlabeled + n_labeled)
    te = slice(n_unlabeled + n_labeled, None)
    colmajor[tr].tofile(d / "train_X.bin")
    (labels[tr] + 1).astype(np.uint8).tofile(d / "train_y.bin")  # 1-based
    colmajor[te].tofile(d / "test_X.bin")
    (labels[te] + 1).astype(np.uint8).tofile(d / "test_y.bin")
    return imgs, labels


def test_decoders_roundtrip_fabricated_trees(tmp_path):
    """The decoders must reproduce the fabricated images exactly (both
    the CHW row format and STL's column-major channels), and
    is_real_data must flip to True."""
    imgs_c, labels_c = _write_cifar10_bin_tree(tmp_path)
    imgs_s, labels_s = _write_stl10_bin_tree(tmp_path)

    from simclr_tpu.data.datasets import (
        is_real_data, load_cifar10, load_stl10)

    assert is_real_data("cifar10", str(tmp_path))
    assert is_real_data("stl10", str(tmp_path))

    xc, yc = load_cifar10(str(tmp_path), train=True)
    assert xc.shape == (320, 32, 32, 3) and xc.dtype == np.uint8
    np.testing.assert_array_equal(xc, imgs_c[:320])
    np.testing.assert_array_equal(yc, labels_c[:320])
    xt, yt = load_cifar10(str(tmp_path), train=False)
    np.testing.assert_array_equal(xt, imgs_c[320:])

    xu, yu = load_stl10(str(tmp_path), "unlabeled")
    assert xu.shape == (96, 96, 96, 3)
    np.testing.assert_array_equal(xu, imgs_s[:96])
    assert np.all(yu == -1)
    xtr, ytr = load_stl10(str(tmp_path), "train")
    np.testing.assert_array_equal(xtr, imgs_s[96:128])
    np.testing.assert_array_equal(ytr, labels_s[96:128])  # back to 0-based


def test_pretrain_cli_on_fabricated_cifar10_binaries(tmp_path):
    """scripts/pretrain.py end-to-end through the REAL-data path: binary
    decode, real 80/20 split, real augmentation, 2 epochs; the loss must
    descend and the export must appear."""
    _write_cifar10_bin_tree(tmp_path)
    out = tmp_path / "out"
    metrics_path = tmp_path / "metrics.jsonl"
    code = (
        "import sys, runpy, warnings\n"
        f"sys.argv = ['pretrain.py', '--dataset', 'cifar10',"
        f" '--data_dir', {str(tmp_path)!r}, '--n_epoch', '2',"
        f" '--batch_size', '32', '--no_save_ckpt',"
        f" '--metrics_path', {str(metrics_path)!r},"
        f" '--path_for_saving', {str(out)!r}]\n"
        "with warnings.catch_warnings():\n"
        "    warnings.simplefilter('error', UserWarning)\n"  # no synth!
        f"    runpy.run_path({str(REPO / 'scripts' / 'pretrain.py')!r},"
        "     run_name='__main__')\n"
    )
    import os
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=2400)
    assert proc.returncode == 0, (proc.stdout[-800:], proc.stderr[-2000:])
    assert "synthetic stand-in" not in proc.stdout + proc.stderr

    # Loss descends across the two epochs (JSONL metrics log).
    import json
    recs = [json.loads(line)
            for line in metrics_path.read_text().splitlines()]
    train_loss = [r["train_loss"] for r in recs if "train_loss" in r]
    assert len(train_loss) == 2 and train_loss[1] < train_loss[0], (
        train_loss)
    # Export artifact written (the TorchScript analogue).
    assert sorted(out.glob("*.msgpack")), list(out.iterdir())
