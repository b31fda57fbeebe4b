"""Tests for elastic auto-resume, auxiliary-task evaluation, and CLI
argument surfaces."""

import subprocess
import sys

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config, ModelConfig, TrainConfig
from simclr_tpu.data.datasets import synthetic_dataset
from simclr_tpu.data.pipeline import DeviceDataset, Split
from simclr_tpu.train.pretrain import (
    build_engine,
    evaluate_auxiliary,
    init_simclr,
    pretrain,
)

TINY = ModelConfig(feature_dim=64, compressed_dim=16,
                   stage_sizes=(1, 1, 1, 1), width=2)


def tiny_cfg(tmp_path, **kw):
    base = dict(n_epoch=2, batch_size=16, save_ckpt=True,
                save_ckpt_every=1)
    base.update(kw)
    return Config(model=TINY, train=TrainConfig(**base),
                  data_dir=str(tmp_path / "d"),
                  out_dir=str(tmp_path / "o"),
                  ckpt_dir=str(tmp_path / "c"))


def tiny_split():
    imgs, labels = synthetic_dataset(80, img_size=32, seed=0)
    return Split(DeviceDataset.from_numpy(imgs[:64], labels[:64]),
                 DeviceDataset.from_numpy(imgs[64:], labels[64:]))


def test_auto_resume_continues_from_latest(tmp_path):
    cfg = tiny_cfg(tmp_path)
    pretrain(cfg, split=tiny_split(), log=lambda m: None)
    cfg3 = tiny_cfg(tmp_path, n_epoch=3, save_ckpt=False)
    res = pretrain(cfg3, split=tiny_split(), resume_from="auto",
                   log=lambda m: None)
    assert len(res.history.loss["train"]) == 3  # 2 restored + 1 new


def test_auto_resume_fresh_when_no_checkpoint(tmp_path):
    cfg = tiny_cfg(tmp_path, n_epoch=1, save_ckpt=False)
    msgs = []
    res = pretrain(cfg, split=tiny_split(), resume_from="auto",
                   log=msgs.append)
    assert any("no checkpoint found" in m for m in msgs)
    assert len(res.history.loss["train"]) == 1


def test_evaluate_auxiliary(tmp_path):
    cfg = tiny_cfg(tmp_path, n_epoch=1, save_ckpt=False)
    split = tiny_split()
    res = pretrain(cfg, split=split, log=lambda m: None)
    model, _, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)
    loss, acc = evaluate_auxiliary(engine, res.state, split.train,
                                   batch_size=16)
    assert np.isfinite(loss)
    assert 0.0 <= acc <= 100.0


@pytest.mark.parametrize("script", [
    "scripts/pretrain.py", "scripts/train_ssl.py",
    "scripts/train_supervised.py", "scripts/train_mine.py",
    "scripts/lin_eval.py", "scripts/analysis.py", "scripts/temp_sweep.py",
    "scripts/batch_sweep.py", "scripts/parity_run.py",
])
def test_cli_help(script):
    out = subprocess.run([sys.executable, script, "--help"],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()


def test_pretrain_saves_loss_acc_plots(tmp_path):
    """End-of-training loss/accuracy PNGs, like the reference's automatic
    plot_loss_acc calls (reference: utils/model_utils.py:158-163)."""
    import os

    cfg = tiny_cfg(tmp_path, n_epoch=1, save_ckpt=False)
    pretrain(cfg, split=tiny_split(), log=lambda m: None)
    pngs = [f for f in os.listdir(cfg.out_dir) if f.endswith(".png")]
    assert any(f.startswith("train_") for f in pngs)
    assert any(f.startswith("valid_") for f in pngs)
