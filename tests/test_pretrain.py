"""End-to-end pretraining smoke tests on a tiny model + synthetic data."""

import dataclasses

import jax
import numpy as np
import pytest

from simclr_tpu.config import Config, ModelConfig, TrainConfig
from simclr_tpu.data.datasets import synthetic_dataset
from simclr_tpu.data.pipeline import DeviceDataset, Split
from simclr_tpu.parallel.mesh import make_mesh
from simclr_tpu.train.pretrain import pretrain
from simclr_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_exported_model,
)

TINY_MODEL = ModelConfig(
    feature_dim=64, compressed_dim=16,
    stage_sizes=(1, 1, 1, 1), width=2,
)


def tiny_cfg(tmp_path, **train_kw):
    kw = dict(n_epoch=2, batch_size=16, save_ckpt=False, temperature=0.5)
    kw.update(train_kw)
    train = TrainConfig(**kw)
    return Config(
        model=TINY_MODEL, train=train,
        data_dir=str(tmp_path / "data"),
        out_dir=str(tmp_path / "out"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )


def tiny_split(n_train=64, n_val=16):
    imgs, labels = synthetic_dataset(n_train + n_val, img_size=32, seed=0)
    return Split(
        DeviceDataset.from_numpy(imgs[:n_train], labels[:n_train]),
        DeviceDataset.from_numpy(imgs[n_train:], labels[n_train:]),
    )


@pytest.fixture(scope="module")
def quiet():
    return lambda msg: None


def test_pretrain_runs_and_learns(tmp_path, quiet):
    cfg = tiny_cfg(tmp_path).replace(
        train=dataclasses.replace(TrainConfig(), n_epoch=4, batch_size=16,
                                  save_ckpt=False))
    res = pretrain(cfg, split=tiny_split(), log=quiet)
    losses = res.history.loss["train"]
    assert len(losses) == 4
    assert np.isfinite(losses).all()
    # Contrastive loss must descend on structured synthetic data.
    assert losses[-1] < losses[0]
    assert len(res.history.loss["valid"]) == 4
    assert res.export_path is not None


def test_pretrain_modified_loss(tmp_path, quiet):
    cfg = tiny_cfg(tmp_path, modified_loss=True)
    res = pretrain(cfg, split=tiny_split(), log=quiet)
    assert np.isfinite(res.history.loss["train"]).all()


def test_pretrain_two_pass_views_close_to_fused(tmp_path, quiet):
    """Reference-parity two-forward mode must run and produce finite,
    comparable losses to the fused 2N-batch mode."""
    cfg = tiny_cfg(tmp_path)
    r_fused = pretrain(cfg, split=tiny_split(), log=quiet)
    r_two = pretrain(cfg, split=tiny_split(), two_pass_views=True,
                     log=quiet)
    a = r_fused.history.loss["train"][0]
    b = r_two.history.loss["train"][0]
    assert abs(a - b) / a < 0.2  # same math, different BN batch stats


def test_pretrain_grad_accum_mode(tmp_path, quiet):
    """accum_steps>1: reference parity — optimizer steps every k micro
    batches, history logs loss/k (model_utils.py:116-123)."""
    cfg = tiny_cfg(tmp_path, accum_steps=2)
    res = pretrain(cfg, split=tiny_split(), log=quiet)
    # Logged losses are divided by accum_steps -> roughly half of normal.
    cfg_plain = tiny_cfg(tmp_path)
    res_plain = pretrain(cfg_plain, split=tiny_split(), log=quiet)
    ratio = res.history.loss["train"][0] / res_plain.history.loss["train"][0]
    assert 0.35 < ratio < 0.65


def test_checkpoint_resume(tmp_path, quiet):
    cfg = tiny_cfg(tmp_path, save_ckpt=True, save_ckpt_every=1, n_epoch=2)
    pretrain(cfg, split=tiny_split(), log=quiet)
    path = latest_checkpoint(cfg.ckpt_dir)
    assert path is not None and path.endswith("epoch_00001")

    cfg3 = cfg.replace(
        train=dataclasses.replace(cfg.train, n_epoch=3, save_ckpt=False))
    res = pretrain(cfg3, split=tiny_split(), resume_from=path, log=quiet)
    # History carries the 2 restored epochs plus 1 new one.
    assert len(res.history.loss["train"]) == 3


def test_exported_model_loads(tmp_path, quiet):
    cfg = tiny_cfg(tmp_path, n_epoch=1)
    res = pretrain(cfg, split=tiny_split(), log=quiet)
    params, batch_stats, cfg_json = load_exported_model(res.export_path)
    assert "f" in params and "g" in params
    assert cfg_json["model"]["feature_dim"] == 64


def test_pretrain_on_virtual_mesh(tmp_path, quiet):
    """Full engine on the 8-device CPU mesh: batch sharded, embeddings
    all-gathered for the global NT-Xent."""
    mesh = make_mesh(8)
    cfg = tiny_cfg(tmp_path)
    res = pretrain(cfg, split=tiny_split(), mesh=mesh, log=quiet)
    assert np.isfinite(res.history.loss["train"]).all()


def test_pretrain_stl10_standard_stem(tmp_path, quiet):
    """STL-10 path: 96x96 inputs through the 7x7/s2 stem + maxpool
    (reference: pretrain.py:77 passes low_quality_img=False for stl10)."""
    import dataclasses as dc

    from simclr_tpu.config import STL10
    from simclr_tpu.data.datasets import synthetic_dataset
    cfg = tiny_cfg(tmp_path, n_epoch=1).replace(
        dataset=STL10,
        model=dc.replace(TINY_MODEL, low_quality_img=False))
    imgs, labels = synthetic_dataset(48, img_size=96, seed=21)
    split = Split(DeviceDataset.from_numpy(imgs[:32], labels[:32]),
                  DeviceDataset.from_numpy(imgs[32:], labels[32:]))
    res = pretrain(cfg, split=split, log=quiet)
    assert np.isfinite(res.history.loss["train"]).all()


def test_pretrain_dropout_encoder(tmp_path, quiet):
    """MC-dropout variant trains and validates (dropout active at eval)."""
    import dataclasses as dc

    cfg = tiny_cfg(tmp_path, n_epoch=1).replace(
        model=dc.replace(TINY_MODEL, encoder="dropout"))
    res = pretrain(cfg, split=tiny_split(), log=quiet)
    assert np.isfinite(res.history.loss["train"]).all()
    assert len(res.history.loss["valid"]) == 1


def test_mesh_loss_matches_single_device(tmp_path, quiet):
    """The sharded global-batch NT-Xent must equal the single-device loss:
    same data, same params => same first-epoch loss."""
    cfg = tiny_cfg(tmp_path, n_epoch=1)
    r1 = pretrain(cfg, split=tiny_split(), log=quiet)
    r8 = pretrain(cfg, split=tiny_split(), mesh=make_mesh(8), log=quiet)
    np.testing.assert_allclose(
        r1.history.loss["train"][0], r8.history.loss["train"][0],
        rtol=8e-3)  # bf16 matmuls reduce in different orders when sharded
    np.testing.assert_allclose(
        r1.history.accuracy["train"][0], r8.history.accuracy["train"][0],
        atol=2.0)
