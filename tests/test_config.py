"""Config tests incl. the reference-JSON compatibility loader."""

import json

import pytest

from simclr_tpu.config import CIFAR10, STL10, Config, dataset_config


def test_defaults_match_reference_keys():
    """Spot-check default parity with reference utils/configs.json."""
    cfg = Config()
    assert cfg.train.micro_batch_size == 64          # batch_size_small
    assert cfg.optim.lr == 1e-3
    assert cfg.train.temperature == 0.5              # temp
    assert cfg.model.feature_dim == 2048
    assert cfg.model.compressed_dim == 128
    assert cfg.optim.wt_decay == 1e-6
    assert cfg.train.ssl_label_size == 0.1
    assert cfg.optim.lbfgs_max_iter == 20
    assert cfg.model.drop_prob == 0.3
    assert cfg.dataset.mean == (0.4914, 0.4822, 0.4465)
    assert STL10.std == (0.2683, 0.2610, 0.2686)


def test_for_dataset_stl_uses_standard_stem():
    cfg = Config.for_dataset("stl10")
    assert cfg.dataset.img_size == 96
    assert not cfg.model.low_quality_img
    cfg_c = Config.for_dataset("cifar10")
    assert cfg_c.model.low_quality_img


def test_dataset_config_unknown():
    with pytest.raises(ValueError):
        dataset_config("mnist")


def test_from_reference_json(tmp_path):
    raw = {
        "augmentation_params": {"color_distort_strength": 0.7,
                                "color_drop_prob": 0.3},
        "batch_size_small": 32,
        "accum_steps": 4,
        "lr": 2e-3,
        "temp": 0.1,
        "feature_dim": 1024,
        "compressed_dim": 64,
        "cifar10_mean_std": {"mean": [0.5, 0.5, 0.5],
                             "std": [0.2, 0.2, 0.2]},
        "data_dir": "/tmp/somewhere",
    }
    p = tmp_path / "configs.json"
    p.write_text(json.dumps(raw))
    cfg = Config.from_reference_json(str(p))
    assert cfg.augment.color_distort_strength == 0.7
    assert cfg.train.micro_batch_size == 32
    assert cfg.train.accum_steps == 4
    assert cfg.optim.lr == 2e-3
    assert cfg.train.temperature == 0.1
    assert cfg.model.feature_dim == 1024
    assert cfg.dataset.mean == (0.5, 0.5, 0.5)
    assert cfg.data_dir == "/tmp/somewhere"
    # Unspecified keys keep reference defaults.
    assert cfg.optim.momentum_ssl == 0.98


def test_to_json_roundtrips():
    cfg = Config()
    d = json.loads(cfg.to_json())
    assert d["train"]["temperature"] == 0.5
    assert d["model"]["stage_sizes"] == [3, 4, 6, 3]
