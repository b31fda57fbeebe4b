"""Host-streaming pretraining tests (numpy feed + native C++ pipeline)."""

import numpy as np
import pytest

from simclr_tpu.config import Config, ModelConfig, TrainConfig
from simclr_tpu.data import native
from simclr_tpu.data.datasets import synthetic_dataset
from simclr_tpu.train.streaming import pretrain_streaming

TINY = ModelConfig(feature_dim=64, compressed_dim=16,
                   stage_sizes=(1, 1, 1, 1), width=2)


def tiny_cfg():
    return Config(model=TINY,
                  train=TrainConfig(n_epoch=2, batch_size=16,
                                    save_ckpt=False))


def test_streaming_pretrain_runs_and_learns():
    imgs, labels = synthetic_dataset(80, img_size=32, seed=0)
    res = pretrain_streaming(tiny_cfg(), imgs[:64], labels[:64],
                             n_epochs=6, log=lambda m: None)
    losses = np.asarray(res.history.loss["train"])
    assert len(losses) == 6
    assert np.isfinite(losses).all()
    # Tiny-scale contrastive losses are noisy; require a downward trend.
    assert losses[2:].min() < losses[0]


@pytest.mark.skipif(native.load_library() is None,
                    reason="native toolchain unavailable")
def test_streaming_with_native_pipeline():
    imgs, labels = synthetic_dataset(64, img_size=32, seed=1)
    res = pretrain_streaming(tiny_cfg(), imgs, labels, n_epochs=2,
                             use_native_pipeline=True, log=lambda m: None)
    assert np.isfinite(res.history.loss["train"]).all()
