"""Tests for the observability subsystem and the anchor-pair mode."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import CIFAR10, AugmentConfig
from simclr_tpu.ops.augment import augment_anchor_pair, augment_test
from simclr_tpu.utils.profiling import (
    MetricsLogger,
    StepTimer,
    block_on,
    read_metrics,
    trace,
)


class TestMetricsLogger:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        with MetricsLogger(path) as m:
            m.log(1, loss=1.5, acc=np.float32(10.0))
            m.log(2, loss=1.2, note="hello")
        recs = read_metrics(path)
        assert [r["step"] for r in recs] == [1, 2]
        assert recs[0]["loss"] == 1.5
        assert isinstance(recs[0]["acc"], float)
        assert recs[1]["note"] == "hello"

    def test_append_mode(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        with MetricsLogger(path) as m:
            m.log(1, a=1)
        with MetricsLogger(path) as m:
            m.log(2, a=2)
        assert len(read_metrics(path)) == 2


class TestStepTimer:
    def test_summary_stats(self):
        t = StepTimer()
        x = jnp.ones((4,))
        for _ in range(5):
            t.start()
            y = x * 2
            t.stop(y)
        s = t.summary()
        assert s["n"] == 5
        assert s["steps_per_sec"] > 0
        assert s["p50_s"] <= s["p90_s"] + 1e-9

    def test_block_on_handles_empty(self):
        block_on(())
        block_on(jnp.ones((2,)))


class TestTrace:
    def test_trace_writes_profile(self, tmp_path):
        logdir = str(tmp_path / "prof")
        with trace(logdir):
            jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
        found = []
        for root, _, files in os.walk(logdir):
            found += [f for f in files if f.endswith(".xplane.pb")]
        assert found, "no xplane trace written"


class TestAnchorPair:
    def test_anchor_is_plain_normalized_original(self):
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.randint(0, 256, (4, 32, 32, 3),
                                       dtype=np.uint8))
        orig, augd = augment_anchor_pair(
            jax.random.key(0), imgs, AugmentConfig(), CIFAR10)
        np.testing.assert_allclose(
            np.asarray(orig), np.asarray(augment_test(imgs, CIFAR10)),
            rtol=1e-6)
        assert np.abs(np.asarray(orig) - np.asarray(augd)).max() > 0.1
