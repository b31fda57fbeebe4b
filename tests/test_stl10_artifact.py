"""The committed STL-10 end-to-end artifact must stay healthy.

results/stl10/stl10.json is produced by scripts/stl10_artifact.py on the
real chip (reference counterpart: data.py:440-527 STL-10 loaders +
pretrain.py:72-79 stl10 branch). These assertions pin what "healthy"
means so a regression in the 96x96 path (stem, kernel-9 blur,
interpolation crops, the color kernel's VMEM tiling) shows up as a red
test when the artifact is regenerated.
"""

import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parent.parent / "results/stl10/stl10.json"


@pytest.mark.skipif(not ART.exists(), reason="artifact not generated")
def test_stl10_artifact_healthy():
    d = json.loads(ART.read_text())
    assert d["img_size"] == 96
    # Pretrain loss must descend across epochs.
    tl = d["train_loss"]
    assert tl[-1] < tl[0], tl
    # Downstream linear eval must beat chance (10 classes).
    assert d["lin_eval_top1"] > 15.0, d["lin_eval_top1"]
    # Steady-state throughput sanity: the 96x96 step must not be
    # pathological (the interpolation-crop/blur concern from the round-2
    # verdict). 28 steps/s measured on v5e at batch 256; 10 is the alarm.
    assert d["steps_per_sec"] > 10.0, d["steps_per_sec"]
    assert d["aug_pairs_per_sec"] > 10_000, d["aug_pairs_per_sec"]
