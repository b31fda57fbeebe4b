"""Tracing, profiling, and structured metrics logging.

The reference has NO performance tracing at all (SURVEY.md §5: its only
`trace` is torch.jit model export) and observes training through bare print
statements (utils/model_utils.py:125-127). This module provides the
TPU-native observability surface:

  * `trace(logdir)` — context manager around `jax.profiler` producing an
    XPlane trace viewable in TensorBoard's profile plugin (device + host
    timelines, HLO op breakdown).
  * `annotate(name)` / `StepTimer` — host-side named regions and per-step
    wall-clock statistics (p50/p90/mean) that survive async dispatch by
    blocking on a device leaf.
  * `MetricsLogger` — append-only JSONL metrics log (one object per step /
    epoch), the machine-readable counterpart of the reference's prints.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace around a code region; view with
    `tensorboard --logdir <logdir>` (profile plugin)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def block_on(tree: Any) -> None:
    """Synchronize on a computation's first leaf (forces the transfer —
    `block_until_ready` alone is unreliable through remote-device
    tunnels)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


class StepTimer:
    """Wall-clock statistics over step durations."""

    def __init__(self) -> None:
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result_tree: Any = None) -> float:
        if result_tree is not None:
            block_on(result_tree)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.durations.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, result_container: Optional[list] = None):
        self.start()
        yield
        self.stop(result_container)

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "n": int(d.size),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "steps_per_sec": float(1.0 / d.mean()),
        }


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if isinstance(
                v, (int, float, np.floating, np.integer)) else v
        self._f.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str) -> List[Dict[str, Any]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
