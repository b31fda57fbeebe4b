#!/usr/bin/env python
"""Profile the pretrain step op-by-op on the real chip.

Runs a short warmed-up epoch-scan under `jax.profiler`, parses the XPlane
trace, and prints the TPU device-plane ops aggregated by name — total ms,
ms/step, and % of device time. This is the measurement loop behind
docs/ARCHITECTURE.md §5; re-run it after any compute-path change.

Usage: python scripts/profile_step.py [--steps 20] [--batch 512] [--top 40]
"""

import argparse
import collections
import glob
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_xspace(logdir: str, n_steps: int, top: int) -> None:
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa
    except ImportError:  # layout differs across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2  # noqa

    paths = glob.glob(os.path.join(
        logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", logdir)
        return
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m_id: m.name or m.display_name
                for m_id, m in plane.event_metadata.items()}
        totals = collections.Counter()
        count = collections.Counter()
        import re as _re

        def family(name: str) -> str:
            """Aggregate HLO instruction names into op families:
            '%convert_reduce_fusion.123 = bf16[...] fusion(...)' ->
            'convert_reduce_fusion bf16[1024,32,32,256]'. Only the
            instruction-name head is inspected — matching substrings of
            the full HLO text also hits operand names and mislabels
            compute ops as copies."""
            head = name.split(" = ", 1)
            op = _re.sub(r"\.\d+$", "", head[0].lstrip("%"))
            if op in ("copy-start", "copy-done", "slice-start",
                      "slice-done", "copy"):
                return "async copies (overlapped)"
            shape = ""
            if len(head) > 1:
                m = _re.match(r"\(?\s*([a-z0-9]+\[[^\]]*\])", head[1])
                if m:
                    shape = " " + m.group(1)
            return op + shape

        for line in plane.lines:
            # Only the synchronous 'XLA Ops' line: 'Async XLA Ops' carries
            # overlapped DMA copies whose durations double-count the
            # compute they hide under, and step/module lines aggregate.
            lname = line.name.lower()
            if lname not in ("xla ops", "ops"):
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                if name.lstrip("%").startswith(("while", "body", "cond")):
                    continue  # control wrappers double-count their bodies
                totals[family(name)] += ev.duration_ps
                count[family(name)] += 1
        if not totals:
            # Fall back: aggregate every line except steps.
            for line in plane.lines:
                if "step" in line.name.lower():
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps
                    count[name] += 1
        if not totals:
            continue
        device_total_ms = sum(totals.values()) / 1e9
        print(f"\n=== plane: {plane.name} | device busy "
              f"{device_total_ms:.1f} ms | {device_total_ms / n_steps:.2f} "
              f"ms/step over {n_steps} steps ===")
        print(f"{'ms/step':>9} {'%dev':>6} {'calls':>6}  op")
        for name, ps in totals.most_common(top):
            ms = ps / 1e9
            print(f"{ms / n_steps:9.3f} {100 * ms / device_total_ms:6.1f} "
                  f"{count[name]:6d}  {name[:110]}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logdir", default="/tmp/simclr_profile")
    p.add_argument("--parse_only", action="store_true",
                   help="just re-parse an existing trace")
    p.add_argument("--variant", default="unfused",
                   help="a scripts/bench_variants.py variant name")
    args = p.parse_args()

    if args.parse_only:
        parse_xspace(args.logdir, args.steps, args.top)
        return

    import jax
    import numpy as np

    from simclr_tpu.config import Config, ModelConfig, TrainConfig
    from simclr_tpu.data.datasets import load_dataset
    from simclr_tpu.data.pipeline import epoch_permutation
    from simclr_tpu.train.pretrain import build_engine, init_simclr

    from bench_variants import VARIANTS

    images_np, _ = load_dataset("cifar10", "train", "data")
    images = jax.device_put(images_np)

    cfg = Config(train=TrainConfig(batch_size=args.batch, save_ckpt=False),
                 model=ModelConfig(**VARIANTS[args.variant]))
    model, state, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)
    n = images.shape[0]

    def run(state, key):
        idx = epoch_permutation(key, n, args.batch)[:args.steps]
        state, (loss, _) = engine.train_epoch(state, images, idx, key)
        return state, float(np.asarray(loss)[-1])

    print("compiling + warmup...")
    state, _ = run(state, jax.random.key(1))
    state, _ = run(state, jax.random.key(2))

    print(f"tracing {args.steps} steps...")
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    state, loss = run(state, jax.random.key(3))
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"wall: {dt * 1e3 / args.steps:.2f} ms/step "
          f"({args.steps / dt:.2f} steps/s) | loss {loss:.4f}")

    parse_xspace(args.logdir, args.steps, args.top)


if __name__ == "__main__":
    main()
