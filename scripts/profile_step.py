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

    import re as _re

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stat_names = {sid: sm.name for sid, sm in plane.stat_metadata.items()}

        def ev_meta(m):
            """Per-op attribution from the event-metadata stats — the HLO
            instruction NAME is unreliable (XLA names conv-root fusions
            after their epilogue ops: a `multiply_reduce_fusion.N` can be
            a conv dgrad that also emits a BN sum), so label by the
            profiler's own `hlo_category` + the model-path tail of
            `tf_op`, and carry bytes/flops for roofline columns."""
            cat, tf_op, nbytes, flops = "", "", 0, 0
            for st in m.stats:
                sn = stat_names.get(st.metadata_id)
                if sn == "hlo_category":
                    cat = st.str_value
                elif sn == "tf_op":
                    tf_op = st.str_value
                elif sn == "bytes_accessed":
                    nbytes = st.int64_value or st.uint64_value
                elif sn == "flops":
                    flops = st.int64_value or st.uint64_value
            # tf_op tail: '.../f/layer1_0/conv2/conv_general_dilated:' ->
            # 'f/layer1_0/conv2/conv_general_dilated'
            tail = "/".join(tf_op.rstrip(":").split("/")[-4:])
            name = m.name or m.display_name
            shape = ""
            head = name.split(" = ", 1)
            if len(head) > 1:
                sm_ = _re.match(r"\(?\s*([a-z0-9]+\[[^\]]*\])", head[1])
                if sm_:
                    shape = sm_.group(1)
            op = _re.sub(r"\.\d+$", "", head[0].lstrip("%"))
            return op, cat, tail, shape, nbytes, flops

        meta = {m_id: ev_meta(m)
                for m_id, m in plane.event_metadata.items()}
        totals = collections.Counter()
        count = collections.Counter()
        tbytes = collections.Counter()
        tflops = collections.Counter()
        bycat = collections.Counter()

        def family(op, cat, tail, shape):
            if op in ("copy-start", "copy-done", "slice-start",
                      "slice-done", "copy"):
                return "async copies (overlapped)"
            # Collapse per-block names (layer3_5 -> layer3) so repeated
            # blocks aggregate; keep the op role.
            tail = _re.sub(r"(layer\d)_\d+", r"\1", tail)
            tail = _re.sub(r"_\d+/", "/", tail)
            return f"{cat or op} | {tail} {shape}"

        for line in plane.lines:
            # Only the synchronous 'XLA Ops' line: 'Async XLA Ops' carries
            # overlapped DMA copies whose durations double-count the
            # compute they hide under, and step/module lines aggregate.
            lname = line.name.lower()
            if lname not in ("xla ops", "ops"):
                continue
            for ev in line.events:
                if ev.metadata_id not in meta:
                    continue
                op, cat, tail, shape, nbytes, flops = meta[ev.metadata_id]
                if op.startswith(("while", "body", "cond")):
                    continue  # control wrappers double-count their bodies
                key = family(op, cat, tail, shape)
                totals[key] += ev.duration_ps
                count[key] += 1
                tbytes[key] += nbytes
                tflops[key] += flops
                bycat[cat or op] += ev.duration_ps
        if not totals:
            continue
        device_total_ms = sum(totals.values()) / 1e9
        print(f"\n=== plane: {plane.name} | device busy "
              f"{device_total_ms:.1f} ms | {device_total_ms / n_steps:.2f} "
              f"ms/step over {n_steps} steps ===")
        print("\n--- by hlo_category ---")
        for cat, ps in bycat.most_common():
            print(f"{ps / 1e9 / n_steps:9.3f} ms/step "
                  f"{100 * ps / 1e9 / device_total_ms:5.1f}%  {cat}")
        # Roofline floor: per op family, time >= max(bytes/HBM_peak,
        # flops/MXU_peak). Summing the floors gives the best possible
        # ms/step for THIS op decomposition (fusing ops can beat it).
        # v5e peaks: 819 GB/s HBM, 197 TFLOP/s bf16 MXU. (Rounds 1-3 used
        # 394e12 here — the int8 TOPS number — which HALVED every
        # flops-bound floor and overstated the conv2 headroom by 2x; the
        # ARCHITECTURE.md §5 "95.1 ms floor" was computed with it.)
        HBM, MXU = 819e9, 197e12
        floor_ms = sum(max(tbytes[k] / HBM, tflops[k] / MXU)
                       for k in totals) * 1e3
        print(f"\nroofline floor for this op decomposition: "
              f"{floor_ms / n_steps:.2f} ms/step "
              f"(measured {device_total_ms / n_steps:.2f}; "
              f"headroom {device_total_ms / max(floor_ms, 1e-9):.2f}x)")
        print(f"\n{'ms/step':>9} {'%dev':>5} {'calls':>6} {'GB/s':>6} "
              f"{'TF/s':>6} {'xFloor':>6}  op")
        for key, ps in totals.most_common(top):
            ms = ps / 1e9
            secs = ps / 1e12
            gbs = tbytes[key] / secs / 1e9 if secs else 0.0
            tfs = tflops[key] / secs / 1e12 if secs else 0.0
            fl = max(tbytes[key] / HBM, tflops[key] / MXU)
            xfl = secs / fl if fl else 0.0
            print(f"{ms / n_steps:9.3f} {100 * ms / device_total_ms:5.1f} "
                  f"{count[key]:6d} {gbs:6.0f} {tfs:6.1f} {xfl:6.2f}  "
                  f"{key[:90]}")


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
