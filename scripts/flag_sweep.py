#!/usr/bin/env python
"""Sweep TPU backend compiler options on the pretrain step.

XLA_FLAGS cannot reach the TPU compiler in this environment (it runs
behind the axon remote-compile tunnel and the client-side XLA rejects
xla_tpu_* names), but `jax.jit(compiler_options=...)` ships per-compile
overrides that the backend validates and honors. This script rebuilds
the engine under each candidate option set and times the same scan the
bench uses.

Usage:
  python scripts/flag_sweep.py                    # built-in candidates
  python scripts/flag_sweep.py --set name=value   # one ad-hoc set
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Option sets to try. Values must be strings (the backend parses them).
CANDIDATES = {
    "baseline": {},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "fusion_cost": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "nested_fusion": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    # Memory-space-assignment aggressiveness: tell MSA the while body
    # repeats many times so cross-iteration prefetch pays off, and bias
    # its copy-vs-recompute ratio.
    "msa_while": {"xla_tpu_memory_space_assignment_while_execution_count":
                  "97"},
    "msa_ratio": {"xla_tpu_msa_inefficient_use_to_copy_ratio": "0.8"},
    "prefetch": {"xla_tpu_use_repeated_instance_for_preferred_prefetch_time":
                 "true"},
    "copy_bw": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.7"},
    # Round-3 probe batch 2 (names validated against the backend).
    "aggr_layout": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt":
                    "true"},
    "bundle_cost": {"xla_tpu_use_bundle_aware_cost_model_for_fusions":
                    "true"},
    "conv_in_off": {"xla_jf_conv_input_fusion": "false"},
    "conv_out_off": {"xla_jf_conv_output_fusion": "false"},
    # Part-1 winners stacked (nested_fusion +1.1%, vmem32m +0.7%).
    "combo_nf_v32": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
                     "xla_tpu_scoped_vmem_limit_kib": "32768"},
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of candidate names")
    p.add_argument("--set", action="append", default=[],
                   metavar="NAME=VALUE", help="ad-hoc option (repeatable)")
    args = p.parse_args()

    import jax
    import numpy as np

    from simclr_tpu.config import Config, TrainConfig
    from simclr_tpu.data.datasets import load_dataset
    from simclr_tpu.data.pipeline import epoch_permutation
    from simclr_tpu.train.pretrain import build_engine, init_simclr

    images_np, _ = load_dataset("cifar10", "train", "data")
    images = jax.device_put(images_np)
    n = images.shape[0]

    sets = dict(CANDIDATES)
    if args.set:
        adhoc = dict(kv.split("=", 1) for kv in args.set)
        sets = {"adhoc": adhoc}
    if args.only:
        sets = {k: sets[k] for k in args.only}

    for name, opts in sets.items():
        os.environ["SIMCLR_TPU_COMPILER_OPTIONS"] = (
            json.dumps(opts) if opts else "")
        cfg = Config(train=TrainConfig(batch_size=args.batch,
                                       save_ckpt=False))
        model, state, tx = init_simclr(cfg, jax.random.key(0))
        engine = build_engine(cfg, model, tx)

        def run(state, key):
            idx = epoch_permutation(key, n, args.batch)[:args.steps]
            state, (loss, _) = engine.train_epoch(state, images, idx, key)
            return state, float(np.asarray(loss)[-1])

        try:
            state, _ = run(state, jax.random.key(1))   # compile
        except Exception as e:
            print(f"{name:14s} COMPILE FAILED: {str(e)[:120]}", flush=True)
            continue
        state, _ = run(state, jax.random.key(2))       # warm
        rates, loss = [], float("nan")
        for rep in range(args.reps):
            t0 = time.perf_counter()
            state, loss = run(state, jax.random.fold_in(jax.random.key(3),
                                                        rep))
            rates.append(args.steps / (time.perf_counter() - t0))
        med = float(np.median(rates))
        print(f"{name:14s} {med:6.2f} steps/s ({1e3 / med:6.1f} ms/step) "
              f"reps={[round(r, 2) for r in rates]} loss={loss:.4f} "
              f"opts={opts}", flush=True)


if __name__ == "__main__":
    main()
