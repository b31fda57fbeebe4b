#!/usr/bin/env python
"""Run ONLY the torch-CPU reference half of the production shootout for
given seeds, caching ref_seed{N}.json / init_sd_seed{N}.npz under
results/shootout_production/ so scripts/shootout_production.py can later
run with the cache hit (its own cache format, shootout_production.py:65-80).

Split out because the reference half is hours of single-core torch CPU
while our half is seconds of TPU; running them in separate processes lets
the TPU do other work meanwhile.
"""
import argparse
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # never grab the TPU here
os.environ.setdefault("OMP_NUM_THREADS", "1")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from reference_shootout import make_data, run_reference  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n_train", type=int, default=2048)
    p.add_argument("--n_val", type=int, default=512)
    p.add_argument("--n_test", type=int, default=1000)
    p.add_argument("--n_epoch", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--lbfgs_steps", type=int, default=20)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--out", default="results/shootout_production")
    args = p.parse_args()

    import numpy as np

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    train_arr, val_arr, test_arr = make_data(
        args.n_train, args.n_val, args.n_test)
    for seed in args.seeds:
        ref_path = out / f"ref_seed{seed}.json"
        sd_path = out / f"init_sd_seed{seed}.npz"
        if ref_path.is_file() and sd_path.is_file():
            print(f"seed {seed}: already cached", flush=True)
            continue
        print(f"=== seed {seed}: reference (torch CPU) ===", flush=True)
        ref, init_sd = run_reference(
            train_arr, val_arr, test_arr, args.n_epoch, args.batch_size,
            out.resolve(), args.lbfgs_steps, seed=seed)
        np.savez(sd_path, **init_sd)
        ref_path.write_text(json.dumps(ref, indent=2))
        print(f"seed {seed}: cached -> {ref_path}", flush=True)


if __name__ == "__main__":
    main()
