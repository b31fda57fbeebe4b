#!/usr/bin/env python
"""Microbenchmark the bn_relu backward kernel in isolation.

Feeds the Pallas kernel ALREADY-2D operands (no layout interaction with
convs) and times it against (a) the equivalent jnp ops compiled alone
and (b) the pure-HBM roofline for its byte traffic — separating
kernel-internal inefficiency from whole-model layout copies.

Usage: python scripts/bn_relu_microbench.py [--reps 50]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simclr_tpu.ops.pallas.bn_relu import (
        _bwd_kernel_add_relu, _run_bwd, _xla_bwd_add_relu)

    # bn3-position shapes (2D views as the model produces them).
    shapes = [
        (1024 * 32 * 32, 256),   # layer1 bn3: 537 MB
        (1024 * 16 * 16, 512),   # layer2 bn3: 268 MB
        (1024 * 8 * 8, 1024),    # layer3 bn3: 134 MB
        (1024 * 4 * 4, 2048),    # layer4 bn3: 67 MB
    ]
    for rows, c in shapes:
        rng = np.random.default_rng(0)
        g = jnp.asarray(rng.normal(size=(rows, c)), jnp.bfloat16)
        out = jnp.asarray(np.abs(rng.normal(size=(rows, c))) - 0.3,
                          jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(rows, c)), jnp.bfloat16)
        a = jnp.asarray(rng.normal(1.0, 0.1, (c,)), jnp.float32)
        mean = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
        rsig = jnp.asarray(np.abs(rng.normal(1.0, 0.1, (c,))), jnp.float32)

        @jax.jit
        def pallas_bwd(g, out, x):
            return _run_bwd(_bwd_kernel_add_relu, (g, out, x),
                            (a, mean, rsig), 2, False)

        @jax.jit
        def xla_bwd(g, out, x):
            return _xla_bwd_add_relu(g, out, x, a, mean, rsig)

        bytes_moved = 5 * rows * c * 2  # 3 reads + 2 writes, bf16
        for name, fn in (("pallas", pallas_bwd), ("xla", xla_bwd)):
            r = fn(g, out, x)
            np.asarray(jax.tree.leaves(r)[0][:8])  # sync
            t0 = time.perf_counter()
            for _ in range(args.reps):
                r = fn(g, out, x)
            np.asarray(jax.tree.leaves(r)[0][:8])
            dt = (time.perf_counter() - t0) / args.reps
            gbps = bytes_moved / dt / 1e9
            print(f"({rows:9d},{c:5d}) {name:7s} {dt * 1e3:7.3f} ms "
                  f"{gbps:7.1f} GB/s effective", flush=True)


if __name__ == "__main__":
    main()
