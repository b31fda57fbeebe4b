"""Microbenchmark: fused Winograd conv2 kernel vs XLA's direct conv.

Times forward and forward+backward at the exact stride-1 identity-block
conv2 shapes of the CIFAR-stem ResNet-50 hot loop (batch 1024 = two
512-image views), on the real chip. The timed region runs many
iterations inside one jitted lax.scan dispatch (the axon tunnel adds
~10 ms per dispatch, which would otherwise dominate sub-ms kernels).

Usage: python scripts/bench_winograd.py [--iters 50]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.ops.pallas.winograd import winograd_conv3x3

SHAPES = [
    ("layer2", 1024, 16, 128),
    ("layer3", 1024, 8, 256),
    ("layer4", 1024, 4, 512),
]


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed_scan(fn, args, iters):
    """Median seconds/iter over 3 reps of a scanned loop."""

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c[:2])
            # Fold the output back so the loop can't be DCE'd/hoisted.
            x = c[0] + 0.0 * out[..., : c[0].shape[-1]].astype(c[0].dtype)
            return (x, c[1]), out.dtype.type(0)
        (xf, _), _ = jax.lax.scan(body, args, None, length=iters)
        return xf

    run(args)[0].block_until_ready()
    np.asarray(jax.tree.leaves(run(args))[0][0, 0, 0])  # sync via transfer
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(args)
        np.asarray(out[0, 0, 0, 0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    for name, n, h, c in SHAPES:
        x = jnp.asarray(rng.randn(n, h, h, c), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.randn(3, 3, c, c), jnp.bfloat16)
        gy = jnp.asarray(rng.randn(n, h, h, c), jnp.bfloat16)

        flops_direct = 2 * n * h * h * 9 * c * c * 1e-12

        for tag, f in (("direct", _direct),
                       ("winograd", lambda a, b: winograd_conv3x3(a, b))):
            try:
                tf = timed_scan(lambda a, b: f(a, b), (x, w), args.iters)

                def fb(a, b, g=gy, f=f):
                    y, vjp = jax.vjp(f, a, b)
                    da, db = vjp(g.astype(y.dtype))
                    return da + 0.0 * db.sum()

                tb = timed_scan(fb, (x, w), args.iters)
                print(f"{name} {tag:9s} fwd {tf*1e6:8.1f} us "
                      f"({flops_direct/tf:6.1f} TF/s-equiv) | "
                      f"fwd+bwd {tb*1e6:8.1f} us "
                      f"({3*flops_direct/tb:6.1f} TF/s-equiv)")
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"{name} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
