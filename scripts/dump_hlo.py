#!/usr/bin/env python
"""Dump and summarize the optimized HLO of the pretrain step.

Compiles the single-step train function exactly as the bench runs it and
writes the post-optimization HLO text, plus a summary of the largest
fusions (op kind, output shapes, operand shapes) so the per-op-family
profile (scripts/profile_step.py) can be matched to actual fused
computations — e.g. whether the BN-backward dgamma/dbeta reductions share
a fusion with the elementwise dx pass or re-read activations in a
separate pass.
"""

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/pretrain_step_hlo.txt")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--cpu", action="store_true",
                   help="compile for CPU instead of the TPU backend "
                        "(structure differs; TPU is the real target)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--variant", default="unfused",
                   help="a scripts/bench_variants.py variant name")
    p.add_argument("--parse_only", action="store_true",
                   help="re-parse an existing --out dump, no compile")
    args = p.parse_args()

    if args.parse_only:
        _summarize(Path(args.out).read_text(), args)
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from simclr_tpu.config import Config, ModelConfig, TrainConfig
    from simclr_tpu.train.pretrain import build_engine, init_simclr

    from bench_variants import VARIANTS
    cfg = Config(train=TrainConfig(batch_size=args.batch_size,
                                   save_ckpt=False),
                 model=ModelConfig(**VARIANTS[args.variant]))
    model, state, tx = init_simclr(cfg, jax.random.key(0))
    engine = build_engine(cfg, model, tx)

    images = jnp.zeros((args.batch_size * 2, 32, 32, 3), jnp.uint8)
    idx = jnp.arange(args.batch_size)[None, :]
    lowered = jax.jit(engine.train_epoch).lower(
        state, images, idx, jax.random.key(1))
    compiled = lowered.compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)
    print(f"wrote {len(text.splitlines())} HLO lines to {args.out}")
    _summarize(text, args)


def _summarize(text: str, args) -> None:
    # Summarize fusions: name, kind, root op, true operand bytes (looked
    # up from each named operand's defining instruction).
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "u8": 1, "s8": 1, "pred": 1, "f64": 8, "u64": 8}

    def shape_bytes(sh: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", sh)
        if not m:
            return 0
        b = dtype_bytes.get(m.group(1), 4)
        dims = m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        return b * n

    # First pass: name -> output shape string for every instruction.
    inst_re = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = "
                         r"((?:\([^)]*\)|\w+\[[\d,]*\]\S*))\s+(\w+)")
    shapes = {}
    for line in text.splitlines():
        m = inst_re.match(line)
        if m:
            shapes[m.group(1)] = m.group(2)

    def total_bytes(shape_str: str) -> int:
        return sum(shape_bytes(s)
                   for s in re.findall(r"\w+\[[\d,]*\]", shape_str))

    # Second pass: fusions in the entry computation with true operand
    # bytes; track which large buffers are read by how many fusions.
    fusions = []
    readers = defaultdict(list)          # producer name -> [fusion names]
    fusion_re = re.compile(
        r"^\s*(?:ROOT )?%?([\w.\-]+) = ((?:\([^)]*\)|\S+)) fusion\((.*?)\)"
        r", kind=(\w+)")
    for line in text.splitlines():
        m = fusion_re.match(line)
        if not m:
            continue
        name, out_sh, operands, kind = m.groups()
        out_b = total_bytes(out_sh)
        ops = re.findall(r"%?([\w.\-]+)", operands)
        in_b = 0
        for op in ops:
            sh = shapes.get(op)
            if sh:
                b = total_bytes(sh)
                in_b += b
                if b >= 64 * 1024 * 1024:
                    readers[op].append(name)
        fusions.append((in_b + out_b, in_b, out_b, name, kind,
                        out_sh[:70]))
    fusions.sort(reverse=True)
    print(f"\n{len(fusions)} fusions; top {args.top} by operand+output "
          "bytes (MB, in/out split):")
    for tot, in_b, out_b, name, kind, out_sh in fusions[:args.top]:
        print(f"  {tot / 1e6:9.1f} MB (in {in_b / 1e6:7.1f} out "
              f"{out_b / 1e6:7.1f})  {kind:9s} {name:34s} -> {out_sh}")

    by_kind = defaultdict(lambda: [0, 0])
    for tot, _, _, _, kind, _ in fusions:
        by_kind[kind][0] += 1
        by_kind[kind][1] += tot
    print("\nby kind (operand+output bytes):")
    for kind, (cnt, tot) in sorted(by_kind.items(),
                                   key=lambda kv: -kv[1][1]):
        print(f"  {kind:16s} {cnt:4d} fusions  {tot / 1e9:7.2f} GB")

    multi = [(len(v), shapes.get(k, "?"), k, v) for k, v in readers.items()
             if len(v) > 1]
    multi.sort(reverse=True)
    print(f"\n{len(multi)} buffers >=64 MB read by MULTIPLE fusions "
          "(re-read traffic):")
    rereads = 0
    for cnt, sh, k, v in multi[:args.top]:
        b = total_bytes(sh)
        rereads += (cnt - 1) * b
        print(f"  x{cnt}  {b / 1e6:8.1f} MB  {k:30s} {sh[:60]} <- "
              f"{', '.join(v[:5])}")
    print(f"re-read bytes beyond first read (these buffers): "
          f"{rereads / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
