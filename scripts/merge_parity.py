#!/usr/bin/env python
"""Merge parity_run.py result fragments into one parity.json/parity.md.

parity_run.py rewrites its --out parity.json from scratch, so runs that
were resumed across sessions (e.g. seed 0 in one session, seeds 1-3 in
the next) leave fragments. This merges them, de-duplicates on
(variant, seed) with later fragments winning, and regenerates the
per-run and seed-aggregated markdown tables in the same format.

Usage: merge_parity.py OUT_DIR FRAGMENT.json [FRAGMENT.json ...]
"""

import json
import sys
from pathlib import Path


def main() -> None:
    out = Path(sys.argv[1])
    rows, seen = [], {}
    for frag in sys.argv[2:]:
        for r in json.loads(Path(frag).read_text()):
            seen[(r["variant"], r["seed"])] = r
    # Stable order: seed-major, variant insertion order per fragment.
    order = {}
    for i, key in enumerate(seen):
        order[key] = (key[1], i)
    rows = [seen[k] for k in sorted(seen, key=lambda k: order[k])]
    (out / "parity.json").write_text(json.dumps(rows, indent=2))

    ref = next((r for r in rows if r["variant"] == "default"), rows[0])
    real = rows[0].get("real_data", False)
    lines = [
        "# Accuracy-parity results",
        "",
        f"Data: {'real cifar10' if real else 'synthetic stand-in'}"
        " | merged fragments: " + ", ".join(sys.argv[2:]),
        "",
        "| variant | seed | lin-eval top-1 | Δ vs default "
        "| aux val acc | steps/sec |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        delta = r["lin_eval_top1"] - ref["lin_eval_top1"]
        va = (f"{r['final_val_acc']:.2f}%"
              if r["final_val_acc"] is not None else "-")
        lines.append(
            f"| {r['variant']} | {r['seed']} | {r['lin_eval_top1']:.2f}% "
            f"| {delta:+.2f}% | {va} | {r['steps_per_sec']} |")
    names = list(dict.fromkeys(r["variant"] for r in rows))
    import numpy as np
    lines += ["", "| variant | seeds | mean lin-eval top-1 | spread "
              "| mean aux val acc | spread |", "|---|---|---|---|---|---|"]
    for n in names:
        rs = [r for r in rows if r["variant"] == n]
        t1 = np.array([r["lin_eval_top1"] for r in rs])
        va = np.array([r["final_val_acc"] for r in rs
                       if r["final_val_acc"] is not None])
        lines.append(
            f"| {n} | {len(rs)} | {t1.mean():.2f}% "
            f"| ±{(t1.max() - t1.min()) / 2:.2f} "
            f"| {va.mean():.2f}% | ±{(va.max() - va.min()) / 2:.2f} |"
            if va.size else
            f"| {n} | {len(rs)} | {t1.mean():.2f}% "
            f"| ±{(t1.max() - t1.min()) / 2:.2f} | - | - |")
    (out / "parity.md").write_text("\n".join(lines) + "\n")
    print(f"{len(rows)} rows -> {out}/parity.json, parity.md")


if __name__ == "__main__":
    main()
