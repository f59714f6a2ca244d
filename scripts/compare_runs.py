#!/usr/bin/env python
"""Compare training runs: loss-curve overlay table from metrics.jsonl.

Used for the bf16+fused-map vs f32 train-path stability comparison
(round-2 item 8): prints a markdown table of train/val losses at matched
steps plus step-time/throughput ratios.

    python scripts/compare_runs.py /tmp/r2_train/synth8k /tmp/r2_train/synth8k_bf16fused
"""
import argparse
import json
import os
import sys


def load_metrics(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def series(rows, key):
    return {r["step"]: r[key] for r in rows if key in r}


def window_mean(d, step, width):
    vals = [v for s, v in d.items() if step - width < s <= step]
    return sum(vals) / len(vals) if vals else None


def fmt(x, nd=4):
    return "-" if x is None else f"{x:.{nd}f}"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("runs", nargs="+", help="run dirs containing metrics.jsonl")
    p.add_argument("--every", type=int, default=1000, help="report step interval")
    p.add_argument("--window", type=int, default=500, help="smoothing window (steps)")
    args = p.parse_args()

    names = [os.path.basename(os.path.normpath(r)) for r in args.runs]
    all_rows = [load_metrics(r) for r in args.runs]
    train = [series(r, "train/e_all") for r in all_rows]
    val = [series(r, "val/total_loss") for r in all_rows]
    spd = [series(r, "train/rays_per_sec") for r in all_rows]

    max_step = max(max(t) for t in train if t)
    steps = list(range(args.every, max_step + 1, args.every))

    header = ["step"]
    for n in names:
        header += [f"{n} train", f"{n} val"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for s in steps:
        row = [str(s)]
        for t, v in zip(train, val):
            row.append(fmt(window_mean(t, s, args.window)))
            row.append(fmt(window_mean(v, s, args.window)))
        print("| " + " | ".join(row) + " |")

    print()
    for n, sp in zip(names, spd):
        if sp:
            tail = [v for s, v in sorted(sp.items())][-20:]
            print(f"{n}: mean rays/s (last 20 logs) = {sum(tail)/len(tail):.1f}")


if __name__ == "__main__":
    main()
