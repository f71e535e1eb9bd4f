"""Summarize a training run's metrics JSONL into a markdown curve table.

Reads exp_data/<exp>/logs/<exp>.metrics.jsonl (MetricLogger format: per-step
records with "step", epoch records with "epoch") and prints a per-epoch
markdown table of the loss components + IoU, plus step-throughput stats —
the evidence block for BASELINE.md round-2 (VERDICT.md next-round item 3).

Usage: python scripts/train_curves.py exp_data/prod20/logs/prod20.metrics.jsonl
"""
from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    epochs = []
    steps = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            (epochs if "epoch" in rec else steps).append(rec)

    if steps:
        ts = [r["time"] for r in steps]
        ds = [r["step"] for r in steps]
        if len(ts) > 1:
            # log cadence is every 10 steps; rate from first->last record
            sps = (ds[-1] - ds[0]) / (ts[-1] - ts[0])
            print(f"steps logged: {len(steps)} (step {ds[0]}..{ds[-1]}), "
                  f"avg {sps:.2f} steps/s = {sps * 32:.1f} pairs/s at B=32")

    if not epochs:
        print("no epoch summaries yet")
        return
    # union across records: validation-epoch rows carry valid_metric_* keys
    # the plain epochs lack (freq_valid cadence)
    keys = sorted({k for rec in epochs for k in rec if k != "epoch"})
    # stable column order: total loss first, then the rest alphabetically
    keys.sort(key=lambda k: (0 if k.endswith("loss/total") else 1, k))
    show = [k.replace("train_", "").replace("valid_metric_", "val:")
            for k in keys]
    print("| epoch | " + " | ".join(show) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for rec in epochs:
        cells = ["" if k not in rec else f"{rec[k]:.4f}" for k in keys]
        print(f"| {rec['epoch']} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1])
