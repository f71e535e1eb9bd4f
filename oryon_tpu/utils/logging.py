"""Structured metric logging (host-side).

Replaces the reference's offline WandbLogger + Lightning log_dict scheme
(reference: pipeline.py:61-74, 552-577) with a dependency-free JSONL metric
stream plus epoch aggregation under the same ``{train,valid}_loss/*`` /
``{train,valid}_metric/*`` naming.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.metrics.jsonl")
        self._fp = open(self.path, "a")
        self._epoch_acc: Dict[str, list] = defaultdict(list)

    def log_step(self, step: int, metrics: Dict[str, float],
                 prefix: Optional[str] = None) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            name = f"{prefix}_{k}" if prefix else k
            v = float(v)
            rec[name] = v
            self._epoch_acc[name].append(v)
        self._fp.write(json.dumps(rec) + "\n")
        self._fp.flush()

    def epoch_summary(self, epoch: int) -> Dict[str, float]:
        """Aggregate and reset per-epoch means (the Lightning on_epoch=True
        behavior)."""
        means = {k: sum(v) / len(v) for k, v in self._epoch_acc.items() if v}
        self._fp.write(json.dumps({"epoch": int(epoch), **means}) + "\n")
        self._fp.flush()
        self._epoch_acc.clear()
        return means

    def close(self):
        self._fp.close()


class StageTimer:
    """Per-stage wall-clock accounting (the reference's opt-in profiler flag,
    run_train.py:55-58; pair with jax.profiler traces for device timelines)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def __call__(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                timer.totals[name] += time.perf_counter() - self.t0
                timer.counts[name] += 1

        return _Ctx()

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}
