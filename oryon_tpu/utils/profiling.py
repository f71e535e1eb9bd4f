"""Profiling hooks: jax.profiler traces gated by the config flag.

TPU equivalent of the reference's opt-in Lightning AdvancedProfiler
(reference: run_train.py:55-58, config.yaml:12): when ``cfg.profiler`` is on,
wrap a region in ``trace(logdir)`` to capture a TensorBoard-viewable device
timeline; ``annotate(name)`` adds named sub-traces.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str], enabled: bool = True) -> Iterator[None]:
    if not enabled or logdir is None:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """cfg.profiler wiring for the entry points (reference gates its
    Lightning AdvancedProfiler on the same flag, run_train.py:55-58).

    Captures ONE jax.profiler trace window covering steps
    [start, start + n_steps) — late enough to skip compile/warmup — and
    prints the ``scripts/trace_op_table.py`` invocation that decodes it
    into a per-HLO-op device-time table.  Zero overhead when disabled:
    ``step()`` is a single integer compare.
    """

    def __init__(self, enabled: bool, logdir: Optional[str],
                 start: int = 10, n_steps: int = 5):
        self.enabled = bool(enabled) and logdir is not None
        self.logdir = logdir
        self.start = start
        self.stop = start + n_steps
        self.n_steps = n_steps
        self._i = 0
        self._active = False

    def step(self) -> None:
        """Call once per dispatched step (before or after — only the count
        matters)."""
        if not self.enabled:
            return
        if self._i == self.start:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif self._i == self.stop:
            self._finish()
        self._i += 1

    def _finish(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False
            print(f"profiler: wrote {self.n_steps}-step trace to "
                  f"{self.logdir}; decode with\n  python "
                  f"scripts/trace_op_table.py {self.logdir} "
                  f"--iters {self.n_steps}")

    def close(self) -> None:
        """Flush an unfinished window (short runs)."""
        self._finish()
