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
