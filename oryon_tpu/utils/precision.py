"""Precision control for pose-critical numerics.

On TPU, jnp matmuls (including those inside jnp.linalg.svd/det) default to
bf16 accumulation.  Measured impact on this framework's registration stack:
~2.4 deg rotation / ~6 mm translation error on an otherwise-exact Kabsch fit.
Geometry, registration, and metric code must therefore run under
float32 matmul precision; the model forward path stays bf16 where accuracy
allows (cost volume, attention) — that split is the precision policy.
"""
from __future__ import annotations

import functools

import jax


def fp32_matmul(fn):
    """Decorator: run ``fn`` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
