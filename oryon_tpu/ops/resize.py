"""Separable image resizing as two small matmuls (MXU-friendly, exact control).

jax.image.resize has no ``align_corners`` mode, but the reference pipeline
depends on it in several places (reference: net.py:67 bicubic align_corners
for the Swin input; models/fusion.py:380,430 bilinear align_corners upsamples;
pipeline.py:384 nearest mask resizes).  Since all sizes are static, we build
the interpolation weight matrix once at trace time (numpy) and apply it as
``W_h @ x @ W_w^T`` — exact semantics, fused nicely by XLA.

Kernels: linear, cubic (Keys a=-0.75, the torch F.interpolate convention),
nearest (torch 'nearest' floor convention).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
        np.where(at < 2.0, a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a, 0.0),
    )


@lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    method: str = "linear",
    align_corners: bool = False,
) -> np.ndarray:
    """[out_size, in_size] float32 interpolation weights (rows sum to 1)."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)

    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    W = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "nearest":
        # torch 'nearest': floor(i * in/out)
        idx = np.floor(np.arange(out_size) * in_size / out_size).astype(int)
        W[np.arange(out_size), np.clip(idx, 0, in_size - 1)] = 1.0
    elif method == "linear":
        i0 = np.floor(src).astype(int)
        frac = src - i0
        for off, w in ((0, 1 - frac), (1, frac)):
            idx = np.clip(i0 + off, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), w)
    elif method == "cubic":
        i0 = np.floor(src).astype(int)
        frac = src - i0
        for off in (-1, 0, 1, 2):
            w = _cubic_kernel(off - frac)
            idx = np.clip(i0 + off, 0, in_size - 1)
            np.add.at(W, (np.arange(out_size), idx), w)
    else:
        raise ValueError(method)
    return W.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    method: str = "linear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize (..., H, W, C) images to out_hw with the chosen kernel."""
    H, W = x.shape[-3], x.shape[-2]
    OH, OW = out_hw
    Wh = jnp.asarray(resize_matrix(H, OH, method, align_corners))
    Ww = jnp.asarray(resize_matrix(W, OW, method, align_corners))
    dt = x.dtype
    xf = x.astype(jnp.float32)
    y = jnp.einsum("oh,...hwc->...owc", Wh, xf, precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", Ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


def resize_mask_nearest(mask: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of a (..., H, W) mask (reference
    pipeline.py:384 F.interpolate mode='nearest' semantics)."""
    y = resize2d(mask[..., None].astype(jnp.float32), out_hw, "nearest")
    return y[..., 0].astype(mask.dtype)
