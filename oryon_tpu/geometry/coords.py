"""Coordinate-frame transforms between image / featmap / original resolutions.

Semantics match the reference (reference: utils/coordinates.py:5-48 and the
batched variant utils/misc.py:93-122): coordinates are (y, x) pairs in the
trailing dimension(s); scaling multiplies by target/source per axis.

All functions are pure jnp, shape-polymorphic over leading batch dims, and
jit/vmap friendly.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp

Size = Union[Tuple[int, int], Sequence[int], jnp.ndarray]


def scale_coords(coords: jnp.ndarray, source: Size, target: Size) -> jnp.ndarray:
    """Rescale (..., 2k) yx-coordinates from ``source`` (H, W) to ``target``.

    Supports both (..., 2) single coordinates and (..., 4) correspondence
    rows (y1, x1, y2, x2) — every even channel is scaled by H-ratio, odd by
    W-ratio.
    """
    coords = coords.astype(jnp.float32)
    src = jnp.asarray(source, dtype=jnp.float32)
    tgt = jnp.asarray(target, dtype=jnp.float32)
    k = coords.shape[-1] // 2
    ratio = jnp.tile(tgt / src, (k,))
    return coords * ratio


def crop_coords(coords: jnp.ndarray, origin: Size) -> jnp.ndarray:
    """Subtract a crop origin (y0, x0) from (..., 2) yx coords."""
    coords = coords.astype(jnp.float32)
    o = jnp.asarray(origin, dtype=jnp.float32)
    return coords - o


def decrop_coords(coords: jnp.ndarray, origin: Size) -> jnp.ndarray:
    coords = coords.astype(jnp.float32)
    o = jnp.asarray(origin, dtype=jnp.float32)
    return coords + o


def valid_coords(coords: jnp.ndarray, bounds: Size) -> jnp.ndarray:
    """Boolean mask of (..., 2) yx coords lying inside [0, H) x [0, W)."""
    b = jnp.asarray(bounds, dtype=coords.dtype)
    ok_y = (coords[..., 0] >= 0) & (coords[..., 0] < b[0])
    ok_x = (coords[..., 1] >= 0) & (coords[..., 1] < b[1])
    return ok_y & ok_x
