"""Batched z-buffer triangle rasterizer for VSD depth rendering.

Replaces the reference's offscreen OpenGL renderer (reference:
bop_toolkit_lib/renderer_vispy.py:259-617 — vispy FBO + GLSL depth shader,
instantiated at utils/evaluator.py:96) with a pure-XLA rasterizer:

  * vertices are projected with the CV pinhole model (the reference builds a
    GL projection from K and flips CV->GL, renderer_vispy.py:186-237; the
    composition is the same pinhole map);
  * every triangle rasterizes a fixed TILE x TILE pixel footprint anchored at
    its screen bbox (static shapes; tiles larger than the footprint are
    masked out);
  * coverage via screen-space barycentrics, depth via perspective-correct
    1/z interpolation (GL's default interpolation of eye-space depth);
  * the z-buffer is one scatter-min over flat pixel ids.

Meshes are padded to a fixed triangle count per object so renders are
jit-compatible and batchable over poses (vmap) — the reference renders one
pose at a time through the GL pipeline.

Limitations vs GL: triangles whose screen bbox exceeds TILE px are only
partially filled; with VSD's 640x480 images and decimated BOP meshes the
footprint is far below the default TILE=16 (guard with ``max_footprint``
diagnostics in tests).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Mesh(NamedTuple):
    vertices: jnp.ndarray   # [V, 3] float32 (mm, model frame)
    faces: jnp.ndarray      # [F, 3] int32 (padded with degenerate 0,0,0 rows)
    face_valid: jnp.ndarray  # [F] bool


def subdivide_mesh(
    vertices: np.ndarray, faces: np.ndarray, max_edge: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Midpoint-subdivide triangles until every edge is <= max_edge (host).

    Bounds each triangle's screen footprint: an edge of e mm at depth z mm
    projects to at most e*f/z px, so choosing max_edge = tile*z_min/f keeps
    every triangle inside the rasterizer tile for all poses at depth >= z_min.
    """
    V = [tuple(v) for v in np.asarray(vertices, np.float64)]
    F = [tuple(f) for f in np.asarray(faces, np.int64)]
    for _ in range(12):  # hard cap on subdivision rounds
        Va = np.asarray(V)
        needs = []
        keep = []
        for tri in F:
            e = Va[list(tri)]
            m = max(np.linalg.norm(e[0] - e[1]), np.linalg.norm(e[1] - e[2]),
                    np.linalg.norm(e[2] - e[0]))
            (needs if m > max_edge else keep).append(tri)
        if not needs:
            break
        cache = {}

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                cache[key] = len(V)
                V.append(tuple((np.asarray(V[i]) + np.asarray(V[j])) / 2.0))
            return cache[key]

        for a, b, c in needs:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            keep += [(a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)]
        F = keep
    return np.asarray(V, np.float32), np.asarray(F, np.int32)


def pad_mesh(vertices: np.ndarray, faces: np.ndarray,
             n_faces: Optional[int] = None,
             max_edge: Optional[float] = None) -> Mesh:
    """Pad/truncate a host mesh to a fixed face count (None = exact fit),
    optionally after subdividing so every edge is <= max_edge."""
    if max_edge is not None:
        vertices, faces = subdivide_mesh(vertices, faces, max_edge)
    F = faces.shape[0]
    if n_faces is None:
        n_faces = F
    elif F > n_faces:
        import warnings
        warnings.warn(f"pad_mesh: truncating {F} faces to {n_faces}")
    fv = np.zeros(n_faces, bool)
    out = np.zeros((n_faces, 3), np.int32)
    take = min(F, n_faces)
    out[:take] = faces[:take]
    fv[:take] = True
    return Mesh(jnp.asarray(vertices, jnp.float32), jnp.asarray(out),
                jnp.asarray(fv))


@partial(jax.jit, static_argnames=("hw", "tile"))
def render_depth(
    mesh: Mesh,
    R: jnp.ndarray,          # [3, 3]
    t: jnp.ndarray,          # [3] (mm)
    K: jnp.ndarray,          # [3, 3]
    hw: Tuple[int, int] = (480, 640),
    tile: int = 16,
) -> jnp.ndarray:
    """Render the model depth (mm) under pose (R, t); 0 where no surface."""
    H, W = hw
    # metric path: pin the vertex transform to fp32 (default bf16 matmuls
    # cost ~1 px projection / ~0.6 mm depth error on a 300 mm object)
    cam = jnp.matmul(mesh.vertices, R.T,
                     precision=jax.lax.Precision.HIGHEST) + t   # [V, 3]
    z = cam[:, 2]
    u = cam[:, 0] / z * K[0, 0] + K[0, 2]
    v = cam[:, 1] / z * K[1, 1] + K[1, 2]

    tri = mesh.faces                                  # [F, 3]
    tz = z[tri]                                       # [F, 3]
    tu = u[tri]
    tv = v[tri]
    front = jnp.all(tz > 1e-3, axis=-1) & mesh.face_valid

    # integer bbox origin per triangle
    x0 = jnp.floor(jnp.min(tu, axis=-1)).astype(jnp.int32)
    y0 = jnp.floor(jnp.min(tv, axis=-1)).astype(jnp.int32)

    # tile pixel offsets (static)
    dy = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    dx = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    px = (x0[:, None, None] + dx[None]).astype(jnp.float32)   # [F, T, T]
    py = (y0[:, None, None] + dy[None]).astype(jnp.float32)

    # screen-space barycentrics at pixel centers
    x1, x2, x3 = tu[:, 0, None, None], tu[:, 1, None, None], tu[:, 2, None, None]
    y1, y2, y3 = tv[:, 0, None, None], tv[:, 1, None, None], tv[:, 2, None, None]
    det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    l1 = ((y2 - y3) * (px - x3) + (x3 - x2) * (py - y3)) / det
    l2 = ((y3 - y1) * (px - x3) + (x1 - x3) * (py - y3)) / det
    l3 = 1.0 - l1 - l2
    eps = -1e-5
    inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)

    # perspective-correct depth: 1/z interpolates linearly in screen space
    inv_z = (l1 / tz[:, 0, None, None] + l2 / tz[:, 1, None, None]
             + l3 / tz[:, 2, None, None])
    depth = 1.0 / jnp.maximum(inv_z, 1e-9)

    xi = px.astype(jnp.int32)
    yi = py.astype(jnp.int32)
    ok = (inside & front[:, None, None]
          & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
    # masked lanes get UNIQUE dump slots beyond the image: funneling them all
    # to one slot creates a scatter collision chain that serializes the whole
    # z-buffer (measured ~10x slowdown)
    n_lanes = ok.size
    lane_ids = jnp.arange(n_lanes, dtype=jnp.int32).reshape(ok.shape)
    flat = jnp.where(ok, yi * W + xi, H * W + lane_ids)

    zbuf = jnp.full((H * W + n_lanes,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[flat.reshape(-1)].min(depth.reshape(-1))
    img = zbuf[: H * W].reshape(H, W)
    return jnp.where(jnp.isinf(img), 0.0, img)


def render_depth_batch(mesh: Mesh, Rs, ts, K, hw=(480, 640), tile: int = 16):
    """vmap over poses: Rs [B,3,3], ts [B,3] -> [B,H,W]."""
    return jax.vmap(lambda R, t: render_depth(mesh, R, t, K, hw, tile))(Rs, ts)


def max_screen_footprint(mesh: Mesh, R, t, K) -> jnp.ndarray:
    """Diagnostic: the largest triangle bbox edge in pixels under a pose
    (must stay below the rasterizer tile)."""
    cam = jnp.matmul(mesh.vertices, R.T,
                     precision=jax.lax.Precision.HIGHEST) + t
    z = jnp.maximum(cam[:, 2], 1e-3)
    u = cam[:, 0] / z * K[0, 0] + K[0, 2]
    v = cam[:, 1] / z * K[1, 1] + K[1, 2]
    tri = mesh.faces
    du = jnp.max(u[tri], axis=-1) - jnp.min(u[tri], axis=-1)
    dv = jnp.max(v[tri], axis=-1) - jnp.min(v[tri], axis=-1)
    ext = jnp.maximum(du, dv) * mesh.face_valid
    return jnp.max(ext)
