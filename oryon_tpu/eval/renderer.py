"""Batched z-buffer triangle rasterizers for VSD depth rendering.

Replaces the reference's offscreen OpenGL renderer (reference:
bop_toolkit_lib/renderer_vispy.py:259-617 — vispy FBO + GLSL depth shader,
instantiated at utils/evaluator.py:96) with two pure-XLA rasterizers:

  * ``render_depth_window`` — the production path: a GATHER z-buffer over a
    fixed window around the object's projected bbox (exact for VSD, no
    scatter, no footprint limit; see the section comment below).
  * ``render_depth`` — full-frame scatter-min z-buffer (golden reference
    for the gather path and for callers needing arbitrary frames):

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


# ---------------------------------------------------------------------------
# Windowed gather rasterizer (no scatter)
#
# The scatter-min z-buffer above is the rasterizer bottleneck on TPU: the
# device trace attributes ~9.4 ms per batched (B=8) 640x480 render almost
# entirely to the scatter fusion (~141k colliding lanes/pose).  VSD only
# needs depth where a render is nonzero (eval/bop.py: visib_gt requires
# d_gt>0, visib_est requires d_est>0), so rendering a fixed window around
# the object's projected bbox is exact.  Inside a window the z-buffer can be
# a GATHER: screen-space barycentrics and 1/z are AFFINE in pixel coords, so
# every (pixel, face) coverage test is a few broadcast FMAs and the depth is
# a max-reduce of 1/z over faces — pure VPU work, no scatter, and no
# tile-footprint hazard (every window pixel is tested against every face,
# so meshes need no subdivision on this path).
# ---------------------------------------------------------------------------


def _face_affine(mesh: Mesh, R: jnp.ndarray, t: jnp.ndarray, K: jnp.ndarray):
    """Project vertices and build per-face affine coefficients.

    Returns (coeffs, front) where coeffs is a tuple of nine [F] arrays
    (a1,b1,c1, a2,b2,c2, az,bz,cz) such that at pixel (px,py):
        l1 = a1*px + b1*py + c1          (barycentric 1)
        l2 = a2*px + b2*py + c2          (barycentric 2)
        1/z = az*px + bz*py + cz         (perspective-correct inverse depth)
    Faces failing the front/validity test get empty coverage (c1 = -1)."""
    cam = jnp.matmul(mesh.vertices, R.T,
                     precision=jax.lax.Precision.HIGHEST) + t
    z = cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam[:, 0] / zs * K[0, 0] + K[0, 2]
    v = cam[:, 1] / zs * K[1, 1] + K[1, 2]
    tri = mesh.faces
    tz, tu, tv = z[tri], u[tri], v[tri]
    front = jnp.all(tz > 1e-3, axis=-1) & mesh.face_valid
    x1, x2, x3 = tu[:, 0], tu[:, 1], tu[:, 2]
    y1, y2, y3 = tv[:, 0], tv[:, 1], tv[:, 2]
    det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    a1 = (y2 - y3) / det
    b1 = (x3 - x2) / det
    c1 = -(a1 * x3 + b1 * y3)
    a2 = (y3 - y1) / det
    b2 = (x1 - x3) / det
    c2 = -(a2 * x3 + b2 * y3)
    # 1/z = l1*iz1 + l2*iz2 + (1-l1-l2)*iz3
    iz = 1.0 / jnp.maximum(tz, 1e-3)
    d1, d2 = iz[:, 0] - iz[:, 2], iz[:, 1] - iz[:, 2]
    az = a1 * d1 + a2 * d2
    bz = b1 * d1 + b2 * d2
    cz = c1 * d1 + c2 * d2 + iz[:, 2]
    z0 = jnp.zeros_like(a1)
    coeffs = (jnp.where(front, a1, z0), jnp.where(front, b1, z0),
              jnp.where(front, c1, -1.0),
              jnp.where(front, a2, z0), jnp.where(front, b2, z0),
              jnp.where(front, c2, z0),
              jnp.where(front, az, z0), jnp.where(front, bz, z0),
              jnp.where(front, cz, z0))
    return coeffs, front, tu, tv


def projected_bbox(mesh: Mesh, R, t, K, hw=(480, 640)):
    """Screen bbox of the valid front faces, clipped to the image.

    Returns (lo_yx, hi_yx, any_front): float32 [2] inclusive pixel bounds
    (floor/ceil'd) and whether anything renders.  Empty -> lo=0, hi=-1."""
    H, W = hw
    _, front, tu, tv = _face_affine(mesh, R, t, K)
    fu = jnp.where(front[:, None], tu, jnp.inf)
    fv = jnp.where(front[:, None], tv, jnp.inf)
    gu = jnp.where(front[:, None], tu, -jnp.inf)
    gv = jnp.where(front[:, None], tv, -jnp.inf)
    lo = jnp.stack([jnp.floor(jnp.min(fv)), jnp.floor(jnp.min(fu))])
    hi = jnp.stack([jnp.ceil(jnp.max(gv)), jnp.ceil(jnp.max(gu))])
    lim = jnp.asarray([H - 1, W - 1], jnp.float32)
    lo = jnp.clip(lo, 0.0, lim)
    hi = jnp.clip(hi, 0.0, lim)
    any_front = jnp.any(front)
    lo = jnp.where(any_front, lo, jnp.zeros(2))
    hi = jnp.where(any_front, hi, -jnp.ones(2))
    return lo, hi, any_front


@partial(jax.jit, static_argnames=("window", "chunk"))
def render_depth_window(
    mesh: Mesh,
    R: jnp.ndarray,          # [3, 3]
    t: jnp.ndarray,          # [3] (mm)
    K: jnp.ndarray,          # [3, 3]
    origin: jnp.ndarray,     # [2] int32 (y0, x0) window corner, absolute px
    window: Tuple[int, int] = (128, 128),
    chunk: int = 512,
) -> jnp.ndarray:
    """Gather-rasterize the model depth (mm) inside a window; 0 = no surface.

    Exactly the z-buffer of ``render_depth`` restricted to the window (up to
    float associativity at triangle edges), with no tile-footprint limit."""
    Hw, Ww = window
    coeffs, _, _, _ = _face_affine(mesh, R, t, K)
    F = int(mesh.faces.shape[0])
    Fp = -(-F // chunk) * chunk
    pads = (0.0,) * 2 + (-1.0,) + (0.0,) * 6  # pad c1=-1 -> empty coverage
    C = jnp.stack([jnp.pad(c, (0, Fp - F), constant_values=p)
                   for c, p in zip(coeffs, pads)], axis=1)
    C = C.reshape(Fp // chunk, chunk, 9)

    px = origin[1].astype(jnp.float32) + jnp.arange(Ww, dtype=jnp.float32)
    py = origin[0].astype(jnp.float32) + jnp.arange(Hw, dtype=jnp.float32)
    eps = -1e-5

    def body(best, c):
        a1, b1, c1, a2, b2, c2, az, bz, cz = [c[:, i] for i in range(9)]
        # row-factored: the py term is [chunk, Hw], only the px FMA is per-px
        r1 = (b1[:, None] * py[None, :] + c1[:, None])[:, :, None]
        r2 = (b2[:, None] * py[None, :] + c2[:, None])[:, :, None]
        rz = (bz[:, None] * py[None, :] + cz[:, None])[:, :, None]
        l1 = a1[:, None, None] * px[None, None, :] + r1   # [chunk, Hw, Ww]
        l2 = a2[:, None, None] * px[None, None, :] + r2
        iz = az[:, None, None] * px[None, None, :] + rz
        cov = jnp.minimum(jnp.minimum(l1, l2), 1.0 - l1 - l2) >= eps
        iz = jnp.where(cov, iz, 0.0)
        return jnp.maximum(best, jnp.max(iz, axis=0)), None

    best, _ = jax.lax.scan(body, jnp.zeros((Hw, Ww), jnp.float32), C)
    return jnp.where(best > 1e-9, 1.0 / jnp.maximum(best, 1e-9), 0.0)


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
