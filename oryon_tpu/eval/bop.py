"""BOP pose-error functions: MSSD, MSPD, VSD — vectorized over symmetry sets.

Rebuilt from the reference formulas:
  * MSSD — reference bop_toolkit_lib/pose_error.py:370-400 (my_mssd)
  * MSPD — reference bop_toolkit_lib/pose_error.py:402-427 (my_mspd)
  * VSD  — reference bop_toolkit_lib/pose_error.py:17-93 given rendered
           depth images (the depth renderer lives in eval/renderer.py)
  * visibility masks — reference bop_toolkit_lib/visibility.py:9-75
  * distance images  — reference bop_toolkit_lib/misc.py:316-341

Poses/points are float32 (the reference's internal float16 casts add noise to
the reference's own scores; see SURVEY.md §7 risk 3).  Symmetry sets come in
as a fixed [S, 3, 4] array (identity in row 0 for asymmetric objects).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from oryon_tpu.utils.precision import fp32_matmul


def _transform(pose: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """pose: (..., 3, 4); pts: (N, 3) -> (..., N, 3)."""
    return (
        jnp.einsum("...ij,nj->...ni", pose[..., :3, :3], pts,
                   precision=jax.lax.Precision.HIGHEST)
        + pose[..., None, :3, 3]
    )


def _sym_poses(R_gt: jnp.ndarray, t_gt: jnp.ndarray, syms: jnp.ndarray) -> jnp.ndarray:
    """Compose gt pose with each symmetry: [S, 3, 4]."""
    R = jnp.einsum("ij,sjk->sik", R_gt, syms[:, :3, :3],
                   precision=jax.lax.Precision.HIGHEST)
    t = (R_gt @ syms[:, :3, 3:4])[..., 0] + t_gt
    return jnp.concatenate([R, t[..., None]], axis=-1)


@fp32_matmul
def mssd(
    R_est: jnp.ndarray, t_est: jnp.ndarray,
    R_gt: jnp.ndarray, t_gt: jnp.ndarray,
    pts: jnp.ndarray, syms: jnp.ndarray,
) -> jnp.ndarray:
    """Maximum symmetry-aware surface distance.

    R: [3,3], t: [3], pts: [N,3], syms: [S,3,4] -> scalar.
    min over symmetries of (max over points of |T_est p - T_gt_sym p|).
    """
    pose_est = jnp.concatenate([R_est, t_est[:, None]], axis=-1)
    pts_est = _transform(pose_est, pts)                     # [N, 3]
    pts_sym = _transform(_sym_poses(R_gt, t_gt, syms), pts)  # [S, N, 3]
    d = jnp.linalg.norm(pts_est[None] - pts_sym, axis=-1)   # [S, N]
    return jnp.min(jnp.max(d, axis=-1))


def _project(pose: jnp.ndarray, pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    cam = _transform(pose, pts)                              # (..., N, 3)
    im = jnp.einsum("ij,...nj->...ni", K, cam,
                   precision=jax.lax.Precision.HIGHEST)
    return im[..., :2] / im[..., 2:3]


@fp32_matmul
def mspd(
    R_est: jnp.ndarray, t_est: jnp.ndarray,
    R_gt: jnp.ndarray, t_gt: jnp.ndarray,
    K: jnp.ndarray, pts: jnp.ndarray, syms: jnp.ndarray,
) -> jnp.ndarray:
    """Maximum symmetry-aware projection distance (pixels)."""
    pose_est = jnp.concatenate([R_est, t_est[:, None]], axis=-1)
    proj_est = _project(pose_est, pts, K)                    # [N, 2]
    proj_sym = _project(_sym_poses(R_gt, t_gt, syms), pts, K)  # [S, N, 2]
    d = jnp.linalg.norm(proj_est[None] - proj_sym, axis=-1)
    return jnp.min(jnp.max(d, axis=-1))


def depth_to_dist(depth: jnp.ndarray, K: jnp.ndarray,
                  origin: jnp.ndarray | None = None) -> jnp.ndarray:
    """Depth image -> euclidean distance-from-camera image.

    Matches reference misc.depth_im_to_dist_im_fast (bop misc.py:316-341).
    depth: [H, W]; zero depth stays zero.  ``origin`` ([2] int (y0, x0))
    offsets the pixel grid for depth windows cropped out of a full frame.
    """
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    if origin is not None:
        xs = xs + origin[1].astype(jnp.float32)
        ys = ys + origin[0].astype(jnp.float32)
    X = (xs - K[0, 2]) / K[0, 0] * depth
    Y = (ys - K[1, 2]) / K[1, 1] * depth
    return jnp.sqrt(X * X + Y * Y + depth.astype(jnp.float32) ** 2)


def visib_mask_gt(d_test: jnp.ndarray, d_gt: jnp.ndarray, delta: float) -> jnp.ndarray:
    """bop19 visibility of the model surface in the GT pose
    (reference visibility.py:34-37): visible where the render is in front of
    (or within delta of) the measured depth, or where the sensor has no depth."""
    d_diff = d_gt - d_test
    return ((d_diff <= delta) | (d_test == 0)) & (d_gt > 0)


def visib_mask_est(
    d_test: jnp.ndarray, d_est: jnp.ndarray, visib_gt: jnp.ndarray, delta: float
) -> jnp.ndarray:
    """bop19 visibility in the estimated pose (reference visibility.py:58-75)."""
    v = ((d_est - d_test <= delta) | (d_test == 0)) & (d_est > 0)
    return v | (visib_gt & (d_est > 0))


@fp32_matmul
def vsd_errors(
    depth_est: jnp.ndarray,
    depth_gt: jnp.ndarray,
    depth_test: jnp.ndarray,
    K: jnp.ndarray,
    delta: float,
    taus: Sequence[float],
    diameter: float,
    origin: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Visible surface discrepancy given rendered depths, one error per tau.

    depth_est / depth_gt: [H, W] rendered model depths (mm).
    depth_test: [H, W] measured scene depth (mm).
    Implements reference pose_error.vsd:17-93 with 'step' cost and
    diameter normalization; returns [len(taus)] float errors.

    Windowed evaluation is exact: visib_gt/visib_est are zero wherever the
    respective render is zero, so any window containing both renders'
    nonzero pixels yields the full-frame result (``origin`` keeps the
    pixel->ray geometry of depth_to_dist anchored to absolute coords).
    """
    dist_test = depth_to_dist(depth_test, K, origin)
    dist_gt = depth_to_dist(depth_gt, K, origin)
    dist_est = depth_to_dist(depth_est, K, origin)

    visib_gt = visib_mask_gt(dist_test, dist_gt, delta)
    visib_est = visib_mask_est(dist_test, dist_est, visib_gt, delta)
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_count = jnp.sum(union)
    comp_count = union_count - jnp.sum(inter)

    dists = jnp.abs(dist_gt - dist_est) / diameter
    taus_arr = jnp.asarray(list(taus), dtype=jnp.float32)
    # step cost: 1 where dists >= tau inside the intersection
    costs = (dists[None] >= taus_arr[:, None, None]) & inter[None]
    errs = (jnp.sum(costs, axis=(1, 2)) + comp_count) / jnp.maximum(union_count, 1)
    return jnp.where(union_count == 0, jnp.ones_like(errs), errs)


def mssd_recall(err: jnp.ndarray, diameter: float) -> jnp.ndarray:
    """Mean recall over the BOP thresholds 0.05..0.5 x diameter
    (reference utils/evaluator.py:90,274-275)."""
    th = jnp.arange(0.05, 0.51, 0.05, dtype=jnp.float32) * diameter
    return jnp.mean((err < th).astype(jnp.float32))


def mspd_recall(err: jnp.ndarray) -> jnp.ndarray:
    """Mean recall over 5..50 px (reference utils/evaluator.py:91,276)."""
    th = jnp.arange(5.0, 51.0, 5.0, dtype=jnp.float32)
    return jnp.mean((err < th).astype(jnp.float32))


def vsd_recall(errs: jnp.ndarray) -> jnp.ndarray:
    """Mean recall of per-tau VSD errors over thresholds 0.05..0.5
    (reference utils/evaluator.py:283-287)."""
    rec = jnp.arange(0.05, 0.51, 0.05, dtype=jnp.float32)
    return jnp.mean((errs[:, None] < rec[None, :]).astype(jnp.float32))
