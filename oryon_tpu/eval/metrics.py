"""Pose & segmentation metrics, batched and jit-friendly.

Rebuilt from the reference formulas:
  * mask IoU          — reference utils/metrics.py:18-40
  * R/T errors        — reference utils/metrics.py:222-259
  * ADD / ADD-S       — reference utils/metrics.py:194-220 (ADD-S uses a
                        brute-force NN matmul instead of a KDTree; exact
                        same minimum since the metric is exact NN distance)
  * FMR               — reference utils/metrics.py:59-77

The reference pipeline computes ADD/ADD-S through float16-cast transforms
(utils/pcd.py:127-133).  We compute in float32: parity with reference scores
is statistical (the fp16 casts add noise to the *reference*), which is the
documented tolerance policy (SURVEY.md §7 risks).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from oryon_tpu.geometry.pcd import unit as _unit

from oryon_tpu.geometry.pcd import sq_dist_matrix, transform_pcd
from oryon_tpu.utils.precision import fp32_matmul


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """IoU between [..., H, W] binary masks -> [...]."""
    m1 = mask1.astype(bool).reshape(mask1.shape[:-2] + (-1,))
    m2 = mask2.astype(bool).reshape(mask2.shape[:-2] + (-1,))
    inter = jnp.sum(m1 & m2, axis=-1)
    union = jnp.sum(m1 | m2, axis=-1)
    return inter / jnp.maximum(union, 1)


@fp32_matmul
def rotation_translation_errors(
    pose1: jnp.ndarray, pose2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Angle difference (degrees) and translation difference (centimeters).

    pose{1,2}: (..., 4, 4) with translations in meters.  Matches reference
    compute_RT_distances (utils/metrics.py:222-259), including the
    det-normalization of R and the NaN->180 guard.
    """
    R1 = pose1[..., :3, :3]
    R2 = pose2[..., :3, :3]
    R1 = R1 / jnp.cbrt(jnp.linalg.det(R1))[..., None, None]
    R2 = R2 / jnp.cbrt(jnp.linalg.det(R2))[..., None, None]
    R = jnp.einsum("...ij,...kj->...ik", R1, R2)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    arg = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-12, 1.0 - 1e-12)
    theta = jnp.degrees(jnp.arccos(arg))
    theta = jnp.where(jnp.isnan(theta), 180.0, theta)
    shift = jnp.linalg.norm(pose1[..., :3, 3] - pose2[..., :3, 3], axis=-1) * 100.0
    return theta, shift


@fp32_matmul
def compute_add(
    pts: jnp.ndarray, pred_pose: jnp.ndarray, gt_pose: jnp.ndarray,
    w: jnp.ndarray = None,
) -> jnp.ndarray:
    """Average distance of model points (ADD). pts: (..., N, 3); poses (..., 4, 4).

    ``w`` (..., N): optional 0/1 point weights — lets padded fixed-capacity
    point buffers (shared metric programs) score identically to exact-size
    ones via a weighted mean."""
    p = transform_pcd(pts, pred_pose[..., :3, :3], pred_pose[..., :3, 3])
    g = transform_pcd(pts, gt_pose[..., :3, :3], gt_pose[..., :3, 3])
    d = jnp.linalg.norm(p - g, axis=-1)
    if w is None:
        return jnp.mean(d, axis=-1)
    return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


@fp32_matmul
def compute_adds(
    pts: jnp.ndarray, pred_pose: jnp.ndarray, gt_pose: jnp.ndarray,
    w: jnp.ndarray = None,
) -> jnp.ndarray:
    """ADD-S: mean NN distance from predicted-pose points to gt-pose points.

    Exact brute-force NN on the MXU (reference uses a KDTree,
    utils/metrics.py:216-218 — identical value).  ``w``: optional 0/1 point
    weights; padding MUST duplicate real points so the NN target pool is
    unchanged, and the source mean is weighted."""
    p = transform_pcd(pts, pred_pose[..., :3, :3], pred_pose[..., :3, 3])
    g = transform_pcd(pts, gt_pose[..., :3, :3], gt_pose[..., :3, 3])
    d2 = sq_dist_matrix(p, g)
    d = jnp.sqrt(jnp.min(d2, axis=-1) + 1e-12)
    if w is None:
        return jnp.mean(d, axis=-1)
    return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


def fmr(
    feats1: jnp.ndarray,
    feats2: jnp.ndarray,
    dist_th: float,
    inlier_th: float,
    w: jnp.ndarray = None,
    return_ratio: bool = False,
) -> jnp.ndarray:
    """Feature-match recall over (..., N, D) matched feature sets
    (reference compute_fmr, utils/metrics.py:59-77).

    ``w`` (..., N): optional 0/1 validity weights so fixed-capacity padded
    correspondence buffers score like exact-size ones.

    ``return_ratio``: also return the per-set feature inlier RATIO.  The
    binary recall saturates early (any featmap where >inlier_th of GT-corr
    pairs sit within dist_th scores 1.0 — true even for an untrained
    network whose features are smooth); the continuous ratio is the
    discriminative learning-signal curve."""
    cos = jnp.sum(
        _unit(feats1) * _unit(feats2), axis=-1
    )
    dist = 0.5 * (1.0 - cos)
    inl = (dist < dist_th).astype(jnp.float32)
    if w is None:
        inlier_ratio = jnp.mean(inl, axis=-1)
    else:
        w = w.astype(jnp.float32)
        inlier_ratio = jnp.sum(inl * w, axis=-1) / jnp.maximum(
            jnp.sum(w, axis=-1), 1.0)
    recall = (inlier_ratio > inlier_th).astype(jnp.float32)
    if return_ratio:
        return recall, inlier_ratio
    return recall




def entropy(probs: jnp.ndarray, axis: int, norm: bool = False) -> jnp.ndarray:
    """Entropy along an axis, optionally normalized to [0, 1]
    (reference utils/metrics.py:43-57)."""
    h = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=axis)
    if norm:
        h = h / jnp.log(probs.shape[axis])
    return h


def pixel_match_loss(gt_matches, pred_matches) -> "np.ndarray":
    """Mean optimal-assignment pixel distance between predicted and GT match
    sets (reference utils/metrics.py:79-96; host-side, scipy Hungarian)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    gt = np.asarray(gt_matches, np.float64)
    pr = np.asarray(pred_matches, np.float64)
    B = pr.shape[0]
    err = np.zeros(B)
    for i in range(B):
        g, p = gt[i], pr[i]
        if g.shape[0] == 0 or p.shape[0] == 0:
            continue
        d1 = np.linalg.norm(p[:, None, :2] - g[None, :, :2], axis=-1)
        d2 = np.linalg.norm(p[:, None, 2:] - g[None, :, 2:], axis=-1)
        dists = (d1 + d2) / 2.0
        r, c = linear_sum_assignment(dists)
        err[i] = dists[r, c].mean()
    return err
