"""Golden tests for pose/segmentation metrics and BOP error functions.

Goldens computed with independent numpy realizations of the published BOP
formulas (Hodan et al., ECCV'18) — mirroring reference behavior
(utils/metrics.py, bop_toolkit_lib/pose_error.py, visibility.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from oryon_tpu.eval import (
    mask_iou, rotation_translation_errors, compute_add, compute_adds,
    mssd, mspd, vsd_errors,
)
from oryon_tpu.eval.bop import (
    depth_to_dist, mssd_recall, mspd_recall, vsd_recall,
    visib_mask_gt, visib_mask_est,
)
from tests.conftest import random_pose

K = np.array([[591.0125, 0, 322.525], [0, 590.16775, 244.11084], [0, 0, 1]], np.float32)
IDENTITY_SYM = np.eye(3, 4, dtype=np.float32)[None]


def test_mask_iou():
    m1 = np.zeros((2, 4, 4), np.uint8)
    m2 = np.zeros((2, 4, 4), np.uint8)
    m1[0, :2] = 1
    m2[0, 1:3] = 1  # inter=4, union=12
    m1[1] = 1
    m2[1] = 1
    iou = np.asarray(mask_iou(jnp.array(m1), jnp.array(m2)))
    np.testing.assert_allclose(iou, [4 / 12, 1.0], rtol=1e-6)


def test_rt_errors_known_rotation(rng):
    ang = np.radians(30.0)
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    p1 = np.eye(4)
    p2 = np.eye(4)
    p2[:3, :3] = Rz
    p2[:3, 3] = [0.1, 0, 0]  # 10 cm
    theta, shift = rotation_translation_errors(jnp.array(p1[None]), jnp.array(p2[None]))
    assert float(theta[0]) == pytest.approx(30.0, abs=1e-3)
    assert float(shift[0]) == pytest.approx(10.0, abs=1e-4)


def test_add_adds_golden(rng):
    pts = rng.randn(100, 3).astype(np.float32) * 0.05
    Tp, Tg = random_pose(rng, 0.01), random_pose(rng, 0.01)
    add = float(compute_add(jnp.array(pts), jnp.array(Tp.astype(np.float32)), jnp.array(Tg.astype(np.float32))))
    mp = pts @ Tp[:3, :3].T + Tp[:3, 3]
    mg = pts @ Tg[:3, :3].T + Tg[:3, 3]
    ref_add = np.mean(np.linalg.norm(mp - mg, axis=1))
    assert add == pytest.approx(ref_add, rel=1e-4)

    adds = float(compute_adds(jnp.array(pts), jnp.array(Tp.astype(np.float32)), jnp.array(Tg.astype(np.float32))))
    d, _ = cKDTree(mg).query(mp, k=1)
    assert adds == pytest.approx(np.mean(d), rel=1e-3)


def test_mssd_mspd_identity_sym(rng):
    pts = (rng.randn(60, 3) * 20).astype(np.float32)  # mm scale
    Tg = random_pose(rng, 10.0)
    Tp = random_pose(rng, 10.0)
    got = float(mssd(jnp.array(Tp[:3, :3].astype(np.float32)), jnp.array(Tp[:3, 3].astype(np.float32)),
                     jnp.array(Tg[:3, :3].astype(np.float32)), jnp.array(Tg[:3, 3].astype(np.float32)),
                     jnp.array(pts), jnp.array(IDENTITY_SYM)))
    pe = pts @ Tp[:3, :3].T + Tp[:3, 3]
    pg = pts @ Tg[:3, :3].T + Tg[:3, 3]
    ref = np.linalg.norm(pe - pg, axis=1).max()
    assert got == pytest.approx(ref, rel=1e-4)

    # MSPD with translations pushed in front of the camera
    Tp2, Tg2 = Tp.copy(), Tg.copy()
    Tp2[:3, 3] = [10, 5, 800]
    Tg2[:3, 3] = [12, 4, 820]
    got_p = float(mspd(jnp.array(Tp2[:3, :3].astype(np.float32)), jnp.array(Tp2[:3, 3].astype(np.float32)),
                       jnp.array(Tg2[:3, :3].astype(np.float32)), jnp.array(Tg2[:3, 3].astype(np.float32)),
                       jnp.array(K), jnp.array(pts), jnp.array(IDENTITY_SYM)))
    def proj(T):
        c = pts @ T[:3, :3].T + T[:3, 3]
        im = c @ K.T
        return im[:, :2] / im[:, 2:3]
    ref_p = np.linalg.norm(proj(Tp2) - proj(Tg2), axis=1).max()
    assert got_p == pytest.approx(ref_p, rel=1e-3)


def test_mssd_symmetry_reduces_error(rng):
    """A 180° z-rotation error vanishes when that symmetry is declared."""
    pts = (rng.randn(80, 3) * 20).astype(np.float32)
    Tg = np.eye(4, dtype=np.float32)
    Tg[:3, 3] = [0, 0, 500]
    R180 = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    Tp = Tg.copy()
    Tp[:3, :3] = R180
    syms = np.stack([np.eye(3, 4, dtype=np.float32),
                     np.concatenate([R180, np.zeros((3, 1), np.float32)], axis=1)])
    e_sym = float(mssd(jnp.array(Tp[:3, :3]), jnp.array(Tp[:3, 3]),
                       jnp.array(Tg[:3, :3]), jnp.array(Tg[:3, 3]),
                       jnp.array(pts), jnp.array(syms)))
    e_nosym = float(mssd(jnp.array(Tp[:3, :3]), jnp.array(Tp[:3, 3]),
                         jnp.array(Tg[:3, :3]), jnp.array(Tg[:3, 3]),
                         jnp.array(pts), jnp.array(IDENTITY_SYM)))
    assert e_sym == pytest.approx(0.0, abs=1e-3)
    assert e_nosym > 1.0


def test_depth_to_dist(rng):
    depth = (rng.rand(8, 10) * 1000).astype(np.float32)
    dist = np.asarray(depth_to_dist(jnp.array(depth), jnp.array(K)))
    y, x = 3, 7
    X = (x - K[0, 2]) / K[0, 0] * depth[y, x]
    Y = (y - K[1, 2]) / K[1, 1] * depth[y, x]
    assert dist[y, x] == pytest.approx(np.sqrt(X**2 + Y**2 + depth[y, x]**2), rel=1e-5)
    assert dist[y, x] >= depth[y, x]


def test_visibility_masks_bop19():
    d_test = np.array([[100.0, 0.0, 100.0, 100.0]], np.float32)
    d_gt = np.array([[90.0, 50.0, 200.0, 0.0]], np.float32)
    v = np.asarray(visib_mask_gt(jnp.array(d_test), jnp.array(d_gt), 15.0))
    # px0: render in front (diff -10 <= 15) -> visible
    # px1: no sensor depth -> visible; px2: render 100 behind -> occluded
    # px3: no render -> not on surface
    assert list(v[0]) == [True, True, False, False]


def test_vsd_perfect_pose_zero_error():
    H, W = 48, 64
    d = np.zeros((H, W), np.float32)
    d[10:30, 20:40] = 500.0
    errs = np.asarray(vsd_errors(jnp.array(d), jnp.array(d), jnp.array(d),
                                 jnp.array(K), 15.0, [0.05, 0.2, 0.5], 100.0))
    np.testing.assert_allclose(errs, 0.0, atol=1e-6)


def test_vsd_disjoint_renders_full_error():
    H, W = 48, 64
    d_gt = np.zeros((H, W), np.float32)
    d_est = np.zeros((H, W), np.float32)
    d_gt[5:15, 5:15] = 500.0
    d_est[30:40, 40:50] = 500.0
    errs = np.asarray(vsd_errors(jnp.array(d_est), jnp.array(d_gt), jnp.array(d_gt),
                                 jnp.array(K), 15.0, [0.5], 100.0))
    np.testing.assert_allclose(errs, 1.0, atol=1e-6)


def test_recall_helpers():
    assert float(mspd_recall(jnp.array(4.9))) == 1.0
    assert float(mspd_recall(jnp.array(50.1))) == 0.0
    assert float(mspd_recall(jnp.array(25.1))) == pytest.approx(0.5)
    assert float(mssd_recall(jnp.array(0.0), 100.0)) == 1.0
    errs = jnp.full((10,), 0.049)
    assert float(vsd_recall(errs)) == 1.0
