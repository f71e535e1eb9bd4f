"""Golden-value tests for the geometry substrate.

Golden values are computed with independent numpy implementations of the
published formulas (depth back-projection, Kabsch/Umeyama, cosine distance),
mirroring the reference semantics (utils/pcd.py, utils/geo6d.py,
utils/coordinates.py) without reusing its code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.geometry import (
    scale_coords, valid_coords, lift_pcd, lift_pcd_at,
    transform_pcd, pairwise_dist, diameter,
    kabsch, weighted_kabsch, ransac_kabsch, icp,
)
from tests.conftest import random_pose

K9 = np.array([591.0125, 0, 322.525, 0, 590.16775, 244.11084, 0, 0, 1], np.float32)


def test_scale_coords_roundtrip():
    c = jnp.array([[10.0, 20.0], [191.0, 0.0]])
    up = scale_coords(c, (192, 192), (480, 640))
    np.testing.assert_allclose(np.asarray(up[0]), [10 * 480 / 192, 20 * 640 / 192], rtol=1e-6)
    # 4-wide correspondence rows scale both endpoints
    c4 = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    up4 = scale_coords(c4, (100, 200), (200, 100))
    np.testing.assert_allclose(np.asarray(up4[0]), [20.0, 10.0, 60.0, 20.0], rtol=1e-6)


def test_valid_coords():
    c = jnp.array([[0.0, 0.0], [-1.0, 5.0], [99.0, 99.0], [100.0, 50.0]])
    v = valid_coords(c, (100, 100))
    assert list(np.asarray(v)) == [True, False, True, False]


def test_lift_pcd_matches_pinhole(rng):
    H, W = 24, 32
    depth = rng.rand(H, W).astype(np.float32) * 1000
    pcd = np.asarray(lift_pcd(jnp.array(depth), jnp.array(K9)))
    # independent pinhole backprojection at a few pixels
    for y, x in [(0, 0), (5, 7), (23, 31)]:
        d = depth[y, x]
        ex = (x - K9[2]) * d / K9[0]
        ey = (y - K9[5]) * d / K9[4]
        np.testing.assert_allclose(pcd[y * W + x], [ex, ey, d], rtol=1e-5)


def test_lift_pcd_at_consistency(rng):
    H, W = 24, 32
    depth = jnp.array(rng.rand(H, W).astype(np.float32) * 1000)
    yx = jnp.array([[3, 4], [10, 20], [23, 31]], jnp.int32)
    dense = lift_pcd(depth, jnp.array(K9)).reshape(H, W, 3)
    sparse = lift_pcd_at(depth, jnp.array(K9), yx)
    for i, (y, x) in enumerate(np.asarray(yx)):
        np.testing.assert_allclose(np.asarray(sparse[i]), np.asarray(dense[y, x]), rtol=1e-6)


def test_pairwise_dist_kinds(rng):
    A = jnp.array(rng.randn(5, 8).astype(np.float32))
    B = jnp.array(rng.randn(7, 8).astype(np.float32))
    l2 = np.asarray(pairwise_dist(A, B, "L2"))
    ref = np.linalg.norm(np.asarray(A)[:, None] - np.asarray(B)[None], axis=-1)
    np.testing.assert_allclose(l2, ref, atol=1e-3)

    inc = np.asarray(pairwise_dist(A, B, "inv_norm_cosine"))
    An = np.asarray(A) / np.linalg.norm(A, axis=-1, keepdims=True)
    Bn = np.asarray(B) / np.linalg.norm(B, axis=-1, keepdims=True)
    ref_c = 0.5 * (1 - An @ Bn.T)
    np.testing.assert_allclose(inc, ref_c, atol=1e-5)
    assert (inc >= -1e-6).all() and (inc <= 1 + 1e-6).all()


def test_diameter():
    pts = jnp.array([[0.0, 0, 0], [1, 2, 0.5], [-1, 0, 0]])
    assert float(diameter(pts)) == pytest.approx(2.0)


def test_kabsch_recovers_pose(rng):
    T = random_pose(rng)
    A = rng.randn(50, 3).astype(np.float32)
    B = (A @ T[:3, :3].T) + T[:3, 3]
    T_est = np.asarray(kabsch(jnp.array(A), jnp.array(B)))
    np.testing.assert_allclose(T_est, T, atol=1e-4)


def test_kabsch_batched(rng):
    Ts = np.stack([random_pose(rng) for _ in range(4)])
    A = rng.randn(4, 30, 3).astype(np.float32)
    B = np.einsum("bij,bnj->bni", Ts[:, :3, :3], A) + Ts[:, None, :3, 3]
    T_est = np.asarray(kabsch(jnp.array(A), jnp.array(B)))
    np.testing.assert_allclose(T_est, Ts, atol=1e-4)


def test_weighted_kabsch_ignores_zero_weight_outliers(rng):
    T = random_pose(rng)
    A = rng.randn(40, 3).astype(np.float32)
    B = (A @ T[:3, :3].T) + T[:3, 3]
    B[:5] += 10.0  # corrupted rows
    w = np.ones(40, np.float32)
    w[:5] = 0.0
    T_est = np.asarray(weighted_kabsch(jnp.array(A), jnp.array(B), jnp.array(w)))
    np.testing.assert_allclose(T_est, T, atol=1e-4)


def test_kabsch_reflection_case():
    # nearly planar degenerate data that would produce det=-1 without the fix
    A = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.01]], np.float32)
    B = A[:, [1, 0, 2]].copy()
    T = np.asarray(kabsch(jnp.array(A), jnp.array(B)))
    assert np.linalg.det(T[:3, :3]) == pytest.approx(1.0, abs=1e-4)


def test_ransac_kabsch_with_outliers(rng):
    T = random_pose(rng, t_scale=0.2)
    N = 300
    A = rng.randn(N, 3).astype(np.float32) * 0.3
    B = (A @ T[:3, :3].T) + T[:3, 3]
    # 40% outliers
    n_out = 120
    B[:n_out] = rng.randn(n_out, 3).astype(np.float32)
    key = jax.random.PRNGKey(0)
    T_est, n_inl = ransac_kabsch(key, jnp.array(A), jnp.array(B), match_err=0.005)
    np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-2)
    assert float(n_inl) >= N - n_out - 5


def test_ransac_respects_validity_mask(rng):
    T = random_pose(rng, t_scale=0.2)
    N = 200
    A = rng.randn(N, 3).astype(np.float32) * 0.3
    B = (A @ T[:3, :3].T) + T[:3, 3]
    # padding rows (garbage) flagged invalid
    A[150:] = 0.0
    B[150:] = rng.randn(50, 3).astype(np.float32) * 5
    valid = np.zeros(N, np.float32)
    valid[:150] = 1.0
    T_est, _ = ransac_kabsch(jax.random.PRNGKey(1), jnp.array(A), jnp.array(B),
                             valid=jnp.array(valid), match_err=0.005)
    np.testing.assert_allclose(np.asarray(T_est), T, atol=1e-2)


def test_icp_converges_small_perturbation(rng):
    A = rng.randn(200, 3).astype(np.float32)
    ang = 0.05
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    B = A @ Rz.T + np.array([0.01, -0.02, 0.005], np.float32)
    T = np.asarray(icp(jnp.array(A), jnp.array(B)))
    np.testing.assert_allclose(T[:3, :3], Rz, atol=1e-3)


def test_masked_icp_partial_overlap_refines(rng):
    """masked_icp (the dense pose-refinement stage, pipeline icp_refine):
    partial-overlap clouds with padded invalid slots + a perturbed init —
    the trimmed fit must recover the exact pose, and padding rows must not
    change the result."""
    from oryon_tpu.geometry import masked_icp

    # bumpy height-field SURFACE (the ICP operating regime — depth clouds
    # are 2D surfaces; a random volume blob has no structure to lock onto):
    # fine grid, two views sample DIFFERENT subsets of partially-overlapping
    # x-ranges, like two sampled depth maps of the same object.
    lin = np.linspace(0.0, 0.12, 60, dtype=np.float32)
    gx, gy = np.meshgrid(lin, lin)
    gz = 0.02 * np.sin(gx * 80) + 0.015 * np.cos(gy * 60)
    surf = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    T = random_pose(rng, t_scale=0.1).astype(np.float32)
    pool_a = surf[surf[:, 0] < 0.10]
    pool_b = surf[surf[:, 0] > 0.02]
    src = pool_a[rng.choice(len(pool_a), 400, replace=False)]
    dst = (pool_b[rng.choice(len(pool_b), 400, replace=False)]
           @ T[:3, :3].T) + T[:3, 3]
    # perturbed init: ~2.9 deg + ~1 cm off (solver-output scale)
    ang = 0.05
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    T0 = T.copy()
    T0[:3, :3] = T[:3, :3] @ Rz
    T0[:3, 3] += np.array([0.006, -0.008, 0.005], np.float32)

    def pad(pts, cap):
        v = np.zeros(cap, bool)
        v[: len(pts)] = True
        out = np.full((cap, 3), 7.7, np.float32)                # garbage pads
        out[: len(pts)] = pts
        return jnp.array(out), jnp.array(v)

    def rot_err_deg(Ta, Tb):
        c = (np.trace(Ta[:3, :3].T @ Tb[:3, :3]) - 1) / 2
        return np.degrees(np.arccos(np.clip(c, -1, 1)))

    sa, va = pad(src, 448)
    sb, vb = pad(dst, 416)
    T_ref = np.asarray(masked_icp(sa, va, sb, vb, jnp.array(T0),
                                  iters=48, trim=0.6))
    err0 = rot_err_deg(T0, T)
    err1 = rot_err_deg(T_ref, T)
    assert err0 > 2.5                                           # sanity: init off
    assert err1 < 1.0 and err1 < 0.35 * err0, (err0, err1)
    assert np.linalg.norm(T_ref[:3, 3] - T[:3, 3]) < 0.005
    # padding invariance: different capacity, same answer
    sa2, va2 = pad(src, 512)
    sb2, vb2 = pad(dst, 512)
    T_ref2 = np.asarray(masked_icp(sa2, va2, sb2, vb2, jnp.array(T0),
                                   iters=48, trim=0.6))
    np.testing.assert_allclose(T_ref2, T_ref, atol=1e-4)
    # degenerate clouds (3 valid points) must return the init unchanged
    va3 = jnp.array(np.arange(448) < 3)
    T_deg = np.asarray(masked_icp(sa, va3, sb, vb, jnp.array(T0),
                                  iters=48, trim=0.6))
    np.testing.assert_allclose(T_deg, T0, atol=1e-7)


def test_transform_pcd_homogeneous(rng):
    T = random_pose(rng)
    pts = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(transform_pcd(jnp.array(pts), jnp.array(T[:3, :3].astype(np.float32)), jnp.array(T[:3, 3].astype(np.float32))))
    ref = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_kabsch_quat_matches_svd(rng):
    """Horn-quaternion Kabsch (the RANSAC hypothesis path) agrees with the
    SVD solver to the fp32 floor and always returns proper rotations."""
    from oryon_tpu.geometry.kabsch import weighted_kabsch, weighted_kabsch_quat

    for _ in range(10):
        T = random_pose(rng)
        n = rng.randint(4, 40)
        pa = rng.randn(n, 3).astype(np.float32)
        pb = (T[:3, :3] @ pa.T).T + T[:3, 3] + rng.randn(n, 3) * 1e-3
        T1 = np.asarray(weighted_kabsch(jnp.array(pa), jnp.array(pb)))
        T2 = np.asarray(weighted_kabsch_quat(jnp.array(pa), jnp.array(pb)))
        dR = np.degrees(np.arccos(np.clip(
            (np.trace(T1[:3, :3].T @ T2[:3, :3]) - 1) / 2, -1, 1)))
        assert dR < 0.1, f"quat vs svd rotation diverged: {dR} deg"
        assert np.linalg.norm(T1[:3, 3] - T2[:3, 3]) < 1e-2
        assert abs(np.linalg.det(T2[:3, :3]) - 1) < 1e-4

    # batched minimal sets (the RANSAC shape) stay proper rotations
    pa = rng.randn(64, 4, 3).astype(np.float32)
    pb = rng.randn(64, 4, 3).astype(np.float32)
    Tb = np.asarray(weighted_kabsch_quat(jnp.array(pa), jnp.array(pb)))
    assert np.abs(np.linalg.det(Tb[:, :3, :3]) - 1).max() < 1e-3


def test_crop_decrop_roundtrip(rng):
    """crop/decrop (reference utils/coordinates.py crop_coords) invert each
    other and match the subtract-origin semantics."""
    from oryon_tpu.geometry.coords import crop_coords, decrop_coords
    c = jnp.array(rng.rand(5, 2).astype(np.float32) * 100)
    origin = (12.0, 7.0)
    cc = crop_coords(c, origin)
    np.testing.assert_allclose(np.asarray(cc),
                               np.asarray(c) - np.array([12.0, 7.0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(decrop_coords(cc, origin)),
                               np.asarray(c), atol=1e-6)


def test_distance_matrices_match_bruteforce(rng):
    """Matmul-expansion sq_dist / cosine matrices == brute force (the MXU
    replacement for reference pcd.pdist, utils/pcd.py:22-33)."""
    from oryon_tpu.geometry.pcd import cosine_matrix, sq_dist_matrix
    A = rng.randn(7, 5).astype(np.float32)
    B = rng.randn(9, 5).astype(np.float32)
    sq = np.asarray(sq_dist_matrix(jnp.array(A), jnp.array(B)))
    ref = ((A[:, None] - B[None]) ** 2).sum(-1)
    np.testing.assert_allclose(sq, ref, atol=1e-4)
    cs = np.asarray(cosine_matrix(jnp.array(A), jnp.array(B)))
    An = A / np.linalg.norm(A, axis=-1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=-1, keepdims=True)
    np.testing.assert_allclose(cs, An @ Bn.T, atol=1e-5)


def test_sample_select_range_and_determinism():
    """sample_select (reference torch_sample_select, misc.py:242-254):
    indices stay in [0, n_avail) and are PRNG-deterministic."""
    from oryon_tpu.geometry.pcd import sample_select
    k = jax.random.PRNGKey(3)
    idx = np.asarray(sample_select(k, jnp.asarray(13), 64))
    assert idx.min() >= 0 and idx.max() < 13 and idx.shape == (64,)
    idx2 = np.asarray(sample_select(k, jnp.asarray(13), 64))
    np.testing.assert_array_equal(idx, idx2)


def test_set_deterministic_seed_reproduces():
    from oryon_tpu.utils.misc import set_deterministic_seed
    set_deterministic_seed(11)
    a = np.random.rand(3)
    set_deterministic_seed(11)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
