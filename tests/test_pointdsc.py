"""PointDSC solver tests (random-initialized network; the geometry path —
spectral matching, seed NMS, weighted Kabsch, refinement — must still recover
poses because it is data-driven, not weight-driven)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.models.pointdsc import (
    PointDSC, PointDSCConfig, batched_pointdsc, pick_seeds,
)
from tests.conftest import random_pose

KEY = jax.random.PRNGKey(0)


def make_problem(rng, N=128, outlier_frac=0.4, noise=0.0):
    T = random_pose(rng, t_scale=0.2)
    src = (rng.randn(N, 3) * 0.3).astype(np.float32)
    tgt = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    n_out = int(N * outlier_frac)
    tgt[:n_out] = rng.randn(n_out, 3).astype(np.float32) * 0.5
    if noise:
        tgt += rng.randn(N, 3).astype(np.float32) * noise
    return src, tgt, T, n_out


def init_model(src, tgt):
    model = PointDSC(PointDSCConfig(num_layers=2))  # shallow for test speed
    valid = jnp.ones(src.shape[0], jnp.float32)
    params = model.init(KEY, jnp.array(src), jnp.array(tgt), valid)
    return model, params


def test_pointdsc_recovers_pose_with_outliers(rng):
    src, tgt, T, n_out = make_problem(rng)
    model, params = init_model(src, tgt)
    T_est, labels, conf = model.apply(params, jnp.array(src), jnp.array(tgt),
                                      jnp.ones(len(src), jnp.float32))
    T_est = np.asarray(T_est)
    np.testing.assert_allclose(T_est, T, atol=5e-3)
    lab = np.asarray(labels)
    # inliers identified: the clean rows are labeled 1
    assert lab[n_out:].mean() > 0.95
    assert lab[:n_out].mean() < 0.2


def test_pointdsc_respects_validity(rng):
    src, tgt, T, _ = make_problem(rng, outlier_frac=0.0)
    # poison the tail, mark invalid
    src2 = src.copy(); tgt2 = tgt.copy()
    tgt2[100:] = rng.randn(28, 3).astype(np.float32) * 3
    valid = np.ones(len(src), np.float32); valid[100:] = 0
    model, params = init_model(src2, tgt2)
    T_est, _, conf = model.apply(params, jnp.array(src2), jnp.array(tgt2),
                                 jnp.array(valid))
    np.testing.assert_allclose(np.asarray(T_est), T, atol=5e-3)
    # invalid rows can never be seeds
    assert not np.isfinite(np.asarray(conf)[100:]).any()


def test_pointdsc_batched(rng):
    problems = [make_problem(rng, N=96) for _ in range(3)]
    src = jnp.array(np.stack([p[0] for p in problems]))
    tgt = jnp.array(np.stack([p[1] for p in problems]))
    valid = jnp.ones((3, 96), jnp.float32)
    model, params = init_model(np.asarray(src[0]), np.asarray(tgt[0]))
    solve = batched_pointdsc(model, params)
    Ts, labels, confs = solve(src, tgt, valid)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(Ts[b]), problems[b][2], atol=5e-3)


def test_pointdsc_noisy_inliers(rng):
    src, tgt, T, _ = make_problem(rng, outlier_frac=0.3, noise=0.005)
    model, params = init_model(src, tgt)
    T_est, _, _ = model.apply(params, jnp.array(src), jnp.array(tgt),
                              jnp.ones(len(src), jnp.float32))
    from oryon_tpu.eval.metrics import rotation_translation_errors
    errR, errT = rotation_translation_errors(jnp.array(T)[None],
                                             jnp.array(np.asarray(T_est))[None])
    assert float(errR[0]) < 2.0       # degrees
    assert float(errT[0]) < 2.0       # centimeters


def test_pick_seeds_nms():
    # two clusters; the weaker point near a stronger one must be suppressed
    dists = np.array([
        [0.0, 0.05, 1.0, 1.0],
        [0.05, 0.0, 1.0, 1.0],
        [1.0, 1.0, 0.0, 0.05],
        [1.0, 1.0, 0.05, 0.0],
    ], np.float32)
    scores = jnp.array([1.0, 0.9, 0.8, 0.7])
    seeds = np.asarray(pick_seeds(jnp.array(dists), scores, 0.1, 2))
    assert set(seeds.tolist()) == {0, 2}


def test_pointdsc_few_valid_rows_below_k(rng):
    """When valid correspondences < kNN size k, padded rows enter the
    per-seed subsets; their identical coordinates must NOT form a
    compatibility clique that hijacks the spectral weights."""
    T = random_pose(rng, t_scale=0.2)
    n_valid = 12
    src = np.zeros((128, 3), np.float32)
    tgt = np.zeros((128, 3), np.float32)
    src[:n_valid] = rng.randn(n_valid, 3).astype(np.float32) * 0.3
    tgt[:n_valid] = src[:n_valid] @ T[:3, :3].T + T[:3, 3]
    valid = np.zeros(128, np.float32)
    valid[:n_valid] = 1
    model, params = init_model(src, tgt)
    T_est, _, _ = model.apply(params, jnp.array(src), jnp.array(tgt),
                              jnp.array(valid))
    np.testing.assert_allclose(np.asarray(T_est), T, atol=5e-3)


def test_train_pointdsc_learns_and_roundtrips(tmp_path, monkeypatch):
    """In-sandbox PointDSC training (scripts/train_pointdsc.py): a short run
    must reduce the classification loss and raise inlier accuracy above
    chance, and the written native.npz must load back through
    build_pointdsc_solver bit-exact (the protocol-solver path
    run_test/run_train/serving gate on pointdsc_weights_available)."""
    import io
    import re
    import sys as _sys
    from contextlib import redirect_stdout

    sys_path_root = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    _sys.path.insert(0, sys_path_root)
    from scripts.train_pointdsc import main as train_main

    out = str(tmp_path / "pdsc")
    buf = io.StringIO()
    with redirect_stdout(buf):
        train_main([f"out={out}", "steps=150", "batch=4", "n=64", "lr=1e-3",
                    "layers=2"])
    text = buf.getvalue()
    steps = re.findall(
        r"step (\d+): loss ([\d.]+) bce ([\d.]+) sm ([\d.]+) inlier-acc ([\d.]+)",
        text)
    assert steps, text
    first, last = steps[0], steps[-1]
    assert float(last[2]) < float(first[2]), (first, last)  # bce falls
    assert float(last[4]) > 0.6, last  # inlier accuracy above chance

    from oryon_tpu.pipeline import (build_pointdsc_solver,
                                    pointdsc_weights_available)
    assert pointdsc_weights_available(out)
    pd, variables = build_pointdsc_solver(out, KEY, 64)

    rng = np.random.RandomState(3)
    src, tgt, T, n_out = make_problem(rng, N=64, outlier_frac=0.3)
    T_est, labels, conf = pd.apply(variables, jnp.array(src), jnp.array(tgt),
                                   jnp.ones(64, jnp.float32))
    np.testing.assert_allclose(np.asarray(T_est), T, atol=5e-3)
