"""Depth rasterizer + evaluator integration tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.eval.renderer import Mesh, pad_mesh, render_depth, max_screen_footprint
from oryon_tpu.eval.evaluator import Evaluator, ObjectInfo, pred_pose_csv_line

K = np.array([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]], np.float32)
HW = (128, 128)


def make_quad(z=500.0, half=20.0):
    """Two triangles forming a square at depth z (mm), centered on axis."""
    V = np.array([
        [-half, -half, 0], [half, -half, 0], [half, half, 0], [-half, half, 0],
    ], np.float32)
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return pad_mesh(V, F, max_edge=10.0)


def icosphere(n=1.0, r=30.0):
    """Crude tessellated sphere via subdivided octahedron."""
    verts = [[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0], [0, 0, r], [0, 0, -r]]
    faces = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
             [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    V, F = np.array(verts, np.float32), np.array(faces, np.int32)
    for _ in range(3):
        newF = []
        V = V.tolist()
        cache = {}
        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (np.array(V[i]) + np.array(V[j])) / 2
                m = m / np.linalg.norm(m) * r
                cache[key] = len(V)
                V.append(m.tolist())
            return cache[key]
        for a, b, c in F:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            newF += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        V, F = np.array(V, np.float32), np.array(newF, np.int32)
    return V, F


def test_quad_depth_values():
    mesh = make_quad()
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 500.0])
    d = np.asarray(render_depth(mesh, R, t, jnp.array(K), HW))
    # center pixel hits the quad at exactly 500mm
    assert d[64, 64] == pytest.approx(500.0, rel=1e-4)
    # footprint: half=20mm at z=500 with f=500 -> 20px half-width
    assert d[64, 64 + 18] > 0 and d[64, 64 + 25] == 0
    assert d[5, 5] == 0.0
    # no garbage values
    nz = d[d > 0]
    assert nz.min() > 499 and nz.max() < 501


def test_quad_translated_depth():
    mesh = make_quad()
    R = jnp.eye(3)
    t = jnp.array([10.0, -5.0, 800.0])
    d = np.asarray(render_depth(mesh, R, t, jnp.array(K), HW))
    u = int(10 / 800 * 500 + 64)
    v = int(-5 / 800 * 500 + 64)
    assert d[v, u] == pytest.approx(800.0, rel=1e-3)


def test_sphere_depth_profile():
    V, F = icosphere()
    mesh = pad_mesh(V, F)
    R = jnp.eye(3)
    t = jnp.array([0.0, 0.0, 400.0])
    fp = float(max_screen_footprint(mesh, R, t, jnp.array(K)))
    assert fp < 16, f"triangle footprint {fp}px exceeds tile"
    d = np.asarray(render_depth(mesh, R, t, jnp.array(K), HW))
    # nearest point of the sphere: 400 - 30 = 370mm at the center
    assert d[64, 64] == pytest.approx(370.0, rel=5e-3)
    # silhouette radius: r*f/sqrt(z^2-r^2) ~ 37.6 px
    row = d[64]
    width = np.count_nonzero(row)
    assert 2 * 33 < width < 2 * 42
    # z-buffer: front surface only — depths within [370, 400+slack]
    nz = d[d > 0]
    assert nz.min() >= 369 and nz.max() <= 402


def test_zbuffer_occlusion():
    # two quads: the nearer one must win everywhere they overlap
    V1 = np.array([[-20, -20, 0], [20, -20, 0], [20, 20, 0], [-20, 20, 0]], np.float32)
    F1 = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    V = np.concatenate([V1 + [0, 0, 500], V1 + [0, 0, 450]])
    F = np.concatenate([F1, F1 + 4]).astype(np.int32)
    mesh = pad_mesh(V, F, max_edge=10.0)
    d = np.asarray(render_depth(mesh, jnp.eye(3), jnp.zeros(3), jnp.array(K), HW))
    assert d[64, 64] == pytest.approx(450.0, rel=1e-4)


def test_behind_camera_culled():
    mesh = make_quad()
    d = np.asarray(render_depth(mesh, jnp.eye(3), jnp.array([0.0, 0.0, -500.0]),
                                jnp.array(K), HW))
    assert (d == 0).all()


def _make_evaluator(compute_vsd=True):
    ev = Evaluator("test", compute_vsd=compute_vsd)
    V, F = icosphere()
    mesh = pad_mesh(V, F)
    pts = V[np.random.RandomState(0).choice(len(V), 200)]
    syms = np.eye(3, 4, dtype=np.float32)[None]
    ev.add_object_info({"sphere": ObjectInfo(pts, 60.0, syms, mesh)})
    return ev, mesh


def test_evaluator_perfect_pose_scores():
    ev, mesh = _make_evaluator()
    ev.init_test()
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0, 0, 0.4]  # meters
    depth = np.asarray(render_depth(mesh, jnp.eye(3), jnp.array([0, 0, 400.0]),
                                    jnp.array(K), HW))
    ev.render_hw = HW
    ev.register_test(1.0, 1.0, gt, gt, gt, camera=K, depth=depth,
                     cls_id="sphere", instance_id="i0")
    m = ev.get_means()
    assert m["AR"] == pytest.approx(1.0)
    assert m["VSD"] == pytest.approx(1.0)
    assert m["MSSD"] == 1.0 and m["MSPD"] == 1.0
    assert m["ADD(S)-0.1d"] == 1.0
    assert m["R error"] == pytest.approx(0.0, abs=1e-3)


def test_evaluator_bad_pose_scores_low():
    ev, mesh = _make_evaluator()
    ev.init_test()
    ev.render_hw = HW
    gt = np.eye(4, dtype=np.float32)
    gt[:3, 3] = [0, 0, 0.4]
    bad = gt.copy()
    bad[:3, 3] += [0.3, 0.0, 0.0]  # 30 cm off
    depth = np.asarray(render_depth(mesh, jnp.eye(3), jnp.array([0, 0, 400.0]),
                                    jnp.array(K), HW))
    ev.register_test(0.5, 0.5, gt, bad, bad, camera=K, depth=depth,
                     cls_id="sphere", instance_id="i1")
    m = ev.get_means()
    assert m["AR"] < 0.1
    assert m["ADD(S)-0.1d"] == 0.0
    assert m["T error"] == pytest.approx(30.0, rel=1e-3)


def test_evaluator_failure_bookkeeping():
    ev, _ = _make_evaluator(compute_vsd=False)
    ev.init_test()
    ev.register_test_failure(0.0, 0.0, cls_id="sphere", instance_id="f0")
    m = ev.get_means()
    assert m["MSSD"] == 0.0 and m["ADD(S)-0.1d"] == 0.0
    assert ev.counts["Missing segm"] == [1]
    latex = ev.get_latex_str()
    assert "test &" in latex and latex.endswith("\\\\")


def test_evaluator_save_numpy_scalar_ids():
    """Metrics JSON must serialize numpy-scalar ids/values (shapenet6d
    class ids arrive as np.int64; regression for a truncated-JSON crash
    found driving run_test.py on the synthetic val split)."""
    import io
    import json

    ev, _ = _make_evaluator(compute_vsd=False)
    ev.init_test()
    ev.register_test_failure(np.float32(0.0), np.float32(0.0),
                             cls_id=np.int64(2501), instance_id="f0")
    buf = io.StringIO()
    ev.save(buf)
    d = json.loads(buf.getvalue())
    assert d["cls_id"] == [2501]


def test_window_guard_pred_overflow_degrades_not_crashes():
    """A legitimate (non-zero, non-identity) predicted pose whose combined
    projected bbox exceeds the VSD render window must NOT crash the sweep:
    its VSD recall is zeroed with a warning, other rows keep real values.
    A GT bbox exceeding the window is a configuration error and raises at
    the FIRST batch (fail fast), not at flush after the whole sweep."""
    from oryon_tpu.eval.evaluator import BatchedEvaluator

    def build(window):
        ev = BatchedEvaluator("t", compute_vsd=True, vsd_window=window)
        ev.render_hw = HW
        V, F = icosphere()
        mesh = pad_mesh(V, F, max_edge=5.0)
        pts = V[np.random.RandomState(0).choice(len(V), 150)]
        sym_id = np.eye(3, 4, dtype=np.float32)[None]
        ev.add_object_info({"a": ObjectInfo(pts, 60.0, sym_id, mesh)})
        ev.init_test()
        return ev, mesh

    # GT at z=0.4 m, r=30 mm, f=500 -> projected diameter ~75 px: fits a
    # 96 px window; a pred pose shifted 60 mm sideways projects ~75 px
    # away, so the COMBINED bbox (~150 px) overflows the window.
    ev, mesh = build(96)
    B = 3
    gt = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    gt[:, 2, 3] = 0.4
    pred = gt.copy()
    pred[1, 0, 3] = 0.06
    from oryon_tpu.eval.renderer import render_depth
    depth = np.asarray(render_depth(mesh, jnp.eye(3),
                                    jnp.array([0, 0, 400.0]),
                                    jnp.array(K), HW))
    depths = np.tile(depth, (B, 1, 1))
    cams = np.tile(K, (B, 1, 1))
    iou = np.full(B, 0.8)
    ev.register_test_batch(iou, iou, gt, pred, pred, ["a"] * B, cams, depths,
                           [f"i{i}" for i in range(B)])
    ev.get_means()              # no raise
    assert ev.metrics["VSD"][1] == 0.0
    assert ev.metrics["VSD"][0] > 0.9 and ev.metrics["VSD"][2] > 0.9
    # non-VSD metrics untouched by the overflow handling
    assert ev.metrics["MSSD"][0] > 0.9 and ev.metrics["MSSD"][2] > 0.9

    # GT overflow (75 px projection vs 48 px window) -> raise at
    # registration time (first batch), not flush
    ev2, _ = build(48)
    with pytest.raises(RuntimeError, match="vsd_window"):
        ev2.register_test_batch(iou, iou, gt, gt, gt, ["a"] * B,
                                cams, depths, [f"i{i}" for i in range(B)])


def test_csv_line_format():
    pose = np.arange(16, dtype=np.float32).reshape(4, 4)
    line = pred_pose_csv_line("s1 i1 obj", "s2 i2 obj", 0.5, 0.75, pose)
    parts = line.strip().split(",")
    assert len(parts) == 5
    assert len(parts[2].split(" ")) == 12
    assert parts[3] == "0.5" and parts[4] == "0.75"


def test_batched_evaluator_matches_per_pair(rng):
    """register_test_batch == N register_test calls on mixed classes."""
    from oryon_tpu.eval.evaluator import BatchedEvaluator
    from tests.conftest import random_pose

    def build(ev_cls):
        ev = ev_cls("t", compute_vsd=True)
        ev.render_hw = HW
        V, F = icosphere()
        # subdivide below the tile-8 footprint guard (flush() asserts)
        mesh = pad_mesh(V, F, max_edge=5.0)
        pts = V[np.random.RandomState(0).choice(len(V), 150)]
        sym_id = np.eye(3, 4, dtype=np.float32)[None]
        R180 = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
        syms2 = np.stack([np.eye(3, 4, dtype=np.float32),
                          np.concatenate([R180, np.zeros((3, 1), np.float32)], 1)])
        ev.add_object_info({"a": ObjectInfo(pts, 60.0, sym_id, mesh),
                            "b": ObjectInfo(pts, 60.0, syms2, mesh)})
        ev.init_test()
        return ev, mesh

    rs = np.random.RandomState(2)
    B = 5
    gt = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    gt[:, 2, 3] = 0.4
    pred = gt.copy()
    for i in range(B):
        pred[i] = random_pose(rs, 0.005).astype(np.float32) @ gt[i]
    cls_ids = ["a", "b", "a", "b", "a"]
    from oryon_tpu.eval.renderer import render_depth
    ev1, mesh = build(BatchedEvaluator)
    depth = np.asarray(render_depth(mesh, jnp.eye(3), jnp.array([0, 0, 400.0]),
                                    jnp.array(K), HW))
    depths = np.tile(depth, (B, 1, 1))
    cams = np.tile(K, (B, 1, 1))
    iou = np.full(B, 0.8)
    ev1.register_test_batch(iou, iou, gt, pred, pred, cls_ids, cams, depths,
                            [f"i{i}" for i in range(B)])

    ev2, _ = build(BatchedEvaluator)
    for i in range(B):
        ev2.register_test(iou[i], iou[i], gt_pose=gt[i], pred_pose=pred[i],
                          pred_pose_rel=pred[i], camera=K, depth=depth,
                          cls_id=cls_ids[i], instance_id=f"i{i}")
    m1, m2 = ev1.get_means(), ev2.get_means()
    for k in m2:
        assert m1[k] == pytest.approx(m2[k], abs=1e-4), k
    assert ev1.metrics["instance_id"] == ev2.metrics["instance_id"]


def test_batched_evaluator_flush_interleaved_failures(rng):
    """Deferred batched registrations + immediate failures must produce
    consistent parallel metric lists and counts."""
    from oryon_tpu.eval.evaluator import BatchedEvaluator
    from tests.conftest import random_pose

    ev = BatchedEvaluator("t", compute_vsd=False)
    pts = rng.randn(60, 3).astype(np.float32) * 30
    ev.add_object_info({"a": ObjectInfo(pts, 60.0,
                                        np.eye(3, 4, dtype=np.float32)[None])})
    ev.init_test()

    gt = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    gt[:, 2, 3] = 0.4
    pred = gt.copy()
    pred[:, 0, 3] += 1e-4   # 0.1 mm off: scores as success, not Zero pose
    cams = np.tile(K, (2, 1, 1))
    ev.register_test_batch(np.full(2, 0.9), np.full(2, 0.9), gt, pred, pred,
                           ["a", "a"], cams, None, ["i0", "i1"])
    ev.register_test_failure(0.1, 0.1, cls_id="a", instance_id="i2")
    ev.register_test_batch(np.full(1, 0.7), np.full(1, 0.7), gt[:1], pred[:1],
                           pred[:1], ["a"], cams[:1], None, ["i3"])
    m = ev.get_means()
    assert len(ev.metrics["R error"]) == 4
    assert len(ev.metrics["instance_id"]) == 4
    assert sum(ev.counts["Missing segm"]) == 1  # the explicit failure
    assert m["ADD(S)-0.1d"] == pytest.approx(3 / 4)  # failure scores zero
    # flush is idempotent
    m2 = ev.get_means()
    assert m == m2


def test_window_render_matches_full_frame():
    """render_depth_window == the same crop of the scatter render_depth up
    to triangle-edge float associativity (a handful of silhouette pixels)."""
    from oryon_tpu.eval.renderer import projected_bbox, render_depth_window

    V, F = icosphere()
    mesh = pad_mesh(V, F, max_edge=5.0)  # satisfies the tile-8 guard
    rs = np.random.RandomState(7)
    for _ in range(4):
        t = jnp.array([rs.uniform(-20, 20), rs.uniform(-20, 20),
                       rs.uniform(300, 600)])
        # reference tile must exceed the worst footprint (close poses can
        # push 5 mm edges past 8 px; the gather render has no such limit)
        full = np.asarray(render_depth(mesh, jnp.eye(3), t, jnp.array(K),
                                       HW, tile=16))
        lo, hi, any_f = projected_bbox(mesh, jnp.eye(3), t, jnp.array(K), HW)
        assert bool(any_f)
        win = 96
        origin = np.clip(np.asarray(lo).astype(np.int32), 0,
                         [HW[0] - win, HW[1] - win])
        d = np.asarray(render_depth_window(mesh, jnp.eye(3), t, jnp.array(K),
                                           jnp.asarray(origin), (win, win)))
        crop = full[origin[0]:origin[0] + win, origin[1]:origin[1] + win]
        # every full-frame hit is inside the window
        assert (full > 0).sum() == (crop > 0).sum()
        both = (crop > 0) & (d > 0)
        either = (crop > 0) | (d > 0)
        # coverage differs only on silhouette-edge pixels (FP association)
        assert (either & ~both).sum() <= max(4, 0.002 * either.sum())
        agree = np.abs(crop[both] - d[both])
        # depth where both cover: equal except edge pixels hitting the
        # far surface in one impl (diameter-scale diff on <=4 pixels)
        assert (agree > 0.01).sum() <= 4
        assert np.median(agree) < 1e-3


def test_vsd_errors_windowed_exact():
    """Windowed vsd_errors (renders + scene-depth crop + origin) equals the
    full-frame computation when the window covers both renders."""
    from oryon_tpu.eval.bop import vsd_errors
    from oryon_tpu.eval.renderer import projected_bbox, render_depth_window

    V, F = icosphere()
    mesh = pad_mesh(V, F, max_edge=5.0)
    Kj = jnp.array(K)
    taus = list(np.arange(0.05, 0.51, 0.05))
    rs = np.random.RandomState(11)
    t_gt = jnp.array([5.0, -8.0, 400.0])
    t_est = jnp.array([9.0, -2.0, 430.0])
    d_gt_full = render_depth(mesh, jnp.eye(3), t_gt, Kj, HW, tile=16)
    d_est_full = render_depth(mesh, jnp.eye(3), t_est, Kj, HW, tile=16)
    scene = jnp.asarray(np.asarray(d_gt_full)
                        + rs.uniform(-5, 5, HW).astype(np.float32))
    full = np.asarray(vsd_errors(d_est_full, d_gt_full, scene, Kj, 15.0,
                                 taus, 60.0))

    lo_g, hi_g, _ = projected_bbox(mesh, jnp.eye(3), t_gt, Kj, HW)
    lo_p, hi_p, _ = projected_bbox(mesh, jnp.eye(3), t_est, Kj, HW)
    lo = np.minimum(np.asarray(lo_g), np.asarray(lo_p))
    win = 112
    origin = jnp.asarray(np.clip(lo.astype(np.int32), 0,
                                 [HW[0] - win, HW[1] - win]))
    d_gt_w = render_depth_window(mesh, jnp.eye(3), t_gt, Kj, origin,
                                 (win, win))
    d_est_w = render_depth_window(mesh, jnp.eye(3), t_est, Kj, origin,
                                  (win, win))
    scene_w = jax.lax.dynamic_slice(scene, (origin[0], origin[1]),
                                    (win, win))
    windowed = np.asarray(vsd_errors(d_est_w, d_gt_w, scene_w, Kj, 15.0,
                                     taus, 60.0, origin=origin))
    # identical up to the same silhouette-edge pixels
    assert np.abs(full - windowed).max() < 5e-3
