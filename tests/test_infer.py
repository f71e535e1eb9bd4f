"""Inference/serving engine tests (oryon_tpu/infer.py + run_infer.py).

Covers the serving contract: fixed-shape batching with tail padding, text
embedding memoization, file-based request loading, and the CLI end to end
on a synthetic RGB-D pair (small model, CPU).
"""
import json
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.getcwd())

DEPTH_HW = (48, 64)
IMG_HW = (64, 64)
CAM = np.array([60.0, 0, 32.0, 0, 60.0, 24.0, 0, 0, 1], np.float32)


def _fake_tokenize(prompt: str) -> np.ndarray:
    ids = np.zeros((8, 16), np.int32)
    ids[:, 0] = 598
    ids[:, 1] = (abs(hash(prompt)) % 500) + 1
    ids[:, 2] = 599
    return ids


def _request(rs, prompt="mug"):
    def view():
        return {
            "rgb": (rs.rand(*IMG_HW, 3) * 255).astype(np.uint8),
            "depth": (rs.rand(*DEPTH_HW) * 300 + 600).astype(np.float32),
            "camera": CAM,
            "mask": (rs.rand(*IMG_HW) > 0.5).astype(np.uint8),
        }

    return {"anchor": view(), "query": view(), "prompt": prompt}


@pytest.fixture(scope="module")
def engine():
    from oryon_tpu.models.oryon import tiny_oryon
    from oryon_tpu.utils.initshape import init_by_shape
    from oryon_tpu.infer import OryonPredictor

    import jax.numpy as jnp
    model = tiny_oryon()
    rgb = jnp.zeros((1, *IMG_HW, 3), jnp.float32)
    ids = jnp.array(_fake_tokenize("x")[None])
    params = init_by_shape(model, jax.random.PRNGKey(0), rgb, rgb, ids)
    # icp_refine pinned OFF: the serving default (on since round 5) would
    # add the 1024-pt x 48-iter refine program to every engine compile in
    # this module (minutes each on the 1-core CPU host); ICP plumbing has
    # its own dedicated cheap test below.
    return OryonPredictor(model, params, batch_size=2, img_size=IMG_HW,
                          depth_hw=DEPTH_HW, solver="ransac",
                          n_corrs=64, tokenize_fn=_fake_tokenize,
                          icp_refine=False)


def test_predict_batches_and_pads(engine):
    rs = np.random.RandomState(0)
    reqs = [_request(rs, p) for p in ("mug", "bottle", "mug")]  # 2 chunks
    results = engine.predict(reqs)
    assert len(results) == 3
    for res, req in zip(results, reqs):
        T = np.asarray(res["pose"])
        assert T.shape == (4, 4) and np.isfinite(T).all()
        # rigid transform: orthonormal rotation block, last row fixed
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
        np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)
        assert isinstance(res["n_corrs"], int)
        assert res["prompt"] == req["prompt"]
    # text cache memoizes per distinct prompt
    assert set(engine._text_cache) == {"mug", "bottle"}


def test_predict_icp_refine_plumbed(engine):
    """icp_refine=True builds a pipeline whose poses stay valid rigid
    transforms (the refine stage runs inside the jitted batch program;
    BASELINE.md round-5 measures its accuracy win on the full model)."""
    from oryon_tpu.infer import OryonPredictor
    icp_engine = OryonPredictor(
        engine.model, engine.params, batch_size=2, img_size=IMG_HW,
        depth_hw=DEPTH_HW, solver="ransac", n_corrs=64,
        tokenize_fn=_fake_tokenize,
        icp_refine=True, icp_points=64, icp_iters=4, icp_trim=0.7)
    assert icp_engine._pipe is not None
    rs = np.random.RandomState(2)
    res = icp_engine.predict([_request(rs)])[0]
    T = np.asarray(res["pose"])
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-6)


def test_predict_masks_and_shape_guard(engine):
    rs = np.random.RandomState(1)
    res = engine.predict([_request(rs)], return_masks=True)[0]
    assert res["mask_a"].dtype == np.uint8
    assert res["mask_a"].shape == res["mask_q"].shape
    bad = _request(rs)
    bad["anchor"]["depth"] = np.zeros((32, 32), np.float32)
    with pytest.raises(ValueError, match="depth_hw"):
        engine.predict([bad])


def test_predict_mesh_data_parallel_matches_single_device(engine):
    """Serving over an 8-device data mesh == single-device serving.

    Multi-chip serving (OryonPredictor(mesh=...) / from_config auto-mesh)
    shards each request batch over the data axis with replicated params;
    DP inference has no cross-pair state, so results must agree."""
    from oryon_tpu.infer import OryonPredictor
    from oryon_tpu.parallel import make_mesh

    mesh = make_mesh(len(jax.devices()), 1)
    B = len(jax.devices())
    kw = dict(batch_size=B, img_size=IMG_HW, depth_hw=DEPTH_HW,
              solver="ransac", n_corrs=64, tokenize_fn=_fake_tokenize,
              icp_refine=False)  # see engine fixture
    sharded = OryonPredictor(engine.model, engine.params, mesh=mesh, **kw)
    # same batch size, no mesh: identical chunking AND identical per-chunk
    # RNG stream, so a sharding bug (e.g. wrong batch axis in the solver
    # path) cannot hide behind chunk-RNG differences — poses must match.
    unsharded = OryonPredictor(engine.model, engine.params, mesh=None, **kw)
    rs = np.random.RandomState(4)
    reqs = [_request(rs, "mug") for _ in range(B)]
    got = sharded.predict(reqs, return_masks=True)
    want = unsharded.predict(reqs, return_masks=True)
    assert len(got) == len(want) == B
    for g, w in zip(got, want):
        T = np.asarray(g["pose"])
        assert T.shape == (4, 4) and np.isfinite(T).all()
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-3)
        assert g["detection_valid"] == w["detection_valid"]
        assert g["n_corrs"] == w["n_corrs"]
        # the DENSE outputs pin the sharding contract exactly: a wrong
        # batch axis anywhere in the program scrambles per-sample masks
        np.testing.assert_array_equal(g["mask_a"], w["mask_a"])
        np.testing.assert_array_equal(g["mask_q"], w["mask_q"])
        # poses: the sharded and unsharded programs are two separate XLA
        # compilations; in a warm pytest process their float results can
        # differ by ulps, and RANSAC's argmax over ~257 near-tied
        # hypothesis scores amplifies one flipped winner into a visibly
        # different (but equally valid) pose on these random tiny inputs
        # (observed in-suite 2026-08-20; both runs pass standalone with
        # bit-identical poses).  Assert agreement at solver-chaos scale
        # rather than bitwise.
        Tw = np.asarray(w["pose"])
        dR = np.degrees(np.arccos(np.clip(
            (np.trace(R @ Tw[:3, :3].T) - 1) / 2, -1, 1)))
        assert dR < 45.0, dR
        assert np.linalg.norm(T[:3, 3] - Tw[:3, 3]) < 0.5
    # chunked engine (B=2 -> 4 chunks) still agrees on the deterministic
    # forward (masks -> detection gate)
    want2 = engine.predict(reqs)
    assert ([g["detection_valid"] for g in got]
            == [w["detection_valid"] for w in want2])


def test_parse_camera_forms(tmp_path):
    from oryon_tpu.infer import parse_camera

    want = CAM
    np.testing.assert_allclose(parse_camera(want), want)
    np.testing.assert_allclose(parse_camera("60,60,32,24"), want)
    np.testing.assert_allclose(
        parse_camera({"fx": 60, "fy": 60, "cx": 32, "cy": 24}), want)
    j = tmp_path / "cam.json"
    j.write_text(json.dumps({"K": want.tolist()}))
    np.testing.assert_allclose(parse_camera(str(j)), want)
    t = tmp_path / "cam.txt"
    t.write_text(" ".join(str(v) for v in want))
    np.testing.assert_allclose(parse_camera(str(t)), want)


def _write_pair_files(tmp_path, rs, stem):
    from PIL import Image

    paths = {}
    for side in ("a", "q"):
        rgb = (rs.rand(*IMG_HW, 3) * 255).astype(np.uint8)
        depth = (rs.rand(*DEPTH_HW) * 300 + 600).astype(np.uint16)
        rp = tmp_path / f"{stem}_{side}.png"
        dp = tmp_path / f"{stem}_{side}_depth.png"
        Image.fromarray(rgb).save(rp)
        Image.fromarray(depth).save(dp)
        paths[side] = (str(rp), str(dp))
    return paths


def test_run_infer_cli_single_pair(tmp_path, capsys):
    import run_infer

    rs = np.random.RandomState(2)
    paths = _write_pair_files(tmp_path, rs, "pair0")
    out = tmp_path / "pose.json"
    run_infer.main([
        "--anchor-rgb", paths["a"][0], "--anchor-depth", paths["a"][1],
        "--query-rgb", paths["q"][0], "--query-depth", paths["q"][1],
        "--camera", "60,60,32,24", "--prompt", "mug",
        "model.size=small", f"dataset.img_size=[{IMG_HW[0]},{IMG_HW[1]}]",
        "test.solver=ransac", "test.n_corrs=64",
        f"exp_root={tmp_path}", "exp_name=infer_smoke", "eval.ckpt=",
        f"out={out}",
    ])
    lines = [json.loads(ln) for ln in open(out) if ln.strip()]
    assert len(lines) == 1
    T = np.asarray(lines[0]["pose"])
    assert T.shape == (4, 4) and np.isfinite(T).all()
    assert lines[0]["prompt"] == "mug" and "n_corrs" in lines[0]


def test_run_infer_cli_requests_jsonl(tmp_path, capsys):
    import run_infer

    rs = np.random.RandomState(3)
    req_file = tmp_path / "reqs.jsonl"
    with open(req_file, "w") as f:
        for i in range(3):
            paths = _write_pair_files(tmp_path, rs, f"pair{i}")
            f.write(json.dumps({
                "anchor": {"rgb": paths["a"][0], "depth": paths["a"][1]},
                "query": {"rgb": paths["q"][0], "depth": paths["q"][1]},
                "camera": "60,60,32,24",
                "prompt": "bottle" if i else "mug",
                "id": f"req{i}",
            }) + "\n")
    run_infer.main([
        "--requests", str(req_file),
        "model.size=small", f"dataset.img_size=[{IMG_HW[0]},{IMG_HW[1]}]",
        "test.solver=ransac", "test.n_corrs=64", "dataset.batch_size=2",
        f"exp_root={tmp_path}", "exp_name=infer_smoke2", "eval.ckpt=",
    ])
    out_lines = [ln for ln in capsys.readouterr().out.splitlines()
                 if ln.startswith("{")]
    results = [json.loads(ln) for ln in out_lines]
    assert [r["id"] for r in results] == ["req0", "req1", "req2"]
    for r in results:
        assert np.asarray(r["pose"]).shape == (4, 4)
