"""Offline-script tests: SIFT baseline + pair-split builder (reference
scripts/evaluation/sift_*.py and scripts/data/make_nocs_test.py)."""
import importlib.util as iu
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.getcwd())
from tests.test_data import nocs_root  # fixture reuse  # noqa: F401


def _load(name):
    spec = iu.spec_from_file_location(name, f"scripts/{name}.py")
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pcd_correspondences_exact_transform():
    """GT-correspondence generation (reference make_nocs_test.py:47-86):
    a cloud and its rigid transform must match 1:1 with correct yx rows."""
    mps = _load("make_pair_split")
    rs = np.random.RandomState(0)
    pa = rs.rand(300, 3) * 200
    flat_a = rs.choice(64 * 64, 300, replace=False)
    yx_a = np.stack([flat_a // 64, flat_a % 64], 1)
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    t = np.array([10.0, -5.0, 30.0])
    rel = np.eye(4)
    rel[:3, :3], rel[:3, 3] = R, t
    pq = pa @ R.T + t
    flat_q = rs.choice(64 * 64, 300, replace=False)
    yx_q = np.stack([flat_q // 64, flat_q % 64], 1)
    corrs = mps.pcd_correspondences(pa, yx_a, pq, yx_q, rel, th_mm=2.0)
    assert corrs.shape[0] == 300
    # every row maps yx_a[i] -> yx_q[i] (the NN is the transformed twin)
    lookup = {tuple(a): tuple(q) for a, q in zip(yx_a.tolist(), yx_q.tolist())}
    ok = sum(lookup.get(tuple(r[:2].tolist())) == tuple(r[2:].tolist())
             for r in corrs)
    assert ok == 300  # unique yx keys -> every row maps exactly


def test_make_pair_split_cli_writes_split(nocs_root, capsys):
    """Builder runs over the REAL275-format tree and writes the fixed-split
    files (the fixture's random depths yield no 2 mm 3D-NN matches, so the
    pair count may be zero — the format contract is what's under test)."""
    mps = _load("make_pair_split")
    mps.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "split_name=smoke_split", "n_pairs=4", "pair_mode=any",
        "min_corrs=1",
    ])
    out = capsys.readouterr().out
    assert "wrote" in out
    sp = os.path.join(nocs_root, "fixed_split", "smoke_split")
    assert os.path.exists(os.path.join(sp, "instance_list.txt"))
    with open(os.path.join(sp, "annots.pkl"), "rb") as f:
        annots = pickle.load(f)
    for v in annots.values():
        assert v["gt"].shape == (4, 4) and v["corrs"].shape[1] == 4


def test_sift_baseline_cli(nocs_root, capsys):
    """SIFT baseline runs the same mask/solver/evaluator harness end to end
    (reference scripts/evaluation/sift_nocs.py) and prints a summary."""
    sb = _load("sift_baseline")
    sb.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "dataset.test.split=test_split",
        "compute_vsd=false",
        "dataset.img_size=[56,56]",
    ])
    out = capsys.readouterr().out
    assert "SIFT" in out or "ADD" in out or "pairs" in out
