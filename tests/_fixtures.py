"""Shared on-disk dataset fixtures (REAL275/NOCS file formats).

``make_nocs_tree`` materializes the miniature dataset tree the data-layer
tests use (originally inline in tests/test_data.py); parameterizable so the
CLI multi-device tests can build wider splits (more pairs for an 8-way data
mesh) in fresh subprocesses.
"""
from __future__ import annotations

import json
import os
import pickle
from os.path import join

import numpy as np


def make_nocs_tree(root, rs=None, scenes=None, pairs=None, flat_depth=None):
    """Write a miniature REAL275-format dataset under ``root``.

    scenes: list of (scene, img) views to render (default: 3 views).
    pairs: list of ((sa, ia), (sq, iq)) anchor/query pairs for the fixed
    split (default: 2 pairs).  flat_depth: when set (mm), every view gets
    this constant depth instead of random — makes same-scene views
    3D-CONSISTENT (identical lifted clouds under the shared per-scene
    pose) so correspondence builders like scripts/make_pair_split.py can
    actually find matches on the fixture (asset-day drill).  Returns
    ``root``.
    """
    from PIL import Image

    rs = rs or np.random.RandomState(0)
    scenes = scenes or [(1, 0), (1, 1), (2, 0)]
    pairs = pairs or [((1, 0), (1, 1)), ((1, 0), (2, 0))]

    H, W = 60, 80
    obj_name = "mug_1"
    for scene, img in scenes:
        d = join(root, "split/real_test", f"scene_{scene}")
        os.makedirs(d, exist_ok=True)
        base = join(d, f"{img:04d}")
        rgb = (rs.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(base + "_color.png")
        mask = np.full((H, W), 255, np.uint8)
        mask[20:40, 30:50] = 7  # mask id 7
        Image.fromarray(mask).save(base + "_mask.png")
        if flat_depth is not None:
            depth = np.full((H, W), int(flat_depth), np.uint16)
        else:
            depth = (rs.rand(H, W) * 1000 + 500).astype(np.uint16)
        Image.fromarray(depth).save(base + "_depth.png")
        with open(base + "_meta.txt", "w") as f:
            f.write(f"7 3 {obj_name}\n")
        with open(base + "_detection.txt", "w") as f:
            f.write("7 30 20 20 20\n")

    os.makedirs(join(root, "gts", "real_test"), exist_ok=True)
    for scene, img in scenes:
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * scene, 0, 0.8]
        with open(join(root, "gts", "real_test",
                       f"results_real_test_{scene}_{img}.pkl"), "wb") as f:
            pickle.dump({"gt_RTs": np.array([pose])}, f)

    with open(join(root, "obj_names.json"), "w") as f:
        json.dump({obj_name: ["mug", "cup", "coffee mug"]}, f)
    with open(join(root, "templates.json"), "w") as f:
        json.dump(["a photo of a {}", "a picture of a {}",
                   "one {} in the scene"], f)

    # object model files
    od = join(root, "obj_models", "real_test")
    os.makedirs(od, exist_ok=True)
    V = np.array([[0, 0, 0], [0.05, 0, 0], [0, 0.05, 0], [0, 0, 0.05]])
    F = np.array([[1, 2, 3], [1, 2, 4], [1, 3, 4], [2, 3, 4]])
    np.savetxt(join(od, obj_name + "_vertices.txt"), V, fmt="%.6f")
    np.savetxt(join(od, obj_name + "_normals.txt"), V, fmt="%.6f")
    with open(join(od, obj_name + ".obj"), "w") as f:
        for v in V:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in F:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")
    with open(join(od, "models_info.json"), "w") as f:
        json.dump({obj_name: {"diameter": 86.6}}, f)

    # fixed split
    sp = join(root, "fixed_split", "test_split")
    os.makedirs(sp, exist_ok=True)
    annots = {}
    lines = []
    rel = np.eye(4)
    rel[:3, 3] = [100.0, 0, 0]  # mm
    for (sa, ia), (sq, iq) in pairs:
        lines.append(f"test, {sa} {ia}, {sq} {iq}, 3 {obj_name}\n")
        corrs = np.stack([
            rs.randint(20, 40, 40), rs.randint(30, 50, 40),
            rs.randint(20, 40, 40), rs.randint(30, 50, 40)], 1)
        annots[f"{sa}_{ia}_{sq}_{iq}_3_{obj_name}"] = {
            "gt": rel.copy(), "corrs": corrs}
    with open(join(sp, "instance_list.txt"), "w") as f:
        f.writelines(lines)
    with open(join(sp, "annots.pkl"), "wb") as f:
        pickle.dump(annots, f)
    return root
