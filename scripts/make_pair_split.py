#!/usr/bin/env python
"""Fixed-split pair construction (dataset builder).

Rebuilds reference scripts/data/make_nocs_test.py:87-264: enumerate
(scene, image, object) instances, sample same-object cross-scene pairs,
compute the GT relative pose ``pose_q @ inv(pose_a)``, generate GT pixel
correspondences by 3D nearest-neighbor matching (2 mm) between the lifted
masked clouds, reject pairs with < 100 correspondences, and write
``fixed_split/<name>/instance_list.txt`` + ``annots.pkl``.

The 3D-NN matching runs as one MXU distance matrix per pair (jnp) instead of
the reference's open3d KD-tree loop.

Usage:
    python scripts/make_pair_split.py dataset.root=data dataset.test.name=nocs \
        split_name=my_test n_pairs=2000 pair_mode=cross_scene
"""
from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from os.path import join

import numpy as np


def pcd_correspondences(pa, yx_a, pq, yx_q, rel_pose, th_mm=2.0,
                        max_corrs=10000, subsample=20000, seed=0):
    """3D-NN matching of transformed anchor cloud into query cloud
    (reference make_nocs_test.py:47-86): returns [N, 4] (y1, x1, y2, x2)."""
    import jax.numpy as jnp
    from oryon_tpu.geometry.pcd import sq_dist_matrix

    rs = np.random.RandomState(seed)
    if len(pa) > subsample:
        ia = rs.choice(len(pa), subsample, replace=False)
        pa, yx_a = pa[ia], yx_a[ia]
    if len(pq) > subsample:
        iq = rs.choice(len(pq), subsample, replace=False)
        pq, yx_q = pq[iq], yx_q[iq]
    warped = pa @ rel_pose[:3, :3].T + rel_pose[:3, 3]
    # chunked NN to bound memory
    rows = []
    CH = 4096
    for s in range(0, len(warped), CH):
        d2 = np.asarray(sq_dist_matrix(jnp.asarray(warped[s:s + CH]),
                                       jnp.asarray(pq)))
        nn = d2.argmin(1)
        dist = np.sqrt(d2[np.arange(len(nn)), nn])
        good = dist < th_mm
        rows.append(np.concatenate([yx_a[s:s + CH][good],
                                    yx_q[nn[good]]], axis=1))
    corrs = np.concatenate(rows, axis=0)
    if len(corrs) > max_corrs:
        corrs = corrs[rs.choice(len(corrs), max_corrs, replace=False)]
    return corrs.astype(np.int32)


def lift_masked(item):
    """Masked RGBD -> (points mm, yx pixels)."""
    depth = np.asarray(item["depth"], np.float64)
    mask = np.asarray(item["mask"]) > 0
    K = np.asarray(item["camera"], np.float64).reshape(3, 3)
    ys, xs = np.nonzero(mask & (depth > 0))
    z = depth[ys, xs]
    pts = np.stack([(xs - K[0, 2]) * z / K[0, 0],
                    (ys - K[1, 2]) * z / K[1, 1], z], 1)
    return pts, np.stack([ys, xs], 1)


def main(argv):
    # offline tool: ORYON_CPU=1 keeps the 3D-NN matmuls off the (possibly
    # busy) TPU — sitecustomize forces the axon platform otherwise
    if os.environ.get("ORYON_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    split_name = kv.pop("split_name", "custom_split")
    n_pairs = int(kv.pop("n_pairs", "2000"))
    pair_mode = kv.pop("pair_mode", "cross_scene")  # same_scene|cross_scene|any
    seed = int(kv.pop("seed", "0"))
    min_corrs = int(kv.pop("min_corrs", "100"))

    from oryon_tpu.config import load_config
    cfg = load_config(None, [f"{k}={v}" for k, v in kv.items()])

    from oryon_tpu.data.datasets import pick_reader
    name = cfg.dataset.test.name
    root = join(cfg.dataset.root, name)
    reader = pick_reader(name)(root)

    # enumerate instances: (scene, img, obj) from the reader's annotations
    rs = np.random.RandomState(seed)
    instances = []
    if name.startswith("nocs"):
        split_dir = join(root, "split/real_test")
        for scene_dir in sorted(os.listdir(split_dir)):
            scene_id = int(scene_dir.split("_")[1])
            for f in sorted(os.listdir(join(split_dir, scene_dir))):
                if not f.endswith("_meta.txt"):
                    continue
                img_id = int(f.split("_")[0])
                with open(join(split_dir, scene_dir, f)) as fm:
                    for line in fm:
                        _mid, cid, obj = line.split(" ")
                        instances.append((scene_id, img_id, int(cid),
                                          obj.strip()))
    else:
        for key_, objs in reader.annots.items():
            scene_id, img_id = (int(t) for t in key_.split("_"))
            for cid in objs:
                instances.append((scene_id, img_id, int(cid), cid))

    by_obj = {}
    for inst in instances:
        by_obj.setdefault(inst[3], []).append(inst)

    out_dir = join(root, "fixed_split", split_name)
    os.makedirs(out_dir, exist_ok=True)
    lines, annots = [], {}
    attempts = 0
    while len(lines) < n_pairs and attempts < n_pairs * 20:
        attempts += 1
        obj = rs.choice(list(by_obj.keys()))
        cands = by_obj[obj]
        if len(cands) < 2:
            continue
        a, q = [cands[i] for i in rs.choice(len(cands), 2, replace=False)]
        if pair_mode == "cross_scene" and a[0] == q[0]:
            continue
        if pair_mode == "same_scene" and a[0] != q[0]:
            continue
        try:
            item_a = reader.get_item(a[0], a[1], a[3] if name.startswith("nocs") else a[2])
            item_q = reader.get_item(q[0], q[1], q[3] if name.startswith("nocs") else q[2])
        except (AssertionError, FileNotFoundError, KeyError):
            continue
        pose_a = np.asarray(item_a["pose"], np.float64).copy()
        pose_q = np.asarray(item_q["pose"], np.float64).copy()
        rel = pose_q @ np.linalg.inv(pose_a)
        rel_mm = rel.copy()
        rel_mm[:3, 3] *= 1000.0
        pa, yx_a = lift_masked(item_a)
        pq, yx_q = lift_masked(item_q)
        if len(pa) < min_corrs or len(pq) < min_corrs:
            continue
        corrs = pcd_correspondences(pa, yx_a, pq, yx_q, rel_mm, seed=seed)
        if len(corrs) < min_corrs:
            continue
        key_str = "_".join(str(e) for e in (a[0], a[1], q[0], q[1], a[2], a[3]))
        annots[key_str] = {"gt": rel_mm.astype(np.float32), "corrs": corrs}
        lines.append(f"{pair_mode}, {a[0]} {a[1]}, {q[0]} {q[1]}, {a[2]} {a[3]}\n")
        if len(lines) % 50 == 0:
            print(f"{len(lines)}/{n_pairs} pairs")

    with open(join(out_dir, "instance_list.txt"), "w") as f:
        f.writelines(lines)
    with open(join(out_dir, "annots.pkl"), "wb") as f:
        pickle.dump(annots, f)
    with open(join(out_dir, "tracked.txt"), "w") as f:
        f.writelines(lines[: min(5, len(lines))])
    print(f"wrote {len(lines)} pairs to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
