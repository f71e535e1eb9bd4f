#!/usr/bin/env python
"""Production-scale synthetic ShapeNet6D-format dataset generator.

Materializes an on-disk tree in the exact layout Shapenet6DReader consumes
(reference utils/data/shapenet.py formats), so the REAL training/eval CLIs
(run_train.py / run_test.py) drive the full reader -> augment -> loader ->
collate path at reference scale (20000 train pairs, B=32 — reference
configs/config.yaml:15-17) without the real ShapeNetSem assets (zero egress).

Each object is a textured smooth depth patch (canonical surface defined in
its view-0 camera frame); V views per object are rendered by rigidly moving
the surface and z-buffer-splatting depth + texture.  GT relative poses are
exact by construction and GT pixel correspondences are computed analytically
from canonical-point identity with the same co-visibility rule the reference
pair builder uses (2 mm depth agreement, reference make_nocs_test.py:47-86).

Also writes per-object models (points + grid mesh) under models/ so the val
split supports the full BOP evaluation (ADD/MSSD/MSPD/VSD) via run_test.py.

Usage:
    python scripts/make_synthetic_sn6d.py out=data_synth n_objects=2500 \
        views=4 pairs_per_obj=8 n_val_objects=60 val_pairs_per_obj=4
"""
from __future__ import annotations

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from os.path import join

import numpy as np

K640 = np.array([[591.0125, 0, 322.525],
                 [0, 590.16775, 244.11084],
                 [0, 0, 1]], np.float64)


def cam_for(hw):
    """Intrinsics for a frame size, scaled from the 480x640 REAL275 K."""
    oh, ow = hw
    s = np.diag([ow / 640.0, oh / 480.0, 1.0])
    return s @ K640


# (OH, OW, K) per split: train frames are written at model input size so
# the 1-core host loader is not decode/resize-bound at B=32 (~4.4 s/batch
# at 480x640 vs ~0.4 s at 224 — profiled); val keeps the full 480x640 frame
# because VSD renders/compares at the original depth resolution.
TRAIN_HW = (224, 224)
VAL_HW = (480, 640)
CATEGORIES = [
    ("chair", "chair,seat"), ("table", "table,desk"), ("mug", "mug,cup"),
    ("bottle", "bottle,flask"), ("bowl", "bowl,dish"), ("camera", "camera"),
    ("laptop", "laptop,notebook computer"), ("lamp", "lamp,light"),
    ("can", "can,tin"), ("phone", "phone,telephone"), ("clock", "clock"),
    ("vase", "vase,jar"), ("basket", "basket"), ("helmet", "helmet"),
    ("guitar", "guitar"), ("knife", "knife,blade"), ("pot", "pot,planter"),
    ("book", "book"), ("shoe", "shoe,boot"), ("toy", "toy,figurine"),
]


# the 80 public CLIP ImageNet prompt templates the reference pipeline uses
# (reference datasets.py templates.json; openai/CLIP prompts notebook)
from oryon_tpu.data.templates import CLIP_TEMPLATES as TEMPLATES  # noqa: E402


def _random_pose(rs, max_angle=0.45, max_shift=0.07):
    axis = rs.randn(3)
    axis /= np.linalg.norm(axis)
    ang = rs.uniform(-max_angle, max_angle)
    Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rs.uniform(-max_shift, max_shift, 3)
    return T


def make_canonical(rs, hw, K):
    """Canonical textured surface (points mm in view-0 camera frame)."""
    OH, OW = hw
    oh = rs.randint(int(OH * 0.19), int(OH * 0.32))
    ow = rs.randint(int(OW * 0.14), int(OW * 0.24))
    oy = rs.randint(OH // 8, OH - oh - OH // 8)
    ox = rs.randint(OW // 8, OW - ow - OW // 8)
    ry = np.arange(oh, dtype=np.float64)[:, None]
    rx = np.arange(ow, dtype=np.float64)[None, :]
    z0 = rs.uniform(620.0, 780.0)
    zs = (z0 + rs.uniform(15, 30) * np.sin(ry / rs.uniform(18, 30))
          + rs.uniform(12, 25) * np.cos(rx / rs.uniform(20, 35))
          + rs.uniform(0.2, 0.5) * ry + rs.uniform(0.2, 0.5) * rx)
    ys, xs = np.mgrid[oy:oy + oh, ox:ox + ow]
    ys, xs, z = ys.ravel(), xs.ravel(), zs.ravel()
    pts = np.stack([(xs - K[0, 2]) * z / K[0, 0],
                    (ys - K[1, 2]) * z / K[1, 1], z], 1)  # mm
    tex = rs.rand(oh * ow, 3) * 0.7 + 0.25
    # grid for the val-split render mesh (stride keeps triangle footprints
    # under the tile-8 rasterizer guard: ~4px edges at these depths)
    grid_shape = (oh, ow)
    return pts, tex, grid_shape


def render_view(pts_mm, tex, T, rs, hw, K):
    """Rigid-move canonical surface, z-buffer splat depth+texture."""
    OH, OW = hw
    p = pts_mm / 1000.0 @ T[:3, :3].T + T[:3, 3]
    z_mm = p[:, 2] * 1000.0
    u = p[:, 0] / p[:, 2] * K[0, 0] + K[0, 2]
    v = p[:, 1] / p[:, 2] * K[1, 1] + K[1, 2]
    in_frame = (u >= 1) & (u < OW - 1) & (v >= 1) & (v < OH - 1) & (z_mm > 1)
    ui = np.clip(np.round(u).astype(int), 0, OW - 1)
    vi = np.clip(np.round(v).astype(int), 0, OH - 1)

    depth = np.full((OH, OW), np.inf, np.float32)
    mask = np.zeros((OH, OW), np.uint8)
    rgb = (rs.rand(OH, OW, 3) * 0.35).astype(np.float32)
    uin, vin, zin = ui[in_frame], vi[in_frame], z_mm[in_frame]
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            vv = np.clip(vin + dv, 0, OH - 1)
            uu = np.clip(uin + du, 0, OW - 1)
            np.minimum.at(depth, (vv, uu), zin.astype(np.float32))
            mask[vv, uu] = 1
    order = np.argsort(-zin)
    rgb[vin[order], uin[order]] = tex[in_frame][order]
    depth = np.where(np.isinf(depth), 0.0, depth)
    # per-canonical-point visibility + pixel location in this view
    vis = in_frame & (np.abs(depth[vi, ui] - z_mm) < 2.0)
    return depth, mask, rgb, vi, ui, vis, in_frame.mean()


def save_view(root, img_id, depth, mask, rgb, pose, cls_id, K):
    from PIL import Image
    Image.fromarray(np.clip(rgb * 255, 0, 255).astype(np.uint8)).save(
        join(root, "raw_data", "rgb", f"{img_id:06d}.jpg"), quality=92)
    Image.fromarray(mask).save(join(root, "raw_data", "mask", f"{img_id:06d}.png"))
    Image.fromarray(np.clip(depth, 0, 65535).astype(np.uint16)).save(
        join(root, "raw_data", "depth", f"{img_id:06d}.png"))
    return {"K": K.copy(), "obj_info_lst": [{}, {"cls_id": cls_id,
                                                 "RT": pose[:3, :].copy()}]}


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out = kv.get("out", "data_synth")
    n_objects = int(kv.get("n_objects", "2500"))
    views = int(kv.get("views", "4"))
    pairs_per_obj = int(kv.get("pairs_per_obj", "8"))
    n_val_objects = int(kv.get("n_val_objects", "60"))
    val_pairs_per_obj = int(kv.get("val_pairs_per_obj", "4"))
    seed = int(kv.get("seed", "0"))
    max_corrs = int(kv.get("max_corrs", "2000"))

    root = join(out, "shapenet6d")
    for sub in ("rgb", "mask", "depth"):
        os.makedirs(join(root, "raw_data", sub), exist_ok=True)
    os.makedirs(join(root, "models"), exist_ok=True)

    rs = np.random.RandomState(seed)
    annots_gt = {}
    meta_lines = ['fullId,x,category,wnlemmas,name,z\n']
    objnm2clsid = {}
    splits = {"train": ([], {}), "val": ([], {})}
    img_id = 0
    total = n_objects + n_val_objects

    for oid in range(total):
        split = "train" if oid < n_objects else "val"
        cat, lemmas = CATEGORIES[oid % len(CATEGORIES)]
        name = f"obj{oid:05d}"
        meta_lines.append(f'wss.{name},0,{cat},"{lemmas}",{name}_model,0\n')
        objnm2clsid[f"{name}_0"] = oid

        hw = TRAIN_HW if split == "train" else VAL_HW
        Kc = cam_for(hw)
        pts, tex, grid = make_canonical(rs, hw, Kc)
        view_data = []
        for vI in range(views):
            for attempt in range(25):
                T = (np.eye(4) if vI == 0 else
                     _random_pose(rs, 0.45 / (1 + attempt * 0.2),
                                  0.07 / (1 + attempt * 0.3)))
                depth, mask, rgb, vi, ui, vis, frac = render_view(
                    pts, tex, T, rs, hw, Kc)
                if frac > 0.93:
                    break
            annots_gt[img_id] = save_view(root, img_id, depth, mask, rgb, T,
                                          oid, Kc)
            view_data.append((img_id, T, vi, ui, vis))
            img_id += 1

        # val-split object model: subsampled points (mm, canonical frame)
        # + stride-4 grid mesh for VSD renders
        if split == "val":
            oh, ow = grid
            sub = rs.choice(len(pts), min(512, len(pts)), replace=False)
            s = 4
            gy, gx = np.mgrid[0:oh:s, 0:ow:s]
            idx2d = (gy * ow + gx)
            Vg = pts[idx2d.ravel()]
            ny, nx = idx2d.shape
            faces = []
            for yy in range(ny - 1):
                for xx in range(nx - 1):
                    a = yy * nx + xx
                    faces += [[a, a + 1, a + nx], [a + 1, a + nx + 1, a + nx]]
            d = float(np.linalg.norm(pts.max(0) - pts.min(0)))
            np.savez_compressed(join(root, "models", f"obj_{oid:05d}.npz"),
                                pts=pts[sub].astype(np.float32),
                                mesh_vertices=Vg.astype(np.float32),
                                mesh_faces=np.asarray(faces, np.int32),
                                diameter=np.float32(d))

        # pairs among this object's views (ordered, no self-pairs)
        lines, annots = splits[split]
        n_pairs = pairs_per_obj if split == "train" else val_pairs_per_obj
        combos = [(i, j) for i in range(views) for j in range(views) if i != j]
        pick = rs.choice(len(combos), min(n_pairs, len(combos)), replace=False)
        for ci in pick:
            i, j = combos[ci]
            (ia, Ta, va, ua, visa) = view_data[i]
            (iq, Tq, vq, uq, visq) = view_data[j]
            co = visa & visq
            idx = np.nonzero(co)[0]
            if len(idx) < 100:
                continue
            if len(idx) > max_corrs:
                idx = idx[rs.choice(len(idx), max_corrs, replace=False)]
            corrs = np.stack([va[idx], ua[idx], vq[idx], uq[idx]], 1).astype(np.int32)
            rel = Tq @ np.linalg.inv(Ta)
            rel_mm = rel.copy()
            rel_mm[:3, 3] *= 1000.0
            key = f"0_{ia}_0_{iq}_{oid}_{oid}"
            annots[key] = {"gt": rel_mm.astype(np.float32), "corrs": corrs}
            lines.append(f"synth, 0 {ia}, 0 {iq}, {oid} {oid}\n")
        if (oid + 1) % 100 == 0:
            print(f"{oid + 1}/{total} objects ({img_id} images)", flush=True)

    with open(join(root, "templates.json"), "w") as f:
        json.dump(TEMPLATES, f)
    with open(join(root, "scene_gt.pkl"), "wb") as f:
        pickle.dump(annots_gt, f)
    with open(join(root, "metadata.csv"), "w") as f:
        f.writelines(meta_lines)
    with open(join(root, "objnm2clsid.json"), "w") as f:
        json.dump(objnm2clsid, f)
    for split, (lines, annots) in splits.items():
        d = join(root, "fixed_split", split)
        os.makedirs(d, exist_ok=True)
        with open(join(d, "instance_list.txt"), "w") as f:
            f.writelines(lines)
        with open(join(d, "annots.pkl"), "wb") as f:
            pickle.dump(annots, f)
        with open(join(d, "tracked.txt"), "w") as f:
            f.writelines(lines[: min(3, len(lines))])
        print(f"{split}: {len(lines)} pairs")
    print(f"wrote {img_id} images under {root}")


if __name__ == "__main__":
    main(sys.argv[1:])
