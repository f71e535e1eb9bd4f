#!/usr/bin/env python
"""Classical SIFT baseline through the same mask/solver/evaluator harness.

Regression anchor replacing reference scripts/evaluation/sift_nocs.py /
sift_toyl.py: SIFT keypoints inside the oracle masks, ratio-test descriptor
matching, depth lift, the framework's parallel RANSAC, full evaluator.

Usage:
    python scripts/sift_baseline.py dataset.root=data dataset.test.name=nocs \
        dataset.test.split=cross_scene_test
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sift_match(rgb_a, mask_a, rgb_q, mask_q, ratio=0.8, max_corrs=500):
    """Masked SIFT keypoints + BF ratio-test matching -> [N, 4] (y1,x1,y2,x2)."""
    import cv2

    sift = cv2.SIFT_create()
    g_a = cv2.cvtColor((np.clip(rgb_a, 0, 1) * 255).astype(np.uint8),
                       cv2.COLOR_RGB2GRAY)
    g_q = cv2.cvtColor((np.clip(rgb_q, 0, 1) * 255).astype(np.uint8),
                       cv2.COLOR_RGB2GRAY)
    kp_a, des_a = sift.detectAndCompute(g_a, (mask_a > 0).astype(np.uint8))
    kp_q, des_q = sift.detectAndCompute(g_q, (mask_q > 0).astype(np.uint8))
    if des_a is None or des_q is None or len(kp_a) < 4 or len(kp_q) < 4:
        return np.zeros((0, 4), np.int32)
    bf = cv2.BFMatcher()
    matches = bf.knnMatch(des_a, des_q, k=2)
    rows = []
    for pair in matches:
        if len(pair) == 2 and pair[0].distance < ratio * pair[1].distance:
            m = pair[0]
            xa, ya = kp_a[m.queryIdx].pt
            xq, yq = kp_q[m.trainIdx].pt
            rows.append([ya, xa, yq, xq])
    if not rows:
        return np.zeros((0, 4), np.int32)
    return np.asarray(rows[:max_corrs]).round().astype(np.int32)


def main(argv):
    overrides = [a for a in argv if "=" in a]
    from oryon_tpu.config import load_config
    cfg = load_config(None, overrides)

    import jax
    import jax.numpy as jnp
    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.eval.evaluator import Evaluator
    from oryon_tpu.geometry.kabsch import ransac_kabsch
    from oryon_tpu.geometry.pcd import lift_pcd_at
    from oryon_tpu.models.tokenizer import ClipTokenizer

    root = os.path.join(cfg.dataset.root, cfg.dataset.test.name)
    reader = pick_reader(cfg.dataset.test.name)(root)
    ds = PairDataset(reader, cfg.dataset.test.split, ClipTokenizer(),
                     max_corrs=cfg.dataset.max_corrs,
                     img_size=cfg.dataset.img_size)
    ev = Evaluator("SIFT", compute_vsd=cfg.compute_vsd,
                   vsd_window=cfg.eval.vsd_window)
    ev.add_object_info(reader.object_info())
    ev.init_test()

    key = jax.random.PRNGKey(0)
    for i in range(len(ds)):
        sa, ia, sq, iq, cat_id, obj = ds.instances[i]
        obj_key = obj if reader.name == "nocs" else int(cat_id)
        item_a = reader.get_item(sa, ia, obj_key)
        item_q = reader.get_item(sq, iq, obj_key)
        iid = f"{sa}_{ia}_{sq}_{iq}_{obj}"
        corrs = sift_match(item_a["rgb"], item_a["mask"], item_q["rgb"],
                           item_q["mask"], max_corrs=cfg.dataset.max_corrs)
        if corrs.shape[0] < 4:
            ev.register_test_failure(1.0, 1.0, cls_id=obj_key, instance_id=iid)
            continue
        da = jnp.asarray(item_a["depth"], jnp.float32)
        dq = jnp.asarray(item_q["depth"], jnp.float32)
        cam_a = jnp.asarray(np.asarray(item_a["camera"]).reshape(9), jnp.float32)
        cam_q = jnp.asarray(np.asarray(item_q["camera"]).reshape(9), jnp.float32)
        pa = lift_pcd_at(da, cam_a, jnp.asarray(corrs[:, :2])) / 1000.0
        pq = lift_pcd_at(dq, cam_q, jnp.asarray(corrs[:, 2:])) / 1000.0
        w = ((pa[:, 2] > 0) & (pq[:, 2] > 0)).astype(jnp.float32)
        key, sub = jax.random.split(key)
        T, n_inl = ransac_kabsch(sub, pa, pq, w, match_err=0.01)
        pred_rel = np.asarray(T)
        pred_q = pred_rel @ np.asarray(item_a["pose"], np.float32)
        ev.register_test(1.0, 1.0, gt_pose=np.asarray(item_q["pose"], np.float32),
                         pred_pose=pred_q, pred_pose_rel=pred_rel,
                         camera=np.asarray(item_q["camera"], np.float32),
                         depth=np.asarray(item_q["depth"], np.float32)
                         if cfg.compute_vsd else None,
                         cls_id=obj_key, instance_id=iid)

    for row in ev.test_summary():
        print(row)
    print(ev.get_latex_str())
    means = ev.get_means()
    print("[sift] " + " ".join(
        f"{k}={v:.3f}" for k, v in sorted(means.items())
        if isinstance(v, float)), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
