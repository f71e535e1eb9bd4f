#!/usr/bin/env python
"""Offline metric recomputation from a prediction CSV.

The reference's double-entry scoring tool (reference:
scripts/evaluation/compute_metrics.py:50-131): rebuild the dataset split,
re-register every CSV row through the evaluator, emit JSON + LaTeX.  Because
the CSV format is byte-compatible (pipeline.py:490-497), this scorer and the
reference's can cross-score each other's predictions.

Usage:
    python scripts/compute_metrics.py <pred.csv> dataset.root=data \
        dataset.test.name=nocs dataset.test.split=cross_scene_test
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_csv(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 5:
                continue
            id_a, id_q, pose_str, iou_a, iou_q = parts[:5]
            pose = np.eye(4, dtype=np.float32)
            vals = [float(v) for v in pose_str.split(" ")]
            pose[:3, :] = np.asarray(vals, np.float32).reshape(3, 4)
            rows.append((id_a, id_q, pose, float(iou_a), float(iou_q)))
    return rows


def main(argv):
    csv_path = argv[0]
    overrides = [a for a in argv[1:] if "=" in a]
    from oryon_tpu.config import load_config
    cfg = load_config(None, overrides)

    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.eval.evaluator import Evaluator
    from oryon_tpu.models.tokenizer import ClipTokenizer

    root = os.path.join(cfg.dataset.root, cfg.dataset.test.name)
    ds = PairDataset(pick_reader(cfg.dataset.test.name)(root),
                     cfg.dataset.test.split, ClipTokenizer(),
                     max_corrs=cfg.dataset.max_corrs,
                     img_size=cfg.dataset.img_size)

    # index split instances by their anchor/query id pair
    by_key = {}
    for i, (sa, ia, sq, iq, cat_id, obj) in enumerate(ds.instances):
        obj_key = obj if ds.reader.name == "nocs" else int(cat_id)
        by_key[f"{sa} {ia} {obj_key}|{sq} {iq} {obj_key}"] = i

    ev = Evaluator(cfg.exp_tag, compute_vsd=cfg.compute_vsd)
    ev.add_object_info(ds.reader.object_info())
    ev.init_test()

    preds = parse_csv(csv_path)
    n_missing = 0
    for id_a, id_q, pred_rel, iou_a, iou_q in preds:
        key = f"{id_a}|{id_q}"
        if key not in by_key:
            n_missing += 1
            continue
        idx = by_key[key]
        sa, ia, sq, iq, cat_id, obj = ds.instances[idx]
        obj_key = obj if ds.reader.name == "nocs" else int(cat_id)
        item_a = ds.reader.get_item(sa, ia, obj_key)
        item_q = ds.reader.get_item(sq, iq, obj_key)
        if np.count_nonzero(pred_rel[:3, :]) <= 1:
            ev.register_test_failure(iou_a, iou_q, cls_id=obj_key,
                                     instance_id=f"{sa}_{ia}_{sq}_{iq}_{obj}")
            continue
        pred_q = pred_rel @ np.asarray(item_a["pose"], np.float32)
        ev.register_test(
            iou_a, iou_q, gt_pose=np.asarray(item_q["pose"], np.float32),
            pred_pose=pred_q, pred_pose_rel=pred_rel,
            camera=np.asarray(item_q["camera"], np.float32),  # query view K (matches pipeline._register_batch)
            depth=np.asarray(item_q["depth"], np.float32)
            if cfg.compute_vsd else None,
            cls_id=obj_key, instance_id=f"{sa}_{ia}_{sq}_{iq}_{obj}")

    out_json = os.path.splitext(csv_path)[0] + "_recomputed.json"
    with open(out_json, "w") as f:
        ev.save(f)
    for row in ev.test_summary():
        print(row)
    print(ev.get_latex_str())
    if n_missing:
        print(f"WARNING: {n_missing} CSV rows not found in the split")
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main(sys.argv[1:])
