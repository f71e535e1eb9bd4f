"""Prediction-saving hooks: masks as PNG, featmaps as npz.

Reference hooks test.only_save_masks / only_save_featmaps
(configs/config.yaml:61-62) and save_pred_masks (datasets.py:534-544).
"""
from __future__ import annotations

import os

import numpy as np


def make_mask_saver(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)

    def hook(batch_idx, batch, out):
        from PIL import Image

        masks_a = np.asarray(out.mask_a).astype(np.uint8)
        masks_q = np.asarray(out.mask_q).astype(np.uint8)
        for i in range(masks_a.shape[0]):
            if batch.valid is not None and float(batch.valid[i]) == 0:
                continue
            iid = str(batch.instance_id[i]).replace(" ", "_")
            Image.fromarray(masks_a[i] * 255).save(
                os.path.join(out_dir, f"{iid}_mask_a.png"))
            Image.fromarray(masks_q[i] * 255).save(
                os.path.join(out_dir, f"{iid}_mask_q.png"))

    return hook


def make_featmap_saver(out_dir: str):
    os.makedirs(out_dir, exist_ok=True)

    def hook(batch_idx, batch, out):
        np.savez_compressed(
            os.path.join(out_dir, f"featmaps_{batch_idx:05d}.npz"),
            corrs=np.asarray(out.corrs),
            corr_valid=np.asarray(out.corr_valid),
            mask_a=np.asarray(out.mask_a), mask_q=np.asarray(out.mask_q),
            instance_id=np.asarray(batch.instance_id))

    return hook
