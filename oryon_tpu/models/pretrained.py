"""Pretrained-weight assembly: load + convert + merge into the flax tree.

Runtime equivalent of the reference's weight plumbing:
  * OpenAI CLIP ViT-L/14@336 (reference models/vlm.py:19 clip.load)
  * torchvision Swin-B (reference net.py:46)
  * CATSeg checkpoint with the fusion/decoder key surgery
    (reference net.py:102-134: 'sem_seg_head.predictor.transformer' ->
    fusion, 'fusion.decoder' -> decoder.decoder, 'fusion.head' ->
    decoder.head, optional finetuned CLIP override)
  * PointDSC 3DMatch snapshot (reference utils/pointdsc/init.py:32-57)

Each asset is optional: missing files leave the randomly initialized subtree
in place and are reported, so the framework degrades to random weights
exactly like the tests run.
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from oryon_tpu.models import convert as C


def catseg_key_surgery(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference net.py:102-134 key remapping, done at convert time."""
    out = {}
    old_fusion = "sem_seg_head.predictor.transformer"
    old_clip = "sem_seg_head.predictor.clip_model"
    for k, v in sd.items():
        if k.startswith(old_fusion):
            nk = "fusion" + k[len(old_fusion):]
            if nk.startswith("fusion.decoder"):
                nk = "decoder.decoder" + nk[len("fusion.decoder"):]
            elif nk.startswith("fusion.head"):
                nk = "decoder.head" + nk[len("fusion.head"):]
            out[nk] = v
        elif k.startswith(old_clip):
            out["clip" + k[len(old_clip):]] = v
    return out


def _load_any(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return C.load_npz_state(path)
    return C.load_torch_state(path)


def load_pretrained_params(cfg, params) -> Tuple[Dict, List[str]]:
    """Merge every available converted checkpoint into ``params``.

    Returns (params, report). ``params`` must be the full OryonModel tree
    (size='full'); subtree shapes must match the converted weights.
    """
    report: List[str] = []
    p = params["params"]

    def merge(sub: str, tree: Dict):
        p[sub] = tree["params"]

    clip_path = cfg.pretrained.clip
    if os.path.exists(clip_path):
        sd = _load_any(clip_path)
        merge("vlm_visual", C.convert_clip_visual(sd))
        merge("vlm_text", C.convert_clip_text(sd))
        report.append(f"loaded CLIP from {clip_path}")
    else:
        report.append("CLIP weights missing (random init)")

    swin_path = cfg.pretrained.swin
    if os.path.exists(swin_path):
        sd = _load_any(swin_path)
        merge("guidance", C.convert_swin_guidance(sd))
        report.append(f"loaded Swin-B from {swin_path}")
    else:
        report.append("Swin-B weights missing (random init)")

    catseg_path = cfg.pretrained.catseg
    if cfg.model.use_catseg_ckpt and os.path.exists(catseg_path):
        sd = catseg_key_surgery(_load_any(catseg_path))
        merge("fusion", C.convert_fusion(sd))
        merge("decoder", C.convert_decoder(sd))
        report.append(f"loaded CATSeg fusion/decoder from {catseg_path}")
        # finetuned CLIP inside the CATSeg checkpoint overrides base CLIP
        # (reference net.py:123-131)
        if any(k.startswith("clip.") for k in sd):
            clip_sd = {k[len("clip."):]: v for k, v in sd.items()
                       if k.startswith("clip.")}
            if "visual.conv1.weight" in clip_sd:
                merge("vlm_visual", C.convert_clip_visual(clip_sd))
                merge("vlm_text", C.convert_clip_text(clip_sd))
                report.append("applied CATSeg-finetuned CLIP override")
    else:
        report.append("CATSeg weights missing (random init)")

    return {"params": p}, report
