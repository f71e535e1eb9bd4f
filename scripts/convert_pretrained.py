#!/usr/bin/env python
"""One-shot converter: reference torch checkpoints -> npz archives.

Run once after downloading the reference assets (reference setup.sh:7-9):
    python scripts/convert_pretrained.py clip=<ViT-L-14-336px.pt> \
        swin=<swin_b-weights.pth> catseg=<catseg.pth> out=pretrained_models

The emitted npz files are what oryon_tpu.models.pretrained loads at run
start; PointDSC snapshots are loaded directly from the torch pickle by
run_test.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from oryon_tpu.models import convert as C


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out = kv.get("out", "pretrained_models")
    os.makedirs(out, exist_ok=True)
    if "clip" in kv:
        sd = C.load_torch_state(kv["clip"])
        np.savez(os.path.join(out, "clip_vit_l14_336.npz"), **sd)
        print(f"wrote {out}/clip_vit_l14_336.npz ({len(sd)} tensors)")
    if "swin" in kv:
        sd = C.load_torch_state(kv["swin"])
        np.savez(os.path.join(out, "swin_b.npz"), **sd)
        print(f"wrote {out}/swin_b.npz ({len(sd)} tensors)")
    if "catseg" in kv:
        sd = C.load_torch_state(kv["catseg"])
        np.savez(os.path.join(out, "catseg.npz"), **sd)
        print(f"wrote {out}/catseg.npz ({len(sd)} tensors)")


if __name__ == "__main__":
    main(sys.argv[1:])
