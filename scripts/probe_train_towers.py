"""Memory/latency probe for the unfrozen-tower (model.train_towers) step.

Usage: python scripts/probe_train_towers.py [batch_size] [accum_steps]

Builds the FULL model (ViT-L/14@336 + Swin-B@384) with train_towers=true
and runs real train steps on device UNDER THE TRAINER'S EXACT RESIDENT
SET AND PROGRAM — round-4 lesson: a bare-step probe at B=16 passed while
the real `run_train.py` OOMed on its first step, because the probe ran at
192x192 input (trainer: dataset.img_size=224x224, 1.36x the activation
memory), encoded prompts through the text tower (trainer: prompt-embedding
cache, text_emb path), and skipped the on-device augs.  This probe now
mirrors run_train.py: 224x224 batch, make_train_text_cache + train_fields
(text_emb program variant), DeviceAugConfig fused augs, donate=True, and
optional gradient accumulation (training.accum_steps).

Exit 0 = this (batch, accum) fits v5e HBM with the block-remat path
(models/clip.py `_run_blocks(remat=...)`, models/swin.py
`SwinGuidance.remat`); a DFE/OOM from XLA exits nonzero.

History: without remat, B=32 OOMs at compile time — the saved per-layer
attention internals of the 24-layer ViT-L backward exceed 16 GiB
(BASELINE.md round 4).  The reference never trains its towers (they are
frozen, reference net.py:37-43); this probe supports the oryon_tpu
control extension used to test whether the residual AR headroom is
tower-bound under random (un-downloadable) pretrained weights.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from oryon_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from oryon_tpu.data.synthetic import synthetic_pair_batch
from oryon_tpu.data.pair_batch import train_fields
from oryon_tpu.data.device_augment import DeviceAugConfig
from oryon_tpu.models.oryon import build_model
from oryon_tpu.train import create_train_state, jit_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    model = build_model("full", train_towers=True)
    # trainer-exact batch: dataset.img_size=224x224 (NOT the 192x192
    # featmap size the r4 probe wrongly used), 500-corr capacity
    batch = synthetic_pair_batch(seed=0, batch=B, img_hw=(224, 224),
                                 n_corrs=500, n_prompts=80, context_len=77,
                                 vocab=49408)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               lr=1e-4, total_steps=100)
    n_tower = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        state.params["params"]["vlm_visual"]))
    print(f"B={B} accum={accum} vlm_visual params: {n_tower/1e6:.1f}M",
          flush=True)

    # trainer resident set: the frozen-text prompt-embedding cache (and the
    # text_emb program variant it selects — run_train.py text_cache)
    from oryon_tpu.pipeline import make_train_text_cache
    text_cache = make_train_text_cache(model, state.params)
    batch = batch._replace(text_emb=text_cache(batch.prompt_ids))
    batch = train_fields(batch)

    aug_cfg = DeviceAugConfig(jitter=True, bright=True, hflip=True, vflip=True)
    step = jit_train_step(donate=True, aug_cfg=aug_cfg, accum_steps=accum)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss/total"])
    print(f"first step (incl compile): {time.time()-t0:.1f}s "
          f"loss={loss:.4f}", flush=True)
    t0 = time.time()
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    loss = float(metrics["loss/total"])  # device->host fetch = timing barrier
    print(f"warm step: {(time.time()-t0)/3*1e3:.0f} ms loss={loss:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
