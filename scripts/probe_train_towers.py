"""Memory/latency probe for the unfrozen-tower (model.train_towers) step.

Usage: python scripts/probe_train_towers.py [batch_size]

Builds the FULL model (ViT-L/14@336 + Swin-B@384) with train_towers=true,
runs a handful of real train steps on device, and prints compile + warm
step times.  Exit 0 = this batch size fits v5e HBM with the block-remat
path (models/clip.py `_run_blocks(remat=...)`, models/swin.py
`SwinGuidance.remat`); a DFE/OOM from XLA exits nonzero.

History: without remat, B=32 OOMs at compile time — the saved per-layer
attention internals of the 24-layer ViT-L backward exceed 16 GiB
(BASELINE.md round 4).  The reference never trains its towers (they are
frozen, reference net.py:37-43); this probe supports the oryon_tpu
control extension used to test whether the residual AR headroom is
tower-bound under random (un-downloadable) pretrained weights.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax

from oryon_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from oryon_tpu.data.synthetic import synthetic_pair_batch
from oryon_tpu.models.oryon import build_model
from oryon_tpu.train import create_train_state, jit_train_step


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    model = build_model("full", train_towers=True)
    batch = synthetic_pair_batch(seed=0, batch=B, img_hw=(192, 192),
                                 n_corrs=500, n_prompts=80, context_len=77,
                                 vocab=49408)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               lr=1e-4, total_steps=100)
    n_tower = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        state.params["params"]["vlm_visual"]))
    print(f"B={B} vlm_visual params: {n_tower/1e6:.1f}M", flush=True)
    step = jit_train_step(donate=False)
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
