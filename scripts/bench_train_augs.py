"""A/B benchmark: end-to-end training throughput, host vs device augs.

Measures REAL training pairs/s (data loading + collate + H2D + jitted step)
over the synthetic ShapeNet6D tree, with the color/flip augmentation stack
on the host (reference-style, data/augment.py) vs fused into the jitted
train step on device (data/device_augment.py).  The 1-core host is the
measured bottleneck (BASELINE.md round 2), so the delta here is the real
training-time win, not a kernel microbenchmark.

Usage:
  python scripts/bench_train_augs.py [n_steps] [batch] [host|device|both]

Prints one JSON line per mode.  Run on an otherwise IDLE host (shared-pool
timing rules, CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(n_steps: int, batch_size: int, on_device: bool, tokenizer):
    from oryon_tpu.data.augment import AugmentConfig
    from oryon_tpu.data.cache import CachedReader
    from oryon_tpu.data.datasets import PairDataset, pick_reader

    reader = CachedReader(pick_reader("shapenet6d")(
        os.path.join("data_synth", "shapenet6d")),
        max_bytes=16 * 2 ** 30, rgb_u8=on_device)
    ds = PairDataset(reader, "train", tokenizer,
                     max_corrs=500, img_size=(224, 224), augment=True,
                     aug_cfg=AugmentConfig(
                         jitter=not on_device, bright=not on_device,
                         hflip=not on_device, vflip=not on_device,
                         out_size=(224, 224)),
                     synset_aug=True, mask_type="oracle", seed=1)
    # bound the working set so the warmup epoch fully warms the decode cache
    cap = (n_steps + 2) * batch_size
    ds.instances = ds.instances[:cap]
    ds.rel_poses = ds.rel_poses[:cap]
    ds.corrs = ds.corrs[:cap]
    return ds


def run_mode(mode: str, n_steps: int, batch_size: int, shared) -> dict:
    import jax

    from oryon_tpu.data.device_augment import DeviceAugConfig
    from oryon_tpu.data.loader import PrefetchLoader
    from oryon_tpu.data.pair_batch import train_fields
    from oryon_tpu.train import jit_train_step

    model, state0, tokenizer, text_cache = shared
    on_device = mode == "device"
    train_ds = make_dataset(n_steps, batch_size, on_device, tokenizer)
    aug_cfg = DeviceAugConfig() if on_device else None
    step_fn = jit_train_step(donate=False, aug_cfg=aug_cfg)

    loader = PrefetchLoader(train_ds, batch_size, shuffle=True,
                            drop_last=True, seed=17, train=True)
    key = jax.random.PRNGKey(0)
    state = state0
    # warmup epoch: compiles the step AND fills the in-RAM decode cache so
    # the timed region measures steady state (epoch >= 2 of a real run)
    for batch in loader:
        key, sub = jax.random.split(key)
        batch = batch._replace(text_emb=text_cache(batch.prompt_ids))
        state, metrics = step_fn(state, train_fields(batch), sub)
    np.asarray(metrics["loss/total"])  # barrier
    done = 0
    t0 = time.time()
    while done < n_steps:
        for batch in loader:
            key, sub = jax.random.split(key)
            batch = batch._replace(text_emb=text_cache(batch.prompt_ids))
            state, metrics = step_fn(state, train_fields(batch), sub)
            done += 1
            if done >= n_steps:
                break
    np.asarray(metrics["loss/total"])  # barrier (block_until_ready is a
    # no-op on this backend; CLAUDE.md)
    dt = time.time() - t0
    return {
        "metric": f"train_pairs_per_s_{mode}_augs",
        "value": round(n_steps * batch_size / dt, 2),
        "unit": "pairs/s",
        "steps": n_steps,
        "batch": batch_size,
        "step_ms": round(1000 * dt / n_steps, 1),
    }


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    modes = sys.argv[3] if len(sys.argv) > 3 else "both"
    modes = ("host", "device") if modes == "both" else (modes,)

    import jax

    from oryon_tpu.config import load_config
    from oryon_tpu.models.oryon import build_model
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.pipeline import make_train_text_cache
    from oryon_tpu.train import create_train_state
    from oryon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(None, [])
    tokenizer = ClipTokenizer(cfg.pretrained.vocabulary)
    model = build_model("full")
    key = jax.random.PRNGKey(0)
    init_ds = make_dataset(1, batch_size, False, tokenizer)
    sample = next(init_ds.batches(batch_size))
    state = create_train_state(model, key, sample, lr=1e-3,
                               total_steps=n_steps * 2)
    text_cache = make_train_text_cache(model, state.params)
    shared = (model, state, tokenizer, text_cache)

    for mode in modes:
        res = run_mode(mode, n_steps, batch_size, shared)
        print(json.dumps(res))


if __name__ == "__main__":
    main()
