"""Device-trace the production train step (B=32, device augs).

The training pipeline is now device-bound (85.9 pairs/s vs the 358 ms/step
= 89 pairs/s capability — BASELINE.md round 2); this traces where the step
itself goes.  Parse with:

    python scripts/profile_train.py --trace /tmp/train_trace
    python scripts/trace_op_table.py /tmp/train_trace --iters 10

Frozen towers take most of the forward; grads flow only through
fusion/decoder (optimizer partition), so the backward is small — the table
tells whether the remaining time is CLIP fwd (then int8/bf16 tower work is
the next lever) or loss/bwd/opt overhead.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]
    hlo_out = None
    if "--hlo" in sys.argv:
        hlo_out = sys.argv[sys.argv.index("--hlo") + 1]
    iters = 10

    import jax

    from oryon_tpu.data.device_augment import DeviceAugConfig
    from oryon_tpu.data.pair_batch import train_fields
    from oryon_tpu.data.synthetic import synthetic_pair_batch
    from oryon_tpu.models.oryon import full_oryon
    from oryon_tpu.pipeline import make_train_text_cache
    from oryon_tpu.train import create_train_state, jit_train_step
    from oryon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B = int(os.environ.get("B", "32"))
    model = full_oryon(quant=os.environ.get("QUANT", "none"))
    batch = synthetic_pair_batch(seed=0, batch=B, img_hw=(224, 224),
                                 n_corrs=500, n_prompts=81)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, lr=1e-3, total_steps=100)
    text_cache = make_train_text_cache(model, state.params)
    batch = batch._replace(text_emb=text_cache(batch.prompt_ids))
    batch = train_fields(batch)
    step = jit_train_step(donate=False, aug_cfg=DeviceAugConfig())

    if hlo_out:
        from oryon_tpu.data.device_augment import device_augment  # noqa
        from oryon_tpu.train import train_step
        lowered = jax.jit(train_step, static_argnames=("aug_cfg",)).lower(
            state, batch, jax.random.PRNGKey(1), DeviceAugConfig())
        with open(hlo_out, "w") as f:
            f.write(lowered.compile().as_text())
        print(f"wrote compiled HLO to {hlo_out}")

    # warmup/compile
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(metrics["loss/total"])

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(iters):
        state2, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    np.asarray(metrics["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    if trace_dir:
        jax.profiler.stop_trace()
    print(f"train step B={B}: {dt * 1e3:.1f} ms wall "
          f"({B / dt:.1f} pairs/s device-only)")


if __name__ == "__main__":
    main()
