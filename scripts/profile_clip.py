"""Split the CLIP ViT-L/14@336 vision tower cost on the real TPU.

Times, at production shape (16 images = B=8 pairs):
  tower      full ClipVisionTower (prologue + 24 blocks + ln_post)
  blocks/*   24-layer block stack alone on [16, 577, 1024] bf16:
               einsum    materialized-logit attention (current default)
               flash     fused Pallas online-softmax kernel
               noattn    attention output replaced by V (non-attention floor:
                         LN + QKVO projections + MLP, zero score/value matmuls)
Prints one JSON line per probe. Shared-pool timing: uses median of reps.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 15


def _median_ms(fn, sync, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from oryon_tpu.models.clip import (ClipVisionConfig, ClipVisionTower,
                                       _run_blocks)

    IMGS = 16
    rng = np.random.RandomState(0)
    imgs = jnp.array(rng.rand(IMGS, 336, 336, 3).astype(np.float32))
    x = jnp.array(rng.randn(IMGS, 577, 1024).astype(np.float32) * 0.02,
                  jnp.bfloat16)

    def sync(out):
        return float(np.asarray(jnp.sum(out[..., :2].astype(jnp.float32))))

    results = {}
    if "--mha-ab" in sys.argv:
        # A/B the fused MHA kernel vs its int8-MXU logit variant at full
        # tower scale (VERDICT-r3 next #7: close the 9.7 -> ~7 ms gap or
        # write its epitaph).  Wall-clock medians are printed but the
        # device-trace dirs are the real verdict (CLAUDE.md: always trace
        # before believing a wall-clock comparison on the shared pool).
        from oryon_tpu.utils.profiling import trace as profile_trace
        for impl in ("fused", "fused_i8qk"):
            tower = ClipVisionTower(ClipVisionConfig(attn_impl=impl))
            tp = tower.init(jax.random.PRNGKey(0), imgs[:1])
            f = jax.jit(lambda p, im, tower=tower: tower.apply(p, im))
            sync(f(tp, imgs))
            results[f"tower/{impl}"] = _median_ms(lambda: f(tp, imgs), sync)
            tdir = f"/tmp/clip_mha_ab_{impl}"
            with profile_trace(tdir):
                for _ in range(10):
                    out = f(tp, imgs)
                sync(out)
            hlo = f.lower(tp, imgs).compile().as_text()
            with open(os.path.join(tdir, "hlo.txt"), "w") as fp:
                fp.write(hlo)
            print(json.dumps({"probe": f"tower/{impl}",
                              "ms": round(results[f"tower/{impl}"], 2),
                              "trace": tdir, "iters": 10}), flush=True)
        print("decode: python scripts/trace_op_table.py "
              "/tmp/clip_mha_ab_<impl> --iters 10", file=sys.stderr)
        return
    if "--swin-pallas-only" in sys.argv:
        _swin_probes(jnp, jax, rng, sync, results, IMGS,
                     impls=("pallas", "einsum"))
        for k, v in results.items():
            print(json.dumps({"probe": k, "ms": round(v, 2), "imgs": IMGS}),
                  flush=True)
        return

    tower = ClipVisionTower(ClipVisionConfig())
    tp = tower.init(jax.random.PRNGKey(0), imgs[:1])
    tower_fn = jax.jit(lambda p, im: tower.apply(p, im))
    sync(tower_fn(tp, imgs))
    results["tower"] = _median_ms(lambda: tower_fn(tp, imgs), sync)

    class Blocks(nn.Module):
        attn_impl: str = "einsum"

        @nn.compact
        def __call__(self, h):
            return _run_blocks(h, None, 1024, 16, 24, jnp.bfloat16, True,
                               self.attn_impl)

    # (the "fused" impl needs the tower-level pad/seg plumbing — measure it
    # via the full tower + jax.profiler traces instead, see CLAUDE.md)
    for impl in ("einsum", "flash", "noattn"):
        m = Blocks(attn_impl=impl)
        p = m.init(jax.random.PRNGKey(0), x[:1])
        f = jax.jit(lambda p, h, m=m: m.apply(p, h))
        sync(f(p, x))
        results[f"blocks/{impl}"] = _median_ms(lambda: f(p, x), sync)

    # Swin guidance split: full tower vs attention-free floor
    _swin_probes(jnp, jax, rng, sync, results, IMGS,
                 impls=("einsum", "noattn"))

    for k, v in results.items():
        print(json.dumps({"probe": k, "ms": round(v, 2), "imgs": IMGS}),
              flush=True)


def _swin_probes(jnp, jax, rng, sync, results, imgs_n, impls):
    from oryon_tpu.models.swin import SwinConfig, SwinGuidance
    imgs384 = jnp.array(rng.rand(imgs_n, 384, 384, 3).astype(np.float32))
    for impl in impls:
        sg = SwinGuidance(SwinConfig(attn_impl=impl))
        sp = sg.init(jax.random.PRNGKey(0), imgs384[:1])
        sf = jax.jit(lambda p, im, sg=sg: sg.apply(p, im)[0])
        sync(sf(sp, imgs384))
        results[f"swin/{impl}"] = _median_ms(lambda: sf(sp, imgs384), sync)


if __name__ == "__main__":
    main()
