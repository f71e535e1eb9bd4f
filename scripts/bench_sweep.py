"""Batch-size sweep of the end-to-end inference pipeline (real TPU).

Usage: python scripts/bench_sweep.py [B ...]
Prints one JSON line per batch size. Used to pick the production batch for
bench.py; see BASELINE.md round-1 measurements.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_for_batch(B: int) -> dict:
    import jax
    import jax.numpy as jnp
    from oryon_tpu.models.oryon import full_oryon
    from oryon_tpu.ops.matching import MatchParams, nn_correspondences_batch
    from oryon_tpu.geometry.pcd import lift_pcd_at
    from oryon_tpu.geometry.kabsch import ransac_kabsch
    from oryon_tpu.utils.initshape import init_by_shape

    P, L = 80, 77
    rng = np.random.RandomState(0)
    rgb_a = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    rgb_q = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    depth_a = jnp.array((rng.rand(B, 480, 640) * 300 + 600).astype(np.float32))
    depth_q = jnp.array((rng.rand(B, 480, 640) * 300 + 600).astype(np.float32))
    camera = jnp.tile(jnp.array(
        [591.0125, 0, 322.525, 0, 590.16775, 244.11084, 0, 0, 1],
        jnp.float32)[None], (B, 1))
    ids = np.zeros((1, P, L), np.int32)
    ids[:, :, 0] = 49406
    ids[:, :, 1] = rng.randint(1, 40000, (1, P))
    ids[:, :, 2] = 49407
    ids = jnp.array(ids)

    model = full_oryon()
    params = init_by_shape(model, jax.random.PRNGKey(0), rgb_a[:1], rgb_q[:1], ids)
    mp = MatchParams()
    encode_text = jax.jit(lambda p, i: model.apply(p, i, method=model.encode_prompts))

    def pipeline(params, key, rgb_a, rgb_q, text_emb, depth_a, depth_q, camera):
        out = model.apply(params, rgb_a, rgb_q, None, text_emb)
        mask_a = (jax.nn.sigmoid(out.mask_a) > 0.5).astype(jnp.uint8)
        mask_q = (jax.nn.sigmoid(out.mask_q) > 0.5).astype(jnp.uint8)
        corrs = nn_correspondences_batch(out.featmap_a, out.featmap_q,
                                         mask_a, mask_q, key, mp)
        ya = (corrs.yx[..., 0].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xa = (corrs.yx[..., 1].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        yq = (corrs.yx[..., 2].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xq = (corrs.yx[..., 3].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        pa = jax.vmap(lift_pcd_at)(depth_a, camera, jnp.stack([ya, xa], -1)) / 1000.0
        pq = jax.vmap(lift_pcd_at)(depth_q, camera, jnp.stack([yq, xq], -1)) / 1000.0
        keys = jax.random.split(key, B)
        poses, inl = jax.vmap(
            lambda k, a, b, v: ransac_kabsch(k, a, b, v, num_hypotheses=256,
                                             match_err=0.005)
        )(keys, pa, pq, corrs.valid.astype(jnp.float32))
        return poses, inl

    def sync(out):
        return float(np.asarray(out[0]).sum())

    run = jax.jit(pipeline)
    key = jax.random.PRNGKey(0)
    text_emb = jnp.tile(encode_text(params, ids), (B, 1, 1))
    t0 = time.perf_counter()
    sync(run(params, key, rgb_a, rgb_q, text_emb, depth_a, depth_q, camera))
    compile_s = time.perf_counter() - t0

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, jax.random.PRNGKey(i), rgb_a, rgb_q, text_emb,
                  depth_a, depth_q, camera)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"B": B, "pairs_per_sec": round(B / dt, 2),
            "ms_per_batch": round(dt * 1e3, 1),
            "first_call_s": round(compile_s, 1)}


def main() -> None:
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    sizes = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for B in sizes:
        print(json.dumps(run_for_batch(B)), flush=True)


if __name__ == "__main__":
    main()
