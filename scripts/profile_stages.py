"""Per-stage timing of the inference pipeline on the real TPU.

Times each stage as its own jitted program (B=8 pairs = 16 tower images):
CLIP visual, Swin guidance, fusion+decoder, matching, lift+RANSAC.
Used to target kernel optimization; see BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, iters=20, warmup=True):
    """Times a jitted fn whose output is a SCALAR (so the device->host sync
    through the tunnel costs ~4 bytes, not a featmap)."""
    import numpy as np
    if warmup:
        _ = np.asarray(jax_leaf(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / iters * 1e3


def jax_leaf(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0]


def scalarize(fn):
    """Wrap fn so every output leaf is folded into one f32 scalar."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(out))
    return wrapped


def main() -> None:
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from oryon_tpu.models.oryon import full_oryon
    from oryon_tpu.ops.matching import MatchParams, nn_correspondences_batch
    from oryon_tpu.geometry.pcd import lift_pcd_at
    from oryon_tpu.geometry.kabsch import ransac_kabsch
    from oryon_tpu.utils.initshape import init_by_shape

    B = 8
    rng = np.random.RandomState(0)
    rgb_a = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    rgb_q = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    ids = np.zeros((1, 80, 77), np.int32)
    ids[:, :, 0] = 49406
    ids[:, :, 1] = rng.randint(1, 40000, (1, 80))
    ids[:, :, 2] = 49407
    ids = jnp.array(ids)

    model = full_oryon()
    params = init_by_shape(model, jax.random.PRNGKey(0), rgb_a[:1], rgb_q[:1], ids)

    rgb2 = jnp.concatenate([rgb_a, rgb_q], 0)

    # --- towers, separately
    from oryon_tpu.ops.resize import resize2d
    from oryon_tpu.models.oryon import CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD, _normalize

    def clip_vis(p, x):
        xin = _normalize(resize2d(x, (336, 336), "cubic", align_corners=False),
                         CLIP_MEAN, CLIP_STD)
        return model.apply(p, xin, method=lambda m, v: m.vlm_visual(v))

    def swin_gd(p, x):
        xin = _normalize(resize2d(x, (384, 384), "cubic", align_corners=True),
                         IMAGENET_MEAN, IMAGENET_STD)
        return model.apply(p, xin, method=lambda m, v: m.guidance(v))

    def resize_only(x):
        a = resize2d(x, (336, 336), "cubic", align_corners=False)
        b = resize2d(x, (384, 384), "cubic", align_corners=True)
        return a.sum() + b.sum()

    def text_enc(p, i):
        return model.apply(p, i, method=model.encode_prompts)

    def fusion_decoder(p, visual, text2, guid):
        def run(m, v, t, g):
            fused = m.fusion(v, t, g[0])
            return m.decoder(fused, g)
        return model.apply(p, visual, text2, guid, method=run)

    def full_fwd(p, a, q, t):
        return model.apply(p, a, q, None, t)

    # scalarized variants for timing (4-byte sync); plain ones for producing
    # the intermediates the later stages consume
    jclip = jax.jit(scalarize(clip_vis))
    jswin = jax.jit(scalarize(swin_gd))
    jrs = jax.jit(resize_only)
    jtext = jax.jit(scalarize(text_enc))
    jfd = jax.jit(scalarize(fusion_decoder))
    jfull_t = jax.jit(scalarize(full_fwd))
    jfull = jax.jit(full_fwd)

    text_emb = jax.jit(text_enc)(params, ids)
    text_embB = jnp.tile(text_emb, (B, 1, 1))
    visual = jax.jit(clip_vis)(params, rgb2)
    guid = jax.jit(swin_gd)(params, rgb2)
    text2 = jnp.concatenate([text_embB, text_embB], 0)

    out = jfull(params, rgb_a, rgb_q, text_embB)
    mask_a = (jax.nn.sigmoid(out.mask_a) > 0.5).astype(jnp.uint8)
    mask_q = (jax.nn.sigmoid(out.mask_q) > 0.5).astype(jnp.uint8)
    mp = MatchParams()

    jmatch = jax.jit(lambda fa, fq, ma, mq, k: nn_correspondences_batch(
        fa, fq, ma, mq, k, mp))
    key = jax.random.PRNGKey(0)
    corrs = jmatch(out.featmap_a, out.featmap_q, mask_a, mask_q, key)

    depth = jnp.array((rng.rand(B, 480, 640) * 300 + 600).astype(np.float32))
    camera = jnp.tile(jnp.array(
        [591.0125, 0, 322.525, 0, 590.16775, 244.11084, 0, 0, 1],
        jnp.float32)[None], (B, 1))

    def solve(yx, valid, d, cam, k):
        ya = (yx[..., 0].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xa = (yx[..., 1].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        yq = (yx[..., 2].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xq = (yx[..., 3].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        pa = jax.vmap(lift_pcd_at)(d, cam, jnp.stack([ya, xa], -1)) / 1000.0
        pq = jax.vmap(lift_pcd_at)(d, cam, jnp.stack([yq, xq], -1)) / 1000.0
        keys = jax.random.split(k, yx.shape[0])
        return jax.vmap(lambda kk, a, b, v: ransac_kabsch(
            kk, a, b, v, num_hypotheses=256, match_err=0.005))(
                keys, pa, pq, valid.astype(jnp.float32))

    jsolve = jax.jit(solve)
    _ = jsolve(corrs.yx, corrs.valid, depth, camera, key)

    res = {
        "resize_2x16img_ms": round(timeit(jrs, (rgb2,)), 1),
        "clip_visual_16img_ms": round(timeit(jclip, (params, rgb2)), 1),
        "swin_guidance_16img_ms": round(timeit(jswin, (params, rgb2)), 1),
        "text_80prompts_ms": round(timeit(jtext, (params, ids)), 1),
        "fusion_decoder_ms": round(timeit(jfd, (params, visual, text2, guid)), 1),
        "full_forward_ms": round(timeit(jfull_t, (params, rgb_a, rgb_q, text_embB)), 1),
        "matching_ms": round(timeit(
            jax.jit(scalarize(lambda fa, fq, ma, mq, k: nn_correspondences_batch(
                fa, fq, ma, mq, k, mp).min_dist)),
            (out.featmap_a, out.featmap_q, mask_a, mask_q, key)), 1),
        "lift_ransac_ms": round(timeit(
            jax.jit(scalarize(solve)), (corrs.yx, corrs.valid, depth, camera, key)), 1),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
