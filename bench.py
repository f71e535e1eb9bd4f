"""Benchmark: end-to-end image pairs/sec through the inference pipeline.

Runs the flagship path at production shapes on the available accelerator:
model forward (CLIP ViT-L/14@336 + Swin-B + fusion + decoder) -> masked NN
matching -> depth lift -> registration, batched.

The headline number uses the SHIPPED inference default: int8 CLIP tower
(oryon_tpu/config.py ModelConfig.quant) + the PROTOCOL solver — PointDSC,
the reference's test-time default (reference configs/config.yaml:53-61).
The strict-parity bf16 path and the RANSAC solver are auxiliary fields.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline: the reference publishes no throughput (BASELINE.md); its test
loop is per-sample Python with CPU correspondence matching
(reference pipeline.py:313, configs/config.yaml:7).  We use a 2.0 pairs/s
proxy for the reference GPU pipeline (documented assumption, to be replaced
by a measured reference number when available).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PROXY_PAIRS_PER_SEC = 2.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from oryon_tpu.models.oryon import full_oryon
    from oryon_tpu.ops.matching import MatchParams, nn_correspondences_batch
    from oryon_tpu.geometry.pcd import lift_pcd_at
    from oryon_tpu.geometry.kabsch import ransac_kabsch

    B, P, L = 8, 80, 77
    rng = np.random.RandomState(0)
    rgb_a = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    rgb_q = jnp.array(rng.rand(B, 224, 224, 3).astype(np.float32))
    depth_a = jnp.array((rng.rand(B, 480, 640) * 300 + 600).astype(np.float32))
    depth_q = jnp.array((rng.rand(B, 480, 640) * 300 + 600).astype(np.float32))
    camera = jnp.tile(jnp.array(
        [591.0125, 0, 322.525, 0, 590.16775, 244.11084, 0, 0, 1], jnp.float32)[None], (B, 1))
    ids = np.zeros((B, P, L), np.int32)
    ids[:, :, 0] = 49406
    ids[:, :, 1] = rng.randint(1, 40000, (B, P))
    ids[:, :, 2] = 49407
    ids = jnp.array(ids)

    model = full_oryon()
    from oryon_tpu.utils.initshape import init_by_shape
    params = init_by_shape(model, jax.random.PRNGKey(0), rgb_a[:1], rgb_q[:1], ids[:1])
    mp = MatchParams()

    # protocol solver: PointDSC (reference configs/config.yaml:53-61);
    # random-init weights (snapshot absent in-sandbox) — same compute shape
    from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig
    pd = PointDSC(PointDSCConfig())
    dummy = jnp.zeros((mp.max_corrs, 3))
    pd_vars = pd.init(jax.random.PRNGKey(1), dummy, dummy,
                      jnp.ones(mp.max_corrs))

    # per-class text-embedding cache: a REAL275 sweep has ~34 classes for
    # 2000 pairs, so steady-state inference reuses cached prompt embeddings
    encode_text = jax.jit(lambda p, i: model.apply(p, i, method=model.encode_prompts))

    # dense ICP refinement follows the SHIPPED serving default
    # (config.py TestConfig.icp_refine — measured +0.07 AR, BASELINE.md
    # round-5); both on/off are measured so the throughput cost stays visible
    from oryon_tpu.config import TestConfig
    tc = TestConfig()

    def pipeline(params, pd_vars, key, rgb_a, rgb_q, text_emb, depth_a,
                 depth_q, camera, solver: str, mdl, icp: bool):
        out = mdl.apply(params, rgb_a, rgb_q, None, text_emb)
        mask_a = (jax.nn.sigmoid(out.mask_a) > 0.5).astype(jnp.uint8)
        mask_q = (jax.nn.sigmoid(out.mask_q) > 0.5).astype(jnp.uint8)
        corrs = nn_correspondences_batch(out.featmap_a, out.featmap_q,
                                         mask_a, mask_q, key, mp)
        # scale featmap coords (192) to original depth frame (480x640)
        ya = (corrs.yx[..., 0].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xa = (corrs.yx[..., 1].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        yq = (corrs.yx[..., 2].astype(jnp.float32) * (480.0 / 192.0)).astype(jnp.int32)
        xq = (corrs.yx[..., 3].astype(jnp.float32) * (640.0 / 192.0)).astype(jnp.int32)
        pa = jax.vmap(lift_pcd_at)(depth_a, camera,
                                   jnp.stack([ya, xa], -1)) / 1000.0
        pq = jax.vmap(lift_pcd_at)(depth_q, camera,
                                   jnp.stack([yq, xq], -1)) / 1000.0
        v = corrs.valid.astype(jnp.float32)
        if solver == "pointdsc":
            poses, labels, _ = jax.vmap(
                lambda a, b, w: pd.apply(pd_vars, a, b, w))(pa, pq, v)
            inl = jnp.sum(labels, axis=-1)
        else:
            keys = jax.random.split(key, B)
            poses, inl = jax.vmap(
                lambda k, a, b, w: ransac_kabsch(
                    k, a, b, w, num_hypotheses=256, match_err=0.001)
            )(keys, pa, pq, v)
        if icp:
            from oryon_tpu.pipeline import PipelineConfig, _icp_refine_pose
            pcfg = PipelineConfig(icp_refine=True, icp_points=tc.icp_points,
                                  icp_iters=tc.icp_iters, icp_trim=tc.icp_trim)
            feat_hw = (mask_a.shape[1], mask_a.shape[2])
            size = jnp.tile(jnp.array([480.0, 640.0], jnp.float32), (B, 1))
            ikeys = jax.random.split(jax.random.fold_in(key, 7), B)
            poses = jax.vmap(
                lambda k, T, n, ma, mq, da, dq, cam, sz: _icp_refine_pose(
                    k, T, n, ma, mq, da, dq, cam, cam, sz, sz, feat_hw, pcfg)
            )(ikeys, poses, inl, mask_a, mask_q, depth_a, depth_q, camera,
              size)
        return poses, inl

    def sync(out):
        # force real execution: on this backend block_until_ready returns
        # before the computation runs; a host copy is the reliable barrier
        return float(np.asarray(out[0]).sum())

    run = jax.jit(pipeline, static_argnames=("solver", "mdl", "icp"))
    key = jax.random.PRNGKey(0)
    text_emb = encode_text(params, ids)

    def measure(solver: str, iters: int = 10, mdl=None,
                icp: bool = tc.icp_refine) -> float:
        mdl = mdl or model
        sync(run(params, pd_vars, key, rgb_a, rgb_q, text_emb, depth_a,
                 depth_q, camera, solver, mdl, icp))
        t0 = time.perf_counter()
        for i in range(iters):
            out = run(params, pd_vars, jax.random.PRNGKey(i), rgb_a, rgb_q,
                      text_emb, depth_a, depth_q, camera, solver, mdl, icp)
        sync(out)
        return B * iters / (time.perf_counter() - t0)

    # headline: the shipped inference default — int8 CLIP tower (config
    # ModelConfig.quant="int8"), PointDSC protocol solver.  Validated
    # accuracy-neutral on trained weights (BASELINE.md round-3 A/B:
    # AR 0.7286 int8 vs 0.7310 bf16, ADD(S) 0.7125 vs 0.7083).
    int8_model = full_oryon(quant="int8")
    int8 = measure("pointdsc", mdl=int8_model)
    bf16 = measure("pointdsc")          # strict-parity variant (quant=none)
    ransac = measure("ransac", mdl=int8_model)  # solver variant, same model
    # the complementary ICP setting, so the refine stage's throughput cost
    # stays visible whichever way the shipped default points
    icp_flip = measure("pointdsc", mdl=int8_model, icp=not tc.icp_refine)

    # --trace=DIR: capture a device trace of the (already warm) headline
    # program for scripts/trace_op_table.py — device times are immune to the
    # shared-pool wall-clock noise (CLAUDE.md).
    import sys as _sys
    trace_dir = next((a.split("=", 1)[1] for a in _sys.argv
                      if a.startswith("--trace=")), None)
    if trace_dir:
        from oryon_tpu.utils.profiling import trace as profile_trace
        t_iters = 10
        with profile_trace(trace_dir):
            for i in range(t_iters):
                out = run(params, pd_vars, jax.random.PRNGKey(i), rgb_a,
                          rgb_q, text_emb, depth_a, depth_q, camera,
                          "pointdsc", int8_model, tc.icp_refine)
            sync(out)
        # drop the optimized HLO next to the trace so trace_op_table.py can
        # attribute fusions to pipeline stages STRUCTURALLY (op_name source
        # metadata) instead of by hand-matched positional names; the
        # compilation cache makes this re-lower/compile cheap
        import os as _os
        hlo_txt = run.lower(params, pd_vars, key, rgb_a, rgb_q, text_emb,
                            depth_a, depth_q, camera, "pointdsc",
                            int8_model, tc.icp_refine).compile().as_text()
        with open(_os.path.join(trace_dir, "hlo.txt"), "w") as f:
            f.write(hlo_txt)
        print(f"decode: python scripts/trace_op_table.py {trace_dir} "
              f"--iters {t_iters}", file=_sys.stderr)

    global _PRINTED
    print(json.dumps({
        "metric": "e2e_image_pairs_per_sec",
        "value": round(int8, 3),
        "unit": "pairs/s",
        "vs_baseline": round(int8 / REFERENCE_PROXY_PAIRS_PER_SEC, 2),
        "solver": "pointdsc",
        "quant": "int8",
        "icp_refine": tc.icp_refine,
        ("icp_off_variant" if tc.icp_refine else "icp_on_variant"):
            round(icp_flip, 3),
        "bf16_parity_variant": round(bf16, 3),
        "ransac_variant": round(ransac, 3),
    }))
    _PRINTED = True


_PRINTED = False

if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the remote-compile relay occasionally drops
        import sys, time, traceback
        traceback.print_exc(file=sys.stderr)
        if _PRINTED:  # JSON already emitted; don't double-print
            sys.exit(0)
        print("bench retrying once after transport error", file=sys.stderr)
        time.sleep(20)
        main()
