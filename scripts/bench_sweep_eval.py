"""Eval-inclusive sweep benchmark: pairs/s through run_test_epoch with the
full BOP evaluation (batched per-class metrics + VSD depth renders).

Mirrors a REAL275-style 2000-pair test sweep on synthetic geometric data:
full model forward -> matching -> lift -> solve -> BatchedEvaluator with
VSD renders, class-sorted batching, lookahead dispatch.

Usage: python scripts/bench_sweep_eval.py [n_pairs] [batch]
Prints one JSON line.  (BASELINE.md "full sweep incl. eval" row.)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from oryon_tpu.data.synthetic import synthetic_pair_batch
    from oryon_tpu.eval.evaluator import BatchedEvaluator, ObjectInfo
    from oryon_tpu.models.oryon import full_oryon
    from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig
    from oryon_tpu.ops.matching import MatchParams
    from oryon_tpu.pipeline import (PipelineConfig, build_pipeline,
                                    make_text_cache, run_test_epoch)
    from oryon_tpu.utils.initshape import init_by_shape

    # a handful of distinct object classes, REAL275-style (~6 classes)
    n_classes = 6
    pool = [synthetic_pair_batch(seed=s, batch=B, n_prompts=80)
            for s in range(n_classes)]
    for ci, b in enumerate(pool):
        pool[ci] = b._replace(cls_id=np.full(B, ci),
                              instance_id=np.array([f"c{ci}_{i}" for i in range(B)]))

    class LoopDataset:
        def batches(self, batch_size, sort_by_class=False):
            for i in range(-(-n_pairs // B)):
                yield pool[i % n_classes]

    model = full_oryon()
    b0 = pool[0]
    params = init_by_shape(model, jax.random.PRNGKey(0),
                           b0.anchor.rgb[:1], b0.query.rgb[:1],
                           b0.prompt_ids[:1])
    pd_model = PointDSC(PointDSCConfig())
    import jax.numpy as jnp
    pd_params = pd_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((500, 3)), jnp.zeros((500, 3)),
                              jnp.ones((500,)))
    pcfg = PipelineConfig(mask_source="oracle", solver="pointdsc",
                          match=MatchParams())
    pipe = build_pipeline(model, params, pcfg, pointdsc=(pd_model, pd_params))
    text_cache = make_text_cache(model, params)

    rs = np.random.RandomState(0)
    # UV-sphere model mesh (mm) for VSD renders, REAL275-style object size
    from oryon_tpu.eval.renderer import pad_mesh
    nth, nph, r = 24, 48, 45.0
    th = np.linspace(0, np.pi, nth)
    ph = np.linspace(0, 2 * np.pi, nph, endpoint=False)
    V = np.stack(np.broadcast_arrays(
        r * np.sin(th)[:, None] * np.cos(ph)[None],
        r * np.sin(th)[:, None] * np.sin(ph)[None],
        r * np.cos(th)[:, None] * np.ones((1, nph))), -1).reshape(-1, 3)
    F = []
    for i in range(nth - 1):
        for j in range(nph):
            a, b = i * nph + j, i * nph + (j + 1) % nph
            c, d = (i + 1) * nph + j, (i + 1) * nph + (j + 1) % nph
            F += [[a, b, c], [b, d, c]]
    mesh = pad_mesh(V.astype(np.float32), np.array(F, np.int32))
    pts = V[rs.choice(len(V), 512)].astype(np.float32)
    ev = BatchedEvaluator("bench", compute_vsd=True)
    ev.add_object_info({c: ObjectInfo(pts, 2 * r,
                                      np.eye(3, 4, dtype=np.float32)[None], mesh)
                        for c in range(n_classes)})
    ev.init_test()

    key = jax.random.PRNGKey(0)
    # warm-up epoch (compiles every program incl. per-class metric programs)
    warm = type("D", (), {"batches": lambda self, bs, **kw: iter(pool[:2])})()
    run_test_epoch(pipe, warm, ev, B, key, compute_vsd=True,
                   text_cache=text_cache)
    ev.init_test()

    t0 = time.perf_counter()
    n = run_test_epoch(pipe, LoopDataset(), ev, B, key, compute_vsd=True,
                       text_cache=text_cache)
    dt = time.perf_counter() - t0
    means = ev.get_means()
    print(json.dumps({
        "metric": "sweep_incl_eval_pairs_per_sec",
        "value": round(n / dt, 2),
        "unit": "pairs/s",
        "n_pairs": n,
        "ar": round(float(means.get("AR", -1)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
