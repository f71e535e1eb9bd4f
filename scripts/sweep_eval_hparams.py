"""Eval-time hyperparameter sweep on ONE checkpoint: score a grid of
matching/solver/mask knobs side by side without retraining.

The round-4 stage ladder attributed most of the AR headroom to
features/matching; after the prod40 long-training attack, the remaining
no-retraining lever is the eval-time knob grid the reference exposes in
configs/config.yaml:52-62 (test.dist_th, test.n_corrs, test.mask_threshold,
test.solver) but can only probe one-per-process (reference run_test.py).
Here everything heavy is built ONCE (dataset, model, restored params,
PointDSC weights); per variant we rebuild only the jitted pipeline from a
re-derived config (the persistent compilation cache amortizes re-traces).

Usage:
    python scripts/sweep_eval_hparams.py exp_name=prod40 eval.ckpt=<best> \
        dataset.root=data_synth dataset.test.name=shapenet6d \
        dataset.test.split=val \
        [--variants="test.dist_th=0.15;test.solver=ransac"]

--variants is a ';'-separated list of override groups (whitespace-separated
dotted overrides inside a group; an empty group = shipped defaults).
Defaults to DEFAULT_GRID below.  Prints one JSON line per variant and
writes the table to <exp>/results/eval_hparams_<stamp>.json.
"""
from __future__ import annotations

import faulthandler
import io
import json
import os
import sys
from datetime import datetime

try:
    faulthandler.enable()
except io.UnsupportedOperation:
    pass  # pytest-captured stderr has no fileno (test_scripts CLI test)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Shipped-default neighborhood: match acceptance threshold, solver corr
# budget, mask binarization, and the RANSAC fallback solver for comparison.
DEFAULT_GRID = [
    [],
    ["test.dist_th=0.15"],
    ["test.dist_th=0.2"],
    ["test.dist_th=0.3"],
    ["test.n_corrs=1000"],
    ["test.mask_threshold=0.4"],
    ["test.mask_threshold=0.6"],
    ["test.solver=ransac"],
]


def main(argv):
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    variants_arg = next((a.split("=", 1)[1] for a in argv
                         if a.startswith("--variants=")), None)
    grid = (DEFAULT_GRID if variants_arg is None
            else [g.split() for g in variants_arg.split(";")])

    from oryon_tpu.config import load_config
    cfg = load_config(None, overrides)

    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from oryon_tpu.checkpoint import restore_checkpoint, results_dir
    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.data.loader import PrefetchLoader
    from oryon_tpu.eval.evaluator import BatchedEvaluator as Evaluator
    from oryon_tpu.models.oryon import (build_model, resolve_attn_impl,
                                        resolve_quant)
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.pipeline import (build_pipeline, make_pipeline_config,
                                    make_text_cache, run_test_epoch)
    from oryon_tpu.train import create_train_state

    root = os.path.join(cfg.dataset.root, cfg.dataset.test.name)
    tokenizer = ClipTokenizer(cfg.pretrained.vocabulary)
    reader = pick_reader(cfg.dataset.test.name)(root)
    if cfg.dataset.cache_gib > 0:
        from oryon_tpu.data.cache import CachedReader
        reader = CachedReader(reader,
                              max_bytes=int(cfg.dataset.cache_gib * 2**30))
    ds = PairDataset(reader, cfg.dataset.test.split,
                     tokenizer, max_corrs=cfg.dataset.max_corrs,
                     img_size=cfg.dataset.img_size, augment=False,
                     debug_valid=cfg.debug_valid, mask_type="oracle"
                     if cfg.test.mask == "predicted" else cfg.test.mask,
                     add_description=str(cfg.test.add_description),
                     obj_split=str(cfg.dataset.test.obj))

    model = build_model(cfg.model.size,
                        quant=resolve_quant(cfg.model.size, cfg.model.quant),
                        attn_impl=resolve_attn_impl(cfg.model.size,
                                                    cfg.model.attn_impl))
    key = jax.random.PRNGKey(cfg.seed if cfg.use_seed else 1)
    sample = next(ds.batches(cfg.dataset.batch_size))
    state = create_train_state(model, key, sample, total_steps=1)
    ckpt = cfg.eval.ckpt if cfg.eval.ckpt not in (None, "") else "last"
    state, epoch = restore_checkpoint(cfg, state, str(ckpt))
    print(f"HPARAM SWEEP on {cfg.dataset.test.name}/"
          f"{cfg.dataset.test.split}: {len(ds)} pairs, epoch {epoch}, "
          f"{len(grid)} variants", flush=True)

    # PointDSC weights load once; variants that switch solver reuse them.
    from oryon_tpu.pipeline import (build_pointdsc_solver,
                                    pointdsc_weights_available)
    pointdsc = None
    if pointdsc_weights_available(cfg.pretrained.pointdsc):
        pointdsc = build_pointdsc_solver(cfg.pretrained.pointdsc, key,
                                         cfg.dataset.max_corrs)
    text_cache = make_text_cache(model, state.params)
    obj_info = ds.reader.object_info()

    rows = []
    for group in grid:
        label = " ".join(group) if group else "default"
        print(f"variant {label!r} ...", flush=True)
        cfg_v = load_config(None, overrides + group)
        solver = cfg_v.test.solver
        if solver == "pointdsc" and pointdsc is None:
            print(f"WARNING: PointDSC weights absent; "
                  f"{label!r} falls back to RANSAC")
            solver = "ransac"
        pcfg = make_pipeline_config(cfg_v, solver)
        pipe = build_pipeline(model, state.params, pcfg, pointdsc)
        ev = Evaluator(f"{cfg.exp_tag}-hp", compute_vsd=cfg.compute_vsd,
                       vsd_window=cfg.eval.vsd_window)
        ev.add_object_info(obj_info)
        ev.init_test()
        loader = PrefetchLoader(ds, cfg.dataset.batch_size,
                                sort_by_class=True)
        n = run_test_epoch(pipe, ds, ev, cfg.dataset.batch_size, key,
                           compute_vsd=cfg.compute_vsd,
                           text_cache=text_cache, loader=loader)
        means = {k: float(v) for k, v in ev.get_means().items()}
        row = {"variant": label, "n_pairs": n, **means}
        rows.append(row)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

    rank_key = "AR" if all("AR" in r for r in rows) else "ADD(S)-0.1d"
    best = max(rows, key=lambda r: r.get(rank_key, float("-inf")))
    print(f"best variant by {rank_key}: {best['variant']!r} "
          f"({rank_key}={best.get(rank_key, float('nan')):.4f})")

    stamp = datetime.now().strftime("%d%m%Y_%H%M")
    os.makedirs(results_dir(cfg), exist_ok=True)
    out = os.path.join(results_dir(cfg), f"eval_hparams_{stamp}.json")
    with open(out, "w") as f:
        json.dump({"config": {"dataset": cfg.dataset.test.name,
                              "split": cfg.dataset.test.split,
                              "epoch": epoch, "quant": cfg.model.quant},
                   "rows": rows, "rank_key": rank_key,
                   "best_variant": best["variant"]}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
