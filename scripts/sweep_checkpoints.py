"""Per-checkpoint eval sweep: score every saved epoch of an experiment on
the fixed test/val split and tabulate the pose metrics side by side.

The reference has no analog (it evaluates one checkpoint per run_test.py
invocation, reference run_test.py:21-38); this exists so long-recipe runs
(e.g. the 40-epoch prod40) can pick their best epoch without paying a
process restart + pipeline re-setup per checkpoint.  Everything heavy is
built ONCE (dataset, model template, PointDSC solver); per checkpoint we
restore params, rebuild the jitted pipeline (the persistent compilation
cache makes the re-trace cheap), and run a fresh Evaluator pass.

Usage:
    python scripts/sweep_checkpoints.py exp_name=prod40 dataset.root=data_synth \
        dataset.test.name=shapenet6d dataset.test.split=val [--epochs=4,9,last]

--epochs defaults to 'all' (every checkpoint on disk, ascending).  Prints
one JSON line per epoch and writes the full table to
<exp>/results/ckpt_sweep_<stamp>.json.
"""
from __future__ import annotations

import json
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv):
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    epochs_arg = next((a.split("=", 1)[1] for a in argv
                       if a.startswith("--epochs=")), "all")

    from oryon_tpu.config import load_config
    cfg = load_config(None, overrides)

    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from oryon_tpu.checkpoint import (list_checkpoints, restore_checkpoint,
                                      results_dir)
    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.data.loader import PrefetchLoader
    from oryon_tpu.eval.evaluator import BatchedEvaluator as Evaluator
    from oryon_tpu.models.oryon import (build_model, resolve_attn_impl,
                                        resolve_quant)
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.pipeline import (build_pipeline, make_pipeline_config,
                                    make_text_cache, run_test_epoch)
    from oryon_tpu.train import create_train_state

    ckpts = list_checkpoints(cfg)
    if not ckpts:
        raise FileNotFoundError(
            f"no checkpoints under the {cfg.exp_name!r} experiment")
    if epochs_arg == "all":
        wanted = [e for e, _ in ckpts]
    else:
        by_epoch = dict(ckpts)
        wanted = []
        for tok in epochs_arg.split(","):
            e = ckpts[-1][0] if tok == "last" else int(tok)
            if e not in by_epoch:
                raise FileNotFoundError(f"no checkpoint for epoch {e}")
            wanted.append(e)

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
    print(f"SWEEP on {cfg.dataset.test.name}/{cfg.dataset.test.split}: "
          f"{len(ds)} pairs, quant={cfg.model.quant}, "
          f"epochs={wanted}", flush=True)

    model = build_model(cfg.model.size,
                        quant=resolve_quant(cfg.model.size, cfg.model.quant),
                        attn_impl=resolve_attn_impl(cfg.model.size,
                                                    cfg.model.attn_impl))
    key = jax.random.PRNGKey(cfg.seed if cfg.use_seed else 1)
    sample = next(ds.batches(cfg.dataset.batch_size))
    state = create_train_state(model, key, sample, total_steps=1)

    solver = cfg.test.solver
    pointdsc = None
    if solver == "pointdsc":
        from oryon_tpu.pipeline import (build_pointdsc_solver,
                                        pointdsc_weights_available)
        if pointdsc_weights_available(cfg.pretrained.pointdsc):
            pointdsc = build_pointdsc_solver(cfg.pretrained.pointdsc, key,
                                             cfg.dataset.max_corrs)
        else:
            print("WARNING: PointDSC snapshot absent; sweeping with RANSAC")
            solver = "ransac"
    pcfg = make_pipeline_config(cfg, solver)

    obj_info = ds.reader.object_info()
    rows = []
    for want in wanted:
        state, epoch = restore_checkpoint(cfg, state, str(want))
        pipe = build_pipeline(model, state.params, pcfg, pointdsc)
        text_cache = make_text_cache(model, state.params)
        ev = Evaluator(f"{cfg.exp_tag}-e{epoch}", compute_vsd=cfg.compute_vsd,
                       vsd_window=cfg.eval.vsd_window)
        ev.add_object_info(obj_info)
        ev.init_test()
        loader = PrefetchLoader(ds, cfg.dataset.batch_size,
                                sort_by_class=True)
        n = run_test_epoch(pipe, ds, ev, cfg.dataset.batch_size, key,
                           compute_vsd=cfg.compute_vsd,
                           text_cache=text_cache, loader=loader)
        means = {k: float(v) for k, v in ev.get_means().items()}
        row = {"epoch": epoch, "n_pairs": n, **means}
        rows.append(row)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

    # AR exists only when VSD runs (it averages MSSD/MSPD/VSD); without it
    # rank by ADD(S)-0.1d, the reference's other headline metric
    rank_key = "AR" if all("AR" in r for r in rows) else "ADD(S)-0.1d"
    best = max(rows, key=lambda r: r.get(rank_key, float("-inf")))
    print(f"best epoch by {rank_key}: {best['epoch']} "
          f"({rank_key}={best.get(rank_key, float('nan')):.4f})")

    stamp = datetime.now().strftime("%d%m%Y_%H%M")
    os.makedirs(results_dir(cfg), exist_ok=True)
    out = os.path.join(results_dir(cfg), f"ckpt_sweep_{stamp}.json")
    with open(out, "w") as f:
        json.dump({"config": {"dataset": cfg.dataset.test.name,
                              "split": cfg.dataset.test.split,
                              "mask": cfg.test.mask, "solver": solver,
                              "quant": cfg.model.quant},
                   "rows": rows, "rank_key": rank_key,
                   "best_epoch": best["epoch"]}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
