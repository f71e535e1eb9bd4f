#!/usr/bin/env python
"""Evaluation CLI (reference: run_test.py).

Usage:
    python run_test.py dataset.root=data dataset.test.name=nocs \
        test.mask=oracle eval.ckpt=last

Runs the batched inference pipeline over the fixed test split, registers all
BOP metrics, writes the reference-format prediction CSV + metrics JSON +
LaTeX row.
"""
from __future__ import annotations

import os
import sys
from datetime import datetime

import numpy as np


def main(argv):
    overrides = [a for a in argv if "=" in a and not a.startswith("--")]
    cfg_path = next((a.split("=", 1)[1] for a in argv if a.startswith("--config=")), None)

    from oryon_tpu.config import load_config, save_config
    cfg = load_config(cfg_path, overrides)

    import jax
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from oryon_tpu.checkpoint import init_experiment, restore_checkpoint, results_dir
    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.eval.evaluator import BatchedEvaluator as Evaluator
    from oryon_tpu.models.oryon import build_model
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.pipeline import (build_pipeline,
                                    make_text_cache, run_test_epoch)
    from oryon_tpu.train import create_train_state

    init_experiment(cfg)
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
    print(f"TESTING on {cfg.dataset.test.name}, split {cfg.dataset.test.split}."
          f" Samples: {len(ds)}")

    from oryon_tpu.models.oryon import resolve_attn_impl, resolve_quant
    model = build_model(cfg.model.size,
                        quant=resolve_quant(cfg.model.size, cfg.model.quant),
                        attn_impl=resolve_attn_impl(cfg.model.size,
                                                    cfg.model.attn_impl))
    key = jax.random.PRNGKey(cfg.seed if cfg.use_seed else 1)
    sample = next(ds.batches(cfg.dataset.batch_size))
    state = create_train_state(model, key, sample, total_steps=1)
    if cfg.model.size == "full":
        from oryon_tpu.models.pretrained import load_pretrained_params
        new_params, report = load_pretrained_params(cfg, state.params)
        state = state.replace(params=new_params)
        for line in report:
            print(line)
    if cfg.eval.ckpt is not None and cfg.eval.ckpt != "":
        # `is not None`: eval.ckpt=0 (epoch zero) is falsy but valid
        state, epoch = restore_checkpoint(cfg, state, str(cfg.eval.ckpt))
        if epoch < 0:
            raise FileNotFoundError(
                f"eval.ckpt={cfg.eval.ckpt!r} requested but no checkpoint "
                f"found under the experiment's models dir")
        print(f"loaded checkpoint epoch {epoch}")

    # honor the configured solver — but a MISSING PointDSC snapshot would
    # mean solving poses with a random-init network (pure noise); fall back
    # to the parameter-free RANSAC solver with a loud warning instead, the
    # same policy as run_train.run_validation (the reference would have
    # crashed on the missing file, utils/pointdsc/init.py:32-57)
    solver = cfg.test.solver
    pointdsc = None
    if solver == "pointdsc":
        from oryon_tpu.pipeline import (build_pointdsc_solver,
                                        pointdsc_weights_available)
        if pointdsc_weights_available(cfg.pretrained.pointdsc):
            pointdsc = build_pointdsc_solver(cfg.pretrained.pointdsc, key,
                                             cfg.dataset.max_corrs)
        else:
            print("WARNING: PointDSC snapshot absent; evaluating with RANSAC "
                  "so pose metrics stay meaningful")
            solver = "ransac"

    from oryon_tpu.pipeline import make_pipeline_config
    pcfg = make_pipeline_config(cfg, solver)
    # multi-chip eval: shard the batch over the data axis (replicated
    # params; optional TP axis reuses the train-time param shardings)
    from oryon_tpu.parallel import serving_mesh
    mesh = serving_mesh(cfg.mesh.data, cfg.mesh.model,
                        cfg.dataset.batch_size, label="eval")
    if mesh is not None and cfg.mesh.model > 1:
        from oryon_tpu.parallel.tp import shard_params_tp
        state = state.replace(params=shard_params_tp(state.params, mesh))
    pipe = build_pipeline(model, state.params, pcfg, pointdsc, mesh=mesh)

    ev = Evaluator(cfg.exp_tag, compute_vsd=cfg.compute_vsd,
                   vsd_window=cfg.eval.vsd_window)
    ev.add_object_info(ds.reader.object_info())
    ev.init_test()

    stamp = datetime.now().strftime("%d%m%Y_%H%M")
    tag = f"{cfg.dataset.test.name}_{cfg.dataset.test.split}_{cfg.dataset.test.obj}_{stamp}"
    rdir = results_dir(cfg)
    save_config(cfg, os.path.join(rdir, f"config_{stamp}.yaml"))
    text_cache = make_text_cache(model, state.params)
    save_hook = None
    if cfg.test.only_save_masks:
        from oryon_tpu.utils.savers import make_mask_saver
        save_hook = make_mask_saver(os.path.join(rdir, "pred_masks"))
    elif cfg.test.only_save_featmaps:
        from oryon_tpu.utils.savers import make_featmap_saver
        save_hook = make_featmap_saver(os.path.join(rdir, "featmaps"))
    viz_dir = None
    if cfg.viz_valid:
        viz_dir = os.path.join(rdir, "viz")
        os.makedirs(viz_dir, exist_ok=True)
    from oryon_tpu.data.loader import PrefetchLoader
    loader = PrefetchLoader(ds, cfg.dataset.batch_size, sort_by_class=True)
    # cfg.profiler: one trace window over eval batches 10-14 (reference
    # gates its profiler on the same flag, run_train.py:55-58)
    from oryon_tpu.utils.profiling import StepProfiler
    profiler = StepProfiler(cfg.profiler, os.path.join(rdir, "profile"))
    with open(os.path.join(rdir, tag + ".csv"), "w") as csv_fp:
        n = run_test_epoch(pipe, ds, ev, cfg.dataset.batch_size, key,
                           csv_fp=csv_fp, compute_vsd=cfg.compute_vsd,
                           text_cache=text_cache, save_hook=save_hook,
                           viz_dir=viz_dir, loader=loader,
                           step_profiler=profiler)
    with open(os.path.join(rdir, tag + ".json"), "w") as f:
        ev.save(f)
    for row in ev.test_summary():
        print(row)
    print(ev.get_latex_str())
    print(f"registered {n} pairs -> {rdir}/{tag}.csv")


if __name__ == "__main__":
    main(sys.argv[1:])
