#!/usr/bin/env python
"""Training CLI (reference: run_train.py).

Usage:
    python run_train.py exp_name=myrun dataset.root=data \
        training.n_epochs=20 dataset.batch_size=32

Differences from the reference: no Hydra/Lightning — a plain arg-override
config tree, an explicit epoch loop over a jitted DP train step, orbax
checkpoints, JSONL metric logs.
"""
from __future__ import annotations

import sys


def _rss_gib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2 ** 20
    return 0.0


def _reexec_resume(argv):
    """Re-exec this training run with resume_ckpt=last (host-RSS watchdog:
    the relay backend leaks host memory 1:1 with H2D bytes — measured,
    BASELINE.md round 2 — so long runs must recycle the process)."""
    import os
    args = [a for a in argv if not a.startswith("resume_ckpt")]
    args.append("resume_ckpt=last")
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, sys.argv[0]] + args)


def main(argv):
    overrides = [a for a in argv if "=" in a]
    cfg_path = next((a.split("=", 1)[1] for a in argv if a.startswith("--config=")), None)

    from oryon_tpu.config import load_config
    cfg = load_config(cfg_path, [o for o in overrides if not o.startswith("--")])

    import jax
    from oryon_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from oryon_tpu.checkpoint import (
        init_experiment, logs_dir, restore_checkpoint, save_checkpoint,
    )
    from oryon_tpu.data.datasets import PairDataset, pick_reader
    from oryon_tpu.losses.feature_loss import FeatureLossConfig
    from oryon_tpu.models.oryon import build_model
    from oryon_tpu.models.tokenizer import ClipTokenizer
    from oryon_tpu.parallel import make_mesh, replicate, shard_batch
    from oryon_tpu.train import create_train_state, jit_train_step
    from oryon_tpu.utils.logging import MetricLogger

    init_experiment(cfg, snapshot=True)
    logger = MetricLogger(logs_dir(cfg), cfg.exp_name)

    import os
    root = os.path.join(cfg.dataset.root, cfg.dataset.train.name)
    tokenizer = ClipTokenizer(cfg.pretrained.vocabulary)

    def wrap_cache(reader, rgb_u8: bool = False):
        if cfg.dataset.cache_gib <= 0:
            return reader
        from oryon_tpu.data.cache import CachedReader
        return CachedReader(reader, max_bytes=int(cfg.dataset.cache_gib * 2**30),
                            rgb_u8=rgb_u8)

    # color/flip augs run on device by default (augs.rgb.device — the 1-core
    # host data path is the measured bottleneck; data/device_augment.py).
    # The dataset keeps augment=True either way: synset prompt augmentation
    # and corr sampling are host concerns; with device augs on, the host
    # color/flip stack is disabled via an all-off AugmentConfig.
    from oryon_tpu.data.augment import AugmentConfig
    rgb_augs = cfg.augs.rgb
    on_device = bool(getattr(rgb_augs, "device", False))
    host_aug_cfg = AugmentConfig(
        jitter=rgb_augs.jitter and not on_device,
        bright=rgb_augs.bright and not on_device,
        hflip=rgb_augs.hflip and not on_device,
        vflip=rgb_augs.vflip and not on_device,
        out_size=tuple(cfg.dataset.img_size),
    )
    device_aug_cfg = None
    if on_device:
        from oryon_tpu.data.device_augment import DeviceAugConfig
        device_aug_cfg = DeviceAugConfig(
            jitter=rgb_augs.jitter, bright=rgb_augs.bright,
            hflip=rgb_augs.hflip, vflip=rgb_augs.vflip)

    train_ds = PairDataset(
        wrap_cache(pick_reader(cfg.dataset.train.name)(root), rgb_u8=on_device),
        cfg.dataset.train.split,
        tokenizer, max_corrs=cfg.dataset.max_corrs,
        img_size=cfg.dataset.img_size, augment=True,
        aug_cfg=host_aug_cfg,
        synset_aug=cfg.augs.text.synset, mask_type="oracle",
        seed=cfg.seed if cfg.use_seed else 0,
        obj_split=str(cfg.dataset.train.obj),
    )
    print(f"TRAINING on {cfg.dataset.train.name}, split "
          f"{cfg.dataset.train.split}. Samples: {len(train_ds)}")

    steps_per_epoch = max(len(train_ds) // cfg.dataset.batch_size, 1)
    total_steps = steps_per_epoch * cfg.training.n_epochs
    loss_cfg = FeatureLossConfig(
        pos_margin=cfg.loss.pos_margin, neg_margin=cfg.loss.neg_margin,
        neg_kernel=cfg.loss.neg_kernel_size,
        neg_pool=cfg.loss.neg_pool,
        hard_negatives=cfg.loss.hard_negatives, mask_type=cfg.loss.mask_type,
        mask_threshold=cfg.test.mask_threshold,
        w_mask=cfg.loss.w.mask, w_pos=cfg.loss.w.pos, w_neg=cfg.loss.w.neg,
    )

    # training stays bf16 strict parity by default (model.train_quant);
    # the int8 inference default does NOT apply to the train step
    from oryon_tpu.models.oryon import resolve_attn_impl, resolve_quant
    model = build_model(cfg.model.size,
                        quant=resolve_quant(cfg.model.size,
                                            cfg.model.train_quant),
                        attn_impl=resolve_attn_impl(cfg.model.size,
                                                    cfg.model.attn_impl),
                        train_towers=cfg.model.train_towers)
    if cfg.model.train_towers:
        print("train_towers=TRUE: CLIP-vision + Swin receive gradients "
              "(oryon_tpu control extension; reference freezes them)")
    key = jax.random.PRNGKey(cfg.seed)
    sample = next(train_ds.batches(cfg.dataset.batch_size))
    state = create_train_state(model, key, sample, lr=cfg.optimization.lr,
                               weight_decay=cfg.optimization.w_decay,
                               total_steps=total_steps,
                               gamma=cfg.optimization.gamma,
                               loss_cfg=loss_cfg,
                               optim_type=cfg.optimization.optim_type,
                               scheduler_type=cfg.optimization.scheduler_type,
                               momentum=cfg.optimization.momentum)
    if cfg.model.size == "full":
        from oryon_tpu.models.pretrained import load_pretrained_params
        new_params, report = load_pretrained_params(cfg, state.params)
        state = state.replace(params=new_params)
        for line in report:
            print(line)
    if cfg.init_params_from != "none":
        from oryon_tpu.checkpoint import restore_params_only
        state, src_path = restore_params_only(cfg, state, cfg.init_params_from)
        print(f"warm-started params from {src_path} "
              "(fresh optimizer state / schedule)")
    start_epoch = 0
    if cfg.resume_ckpt != "none":
        state, epoch = restore_checkpoint(cfg, state, cfg.resume_ckpt)
        start_epoch = epoch + 1
        print(f"Resumed from epoch {epoch}")

    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    state = replicate(state, mesh)
    if cfg.mesh.model > 1:
        from oryon_tpu.parallel.tp import shard_params_tp
        state = state.replace(params=shard_params_tp(state.params, mesh))
        print(f"tensor-parallel params over model axis = {cfg.mesh.model}")
    step_fn = jit_train_step(donate=True, aug_cfg=device_aug_cfg,
                             accum_steps=cfg.training.accum_steps)
    if cfg.training.accum_steps > 1:
        print(f"gradient accumulation: {cfg.training.accum_steps} micro-batches "
              f"of {cfg.dataset.batch_size // cfg.training.accum_steps}")
    if device_aug_cfg is not None:
        print("augmentations: on-device (color jitter + flips fused into "
              "the train step)")

    # validation dataset (pose eval every freq_valid epochs,
    # reference config training.freq_valid + validation_step)
    valid_ds = None
    valid_root = os.path.join(cfg.dataset.root, cfg.dataset.test.name)
    if os.path.isdir(valid_root):
        try:
            reader = pick_reader(cfg.dataset.test.name)
        except KeyError:
            reader = None
        if reader is not None:
            valid_ds = PairDataset(
                wrap_cache(reader(valid_root)), cfg.dataset.test.split,
                tokenizer, max_corrs=cfg.dataset.max_corrs,
                img_size=cfg.dataset.img_size, augment=False,
                mask_type="oracle")

    from oryon_tpu.data.pair_batch import train_fields

    # frozen-text-tower embedding cache: identical numerics, removes the
    # ~40% of the step spent re-encoding recurring prompt sets (traced)
    from oryon_tpu.pipeline import make_train_text_cache
    text_cache = make_train_text_cache(model, state.params)

    # background-prefetching loader: batch assembly (PIL/numpy, one host
    # core) overlaps the device step; multi-host processes read strided
    # splits of the shared order (input over DCN; gradients psum over ICI)
    from oryon_tpu.data.loader import PrefetchLoader
    train_loader = PrefetchLoader(
        train_ds, cfg.dataset.batch_size, shuffle=True, drop_last=True,
        process_index=jax.process_index(), process_count=jax.process_count(),
        train=True)

    # cfg.profiler: one trace window over train steps 10-14 (reference
    # gates its profiler on the same flag, run_train.py:55-58)
    from oryon_tpu.utils.profiling import StepProfiler
    profiler = StepProfiler(cfg.profiler, os.path.join(logs_dir(cfg),
                                                       "profile"))

    for epoch in range(start_epoch, cfg.training.n_epochs):
        for bi, batch in enumerate(train_loader):
            key, sub = jax.random.split(key)
            batch = batch._replace(text_emb=text_cache(batch.prompt_ids))
            batch = shard_batch(train_fields(batch), mesh)
            state, metrics = step_fn(state, batch, sub)
            profiler.step()
            if bi % 10 == 0:
                logger.log_step(int(state.step), metrics, prefix="train")
                # NaN guard (reference prints in the loss, losses.py:113-118;
                # here a hard stop so a poisoned run fails fast)
                total = float(metrics["loss/total"])
                if total != total:
                    raise FloatingPointError(
                        f"non-finite loss at step {int(state.step)}")
        means = logger.epoch_summary(epoch)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in means.items()))
        saved = False
        if (epoch + 1) % cfg.training.freq_save == 0 or epoch == cfg.training.n_epochs - 1:
            path = save_checkpoint(cfg, epoch, state)
            saved = True
            print(f"saved {path}")
        if valid_ds is not None and (epoch + 1) % cfg.training.freq_valid == 0:
            run_validation(cfg, model, state, valid_ds, key, epoch,
                           logger=logger)
        rss_cap = float(getattr(cfg.training, "rss_restart_gib", 0) or 0)
        if (rss_cap > 0 and epoch < cfg.training.n_epochs - 1
                and _rss_gib() > rss_cap):
            if not saved:
                print(f"saved {save_checkpoint(cfg, epoch, state)}")
            print(f"host RSS {_rss_gib():.1f} GiB > {rss_cap} GiB "
                  "(relay H2D leak) — re-exec + resume")
            profiler.close()
            logger.close()
            _reexec_resume(argv)
    profiler.close()
    logger.close()


def run_validation(cfg, model, state, valid_ds, key, epoch, logger=None):
    """Pose-metric validation pass (reference validation_step,
    pipeline.py:196-247), without VSD for speed."""
    import os

    from oryon_tpu.data.loader import PrefetchLoader
    from oryon_tpu.eval.evaluator import BatchedEvaluator
    from oryon_tpu.pipeline import (build_pipeline,
                                    build_pointdsc_solver,
                                    pointdsc_weights_available, run_test_epoch)

    # validation uses the CONFIGURED solver so its pose metrics track test
    # behavior (reference validation_step, pipeline.py:196-247) — except
    # when the PointDSC snapshot is absent: routing validation through a
    # RANDOM-INIT network would turn the pose curves into noise, so fall
    # back to the parameter-free RANSAC solver and say so
    solver = cfg.test.solver
    pointdsc = None
    if solver == "pointdsc":
        if pointdsc_weights_available(cfg.pretrained.pointdsc):
            pointdsc = build_pointdsc_solver(cfg.pretrained.pointdsc, key,
                                             cfg.test.n_corrs)
        else:
            print("WARNING: PointDSC snapshot absent; validating with RANSAC "
                  "so pose metrics stay meaningful")
            solver = "ransac"
    from oryon_tpu.pipeline import make_pipeline_config
    pcfg = make_pipeline_config(cfg, solver, mask_source="predicted")
    pipe = build_pipeline(model, state.params, pcfg, pointdsc)
    ev = BatchedEvaluator(cfg.exp_tag, compute_vsd=False)
    ev.add_object_info(valid_ds.reader.object_info())
    ev.init_test()
    run_test_epoch(pipe, valid_ds, ev, cfg.dataset.batch_size, key,
                   compute_vsd=False,
                   loader=PrefetchLoader(valid_ds, cfg.dataset.batch_size,
                                         sort_by_class=True))
    means = ev.get_means()
    print(f"valid epoch {epoch}: " +
          " ".join(f"{k}={v:.3f}" for k, v in sorted(means.items())
                   if isinstance(v, float)))
    if logger is not None:
        # val curve in the run JSONL (incl. FMR + match inlier rate, the
        # "is the contrastive loss learning features?" signals)
        logger.log_step(int(state.step),
                        {k.replace(" ", "_"): v for k, v in means.items()
                         if isinstance(v, float)},
                        prefix="valid_metric")


if __name__ == "__main__":
    main(sys.argv[1:])
