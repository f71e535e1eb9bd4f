"""Orbax checkpointing + experiment folder management.

Replaces the reference's Lightning ModelCheckpoint + manual resume
(reference: pipeline.py:47-59, run_train.py:29-43): keep-all epoch
checkpoints named ``epoch=NNNN``, config snapshot beside them, resume by
epoch number or 'last'.
"""
from __future__ import annotations

import os
import re
from typing import Any, Tuple

import orbax.checkpoint as ocp

from oryon_tpu.config import Config, save_config


def ckpt_dir(cfg: Config) -> str:
    return os.path.join(cfg.exp_root, cfg.exp_name, "models")


def results_dir(cfg: Config) -> str:
    return os.path.join(cfg.exp_root, cfg.exp_name, "results")


def logs_dir(cfg: Config) -> str:
    return os.path.join(cfg.exp_root, cfg.exp_name, "logs")


def init_experiment(cfg: Config, snapshot: bool = False) -> None:
    """Create the experiment tree + config snapshot
    (reference utils/misc.py:376-410 / pipeline.py:164-166).

    ``snapshot=True`` (run_train) refreshes ``<exp>/config.yaml``, the
    experiment's training-config record.  Eval/infer entries must leave it
    alone — the reference likewise snapshots test configs only NEXT TO the
    results CSV (pipeline.py:485-486); overwriting the experiment config
    with eval overrides (debug_valid, solver ablations, ...) silently
    poisons the provenance of every later `--config=<exp>/config.yaml` run.
    The file is still written when absent so ad-hoc eval-only experiment
    dirs keep a config record."""
    for d in (ckpt_dir(cfg), results_dir(cfg), logs_dir(cfg)):
        os.makedirs(d, exist_ok=True)
    path = os.path.join(cfg.exp_root, cfg.exp_name, "config.yaml")
    if snapshot or not os.path.exists(path):
        save_config(cfg, path)


def _checkpointer() -> ocp.Checkpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(cfg: Config, epoch: int, state: Any) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir(cfg), f"epoch={epoch:04d}"))
    ckptr = _checkpointer()
    ckptr.save(path, {"params": state.params,
                      "opt_state": state.opt_state,
                      "step": state.step}, force=True)
    # StandardCheckpointer saves ASYNCHRONOUSLY: until finalized the dir is
    # 'epoch=NNNN.orbax-checkpoint-tmp-*', which list_checkpoints rightly
    # ignores — block here so a checkpoint exists once we return
    ckptr.wait_until_finished()
    return path


def list_checkpoints(cfg: Config):
    d = ckpt_dir(cfg)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        # fullmatch: a crash mid-save leaves 'epoch=NNNN.orbax-checkpoint-
        # tmp-*' dirs that a prefix match would restore as partial ckpts
        m = re.fullmatch(r"epoch=(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(d, name)))
    return sorted(out)


def restore_checkpoint(cfg: Config, state: Any,
                       which: str = "last") -> Tuple[Any, int]:
    """Restore into a template TrainState; ``which`` is 'last' or an epoch
    number. Returns (state, epoch); (state, -1) when nothing to restore."""
    ckpts = list_checkpoints(cfg)
    if not ckpts:
        return state, -1
    if which == "last":
        epoch, path = ckpts[-1]
    else:
        wanted = int(which)
        matches = [c for c in ckpts if c[0] == wanted]
        if not matches:
            raise FileNotFoundError(f"no checkpoint for epoch {wanted}")
        epoch, path = matches[0]
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    restored = _checkpointer().restore(os.path.abspath(path), template)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"]), epoch


def restore_params_only(cfg: Config, state: Any, spec: str) -> Tuple[Any, str]:
    """Warm-start ``state.params`` from another experiment's checkpoint,
    leaving optimizer state and step fresh.

    ``spec``: '<exp_name>', '<exp_name>:<epoch|last>', or a direct path to
    an 'epoch=NNNN' dir.  This is the fine-tune entry (cfg.init_params_from):
    unlike ``restore_checkpoint`` it does not need the source run's optax
    partition to match — e.g. a model.train_towers run warm-started from a
    frozen-tower run has a different opt_state pytree, but the identical
    param tree.  Returns (state, resolved_path)."""
    import dataclasses

    import jax

    if os.path.isdir(spec):
        path = os.path.abspath(spec)
    else:
        exp, _, which = spec.partition(":")
        which = which or "last"
        src_cfg = dataclasses.replace(cfg, exp_name=exp)
        ckpts = list_checkpoints(src_cfg)
        if not ckpts:
            raise FileNotFoundError(
                f"init_params_from={spec}: no checkpoints in "
                f"{ckpt_dir(src_cfg)}")
        if which == "last":
            path = ckpts[-1][1]
        else:
            matches = [c for c in ckpts if c[0] == int(which)]
            if not matches:
                raise FileNotFoundError(
                    f"init_params_from={spec}: no checkpoint for epoch "
                    f"{which} in {ckpt_dir(src_cfg)}")
            path = matches[0][1]
        path = os.path.abspath(path)
    # restore ONLY the params subtree against its template — opt_state in
    # the checkpoint may have a different structure than state.opt_state
    # (different trainable partition), so a full-template restore would fail
    template = {"params": state.params}
    raw = ocp.PyTreeCheckpointer().restore(
        path, item=template,
        transforms={},  # drop checkpoint entries absent from the template
        restore_args=jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(), template),
    )
    params = raw["params"]
    want = jax.tree_util.tree_structure(state.params)
    got = jax.tree_util.tree_structure(params)
    if want != got:
        raise ValueError(
            f"init_params_from={spec}: param tree mismatch vs {path} "
            "(different model.size/topology?)")
    return state.replace(params=params), path
