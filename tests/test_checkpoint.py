"""Checkpoint save/restore + logging tests."""
import os

import jax
import numpy as np
import pytest

from oryon_tpu.checkpoint import (
    init_experiment, list_checkpoints, restore_checkpoint, save_checkpoint,
)
from oryon_tpu.config import Config
from oryon_tpu.data.synthetic import synthetic_pair_batch
from oryon_tpu.models.oryon import tiny_oryon
from oryon_tpu.train import create_train_state, jit_train_step
from oryon_tpu.utils.logging import MetricLogger


def _make_state():
    model = tiny_oryon()
    batch = synthetic_pair_batch(seed=0, batch=2, img_hw=(28, 28), n_corrs=16,
                                 n_prompts=2, context_len=16, vocab=600)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               total_steps=10)
    return state, batch


def test_checkpoint_roundtrip(tmp_path):
    cfg = Config(exp_root=str(tmp_path), exp_name="exp1")
    init_experiment(cfg)
    assert os.path.exists(tmp_path / "exp1" / "config.yaml")

    state, batch = _make_state()
    step = jit_train_step(donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    save_checkpoint(cfg, 0, state)
    state, _ = step(state, batch, jax.random.PRNGKey(2))
    save_checkpoint(cfg, 1, state)
    assert [e for e, _ in list_checkpoints(cfg)] == [0, 1]

    fresh, _ = _make_state()
    restored, epoch = restore_checkpoint(cfg, fresh, "last")
    assert epoch == 1
    assert int(restored.step) == 2
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    restored0, epoch0 = restore_checkpoint(cfg, fresh, "0")
    assert epoch0 == 0 and int(restored0.step) == 1


def test_restore_without_checkpoints(tmp_path):
    cfg = Config(exp_root=str(tmp_path), exp_name="none")
    state, _ = _make_state()
    same, epoch = restore_checkpoint(cfg, state, "last")
    assert epoch == -1 and same is state


def test_restore_params_only_across_optimizer_partition(tmp_path):
    """cfg.init_params_from: warm-start a train_towers run (different optax
    partition -> different opt_state pytree) from a frozen-tower run's
    checkpoint — params restored exactly, optimizer/step left fresh."""
    from oryon_tpu.checkpoint import restore_params_only

    cfg = Config(exp_root=str(tmp_path), exp_name="src")
    init_experiment(cfg)
    state, batch = _make_state()
    step = jit_train_step(donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    save_checkpoint(cfg, 3, state)

    model_tt = tiny_oryon(train_towers=True)
    fresh = create_train_state(model_tt, jax.random.PRNGKey(7), batch,
                               total_steps=10)
    dst_cfg = Config(exp_root=str(tmp_path), exp_name="dst",
                     init_params_from="src:last")
    warm, path = restore_params_only(dst_cfg, fresh,
                                     dst_cfg.init_params_from)
    assert path.endswith("epoch=0003")
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(warm.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(warm.step) == 0  # fresh schedule
    # by epoch number + direct-path forms resolve to the same checkpoint
    _, p2 = restore_params_only(dst_cfg, fresh, "src:3")
    assert p2 == path
    _, p3 = restore_params_only(dst_cfg, fresh, path)
    assert p3 == path
    with pytest.raises(FileNotFoundError):
        restore_params_only(dst_cfg, fresh, "src:9")
    with pytest.raises(FileNotFoundError):
        restore_params_only(dst_cfg, fresh, "ghost:last")


def test_metric_logger(tmp_path):
    ml = MetricLogger(str(tmp_path), "run")
    ml.log_step(1, {"loss/total": 1.0}, prefix="train")
    ml.log_step(2, {"loss/total": 0.5}, prefix="train")
    means = ml.epoch_summary(0)
    assert means["train_loss/total"] == pytest.approx(0.75)
    ml.close()
    lines = open(tmp_path / "run.metrics.jsonl").readlines()
    assert len(lines) == 3
