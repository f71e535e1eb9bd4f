"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # On a 1-core host, XLA:CPU's in-process collectives can take >40 s to
    # reach a rendezvous; the default 40 s termination timeout then aborts
    # the interpreter. Raising it helps SLOW rendezvous (pure-psum DP tests)
    # but is NOT sufficient for the dp/tp all-to-all program in a warm pytest
    # process — that one truly deadlocks and must stay in a fresh subprocess
    # (tests/_dp_tp_body.py; see CLAUDE.md).
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags
# In-process CLI tests call enable_compilation_cache(); disable the
# persistent cache under pytest ("" = off) — reading entries back on the
# CPU backend segfaults deterministically (see oryon_tpu/utils/cache.py).
os.environ.setdefault("ORYON_JAX_CACHE_DIR", "")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend unconditionally; force the
# CPU platform explicitly so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU segfaults compiling the nn.scan CLIP tower in a pytest
    process warmed by ~150 earlier tests (reproduced 3x at the same suite
    position, 2026-08-20, with and without the persistent compilation
    cache — the crash is in backend_compile_and_load itself; the same
    test passes in a fresh process).  Dropping the accumulated compiled
    executables between modules keeps the process below whatever loader /
    compiler state limit is being hit.  Costs a few cross-module
    recompiles; fixture-cached MODEL OBJECTS are unaffected."""
    yield
    jax.clear_caches()


def random_pose(rs: np.random.RandomState, t_scale: float = 0.5) -> np.ndarray:
    """Random SE(3) with a proper rotation."""
    A = rs.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = rs.randn(3) * t_scale
    return T


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: subprocess-driven CLI tests (minutes on 1 core)")
    config.addinivalue_line(
        "markers", "smoke: <5-min cross-subsystem tier (pytest -m smoke)")


# One fast representative test per subsystem — the <5-minute green check for
# cold sessions / CI (the full suite takes ~25 min on the 1-core host because
# interpret-mode Pallas kernels run in every tiny-model test).  Kept in ONE
# place so the selection is auditable; update when a subsystem gains a
# cheaper representative.  `python -m pytest tests/ -m smoke -q`
SMOKE = {
    "test_checkpoint.py::test_checkpoint_roundtrip",          # orbax ckpt
    "test_cli.py::test_load_config_override_coercions",       # config system
    "test_convert.py::test_clip_resblock_conversion",         # torch converters
    "test_cross_scoring.py::test_csv_roundtrips_through_reference_parser",
    "test_data.py::test_pair_dataset_batches",                # datasets/collate
    "test_device_augment.py::test_forced_flips_mirror_images_and_corrs",
    "test_flash.py::test_fused_mha_lanes_matches_einsum",     # fused MHA kernel
    "test_geometry.py::test_kabsch_recovers_pose",            # geometry core
    "test_geometry.py::test_ransac_kabsch_with_outliers",     # RANSAC solver
    "test_infer.py::test_parse_camera_forms",                 # serving API
    "test_losses_train.py::test_feature_loss_perfect_match_zero_pos_loss",
    "test_losses_train.py::test_train_step_on_8_device_mesh", # DP mesh
    "test_matching.py::test_matches_agree_with_bruteforce",   # NN matching
    "test_metrics.py::test_mssd_mspd_identity_sym",           # BOP metrics
    "test_models.py::test_fusion_shapes",                     # fusion module
    "test_models.py::test_decoder_shapes_and_guidance_use",   # decoder
    "test_native.py::test_rle_roundtrip",                     # C++ extension
    "test_parity_reference.py::TestBopParity::test_mssd",     # vs reference
    "test_pipeline.py::test_pipeline_recovers_gt_pose[ransac]",
    "test_pointdsc.py::test_pointdsc_recovers_pose_with_outliers",
    "test_quant.py::test_int8_dense_close_to_f32",            # int8 path
    "test_renderer_evaluator.py::test_quad_depth_values",     # VSD rasterizer
    "test_renderer_evaluator.py::test_evaluator_perfect_pose_scores",
    "test_scripts.py::test_pcd_correspondences_exact_transform",
    "test_swin_attn.py::test_swin_stage_pad_equivalence[einsum]",
    "test_tokenizer_golden.py::test_bpe_merge_loop_hand_derived",
    "test_tp_fullscale.py::test_tp_spec_covers_full_tree",  # TP rules
    "test_smoke_meta.py::test_smoke_list_resolves",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid relative to tests/: "test_x.py::test_y[param]"
        if item.nodeid.split("/")[-1] in SMOKE:
            item.add_marker(pytest.mark.smoke)
    # staleness of the SMOKE list (renamed/removed tests) is enforced by
    # tests/test_smoke_meta.py, which is itself part of the smoke tier
