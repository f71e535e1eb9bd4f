"""End-to-end inference pipeline: forward -> match -> lift -> solve -> score.

Rebuilds the reference test path (reference: pipeline.py:306-497 test_step +
get_featmap_corrs + get_pose) as ONE jitted, batched device program plus a
thin host loop for the evaluator:

  reference                               this framework
  ---------                               --------------
  per-sample Python loop over the batch   vmapped batch program
  nn_correspondences on CPU               streaming MXU argmin (ops/matching)
  per-pair PointDSC / numpy RANSAC        vmapped PointDSC / parallel RANSAC
  masks resized per sample (F.interpolate) batched nearest resize
  metric kernels in numpy per pair        evaluator on jnp kernels

Mask-source selection mirrors configs: 'predicted' thresholds the decoder
logits; 'oracle'/'ovseg' use the external masks resized to the featmap frame
(reference pipeline.py:377-394, 407-414).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oryon_tpu.data.pair_batch import PairBatch
from oryon_tpu.geometry.coords import scale_coords, valid_coords
from oryon_tpu.geometry.kabsch import ransac_kabsch
from oryon_tpu.geometry.pcd import lift_pcd_at
from oryon_tpu.models.oryon import OryonModel
from oryon_tpu.models.pointdsc import PointDSC
from oryon_tpu.ops.matching import MatchParams, nn_correspondences
from oryon_tpu.ops.resize import resize_mask_nearest


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    mask_source: str = "predicted"      # predicted | oracle | ovseg
    mask_threshold: float = 0.5
    solver: str = "pointdsc"            # pointdsc | ransac
    match: MatchParams = MatchParams()
    ransac_hypotheses: int = 1024
    ransac_match_err: float = 0.001     # reference pipeline.py:463
    debug_valid: bool = False           # GT corrs -> solver upper bound
    # Opt-in dense-geometry pose refinement (oryon_tpu extension — the
    # reference defines icp but never calls it, utils/geo6d.py:157): after
    # the correspondence solver, trimmed masked ICP between fixed-capacity
    # clouds sampled from the match masks' depth (geometry/kabsch.py
    # masked_icp).  Off by default for strict reference parity.
    icp_refine: bool = False
    icp_points: int = 512               # per-view cloud capacity
    icp_iters: int = 48
    icp_trim: float = 0.7               # kept fraction (partial overlap)
    # learning-signal metrics (reference compute_fmr, utils/metrics.py:59-77):
    # FMR over features at the GT correspondence pixels (dist = inverted
    # cosine, thresholds follow the loss margins) and the geometric inlier
    # rate of the PREDICTED matches under the GT relative pose
    fmr_dist_th: float = 0.2
    fmr_inlier_th: float = 0.05
    signal_inlier_m: float = 0.02   # ~6x the featmap-pixel quantization
                                    # floor at REAL275 scale, strict enough
                                    # that random in-mask matches score ~0


class PipelineOutputs(NamedTuple):
    pred_rel_pose: jnp.ndarray    # [B, 4, 4] predicted relative pose (m)
    pred_pose: jnp.ndarray        # [B, 4, 4] absolute query pose (m)
    n_corrs: jnp.ndarray          # [B] valid correspondence counts
    detection_valid: jnp.ndarray  # [B] bool — masks nonzero on both views
    iou_a: jnp.ndarray            # [B]
    iou_q: jnp.ndarray
    mask_a: jnp.ndarray           # [B, H, W] thresholded prediction
    mask_q: jnp.ndarray
    corrs: jnp.ndarray            # [B, N, 4] featmap-frame correspondences
    corr_valid: jnp.ndarray       # [B, N]
    packed: jnp.ndarray = None    # [B, 39] f32: rel(16) | abs(16) | n_corrs
                                  # | det | iou_a | iou_q | fmr | inlier_rate
                                  # | feat_ratio
                                  # — the host loop's whole per-batch read in
                                  # ONE fetch (device->host copies cost
                                  # ~25 ms each through the relay)
    fmr: jnp.ndarray = None          # [B] feature-match recall at GT corrs
    inlier_rate: jnp.ndarray = None  # [B] predicted-match geometric inliers
    feat_ratio: jnp.ndarray = None   # [B] continuous feature inlier ratio
                                     # (the discriminative curve behind FMR)


def _lift_corrs(
    corrs_yx: jnp.ndarray,     # [N, 4] featmap coords (y1,x1,y2,x2)
    corr_valid: jnp.ndarray,   # [N]
    depth_a: jnp.ndarray,      # [Ho, Wo] mm
    depth_q: jnp.ndarray,
    camera_a: jnp.ndarray,     # [9]
    camera_q: jnp.ndarray,
    size_a: jnp.ndarray,       # [2] original (H, W)
    size_q: jnp.ndarray,
    feat_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rescale featmap-frame corrs to original frames and lift both ends to
    3D meters (reference get_pose corr scaling + lift, pipeline.py:447-460).
    Returns (pts_a [N,3], pts_q [N,3], valid [N])."""
    Ho, Wo = depth_a.shape
    ca = scale_coords(corrs_yx[:, :2].astype(jnp.float32), feat_hw,
                      size_a.astype(jnp.float32))
    cq = scale_coords(corrs_yx[:, 2:].astype(jnp.float32), feat_hw,
                      size_q.astype(jnp.float32))
    ok = (corr_valid & valid_coords(ca, size_a) & valid_coords(cq, size_q))
    cai = jnp.clip(ca.astype(jnp.int32), 0, jnp.array([Ho - 1, Wo - 1]))
    cqi = jnp.clip(cq.astype(jnp.int32), 0, jnp.array([Ho - 1, Wo - 1]))

    pa = lift_pcd_at(depth_a, camera_a, cai) / 1000.0
    pq = lift_pcd_at(depth_q, camera_q, cqi) / 1000.0
    # zero-depth lifts are invalid matches
    ok = ok & (pa[:, 2] > 0) & (pq[:, 2] > 0)
    return pa, pq, ok


def _lift_mask_cloud(
    key: jax.Array,
    mask_f: jnp.ndarray,       # [FH, FW] 0/1 featmap-frame mask
    depth: jnp.ndarray,        # [Ho, Wo] mm
    camera: jnp.ndarray,       # [9]
    size: jnp.ndarray,         # [2] original (H, W)
    feat_hw: Tuple[int, int],
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity 3D cloud from one view's mask: sample up to
    ``capacity`` mask pixels (featmap frame), rescale to the original
    frame, lift through the depth (meters).  Returns (pts [capacity,3],
    valid [capacity])."""
    from oryon_tpu.ops.sampling import flat_to_yx, masked_select
    Ho, Wo = depth.shape
    idx, valid = masked_select(mask_f, key, capacity)
    yx = flat_to_yx(idx, mask_f.shape[1]).astype(jnp.float32)
    c = scale_coords(yx, feat_hw, size.astype(jnp.float32))
    ok = valid & valid_coords(c, size)
    ci = jnp.clip(c.astype(jnp.int32), 0, jnp.array([Ho - 1, Wo - 1]))
    p = lift_pcd_at(depth, camera, ci) / 1000.0
    return p, ok & (p[:, 2] > 0)


def _icp_refine_pose(
    key: jax.Array,
    T: jnp.ndarray,            # [4,4] solver pose (anchor -> query)
    n_corrs: jnp.ndarray,      # [] valid-corr count (refine only when >= 4)
    mask_a: jnp.ndarray,       # [FH, FW] match masks
    mask_q: jnp.ndarray,
    depth_a: jnp.ndarray,
    depth_q: jnp.ndarray,
    camera_a: jnp.ndarray,
    camera_q: jnp.ndarray,
    size_a: jnp.ndarray,
    size_q: jnp.ndarray,
    feat_hw: Tuple[int, int],
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Dense trimmed-ICP refinement of the solver pose on the masked depth
    clouds (cfg.icp_refine).  Skipped (identity on T) for pairs without a
    usable solver initialization."""
    from oryon_tpu.geometry.kabsch import masked_icp
    ka, kq = jax.random.split(key)
    pa, va = _lift_mask_cloud(ka, mask_a, depth_a, camera_a, size_a,
                              feat_hw, cfg.icp_points)
    pq, vq = _lift_mask_cloud(kq, mask_q, depth_q, camera_q, size_q,
                              feat_hw, cfg.icp_points)
    T_ref = masked_icp(pa, va, pq, vq, T, iters=cfg.icp_iters,
                       trim=cfg.icp_trim)
    return jnp.where(n_corrs >= 4, T_ref, T)


def _pose_from_corrs(
    key: jax.Array,
    corrs_yx: jnp.ndarray,     # [N, 4] featmap coords
    corr_valid: jnp.ndarray,   # [N]
    depth_a: jnp.ndarray,      # [Ho, Wo] mm
    depth_q: jnp.ndarray,
    camera_a: jnp.ndarray,     # [9]
    camera_q: jnp.ndarray,
    size_a: jnp.ndarray,       # [2] original (H, W)
    size_q: jnp.ndarray,
    feat_hw: Tuple[int, int],
    cfg: PipelineConfig,
    pointdsc: Optional[Tuple[PointDSC, Dict]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scale corrs to original frames, lift to 3D (meters), register.
    (reference get_pose, pipeline.py:429-472)."""
    pa, pq, ok = _lift_corrs(corrs_yx, corr_valid, depth_a, depth_q,
                             camera_a, camera_q, size_a, size_q, feat_hw)
    w = ok.astype(jnp.float32)

    if cfg.solver == "ransac":
        T, n_inl = ransac_kabsch(key, pa, pq, w,
                                 num_hypotheses=cfg.ransac_hypotheses,
                                 match_err=cfg.ransac_match_err)
    elif cfg.solver == "pointdsc":
        model, params = pointdsc
        T, _, _ = model.apply(params, pa, pq, w)
    else:
        raise ValueError(cfg.solver)
    return T, jnp.sum(w)


def make_pipeline_config(cfg, solver: str,
                         mask_source: Optional[str] = None) -> PipelineConfig:
    """PipelineConfig from the CLI config tree — the single source of truth
    for the cfg -> pipeline plumbing shared by run_test / run_train
    validation.  Regression guard: run_test once rebuilt this inline and
    dropped ``debug_valid``, so the GT-corr upper-bound probe (reference
    configs/config.yaml:11) silently evaluated the learned-matching path
    instead; centralizing + unit-testing the mapping prevents a recurrence.

    ``mask_source`` overrides cfg.test.mask (run_train validation always
    scores predicted masks, reference pipeline.py:196-247)."""
    from oryon_tpu.ops.matching import MatchParams

    return PipelineConfig(
        mask_source=cfg.test.mask if mask_source is None else mask_source,
        mask_threshold=cfg.test.mask_threshold,
        solver=solver,
        debug_valid=cfg.debug_valid,
        match=MatchParams(src_capacity=5120, max_corrs=cfg.test.n_corrs,
                          dist_th=cfg.test.dist_th),
        icp_refine=cfg.test.icp_refine,
        icp_points=cfg.test.icp_points,
        icp_iters=cfg.test.icp_iters,
        icp_trim=cfg.test.icp_trim,
    )


def pointdsc_snapshot_path(pretrained_dir: str) -> str:
    """Location of the pretrained PointDSC weights inside the snapshot tree
    (reference utils/pointdsc/init.py:32-40)."""
    import os

    return os.path.join(
        pretrained_dir, "snapshot/PointDSC_3DMatch_release/models/model_best.pkl")


def pointdsc_native_path(pretrained_dir: str) -> str:
    """Flax-native PointDSC weights (scripts/train_pointdsc.py output):
    a flat npz of '/'-joined variable paths across all collections."""
    import os

    return os.path.join(pretrained_dir, "native.npz")


def pointdsc_weights_available(pretrained_dir: str) -> bool:
    """True when trained PointDSC weights exist in either format — the
    protocol-solver gate used by run_test/run_train/OryonPredictor (a
    random-init solver network would produce pure-noise poses; the CLIs
    fall back to RANSAC instead, unlike the reference which crashes on the
    missing file, utils/pointdsc/init.py:32-57)."""
    import os

    return (os.path.exists(pointdsc_native_path(pretrained_dir))
            or os.path.exists(pointdsc_snapshot_path(pretrained_dir)))


def build_pointdsc_solver(pretrained_dir: str, key, n_corrs: int):
    """(model, variables) for the pretrained PointDSC registration module
    (reference utils/pointdsc/init.py:32-57).  Prefers the reference's
    3DMatch torch snapshot via the weight converter (the parity source of
    truth), then a flax-native ``native.npz`` (in-sandbox trained,
    scripts/train_pointdsc.py); random init when neither exists
    (zero-egress sandbox).  Always prints which weight source was loaded
    so a stale native.npz can't silently shadow the real checkpoint on
    asset day."""
    import os

    from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig

    native = pointdsc_native_path(pretrained_dir)
    snapshot = pointdsc_snapshot_path(pretrained_dir)
    pd = PointDSC(PointDSCConfig())
    if os.path.exists(snapshot):
        from oryon_tpu.models import convert
        pd_vars = convert.convert_pointdsc(convert.load_torch_state(snapshot))
        print(f"PointDSC weights: reference snapshot {snapshot}")
    elif os.path.exists(native):
        import numpy as np
        from flax.traverse_util import unflatten_dict

        with np.load(native) as z:
            flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
        pd_vars = unflatten_dict(flat)
        # depth is recoverable from the tree (train_pointdsc.py may train
        # shallower models than the reference's 6 blocks)
        n_layers = len({k[2] for k in flat
                        if k[:2] == ("params", "encoder")
                        and k[2].startswith("pointcn_")})
        if n_layers != pd.cfg.num_layers:
            pd = PointDSC(PointDSCConfig(num_layers=n_layers))
        print(f"PointDSC weights: in-sandbox trained {native}")
    else:
        print("WARNING: PointDSC snapshot not found; random init")
        dummy = jnp.zeros((n_corrs, 3))
        pd_vars = pd.init(key, dummy, dummy, jnp.ones(n_corrs))
    return pd, pd_vars


def make_run_fn(
    model: OryonModel,
    cfg: PipelineConfig,
    pointdsc: Optional[Tuple[PointDSC, Dict]] = None,
):
    """The pure eval program: (params, key, PairBatch, text_emb) ->
    PipelineOutputs.  Exposed separately from ``build_pipeline`` so tests
    can AOT-lower the PRODUCTION-shape program with abstract sharded
    arguments (tests/test_tp_fullscale.py) without materializing weights."""
    if cfg.solver == "pointdsc" and pointdsc is None:
        raise ValueError("pointdsc solver needs (model, params)")

    def run(params_, key: jax.Array, batch: PairBatch,
            text_emb=None) -> PipelineOutputs:
        out = model.apply(params_, batch.anchor.rgb, batch.query.rgb,
                          batch.prompt_ids, text_emb)
        B, FH, FW, _ = out.featmap_a.shape
        pred_mask_a = (jax.nn.sigmoid(out.mask_a) > cfg.mask_threshold).astype(jnp.uint8)
        pred_mask_q = (jax.nn.sigmoid(out.mask_q) > cfg.mask_threshold).astype(jnp.uint8)

        if cfg.mask_source == "predicted":
            match_mask_a, match_mask_q = pred_mask_a, pred_mask_q
        else:
            match_mask_a = resize_mask_nearest(batch.anchor.mask, (FH, FW))
            match_mask_q = resize_mask_nearest(batch.query.mask, (FH, FW))

        # IoU of predictions vs GT masks at featmap resolution
        gt_a = resize_mask_nearest(batch.anchor.mask, (FH, FW))
        gt_q = resize_mask_nearest(batch.query.mask, (FH, FW))
        from oryon_tpu.eval.metrics import mask_iou
        iou_a = mask_iou(gt_a, pred_mask_a)
        iou_q = mask_iou(gt_q, pred_mask_q)

        det_valid = ((jnp.sum(match_mask_a, axis=(1, 2)) > 0)
                     & (jnp.sum(match_mask_q, axis=(1, 2)) > 0))

        keys = jax.random.split(key, 3 * B)
        k_match, k_solve, k_icp = keys[:B], keys[B:2 * B], keys[2 * B:]

        if cfg.debug_valid:
            # GT-correspondence upper bound (reference debug_valid,
            # config.yaml:11): bypass matching, feed the annotated corrs
            # rescaled from input to featmap frame
            ih, iw = batch.anchor.rgb.shape[1:3]
            gt_fc = scale_coords(batch.corrs.astype(jnp.float32), (ih, iw),
                                 (FH, FW))
            gt_fc = jnp.clip(gt_fc, 0, jnp.array(
                [FH - 1, FW - 1, FH - 1, FW - 1],
                jnp.float32)).astype(jnp.int32)
            N = gt_fc.shape[1]
            pad = cfg.match.max_corrs - N
            if pad > 0:
                gt_fc = jnp.pad(gt_fc, ((0, 0), (0, pad), (0, 0)))
                gt_cv = jnp.pad(batch.corr_valid, ((0, 0), (0, pad)))
            else:
                gt_fc = gt_fc[:, : cfg.match.max_corrs]
                gt_cv = batch.corr_valid[:, : cfg.match.max_corrs]

            def per_pair_gt(cy, cv, ks, ki, ma, mq, da, dq, cam_a, cam_q,
                            sa, sq):
                T, n = _pose_from_corrs(ks, cy, cv, da, dq, cam_a, cam_q,
                                        sa, sq, (FH, FW), cfg, pointdsc)
                if cfg.icp_refine:
                    T = _icp_refine_pose(ki, T, n, ma, mq, da, dq, cam_a,
                                         cam_q, sa, sq, (FH, FW), cfg)
                return cy, cv, T, n

            corrs_yx, corr_valid, T_rel, n_corrs = jax.vmap(per_pair_gt)(
                gt_fc, gt_cv, k_solve, k_icp, match_mask_a, match_mask_q,
                batch.anchor.orig_depth, batch.query.orig_depth,
                batch.anchor.camera, batch.query.camera,
                batch.anchor.size, batch.query.size,
            )
        else:
            def per_pair(fa, fq, ma, mq, km, ks, ki, da, dq, cam_a, cam_q,
                         sa, sq):
                corr = nn_correspondences(fa, fq, ma, mq, km, cfg.match)
                T, n = _pose_from_corrs(ks, corr.yx, corr.valid, da, dq,
                                        cam_a, cam_q, sa, sq, (FH, FW),
                                        cfg, pointdsc)
                if cfg.icp_refine:
                    T = _icp_refine_pose(ki, T, n, ma, mq, da, dq, cam_a,
                                         cam_q, sa, sq, (FH, FW), cfg)
                return corr.yx, corr.valid, T, n

            corrs_yx, corr_valid, T_rel, n_corrs = jax.vmap(per_pair)(
                out.featmap_a, out.featmap_q, match_mask_a, match_mask_q,
                k_match, k_solve, k_icp,
                batch.anchor.orig_depth, batch.query.orig_depth,
                batch.anchor.camera, batch.query.camera,
                batch.anchor.size, batch.query.size,
            )

        # learning-signal metrics (VERDICT r2 #3): FMR over the featmaps at
        # the GT correspondence pixels, and the geometric inlier rate of the
        # PREDICTED matches under the GT relative pose.  Both answer "are
        # the contrastive features learning?" independently of the solver.
        from oryon_tpu.eval.metrics import fmr as _fmr
        ih, iw = batch.anchor.rgb.shape[1:3]
        sig_fc = scale_coords(batch.corrs.astype(jnp.float32), (ih, iw),
                              (FH, FW))
        sig_fc = jnp.clip(sig_fc, 0, jnp.array(
            [FH - 1, FW - 1, FH - 1, FW - 1], jnp.float32)).astype(jnp.int32)
        bidx = jnp.arange(B)[:, None]
        feats_gt_a = out.featmap_a[bidx, sig_fc[..., 0], sig_fc[..., 1]]
        feats_gt_q = out.featmap_q[bidx, sig_fc[..., 2], sig_fc[..., 3]]
        fmr_v, feat_ratio = _fmr(feats_gt_a, feats_gt_q, cfg.fmr_dist_th,
                                 cfg.fmr_inlier_th, w=batch.corr_valid,
                                 return_ratio=True)

        rel_gt = (batch.rel_pose if batch.rel_pose is not None
                  else jnp.broadcast_to(jnp.eye(4), (B, 4, 4)))

        def per_pair_inlier(cy, cv, da, dq, cam_a, cam_q, sa, sq, Tgt):
            pa, pq, ok = _lift_corrs(cy, cv, da, dq, cam_a, cam_q, sa, sq,
                                     (FH, FW))
            p2 = pa @ Tgt[:3, :3].T + Tgt[:3, 3]
            d = jnp.linalg.norm(p2 - pq, axis=-1)
            w = ok.astype(jnp.float32)
            return jnp.sum((d < cfg.signal_inlier_m) * w) / jnp.maximum(
                jnp.sum(w), 1.0)

        inlier_rate = jax.vmap(per_pair_inlier)(
            corrs_yx, corr_valid,
            batch.anchor.orig_depth, batch.query.orig_depth,
            batch.anchor.camera, batch.query.camera,
            batch.anchor.size, batch.query.size, rel_gt)

        # no-corr pairs report identity (registered as failure by the host)
        has_corrs = n_corrs >= 4
        eye = jnp.broadcast_to(jnp.eye(4), T_rel.shape)
        T_rel = jnp.where(has_corrs[:, None, None], T_rel, eye)
        # pose-critical compose: pin fp32 (bf16 default costs ~0.4% on
        # rotation entries, feeding every absolute-pose metric)
        pred_q = jnp.einsum("bij,bjk->bik", T_rel, batch.anchor.pose,
                            precision=jax.lax.Precision.HIGHEST)

        packed = jnp.concatenate([
            T_rel.reshape(B, 16), pred_q.reshape(B, 16),
            n_corrs.reshape(B, 1).astype(jnp.float32),
            det_valid.reshape(B, 1).astype(jnp.float32),
            iou_a.reshape(B, 1).astype(jnp.float32),
            iou_q.reshape(B, 1).astype(jnp.float32),
            fmr_v.reshape(B, 1).astype(jnp.float32),
            inlier_rate.reshape(B, 1).astype(jnp.float32),
            feat_ratio.reshape(B, 1).astype(jnp.float32),
        ], axis=1)
        return PipelineOutputs(
            pred_rel_pose=T_rel, pred_pose=pred_q,
            n_corrs=n_corrs, detection_valid=det_valid,
            iou_a=iou_a, iou_q=iou_q,
            mask_a=pred_mask_a, mask_q=pred_mask_q,
            corrs=corrs_yx, corr_valid=corr_valid,
            packed=packed, fmr=fmr_v, inlier_rate=inlier_rate,
            feat_ratio=feat_ratio,
        )

    return run


def build_pipeline(
    model: OryonModel,
    params,
    cfg: PipelineConfig,
    pointdsc: Optional[Tuple[PointDSC, Dict]] = None,
    mesh=None,
):
    """Returns a jitted fn: (key, PairBatch) -> PipelineOutputs.

    ``mesh``: optional jax.sharding.Mesh. Inference is embarrassingly
    data-parallel (no cross-pair state), so eval sweeps scale over chips by
    sharding the batch on the ``data`` axis with replicated parameters —
    the multi-chip analog of the reference's single-process test loop.
    """
    run = make_run_fn(model, cfg, pointdsc)
    from oryon_tpu.data.pair_batch import device_fields

    # params ride as a jit ARGUMENT: closing over them would bake ~1.2 GB of
    # weights into the HLO as literal constants (measured: >30 min compiles
    # through the remote-compile path vs minutes as arguments)
    jitted = jax.jit(run)

    if mesh is not None:
        from oryon_tpu.parallel import shard_batch
        from oryon_tpu.parallel.mesh import place_params
        params = place_params(params, mesh)

        def wrapped(key, batch: PairBatch, text_emb=None) -> PipelineOutputs:
            sbatch = shard_batch(device_fields(batch), mesh)
            if text_emb is not None:
                # text_emb is batch-aligned [B, P, D] -> shard like the batch
                text_emb = shard_batch(text_emb, mesh)
            return jitted(params, key, sbatch, text_emb)

        return wrapped

    def wrapped(key, batch: PairBatch, text_emb=None) -> PipelineOutputs:
        return jitted(params, key, device_fields(batch), text_emb)

    return wrapped


def _viz_tracked(viz_dir, dataset, batch, out):
    """Render tracked instances (reference pipeline.py:332-334 +
    valid_visualization:249-287): masks + correspondences."""
    import os

    from oryon_tpu.ops.resize import resize_mask_nearest
    from oryon_tpu.utils import viz

    tracked = getattr(dataset, "tracked_instances", None)
    if not tracked:
        return
    for i, iid in enumerate(batch.instance_id):
        if str(iid) not in tracked:
            continue
        rgb_a = np.asarray(batch.anchor.rgb[i])
        rgb_q = np.asarray(batch.query.rgb[i])
        if rgb_a.dtype == np.uint8:
            rgb_a = rgb_a.astype(np.float32) / 255.0
            rgb_q = rgb_q.astype(np.float32) / 255.0
        FH, FW = out.mask_a.shape[1:3]
        gt_a = np.asarray(resize_mask_nearest(batch.anchor.mask[i], (FH, FW)))
        gt_q = np.asarray(resize_mask_nearest(batch.query.mask[i], (FH, FW)))
        base = os.path.join(viz_dir, str(iid).replace(" ", "_"))
        viz.pred_mask(rgb_a, rgb_q, gt_a, gt_q,
                      np.asarray(out.mask_a[i]), np.asarray(out.mask_q[i]),
                      base + "_mask.png")
        ih, iw = rgb_a.shape[:2]
        rows = np.asarray(out.corrs[i]).astype(np.float64)
        rows[:, 0] *= ih / FH
        rows[:, 1] *= iw / FW
        rows[:, 2] *= ih / FH
        rows[:, 3] *= iw / FW
        viz.corr_set(rgb_a, rgb_q, rows, np.asarray(out.corr_valid[i]),
                     base + "_corrs.png")


def make_text_cache(model, params):
    """Per-class prompt-embedding cache: encode each distinct class's
    prompts once and reuse across the sweep (the text tower would otherwise
    rerun identical 80-template encodings for every pair of that class)."""
    import jax as _jax

    encode = _jax.jit(lambda p, ids: model.apply(
        p, ids, method=model.encode_prompts))
    cache: Dict = {}

    def get(cls_ids, prompt_ids):
        rows = []
        for i, c in enumerate(cls_ids):
            k = str(c)
            if k not in cache:
                cache[k] = encode(params, prompt_ids[i: i + 1])[0]
            rows.append(cache[k])
        return jnp.stack(rows)

    return get


def make_train_text_cache(model, params):
    """Content-keyed prompt-embedding cache for TRAINING.

    The frozen text tower re-encoding B x 80 prompt sequences was ~40% of
    the measured train step (traced — BASELINE.md); its params never change
    (optimizer partition zeroes them), so embeddings can be reused across
    steps with identical numerics.  Unlike the eval cache (per-class), keys
    are the token bytes: synset/template augmentation varies prompts per
    sample (reference datasets.py:354-367).  Holds its own copy of the
    text-tower subtree so donated train-state buffers can't invalidate it.
    """
    import jax as _jax

    sub = {"params": {"vlm_text": _jax.tree_util.tree_map(
        jnp.copy, params["params"]["vlm_text"])}}
    encode = _jax.jit(lambda p, ids: model.apply(
        p, ids, method=model.encode_prompts))
    cache: Dict = {}

    max_entries = 4096  # ~1 GB of [80, 768] f32 rows; FIFO beyond that

    def get(prompt_ids) -> jnp.ndarray:
        ids_np = np.asarray(prompt_ids)
        B = ids_np.shape[0]
        keys = [ids_np[i].tobytes() for i in range(B)]
        # dedupe misses; ONE fixed-shape [B, P, L] encode covers them all
        # (per-row encodes would serialize up to B ~50 ms program launches
        # per step on cold/augmentation-heavy epochs)
        miss: Dict = {}
        for i, k in enumerate(keys):
            if k not in cache and k not in miss:
                miss[k] = i
        if miss:
            arr = np.repeat(ids_np[:1], B, axis=0)
            mk = list(miss)
            arr[: len(mk)] = ids_np[[miss[k] for k in mk]]
            embs = encode(sub, jnp.asarray(arr))
            for j, k in enumerate(mk):
                cache[k] = embs[j]
        # gather BEFORE evicting: FIFO eviction may pop keys this batch
        # still references (the held jnp rows stay alive regardless)
        rows = jnp.stack([cache[k] for k in keys])
        while len(cache) > max_entries:
            cache.pop(next(iter(cache)))
        return rows

    return get


def run_test_epoch(
    pipeline_fn,
    dataset,
    evaluator,
    batch_size: int,
    key: jax.Array,
    csv_fp=None,
    compute_vsd: bool = True,
    text_cache=None,
    save_hook=None,
    viz_dir=None,
    loader=None,
    drain_lookahead: int = 3,
    step_profiler=None,
):
    """Host loop: iterate batches, run the device pipeline, register metrics
    (reference test_step + on_test_end, pipeline.py:306-370).

    ``loader``: optional batch iterable (e.g. data.loader.PrefetchLoader)
    so image loading/collation runs in a background thread; falls back to
    the dataset's synchronous ``batches``.

    The main thread ONLY dispatches device programs; a drain thread does the
    blocking per-batch work — the ~25 ms packed device->host fetch through
    the relay, save/viz hooks, CSV writes, and metric registration (which
    itself dispatches the batched evaluator's jitted metric programs).  The
    bounded queue (``drain_lookahead`` batches) keeps dispatch ahead of
    registration without pinning unbounded device buffers.  Ordering is
    FIFO, so CSV rows and evaluator registration order match the serial
    loop exactly."""
    import queue as _queue
    import threading

    def dispatch(batch, key):
        text_emb = (text_cache(batch.cls_id, batch.prompt_ids)
                    if text_cache is not None else None)
        return pipeline_fn(key, batch, text_emb)

    if loader is not None:
        it = iter(loader)
    else:
        it = iter(dataset.batches(batch_size, sort_by_class=True)
                  if hasattr(dataset, "batches") and
                  "sort_by_class" in dataset.batches.__code__.co_varnames
                  else dataset.batches(batch_size))

    state = {"n": 0, "err": None}
    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, drain_lookahead))

    def drain():
        while True:
            item = q.get()
            if item is None:
                return
            if state["err"] is not None:
                continue  # keep unblocking the producer until the sentinel
            bi, batch, out = item
            try:
                if save_hook is not None:
                    save_hook(bi, batch, out)
                if viz_dir is not None:
                    _viz_tracked(viz_dir, dataset, batch, out)
                state["n"] += _register_batch(evaluator, batch, out, csv_fp,
                                              compute_vsd)
            except BaseException as e:  # re-raised on the caller's thread
                state["err"] = e

    t = threading.Thread(target=drain, daemon=True,
                         name="oryon-test-drain")
    t.start()
    try:
        for bi, nxt in enumerate(it):
            if state["err"] is not None:
                break
            key, sub = jax.random.split(key)
            q.put((bi, nxt, dispatch(nxt, sub)))
            if step_profiler is not None:
                step_profiler.step()
    finally:
        q.put(None)
        t.join()
        if step_profiler is not None:
            step_profiler.close()
    if state["err"] is not None:
        raise state["err"]
    return state["n"]


def _register_batch(evaluator, batch, out, csv_fp, compute_vsd):
    from oryon_tpu.eval.evaluator import pred_pose_csv_line

    n_registered = 0
    B = batch.corrs.shape[0]
    if out.packed is not None:
        # one fetch for all per-batch scalars (6 separate np.asarray
        # calls cost ~150 ms/batch through the relay)
        packed = np.asarray(out.packed)
        pred_rel = packed[:, :16].reshape(B, 4, 4)
        pred_q = packed[:, 16:32].reshape(B, 4, 4)
        n_corrs = packed[:, 32]
        det = packed[:, 33] > 0
        iou_a = packed[:, 34]
        iou_q = packed[:, 35]
        fmr_v = packed[:, 36] if packed.shape[1] > 36 else None
        inl_v = packed[:, 37] if packed.shape[1] > 37 else None
        ratio_v = packed[:, 38] if packed.shape[1] > 38 else None
    else:
        det = np.asarray(out.detection_valid)
        n_corrs = np.asarray(out.n_corrs)
        iou_a = np.asarray(out.iou_a)
        iou_q = np.asarray(out.iou_q)
        pred_rel = np.asarray(out.pred_rel_pose)
        pred_q = np.asarray(out.pred_pose)
        fmr_v = np.asarray(out.fmr) if out.fmr is not None else None
        inl_v = (np.asarray(out.inlier_rate)
                 if out.inlier_rate is not None else None)
        ratio_v = (np.asarray(out.feat_ratio)
                   if getattr(out, "feat_ratio", None) is not None else None)
    valid = np.asarray(batch.valid)
    gt_pose_q = np.asarray(batch.query.pose)
    cameras = np.asarray(batch.query.camera).reshape(B, 3, 3)
    # depth stays DEVICE-resident for the batched path: fetching the
    # uint16 depth to host and re-uploading it as f32 costs ~15 MB of
    # tunnel traffic per batch; the batched evaluator gathers/casts
    # on-device. The per-pair fallback below still fetches.
    depths_dev = batch.query.eval_depth
    depths = None

    batched = hasattr(evaluator, "register_test_batch")
    ok_idx = [i for i in range(B)
              if valid[i] != 0 and det[i] and n_corrs[i] >= 4]
    if batched and ok_idx:
        sel = np.asarray(ok_idx)
        evaluator.register_test_batch(
            iou_a[sel], iou_q[sel], gt_pose_q[sel], pred_q[sel],
            pred_rel[sel], [batch.cls_id[i] for i in ok_idx],
            cameras[sel], depths_dev if compute_vsd else None,
            [batch.instance_id[i] for i in ok_idx],
            depth_index=sel)
    # learning-signal metrics: feature quality at GT corrs + geometric
    # inlier rate of predicted matches, for every non-padding pair
    # (independent of detection success, so the curve covers failures too)
    if (fmr_v is not None and hasattr(evaluator, "register_signal")
            and "FMR" in evaluator.metrics):
        live = [i for i in range(B) if valid[i] != 0]
        if live:
            evaluator.register_signal(
                fmr_v[live], inl_v[live],
                ratio_v[live] if ratio_v is not None else None)
    for i in range(B):
        if valid[i] == 0:  # padding rows
            continue
        n_registered += 1
        if det[i] and n_corrs[i] >= 4:
            if not batched:
                if depths is None and compute_vsd:
                    depths = np.asarray(depths_dev)
                evaluator.register_test(
                    iou_a[i], iou_q[i],
                    gt_pose=gt_pose_q[i], pred_pose=pred_q[i],
                    pred_pose_rel=pred_rel[i],
                    camera=cameras[i],
                    depth=depths[i] if compute_vsd else None,
                    cls_id=batch.cls_id[i],
                    instance_id=batch.instance_id[i],
                )
            pose_out = pred_rel[i]
        else:
            evaluator.register_test_failure(
                iou_a[i], iou_q[i], cls_id=batch.cls_id[i],
                instance_id=batch.instance_id[i])
            pose_out = np.eye(4)
        if csv_fp is not None:
            ia = batch.id_a[i] if batch.id_a is not None else batch.instance_id[i]
            iq = batch.id_q[i] if batch.id_q is not None else batch.instance_id[i]
            csv_fp.write(pred_pose_csv_line(str(ia), str(iq),
                                            float(iou_a[i]), float(iou_q[i]),
                                            pose_out))
    return n_registered
