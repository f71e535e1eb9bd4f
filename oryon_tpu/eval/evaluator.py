"""Evaluator: metric registry, failure accounting, summaries, CSV output.

Rebuilds reference utils/evaluator.py:82-433 with the same metric suite and
bookkeeping semantics (phase-specific metric sets, automatic zero-metric
failures, per-class + aggregate LaTeX rows, JSON dump) on top of the jnp
metric kernels in eval/metrics.py, eval/bop.py, and eval/renderer.py.

The prediction CSV format matches the reference byte layout
(``id_a,id_q,<12 floats>,iou_a,iou_q`` — reference pipeline.py:490-497) so
the reference's offline scorer (scripts/evaluation/compute_metrics.py) can
cross-score this framework's outputs.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, TextIO

import jax
import jax.numpy as jnp
import numpy as np

from oryon_tpu.eval.bop import (
    mspd, mspd_recall, mssd, mssd_recall, vsd_errors, vsd_recall,
)
from oryon_tpu.eval.metrics import (
    compute_add, compute_adds, rotation_translation_errors,
)
from oryon_tpu.eval.renderer import (Mesh, projected_bbox,
                                     render_depth_window)
from oryon_tpu.geometry.pcd import diameter


def _json_py(o):
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


class ObjectInfo:
    """Per-class model data (reference add_object_info, evaluator.py:106-114)."""

    def __init__(self, pts_mm: np.ndarray, diameter_mm: float,
                 syms: np.ndarray, mesh: Optional[Mesh] = None):
        self.pts = np.asarray(pts_mm, np.float32)       # [N, 3] mm
        self.diameter = float(diameter_mm)
        self.syms = np.asarray(syms, np.float32)        # [S, 3, 4]
        self.mesh = mesh                                # for VSD rendering


class Evaluator:
    POSE_RECALL_TH = [(5, 10), (10, 20), (15, 30)]

    def __init__(self, exp_tag: str, compute_vsd: bool = True,
                 compute_iou: bool = True,
                 vsd_delta: float = 15.0,
                 render_hw=(480, 640),
                 vsd_window: int = 128):
        self.exp_tag = exp_tag
        self.compute_vsd = compute_vsd
        self.compute_iou = compute_iou
        self.vsd_delta = vsd_delta
        self.vsd_taus = list(np.arange(0.05, 0.51, 0.05))
        self.render_hw = render_hw
        # batched path renders VSD depths in a window around the object's
        # projected bbox (exact, see eval/bop.vsd_errors); must cover the
        # largest GT-pose projection, guarded at flush time
        self.vsd_window = vsd_window
        self.objects: Dict = {}
        self.metrics: Dict[str, List] = {}
        self.counts: Dict[str, List] = {}
        self._diam_cache: Dict = {}

    # -- object registry ---------------------------------------------------
    def add_object_info(self, objects: Dict[object, ObjectInfo]) -> None:
        self.objects.update(objects)

    def get_obj_info(self, obj_id) -> ObjectInfo:
        return self.objects[obj_id]

    # -- phase init (reference evaluator.py:123-176) -----------------------
    def clear(self):
        self.metrics = {}
        self.counts = {}

    def init_training(self):
        self.clear()
        if self.compute_iou:
            for k in ("Anchor IoU", "Query IoU", "Mean IoU",
                      "IoU > .25", "IoU > .5", "IoU > .75"):
                self.metrics[k] = []

    def init_validation(self):
        self.init_training()
        for k in ("R error", "T error", "ADD(S)-0.1d", "MSSD", "MSPD"):
            self.metrics[k] = []
        if self.compute_vsd:
            self.metrics["VSD"] = []
            self.metrics["AR"] = []
        for k in ("Missing segm", "Failed pose", "Zero pose"):
            self.counts[k] = []
        for r, t in self.POSE_RECALL_TH:
            self.metrics[f"Recall ({r}deg, {t}cm)"] = []
        # learning-signal metrics (reference compute_fmr,
        # utils/metrics.py:59-77): registered per live pair by the pipeline
        for k in ("FMR", "Inlier rate", "Feat ratio"):
            self.metrics[k] = []

    def init_test(self):
        self.init_validation()
        self.metrics["instance_id"] = []
        self.metrics["cls_id"] = []

    # -- registration ------------------------------------------------------
    def register_train(self, iou_a: np.ndarray, iou_q: np.ndarray):
        if not self.compute_iou:
            return
        iou_a = np.atleast_1d(np.asarray(iou_a, np.float64))
        iou_q = np.atleast_1d(np.asarray(iou_q, np.float64))
        mean_iou = (iou_a + iou_q) / 2.0
        self.metrics["Anchor IoU"].extend(iou_a.tolist())
        self.metrics["Query IoU"].extend(iou_q.tolist())
        self.metrics["Mean IoU"].extend(mean_iou.tolist())
        self.metrics["IoU > .25"].extend((mean_iou > 0.25).astype(int).tolist())
        self.metrics["IoU > .5"].extend((mean_iou > 0.5).astype(int).tolist())
        self.metrics["IoU > .75"].extend((mean_iou > 0.75).astype(int).tolist())

    def register_eval(
        self,
        iou_a, iou_q,
        gt_pose: np.ndarray,        # [4,4] absolute query pose (m)
        pred_pose: np.ndarray,      # [4,4] absolute predicted query pose (m)
        pred_pose_rel: np.ndarray,  # [4,4] predicted relative pose (m)
        cls_id,
        camera: np.ndarray,         # [3,3]
        depth: Optional[np.ndarray] = None,  # [H,W] scene depth (mm) for VSD
    ):
        """One pair (reference register_eval, evaluator.py:206-289)."""
        self.register_train(iou_a, iou_q)
        pred_pose = np.asarray(pred_pose, np.float32)
        gt_pose = np.asarray(gt_pose, np.float32)
        pred_pose_rel = np.asarray(pred_pose_rel, np.float32)

        self.counts["Missing segm"].append(0)
        zero_pose = int(np.count_nonzero(pred_pose_rel) <= 1)
        failed_pose = int((pred_pose_rel == np.eye(4)).all())
        self.counts["Failed pose"].append(failed_pose)
        self.counts["Zero pose"].append(zero_pose)
        if zero_pose:
            pred_pose = np.eye(4, dtype=np.float32)

        err_R, err_T = rotation_translation_errors(
            jnp.asarray(pred_pose)[None], jnp.asarray(gt_pose)[None])
        err_R, err_T = float(err_R[0]), float(err_T[0])
        self.metrics["R error"].append(err_R)
        self.metrics["T error"].append(err_T)
        for r_th, t_th in self.POSE_RECALL_TH:
            self.metrics[f"Recall ({r_th}deg, {t_th}cm)"].append(
                float(err_R <= r_th and err_T <= t_th))

        obj = self.get_obj_info(cls_id)
        pts_m = obj.pts / 1000.0
        # per-class constant: cache it (the on-device diameter + host fetch
        # costs ~25 ms/call through the relay, per pair otherwise)
        if cls_id not in self._diam_cache:
            self._diam_cache[cls_id] = float(
                diameter(jnp.asarray(obj.pts))) / 1000.0
        add_diam = self._diam_cache[cls_id]
        if obj.syms.shape[0] > 1:
            adds = float(compute_adds(jnp.asarray(pts_m), jnp.asarray(pred_pose),
                                      jnp.asarray(gt_pose)))
        else:
            adds = float(compute_add(jnp.asarray(pts_m), jnp.asarray(pred_pose),
                                     jnp.asarray(gt_pose)))
        self.metrics["ADD(S)-0.1d"].append(float(adds <= add_diam * 0.1))

        # BOP metrics in millimeters
        K = jnp.asarray(camera, jnp.float32)
        pr, pt = jnp.asarray(pred_pose[:3, :3]), jnp.asarray(pred_pose[:3, 3] * 1000)
        gr, gt_ = jnp.asarray(gt_pose[:3, :3]), jnp.asarray(gt_pose[:3, 3] * 1000)
        syms = jnp.asarray(obj.syms)
        pts = jnp.asarray(obj.pts)
        mssd_err = mssd(pr, pt, gr, gt_, pts, syms)
        mspd_err = mspd(pr, pt, gr, gt_, K, pts, syms)
        mean_mssd = float(mssd_recall(mssd_err, obj.diameter))
        mean_mspd = float(mspd_recall(mspd_err))
        self.metrics["MSSD"].append(mean_mssd)
        self.metrics["MSPD"].append(mean_mspd)

        if self.compute_vsd:
            assert depth is not None and obj.mesh is not None, \
                "VSD needs the scene depth and the object mesh"
            # windowed gather render (same path as the batched evaluator):
            # exact for VSD and free of the scatter renderer's tile-footprint
            # hazard (which silently dropped pixels for close poses here)
            hw = self.render_hw
            window = (min(self.vsd_window, hw[0]), min(self.vsd_window, hw[1]))
            wvec = np.asarray(window, np.float32)
            lo_g, hi_g, any_g = projected_bbox(obj.mesh, gr, gt_, K, hw)
            lo_p, hi_p, any_p = projected_bbox(obj.mesh, pr, pt, K, hw)
            lo_g, hi_g = np.asarray(lo_g), np.asarray(hi_g)
            lo_p, hi_p = np.asarray(lo_p), np.asarray(hi_p)
            if bool(any_g) and ((hi_g - lo_g + 1) > wvec).any():
                need = float(((hi_g - lo_g + 1) / wvec).max())
                raise RuntimeError(
                    f"VSD render window too small: GT projection needs "
                    f"{need:.2f}x the window — increase vsd_window "
                    f"(currently {self.vsd_window}, up to the full frame)")
            lo = np.minimum(lo_g if bool(any_g) else np.full(2, 1e9),
                            lo_p if bool(any_p) else np.full(2, 1e9))
            hi = np.maximum(hi_g if bool(any_g) else np.full(2, -1e9),
                            hi_p if bool(any_p) else np.full(2, -1e9))
            if not (bool(any_g) or bool(any_p)):
                lo, hi = np.zeros(2), -np.ones(2)
            if ((hi - lo + 1) > wvec).any():
                # wild predicted pose: window can't cover both renders;
                # its VSD is ~0 anyway (same policy as the batched path)
                mean_vsd = 0.0
            else:
                origin = jnp.asarray(np.clip(
                    lo, 0, [hw[0] - window[0], hw[1] - window[1]]
                ).astype(np.int32))
                d_est = render_depth_window(obj.mesh, pr, pt, K, origin,
                                            window)
                d_gt = render_depth_window(obj.mesh, gr, gt_, K, origin,
                                           window)
                d_win = jax.lax.dynamic_slice(
                    jnp.asarray(depth, jnp.float32),
                    (origin[0], origin[1]), window)
                errs = vsd_errors(d_est, d_gt, d_win, K, self.vsd_delta,
                                  self.vsd_taus, obj.diameter, origin=origin)
                mean_vsd = float(vsd_recall(errs))
            self.metrics["VSD"].append(mean_vsd)
            self.metrics["AR"].append((mean_mssd + mean_mspd + mean_vsd) / 3.0)

    def register_test(self, *args, instance_id=None, cls_id=None, **kw):
        self.register_eval(*args, cls_id=cls_id, **kw)
        self.metrics["cls_id"].append(cls_id)
        self.metrics["instance_id"].append(instance_id)

    def register_valid_failure(self, iou_a, iou_q):
        """Automatic zero-metric failure (reference evaluator.py:296-328)."""
        self.metrics["R error"].append(0.0)
        self.metrics["T error"].append(0.0)
        self.metrics["ADD(S)-0.1d"].append(0.0)
        if self.compute_vsd:
            self.metrics["VSD"].append(0.0)
            self.metrics["AR"].append(0.0)
        self.metrics["MSSD"].append(0.0)
        self.metrics["MSPD"].append(0.0)
        if self.compute_iou:
            # one failure = one row in EVERY metric list (vector inputs are
            # reduced; extending Anchor/Query IoU by k rows while the other
            # lists grow by 1 would desynchronize get_obj_means indexing)
            self.metrics["Anchor IoU"].append(float(np.mean(iou_a)))
            self.metrics["Query IoU"].append(float(np.mean(iou_q)))
            self.metrics["Mean IoU"].append(0.0)
            self.metrics["IoU > .25"].append(0.0)
            self.metrics["IoU > .5"].append(0.0)
            self.metrics["IoU > .75"].append(0.0)
        self.counts["Missing segm"].append(1)
        self.counts["Failed pose"].append(0)
        self.counts["Zero pose"].append(0)
        for r, t in self.POSE_RECALL_TH:
            self.metrics[f"Recall ({r}deg, {t}cm)"].append(0)

    def register_test_failure(self, iou_a, iou_q, cls_id=None, instance_id=None):
        self.register_valid_failure(iou_a, iou_q)
        self.metrics["cls_id"].append(cls_id)
        self.metrics["instance_id"].append(instance_id)

    def register_signal(self, fmr_vals, inlier_vals, feat_ratio_vals=None):
        """Learning-signal metrics per live pair: FMR at GT corrs + the
        geometric inlier rate of predicted matches (computed on-device by
        the pipeline; reference compute_fmr, utils/metrics.py:59-77).

        ``feat_ratio_vals``: the continuous feature inlier RATIO behind the
        binary FMR — the discriminative curve (binary FMR saturates at 1.0
        even untrained when features are smooth)."""
        self.metrics["FMR"].extend(
            np.atleast_1d(np.asarray(fmr_vals, np.float64)).tolist())
        self.metrics["Inlier rate"].extend(
            np.atleast_1d(np.asarray(inlier_vals, np.float64)).tolist())
        if feat_ratio_vals is not None:
            self.metrics["Feat ratio"].extend(
                np.atleast_1d(np.asarray(feat_ratio_vals,
                                         np.float64)).tolist())

    # -- summaries ---------------------------------------------------------
    def get_means(self) -> Dict[str, float]:
        means = {}
        for name, value in self.metrics.items():
            if name not in ("cls_id", "instance_id") and len(value) > 0:
                means[name] = float(np.asarray(value, np.float64).mean())
        return means

    def get_obj_means(self, cls_id) -> Dict[str, float]:
        idxs = np.asarray([c == cls_id for c in self.metrics["cls_id"]])
        means = {}
        for name, value in self.metrics.items():
            if name not in ("cls_id", "instance_id") and len(value) > 0:
                means[name] = float(np.asarray(value, np.float64)[idxs].mean())
        return means

    def _latex_row(self, tag: str, means: Dict[str, float]) -> str:
        if self.compute_vsd:
            row = (f"{tag} & {means['AR']*100:.1f} & {means['VSD']*100:.1f} & "
                   f"{means['MSSD']*100:.1f} & {means['MSPD']*100:.1f} & "
                   f"{means['ADD(S)-0.1d']*100:.1f} &")
        else:
            row = (f"{tag} & - & - & {means['MSSD']*100:.1f} & "
                   f"{means['MSPD']*100:.1f} & {means['ADD(S)-0.1d']*100:.1f} &")
        row += f" {means['Mean IoU']*100:.1f} \\\\" if self.compute_iou else " - \\\\"
        return row

    def get_latex_str(self) -> str:
        return self._latex_row(self.exp_tag, self.get_means())

    def test_summary(self) -> List[str]:
        rows = []
        for cls_id in sorted(set(self.metrics["cls_id"]), key=str):
            rows.append(self._latex_row(str(cls_id), self.get_obj_means(cls_id)))
        return rows

    def save(self, fp: TextIO) -> None:
        out = dict(self.metrics)
        out.update(self.counts)
        # registered ids/values may be numpy scalars (e.g. shapenet6d int64
        # class ids); coerce so the metrics JSON is always writable
        json.dump(out, fp, default=_json_py)


def pred_pose_csv_line(id_a: str, id_q: str, iou_a: float, iou_q: float,
                       pred_pose: np.ndarray) -> str:
    """Reference CSV line (pipeline.py:490-497)."""
    pose_str = " ".join(str(n) for n in np.asarray(pred_pose)[:3, :].flatten())
    return ",".join([id_a, id_q, pose_str, str(iou_a), str(iou_q)]) + "\n"


class BatchedEvaluator(Evaluator):
    """Evaluator with a batched fast path.

    The per-pair API above mirrors the reference exactly but pays one
    device->host round trip per metric call — through this environment's
    device tunnel that is ~25 ms/call, i.e. minutes over a 2000-pair sweep.
    ``register_test_batch`` groups pairs by object class and runs ONE shared
    jitted metric program (R/T errors, ADD(S)-0.1d, MSSD/MSPD recalls,
    optional batched VSD renders), fetching each batch with a single host
    copy.  Per-class data (model points, symmetry set, render mesh) rides in
    as padded ARGUMENTS rather than closure constants, and batch sizes are
    bucketed to powers of two — so a 34-class sweep compiles a handful of
    programs instead of O(classes x batch-sizes) variants.  Padding is
    value-neutral by construction: points/symmetries pad by REPEATING real
    rows (max/min unchanged; ADD means are validity-weighted), mesh faces
    pad with face_valid=False rows.  Values are identical to the per-pair
    path (same kernels, vmapped) — pinned by the equivalence test."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._cls_tensors: Dict = {}
        self._caps = None
        self._runner = None
        # deferred-fetch queue: device->host copies cost ~25 ms each through
        # the relay; registration only ENQUEUES the device result arrays and
        # flush() fetches them (one stacked array per class group) when the
        # summary is actually needed — the sweep loop never blocks on eval
        self._pending: List = []
        self._fp_checked = False

    @staticmethod
    def _up8(n: int) -> int:
        return max(8, -(-int(n) // 8) * 8)

    def _capacities(self):
        if self._caps is None:
            objs = [self.get_obj_info(c) for c in self.objects]
            if not objs:
                raise RuntimeError("register objects before batched scoring")
            Pcap = self._up8(max(o.pts.shape[0] for o in objs))
            Scap = max(int(o.syms.shape[0]) for o in objs)
            if self.compute_vsd:
                Vcap = self._up8(max(int(o.mesh.vertices.shape[0]) for o in objs))
                Fcap = self._up8(max(int(o.mesh.faces.shape[0]) for o in objs))
            else:
                Vcap, Fcap = 8, 8
            self._caps = (Pcap, Scap, Vcap, Fcap)
        return self._caps

    def _tensors(self, cls_id):
        """Padded per-class arrays (cached): pts/weights/syms/mesh/diameters."""
        if cls_id in self._cls_tensors:
            return self._cls_tensors[cls_id]
        Pcap, Scap, Vcap, Fcap = self._capacities()
        obj = self.get_obj_info(cls_id)
        P = obj.pts.shape[0]
        pts = np.concatenate([obj.pts, np.tile(obj.pts[:1], (Pcap - P, 1))])
        ptsw = np.concatenate([np.ones(P, np.float32), np.zeros(Pcap - P, np.float32)])
        S = obj.syms.shape[0]
        syms = np.concatenate([obj.syms, np.tile(obj.syms[:1], (Scap - S, 1, 1))])
        if self.compute_vsd:
            mesh = obj.mesh
            V = int(mesh.vertices.shape[0])
            F = int(mesh.faces.shape[0])
            mv = np.zeros((Vcap, 3), np.float32)
            mv[:V] = np.asarray(mesh.vertices)
            mf = np.zeros((Fcap, 3), np.int32)
            mf[:F] = np.asarray(mesh.faces)
            mfv = np.zeros(Fcap, bool)
            mfv[:F] = np.asarray(mesh.face_valid)
        else:
            mv = np.zeros((Vcap, 3), np.float32)
            mf = np.zeros((Fcap, 3), np.int32)
            mfv = np.zeros(Fcap, bool)
        add_diam = float(np.asarray(diameter(jnp.asarray(obj.pts)))) / 1000.0
        t = dict(pts=pts.astype(np.float32), ptsw=ptsw,
                 syms=syms.astype(np.float32), mv=mv, mf=mf, mfv=mfv,
                 diam=np.float32(obj.diameter), add_diam=np.float32(add_diam),
                 symmetric=np.bool_(S > 1))
        self._cls_tensors[cls_id] = t
        return t

    def _shared_fn(self):
        """The one jitted metric program (recompiles only per batch bucket)."""
        if self._runner is not None:
            return self._runner
        import jax

        from oryon_tpu.eval.metrics import compute_add as _add
        from oryon_tpu.eval.metrics import compute_adds as _adds

        delta, taus = self.vsd_delta, self.vsd_taus
        hw = self.render_hw
        window = (min(self.vsd_window, hw[0]), min(self.vsd_window, hw[1]))
        compute_vsd = self.compute_vsd

        @jax.jit
        def run(pred, gt, K, depth, pts, ptsw, syms, mv, mf, mfv,
                diam, add_diam, symmetric):
            """pred/gt [B,4,4] (m); K [B,3,3]; depth [B,H,W]; class tensors
            padded to the evaluator-wide capacities."""
            errR, errT = rotation_translation_errors(pred, gt)
            pts_m = pts / 1000.0
            add_v = jax.vmap(lambda p, g: _add(pts_m, p, g, ptsw))(pred, gt)
            adds_v = jax.vmap(lambda p, g: _adds(pts_m, p, g, ptsw))(pred, gt)
            adds = jnp.where(symmetric, adds_v, add_v)
            add_ok = (adds <= add_diam * 0.1).astype(jnp.float32)

            def one(p, g, k):
                pr, pt = p[:3, :3], p[:3, 3] * 1000
                gr, gt_ = g[:3, :3], g[:3, 3] * 1000
                m1 = mssd_recall(mssd(pr, pt, gr, gt_, pts, syms), diam)
                m2 = mspd_recall(mspd(pr, pt, gr, gt_, k, pts, syms))
                return m1, m2

            mssd_r, mspd_r = jax.vmap(one)(pred, gt, K)
            if compute_vsd:
                mesh = Mesh(mv, mf, mfv)

                def one_vsd(p, g, k, d):
                    pr, pt = p[:3, :3], p[:3, 3] * 1000
                    gr, gt_ = g[:3, :3], g[:3, 3] * 1000
                    # windowed gather renders around the combined projected
                    # bbox (exact for VSD; ~7x cheaper than the full-frame
                    # scatter z-buffer on TPU — see renderer.py)
                    lo_g, hi_g, any_g = projected_bbox(mesh, gr, gt_, k, hw)
                    lo_p, hi_p, any_p = projected_bbox(mesh, pr, pt, k, hw)
                    big = jnp.full(2, 1e9, jnp.float32)
                    lo_c = jnp.minimum(jnp.where(any_g, lo_g, big),
                                       jnp.where(any_p, lo_p, big))
                    hi_c = jnp.maximum(jnp.where(any_g, hi_g, -big),
                                       jnp.where(any_p, hi_p, -big))
                    any_c = any_g | any_p
                    lo_c = jnp.where(any_c, lo_c, jnp.zeros(2, jnp.float32))
                    hi_c = jnp.where(any_c, hi_c, -jnp.ones(2, jnp.float32))
                    # window-coverage guards (host-checked, _check_footprints):
                    # GT bbox exceeding the window is a configuration error
                    # (raise: increase vsd_window); the COMBINED bbox
                    # overflowing from a wild predicted pose only invalidates
                    # that pair (its VSD recall is zeroed)
                    wvec = jnp.asarray(window, jnp.float32)
                    fp = jnp.max((hi_g - lo_g + 1.0) / wvec)
                    fpp = jnp.max((hi_c - lo_c + 1.0) / wvec)
                    lim = jnp.asarray([hw[0] - window[0], hw[1] - window[1]],
                                      jnp.float32)
                    origin = jnp.clip(lo_c, 0.0, lim).astype(jnp.int32)
                    d_est = render_depth_window(mesh, pr, pt, k, origin,
                                                window)
                    d_gt = render_depth_window(mesh, gr, gt_, k, origin,
                                               window)
                    d_win = jax.lax.dynamic_slice(d, (origin[0], origin[1]),
                                                  window)
                    return vsd_recall(vsd_errors(d_est, d_gt, d_win, k, delta,
                                                 taus, diam,
                                                 origin=origin)), fp, fpp

                vsd_r, fp, fpp = jax.vmap(one_vsd)(pred, gt, K, depth)
            else:
                vsd_r = jnp.zeros_like(mssd_r)
                fp = jnp.zeros_like(mssd_r)
                fpp = jnp.zeros_like(mssd_r)
            # ONE stacked array -> one device->host fetch per class group
            return jnp.stack([errR, errT, add_ok, mssd_r, mspd_r, vsd_r, fp,
                              fpp], axis=1)

        self._runner = run
        return run

    def register_test_batch(self, iou_a, iou_q, gt_pose, pred_pose,
                            pred_pose_rel, cls_ids, cameras, depths,
                            instance_ids, depth_index=None):
        """Batched registration; semantics of N register_test calls.

        ``depths`` may be a host array indexed like the batch, or (with
        ``depth_index``) a DEVICE-resident array (any integer dtype) indexed
        by ``depth_index[sel]`` — gathered and cast on-device, so the depth
        image never crosses the host boundary."""
        B = len(cls_ids)
        assert depths is not None or not self.compute_vsd, \
            "VSD needs scene depths (same contract as register_eval)"
        pred_pose = np.asarray(pred_pose, np.float32).copy()
        pred_pose_rel = np.asarray(pred_pose_rel, np.float32)
        gt_pose = np.asarray(gt_pose, np.float32)
        zero = (np.count_nonzero(pred_pose_rel.reshape(B, -1), axis=1) <= 1)
        failed = np.all(pred_pose_rel == np.eye(4, dtype=np.float32), axis=(1, 2))
        pred_pose[zero] = np.eye(4, dtype=np.float32)

        by_cls: Dict = {}
        for i, c in enumerate(cls_ids):
            by_cls.setdefault(c, []).append(i)

        run = self._shared_fn()
        cameras = np.asarray(cameras, np.float32)
        pending = []
        for c, idxs in by_cls.items():
            t = self._tensors(c)
            sel = np.asarray(idxs)
            n = len(sel)
            # next power of two, floored at 8: tiny groups (a batch where
            # most pairs failed detection) would otherwise materialize
            # bucket-4/2/1 program variants mid-sweep — each first-seen
            # shape stalls the epoch on a compile/cache-load through the
            # relay, far more than the <=7 padded rows cost to render
            # (metric program is ~4 ms/8 rows)
            bucket = max(8, 1 << (n - 1).bit_length())
            padded = np.concatenate([sel, np.repeat(sel[:1], bucket - n)])
            if depths is None:
                d = jnp.zeros((bucket,) + self.render_hw, jnp.float32)
            elif depth_index is not None:
                d = jnp.take(jnp.asarray(depths), jnp.asarray(depth_index[padded]),
                             axis=0).astype(jnp.float32)
            else:
                d = jnp.asarray(np.asarray(depths, np.float32)[padded])
            out = run(jnp.asarray(pred_pose[padded]), jnp.asarray(gt_pose[padded]),
                      jnp.asarray(cameras[padded]), jnp.asarray(d),
                      t["pts"], t["ptsw"], t["syms"], t["mv"], t["mf"],
                      t["mfv"], t["diam"], t["add_diam"], t["symmetric"])
            pending.append((sel, out))  # keep device arrays; fetch in flush()
        self._pending.append(dict(
            pending=pending, B=B, iou_a=np.asarray(iou_a),
            iou_q=np.asarray(iou_q), cls_ids=list(cls_ids),
            instance_ids=list(instance_ids), failed=failed, zero=zero))
        if self.compute_vsd and not self._fp_checked:
            # fail fast on window-capacity errors: the GT-pose bbox
            # hazard is object-size/scene-depth-dominated, so checking the
            # FIRST batch synchronously catches a too-small window immediately
            # instead of at flush() after the whole sweep (one extra
            # fetch, once — the first batch is compile-dominated anyway)
            self._check_footprints(self._materialize(self._pending[-1]),
                                   self._pending[-1])
            self._fp_checked = True

    @staticmethod
    def _materialize(item) -> np.ndarray:
        res = np.zeros((item["B"], 8), np.float64)
        for sel, out in item["pending"]:
            res[sel] = np.asarray(out)[: len(sel)]
        return res

    def _check_footprints(self, res: np.ndarray, item) -> np.ndarray:
        """Render-window coverage guard (render_depth_window).

        GT-pose overflow (the GT projection's bbox exceeding the render
        window) means ``vsd_window`` is configured too small for the
        dataset — a configuration error: raise.  Combined-bbox overflow
        from a wild predicted pose (object rendered far from the GT, or
        far closer to the camera than any GT pose ever gets) only
        invalidates that pair's windowed render; the caller zeroes those
        VSD recalls (a pose in that regime is grossly wrong, so its
        recall would be ~0 anyway).  Zero/failure poses were replaced by
        identity (bogus bbox) and are excluded.  Returns the
        pred-overflow row mask."""
        fp_gt = res[:, 6]
        if fp_gt.max() > 1.0:
            i = int(fp_gt.argmax())
            raise RuntimeError(
                f"VSD render window too small: GT projection of class "
                f"{item['cls_ids'][i]!r} needs {fp_gt[i]:.2f}x the "
                f"window — increase vsd_window (currently "
                f"{self.vsd_window}, up to the full frame)")
        real = ~(np.asarray(item["failed"], bool)
                 | np.asarray(item["zero"], bool))
        return real & (res[:, 7] > 1.0)

    def flush(self) -> None:
        """Resolve all deferred registrations (fetches the queued device
        arrays — one per class group — and appends the host-side rows)."""
        n_fp_bad = 0
        for item in self._pending:
            B = item["B"]
            res = self._materialize(item)
            if self.compute_vsd:
                fp_bad = self._check_footprints(res, item)
                if fp_bad.any():
                    res[fp_bad, 5] = 0.0
                    n_fp_bad += int(fp_bad.sum())
            self.register_train(item["iou_a"], item["iou_q"])
            for i in range(B):
                self.counts["Missing segm"].append(0)
                self.counts["Failed pose"].append(int(item["failed"][i]))
                self.counts["Zero pose"].append(int(item["zero"][i]))
                errR, errT = res[i, 0], res[i, 1]
                self.metrics["R error"].append(float(errR))
                self.metrics["T error"].append(float(errT))
                for r_th, t_th in self.POSE_RECALL_TH:
                    self.metrics[f"Recall ({r_th}deg, {t_th}cm)"].append(
                        float(errR <= r_th and errT <= t_th))
                self.metrics["ADD(S)-0.1d"].append(float(res[i, 2]))
                self.metrics["MSSD"].append(float(res[i, 3]))
                self.metrics["MSPD"].append(float(res[i, 4]))
                if self.compute_vsd:
                    self.metrics["VSD"].append(float(res[i, 5]))
                    self.metrics["AR"].append(
                        float((res[i, 3] + res[i, 4] + res[i, 5]) / 3.0))
                self.metrics["cls_id"].append(item["cls_ids"][i])
                self.metrics["instance_id"].append(item["instance_ids"][i])
        if n_fp_bad:
            # one aggregate line per flush (was one per batch: a 2000-pair
            # random-weight sweep printed hundreds of identical lines)
            print(f"WARNING: {n_fp_bad} predicted pose(s) project outside "
                  "the VSD render window; their VSD recalls set to 0 "
                  "(pose grossly wrong)")
        self._pending = []

    def get_means(self):
        self.flush()
        return super().get_means()

    def get_obj_means(self, cls_id):
        self.flush()
        return super().get_obj_means(cls_id)

    def get_latex_str(self) -> str:
        self.flush()
        return super().get_latex_str()

    def test_summary(self):
        self.flush()
        return super().test_summary()

    def save(self, fp) -> None:
        self.flush()
        super().save(fp)

    def clear(self):
        self._pending = []
        super().clear()
