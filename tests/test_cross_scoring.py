"""Double-entry scoring: one prediction CSV scored by BOTH evaluators
(VERDICT round-1 item 8).

The reference's offline scorer (scripts/evaluation/compute_metrics.py) is
CSV parsing (dict_from_preds) + reference Evaluator.register_test over the
rebuilt dataset.  The dataset files are absent in-sandbox, so this test
drives exactly that scoring path directly: our pipeline's CSV lines are
parsed by the REFERENCE's own dict_from_preds, and the same poses are
registered through the REFERENCE utils.evaluator.Evaluator (compute_vsd
False — vispy never imported; its import is lazy behind compute_vsd,
reference utils/evaluator.py:95-97) and through OUR Evaluator.  Every
non-VSD metric list must agree per pair.

Poses are float16-quantized up front so the reference's internal fp16 casts
(evaluator.py:263) are no-ops and parity is exact; 3-point models make the
reference's my_mssd/my_mspd point-truncation (docs/PARITY.md) a no-op.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import torch  # noqa: E402

from tests._reference_shim import ref_import  # noqa: E402


def _fp16(x):
    return np.asarray(x).astype(np.float16).astype(np.float32)


def _rot(rng, scale):
    aa = rng.randn(3) * scale
    th = np.linalg.norm(aa) + 1e-12
    k = aa / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _problem(n_pairs=24, seed=3):
    rng = np.random.RandomState(seed)
    K = np.array([[591.0, 0, 322.5], [0, 590.2, 244.1], [0, 0, 1]], np.float32)
    rows = []
    for i in range(n_pairs):
        cls = "c0" if i % 2 == 0 else "c1"
        gt_a = np.eye(4)
        gt_a[:3, :3] = _rot(rng, 1.0)
        gt_a[:3, 3] = [rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                       rng.uniform(0.5, 0.9)]
        rel = np.eye(4)
        rel[:3, :3] = _rot(rng, 1.0)
        rel[:3, 3] = rng.uniform(-0.2, 0.2, 3)
        gt_q = rel @ gt_a
        # predicted relative pose: GT + noise (some good, some bad)
        noise_r = _rot(rng, 0.02 if i % 3 else 0.5)
        pred_rel = np.eye(4)
        pred_rel[:3, :3] = noise_r @ rel[:3, :3]
        pred_rel[:3, 3] = rel[:3, 3] + rng.randn(3) * (0.005 if i % 3 else 0.2)
        pred_rel = _fp16(pred_rel)
        pred_q = _fp16(pred_rel @ gt_a)
        rows.append(dict(
            cls=cls, gt_a=_fp16(gt_a), gt_q=_fp16(gt_q), pred_rel=pred_rel,
            pred_q=pred_q, iou_a=round(rng.uniform(0.2, 0.95), 3),
            iou_q=round(rng.uniform(0.2, 0.95), 3),
            id_a=f"{i} {2 * i} {cls}", id_q=f"{i} {2 * i + 1} {cls}",
            K=K))
    # 3-point models (mm), one discrete symmetry for c1
    pts = {"c0": (rng.rand(3, 3).astype(np.float32) - 0.5) * 80.0,
           "c1": (rng.rand(3, 3).astype(np.float32) - 0.5) * 60.0}
    Rz = np.diag([-1.0, -1.0, 1.0])
    syms = {"c0": [{"R": np.eye(3), "t": np.zeros((3, 1))}],
            "c1": [{"R": np.eye(3), "t": np.zeros((3, 1))},
                   {"R": Rz, "t": np.zeros((3, 1))}]}
    diams = {c: float(np.linalg.norm(
        pts[c][:, None] - pts[c][None], axis=-1).max()) for c in pts}
    return rows, pts, syms, diams


def test_csv_roundtrips_through_reference_parser(tmp_path):
    import types

    from oryon_tpu.eval.evaluator import pred_pose_csv_line
    from tests._reference_shim import ref_import_with_stubs

    # compute_metrics imports the reference's dataset classes (absent data
    # + torchvision) at module level; only its dict_from_preds parser runs
    # here, so stub the dataset module for the import
    ds_stub = types.ModuleType("datasets")
    ds_stub.NOCSDataset = ds_stub.TOYLDataset = object
    cm = ref_import_with_stubs("scripts.evaluation.compute_metrics",
                               {"datasets": ds_stub})
    rows, *_ = _problem()
    csv = tmp_path / "preds.csv"
    with open(csv, "w") as f:
        for r in rows:
            f.write(pred_pose_csv_line(r["id_a"], r["id_q"], r["iou_a"],
                                       r["iou_q"], r["pred_rel"]))
    preds, ious_a, ious_q, iou_present = cm.dict_from_preds(str(csv))
    assert iou_present and len(preds) == len(rows)
    for r in rows:
        sa, ia, _ = r["id_a"].split(" ")
        sq, iq, _ = r["id_q"].split(" ")
        key = f"{sa}_{ia}_{sq}_{iq}_{r['cls']}"
        np.testing.assert_allclose(preds[key], r["pred_rel"][:3, :], atol=1e-6)
        assert ious_a[key] == r["iou_a"] and ious_q[key] == r["iou_q"]


def test_reference_evaluator_scores_match_ours():
    rev = ref_import("utils.evaluator")
    rows, pts, syms, diams = _problem()

    # ---- reference scorer (compute_vsd=False -> no vispy) ----------------
    ref = rev.Evaluator(exp_tag="x", compute_vsd=False, compute_iou=True)
    ref.init_test()
    ref.add_object_info({c: {"pts": pts[c]} for c in pts}, diams, syms)
    for r in rows:
        ref.register_test({
            "iou_a": torch.tensor([r["iou_a"]]),
            "iou_q": torch.tensor([r["iou_q"]]),
            "gt_pose": torch.tensor(r["gt_q"]).unsqueeze(0),
            "pred_pose": torch.tensor(r["pred_q"]).unsqueeze(0),
            "pred_pose_rel": torch.tensor(r["pred_rel"]).unsqueeze(0),
            "cls_id": [r["cls"]],
            "instance_id": [r["id_a"]],
            "camera": [r["K"].reshape(-1)],
            "depth": [None],
        })

    # ---- our scorer ------------------------------------------------------
    from oryon_tpu.eval.evaluator import Evaluator, ObjectInfo
    from tests._reference_shim import install_shims
    install_shims()
    from bop_toolkit_lib.misc import format_sym_set  # reference formatter

    ours = Evaluator("x", compute_vsd=False, compute_iou=True)
    ours.add_object_info({
        c: ObjectInfo(pts[c], diams[c],
                      format_sym_set(syms[c]).astype(np.float32), mesh=None)
        for c in pts})
    ours.init_test()
    for r in rows:
        ours.register_test(r["iou_a"], r["iou_q"], r["gt_q"], r["pred_q"],
                           r["pred_rel"], camera=r["K"], depth=None,
                           cls_id=r["cls"], instance_id=r["id_a"])

    # ---- per-pair metric lists must agree --------------------------------
    keys = ["R error", "T error", "ADD(S)-0.1d", "MSSD", "MSPD",
            "Anchor IoU", "Query IoU", "Mean IoU",
            "IoU > .25", "IoU > .5", "IoU > .75",
            "Recall (5deg, 10cm)", "Recall (10deg, 20cm)",
            "Recall (15deg, 30cm)"]
    for k in keys:
        a = np.asarray(ref.metrics[k], np.float64)
        b = np.asarray(ours.metrics[k], np.float64)
        assert a.shape == b.shape, k
        tol = 2e-3 if k in ("R error", "T error") else 1e-6
        np.testing.assert_allclose(b, a, atol=tol, err_msg=k)

    # failure counts bookkeeping agrees too
    assert list(ref.counts["Failed pose"]) == list(ours.counts["Failed pose"])
    assert list(ref.counts["Zero pose"]) == list(ours.counts["Zero pose"])