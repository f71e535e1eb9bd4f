"""Numeric parity cross-checks against the reference's OWN torch code.

These tests import the actual reference modules from /root/reference (via
tests/_reference_shim.py), drive both the reference torch forward and our
JAX forward with converter-mapped identical random weights, and assert the
outputs agree.  This is the strongest accuracy-parity evidence available
in-sandbox (real checkpoints are absent — zero egress): if a converter
transpose, a norm placement, or an attention detail drifts, these fail.

Covered (VERDICT round-1 item 2):
  * fusion aggregator forward   (reference models/fusion.py:533-625)
  * decoder forward             (reference models/decoder.py:44-119)
  * PointDSC features + pose    (reference models/pointdsc/PointDSC.py:80-438)
  * FeatureLoss values + IoU    (reference losses.py:12-263)
  * mssd/mspd                   (reference bop_toolkit_lib/pose_error.py:370-427)
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from tests._reference_shim import ref_import, cfg_ns  # noqa: E402

torch.manual_seed(0)


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


def _sd_numpy(module, prefix=""):
    return {f"{prefix}{k}": v.detach().cpu().numpy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# fusion
# ---------------------------------------------------------------------------
class TestFusionParity:
    @pytest.fixture(scope="class")
    def pair(self):
        rf = ref_import("models.fusion")
        torch.manual_seed(1)
        ref = rf.ImageTextFusion("cpu")
        ref.eval()
        sd = _sd_numpy(ref, "fusion.")

        from oryon_tpu.models.convert import convert_fusion
        from oryon_tpu.models.fusion import FusionConfig, ImageTextFusion

        ours = ImageTextFusion(FusionConfig(), dtype=jnp.float32)
        params = jax.tree_util.tree_map(jnp.asarray, convert_fusion(sd))
        return ref, ours, params

    def test_forward(self, pair):
        ref, ours, params = pair
        rng = np.random.RandomState(0)
        B = 2
        img = rng.randn(B, 1024, 24, 24).astype(np.float32)
        text = rng.randn(B, 1, 80, 768).astype(np.float32)
        guide = rng.randn(B, 512, 24, 24).astype(np.float32)

        with torch.no_grad():
            out_ref = ref(_t(img), _t(text), [_t(guide)])  # [B, 128, 1, 24, 24]
        out_ref = out_ref[:, :, 0].permute(0, 2, 3, 1).numpy()  # NHWC

        out_j = ours.apply(params,
                           jnp.asarray(img.transpose(0, 2, 3, 1)),
                           jnp.asarray(text[:, 0]),
                           jnp.asarray(guide.transpose(0, 2, 3, 1)))
        diff = np.abs(np.asarray(out_j) - out_ref)
        scale = np.abs(out_ref).max()
        assert diff.max() <= 2e-4 * max(scale, 1.0), (
            f"fusion drift: max abs {diff.max():.3e} (out scale {scale:.2f})")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------
class TestDecoderParity:
    def test_forward(self):
        rd = ref_import("models.decoder")
        torch.manual_seed(2)
        ref = rd.StandardDecoder("cpu", extra_upsampling=True,
                                 use_guidance=True, input_dim=128,
                                 decoder_dims=[64, 32])
        ref.eval()
        sd = _sd_numpy(ref, "decoder.")

        from oryon_tpu.models.convert import convert_decoder
        from oryon_tpu.models.decoder import DecoderConfig, StandardDecoder

        ours = StandardDecoder(DecoderConfig(), dtype=jnp.float32)
        params = jax.tree_util.tree_map(jnp.asarray, convert_decoder(sd))

        rng = np.random.RandomState(3)
        B = 2
        x = rng.randn(B, 128, 1, 24, 24).astype(np.float32)
        g2 = rng.randn(B, 256, 48, 48).astype(np.float32)
        g3 = rng.randn(B, 128, 96, 96).astype(np.float32)

        with torch.no_grad():
            mask_ref, feat_ref = ref(_t(x), [None, _t(g2), _t(g3)])
        mask_ref = mask_ref[:, 0].numpy()                      # [B, 192, 192]
        feat_ref = feat_ref.permute(0, 2, 3, 1).numpy()        # NHWC

        mask_j, feat_j = ours.apply(
            params,
            jnp.asarray(x[:, :, 0].transpose(0, 2, 3, 1)),
            [None, jnp.asarray(g2.transpose(0, 2, 3, 1)),
             jnp.asarray(g3.transpose(0, 2, 3, 1))])

        fd = np.abs(np.asarray(feat_j) - feat_ref).max()
        md = np.abs(np.asarray(mask_j) - mask_ref).max()
        assert fd <= 2e-4, f"decoder featmap drift {fd:.3e}"
        assert md <= 2e-4, f"decoder mask drift {md:.3e}"


# ---------------------------------------------------------------------------
# PointDSC
# ---------------------------------------------------------------------------
class TestPointDSCParity:
    @pytest.fixture(scope="class")
    def setup(self):
        rp = ref_import("models.pointdsc.PointDSC")
        torch.manual_seed(4)
        ref = rp.PointDSC()
        ref.eval()
        sd = _sd_numpy(ref)

        from oryon_tpu.models.convert import convert_pointdsc
        from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig

        ours = PointDSC(PointDSCConfig())
        params = jax.tree_util.tree_map(jnp.asarray, convert_pointdsc(sd))

        # synthetic registration problem: 70% inliers of a rigid motion
        rng = np.random.RandomState(5)
        N = 100
        src = rng.rand(N, 3).astype(np.float32) * 0.5
        ang = np.deg2rad(25.0)
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([0.1, -0.2, 0.05], np.float32)
        tgt = src @ R.T + t
        out = rng.rand(N) < 0.3
        tgt[out] = rng.rand(int(out.sum()), 3).astype(np.float32)
        return ref, ours, params, src, tgt, R, t

    def _ref_forward(self, ref, src, tgt):
        corr_pos = torch.cat([_t(src), _t(tgt)], dim=-1)
        corr_pos = corr_pos - corr_pos.mean(0)
        data = {"corr_pos": corr_pos[None], "src_keypts": _t(src)[None],
                "tgt_keypts": _t(tgt)[None], "testing": True}
        with torch.no_grad():
            res = ref(data)
        return res["final_trans"][0].numpy(), corr_pos

    def test_encoder_features_and_confidence(self, setup):
        """The TRAINED part: NonLocalNet features + confidence MLP must match
        the reference bit-for-bit up to fp32 noise."""
        ref, ours, params, src, tgt, _, _ = setup
        _, corr_pos = self._ref_forward(ref, src, tgt)

        with torch.no_grad():
            sk, tk = _t(src)[None], _t(tgt)[None]
            src_dist = torch.norm(sk[:, :, None] - sk[:, None], dim=-1)
            compat = src_dist - torch.norm(tk[:, :, None] - tk[:, None], dim=-1)
            compat = torch.clamp(1.0 - compat ** 2 / ref.sigma_spat ** 2, min=0)
            feats_ref = ref.encoder(corr_pos[None].permute(0, 2, 1),
                                    compat).permute(0, 2, 1)[0].numpy()
            conf_ref = ref.classification(
                torch.from_numpy(feats_ref).T[None]).squeeze().numpy()

        _, state = ours.apply(
            params, jnp.asarray(src), jnp.asarray(tgt),
            jnp.ones(src.shape[0]),
            capture_intermediates=True, mutable=["intermediates"])
        inter = state["intermediates"]
        feats_j = np.asarray(inter["encoder"]["__call__"][0])
        fd = np.abs(feats_j - feats_ref).max() / max(np.abs(feats_ref).max(), 1.0)
        assert fd <= 1e-4, f"PointDSC encoder feature drift {fd:.3e}"

        conf_j = np.asarray(inter["cls3"]["__call__"][0])[:, 0]
        cd = np.abs(conf_j - conf_ref).max() / max(np.abs(conf_ref).max(), 1.0)
        assert cd <= 1e-4, f"PointDSC confidence drift {cd:.3e}"

    def test_final_pose(self, setup):
        """End-to-end solver: poses must agree (solver numerics differ by
        design — quaternion power iteration vs CPU SVD — so the bound is
        looser than the feature check but still tight in pose terms)."""
        ref, ours, params, src, tgt, R, t = setup
        T_ref, _ = self._ref_forward(ref, src, tgt)
        T_j, _, _ = ours.apply(params, jnp.asarray(src), jnp.asarray(tgt),
                               jnp.ones(src.shape[0]))
        T_j = np.asarray(T_j)

        dR = T_j[:3, :3] @ T_ref[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(T_j[:3, 3] - T_ref[:3, 3])
        assert ang <= 0.1, f"PointDSC rotation drift {ang:.4f} deg"
        assert dt <= 1e-3, f"PointDSC translation drift {dt * 1000:.3f} mm"

        # both must also recover the true motion on this 70%-inlier problem
        dRg = T_j[:3, :3] @ R.T
        ang_gt = np.degrees(np.arccos(np.clip((np.trace(dRg) - 1) / 2, -1, 1)))
        assert ang_gt <= 0.5, f"PointDSC vs GT rotation {ang_gt:.3f} deg"



class TestPointDSCStress:
    """Solver parity under hard regimes (VERDICT r2 next #8): low inlier
    rates, clustered (self-consistent-looking) outliers, and near-degenerate
    coplanar geometry — vs the reference solver
    (reference models/pointdsc/PointDSC.py:325-357).

    Per-regime pose-agreement bounds (recorded, asserted):

      regime              solver-vs-solver       both-vs-GT
      50% inliers         <= 0.1 deg / 1 mm      <= 0.5 deg
      30% inliers         <= 0.1 deg / 1 mm      <= 1.0 deg
      clustered outliers  <= 0.1 deg / 1 mm      <= 1.0 deg
      coplanar surface    <= 0.1 deg / 1 mm      <= 1.0 deg
    """

    @pytest.fixture(scope="class")
    def solvers(self):
        rp = ref_import("models.pointdsc.PointDSC")
        torch.manual_seed(4)
        ref = rp.PointDSC()
        ref.eval()
        sd = _sd_numpy(ref)

        from oryon_tpu.models.convert import convert_pointdsc
        from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig

        ours = PointDSC(PointDSCConfig())
        params = jax.tree_util.tree_map(jnp.asarray, convert_pointdsc(sd))
        return ref, ours, params

    @staticmethod
    def _motion(rng):
        ang = np.deg2rad(rng.uniform(15.0, 40.0))
        ax = rng.randn(3); ax /= np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        R = (np.eye(3) + np.sin(ang) * K
             + (1 - np.cos(ang)) * K @ K).astype(np.float32)
        t = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
        return R, t

    def _problem(self, regime):
        rng = np.random.RandomState({"inl50": 11, "inl30": 12,
                                     "clustered": 13, "coplanar": 14}[regime])
        N = 100
        if regime == "coplanar":
            # all points on one plane (z = const + tiny noise): the Kabsch
            # covariance is near rank-2; the det-correction branch decides
            src = np.concatenate(
                [rng.rand(N, 2) * 0.5,
                 np.full((N, 1), 0.25) + rng.randn(N, 1) * 1e-4],
                axis=1).astype(np.float32)
            inlier_frac = 0.7
        else:
            src = (rng.rand(N, 3) * 0.5).astype(np.float32)
            inlier_frac = {"inl50": 0.5, "inl30": 0.3,
                           "clustered": 0.5}[regime]
        R, t = self._motion(rng)
        tgt = (src @ R.T + t).astype(np.float32)
        out = rng.rand(N) >= inlier_frac
        n_out = int(out.sum())
        if regime == "clustered":
            # outliers agree with EACH OTHER (common wrong translation):
            # spectral matching must reject the consistent-looking clique
            tgt[out] = (src[out] + np.array([0.35, -0.3, 0.2],
                                            np.float32)
                        + rng.randn(n_out, 3).astype(np.float32) * 0.005)
        else:
            tgt[out] = rng.rand(n_out, 3).astype(np.float32)
        return src, tgt, R, t

    def _ref_pose(self, ref, src, tgt):
        corr_pos = torch.cat([_t(src), _t(tgt)], dim=-1)
        corr_pos = corr_pos - corr_pos.mean(0)
        data = {"corr_pos": corr_pos[None], "src_keypts": _t(src)[None],
                "tgt_keypts": _t(tgt)[None], "testing": True}
        with torch.no_grad():
            res = ref(data)
        return res["final_trans"][0].numpy()

    @pytest.mark.parametrize("regime,gt_bound", [
        ("inl50", 0.5), ("inl30", 1.0), ("clustered", 1.0),
        ("coplanar", 1.0)])
    def test_pose_agreement(self, solvers, regime, gt_bound):
        ref, ours, params = solvers
        src, tgt, R, t = self._problem(regime)
        T_ref = self._ref_pose(ref, src, tgt)
        T_j = np.asarray(ours.apply(params, jnp.asarray(src),
                                    jnp.asarray(tgt),
                                    jnp.ones(src.shape[0]))[0])

        def ang_deg(Ra, Rb):
            d = Ra @ Rb.T
            return np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2,
                                                -1, 1)))

        ang = ang_deg(T_j[:3, :3], T_ref[:3, :3])
        dt = np.linalg.norm(T_j[:3, 3] - T_ref[:3, 3])
        assert ang <= 0.1, f"{regime}: solver rotation drift {ang:.4f} deg"
        assert dt <= 1e-3, f"{regime}: solver translation drift {dt*1e3:.3f} mm"

        ang_gt = ang_deg(T_j[:3, :3], R)
        dt_gt = np.linalg.norm(T_j[:3, 3] - t)
        assert ang_gt <= gt_bound, f"{regime}: vs GT rotation {ang_gt:.3f} deg"
        assert dt_gt <= 0.01, f"{regime}: vs GT translation {dt_gt*100:.2f} cm"

# ---------------------------------------------------------------------------
# FeatureLoss
# ---------------------------------------------------------------------------
class TestFeatureLossParity:
    def test_loss_values(self):
        rl = ref_import("losses")
        args = cfg_ns({
            "loss": {"pos_margin": 0.2, "neg_margin": 0.9,
                     "neg_kernel_size": 5, "hard_negatives": True,
                     "mask_type": "dice"},
            "test": {"mask_threshold": 0.5},
        })
        ref = rl.FeatureLoss(args, "cpu")

        rng = np.random.RandomState(7)
        B, D, H, W = 2, 16, 32, 32      # H*W=1024 <= 2000: deterministic pool
        CH = CW = 48
        N = 50
        fa = rng.randn(B, D, H, W).astype(np.float32)
        fq = rng.randn(B, D, H, W).astype(np.float32)
        la = rng.randn(B, 1, H, W).astype(np.float32)
        lq = rng.randn(B, 1, H, W).astype(np.float32)
        ma = (rng.rand(B, CH, CW) > 0.6).astype(np.float32)
        mq = (rng.rand(B, CH, CW) > 0.6).astype(np.float32)
        corrs = rng.randint(0, CH, (B, N, 4)).astype(np.int64)
        valid = np.ones(B, np.int64)

        batch = {
            "corrs": torch.from_numpy(corrs),
            "valid": torch.from_numpy(valid),
            "anchor": {"rgb": torch.zeros(B, 3, CH, CW),
                       "mask": torch.from_numpy(ma)},
            "query": {"rgb": torch.zeros(B, 3, CH, CW),
                      "mask": torch.from_numpy(mq)},
        }
        net_out = {"featmap_a": _t(fa), "featmap_q": _t(fq),
                   "mask_a": _t(la), "mask_q": _t(lq)}
        with torch.no_grad():
            losses_ref, results_ref = ref(batch, net_out)

        from oryon_tpu.losses.feature_loss import (FeatureLossConfig,
                                                   feature_loss)
        cfg = FeatureLossConfig()
        out = feature_loss(
            jnp.asarray(fa.transpose(0, 2, 3, 1)),
            jnp.asarray(fq.transpose(0, 2, 3, 1)),
            jnp.asarray(la[:, 0]), jnp.asarray(lq[:, 0]),
            jnp.asarray(ma), jnp.asarray(mq),
            jnp.asarray(corrs), jnp.ones((B, N)), jnp.ones(B),
            (CH, CW), jax.random.PRNGKey(0), cfg)

        for name, w in (("mask", cfg.w_mask), ("pos", cfg.w_pos),
                        ("neg", cfg.w_neg)):
            ref_v = float(losses_ref[name])
            our_v = float(out.losses[name]) / w
            assert abs(our_v - ref_v) <= 1e-4, (
                f"{name} loss drift: ref {ref_v:.6f} vs ours {our_v:.6f}")

        iou_ref_a = results_ref["iou_a"].numpy()
        iou_ref_q = results_ref["iou_q"].numpy()
        np.testing.assert_allclose(np.asarray(out.iou_a), iou_ref_a, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.iou_q), iou_ref_q, atol=1e-5)


# ---------------------------------------------------------------------------
# BOP mssd / mspd
# ---------------------------------------------------------------------------
class TestBopParity:
    def _problem(self, seed):
        rng = np.random.RandomState(seed)
        pts = (rng.rand(400, 3) - 0.5).astype(np.float32) * 120.0  # mm scale
        aa = rng.randn(3)
        th = np.linalg.norm(aa)
        k = aa / th
        K_ = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R_gt = (np.eye(3) + np.sin(th) * K_ +
                (1 - np.cos(th)) * (K_ @ K_)).astype(np.float64)
        t_gt = (rng.rand(3) * 50 + np.array([0, 0, 600.0]))
        # small perturbation for the estimate
        aa2 = rng.randn(3) * 0.05
        th2 = np.linalg.norm(aa2)
        k2 = aa2 / th2
        K2 = np.array([[0, -k2[2], k2[1]], [k2[2], 0, -k2[0]],
                       [-k2[1], k2[0], 0]])
        R_est = ((np.eye(3) + np.sin(th2) * K2 +
                  (1 - np.cos(th2)) * (K2 @ K2)) @ R_gt)
        t_est = t_gt + rng.randn(3) * 5.0
        # identity + one discrete symmetry
        Rz = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float64)
        syms = np.stack([np.concatenate([np.eye(3), np.zeros((3, 1))], 1),
                         np.concatenate([Rz, np.zeros((3, 1))], 1)])
        K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
        return R_est, t_est, R_gt, t_gt, pts, syms, K

    # NOTE on the reference's my_mssd/my_mspd (the functions its Evaluator
    # calls, pose_error.py:370-427): their helper np_transform slices
    # ``pts[:, :3]`` on a BATCHED [1, N, 3] array (pose_error.py:349), which
    # keeps only the first THREE model points — the reference therefore
    # computes MSSD/MSPD over 3 vertices, not the full model.  The original
    # BOP functions (pose_error.py:96-150) in the same file are correct over
    # all points; our implementation matches those.  We check (a) full-set
    # values against the original BOP functions and (b) exact formula parity
    # with my_* on N=3 where the truncation is a no-op.  Documented in
    # docs/PARITY.md.

    def _syms_dicts(self, syms):
        return [{"R": s[:3, :3], "t": s[:3, 3:4]} for s in syms]

    def test_mssd(self):
        pe = ref_import("bop_toolkit_lib.pose_error")
        from oryon_tpu.eval.bop import mssd
        for seed in range(3):
            R_est, t_est, R_gt, t_gt, pts, syms, _ = self._problem(seed)
            our_v = float(mssd(jnp.asarray(R_est, jnp.float32),
                               jnp.asarray(t_est, jnp.float32),
                               jnp.asarray(R_gt, jnp.float32),
                               jnp.asarray(t_gt, jnp.float32),
                               jnp.asarray(pts), jnp.asarray(syms, jnp.float32)))
            # original BOP mssd (all points; float16 internals -> ~0.5 mm
            # noise at this 600 mm working distance)
            bop_v = pe.mssd(R_est, t_est[:, None], R_gt, t_gt[:, None],
                            pts.astype(np.float64), self._syms_dicts(syms))
            assert abs(our_v - bop_v) <= 0.7 + 1e-2 * abs(bop_v), (
                f"mssd seed {seed}: bop {bop_v:.4f} vs ours {our_v:.4f}")
            # my_mssd formula parity where its 3-point truncation is a no-op
            my_v = pe.my_mssd(R_est, t_est[:, None], R_gt, t_gt[:, None],
                              pts[:3].astype(np.float64), syms)
            our3 = float(mssd(jnp.asarray(R_est, jnp.float32),
                              jnp.asarray(t_est, jnp.float32),
                              jnp.asarray(R_gt, jnp.float32),
                              jnp.asarray(t_gt, jnp.float32),
                              jnp.asarray(pts[:3]),
                              jnp.asarray(syms, jnp.float32)))
            assert abs(our3 - my_v) <= 1e-3 * max(abs(my_v), 1.0), (
                f"my_mssd seed {seed}: ref {my_v:.4f} vs ours {our3:.4f}")

    def test_mspd(self):
        pe = ref_import("bop_toolkit_lib.pose_error")
        from oryon_tpu.eval.bop import mspd
        for seed in range(3):
            R_est, t_est, R_gt, t_gt, pts, syms, K = self._problem(seed)
            our_v = float(mspd(jnp.asarray(R_est, jnp.float32),
                               jnp.asarray(t_est, jnp.float32),
                               jnp.asarray(R_gt, jnp.float32),
                               jnp.asarray(t_gt, jnp.float32),
                               jnp.asarray(K, jnp.float32),
                               jnp.asarray(pts), jnp.asarray(syms, jnp.float32)))
            # full-set value against an fp64 replica of the original BOP
            # formula (pose_error.py:123-150).  The in-repo original mspd
            # itself cannot be called at mm scale: its float16 casts
            # (pose_error.py:140, misc.py:104) overflow (600 fx x 600 mm z
            # > 65504) and return NaN — documented in docs/PARITY.md.
            def proj(R, t):
                cam = pts.astype(np.float64) @ R.T + t
                im = cam @ K.T
                return im[:, :2] / im[:, 2:3]

            es = []
            for s in self._syms_dicts(syms):
                R_s = R_gt @ s["R"]
                t_s = (R_gt @ s["t"])[:, 0] + t_gt
                d = np.linalg.norm(proj(R_est, t_est) - proj(R_s, t_s), axis=1)
                es.append(d.max())
            bop_v = min(es)
            assert abs(our_v - bop_v) <= 1e-3 * max(abs(bop_v), 1.0), (
                f"mspd seed {seed}: bop-fp64 {bop_v:.4f} vs ours {our_v:.4f}")
            my_v = pe.my_mspd(R_est, t_est[:, None], R_gt, t_gt[:, None],
                              K, pts[:3].astype(np.float64), syms)
            our3 = float(mspd(jnp.asarray(R_est, jnp.float32),
                              jnp.asarray(t_est, jnp.float32),
                              jnp.asarray(R_gt, jnp.float32),
                              jnp.asarray(t_gt, jnp.float32),
                              jnp.asarray(K, jnp.float32),
                              jnp.asarray(pts[:3]),
                              jnp.asarray(syms, jnp.float32)))
            assert abs(our3 - my_v) <= 1e-3 * max(abs(my_v), 1.0), (
                f"my_mspd seed {seed}: ref {my_v:.4f} vs ours {our3:.4f}")
