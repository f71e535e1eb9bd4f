"""Round-5 verify probe: drive the public API on the real TPU device,
covering the new surfaces (ICP-default predictor, masked_icp on device).

Run: python scripts/verify_probe_r5.py  (on the axon TPU device)"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

# 1. registration slice on device: lift -> register -> refine -> score
from oryon_tpu.geometry.pcd import lift_pcd_at
from oryon_tpu.geometry.kabsch import ransac_kabsch, masked_icp
from oryon_tpu.eval.bop import mssd
rs = np.random.RandomState(0)
cam = jnp.array([600.0, 0, 320, 0, 600, 240, 0, 0, 1])
depth = jnp.array((rs.rand(480, 640) * 300 + 600).astype(np.float32))
yx = jnp.array(np.stack([rs.randint(0, 480, 256), rs.randint(0, 640, 256)], -1))
pa = lift_pcd_at(depth, cam, yx) / 1000.0
# known rigid transform
th = 0.3
R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
t = np.array([0.05, -0.02, 0.03], np.float32)
pq = pa @ R.T + t
w = jnp.ones(256)
T, n_inl = ransac_kabsch(jax.random.PRNGKey(0), pa, pq, w, num_hypotheses=256, match_err=0.001)
T = np.asarray(T)
errR = np.degrees(np.arccos(np.clip((np.trace(T[:3, :3] @ R.T) - 1) / 2, -1, 1)))
errT = np.linalg.norm(T[:3, 3] - t)
assert errR < 0.3 and errT < 3e-3, (errR, errT)  # device SVD vector noise floor ~0.06 deg/0.9 mm (see ARCHITECTURE.md precision)
print(f"ransac_kabsch on device: errR={errR:.4f} deg errT={errT*1000:.3f} mm inl={int(n_inl)}")

# masked_icp refines a perturbed pose back (new serving-default knobs)
T_pert = T.copy()
phi = np.radians(3.0)
Rp = np.array([[np.cos(phi), -np.sin(phi), 0], [np.sin(phi), np.cos(phi), 0], [0, 0, 1]], np.float32)
T_pert[:3, :3] = Rp @ T_pert[:3, :3]
va = jnp.ones(256, bool)
T_ref = np.asarray(masked_icp(pa, va, jnp.array(pq), va, jnp.array(T_pert), iters=48, trim=0.6))
errR2 = np.degrees(np.arccos(np.clip((np.trace(T_ref[:3, :3] @ R.T) - 1) / 2, -1, 1)))
assert errR2 < 0.5, errR2
print(f"masked_icp on device: 3.0 deg perturbation -> {errR2:.3f} deg")
Tgt = np.r_[np.c_[R, t[:, None]], [[0, 0, 0, 1]]].astype(np.float32)
syms = jnp.eye(3, 4)[None]  # identity symmetry only
e = float(np.asarray(mssd(jnp.array(T[:3, :3]), jnp.array(T[:3, 3]),
                          jnp.array(Tgt[:3, :3]), jnp.array(Tgt[:3, 3]),
                          pa, syms)))
print(f"mssd(recovered vs gt) = {e:.6f} m (expect ~noise floor)")
assert e < 5e-3, e

# 2. serving boundary: OryonPredictor with DEFAULT config -> icp on
from oryon_tpu.models.oryon import tiny_oryon
from oryon_tpu.utils.initshape import init_by_shape
from oryon_tpu.infer import OryonPredictor
IMG, DHW = (64, 64), (48, 64)
model = tiny_oryon()
rgb0 = jnp.zeros((1, *IMG, 3), jnp.float32)
ids0 = np.zeros((1, 8, 16), np.int32); ids0[:, :, 0] = 598; ids0[:, :, 2] = 599
params = init_by_shape(model, jax.random.PRNGKey(0), rgb0, rgb0, jnp.array(ids0))
def tok(prompt):
    a = np.zeros((8, 16), np.int32); a[:, 0] = 598; a[:, 1] = 7; a[:, 2] = 599
    return a
eng = OryonPredictor(model, params, batch_size=2, img_size=IMG, depth_hw=DHW,
                     solver="ransac", n_corrs=64, tokenize_fn=tok)
assert eng._pipe is not None
cam_s = np.array([60.0, 0, 32, 0, 60, 24, 0, 0, 1], np.float32)
def view():
    return {"rgb": (rs.rand(*IMG, 3) * 255).astype(np.uint8),
            "depth": (rs.rand(*DHW) * 300 + 600).astype(np.float32),
            "camera": cam_s, "mask": (rs.rand(*IMG) > 0.5).astype(np.uint8)}
res = eng.predict([{"anchor": view(), "query": view(), "prompt": "mug"}])[0]
Tp = np.asarray(res["pose"]); Rp2 = Tp[:3, :3]
assert np.allclose(Rp2 @ Rp2.T, np.eye(3), atol=1e-3) and np.isfinite(Tp).all()
print("OryonPredictor (default config => icp_refine on) pose OK:", np.round(Tp[:3, 3], 4))
print("VERIFY OK")
