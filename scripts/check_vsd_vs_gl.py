#!/usr/bin/env python
"""Cross-check the production VSD rasterizer against a reference OpenGL
depth dump (VERDICT r3 missing #2 / next #4).

The reference scores VSD from depths rendered by its vispy/OpenGL renderer
(reference bop_toolkit_lib/renderer_vispy.py:512, clip-plane construction
:526-536).  Our rasterizer (oryon_tpu/eval/renderer.py render_depth_window)
is validated by formula goldens and scatter/gather equivalence, but never
against an actual GL render — this script is the pre-built comparator for
the day GL dumps (or the reference's own saved renders) are available.

Dump format — one .npz per view:
    required  K [3,3] f32, R_gt [3,3], t_gt [3] (mm), depth_gt [H,W] f32 mm
              (the GL render of the model under the GT pose)
    mesh      either vertices [V,3] (mm) + faces [F,3] int, or
              mesh_path (str) to a PLY/OBJ, resolved relative to the npz
    optional  R_est/t_est + depth_est (GL render under the estimated pose)
              and depth_test [H,W] (measured scene depth, mm): enables the
              VSD-recall-delta section; diameter (float, mm; default from
              vertices).

Produce a dump from the reference with:
    depth = ren.render_object(obj_id, R, t, fx, fy, cx, cy)['depth']
    np.savez('view.npz', K=K, R_gt=R, t_gt=t, depth_gt=depth, ...)

Usage:
    python scripts/check_vsd_vs_gl.py dump1.npz [dump2.npz ...] \
        [--window 160] [--json out.json]

Reports per dump: coverage mismatch (pixels rendered by exactly one
rasterizer), max/mean |depth| error on mutually covered pixels, and — when
the est/test arrays are present — the VSD recall computed from GL depths
vs from our depths (the number that actually moves AR).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_mesh(z, npz_path):
    from oryon_tpu.eval.renderer import Mesh, pad_mesh
    if "vertices" in z:
        V = np.asarray(z["vertices"], np.float32)
        F = np.asarray(z["faces"], np.int32)
    else:
        mesh_path = str(z["mesh_path"])
        if not os.path.isabs(mesh_path):
            mesh_path = os.path.join(os.path.dirname(npz_path), mesh_path)
        from oryon_tpu.data.meshio import load_obj, load_ply
        if mesh_path.endswith(".ply"):
            m = load_ply(mesh_path)
            V, F = m["pts"], m["faces"]
        else:
            V, F = load_obj(mesh_path)
        V = np.asarray(V, np.float32)
        F = np.asarray(F, np.int32)
    Vp, Fp, valid = pad_mesh(V, F)
    return Mesh(Vp, Fp, valid), V


def our_render(mesh, R, t, K, hw, window):
    """Production path: windowed gather rasterizer placed over the
    projected bbox, re-embedded into the full frame."""
    import jax.numpy as jnp
    from oryon_tpu.eval.renderer import projected_bbox, render_depth_window
    H, W = hw
    lo, hi, any_front = projected_bbox(mesh, jnp.asarray(R), jnp.asarray(t),
                                       jnp.asarray(K), hw=hw)
    if not bool(any_front):
        return np.zeros(hw, np.float32)
    (y0, x0), (y1, x1) = np.asarray(lo), np.asarray(hi)
    hw_need = (int(y1 - y0 + 1), int(x1 - x0 + 1))
    win = (max(window, hw_need[0] + 8), max(window, hw_need[1] + 8))
    cy, cx = (y0 + y1) // 2, (x0 + x1) // 2
    oy = int(np.clip(cy - win[0] // 2, 0, max(H - win[0], 0)))
    ox = int(np.clip(cx - win[1] // 2, 0, max(W - win[1], 0)))
    d = np.asarray(render_depth_window(
        mesh, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.asarray([oy, ox], jnp.int32),
        window=win))
    full = np.zeros(hw, np.float32)
    yl = min(win[0], H - oy)
    xl = min(win[1], W - ox)
    full[oy:oy + yl, ox:ox + xl] = d[:yl, :xl]
    return full


def compare_depths(d_gl, d_ours, label):
    both = (d_gl > 0) & (d_ours > 0)
    only_gl = int(((d_gl > 0) & ~(d_ours > 0)).sum())
    only_ours = int((~(d_gl > 0) & (d_ours > 0)).sum())
    if both.sum() == 0:
        return {"label": label, "covered_both": 0, "only_gl": only_gl,
                "only_ours": only_ours, "mean_abs_mm": float("nan"),
                "max_abs_mm": float("nan")}
    err = np.abs(d_gl[both] - d_ours[both])
    return {"label": label, "covered_both": int(both.sum()),
            "only_gl": only_gl, "only_ours": only_ours,
            "mean_abs_mm": float(err.mean()), "max_abs_mm": float(err.max()),
            "p99_abs_mm": float(np.percentile(err, 99))}


def check_dump(path, window, taus, delta):
    import jax.numpy as jnp
    from oryon_tpu.eval.bop import vsd_errors, vsd_recall
    z = np.load(path, allow_pickle=True)
    K = np.asarray(z["K"], np.float32)
    hw = tuple(np.asarray(z["depth_gt"]).shape)
    mesh, V = load_mesh(z, path)
    diameter = float(z["diameter"]) if "diameter" in z else float(
        np.linalg.norm(V.max(0) - V.min(0)))

    report = {"dump": path}
    d_gt_gl = np.asarray(z["depth_gt"], np.float32)
    d_gt_ours = our_render(mesh, z["R_gt"], z["t_gt"], K, hw, window)
    report["gt"] = compare_depths(d_gt_gl, d_gt_ours, "gt-pose render")

    if "depth_est" in z and "depth_test" in z:
        d_est_gl = np.asarray(z["depth_est"], np.float32)
        d_est_ours = our_render(mesh, z["R_est"], z["t_est"], K, hw, window)
        report["est"] = compare_depths(d_est_gl, d_est_ours, "est-pose render")
        d_test = jnp.asarray(z["depth_test"], jnp.float32)

        def recall(d_est, d_gt):
            errs = vsd_errors(jnp.asarray(d_est), jnp.asarray(d_gt), d_test,
                              jnp.asarray(K), delta, taus, diameter)
            return float(vsd_recall(errs))

        r_gl = recall(d_est_gl, d_gt_gl)
        r_ours = recall(d_est_ours, d_gt_ours)
        report["vsd_recall_gl"] = r_gl
        report["vsd_recall_ours"] = r_ours
        report["vsd_recall_delta"] = r_ours - r_gl
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dumps", nargs="+")
    ap.add_argument("--window", type=int, default=160)
    ap.add_argument("--delta", type=float, default=15.0)
    ap.add_argument("--taus", type=float, nargs="*",
                    default=[0.05 * i for i in range(1, 11)])
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    reports = []
    for p in args.dumps:
        r = check_dump(p, args.window, args.taus, args.delta)
        reports.append(r)
        g = r["gt"]
        line = (f"{p}: both={g['covered_both']}px only_gl={g['only_gl']} "
                f"only_ours={g['only_ours']} mean|dz|={g['mean_abs_mm']:.3f}mm "
                f"max|dz|={g['max_abs_mm']:.3f}mm")
        if "vsd_recall_delta" in r:
            line += (f" | VSD recall gl={r['vsd_recall_gl']:.4f} "
                     f"ours={r['vsd_recall_ours']:.4f} "
                     f"delta={r['vsd_recall_delta']:+.4f}")
        print(line)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(reports, f, indent=1)
    return reports


if __name__ == "__main__":
    main()
