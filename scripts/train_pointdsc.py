#!/usr/bin/env python
"""Train a PointDSC registration solver in-sandbox on synthetic problems.

The reference ships PointDSC as a pretrained 3DMatch snapshot
(reference utils/pointdsc/init.py:32-57) and only runs inference; the
snapshot cannot be downloaded here (zero egress), so the protocol solver
previously fell back to RANSAC.  This script trains the flax PointDSC
(oryon_tpu/models/pointdsc.py) from scratch on synthetic correspondence
sets — the task is self-supervising: sample a rigid transform, corrupt a
matched point set with a controlled outlier fraction and noise, and the
ground-truth inlier labels are free.

Losses follow the PointDSC recipe (Bai et al., CVPR'21; the two supervision
points the reference module exposes, models/pointdsc/PointDSC.py:137-140):
  * BCE between the confidence logits and GT inlier labels;
  * spectral-matching loss: || M - M_gt ||^2 over off-diagonal valid pairs,
    where M = relu(1 - d_f^2 / sigma^2) * spatial_compat uses the module's
    learnable sigma, and M_gt[i,j] = both-inliers.

Problem distribution matches the eval regime: scene scale ~0.1-0.4 m,
inlier rate 0.15-0.9, noise up to ~5 mm, full-range rotations.

Usage (TPU, ~10 min):
    python scripts/train_pointdsc.py steps=3000 batch=8 n=256 \
        out=pretrained_models/pointdsc
Writes <out>/native.npz — picked up by run_test/run_train/serving via
oryon_tpu.pipeline.pointdsc_weights_available.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_problem(rng: np.random.RandomState, n: int):
    """One synthetic registration problem -> (src, tgt, valid, inlier)."""
    scale = rng.uniform(0.1, 0.4)
    src = (rng.rand(n, 3) - 0.5) * scale
    # random rotation via quaternion, full range
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    t = rng.randn(3) * 0.3
    inlier_rate = rng.uniform(0.15, 0.9)
    inlier = (rng.rand(n) < inlier_rate).astype(np.float32)
    noise = rng.randn(n, 3) * rng.uniform(0.001, 0.005)
    tgt_in = src @ R.T + t + noise
    # outliers: random points in the transformed scene volume (so they are
    # not separable by coordinate range alone)
    tgt_out = ((rng.rand(n, 3) - 0.5) * scale) @ R.T + t
    tgt = np.where(inlier[:, None] > 0, tgt_in, tgt_out)
    # a few problems carry padding (valid mask), matching the fixed-capacity
    # correspondence buffers of the pipeline (ops/matching.py)
    valid = np.ones(n, np.float32)
    if rng.rand() < 0.3:
        valid[rng.randint(n // 2, n):] = 0.0
    inlier = inlier * valid
    return (src.astype(np.float32), tgt.astype(np.float32), valid, inlier,
            np.concatenate([R, t[:, None]], 1).astype(np.float32))


def make_batch(rng, b: int, n: int):
    cols = [make_problem(rng, n) for _ in range(b)]
    return tuple(np.stack([c[i] for c in cols]) for i in range(5))


def main(argv):
    args = dict(a.split("=", 1) for a in argv if "=" in a)
    steps = int(args.get("steps", 3000))
    batch = int(args.get("batch", 8))
    n = int(args.get("n", 256))
    lr = float(args.get("lr", 1e-4))
    seed = int(args.get("seed", 0))
    out = args.get("out", "pretrained_models/pointdsc")

    import jax
    if args.get("device") == "cpu":
        # sitecustomize pins JAX_PLATFORMS=axon; tests/smoke runs opt out
        # the same way tests/conftest.py does — after importing jax
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict

    from oryon_tpu.geometry.pcd import sq_dist_matrix
    from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig
    from oryon_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = PointDSCConfig(num_layers=int(args.get("layers", 6)))
    model = PointDSC(cfg)
    key = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((n, 3))
    variables = model.init(key, dummy, dummy, jnp.ones(n))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_one(p, bs, src, tgt, valid, inlier):
        # train=True: BatchNorm on batch stats (torch training semantics);
        # the updated running averages come back in the mutated collection
        # and are averaged over the vmap dim in train_step
        _, taps = model.apply(
            {"params": p, "batch_stats": bs}, src, tgt, valid, True,
            mutable=["intermediates", "batch_stats"])
        logits = taps["intermediates"]["confidence_logits"][0]
        fn = taps["intermediates"]["features"][0]
        v = valid
        nv = jnp.maximum(v.sum(), 1.0)
        # classification loss over valid rows
        bce = optax.sigmoid_binary_cross_entropy(logits, inlier)
        bce = (bce * v).sum() / nv
        # spectral-matching loss with the module's learnable sigma.
        # TPU numerics: bf16-default matmuls make x@x.T distance expansions
        # go NEGATIVE beyond any epsilon (NaN through sqrt — caught on the
        # device, invisible on CPU); use the fp32-clamped library kernel.
        sigma = p["sigma"][0]
        sim = jnp.einsum("nc,mc->nm", fn, fn,
                         precision=jax.lax.Precision.HIGHEST)
        df2 = jnp.clip(2.0 - 2.0 * sim, 0.0)
        m_feat = jax.nn.relu(1.0 - df2 / (sigma ** 2 + 1e-6))
        sd = jnp.sqrt(sq_dist_matrix(src, src) + 1e-12)
        td = jnp.sqrt(sq_dist_matrix(tgt, tgt) + 1e-12)
        compat = jnp.clip(1.0 - (sd - td) ** 2 / cfg.sigma_d ** 2, 0.0)
        vv = v[:, None] * v[None, :] * (1.0 - jnp.eye(v.shape[0]))
        m = m_feat * compat * vv
        m_gt = inlier[:, None] * inlier[None, :] * vv
        sm = ((m - m_gt) ** 2 * vv).sum() / jnp.maximum(vv.sum(), 1.0)
        return bce + sm, (bce, sm, logits, taps["batch_stats"])

    def batch_loss(p, bs, src, tgt, valid, inlier):
        (l, aux) = jax.vmap(lambda s, t, v, i: loss_one(p, bs, s, t, v, i))(
            src, tgt, valid, inlier)
        return l.mean(), aux

    @jax.jit
    def train_step(p, bs, o, src, tgt, valid, inlier):
        (l, aux), g = jax.value_and_grad(batch_loss, has_aux=True)(
            p, bs, src, tgt, valid, inlier)
        updates, o = tx.update(g, o, p)
        p = optax.apply_updates(p, updates)
        # running BN stats: average the per-sample updates over the vmap dim
        bs = jax.tree_util.tree_map(lambda x: x.mean(0), aux[3])
        # inlier-classification accuracy at threshold 0 (diagnostic)
        logits = aux[2]
        pred = (logits > 0).astype(jnp.float32)
        acc = ((pred == inlier) * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return p, bs, o, l, aux[0].mean(), aux[1].mean(), acc

    rng = np.random.RandomState(seed + 1)
    for step in range(steps):
        src, tgt, valid, inlier, _ = make_batch(rng, batch, n)
        params, batch_stats, opt_state, l, bce, sm, acc = train_step(
            params, batch_stats, opt_state, jnp.asarray(src), jnp.asarray(tgt),
            jnp.asarray(valid), jnp.asarray(inlier))
        if step % 100 == 0 or step == steps - 1:
            print(f"step {step}: loss {float(l):.4f} bce {float(bce):.4f} "
                  f"sm {float(sm):.4f} inlier-acc {float(acc):.3f}",
                  flush=True)

    # held-out registration check: rotation/translation error of the full
    # solver vs GT on fresh problems
    from oryon_tpu.models.pointdsc import batched_pointdsc
    final_vars = {"params": params, "batch_stats": batch_stats}
    solve = jax.jit(batched_pointdsc(model, final_vars))
    rng_eval = np.random.RandomState(999)
    src, tgt, valid, inlier, gt = make_batch(rng_eval, 16, n)
    T, labels, conf = solve(jnp.asarray(src), jnp.asarray(tgt),
                            jnp.asarray(valid))
    T = np.asarray(T)
    r_errs, t_errs = [], []
    for i in range(T.shape[0]):
        Rp, tp = T[i, :3, :3], T[i, :3, 3]
        Rg, tg = gt[i, :, :3], gt[i, :, 3]
        cosang = (np.trace(Rp.T @ Rg) - 1.0) / 2.0
        r_errs.append(np.degrees(np.arccos(np.clip(cosang, -1, 1))))
        t_errs.append(np.linalg.norm(tp - tg) * 100.0)
    print(f"held-out (16 problems): R err mean {np.mean(r_errs):.3f} deg "
          f"median {np.median(r_errs):.3f}; T err mean {np.mean(t_errs):.3f} cm",
          flush=True)

    os.makedirs(out, exist_ok=True)
    flat = flatten_dict(jax.device_get(final_vars))
    np.savez(os.path.join(out, "native.npz"),
             **{"/".join(k): np.asarray(v) for k, v in flat.items()})
    print(f"wrote {os.path.join(out, 'native.npz')}")


if __name__ == "__main__":
    main(sys.argv[1:])
