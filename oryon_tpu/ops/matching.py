"""Masked nearest-neighbor feature matching — the inference hot path.

Reference semantics (reference: utils/pcd.py:177-216, nn_correspondences):
  1. gather mask-1 pixels (subsample to ``src_sampling`` if larger),
  2. gather ALL mask-2 pixels,
  3. full inverted-cosine distance matrix, per-source argmin + min,
  4. keep sources whose min distance < ``dist_th``,
  5. sample ``max_corrs`` of the survivors.

The reference runs this per pair on the CPU (configs/config.yaml:7).  Here it
is a statically-shaped, batched, jit-compiled device kernel:

  * source pixels: fixed-capacity random masked selection (ops/sampling.py);
  * target side: instead of gathering a ragged ROI, the argmin runs over the
    FULL feature map with masked-out pixels pushed to +inf distance —
    identical argmin, static shape;
  * the (src_cap x H*W) similarity never materializes in HBM: a lax.scan
    streams target chunks through the MXU keeping a running (min, argmin)
    — the XLA realization of the tiled Pallas design (see ops/pallas/).

Outputs are fixed-capacity correspondence buffers + validity flags; the
downstream lift/solve stages consume validity as weights, replacing the
reference's duplicate-on-resample behavior (utils/misc.py:242-254).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from oryon_tpu.geometry.pcd import unit as _unit
from oryon_tpu.ops.sampling import masked_select, masked_sample, flat_to_yx


@dataclasses.dataclass(frozen=True)
class MatchParams:
    """Static matching parameters (reference configs/config.yaml:53-61)."""

    src_capacity: int = 5120   # >= reference src_sampling=5000, MXU-aligned
    max_corrs: int = 500
    dist_th: float = 0.25
    chunk: int = 4608          # target pixels per streaming step (192*24)
    backend: str = "xla"       # "xla" (lax.scan streaming) | "pallas" (fused)
    # "bf16": bf16 multiplies + f32 accumulation on the MXU — 4.0x faster on
    # v5e (14.8 -> 3.7 ms at B=8, cap 5120 x 36864) with 99.3% identical
    # argmins and |dist| error < 1.1e-3 (near-ties only; measured).  "fp32"
    # forces full-precision passes for strict-parity runs.
    precision: str = "bf16"


class Correspondences(NamedTuple):
    yx: jnp.ndarray      # [max_corrs, 4] int32 (y1, x1, y2, x2)
    valid: jnp.ndarray   # [max_corrs] bool
    min_dist: jnp.ndarray  # [max_corrs] float32 — match distance per row


def _streaming_argmin(
    src: jnp.ndarray,        # [S, D] unit-normalized source features
    tgt: jnp.ndarray,        # [N, D] unit-normalized target features
    tgt_bad: jnp.ndarray,    # [N] bool — True where target is OUTSIDE mask
    chunk: int,
    precision: str = "bf16",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Running (min inverted-cosine distance, argmin) of src against tgt.

    Never materializes the full S x N distance matrix: scans N in chunks,
    each chunk is one MXU matmul + a fused elementwise min update.
    """
    S = src.shape[0]
    N = tgt.shape[0]
    assert N % chunk == 0, (N, chunk)
    n_steps = N // chunk
    tgt_c = tgt.reshape(n_steps, chunk, -1)
    bad_c = tgt_bad.reshape(n_steps, chunk)
    if precision == "bf16":
        src = src.astype(jnp.bfloat16)
        tgt_c = tgt_c.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST

    def step(carry, inp):
        run_min, run_arg = carry
        t, bad, base = inp
        # inverted normalized cosine distance: 0.5 * (1 - cos)
        cos = jnp.dot(src, t.T, preferred_element_type=jnp.float32,
                      precision=prec)
        dist = 0.5 * (1.0 - cos)
        dist = jnp.where(bad[None, :], jnp.inf, dist)
        cmin = jnp.min(dist, axis=1)
        carg = jnp.argmin(dist, axis=1).astype(jnp.int32) + base
        better = cmin < run_min
        return (jnp.where(better, cmin, run_min),
                jnp.where(better, carg, run_arg)), None

    init = (jnp.full((S,), jnp.inf, jnp.float32), jnp.zeros((S,), jnp.int32))
    bases = (jnp.arange(n_steps, dtype=jnp.int32) * chunk)
    (min_d, arg), _ = jax.lax.scan(step, init, (tgt_c, bad_c, bases))
    return min_d, arg


@partial(jax.jit, static_argnames=("params",))
def nn_correspondences(
    feats1: jnp.ndarray,   # [H, W, D]
    feats2: jnp.ndarray,   # [H, W, D]
    mask1: jnp.ndarray,    # [H, W] 0/1
    mask2: jnp.ndarray,    # [H, W] 0/1
    key: jax.Array,
    params: MatchParams = MatchParams(),
) -> Correspondences:
    """Masked NN matching of feature map 1 into feature map 2.

    Returns fixed-capacity (y1, x1, y2, x2) rows; rows are valid when the
    source pixel is masked AND its best match distance < params.dist_th.
    """
    H, W, D = feats1.shape
    k_src, k_out = jax.random.split(key)

    # static clamps so small feature maps work with production capacities
    src_cap = min(params.src_capacity, H * W)
    # the chunk must divide H*W; falling back to H*W would materialize the
    # full [S, HW] distance matrix (the exact blow-up streaming avoids), so
    # pick the largest divisor of H*W that is <= params.chunk instead
    chunk = params.chunk if (H * W) % params.chunk == 0 else next(
        c for c in range(min(params.chunk, H * W), 0, -1) if (H * W) % c == 0)

    src_idx, src_valid = masked_select(mask1, k_src, src_cap)
    src_yx = flat_to_yx(src_idx, W)
    src_feats = _unit(feats1.reshape(H * W, D)[src_idx].astype(jnp.float32))

    tgt_feats = _unit(feats2.reshape(H * W, D).astype(jnp.float32))
    tgt_bad = mask2.reshape(H * W) == 0

    if params.backend == "pallas":
        from oryon_tpu.ops.pallas.match_kernel import masked_argmin_pallas
        min_d, arg = masked_argmin_pallas(src_feats, tgt_feats, tgt_bad)
    else:
        min_d, arg = _streaming_argmin(src_feats, tgt_feats, tgt_bad, chunk,
                                       params.precision)
    tgt_yx = flat_to_yx(arg, W)

    good = src_valid & (min_d < params.dist_th)
    # sample max_corrs uniformly among the good rows (reference samples with
    # replacement via multinomial, utils/pcd.py:211; we sample without and
    # flag missing slots invalid)
    sel, sel_valid = masked_sample(good.astype(jnp.float32), k_out, params.max_corrs)
    rows = jnp.concatenate([src_yx[sel], tgt_yx[sel]], axis=-1)
    return Correspondences(rows, sel_valid, min_d[sel])


@partial(jax.jit, static_argnames=("chunk",))
def nn_correspondences_anchors(
    feats1: jnp.ndarray,   # [H, W, D]
    feats2: jnp.ndarray,   # [H, W, D]
    anchors: jnp.ndarray,  # [N, 2] int (y, x) source coordinates
    mask2: jnp.ndarray,    # [H, W]
    chunk: int = 4608,
) -> jnp.ndarray:
    """NN matching from fixed source coordinates (the reference debug/GT-corr
    path, utils/pcd.py:219-239).  Returns [N, 4] (y1, x1, y2, x2)."""
    H, W, D = feats1.shape
    src_feats = _unit(feats1[anchors[:, 0], anchors[:, 1]].astype(jnp.float32))
    tgt_feats = _unit(feats2.reshape(H * W, D).astype(jnp.float32))
    tgt_bad = mask2.reshape(H * W) == 0
    _, arg = _streaming_argmin(src_feats, tgt_feats, tgt_bad, chunk)
    return jnp.concatenate([anchors.astype(jnp.int32), flat_to_yx(arg, W)], axis=-1)


def nn_correspondences_batch(
    feats1: jnp.ndarray,   # [B, H, W, D]
    feats2: jnp.ndarray,
    mask1: jnp.ndarray,    # [B, H, W]
    mask2: jnp.ndarray,
    key: jax.Array,
    params: MatchParams = MatchParams(),
) -> Correspondences:
    """vmap of nn_correspondences over the pair batch."""
    keys = jax.random.split(key, feats1.shape[0])
    return jax.vmap(lambda f1, f2, m1, m2, k: nn_correspondences(f1, f2, m1, m2, k, params))(
        feats1, feats2, mask1, mask2, keys
    )
