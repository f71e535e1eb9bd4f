"""Contrastive feature loss + mask loss over a pair batch — fully batched.

Rebuilds reference losses.py:12-263 (FeatureLoss) without per-sample Python
loops:
  * positives: featmap gathers at GT correspondence pixels
    (reference sample_positives, losses.py:143-163) — one vmapped gather;
  * hardest negatives: per positive, the closest feature among a
    2000-candidate random pool, excluding pixels within ``neg_kernel`` px
    via a +1e6 penalty (reference sample_hardest_negatives,
    losses.py:165-220) — one [B, N, K] MXU distance matrix;
  * margins: pos 0.2 / neg 0.9 on the inverted-cosine distance
    (losses.py:91-101);
  * mask loss (dice default) + IoU of the thresholded prediction
    (losses.py:40-62).

Per-sample validity (empty corr sets) and per-corr validity (fixed-capacity
padding) both weight the means, replacing the reference's skip-by-indexing.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from oryon_tpu.geometry.pcd import unit as _unit

from oryon_tpu.eval.metrics import mask_iou
from oryon_tpu.geometry.coords import scale_coords
from oryon_tpu.losses.mask_losses import MASK_LOSSES
from oryon_tpu.ops.resize import resize_mask_nearest


@dataclasses.dataclass(frozen=True)
class FeatureLossConfig:
    pos_margin: float = 0.2
    neg_margin: float = 0.9
    neg_kernel: float = 5.0
    neg_pool: int = 2048        # reference pool 2000 (losses.py:196), aligned
    hard_negatives: bool = True
    mask_type: str = "dice"
    mask_threshold: float = 0.5
    w_mask: float = 1.0
    w_pos: float = 0.5
    w_neg: float = 0.5


class LossOutputs(NamedTuple):
    total: jnp.ndarray
    losses: Dict[str, jnp.ndarray]      # weighted components: mask/pos/neg
    iou_a: jnp.ndarray                  # [B]
    iou_q: jnp.ndarray
    pred_mask_a: jnp.ndarray            # [B, H, W] thresholded
    pred_mask_q: jnp.ndarray


def _gather_feats(featmap: jnp.ndarray, yx: jnp.ndarray) -> jnp.ndarray:
    """featmap [B, H, W, D], yx [B, N, 2] int -> [B, N, D]."""
    return jax.vmap(lambda f, c: f[c[:, 0], c[:, 1]])(featmap, yx)


def _cos_dist(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverted normalized cosine distance along the last axis."""
    an = _unit(a, eps)
    bn = _unit(b, eps)
    return 0.5 * (1.0 - jnp.sum(an * bn, axis=-1))


def _hardest_negatives(
    pos_feats: jnp.ndarray,   # [B, N, D]
    pos_yx: jnp.ndarray,      # [B, N, 2] float
    featmap: jnp.ndarray,     # [B, H, W, D]
    key: jax.Array,
    cfg: FeatureLossConfig,
) -> jnp.ndarray:
    """For each positive, the most feature-similar pool pixel outside the
    neg_kernel pixel radius. Returns [B, N, D]."""
    B, H, W, D = featmap.shape
    N = pos_feats.shape[1]
    if H * W <= cfg.neg_pool:
        # full deterministic pool — the reference only subsamples when the
        # featmap exceeds the pool budget (losses.py:195-198)
        pool_idx = jnp.broadcast_to(jnp.arange(H * W), (B, H * W))
    else:
        pool_idx = jax.random.randint(key, (B, cfg.neg_pool), 0, H * W)
    pool_feats = jax.vmap(lambda f, i: f.reshape(H * W, D)[i])(featmap, pool_idx)
    pool_yx = jnp.stack([pool_idx // W, pool_idx % W], axis=-1).astype(jnp.float32)

    pn = _unit(pos_feats)
    qn = _unit(pool_feats)
    feat_dist = 0.5 * (1.0 - jnp.einsum("bnd,bkd->bnk", pn, qn))

    d2 = jnp.sum((pos_yx[:, :, None, :] - pool_yx[:, None, :, :]) ** 2, axis=-1)
    pix_dist = jnp.sqrt(d2 + 1e-7)
    feat_dist = feat_dist + 1e6 * jax.nn.relu(cfg.neg_kernel - pix_dist)

    neg_idx = jnp.argmin(feat_dist, axis=-1)                      # [B, N]
    return jnp.take_along_axis(pool_feats, neg_idx[..., None], axis=1)


def _random_negatives(featmap, key, B, N):
    Bf, H, W, D = featmap.shape
    idx = jax.random.randint(key, (B, N), 0, H * W)
    return jax.vmap(lambda f, i: f.reshape(H * W, D)[i])(featmap, idx)


def feature_loss(
    featmap_a: jnp.ndarray,   # [B, H, W, D]
    featmap_q: jnp.ndarray,
    mask_logits_a: jnp.ndarray,  # [B, H, W]
    mask_logits_q: jnp.ndarray,
    gt_mask_a: jnp.ndarray,   # [B, Hm, Wm] (input resolution)
    gt_mask_q: jnp.ndarray,
    corrs: jnp.ndarray,       # [B, N, 4] int (y1,x1,y2,x2) in INPUT resolution
    corr_valid: jnp.ndarray,  # [B, N] bool/0-1 per-row validity
    sample_valid: jnp.ndarray,  # [B] 0/1 per-pair validity
    input_hw: Tuple[int, int],
    key: jax.Array,
    cfg: FeatureLossConfig = FeatureLossConfig(),
) -> LossOutputs:
    B, H, W, D = featmap_a.shape
    # GT corrs are in input resolution; map them to featmap resolution and
    # clamp (reference losses.py:77-79)
    fc = scale_coords(corrs.astype(jnp.float32), input_hw, (H, W))
    # per-axis clamp: rows are (y1, x1, y2, x2), x must clip against W
    fc = jnp.clip(fc, 0, jnp.array([H - 1, W - 1, H - 1, W - 1],
                                   jnp.float32)).astype(jnp.int32)
    ca, cq = fc[..., :2], fc[..., 2:]

    pos_a = _gather_feats(featmap_a, ca)
    pos_q = _gather_feats(featmap_q, cq)

    ka, kq = jax.random.split(key)
    if cfg.hard_negatives:
        neg_a = _hardest_negatives(pos_a, ca.astype(jnp.float32), featmap_a, ka, cfg)
        neg_q = _hardest_negatives(pos_q, cq.astype(jnp.float32), featmap_q, kq, cfg)
    else:
        neg_a = _random_negatives(featmap_a, ka, B, pos_a.shape[1])
        neg_q = _random_negatives(featmap_q, kq, B, pos_q.shape[1])

    dist_pos = _cos_dist(pos_a, pos_q)        # [B, N]
    dist_na = _cos_dist(pos_a, neg_a)
    dist_nq = _cos_dist(pos_q, neg_q)

    pos_l = jax.nn.relu(dist_pos - cfg.pos_margin)
    neg_la = jax.nn.relu(cfg.neg_margin - dist_na)
    neg_lq = jax.nn.relu(cfg.neg_margin - dist_nq)

    cw = corr_valid.astype(jnp.float32)       # [B, N]
    cw_sum = jnp.maximum(jnp.sum(cw, axis=1), 1.0)
    sv = sample_valid.astype(jnp.float32)     # [B]
    sv_sum = jnp.maximum(jnp.sum(sv), 1.0)

    def reduce(per_corr):
        per_sample = jnp.sum(per_corr * cw, axis=1) / cw_sum
        return jnp.sum(per_sample * sv) / sv_sum

    pos_loss = reduce(pos_l)
    neg_loss = 0.5 * (reduce(neg_la) + reduce(neg_lq))

    # mask loss at prediction resolution (GT downsampled nearest,
    # reference losses.py:48-57)
    mask_fn = MASK_LOSSES[cfg.mask_type]
    gt_a = resize_mask_nearest(gt_mask_a, (H, W)).astype(jnp.float32)
    gt_q = resize_mask_nearest(gt_mask_q, (H, W)).astype(jnp.float32)
    ml_a = mask_fn(mask_logits_a, gt_a)
    ml_q = mask_fn(mask_logits_q, gt_q)
    mask_loss = 0.5 * (ml_a + ml_q)

    pred_a = (jax.nn.sigmoid(mask_logits_a) > cfg.mask_threshold).astype(jnp.int32)
    pred_q = (jax.nn.sigmoid(mask_logits_q) > cfg.mask_threshold).astype(jnp.int32)
    iou_a = mask_iou(gt_a, pred_a)
    iou_q = mask_iou(gt_q, pred_q)

    losses = {
        "mask": cfg.w_mask * mask_loss,
        "pos": cfg.w_pos * pos_loss,
        "neg": cfg.w_neg * neg_loss,
    }
    total = losses["mask"] + losses["pos"] + losses["neg"]
    return LossOutputs(total, losses, iou_a, iou_q, pred_a, pred_q)
