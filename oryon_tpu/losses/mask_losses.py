"""Segmentation losses over mask logits, batched and jit-friendly.

Formula sources (rebuilt, not ported):
  * dice   — the reference's 2-class softmax form with smooth=1, p=2 and
             0.5/0.5 class weights (reference utils/losses/dice.py:48-91);
             note softmax([x, -x]) == sigmoid(2x), kept for parity
  * focal  — published fvcore binary focal (reference utils/losses/focal.py)
  * lovasz — published Lovász hinge, per-image (reference utils/losses/lovasz.py);
             the sort-based gradient is a fixed-shape jnp.sort + cumsum
  * bce    — sigmoid cross entropy

All take logits (..., H, W) and binary targets (..., H, W) and return a
scalar, reduced over every element like the torch originals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    t = target.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def _binary_dice(p: jnp.ndarray, t: jnp.ndarray, smooth: float = 1.0) -> jnp.ndarray:
    """Per-image binary dice on probabilities, mean over batch."""
    B = p.shape[0]
    p2 = p.reshape(B, -1)
    t2 = t.reshape(B, -1)
    num = jnp.sum(p2 * t2, axis=1) + smooth
    den = jnp.sum(p2 ** 2 + t2 ** 2, axis=1) + smooth
    return jnp.mean(1.0 - num / den)


def dice_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """2-class softmax dice, the reference default mask loss."""
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    p_fg = jax.nn.sigmoid(2.0 * x)       # softmax([x, -x]) foreground prob
    p_bg = 1.0 - p_fg
    d_fg = _binary_dice(p_fg, t)
    d_bg = _binary_dice(p_bg, 1.0 - t)
    return (0.5 * d_fg + 0.5 * d_bg) / 2.0


def focal_loss(
    logits: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0
) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    return jnp.mean(loss)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    gts = jnp.sum(gt_sorted)
    inter = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jac = 1.0 - inter / union
    return jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])


def _lovasz_hinge_flat(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = _lovasz_grad(labels[order])
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def lovasz_hinge(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image Lovász hinge averaged over the batch."""
    B = logits.shape[0]
    x = logits.astype(jnp.float32).reshape(B, -1)
    t = target.astype(jnp.float32).reshape(B, -1)
    return jnp.mean(jax.vmap(_lovasz_hinge_flat)(x, t))


MASK_LOSSES = {
    "dice": dice_loss,
    "cross_entropy": bce_loss,
    "focal": focal_loss,
    "lovasz": lovasz_hinge,
}
