"""Device-side pair-consistent augmentations (fused into the train step).

TPU-native replacement for the host color/flip augmentation stack
(reference utils/augmentations.py:10-165; host twin in
oryon_tpu/data/augment.py).  The host data path on this machine has ONE
CPU core and is the measured training bottleneck (~60 pairs/s observed vs
89 pairs/s device capability at B=32, BASELINE.md round 2): numpy color
jitter alone costs several ms per view.  Moving color jitter + flips onto
the device removes that host work entirely and rides idle HBM bandwidth
inside the already-compiled train step (~1 ms of elementwise traffic at
B=32).

Semantics match the host stack op-for-op (same factor distributions, same
gate probabilities, torchvision-style random op order); only the RNG
backend (JAX PRNG vs numpy RandomState) and the flip/resize order differ:
host flips at native resolution before the resize, device flips the
already-resized 224px view with a pixel-center mirror — the correspondence
conventions differ by sub-pixel (|s-1| px where s is the resize scale),
immaterial for training augmentation.  Per-op numeric equality against the
host implementations is pinned by tests/test_device_augment.py.

Color jitter runs post-resize here (224^2) where the host jitters at native
resolution — cheaper and equivalent: the ops are per-pixel color maps.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_GRAY = np.array([0.299, 0.587, 0.114], np.float32)


class DeviceAugConfig(NamedTuple):
    """Static (hashable) device-augmentation switches; mirrors
    AugmentConfig + the cfg.augs.rgb block."""
    jitter: bool = True
    bright: bool = True
    hflip: bool = True
    vflip: bool = True
    prob: float = 0.5


def adjust_brightness(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.mean(img @ _GRAY)
    return jnp.clip((img - mean) * factor + mean, 0.0, 1.0)


def adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = (img @ _GRAY)[..., None]
    return jnp.clip((img - gray) * factor + gray, 0.0, 1.0)


def _hue_matrix(shift: jnp.ndarray) -> jnp.ndarray:
    """RGB-space hue-rotation matrix via the YIQ transform (host twin:
    augment._adjust_hue)."""
    t = 2.0 * jnp.pi * shift
    cos, sin = jnp.cos(t), jnp.sin(t)
    t_yiq = np.array([[0.299, 0.587, 0.114],
                      [0.596, -0.274, -0.322],
                      [0.211, -0.523, 0.312]], np.float32)
    t_inv = np.linalg.inv(t_yiq).astype(np.float32)
    rot = jnp.array([[1.0, 0.0, 0.0], [0.0, cos, -sin], [0.0, sin, cos]])
    return t_inv @ rot @ jnp.asarray(t_yiq)


def adjust_hue(img: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(img @ _hue_matrix(shift).T, 0.0, 1.0)


def color_jitter(key: jax.Array, img: jnp.ndarray,
                 brightness=0.125, contrast=0.5, saturation=0.5, hue=0.05):
    """torchvision ColorJitter semantics on one [H, W, 3] image: uniform
    factors, random op order.  Zero-strength ops are dropped at trace time
    (static python check), matching the host op-list construction."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    ops = []
    if brightness:
        f = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
        ops.append(lambda x, f=f: adjust_brightness(x, f))
    if contrast:
        f = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
        ops.append(lambda x, f=f: adjust_contrast(x, f))
    if saturation:
        f = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
        ops.append(lambda x, f=f: adjust_saturation(x, f))
    if hue:
        f = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
        ops.append(lambda x, f=f: adjust_hue(x, f))
    if not ops:
        return img
    perm = jax.random.permutation(kp, len(ops))

    def body(i, x):
        return jax.lax.switch(perm[i], ops, x)

    return jax.lax.fori_loop(0, len(ops), body, img)


def _augment_view(key: jax.Array, rgb: jnp.ndarray, cfg: DeviceAugConfig):
    """One sample, one view: rgb [H,W,3] f32 in [0,1].  Returns the
    color-augmented rgb + the (do_h, do_v) flip flags; geometric mirrors
    are applied batched by the caller (mask/depth may be absent on the
    training path — pair_batch.train_fields)."""
    kj, kb, kg = jax.random.split(key, 3)
    gates = jax.random.uniform(kg, (4,))
    if cfg.jitter:
        rgb = jnp.where(gates[0] < cfg.prob, color_jitter(kj, rgb), rgb)
    if cfg.bright:
        rgb = jnp.where(gates[1] < cfg.prob,
                        color_jitter(kb, rgb, brightness=0.25, contrast=0,
                                     saturation=0, hue=0), rgb)
    do_h = jnp.logical_and(cfg.hflip, gates[2] < cfg.prob)
    do_v = jnp.logical_and(cfg.vflip, gates[3] < cfg.prob)
    return rgb, do_h, do_v


def _mirror(x, do_h, do_v):
    """Batched conditional mirror of [B, H, W, ...] along W then H."""
    if x is None:
        return None
    h = do_h.reshape((-1,) + (1,) * (x.ndim - 1))
    v = do_v.reshape((-1,) + (1,) * (x.ndim - 1))
    x = jnp.where(h, x[:, :, ::-1], x)
    return jnp.where(v, x[:, ::-1], x)


def _remap_corrs(corrs: jnp.ndarray, hw, do_h_a, do_v_a, do_h_q, do_v_q):
    """Mirror (y1,x1,y2,x2) correspondence endpoints for flipped views.
    corrs [B,N,4] int32 at input resolution (pixel-center mirror)."""
    H, W = hw
    y1, x1, y2, x2 = (corrs[..., i] for i in range(4))
    y1 = jnp.where(do_v_a[:, None], H - 1 - y1, y1)
    x1 = jnp.where(do_h_a[:, None], W - 1 - x1, x1)
    y2 = jnp.where(do_v_q[:, None], H - 1 - y2, y2)
    x2 = jnp.where(do_h_q[:, None], W - 1 - x2, x2)
    return jnp.stack([y1, x1, y2, x2], -1)


def _to_float(rgb: jnp.ndarray) -> jnp.ndarray:
    if rgb.dtype == jnp.uint8:
        return rgb.astype(jnp.float32) / 255.0
    return rgb.astype(jnp.float32)


def device_augment(batch, key: jax.Array, cfg: DeviceAugConfig):
    """Apply the augmentation stack to a PairBatch on device (traceable;
    call inside the jitted train step so it adds zero program launches).

    Consumes uint8 wire-format rgb, returns float32 [0,1] rgb (the model
    accepts both — pair_batch.PairView).  mask/depth keep their dtypes
    (pure mirror ops).  orig_depth/eval_depth are left untouched, matching
    the host path where the originals are snapshotted before augmentation
    (datasets.get_pair orig_a/orig_q).
    """
    a, q = batch.anchor, batch.query
    B = a.rgb.shape[0]
    keys = jax.random.split(key, 2 * B).reshape(2, B, -1)
    aug_v = jax.vmap(_augment_view, in_axes=(0, 0, None))
    rgb_a, h_a, v_a = aug_v(keys[0], _to_float(a.rgb), cfg)
    rgb_q, h_q, v_q = aug_v(keys[1], _to_float(q.rgb), cfg)
    corrs = _remap_corrs(batch.corrs, rgb_a.shape[1:3], h_a, v_a, h_q, v_q)
    return batch._replace(
        anchor=a._replace(rgb=_mirror(rgb_a, h_a, v_a),
                          mask=_mirror(a.mask, h_a, v_a),
                          depth=_mirror(a.depth, h_a, v_a)),
        query=q._replace(rgb=_mirror(rgb_q, h_q, v_q),
                         mask=_mirror(q.mask, h_q, v_q),
                         depth=_mirror(q.depth, h_q, v_q)),
        corrs=corrs,
    )
