"""PairBatch: the statically-shaped batch contract between data and compute.

Replaces the reference's nested dict-of-tensors + ragged lists collate
(reference: datasets.py:138-245 CollateWrapper).  Every field is a fixed-shape
array; variable-size structures carry validity masks.  Being a NamedTuple it
is a JAX pytree — shardable, donate-able, and scan-able as-is.

Depth conventions follow the reference: ``depth`` is the (possibly resized)
working depth, ``orig_depth`` the full-resolution depth used for lifting
(pipeline.py:433), ``eval_depth`` the snapshot used by VSD
(utils/data/common.py:40-71).  All in millimeters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PairView(NamedTuple):
    rgb: jnp.ndarray          # [B, H, W, 3] uint8 (wire format; the model
                              # also accepts float32 in [0, 1])
    mask: jnp.ndarray         # [B, H, W] uint8 (oracle or external mask)
    depth: jnp.ndarray        # [B, H, W] uint16 mm (resized working depth)
    orig_depth: jnp.ndarray   # [B, Ho, Wo] uint16 mm (original resolution)
    eval_depth: jnp.ndarray   # [B, Ho, Wo] uint16 mm (VSD scene depth;
                              # aliases orig_depth at load time)
    camera: jnp.ndarray       # [B, 9] flattened K (original resolution)
    pose: jnp.ndarray         # [B, 4, 4] absolute object pose (meters)
    size: jnp.ndarray         # [B, 2] original (H, W)


class PairBatch(NamedTuple):
    anchor: PairView
    query: PairView
    prompt_ids: jnp.ndarray   # [B, P, L] int32 tokenized prompt templates
    corrs: jnp.ndarray        # [B, N, 4] int32 GT corrs (y1,x1,y2,x2) @ input res
    corr_valid: jnp.ndarray   # [B, N] bool
    valid: jnp.ndarray        # [B] float32 pair validity
    rel_pose: jnp.ndarray     # [B, 4, 4] GT relative pose T_A->Q (meters)
    cls_id: np.ndarray        # [B] host-side object class ids (not traced)
    instance_id: np.ndarray   # [B] host-side instance tags (not traced)
    id_a: np.ndarray = None   # [B] host-side anchor ids "scene img obj"
    id_q: np.ndarray = None   # [B] host-side query ids
    text_emb: jnp.ndarray = None  # [B, P, D] optional precomputed prompt
                                  # embeddings (frozen text tower output);
                                  # when set, the model skips the text tower

    @property
    def batch_size(self) -> int:
        return self.corrs.shape[0]


def device_fields(batch: PairBatch):
    """The jax-traced subset (drops host-side id arrays)."""
    return batch._replace(cls_id=None, instance_id=None, id_a=None, id_q=None)


def _train_view(v: PairView) -> PairView:
    return v._replace(depth=None, orig_depth=None, eval_depth=None,
                      camera=None, pose=None, size=None)


def train_fields(batch: PairBatch) -> PairBatch:
    """The TRAINING subset: what the train step actually reads (rgb, mask,
    corrs + validity, prompts/text_emb).  Depth/camera/pose/rel_pose are
    pose-evaluation concerns — shipping them host->device every step costs
    ~12 MB/step through the transfer tunnel (~100 ms/step on this relay)
    for arrays the loss never touches.  prompt_ids are dropped too when a
    text_emb cache entry is present (the model ignores them then)."""
    b = device_fields(batch)._replace(
        anchor=_train_view(batch.anchor), query=_train_view(batch.query),
        rel_pose=None)
    if b.text_emb is not None:
        b = b._replace(prompt_ids=None)
    return b
