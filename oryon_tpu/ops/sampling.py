"""Fixed-capacity masked selection/sampling primitives.

The reference extracts ragged pixel sets with ``torch.nonzero`` and resamples
them with ``torch.multinomial`` (reference: utils/pcd.py:184-192,
utils/misc.py:242-254).  Under XLA everything must be statically shaped, so
the equivalent primitive is: score every candidate, take a fixed-capacity
top-k, and carry a validity flag for slots beyond the true count.

With random tie-breaking noise this reproduces the reference's uniform
subsampling distribution (modulo with/without replacement, which only matters
when the pool is smaller than the capacity — where the reference duplicates
rows and we flag slots invalid; downstream consumers weight by validity).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_select(
    mask: jnp.ndarray,
    key: jax.Array,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select up to ``capacity`` flat indices where ``mask`` is nonzero.

    mask: [N] (or any shape; flattened) 0/1.
    Returns (indices [capacity] int32, valid [capacity] bool).
    If the mask has more than ``capacity`` nonzeros, a uniform random subset
    (without replacement) is chosen; otherwise all nonzeros come first and
    the remaining slots are flagged invalid.
    """
    flat = mask.reshape(-1).astype(jnp.float32)
    noise = jax.random.uniform(key, flat.shape)
    score = flat * 2.0 + noise  # masked candidates strictly dominate
    _, idx = jax.lax.top_k(score, capacity)
    valid = flat[idx] > 0
    return idx.astype(jnp.int32), valid


def masked_sample(
    weights: jnp.ndarray,
    key: jax.Array,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gumbel-top-k sample of ``capacity`` indices ∝ weights (no replacement).

    weights: [N] nonnegative; zero-weight entries are only chosen when fewer
    than ``capacity`` positive entries exist (then flagged invalid).
    """
    w = weights.reshape(-1).astype(jnp.float32)
    g = -jnp.log(-jnp.log(jax.random.uniform(key, w.shape, minval=1e-20, maxval=1.0)))
    score = jnp.where(w > 0, jnp.log(w + 1e-20) + g, -jnp.inf)
    _, idx = jax.lax.top_k(score, capacity)
    valid = w[idx] > 0
    return idx.astype(jnp.int32), valid


def flat_to_yx(idx: jnp.ndarray, width: int) -> jnp.ndarray:
    """Flat pixel index -> (y, x) int32 pairs, shape [..., 2]."""
    y = idx // width
    x = idx % width
    return jnp.stack([y, x], axis=-1).astype(jnp.int32)
