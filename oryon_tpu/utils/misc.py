"""Small host utilities (reference utils/misc.py live subset)."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def box_from_mask(mask: np.ndarray, mask_id: int = 1) -> Tuple[int, int, int, int]:
    """Tight (y1, x1, y2, x2) box around mask==mask_id
    (reference utils/misc.py:216-227)."""
    ys, xs = np.nonzero(mask == mask_id)
    if len(ys) == 0:
        return (0, 0, 0, 0)
    return int(ys.min()), int(xs.min()), int(ys.max()) + 1, int(xs.max()) + 1


def set_deterministic_seed(seed: int):
    """Root determinism control (reference utils/misc.py:186-196): seeds the
    host numpy RNG and returns the root jax PRNG key — all device randomness
    in this framework flows from explicit keys."""
    import jax

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
