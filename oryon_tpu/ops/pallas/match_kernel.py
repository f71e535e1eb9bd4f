"""Pallas TPU kernel: fused masked cosine argmin for NN matching.

The matching hot loop (ops/matching.py) computes, for every source feature,
the masked target pixel with minimal inverted-cosine distance.  The XLA
realization streams chunks through lax.scan; this kernel fuses the whole
thing: one pallas_call with a (src_tile, tgt_chunk) grid where each step is
an MXU matmul + running min/argmin update held in VMEM — the S x HW distance
matrix never exists, and min/argmin updates fuse into the matmul epilogue.

Inputs are pre-normalized features; the target mask rides in as a {0,1}
float whose complement adds +BIG to the distance (identical argmin to
excluding the pixels).

Shapes: S and HW must be multiples of the tile sizes (the public wrapper in
ops/matching.py pads S to the 5120 capacity and HW is 192*192 = 36864).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _kernel(src_ref, tgt_ref, bad_ref, min_ref, arg_ref):
    """Grid (i over src tiles, j over tgt chunks); j is the inner loop.

    src_ref: [TS, D]; tgt_ref: [TC, D]; bad_ref: [1, TC] float {0,1}
    min_ref/arg_ref: [TSr, 128] running outputs (same block for all j).
    """
    j = pl.program_id(1)
    TS = src_ref.shape[0]
    TC = tgt_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        min_ref[:] = jnp.full_like(min_ref, jnp.inf)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    cos = jnp.dot(src_ref[:], tgt_ref[:].T, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    dist = 0.5 * (1.0 - cos) + bad_ref[0, :][None, :] * BIG   # [TS, TC]

    cmin = jnp.min(dist, axis=1)                               # [TS]
    carg = jnp.argmin(dist, axis=1).astype(jnp.int32) + j * TC

    cmin2 = cmin.reshape(min_ref.shape)
    carg2 = carg.reshape(arg_ref.shape)
    better = cmin2 < min_ref[:]
    min_ref[:] = jnp.where(better, cmin2, min_ref[:])
    arg_ref[:] = jnp.where(better, carg2, arg_ref[:])


@functools.partial(jax.jit, static_argnames=("src_tile", "tgt_chunk"))
def masked_argmin_pallas(
    src: jnp.ndarray,       # [S, D] unit-normalized
    tgt: jnp.ndarray,       # [N, D] unit-normalized
    tgt_bad: jnp.ndarray,   # [N] bool/int — True where target excluded
    src_tile: int = 1024,
    tgt_chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (min_dist [S], argmin [S]) of the masked inverted-cosine
    distance. Requires S % src_tile == 0, N % tgt_chunk == 0, src_tile % 128 == 0."""
    S, D = src.shape
    N = tgt.shape[0]
    assert S % src_tile == 0 and N % tgt_chunk == 0 and src_tile % 128 == 0
    TSr = src_tile // 128
    bad_f = tgt_bad.astype(jnp.float32).reshape(1, N)

    grid = (S // src_tile, N // tgt_chunk)
    min_out, arg_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((src_tile, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tgt_chunk, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tgt_chunk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TSr, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TSr, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((S // 128, 128), jnp.int32),
        ],
    )(src.astype(jnp.float32), tgt.astype(jnp.float32), bad_f)
    return min_out.reshape(S), arg_out.reshape(S)
