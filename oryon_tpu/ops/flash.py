"""Flash multi-head attention for the ViT towers (Pallas TPU kernel).

The CLIP ViT-L/14@336 vision tower is the single largest compute stage of the
pipeline (~53% of end-to-end time; scripts/profile_stages.py).  Its 577-token
attention, expressed as einsums, materializes a [B, 16, 577, 577] logit tensor
in HBM per layer x 24 layers.  This wrapper runs the fused online-softmax
kernel (jax.experimental.pallas.ops.tpu.flash_attention) instead: logits never
leave VMEM, softmax is streamed, HBM traffic drops to the Q/K/V/O tensors.

577 is not tile-aligned, so sequences are zero-padded to a multiple of 128 and
the padding is excluded with segment ids (padded tokens form their own
segment; their output rows are sliced away).

Used for the frozen towers (forward-only; gradients are stopped upstream, so
the kernel's backward pass is never taken).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _run_flash(q, k, v, sm_scale, segment_ids):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    B, H, Lp, D = q.shape
    # Measured on v5e at [16, 16, 640, 64]: whole-sequence blocks with several
    # batch rows per program beat 128x128 tiling ~2x (fewer, fatter programs;
    # per-program launch overhead dominates at these sizes).
    # block_k(_major) must DIVIDE Lp (kernel _verify_block): use the largest
    # 128-multiple divisor of Lp that is <= 1024
    blk = next(b for b in range(min(1024, Lp), 0, -_LANE) if Lp % b == 0)
    bb = 8
    while B % bb:
        bb //= 2
    return flash_attention(
        q, k, v,
        segment_ids=segment_ids,
        causal=False,
        sm_scale=sm_scale,
        block_sizes=BlockSizes(block_q=blk, block_k_major=blk,
                               block_k=blk, block_b=bb),
    )


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_mha(
    q: jnp.ndarray,  # [B, H, L, D]
    k: jnp.ndarray,  # [B, H, L, D]
    v: jnp.ndarray,  # [B, H, L, D]
    sm_scale: float,
) -> jnp.ndarray:
    """Bidirectional (non-causal, unmasked) MHA via the TPU flash kernel.

    Equivalent to softmax(q @ k.T * sm_scale) @ v over the last two axes.
    L may be any length; it is padded to a multiple of 128 internally.
    For tile-unaligned L inside a layer loop, prefer padding ONCE outside
    the loop and calling flash_mha_padded: the per-layer q/k/v pads cost
    ~4.3 ms/call on the ViT-L stack (traced; see BASELINE.md).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    B, H, L, D = q.shape
    Lp = -(-L // _LANE) * _LANE
    pad = Lp - L
    segment_ids = None
    if pad:
        padfn = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        q, k, v = padfn(q), padfn(k), padfn(v)
        seg = jnp.concatenate(
            [jnp.ones((B, L), jnp.int32), jnp.zeros((B, pad), jnp.int32)], axis=-1)
        segment_ids = SegmentIds(q=seg, kv=seg)
    out = _run_flash(q, k, v, sm_scale, segment_ids)
    return out[:, :, :L, :]


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def flash_mha_padded(
    q: jnp.ndarray,  # [B, H, Lp, D], Lp % 128 == 0
    k: jnp.ndarray,
    v: jnp.ndarray,
    sm_scale: float,
    seg: jnp.ndarray,  # [B, Lp] int32 segment ids (0 = padding tokens)
) -> jnp.ndarray:
    """flash_mha on pre-padded inputs: no per-call pad/slice HBM passes.

    `seg` isolates padding tokens (their own segment) so real tokens never
    attend to them; padded output rows are garbage and must be dropped by
    the caller after the layer stack.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    assert q.shape[2] % _LANE == 0, q.shape
    return _run_flash(q, k, v, sm_scale, SegmentIds(q=seg, kv=seg))
