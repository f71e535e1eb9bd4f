"""Pallas TPU kernel: fused MHA on the lane-packed [B, L, C] layout.

Why this exists (traced on v5e, ViT-L/14@336 stack, 16 images — BASELINE.md):
  * einsum attention trio (QK^T / softmax / AV): 19.3 ms/call — the
    [B,16,577,577] logits round-trip HBM and the hd=64 contraction caps the
    MXU;
  * stock flash_attention kernel: 10.6 ms/call, BUT it needs the
    [B, H, L, D] layout, and the q/k/v head-split transposes + pads cost
    ~8 ms/call of pure HBM copies — the kernel's win evaporates.

This kernel keeps q/k/v exactly as the in_proj produces them — [B, L, C]
with heads packed along lanes — so NO transpose, reshape, or pad ops touch
HBM.  One program per batch row computes all heads: per head a static lane
slice [L, hd], one [L, hd] @ [hd, L] MXU matmul, an in-VMEM f32 softmax
(scores never reach HBM), one [L, L] @ [L, hd] matmul, and a lane-slice
write.  Tile-alignment padding is hoisted out of the layer loop by the
caller (models/clip.py); padded KEYS are excluded with a [L] additive mask
(real queries never see them; padded query rows are garbage the caller
slices off after the stack).

Requires L to be a lane multiple and L*L*4 bytes of scores to fit VMEM
(L <= ~1024) — exactly the ViT regime (L=640).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _scale_fits_exactly(scale: float, dtype) -> bool:
    """True iff multiplying by ``scale`` in ``dtype`` is exact (power of
    two within range) — the ViT case: hd=64 -> scale=0.125."""
    import numpy as np
    f = np.asarray(scale, dtype)
    return float(f) == float(scale) and float(scale) != 0.0 and (
        abs(float(np.log2(abs(float(scale)))) % 1.0) < 1e-12)


def _kernel(qkv_ref, kmask_ref, out_ref, *, heads: int, scale: float,
            qk_int8: bool = False):
    """qkv_ref: [1, L, 3C] packed in_proj output (q | k | v along lanes) —
    consuming it unsplit saves the q/k/v slice copies (~1.6 ms/call on the
    ViT-L stack); out_ref: [1, L, C]; kmask_ref: [1, L] additive f32.

    Per-head VPU pass budget (round 4): the softmax scale is folded into q
    BEFORE the QK matmul when exact in the input dtype ([L, hd] multiply
    replacing an [L, L] one — bit-exact for power-of-two scales like ViT's
    hd=64 -> 0.125), and the probability normalization is deferred past the
    AV matmul (divide [L, hd] in f32 instead of [L, L]; also slightly MORE
    accurate than pre-dividing in bf16).  Both are algebraic no-ops.

    ``qk_int8``: dynamic per-head symmetric int8 quantization of q and k
    feeding an int8 MXU matmul (2x the bf16 rate) for the logits; the
    descale constant folds into the softmax's existing elementwise passes.
    NOT an algebraic no-op — logits gain ~1% quantization noise — so it is
    opt-in pending a trained-weight accuracy A/B (like the int8 tower was,
    BASELINE.md round 3)."""
    C = qkv_ref.shape[-1] // 3
    hd = C // heads
    add = kmask_ref[0, :][None, :]          # [1, L] broadcast over queries
    fold = _scale_fits_exactly(scale, qkv_ref.dtype)
    for h in range(heads):
        qs = qkv_ref[0, :, h * hd:(h + 1) * hd]
        ks = qkv_ref[0, :, C + h * hd:C + (h + 1) * hd]
        vs = qkv_ref[0, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        if qk_int8:
            qf = qs.astype(jnp.float32) * scale   # fold scale pre-quant
            kf = ks.astype(jnp.float32)
            qm = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-12)
            km = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-12)
            qi = jnp.round(qf * (127.0 / qm)).astype(jnp.int8)
            ki = jnp.round(kf * (127.0 / km)).astype(jnp.int8)
            si = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = si.astype(jnp.float32) * (qm * km / (127.0 * 127.0)) + add
        else:
            if fold:
                qs = qs * qkv_ref.dtype.type(scale)
            s = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if not fold:
                s = s * scale
            s = s + add
        s = s - jnp.max(s, axis=-1, keepdims=True)
        # cast the exponentials to the compute dtype BEFORE the row-sum so
        # the f32 [L, L] buffer dies here — keeping it live through the AV
        # dot blew the 16 MB scoped-VMEM stack (measured: 20.9 MB).  The
        # denominator still accumulates in f32; rounding e to bf16 first is
        # the same error class as the old pre-divided bf16 probabilities.
        e = jnp.exp(s).astype(qkv_ref.dtype)
        denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.dot(e, vs, preferred_element_type=jnp.float32)  # [L, hd] f32
        out_ref[0, :, h * hd:(h + 1) * hd] = (o / denom).astype(out_ref.dtype)


def _reference_mha(q, k, v, kmask, heads, scale):
    """Pure-jnp forward with identical semantics — used for the backward
    pass (the Mosaic kernel has no autodiff rule; towers are frozen in
    production so this path only runs if someone trains through it)."""
    B, L, C = q.shape
    hd = C // heads
    qh = q.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhld,bhmd->bhlm", qh, kh).astype(jnp.float32) * scale
    s = s + kmask.astype(jnp.float32)[None, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhlm,bhmd->bhld", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(B, L, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_mha_lanes_qkv(
    qkv: jnp.ndarray,        # [B, L, 3C] packed (q | k | v), L % 128 == 0
    kmask: jnp.ndarray,      # [L] additive f32 (0 real keys, -1e9 padding)
    heads: int,
    scale: float,
    interpret: bool = None,
    qk_int8: bool = False,
) -> jnp.ndarray:
    """softmax(q_h k_h^T * scale + kmask) v_h per lane-packed head, reading
    the packed in_proj output directly (no q/k/v split copies).

    ``qk_int8=True`` computes the logits on the int8 MXU path (dynamic
    per-head symmetric quantization; ~1% logit noise — opt-in, see
    _kernel)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, L, C3 = qkv.shape
    C = C3 // 3
    assert L % _LANE == 0, (L,)
    assert C % heads == 0, (C, heads)
    kmask2 = jnp.broadcast_to(kmask.astype(jnp.float32)[None], (1, L))

    kern = functools.partial(_kernel, heads=heads, scale=scale,
                             qk_int8=qk_int8)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), qkv.dtype),
        # The per-program scratch (f32 [L, L] scores + exp temporaries +
        # double-buffered [1, L, 3C] blocks) measures 22.3 MB at the train
        # shape (64 rows x L=640), over Mosaic's 16 MB default scoped-VMEM
        # budget; v5e has 128 MB of VMEM, so raise the cap rather than
        # shrink the kernel (q-tiling would re-fetch k/v per tile).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(qkv, kmask2)


def fused_mha_lanes(q, k, v, kmask, heads, scale, interpret=None,
                    qk_int8=False):
    """Split-tensor convenience wrapper over fused_mha_lanes_qkv."""
    return fused_mha_lanes_qkv(jnp.concatenate([q, k, v], axis=-1), kmask,
                               heads, scale, interpret, qk_int8)


def _fwd(qkv, kmask, heads, scale, interpret, qk_int8):
    return fused_mha_lanes_qkv(qkv, kmask, heads, scale, interpret,
                               qk_int8), (qkv, kmask)


def _bwd(heads, scale, interpret, qk_int8, res, g):
    qkv, kmask = res
    C = qkv.shape[-1] // 3

    def ref(qkv_, kmask_):
        return _reference_mha(qkv_[..., :C], qkv_[..., C:2 * C],
                              qkv_[..., 2 * C:], kmask_, heads, scale)

    # kmask enters the softmax logits additively, so its cotangent is real
    # (it matters if a learned additive mask is ever trained through here)
    # (straight-through for qk_int8: gradients ignore the quantization)
    _, vjp = jax.vjp(ref, qkv, kmask)
    dqkv, dkmask = vjp(g)
    return dqkv, dkmask


fused_mha_lanes_qkv.defvjp(_fwd, _bwd)
