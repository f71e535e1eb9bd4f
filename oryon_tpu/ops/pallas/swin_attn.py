"""Pallas TPU kernel: fused packed window attention for the Swin guidance.

The Swin window attention (models/swin.py, reference net.py:45-58 taps
torchvision swin_b) works on 49-token windows — thousands of tiny
[49, 32] @ [32, 49] matmuls plus an HBM-materialized [Bw, h, 49, 49]
softmax.  That shape is hostile to the TPU: the MXU wants few fat matmuls
and the logits traffic is pure HBM waste.

This kernel packs P consecutive windows of one image into a single
block-diagonal attention:

    scores[P*N, P*N] = (q_pack @ k_pack^T) * scale + A

where A carries the relative-position bias + shift mask on the P diagonal
N x N blocks and -1e9 everywhere else, so the cross-window terms vanish in
the softmax.  Per (pack, head) the MXU runs one [P*N, hd] @ [hd, P*N] and
one [P*N, P*N] @ [P*N, hd] matmul; logits never leave VMEM.

Layout notes (pallas_guide.md): C=128/256 rides the lane dim natively;
per-head lane slices happen in VMEM; softmax runs on logical [P*N, P*N]
f32 in VMEM.  N*P is chosen near 343 (=7*49) to fill MXU tiles.

Measured (v5e, 16 images at 384x384, shared pool): the kernel TIES the XLA
einsum path (49.3 vs 45.6 ms for the guidance tower; an attention-stubbed
floor runs 43.5 ms) — the tower's cost is dominated by the pad/roll/window
partition layout passes, not by attention math, so this stays opt-in
(SwinConfig.attn_impl="pallas") pending a fused-layout design.

Round-2 verdict on the fused-layout design (band_window_attention below —
window extraction + bias + attention + reverse all in VMEM, one program per
w-row band, no HBM window partition): measured DEAD END.  Device traces
(scripts/profile_swin.py --trace + scripts/trace_op_table.py, immune to the
pool noise) over the whole guidance tower:

    einsum      14.85 ms/iter   (attention+layout spread over ~30 fusions)
    einsum+pad  15.15 ms/iter   (stage-level padding: no on-device win)
    pallas      15.63 ms/iter   (packed block-diagonal kernel)
    band        14.71 ms/iter   (2x 2.26 ms stage-1 + 2x 1.09 ms stage-2)
    noattn       8.92 ms/iter   (floor: patch embed + convs + MLPs + norms)

The band kernel absorbs the pad/roll/partition layout passes but spends the
same time itself: 49-token windows keep every matmul at [49*7, 32]-scale,
far off the MXU's preferred tiling, and the per-band qkv reload duplicates
HBM traffic across the shifted halves.  Attention variants can only move
the ~5.9 ms above the 8.9 ms floor, and all four designs land within 6% of
each other — the tower is at its practical floor for this architecture.
Both kernels stay opt-in (attn_impl="pallas" | "band"); einsum remains the
default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads: int,
            scale: float):
    """One program = one pack of `pack` windows (all heads).

    q/k/v_ref: [1, P*N, C] bf16;  bias_ref: [1, h, P*N, P*N] block-diagonal
    additive term (NEG off-diagonal, precomputed in XLA);
    out_ref:   [1, P*N, C] bf16.
    """
    C = q_ref.shape[-1]
    hd = C // heads

    for h in range(heads):
        qs = q_ref[0, :, h * hd:(h + 1) * hd]
        ks = k_ref[0, :, h * hd:(h + 1) * hd]
        vs = v_ref[0, :, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, h].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        prob = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        out_ref[0, :, h * hd:(h + 1) * hd] = jnp.dot(
            prob, vs, preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "pack", "scale",
                                             "interpret"))
def packed_window_attention(
    q: jnp.ndarray,      # [Bw, N, C]  (Bw = B * nw, window-major per image)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,   # [nw, heads, N, N] additive (rel-pos bias + mask)
    heads: int,
    pack: int,
    scale: float,
    interpret: bool = None,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v per window, packed P windows/program.

    nw (windows per image) must be divisible by `pack`; consecutive windows
    of one image form each pack so packs never straddle images.
    """
    if interpret is None:
        # mosaic kernels only compile for TPU; CPU (tests) interprets
        interpret = jax.default_backend() == "cpu"
    Bw, N, C = q.shape
    nw = bias.shape[0]
    assert nw % pack == 0, (nw, pack)
    assert Bw % nw == 0, (Bw, nw)
    npacks_img = nw // pack
    npacks = Bw // pack
    PN = pack * N

    qp = q.reshape(npacks, PN, C)
    kp = k.reshape(npacks, PN, C)
    vp = v.reshape(npacks, PN, C)
    # packed block-diagonal bias [npacks_img, h, PN, PN]: bias on the P
    # diagonal N x N blocks, NEG off-diagonal (kills cross-window attention)
    br = bias.astype(jnp.bfloat16).reshape(npacks_img, pack, heads, N, N)
    br = br.transpose(0, 2, 1, 3, 4)                  # [npk, h, P, N, N]
    eye = jnp.eye(pack, dtype=bool)[None, None, :, None, :, None]
    biasp = jnp.where(
        eye, br[:, :, :, :, None, :],
        jnp.asarray(NEG, jnp.bfloat16)).reshape(npacks_img, heads, PN, PN)

    kern = functools.partial(_kernel, heads=heads, scale=scale)
    out = pl.pallas_call(
        kern,
        grid=(npacks,),
        in_specs=[
            pl.BlockSpec((1, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PN, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, PN, PN),
                         lambda i, _n=npacks_img: (i % _n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PN, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npacks, PN, C), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, biasp)
    return out.reshape(Bw, N, C)


def _band_kernel(qkv_ref, bias_ref, out_ref, qkvp_ref, a_ref, outp_ref, *,
                 heads: int, window: int, scale: float):
    """One program = one w-row band of one image's (padded, rolled) map.

    qkv_ref: [1, w, Wp, 3C]; bias_ref: [1, nwb, h, N, N];
    out_ref: [1, w, Wp, C].
    Scratch: qkvp [PN, 3C], a [PN, PN] f32, outp [PN, C]  (PN = nwb * N).

    The band contains nwb whole windows as column stripes; extracting them is
    a VMEM relayout, so the HBM-level window partition/reverse transposes of
    the XLA path disappear entirely. All nwb windows attend in ONE
    block-diagonal [PN, PN] matmul per head (off-diagonal killed at -1e9).
    """
    w = window
    N = w * w
    C3 = qkv_ref.shape[-1]
    C = C3 // 3
    hd = C // heads
    nwb = qkv_ref.shape[2] // w
    PN = nwb * N

    for wdx in range(nwb):
        qkvp_ref[wdx * N:(wdx + 1) * N, :] = (
            qkv_ref[0, :, wdx * w:(wdx + 1) * w, :].reshape(N, C3))

    # NOTE: a diagonal-block-only softmax variant (zeros off-diagonal, exp
    # on nwb x [N, N] instead of [PN, PN]) was traced SLOWER (19.4 vs 14.7
    # ms tower) — Mosaic relayouts for the 49-row unaligned block slices
    # cost more than the extra exp work they save. Full-matrix softmax with
    # a -1e9 block-diagonal additive stays.
    for h in range(heads):
        qs = qkvp_ref[:, h * hd:(h + 1) * hd]
        ks = qkvp_ref[:, C + h * hd:C + (h + 1) * hd]
        vs = qkvp_ref[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        a_ref[:] = jnp.full((PN, PN), NEG, jnp.float32)
        for p in range(nwb):
            a_ref[p * N:(p + 1) * N, p * N:(p + 1) * N] = bias_ref[0, p, h]
        s = jax.lax.dot_general(
            qs, ks, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + a_ref[:]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        prob = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        outp_ref[:, h * hd:(h + 1) * hd] = jnp.dot(
            prob, vs, preferred_element_type=jnp.float32).astype(out_ref.dtype)

    for wdx in range(nwb):
        out_ref[0, :, wdx * w:(wdx + 1) * w, :] = (
            outp_ref[wdx * N:(wdx + 1) * N, :].reshape(w, w, C))


@functools.partial(jax.jit, static_argnames=("heads", "window", "scale",
                                             "interpret"))
def band_window_attention(
    qkv_map: jnp.ndarray,   # [B, Hp, Wp, 3C], Hp/Wp window multiples,
                            # already padded + (for shifted blocks) rolled
    bias: jnp.ndarray,      # [nw, heads, N, N] additive (rel-pos + mask),
                            # nw row-major over the (Hp/w, Wp/w) window grid
    heads: int,
    window: int,
    scale: float,
    interpret: bool = None,
) -> jnp.ndarray:
    """Window attention directly on the feature map (no HBM partition)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Hp, Wp, C3 = qkv_map.shape
    C = C3 // 3
    w = window
    N = w * w
    assert Hp % w == 0 and Wp % w == 0, (Hp, Wp, w)
    nbands = Hp // w
    nwb = Wp // w
    assert bias.shape[0] == nbands * nwb, (bias.shape, nbands, nwb)
    PN = nwb * N
    biasr = bias.astype(jnp.float32).reshape(nbands, nwb, heads, N, N)

    kern = functools.partial(_band_kernel, heads=heads, window=w, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(B, nbands),
        in_specs=[
            pl.BlockSpec((1, w, Wp, C3), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nwb, heads, N, N), lambda b, r: (r, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, Wp, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), qkv_map.dtype),
        scratch_shapes=[
            pltpu.VMEM((PN, C3), qkv_map.dtype),
            pltpu.VMEM((PN, PN), jnp.float32),
            pltpu.VMEM((PN, C), qkv_map.dtype),
        ],
        interpret=interpret,
    )(qkv_map, biasr)
