"""CLIP ViT-L/14@336px image & text towers in flax.linen (NHWC, bf16 compute).

TPU-native realization of the frozen VLM stage (reference: models/vlm.py:14-106
drives the OpenAI ``clip`` package).  Architecture follows the published CLIP
ViT design: patch conv, class token, pre-LN transformer with QuickGELU MLPs,
ln_post over patch tokens (CLS dropped) for the dense visual map
(reference vlm.py:43-61), and EOT-pooled projected text embeddings
(reference vlm.py:63-86).  Parameter names mirror the torch checkpoint layout
so the weight converter (models/convert.py) is a pure key/layout map.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    # "fused" = lane-packed Pallas MHA (ops/pallas/mha_lanes.py): cuts the
    # 24-layer tower 55.5 -> 46.3 ms/call on v5e (traced) vs the einsum path
    attn_impl: str = "fused"  # einsum | flash | fused | auto (see MultiHeadAttention)
    # "int8": QKV/out/MLP projections run s8xs8->s32 on the MXU (1.83x the
    # bf16 matmul rate, measured — models/quant.py). Opt-in: random-weight
    # error is pinned by tests; REAL-checkpoint accuracy still unvalidated
    # (assets absent in-sandbox), so the default stays bf16.
    quant: str = "none"  # none | int8

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 768  # projected text dim


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _dense_cls(quant: str):
    """nn.Dense or its int8 drop-in (same param tree — models/quant.py)."""
    from oryon_tpu.models.quant import dense_cls
    return dense_cls(quant)


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head attention (torch nn.MultiheadAttention layout).

    attn_impl (traced per-op on v5e at the ViT-L shape, 16 images, 24-layer
    stack — see BASELINE.md):
      * "einsum": materialized-logit attention; trio costs 19.3 ms/call.
      * "flash": stock Pallas online-softmax kernel; the kernel itself runs
        10.6 ms but the [B,H,L,D] head-split transposes + per-layer pads add
        ~8 ms of HBM copies — net tie with einsum.  Opt-in only.
      * "fused": lane-packed kernel (ops/pallas/mha_lanes.py) consuming the
        in_proj [B, L, C] layout directly — 9.8 ms/call, no copies; tower
        drops 55.5 -> 46.3 ms.  Default for the vision tower; requires the
        caller to pre-pad L to a lane multiple (seg argument).
      * "auto": einsum (safe everywhere, incl. masked/causal attention).

    ``seg`` MUST be batch-uniform padding segment ids.  The canonical form
    is a 1-D [L] vector (what ClipVisionTower passes) — batch-uniform by
    construction, jit-safe.  The fused kernel derives ONE key mask from it;
    per-sample segments would be silently wrong, so the contract is
    ENFORCED at trace time: a 2-D [B, L] seg is accepted only as a concrete
    (non-traced) array with identical rows; any traced 2-D seg — whose
    values cannot be inspected — raises immediately.  Callers with genuine
    per-sample padding must use attn_impl="auto".
    """

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 seg: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, L, D = x.shape
        hd = D // self.heads
        Dense = _dense_cls(self.quant)
        in_proj = Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        if self.attn_impl in ("fused", "fused_i8qk"):
            # lane-packed fused kernel: consumes the packed [B, L, 3C]
            # in_proj output directly — no q/k/v split, no head-split
            # transposes, logits stay in VMEM (ops/pallas/mha_lanes);
            # "fused_i8qk" additionally computes logits on the int8 MXU
            # (opt-in pending a trained-weight accuracy A/B)
            assert mask is None, "fused path is unmasked attention only"
            from oryon_tpu.ops.pallas.mha_lanes import fused_mha_lanes_qkv
            if seg is not None:
                # batch-uniform padding only (see class docstring): the
                # kernel takes ONE [L] key mask for the whole batch
                if seg.ndim == 2:
                    if isinstance(seg, jax.core.Tracer):
                        raise ValueError(
                            "attn_impl='fused' needs batch-uniform seg: pass "
                            "a 1-D [L] vector (jit-safe) or a concrete "
                            "[B, L] array with identical rows; a traced "
                            "[B, L] seg cannot be verified (use "
                            "attn_impl='auto').")
                    seg_np = np.asarray(seg)
                    if not (seg_np == seg_np[:1]).all():
                        raise ValueError(
                            "attn_impl='fused' got per-sample segment ids "
                            "(rows differ); use attn_impl='auto'.")
                elif seg.ndim != 1:
                    raise ValueError(f"seg must be [L] or [B, L], got "
                                     f"shape {seg.shape}")
                seg_row = seg if seg.ndim == 1 else seg[0]
                kmask = jnp.where(seg_row > 0, 0.0, -1e9).astype(jnp.float32)
            else:
                kmask = jnp.zeros((L,), jnp.float32)
            out = fused_mha_lanes_qkv(in_proj, kmask, self.heads, hd ** -0.5,
                                      None, self.attn_impl == "fused_i8qk")
            return Dense(D, dtype=self.dtype, name="out_proj")(out)
        q, k, v = jnp.split(in_proj, 3, axis=-1)
        q = q.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        if self.attn_impl == "flash":
            assert mask is None, "flash path is unmasked attention only"
            from oryon_tpu.ops.flash import flash_mha, flash_mha_padded
            if seg is not None:
                # sequence pre-padded by the tower; no per-layer pad/slice
                # (kernel wants [B, L] segment ids; canonical seg is [L])
                seg2 = (jnp.broadcast_to(seg, (B, L)) if seg.ndim == 1
                        else seg)
                out = flash_mha_padded(q, k, v, hd ** -0.5, seg2)
            else:
                out = flash_mha(q, k, v, hd ** -0.5)
        elif self.attn_impl == "noattn":
            # diagnostic floor (scripts/profile_clip.py): skip the score and
            # value matmuls entirely — NOT a valid attention
            out = v + 0.0 * q
        else:
            attn = jnp.einsum("bhld,bhmd->bhlm", q, k) * (hd ** -0.5)
            if mask is not None:
                attn = attn + mask.astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return Dense(D, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 seg: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        Dense = _dense_cls(self.quant)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + MultiHeadAttention(self.width, self.heads, self.dtype,
                                   self.attn_impl, self.quant,
                                   name="attn")(y, mask, seg)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(y)
        h = quick_gelu(h)
        x = x + Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class _ScanBlock(nn.Module):
    """ResidualAttentionBlock wrapped for nn.scan (carry = activations)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask, seg) -> tuple:
        x = ResidualAttentionBlock(self.width, self.heads, self.dtype,
                                   self.attn_impl, self.quant,
                                   name="block")(x, mask, seg)
        return x, None


def _run_blocks(x, mask, width, heads, layers, dtype, scan: bool,
                attn_impl: str = "auto", seg=None, quant: str = "none",
                remat: bool = False):
    """Transformer stack: nn.scan over one compiled block (compile time and
    HLO size ~layers-times smaller than unrolling — critical for the 24-layer
    ViT-L under slow remote compilation) or the unrolled fallback.

    ``remat``: checkpoint each block so backward recomputes its internals
    instead of saving them — required to fit train_towers (gradients through
    the 24-layer ViT-L) in v5e HBM: without it the saved per-layer attention
    internals at B=32 exceed 16 GiB (measured OOM, BASELINE.md round 4).
    prevent_cse=False is the documented safe setting under scan/jit."""
    if scan:
        Body = nn.remat(_ScanBlock, prevent_cse=False) if remat else _ScanBlock
        Blocks = nn.scan(
            Body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=layers,
        )
        x, _ = Blocks(width, heads, dtype, attn_impl, quant,
                      name="resblocks")(x, mask, seg)
        return x
    Block = (nn.remat(ResidualAttentionBlock, prevent_cse=False)
             if remat else ResidualAttentionBlock)
    for i in range(layers):
        x = Block(width, heads, dtype, attn_impl, quant,
                  name=f"resblock_{i}")(x, mask, seg)
    return x


class ClipVisionTower(nn.Module):
    """Dense visual tokens: [B, 336, 336, 3] -> [B, 24, 24, 1024].

    CLS is consumed by the transformer but dropped from the output; patch
    tokens pass through ln_post (reference vlm.py:56-61).
    """

    cfg: ClipVisionConfig = ClipVisionConfig()
    dtype: Any = jnp.bfloat16
    scan_layers: bool = True
    remat: bool = False  # checkpoint blocks (train_towers memory fit)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B = x.shape[0]
        x = nn.Conv(c.width, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
                    use_bias=False, dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        x = x.reshape(B, c.grid * c.grid, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(0.02),
                         (c.grid * c.grid + 1, c.width), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.width)), x], axis=1)
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        seg = None
        L = x.shape[1]
        if c.attn_impl in ("flash", "fused", "fused_i8qk"):
            # hoist the tile-alignment pad OUT of the 24-layer loop: pad the
            # sequence to a lane multiple once, isolate pad tokens with
            # segment ids, slice once at the end (per-layer q/k/v pads cost
            # ~4.3 ms/call on this stack — traced, see BASELINE.md)
            Lp = -(-L // 128) * 128
            x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
            # 1-D [Lp] segment ids: batch-uniform BY SHAPE, so the fused
            # path's trace-time contract check passes under jit
            seg = (jnp.arange(Lp) < L).astype(jnp.int32)
        x = _run_blocks(x, None, c.width, c.heads, c.layers, self.dtype,
                        self.scan_layers, c.attn_impl, seg=seg, quant=c.quant,
                        remat=self.remat)
        toks = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 1:L, :])
        return toks.reshape(B, c.grid, c.grid, c.width).astype(jnp.float32)


class ClipTextTower(nn.Module):
    """Token ids [B, 77] -> projected EOT embeddings [B, embed_dim]."""

    cfg: ClipTextConfig = ClipTextConfig()
    dtype: Any = jnp.bfloat16
    scan_layers: bool = True

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.width), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.width), jnp.float32)
        x = emb[ids].astype(self.dtype) + pos.astype(self.dtype)
        L = c.context_length
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
        x = _run_blocks(x, causal, c.width, c.heads, c.layers, self.dtype,
                        self.scan_layers)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        # pool at the EOT token = highest token id (reference vlm.py:81-83)
        eot = jnp.argmax(ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(c.width ** -0.5),
                          (c.width, c.embed_dim), jnp.float32)
        return (pooled.astype(jnp.float32) @ proj).astype(jnp.float32)
