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
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    attn_impl: str = "auto"   # einsum | flash | auto (see MultiHeadAttention)

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


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head attention (torch nn.MultiheadAttention layout).

    attn_impl: "einsum" | "flash" | "auto".  "flash" runs the fused Pallas
    online-softmax kernel (ops/flash.py) — only valid for unmasked attention.
    Measured on v5e at the ViT-L shape ([16, 16, 577->640, 64], bf16): the
    tuned flash kernel TIES the einsum path in-tower (60.9 vs 60.7 ms for the
    24-layer stack) — XLA's fused attention is already HBM-efficient here and
    per-program overheads eat the rest — so "auto" resolves to einsum and
    flash stays opt-in for larger-sequence experiments.
    """

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, L, D = x.shape
        hd = D // self.heads
        in_proj = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(in_proj, 3, axis=-1)
        q = q.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)
        if self.attn_impl == "flash":
            assert mask is None, "flash path is unmasked attention only"
            from oryon_tpu.ops.flash import flash_mha
            out = flash_mha(q, k, v, hd ** -0.5)
        else:
            attn = jnp.einsum("bhld,bhmd->bhlm", q, k) * (hd ** -0.5)
            if mask is not None:
                attn = attn + mask.astype(attn.dtype)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhlm,bhmd->bhld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + MultiHeadAttention(self.width, self.heads, self.dtype,
                                   self.attn_impl, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(y)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class _ScanBlock(nn.Module):
    """ResidualAttentionBlock wrapped for nn.scan (carry = activations)."""

    width: int
    heads: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask) -> tuple:
        x = ResidualAttentionBlock(self.width, self.heads, self.dtype,
                                   self.attn_impl, name="block")(x, mask)
        return x, None


def _run_blocks(x, mask, width, heads, layers, dtype, scan: bool,
                attn_impl: str = "auto"):
    """Transformer stack: nn.scan over one compiled block (compile time and
    HLO size ~layers-times smaller than unrolling — critical for the 24-layer
    ViT-L under slow remote compilation) or the unrolled fallback."""
    if scan:
        Blocks = nn.scan(
            _ScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=layers,
        )
        x, _ = Blocks(width, heads, dtype, attn_impl, name="resblocks")(x, mask)
        return x
    for i in range(layers):
        x = ResidualAttentionBlock(width, heads, dtype, attn_impl,
                                   name=f"resblock_{i}")(x, mask)
    return x


class ClipVisionTower(nn.Module):
    """Dense visual tokens: [B, 336, 336, 3] -> [B, 24, 24, 1024].

    CLS is consumed by the transformer but dropped from the output; patch
    tokens pass through ln_post (reference vlm.py:56-61).
    """

    cfg: ClipVisionConfig = ClipVisionConfig()
    dtype: Any = jnp.bfloat16
    scan_layers: bool = True

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
        x = _run_blocks(x, None, c.width, c.heads, c.layers, self.dtype,
                        self.scan_layers, c.attn_impl)
        toks = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 1:, :])
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
