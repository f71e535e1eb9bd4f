"""Image–text cost-volume fusion (CATSeg-style aggregator), NHWC flax.linen.

Rebuilds the reference fusion stage (reference: models/fusion.py:533-628):
  * clip projection 1024->768 (reference fusion.py:563,577-585)
  * cosine cost volume over the 80 prompt templates
    (einsum 'bchw,btpc->bpthw', reference fusion.py:588-593) -> here a single
    NHWC matmul producing [B, H, W, P]
  * 7x7 conv embedding of the prompt axis into 128 channels (fusion.py:562)
  * N aggregator layers = two guided window-attention blocks (window 12,
    shift 0/6 on the 24x24 grid, appearance guidance concatenated into Q/K —
    reference fusion.py:40-235) + a class transformer over the prompt-group
    axis with ELU linear attention and 6x6 pooling (fusion.py:240-434).

The prompt-group axis T is 1 in the reference pipeline (net.py:153 unsqueezes
a single group) and is kept collapsed here; the class transformer operates on
that single group token per pooled pixel, matching the reference computation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from oryon_tpu.geometry.pcd import unit as _unit
import numpy as np
from flax import linen as nn

from oryon_tpu.models.swin import _window_partition, _window_reverse, shift_attention_mask
from oryon_tpu.ops.resize import resize2d


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    hidden_dim: int = 128
    text_guidance_dim: int = 768
    text_guidance_proj_dim: int = 128
    appearance_guidance_dim: int = 512
    appearance_proj_dim: int = 128
    num_layers: int = 2
    nheads: int = 4
    window: int = 12
    pooling: int = 6
    num_prompts: int = 80
    clip_dim: int = 1024
    clip_proj_dim: int = 768
    use_appearance_guidance: bool = True
    attention_type: str = "linear"   # linear | full (reference fusion.py:309-314)
    guidance_head: str = "default"   # default | mlp | none (fusion.py:493-500)


class GuidedWindowAttention(nn.Module):
    """Window MHA where Q/K see [x; guidance] but V sees only x
    (reference fusion.py:66-85). No relative position bias (ditto)."""

    dim: int
    heads: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        Bw, N, Cin = x.shape
        D = self.dim
        hd = D // self.heads
        q = nn.Dense(D, dtype=self.dtype, name="q")(x)
        k = nn.Dense(D, dtype=self.dtype, name="k")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v")(x[..., :D])
        q = q.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bw // nw, nw, self.heads, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bw, self.heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(Bw, N, D)
        return nn.Dense(D, dtype=self.dtype, name="proj")(out)


class GuidedSwinBlock(nn.Module):
    """One (shifted-)window transformer block with appearance guidance
    (reference fusion.py:105-213)."""

    dim: int
    heads: int
    window: int
    shift: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, guidance: Optional[jnp.ndarray]) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if guidance is not None:
            y = jnp.concatenate([y, guidance.astype(self.dtype)], axis=-1)
        if self.shift > 0:
            y = jnp.roll(y, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shift_attention_mask(H, W, w, self.shift))
        else:
            mask = None
        wins = _window_partition(y, w)
        wins = GuidedWindowAttention(self.dim, self.heads, self.dtype, name="attn")(wins, mask)
        y = _window_reverse(wins, w, B, H, W)
        if self.shift > 0:
            y = jnp.roll(y, shift=(self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(4 * C, dtype=self.dtype, name="mlp_fc1")(z)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class LinearAttention(nn.Module):
    """ELU(+1) feature-map linear attention (reference fusion.py:240-266)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """q: [N, L, H, D], k/v: [N, S, H, D] -> [N, L, H, D]."""
        Q = jax.nn.elu(q) + 1.0
        K = jax.nn.elu(k) + 1.0
        s = v.shape[1]
        v = v / s
        KV = jnp.einsum("nshd,nshv->nhdv", K, v)
        Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, jnp.sum(K, axis=1)) + self.eps)
        return jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s


class FullAttention(nn.Module):
    """Softmax attention alternative to LinearAttention
    (reference fusion.py:268-299)."""

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        D = q.shape[-1]
        qk = jnp.einsum("nlhd,nshd->nlsh", q, k) / jnp.sqrt(D * 1.0)
        a = jax.nn.softmax(qk, axis=2)
        return jnp.einsum("nlsh,nshd->nlhd", a, v)


class MLPGuidanceHead(nn.Module):
    """Pool + text-guided MLP residual, the 'mlp' guidance head
    (reference fusion.py:334-384)."""

    hidden_dim: int
    pooling: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_guidance: Optional[jnp.ndarray]) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.pooling
        Hp, Wp = H // p, W // p
        xp = x.reshape(B, Hp, p, Wp, p, C).mean(axis=(2, 4)).astype(self.dtype)
        h = jax.nn.relu(nn.Dense(C, dtype=self.dtype, name="visualconv")(xp))
        if text_guidance is not None:
            g = jax.nn.relu(nn.Dense(C, dtype=self.dtype, name="textconv")(
                text_guidance.astype(self.dtype)))
            h = h + g[:, None, None, :]
        m = nn.Dense(4 * C, dtype=self.dtype, name="mlp_fc1")(h)
        m = jax.nn.relu(m)
        m = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(m)
        up = resize2d(m + h, (H, W), "linear", align_corners=True)
        return x + up.astype(x.dtype)


class ClassTransformerLayer(nn.Module):
    """Prompt-group transformer over 6x6-pooled features with text guidance
    (reference fusion.py:386-434). T (group axis) = 1 here."""

    hidden_dim: int
    nheads: int
    pooling: int
    attention_type: str = "linear"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_guidance: Optional[jnp.ndarray]) -> jnp.ndarray:
        B, H, W, C = x.shape
        p = self.pooling
        Hp, Wp = H // p, W // p
        x_pool = x.reshape(B, Hp, p, Wp, p, C).mean(axis=(2, 4))  # avg pool
        tok = x_pool.reshape(B * Hp * Wp, 1, C)                    # [BHW, T=1, C]

        t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(tok).astype(self.dtype)
        if text_guidance is not None:
            g = jnp.broadcast_to(text_guidance[:, None, :], (B, Hp * Wp, C))
            g = g.reshape(B * Hp * Wp, 1, C).astype(self.dtype)
            qk_in = jnp.concatenate([t, g], axis=-1)
        else:
            qk_in = t
        q = nn.Dense(C, dtype=self.dtype, name="q")(qk_in)
        k = nn.Dense(C, dtype=self.dtype, name="k")(qk_in)
        v = nn.Dense(C, dtype=self.dtype, name="v")(t)
        hd = C // self.nheads
        q = q.reshape(-1, 1, self.nheads, hd)
        k = k.reshape(-1, 1, self.nheads, hd)
        v = v.reshape(-1, 1, self.nheads, hd)
        attn_cls = LinearAttention if self.attention_type == "linear" else FullAttention
        att = attn_cls(name="attention")(q, k, v).reshape(-1, 1, C)
        tok = tok + att.astype(tok.dtype)

        z = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(tok).astype(self.dtype)
        h = nn.Dense(4 * C, dtype=self.dtype, name="mlp_fc1")(z)
        h = jax.nn.relu(h)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        tok = tok + h.astype(tok.dtype)

        up = tok.reshape(B, Hp, Wp, C)
        up = resize2d(up, (H, W), "linear", align_corners=True)
        return x + up.astype(x.dtype)


class AggregatorLayer(nn.Module):
    cfg: FusionConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, app_guidance, text_guidance):
        c = self.cfg
        if app_guidance is not None:
            app_guidance = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="guidance_norm")(app_guidance)
        x = GuidedSwinBlock(c.hidden_dim, c.nheads, c.window, shift=0,
                            dtype=self.dtype, name="swin_block1")(x, app_guidance)
        x = GuidedSwinBlock(c.hidden_dim, c.nheads, c.window, shift=c.window // 2,
                            dtype=self.dtype, name="swin_block2")(x, app_guidance)
        if c.guidance_head == "default":
            x = ClassTransformerLayer(c.hidden_dim, c.nheads, c.pooling,
                                      c.attention_type, dtype=self.dtype,
                                      name="class_transformer")(x, text_guidance)
        elif c.guidance_head == "mlp":
            x = MLPGuidanceHead(c.hidden_dim, c.pooling, dtype=self.dtype,
                                name="mlp_head")(x, text_guidance)
        elif c.guidance_head != "none":
            raise ValueError(c.guidance_head)
        return x


class ImageTextFusion(nn.Module):
    """CLIP featmap [B,24,24,1024] + prompt embeddings [B,P,768] +
    appearance guidance [B,24,24,512] -> fused correlation embedding
    [B,24,24,128]."""

    cfg: FusionConfig = FusionConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        img_feats: jnp.ndarray,
        text_feats: jnp.ndarray,
        app_guidance: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        c = self.cfg
        B, H, W, _ = img_feats.shape

        # CLIP channel projection 1024 -> 768 (pointwise)
        img = nn.Dense(c.clip_proj_dim, dtype=jnp.float32, name="clip_conv")(img_feats)

        # cosine cost volume over prompts: [B, H, W, P]
        img_n = _unit(img)
        txt_n = text_feats / jnp.maximum(
            jnp.linalg.norm(text_feats, axis=-1, keepdims=True), 1e-8)
        corr = jnp.einsum("bhwc,bpc->bhwp", img_n, txt_n,
                          precision=jax.lax.Precision.HIGHEST)

        # 7x7 conv embedding of the prompt axis (reference conv1)
        x = nn.Conv(c.hidden_dim, (7, 7), padding=3, dtype=self.dtype,
                    name="conv1")(corr.astype(self.dtype))

        proj_guide = None
        if c.use_appearance_guidance and app_guidance is not None:
            proj_guide = nn.Conv(c.appearance_proj_dim, (3, 3), padding=1,
                                 dtype=self.dtype, name="guidance_projection")(
                app_guidance.astype(self.dtype))
            proj_guide = jax.nn.relu(proj_guide)

        # text guidance: mean over prompts, renormalize, project
        tg = jnp.mean(text_feats, axis=1)
        tg = _unit(tg)
        tg = nn.Dense(c.text_guidance_proj_dim, dtype=self.dtype,
                      name="text_guidance_projection")(tg.astype(self.dtype))
        tg = jax.nn.relu(tg)

        for i in range(c.num_layers):
            x = AggregatorLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, proj_guide, tg)
        return x.astype(jnp.float32)
