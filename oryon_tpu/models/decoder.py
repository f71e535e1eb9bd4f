"""Guided upsampling decoder: 24² fused embedding -> 192² featmap + mask.

Rebuilds the reference CATSeg-decoder refactor (reference: models/decoder.py):
two guided transpose-conv upsamples (guidance projected from the Swin taps,
reference decoder.py:65-74), one extra unguided upsample, GroupNorm
DoubleConvs, and a 1-channel mask head.  NHWC throughout.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    input_dim: int = 128
    decoder_dims: Tuple[int, int] = (64, 32)
    # (guidance INPUT dims are inferred by nn.Conv from the actual taps)
    guidance_output_dims: Tuple[int, int] = (32, 16)
    extra_upsampling: bool = True
    use_guidance: bool = True
    out_channels: int = 32


class DoubleConv(nn.Module):
    """(conv3x3 -> GroupNorm -> ReLU) x 2 (reference decoder.py:9-26)."""

    out_ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.GroupNorm(num_groups=self.out_ch // 16, epsilon=1e-5, dtype=jnp.float32, name="gn1")(x)
        x = jax.nn.relu(x).astype(self.dtype)
        x = nn.Conv(self.out_ch, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.GroupNorm(num_groups=self.out_ch // 16, epsilon=1e-5, dtype=jnp.float32, name="gn2")(x)
        return jax.nn.relu(x).astype(self.dtype)


class Up(nn.Module):
    """2x transpose-conv upsample, concat guidance, DoubleConv
    (reference decoder.py:29-42)."""

    up_ch: int       # transpose-conv output channels (in - guidance)
    out_ch: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, guidance: Optional[jnp.ndarray]) -> jnp.ndarray:
        x = nn.ConvTranspose(self.up_ch, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up")(x)
        if guidance is not None:
            x = jnp.concatenate([x, guidance.astype(self.dtype)], axis=-1)
        return DoubleConv(self.out_ch, self.dtype, name="conv")(x)


class StandardDecoder(nn.Module):
    cfg: DecoderConfig = DecoderConfig()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, guidance: List[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, 24, 24, 128]; guidance: [g1 (unused here), g2 48², g3 96²].

        Returns (mask logits [B, 192, 192], featmap [B, 192, 192, out_ch]).
        The decoder consumes guidance[1:] — g2 and g3 (reference decoder.py:85).
        """
        c = self.cfg
        proj = [None, None]
        if c.use_guidance:
            for i, (g, dp) in enumerate(zip(guidance[1:], c.guidance_output_dims)):
                p = nn.Conv(dp, (3, 3), padding=1, dtype=self.dtype,
                            name=f"guidance_proj_{i}")(g.astype(self.dtype))
                proj[i] = jax.nn.relu(p)

        g0 = c.guidance_output_dims[0] if c.use_guidance else 0
        g1 = c.guidance_output_dims[1] if c.use_guidance else 0
        x = Up(c.input_dim - g0, c.decoder_dims[0], self.dtype, name="decoder1")(
            x.astype(self.dtype), proj[0])
        x = Up(c.decoder_dims[0] - g1, c.decoder_dims[1], self.dtype, name="decoder2")(
            x, proj[1])
        if c.extra_upsampling:
            x = Up(c.decoder_dims[1], c.decoder_dims[1], self.dtype, name="decoder3")(
                x, None)

        featmap = x.astype(jnp.float32)
        mask_logits = nn.Conv(1, (3, 3), padding=1, dtype=jnp.float32,
                              name="head")(featmap)[..., 0]
        return mask_logits, featmap
