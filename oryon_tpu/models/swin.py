"""Swin-B guidance encoder (frozen appearance backbone) in flax.linen.

The reference taps three nodes of torchvision's swin_b at 384x384 input
(reference: net.py:45-58):
    guidance3 = stage-1 block-2 output              [B, 96, 96, 128]
    guidance2 = first PatchMerging reduction        [B, 48, 48, 256]
    guidance1 = second PatchMerging reduction       [B, 24, 24, 512]
Stages 3/4 are never consumed, so this module computes only
patch-embed -> stage1(2 blocks) -> merge -> stage2(2 blocks) -> merge —
a ~4x FLOP cut versus running the full backbone through a feature extractor.

Architecture follows the published Swin design (window 7, shift 3,
relative-position bias, pre-LN blocks, PatchMerging = LN(4C)+Linear(4C->2C));
parameter layout mirrors torchvision for the weight converter.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 128
    depths: Tuple[int, int] = (2, 2)       # only stages 1-2 are consumed
    heads: Tuple[int, int] = (4, 8)
    window: int = 7
    mlp_ratio: float = 4.0
    # einsum | pallas (packed windows) | band (fused map-level kernel, no
    # HBM partition) | noattn (profiling floor)
    attn_impl: str = "einsum"
    # pad each stage to window multiples ONCE instead of per block: blocks
    # run at padded resolution and re-zero the pad region after norm1 (the
    # published per-block pad writes fresh zeros there), so real-token
    # outputs are bit-identical while 2 pad + 2 crop HBM relayouts per
    # stage disappear (pinned by test_swin_stage_pad_equivalence)
    stage_pad: bool = False
    # "int8": qkv/proj/MLP/reduction projections on the int8 MXU path
    # (models/quant.py; same opt-in caveats as ClipVisionConfig.quant)
    quant: str = "none"


def relative_position_index(window: int) -> np.ndarray:
    """[w*w, w*w] index into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(wins: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = wins.shape[-1]
    x = wins.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def shift_attention_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """[num_windows, w*w, w*w] additive mask for shifted-window attention.

    Pure numpy (sizes are static) so it stays a compile-time constant under jit.
    """
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any = jnp.bfloat16
    attn_impl: str = "einsum"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None,
                 nw: int | None = None) -> jnp.ndarray:
        """x: [num_windows*B, w*w, C] — or, for the "band" impl, the whole
        padded/rolled map [B, Hp, Wp, C] (the kernel partitions in VMEM);
        mask: [num_windows, w*w, w*w] or None;
        nw: windows per image (needed by the pallas/band paths when mask
        is None)."""
        from oryon_tpu.models.quant import dense_cls
        Dense = dense_cls(self.quant)
        if self.attn_impl == "band":
            # fused-layout kernel: window partition/reverse never touch HBM
            # (ops/pallas/swin_attn.py band_window_attention)
            from oryon_tpu.ops.pallas.swin_attn import band_window_attention
            B, Hp, Wp, C = x.shape
            N = self.window * self.window
            hd = C // self.heads
            qkv = Dense(3 * C, dtype=self.dtype, name="qkv")(x)
            table = self.param("relative_position_bias_table",
                               nn.initializers.normal(0.02),
                               ((2 * self.window - 1) ** 2, self.heads),
                               jnp.float32)
            idx = relative_position_index(self.window)
            bias = table[idx.reshape(-1)].reshape(N, N, self.heads)
            bias = bias.transpose(2, 0, 1)
            nw_ = (Hp // self.window) * (Wp // self.window)
            comb = jnp.broadcast_to(bias[None], (nw_, self.heads, N, N))
            if mask is not None:
                comb = comb + mask[:, None]
            out = band_window_attention(qkv, comb, self.heads, self.window,
                                        hd ** -0.5)
            return Dense(C, dtype=self.dtype, name="proj")(out)

        Bw, N, C = x.shape
        hd = C // self.heads
        qkv = Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.attn_impl == "noattn":
            # diagnostic floor (scripts/profile_clip.py): skip score/value
            # matmuls + softmax entirely — NOT a valid attention
            return Dense(C, dtype=self.dtype, name="proj")(v + 0.0 * q)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads), jnp.float32)
        idx = relative_position_index(self.window)
        bias = table[idx.reshape(-1)].reshape(N, N, self.heads).transpose(2, 0, 1)

        if self.attn_impl == "pallas":
            # fused packed kernel: logits never reach HBM, P windows share
            # one block-diagonal matmul (ops/pallas/swin_attn.py)
            from oryon_tpu.ops.pallas.swin_attn import packed_window_attention
            nw_ = mask.shape[0] if mask is not None else nw
            assert nw_ is not None, "pallas window attention needs nw"
            comb = jnp.broadcast_to(bias[None], (nw_, self.heads, N, N))
            if mask is not None:
                comb = comb + mask[:, None]
            pack = next(p for p in (8, 7, 4, 2, 1)
                        if nw_ % p == 0 and p * N <= 512)
            out = packed_window_attention(q, k, v, comb, self.heads, pack,
                                          hd ** -0.5)
            return Dense(C, dtype=self.dtype, name="proj")(out)

        q = q.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(Bw, N, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw_ = mask.shape[0]
            attn = attn.reshape(Bw // nw_, nw_, self.heads, N, N)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bw, self.heads, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    attn_impl: str = "einsum"
    quant: str = "none"
    # real (unpadded) map size when the caller keeps the stage at padded
    # resolution (SwinConfig.stage_pad); None = pad/crop per block
    real_hw: "tuple[int, int] | None" = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = self.window
        prepadded = self.real_hw is not None
        rH, rW = self.real_hw if prepadded else (H, W)
        shift = self.shift if min(rH, rW) > w else 0

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if prepadded:
            # stage-level padding: the map already has window-multiple
            # shape; re-zero the pad region (carries junk from the previous
            # block's residual/MLP) to match the published fresh per-block
            # zero pad — keys from pad tokens must be zeros
            Hp, Wp = H, W
            if (rH, rW) != (H, W):
                pm = np.zeros((1, Hp, Wp, 1), np.float32)
                pm[:, :rH, :rW] = 1.0
                x = x * jnp.asarray(pm, x.dtype)
        else:
            # pad bottom/right to window multiples (published behavior)
            Hp = -(-H // w) * w
            Wp = -(-W // w) * w
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attention_mask(Hp, Wp, w, shift))
        else:
            mask = None
        if self.attn_impl == "band":
            # map-level attention: the kernel does the window partition in
            # VMEM, so no [Bw, N, C] tensors ever exist in HBM
            x = WindowAttention(self.dim, self.heads, w, self.dtype,
                                self.attn_impl, self.quant, name="attn")(
                                    x, mask, nw=(Hp // w) * (Wp // w))
        else:
            wins = _window_partition(x, w)
            wins = WindowAttention(self.dim, self.heads, w, self.dtype,
                                   self.attn_impl, self.quant, name="attn")(
                                       wins, mask, nw=(Hp // w) * (Wp // w))
            x = _window_reverse(wins, w, B, Hp, Wp)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if not prepadded:
            x = x[:, :H, :W]
        x = shortcut + x

        from oryon_tpu.models.quant import dense_cls
        Dense = dense_cls(self.quant)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        h = jax.nn.gelu(h, approximate=False)
        h = Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        # NOTE (traced): the fc2 kOutput fusion carries the next block's
        # pad/roll/window-partition relayout (1.21 vs 0.22 ms for the
        # identical-FLOPs fc1). An optimization_barrier here does NOT help —
        # the relayout work is intrinsic and just moves to a standalone copy.
        return x + h


class PatchMerging(nn.Module):
    dim: int  # input channel count C; output is 2C
    dtype: Any = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C)
        # published concat order: (0,0), (1,0), (0,1), (1,1)
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        from oryon_tpu.models.quant import dense_cls
        return dense_cls(self.quant)(2 * C, use_bias=False, dtype=self.dtype,
                                     name="reduction")(x)


class SwinGuidance(nn.Module):
    """384x384 RGB -> (g1 [24,24,512], g2 [48,48,256], g3 [96,96,128])."""

    cfg: SwinConfig = SwinConfig()
    dtype: Any = jnp.bfloat16
    # Checkpoint each SwinBlock so backward recomputes window attention
    # instead of saving it — needed alongside the CLIP remat to fit
    # train_towers (gradients through both towers) in v5e HBM.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        c = self.cfg
        x = nn.Conv(c.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x).astype(self.dtype)

        def run_stage(x, depth, dim, heads, prefix):
            real_hw = None
            if c.stage_pad:
                B, H, W, _ = x.shape
                Hp = -(-H // c.window) * c.window
                Wp = -(-W // c.window) * c.window
                if (Hp, Wp) != (H, W):
                    real_hw = (H, W)
                    x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            Block = (nn.remat(SwinBlock, prevent_cse=False)
                     if self.remat else SwinBlock)
            for i in range(depth):
                x = Block(dim, heads, c.window,
                          shift=0 if i % 2 == 0 else c.window // 2,
                          mlp_ratio=c.mlp_ratio, dtype=self.dtype,
                          attn_impl=c.attn_impl, quant=c.quant,
                          real_hw=real_hw,
                          name=f"{prefix}_block{i}")(x)
            if real_hw is not None:
                x = x[:, :real_hw[0], :real_hw[1]]
            return x

        x = run_stage(x, c.depths[0], c.embed_dim, c.heads[0], "stage1")
        g3 = x.astype(jnp.float32)                                 # [96, 96, 128]

        x = PatchMerging(c.embed_dim, self.dtype, quant=c.quant, name="merge1")(x)
        g2 = x.astype(jnp.float32)                                 # [48, 48, 256]

        x = run_stage(x, c.depths[1], 2 * c.embed_dim, c.heads[1], "stage2")

        x = PatchMerging(2 * c.embed_dim, self.dtype, quant=c.quant, name="merge2")(x)
        g1 = x.astype(jnp.float32)                                 # [24, 24, 512]
        return [g1, g2, g3]
