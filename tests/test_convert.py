"""Weight-converter layout tests: torch forward == flax forward after
conversion, for every layer family the converters touch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
from flax import linen as fnn

from oryon_tpu.models import convert as C

KEY = jax.random.PRNGKey(0)


def to_sd(mod, prefix=""):
    return {f"{prefix}{k}" if not prefix else f"{prefix}.{k}": v.detach().numpy()
            for k, v in mod.state_dict().items()}


def test_linear_layout(rng):
    tm = nn.Linear(6, 10)
    x = rng.randn(3, 6).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy()
    p = C.linear(to_sd(tm, "l"), "l")
    got = np.asarray(fnn.Dense(10).apply({"params": p}, jnp.array(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_conv2d_layout(rng):
    tm = nn.Conv2d(3, 8, 3, padding=1)
    x = rng.randn(2, 3, 10, 12).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    p = C.conv2d(to_sd(tm, "c"), "c")
    got = np.asarray(fnn.Conv(8, (3, 3), padding=1).apply(
        {"params": p}, jnp.array(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv_transpose2d_layout(rng):
    tm = nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = rng.randn(1, 6, 7, 9).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy().transpose(0, 2, 3, 1)
    p = C.conv_transpose2d(to_sd(tm, "t"), "t")
    got = np.asarray(fnn.ConvTranspose(4, (2, 2), strides=(2, 2)).apply(
        {"params": p}, jnp.array(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv1d_as_dense(rng):
    tm = nn.Conv1d(5, 7, kernel_size=1)
    x = rng.randn(1, 5, 11).astype(np.float32)   # [B, C, N]
    ref = tm(torch.tensor(x)).detach().numpy()[0].T  # [N, 7]
    p = C.conv1d_as_dense(to_sd(tm, "c"), "c")
    got = np.asarray(fnn.Dense(7).apply({"params": p}, jnp.array(x[0].T)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_layernorm_layout(rng):
    tm = nn.LayerNorm(12)
    with torch.no_grad():
        tm.weight.mul_(1.7)
        tm.bias.add_(0.3)
    x = rng.randn(4, 12).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy()
    p = C.norm(to_sd(tm, "n"), "n")
    got = np.asarray(fnn.LayerNorm(epsilon=1e-5).apply({"params": p}, jnp.array(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_batchnorm_layout(rng):
    tm = nn.BatchNorm1d(6)
    tm.eval()
    with torch.no_grad():
        tm.running_mean.add_(torch.tensor(rng.randn(6).astype(np.float32)))
        tm.running_var.mul_(torch.tensor(1 + rng.rand(6).astype(np.float32)))
        tm.weight.mul_(1.3)
    x = rng.randn(4, 6, 5).astype(np.float32)    # [B, C, N]
    ref = tm(torch.tensor(x)).detach().numpy()[0].T  # [N, C] of batch 0
    p, stats = C.batchnorm(to_sd(tm, "b"), "b")
    bn = fnn.BatchNorm(use_running_average=True)
    got = np.asarray(bn.apply({"params": p, "batch_stats": stats},
                              jnp.array(x[0].T)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_mha_packed_layout(rng):
    D, H = 16, 4
    tm = nn.MultiheadAttention(D, H, batch_first=True)
    x = rng.randn(2, 5, D).astype(np.float32)
    ref, _ = tm(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                need_weights=False)
    ref = ref.detach().numpy()
    from oryon_tpu.models.clip import MultiHeadAttention
    p = C.mha_packed(to_sd(tm, "a"), "a")
    got = np.asarray(MultiHeadAttention(D, H, dtype=jnp.float32).apply(
        {"params": p}, jnp.array(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_clip_resblock_conversion(rng):
    """Full residual attention block: torch manual composition (the CLIP
    published arithmetic) vs our ResidualAttentionBlock with converted
    weights."""
    D, H, L = 16, 4, 6

    class TorchBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(D)
            self.ln_2 = nn.LayerNorm(D)
            self.attn = nn.MultiheadAttention(D, H, batch_first=True)
            self.mlp = nn.ModuleDict({"c_fc": nn.Linear(D, 4 * D),
                                      "c_proj": nn.Linear(4 * D, D)})

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            y = self.ln_2(x)
            h = self.mlp["c_fc"](y)
            h = h * torch.sigmoid(1.702 * h)
            return x + self.mlp["c_proj"](h)

    tm = TorchBlock()
    x = rng.randn(2, L, D).astype(np.float32)
    ref = tm(torch.tensor(x)).detach().numpy()
    sd = to_sd(tm, "visual.transformer.resblocks.0")
    from oryon_tpu.models.clip import ResidualAttentionBlock
    p = {
        "ln_1": C.norm(sd, "visual.transformer.resblocks.0.ln_1"),
        "ln_2": C.norm(sd, "visual.transformer.resblocks.0.ln_2"),
        "attn": C.mha_packed(sd, "visual.transformer.resblocks.0.attn"),
        "mlp_c_fc": C.linear(sd, "visual.transformer.resblocks.0.mlp.c_fc"),
        "mlp_c_proj": C.linear(sd, "visual.transformer.resblocks.0.mlp.c_proj"),
    }
    got = np.asarray(ResidualAttentionBlock(D, H, dtype=jnp.float32).apply(
        {"params": p}, jnp.array(x)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_pointdsc_converter_structure(rng):
    """Converted PointDSC tree must load into the flax module."""
    from oryon_tpu.models.pointdsc import PointDSC, PointDSCConfig

    C_CH, L = 128, 2
    sd = {"sigma": np.ones(1, np.float32)}

    def add_conv1d(name, i, o):
        sd[f"{name}.weight"] = rng.randn(o, i, 1).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    add_conv1d("encoder.layer0", 6, C_CH)
    for i in range(L):
        add_conv1d(f"encoder.blocks.PointCN_layer_{i}.0", C_CH, C_CH)
        add_bn(f"encoder.blocks.PointCN_layer_{i}.1", C_CH)
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        for p in ("projection_q", "projection_k", "projection_v"):
            add_conv1d(f"{nl}.{p}", C_CH, C_CH)
        add_conv1d(f"{nl}.fc_message.0", C_CH, C_CH // 2)
        add_bn(f"{nl}.fc_message.1", C_CH // 2)
        add_conv1d(f"{nl}.fc_message.3", C_CH // 2, C_CH // 2)
        add_bn(f"{nl}.fc_message.4", C_CH // 2)
        add_conv1d(f"{nl}.fc_message.6", C_CH // 2, C_CH)
    add_conv1d("classification.0", C_CH, 32)
    add_conv1d("classification.2", 32, 32)
    add_conv1d("classification.4", 32, 1)

    variables = C.convert_pointdsc(sd, num_layers=L)
    model = PointDSC(PointDSCConfig(num_layers=L))
    src = jnp.array(rng.randn(64, 3).astype(np.float32) * 0.2)
    T, labels, conf = model.apply(variables, src, src, jnp.ones(64))
    # identical clouds: identity transform expected
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-3)


def test_scan_vs_unrolled_tower_equivalence(rng):
    """Scanned tower (stacked params) == unrolled tower (per-layer params)."""
    from oryon_tpu.models.clip import ClipTextConfig, ClipTextTower

    cfg = ClipTextConfig(vocab_size=100, context_length=8, width=16, layers=3,
                         heads=4, embed_dim=12)
    ids = np.zeros((2, 8), np.int32)
    ids[:, 0] = 98
    ids[:, 1] = rng.randint(1, 90, 2)
    ids[:, 2] = 99

    # build a torch-layout state dict for 3 layers
    sd = {
        "token_embedding.weight": rng.randn(100, 16).astype(np.float32) * 0.1,
        "positional_embedding": rng.randn(8, 16).astype(np.float32) * 0.1,
        "ln_final.weight": np.ones(16, np.float32),
        "ln_final.bias": np.zeros(16, np.float32),
        "text_projection": rng.randn(16, 12).astype(np.float32) * 0.1,
    }
    for i in range(3):
        b = f"transformer.resblocks.{i}"
        for nm, shape in [("ln_1", 16), ("ln_2", 16)]:
            sd[f"{b}.{nm}.weight"] = np.ones(shape, np.float32)
            sd[f"{b}.{nm}.bias"] = np.zeros(shape, np.float32)
        sd[f"{b}.attn.in_proj_weight"] = rng.randn(48, 16).astype(np.float32) * 0.1
        sd[f"{b}.attn.in_proj_bias"] = np.zeros(48, np.float32)
        sd[f"{b}.attn.out_proj.weight"] = rng.randn(16, 16).astype(np.float32) * 0.1
        sd[f"{b}.attn.out_proj.bias"] = np.zeros(16, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = rng.randn(64, 16).astype(np.float32) * 0.1
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(64, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = rng.randn(16, 64).astype(np.float32) * 0.1
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(16, np.float32)

    p_scan = C.convert_clip_text(sd, layers=3, scan=True)
    p_unroll = C.convert_clip_text(sd, layers=3, scan=False)
    m_scan = ClipTextTower(cfg, dtype=jnp.float32, scan_layers=True)
    m_unroll = ClipTextTower(cfg, dtype=jnp.float32, scan_layers=False)
    y_scan = m_scan.apply(jax.tree_util.tree_map(jnp.asarray, p_scan), jnp.array(ids))
    y_unroll = m_unroll.apply(jax.tree_util.tree_map(jnp.asarray, p_unroll), jnp.array(ids))
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_unroll), atol=1e-5)


def test_catseg_key_surgery():
    from oryon_tpu.models.pretrained import catseg_key_surgery
    sd = {
        "sem_seg_head.predictor.transformer.conv1.weight": np.zeros(1),
        "sem_seg_head.predictor.transformer.decoder.decoder1.up.weight": np.zeros(1),
        "sem_seg_head.predictor.transformer.head.weight": np.zeros(1),
        "sem_seg_head.predictor.clip_model.visual.conv1.weight": np.zeros(1),
        "backbone.something": np.zeros(1),
    }
    out = catseg_key_surgery(sd)
    assert "fusion.conv1.weight" in out
    assert "decoder.decoder.decoder1.up.weight" in out
    assert "decoder.head.weight" in out
    assert "clip.visual.conv1.weight" in out
    assert not any(k.startswith("backbone") for k in out)


def test_load_pretrained_reports_missing(tmp_path):
    from oryon_tpu.config import Config
    from oryon_tpu.models.pretrained import load_pretrained_params
    cfg = Config()
    cfg.pretrained.clip = str(tmp_path / "nope.npz")
    cfg.pretrained.swin = str(tmp_path / "nope2.npz")
    cfg.pretrained.catseg = str(tmp_path / "nope3.npz")
    params = {"params": {"vlm_visual": {}, "vlm_text": {}, "guidance": {},
                         "fusion": {}, "decoder": {}}}
    out, report = load_pretrained_params(cfg, params)
    assert len(report) == 3
    assert all("missing" in r for r in report)


# ---- full-tower cross-check: independent torch Swin vs converted flax -----
class _TorchShiftedWindowBlock(nn.Module):
    """Faithful torch replica of torchvision's SwinTransformerBlock
    (torchvision.models.swin_transformer semantics: pad -> roll -> window
    partition -> qkv attention with relative-position bias + region mask ->
    reverse -> unpad), with torchvision's state-dict naming so
    convert_swin_guidance consumes it unchanged."""

    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.dim, self.heads, self.window, self.shift = dim, heads, window, shift
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.attn.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(),
                                 nn.Identity(), nn.Linear(4 * dim, dim))

    def _attention(self, x):
        B, H, W, C = x.shape
        w, heads = self.window, self.heads
        hd = C // heads
        pad_r = (w - W % w) % w
        pad_b = (w - H % w) % w
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        shift = self.shift if min(Hp, Wp) > w else 0
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
        nH, nW = Hp // w, Wp // w
        wins = (x.view(B, nH, w, nW, w, C).permute(0, 1, 3, 2, 4, 5)
                .reshape(B * nH * nW, w * w, C))
        qkv = self.attn.qkv(wins)
        q, k, v = qkv.reshape(-1, w * w, 3, heads, hd).permute(2, 0, 3, 1, 4)
        att = (q * hd ** -0.5) @ k.transpose(-2, -1)

        import numpy as _np
        coords = _np.stack(_np.meshgrid(_np.arange(w), _np.arange(w),
                                        indexing="ij")).reshape(2, -1)
        rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0) + w - 1
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        bias = self.attn.relative_position_bias_table[idx.reshape(-1)]
        bias = bias.reshape(w * w, w * w, heads).permute(2, 0, 1)
        att = att + bias.unsqueeze(0)

        if shift:
            img = torch.zeros(Hp, Wp)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = (img.view(nH, w, nW, w).permute(0, 2, 1, 3)
                  .reshape(-1, w * w))
            diff = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = torch.where(diff != 0, torch.tensor(-100.0),
                               torch.tensor(0.0))
            att = att.view(B, nH * nW, heads, w * w, w * w)
            att = att + mask.unsqueeze(0).unsqueeze(2)
            att = att.view(-1, heads, w * w, w * w)
        att = att.softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(-1, w * w, C)
        out = self.attn.proj(out)
        x = (out.view(B, nH, nW, w, w, C).permute(0, 1, 3, 2, 4, 5)
             .reshape(B, Hp, Wp, C))
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        return x[:, :H, :W]

    def forward(self, x):
        x = x + self._attention(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        return self.reduction(self.norm(torch.cat([x0, x1, x2, x3], -1)))


class _TorchSwinGuidance(nn.Module):
    """Stages 1-2 of torchvision swin_b layout (features.0 .. features.4)."""

    def __init__(self, dim=128, window=7):
        super().__init__()
        f0 = nn.Sequential(nn.Conv2d(3, dim, 4, 4), nn.Identity(),
                           nn.LayerNorm(dim, eps=1e-5))
        f1 = nn.Sequential(*[_TorchShiftedWindowBlock(dim, 4, window,
                                                      0 if i % 2 == 0 else window // 2)
                             for i in range(2)])
        f3 = nn.Sequential(*[_TorchShiftedWindowBlock(2 * dim, 8, window,
                                                      0 if i % 2 == 0 else window // 2)
                             for i in range(2)])
        self.features = nn.Sequential(f0, f1, _TorchPatchMerging(dim), f3,
                                      _TorchPatchMerging(2 * dim))

    def forward(self, x):
        x = self.features[0][0](x).permute(0, 2, 3, 1)
        x = self.features[0][2](x)
        x = self.features[1](x)
        g3 = x
        x = self.features[2](x)
        g2 = x
        x = self.features[3](x)
        g1 = self.features[4](x)
        return g1, g2, g3


def test_swin_guidance_full_tower_vs_torch(rng):
    """Converted torch state through the flax SwinGuidance must reproduce an
    INDEPENDENT torch implementation of torchvision's swin stages 1-2 —
    covers patch embed, shifted masks, rel-pos bias, pad/roll order, and
    both PatchMergings end to end (SURVEY §7 risk 5: conversion fidelity)."""
    from oryon_tpu.models import convert
    from oryon_tpu.models.swin import SwinConfig, SwinGuidance

    tm = _TorchSwinGuidance().eval()
    x = rng.rand(1, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        tg1, tg2, tg3 = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert.convert_swin_guidance(sd)
    fm = SwinGuidance(SwinConfig(), dtype=jnp.float32)
    fg1, fg2, fg3 = fm.apply(jax.tree_util.tree_map(jnp.asarray, params),
                             jnp.asarray(x))
    for t, f in ((tg1, fg1), (tg2, fg2), (tg3, fg3)):
        np.testing.assert_allclose(np.asarray(f), t.numpy(),
                                   atol=2e-4, rtol=2e-4)


class _TorchClipResblock(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-5)
        self.ln_2 = nn.LayerNorm(d, eps=1e-5)
        self.attn = nn.MultiheadAttention(d, heads)
        self.mlp = nn.ModuleDict({"c_fc": nn.Linear(d, 4 * d),
                                  "c_proj": nn.Linear(4 * d, d)})

    def forward(self, x, mask=None):  # x: [L, B, D]
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
        h = self.mlp["c_fc"](self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # quickgelu
        return x + self.mlp["c_proj"](h)


def test_clip_towers_full_vs_torch(rng):
    """Converted torch state through BOTH flax CLIP towers must reproduce an
    independent torch implementation of OpenAI CLIP's VisionTransformer
    (dense patch-token output per reference vlm.py:56-61) and text encoder
    (causal mask + EOT pooling + projection). SURVEY §7 risk 5."""
    from oryon_tpu.models import convert
    from oryon_tpu.models.clip import (ClipTextConfig, ClipTextTower,
                                       ClipVisionConfig, ClipVisionTower)

    W, L, H, IMG, PATCH = 64, 2, 4, 56, 14
    grid = IMG // PATCH

    # ---- torch vision tower (OpenAI clip.model.VisionTransformer layout)
    tv = nn.ModuleDict()
    conv = nn.Conv2d(3, W, PATCH, PATCH, bias=False)
    blocks = nn.ModuleList([_TorchClipResblock(W, H) for _ in range(L)])
    ln_pre, ln_post = nn.LayerNorm(W, eps=1e-5), nn.LayerNorm(W, eps=1e-5)
    cls = torch.randn(W) * 0.02
    pos = torch.randn(grid * grid + 1, W) * 0.02

    x_np = rng.rand(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        x = conv(torch.from_numpy(x_np).permute(0, 3, 1, 2))
        x = x.reshape(2, W, -1).permute(0, 2, 1)
        x = torch.cat([cls.expand(2, 1, W), x], dim=1) + pos
        x = ln_pre(x).permute(1, 0, 2)        # LND
        for b in blocks:
            x = b(x)
        x = x.permute(1, 0, 2)
        t_vis = ln_post(x[:, 1:, :]).reshape(2, grid, grid, W).numpy()

    sd = {"visual.conv1.weight": conv.weight.detach().numpy(),
          "visual.class_embedding": cls.numpy(),
          "visual.positional_embedding": pos.numpy(),
          **{f"visual.ln_pre.{k}": v.detach().numpy()
             for k, v in ln_pre.state_dict().items()},
          **{f"visual.ln_post.{k}": v.detach().numpy()
             for k, v in ln_post.state_dict().items()}}
    for i, b in enumerate(blocks):
        for k, v in b.state_dict().items():
            sd[f"visual.transformer.resblocks.{i}.{k}"] = v.detach().numpy()

    fv = ClipVisionTower(ClipVisionConfig(image_size=IMG, patch_size=PATCH,
                                          width=W, layers=L, heads=H,
                                          attn_impl="einsum"),
                         dtype=jnp.float32)
    params = convert.convert_clip_visual(sd, layers=L)
    f_vis = np.asarray(fv.apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x_np)))
    np.testing.assert_allclose(f_vis, t_vis, atol=2e-4, rtol=2e-4)

    # ---- torch text tower
    VOC, CTX, TW, TE = 600, 16, 32, 48
    emb = torch.randn(VOC, TW) * 0.02
    tpos = torch.randn(CTX, TW) * 0.01
    tblocks = nn.ModuleList([_TorchClipResblock(TW, H) for _ in range(L)])
    ln_final = nn.LayerNorm(TW, eps=1e-5)
    tproj = torch.randn(TW, TE) * TW ** -0.5
    ids_np = np.zeros((3, CTX), np.int64)
    ids_np[:, 0] = 1
    ids_np[:, 1:5] = rng.randint(2, VOC - 10, (3, 4))
    ids_np[:, 5] = VOC - 1   # EOT = highest id
    with torch.no_grad():
        t = emb[torch.from_numpy(ids_np)] + tpos
        causal = torch.full((CTX, CTX), float("-inf")).triu(1)
        t = t.permute(1, 0, 2)
        for b in tblocks:
            t = b(t, mask=causal)
        t = ln_final(t.permute(1, 0, 2))
        eot = torch.from_numpy(ids_np).argmax(-1)
        t_txt = (t[torch.arange(3), eot] @ tproj).numpy()

    tsd = {"token_embedding.weight": emb.numpy(),
           "positional_embedding": tpos.numpy(),
           "text_projection": tproj.numpy(),
           **{f"ln_final.{k}": v.detach().numpy()
              for k, v in ln_final.state_dict().items()}}
    for i, b in enumerate(tblocks):
        for k, v in b.state_dict().items():
            tsd[f"transformer.resblocks.{i}.{k}"] = v.detach().numpy()

    ft = ClipTextTower(ClipTextConfig(vocab_size=VOC, context_length=CTX,
                                      width=TW, layers=L, heads=H,
                                      embed_dim=TE), dtype=jnp.float32)
    tparams = convert.convert_clip_text(tsd, layers=L)
    f_txt = np.asarray(ft.apply(
        jax.tree_util.tree_map(jnp.asarray, tparams),
        jnp.asarray(ids_np.astype(np.int32))))
    np.testing.assert_allclose(f_txt, t_txt, atol=2e-4, rtol=2e-4)
