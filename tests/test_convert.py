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
