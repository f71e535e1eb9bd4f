"""Stand-in asset generator for the RUNBOOK asset-day DRILL.

Writes random torch checkpoints in the EXACT file/key/shape layout the
real downloads arrive in (reference setup.sh:7-9, README.md:27-45):

    <out>/ViT-L-14-336px.pt        OpenAI CLIP state dict (visual+text)
    <out>/swin_b.pth               torchvision swin_b state dict
    <out>/catseg.pth               CAT-Seg checkpoint ('model' wrapper +
                                   sem_seg_head.predictor.transformer keys)
    <out>/pointdsc/snapshot/PointDSC_3DMatch_release/models/model_best.pkl

Each tensor's torch-side shape is derived by INVERTING the layout rules in
oryon_tpu/models/convert.py against the full model's abstract init shapes
(jax.eval_shape — nothing big materializes until the random fill), so the
generated files are converter-compatible and shape-exact by construction.
The script then round-trips every file through the REAL converters
(convert_pretrained.py path + load_pretrained_params) and asserts the
merged tree's shapes equal the model's init shapes — a failed drill is a
converter/layout bug, not a generator bug.

Usage: python scripts/make_drill_assets.py out=/tmp/drill_assets [seed=0]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---- inverse layout helpers (mirror convert.py helpers) --------------------
class Gen:
    def __init__(self, seed):
        self.rs = np.random.RandomState(seed)

    def t(self, shape):
        return np.asarray(self.rs.randn(*[int(s) for s in shape]) * 0.02,
                          dtype=np.float32)


def inv_linear(g, sd, prefix, p):
    sd[f"{prefix}.weight"] = g.t(p["kernel"].shape[::-1])
    if "bias" in p:
        sd[f"{prefix}.bias"] = g.t(p["bias"].shape)


def inv_conv2d(g, sd, prefix, p):
    kh, kw, i, o = p["kernel"].shape
    sd[f"{prefix}.weight"] = g.t((o, i, kh, kw))
    if "bias" in p:
        sd[f"{prefix}.bias"] = g.t(p["bias"].shape)


def inv_conv_transpose2d(g, sd, prefix, p):
    kh, kw, i, o = p["kernel"].shape
    sd[f"{prefix}.weight"] = g.t((i, o, kh, kw))
    if "bias" in p:
        sd[f"{prefix}.bias"] = g.t(p["bias"].shape)


def inv_conv1d_as_dense(g, sd, prefix, p):
    i, o = p["kernel"].shape
    sd[f"{prefix}.weight"] = g.t((o, i, 1))
    if "bias" in p:
        sd[f"{prefix}.bias"] = g.t(p["bias"].shape)


def inv_norm(g, sd, prefix, p):
    sd[f"{prefix}.weight"] = g.t(p["scale"].shape)
    sd[f"{prefix}.bias"] = g.t(p["bias"].shape)


def inv_mha_packed(g, sd, prefix, p):
    sd[f"{prefix}.in_proj_weight"] = g.t(p["in_proj"]["kernel"].shape[::-1])
    sd[f"{prefix}.in_proj_bias"] = g.t(p["in_proj"]["bias"].shape)
    inv_linear(g, sd, f"{prefix}.out_proj", p["out_proj"])


def _slice_layer(tree, i):
    """Per-layer view of an nn.scan-stacked block tree (leading layer axis)."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: type("S", (), {"shape": tuple(x.shape)[1:]})(), tree)


def inv_resblock(g, sd, prefix, b):
    inv_norm(g, sd, f"{prefix}.ln_1", b["ln_1"])
    inv_norm(g, sd, f"{prefix}.ln_2", b["ln_2"])
    inv_mha_packed(g, sd, f"{prefix}.attn", b["attn"])
    inv_linear(g, sd, f"{prefix}.mlp.c_fc", b["mlp_c_fc"])
    inv_linear(g, sd, f"{prefix}.mlp.c_proj", b["mlp_c_proj"])


def emit_clip(g, vis, txt):
    """Inverse of convert_clip_visual/convert_clip_text (scan layout)."""
    sd = {}
    kh, kw, i, o = vis["conv1"]["kernel"].shape
    sd["visual.conv1.weight"] = g.t((o, i, kh, kw))
    sd["visual.class_embedding"] = g.t(vis["class_embedding"].shape)
    sd["visual.positional_embedding"] = g.t(vis["positional_embedding"].shape)
    inv_norm(g, sd, "visual.ln_pre", vis["ln_pre"])
    inv_norm(g, sd, "visual.ln_post", vis["ln_post"])
    vb = vis["resblocks"]["block"]
    n_layers = vb["ln_1"]["scale"].shape[0]
    per = _slice_layer(vb, 0)
    for li in range(n_layers):
        inv_resblock(g, sd, f"visual.transformer.resblocks.{li}", per)

    sd["token_embedding.weight"] = g.t(txt["token_embedding"].shape)
    sd["positional_embedding"] = g.t(txt["positional_embedding"].shape)
    inv_norm(g, sd, "ln_final", txt["ln_final"])
    sd["text_projection"] = g.t(txt["text_projection"].shape)
    tb = txt["resblocks"]["block"]
    per = _slice_layer(tb, 0)
    for li in range(tb["ln_1"]["scale"].shape[0]):
        inv_resblock(g, sd, f"transformer.resblocks.{li}", per)
    return sd


def emit_swin(g, gd):
    """Inverse of convert_swin_guidance (torchvision swin_b layout)."""
    sd = {}
    inv_conv2d(g, sd, "features.0.0", gd["patch_embed"])
    inv_norm(g, sd, "features.0.2", gd["patch_norm"])
    for mname, tkey in (("merge1", "features.2"), ("merge2", "features.4")):
        inv_norm(g, sd, f"{tkey}.norm", gd[mname]["norm"])
        sd[f"{tkey}.reduction.weight"] = g.t(
            gd[mname]["reduction"]["kernel"].shape[::-1])

    def blk(prefix, b):
        inv_norm(g, sd, f"{prefix}.norm1", b["norm1"])
        inv_norm(g, sd, f"{prefix}.norm2", b["norm2"])
        inv_linear(g, sd, f"{prefix}.attn.qkv", b["attn"]["qkv"])
        inv_linear(g, sd, f"{prefix}.attn.proj", b["attn"]["proj"])
        sd[f"{prefix}.attn.relative_position_bias_table"] = g.t(
            b["attn"]["relative_position_bias_table"].shape)
        inv_linear(g, sd, f"{prefix}.mlp.0", b["mlp_fc1"])
        inv_linear(g, sd, f"{prefix}.mlp.3", b["mlp_fc2"])

    for i in range(2):
        blk(f"features.1.{i}", gd[f"stage1_block{i}"])
        blk(f"features.3.{i}", gd[f"stage2_block{i}"])
    return sd


def emit_catseg(g, fu, de):
    """Inverse of catseg_key_surgery + convert_fusion/convert_decoder."""
    sd = {}

    def gblock(prefix, b):
        inv_norm(g, sd, f"{prefix}.norm1", b["norm1"])
        inv_norm(g, sd, f"{prefix}.norm2", b["norm2"])
        for qkv in ("q", "k", "v", "proj"):
            inv_linear(g, sd, f"{prefix}.attn.{qkv}", b["attn"][qkv])
        inv_linear(g, sd, f"{prefix}.mlp.fc1", b["mlp_fc1"])
        inv_linear(g, sd, f"{prefix}.mlp.fc2", b["mlp_fc2"])

    inv_conv1d_as_dense(g, sd, "fusion.clip_conv", fu["clip_conv"])
    inv_conv2d(g, sd, "fusion.conv1", fu["conv1"])
    inv_conv2d(g, sd, "fusion.guidance_projection.0", fu["guidance_projection"])
    inv_linear(g, sd, "fusion.text_guidance_projection.0",
               fu["text_guidance_projection"])
    li = 0
    while f"layer_{li}" in fu:
        L = fu[f"layer_{li}"]
        b = f"fusion.layers.{li}"
        inv_norm(g, sd, f"{b}.swin_block.guidance_norm", L["guidance_norm"])
        gblock(f"{b}.swin_block.block_1", L["swin_block1"])
        gblock(f"{b}.swin_block.block_2", L["swin_block2"])
        ct = L["class_transformer"]
        inv_norm(g, sd, f"{b}.attention.norm1", ct["norm1"])
        inv_norm(g, sd, f"{b}.attention.norm2", ct["norm2"])
        for qkv in ("q", "k", "v"):
            inv_linear(g, sd, f"{b}.attention.attention.{qkv}", ct[qkv])
        inv_linear(g, sd, f"{b}.attention.MLP.0", ct["mlp_fc1"])
        inv_linear(g, sd, f"{b}.attention.MLP.2", ct["mlp_fc2"])
        li += 1

    def up(prefix, d):
        inv_conv_transpose2d(g, sd, f"{prefix}.up", d["up"])
        inv_conv2d(g, sd, f"{prefix}.conv.double_conv.0", d["conv"]["conv1"])
        inv_norm(g, sd, f"{prefix}.conv.double_conv.1", d["conv"]["gn1"])
        inv_conv2d(g, sd, f"{prefix}.conv.double_conv.3", d["conv"]["conv2"])
        inv_norm(g, sd, f"{prefix}.conv.double_conv.4", d["conv"]["gn2"])

    up("fusion.decoder1", de["decoder1"])
    up("fusion.decoder2", de["decoder2"])
    up("fusion.decoder3", de["decoder3"])
    inv_conv2d(g, sd, "fusion.head", de["head"])
    inv_conv2d(g, sd, "fusion.decoder_guidance_projection.0.0",
               de["guidance_proj_0"])
    inv_conv2d(g, sd, "fusion.decoder_guidance_projection.1.0",
               de["guidance_proj_1"])

    # undo the net.py surgery: fusion.X -> sem_seg_head.predictor.transformer.X
    pref = "sem_seg_head.predictor.transformer."
    return {pref + k[len("fusion."):]: v for k, v in sd.items()}


def emit_pointdsc(g, p):
    """Inverse of convert_pointdsc from flax PointDSC init shapes."""
    sd = {"sigma": g.t(tuple(p["sigma"].shape))}
    enc = p["encoder"]

    def inv_bn(prefix, ch):
        sd[f"{prefix}.weight"] = g.t((ch,))
        sd[f"{prefix}.bias"] = g.t((ch,))
        sd[f"{prefix}.running_mean"] = g.t((ch,))
        sd[f"{prefix}.running_var"] = np.abs(g.t((ch,))) + 1.0

    inv_conv1d_as_dense(g, sd, "encoder.layer0", enc["layer0"])
    i = 0
    while f"pointcn_{i}" in enc:
        pc = f"encoder.blocks.PointCN_layer_{i}"
        inv_conv1d_as_dense(g, sd, f"{pc}.0", enc[f"pointcn_{i}"]["conv"])
        inv_bn(f"{pc}.1", enc[f"pointcn_{i}"]["bn"]["scale"].shape[0])
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        NL = enc[f"nonlocal_{i}"]
        for pr in ("projection_q", "projection_k", "projection_v"):
            inv_conv1d_as_dense(g, sd, f"{nl}.{pr}", NL[pr])
        inv_conv1d_as_dense(g, sd, f"{nl}.fc_message.0", NL["fc1"]["conv"])
        inv_bn(f"{nl}.fc_message.1", NL["fc1"]["bn"]["scale"].shape[0])
        inv_conv1d_as_dense(g, sd, f"{nl}.fc_message.3", NL["fc2"]["conv"])
        inv_bn(f"{nl}.fc_message.4", NL["fc2"]["bn"]["scale"].shape[0])
        inv_conv1d_as_dense(g, sd, f"{nl}.fc_message.6", NL["fc3"])
        i += 1
    inv_conv1d_as_dense(g, sd, "classification.0", p["cls1"])
    inv_conv1d_as_dense(g, sd, "classification.2", p["cls2"])
    inv_conv1d_as_dense(g, sd, "classification.4", p["cls3"])
    return sd


def _shapes(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: tuple(x.shape), tree)


def main(argv):
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out = kv.get("out", "/tmp/drill_assets")
    seed = int(kv.get("seed", 0))
    os.makedirs(out, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")  # generator is host-side only
    import jax.numpy as jnp
    import torch

    from oryon_tpu.models.oryon import build_model

    t0 = time.time()
    model = build_model("full")
    rgb = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    ids = jax.ShapeDtypeStruct((1, 1, 77), jnp.int32)
    abs_tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), rgb, rgb, ids)
    p = abs_tree["params"]
    print(f"abstract full-model tree: {time.time()-t0:.1f}s")

    g = Gen(seed)

    def save(sd, path, wrap=None):
        tsd = {k: torch.from_numpy(v) for k, v in sd.items()}
        torch.save({"model": tsd} if wrap == "model" else tsd, path)
        mb = os.path.getsize(path) / 1e6
        print(f"wrote {path}: {len(sd)} tensors, {mb:.0f} MB")

    t0 = time.time()
    save(emit_clip(g, p["vlm_visual"], p["vlm_text"]),
         os.path.join(out, "ViT-L-14-336px.pt"))
    save(emit_swin(g, p["guidance"]), os.path.join(out, "swin_b.pth"))
    save(emit_catseg(g, p["fusion"], p["decoder"]),
         os.path.join(out, "catseg.pth"), wrap="model")
    print(f"tower checkpoints: {time.time()-t0:.1f}s")

    # PointDSC snapshot (reference utils/pointdsc/init.py dir layout)
    from oryon_tpu.models.pointdsc import PointDSC
    pd = PointDSC()
    pts = jnp.zeros((64, 3), jnp.float32)
    pd_abs = jax.eval_shape(pd.init, jax.random.PRNGKey(0), pts, pts,
                            jnp.ones((64,), jnp.float32))
    snap = os.path.join(out, "pointdsc", "snapshot",
                        "PointDSC_3DMatch_release", "models")
    os.makedirs(snap, exist_ok=True)
    save(emit_pointdsc(g, pd_abs["params"]),
         os.path.join(snap, "model_best.pkl"))

    # ---- round-trip validation through the REAL converters -----------------
    t0 = time.time()
    from oryon_tpu.models import convert as C
    from oryon_tpu.models.pretrained import catseg_key_surgery

    sd = C.load_torch_state(os.path.join(out, "ViT-L-14-336px.pt"))
    assert _shapes(C.convert_clip_visual(sd)["params"]) == _shapes(p["vlm_visual"])
    assert _shapes(C.convert_clip_text(sd)["params"]) == _shapes(p["vlm_text"])
    sd = C.load_torch_state(os.path.join(out, "swin_b.pth"))
    assert _shapes(C.convert_swin_guidance(sd)["params"]) == _shapes(p["guidance"])
    sd = catseg_key_surgery(C.load_torch_state(os.path.join(out, "catseg.pth")))
    assert _shapes(C.convert_fusion(sd)["params"]) == _shapes(p["fusion"])
    assert _shapes(C.convert_decoder(sd)["params"]) == _shapes(p["decoder"])
    sd = C.load_torch_state(os.path.join(snap, "model_best.pkl"))
    conv_pd = C.convert_pointdsc(sd)
    assert _shapes(conv_pd["params"]) == _shapes(pd_abs["params"])
    print(f"round-trip validation vs model init shapes: OK "
          f"({time.time()-t0:.1f}s)")
    print(f"DRILL ASSETS READY under {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
