"""Pretrained-weight converters: torch state dicts -> flax parameter trees.

One-time host-side conversion replacing the reference's runtime checkpoint
surgery (reference: net.py:99-139 CATSeg key remapping, models/vlm.py:19
OpenAI clip.load, net.py:46 torchvision swin_b weights,
utils/pointdsc/init.py:32-57 PointDSC snapshot).

Layout rules (torch -> flax):
  * Linear:        [out, in]            -> kernel [in, out] (transpose)
  * Conv2d:        [out, in, kh, kw]    -> kernel [kh, kw, in, out]
  * ConvTranspose2d [in, out, kh, kw]   -> kernel [kh, kw, in, out]
  * Conv1d k=1:    [out, in, 1]         -> Dense kernel [in, out]
  * LayerNorm/GN:  weight/bias          -> scale/bias (as-is)
  * BatchNorm:     weight/bias/running_* -> scale/bias + batch_stats

State dicts are plain ``dict[str, np.ndarray]`` — load .pth with
``load_torch_state`` (torch CPU) or .npz archives.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in raw.items()
            if hasattr(v, "detach")}


def load_npz_state(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---- layout helpers --------------------------------------------------------
def linear(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv2d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]  # [O, I, kh, kw]
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv_transpose2d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]  # [I, O, kh, kw]
    # flax ConvTranspose kernel [kh, kw, in, out]; torch computes a true
    # transposed conv — flax uses the mirrored kernel convention, so flip
    # spatial dims to match torch's output
    out = {"kernel": np.flip(w.transpose(2, 3, 0, 1), axis=(0, 1)).copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv1d_as_dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    w = sd[f"{prefix}.weight"]  # [O, I, 1]
    out = {"kernel": w[:, :, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def norm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def batchnorm(sd: Dict, prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def mha_packed(sd: Dict, prefix: str) -> Dict[str, Any]:
    """torch nn.MultiheadAttention (in_proj_weight packed) -> our
    MultiHeadAttention {in_proj, out_proj}."""
    return {
        "in_proj": {"kernel": sd[f"{prefix}.in_proj_weight"].T,
                    "bias": sd[f"{prefix}.in_proj_bias"]},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }


# ---- CLIP ------------------------------------------------------------------
def _resblock_params(sd: Dict, b: str) -> Dict:
    return {
        "ln_1": norm(sd, f"{b}.ln_1"),
        "ln_2": norm(sd, f"{b}.ln_2"),
        "attn": mha_packed(sd, f"{b}.attn"),
        "mlp_c_fc": linear(sd, f"{b}.mlp.c_fc"),
        "mlp_c_proj": linear(sd, f"{b}.mlp.c_proj"),
    }


def _stack_blocks(blocks):
    """Per-layer param trees -> one tree with leaves stacked on axis 0
    (the nn.scan layout used by the CLIP towers)."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, 0), *blocks)


def convert_clip_visual(sd: Dict, layers: int = 24, scan: bool = True) -> Dict:
    """OpenAI CLIP 'visual.' subtree -> ClipVisionTower params."""
    p: Dict[str, Any] = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": norm(sd, "visual.ln_pre"),
        "ln_post": norm(sd, "visual.ln_post"),
    }
    blocks = [_resblock_params(sd, f"visual.transformer.resblocks.{i}")
              for i in range(layers)]
    if scan:
        p["resblocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            p[f"resblock_{i}"] = b
    return {"params": p}


def convert_clip_text(sd: Dict, layers: int = 12, scan: bool = True) -> Dict:
    p: Dict[str, Any] = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "ln_final": norm(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    blocks = [_resblock_params(sd, f"transformer.resblocks.{i}")
              for i in range(layers)]
    if scan:
        p["resblocks"] = {"block": _stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            p[f"resblock_{i}"] = b
    return {"params": p}


# ---- Swin-B (torchvision) --------------------------------------------------
def _swin_block(sd: Dict, prefix: str) -> Dict:
    return {
        "norm1": norm(sd, f"{prefix}.norm1"),
        "norm2": norm(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": linear(sd, f"{prefix}.attn.qkv"),
            "proj": linear(sd, f"{prefix}.attn.proj"),
            "relative_position_bias_table":
                sd[f"{prefix}.attn.relative_position_bias_table"],
        },
        "mlp_fc1": linear(sd, f"{prefix}.mlp.0"),
        "mlp_fc2": linear(sd, f"{prefix}.mlp.3"),
    }


def convert_swin_guidance(sd: Dict) -> Dict:
    """torchvision swin_b state dict -> SwinGuidance params (stages 1-2 only).

    torchvision layout: features.0 = patch embed (conv 0 + norm 2),
    features.1 = stage1 blocks, features.2 = merge1, features.3 = stage2,
    features.4 = merge2 (reference taps net.py:49-53)."""
    p: Dict[str, Any] = {
        "patch_embed": conv2d(sd, "features.0.0"),
        "patch_norm": norm(sd, "features.0.2"),
        "merge1": {"norm": norm(sd, "features.2.norm"),
                   "reduction": {"kernel": sd["features.2.reduction.weight"].T}},
        "merge2": {"norm": norm(sd, "features.4.norm"),
                   "reduction": {"kernel": sd["features.4.reduction.weight"].T}},
    }
    for i in range(2):
        p[f"stage1_block{i}"] = _swin_block(sd, f"features.1.{i}")
        p[f"stage2_block{i}"] = _swin_block(sd, f"features.3.{i}")
    return {"params": p}


# ---- CATSeg fusion + decoder ----------------------------------------------
def _guided_swin_block(sd: Dict, prefix: str) -> Dict:
    return {
        "norm1": norm(sd, f"{prefix}.norm1"),
        "norm2": norm(sd, f"{prefix}.norm2"),
        "attn": {
            "q": linear(sd, f"{prefix}.attn.q"),
            "k": linear(sd, f"{prefix}.attn.k"),
            "v": linear(sd, f"{prefix}.attn.v"),
            "proj": linear(sd, f"{prefix}.attn.proj"),
        },
        "mlp_fc1": linear(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": linear(sd, f"{prefix}.mlp.fc2"),
    }


def convert_fusion(sd: Dict, num_layers: int = 2) -> Dict:
    """Reference ImageTextFusion state dict (after the net.py:102-134 key
    surgery, i.e. keys start with 'fusion.') -> our ImageTextFusion params."""
    p: Dict[str, Any] = {
        "clip_conv": conv1d_as_dense(sd, "fusion.clip_conv"),
        "conv1": conv2d(sd, "fusion.conv1"),
        "guidance_projection": conv2d(sd, "fusion.guidance_projection.0"),
        "text_guidance_projection": linear(sd, "fusion.text_guidance_projection.0"),
    }
    for i in range(num_layers):
        b = f"fusion.layers.{i}"
        p[f"layer_{i}"] = {
            "guidance_norm": norm(sd, f"{b}.swin_block.guidance_norm"),
            "swin_block1": _guided_swin_block(sd, f"{b}.swin_block.block_1"),
            "swin_block2": _guided_swin_block(sd, f"{b}.swin_block.block_2"),
            "class_transformer": {
                "norm1": norm(sd, f"{b}.attention.norm1"),
                "norm2": norm(sd, f"{b}.attention.norm2"),
                "q": linear(sd, f"{b}.attention.attention.q"),
                "k": linear(sd, f"{b}.attention.attention.k"),
                "v": linear(sd, f"{b}.attention.attention.v"),
                "mlp_fc1": linear(sd, f"{b}.attention.MLP.0"),
                "mlp_fc2": linear(sd, f"{b}.attention.MLP.2"),
            },
        }
    return {"params": p}


def convert_decoder(sd: Dict) -> Dict:
    """Reference StandardDecoder state dict ('decoder.' keys) -> params."""

    def up(prefix: str) -> Dict:
        return {
            "up": conv_transpose2d(sd, f"{prefix}.up"),
            "conv": {
                "conv1": conv2d(sd, f"{prefix}.conv.double_conv.0"),
                "gn1": norm(sd, f"{prefix}.conv.double_conv.1"),
                "conv2": conv2d(sd, f"{prefix}.conv.double_conv.3"),
                "gn2": norm(sd, f"{prefix}.conv.double_conv.4"),
            },
        }

    p: Dict[str, Any] = {
        "decoder1": up("decoder.decoder1"),
        "decoder2": up("decoder.decoder2"),
        "decoder3": up("decoder.decoder3"),
        "head": conv2d(sd, "decoder.head"),
        "guidance_proj_0": conv2d(sd, "decoder.decoder_guidance_projection.0.0"),
        "guidance_proj_1": conv2d(sd, "decoder.decoder_guidance_projection.1.0"),
    }
    return {"params": p}


# ---- PointDSC --------------------------------------------------------------
def convert_pointdsc(sd: Dict, num_layers: int = 6) -> Dict:
    params: Dict[str, Any] = {"sigma": sd["sigma"]}
    stats: Dict[str, Any] = {}
    enc_p: Dict[str, Any] = {"layer0": conv1d_as_dense(sd, "encoder.layer0")}
    enc_s: Dict[str, Any] = {}
    for i in range(num_layers):
        pc = f"encoder.blocks.PointCN_layer_{i}"
        bn_p, bn_s = batchnorm(sd, f"{pc}.1")
        enc_p[f"pointcn_{i}"] = {"conv": conv1d_as_dense(sd, f"{pc}.0"),
                                 "bn": bn_p}
        enc_s[f"pointcn_{i}"] = {"bn": bn_s}
        nl = f"encoder.blocks.NonLocal_layer_{i}"
        f1p, f1s = batchnorm(sd, f"{nl}.fc_message.1")
        f2p, f2s = batchnorm(sd, f"{nl}.fc_message.4")
        enc_p[f"nonlocal_{i}"] = {
            "projection_q": conv1d_as_dense(sd, f"{nl}.projection_q"),
            "projection_k": conv1d_as_dense(sd, f"{nl}.projection_k"),
            "projection_v": conv1d_as_dense(sd, f"{nl}.projection_v"),
            "fc1": {"conv": conv1d_as_dense(sd, f"{nl}.fc_message.0"), "bn": f1p},
            "fc2": {"conv": conv1d_as_dense(sd, f"{nl}.fc_message.3"), "bn": f2p},
            "fc3": conv1d_as_dense(sd, f"{nl}.fc_message.6"),
        }
        enc_s[f"nonlocal_{i}"] = {"fc1": {"bn": f1s}, "fc2": {"bn": f2s}}
    params["encoder"] = enc_p
    stats["encoder"] = enc_s
    params["cls1"] = conv1d_as_dense(sd, "classification.0")
    params["cls2"] = conv1d_as_dense(sd, "classification.2")
    params["cls3"] = conv1d_as_dense(sd, "classification.4")
    return {"params": params, "batch_stats": stats}
