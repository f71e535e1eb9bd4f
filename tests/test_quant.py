"""int8 tower quantization (models/quant.py).

Pins the quantization math, the nn.Dense param-tree compatibility, and
random-weight tower agreement with the bf16 path.  Real-checkpoint
accuracy is validated once assets exist (BASELINE.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from oryon_tpu.models.quant import QuantDense, int8_dense, int8_quantize

KEY = jax.random.PRNGKey(0)


def test_quantize_roundtrip_error():
    rs = np.random.RandomState(0)
    x = rs.randn(64, 128).astype(np.float32)
    q, s = int8_quantize(jnp.asarray(x), axis=-1)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    # absmax symmetric quant: error bounded by scale/2 per element
    assert np.abs(back - x).max() <= np.asarray(s).max() * 0.5 + 1e-6


def test_int8_dense_close_to_f32():
    rs = np.random.RandomState(1)
    x = rs.randn(4, 96, 256).astype(np.float32)
    w = (rs.randn(256, 192) / np.sqrt(256)).astype(np.float32)
    b = rs.randn(192).astype(np.float32) * 0.1
    ref = x @ w + b
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), dtype=jnp.float32))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.9995, cos


def test_quant_dense_param_tree_matches_nn_dense():
    x = jnp.ones((2, 8, 32))
    p_ref = nn.Dense(48, dtype=jnp.bfloat16).init(KEY, x)
    p_q = QuantDense(48, dtype=jnp.bfloat16).init(KEY, x)
    ref_flat = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    q_flat = jax.tree_util.tree_flatten_with_path(p_q)[0]
    assert len(ref_flat) == len(q_flat)
    for (path_r, leaf_r), (path_q, leaf_q) in zip(ref_flat, q_flat):
        assert path_r == path_q
        assert leaf_r.shape == leaf_q.shape and leaf_r.dtype == leaf_q.dtype
    # identical init values under the same key
    for (_, a), (_, b) in zip(ref_flat, q_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("attn_impl", ["auto", "fused"])
def test_vision_tower_int8_matches_bf16(attn_impl):
    from oryon_tpu.models.clip import ClipVisionConfig, ClipVisionTower
    cfg = dict(image_size=56, patch_size=14, width=64, layers=2, heads=4,
               attn_impl=attn_impl)
    tower_bf = ClipVisionTower(ClipVisionConfig(**cfg))
    tower_q = ClipVisionTower(ClipVisionConfig(**cfg, quant="int8"))
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 56, 56, 3).astype(np.float32))
    params = tower_bf.init(KEY, x)
    # same param tree drives both towers
    out_bf = np.asarray(tower_bf.apply(params, x), np.float64).ravel()
    out_q = np.asarray(tower_q.apply(params, x), np.float64).ravel()
    cos = (out_bf @ out_q) / (np.linalg.norm(out_bf) * np.linalg.norm(out_q))
    assert cos > 0.995, cos


def test_full_factory_quant_plumb():
    from oryon_tpu.models.oryon import build_model, full_oryon
    m = full_oryon(quant="int8")
    assert m.vision_cfg.quant == "int8"
    # Swin guidance deliberately stays bf16 (measured dead end — BASELINE.md)
    assert m.swin_cfg.quant == "none"
    m2 = full_oryon()
    assert m2.vision_cfg.quant == "none"
    assert build_model("full", quant="int8").vision_cfg.quant == "int8"
    with pytest.raises(ValueError):
        build_model("tiny", quant="int8")


def test_int8_is_the_inference_default_bf16_the_train_default():
    """Round-3 default flip (VERDICT r2 next #2): inference quant defaults to
    int8 (A/B-validated on trained weights), training stays bf16 strict
    parity, and smoke-test model sizes resolve the default away instead of
    tripping the build_model size guard."""
    from oryon_tpu.config import load_config
    from oryon_tpu.models.oryon import resolve_quant
    cfg = load_config(None, [])
    assert cfg.model.quant == "int8"
    assert cfg.model.train_quant == "none"
    assert resolve_quant("full", cfg.model.quant) == "int8"
    assert resolve_quant("tiny", cfg.model.quant) == "none"
    assert resolve_quant("small", cfg.model.quant) == "none"
    # strict-parity opt-out stays available
    cfg2 = load_config(None, ["model.quant=none"])
    assert resolve_quant("full", cfg2.model.quant) == "none"


def test_swin_tower_int8_matches_bf16():
    from oryon_tpu.models.swin import SwinConfig, SwinGuidance
    cfg = dict(embed_dim=64, depths=(2, 2), heads=(2, 4), window=7)
    t_bf = SwinGuidance(SwinConfig(**cfg))
    t_q = SwinGuidance(SwinConfig(**cfg, quant="int8"))
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 64, 64, 3).astype(np.float32))
    params = t_bf.init(KEY, x)
    outs_bf = t_bf.apply(params, x)
    outs_q = t_q.apply(params, x)
    for a, b in zip(outs_bf, outs_q):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, cos


def test_attn_impl_config_plumbing():
    """model.attn_impl reaches the vision tower (the fused_i8qk A/B switch,
    VERDICT r3 next #7) with the same size policy as model.quant: full only,
    smoke sizes resolve back to the default instead of tripping the guard."""
    import pytest

    from oryon_tpu.config import load_config
    from oryon_tpu.models.oryon import build_model, resolve_attn_impl
    cfg = load_config(None, ["model.attn_impl=fused_i8qk"])
    assert resolve_attn_impl("full", cfg.model.attn_impl) == "fused_i8qk"
    assert resolve_attn_impl("tiny", cfg.model.attn_impl) == "fused"
    m = build_model("full", attn_impl="fused_i8qk")
    assert m.vision_cfg.attn_impl == "fused_i8qk"
    assert build_model("full").vision_cfg.attn_impl == "fused"
    with pytest.raises(ValueError):
        build_model("small", attn_impl="fused_i8qk")
