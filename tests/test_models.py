"""Shape/behavior tests for the model stack (random weights, tiny batches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.models.clip import (
    ClipTextConfig, ClipTextTower, ClipVisionConfig, ClipVisionTower,
)
from oryon_tpu.models.decoder import DecoderConfig, StandardDecoder
from oryon_tpu.models.fusion import FusionConfig, ImageTextFusion
from oryon_tpu.models.swin import SwinGuidance, relative_position_index, shift_attention_mask
from oryon_tpu.models.tokenizer import ClipTokenizer
from oryon_tpu.ops.resize import resize2d, resize_matrix, resize_mask_nearest

KEY = jax.random.PRNGKey(0)

# small towers so CPU tests stay fast
SMALL_VIS = ClipVisionConfig(image_size=56, patch_size=14, width=64, layers=2, heads=4)
SMALL_TXT = ClipTextConfig(vocab_size=600, context_length=16, width=32, layers=2, heads=4, embed_dim=48)


def test_tokenizer_framing_and_shapes():
    tok = ClipTokenizer()  # fallback byte-level vocab
    ids = tok(["a photo of a mug", "bowl"])
    assert ids.shape == (2, 77)
    assert (ids[:, 0] == tok.sot).all()
    for row in ids:
        nz = row[row != 0]
        assert nz[-1] == tok.eot
    # deterministic + distinct
    assert (tok(["a photo of a mug"])[0] == ids[0]).all()
    assert not (ids[0] == ids[1]).all()
    # roundtrip through byte fallback
    dec = tok.decode([i for i in tok.encode("hello world")])
    assert dec.strip() == "hello world"


def test_tokenizer_truncation():
    tok = ClipTokenizer()
    ids = tok(["word " * 100])
    assert ids.shape == (1, 77)
    assert ids[0, -1] == tok.eot


def test_clip_vision_shapes():
    m = ClipVisionTower(SMALL_VIS, dtype=jnp.float32)
    x = jnp.zeros((2, 56, 56, 3))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (2, 4, 4, 64)
    assert y.dtype == jnp.float32


def test_clip_text_eot_pooling():
    m = ClipTextTower(SMALL_TXT, dtype=jnp.float32)
    ids = np.zeros((2, 16), np.int32)
    ids[0, 0], ids[0, 1], ids[0, 2] = 598, 5, 599   # sot, tok, eot
    ids[1, 0], ids[1, 1] = 598, 599
    params = m.init(KEY, jnp.array(ids))
    y = m.apply(params, jnp.array(ids))
    assert y.shape == (2, 48)
    # changing a token AFTER the EOT position must not alter the embedding
    ids2 = ids.copy()
    ids2[0, 5] = 7
    y2 = m.apply(params, jnp.array(ids2))
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y2[0]), atol=1e-6)
    # changing a token BEFORE EOT must alter it (causal attention flows forward)
    ids3 = ids.copy()
    ids3[0, 1] = 9
    y3 = m.apply(params, jnp.array(ids3))
    assert np.abs(np.asarray(y[0]) - np.asarray(y3[0])).max() > 1e-6


def test_remat_towers_forward_identical_and_grads_finite():
    """Block remat (train_towers memory fit) must not change forward
    numerics — same params, remat vs plain, bit-identical outputs — and the
    rematerialized backward must produce finite grads through both towers."""
    m0 = ClipVisionTower(SMALL_VIS, dtype=jnp.float32)
    m1 = ClipVisionTower(SMALL_VIS, dtype=jnp.float32, remat=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 56, 56, 3)),
                    jnp.float32)
    params = m0.init(KEY, x)
    y0 = np.asarray(jax.jit(m0.apply)(params, x))
    y1 = np.asarray(jax.jit(m1.apply)(params, x))
    np.testing.assert_array_equal(y0, y1)
    g = jax.grad(lambda p: jnp.sum(m1.apply(p, x) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

    s0 = SwinGuidance(dtype=jnp.float32)
    s1 = SwinGuidance(dtype=jnp.float32, remat=True)
    xs = jnp.asarray(np.random.default_rng(1).normal(size=(1, 96, 96, 3)),
                     jnp.float32)
    sp = s0.init(KEY, xs)
    a = jax.jit(s0.apply)(sp, xs)
    b = jax.jit(s1.apply)(sp, xs)
    for ga, gb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    gs = jax.grad(lambda p: sum(jnp.sum(t ** 2) for t in s1.apply(p, xs)))(sp)
    for leaf in jax.tree_util.tree_leaves(gs):
        assert np.isfinite(np.asarray(leaf)).all()


def test_swin_guidance_shapes():
    m = SwinGuidance(dtype=jnp.float32)
    x = jnp.zeros((1, 96, 96, 3))  # small multiple-of-4 input
    params = m.init(KEY, x)
    g1, g2, g3 = m.apply(params, x)
    assert g3.shape == (1, 24, 24, 128)
    assert g2.shape == (1, 12, 12, 256)
    assert g1.shape == (1, 6, 6, 512)


def test_relative_position_index_properties():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    assert (np.diag(idx) == idx[0, 0]).all()  # zero offset everywhere on diag


def test_shift_mask_blocks_cross_region():
    m = shift_attention_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert (m[0] == 0).all()          # first window: contiguous region
    assert (m[-1] < 0).any()          # wrapped window: masked pairs exist


def test_fusion_shapes():
    cfg = FusionConfig(hidden_dim=32, text_guidance_dim=48, text_guidance_proj_dim=32,
                       appearance_guidance_dim=16, appearance_proj_dim=32,
                       num_layers=1, nheads=4, window=12, pooling=6,
                       num_prompts=8, clip_dim=64, clip_proj_dim=48)
    m = ImageTextFusion(cfg, dtype=jnp.float32)
    img = jnp.array(np.random.RandomState(0).randn(2, 24, 24, 64), jnp.float32)
    txt = jnp.array(np.random.RandomState(1).randn(2, 8, 48), jnp.float32)
    app = jnp.array(np.random.RandomState(2).randn(2, 24, 24, 16), jnp.float32)
    params = m.init(KEY, img, txt, app)
    y = m.apply(params, img, txt, app)
    assert y.shape == (2, 24, 24, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_decoder_shapes_and_guidance_use():
    cfg = DecoderConfig()
    m = StandardDecoder(cfg, dtype=jnp.float32)
    x = jnp.array(np.random.RandomState(0).randn(1, 24, 24, 128), jnp.float32)
    guid = [
        jnp.zeros((1, 24, 24, 512)),
        jnp.array(np.random.RandomState(1).randn(1, 48, 48, 256), jnp.float32),
        jnp.array(np.random.RandomState(2).randn(1, 96, 96, 128), jnp.float32),
    ]
    params = m.init(KEY, x, guid)
    mask, feat = m.apply(params, x, guid)
    assert mask.shape == (1, 192, 192)
    assert feat.shape == (1, 192, 192, 32)
    # guidance actually flows into the output
    guid2 = [guid[0], guid[1] * 0.0, guid[2]]
    mask2, _ = m.apply(params, x, guid2)
    assert np.abs(np.asarray(mask) - np.asarray(mask2)).max() > 1e-6


def test_resize_matrix_properties():
    for method in ("linear", "cubic"):
        for ac in (False, True):
            W = resize_matrix(24, 48, method, ac)
            np.testing.assert_allclose(W.sum(1), 1.0, atol=1e-5)
    # align_corners endpoints map exactly
    W = resize_matrix(4, 7, "linear", True)
    assert W[0, 0] == pytest.approx(1.0)
    assert W[-1, -1] == pytest.approx(1.0)


def test_resize2d_bilinear_align_corners_golden():
    # golden: 2x upsample of a ramp with align_corners keeps endpoints
    x = jnp.arange(4.0).reshape(1, 1, 4, 1) * jnp.ones((1, 2, 1, 1))
    y = np.asarray(resize2d(x, (2, 7), "linear", align_corners=True))
    np.testing.assert_allclose(y[0, 0, :, 0], [0, 0.5, 1, 1.5, 2, 2.5, 3], atol=1e-6)


def test_resize_mask_nearest_binary():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = 1
    out = np.asarray(resize_mask_nearest(jnp.array(m), (16, 16)))
    assert set(np.unique(out)) <= {0, 1}
    assert out[8, 8] == 1 and out[0, 0] == 0


def test_oryon_tiny_end_to_end():
    from oryon_tpu.models.oryon import tiny_oryon
    m = tiny_oryon()
    B, P = 2, 3
    rgb_a = jnp.array(np.random.RandomState(0).rand(B, 28, 28, 3), jnp.float32)
    rgb_q = jnp.array(np.random.RandomState(1).rand(B, 28, 28, 3), jnp.float32)
    ids = np.zeros((B, P, 16), np.int32)
    ids[:, :, 0] = 598
    ids[:, :, 1] = np.random.RandomState(2).randint(1, 500, (B, P))
    ids[:, :, 2] = 599
    params = m.init(KEY, rgb_a, rgb_q, jnp.array(ids))
    out = m.apply(params, rgb_a, rgb_q, jnp.array(ids))
    assert out.featmap_a.shape == (B, 32, 32, 32)
    assert out.featmap_q.shape == (B, 32, 32, 32)
    assert out.mask_a.shape == (B, 32, 32)
    assert np.isfinite(np.asarray(out.featmap_a)).all()
    assert np.isfinite(np.asarray(out.mask_q)).all()
    # anchor/query weight sharing: identical inputs -> identical outputs
    out2 = m.apply(params, rgb_a, rgb_a, jnp.array(ids))
    np.testing.assert_allclose(np.asarray(out2.featmap_a),
                               np.asarray(out2.featmap_q), atol=1e-5)


def test_oryon_tower_gradients_stopped():
    """Only fusion+decoder receive gradients (reference net.py:37-43)."""
    from oryon_tpu.models.oryon import tiny_oryon
    m = tiny_oryon()
    B, P = 1, 2
    rgb = jnp.ones((B, 28, 28, 3), jnp.float32) * 0.5
    ids = np.zeros((B, P, 16), np.int32)
    ids[:, :, 0] = 598
    ids[:, :, 1] = 42
    ids[:, :, 2] = 599
    params = m.init(KEY, rgb, rgb, jnp.array(ids))

    def loss_fn(p):
        out = m.apply(p, rgb, rgb, jnp.array(ids))
        return jnp.sum(out.featmap_a ** 2) + jnp.sum(out.mask_a ** 2)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        gmax = float(jnp.abs(g).max())
        if name.startswith(("params/vlm_visual", "params/vlm_text", "params/guidance")):
            assert gmax == 0.0, f"frozen tower got gradient: {name}"
    fused = [float(jnp.abs(g).max()) for path, g in flat
             if "fusion" in str(path) or "decoder" in str(path)]
    assert max(fused) > 0.0


@pytest.mark.parametrize("attn,head", [("full", "default"), ("linear", "mlp"),
                                       ("linear", "none")])
def test_fusion_variants(attn, head):
    cfg = FusionConfig(hidden_dim=32, text_guidance_dim=48, text_guidance_proj_dim=32,
                       appearance_guidance_dim=16, appearance_proj_dim=32,
                       num_layers=1, nheads=4, window=12, pooling=6,
                       num_prompts=8, clip_dim=64, clip_proj_dim=48,
                       attention_type=attn, guidance_head=head)
    m = ImageTextFusion(cfg, dtype=jnp.float32)
    img = jnp.array(np.random.RandomState(0).randn(1, 24, 24, 64), jnp.float32)
    txt = jnp.array(np.random.RandomState(1).randn(1, 8, 48), jnp.float32)
    app = jnp.array(np.random.RandomState(2).randn(1, 24, 24, 16), jnp.float32)
    params = m.init(KEY, img, txt, app)
    y = m.apply(params, img, txt, app)
    assert y.shape == (1, 24, 24, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_pixel_match_loss():
    from oryon_tpu.eval.metrics import pixel_match_loss
    gt = np.array([[[0, 0, 0, 0], [10, 10, 10, 10]]], np.float64)
    pred = np.array([[[10, 10, 10, 10], [0, 0, 0, 0]]], np.float64)
    assert pixel_match_loss(gt, pred)[0] == pytest.approx(0.0)
    pred2 = np.array([[[1, 0, 0, 0], [10, 10, 10, 10]]], np.float64)
    assert pixel_match_loss(gt, pred2)[0] == pytest.approx(0.25)
