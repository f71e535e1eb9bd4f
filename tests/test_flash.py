"""flash_mha (Pallas TPU flash attention wrapper) vs the einsum reference.

Runs the kernel in pallas interpret mode on CPU; covers the 577-style
non-tile-aligned padding + segment-id masking path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ref_attention(q, k, v, sm_scale):
    attn = jnp.einsum("bhld,bhmd->bhlm", q, k) * sm_scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhlm,bhmd->bhld", attn, v)


def test_flash_mha_matches_einsum_with_padding(rng):
    from jax.experimental import pallas as pl
    from oryon_tpu.ops import flash as F

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        B, H, L, D = 2, 2, 130, 16   # L=130 pads to 256 -> exercises segments
        q = jnp.array(rng.randn(B, H, L, D).astype(np.float32))
        k = jnp.array(rng.randn(B, H, L, D).astype(np.float32))
        v = jnp.array(rng.randn(B, H, L, D).astype(np.float32))
        sm = D ** -0.5
        out = np.asarray(F.flash_mha(q, k, v, sm))
        ref = np.asarray(_ref_attention(q, k, v, sm))
        assert out.shape == ref.shape == (B, H, L, D)
        np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)
    finally:
        pl.pallas_call = orig


def test_clip_tower_flash_impl_matches_einsum(rng):
    """ClipVisionTower(attn_impl='flash'/'fused') == (attn_impl='einsum')
    with the same params (interpret mode).  Covers the hoisted sequence pad
    + segment-id / key-mask isolation of the padding tokens."""
    from jax.experimental import pallas as pl
    from oryon_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        cfg = dict(image_size=56, patch_size=14, width=64, layers=2, heads=4)
        t_e = ClipVisionTower(ClipVisionConfig(**cfg, attn_impl="einsum"),
                              dtype=jnp.float32)
        x = jnp.array(rng.rand(2, 56, 56, 3).astype(np.float32))
        params = t_e.init(jax.random.PRNGKey(0), x)
        o_e = np.asarray(t_e.apply(params, x))
        # fused_i8qk quantizes the attention logits (~1% noise by design),
        # so it gets a looser tolerance; it still must go through the same
        # hoisted pad (a missing pad hits the kernel's L%128 assert — the
        # exact regression the round-4 TPU verify probe caught at L=577)
        for impl, tol in (("flash", 5e-3), ("fused", 5e-3),
                          ("fused_i8qk", 5e-2)):
            t_f = ClipVisionTower(ClipVisionConfig(**cfg, attn_impl=impl),
                                  dtype=jnp.float32)
            o_f = np.asarray(t_f.apply(params, x))
            np.testing.assert_allclose(o_e, o_f, atol=tol, rtol=tol,
                                       err_msg=impl)
    finally:
        pl.pallas_call = orig


def test_fused_mha_lanes_matches_einsum(rng):
    """Lane-packed fused kernel vs reference, incl. key padding mask."""
    from oryon_tpu.ops.pallas.mha_lanes import fused_mha_lanes

    B, L, H, hd = 2, 256, 4, 16
    C = H * hd
    Lreal = 200
    q = jnp.array(rng.randn(B, L, C).astype(np.float32))
    k = jnp.array(rng.randn(B, L, C).astype(np.float32))
    v = jnp.array(rng.randn(B, L, C).astype(np.float32))
    kmask = jnp.where(jnp.arange(L) < Lreal, 0.0, -1e9).astype(jnp.float32)
    out = np.asarray(fused_mha_lanes(q, k, v, kmask, H, hd ** -0.5,
                                     interpret=True))
    qh = q.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
    ref = _ref_attention(qh[:, :, :Lreal], kh[:, :, :Lreal],
                         vh[:, :, :Lreal], hd ** -0.5)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, Lreal, C))
    np.testing.assert_allclose(out[:, :Lreal], ref, atol=2e-3, rtol=2e-3)


def test_fused_mha_lanes_custom_vjp(rng):
    """Gradients through the fused kernel == gradients of the reference."""
    from oryon_tpu.ops.pallas import mha_lanes as M

    B, L, H, hd = 1, 128, 2, 8
    C = H * hd
    q = jnp.array(rng.randn(B, L, C).astype(np.float32))
    k = jnp.array(rng.randn(B, L, C).astype(np.float32))
    v = jnp.array(rng.randn(B, L, C).astype(np.float32))
    kmask = jnp.zeros((L,), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(M.fused_mha_lanes(q, k, v, kmask, H, hd ** -0.5,
                                         True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(M._reference_mha(q, k, v, kmask, H, hd ** -0.5) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_fused_seg_contract_rejects_per_sample(rng):
    """MultiHeadAttention(attn_impl='fused') must fail LOUDLY on per-sample
    segment ids (VERDICT r2 weak #5): the kernel derives ONE key mask from
    row 0, so non-uniform [B, L] seg would be silently wrong.  The guard
    fires at trace time; the jit-safe canonical form is a 1-D [L] vector
    (batch-uniform by shape), which is what ClipVisionTower passes."""
    import pytest
    from oryon_tpu.models.clip import MultiHeadAttention

    B, L, D, H = 2, 128, 32, 2
    m = MultiHeadAttention(width=D, heads=H, dtype=jnp.float32,
                           attn_impl="fused")
    x = jnp.array(rng.randn(B, L, D).astype(np.float32))
    uniform = jnp.concatenate(
        [jnp.ones((B, 100), jnp.int32), jnp.zeros((B, L - 100), jnp.int32)],
        axis=-1)
    params = m.init(jax.random.PRNGKey(0), x, None, uniform)

    # concrete per-sample rows -> rejected with a clear message
    per_sample = np.asarray(uniform).copy()
    per_sample[1, :50] = 0
    with pytest.raises(ValueError, match="per-sample"):
        m.apply(params, x, None, jnp.array(per_sample))

    # traced 2D seg -> rejected even if values are uniform (uninspectable)
    with pytest.raises(ValueError, match="batch-uniform"):
        jax.jit(lambda p, x, s: m.apply(p, x, None, s))(params, x, uniform)

    # constant-BUILT [B, L] inside jit is STILL a tracer -> also rejected
    # (this is why the tower passes a 1-D seg)
    with pytest.raises(ValueError, match="batch-uniform"):
        jax.jit(lambda p, x: m.apply(
            p, x, None, jnp.concatenate(
                [jnp.ones((B, 100), jnp.int32),
                 jnp.zeros((B, L - 100), jnp.int32)], -1)))(params, x)

    # 3D seg -> rejected
    with pytest.raises(ValueError, match="seg must be"):
        m.apply(params, x, None, uniform[None])

    # the supported forms still trace: 1-D [L] (tower style, even as a
    # tracer inside jit) and concrete uniform [B, L]
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        o1 = m.apply(params, x, None, uniform[0])

        @jax.jit
        def tower_style(p, x):
            seg = (jnp.arange(L) < 100).astype(jnp.int32)
            return m.apply(p, x, None, seg)

        o2 = tower_style(params, x)
        o3 = m.apply(params, x, None, uniform)  # concrete [B, L], uniform
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o3),
                                   atol=1e-5, rtol=1e-5)
    finally:
        pl.pallas_call = orig


def test_fused_mha_lanes_int8_qk(rng):
    """Opt-in int8-MXU logit path (qk_int8): per-head dynamic symmetric
    quantization adds ~1% logit noise; the softmax output must stay within
    a small absolute tolerance of the exact kernel (opt-in pending a
    trained-weight accuracy A/B — ops/pallas/mha_lanes.py)."""
    from oryon_tpu.ops.pallas.mha_lanes import fused_mha_lanes

    B, L, H, hd = 2, 256, 4, 16
    C = H * hd
    Lreal = 200
    q = jnp.array(rng.randn(B, L, C).astype(np.float32))
    k = jnp.array(rng.randn(B, L, C).astype(np.float32))
    v = jnp.array(rng.randn(B, L, C).astype(np.float32))
    kmask = jnp.where(jnp.arange(L) < Lreal, 0.0, -1e9).astype(jnp.float32)
    exact = np.asarray(fused_mha_lanes(q, k, v, kmask, H, hd ** -0.5,
                                       interpret=True))
    quant = np.asarray(fused_mha_lanes(q, k, v, kmask, H, hd ** -0.5,
                                       interpret=True, qk_int8=True))
    # int8 logits perturb the softmax slightly; outputs are value-space
    # averages so the error stays small and dense
    err = np.abs(exact[:, :Lreal] - quant[:, :Lreal])
    assert err.max() < 0.08, err.max()
    a, b = exact[:, :Lreal].ravel(), quant[:, :Lreal].ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
