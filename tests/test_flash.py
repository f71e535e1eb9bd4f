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
        for impl in ("flash", "fused"):
            t_f = ClipVisionTower(ClipVisionConfig(**cfg, attn_impl=impl),
                                  dtype=jnp.float32)
            o_f = np.asarray(t_f.apply(params, x))
            np.testing.assert_allclose(o_e, o_f, atol=5e-3, rtol=5e-3,
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
