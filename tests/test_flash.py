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
    """ClipVisionTower(attn_impl='flash') == (attn_impl='einsum') with the
    same params (interpret mode)."""
    from jax.experimental import pallas as pl
    from oryon_tpu.models.clip import ClipVisionConfig, ClipVisionTower

    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        cfg = dict(image_size=56, patch_size=14, width=64, layers=2, heads=4)
        t_e = ClipVisionTower(ClipVisionConfig(**cfg, attn_impl="einsum"),
                              dtype=jnp.float32)
        t_f = ClipVisionTower(ClipVisionConfig(**cfg, attn_impl="flash"),
                              dtype=jnp.float32)
        x = jnp.array(rng.rand(2, 56, 56, 3).astype(np.float32))
        params = t_e.init(jax.random.PRNGKey(0), x)
        o_e = np.asarray(t_e.apply(params, x))
        o_f = np.asarray(t_f.apply(params, x))
        np.testing.assert_allclose(o_e, o_f, atol=5e-3, rtol=5e-3)
    finally:
        pl.pallas_call = orig
