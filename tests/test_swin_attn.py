"""Packed window-attention Pallas kernel == einsum window attention.

Runs the kernel in pallas interpret mode on CPU, through the full
WindowAttention module so head-slicing, rel-pos bias, and shift masks are
covered (oryon_tpu/ops/pallas/swin_attn.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.models.swin import (SwinConfig, SwinGuidance, WindowAttention,
                                   shift_attention_mask)

KEY = jax.random.PRNGKey(0)


class _Interpret:
    def __enter__(self):
        from jax.experimental import pallas as pl
        self.pl, self.orig = pl, pl.pallas_call
        pl.pallas_call = functools.partial(self.orig, interpret=True)

    def __exit__(self, *a):
        self.pl.pallas_call = self.orig


@pytest.mark.parametrize("shifted", [False, True])
def test_packed_window_attention_matches_einsum(shifted):
    w, heads, C = 7, 4, 64
    H = W = 14                      # nw = 4 windows/image
    B, nw, N = 2, (H // w) * (W // w), w * w
    rs = np.random.RandomState(0)
    wins = jnp.array(rs.randn(B * nw, N, C).astype(np.float32))
    mask = (jnp.asarray(shift_attention_mask(H, W, w, w // 2))
            if shifted else None)

    ein = WindowAttention(C, heads, w, jnp.float32, "einsum")
    params = ein.init(KEY, wins, mask, nw=nw)
    ref = ein.apply(params, wins, mask, nw=nw)

    pal = WindowAttention(C, heads, w, jnp.float32, "pallas")
    with _Interpret():
        out = pal.apply(params, wins, mask, nw=nw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("impl", ["pallas", "band"])
def test_swin_guidance_kernel_impls_match_einsum(impl):
    """Full tower at a small but shift-exercising resolution (96 -> 24-token
    grids padded to 28; both shifted and unshifted blocks run)."""
    imgs = jnp.array(np.random.RandomState(1).rand(1, 96, 96, 3)
                     .astype(np.float32))
    ein = SwinGuidance(SwinConfig(attn_impl="einsum"))
    params = ein.init(KEY, imgs)
    g_ref = ein.apply(params, imgs)
    ker = SwinGuidance(SwinConfig(attn_impl=impl))
    with _Interpret():
        g_ker = ker.apply(params, imgs)
    for a, b in zip(g_ref, g_ker):
        # bf16 block compute bounds the agreement
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("impl", ["einsum", "band"])
def test_swin_stage_pad_equivalence(impl):
    """stage_pad=True (pad once per stage, re-zero pad after norm1) must be
    numerically identical to the per-block pad/crop path: the pad region is
    re-zeroed before it can act as attention keys, and pointwise ops keep
    pad junk inside the pad region."""
    imgs = jnp.array(np.random.RandomState(2).rand(1, 96, 96, 3)
                     .astype(np.float32))
    ref_m = SwinGuidance(SwinConfig(attn_impl="einsum", stage_pad=False))
    params = ref_m.init(KEY, imgs)
    g_ref = ref_m.apply(params, imgs)
    sp = SwinGuidance(SwinConfig(attn_impl=impl, stage_pad=True))
    with _Interpret():
        g_sp = sp.apply(params, imgs)
    tol = dict(atol=1e-5, rtol=1e-5) if impl == "einsum" else \
        dict(atol=5e-2, rtol=5e-2)
    for a, b in zip(g_ref, g_sp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
