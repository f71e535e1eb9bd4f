"""Device-side augmentation stack (data/device_augment.py).

Pins (a) per-op numeric parity with the host numpy implementations
(data/augment.py, themselves the reference utils/augmentations.py
semantics), (b) flip + correspondence-remap consistency, (c) identity at
prob=0, (d) determinism under a fixed PRNG key, and (e) integration with
the jitted train step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oryon_tpu.data import augment as host
from oryon_tpu.data import device_augment as dev
from oryon_tpu.data.synthetic import synthetic_pair_batch

KEY = jax.random.PRNGKey(7)


@pytest.fixture(scope="module")
def img():
    rs = np.random.RandomState(0)
    return rs.rand(17, 23, 3).astype(np.float32)


@pytest.mark.parametrize("op,factor", [
    ("brightness", 1.21), ("brightness", 0.83),
    ("contrast", 1.4), ("contrast", 0.6),
    ("saturation", 1.45), ("saturation", 0.55),
    ("hue", 0.05), ("hue", -0.043),
])
def test_ops_match_host(img, op, factor):
    host_fn = {"brightness": host._adjust_brightness,
               "contrast": host._adjust_contrast,
               "saturation": host._adjust_saturation,
               "hue": host._adjust_hue}[op]
    dev_fn = {"brightness": dev.adjust_brightness,
              "contrast": dev.adjust_contrast,
              "saturation": dev.adjust_saturation,
              "hue": dev.adjust_hue}[op]
    want = host_fn(img.astype(np.float64), factor)
    got = np.asarray(dev_fn(jnp.asarray(img), jnp.float32(factor)))
    assert np.abs(got - want).max() < 1e-5


def _aug(batch, cfg, key=KEY):
    from oryon_tpu.data.pair_batch import device_fields
    return jax.jit(dev.device_augment,
                   static_argnames=("cfg",))(device_fields(batch), key, cfg)


def test_prob_zero_is_identity():
    batch = synthetic_pair_batch(seed=3, batch=2, img_hw=(32, 32), n_corrs=16)
    out = _aug(batch, dev.DeviceAugConfig(prob=0.0))
    np.testing.assert_allclose(
        np.asarray(out.anchor.rgb),
        np.asarray(batch.anchor.rgb).astype(np.float32) / 255.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out.corrs), np.asarray(batch.corrs))
    np.testing.assert_array_equal(np.asarray(out.anchor.mask),
                                  np.asarray(batch.anchor.mask))
    np.testing.assert_array_equal(np.asarray(out.query.depth),
                                  np.asarray(batch.query.depth))


def test_forced_flips_mirror_images_and_corrs():
    batch = synthetic_pair_batch(seed=4, batch=3, img_hw=(32, 32), n_corrs=16)
    cfg = dev.DeviceAugConfig(jitter=False, bright=False,
                              hflip=True, vflip=True, prob=1.0)
    out = _aug(batch, cfg)
    H, W = 32, 32
    for view_in, view_out in ((batch.anchor, out.anchor),
                              (batch.query, out.query)):
        rgb = np.asarray(view_in.rgb).astype(np.float32) / 255.0
        np.testing.assert_allclose(np.asarray(view_out.rgb),
                                   rgb[:, ::-1, ::-1], atol=1e-7)
        np.testing.assert_array_equal(np.asarray(view_out.mask),
                                      np.asarray(view_in.mask)[:, ::-1, ::-1])
        np.testing.assert_array_equal(np.asarray(view_out.depth),
                                      np.asarray(view_in.depth)[:, ::-1, ::-1])
    c_in, c_out = np.asarray(batch.corrs), np.asarray(out.corrs)
    np.testing.assert_array_equal(c_out[..., 0], H - 1 - c_in[..., 0])
    np.testing.assert_array_equal(c_out[..., 1], W - 1 - c_in[..., 1])
    np.testing.assert_array_equal(c_out[..., 2], H - 1 - c_in[..., 2])
    np.testing.assert_array_equal(c_out[..., 3], W - 1 - c_in[..., 3])
    # originals untouched (snapshotted pre-aug on the host path)
    np.testing.assert_array_equal(np.asarray(out.anchor.orig_depth),
                                  np.asarray(batch.anchor.orig_depth))


def test_flip_keeps_corr_pixel_content():
    """A correspondence endpoint must index the same pixel value after the
    flip + remap."""
    batch = synthetic_pair_batch(seed=5, batch=2, img_hw=(24, 24), n_corrs=8)
    cfg = dev.DeviceAugConfig(jitter=False, bright=False,
                              hflip=True, vflip=False, prob=1.0)
    out = _aug(batch, cfg)
    rgb_in = np.asarray(batch.anchor.rgb).astype(np.float32) / 255.0
    rgb_out = np.asarray(out.anchor.rgb)
    c_in, c_out = np.asarray(batch.corrs), np.asarray(out.corrs)
    for b in range(2):
        for n in range(8):
            yi, xi = c_in[b, n, 0], c_in[b, n, 1]
            yo, xo = c_out[b, n, 0], c_out[b, n, 1]
            np.testing.assert_allclose(rgb_out[b, yo, xo], rgb_in[b, yi, xi],
                                       atol=1e-7)


def test_deterministic_and_key_sensitive():
    batch = synthetic_pair_batch(seed=6, batch=2, img_hw=(32, 32), n_corrs=16)
    cfg = dev.DeviceAugConfig()
    a = _aug(batch, cfg, jax.random.PRNGKey(1))
    b = _aug(batch, cfg, jax.random.PRNGKey(1))
    c = _aug(batch, cfg, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(a.anchor.rgb),
                                  np.asarray(b.anchor.rgb))
    assert np.abs(np.asarray(a.anchor.rgb) - np.asarray(c.anchor.rgb)).max() > 1e-4


def test_jitter_stays_in_range_and_changes_image():
    batch = synthetic_pair_batch(seed=8, batch=2, img_hw=(32, 32), n_corrs=16)
    cfg = dev.DeviceAugConfig(jitter=True, bright=True,
                              hflip=False, vflip=False, prob=1.0)
    out = _aug(batch, cfg)
    rgb = np.asarray(out.anchor.rgb)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    orig = np.asarray(batch.anchor.rgb).astype(np.float32) / 255.0
    assert np.abs(rgb - orig).max() > 1e-3
    # geometry untouched when flips are off
    np.testing.assert_array_equal(np.asarray(out.corrs), np.asarray(batch.corrs))


def test_train_step_with_device_augs():
    from oryon_tpu.models.oryon import tiny_oryon
    from oryon_tpu.train import create_train_state, jit_train_step
    model = tiny_oryon()
    batch = synthetic_pair_batch(seed=9, batch=2, img_hw=(28, 28), n_corrs=32,
                                 n_prompts=2, context_len=16, vocab=600)
    state = create_train_state(model, KEY, batch, lr=3e-4, total_steps=10)
    step = jit_train_step(donate=False, aug_cfg=dev.DeviceAugConfig())
    s1, m1 = step(state, batch, jax.random.PRNGKey(0))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(1))
    assert int(s2.step) == 2
    for v in m2.values():
        assert np.isfinite(float(v))
