"""Native host-runtime tests: C++ vs numpy fallback parity."""
import numpy as np
import pytest

from oryon_tpu.utils import native


def test_native_builds():
    import shutil
    if shutil.which("g++") is None and shutil.which("make") is None:
        import pytest
        pytest.skip("no toolchain — numpy fallbacks cover this host")
    assert native.available(), "native library failed to build"


def test_rle_roundtrip(rng):
    mask = (rng.rand(60, 80) > 0.6).astype(np.uint8)
    runs = native.rle_encode(mask)
    back = native.rle_decode(runs, mask.shape)
    np.testing.assert_array_equal(back, mask)
    assert runs.sum() == mask.size


def test_rle_edge_cases():
    for m in [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)]:
        runs = native.rle_encode(m)
        np.testing.assert_array_equal(native.rle_decode(runs, m.shape), m)
    # leading ones -> first run is zero
    m = np.array([1, 1, 0, 1], np.uint8)
    runs = native.rle_encode(m)
    assert runs[0] == 0


def test_rle_native_matches_numpy(rng):
    mask = (rng.rand(37, 53) > 0.5).astype(np.uint8)
    native_runs = native.rle_encode(mask)
    # force the numpy fallback path
    lib = native._lib
    native._lib = None
    native._tried = True
    try:
        np_runs = native.rle_encode(mask)
    finally:
        native._lib = lib
    np.testing.assert_array_equal(native_runs, np_runs)


def test_resize_bilinear_matches_python(rng):
    img = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    out_native = native.resize_bilinear_u8(img, (20, 30))
    from oryon_tpu.data.augment import resize_bilinear

    ref = resize_bilinear(img.astype(np.float32), (20, 30))
    diff = np.abs(out_native.astype(np.float32) - ref)
    assert np.median(diff) <= 1.0
    assert (diff <= 2.0).mean() > 0.99  # rounding-mode differences only


def test_resize_nearest_matches_python(rng):
    img = (rng.rand(33, 47) * 255).astype(np.uint8)
    out_native = native.resize_nearest_u8(img, (16, 20))
    from oryon_tpu.data.augment import resize_nearest

    ref = resize_nearest(img, (16, 20))
    np.testing.assert_array_equal(out_native, ref)
