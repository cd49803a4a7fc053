"""Image payload codecs: lossless round-trip, lossy PSNR gate (input_hint:
decoded-pixel allclose / PSNR >= 40 dB), phash determinism."""

import numpy as np
import pytest

from raster2dggs_spark.codecs import (
    encode_image,
    decode_image,
    psnr_db,
    average_hash64,
    FORMATS,
)


def _img(bands=3, h=32, w=48, seed=0, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    arr = rng.uniform(0, 100, (bands, h, w)).astype(np.float32)
    if nan_frac:
        mask = rng.uniform(size=arr.shape) < nan_frac
        arr[mask] = np.nan
    return arr


@pytest.mark.parametrize("fmt", ["raw", "zlib"])
def test_lossless_roundtrip(fmt):
    arr = _img(nan_frac=0.1)
    out = decode_image(encode_image(arr, fmt))
    np.testing.assert_array_equal(
        np.nan_to_num(out, nan=-1), np.nan_to_num(arr, nan=-1)
    )
    assert out.dtype == np.float32


def test_q8_psnr_gate():
    arr = _img(seed=3)
    out = decode_image(encode_image(arr, "q8"))
    assert psnr_db(arr, out) >= 40.0


def test_q8_preserves_nan_mask():
    arr = _img(seed=4, nan_frac=0.2)
    out = decode_image(encode_image(arr, "q8"))
    np.testing.assert_array_equal(np.isnan(out), np.isnan(arr))
    assert psnr_db(arr, out) >= 40.0


def test_q8_constant_band():
    arr = np.full((1, 8, 8), 42.0, dtype=np.float32)
    out = decode_image(encode_image(arr, "q8"))
    np.testing.assert_allclose(out, arr, atol=1e-6)
    assert psnr_db(arr, out) == float("inf")


def test_psnr_identical_is_inf():
    arr = _img()
    assert psnr_db(arr, arr.copy()) == float("inf")


def test_average_hash_deterministic_and_sensitive():
    a = _img(bands=1, seed=7)[0]
    h1 = average_hash64(a)
    h2 = average_hash64(a.copy())
    assert h1 == h2
    b = a.copy()
    b[:16] += 1000.0
    assert average_hash64(b) != h1
    assert -(1 << 63) <= h1 < (1 << 63)


def test_all_formats_listed():
    assert set(FORMATS) == {"raw", "zlib", "q8"}
