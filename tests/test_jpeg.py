"""Baseline JPEG codec + TIFF compression-7 battery (round 7).

The decoder is pinned two independent ways:
1. A HAND-ASSEMBLED single-block bitstream whose expected pixels come
   from an explicit double-loop cosine IDCT written in the test (no
   shared code with the codec's matrix-DCT path).
2. Encoder→decoder round trips at PSNR bounds across gray/RGB,
   4:4:4/4:2:0, odd sizes, restart intervals, and the TIFF
   JPEGTables-abbreviated form.

Reference behavior: the reference reads JPEG-in-TIFF via rasterio/
libtiff transparently (any-codec ingest, common.py:803-813).
"""

import os
import struct
import tempfile

import numpy as np
import pytest

from raster2dggs_spark.codecs.jpeg import (
    AC_LUMA_BITS, AC_LUMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS, ZIGZAG,
    _build_encode_table, decode_baseline_jpeg, encode_baseline_jpeg,
    split_jpeg_tables,
)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))
                  ** 2)
    return 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))


# --------------------------------------------------------------------------
# leg 1: hand-assembled known vector


def test_decode_hand_assembled_block_matches_cosine_idct():
    """One 8×8 grayscale block: DC diff=+3 (category 2), one AC coef
    +1 at zigzag position 1, EOB — assembled bit by bit with the
    Annex-K tables.  Expected pixels from an explicit T.81 A.3.3 IDCT
    double loop (independent of the codec's matrix path)."""
    qt = np.arange(1, 65, dtype=np.uint8)  # distinct quants per position

    # headers
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(qt))
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    # entropy: DC cat 2 + bits '11' (=3), AC (run 0, size 1) + bit '1'
    # (=+1), EOB — using the canonical tables to get the code words
    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    bits = []

    def put(code, ln):
        bits.extend(((code >> (ln - 1 - i)) & 1) for i in range(ln))

    c, ln = dc_tab[2]
    put(c, ln)
    put(3, 2)          # EXTEND(3, 2) = +3
    c, ln = ac_tab[0x01]
    put(c, ln)
    put(1, 1)          # +1
    c, ln = ac_tab[0x00]
    put(c, ln)
    while len(bits) % 8:
        bits.append(1)
    by = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        by.append(b)
        if b == 0xFF:
            by.append(0x00)
    out.extend(by)
    out.extend(b"\xff\xd9")

    got = decode_baseline_jpeg(bytes(out))[:, :, 0]

    # independent expected: dequantized coefficients (zigzag 0 → qt 1,
    # zigzag 1 → qt 2), explicit cosine IDCT, +128, clip
    coef = np.zeros((8, 8))
    coef.flat[ZIGZAG[0]] = 3 * 1
    coef.flat[ZIGZAG[1]] = 1 * 2
    exp = np.zeros((8, 8))
    for xx in range(8):
        for yy in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv * coef[u, v]
                          * np.cos((2 * xx + 1) * u * np.pi / 16)
                          * np.cos((2 * yy + 1) * v * np.pi / 16))
            exp[xx, yy] = s / 4.0 + 128.0
    exp = np.clip(np.round(exp), 0, 255).astype(np.uint8)
    assert np.array_equal(got, exp)


# --------------------------------------------------------------------------
# leg 2: encoder→decoder round trips


def _smooth_rgb(h=96, w=112):
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    base = (np.sin(y)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5) * 255
    return np.stack([base, np.roll(base, h // 3, 0), 255 - base],
                    axis=-1).astype(np.uint8)


def test_roundtrip_psnr_matrix():
    rgb = _smooth_rgb()
    gray = rgb[:, :, 0]
    assert _psnr(gray, decode_baseline_jpeg(
        encode_baseline_jpeg(gray, 90))[:, :, 0]) > 45
    assert _psnr(rgb, decode_baseline_jpeg(
        encode_baseline_jpeg(rgb, 90))) > 42
    assert _psnr(rgb, decode_baseline_jpeg(
        encode_baseline_jpeg(rgb, 90, subsample=True))) > 32
    # odd sizes (non-multiple-of-8/16 force edge-padded MCUs)
    odd = rgb[:61, :45]
    assert _psnr(odd, decode_baseline_jpeg(
        encode_baseline_jpeg(odd, 85, subsample=True))) > 30


def test_constant_image_is_lossless_and_quality_monotone():
    c = np.full((40, 56), 100, dtype=np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(c, 90))[:, :, 0]
    assert np.array_equal(d, c)  # DC-only blocks survive quantization
    rgb = _smooth_rgb()
    p = [_psnr(rgb, decode_baseline_jpeg(encode_baseline_jpeg(rgb, q)))
         for q in (30, 60, 90)]
    assert p[0] < p[1] < p[2]


def test_restart_intervals_roundtrip():
    rgb = _smooth_rgb(80, 80)
    for sub, ri in ((False, 1), (False, 3), (True, 2)):
        s = encode_baseline_jpeg(rgb, 88, subsample=sub,
                                 restart_interval=ri)
        assert b"\xff\xd0" in s or b"\xff\xd1" in s  # markers present
        assert _psnr(rgb, decode_baseline_jpeg(s)) > 30, (sub, ri)


def test_abbreviated_tables_split_equals_full_decode():
    """split_jpeg_tables + tables= merge (the TIFF tag-347 path) decodes
    bit-identically to the self-contained stream."""
    rgb = _smooth_rgb()
    full = encode_baseline_jpeg(rgb, 85, subsample=True)
    tables, abbrev = split_jpeg_tables(full)
    assert abbrev != full and tables.startswith(b"\xff\xd8")
    a = decode_baseline_jpeg(full)
    b = decode_baseline_jpeg(abbrev, tables=tables)
    assert np.array_equal(a, b)
    # abbreviated stream without its tables is undecodable
    with pytest.raises(Exception):
        decode_baseline_jpeg(abbrev)


def test_progressive_sof2_raises_clean_error():
    gray = _smooth_rgb()[:, :, 0]
    s = bytearray(encode_baseline_jpeg(gray, 80))
    i = s.find(b"\xff\xc0")
    s[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_baseline_jpeg(bytes(s))


# --------------------------------------------------------------------------
# TIFF compression-7 integration


def _tmp_tif():
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as fh:
        return fh.name


@pytest.mark.parametrize("subsample,separate", [
    (False, False), (False, True), (True, True)])
def test_jpeg_in_tiff_roundtrip(subsample, separate):
    from raster2dggs_spark.sources.geotiff import (
        parse_geotiff, read_geotiff_local, write_geotiff)

    rgb = _smooth_rgb(280, 300).transpose(2, 0, 1).astype(np.float32)
    p = _tmp_tif()
    try:
        write_geotiff(p, rgb, (0.01, 0, 5.0, 0, -0.01, 8.0), "EPSG:4326",
                      compression="jpeg", tile=(128, 128),
                      jpeg_subsample=subsample,
                      jpeg_tables_separate=separate)
        m = parse_geotiff(p)
        assert m["compression"] == 7 and m["photometric"] == 6
        assert (m["jpeg_tables"] is not None) == separate
        dec = read_geotiff_local(p)
        assert dec.shape == rgb.shape
        assert _psnr(rgb, dec) > (32 if subsample else 42)
    finally:
        os.unlink(p)


def test_jpeg_in_tiff_grayscale_and_overviews():
    from raster2dggs_spark.sources.geotiff import (
        downsample_average, parse_geotiff, read_geotiff_local,
        write_geotiff)

    g = _smooth_rgb(280, 300)[:, :, :1].transpose(2, 0, 1).astype(
        np.float32)
    p = _tmp_tif()
    try:
        write_geotiff(p, g, (0.01, 0, 5.0, 0, -0.01, 8.0), "EPSG:4326",
                      compression="jpeg", tile=(96, 96),
                      overview_levels=(2,))
        m = parse_geotiff(p)
        assert m["photometric"] == 1 and len(m["overviews"]) == 1
        assert _psnr(g, read_geotiff_local(p)) > 45
        ov = read_geotiff_local(p, level=1)
        # overview decodes against the block-average of the SOURCE to
        # a lossy-but-tight bound (JPEG on top of the decimation)
        assert _psnr(downsample_average(g, 2), ov) > 40
    finally:
        os.unlink(p)


def test_jpeg_in_tiff_spark_ingest(spark):
    """compression-7 windows decode inside executors through the normal
    distributed plan and index end-to-end."""
    from raster2dggs_spark.operators.indexing import index_point_agg
    from raster2dggs_spark.sources.geotiff import read_geotiff, write_geotiff

    rgb = _smooth_rgb(256, 256).transpose(2, 0, 1).astype(np.float32)
    p = _tmp_tif()
    try:
        write_geotiff(p, rgb, (0.01, 0, 5.0, 0, -0.01, 8.0), "EPSG:4326",
                      compression="jpeg", tile=(128, 128))
        df = read_geotiff(spark, p)
        assert df.count() == 4  # 2×2 tiles
        out = index_point_agg(df, res=6, parent_res=2, agg="mean",
                              n_bands=3)
        rows = out.count()
        assert rows > 0
    finally:
        os.unlink(p)


def test_jpeg_writer_validates_band_count():
    from raster2dggs_spark.sources.geotiff import write_geotiff

    arr = np.zeros((2, 16, 16), dtype=np.float32)
    with pytest.raises(ValueError, match="1 or 3 bands"):
        write_geotiff(_tmp_tif(), arr, (1, 0, 0, 0, -1, 0),
                      "EPSG:4326", compression="jpeg")
