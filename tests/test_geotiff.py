"""GeoTIFF reader battery (round 6).

Two legs:
1. The reference's own raster (`se-island.tiff`: ZSTD tiles, predictor 2,
   float32, EPSG:3793) — decode pinned bit-exact against GDAL's own
   statistics stored in the sidecar aux.xml, plus the reference's
   published stage-1 regression numbers (74,888 kept-pixel rows,
   /root/reference/README.md:476-478).
2. Synthetic TIFFs written by a minimal test-side writer — exercising
   strips, planar config 2, deflate/LZW/PackBits, predictor 2 on u16 and
   predictor 3 on f32, and big-endian byte order.
"""

import os
import struct
import tempfile
import zlib

import numpy as np
import pytest

from raster2dggs_spark.sources.geotiff import (
    parse_geotiff,
    read_geotiff_local,
    _lzw_decode,
)

SE_ISLAND = "/root/reference/tests/data/se-island.tiff"

# only the se-island leg needs the mounted reference; the synthetic
# writer battery runs anywhere
needs_reference = pytest.mark.skipif(
    not os.path.exists(SE_ISLAND), reason="reference raster not mounted")

# GDAL's own statistics from se-island.tiff.aux.xml (band order 1..3)
GDAL_STATS = [
    (0.0, 0.90296649932861, 0.17591357086595, 0.14644770794737),
    (0.0, 0.92090547084808, 0.25548050506651, 0.13808513629157),
    (0.0, 0.94872784614563, 0.24872708208799, 0.12440843985189),
]


@needs_reference
def test_parse_metadata():
    m = parse_geotiff(SE_ISLAND)
    assert (m["w"], m["h"], m["spp"]) == (253, 296, 3)
    assert m["compression"] == 50000 and m["predictor"] == 2
    assert m["tiled"] and (m["tile_w"], m["tile_h"]) == (256, 256)
    assert m["crs"] == "EPSG:3793"
    assert abs(m["affine"][0] - 8.084197628459057) < 1e-12
    assert abs(m["affine"][5] - 5088845.3042) < 1e-6


@needs_reference
def test_decode_matches_gdal_statistics():
    """Pin the full decode (zstd + 32-bit horizontal predictor) against
    GDAL's computed min/max/mean/std to 1e-9 — bit-exactness evidence
    without GDAL in the container."""
    img = read_geotiff_local(SE_ISLAND)
    assert img.shape == (3, 296, 253)
    assert np.isfinite(img).all()
    for b, (mn, mx, mean, std) in enumerate(GDAL_STATS):
        v = img[b].astype(np.float64)
        assert abs(v.min() - mn) < 1e-9
        assert abs(v.max() - mx) < 1e-8
        assert abs(v.mean() - mean) < 1e-9
        assert abs(v.std() - std) < 1e-9


@needs_reference
def test_spark_windows_bit_identical_and_stage1_regression(spark):
    """Distributed window read reassembles bit-identically, and the
    stage-1 pixel frame reproduces the reference's pinned regression:
    74,888 pixels read, 74,888 rows indexed, 100% valid
    (/root/reference/README.md:476-478)."""
    from raster2dggs_spark.codecs import decode_image
    from raster2dggs_spark.operators.indexing import pixel_cells
    from raster2dggs_spark.sources.geotiff import read_geotiff

    imgs = read_geotiff(spark, SE_ISLAND)
    rows = imgs.collect()
    assert len(rows) == 2  # 256-row tile + 40-row edge tile
    full = read_geotiff_local(SE_ISLAND)
    recon = np.full_like(full, np.nan)
    for r in rows:
        arr = decode_image(bytes(r.bytes))
        roff = round((r.affine_f - 5088845.3042) / -8.000545945946707)
        assert r.crs == "EPSG:3793" and r.bands == 3
        recon[:, roff:roff + r.h, : r.w] = arr
    assert np.array_equal(full, recon)

    px = pixel_cells(imgs, res=11, dggs="hex7", n_bands=3)
    assert px.count() == 74_888 == 253 * 296


# --------------------------------------------------------------------------
# synthetic TIFF writer (test-side only; intentionally simple + separate
# from the reader code so bugs can't cancel)


def _write_tiff(path, arr, *, compression=1, predictor=1, bo="<",
                rows_per_strip=None, planar=1, tiled=False, tile=(16, 16),
                big=False, sparse=()):
    """arr: (bands, h, w) of u8/u16/f32. Writes strips unless tiled.
    ``big=True`` emits BigTIFF (magic 43, 8-byte offsets); ``sparse``
    lists segment indices written as GDAL sparse (offset 0)."""
    bands, h, w = arr.shape
    dt = arr.dtype
    bps = dt.itemsize * 8
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    file_dt = dt.newbyteorder(bo)

    def _diff(block, stride):
        if predictor == 1:
            return np.ascontiguousarray(block, dtype=file_dt).tobytes()
        if predictor == 2:
            # bit-pattern reinterpretation (libtiff differences the raw
            # words — for floats too, cf. se-island's 32-bit predictor)
            u = np.ascontiguousarray(block).view(
                np.dtype(f"u{dt.itemsize}"))
            d = u.reshape(u.shape[0], -1, stride).copy()
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            return d.reshape(u.shape).astype(
                np.dtype(f"u{dt.itemsize}").newbyteorder(bo)).tobytes()
        # predictor 3: byte-plane split (MSB plane first) + byte diff
        be = np.ascontiguousarray(block, dtype=dt.newbyteorder(">"))
        rows_, samples_ = block.shape
        bb = np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(
            rows_, samples_, dt.itemsize)
        planes = np.empty((rows_, dt.itemsize, samples_), dtype=np.uint8)
        for k in range(dt.itemsize):
            planes[:, k, :] = bb[:, :, k]
        flat = planes.reshape(rows_, -1).copy()
        d = flat.reshape(rows_, -1, stride).copy()
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        return d.tobytes()

    def _compress(raw):
        if compression == 1:
            return raw
        if compression == 8:
            return zlib.compress(raw)
        if compression == 32773:  # PackBits: trivial literal runs <=128
            out = bytearray()
            for i in range(0, len(raw), 128):
                chunk = raw[i:i + 128]
                out.append(len(chunk) - 1)
                out += chunk
            return bytes(out)
        if compression == 5:  # LZW: emit Clear + literal root codes + EOI
            out = bytearray()
            acc = nbits = 0
            width = 9
            count = 258

            def put(code, wd):
                nonlocal acc, nbits
                acc = (acc << wd) | code
                nbits += wd
                while nbits >= 8:
                    nbits -= 8
                    out.append((acc >> nbits) & 0xFF)

            put(256, width)
            for byte in raw:
                put(byte, width)
                count += 1
                # mirror the decoder's early-change growth; reset at 12 bits
                if count + 1 >= (1 << width):
                    if width < 12:
                        width += 1
                    else:
                        put(256, width)
                        width, count = 9, 258
            put(257, width)
            if nbits:
                out.append((acc << (8 - nbits)) & 0xFF)
            return bytes(out)
        raise ValueError(compression)

    # build segments
    stride = bands if planar == 1 else 1
    segs = []
    if planar == 1:
        chunky = np.ascontiguousarray(arr.transpose(1, 2, 0)).reshape(h, -1)
        plane_list = [chunky]
    else:
        plane_list = [arr[b] for b in range(bands)]
    for plane in plane_list:
        if tiled:
            twd, thg = tile
            for r0 in range(0, h, thg):
                for c0 in range(0, w, twd):
                    if planar == 1:
                        block = np.zeros((thg, twd * bands), dtype=dt)
                        src = plane[r0:r0 + thg, c0 * bands:(c0 + twd) * bands]
                    else:
                        block = np.zeros((thg, twd), dtype=dt)
                        src = plane[r0:r0 + thg, c0:c0 + twd]
                    block[:src.shape[0], :src.shape[1]] = src
                    segs.append(_compress(_diff(block, stride)))
        else:
            rps = rows_per_strip or h
            for r0 in range(0, h, rps):
                block = plane[r0:r0 + rps]
                segs.append(_compress(_diff(block, stride)))

    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, compression),
        (262, 3, 1, 1), (277, 3, 1, bands), (284, 3, 1, planar),
        (317, 3, 1, predictor),
    ]
    extra = b""
    data_off = 8

    inline_max = 8 if big else 4

    def _arr_tag(tag, typ, values, elem_fmt, elem_size):
        nonlocal extra
        cnt = len(values)
        if cnt * elem_size <= inline_max:
            packed = struct.pack(bo + str(cnt) + elem_fmt, *values)
            packed += b"\x00" * (inline_max - len(packed))
            return (tag, typ, cnt, packed)
        off_marker = len(extra)
        extra += struct.pack(bo + str(cnt) + elem_fmt, *values)
        return (tag, typ, cnt, ("extra", off_marker))

    tags.append(_arr_tag(258, 3, [bps] * bands, "H", 2))
    tags.append(_arr_tag(339, 3, [fmt] * bands, "H", 2))
    if tiled:
        tags += [(322, 3, 1, tile[0]), (323, 3, 1, tile[1])]
    else:
        tags.append((278, 3, 1, rows_per_strip or h))
    # georeferencing: 1 px = 0.01 deg, origin (10, 50), EPSG:4326
    tags.append(_arr_tag(33550, 12, [0.01, 0.01, 0.0], "d", 8))
    tags.append(_arr_tag(33922, 12, [0, 0, 0, 10.0, 50.0, 0.0], "d", 8))
    tags.append(_arr_tag(34735, 3, [1, 1, 0, 1, 1024, 0, 1, 2], "H", 2))

    # sparse segments: written as offset 0 / count 0, no bytes emitted
    segs = [b"" if i in set(sparse) else sg for i, sg in enumerate(segs)]

    # lay out: header, IFD(count + entries + next), extra data, segments
    n_all = len(tags) + 2  # + offsets/counts arrays
    entry_sz = 20 if big else 12
    off_fmt = "Q" if big else "I"
    off_typ = 16 if big else 4
    off_sz = 8 if big else 4
    ifd_off = 16 if big else 8
    ifd_size = (8 if big else 2) + entry_sz * n_all + off_sz
    extra_base = ifd_off + ifd_size
    seg_meta_size = 0 if len(segs) == 1 else 2 * off_sz * len(segs)
    seg_base = extra_base + len(extra) + seg_meta_size
    offs, cur = [], seg_base
    for sg in segs:
        offs.append(0 if not sg else cur)
        cur += len(sg)
    off_tag = 324 if tiled else 273
    cnt_tag = 325 if tiled else 279
    if len(segs) == 1:
        tags += [(off_tag, off_typ, 1, offs[0]),
                 (cnt_tag, off_typ, 1, len(segs[0]))]
        seg_arrays = b""
    else:
        seg_arrays = struct.pack(bo + str(len(segs)) + off_fmt, *offs)
        seg_arrays += struct.pack(bo + str(len(segs)) + off_fmt,
                                  *[len(sg) for sg in segs])
        tags += [
            (off_tag, off_typ, len(segs), ("seg", 0)),
            (cnt_tag, off_typ, len(segs), ("seg", off_sz * len(segs))),
        ]

    tags.sort(key=lambda t: t[0])
    buf = bytearray()
    if big:
        buf += (b"II" if bo == "<" else b"MM")
        buf += struct.pack(bo + "HHHQ", 43, 8, 0, 16)
        buf += struct.pack(bo + "Q", n_all)
    else:
        buf += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
        buf += struct.pack(bo + "H", n_all)
    cnt_fmt = "HHQ" if big else "HHI"
    for tag, typ, cnt, val in tags:
        buf += struct.pack(bo + cnt_fmt, tag, typ, cnt)
        if isinstance(val, tuple) and val[0] == "extra":
            buf += struct.pack(bo + off_fmt, extra_base + val[1])
        elif isinstance(val, tuple) and val[0] == "seg":
            buf += struct.pack(bo + off_fmt,
                               extra_base + len(extra) + val[1])
        elif isinstance(val, bytes):
            buf += val + b"\x00" * (inline_max - len(val))
        elif typ == 3:  # SHORT value occupies the first 2 slot bytes
            buf += struct.pack(bo + "H", val) + b"\x00" * (inline_max - 2)
        else:
            buf += struct.pack(bo + off_fmt, val)
    buf += struct.pack(bo + off_fmt, 0)  # next IFD
    buf += extra + seg_arrays
    for s in segs:
        buf += s
    with open(path, "wb") as fh:
        fh.write(buf)


def _roundtrip(arr, **kw):
    with tempfile.NamedTemporaryFile(suffix=".tiff", delete=False) as fh:
        path = fh.name
    try:
        _write_tiff(path, arr, **kw)
        meta = parse_geotiff(path)
        out = read_geotiff_local(path)
        return meta, out
    finally:
        os.unlink(path)


def _ramp(bands, h, w, dtype):
    a = np.arange(bands * h * w).reshape(bands, h, w)
    if np.dtype(dtype).kind == "f":
        return (a * 0.25).astype(dtype)
    return (a % 251).astype(dtype)


def test_uncompressed_u8_strips():
    arr = _ramp(3, 21, 17, np.uint8)
    meta, out = _roundtrip(arr, rows_per_strip=5)
    assert meta["crs"] == "EPSG:4326" and meta["affine"][0] == 0.01
    assert np.array_equal(out, arr.astype(np.float32))


def test_deflate_f32_tiles_predictor3():
    arr = _ramp(2, 30, 33, np.float32)
    _, out = _roundtrip(arr, compression=8, predictor=3, tiled=True,
                        tile=(16, 16))
    assert np.array_equal(out, arr)


def test_predictor2_u16_strips():
    arr = _ramp(3, 19, 23, np.uint16)
    _, out = _roundtrip(arr, compression=8, predictor=2, rows_per_strip=4)
    assert np.array_equal(out, arr.astype(np.float32))


def test_planar_config2_deflate():
    arr = _ramp(3, 12, 14, np.uint8)
    _, out = _roundtrip(arr, compression=8, planar=2, rows_per_strip=6)
    assert np.array_equal(out, arr.astype(np.float32))


def test_big_endian_f32():
    arr = _ramp(1, 9, 11, np.float32)
    _, out = _roundtrip(arr, bo=">", rows_per_strip=3)
    assert np.array_equal(out, arr)


def test_packbits_u8():
    arr = _ramp(1, 15, 13, np.uint8)
    _, out = _roundtrip(arr, compression=32773, rows_per_strip=5)
    assert np.array_equal(out, arr.astype(np.float32))


def test_lzw_u8_strips():
    arr = _ramp(3, 25, 20, np.uint8)
    _, out = _roundtrip(arr, compression=5, rows_per_strip=7)
    assert np.array_equal(out, arr.astype(np.float32))


def test_lzw_decode_known_vector():
    """Spec-level pin independent of the test encoder: Clear(256)=0x100,
    'A'(0x41), 'B', EOI(0x101) at 9 bits, MSB-first."""
    bits = "100000000" + "001000001" + "001000010" + "100000001"
    bits += "0" * (-len(bits) % 8)
    buf = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_decode(buf) == b"AB"


def test_lzw_long_stream_code_width_growth():
    """>254 distinct sequences forces 10/11-bit codes through the
    early-change path."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(1, 64, 257)).astype(np.uint8)
    _, out = _roundtrip(arr, compression=5)
    assert np.array_equal(out, arr.astype(np.float32))


def test_many_files_distributed_scan(spark, tmp_path):
    """>256 files routes through scan_geotiffs: the header tag-walk
    itself fans out to executors; every file's windows decode and
    georeference independently."""
    import pandas as pd

    from raster2dggs_spark.sources.geotiff import read_geotiff

    paths = []
    for i in range(260):
        arr = (np.arange(12, dtype=np.float32) + i).reshape(1, 3, 4)
        p = str(tmp_path / f"t{i:03d}.tiff")
        _write_tiff(p, arr)
        paths.append(p)
    out = read_geotiff(spark, paths)
    rows = out.collect()
    assert len(rows) == 260
    from raster2dggs_spark.codecs import decode_image

    by_id = {r.image_id: r for r in rows}
    r7 = by_id["t007.tiff#w00000"]
    assert r7.crs == "EPSG:4326" and (r7.w, r7.h) == (4, 3)
    assert np.array_equal(
        decode_image(bytes(r7.bytes)),
        (np.arange(12, dtype=np.float32) + 7).reshape(1, 3, 4))


def test_bigtiff_roundtrip():
    """BigTIFF (magic 43, 8-byte offsets, 20-byte IFD entries) — files
    >4 GB at corpus scale are BigTIFF, so the tag-walk must speak it."""
    arr = _ramp(3, 22, 18, np.float32)
    _, out = _roundtrip(arr, compression=8, predictor=2, rows_per_strip=6,
                        big=True)
    assert np.array_equal(out, arr)


def test_bigtiff_big_endian_tiled():
    arr = _ramp(2, 17, 21, np.uint16)
    _, out = _roundtrip(arr, bo=">", tiled=True, tile=(16, 16), big=True)
    assert np.array_equal(out, arr.astype(np.float32))


def test_sparse_segments_fill_nan():
    """GDAL sparse files: a segment with offset 0 was never written and
    reads as implicit nodata fill (NaN when no GDAL_NODATA declared)."""
    arr = _ramp(1, 20, 10, np.float32)
    _, out = _roundtrip(arr, rows_per_strip=5, sparse=(1,))
    assert np.array_equal(out[:, :5], arr[:, :5])
    assert np.isnan(out[:, 5:10]).all()          # the sparse strip
    assert np.array_equal(out[:, 10:], arr[:, 10:])


def test_write_geotiff_roundtrip_all_compressions():
    """The export sink: written files re-parse with the (GDAL-pinned)
    reader bit-exactly, carrying CRS + nodata through the GeoKeys."""
    from raster2dggs_spark.sources.geotiff import write_geotiff

    rng = np.random.default_rng(0)
    arr = rng.standard_normal((3, 300, 270)).astype(np.float32)
    for comp in ("zstd", "deflate", "none"):
        with tempfile.NamedTemporaryFile(suffix=".tiff",
                                         delete=False) as fh:
            p = fh.name
        try:
            write_geotiff(p, arr, (0.01, 0, 10.0, 0, -0.01, 50.0),
                          "EPSG:32618", nodata=-9999.0, compression=comp)
            m = parse_geotiff(p)
            assert m["crs"] == "EPSG:32618" and m["nodata"] == -9999.0
            assert np.array_equal(read_geotiff_local(p), arr), comp
        finally:
            os.unlink(p)


def test_write_geotiff_4326_geographic_keys():
    from raster2dggs_spark.sources.geotiff import write_geotiff

    arr = np.arange(48, dtype=np.float32).reshape(1, 6, 8)
    with tempfile.NamedTemporaryFile(suffix=".tiff", delete=False) as fh:
        p = fh.name
    try:
        write_geotiff(p, arr, (0.5, 0, -10.0, 0, -0.5, 45.0), "EPSG:4326",
                      compression="deflate", tile=(8, 8))
        m = parse_geotiff(p)
        assert m["crs"] == "EPSG:4326"
        assert np.array_equal(read_geotiff_local(p), arr)
    finally:
        os.unlink(p)


# --------------------------------------------------------------------------
# round 7: COG overview pyramids, band descriptions, CRS strictness


def _tmp_tif():
    with tempfile.NamedTemporaryFile(suffix=".tiff", delete=False) as fh:
        return fh.name


def test_overview_pyramid_roundtrip_bit_exact():
    """write_geotiff(overview_levels=...) emits chained reduced-resolution
    IFDs (NewSubfileType=1); the reader walks the chain, derives the
    scaled affine, and every level decodes bit-exactly against the
    block-average oracle."""
    from raster2dggs_spark.sources.geotiff import (
        downsample_average, write_geotiff)

    rng = np.random.default_rng(7)
    arr = rng.random((3, 300, 500)).astype(np.float32) * 100.0
    p = _tmp_tif()
    try:
        write_geotiff(p, arr, (0.01, 0, 10.0, 0, -0.01, 50.0), "EPSG:4326",
                      nodata=-9.0, overview_levels=(2, 4), tile=(128, 128))
        m = parse_geotiff(p)
        assert len(m["overviews"]) == 2
        o1, o2 = m["overviews"]
        assert (o1["w"], o1["h"]) == (250, 150)
        assert (o2["w"], o2["h"]) == (125, 75)
        # affine scales by the exact decimation factor; origin fixed
        assert abs(o1["affine"][0] - 0.02) < 1e-12
        assert abs(o2["affine"][4] + 0.04) < 1e-12
        assert o1["affine"][2] == 10.0 and o1["affine"][5] == 50.0
        assert o1["crs"] == "EPSG:4326" and o1["nodata"] == -9.0
        assert np.array_equal(read_geotiff_local(p), arr)
        for lvl, fct in ((1, 2), (2, 4)):
            assert np.array_equal(read_geotiff_local(p, level=lvl),
                                  downsample_average(arr, fct)), lvl
    finally:
        os.unlink(p)


def test_pick_overview_level_monotone():
    """auto picks the COARSEST level whose pixels are still finer than
    the target cell — never coarser (information-preserving)."""
    from raster2dggs_spark.sources.geotiff import (
        pick_overview_level, write_geotiff)

    arr = np.zeros((1, 64, 64), dtype=np.float32)
    p = _tmp_tif()
    try:
        write_geotiff(p, arr, (0.01, 0, 0.0, 0, -0.01, 1.0), "EPSG:4326",
                      overview_levels=(2, 4), tile=(32, 32))
        m = parse_geotiff(p)
        # full-res pixel ≈ (0.01·111195)² ≈ 1.24e6 m²; levels ×4 / ×16
        assert pick_overview_level(m, 1.0e6) == 0
        assert pick_overview_level(m, 5.0e6) == 1
        assert pick_overview_level(m, 2.0e7) == 2
        assert pick_overview_level(m, 1.0e12) == 2  # clamps to coarsest
    finally:
        os.unlink(p)


def test_overview_plan_reads_fewer_bytes():
    """The windows planned at an overview level cover ~1/factor² of the
    payload bytes of the full-resolution plan — the I/O saving is in
    the PLAN, before any pixel is read."""
    from raster2dggs_spark.sources.geotiff import window_plan, write_geotiff

    rng = np.random.default_rng(1)
    arr = rng.random((2, 512, 512)).astype(np.float32)
    p = _tmp_tif()
    try:
        write_geotiff(p, arr, (0.01, 0, 0.0, 0, -0.01, 5.0), "EPSG:4326",
                      overview_levels=(4,), tile=(128, 128))

        def _bytes(level):
            plan = window_plan([p], level)
            return sum(sum(c) for c in plan["seg_counts"])

        b0, b1 = _bytes(0), _bytes(1)
        assert b1 * 8 < b0  # zstd noise margin on the 16× decimation
    finally:
        os.unlink(p)


def test_band_descriptions_roundtrip_and_spark_table(spark):
    """GDAL_METADATA (tag 42112) band descriptions: writer emits, reader
    parses (incl. XML entities), read_geotiff carries them into the
    image table's band_names column — so by-label -b works on real GDAL
    files exactly as the reference's src.descriptions path
    (/root/reference/raster2dggs/common.py:768-801)."""
    from raster2dggs_spark.sources.geotiff import read_geotiff, write_geotiff

    arr = np.stack([np.full((40, 60), v, dtype=np.float32)
                    for v in (1.0, 2.0, 3.0)])
    p = _tmp_tif()
    try:
        write_geotiff(p, arr, (0.02, 0, 5.0, 0, -0.02, 8.0), "EPSG:4326",
                      band_names=["red", None, "nir & <edge>"],
                      tile=(32, 32))
        m = parse_geotiff(p)
        assert m["band_names"] == ["red", None, "nir & <edge>"]
        df = read_geotiff(spark, p)
        names = df.select("band_names").distinct().collect()
        assert len(names) == 1
        assert list(names[0][0]) == ["red", None, "nir & <edge>"]
    finally:
        os.unlink(p)


def _write_with_geokeys(path, gk):
    """Minimal 4×4 float32 TIFF with an arbitrary GeoKey directory —
    for exercising the reader's CRS strictness paths."""
    from raster2dggs_spark.sources.geotiff import _serialize_ifd

    arr = np.arange(16, dtype=np.float32).reshape(4, 4)
    tags = [
        (256, 3, 1, 4), (257, 3, 1, 4), (258, 3, 1, [32]),
        (259, 3, 1, 1), (262, 3, 1, 1), (277, 3, 1, 1), (284, 3, 1, 1),
        (317, 3, 1, 1), (322, 3, 1, 4), (323, 3, 1, 4),
        (339, 3, 1, [3]),
        (33550, 12, 3, [0.5, 0.5, 0.0]),
        (33922, 12, 6, [0.0, 0.0, 0.0, 10.0, 20.0, 0.0]),
        (34735, 3, len(gk), list(gk)),
    ]
    blk = _serialize_ifd(tags, [arr.tobytes()], 8)
    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, 8) + bytes(blk))


def test_crs_strict_projected_without_code_raises():
    """GTModelType=1 (projected) without ProjectedCSTypeGeoKey must
    refuse — a meters-unit affine silently read as WGS84 degrees would
    produce wrong cells with no error (round-7 ADVICE)."""
    p = _tmp_tif()
    try:
        _write_with_geokeys(p, (1, 1, 0, 1, 1024, 0, 1, 1))
        with pytest.raises(ValueError, match="ProjectedCSType"):
            parse_geotiff(p)
        # user-defined (32767) is just as unusable
        _write_with_geokeys(p, (1, 1, 0, 2, 1024, 0, 1, 1,
                                3072, 0, 1, 32767))
        with pytest.raises(ValueError, match="ProjectedCSType"):
            parse_geotiff(p)
    finally:
        os.unlink(p)


def test_crs_strict_non_wgs84_geographic_raises():
    p = _tmp_tif()
    try:
        _write_with_geokeys(p, (1, 1, 0, 2, 1024, 0, 1, 2,
                                2048, 0, 1, 4269))  # NAD83
        with pytest.raises(ValueError, match="4269"):
            parse_geotiff(p)
        # WGS84 stays fine
        _write_with_geokeys(p, (1, 1, 0, 2, 1024, 0, 1, 2,
                                2048, 0, 1, 4326))
        assert parse_geotiff(p)["crs"] == "EPSG:4326"
    finally:
        os.unlink(p)
