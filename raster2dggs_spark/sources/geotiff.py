"""Pure-NumPy GeoTIFF reader — real raster ingest without GDAL/rasterio.

The reference opens rasters with rasterio/GDAL and iterates block windows
(/root/reference/raster2dggs/common.py:67-122, 831-835).  Offline we parse
classic TIFF ourselves and emit one IMAGE_SCHEMA row per TIFF tile/strip —
the exact analogue of the reference's GDAL block window.

Scale design (100-TB shape):

- **Header scan is bounded**: the IFD tag walk does targeted range reads
  (a few KB per file) — the object-store range-GET pattern.  For many
  files the scan itself fans out to executors (``scan_geotiffs``).
- **Pixel decode is distributed**: the window plan (one row per tile /
  strip, byte offsets included) is a small DataFrame; payload bytes are
  range-read + decompressed + de-predicted per window inside
  ``mapInPandas`` on executors.  No image byte ever crosses the driver.

Supported: classic TIFF AND BigTIFF (II/MM; magic 42/43 — files >4 GB
at corpus scale are BigTIFF), strips + tiles, PlanarConfig 1/2,
Compression none/deflate/zstd/PackBits/LZW, Predictor 1/2/3 (horizontal
int + floating-point byte-shuffled), u8/u16/u32/i8/i16/i32/f32/f64
samples, GDAL sparse segments (offset 0 → implicit nodata fill),
GeoTIFF georeferencing (ModelPixelScale+Tiepoint or
ModelTransformation; CRS via GeoKey 1024/3072), GDAL_NODATA.

Validated bit-exact against GDAL's own statistics for the reference's
``se-island.tiff`` (ZSTD tiles, predictor 2, float32, EPSG:3793 — see
tests/test_geotiff.py).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

_TAG_NAMES = {
    254: "subfile_type",
    256: "width", 257: "height", 258: "bits", 259: "compression",
    262: "photometric",
    273: "strip_offsets", 277: "spp", 278: "rows_per_strip",
    279: "strip_counts", 284: "planar", 317: "predictor",
    322: "tile_w", 323: "tile_h", 324: "tile_offsets",
    325: "tile_counts", 339: "sample_format", 347: "jpeg_tables",
    33550: "pixel_scale", 33922: "tiepoint", 34264: "transform",
    34735: "geo_keys", 34736: "geo_doubles",
    42112: "gdal_metadata", 42113: "gdal_nodata",
}

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}  # 16-18: BigTIFF
_TYPE_FMT = {1: "B", 2: "s", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h",
             9: "i", 11: "f", 12: "d", 16: "Q", 17: "q", 18: "Q"}


def _read_range(path: str, off: int, n: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(off)
        return fh.read(n)


def _dtype_for(bits: int, fmt: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt, "u")
    if bits not in (8, 16, 32, 64):
        raise ValueError(f"unsupported BitsPerSample {bits}")
    if kind == "f" and bits < 32:
        raise ValueError(f"unsupported float{bits}")
    return np.dtype(f"{kind}{bits // 8}").newbyteorder(bo)


def _read_ifd(path: str, bo: str, big: bool, ifd_off: int
              ) -> tuple[dict, int]:
    """Read one IFD's known tags; return (tags, next_ifd_offset)."""
    entry_sz, inline_max = (20, 8) if big else (12, 4)
    if big:
        n_entries, = struct.unpack(bo + "Q", _read_range(path, ifd_off, 8))
        entries = _read_range(path, ifd_off + 8, entry_sz * n_entries + 8)
        next_off, = struct.unpack_from(bo + "Q", entries,
                                       entry_sz * n_entries)
    else:
        n_entries, = struct.unpack(bo + "H", _read_range(path, ifd_off, 2))
        entries = _read_range(path, ifd_off + 2, entry_sz * n_entries + 4)
        next_off, = struct.unpack_from(bo + "I", entries,
                                       entry_sz * n_entries)
    tags: dict = {}
    for i in range(n_entries):
        if big:
            tag, typ, cnt = struct.unpack_from(bo + "HHQ", entries,
                                               entry_sz * i)
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", entries,
                                               entry_sz * i)
        name = _TAG_NAMES.get(tag)
        if name is None or typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        val_at = entry_sz * i + (12 if big else 8)
        if size <= inline_max:
            raw = entries[val_at: val_at + size]
        else:
            voff, = struct.unpack_from(bo + ("Q" if big else "I"),
                                       entries, val_at)
            raw = _read_range(path, voff, size)
        if name == "jpeg_tables":
            # raw abbreviated JPEG stream (hex for JSON transport)
            tags[name] = raw.hex()
        elif typ == 2:
            tags[name] = raw.rstrip(b"\x00").decode("ascii", "replace")
        elif typ == 5:  # RATIONAL
            vals = struct.unpack(bo + str(2 * cnt) + "I", raw)
            tags[name] = tuple(vals[j] / max(vals[j + 1], 1)
                               for j in range(0, 2 * cnt, 2))
        else:
            vals = struct.unpack(bo + str(cnt) + _TYPE_FMT[typ], raw)
            tags[name] = vals if cnt > 1 else vals[0]
    return tags, int(next_off)


def _parse_band_names(xml: str, spp: int) -> list | None:
    """Band descriptions from GDAL_METADATA (tag 42112): ``<Item
    name="DESCRIPTION" sample="k" role="description">...`` — what the
    reference surfaces as ``src.descriptions`` for by-label band
    selection (/root/reference/raster2dggs/common.py:768-801)."""
    import re

    names: list = [None] * spp
    found = False
    for attrs, text in re.findall(r"<Item\s+([^>]*)>(.*?)</Item>", xml,
                                  re.S):
        a = dict(re.findall(r'(\w+)="([^"]*)"', attrs))
        if a.get("role") != "description":
            continue
        try:
            k = int(a.get("sample", "-1"))
        except ValueError:
            continue
        if 0 <= k < spp:
            for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                            ("&apos;", "'"), ("&amp;", "&")):
                text = text.replace(ent, ch)
            names[k] = text.strip()
            found = True
    return names if found else None


def _ifd_dims(tags: dict, path: str) -> dict:
    """Shared per-IFD geometry/codec fields (main IFD and overviews)."""
    w, h = int(tags["width"]), int(tags["height"])
    spp = int(tags.get("spp", 1))
    bits = tags.get("bits", 8)
    bits = int(bits[0] if isinstance(bits, tuple) else bits)
    fmt = tags.get("sample_format", 1)
    fmt = int(fmt[0] if isinstance(fmt, tuple) else fmt)
    comp = int(tags.get("compression", 1))
    pred = int(tags.get("predictor", 1))
    planar = int(tags.get("planar", 1))

    def _tup(key):
        v = tags.get(key)
        if v is None:
            return None
        return (v,) if not isinstance(v, tuple) else v

    if "tile_offsets" in tags:
        tw, th = int(tags["tile_w"]), int(tags["tile_h"])
        offsets, counts = _tup("tile_offsets"), _tup("tile_counts")
        tiled = True
    else:
        tw = w
        th = int(tags.get("rows_per_strip", h))
        offsets, counts = _tup("strip_offsets"), _tup("strip_counts")
        tiled = False
    return {
        "path": path, "w": w, "h": h, "spp": spp, "bits": bits,
        "sample_format": fmt, "compression": comp, "predictor": pred,
        "planar": planar, "tiled": tiled, "tile_w": tw, "tile_h": th,
        "offsets": list(offsets), "counts": list(counts),
        "photometric": int(tags.get("photometric", 1)),
        "jpeg_tables": tags.get("jpeg_tables"),
    }


def parse_geotiff(path: str) -> dict:
    """Parse the IFD chain into a plain dict (picklable — it rides in
    the window-plan DataFrame).  Bounded reads: header + tag value
    arrays.  Reduced-resolution IFDs after the first (COG / GDAL
    overview pyramids, NewSubfileType bit 0) are exposed under
    ``meta["overviews"]`` — each a complete meta dict of its own (same
    crs/nodata, affine scaled by the decimation factor) that the window
    planner and decoder consume unchanged, so resolution auto-modes can
    read a matching overview instead of the full-resolution array
    (reference F9, /root/reference/raster2dggs/common.py:67-122)."""
    head = _read_range(path, 0, 16)
    if head[:2] == b"II":
        bo = "<"
    elif head[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF")
    magic, = struct.unpack(bo + "H", head[2:4])
    if magic == 42:  # classic: 4-byte offsets, 12-byte entries
        big = False
        ifd_off, = struct.unpack(bo + "I", head[4:8])
    elif magic == 43:  # BigTIFF: 8-byte offsets, 20-byte entries
        big = True
        off_sz, zero = struct.unpack(bo + "HH", head[4:8])
        if off_sz != 8 or zero != 0:
            raise ValueError(f"{path}: malformed BigTIFF header")
        ifd_off, = struct.unpack(bo + "Q", head[8:16])
    else:
        raise ValueError(f"{path}: bad TIFF magic {magic}")

    tags, next_off = _read_ifd(path, bo, big, ifd_off)
    meta = _ifd_dims(tags, path)
    meta["bo"] = bo

    # -- georeferencing ---------------------------------------------------
    if "transform" in tags:
        m = tags["transform"]
        affine = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif "pixel_scale" in tags and "tiepoint" in tags:
        sx, sy = tags["pixel_scale"][0], tags["pixel_scale"][1]
        ti, tj, _tk, tx, ty = tags["tiepoint"][:5]
        affine = (sx, 0.0, tx - sx * ti, 0.0, -sy, ty + sy * tj)
    else:
        affine = (1.0, 0.0, 0.0, 0.0, -1.0, 0.0)  # pixel space

    crs = "EPSG:4326"
    gk = tags.get("geo_keys")
    if gk is not None:
        gk = (gk,) if not isinstance(gk, tuple) else gk
        dbl = tags.get("geo_doubles") or ()
        dbl = (dbl,) if not isinstance(dbl, tuple) else dbl
        keys: dict = {}
        for i in range(4, len(gk) - 3, 4):
            kid, loc, cnt, val = gk[i], gk[i + 1], gk[i + 2], gk[i + 3]
            if loc == 0:
                keys[kid] = val
            elif loc == 34736 and val + cnt <= len(dbl):
                keys[kid] = dbl[val] if cnt == 1 else dbl[val:val + cnt]
        model = keys.get(1024)
        if model == 2:  # geographic model → degrees
            # a non-WGS84 geographic CRS (e.g. NAD83 4269) must NOT be
            # silently treated as 4326 — datum shifts are real meters
            gcode = keys.get(2048)
            if gcode is not None and gcode not in (4326, 32767):
                raise ValueError(
                    f"{path}: geographic CRS EPSG:{gcode} unsupported "
                    "offline (only WGS84 4326); reproject the file or "
                    "pass the image table with explicit crs")
            crs = "EPSG:4326"
        elif model == 1:  # projected model: the code is REQUIRED
            pcode = keys.get(3072)
            if pcode is None or pcode == 32767:
                # user-defined projection: the one family GDAL routinely
                # writes this way is MODIS sinusoidal (CT_Sinusoidal=24,
                # params in GeoDoubleParams) — reconstruct it; anything
                # else is refused rather than guessed
                if keys.get(3075) == 24:
                    from raster2dggs_spark.geo.crs import MODIS_SPHERE_R

                    lon0 = float(keys.get(3088, keys.get(3080, 0.0)))
                    fe = float(keys.get(3082, 0.0))
                    fn = float(keys.get(3083, 0.0))
                    R = float(keys.get(2057, MODIS_SPHERE_R))
                    if (lon0, fe, fn, R) == (0.0, 0.0, 0.0,
                                             MODIS_SPHERE_R):
                        crs = "ESRI:54008"
                    else:
                        crs = f"SINU:{lon0!r}:{fe!r}:{fn!r}:{R!r}"
                else:
                    raise ValueError(
                        f"{path}: projected GeoTIFF without a usable "
                        "ProjectedCSTypeGeoKey (3072) — refusing to "
                        "guess a CRS for a meters-unit affine")
            else:
                crs = f"EPSG:{pcode}"
        elif model is not None:
            raise ValueError(
                f"{path}: unsupported GTModelType {model} (geocentric?)")

    nodata = None
    nd = tags.get("gdal_nodata")
    if nd is not None:
        nd = nd.strip()
        nodata = float("nan") if nd.lower() == "nan" else float(nd)

    band_names = None
    gm = tags.get("gdal_metadata")
    if gm:
        band_names = _parse_band_names(gm, meta["spp"])

    meta.update(affine=affine, crs=crs, nodata=nodata,
                band_names=band_names)

    # -- overview IFD chain (COG pyramids) --------------------------------
    overviews = []
    seen = {ifd_off}
    while next_off and next_off not in seen and len(overviews) < 32:
        seen.add(next_off)
        otags, next_off = _read_ifd(path, bo, big, next_off)
        if "width" not in otags or "height" not in otags:
            continue
        sub = otags.get("subfile_type", 0)
        sub = int(sub[0] if isinstance(sub, tuple) else sub)
        if not (sub & 1):  # not a reduced-resolution subfile
            continue
        om = _ifd_dims(otags, path)
        om["bo"] = bo
        # overview IFDs carry no geo tags: derive the affine by the
        # decimation factor (GDAL semantics — overview pixel k covers
        # factor×factor full-res pixels anchored at the same origin)
        sx = meta["w"] / om["w"]
        sy = meta["h"] / om["h"]
        a, b, c, d, e, f = affine
        om.update(affine=(a * sx, b * sy, c, d * sx, e * sy, f),
                  crs=crs, nodata=nodata, band_names=band_names)
        overviews.append(om)
    overviews.sort(key=lambda m: -m["w"])  # finest → coarsest
    meta["overviews"] = overviews
    return meta


def meta_pixel_area_m2(meta: dict) -> float:
    """Mean full-resolution pixel area from header metadata alone
    (centre-latitude cos correction for geographic rasters) — lets the
    CLI resolve auto-modes without decoding a single pixel."""
    a, b, c, d, e, f = meta["affine"]
    det = abs(a * e - b * d)
    if meta["crs"] == "EPSG:4326":
        lat_c = f + e * meta["h"] / 2.0
        return det * (111_195.0 ** 2) * max(0.01, np.cos(np.radians(lat_c)))
    return det


def pick_overview_level(meta: dict, cell_area_m2: float) -> int:
    """Coarsest pyramid level (0 = full resolution) whose mean pixel
    area is still ≤ the target cell area — reading it loses nothing at
    the output resolution while cutting bytes by the decimation².  The
    mean pixel area uses the |det affine| of the level (projected CRS:
    ~m² already; geographic: deg² × (111195 m/deg)² equatorial scale —
    conservative: overstates pixel area off-equator, so auto never
    picks a level TOO coarse)."""
    deg2 = 0.0 if meta["crs"] not in ("EPSG:4326",) else 1.0

    def _px_area(m):
        a, b, c, d, e, f = m["affine"]
        det = abs(a * e - b * d)
        return det * (111_195.0 ** 2) if deg2 else det

    level = 0
    for i, om in enumerate(meta.get("overviews") or [], start=1):
        if _px_area(om) <= cell_area_m2:
            level = i
    return level


# --------------------------------------------------------------------------
# per-segment decode (runs inside executors)


def _lzw_decode(buf: bytes) -> bytes:
    """TIFF-flavour LZW: MSB-first codes, 8-bit roots, ClearCode 256,
    EOI 257, early code-width change (libtiff semantics)."""
    out = bytearray()
    table: list[bytes] = []
    prev = b""
    width = 9
    acc = bits = 0
    pos, n = 0, len(buf)

    def _reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = b""

    _reset()
    while pos < n or bits >= width:
        while bits < width and pos < n:
            acc = (acc << 8) | buf[pos]
            pos += 1
            bits += 8
        if bits < width:
            break
        bits -= width
        code = (acc >> bits) & ((1 << width) - 1)
        if code == 256:
            _reset()
            continue
        if code == 257:
            break
        if not prev:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table is one entry
        # behind the encoder's, so it bumps at 2^w - 2 (libtiff
        # MAXCODE(n)-1 semantics), one code before the naive point
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(buf: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(buf)
    while i < n and len(out) < expected:
        c = buf[i]
        i += 1
        if c < 128:
            out += buf[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += buf[i:i + 1] * (257 - c)
            i += 1
    return bytes(out)


def _decompress(buf: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return buf
    if comp in (8, 32946):
        return zlib.decompress(buf)
    if comp == 50000:
        import pyarrow as pa

        return pa.Codec("zstd").decompress(
            buf, decompressed_size=expected).to_pybytes()
    if comp == 5:
        return _lzw_decode(buf)
    if comp == 32773:
        return _packbits_decode(buf, expected)
    raise NotImplementedError(
        f"TIFF compression {comp} (offline: none/deflate/zstd/LZW/PackBits)")


def _unpredict(raw: bytes, meta: dict, rows: int, row_samples: int
               ) -> np.ndarray:
    """Undo the predictor; return float32 (rows, row_samples) where
    row_samples = width*spp (chunky) or width (one planar band)."""
    bo, bits = meta["bo"], meta["bits"]
    pred = meta["predictor"]
    stride = meta["spp"] if meta["planar"] == 1 else 1
    bps = bits // 8
    dt = _dtype_for(bits, meta["sample_format"], bo)
    if pred == 3:
        # floating-point predictor: per row, bytes are split into
        # big-endian byte planes then byte-wise horizontally differenced
        # with stride = samples/pixel (libtiff fpAcc)
        b = np.frombuffer(raw, dtype=np.uint8).reshape(
            rows, row_samples * bps).copy()
        acc = b.reshape(rows, -1, stride)
        np.cumsum(acc, axis=1, dtype=np.uint8, out=acc)
        planes = b.reshape(rows, bps, row_samples)  # big-end byte first
        words = np.empty((rows, row_samples, bps), dtype=np.uint8)
        for k in range(bps):
            words[:, :, k] = planes[:, k, :]
        flt = words.reshape(rows, row_samples * bps).tobytes()
        arr = np.frombuffer(flt, dtype=np.dtype(f"f{bps}").newbyteorder(">"))
        return arr.reshape(rows, row_samples).astype(np.float32)
    if pred == 2:
        udt = np.dtype(f"u{bps}").newbyteorder(bo)
        a = np.frombuffer(raw, dtype=udt).astype(
            np.dtype(f"u{bps}")).reshape(rows, -1, stride)
        np.cumsum(a, axis=1, dtype=a.dtype, out=a)
        arr = a.reshape(rows, row_samples)
        if dt.kind != "u":
            arr = arr.view(np.dtype(f"{dt.kind}{bps}"))
        return arr.astype(np.float32)
    arr = np.frombuffer(raw, dtype=dt).reshape(rows, row_samples)
    return arr.astype(np.float32)


def _fill_segment(meta: dict, seg_index: int) -> np.ndarray:
    """Implicit-fill window for a GDAL SPARSE segment (offset 0 in
    TileOffsets/StripOffsets = never written): nodata if declared,
    else NaN — shaped exactly like decode_segment's cropped output."""
    w, h, spp = meta["w"], meta["h"], meta["spp"]
    tw, th = meta["tile_w"], meta["tile_h"]
    planar_bands = spp if meta["planar"] == 1 else 1
    if meta["tiled"]:
        across = (w + tw - 1) // tw
        per_plane = across * ((h + th - 1) // th)
        pidx = seg_index % per_plane
        col0, row0 = (pidx % across) * tw, (pidx // across) * th
        rows, cols = min(th, h - row0), min(tw, w - col0)
    else:
        per_plane = (h + th - 1) // th
        row0 = (seg_index % per_plane) * th
        rows, cols = min(th, h - row0), w
    nd = meta.get("nodata")
    fill = np.float32(np.nan if nd is None else nd)
    return np.full((planar_bands, rows, cols), fill, dtype=np.float32)


def decode_segment(meta: dict, seg_index: int, buf: bytes) -> np.ndarray:
    """Decode one strip/tile payload → float32 (bands, seg_h, seg_w),
    cropped to the image bounds (chunky); for planar files the caller
    assembles bands from per-plane segments (this returns (1, h, w))."""
    w, h, spp = meta["w"], meta["h"], meta["spp"]
    tw, th = meta["tile_w"], meta["tile_h"]
    bps = meta["bits"] // 8
    planar_bands = spp if meta["planar"] == 1 else 1
    if meta["compression"] == 7:
        # new-style JPEG (imagery/basemap tiles): the segment is a
        # baseline JPEG stream; shared DQT/DHT tables ride the
        # JPEGTables tag (347) as an abbreviated stream.  Photometric 6
        # = components are YCbCr (convert); 1/2 = keep as coded.
        from raster2dggs_spark.codecs.jpeg import decode_baseline_jpeg

        tbl = meta.get("jpeg_tables")
        img = decode_baseline_jpeg(
            buf, bytes.fromhex(tbl) if tbl else None,
            to_rgb=meta.get("photometric", 1) == 6)
        if meta["tiled"]:
            across = (w + tw - 1) // tw
            per_plane = across * ((h + th - 1) // th)
            pidx = seg_index % per_plane
            col0, row0 = (pidx % across) * tw, (pidx // across) * th
        else:
            per_plane = (h + th - 1) // th
            col0, row0 = 0, (seg_index % per_plane) * th
        arr = img.transpose(2, 0, 1).astype(np.float32)[:, :th, :tw]
        return np.ascontiguousarray(
            arr[:, : max(0, min(arr.shape[1], h - row0)),
                : max(0, min(arr.shape[2], w - col0))])
    if meta["tiled"]:
        across = (w + tw - 1) // tw
        per_plane = across * ((h + th - 1) // th)
        pidx = seg_index % per_plane
        ti, tj = pidx % across, pidx // across
        col0, row0 = ti * tw, tj * th
        rows, row_samples = th, tw * planar_bands
        raw = _decompress(buf, meta["compression"],
                          rows * row_samples * bps)
    else:
        per_plane = (h + th - 1) // th
        sidx = seg_index % per_plane
        col0, row0 = 0, sidx * th
        rows = min(th, h - row0)
        row_samples = tw * planar_bands
        raw = _decompress(buf, meta["compression"],
                          rows * row_samples * bps)
        rows = len(raw) // (row_samples * bps)
    arr = _unpredict(raw, meta, rows, row_samples)
    if meta["planar"] == 1:
        arr = arr.reshape(rows, -1, spp).transpose(2, 0, 1)
    else:
        arr = arr.reshape(1, rows, -1)
    # crop partial edge tiles to the image bounds
    return np.ascontiguousarray(
        arr[:, : max(0, min(rows, h - row0)), : max(0, min(arr.shape[2],
                                                           w - col0))])


# --------------------------------------------------------------------------
# window plan + Spark ingest


def _plan_rows(path: str, level: int = 0) -> list[dict]:
    """Window-plan rows for ONE file (bounded header reads only).
    ``level`` > 0 plans the (level-1)-th overview IFD instead of the
    full-resolution image (clamped to the coarsest available)."""
    full = parse_geotiff(path)
    if level > 0 and full.get("overviews"):
        meta = full["overviews"][min(level, len(full["overviews"])) - 1]
        meta = dict(meta)  # keep the plan row self-contained
    else:
        level = 0
        meta = dict(full)
    meta.pop("overviews", None)
    w, h, spp = meta["w"], meta["h"], meta["spp"]
    tw, th = meta["tile_w"], meta["tile_h"]
    if meta["tiled"]:
        across = (w + tw - 1) // tw
        per_plane = across * ((h + th - 1) // th)
    else:
        across = 1
        per_plane = (h + th - 1) // th
    n_planes = spp if meta["planar"] == 2 else 1
    base = os.path.basename(path)
    rows = []
    for pidx in range(per_plane):
        ti, tj = pidx % across, pidx // across
        col0, row0 = ti * tw, tj * th
        segs = [pidx + p * per_plane for p in range(n_planes)]
        rows.append({
            "image_id": (f"{base}#w{pidx:05d}" if level == 0
                         else f"{base}#o{level}w{pidx:05d}"),
            "path": path,
            "seg_indices": segs,
            "seg_offsets": [int(meta["offsets"][s]) for s in segs],
            "seg_counts": [int(meta["counts"][s]) for s in segs],
            "col_off": col0, "row_off": row0,
            "win_w": min(tw, w - col0), "win_h": min(th, h - row0),
            "meta": meta,
        })
    return rows


def window_plan(paths: list[str], level: int = 0) -> pd.DataFrame:
    """One row per output window (tile/strip footprint).  For chunky
    files a window is one segment; for planar files it is ``spp``
    segments (one per band plane) sharing a footprint.  Driver-side —
    fine up to a few thousand files; beyond that use the distributed
    scan inside :func:`read_geotiff`."""
    rows = []
    for path in paths:
        rows.extend(_plan_rows(path, level))
    return pd.DataFrame(rows)


def scan_geotiffs(spark, paths: list[str], level: int = 0):
    """Distributed header scan: the PATH LIST is parallelized and each
    executor tag-walks its own files (a few KB of range reads per file)
    — at 10^6-file scale the driver never opens a single raster.
    Returns the window-plan DataFrame (meta as JSON string)."""
    import json

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("seg_indices", T.ArrayType(T.IntegerType())),
        T.StructField("seg_offsets", T.ArrayType(T.LongType())),
        T.StructField("seg_counts", T.ArrayType(T.LongType())),
        T.StructField("col_off", T.IntegerType()),
        T.StructField("row_off", T.IntegerType()),
        T.StructField("win_w", T.IntegerType()),
        T.StructField("win_h", T.IntegerType()),
        T.StructField("meta_json", T.StringType()),
    ])
    pp = spark.createDataFrame([(p,) for p in paths], "path string")
    nparts = min(len(paths), spark.sparkContext.defaultParallelism)

    def scan(batches):
        for b in batches:
            rows = []
            for path in b["path"]:
                for r in _plan_rows(path, level):
                    meta = r.pop("meta")
                    r["meta_json"] = json.dumps(meta)
                    rows.append(r)
            if rows:
                yield pd.DataFrame(rows)

    return pp.repartition(nparts).mapInPandas(scan, schema)


def read_geotiff(spark, paths: list[str] | str, fmt: str = "raw",
                 n_partitions: int | None = None, level: int = 0):
    """Read GeoTIFF file(s) into the engine's IMAGE_SCHEMA DataFrame —
    one row per TIFF tile/strip window, payload re-encoded with the
    engine codec, per-window affine, CRS string from the GeoKeys.

    The plan (byte offsets, no pixel data) is parallelized; each
    executor task range-reads its windows' bytes and decodes them.
    """
    import json

    from pyspark.sql import types as T

    from raster2dggs_spark.sources.images import IMAGE_SCHEMA

    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        return spark.createDataFrame([], IMAGE_SCHEMA)
    if len(paths) > 256:
        # many-files path: header scan fans out to executors too
        pdf = scan_geotiffs(spark, paths, level)
        nparts = n_partitions or spark.sparkContext.defaultParallelism
        pdf = pdf.repartition(nparts)
    else:
        plan = window_plan(paths, level)
        if plan.empty:
            return spark.createDataFrame([], IMAGE_SCHEMA)
        plan = plan.assign(meta_json=plan["meta"].map(json.dumps)).drop(
            columns=["meta"])
        plan_schema = T.StructType([
            T.StructField("image_id", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("seg_indices", T.ArrayType(T.IntegerType())),
            T.StructField("seg_offsets", T.ArrayType(T.LongType())),
            T.StructField("seg_counts", T.ArrayType(T.LongType())),
            T.StructField("col_off", T.IntegerType()),
            T.StructField("row_off", T.IntegerType()),
            T.StructField("win_w", T.IntegerType()),
            T.StructField("win_h", T.IntegerType()),
            T.StructField("meta_json", T.StringType()),
        ])
        pdf = spark.createDataFrame(plan, plan_schema)
        nparts = n_partitions or min(
            len(plan), spark.sparkContext.defaultParallelism)
        pdf = pdf.repartition(nparts)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from raster2dggs_spark.codecs import average_hash64, encode_image

        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                meta = json.loads(r.meta_json)
                meta["affine"] = tuple(meta["affine"])
                parts = []
                for si, so, sc in zip(r.seg_indices, r.seg_offsets,
                                      r.seg_counts):
                    if so == 0 or sc == 0:  # GDAL sparse segment
                        parts.append(_fill_segment(meta, int(si)))
                        continue
                    buf = _read_range(r.path, int(so), int(sc))
                    parts.append(decode_segment(meta, int(si), buf))
                arr = parts[0] if len(parts) == 1 else np.concatenate(
                    parts, axis=0)
                a, bb, c, d, e, f = meta["affine"]
                win_affine = (a, bb, a * r.col_off + bb * r.row_off + c,
                              d, e, d * r.col_off + e * r.row_off + f)
                out.append({
                    "image_id": r.image_id,
                    "bytes": encode_image(arr, fmt),
                    "w": int(arr.shape[2]), "h": int(arr.shape[1]),
                    "fmt": fmt,
                    "caption": f"geotiff:{os.path.basename(r.path)}",
                    "phash": int(average_hash64(arr[0])),
                    "affine_a": win_affine[0], "affine_b": win_affine[1],
                    "affine_c": win_affine[2], "affine_d": win_affine[3],
                    "affine_e": win_affine[4], "affine_f": win_affine[5],
                    "crs": meta["crs"],
                    "nodata": meta["nodata"],
                    "bands": int(arr.shape[0]),
                    "band_names": meta.get("band_names"),
                })
            if out:
                yield pd.DataFrame(out)

    return pdf.mapInPandas(decode, IMAGE_SCHEMA)


def read_geotiff_local(path: str, level: int = 0) -> np.ndarray:
    """Driver-side full decode → (bands, h, w) float32 (tests/oracles)."""
    meta = parse_geotiff(path)
    if level > 0:
        meta = meta["overviews"][min(level, len(meta["overviews"])) - 1]
    plan = window_plan([path], level)
    full = np.full((meta["spp"] if meta["planar"] == 1 else meta["spp"],
                    meta["h"], meta["w"]), np.nan, dtype=np.float32)
    for r in plan.itertuples(index=False):
        parts = []
        for si, so, sc in zip(r.seg_indices, r.seg_offsets, r.seg_counts):
            if so == 0 or sc == 0:  # GDAL sparse segment
                parts.append(_fill_segment(meta, int(si)))
                continue
            parts.append(decode_segment(meta, int(si),
                                        _read_range(path, int(so), int(sc))))
        arr = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
        full[:, r.row_off:r.row_off + arr.shape[1],
             r.col_off:r.col_off + arr.shape[2]] = arr
    return full


# --------------------------------------------------------------------------
# GeoTIFF writer (export / round-trip / bench-corpus generation)


def _geokeys_for_crs(crs: str) -> tuple[tuple, tuple]:
    """(GeoKeyDirectory shorts, GeoDoubleParams doubles) for ``crs``.
    Sinusoidal CRSs (no EPSG code) get the user-defined form GDAL
    writes for MODIS: ProjectedCSType=32767 + CT_Sinusoidal(24) with
    the parameters in GeoDoubleParams."""
    from raster2dggs_spark.geo.crs import sinusoidal_for_crs

    sn = sinusoidal_for_crs(crs)
    if sn is not None:
        doubles = (sn.R, sn.lon0, sn.x0, sn.y0)
        return ((1, 1, 0, 6,
                 1024, 0, 1, 1,          # projected model
                 2057, 34736, 1, 0,      # GeogSemiMajorAxis = R
                 3072, 0, 1, 32767,      # user-defined PCS
                 3075, 0, 1, 24,         # CT_Sinusoidal
                 3080, 34736, 1, 1,      # NatOriginLong = lon0
                 3082, 34736, 1, 2,      # FalseEasting
                 3083, 34736, 1, 3),     # FalseNorthing
                doubles)
    code = _epsg_code_of(crs)
    if code == 4326:
        # GTModelTypeGeoKey=2 (geographic), GeographicTypeGeoKey=4326
        return (1, 1, 0, 2, 1024, 0, 1, 2, 2048, 0, 1, 4326), ()
    # projected: GTModelType=1, ProjectedCSType=code
    return (1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, code), ()


def _epsg_code_of(crs: str) -> int:
    try:
        return int(str(crs).upper().replace("EPSG:", ""))
    except ValueError:
        raise ValueError(f"write_geotiff needs an EPSG crs, got {crs!r}")


def downsample_average(arr: np.ndarray, factor: int) -> np.ndarray:
    """Block-mean decimation — GDAL's 'average' overview resampling,
    with exact partial-block means at the right/bottom edges.  Also the
    oracle for the overview-decode bit-exactness test."""
    _, h, w = arr.shape
    idx_r = np.arange(0, h, factor)
    idx_c = np.arange(0, w, factor)
    s = np.add.reduceat(
        np.add.reduceat(arr.astype(np.float64), idx_r, axis=1),
        idx_c, axis=2)
    nr = np.minimum(factor, h - idx_r).astype(np.float64)[None, :, None]
    nc = np.minimum(factor, w - idx_c).astype(np.float64)[None, None, :]
    return (s / (nr * nc)).astype(np.float32)


def _gdal_metadata_xml(band_names: list) -> bytes:
    items = []
    for k, nm in enumerate(band_names):
        if nm is None:
            continue
        for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                        ('"', "&quot;")):
            nm = nm.replace(ch, ent)
        items.append(f'<Item name="DESCRIPTION" sample="{k}" '
                     f'role="description">{nm}</Item>')
    xml = "<GDALMetadata>\n" + "\n".join(items) + "\n</GDALMetadata>\n"
    return xml.encode("ascii", "replace") + b"\x00"


def _encode_level(arr: np.ndarray, tw: int, th: int, comp_code: int,
                  predictor: int, codec, jpeg_quality: int = 90,
                  jpeg_subsample: bool = False) -> list[bytes]:
    """Tile payloads for one resolution level (chunky float32; JPEG
    tiles are 8-bit with edge-replicate padding to the tile size)."""
    bands, h, w = arr.shape
    segs = []
    if comp_code == 7:
        from raster2dggs_spark.codecs.jpeg import encode_baseline_jpeg

        u8 = np.clip(np.round(arr), 0, 255).astype(np.uint8)
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                src = u8[:, r0:r0 + th, c0:c0 + tw].transpose(1, 2, 0)
                block = np.pad(
                    src, ((0, th - src.shape[0]), (0, tw - src.shape[1]),
                          (0, 0)), mode="edge")
                segs.append(encode_baseline_jpeg(
                    block if bands == 3 else block[:, :, 0],
                    quality=jpeg_quality, subsample=jpeg_subsample))
        return segs
    for r0 in range(0, h, th):
        for c0 in range(0, w, tw):
            block = np.zeros((th, tw, bands), dtype=np.float32)
            src = arr[:, r0:r0 + th, c0:c0 + tw].transpose(1, 2, 0)
            block[: src.shape[0], : src.shape[1]] = src
            flat = block.reshape(th, tw * bands)
            if predictor == 2:
                u = flat.view(np.uint32).reshape(th, tw, bands).copy()
                u[:, 1:, :] -= u[:, :-1, :]
                raw = u.tobytes()
            else:
                raw = flat.tobytes()
            if comp_code == 1:
                segs.append(raw)
            elif comp_code == 8:
                segs.append(zlib.compress(raw, 6))
            else:
                segs.append(codec.compress(raw).to_pybytes())
    return segs


def _serialize_ifd(tags: list, segs: list[bytes], base: int) -> bytearray:
    """One classic-TIFF IFD block at absolute offset ``base``, laid out
    [count][entries][next=0][oversized values][seg arrays][segments].
    The caller patches the next-IFD pointer (at offset 2+12*n within
    the block) once the following block's base is known."""
    fmt_of = {3: "H", 4: "I", 12: "d", 2: "s"}
    n_all = len(tags) + 2
    ifd_size = 2 + 12 * n_all + 4
    extra = bytearray()
    entry_vals = []
    for tag, typ, cnt, val in tags:
        if typ in (2, 7):  # ASCII / UNDEFINED: raw bytes
            data = val
        else:
            vv = val if isinstance(val, list) else [val]
            data = struct.pack("<" + str(cnt) + fmt_of[typ], *vv)
        if len(data) <= 4:
            entry_vals.append((tag, typ, cnt, data.ljust(4, b"\x00")))
        else:
            entry_vals.append((tag, typ, cnt, ("off", len(extra))))
            extra += data
    n_seg = len(segs)
    extra_base = base + ifd_size
    seg_meta = 0 if n_seg == 1 else 2 * 4 * n_seg
    seg_base = extra_base + len(extra) + seg_meta
    offs, cur = [], seg_base
    for sg in segs:
        offs.append(cur)
        cur += len(sg)
    if n_seg == 1:
        entry_vals.append((324, 4, 1, struct.pack("<I", offs[0])))
        entry_vals.append((325, 4, 1, struct.pack("<I", len(segs[0]))))
        seg_arrays = b""
    else:
        seg_arrays = struct.pack("<" + str(n_seg) + "I", *offs)
        seg_arrays += struct.pack("<" + str(n_seg) + "I",
                                  *[len(sg) for sg in segs])
        entry_vals.append((324, 4, n_seg, ("seg", 0)))
        entry_vals.append((325, 4, n_seg, ("seg", 4 * n_seg)))
    entry_vals.sort(key=lambda t: t[0])
    buf = bytearray()
    buf += struct.pack("<H", n_all)
    for tag, typ, cnt, val in entry_vals:
        buf += struct.pack("<HHI", tag, typ, cnt)
        if isinstance(val, tuple) and val[0] == "off":
            buf += struct.pack("<I", extra_base + val[1])
        elif isinstance(val, tuple) and val[0] == "seg":
            buf += struct.pack("<I", extra_base + len(extra) + val[1])
        else:
            buf += val
    buf += struct.pack("<I", 0)  # next-IFD pointer — patched by caller
    buf += extra + seg_arrays
    for sg in segs:
        buf += sg
    return buf


def write_geotiff(path: str, arr: np.ndarray, affine, crs: str = "EPSG:4326",
                  nodata: float | None = None, compression: str = "zstd",
                  tile: tuple[int, int] = (256, 256),
                  predictor: int = 2,
                  band_names: list | None = None,
                  overview_levels: tuple[int, ...] = (),
                  jpeg_quality: int = 90,
                  jpeg_subsample: bool = False,
                  jpeg_tables_separate: bool = True) -> None:
    """Write a (bands, h, w) float32 array as a tiled GeoTIFF (chunky,
    little-endian, classic TIFF) — the export twin of the reader, and
    the corpus generator for the ingest bench.  ``compression``:
    zstd | deflate | none; ``predictor`` 1 or 2 (32-bit horizontal
    word differencing, the GDAL float default this reader decodes
    bit-exactly on se-island.tiff).  ``band_names`` become GDAL
    band descriptions (GDAL_METADATA tag 42112, role="description" —
    the reference's ``src.descriptions``).  ``overview_levels`` (e.g.
    ``(2, 4)``) append reduced-resolution IFDs (NewSubfileType=1,
    block-average resampling) — the COG pyramid shape the reader's
    ``meta["overviews"]`` exposes."""
    import pyarrow as pa

    arr = np.ascontiguousarray(arr, dtype=np.float32)
    bands, h, w = arr.shape
    tw, th = tile
    comp_code = {"none": 1, "deflate": 8, "zstd": 50000,
                 "jpeg": 7}[compression]
    codec = pa.Codec("zstd") if compression == "zstd" else None
    jpeg = comp_code == 7
    if jpeg:
        if bands not in (1, 3):
            raise ValueError("jpeg compression: 1 or 3 bands (got "
                             f"{bands})")
        predictor = 1  # meaningless for JPEG

    a, b, c, d, e, f = affine
    if abs(b) > 0 or abs(d) > 0:
        raise ValueError("write_geotiff: north-up affines only (b=d=0)")
    gk, gk_doubles = _geokeys_for_crs(crs)

    levels = [arr] + [downsample_average(arr, fct)
                      for fct in sorted(overview_levels)]
    blocks: list[bytearray] = []
    bases: list[int] = []
    cur = 8  # classic header
    for li, la in enumerate(levels):
        lb, lh, lw = la.shape
        tags = [
            (256, 3, 1, lw), (257, 3, 1, lh),
            (258, 3, lb, [8 if jpeg else 32] * lb),
            (259, 3, 1, comp_code),
            (262, 3, 1, (6 if lb == 3 else 1) if jpeg else 1),
            (277, 3, 1, lb), (284, 3, 1, 1),
            (317, 3, 1, predictor),
            (322, 3, 1, tw), (323, 3, 1, th),
            (339, 3, lb, [1 if jpeg else 3] * lb),
        ]
        if li == 0:
            tags += [
                (33550, 12, 3, [abs(a), abs(e), 0.0]),
                (33922, 12, 6, [0.0, 0.0, 0.0, c, f, 0.0]),
                (34735, 3, len(gk), list(gk)),
            ]
            if gk_doubles:
                tags.append((34736, 12, len(gk_doubles), list(gk_doubles)))
            if nodata is not None:
                nd = "nan" if np.isnan(nodata) else repr(float(nodata))
                tags.append((42113, 2, len(nd) + 1, nd.encode() + b"\x00"))
            if band_names is not None:
                xml = _gdal_metadata_xml(band_names)
                tags.append((42112, 2, len(xml), xml))
        else:
            tags.append((254, 4, 1, 1))  # reduced-resolution subfile
        segs = _encode_level(la, tw, th, comp_code, predictor, codec,
                             jpeg_quality, jpeg_subsample)
        if jpeg and jpeg_tables_separate:
            # GDAL's form: shared DQT/DHT once in JPEGTables (tag 347),
            # per-tile streams abbreviated (all tiles share tables —
            # same encoder parameters per level by construction)
            from raster2dggs_spark.codecs.jpeg import split_jpeg_tables

            split = [split_jpeg_tables(sg) for sg in segs]
            jtables = split[0][0]
            segs = [ab for _, ab in split]
            tags.append((347, 7, len(jtables), jtables))
        blk = _serialize_ifd(tags, segs, cur)
        bases.append(cur)
        blocks.append(blk)
        cur += len(blk)
    # chain the IFDs: patch each block's next pointer
    for i in range(len(blocks) - 1):
        n_all, = struct.unpack_from("<H", blocks[i], 0)
        struct.pack_into("<I", blocks[i], 2 + 12 * n_all, bases[i + 1])
    with open(path, "wb") as fh:
        fh.write(b"II" + struct.pack("<HI", 42, 8))
        for blk in blocks:
            fh.write(bytes(blk))
