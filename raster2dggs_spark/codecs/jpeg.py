"""Baseline JPEG (ITU-T T.81) codec in pure NumPy — no libjpeg/PIL.

Supports what TIFF compression 7 ("new-style JPEG", the imagery/basemap
tile family the reference reads via rasterio/libtiff) actually uses:
baseline sequential DCT, 8-bit, Huffman, 4:4:4 and 4:2:0 chroma
subsampling, restart intervals, and abbreviated streams whose DQT/DHT
tables arrive separately (the TIFF ``JPEGTables`` tag 347).

Decoder design: the entropy scan is a tight Python loop over the
bitstream (Huffman is inherently serial), but everything after symbol
decode — dequantization, dezigzag, the 2-D IDCT over all blocks, chroma
upsampling, YCbCr→RGB — is batched NumPy (one einsum over (nblocks, 8, 8)).
At the engine level each TIFF tile decodes independently inside
executors, so throughput scales with cores like every other codec here.

Encoder: quality-scaled Annex-K quantization tables, the Annex-K
standard Huffman tables, level-shift + batched forward DCT, zigzag
run-length coding.  It exists for the writer sink and as the round-trip
half of the test battery (the decoder is additionally pinned against a
hand-assembled bitstream with a closed-form IDCT oracle, independent of
the encoder).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (zigzag order
# is NOT used here — these are in natural row-major order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# 8-point DCT-II basis matrix: D[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def idct2_blocks(coefs: np.ndarray) -> np.ndarray:
    """Batched 2-D type-III DCT over (n, 8, 8) coefficient blocks."""
    return np.einsum("ux,nuv,vy->nxy", _D, coefs, _D, optimize=True)


def dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """Batched 2-D type-II DCT over (n, 8, 8) pixel blocks."""
    return np.einsum("ux,nxy,vy->nuv", _D, blocks, _D, optimize=True)


# --------------------------------------------------------------------------
# Huffman table machinery (canonical codes from (bits, vals))


def _build_decode_table(bits: list[int], vals: list[int]):
    """16-bit peek LUT: every left-aligned 16-bit window maps directly
    to (symbol, code length) — one list index per Huffman symbol
    instead of a bit-by-bit walk (the classic libjpeg fast path; plain
    Python lists beat numpy for scalar lookups)."""
    lut_sym = [0] * 65536
    lut_len = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            sym = vals[k]
            lut_sym[lo:hi] = [sym] * (hi - lo)
            lut_len[lo:hi] = [ln] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first entropy-coded-segment reader with 0xFF00 unstuffing.
    Restart markers (FFD0-FFD7) terminate the current run; ``resync``
    skips one and resets."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad (spec: decoder may pad past EOI)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: pad until resync() consumes it
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:  # EOI or next marker: pad
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def resync(self):
        """Byte-align and skip the restart marker at the current
        position (called at restart intervals)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1

    def decode_symbol(self, table) -> int:
        lut_sym, lut_len = table
        v = self.peek16()
        ln = lut_len[v]
        if ln == 0:
            raise ValueError("corrupt JPEG: invalid Huffman code")
        self.nbits -= ln
        return lut_sym[v]


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


# --------------------------------------------------------------------------
# decoder


def _parse_segments(data: bytes, state: dict):
    """Walk marker segments, filling quant/huff/frame/scan state; returns
    the offset just past SOS (entropy data start), or None if no SOS."""
    pos = 0
    n = len(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            return None
        seglen, = struct.unpack(">H", data[pos + 2: pos + 4])
        seg = data[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    q = np.frombuffer(seg[i:i + 128],
                                      dtype=">u2").astype(np.int64)
                    i += 128
                state["qt"][tq] = q.astype(np.int64)[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1: i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17: i + 17 + nv])
                state["huff"][(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF,
                              "tq": tq})
            state["frame"] = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported")
        elif marker == 0xDD:  # DRI
            state["dri"], = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c: 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            state["scan"] = sel
            return pos + 2 + seglen
        pos += 2 + seglen
    return None


def decode_baseline_jpeg(data: bytes, tables: bytes | None = None,
                         to_rgb: bool = True) -> np.ndarray:
    """Decode a baseline JPEG stream → (h, w, ncomp) uint8.

    ``tables``: an abbreviated table-only stream (TIFF JPEGTables tag
    347) whose DQT/DHT/DRI definitions seed the decoder state before the
    image stream is parsed — T.81 abbreviated-format semantics.

    ``to_rgb``: apply the JFIF YCbCr→RGB transform when the frame has 3
    components (TIFF photometric 6); pass False for photometric 2
    (components already RGB)."""
    state = {"qt": {}, "huff": {}, "dri": 0, "frame": None, "scan": None}
    if tables:
        _parse_segments(tables, state)
    entro = _parse_segments(data, state)
    if state["frame"] is None or state["scan"] is None or entro is None:
        raise ValueError("JPEG stream missing SOF0/SOS")
    frame = state["frame"]
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient stores, (blocks_y, blocks_x, 64)
    stores = []
    for c in comps:
        bx, by = mcux * c["h"], mcuy * c["v"]
        stores.append(np.zeros((by, bx, 64), dtype=np.int64))

    reader = _BitReader(data, entro)
    dc_pred = [0] * len(comps)
    dri = state["dri"]
    mcu_count = 0
    blk = np.zeros(64, dtype=np.int64)
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.resync()
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                tdc, tac = state["scan"][c["id"]]
                dct = state["huff"][(0, tdc)]
                act = state["huff"][(1, tac)]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        blk[:] = 0
                        s = reader.decode_symbol(dct)
                        diff = _extend(reader.receive(s), s)
                        dc_pred[ci] += diff
                        blk[0] = dc_pred[ci]
                        kk = 1
                        while kk < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("corrupt JPEG: AC overrun")
                            blk[kk] = _extend(reader.receive(s), s)
                            kk += 1
                        stores[ci][my * c["v"] + v,
                                   mx * c["h"] + u] = blk
            mcu_count += 1

    # batched dequantize → dezigzag → IDCT → plane assembly
    planes = []
    for ci, c in enumerate(comps):
        by, bx, _ = stores[ci].shape
        q = state["qt"][c["tq"]].reshape(64)[ZIGZAG]  # zigzag-order qt
        coef = (stores[ci].reshape(-1, 64) * q)[:, UNZIGZAG].reshape(
            -1, 8, 8).astype(np.float64)
        pix = idct2_blocks(coef) + 128.0
        plane = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8)
        # upsample subsampled components to full frame resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    img = np.stack(planes, axis=-1)
    if to_rgb and img.shape[-1] == 3:
        y, cb, cr = img[..., 0], img[..., 1] - 128.0, img[..., 2] - 128.0
        img = np.stack([y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], axis=-1)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * s + 50) // 100, 1, 255)


def _encode_block(bw: _BitWriter, coef_z: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Entropy-code one zigzag-ordered quantized block; returns its DC."""
    dc = int(coef_z[0])
    diff = dc - pred
    mag = abs(diff)
    s = int(mag).bit_length()
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(coef_z[1:])[0]
    last_nz = (nz[-1] + 1) if nz.size else 0
    for kk in range(1, last_nz + 1):
        v = int(coef_z[kk])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    """Edge-replicate pad to (H, W)."""
    h, w = plane.shape
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a self-contained JPEG stream into (tables, abbreviated):
    the TIFF JPEGTables (tag 347) form — tables = SOI + DQT/DHT/DRI
    segments + EOI; abbreviated = the stream with those segments
    removed.  Inverse of what the decoder's ``tables=`` merge does."""
    tables = bytearray(b"\xff\xd8")
    abbrev = bytearray(b"\xff\xd8")
    pos = 2
    n = len(stream)
    while pos + 2 <= n:
        marker = stream[pos + 1]
        if stream[pos] != 0xFF:
            raise ValueError("malformed JPEG stream")
        if marker == 0xD9:
            break
        if marker == 0xDA:  # SOS: header + the rest of the entropy data
            abbrev += stream[pos:]
            tables += b"\xff\xd9"
            return bytes(tables), bytes(abbrev)
        seglen, = struct.unpack(">H", stream[pos + 2: pos + 4])
        seg = stream[pos: pos + 2 + seglen]
        if marker in (0xDB, 0xC4, 0xDD):
            tables += seg
        else:
            abbrev += seg
        pos += 2 + seglen
    raise ValueError("JPEG stream missing SOS")


def encode_baseline_jpeg(img: np.ndarray, quality: int = 90,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 → baseline JPEG
    bytes (standard Annex-K Huffman tables, quality-scaled Annex-K
    quantization).  ``subsample=True`` writes 4:2:0 (2×2 mean chroma),
    else 4:4:4.  ``restart_interval`` N > 0 emits RSTn markers every N
    MCUs (DC predictors reset, byte-aligned)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_baseline_jpeg: 1 or 3 components")
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [f[..., 0]]

    qly = _quality_scale(QT_LUMA, quality).reshape(8, 8)
    qlc = _quality_scale(QT_CHROMA, quality).reshape(8, 8)
    sub = 2 if (subsample and nc == 3) else 1
    hmax = vmax = sub if nc == 3 else 1
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    comp_cfg = []
    coef_stores = []
    for ci, p in enumerate(planes):
        if ci == 0:
            ch, cv, qt = hmax, vmax, qly
            pp = _pad_to(p, mcuy * vmax * 8, mcux * hmax * 8)
        else:
            ch, cv, qt = 1, 1, qlc
            if sub == 2:
                ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
                p2 = _pad_to(p, ph, pw)
                p = (p2[0::2, 0::2] + p2[0::2, 1::2] + p2[1::2, 0::2]
                     + p2[1::2, 1::2]) / 4.0
            pp = _pad_to(p, mcuy * 8, mcux * 8)
        H, W = pp.shape
        blocks = pp.reshape(H // 8, 8, W // 8, 8).transpose(
            0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        coef = dct2_blocks(blocks)
        qc = np.round(coef / qt[None, :, :]).astype(np.int64)
        qz = qc.reshape(-1, 64)[:, ZIGZAG].reshape(H // 8, W // 8, 64)
        comp_cfg.append((ch, cv, 0 if ci == 0 else 1))
        coef_stores.append(qz)

    # -- headers ----------------------------------------------------------
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(qly.reshape(64)[ZIGZAG]
                                    .astype(np.uint8)))
    if nc == 3:
        seg(0xDB, bytes([0x01]) + bytes(qlc.reshape(64)[ZIGZAG]
                                        .astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (ch, cv, tq) in enumerate(comp_cfg):
        sof += bytes([ci + 1, (ch << 4) | cv, tq])
    seg(0xC0, sof)
    for tc, th, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        if nc == 1 and th == 1:
            continue
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    # -- entropy scan -----------------------------------------------------
    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * nc
            mcu_count += 1
            for ci, (ch, cv, _tq) in enumerate(comp_cfg):
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for v in range(cv):
                    for u in range(ch):
                        z = coef_stores[ci][my * cv + v, mx * ch + u]
                        pred[ci] = _encode_block(bw, z, pred[ci], dct, act)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
