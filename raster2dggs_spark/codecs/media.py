"""Deterministic fake video/audio containers.

Real codec libraries (ffmpeg/PIL/soundfile) are unavailable offline, so
these containers make the multimodal PLUMBING real — schema, batch
shape, frame seeking, window math — with byte-exact round-trips.  The
decode step for external formats (mp4/wav/...) stays gated behind
NotImplementedError in operators/multimodal.py; swapping these codecs
for real ones changes only the two decode functions below.

Video ``rvid``: b"RVID" | u32 T | u32 H | u32 W |
u32 offsets[T+1] (byte offsets into the frame region) |
concat(zlib(float32 frame_i)).  Frames are compressed INDIVIDUALLY with
an offset index, so decoding k sampled frames touches only those k
compressed spans — the seek property a real keyframe container gives,
without which frame sampling a 600-frame clip decompresses all 600.

Audio ``rpcm``: b"RPCM" | u32 n_samples | u32 rate | zlib(int16 LE).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

VIDEO_MAGIC = b"RVID"
AUDIO_MAGIC = b"RPCM"


def encode_video(frames: np.ndarray) -> bytes:
    """(T, H, W) float32 -> rvid bytes (per-frame compression + index)."""
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    t, h, w = frames.shape
    spans = [zlib.compress(frames[i].tobytes(), 6) for i in range(t)]
    offs = np.zeros(t + 1, dtype="<u4")
    np.cumsum([len(s) for s in spans], out=offs[1:])
    return (VIDEO_MAGIC + struct.pack("<III", t, h, w)
            + offs.tobytes() + b"".join(spans))


def video_meta(buf: bytes) -> tuple[int, int, int]:
    """(T, H, W) from the header alone — no decompression (the seek
    planning step: sampling indices need only the frame count)."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not an rvid payload")
    return struct.unpack("<III", buf[4:16])


def decode_video(buf: bytes, frame_indices=None) -> np.ndarray:
    """rvid bytes -> (T', H, W) float32.  ``frame_indices`` seeks via
    the offset index and decompresses ONLY the selected frames."""
    t, h, w = video_meta(buf)
    offs = np.frombuffer(buf, dtype="<u4", count=t + 1, offset=16)
    base = 16 + 4 * (t + 1)
    idx = (np.arange(t, dtype=np.int64) if frame_indices is None
           else np.asarray(frame_indices, dtype=np.int64))
    out = np.empty((idx.shape[0], h, w), dtype=np.float32)
    for k, i in enumerate(idx.tolist()):
        span = buf[base + int(offs[i]): base + int(offs[i + 1])]
        out[k] = np.frombuffer(zlib.decompress(span),
                               dtype=np.float32).reshape(h, w)
    return out


def encode_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono samples -> rpcm bytes."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    return (AUDIO_MAGIC + struct.pack("<II", samples.shape[0], int(rate))
            + zlib.compress(samples.tobytes(), 6))


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """rpcm bytes -> (int16 samples, rate)."""
    if buf[:4] != AUDIO_MAGIC:
        raise ValueError("not an rpcm payload")
    n, rate = struct.unpack("<II", buf[4:12])
    samples = np.frombuffer(zlib.decompress(buf[12:]), dtype="<i2")
    if samples.shape[0] != n:
        raise ValueError("rpcm length mismatch")
    return samples, rate
