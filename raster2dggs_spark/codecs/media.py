"""Deterministic fake video/audio containers.

Real codec libraries (ffmpeg/PIL/soundfile) are unavailable offline, so
these containers make the multimodal PLUMBING real — schema, batch
shape, frame seeking, window math — with byte-exact round-trips.  The
decode step for external formats (mp4/wav/...) stays gated behind
NotImplementedError in operators/multimodal.py; swapping these codecs
for real ones changes only the two decode functions below.

Video ``rvid``: b"RVID" | u32 T | u32 H | u32 W | zlib(float32 frames,
C-order (T, H, W)).

Audio ``rpcm``: b"RPCM" | u32 n_samples | u32 rate | zlib(int16 LE).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

VIDEO_MAGIC = b"RVID"
AUDIO_MAGIC = b"RPCM"


def encode_video(frames: np.ndarray) -> bytes:
    """(T, H, W) float32 -> rvid bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    t, h, w = frames.shape
    return (VIDEO_MAGIC + struct.pack("<III", t, h, w)
            + zlib.compress(frames.tobytes(), 6))


def video_meta(buf: bytes) -> tuple[int, int, int]:
    """(T, H, W) from the header alone — no decompression (the seek
    planning step: sampling indices need only the frame count)."""
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not an rvid payload")
    return struct.unpack("<III", buf[4:16])


def decode_video(buf: bytes, frame_indices=None) -> np.ndarray:
    """rvid bytes -> (T', H, W) float32.  ``frame_indices`` selects a
    subset after the (whole-payload) decompress — a real container would
    seek to keyframes instead; the operator contract is identical."""
    t, h, w = video_meta(buf)
    arr = np.frombuffer(zlib.decompress(buf[16:]), dtype=np.float32)
    arr = arr.reshape(t, h, w)
    if frame_indices is not None:
        arr = arr[np.asarray(frame_indices, dtype=np.int64)]
    return arr


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
