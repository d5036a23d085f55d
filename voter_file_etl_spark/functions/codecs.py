"""Dependency-free media codecs for the multimodal operators.

The container has no PIL/soundfile, so the decode step of the
multimodal suite handles the uncompressed formats that need no
external library:

- PPM  (netpbm P6 binary / P3 ascii) — RGB, maxval <= 255
- BMP  (Windows BITMAPINFOHEADER, BI_RGB uncompressed, 24/32 bpp,
        bottom-up or top-down, 4-byte row padding)
- WAV  (RIFF PCM, 8-bit unsigned / 16-bit signed, any channel count)

These run inside the Arrow-batched ``mapInPandas`` loops in
operators/multimodal.py — per-payload Python is unavoidable for
decode (there is no JVM codec expression), but the batching, schema
and partitioning around it are the scale-relevant parts.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class DecodedImage:
    width: int
    height: int
    channels: int
    format: str
    # H x W x C uint8
    pixels: np.ndarray


@dataclass(frozen=True)
class DecodedAudio:
    sample_rate: int
    n_channels: int
    bits: int
    format: str
    # frames x channels, int32 (centered: unsigned 8-bit is shifted by -128)
    samples: np.ndarray


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace/comment-delimited header tokens and the
    offset of the byte right after the single whitespace that ends the
    last one (where P6 binary data starts)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("ppm: truncated header")
        toks.append(payload[i:j])
        i = j
    return toks, i + 1  # skip exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> DecodedImage:
    magic = payload[:2]
    if magic not in (b"P6", b"P3"):
        raise ValueError(f"ppm: bad magic {magic!r}")
    toks, data_off = _ppm_tokens(payload, 4)
    width, height, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"ppm: unsupported maxval {maxval}")
    n = width * height * 3
    if magic == b"P6":
        raw = payload[data_off : data_off + n]
        if len(raw) != n:
            raise ValueError("ppm: truncated pixel data")
        px = np.frombuffer(raw, dtype=np.uint8)
    else:
        vals = payload[data_off - 1 :].split()
        if len(vals) < n:
            raise ValueError("ppm: truncated ascii pixel data")
        px = np.array([int(v) for v in vals[:n]], dtype=np.uint8)
    return DecodedImage(width, height, 3, "ppm", px.reshape(height, width, 3))


def decode_bmp(payload: bytes) -> DecodedImage:
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"bmp: only BI_RGB supported, got {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"bmp: only 24/32 bpp supported, got {bpp}")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    need = data_off + row_stride * height
    if len(payload) < need:
        raise ValueError("bmp: truncated pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_off
    ).reshape(height, row_stride)
    px = rows[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BGR(A) -> RGB
    px = px[:, :, :3][:, :, ::-1]
    return DecodedImage(width, height, 3, "bmp", np.ascontiguousarray(px))


def decode_image_bytes(payload: bytes) -> DecodedImage:
    payload = bytes(payload)
    if payload[:2] in (b"P6", b"P3"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError(f"unsupported image format (magic {payload[:2]!r})")


def decode_wav_bytes(payload: bytes) -> DecodedAudio:
    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE header")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        chunk_id = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if chunk_id == b"fmt ":
            fmt = body
        elif chunk_id == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, n_channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1:
        raise ValueError(f"wav: only PCM supported, got fmt {audio_fmt}")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(
            data[: len(data) & ~1], dtype="<i2"
        ).astype(np.int32)
    else:
        raise ValueError(f"wav: only 8/16-bit PCM supported, got {bits}")
    frames = len(samples) // n_channels
    samples = samples[: frames * n_channels].reshape(frames, n_channels)
    return DecodedAudio(sample_rate, n_channels, bits, "wav-pcm", samples)


# ---------------------------------------------------------------------------
# "VID0" — a minimal uncompressed video container for the frame-
# sampling operators: 4-byte magic, 1-byte frame count, then raw
# fixed-size frames back to back. Stands in for MP4/AVI the way PPM
# stands in for JPEG (no video lib in this container); the chunk walk
# and per-frame slicing are the real plumbing.
# ---------------------------------------------------------------------------
_VID_MAGIC = b"VID0"


def parse_video_bytes(payload: bytes, frame_bytes: int = 48) -> list[np.ndarray]:
    """Split a VID0 payload into its frames (uint8 arrays of
    ``frame_bytes`` each). Validates magic, count, and total length."""
    if payload[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 payload")
    n = payload[4]
    data = payload[5:]
    if len(data) != n * frame_bytes:
        raise ValueError(
            f"VID0 length mismatch: {len(data)} bytes for {n} frames "
            f"of {frame_bytes}"
        )
    return [
        np.frombuffer(data[k * frame_bytes : (k + 1) * frame_bytes], dtype=np.uint8)
        for k in range(n)
    ]
