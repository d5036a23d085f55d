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
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
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


# ---------------------------------------------------------------------------
# PNG — a REAL compressed codec with no external dependency: the
# DEFLATE stream is stdlib zlib, so unlike JPEG/FLAC (which need
# PIL/soundfile) PNG decode can be complete here. Grayscale and RGB,
# 8-bit, non-interlaced; all five scanline filters (None/Sub/Up/
# Average/Paeth) are implemented, and chunk CRCs are verified. The
# encoder emits filter-0 rows (the decoder's filter paths are
# exercised by unit tests with hand-filtered rows).
# ---------------------------------------------------------------------------
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_png_gray8(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit grayscale PNG: IHDR + one zlib IDAT of
    filter-0-prefixed scanlines + IEND."""
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> DecodedImage:
    if payload[:8] != _PNG_SIG:
        raise ValueError("png: bad signature")
    i = 8
    ihdr = None
    idat = b""
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    width, height, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("png: only 8-bit non-interlaced supported")
    channels = {0: 1, 2: 3}.get(ctype_n)
    if channels is None:
        raise ValueError(f"png: unsupported color type {ctype_n}")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("png: scanline length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + int(prev[x])) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return DecodedImage(
        width=width,
        height=height,
        channels=channels,
        format="png",
        pixels=out.reshape(height, width, channels),
    )
