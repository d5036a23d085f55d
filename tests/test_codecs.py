"""Unit tests for the dependency-free media codecs (functions/codecs.py)
covering the format corners the m5/m6 oracles cannot reach: BMP row
padding + bottom-up order + 32 bpp, P3 ascii PPM, PPM comments,
16-bit stereo WAV, and non-fmt/data RIFF chunks."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from voter_file_etl_spark.functions.codecs import (
    decode_image_bytes,
    decode_wav_bytes,
)


def _bmp(width: int, height: int, pixels: np.ndarray, bpp: int = 24,
         bottom_up: bool = True) -> bytes:
    """Build a BI_RGB BMP from an H x W x 3 RGB array."""
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    rows = []
    ordered = pixels[::-1] if bottom_up else pixels
    for r in ordered:
        row = bytearray()
        for px in r:
            row += bytes([px[2], px[1], px[0]])  # BGR
            if bpp == 32:
                row += b"\xff"
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    data = b"".join(rows)
    data_off = 14 + 40
    header = (
        b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, width,
                      height if bottom_up else -height,
                      1, bpp, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


@pytest.fixture()
def rgb() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)  # H=3 W=5


def test_bmp_24bpp_bottom_up_padding(rgb):
    img = decode_image_bytes(_bmp(5, 3, rgb, bpp=24, bottom_up=True))
    assert (img.width, img.height, img.channels, img.format) == (5, 3, 3, "bmp")
    np.testing.assert_array_equal(img.pixels, rgb)


def test_bmp_top_down(rgb):
    img = decode_image_bytes(_bmp(5, 3, rgb, bpp=24, bottom_up=False))
    np.testing.assert_array_equal(img.pixels, rgb)


def test_bmp_32bpp(rgb):
    img = decode_image_bytes(_bmp(5, 3, rgb, bpp=32))
    assert img.channels == 3
    np.testing.assert_array_equal(img.pixels, rgb)


def test_bmp_rejects_compressed(rgb):
    payload = bytearray(_bmp(5, 3, rgb))
    struct.pack_into("<I", payload, 14 + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_image_bytes(bytes(payload))


def test_ppm_p6_with_comment(rgb):
    raw = rgb.tobytes()
    payload = b"P6\n# a comment\n5 3\n255\n" + raw
    img = decode_image_bytes(payload)
    assert (img.width, img.height, img.format) == (5, 3, "ppm")
    np.testing.assert_array_equal(img.pixels, rgb)


def test_ppm_p3_ascii(rgb):
    body = " ".join(str(int(v)) for v in rgb.reshape(-1))
    img = decode_image_bytes(f"P3\n5 3\n255\n{body}\n".encode())
    np.testing.assert_array_equal(img.pixels, rgb)


def test_ppm_truncated_raises(rgb):
    payload = b"P6\n5 3\n255\n" + rgb.tobytes()[:-1]
    with pytest.raises(ValueError, match="truncated"):
        decode_image_bytes(payload)


def _wav(samples: np.ndarray, rate: int, bits: int, extra_chunk: bool = False
         ) -> bytes:
    n_ch = samples.shape[1]
    if bits == 8:
        data = (samples + 128).astype(np.uint8).tobytes()
    else:
        data = samples.astype("<i2").tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_16bit_stereo_with_extra_chunk():
    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, size=(100, 2)).astype(np.int32)
    au = decode_wav_bytes(_wav(samples, 44100, 16, extra_chunk=True))
    assert (au.sample_rate, au.n_channels, au.bits) == (44100, 2, 16)
    assert au.samples.shape == (100, 2)
    np.testing.assert_array_equal(au.samples, samples)


def test_wav_8bit_mono_centered():
    samples = np.array([[0], [127], [-128]], dtype=np.int32)
    au = decode_wav_bytes(_wav(samples, 8000, 8))
    np.testing.assert_array_equal(au.samples, samples)


def test_wav_rejects_non_pcm():
    payload = bytearray(_wav(np.zeros((4, 1), dtype=np.int32), 8000, 8))
    struct.pack_into("<H", payload, payload.index(b"fmt ") + 8, 3)  # float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav_bytes(bytes(payload))


def test_png_roundtrip_gray8():
    from voter_file_etl_spark.functions.codecs import decode_png, encode_png_gray8

    px = bytes(range(48))
    img = decode_png(encode_png_gray8(px, 8, 6))
    assert (img.width, img.height, img.channels, img.format) == (8, 6, 1, "png")
    assert img.pixels.reshape(-1).tobytes() == px


def test_png_all_filter_types_decode():
    # Hand-build a 4x4 grayscale PNG whose four rows use filters
    # 1/2/3/4 (Sub/Up/Average/Paeth) and check the decoder inverts
    # them back to the intended pixels.
    import struct
    import zlib

    import numpy as np

    from voter_file_etl_spark.functions.codecs import _paeth, _png_chunk, _PNG_SIG, decode_png

    target = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    rows = []
    prev = np.zeros(4, dtype=int)
    for y, ftype in enumerate((1, 2, 3, 4)):
        cur = target[y].astype(int)
        enc = bytearray()
        for x in range(4):
            left = cur[x - 1] if x > 0 else 0
            up = prev[x]
            ul = prev[x - 1] if x > 0 else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(left, up, ul)
            enc.append((cur[x] - pred) & 0xFF)
        rows.append(bytes([ftype]) + bytes(enc))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    img = decode_png(payload)
    assert img.pixels.reshape(4, 4).tolist() == target.tolist()


def test_png_crc_mismatch_raises():
    import pytest

    from voter_file_etl_spark.functions.codecs import decode_png, encode_png_gray8

    png = bytearray(encode_png_gray8(bytes(48), 8, 6))
    png[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(png))


def test_vid0_parse_and_length_check():
    import numpy as np
    import pytest

    from voter_file_etl_spark.functions.codecs import parse_video_bytes

    frames = [bytes([i] * 48) for i in range(4)]
    payload = b"VID0" + bytes([4]) + b"".join(frames)
    out = parse_video_bytes(payload, 48)
    assert len(out) == 4
    assert all(np.array_equal(f, np.frombuffer(raw, dtype=np.uint8))
               for f, raw in zip(out, frames))
    with pytest.raises(ValueError):
        parse_video_bytes(payload[:-1], 48)
    with pytest.raises(ValueError):
        parse_video_bytes(b"XXXX" + payload[4:], 48)
