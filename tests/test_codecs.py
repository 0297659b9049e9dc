"""Pure-numpy codec goldens: PNG unfilter paths, BMP row
flip/padding/swizzle, WAV PCM normalization — plus the multimodal
pipeline preferring the real decode over the stub."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rika_ray.stages.codecs import (
    CodecError,
    bmp_decode,
    bmp_encode,
    png_decode,
    png_encode,
    wav_pcm_decode,
)


def _grad(h, w, seed=0):
    from rika_ray.docgen import gradient_pixels

    return gradient_pixels(h, w, seed=seed)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(f):
    px = _grad(9, 7, seed=f)
    data = png_encode(px, filters=[f] * 9)
    assert (png_decode(data) == px).all()


def test_png_roundtrip_mixed_filters():
    px = _grad(25, 16, seed=5)
    data = png_encode(px, filters=[y % 5 for y in range(25)])
    assert (png_decode(data) == px).all()


def test_png_sub_filter_hand_case():
    # one row, two RGB pixels; Sub stores right pixel minus left
    px = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    data = png_encode(px, filters=[1])
    # the filtered scanline inside IDAT must be 01 0a 14 1e 1e 1e 1e
    raw = zlib.decompress(data[data.index(b"IDAT") + 4 : data.rindex(b"IEND") - 4])
    assert raw == bytes([1, 10, 20, 30, 30, 30, 30])
    assert (png_decode(data) == px).all()


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _raw_png(w, h, color, scanlines: bytes, plte: bytes | None = None):
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(scanlines)) + _png_chunk(b"IEND", b"")


def test_png_grayscale_and_rgba_and_palette():
    # gray: 2x2, values 0,64,128,255 → replicated into 3 channels
    g = _raw_png(2, 2, 0, bytes([0, 0, 64, 0, 128, 255]))
    got = png_decode(g)
    assert got.shape == (2, 2, 3)
    assert (got[0, 1] == [64, 64, 64]).all() and (got[1, 1] == [255, 255, 255]).all()
    # RGBA: alpha dropped
    ra = _raw_png(1, 1, 6, bytes([0, 9, 8, 7, 200]))
    assert (png_decode(ra)[0, 0] == [9, 8, 7]).all()
    # palette: index 1 → (1,2,3)
    p = _raw_png(2, 1, 3, bytes([0, 1, 0]), plte=bytes([250, 250, 250, 1, 2, 3]))
    got = png_decode(p)
    assert (got[0, 0] == [1, 2, 3]).all() and (got[0, 1] == [250, 250, 250]).all()


def test_png_rejects_header_only_and_interlaced():
    from rika_ray import docgen

    with pytest.raises(CodecError):  # docgen.build_png is header-only
        png_decode(docgen.build_png(8, 8))
    il = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    )
    with pytest.raises(CodecError):
        png_decode(il + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 14)))


def test_bmp_roundtrip_with_padding():
    px = _grad(5, 3, seed=2)  # stride 9 → padded to 12
    data = bmp_encode(px)
    assert (bmp_decode(data) == px).all()
    # dims in the header match the image_meta reader
    from rika_ray.stages.image_meta import bmp_dimensions

    assert bmp_dimensions(data) == (3, 5)


def test_wav_pcm_decode_16bit_stereo_mix():
    # 2 frames of 16-bit stereo: (16384, -16384) → 0.0 mix; (8192, 8192) → 0.25
    pcm = struct.pack("<4h", 16384, -16384, 8192, 8192)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = wav_pcm_decode(data)
    assert rate == 8000
    assert np.allclose(samples, [0.0, 0.25])


def test_wav_pcm_decode_8bit_and_silence():
    from rika_ray import docgen

    samples, rate = wav_pcm_decode(docgen.build_wav(22050, 1, 16, 100))
    assert rate == 22050 and samples.shape == (100,) and (samples == 0).all()
    pcm8 = bytes([128, 255, 0])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm8)) + pcm8
    )
    samples, _ = wav_pcm_decode(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(samples, [0.0, 127 / 128, -1.0])


def test_decode_image_uses_real_codec_for_png_and_bmp():
    from rika_ray import docgen
    from rika_ray.pipelines.multimodal import HAVE_PIL, decode_image

    if HAVE_PIL:
        pytest.skip("PIL present: it owns the decode")
    px = _grad(12, 10, seed=4)
    got, media = decode_image(docgen.build_png_rgb(px, filters=[2] * 12))
    assert media == "image/png" and (got == px).all()
    got, media = decode_image(docgen.build_bmp_rgb(px))
    assert media == "image/bmp" and (got == px).all()


def test_decode_audio_uses_real_pcm_for_wav():
    from rika_ray.pipelines.multimodal import decode_audio

    pcm = struct.pack("<2h", 16384, -32768)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    samples = decode_audio(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(samples, [0.5, -1.0])
