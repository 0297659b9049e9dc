"""Image metadata extraction (operator M7, SURVEY.md §2.2).

The reference extracts image dimensions into metadata keys
``"Image Height"`` / ``"Image Width"`` with ``" pixels"``-suffixed values
and empty content (``/root/reference/spec/rika/parser_spec.rb:214-217``;
empty content for no-text formats ``:186-188``). We parse JPEG SOF markers,
PNG IHDR and GIF headers directly — header-only reads, O(1) per image.
"""

from __future__ import annotations

import struct


class ImageParseError(Exception):
    pass


# SOF markers that carry dimensions (all except DHT/DAC/RST variants)
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def jpeg_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker."""
    if not data.startswith(b"\xff\xd8"):
        raise ImageParseError("not a JPEG")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                break
            height, width = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return width, height
        pos += 2 + seg_len
    raise ImageParseError("no SOF marker found")


def png_dimensions(data: bytes) -> tuple[int, int]:
    if not data.startswith(b"\x89PNG\r\n\x1a\n") or len(data) < 24:
        raise ImageParseError("not a PNG")
    if data[12:16] != b"IHDR":
        raise ImageParseError("first chunk is not IHDR")
    width, height = struct.unpack(">II", data[16:24])
    return width, height


def gif_dimensions(data: bytes) -> tuple[int, int]:
    if not data.startswith((b"GIF87a", b"GIF89a")) or len(data) < 10:
        raise ImageParseError("not a GIF")
    width, height = struct.unpack("<HH", data[6:10])
    return width, height


def extract_image(data: bytes, media_type: str) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata with Image Width/Height)."""
    if media_type == "image/jpeg":
        w, h = jpeg_dimensions(data)
    elif media_type == "image/png":
        w, h = png_dimensions(data)
    elif media_type == "image/gif":
        w, h = gif_dimensions(data)
    else:
        raise ImageParseError(f"unsupported image type {media_type}")
    return "", [], {"Image Height": f"{h} pixels", "Image Width": f"{w} pixels"}
