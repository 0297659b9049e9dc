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


# EXIF/TIFF tags surfaced as metadata (Tika-style tiff:/exif: keys; the
# reference gets these via Tika's drewnoakes-backed JpegParser behind the
# same one-parse surface, /root/reference/lib/rika/parser.rb:21-29)
_EXIF_TAGS = {
    0x010F: ("tiff:Make", "ascii"),
    0x0110: ("tiff:Model", "ascii"),
    0x0112: ("tiff:Orientation", "short"),
    0x0132: ("exif:DateTime", "ascii"),
}


def jpeg_exif(data: bytes) -> dict[str, str]:
    """IFD0 tags from a JPEG APP1 Exif segment; {} when absent. Bounded:
    reads only the APP1 payload, walks one IFD, tolerates a malformed
    segment by returning what parsed so far."""
    out: dict[str, str] = {}
    pos, n = 2, len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 past here
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = data[pos + 10 : pos + 2 + seg_len]
            try:
                out.update(_parse_tiff_ifd0(tiff))
            except (struct.error, IndexError):
                pass
            break
        pos += 2 + seg_len
    return out


def _parse_tiff_ifd0(tiff: bytes) -> dict[str, str]:
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return {}
    if struct.unpack(f"{bo}H", tiff[2:4])[0] != 42:
        return {}
    (ifd_off,) = struct.unpack(f"{bo}I", tiff[4:8])
    (count,) = struct.unpack(f"{bo}H", tiff[ifd_off : ifd_off + 2])
    out: dict[str, str] = {}
    for i in range(count):
        entry = tiff[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        if len(entry) < 12:
            break
        tag, ftype, n_vals = struct.unpack(f"{bo}HHI", entry[:8])
        spec = _EXIF_TAGS.get(tag)
        if spec is None:
            continue
        key, kind = spec
        if kind == "ascii" and ftype == 2:
            if n_vals <= 4:
                raw = entry[8 : 8 + n_vals]
            else:
                (off,) = struct.unpack(f"{bo}I", entry[8:12])
                raw = tiff[off : off + n_vals]
            out[key] = raw.split(b"\x00", 1)[0].decode(
                "ascii", errors="replace"
            )
        elif kind == "short" and ftype == 3:
            out[key] = str(struct.unpack(f"{bo}H", entry[8:10])[0])
    return out


def tiff_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from IFD0 tags 0x0100/0x0101 (SHORT or LONG),
    either byte order."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ImageParseError("not a TIFF")
    try:
        (ifd_off,) = struct.unpack(f"{bo}I", data[4:8])
        (count,) = struct.unpack(f"{bo}H", data[ifd_off : ifd_off + 2])
        w = h = None
        for i in range(count):
            entry = data[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
            tag, ftype = struct.unpack(f"{bo}HH", entry[:4])
            if tag not in (0x0100, 0x0101):
                continue
            if ftype == 3:
                (val,) = struct.unpack(f"{bo}H", entry[8:10])
            elif ftype == 4:
                (val,) = struct.unpack(f"{bo}I", entry[8:12])
            else:
                continue
            if tag == 0x0100:
                w = val
            else:
                h = val
    except (struct.error, IndexError):
        raise ImageParseError("truncated TIFF IFD") from None
    if w is None or h is None:
        raise ImageParseError("TIFF IFD0 lacks dimensions")
    return w, h


def psd_dimensions(data: bytes) -> tuple[int, int]:
    """Photoshop header (public PSD spec): ``8BPS`` + version, then
    channels u16, height u32 BE (offset 14), width u32 BE (offset 18)."""
    if not data.startswith(b"8BPS") or len(data) < 22:
        raise ImageParseError("not a PSD")
    h, w = struct.unpack(">II", data[14:22])
    return w, h


def ico_dimensions(data: bytes) -> tuple[int, int]:
    """ICO directory (public ICONDIR layout): first entry's width/height
    bytes at offsets 6/7; 0 encodes 256."""
    if data[:4] != b"\x00\x00\x01\x00" or len(data) < 8:
        raise ImageParseError("not an ICO")
    w, h = data[6], data[7]
    return w or 256, h or 256


def bmp_dimensions(data: bytes) -> tuple[int, int]:
    if not data.startswith(b"BM") or len(data) < 26:
        raise ImageParseError("not a BMP")
    dib = struct.unpack("<I", data[14:18])[0]
    if dib == 12:  # BITMAPCOREHEADER: u16 dims
        w, h = struct.unpack("<HH", data[18:22])
    else:  # BITMAPINFOHEADER family: i32 dims (height may be negative)
        w, h = struct.unpack("<ii", data[18:26])
    return w, abs(h)


def webp_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) from VP8X (canvas), lossy VP8 (keyframe), or VP8L
    (stream header) chunks."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP" or len(data) < 30:
        raise ImageParseError("not a WebP")
    chunk = data[12:16]
    if chunk == b"VP8X":
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return w, h
    if chunk == b"VP8 ":
        # keyframe: 3-byte frame tag, then 3-byte start code 9D 01 2A
        if data[23:26] != b"\x9d\x01\x2a":
            raise ImageParseError("VP8 chunk is not a keyframe")
        w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
        return w, h
    if chunk == b"VP8L":
        if data[20] != 0x2F:
            raise ImageParseError("bad VP8L signature")
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return w, h
    raise ImageParseError(f"unknown WebP chunk {chunk!r}")


def extract_image(data: bytes, media_type: str) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata with Image Width/Height and, for
    JPEG/TIFF, any EXIF/IFD0 tags)."""
    meta: dict[str, str] = {}
    if media_type == "image/jpeg":
        w, h = jpeg_dimensions(data)
        meta.update(jpeg_exif(data))
    elif media_type == "image/png":
        w, h = png_dimensions(data)
    elif media_type == "image/gif":
        w, h = gif_dimensions(data)
    elif media_type == "image/tiff":
        w, h = tiff_dimensions(data)
        try:
            meta.update(_parse_tiff_ifd0(data))
        except (struct.error, IndexError):
            pass
    elif media_type == "image/bmp":
        w, h = bmp_dimensions(data)
    elif media_type == "image/webp":
        w, h = webp_dimensions(data)
    elif media_type == "image/vnd.adobe.photoshop":
        w, h = psd_dimensions(data)
    elif media_type == "image/vnd.microsoft.icon":
        w, h = ico_dimensions(data)
    else:
        raise ImageParseError(f"unsupported image type {media_type}")
    meta["Image Height"] = f"{h} pixels"
    meta["Image Width"] = f"{w} pixels"
    return "", [], meta
