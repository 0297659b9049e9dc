"""Pure-Python/numpy pixel and PCM codecs for the multimodal block.

The container carries no imaging/audio library, so the formats whose
entire decode path is public-spec arithmetic are implemented here for
real: PNG (zlib inflate — stdlib — plus per-scanline unfilter),
uncompressed BMP (row flip + BGR swizzle), and RIFF/WAVE PCM. With
these, the multimodal pipelines produce REAL pixels/samples for the
png/bmp/wav rows of a corpus; entropy-coded formats (JPEG, GIF-LZW,
TIFF variants, WebP) stay behind the clearly-marked deterministic stub
in ``rika_ray.pipelines.multimodal`` unless PIL is importable.

The reference never decodes pixels (rika/Tika read image *metadata*
only, ``/root/reference/lib/rika/parser.rb``); this module serves the
task brief's multimodal requirement, not reference parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(Exception):
    pass


# ---------------------------------------------------------------- PNG ----

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter_sub(raw: np.ndarray, ch: int) -> np.ndarray:
    # recon[x] = raw[x] + recon[x-ch]: a per-channel-phase running sum —
    # cumsum in a wide dtype, wrapped mod 256 (uint8 addition semantics)
    out = np.empty_like(raw)
    for p in range(ch):
        out[p::ch] = np.cumsum(raw[p::ch], dtype=np.uint64) & 0xFF
    return out


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from an 8-bit non-interlaced PNG (color types
    0 gray / 2 RGB / 3 palette / 4 gray+alpha / 6 RGBA; alpha dropped,
    matching a convert-to-RGB). All five scanline filters implemented
    per the public PNG spec; Sub is a cumsum, Up a vector add, Average
    and Paeth walk the row (left-neighbor recursion is sequential by
    construction)."""
    if not data.startswith(_PNG_SIG):
        raise CodecError("not a PNG")
    pos = 8
    width = height = None
    color = depth = interlace = None
    plte: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise CodecError("truncated chunk")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if width is None:
        raise CodecError("no IHDR")
    if depth != 8 or interlace != 0:
        raise CodecError(f"unsupported PNG (depth={depth}, interlace={interlace})")
    ch = _PNG_CHANNELS.get(color)
    if ch is None:
        raise CodecError(f"unsupported color type {color}")
    if not idat:
        raise CodecError("no IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise CodecError(f"bad IDAT stream: {e}") from None
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise CodecError("IDAT size does not match dimensions")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        r = rows[y]
        if f == 0:
            rec = r.copy()
        elif f == 1:
            rec = _unfilter_sub(r, ch)
        elif f == 2:
            rec = r + prev  # uint8 wraps
        elif f == 3:
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(r[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:
            rec = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (int(r[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise CodecError(f"bad filter type {f}")
        out[y] = rec
        prev = rec
    px = out.reshape(height, width, ch)
    if color == 2:
        return px
    if color == 6:
        return px[:, :, :3].copy()
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color == 3: palette lookup
    if plte is None or len(plte) % 3:
        raise CodecError("palette image without a valid PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise CodecError("palette index out of range")
    return pal[idx]


def png_encode(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """8-bit RGB PNG encoder (the exact inverse of ``png_decode``) —
    exists so fixtures can exercise every unfilter path with known pixel
    values. ``filters`` gives the per-row filter type (default all 0)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    if ch != 3:
        raise CodecError("encoder writes RGB only")
    fs = filters if filters is not None else [0] * h
    if len(fs) != h:
        raise CodecError("one filter per row")
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = px[y].reshape(-1)
        f = fs[y]
        if f == 0:
            enc = cur.copy()
        elif f == 1:
            enc = cur.copy()
            enc[ch:] = cur[ch:] - cur[:-ch]
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = np.empty_like(cur)
            for x in range(w * ch):
                left = int(cur[x - ch]) if x >= ch else 0
                enc[x] = (int(cur[x]) - ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:
            enc = np.empty_like(cur)
            for x in range(w * ch):
                left = int(cur[x - ch]) if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise CodecError(f"bad filter type {f}")
        lines.append(f)
        lines += enc.tobytes()
        prev = cur
    def _chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP ----


def bmp_decode(data: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from an uncompressed (BI_RGB) 24/32-bit BMP.
    Rows are 4-byte padded and stored bottom-up when height > 0."""
    if not data.startswith(b"BM") or len(data) < 54:
        raise CodecError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    dib, w, h, _planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if dib < 40 or comp != 0:
        raise CodecError(f"unsupported BMP (dib={dib}, compression={comp})")
    if bpp not in (24, 32):
        raise CodecError(f"unsupported BMP bpp {bpp}")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = pix_off + stride * h
    if len(data) < need:
        raise CodecError("truncated pixel array")
    arr = np.frombuffer(data[pix_off : pix_off + stride * h], dtype=np.uint8)
    arr = arr.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if flip:
        arr = arr[::-1]
    return arr[:, :, 2::-1].copy()  # BGR(A) → RGB


def bmp_encode(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP from (H, W, 3) uint8 RGB — the
    fixture-side inverse of ``bmp_decode``."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        bgr = px[y][:, ::-1].tobytes()
        rows += bgr + b"\x00" * (stride - len(bgr))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 0, 0, 0, 0)
    header = b"BM" + struct.pack(
        "<IHHI", 14 + len(dib) + len(rows), 0, 0, 14 + len(dib)
    )
    return header + dib + bytes(rows)


# ---------------------------------------------------------------- WAV ----


def wav_pcm_decode(data: bytes) -> tuple[np.ndarray, int]:
    """(mono float32 samples in [-1, 1], sample_rate) from integer-PCM
    RIFF/WAVE (8/16-bit, any channel count — channels are mean-mixed)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a RIFF/WAVE file")
    rate = bits = channels = None
    pcm: bytes | None = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise CodecError(f"not integer PCM (format tag {tag})")
        elif cid == b"data":
            pcm = bytes(body)
            break
        pos += 8 + csize + (csize & 1)
    if rate is None or pcm is None:
        raise CodecError("missing fmt or data chunk")
    if bits == 16:
        x = np.frombuffer(pcm[: len(pcm) & ~1], dtype="<i2").astype(np.float32)
        x /= 32768.0
    elif bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise CodecError(f"unsupported bit depth {bits}")
    if channels and channels > 1:
        n = (x.size // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    return x.astype(np.float32), int(rate)
