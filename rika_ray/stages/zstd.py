"""Zstandard frame unwrap (format breadth, SURVEY.md §2.2).

No zstd library ships in this environment, so this implements the PUBLIC
frame layout (RFC 8878) directly for the block types decodable without
the FSE/Huffman entropy stage:

- raw blocks (stored) and RLE blocks decode fully;
- skippable frames are skipped;
- a COMPRESSED block raises ``ZstdUnsupported`` — the caller surfaces it
  as a ``parse_error`` row (§2.8: errors are data, the job continues).
  The hook upgrades transparently: ``decompress_zstd`` tries the real
  ``zstandard`` module first when importable.

Multiple concatenated frames are handled (the common ``zstd --rm`` file
layout is one frame, but concatenation is legal).
"""

from __future__ import annotations

MAGIC = b"\x28\xb5\x2f\xfd"
SKIPPABLE_LO = 0x184D2A50
SKIPPABLE_HI = 0x184D2A5F

try:  # real codec if present (not in this container)
    import zstandard as _zstd

    HAVE_ZSTD = True
except ImportError:
    HAVE_ZSTD = False


class ZstdError(ValueError):
    pass


class ZstdUnsupported(ZstdError):
    pass


def decompress_zstd(data: bytes, cap: int) -> bytes:
    """All frames decoded and concatenated, capped at ``cap`` bytes."""
    if HAVE_ZSTD:  # pragma: no cover - library absent in this container
        out = _zstd.ZstdDecompressor().decompress(data, max_output_size=cap)
        return out
    out = bytearray()
    pos = 0
    while pos < len(data):
        pos = _one_frame(data, pos, out, cap)
    return bytes(out)


def _one_frame(data: bytes, pos: int, out: bytearray, cap: int) -> int:
    if pos + 4 > len(data):
        raise ZstdError("zstd: truncated magic")
    magic = int.from_bytes(data[pos : pos + 4], "little")
    if SKIPPABLE_LO <= magic <= SKIPPABLE_HI:
        if pos + 8 > len(data):
            raise ZstdError("zstd: truncated skippable frame")
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        return pos + 8 + size
    if data[pos : pos + 4] != MAGIC:
        raise ZstdError("zstd: bad magic")
    pos += 4
    if pos >= len(data):
        raise ZstdError("zstd: truncated frame header")
    desc = data[pos]
    pos += 1
    single_segment = bool(desc & 0x20)
    checksum = bool(desc & 0x04)
    dict_id_flag = desc & 0x03
    fcs_flag = desc >> 6
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[dict_id_flag]
    fcs_bytes = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    pos += fcs_bytes
    if pos > len(data):
        raise ZstdError("zstd: truncated frame header")
    while True:
        if pos + 3 > len(data):
            raise ZstdError("zstd: truncated block header")
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, size = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        if btype == 0:  # raw
            if pos + size > len(data):
                raise ZstdError("zstd: truncated raw block")
            out += data[pos : pos + size]
            pos += size
        elif btype == 1:  # RLE: one byte repeated `size` times
            if pos + 1 > len(data):
                raise ZstdError("zstd: truncated RLE block")
            out += data[pos : pos + 1] * size
            pos += 1
        elif btype == 2:
            raise ZstdUnsupported(
                "zstd: compressed blocks need the entropy stage — "
                "install `zstandard` for full decode"
            )
        else:
            raise ZstdError("zstd: reserved block type")
        if len(out) > cap:
            raise ZstdError(f"zstd: expands past {cap} bytes")
        if last:
            break
    if checksum:
        pos += 4
    return pos
