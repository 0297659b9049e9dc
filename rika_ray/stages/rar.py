"""RAR container reader (format breadth, SURVEY.md §2.2).

The reference inherits RAR support from Tika's PackageParser
(``/root/reference/lib/rika/parser.rb:21-29``). Re-implemented here from
the PUBLIC RAR 4.x "technote" layout and the RAR5 archive-format
documentation — HEADER WALKING ONLY: member names and sizes are always
surfaced, but member BYTES are extracted only for STORED entries (RAR4
method 0x30, RAR5 compression method 0). The RAR compression algorithm
itself is proprietary; compressed members yield ``None`` (the skip
convention of ``iter_zip_entries``) so the archive still lists its
contents and stored members flow through extraction.

Bomb guards mirror ``stages/archive.py``.
"""

from __future__ import annotations

from typing import Iterator

from rika_ray.stages.archive import (
    MAX_ENTRIES,
    MAX_ENTRY_BYTES,
    MAX_TOTAL_BYTES,
    ArchiveParseError,
)

RAR4_SIG = b"Rar!\x1a\x07\x00"
RAR5_SIG = b"Rar!\x1a\x07\x01\x00"


def iter_rar_entries(data: bytes) -> Iterator[tuple[str, bytes | None, int]]:
    """Yield ``(name, member_bytes | None, total_entry_count)`` like
    ``iter_zip_entries``. ``None`` marks a compressed (proprietary-method)
    or over-budget member."""
    if data.startswith(RAR5_SIG):
        yield from _iter_rar5(data)
    elif data.startswith(RAR4_SIG):
        yield from _iter_rar4(data)
    else:
        raise ArchiveParseError("rar: bad signature")


# ---------------------------------------------------------------------------
# RAR 4.x: fixed-layout blocks — HEAD_CRC u16, TYPE u8, FLAGS u16, SIZE u16
# ---------------------------------------------------------------------------

_R4_LONG_BLOCK = 0x8000
_R4_FILE = 0x74
_R4_END = 0x7B
_R4_STORED = 0x30


def _scan_rar4(data: bytes) -> list[tuple[str, int, int, int]]:
    """(name, data_offset, pack_size, method) per file block."""
    out = []
    pos = len(RAR4_SIG)
    while pos + 7 <= len(data) and len(out) < MAX_ENTRIES:
        btype = data[pos + 2]
        flags = int.from_bytes(data[pos + 3 : pos + 5], "little")
        hsize = int.from_bytes(data[pos + 5 : pos + 7], "little")
        if hsize < 7:
            raise ArchiveParseError("rar4: bad block size")
        add_size = 0
        if btype == _R4_FILE:
            if pos + 32 > len(data):
                raise ArchiveParseError("rar4: truncated file header")
            pack_size = int.from_bytes(data[pos + 7 : pos + 11], "little")
            method = data[pos + 25]
            name_size = int.from_bytes(data[pos + 26 : pos + 28], "little")
            name_off = pos + 32
            name = data[name_off : name_off + name_size].decode(
                "utf-8", errors="replace"
            )
            out.append((name, pos + hsize, pack_size, method))
            add_size = pack_size
        elif flags & _R4_LONG_BLOCK:
            if pos + 11 > len(data):
                break
            add_size = int.from_bytes(data[pos + 7 : pos + 11], "little")
        if btype == _R4_END:
            break
        pos += hsize + add_size
    return out


def _iter_rar4(data: bytes) -> Iterator[tuple[str, bytes | None, int]]:
    files = _scan_rar4(data)
    total = len(files)
    budget = MAX_TOTAL_BYTES
    for name, off, pack_size, method in files:
        ok = (
            method == _R4_STORED
            and pack_size <= MAX_ENTRY_BYTES
            and pack_size <= budget
            and off + pack_size <= len(data)
        )
        if ok:
            budget -= pack_size
            yield name, data[off : off + pack_size], total
        else:
            yield name, None, total


# ---------------------------------------------------------------------------
# RAR 5.0: vint-based blocks — CRC u32, vint head_size, then the header
# ---------------------------------------------------------------------------


def _vint(buf: bytes, pos: int) -> tuple[int, int]:
    value = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ArchiveParseError("rar5: bad vint")
        b = buf[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7


def _iter_rar5(data: bytes) -> Iterator[tuple[str, bytes | None, int]]:
    files: list[tuple[str, int, int, int]] = []  # name, off, pack, method
    pos = len(RAR5_SIG)
    while pos + 5 <= len(data) and len(files) < MAX_ENTRIES:
        hpos = pos + 4  # skip header CRC32
        head_size, hpos = _vint(data, hpos)
        head_start = hpos
        head_end = head_start + head_size
        if head_end > len(data):
            break
        htype, hpos = _vint(data, hpos)
        hflags, hpos = _vint(data, hpos)
        if hflags & 0x01:  # extra area
            _, hpos = _vint(data, hpos)
        data_size = 0
        if hflags & 0x02:  # data area
            data_size, hpos = _vint(data, hpos)
        if htype == 2:  # file header
            fflags, hpos = _vint(data, hpos)
            unp_size, hpos = _vint(data, hpos)
            _attrs, hpos = _vint(data, hpos)
            if fflags & 0x02:  # mtime u32
                hpos += 4
            if fflags & 0x04:  # data CRC u32
                hpos += 4
            comp_info, hpos = _vint(data, hpos)
            method = (comp_info >> 7) & 0x7
            _host, hpos = _vint(data, hpos)
            name_len, hpos = _vint(data, hpos)
            name = data[hpos : hpos + name_len].decode(
                "utf-8", errors="replace"
            )
            if not fflags & 0x01:  # bit 0 = directory
                files.append((name, head_end, data_size, method))
        elif htype == 5:  # end of archive
            break
        pos = head_end + data_size
    total = len(files)
    budget = MAX_TOTAL_BYTES
    for name, off, pack_size, method in files:
        ok = (
            method == 0
            and pack_size <= MAX_ENTRY_BYTES
            and pack_size <= budget
            and off + pack_size <= len(data)
        )
        if ok:
            budget -= pack_size
            yield name, data[off : off + pack_size], total
        else:
            yield name, None, total
