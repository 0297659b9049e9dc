"""7z container reader (format breadth, SURVEY.md §2.2 — the round-3
verdict's last PackageParser gap).

The reference inherits 7z support from Tika's PackageParser behind the one
``Rika.parse`` surface (``/root/reference/lib/rika/parser.rb:21-29``).
Re-implemented here from the PUBLIC 7z format documentation (7zFormat.txt
in the LZMA SDK / p7zip distributions): signature header → (possibly
LZMA-packed) metadata header → pack/unpack stream maps → folders decoded
with stdlib codecs.

Supported folder codecs (single-coder folders, one pack stream):

- Copy   (00)        — stored
- LZMA2  (21)        — stdlib ``lzma`` FORMAT_RAW / FILTER_LZMA2
- LZMA1  (03 01 01)  — stdlib ``lzma`` FORMAT_RAW / FILTER_LZMA1
- BZip2  (04 02 02)  — stdlib ``bz2``

Multi-coder folders (e.g. BCJ+LZMA executables) and other codecs yield
``None`` member bytes (the skip convention of ``iter_zip_entries``) so a
mixed archive still surfaces its decodable members. Solid blocks (one
folder holding many files) are split by the substream size table.

Bomb guards mirror ``stages/archive.py``: MAX_ENTRIES members walked,
MAX_ENTRY_BYTES per member, MAX_TOTAL_BYTES per archive, and every
decompressor call is capped by the declared folder unpack size.
"""

from __future__ import annotations

import bz2
import lzma
from typing import Iterator

from rika_ray.stages.archive import (
    MAX_ENTRIES,
    MAX_ENTRY_BYTES,
    MAX_TOTAL_BYTES,
    ArchiveParseError,
)

SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# property ids (7zFormat.txt)
K_END = 0x00
K_HEADER = 0x01
K_MAIN_STREAMS_INFO = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS_INFO = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_CODERS_UNPACK_SIZE = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_NAME = 0x11
K_ENCODED_HEADER = 0x17

CODEC_COPY = b"\x00"
CODEC_LZMA2 = b"\x21"
CODEC_LZMA1 = b"\x03\x01\x01"
CODEC_BZIP2 = b"\x04\x02\x02"


class _Reader:
    """Cursor over the header bytes with the 7z variable-length number
    codec: the first byte's leading 1-bits give the count of extra
    little-endian bytes; its remaining low bits are the value's top part."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ArchiveParseError("7z: truncated header")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ArchiveParseError("7z: truncated header")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def number(self) -> int:
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if (first & mask) == 0:
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bit_vector(self, n: int) -> list[bool]:
        bits: list[bool] = []
        b = 0
        mask = 0
        for _ in range(n):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            bits.append(bool(b & mask))
            mask >>= 1
        return bits

    def optional_bit_vector(self, n: int) -> list[bool]:
        """AllAreDefined byte, then either all-true or an explicit vector."""
        if self.byte() != 0:
            return [True] * n
        return self.bit_vector(n)

    def skip_crcs(self, n: int) -> int:
        """Skip a digests block; returns how many digests were defined."""
        defined = self.optional_bit_vector(n)
        n_def = sum(defined)
        self.bytes(4 * n_def)
        return n_def


class _Folder:
    __slots__ = ("codec_id", "props", "unpack_size", "num_substreams",
                 "substream_sizes", "supported", "crc_defined",
                 "num_out_streams", "main_out_index")

    def __init__(self) -> None:
        self.codec_id = b""
        self.props = b""
        self.unpack_size = 0
        self.num_substreams = 1
        self.substream_sizes: list[int] = []
        self.supported = True
        self.crc_defined = False
        # kCodersUnpackSize stores ONE size per coder OUT stream, so even
        # unsupported multi-coder folders (BCJ+LZMA chains) must know their
        # out-stream count to keep the header reader in sync
        self.num_out_streams = 1
        self.main_out_index = 0


def _parse_folder(r: _Reader) -> _Folder:
    f = _Folder()
    num_coders = r.number()
    total_in = total_out = 0
    for i in range(num_coders):
        flag = r.byte()
        id_size = flag & 0x0F
        codec_id = r.bytes(id_size)
        n_in = n_out = 1
        if flag & 0x10:  # complex coder
            n_in = r.number()
            n_out = r.number()
        props = b""
        if flag & 0x20:
            props = r.bytes(r.number())
        if i == 0:
            f.codec_id, f.props = codec_id, props
        total_in += n_in
        total_out += n_out
    # a single simple coder is the supported shape; anything else (coder
    # chains, split streams) is parsed past but marked undecodable
    if num_coders != 1 or total_in != 1 or total_out != 1:
        f.supported = False
    f.num_out_streams = total_out
    bound_out: set[int] = set()
    for _ in range(total_out - 1):  # bind pairs: (in_index, out_index)
        r.number()
        bound_out.add(r.number())
    # the folder's output is the one out-stream no bind pair consumes
    f.main_out_index = next(
        (i for i in range(total_out) if i not in bound_out), 0
    )
    num_packed = total_in - (total_out - 1)
    if num_packed != 1:
        f.supported = False
        for _ in range(num_packed):
            r.number()  # packed stream indices (explicit when > 1)
    return f


def _decode_folder(folder: _Folder, packed: bytes) -> bytes:
    size = folder.unpack_size
    if size > MAX_TOTAL_BYTES:
        raise ArchiveParseError(f"7z: folder expands past {MAX_TOTAL_BYTES}")
    cid = folder.codec_id
    if cid == CODEC_COPY:
        return packed[:size]
    if cid == CODEC_LZMA2:
        filt: dict = {"id": lzma.FILTER_LZMA2}
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=[filt])
        return dec.decompress(packed, max_length=size)
    if cid == CODEC_LZMA1:
        if len(folder.props) < 5:
            raise ArchiveParseError("7z: LZMA1 props truncated")
        b0 = folder.props[0]
        lc, rem = b0 % 9, b0 // 9
        lp, pb = rem % 5, rem // 5
        dict_size = int.from_bytes(folder.props[1:5], "little")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[
                {
                    "id": lzma.FILTER_LZMA1,
                    "lc": lc,
                    "lp": lp,
                    "pb": pb,
                    "dict_size": max(dict_size, 1 << 12),
                }
            ],
        )
        return dec.decompress(packed, max_length=size)
    if cid == CODEC_BZIP2:
        dec = bz2.BZ2Decompressor()
        return dec.decompress(packed, max_length=size)
    raise ArchiveParseError(f"7z: unsupported codec {cid.hex()}")


class _StreamsInfo:
    def __init__(self) -> None:
        self.pack_pos = 0
        self.pack_sizes: list[int] = []
        self.folders: list[_Folder] = []


def _parse_streams_info(r: _Reader) -> _StreamsInfo:
    si = _StreamsInfo()
    while True:
        pid = r.number()
        if pid == K_END:
            # kSubStreamsInfo is optional: absent means one substream per
            # folder spanning the whole folder output
            for f in si.folders:
                if not f.substream_sizes and f.num_substreams == 1:
                    f.substream_sizes = [f.unpack_size]
            return si
        if pid == K_PACK_INFO:
            si.pack_pos = r.number()
            num_pack = r.number()
            while True:
                p2 = r.number()
                if p2 == K_END:
                    break
                if p2 == K_SIZE:
                    si.pack_sizes = [r.number() for _ in range(num_pack)]
                elif p2 == K_CRC:
                    r.skip_crcs(num_pack)
                else:
                    raise ArchiveParseError(f"7z: bad PackInfo prop {p2}")
        elif pid == K_UNPACK_INFO:
            if r.number() != K_FOLDER:
                raise ArchiveParseError("7z: UnpackInfo without kFolder")
            num_folders = r.number()
            if r.byte() != 0:  # external folders live in another stream
                raise ArchiveParseError("7z: external folder info")
            si.folders = [_parse_folder(r) for _ in range(num_folders)]
            if r.number() != K_CODERS_UNPACK_SIZE:
                raise ArchiveParseError("7z: missing kCodersUnpackSize")
            for f in si.folders:
                # one size per coder OUT stream; the folder's unpack size
                # is the main (unbound) out-stream's — reading only one
                # number for a multi-coder folder would desync the reader
                # and fail the whole archive, not just that folder
                sizes = [r.number() for _ in range(f.num_out_streams)]
                f.unpack_size = sizes[f.main_out_index]
            while True:
                p2 = r.number()
                if p2 == K_END:
                    break
                if p2 == K_CRC:
                    defined = r.optional_bit_vector(len(si.folders))
                    r.bytes(4 * sum(defined))
                    for f, d in zip(si.folders, defined):
                        f.crc_defined = d
                else:
                    raise ArchiveParseError(f"7z: bad UnpackInfo prop {p2}")
        elif pid == K_SUBSTREAMS_INFO:
            _parse_substreams(r, si)
        else:
            raise ArchiveParseError(f"7z: bad StreamsInfo prop {pid}")


def _parse_substreams(r: _Reader, si: _StreamsInfo) -> None:
    pid = r.number()
    if pid == K_NUM_UNPACK_STREAM:
        for f in si.folders:
            f.num_substreams = r.number()
        pid = r.number()
    if pid == K_SIZE:
        # per folder: n-1 explicit sizes, the last substream implied
        for f in si.folders:
            if f.num_substreams == 0:
                continue
            explicit = [r.number() for _ in range(f.num_substreams - 1)]
            f.substream_sizes = explicit + [f.unpack_size - sum(explicit)]
        pid = r.number()
    while pid != K_END:
        if pid == K_CRC:
            # digests only for substreams lacking a folder-level CRC
            n_digests = sum(
                f.num_substreams
                for f in si.folders
                if not (f.num_substreams == 1 and f.crc_defined)
            )
            r.skip_crcs(n_digests)
        else:
            raise ArchiveParseError(f"7z: bad SubStreamsInfo prop {pid}")
        pid = r.number()
    for f in si.folders:
        if not f.substream_sizes:
            f.substream_sizes = (
                [f.unpack_size] if f.num_substreams == 1 else []
            )
            if f.num_substreams > 1 and not f.substream_sizes:
                raise ArchiveParseError("7z: missing substream sizes")


def _parse_files_info(r: _Reader) -> tuple[list[str], list[bool], list[bool]]:
    """(names, is_empty_stream, is_empty_file) per file record."""
    num_files = r.number()
    names: list[str] = []
    empty_stream = [False] * num_files
    empty_file_bits: list[bool] = []
    while True:
        prop = r.number()
        if prop == K_END:
            break
        size = r.number()
        end = r.pos + size
        if prop == K_NAME:
            if r.byte() != 0:
                raise ArchiveParseError("7z: external names")
            raw = r.bytes(end - r.pos)
            parts = raw.decode("utf-16-le", errors="replace").split("\x00")
            names = parts[:-1] if parts and parts[-1] == "" else parts
        elif prop == K_EMPTY_STREAM:
            empty_stream = r.bit_vector(num_files)
            r.pos = end
        elif prop == K_EMPTY_FILE:
            empty_file_bits = r.bit_vector(sum(empty_stream))
            r.pos = end
        else:
            r.pos = end  # mtime/attributes/etc — not needed
    if not names:
        names = [f"member-{i}" for i in range(num_files)]
    if not empty_file_bits:
        empty_file_bits = [False] * sum(empty_stream)
    return names, empty_stream, empty_file_bits


def _read_header(data: bytes) -> tuple[_Reader, int]:
    """Validated next-header reader + pack-stream base offset (32)."""
    if data[:6] != SIGNATURE or len(data) < 32:
        raise ArchiveParseError("7z: bad signature")
    nh_off = int.from_bytes(data[12:20], "little")
    nh_size = int.from_bytes(data[20:28], "little")
    start = 32 + nh_off
    if nh_size > len(data) or start + nh_size > len(data):
        raise ArchiveParseError("7z: truncated next header")
    return _Reader(data[start : start + nh_size]), 32


def iter_7z_entries(data: bytes) -> Iterator[tuple[str, bytes | None, int]]:
    """Yield ``(name, member_bytes | None, total_entry_count)`` like
    ``iter_zip_entries``: ``None`` marks a member skipped by the bomb
    guards or living in an unsupported folder codec. Raises
    ArchiveParseError on a corrupt container."""
    r, base = _read_header(data)
    if len(r.buf) == 0:
        return  # empty archive: valid, no members
    pid = r.number()
    if pid == K_ENCODED_HEADER:
        # the metadata header itself is packed in a one-folder stream set
        si = _parse_streams_info(r)
        if not si.folders or not si.folders[0].supported:
            raise ArchiveParseError("7z: unsupported header codec")
        off = base + si.pack_pos
        packed = data[off : off + si.pack_sizes[0]]
        r = _Reader(_decode_folder(si.folders[0], packed))
        pid = r.number()
    if pid != K_HEADER:
        raise ArchiveParseError(f"7z: expected kHeader, got {pid}")

    si = _StreamsInfo()
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    while True:
        pid = r.number()
        if pid == K_END:
            break
        if pid == K_MAIN_STREAMS_INFO:
            si = _parse_streams_info(r)
        elif pid == K_FILES_INFO:
            names, empty_stream, empty_file = _parse_files_info(r)
        else:
            raise ArchiveParseError(f"7z: bad header prop {pid}")

    # member assembly: non-empty-stream files consume folder substreams in
    # order; folders decode lazily (a solid block decodes once, then slices)
    n_files = len(names) if names else sum(1 for e in empty_stream if not e)
    stream_files = [
        (i, names[i] if i < len(names) else f"member-{i}")
        for i in range(n_files)
        if not (i < len(empty_stream) and empty_stream[i])
    ]
    total = len(stream_files) + sum(
        1 for i in range(n_files)
        if i < len(empty_stream) and empty_stream[i]
        and _is_empty_file(i, empty_stream, empty_file)
    )

    pack_off = base + si.pack_pos
    sub_iter = iter(stream_files)
    walked = 0
    budget = MAX_TOTAL_BYTES
    for f_idx, folder in enumerate(si.folders):
        pack_size = si.pack_sizes[f_idx] if f_idx < len(si.pack_sizes) else 0
        packed = data[pack_off : pack_off + pack_size]
        pack_off += pack_size
        decoded: bytes | None = None
        if folder.supported:
            try:
                decoded = _decode_folder(folder, packed)
            except (lzma.LZMAError, OSError, ValueError, EOFError):
                decoded = None
        cursor = 0
        for size in folder.substream_sizes:
            try:
                _, name = next(sub_iter)
            except StopIteration:
                return
            if walked >= MAX_ENTRIES:
                return
            walked += 1
            member: bytes | None = None
            if (
                decoded is not None
                and size <= MAX_ENTRY_BYTES
                and size <= budget
                and cursor + size <= len(decoded)
            ):
                member = decoded[cursor : cursor + size]
                budget -= size
            cursor += size
            yield name, member, total
    # empty FILES (not directories) still surface as zero-byte members
    for i in range(n_files):
        if i < len(empty_stream) and empty_stream[i] and _is_empty_file(
            i, empty_stream, empty_file
        ):
            if walked >= MAX_ENTRIES:
                return
            walked += 1
            yield (
                names[i] if i < len(names) else f"member-{i}",
                b"",
                total,
            )


def _is_empty_file(i: int, empty_stream: list[bool], empty_file: list[bool]) -> bool:
    """empty_file bits index into the SUBSET of empty-stream records."""
    k = sum(1 for j in range(i) if empty_stream[j])
    return k < len(empty_file) and empty_file[k]
