"""Audio (MP3/ID3) metadata extraction (format breadth, SURVEY.md §2.2 M7
family).

The reference surfaces MP3 tag metadata through Tika's ``Mp3Parser``
(title/artist/album under XMPDM keys) with empty content — the same
no-text-format convention its image specs pin
(``/root/reference/spec/rika/parser_spec.rb:186-188,214-217``).
Re-implemented from the public ID3v2.3/2.4 layouts: header ``ID3`` +
version + syncsafe size, then frames of (id, size, flags, payload); text
frames carry a leading encoding byte (0 = latin-1, 1 = UTF-16 with BOM,
2 = UTF-16BE, 3 = UTF-8). Header-bounded read — O(tag size), never the
audio body.
"""

from __future__ import annotations

import struct


class AudioParseError(Exception):
    pass


_FRAME_KEYS = {
    "TIT2": "dc:title",
    "TPE1": "xmpDM:artist",
    "TALB": "xmpDM:album",
    "TCON": "xmpDM:genre",
}

_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(raw: bytes) -> int:
    return (raw[0] << 21) | (raw[1] << 14) | (raw[2] << 7) | raw[3]


def _decode_text_frame(payload: bytes) -> str:
    if not payload:
        return ""
    codec = _ENCODINGS.get(payload[0], "latin-1")
    return payload[1:].decode(codec, errors="replace").rstrip("\x00")


def extract_mp3(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata from ID3v2 text frames). A sync-only
    MP3 (no ID3 tag) yields empty metadata; a structurally broken tag
    raises AudioParseError (caller maps it to a parse_error row)."""
    metadata: dict[str, str] = {}
    if data.startswith(b"ID3"):
        if len(data) < 10:
            raise AudioParseError("truncated ID3v2 header")
        major = data[3]
        tag_size = _syncsafe(data[6:10])
        end = min(10 + tag_size, len(data))
        pos = 10
        while pos + 10 <= end:
            frame_id = data[pos : pos + 4]
            if frame_id == b"\x00\x00\x00\x00":
                break  # padding
            if not frame_id.isalnum():
                raise AudioParseError(f"bad ID3 frame id {frame_id!r}")
            raw_size = data[pos + 4 : pos + 8]
            size = _syncsafe(raw_size) if major >= 4 else struct.unpack(
                ">I", raw_size
            )[0]
            payload = data[pos + 10 : pos + 10 + size]
            if len(payload) != size:
                raise AudioParseError("ID3 frame overruns tag")
            key = _FRAME_KEYS.get(frame_id.decode("ascii"))
            if key is not None:
                metadata[key] = _decode_text_frame(payload)
            pos += 10 + size
    return "", [], metadata


def extract_wav(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata) from a RIFF/WAVE header — the Tika
    AudioParser surface (sample rate / channels / bits / duration under
    XMPDM keys), re-implemented from the public RIFF WAVE layout. Chunk
    walk is header-bounded: it stops at the ``data`` chunk without reading
    the samples."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioParseError("not a RIFF/WAVE file")
    metadata: dict[str, str] = {}
    byte_rate = data_size = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        csize = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate, brate, _align, bits = struct.unpack(
                "<HIIHH", body[2:16]
            )
            metadata["xmpDM:audioSampleRate"] = str(rate)
            metadata["xmpDM:audioChannelType"] = (
                "Mono" if channels == 1 else "Stereo" if channels == 2 else str(channels)
            )
            metadata["bits"] = str(bits)
            byte_rate = brate or None
        elif cid == b"data":
            data_size = csize
            break  # samples follow; nothing after them is needed
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if byte_rate and data_size is not None:
        metadata["xmpDM:duration"] = f"{data_size / byte_rate:.2f}"
    if not metadata:
        raise AudioParseError("no fmt chunk")
    return "", [], metadata


def extract_flac(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata) from the FLAC STREAMINFO block
    (public FLAC format spec): sample rate 20 bits, channels 3 bits + 1,
    bits-per-sample 5 bits + 1, total samples 36 bits, bit-packed from
    STREAMINFO offset 10."""
    if data[:4] != b"fLaC" or len(data) < 4 + 4 + 34:
        raise AudioParseError("not a FLAC file")
    btype = data[4] & 0x7F
    if btype != 0:
        raise AudioParseError("first block is not STREAMINFO")
    si = data[8 : 8 + 34]
    packed = int.from_bytes(si[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise AudioParseError("zero sample rate")
    metadata = {
        "xmpDM:audioSampleRate": str(rate),
        "xmpDM:audioChannelType": (
            "Mono" if channels == 1 else "Stereo" if channels == 2 else str(channels)
        ),
        "bits": str(bits),
    }
    if total:
        metadata["xmpDM:duration"] = f"{total / rate:.2f}"
    return "", [], metadata


def extract_avi(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata) from the AVI main header (public
    RIFF/AVI spec): dims, frame count and duration from the ``avih``
    chunk inside LIST hdrl — the Tika-style empty-content media surface
    (video frames are the multimodal pipeline's job)."""
    import struct as _struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AudioParseError("not an AVI file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (clen,) = _struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"LIST" and data[pos + 8 : pos + 12] == b"hdrl":
            inner = pos + 12
            if data[inner : inner + 4] != b"avih":
                break
            (alen,) = _struct.unpack("<I", data[inner + 4 : inner + 8])
            body = data[inner + 8 : inner + 8 + alen]
            if len(body) < 40:
                raise AudioParseError("AVI: short avih")
            us_pf, _mb, _pad, _flags, total, _init, _streams, _buf, w, h = (
                _struct.unpack("<10I", body[:40])
            )
            metadata = {
                "tiff:ImageWidth": str(w),
                "tiff:ImageLength": str(h),
                "xmpDM:videoFrameCount": str(total),
            }
            if us_pf:
                metadata["xmpDM:duration"] = f"{total * us_pf / 1e6:.2f}"
            return "", [], metadata
        pos += 8 + clen + (clen & 1)
    raise AudioParseError("AVI: no avih header")


def extract_ogg(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata) from the Vorbis identification
    header in the first Ogg page (public Ogg/Vorbis specs): ``OggS`` page
    header (segment table length at byte 26), first packet
    ``\\x01vorbis`` + version u32 + channels u8 + rate u32le."""
    if data[:4] != b"OggS" or len(data) < 28:
        raise AudioParseError("not an Ogg stream")
    n_segs = data[26]
    packet = data[27 + n_segs :]
    if packet[:7] != b"\x01vorbis" or len(packet) < 16:
        # non-vorbis ogg (theora/opus/flac-in-ogg): container only
        return "", [], {"ogg:codec": "unknown"}
    channels = packet[11]
    rate = struct.unpack("<I", packet[12:16])[0]
    if rate == 0:
        raise AudioParseError("zero sample rate")
    return "", [], {
        "xmpDM:audioSampleRate": str(rate),
        "xmpDM:audioChannelType": (
            "Mono" if channels == 1 else "Stereo" if channels == 2 else str(channels)
        ),
        "ogg:codec": "vorbis",
    }


def extract_mp4(data: bytes) -> tuple[str, list, dict[str, str]]:
    """(content="", spans=[], metadata) from an ISO BMFF (MP4) box tree —
    the Tika MP4Parser surface: duration from ``moov/mvhd`` (timescale +
    duration fields, version 0 or 1 layouts), frame dimensions from the
    first video ``trak``'s ``tkhd`` (16.16 fixed point). Box walk is
    offset arithmetic only — ``mdat`` (the media payload) is skipped by
    size, never read."""

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack(">I", buf[pos : pos + 4])[0]
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if pos + 16 > end:
                    break
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr or pos + size > end:
                raise AudioParseError("mangled mp4 box")
            yield btype, pos + hdr, pos + size
            pos += size

    if data[4:8] != b"ftyp":
        raise AudioParseError("no ftyp box")
    metadata: dict[str, str] = {}
    brand = data[8:12].decode("ascii", errors="replace").strip()
    if brand:
        metadata["mp4:major-brand"] = brand
    for btype, bstart, bend in walk(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ctype, cstart, cend in walk(data, bstart, bend):
            if ctype == b"mvhd":
                ver = data[cstart]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[cstart + 20 : cstart + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[cstart + 12 : cstart + 20]
                    )
                if ts:
                    metadata["xmpDM:duration"] = f"{dur / ts:.2f}"
            elif ctype == b"trak" and "tiff:ImageWidth" not in metadata:
                for ttype, tstart, tend in walk(data, cstart, cend):
                    if ttype != b"tkhd":
                        continue
                    ver = data[tstart]
                    # spec offsets: width/height sit after version+flags,
                    # times/track_ID/reserved/duration (v0: 20 B, v1: 32 B),
                    # 8 B reserved, layer/group/volume/reserved (8 B) and
                    # the 36-B matrix — i.e. payload offset 76 (v0) / 88 (v1)
                    off = tstart + (88 if ver == 1 else 76)
                    if off + 8 > tend:
                        continue
                    w16, h16 = struct.unpack(">II", data[off : off + 8])
                    if w16 and h16:
                        metadata["tiff:ImageWidth"] = str(w16 >> 16)
                        metadata["tiff:ImageLength"] = str(h16 >> 16)
        break
    return "", [], metadata
