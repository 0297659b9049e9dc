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
