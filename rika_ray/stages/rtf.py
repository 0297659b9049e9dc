"""RTF text + metadata extraction (format-breadth slice of operator M6).

The reference handles RTF through Tika's ``RTFParser``
(``/root/reference/lib/rika/parser.rb:21`` routes every format through
``DefaultDetector`` + ``AutoDetectParser``). Re-implemented here from the
public RTF 1.9 specification: group-stack state machine over a one-pass
regex tokenizer (no per-character Python loop) handling ``\\par``/
``\\line`` paragraph breaks, ``\\'hh`` codepage escapes (``\\ansicpg``
selects the codepage), ``\\uN`` Unicode escapes with the ``\\ucN``
fallback-skip protocol, and skip-destinations (``fonttbl``, ``colortbl``,
``info`` …, and any ``{\\*`` group not explicitly known).

Extraction spec: each paragraph newline-terminated, like the other
word-processor kernels (``docgen.expected_rtf_content``). ``\\info``
``\\title``/``\\author`` surface as ``dc:title``/``dc:creator``.
"""

from __future__ import annotations

import re


class RtfParseError(Exception):
    pass


# one token per match: hex escape | control word | control symbol |
# group delimiter | plain-text run
_TOKEN_RE = re.compile(
    rb"\\'[0-9a-fA-F]{2}"
    rb"|\\[a-zA-Z]+-?\d* ?"
    rb"|\\[^a-zA-Z]"
    rb"|[{}]"
    rb"|[^\\{}]+"
)

_CTRL_RE = re.compile(rb"\\([a-zA-Z]+)(-?\d+)? ?$")

# destination groups whose content is never document text
_SKIP_DESTS = frozenset(
    b"fonttbl colortbl stylesheet info pict object header footer headerl "
    b"headerr headerf footerl footerr footerf field fldinst themedata "
    b"colorschememapping latentstyles datastore xmlnstbl listtable "
    b"listoverridetable rsidtbl generator".split()
)

# \info sub-destinations captured as metadata
_META_DESTS = {b"title": "dc:title", b"author": "dc:creator"}

_CP_CODECS = {
    1250: "cp1250", 1251: "cp1251", 1252: "cp1252", 1253: "cp1253",
    1254: "cp1254", 1255: "cp1255", 1256: "cp1256", 1257: "cp1257",
    932: "cp932", 936: "gbk", 949: "cp949", 950: "big5",
}


def extract_rtf(data: bytes) -> tuple[str, list[dict], dict[str, str]]:
    """(content, spans, metadata) from RTF bytes. Raises RtfParseError on
    a payload without the RTF signature; is total on anything carrying it
    (unknown control words are ignored per spec)."""
    if not data.startswith(b"{\\rtf"):
        raise RtfParseError("missing {\\rtf signature")

    codec = "cp1252"
    # group stack entries: [skipping, uc_skip_count, meta_dest_key]
    stack: list[list] = []
    skipping = False
    uc_skip = 1
    meta_dest: str | None = None
    pending_skip = 0  # bytes to swallow after \uN (uc fallback protocol)
    star_pending = False  # just saw {\* — next control word names the dest

    paragraphs: list[str] = []
    cur: list[str] = []
    meta: dict[str, str] = {}
    meta_buf: dict[str, list[str]] = {}

    def _emit(text: str) -> None:
        nonlocal pending_skip
        if pending_skip:
            drop = min(pending_skip, len(text))
            text = text[drop:]
            pending_skip -= drop
        if not text:
            return
        if meta_dest is not None:
            meta_buf.setdefault(meta_dest, []).append(text)
        elif not skipping:
            cur.append(text)

    def _end_para() -> None:
        if not skipping and meta_dest is None:
            paragraphs.append("".join(cur))
            cur.clear()

    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        c0 = tok[0]
        if c0 == 0x7B:  # {
            stack.append([skipping, uc_skip, meta_dest])
            star_pending = False
            continue
        if c0 == 0x7D:  # }
            if stack:
                skipping, uc_skip, meta_dest = stack.pop()
            star_pending = False
            continue
        if c0 != 0x5C:  # plain text run
            # raw CR/LF in the file are formatting, not document text
            tok = tok.replace(b"\r", b"").replace(b"\n", b"")
            if tok:
                _emit(tok.decode(codec, errors="replace"))
            continue
        # control sequences
        if tok.startswith(b"\\'"):
            _emit(bytes([int(tok[2:4], 16)]).decode(codec, errors="replace"))
            continue
        cm = _CTRL_RE.match(tok)
        if cm:
            word, num = cm.group(1), cm.group(2)
            if star_pending:
                # {\*\unknowndest ...}: skip unless a known meta dest
                star_pending = False
                if word not in _META_DESTS:
                    skipping = True
            if word == b"par" or word == b"line":
                _end_para()
            elif word == b"tab":
                _emit("\t")
            elif word == b"u" and num is not None:
                cp = int(num)
                if cp < 0:
                    cp += 65536
                _emit(chr(cp) if 0 <= cp < 0x110000 else "\ufffd")
                pending_skip = uc_skip
            elif word == b"uc" and num is not None:
                uc_skip = max(0, int(num))
            elif word == b"ansicpg" and num is not None:
                codec = _CP_CODECS.get(int(num), "cp1252")
            elif word in _SKIP_DESTS:
                skipping = True
            elif word in _META_DESTS:
                meta_dest = _META_DESTS[word]
            continue
        # control symbols
        sym = tok[1:2]
        if sym == b"*":
            star_pending = True
        elif sym in (b"\\", b"{", b"}"):
            _emit(sym.decode("ascii"))
        elif sym == b"~":
            _emit("\u00a0")
        elif sym == b"-":
            pass  # optional hyphen: no text
        elif sym == b"_":
            _emit("\u2011")
        # other symbols (e.g. \\\n line continuations) contribute nothing

    if cur and "".join(cur).strip():
        paragraphs.append("".join(cur))

    for key, parts in meta_buf.items():
        val = "".join(parts).strip()
        if val:
            meta[key] = val
    paragraphs = [p for p in paragraphs]
    spans = [
        {"page": 0, "order": i, "kind": "p", "text": p}
        for i, p in enumerate(paragraphs)
    ]
    content = "".join(p + "\n" for p in paragraphs)
    return content, spans, meta
