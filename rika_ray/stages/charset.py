"""Charset detection + text decoding (operators M2/M3, SURVEY.md §2.2).

The reference surfaces charset detection only through the content type
(``"text/plain; charset=UTF-8"`` — ``spec/rika/parser_spec.rb:225-227``,
``README.md:245-247``); detection itself happens inside Tika, whose ICU
detector recognizes legacy single/multi-byte encodings by statistical
scoring. This module re-implements that semantics from scratch.

Normative spec (shared with the corpus generator's goldens):
- UTF-16/UTF-8 BOM wins.
- Bytes that validate as UTF-8 (ASCII included) → ``UTF-8``.
- Otherwise candidate single-byte codecs are scored by decoding the
  high-byte population and weighting character plausibility
  (common-Russian-lowercase frequency separates windows-1251 from KOI8-R,
  whose case planes are swapped; Latin text prefers windows-1252 when the
  0x80-0x9F typographic block is used, else ISO-8859-1).
- Structurally valid Shift-JIS with CJK-dominant decode wins over the
  single-byte candidates (checked first — its lead/trail structure is a
  stronger signal than letter frequencies).
- Anything inconclusive → ``ISO-8859-1`` (the universal single-byte
  fallback; every byte string decodes).
"""

from __future__ import annotations

UTF8 = "UTF-8"
UTF16LE = "UTF-16LE"
UTF16BE = "UTF-16BE"
LATIN1 = "ISO-8859-1"
WIN1251 = "windows-1251"
WIN1252 = "windows-1252"
KOI8R = "KOI8-R"
SHIFT_JIS = "Shift_JIS"

_CODEC = {
    UTF16LE: "utf-16-le",
    UTF16BE: "utf-16-be",
    UTF8: "utf-8",
    LATIN1: "iso-8859-1",
    WIN1251: "cp1251",
    WIN1252: "cp1252",
    KOI8R: "koi8-r",
    SHIFT_JIS: "shift_jis",
}

# The seven most frequent Russian letters cover >40% of running text; their
# lowercase forms live at 0xE0+ in cp1251 but 0xC0-0xDF in KOI8-R, so a
# common-lowercase score cleanly separates the two.
_RU_COMMON = set("оеаинтсрвлкмдпу")
_LATIN_COMMON = set("éèêëàâäçôöîïûüùñåæøßã")
# cp1252 0x80-0x9F typographic block (undefined: 81 8D 8F 90 9D)
_CP1252_TYPO = frozenset(
    range(0x80, 0xA0)
) - {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def _byte_weight(b: int, codec: str) -> float:
    """Reference per-byte weight (the normative scoring semantics): common
    letters strong, case-plane mismatches weak, undecodable strongly
    negative. Compiled into 256-entry numpy tables below — the hot path
    never runs this per byte."""
    try:
        ch = bytes([b]).decode(codec)
    except UnicodeDecodeError:
        return -2.0
    if ch in _RU_COMMON or ch in _LATIN_COMMON:
        return 2.0
    if "\u0430" <= ch <= "\u044f" or ch == "\u0451":  # а-я, ё
        return 1.0
    if "\u0410" <= ch <= "\u042f" or ch == "\u0401":  # А-Я, Ё
        return 0.4
    if ch.isalpha():
        return 1.0 if ch.islower() else 0.4
    if b in _CP1252_TYPO and codec == "cp1252":
        return 0.3
    if ch.isprintable() or ch in " ":
        return 0.0
    return -1.0  # control chars never appear in real text


_T = None


def _tables():
    """Lazily-compiled 256-entry lookup tables (once per process) — the
    vectorized hot path for detection."""
    global _T
    if _T is None:
        import numpy as np

        ascii_letter = np.zeros(256, dtype=bool)
        ascii_letter[0x41:0x5B] = True
        ascii_letter[0x61:0x7B] = True
        high = np.arange(256) >= 0x80
        _T = {
            "cp1251": np.array(
                [_byte_weight(b, "cp1251") if b >= 0x80 else 0.0
                 for b in range(256)], dtype=np.float32),
            "koi8-r": np.array(
                [_byte_weight(b, "koi8-r") if b >= 0x80 else 0.0
                 for b in range(256)], dtype=np.float32),
            "cp1252": np.array(
                [_byte_weight(b, "cp1252") if b >= 0x80 else 0.0
                 for b in range(256)], dtype=np.float32),
            "ascii_letter": ascii_letter,
            "letterish": ascii_letter | high,
        }
    return _T


def _score_single_byte(data: bytes, codec: str) -> float:
    """Plausibility of ``data`` under a single-byte codec: mean per-high-
    byte weight (vectorized table lookup; semantics defined by
    ``_byte_weight``)."""
    import numpy as np

    arr = np.frombuffer(data, dtype=np.uint8)
    hb = arr[arr >= 0x80]
    if hb.size == 0:
        return 0.0
    return float(_tables()[codec][hb].mean())


def _looks_like_shift_jis(data: bytes) -> bool:
    """Structural + content check: every high byte participates in a valid
    Shift-JIS unit, DOUBLE-BYTE units dominate (half-width kana alone is
    byte-identical to the KOI8-R lowercase plane), and the decode is
    full-width-CJK-dominant."""
    truncated = len(data) > 2048
    data = data[:2048]  # bounded walk; decisions don't need more
    i, dbl, single_kana = 0, 0, 0
    n = len(data)
    end = 0  # last complete-unit boundary (for the decode below)
    while i < n:
        b = data[i]
        if b < 0x80:
            i += 1
            end = i
            continue
        if (0x81 <= b <= 0x9F) or (0xE0 <= b <= 0xEF):
            if i + 1 >= n:
                if truncated:
                    break  # window cut a double-byte unit in half — fine
                return False
            t = data[i + 1]
            if not (0x40 <= t <= 0xFC and t != 0x7F):
                return False
            dbl += 1
            i += 2
            end = i
            continue
        if 0xA1 <= b <= 0xDF:  # half-width katakana, single byte
            single_kana += 1
            i += 1
            end = i
            continue
        return False
    # ≥3 double-byte units: one or two isolated accented Latin-1 bytes
    # followed by ASCII also parse as a "valid" SJIS unit
    if dbl < 3 or dbl < single_kana:
        return False
    try:
        decoded = data[:end].decode("shift_jis")
    except UnicodeDecodeError:
        return False
    cjk = sum(
        1
        for ch in decoded
        if "぀" <= ch <= "ヿ"  # hiragana/katakana
        or "一" <= ch <= "鿿"  # kanji
        or ch in "、。「」・ー！？"
    )
    non_ascii = sum(1 for ch in decoded if ord(ch) >= 0x80)
    return non_ascii > 0 and cjk / non_ascii >= 0.6


def detect_charset(data: bytes) -> str:
    if data.startswith(b"\xff\xfe"):
        return UTF16LE
    if data.startswith(b"\xfe\xff"):
        return UTF16BE
    if data.startswith(b"\xef\xbb\xbf"):
        return UTF8
    try:
        data.decode("utf-8", errors="strict")
        return UTF8
    except UnicodeDecodeError:
        pass

    sample = data[:8192]

    # WORD COMPOSITION separates the script families: Cyrillic/CJK words
    # are pure high-byte runs, while Latin words with accents mix ASCII
    # letters and isolated high bytes ("très" = t,r,0xE8,s). Density or
    # adjacency alone misclassify mostly-ASCII pages with a few Cyrillic
    # words, or accent clusters. Vectorized run analysis — this runs for
    # every non-UTF-8 document, so no per-byte Python.
    import numpy as np

    t = _tables()
    arr = np.frombuffer(sample + b" ", dtype=np.uint8)
    letterish = t["letterish"][arr]
    edges = np.diff(letterish.astype(np.int8), prepend=np.int8(0))
    starts = np.flatnonzero(edges == 1)
    pure_high_words = mixed_words = 0
    if starts.size:
        ends = np.flatnonzero(edges == -1)  # trailing space closes words
        c_high = np.concatenate(
            [[0], np.cumsum((arr >= 0x80).astype(np.int64))]
        )
        c_ascii = np.concatenate(
            [[0], np.cumsum(t["ascii_letter"][arr].astype(np.int64))]
        )
        has_high = (c_high[ends] - c_high[starts]) > 0
        has_ascii = (c_ascii[ends] - c_ascii[starts]) > 0
        pure_high_words = int((has_high & ~has_ascii).sum())
        mixed_words = int((has_high & has_ascii).sum())

    if pure_high_words > mixed_words:
        # pure-high-byte words: Cyrillic single-byte candidates first —
        # their letter-frequency signal must outrank SJIS's structural one
        # (Russian cp1251 lowercase pairs parse as valid SJIS kanji units,
        # and KOI8-R lowercase aliases SJIS half-width kana byte-for-byte)
        s1251 = _score_single_byte(sample, "cp1251")
        skoi8 = _score_single_byte(sample, "koi8-r")
        best, score = (
            (WIN1251, s1251) if s1251 >= skoi8 else (KOI8R, skoi8)
        )
        if score >= 0.8:
            return best
    # SJIS before the Latin fallback: hiragana trail bytes live in the
    # ASCII-letter range, so Japanese text registers as "mixed words"
    if _looks_like_shift_jis(sample):
        return SHIFT_JIS
    # Latin family: cp1252 only when the 0x80-0x9F typographic block is
    # actually used (otherwise the two are byte-identical in practice and
    # ISO-8859-1 is the reference's reported fallback)
    if any(b in _CP1252_TYPO for b in sample):
        if _score_single_byte(sample, "cp1252") >= 0.0:
            return WIN1252
    return LATIN1


def decode_text(data: bytes, charset: str | None = None) -> tuple[str, str]:
    """Decode bytes to str; returns (text, charset). BOMs are stripped."""
    cs = charset or detect_charset(data)
    if cs == UTF16LE:
        return data[2:].decode("utf-16-le", errors="replace"), cs
    if cs == UTF16BE:
        return data[2:].decode("utf-16-be", errors="replace"), cs
    if cs == UTF8:
        if data.startswith(b"\xef\xbb\xbf"):
            data = data[3:]
        return data.decode("utf-8", errors="replace"), cs
    return data.decode(_CODEC.get(cs, "iso-8859-1"), errors="replace"), cs
