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
WIN1250 = "windows-1250"
WIN1251 = "windows-1251"
WIN1252 = "windows-1252"
WIN1255 = "windows-1255"
WIN1256 = "windows-1256"
ISO88597 = "ISO-8859-7"
TIS620 = "TIS-620"
KOI8R = "KOI8-R"
SHIFT_JIS = "Shift_JIS"
GB18030 = "GB18030"
BIG5 = "Big5"
EUCKR = "EUC-KR"
EUCJP = "EUC-JP"
ISO2022JP = "ISO-2022-JP"

_CODEC = {
    UTF16LE: "utf-16-le",
    UTF16BE: "utf-16-be",
    UTF8: "utf-8",
    LATIN1: "iso-8859-1",
    WIN1250: "cp1250",
    WIN1251: "cp1251",
    WIN1252: "cp1252",
    WIN1255: "cp1255",
    WIN1256: "cp1256",
    ISO88597: "iso8859_7",
    TIS620: "tis_620",
    KOI8R: "koi8-r",
    SHIFT_JIS: "shift_jis",
    GB18030: "gb18030",
    BIG5: "big5",
    EUCKR: "euc_kr",
    EUCJP: "euc_jp",
    ISO2022JP: "iso2022_jp",
}

# The seven most frequent Russian letters cover >40% of running text; their
# lowercase forms live at 0xE0+ in cp1251 but 0xC0-0xDF in KOI8-R, so a
# common-lowercase score cleanly separates the two. Per-script common-letter
# sets below are the same idea for the other legacy codepages: each codec
# decodes bytes into its OWN script, so one union set is safe — text under
# the right codec concentrates on its script's common letters, text under a
# wrong codec scatters across that script's full alphabet.
_RU_COMMON = set("оеаинтсрвлкмдпу")
_LATIN_COMMON = set("éèêëàâäçôöîïûüùñåæøßãóáíúý")
# Central European (cp1250): Polish/Czech/Hungarian accents whose bytes are
# typography or controls under latin-1/cp1252 — the separating signal
_CE_COMMON = set("ąćęłńśźżčďěňřšťůžőű")
# Top-frequency letters ONLY (≈ the top dozen of each script) — a set that
# covers most of the alphabet can't separate right-codec concentration
# from wrong-codec scatter
_EL_COMMON = set("αοετισνηρκπυάίό")
_AR_COMMON = set("اليمونهرتبكد")
_HE_COMMON = set("יהולארתשבמענ")
_TH_COMMON = set("ารนเอิกงมยลวสด่้")

# Per-codec scoring profile: (common letters, in-script predicate). Letters
# OUTSIDE the codec's primary script score low — mixed-script codepages
# (cp1256 carries Latin accents alongside Arabic) would otherwise score
# foreign text on their secondary script.
def _in_latin(ch: str) -> bool:
    return ch <= "\u024f"


def _in_cyrillic(ch: str) -> bool:
    return "\u0400" <= ch <= "\u04ff"


_PROFILE = {
    "cp1251": (_RU_COMMON, _in_cyrillic),
    "koi8-r": (_RU_COMMON, _in_cyrillic),
    "cp1252": (_LATIN_COMMON, _in_latin),
    "latin_1": (_LATIN_COMMON, _in_latin),
    "cp1250": (_LATIN_COMMON | _CE_COMMON, _in_latin),
    "iso8859_7": (_EL_COMMON, lambda ch: "\u0370" <= ch <= "\u03ff"),
    "cp1256": (_AR_COMMON, lambda ch: "\u0600" <= ch <= "\u06ff"),
    "cp1255": (_HE_COMMON, lambda ch: "\u0590" <= ch <= "\u05ff"),
    "tis_620": (_TH_COMMON, lambda ch: "\u0e00" <= ch <= "\u0e7f"),
}
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
    common, in_script = _PROFILE[codec]
    if ch in common:
        return 2.0
    if ch.isalpha():
        if not in_script(ch):
            return 0.2  # plausible only as quoted foreign words
        # caseless scripts (Thai, Arabic, Hebrew) are running-text letters,
        # not "uppercase": only genuinely uppercase letters get the penalty
        return 0.4 if ch.isupper() else 1.0
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
            codec: np.array(
                [_byte_weight(b, codec) if b >= 0x80 else 0.0
                 for b in range(256)], dtype=np.float32)
            for codec in (
                "cp1251", "koi8-r", "cp1252", "cp1250", "latin_1",
                "iso8859_7", "cp1256", "cp1255", "tis_620",
            )
        }
        _T["ascii_letter"] = ascii_letter
        _T["letterish"] = ascii_letter | high
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


# ---------------------------------------------------------------------------
# CJK multi-byte candidates (GB18030 / Big5 / EUC-KR)
#
# ICU-style recognition (the reference's detector family): C-speed strict
# decode of a bounded window (= structural unit validation), expected-script
# dominance of the decode, and a COMMON-CHARACTER frequency gate. The gate is
# the load-bearing part: the 94×94 GR planes make any run of 0xA1-0xFE byte
# pairs structurally valid in all three encodings (and in cp1251/KOI8-R as
# single bytes), but text decoded under the WRONG codec scatters uniformly
# over the plane, so its hit rate against the language's most frequent
# characters stays near 100/8836 ≈ 1%, while real text concentrates 20-60%
# of running characters in that set.
# ---------------------------------------------------------------------------

# Most frequent running-text characters (public frequency lists).
_ZH_SIMP_COMMON = (
    "的一是不了在人有我他这个上们来到时大地为子中你说生国年着就那和要她"
    "出也得里后自以会家可下而过天去能对小多然于心学么之都好看起发当没成"
    "只如事把还用第样道想作种开美总从无情己面最女但现前些所同日手又行意"
    "动方期它头经长儿回位分爱老因很给名法间斯知世什两次使身者被高已亲其"
)
_ZH_TRAD_COMMON = (
    "的一是不了在人有我他這個上們來到時大地為子中你說生國年著就那和要她"
    "出也得裡後自以會家可下而過天去能對小多然於心學麼之都好看起發當沒成"
    "只如事把還用第樣道想作種開美總從無情己面最女但現前些所同日手又行意"
    "動方期它頭經長兒回位分愛老因很給名法間斯知世什兩次使身者被高已親其"
)
_KO_COMMON = (
    "이다의에는하을를가고지서기도로사아니것수있그대한때문제들어자저나요"
    "말만사람중또같습니까게네와과라서면으며부터처럼보다안된해였습니다였"
    "거주요즘좀잘못더많거의"
)
# Japanese running text is kana-dominated (all of hiragana + common
# katakana) plus the most frequent kanji — kana membership is the cleanly
# separating signal vs the Chinese tables above.
_JA_COMMON = (
    "あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほまみむめ"
    "もやゆよらりるれろわをんがぎぐげござじずぜぞだぢづでどばびぶべぼぱぴ"
    "ぷぺぽゃゅょっアイウエオカキクケコサシスセソタチツテトナニヌネノハヒ"
    "フヘホマミムメモヤユヨラリルレロワヲンガギグゲゴザジズゼゾダヂヅデド"
    "バビブベボパピプペポャュョッー"
    "日本人年月時大中国出生子分上下前後間東京語学会社行見言事思手新聞電車"
)


def _codepoints(s: str):
    import numpy as np

    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


_CJK_T = None


def _cjk_tables():
    global _CJK_T
    if _CJK_T is None:
        import numpy as np

        _CJK_T = {
            "gb18030": np.unique(_codepoints(_ZH_SIMP_COMMON)),
            "big5": np.unique(_codepoints(_ZH_TRAD_COMMON)),
            "euc_kr": np.unique(_codepoints(_KO_COMMON)),
            "euc_jp": np.unique(_codepoints(_JA_COMMON)),
        }
    return _CJK_T


def _strict_decode_window(win: bytes, codec: str, truncated: bool):
    """Structural validation at C speed: a strict decode of the window.
    A unit cut in half by the WINDOW edge is tolerated; a decode error
    anywhere else (including a genuinely truncated file) rejects."""
    try:
        return win.decode(codec)
    except UnicodeDecodeError as e:
        if truncated and e.start >= len(win) - 4:
            try:
                return win[: e.start].decode(codec)
            except UnicodeDecodeError:
                return None
        return None


def _detect_cjk_mb(sample: bytes) -> str | None:
    """Best GB18030/Big5/EUC-KR candidate, or None when no candidate is
    structurally valid, script-dominant AND above the common-character
    frequency gate. Vectorized over decoded codepoints."""
    import numpy as np

    arr = np.frombuffer(sample, dtype=np.uint8)
    if int((arr >= 0x80).sum()) < 6:  # need ≥3 multi-byte units to decide
        return None
    win = sample[:2048]
    truncated = len(sample) > 2048
    best_name, best_ratio = None, 0.0
    for codec, name, ranges in (
        ("euc_kr", EUCKR, ((0xAC00, 0xD7A3),)),  # Hangul syllables
        ("gb18030", GB18030, ((0x4E00, 0x9FFF),)),  # Han
        ("big5", BIG5, ((0x4E00, 0x9FFF),)),  # Han
        # kana OR Han: Japanese running text mixes both scripts
        ("euc_jp", EUCJP, ((0x3040, 0x30FF), (0x4E00, 0x9FFF))),
    ):
        decoded = _strict_decode_window(win, codec, truncated)
        if not decoded:
            continue
        cp = _codepoints(decoded)
        non_ascii = cp[cp >= 0x80]
        if non_ascii.size == 0:
            continue
        script = (non_ascii >= 0x3000) & (non_ascii <= 0x303F)  # CJK punct
        for lo, hi in ranges:
            script |= (non_ascii >= lo) & (non_ascii <= hi)
        if float(script.mean()) < 0.5:
            continue
        ratio = float(np.isin(non_ascii, _cjk_tables()[codec]).mean())
        if ratio > best_ratio:
            best_name, best_ratio = name, ratio
    return best_name if best_ratio >= 0.2 else None


def detect_charset(data: bytes) -> str:
    if data.startswith(b"\xff\xfe"):
        return UTF16LE
    if data.startswith(b"\xfe\xff"):
        return UTF16BE
    if data.startswith(b"\xef\xbb\xbf"):
        return UTF8
    # ISO-2022-JP is pure 7-bit (it would pass the UTF-8 strict decode), so
    # its JIS X 0208 shift-in escapes are checked FIRST — the sequences
    # ESC $ B / ESC $ @ never occur in real UTF-8/ASCII text
    if (b"\x1b$B" in data[:8192] or b"\x1b$@" in data[:8192]):
        decoded = _strict_decode_window(
            data[:2048], "iso2022_jp", len(data) > 2048
        )
        if decoded:
            return ISO2022JP
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
        # a pure-high "word" must be a RUN (≥2 bytes): script words are
        # multi-byte, while Latin text sprinkles isolated high bytes —
        # standalone à, «, — , € — that would otherwise masquerade as
        # script words and drag Western pages into the script branch
        long_enough = (ends - starts) >= 2
        pure_high_words = int((has_high & ~has_ascii & long_enough).sum())
        mixed_words = int((has_high & has_ascii).sum())

    # GB18030/Big5/EUC-KR candidate computed once; consulted BEFORE the
    # Cyrillic scoring (EUC-KR Hangul bytes land on the KOI8-R lowercase
    # plane and can clear its frequency bar) — safe because Cyrillic text
    # under a CJK codec scatters uniformly and never clears the 20%
    # common-character gate.
    cjk = _detect_cjk_mb(sample)
    if pure_high_words > mixed_words:
        if cjk is not None:
            return cjk
        # pure-high-byte words: non-Latin single-byte candidates next —
        # Cyrillic (two case-plane-swapped layouts), Greek, Arabic, Hebrew,
        # Thai. Their letter-frequency signal must outrank SJIS's
        # structural one (Russian cp1251 lowercase pairs parse as valid
        # SJIS kanji units, and KOI8-R lowercase aliases SJIS half-width
        # kana byte-for-byte). Frequency separates the scripts: text under
        # the right codec concentrates on its script's common letters,
        # under a wrong codec it scatters across the full alphabet.
        best, score = None, 0.0
        for codec, name in (
            ("cp1251", WIN1251),
            ("koi8-r", KOI8R),
            ("iso8859_7", ISO88597),
            ("cp1256", WIN1256),
            ("cp1255", WIN1255),
            ("tis_620", TIS620),
        ):
            s = _score_single_byte(sample, codec)
            if s > score:
                best, score = name, s
        if best is not None and score >= 0.8:
            return best
    # SJIS before the Latin fallback: hiragana trail bytes live in the
    # ASCII-letter range, so Japanese text registers as "mixed words"
    if _looks_like_shift_jis(sample):
        return SHIFT_JIS
    # Big5 trail bytes 0x40-0x7E also register as mixed words — consult
    # the CJK candidate on this path too (after SJIS: Japanese double-byte
    # units are structurally valid GBK, the reverse check is stronger)
    if cjk is not None:
        return cjk
    # Latin family. Central European cp1250 first, and only on a clear
    # margin: its accents (ł ż ą č ř ...) land on typography/controls under
    # latin-1/cp1252, so CE text scores visibly higher under cp1250 while
    # Western text ties or wins under cp1252 (shared é è ô positions).
    s1250 = _score_single_byte(sample, "cp1250")
    s1252 = _score_single_byte(sample, "cp1252")
    slat1 = _score_single_byte(sample, "latin_1")
    if s1250 >= max(s1252, slat1) + 0.25:
        return WIN1250
    # cp1252 only when the 0x80-0x9F typographic block is actually used
    # (otherwise the two are byte-identical in practice and ISO-8859-1 is
    # the reference's reported fallback)
    if any(b in _CP1252_TYPO for b in sample):
        if s1252 >= 0.0:
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
