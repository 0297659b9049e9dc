"""Charset detection + text decoding (operators M2/M3, SURVEY.md §2.2).

The reference surfaces charset detection only through the content type
(``"text/plain; charset=UTF-8"`` — ``spec/rika/parser_spec.rb:225-227``,
``README.md:245-247``); detection itself happens inside Tika. We
re-implement it: BOM check → strict UTF-8 validation → ISO-8859-1 fallback.

Normative spec (shared with the corpus generator's goldens):
- UTF-16/UTF-8 BOM wins.
- Bytes that validate as UTF-8 (ASCII included) → ``UTF-8``.
- Anything else → ``ISO-8859-1`` (the universal single-byte fallback; every
  byte string decodes).
"""

from __future__ import annotations

UTF8 = "UTF-8"
UTF16LE = "UTF-16LE"
UTF16BE = "UTF-16BE"
LATIN1 = "ISO-8859-1"


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
    return data.decode("iso-8859-1"), cs
