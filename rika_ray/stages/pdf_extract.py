"""PDF text extraction into ordered spans (operator M5, SURVEY.md §2.2).

The reference delegates PDF parsing to Tika's PDFParser; its observable
semantics are page-ordered text with layout quirks — a leading newline and
newline-terminated lines (``/root/reference/spec/rika/parser_spec.rb:157-170``
"generated PDF has newline at beginning") plus docinfo metadata
(``spec/rika/parser_spec.rb:85-92,203-205``).

This is a from-scratch minimal PDF parser scoped to the document class our
corpus generator emits (SURVEY.md §7 risk note: "scope to the subset the
corpus generator emits; never claim general-PDF coverage"):

- classic xref layout, uncompressed or FlateDecode content streams,
- text shown with ``Tj`` / ``'`` / ``"`` / ``TJ`` operators, literal and
  hex strings, page tree via /Root → /Pages → /Kids.

Extraction spec: one span per text-showing operator, ordered (page, op);
``content`` = ``"\\n"`` + every span's text + ``"\\n"`` (see
``docgen.expected_pdf_content``). Malformed input raises ``PdfParseError``
which the pipeline converts to an ``error_type="parse_error"`` row (§2.8).

Designed to run inside an actor pool (stateful stage T2): the compiled
regexes and operator tables live on the extractor class, built once per
actor in ``__init__``.
"""

from __future__ import annotations

import re
import zlib


class PdfParseError(Exception):
    """Raised for documents this parser cannot interpret."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_TRAILER_RE = re.compile(rb"trailer\b", re.S)


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = self.data[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                break

    def parse_object(self):
        """Parse one PDF object at pos: dict / array / name / number /
        string / hex string / ref / bool / null."""
        self.skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise PdfParseError("unexpected end of data")
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if d.startswith(b"true", self.pos):
            self.pos += 4
            return True
        if d.startswith(b"false", self.pos):
            self.pos += 5
            return False
        if d.startswith(b"null", self.pos):
            self.pos += 4
            return None
        return self._parse_number_or_ref()

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self.skip_ws()
            if self.data.startswith(b">>", self.pos):
                self.pos += 2
                return out
            key = self.parse_object()
            if not isinstance(key, str) or not key.startswith("/"):
                raise PdfParseError("dict key is not a name")
            out[key] = self.parse_object()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self.skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_name(self) -> str:
        start = self.pos
        self.pos += 1
        d = self.data
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos].decode("latin-1")

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= len(d):
                    break
                e = d[self.pos]
                esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
                if e in esc:
                    out.append(esc[e])
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal
                    oct_digits = bytearray()
                    while self.pos < len(d) and len(oct_digits) < 3 and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise PdfParseError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        end = d.find(b">", self.pos)
        if end < 0:
            raise PdfParseError("unterminated hex string")
        hexpart = bytes(c for c in d[self.pos : end] if c not in _WS)
        self.pos = end + 1
        if len(hexpart) % 2:
            hexpart += b"0"
        try:
            return bytes.fromhex(hexpart.decode("ascii"))
        except ValueError as e:
            raise PdfParseError(f"bad hex string: {e}") from None

    def _parse_number_or_ref(self):
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        tok = d[start : self.pos]
        if not tok:
            raise PdfParseError(f"unparseable token at {start}")
        try:
            num = int(tok)
        except ValueError:
            try:
                return float(tok)
            except ValueError:
                raise PdfParseError(f"bad token {tok!r}") from None
        # lookahead for "gen R" → indirect reference
        save = self.pos
        self.skip_ws()
        m = re.match(rb"(\d+)\s+R\b", d[self.pos :])
        if m:
            self.pos += m.end()
            return ("ref", num)
        self.pos = save
        return num


class PdfDocument:
    """Parsed object store + page tree for one PDF file."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(b"%PDF-"):
            raise PdfParseError("missing %PDF header")
        self.data = data
        self.objects: dict[int, tuple[dict | object, bytes | None]] = {}
        self._scan_objects()
        self.trailer = self._parse_trailer()

    def _scan_objects(self) -> None:
        for m in _OBJ_RE.finditer(self.data):
            num = int(m.group(1))
            lex = _Lexer(self.data, m.end())
            try:
                obj = lex.parse_object()
            except PdfParseError:
                continue
            stream = None
            lex.skip_ws()
            if self.data.startswith(b"stream", lex.pos):
                p = lex.pos + len(b"stream")
                if self.data.startswith(b"\r\n", p):
                    p += 2
                elif self.data.startswith(b"\n", p):
                    p += 1
                length = obj.get("/Length") if isinstance(obj, dict) else None
                if isinstance(length, tuple):
                    length = self._resolve_now(length)
                if isinstance(length, int):
                    stream = self.data[p : p + length]
                else:
                    end = self.data.find(b"endstream", p)
                    if end < 0:
                        raise PdfParseError("unterminated stream")
                    stream = self.data[p:end].rstrip(b"\r\n")
            self.objects[num] = (obj, stream)
        if not self.objects:
            raise PdfParseError("no objects found")

    def _resolve_now(self, ref):
        # used only for /Length refs discovered mid-scan
        target = ref[1]
        for m in re.finditer(
            rb"(?m)^%d\s+\d+\s+obj\b" % target, self.data
        ):
            lex = _Lexer(self.data, m.end())
            return lex.parse_object()
        return None

    def _parse_trailer(self) -> dict:
        m = None
        for m in _TRAILER_RE.finditer(self.data):
            pass
        if m is None:
            raise PdfParseError("no trailer")
        lex = _Lexer(self.data, m.end())
        t = lex.parse_object()
        if not isinstance(t, dict):
            raise PdfParseError("bad trailer")
        return t

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, tuple) and len(obj) == 2 and obj[0] == "ref":
            num = obj[1]
            if num not in self.objects:
                raise PdfParseError(f"dangling reference {num}")
            obj = self.objects[num][0]
            seen += 1
            if seen > 32:
                raise PdfParseError("reference cycle")
        return obj

    def stream_for(self, ref) -> bytes:
        if not (isinstance(ref, tuple) and ref[0] == "ref"):
            raise PdfParseError("contents is not a reference")
        num = ref[1]
        if num not in self.objects:
            raise PdfParseError(f"dangling contents {num}")
        obj, stream = self.objects[num]
        if stream is None:
            raise PdfParseError(f"object {num} has no stream")
        filt = obj.get("/Filter") if isinstance(obj, dict) else None
        filt = self.resolve(filt)
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        for f in filters:
            if f == "/FlateDecode":
                try:
                    stream = zlib.decompress(stream)
                except zlib.error as e:
                    raise PdfParseError(f"flate error: {e}") from None
            else:
                raise PdfParseError(f"unsupported filter {f}")
        return stream

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("/Root"))
        if not isinstance(root, dict):
            raise PdfParseError("no catalog")
        pages_obj = self.resolve(root.get("/Pages"))
        out: list[dict] = []
        self._walk_pages(pages_obj, out, depth=0)
        if not out:
            raise PdfParseError("no pages")
        return out

    def _walk_pages(self, node, out: list, depth: int) -> None:
        if depth > 32:
            raise PdfParseError("page tree too deep")
        node = self.resolve(node)
        if not isinstance(node, dict):
            raise PdfParseError("bad page tree node")
        t = node.get("/Type")
        if t == "/Page":
            out.append(node)
        elif t == "/Pages":
            kids = self.resolve(node.get("/Kids")) or []
            for kid in kids:
                self._walk_pages(kid, out, depth + 1)
        else:
            raise PdfParseError(f"unexpected node type {t}")

    def info(self) -> dict[str, str]:
        try:
            info = self.resolve(self.trailer.get("/Info"))
        except PdfParseError:
            return {}
        if not isinstance(info, dict):
            return {}
        out = {}
        for k, v in info.items():
            if isinstance(v, bytes):
                out[k] = _decode_pdf_string(v)
        return out


def _decode_pdf_string(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    return b.decode("latin-1")


# text-showing operators inside a content stream
def _extract_page_lines(stream: bytes) -> list[str]:
    lex = _Lexer(stream)
    lines: list[str] = []
    stack: list = []
    d = stream
    n = len(d)
    while True:
        lex.skip_ws()
        if lex.pos >= n:
            break
        c = d[lex.pos]
        if c in b"(<[/" or (0x30 <= c <= 0x39) or c in b"+-.":
            try:
                stack.append(lex.parse_object())
            except PdfParseError:
                lex.pos += 1
            continue
        # operator token
        start = lex.pos
        while lex.pos < n and d[lex.pos] not in _WS and d[lex.pos] not in _DELIM:
            lex.pos += 1
        op = d[start : lex.pos]
        if lex.pos == start:  # stray delimiter
            lex.pos += 1
            continue
        if op == b"Tj" or op == b"'":
            if stack and isinstance(stack[-1], bytes):
                lines.append(_decode_pdf_string(stack[-1]))
        elif op == b'"':
            if stack and isinstance(stack[-1], bytes):
                lines.append(_decode_pdf_string(stack[-1]))
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                parts = [
                    _decode_pdf_string(x)
                    for x in stack[-1]
                    if isinstance(x, bytes)
                ]
                lines.append("".join(parts))
        stack.clear()
    return lines


def extract_pdf(data: bytes) -> tuple[str, list[dict], dict[str, str]]:
    """Extract (content, spans, metadata) from PDF bytes.

    Raises PdfParseError on malformed input — caller maps it to an
    ``error_type="parse_error"`` row.
    """
    doc = PdfDocument(data)
    pages = doc.pages()
    spans: list[dict] = []
    parts = ["\n"]  # the reference's leading-newline quirk (parser_spec.rb:157-162)
    for page_idx, page in enumerate(pages):
        contents = page.get("/Contents")
        refs = contents if isinstance(contents, list) else [contents]
        stream = b"".join(doc.stream_for(r) for r in refs if r is not None)
        for order, line in enumerate(_extract_page_lines(stream)):
            spans.append(
                {"page": page_idx, "order": order, "kind": "line", "text": line}
            )
            parts.append(line + "\n")
    content = "".join(parts)

    info = doc.info()
    metadata: dict[str, str] = {"xmpTPg:NPages": str(len(pages))}
    if "/Title" in info:
        metadata["dc:title"] = info["/Title"]
    if "/Author" in info:
        metadata["dc:creator"] = info["/Author"]
    if "/Producer" in info:
        metadata["pdf:producer"] = info["/Producer"]
    if "/Subject" in info:
        metadata["dc:description"] = info["/Subject"]
    if "/Creator" in info:
        metadata["xmp:CreatorTool"] = info["/Creator"]
    return content, spans, metadata
