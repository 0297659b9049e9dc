"""Word-processor format extraction (operator M6, SURVEY.md §2.2).

The reference extracts DOC/DOCX text + format metadata (``meta:page-count``)
via Tika's POI-backed parsers
(``/root/reference/spec/rika/parser_spec.rb:153-155,199-201,240-249``).

Here: DOCX (OOXML ZIP) is parsed for real — unzip ``word/document.xml``,
walk ``w:p``/``w:t`` runs, read ``docProps/core.xml`` (title/creator) and
``docProps/app.xml`` (page count). Legacy binary DOC (OLE2) is detected
(magic ``D0CF11E0``) but text extraction is out of scope for the synthetic
web corpus — such rows get ``content=""`` with the container media type,
mirroring the unknown-binary fallback semantics.

Extraction spec: each paragraph's text, newline-terminated
(``docgen.expected_docx_content``).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from io import BytesIO


class OfficeParseError(Exception):
    pass


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"
_EP_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/extended-properties}"


def extract_docx(data: bytes) -> tuple[str, list[dict], dict[str, str]]:
    """(content, spans, metadata) from OOXML wordprocessing bytes."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
    except zipfile.BadZipFile as e:
        raise OfficeParseError(f"bad zip: {e}") from None
    names = set(zf.namelist())
    if "word/document.xml" not in names:
        raise OfficeParseError("no word/document.xml")
    try:
        root = ET.fromstring(zf.read("word/document.xml"))
    except ET.ParseError as e:
        raise OfficeParseError(f"bad document.xml: {e}") from None

    paragraphs: list[str] = []
    for p in root.iter(f"{_W_NS}p"):
        runs = [t.text or "" for t in p.iter(f"{_W_NS}t")]
        paragraphs.append("".join(runs))
    spans = [
        {"page": 0, "order": i, "kind": "p", "text": t}
        for i, t in enumerate(paragraphs)
    ]
    content = "".join(t + "\n" for t in paragraphs)

    metadata: dict[str, str] = {}
    if "docProps/core.xml" in names:
        try:
            core = ET.fromstring(zf.read("docProps/core.xml"))
            title = core.findtext(f"{_DC_NS}title")
            creator = core.findtext(f"{_DC_NS}creator")
            if title:
                metadata["dc:title"] = title
            if creator:
                metadata["dc:creator"] = creator
        except ET.ParseError:
            pass
    if "docProps/app.xml" in names:
        try:
            app = ET.fromstring(zf.read("docProps/app.xml"))
            pages = app.findtext(f"{_EP_NS}Pages")
            if pages and re.fullmatch(r"\d+", pages):
                metadata["meta:page-count"] = pages
        except ET.ParseError:
            pass
    return content, spans, metadata
