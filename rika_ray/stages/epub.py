"""EPUB text + metadata extraction (format breadth, SURVEY.md §2.2 M6
family).

The reference handles EPUB via Tika's ``EpubParser`` behind the same
``Rika.parse`` surface (``/root/reference/lib/rika/parser.rb:21-29`` —
every format Tika's DefaultDetector recognises flows through one parse
call). Re-implemented here from the public OCF/OPF specs: the container is
a ZIP whose mandated first member ``mimetype`` holds
``application/epub+zip`` (detected in ``stages/sniff.py`` by the same
anchored first-local-file-header read as ODF); ``META-INF/container.xml``
names the OPF package file; the OPF ``<spine>`` fixes reading order and
``<metadata>`` carries Dublin Core title/creator.

Extraction spec: for each spine document in order, every paragraph or
heading element's flattened text, newline-terminated — the same
paragraph-per-line convention as the DOCX/ODT/RTF kernels
(``docgen.expected_epub_content``).
"""

from __future__ import annotations

import posixpath
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO


class EpubParseError(Exception):
    pass


_CNT_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"
_XHTML_NS = "{http://www.w3.org/1999/xhtml}"

_BLOCK_TAGS = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote"}


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if tag.startswith("{") else tag


def extract_epub(data: bytes) -> tuple[str, list[dict], dict[str, str]]:
    """(content, spans, metadata) from EPUB bytes. Raises EpubParseError on
    a malformed package (caller maps it to a ``parse_error`` row)."""
    try:
        zf = zipfile.ZipFile(BytesIO(data))
    except zipfile.BadZipFile as e:
        raise EpubParseError(f"bad zip: {e}") from None
    names = set(zf.namelist())
    if "META-INF/container.xml" not in names:
        raise EpubParseError("no META-INF/container.xml")
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
    except ET.ParseError as e:
        raise EpubParseError(f"bad container.xml: {e}") from None
    rootfile = container.find(f".//{_CNT_NS}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise EpubParseError("no rootfile in container.xml")
    opf_path = rootfile.get("full-path")
    if opf_path not in names:
        raise EpubParseError(f"rootfile {opf_path!r} missing from package")
    try:
        opf = ET.fromstring(zf.read(opf_path))
    except ET.ParseError as e:
        raise EpubParseError(f"bad OPF: {e}") from None
    opf_dir = posixpath.dirname(opf_path)

    metadata: dict[str, str] = {}
    title = opf.findtext(f".//{_DC_NS}title")
    creator = opf.findtext(f".//{_DC_NS}creator")
    if title:
        metadata["dc:title"] = title
    if creator:
        metadata["dc:creator"] = creator

    manifest = {
        item.get("id"): item.get("href")
        for item in opf.iter(f"{_OPF_NS}item")
        if item.get("id") and item.get("href")
    }
    spine_hrefs = [
        manifest[ref.get("idref")]
        for ref in opf.iter(f"{_OPF_NS}itemref")
        if ref.get("idref") in manifest
    ]

    paragraphs: list[str] = []
    spans: list[dict] = []
    for page, href in enumerate(spine_hrefs):
        member = posixpath.normpath(posixpath.join(opf_dir, href))
        if member not in names:
            continue
        try:
            doc = ET.fromstring(zf.read(member))
        except ET.ParseError:
            continue  # a damaged chapter skips; the book keeps extracting
        for order, el in enumerate(
            e for e in doc.iter() if _localname(e.tag) in _BLOCK_TAGS
        ):
            text = "".join(el.itertext())
            spans.append(
                {"page": page, "order": order, "kind": "p", "text": text}
            )
            paragraphs.append(text)
    content = "".join(p + "\n" for p in paragraphs)
    return content, spans, metadata
