"""Deterministic byte-level document builders for the synthetic corpus.

These produce the raw ``html: binary`` payloads of the ``web_pages`` table
(FIXTURES.md §1): minimal-but-valid PDF, JPEG/PNG/GIF, DOCX and HTML
documents whose *expected* extraction output can be computed analytically by
the generator (FIXTURES.md §2) — the extractor kernels must then recover it
independently, which is what the golden tests check.

No external data, no third-party builders — everything is assembled from
format specs (PDF 1.4 / JFIF / PNG / GIF89a / OOXML) in stdlib Python.
"""

from __future__ import annotations

import struct
import zipfile
import zlib
from io import BytesIO

# ---------------------------------------------------------------------------
# PDF (minimal writer: pages of text lines, optional Flate, docinfo)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    pages: list[list[str]],
    title: str = "",
    author: str = "",
    producer: str = "rika-ray synthetic",
    compress: bool = False,
) -> bytes:
    """A minimal PDF 1.4 file: one content stream per page, each line shown
    with a Tj operator at a descending y position. ASCII text only.
    """
    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    # object numbering: 1=Catalog, 2=Pages, 3..=Page objs, then content
    # streams, then font, then info
    page_obj_nums = [3 + i for i in range(n_pages)]
    content_obj_nums = [3 + n_pages + i for i in range(n_pages)]
    font_obj = 3 + 2 * n_pages
    info_obj = font_obj + 1

    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, (pnum, cnum) in enumerate(zip(page_obj_nums, content_obj_nums)):
        objects[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cnum} 0 R /Resources << /Font << /F1 {font_obj} 0 R >> >> >>"
        ).encode()
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(pages[i]):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("ascii")
        if compress:
            stream = zlib.compress(stream)
            head = f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(stream)} >>".encode()
        objects[cnum] = head + b"\nstream\n" + stream + b"\nendstream"
    objects[font_obj] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    info_parts = []
    if title:
        info_parts.append(f"/Title ({_pdf_escape(title)})")
    if author:
        info_parts.append(f"/Author ({_pdf_escape(author)})")
    info_parts.append(f"/Producer ({_pdf_escape(producer)})")
    objects[info_obj] = f"<< {' '.join(info_parts)} >>".encode()

    out = BytesIO()
    out.write(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = out.tell()
        out.write(f"{num} 0 obj\n".encode())
        out.write(objects[num])
        out.write(b"\nendobj\n")
    xref_pos = out.tell()
    n_obj = max(objects) + 1
    out.write(f"xref\n0 {n_obj}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for num in range(1, n_obj):
        out.write(f"{offsets[num]:010d} 00000 n \n".encode())
    out.write(
        (
            f"trailer\n<< /Size {n_obj} /Root 1 0 R /Info {info_obj} 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n"
        ).encode()
    )
    return out.getvalue()


def _png_up_encode(data: bytes, columns: int) -> bytes:
    """Encode rows with the PNG Up predictor (type 2) — the row encoding
    real PDF writers use for xref streams (/Predictor 12)."""
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), columns):
        row = data[r : r + columns]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        prev = row
    return bytes(out)


def build_pdf_xrefstream(
    pages: list[list[str]],
    title: str = "",
    author: str = "",
    producer: str = "rika-ray synthetic",
) -> bytes:
    """A PDF 1.5-layout file: catalog/pages/page/font/info objects packed
    into a compressed object stream (/Type/ObjStm), FlateDecode content
    streams as raw objects, and a /Type/XRef cross-reference STREAM
    (W-encoded entries, FlateDecode + PNG Up predictor) instead of the
    classic xref table + trailer keyword. Same extracted text as
    ``build_pdf`` — ``expected_pdf_content`` applies unchanged."""
    n_pages = len(pages)
    # object numbers: 1=Catalog 2=Pages 3..=Page, then content streams,
    # font, info (all in the ObjStm except content streams), then the
    # ObjStm container and the XRef stream itself
    page_nums = [3 + i for i in range(n_pages)]
    content_nums = [3 + n_pages + i for i in range(n_pages)]
    font_num = 3 + 2 * n_pages
    info_num = font_num + 1
    objstm_num = info_num + 1
    xref_num = objstm_num + 1

    kids = " ".join(f"{n} 0 R" for n in page_nums)
    compressed_members: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()),
    ]
    for pnum, cnum in zip(page_nums, content_nums):
        compressed_members.append(
            (
                pnum,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {cnum} 0 R /Resources << /Font << /F1 "
                    f"{font_num} 0 R >> >> >>"
                ).encode(),
            )
        )
    compressed_members.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    info_parts = []
    if title:
        info_parts.append(f"/Title ({_pdf_escape(title)})")
    if author:
        info_parts.append(f"/Author ({_pdf_escape(author)})")
    info_parts.append(f"/Producer ({_pdf_escape(producer)})")
    compressed_members.append(
        (info_num, f"<< {' '.join(info_parts)} >>".encode())
    )

    # ObjStm body: header of (objnum offset) pairs, then the members
    body = bytearray()
    header_pairs = []
    for onum, ser in compressed_members:
        header_pairs.append(f"{onum} {len(body)}")
        body += ser + b" "
    header = (" ".join(header_pairs) + " ").encode()
    objstm_plain = header + bytes(body)
    objstm_z = zlib.compress(objstm_plain)
    objstm_obj = (
        f"<< /Type /ObjStm /N {len(compressed_members)} /First "
        f"{len(header)} /Length {len(objstm_z)} /Filter /FlateDecode >>"
    ).encode() + b"\nstream\n" + objstm_z + b"\nendstream"

    raw_objects: dict[int, bytes] = {objstm_num: objstm_obj}
    for i, cnum in enumerate(content_nums):
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(pages[i]):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = zlib.compress("\n".join(ops).encode("ascii"))
        raw_objects[cnum] = (
            f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode()
            + b"\nstream\n"
            + stream
            + b"\nendstream"
        )

    out = BytesIO()
    out.write(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(raw_objects):
        offsets[num] = out.tell()
        out.write(f"{num} 0 obj\n".encode())
        out.write(raw_objects[num])
        out.write(b"\nendobj\n")

    # XRef stream: W [1 2 2]; entries 0..size-1
    xref_offset = out.tell()
    offsets[xref_num] = xref_offset
    size = xref_num + 1
    rows = bytearray()

    def _row(t: int, f2: int, f3: int) -> bytes:
        return bytes([t]) + f2.to_bytes(2, "big") + f3.to_bytes(2, "big")

    member_index = {onum: i for i, (onum, _) in enumerate(compressed_members)}
    for objnum in range(size):
        if objnum == 0:
            rows += _row(0, 0, 0xFFFF)  # free-list head
        elif objnum in member_index:
            rows += _row(2, objstm_num, member_index[objnum])
        elif objnum in offsets:
            rows += _row(1, offsets[objnum], 0)
        else:
            rows += _row(0, 0, 0)
    encoded = zlib.compress(_png_up_encode(bytes(rows), columns=5))
    xref_dict = (
        f"<< /Type /XRef /Size {size} /W [1 2 2] /Index [0 {size}] "
        f"/Root 1 0 R /Info {info_num} 0 R /Length {len(encoded)} "
        f"/Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns 5 >> >>"
    ).encode()
    out.write(f"{xref_num} 0 obj\n".encode())
    out.write(xref_dict)
    out.write(b"\nstream\n" + encoded + b"\nendstream\nendobj\n")
    out.write(f"startxref\n{xref_offset}\n%%EOF\n".encode())
    return out.getvalue()


def expected_pdf_content(pages: list[list[str]]) -> str:
    """The normative text-layout spec for our PDF extractor: leading newline
    (mirroring the reference's PDF whitespace quirk,
    /root/reference/spec/rika/parser_spec.rb:157-162), one line per text
    span, every page's block newline-terminated.
    """
    parts = ["\n"]
    for page in pages:
        for line in page:
            parts.append(line + "\n")
    return "".join(parts)


# ---------------------------------------------------------------------------
# JPEG / PNG / GIF (header-level: valid magic + dimension markers)
# ---------------------------------------------------------------------------


def build_jpeg(width: int, height: int) -> bytes:
    """Minimal JFIF: SOI, APP0, SOF0 carrying dimensions, EOI. Enough
    structure for magic-byte detection and dimension metadata extraction.
    """
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # SOF0: len=11 (1 comp), precision 8, height, width, 1 component
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def build_png(width: int, height: int) -> bytes:
    ihdr_data = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    ihdr = struct.pack(">I", 13) + b"IHDR" + ihdr_data
    ihdr += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
    iend = struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    return b"\x89PNG\r\n\x1a\n" + ihdr + iend


def build_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


# ---------------------------------------------------------------------------
# DOCX (minimal OOXML package)
# ---------------------------------------------------------------------------

_DOCX_CONTENT_TYPES = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>
<Override PartName="/docProps/app.xml" ContentType="application/vnd.openxmlformats-officedocument.extended-properties+xml"/>
</Types>"""


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def build_docx(
    paragraphs: list[str], title: str = "", creator: str = "", page_count: int = 1
) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_xml_escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    ).encode()
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_xml_escape(title)}</dc:title>"
        f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
        "</cp:coreProperties>"
    ).encode()
    app = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Properties xmlns="http://schemas.openxmlformats.org/officeDocument/2006/extended-properties">'
        f"<Pages>{page_count}</Pages><Application>rika-ray synthetic</Application>"
        "</Properties>"
    ).encode()
    buf = BytesIO()
    # deterministic zip: fixed timestamps, no compression variance
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in [
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("word/document.xml", document),
            ("docProps/core.xml", core),
            ("docProps/app.xml", app),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_docx_content(paragraphs: list[str]) -> str:
    """Normative DOCX text layout: each paragraph newline-terminated."""
    return "".join(p + "\n" for p in paragraphs)


def _rtf_escape(s: str) -> str:
    """Text → RTF token stream: escape the three RTF specials, emit
    non-cp1252-ASCII chars as \\uN with a '?' fallback (uc1)."""
    out: list[str] = []
    for ch in s:
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ord(ch) < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append(f"\\'{b[0]:02x}")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp > 32767:
                    cp -= 65536
                out.append(f"\\u{cp}?")
    return "".join(out)


def build_rtf(paragraphs: list[str], title: str = "", author: str = "") -> bytes:
    """A realistic RTF 1.x document: font/color tables (skip
    destinations), \\info metadata, cp1252 + \\uN escaped body text, one
    \\par per paragraph."""
    info = ""
    if title or author:
        info = (
            "{\\info"
            + (f"{{\\title {_rtf_escape(title)}}}" if title else "")
            + (f"{{\\author {_rtf_escape(author)}}}" if author else "")
            + "}"
        )
    body = "".join(
        f"\\pard\\plain\\f0\\fs24 {_rtf_escape(p)}\\par\n" for p in paragraphs
    )
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}{\\f1\\fswiss Arial;}}"
        "{\\colortbl;\\red0\\green0\\blue0;\\red255\\green0\\blue0;}"
        "{\\stylesheet{\\s0 Normal;}}"
        "{\\*\\generator rika-ray synthetic;}"
        + info
        + "\n"
        + body
        + "}"
    )
    return doc.encode("ascii")


def expected_rtf_content(paragraphs: list[str]) -> str:
    """Normative RTF text layout: paragraph text has a leading space in
    the source (the control-word delimiter consumes it), each paragraph
    newline-terminated."""
    return "".join(p + "\n" for p in paragraphs)


_ODT_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
    '<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.text"/>'
    '<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>'
    '<manifest:file-entry manifest:full-path="meta.xml" manifest:media-type="text/xml"/>'
    "</manifest:manifest>"
).encode()


def build_odt(paragraphs: list[str], title: str = "", creator: str = "") -> bytes:
    """An OpenDocument Text package: STORED ``mimetype`` first member (the
    ODF-mandated detection anchor), content.xml with text:p paragraphs
    (some runs nested in text:span), meta.xml with dc:title/dc:creator."""
    paras_xml = []
    for i, p in enumerate(paragraphs):
        if i % 2 == 1 and len(p) > 10:
            # exercise nested-span flattening: split the RAW text (so no
            # entity is ever cut), escape each half separately
            mid = len(p) // 2
            esc = (
                _xml_escape(p[:mid])
                + '<text:span text:style-name="T1">'
                + _xml_escape(p[mid:])
                + "</text:span>"
            )
        else:
            esc = _xml_escape(p)
        paras_xml.append(f'<text:p text:style-name="Standard">{esc}</text:p>')
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:text>"
        + "".join(paras_xml)
        + "</office:text></office:body></office:document-content>"
    ).encode()
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-meta '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<office:meta>"
        f"<dc:title>{_xml_escape(title)}</dc:title>"
        f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
        "</office:meta></office:document-meta>"
    ).encode()
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        # mimetype MUST be first and STORED (uncompressed) per ODF spec
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, b"application/vnd.oasis.opendocument.text")
        for name, data in [
            ("content.xml", content),
            ("meta.xml", meta),
            ("META-INF/manifest.xml", _ODT_MANIFEST),
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_odt_content(paragraphs: list[str]) -> str:
    """Normative ODT text layout: each paragraph newline-terminated
    (nested spans flatten transparently)."""
    return "".join(p + "\n" for p in paragraphs)


# ---------------------------------------------------------------------------
# Legacy binary DOC (real CFB container + Word97 FibBase)
# ---------------------------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FATSECT = 0xFFFFFFFD
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF


def _cfb_dir_entry(
    name: str, obj_type: int, start_sector: int, size: int
) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    entry = bytearray(128)
    entry[0 : len(raw_name)] = raw_name
    struct.pack_into("<H", entry, 64, len(raw_name))
    entry[66] = obj_type  # 5=root storage, 2=stream
    entry[67] = 1  # color: black
    struct.pack_into("<iii", entry, 68, -1, -1, -1)  # left/right/child sids
    struct.pack_into("<I", entry, 116, start_sector)
    struct.pack_into("<Q", entry, 120, size)
    return bytes(entry)


def build_doc(paragraphs: list[str]) -> bytes:
    """A legacy .doc: real CFB container (512-byte sectors, FAT, directory)
    holding one ``WordDocument`` stream with a Word97 FibBase whose
    ``fcMin``/``fcMac`` (FibBase offsets 0x18/0x1C) bound a linear cp1252
    text region — the simple-save layout (no piece table). Paragraph marks
    are ``\\r`` as in Word."""
    text = "".join(p + "\r" for p in paragraphs)
    text_bytes = text.encode("cp1252", errors="replace")
    fc_min = 1024
    stream = bytearray(max(4096, fc_min + len(text_bytes)))  # ≥ minifat cutoff
    struct.pack_into("<H", stream, 0, 0xA5EC)  # wIdent: Word binary magic
    struct.pack_into("<H", stream, 2, 0x00C1)  # nFib: Word97
    struct.pack_into("<I", stream, 24, fc_min)  # fcMin
    struct.pack_into("<I", stream, 28, fc_min + len(text_bytes))  # fcMac
    stream[fc_min : fc_min + len(text_bytes)] = text_bytes

    sector = 512
    n_stream_sectors = (len(stream) + sector - 1) // sector
    stream += b"\x00" * (n_stream_sectors * sector - len(stream))
    # sector map: 0=FAT, 1=directory, 2..=WordDocument stream
    fat = [_FATSECT, _ENDOFCHAIN]
    for i in range(n_stream_sectors):
        fat.append(2 + i + 1 if i < n_stream_sectors - 1 else _ENDOFCHAIN)
    fat += [_FREESECT] * (sector // 4 - len(fat))

    directory = (
        _cfb_dir_entry("Root Entry", 5, _ENDOFCHAIN, 0)
        + _cfb_dir_entry("WordDocument", 2, 2, len(stream))
        + b"\x00" * 256
    )

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 3)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift: 512
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, 1)  # number of FAT sectors
    struct.pack_into("<I", header, 48, 1)  # first directory sector
    struct.pack_into("<I", header, 56, 4096)  # mini stream cutoff
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # first miniFAT sector
    struct.pack_into("<I", header, 64, 0)  # number of miniFAT sectors
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # first DIFAT sector
    struct.pack_into("<I", header, 72, 0)  # number of DIFAT sectors
    struct.pack_into("<I", header, 76, 0)  # DIFAT[0] = FAT at sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)

    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    return bytes(header) + fat_bytes + directory + bytes(stream)


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    """Generic small CFB container: sector 0 = FAT, then the directory
    chain (as many sectors as the entry count needs, 4 × 128-byte entries
    per sector), then the streams back to back. Bounded by one FAT sector
    (~60 KB payload) — plenty for synthetic documents."""
    sector = 512
    names = list(streams)
    n_dir_sectors = (1 + len(names) + 3) // 4  # root + streams, 4/sector
    fat = [_FATSECT]
    for i in range(n_dir_sectors):  # directory chain: sectors 1..n
        fat.append(1 + i + 1 if i < n_dir_sectors - 1 else _ENDOFCHAIN)
    dir_entries = [_cfb_dir_entry("Root Entry", 5, _ENDOFCHAIN, 0)]
    payload = b""
    next_sid = 1 + n_dir_sectors
    for name in names:
        data = streams[name]
        if len(data) < 4096:
            # pad to the mini-stream cutoff so the stream stays in the
            # regular FAT (this builder has no miniFAT)
            data = data + b"\x00" * (4096 - len(data))
        n_sec = (len(data) + sector - 1) // sector
        data = data + b"\x00" * (n_sec * sector - len(data))
        dir_entries.append(_cfb_dir_entry(name, 2, next_sid, len(data)))
        for i in range(n_sec):
            fat.append(
                next_sid + i + 1 if i < n_sec - 1 else _ENDOFCHAIN
            )
        next_sid += n_sec
        payload += data
    if len(fat) > sector // 4:
        raise ValueError("streams too large for single-FAT-sector CFB")
    fat += [_FREESECT] * (sector // 4 - len(fat))
    directory = b"".join(dir_entries)
    directory += b"\x00" * (n_dir_sectors * sector - len(directory))

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)
    struct.pack_into("<H", header, 26, 3)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, 1)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREESECT)
    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    return bytes(header) + fat_bytes + directory + payload


def build_doc_piecetable(paragraphs: list[str]) -> bytes:
    """A piece-table (complex/incremental-save) legacy .doc — the layout
    real-world Word files predominantly use: FIB with fComplex set,
    fcClx/lcbClx (FIB 0x1A2/0x1A6) pointing at a Pcdt CLX in the 0Table
    stream, text split into three pieces stored PHYSICALLY OUT OF ORDER in
    WordDocument, alternating UTF-16 and fCompressed-cp1252 encodings —
    the piece table alone defines reading order."""
    text = "".join(p + "\r" for p in paragraphs)
    # split char space into 3 pieces
    third = max(1, len(text) // 3)
    pieces = [text[:third], text[third : 2 * third], text[2 * third :]]
    pieces = [p for p in pieces if p]

    wd = bytearray(4096)
    struct.pack_into("<H", wd, 0, 0xA5EC)  # wIdent
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib: Word97
    struct.pack_into("<H", wd, 10, 0x0004)  # flags: fComplex, 0Table
    # physical layout: store pieces in REVERSE order starting at 0x600
    cursor = 0x600
    piece_fc: list[int] = [0] * len(pieces)
    for idx in reversed(range(len(pieces))):
        p = pieces[idx]
        if idx % 2 == 1:  # compressed cp1252 piece
            raw = p.encode("cp1252", errors="replace")
            piece_fc[idx] = 0x40000000 | (cursor * 2)
        else:  # UTF-16 piece
            raw = p.encode("utf-16-le")
            piece_fc[idx] = cursor
        if cursor + len(raw) > len(wd):
            wd.extend(b"\x00" * (cursor + len(raw) - len(wd)))
        wd[cursor : cursor + len(raw)] = raw
        cursor += len(raw) + 16  # gap: pieces are not contiguous

    # PlcPcd: n+1 CPs then n 8-byte PCDs (fc dword at PCD offset 2)
    cps = [0]
    for p in pieces:
        cps.append(cps[-1] + len(p))
    plc = b"".join(struct.pack("<I", cp) for cp in cps)
    for fc in piece_fc:
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    table = bytearray(len(clx))
    table[:] = clx
    fc_clx, lcb_clx = 0, len(clx)
    struct.pack_into("<I", wd, 0x1A2, fc_clx)
    struct.pack_into("<I", wd, 0x1A6, lcb_clx)
    return _build_cfb({"WordDocument": bytes(wd), "0Table": bytes(table)})


def expected_doc_content(paragraphs: list[str]) -> str:
    """Normative DOC text layout: Word's \\r paragraph marks normalized to
    newline-terminated paragraphs (same shape as DOCX)."""
    return "".join(p + "\n" for p in paragraphs)


# ---------------------------------------------------------------------------
# HTML page builder (boilerplate + planted main content)
# ---------------------------------------------------------------------------


def build_html_page(
    title: str,
    paragraphs: list[str],
    nav_links: list[str],
    footer_text: str = "Copyright 2026 Example Site. All rights reserved.",
    sidebar_links: list[str] | None = None,
    charset: str = "utf-8",
) -> bytes:
    """A generated web page: nav/header/sidebar/footer boilerplate (short,
    link-dense blocks) around an article of planted paragraphs (long,
    link-free blocks). The main-content extractor must recover exactly the
    planted paragraphs (whitespace-normalized) — FIXTURES.md html_boilerplate.
    """
    sidebar_links = sidebar_links if sidebar_links is not None else nav_links
    nav = "".join(f'<li><a href="/{_slug(t)}">{_xml_escape(t)}</a></li>' for t in nav_links)
    side = "".join(
        f'<li><a href="/{_slug(t)}">{_xml_escape(t)}</a> related link</li>'
        for t in sidebar_links
    )
    article = "".join(f"<p>{_xml_escape(p)}</p>\n" for p in paragraphs)
    page = f"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="{charset}">
<title>{_xml_escape(title)}</title>
<script>var tracker = "not content"; trackPage();</script>
<style>body {{ margin: 0; }} .nav {{ color: red; }}</style>
</head>
<body>
<header><h1><a href="/">Example Site</a></h1></header>
<nav class="nav"><ul>{nav}</ul></nav>
<div class="layout">
<aside class="sidebar"><h3>More stories</h3><ul>{side}</ul></aside>
<article>
{article}</article>
</div>
<footer><p><a href="/about">About</a> | <a href="/contact">Contact</a> | <a href="/terms">Terms</a></p>
<p>{_xml_escape(footer_text)}</p></footer>
</body>
</html>"""
    return page.encode(charset)


def build_html_table_page(
    title: str,
    paragraphs: list[str],
    table_rows: list[list[str]],
    nav_links: list[str],
) -> bytes:
    """An article page with a DATA TABLE between its paragraphs plus the
    usual nav boilerplate — FIXTURES.md html_table. The extractor must
    keep the paragraphs AND the table fused into one block (cells joined
    by single spaces), and drop the nav."""
    nav = "".join(
        f'<li><a href="/{_slug(t)}">{_xml_escape(t)}</a></li>'
        for t in nav_links
    )
    rows = "".join(
        "<tr>" + "".join(f"<td>{_xml_escape(c)}</td>" for c in cells) + "</tr>"
        for cells in table_rows
    )
    paras = list(paragraphs)
    article = (
        f"<p>{_xml_escape(paras[0])}</p>\n<table>{rows}</table>\n"
        + "".join(f"<p>{_xml_escape(p)}</p>\n" for p in paras[1:])
    )
    page = f"""<!DOCTYPE html>
<html><head><title>{_xml_escape(title)}</title></head>
<body>
<nav><ul>{nav}</ul></nav>
<article>
{article}</article>
</body></html>"""
    return page.encode("utf-8")


def expected_html_table_content(
    paragraphs: list[str], table_rows: list[list[str]]
) -> str:
    """Normative layout for the table page: first paragraph, the fused
    table block (all cells, space-joined, row order), then the remaining
    paragraphs."""
    fused = normalize_block_text(
        " ".join(c for cells in table_rows for c in cells)
    )
    blocks = [normalize_block_text(paragraphs[0]), fused] + [
        normalize_block_text(p) for p in paragraphs[1:]
    ]
    return "\n".join(blocks)


def build_link_farm_page(title: str, links: list[str]) -> bytes:
    """A page with no dominant text block (FIXTURES.md html_no_main)."""
    items = "".join(f'<li><a href="/{_slug(t)}">{_xml_escape(t)}</a></li>' for t in links)
    page = f"""<!DOCTYPE html>
<html><head><title>{_xml_escape(title)}</title></head>
<body><ul>{items}</ul>
<p><a href="/next">next page</a> <a href="/prev">previous page</a></p>
</body></html>"""
    return page.encode("utf-8")


def _slug(s: str) -> str:
    return "".join(c if c.isalnum() else "-" for c in s.lower())[:40]


def normalize_block_text(s: str) -> str:
    """Whitespace normalization applied to every HTML text block: collapse
    runs of whitespace to a single space and strip. This is the normative
    spec shared by the generator (to compute goldens) and the extractor.
    """
    return " ".join(s.split())


def expected_html_content(paragraphs: list[str]) -> str:
    """Normative HTML main-content layout: kept blocks joined by newline."""
    return "\n".join(normalize_block_text(p) for p in paragraphs)


# ---------------------------------------------------------------------------
# EPUB (OCF zip + OPF package + XHTML chapters)
# ---------------------------------------------------------------------------

_EPUB_CONTAINER = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<container version="1.0" '
    b'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    b'<rootfiles><rootfile full-path="OEBPS/content.opf" '
    b'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def build_epub(
    chapters: list[list[str]], title: str = "", creator: str = ""
) -> bytes:
    """An EPUB package: STORED ``mimetype`` first (the OCF detection
    anchor), container.xml → OPF with spine-ordered XHTML chapters; each
    chapter is a list of paragraph strings."""
    buf = BytesIO()
    manifest_items = []
    spine_refs = []
    chapter_files: list[tuple[str, bytes]] = []
    for i, paras in enumerate(chapters):
        name = f"chap{i + 1}.xhtml"
        body = "".join(f"<p>{_xml_escape(p)}</p>" for p in paras)
        doc = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>Chapter {i + 1}</title></head>"
            f"<body>{body}</body></html>"
        ).encode()
        chapter_files.append((f"OEBPS/{name}", doc))
        manifest_items.append(
            f'<item id="c{i + 1}" href="{name}" '
            'media-type="application/xhtml+xml"/>'
        )
        spine_refs.append(f'<itemref idref="c{i + 1}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" version="2.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_xml_escape(title)}</dc:title>"
        f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
        '<dc:identifier id="uid">urn:uuid:0</dc:identifier>'
        "</metadata>"
        f"<manifest>{''.join(manifest_items)}</manifest>"
        f"<spine>{''.join(spine_refs)}</spine></package>"
    ).encode()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, b"application/epub+zip")
        for name, data in [
            ("META-INF/container.xml", _EPUB_CONTAINER),
            ("OEBPS/content.opf", opf),
            *chapter_files,
        ]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def expected_epub_content(chapters: list[list[str]]) -> str:
    """Normative EPUB text layout: spine order, each paragraph
    newline-terminated."""
    return "".join(p + "\n" for paras in chapters for p in paras)


# ---------------------------------------------------------------------------
# Legacy binary XLS (CFB + BIFF8 Workbook stream with an SST)
# ---------------------------------------------------------------------------


def _biff_record(rec_type: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rec_type, len(payload)) + payload


def build_xls(cells: list[str]) -> bytes:
    """A legacy .xls: CFB container holding a BIFF8 ``Workbook`` stream
    whose SST carries every cell string. Strings alternate compressed
    (latin-1-safe) and uncompressed (UTF-16LE) bodies based on content."""
    entries = []
    for s in cells:
        try:
            raw = s.encode("latin-1")
            flags = 0x00
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            flags = 0x01
        entries.append(struct.pack("<HB", len(s), flags) + raw)
    sst_payload = struct.pack("<II", len(cells), len(cells)) + b"".join(entries)
    if len(sst_payload) > 8000:
        raise ValueError("synthetic SST must fit one BIFF record")
    stream = (
        _biff_record(0x0809, struct.pack("<HHHHI", 0x0600, 0x0005, 0, 0, 0))
        + _biff_record(0x00FC, sst_payload)
        + _biff_record(0x000A, b"")  # EOF
    )
    return _build_cfb({"Workbook": stream})


def expected_xls_content(cells: list[str]) -> str:
    return "".join(t + "\n" for t in cells)


# ---------------------------------------------------------------------------
# Legacy binary PPT (CFB + PowerPoint Document record tree)
# ---------------------------------------------------------------------------


def _ppt_record(ver_inst: int, rec_type: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rec_type, len(payload)) + payload


def build_ppt(slides: list[list[str]]) -> bytes:
    """A legacy .ppt: CFB container with a ``PowerPoint Document`` stream —
    a Document container (recType 0x03E8) holding one SlideListWithText
    container (0x0FF0) per slide, whose text atoms alternate
    TextBytesAtom (cp1252) and TextCharsAtom (UTF-16LE) by content."""
    slide_containers = []
    for texts in slides:
        atoms = b""
        for t in texts:
            try:
                raw = t.encode("cp1252")
                atoms += _ppt_record(0x0000, 0x0FA8, raw)
            except UnicodeEncodeError:
                atoms += _ppt_record(0x0000, 0x0FA0, t.encode("utf-16-le"))
        slide_containers.append(_ppt_record(0x000F, 0x0FF0, atoms))
    doc = _ppt_record(0x000F, 0x03E8, b"".join(slide_containers))
    return _build_cfb({"PowerPoint Document": doc})


def expected_ppt_content(slides: list[list[str]]) -> str:
    return "".join(t + "\n" for texts in slides for t in texts)


# ---------------------------------------------------------------------------
# MP3 with an ID3v2.3 tag
# ---------------------------------------------------------------------------


def _id3_syncsafe(n: int) -> bytes:
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _id3_text_frame(frame_id: str, text: str) -> bytes:
    try:
        payload = b"\x00" + text.encode("latin-1")
    except UnicodeEncodeError:
        payload = b"\x01" + b"\xff\xfe" + text.encode("utf-16-le")
    return frame_id.encode("ascii") + struct.pack(">I", len(payload)) + b"\x00\x00" + payload


def build_mp3(
    title: str = "", artist: str = "", album: str = "", genre: str = ""
) -> bytes:
    """An MP3 head: ID3v2.3 tag with TIT2/TPE1/TALB/TCON text frames,
    followed by a few MPEG-1 Layer III frame-sync bytes standing in for
    the audio body."""
    frames = b"".join(
        _id3_text_frame(fid, val)
        for fid, val in (
            ("TIT2", title), ("TPE1", artist), ("TALB", album), ("TCON", genre),
        )
        if val
    )
    tag = b"ID3\x03\x00\x00" + _id3_syncsafe(len(frames)) + frames
    # minimal MPEG-1 Layer III frame header + silence padding
    body = (b"\xff\xfb\x90\x00" + b"\x00" * 100) * 3
    return tag + body


def build_mp3_bare() -> bytes:
    """A tagless MP3: frame sync only (detection falls to the 0xFFFB
    sync); no metadata recoverable."""
    return (b"\xff\xfb\x90\x00" + b"\x00" * 100) * 3


# ---------------------------------------------------------------------------
# JPEG with an EXIF APP1 segment
# ---------------------------------------------------------------------------


def build_jpeg_exif(
    width: int,
    height: int,
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime: str = "",
) -> bytes:
    """Minimal JPEG carrying an EXIF APP1 (little-endian TIFF, IFD0 with
    Make/Model/Orientation/DateTime) ahead of the SOF0 dimensions."""
    tags = []
    extra = b""
    # value area starts after: 8 TIFF header + 2 count + 12*n entries + 4 next-IFD
    def _ascii_entry(tag_id: int, value: str) -> None:
        nonlocal extra
        raw = value.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            tags.append((tag_id, 2, len(raw), raw.ljust(4, b"\x00"), None))
        else:
            tags.append((tag_id, 2, len(raw), None, raw))

    if make:
        _ascii_entry(0x010F, make)
    if model:
        _ascii_entry(0x0110, model)
    tags.append((0x0112, 3, 1, struct.pack("<H", orientation) + b"\x00\x00", None))
    if datetime:
        _ascii_entry(0x0132, datetime)
    tags.sort(key=lambda t: t[0])
    n = len(tags)
    value_off = 8 + 2 + 12 * n + 4
    entries = b""
    for tag_id, ftype, count, inline, deferred in tags:
        if deferred is None:
            entries += struct.pack("<HHI", tag_id, ftype, count) + inline
        else:
            entries += struct.pack("<HHII", tag_id, ftype, count, value_off + len(extra))
            extra += deferred
    tiff = (
        b"II" + struct.pack("<HI", 42, 8)
        + struct.pack("<H", n) + entries + struct.pack("<I", 0) + extra
    )
    exif_payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"


# ---------------------------------------------------------------------------
# TIFF / BMP / WebP (header-only images for dimension + IFD metadata)
# ---------------------------------------------------------------------------


def build_tiff(width: int, height: int, make: str = "") -> bytes:
    """Minimal little-endian TIFF: IFD0 with ImageWidth/ImageLength SHORTs
    (+ optional Make ASCII), no strip data — enough for detection and
    header metadata extraction."""
    tags = [
        (0x0100, 3, 1, struct.pack("<H", width) + b"\x00\x00", None),
        (0x0101, 3, 1, struct.pack("<H", height) + b"\x00\x00", None),
    ]
    extra = b""
    if make:
        raw = make.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            tags.append((0x010F, 2, len(raw), raw.ljust(4, b"\x00"), None))
        else:
            tags.append((0x010F, 2, len(raw), None, raw))
    tags.sort(key=lambda t: t[0])
    n = len(tags)
    value_off = 8 + 2 + 12 * n + 4
    entries = b""
    for tag_id, ftype, count, inline, deferred in tags:
        if deferred is None:
            entries += struct.pack("<HHI", tag_id, ftype, count) + inline
        else:
            entries += struct.pack(
                "<HHII", tag_id, ftype, count, value_off + len(extra)
            )
            extra += deferred
    return (
        b"II*\x00" + struct.pack("<I", 8)
        + struct.pack("<H", n) + entries + struct.pack("<I", 0) + extra
    )


def build_bmp(width: int, height: int) -> bytes:
    """Minimal BITMAPINFOHEADER BMP, no pixel array."""
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + len(dib))
    return header + dib


def build_webp(width: int, height: int) -> bytes:
    """Minimal extended-format WebP: RIFF + VP8X chunk carrying the canvas
    size (no image data chunks)."""
    vp8x_payload = (
        b"\x00\x00\x00\x00"
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_payload)) + vp8x_payload
    return b"RIFF" + struct.pack("<I", 4 + len(vp8x)) + b"WEBP" + vp8x


# ---------------------------------------------------------------------------
# ZIP / TAR archives and an encrypted PDF
# ---------------------------------------------------------------------------


def build_zip(entries: list[tuple[str, bytes]]) -> bytes:
    """A deterministic ZIP archive: fixed 1980-01-01 timestamps (the
    ZipInfo default), DEFLATE members, written in the given order."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in entries:
            zf.writestr(zipfile.ZipInfo(name), data)
    return buf.getvalue()


def build_tar(entries: list[tuple[str, bytes]]) -> bytes:
    """A deterministic uncompressed POSIX tar (mtime pinned to 0)."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in entries:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def build_pdf_encrypted(pages: list[list[str]]) -> bytes:
    """A structurally-valid PDF whose trailer carries an ``/Encrypt``
    dictionary reference — the extractor must refuse it as
    ``encrypted_document`` without attempting text recovery (Tika
    EncryptedDocumentException analogue)."""
    data = build_pdf(pages)
    out = data.replace(b"trailer\n<< ", b"trailer\n<< /Encrypt 90 0 R ", 1)
    assert out != data, "trailer marker not found"
    return out


# ---------------------------------------------------------------------------
# WARC files (Common-Crawl container; public ISO 28500 framing)
# ---------------------------------------------------------------------------


def build_warc(
    records: list[tuple[str, str, bytes, str]],
    gzip_members: bool = False,
    include_noise_records: bool = True,
) -> bytes:
    """A deterministic WARC 1.1 file: one ``response`` record per
    ``(url, iso_date, payload, http_content_type)`` tuple, each payload
    wrapped in an HTTP/1.1 200 envelope. ``gzip_members=True`` emits the
    standard ``.warc.gz`` layout (one gzip member per record).
    ``include_noise_records`` interleaves warcinfo/request records that a
    reader must skip."""
    import gzip as _gz

    def _record(rtype: str, headers: list[tuple[str, str]], body: bytes) -> bytes:
        head = [b"WARC/1.1"]
        head.append(f"WARC-Type: {rtype}".encode())
        for k, v in headers:
            head.append(f"{k}: {v}".encode())
        head.append(f"Content-Length: {len(body)}".encode())
        return b"\r\n".join(head) + b"\r\n\r\n" + body + b"\r\n\r\n"

    chunks: list[bytes] = []
    if include_noise_records:
        chunks.append(
            _record(
                "warcinfo",
                [("WARC-Date", "2026-01-01T00:00:00Z")],
                b"software: rika-ray-docgen\r\n",
            )
        )
    for i, (url, date, payload, ctype) in enumerate(records):
        if include_noise_records:
            chunks.append(
                _record(
                    "request",
                    [("WARC-Target-URI", url), ("WARC-Date", date)],
                    f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode(),
                )
            )
        http = (
            b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: {ctype}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload
        )
        chunks.append(
            _record(
                "response",
                [
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    ("WARC-Record-ID", f"<urn:uuid:{i:032x}>"),
                ],
                http,
            )
        )
    if gzip_members:
        return b"".join(_gz.compress(c, mtime=0) for c in chunks)
    return b"".join(chunks)


def _7z_num(v: int) -> bytes:
    """7z variable-length number: minimal single byte below 0x80, else the
    full 0xFF + 8-byte little-endian form (always valid, never minimal)."""
    if v < 0x80:
        return bytes([v])
    return b"\xff" + v.to_bytes(8, "little")


def _7z_compress(payload: bytes, codec: str) -> tuple[bytes, bytes, bytes]:
    """(packed_bytes, codec_id, codec_props) for the writer's codecs."""
    import bz2 as _bz2
    import lzma as _lzma

    if codec == "copy":
        return payload, b"\x00", b""
    if codec == "lzma2":
        packed = _lzma.compress(
            payload,
            format=_lzma.FORMAT_RAW,
            filters=[{"id": _lzma.FILTER_LZMA2, "preset": 6}],
        )
        return packed, b"\x21", b"\x18"  # props byte: dictionary size code
    if codec == "lzma1":
        packed = _lzma.compress(
            payload,
            format=_lzma.FORMAT_RAW,
            filters=[{"id": _lzma.FILTER_LZMA1, "preset": 6}],
        )
        # props: (pb*5+lp)*9+lc with lc=3 lp=0 pb=2, then dict size LE32
        props = bytes([93]) + (8 * 1024 * 1024).to_bytes(4, "little")
        return packed, b"\x03\x01\x01", props
    if codec == "bzip2":
        return _bz2.compress(payload), b"\x04\x02\x02", b""
    raise ValueError(codec)


def _7z_streams_info(
    pack_pos: int, packed_len: int, codec_id: bytes, props: bytes,
    unpack_size: int, substream_sizes: list[int] | None,
) -> bytes:
    out = bytearray()
    out += _7z_num(0x06)  # kPackInfo
    out += _7z_num(pack_pos) + _7z_num(1)
    out += _7z_num(0x09) + _7z_num(packed_len)  # kSize
    out += _7z_num(0x00)  # kEnd (PackInfo)
    out += _7z_num(0x07)  # kUnpackInfo
    out += _7z_num(0x0B) + _7z_num(1) + b"\x00"  # kFolder, 1 folder, internal
    flag = len(codec_id) | (0x20 if props else 0)
    out += _7z_num(1) + bytes([flag]) + codec_id  # one simple coder
    if props:
        out += _7z_num(len(props)) + props
    out += _7z_num(0x0C) + _7z_num(unpack_size)  # kCodersUnpackSize
    out += _7z_num(0x00)  # kEnd (UnpackInfo)
    if substream_sizes is not None and len(substream_sizes) != 1:
        out += _7z_num(0x08)  # kSubStreamsInfo
        out += _7z_num(0x0D) + _7z_num(len(substream_sizes))
        out += _7z_num(0x09)
        for s in substream_sizes[:-1]:
            out += _7z_num(s)
        out += _7z_num(0x00)  # kEnd (SubStreamsInfo)
    out += _7z_num(0x00)  # kEnd (StreamsInfo)
    return bytes(out)


def build_7z(
    entries: list[tuple[str, bytes]],
    codec: str = "lzma2",
    encoded_header: bool = False,
) -> bytes:
    """A deterministic 7z archive in the subset rika_ray's reader supports:
    ONE solid folder holding all members, a single simple coder (``copy`` /
    ``lzma2`` / ``lzma1`` / ``bzip2``), optional LZMA2-packed metadata
    header (the layout 7-Zip itself writes by default)."""
    import zlib as _zlib

    payload = b"".join(d for _, d in entries)
    packed, codec_id, props = _7z_compress(payload, codec)

    header = bytearray()
    header += _7z_num(0x01)  # kHeader
    header += _7z_num(0x04)  # kMainStreamsInfo
    header += _7z_streams_info(
        0, len(packed), codec_id, props, len(payload),
        [len(d) for _, d in entries],
    )
    header += _7z_num(0x05)  # kFilesInfo
    header += _7z_num(len(entries))
    names = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n, _ in entries
    )
    header += _7z_num(0x11) + _7z_num(len(names)) + names  # kName
    header += _7z_num(0x00)  # kEnd (FilesInfo)
    header += _7z_num(0x00)  # kEnd (Header)
    header = bytes(header)

    body = packed
    if encoded_header:
        hpacked, hcid, hprops = _7z_compress(header, "lzma2")
        enc = bytearray()
        enc += _7z_num(0x17)  # kEncodedHeader
        enc += _7z_streams_info(
            len(packed), len(hpacked), hcid, hprops, len(header), None
        )
        body = packed + hpacked
        header = bytes(enc)

    nh_off = len(body)
    # start header per 7zFormat.txt: NextHeaderOffset u64, NextHeaderSize
    # u64, NextHeaderCRC u32 — CRC'd as a 20-byte unit
    start_fields = (
        nh_off.to_bytes(8, "little") + len(header).to_bytes(8, "little")
        + _zlib.crc32(header).to_bytes(4, "little")
    )
    sig = (
        b"7z\xbc\xaf\x27\x1c" + bytes([0, 4])
        + _zlib.crc32(start_fields).to_bytes(4, "little") + start_fields
    )
    assert len(sig) == 32
    return sig + body + header


def build_7z_mixed_folders(
    chain_name: str, entries: list[tuple[str, bytes]]
) -> bytes:
    """A 7z archive whose FIRST folder is a two-coder BCJ+LZMA1 chain
    (7-Zip's default for executables — unsupported by the reader, so its
    member must surface as ``None``) followed by a Copy folder holding
    ``entries`` (which must still decode). Exercises the per-out-stream
    kCodersUnpackSize layout: the chain folder carries TWO unpack sizes,
    one per coder out stream, with a bind pair marking the LZMA output
    as consumed."""
    import zlib as _zlib

    chain_packed = b"\xde\xad\xbe\xef" * 8  # never decoded
    chain_size = 64
    copy_payload = b"".join(d for _, d in entries)

    header = bytearray()
    header += _7z_num(0x01)  # kHeader
    header += _7z_num(0x04)  # kMainStreamsInfo
    header += _7z_num(0x06)  # kPackInfo
    header += _7z_num(0) + _7z_num(2)  # pack_pos, two packed streams
    header += _7z_num(0x09)  # kSize
    header += _7z_num(len(chain_packed)) + _7z_num(len(copy_payload))
    header += _7z_num(0x00)  # kEnd (PackInfo)
    header += _7z_num(0x07)  # kUnpackInfo
    header += _7z_num(0x0B) + _7z_num(2) + b"\x00"  # kFolder, 2, internal
    # folder 1: coder 0 = LZMA1 (props), coder 1 = BCJ x86; bind pair
    # (InIndex=1, OutIndex=0) feeds LZMA's output into BCJ's input
    header += _7z_num(2)
    header += bytes([3 | 0x20]) + b"\x03\x01\x01"  # LZMA1 + props flag
    header += _7z_num(5) + b"\x5d\x00\x00\x01\x00"
    header += bytes([4]) + b"\x03\x03\x01\x03"  # BCJ x86, simple
    header += _7z_num(1) + _7z_num(0)  # bind pair in=1, out=0
    # folder 2: single Copy coder
    header += _7z_num(1) + bytes([1]) + b"\x00"
    header += _7z_num(0x0C)  # kCodersUnpackSize: per coder OUT stream
    header += _7z_num(chain_size)  # folder 1, LZMA out (bound)
    header += _7z_num(chain_size)  # folder 1, BCJ out (main)
    header += _7z_num(len(copy_payload))  # folder 2, Copy out
    header += _7z_num(0x00)  # kEnd (UnpackInfo)
    if len(entries) != 1:
        # per-folder substreams: 1 for the chain folder, N for the Copy one
        header += _7z_num(0x08)  # kSubStreamsInfo
        header += _7z_num(0x0D) + _7z_num(1) + _7z_num(len(entries))
        header += _7z_num(0x09)
        for _, d in entries[:-1]:
            header += _7z_num(len(d))
        header += _7z_num(0x00)  # kEnd (SubStreamsInfo)
    header += _7z_num(0x00)  # kEnd (StreamsInfo)
    names_list = [chain_name] + [n for n, _ in entries]
    header += _7z_num(0x05)  # kFilesInfo
    header += _7z_num(len(names_list))
    names = b"\x00" + b"".join(
        n.encode("utf-16-le") + b"\x00\x00" for n in names_list
    )
    header += _7z_num(0x11) + _7z_num(len(names)) + names  # kName
    header += _7z_num(0x00)  # kEnd (FilesInfo)
    header += _7z_num(0x00)  # kEnd (Header)
    header = bytes(header)

    body = chain_packed + copy_payload
    start_fields = (
        len(body).to_bytes(8, "little") + len(header).to_bytes(8, "little")
        + _zlib.crc32(header).to_bytes(4, "little")
    )
    sig = (
        b"7z\xbc\xaf\x27\x1c" + bytes([0, 4])
        + _zlib.crc32(start_fields).to_bytes(4, "little") + start_fields
    )
    return sig + body + header


def build_rar4(entries: list[tuple[str, bytes]], fake_compressed: bool = False) -> bytes:
    """A deterministic RAR4 archive with STORED members (method 0x30 — the
    only method an original implementation can honor; the RAR compression
    algorithm itself is proprietary). ``fake_compressed=True`` marks members
    with method 0x33 instead, for exercising the reader's skip path."""
    import zlib as _zlib

    def _block(head_type: int, flags: int, body: bytes, add: bytes = b"") -> bytes:
        size = 7 + len(body)
        raw = bytes([head_type]) + flags.to_bytes(2, "little") + size.to_bytes(2, "little") + body
        crc = _zlib.crc32(raw) & 0xFFFF
        return crc.to_bytes(2, "little") + raw + add

    out = bytearray(b"Rar!\x1a\x07\x00")
    out += _block(0x73, 0x0000, b"\x00\x00\x00\x00\x00\x00")  # main header
    for name, data in entries:
        nm = name.encode("utf-8")
        method = 0x33 if fake_compressed else 0x30
        body = (
            len(data).to_bytes(4, "little")          # PACK_SIZE
            + len(data).to_bytes(4, "little")        # UNP_SIZE
            + b"\x00"                                 # HOST_OS
            + (_zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"                     # FTIME
            + bytes([20, method])                     # UNP_VER, METHOD
            + len(nm).to_bytes(2, "little")
            + b"\x20\x00\x00\x00"                     # ATTR
            + nm
        )
        out += _block(0x74, 0x8000, body, data)       # LONG_BLOCK flag
    out += _block(0x7B, 0x4000, b"")                  # end of archive
    return bytes(out)


def build_zstd_raw(payload: bytes, rle_tail: bytes = b"") -> bytes:
    """A valid zstd FRAME using only raw (and optionally RLE) blocks — the
    subset constructible without a zstd encoder. Decodes to
    ``payload + rle_tail`` with any conforming decoder."""
    frame = bytearray(b"\x28\xb5\x2f\xfd")
    content_size = len(payload) + len(rle_tail)
    # descriptor: single_segment=1 (bit 5), fcs_flag=0 → 1-byte content size
    if content_size > 255:
        frame += bytes([0x20 | 0x80])  # fcs_flag=2 → 4-byte size
        frame += content_size.to_bytes(4, "little")
    else:
        frame += bytes([0x20])
        frame += bytes([content_size])
    blocks = []
    if payload or not rle_tail:
        blocks.append((0, payload))                   # raw block
    if rle_tail:
        blocks.append((1, rle_tail))                  # RLE block
    for i, (btype, data) in enumerate(blocks):
        last = 1 if i == len(blocks) - 1 else 0
        size = len(data)
        hdr = last | (btype << 1) | (size << 3)
        frame += hdr.to_bytes(3, "little")
        frame += data if btype == 0 else data[:1]
    return bytes(frame)


def build_rar5(entries: list[tuple[str, bytes]], fake_compressed: bool = False) -> bytes:
    """A deterministic RAR5 archive with STORED members (compression
    method 0 in the vint-based v5 layout)."""
    import zlib as _zlib

    def _vint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    def _block(header: bytes, payload: bytes = b"") -> bytes:
        sized = _vint(len(header)) + header
        crc = _zlib.crc32(sized) & 0xFFFFFFFF
        return crc.to_bytes(4, "little") + sized + payload

    out = bytearray(b"Rar!\x1a\x07\x01\x00")
    # main archive header: type=1, flags=0, archive flags vint=0
    out += _block(_vint(1) + _vint(0) + _vint(0))
    for name, data in entries:
        nm = name.encode("utf-8")
        method = 3 if fake_compressed else 0
        comp_info = method << 7
        header = (
            _vint(2)            # type: file
            + _vint(0x02)       # header flags: data area present
            + _vint(len(data))  # data size
            + _vint(0x04)       # file flags: CRC present
            + _vint(len(data))  # unpacked size
            + _vint(0x20)       # attributes
            + (_zlib.crc32(data) & 0xFFFFFFFF).to_bytes(4, "little")
            + _vint(comp_info)
            + _vint(0)          # host OS
            + _vint(len(nm))
            + nm
        )
        out += _block(header, data)
    out += _block(_vint(5) + _vint(0) + _vint(0))  # end of archive
    return bytes(out)


def build_odg(paragraphs: list[str], title: str = "") -> bytes:
    """An OpenDocument Graphics package: STORED ``mimetype`` first member,
    content.xml with draw pages holding text boxes whose text:p paragraphs
    carry the readable text (the ODF drawing layout)."""
    frames = []
    for i, p in enumerate(paragraphs):
        frames.append(
            '<draw:frame draw:name="TextBox%d"><draw:text-box>'
            '<text:p>%s</text:p>'
            "</draw:text-box></draw:frame>" % (i, _xml_escape(p))
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<office:document-content "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:drawing>"
        '<draw:page draw:name="page1">' + "".join(frames) + "</draw:page>"
        "</office:drawing></office:body></office:document-content>"
    ).encode()
    meta = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<office:document-meta "
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<office:meta>"
        f"<dc:title>{_xml_escape(title)}</dc:title>"
        "</office:meta></office:document-meta>"
    ).encode()
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, b"application/vnd.oasis.opendocument.graphics")
        for name, data in [("content.xml", content), ("meta.xml", meta)]:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


def build_vsdx(
    pages: list[list[str]], title: str = "", creator: str = ""
) -> bytes:
    """A Visio OOXML (.vsdx) package: visio/pages/pageN.xml files whose
    shapes carry <Text> elements (Visio 2012 main namespace), plus
    docProps/core.xml."""
    ns = "http://schemas.microsoft.com/office/visio/2012/main"
    files: list[tuple[str, bytes]] = [
        (
            "[Content_Types].xml",
            b'<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
            b'formats.org/package/2006/content-types"/>',
        )
    ]
    for i, shapes in enumerate(pages, start=1):
        shape_xml = "".join(
            f'<Shape ID="{j}"><Text>{_xml_escape(t)}</Text></Shape>'
            for j, t in enumerate(shapes, start=1)
        )
        files.append(
            (
                f"visio/pages/page{i}.xml",
                (
                    f'<?xml version="1.0"?><PageContents xmlns="{ns}">'
                    f"<Shapes>{shape_xml}</Shapes></PageContents>"
                ).encode(),
            )
        )
    files.append(
        (
            "docProps/core.xml",
            (
                '<?xml version="1.0"?><cp:coreProperties '
                'xmlns:cp="http://schemas.openxmlformats.org/package/2006/'
                'metadata/core-properties" '
                'xmlns:dc="http://purl.org/dc/elements/1.1/">'
                f"<dc:title>{_xml_escape(title)}</dc:title>"
                f"<dc:creator>{_xml_escape(creator)}</dc:creator>"
                "</cp:coreProperties>"
            ).encode(),
        )
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in files:
            zf.writestr(zipfile.ZipInfo(name), data)
    return buf.getvalue()


def build_psd(width: int, height: int) -> bytes:
    """A minimal Photoshop file header (public PSD spec): enough for
    detection + dimension metadata; the layer/pixel sections are empty."""
    return (
        b"8BPS"
        + (1).to_bytes(2, "big")          # version
        + b"\x00" * 6                      # reserved
        + (3).to_bytes(2, "big")           # channels
        + height.to_bytes(4, "big")
        + width.to_bytes(4, "big")
        + (8).to_bytes(2, "big")           # depth
        + (3).to_bytes(2, "big")           # mode: RGB
        + b"\x00" * 16                     # empty color/resource/layer sects
    )


def build_psd_pixels(pixels: "object", rle: bool = True) -> bytes:
    """A REAL PSD with composite image data — thin wrapper over the
    engine codec (``rika_ray.stages.codecs.psd_encode``), like the
    PNG/JPEG/FLAC builders."""
    from rika_ray.stages.codecs import psd_encode

    return psd_encode(pixels, rle=rle)


def build_ico_pixels(pixels: "object") -> bytes:
    """A REAL single-image ICO (32-bit BGRA DIB) — wrapper over the
    engine codec (``rika_ray.stages.codecs.ico_encode``)."""
    from rika_ray.stages.codecs import ico_encode

    return ico_encode(pixels)


def build_webp_lossless(pixels: "object") -> bytes:
    """A REAL lossless WebP (VP8L) — wrapper over the engine codec
    (``rika_ray.stages.codecs.vp8l_encode``)."""
    from rika_ray.stages.codecs import vp8l_encode

    return vp8l_encode(pixels)


def build_avi_mjpeg(frames: "object", fps: int = 12) -> bytes:
    """A REAL Motion-JPEG AVI — wrapper over the engine codec
    (``rika_ray.stages.codecs.avi_mjpeg_encode``)."""
    from rika_ray.stages.codecs import avi_mjpeg_encode

    return avi_mjpeg_encode(frames, fps=fps)


def build_eml(
    subject: str,
    from_addr: str,
    to_addr: str,
    body: str,
    html_body: str | None = None,
    attachments: list[tuple[str, bytes, str]] | None = None,
    date: str = "Mon, 12 Jan 2026 10:00:00 +0000",
    message_id: str = "<msg-0001@fixtures.test>",
) -> bytes:
    """A deterministic RFC 5322 / MIME message. The plain body is emitted
    7bit when pure ASCII, else quoted-printable UTF-8; ``html_body`` wraps
    both in multipart/alternative (plain FIRST, per convention);
    ``attachments`` (filename, bytes, content_type) add a multipart/mixed
    envelope with base64 parts. Boundaries are fixed strings so the same
    inputs always produce the same bytes."""
    import base64
    import quopri

    def text_part(text: str, subtype: str) -> str:
        raw = text.encode("utf-8")
        if all(b < 0x80 for b in raw):
            return (
                f"Content-Type: text/{subtype}; charset=utf-8\n"
                "Content-Transfer-Encoding: 7bit\n\n" + text
            )
        qp = quopri.encodestring(raw).decode("ascii")
        return (
            f"Content-Type: text/{subtype}; charset=utf-8\n"
            "Content-Transfer-Encoding: quoted-printable\n\n" + qp
        )

    if html_body is not None:
        alt_b = "=_rika_alt"
        core = (
            f'Content-Type: multipart/alternative; boundary="{alt_b}"\n\n'
            f"--{alt_b}\n" + text_part(body, "plain") + f"\n--{alt_b}\n"
            + text_part(html_body, "html") + f"\n--{alt_b}--\n"
        )
    else:
        core = text_part(body, "plain")

    if attachments:
        mix_b = "=_rika_mix"
        att_parts = []
        for filename, data, ctype in attachments:
            b64 = base64.encodebytes(data).decode("ascii")
            att_parts.append(
                f"Content-Type: {ctype}; name=\"{filename}\"\n"
                "Content-Transfer-Encoding: base64\n"
                "Content-Disposition: attachment; "
                f"filename=\"{filename}\"\n\n{b64}"
            )
        core = (
            f'Content-Type: multipart/mixed; boundary="{mix_b}"\n\n'
            f"--{mix_b}\n" + core
            + "".join(f"\n--{mix_b}\n{p}" for p in att_parts)
            + f"\n--{mix_b}--\n"
        )

    headers = (
        f"From: {from_addr}\n"
        f"To: {to_addr}\n"
        f"Subject: {subject}\n"
        f"Date: {date}\n"
        f"Message-ID: {message_id}\n"
        "MIME-Version: 1.0\n"
    )
    return (headers + core).encode("utf-8")


def build_mbox(messages: list[bytes], sender: str = "alice@fixtures.test") -> bytes:
    """An mbox mailbox: each message preceded by the classic postmark line
    (``From`` + envelope sender + ctime date) and followed by a blank
    separator line."""
    out = bytearray()
    for i, m in enumerate(messages):
        out += f"From {sender} Mon Jan 12 10:00:{i:02d} 2026\n".encode()
        out += m
        if not m.endswith(b"\n"):
            out += b"\n"
        out += b"\n"
    return bytes(out)


def tone_samples(
    n: int, rate: int, channels: int = 1, seed: int = 0
) -> "object":
    """Deterministic int16 test audio: per-channel sine at a seed-picked
    frequency plus mild seeded noise — planar ``(channels, n)``."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64) / rate
    chans = []
    for _c in range(channels):
        freq = float(rng.randint(200, 2000))
        amp = float(rng.randint(4000, 12000))
        wave = amp * np.sin(2.0 * np.pi * freq * t)
        wave += rng.randint(-64, 64, n)
        chans.append(np.clip(wave, -32768, 32767).astype(np.int16))
    return np.stack(chans)


def build_flac_pcm(
    samples: "object",
    sample_rate: int,
    stereo_mode: str = "independent",
) -> bytes:
    """A REAL native-FLAC file from planar int16 samples — thin wrapper
    over the engine codec (``rika_ray.stages.codecs.flac_encode``) so
    fixtures and engine share one spec implementation, like the PNG/JPEG
    builders."""
    from rika_ray.stages.codecs import flac_encode

    return flac_encode(samples, sample_rate, stereo_mode=stereo_mode)


def build_wav(
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    n_samples: int = 1000,
    samples: "object | None" = None,
) -> bytes:
    """A RIFF/WAVE file: canonical fmt chunk + a data chunk (silence by
    default; pass planar int16 ``samples`` of shape ``(channels, n)`` for
    real audio — they are interleaved per the RIFF layout)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    if samples is not None:
        assert bits == 16
        arr = samples.T.reshape(-1)  # interleave planar -> frame order
        data = arr.astype("<i2").tobytes()
        n_samples = samples.shape[1]
    else:
        data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_flac(
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 44100,
) -> bytes:
    """A FLAC STREAMINFO-only header (no frames): the bit-packed
    rate/channels/bits/total fields at STREAMINFO offset 10."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    si = (
        struct.pack(">HH", 4096, 4096)   # min/max block size
        + b"\x00" * 6                     # min/max frame size (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                    # md5 of raw audio (unset)
    )
    return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def build_ogg_vorbis(sample_rate: int = 44100, channels: int = 2) -> bytes:
    """A single Ogg page carrying the Vorbis identification header."""
    packet = (
        b"\x01vorbis"
        + struct.pack("<I", 0)            # vorbis version
        + bytes([channels])
        + struct.pack("<I", sample_rate)
        + struct.pack("<iii", -1, 128000, -1)  # bitrate max/nominal/min
        + bytes([0xB8, 0x01])             # blocksizes + framing bit
    )
    header = (
        b"OggS" + b"\x00" + b"\x02"       # version, header-type: BOS
        + b"\x00" * 8                      # granule position
        + struct.pack("<I", 1)             # serial number
        + struct.pack("<I", 0)             # page sequence
        + b"\x00" * 4                      # crc (unchecked by the sniffer)
        + bytes([1, len(packet)])          # one segment
    )
    return header + packet


def build_mp4(
    duration_s: float = 12.5,
    width: int = 640,
    height: int = 360,
    timescale: int = 1000,
) -> bytes:
    """A minimal ISO BMFF file: ftyp + moov(mvhd + trak(tkhd)) + empty
    mdat — version-0 boxes with the fields the parser reads."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"               # version 0 + flags
        + struct.pack(">II", 0, 0)         # creation/modification time
        + struct.pack(">II", timescale, int(duration_s * timescale))
        + b"\x00" * 80,                    # rate/volume/matrix/next-track
    )
    tkhd = box(
        b"tkhd",
        # spec v0 layout: 4 (version+flags) + 20 (times/track_ID/reserved/
        # duration) + 8 (reserved) + 8 (layer/group/volume/reserved) + 36
        # (matrix) + 8 (width/height) = 84-byte payload exactly
        b"\x00\x00\x00\x07"               # version 0 + enabled flags
        + b"\x00" * 72                     # times/ids/layer/volume/matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    return ftyp + moov + box(b"mdat", b"")


def build_ico(width: int = 32, height: int = 32) -> bytes:
    """An ICO directory with one entry (payload bytes are a stub BMP
    header; the dimension surface is the directory entry)."""
    img = b"\x28\x00\x00\x00" + b"\x00" * 36  # BITMAPINFOHEADER-sized stub
    entry = struct.pack(
        "<BBBBHHII",
        width % 256, height % 256, 0, 0, 1, 32, len(img), 22,
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + img


def build_msg(subject: str, sender: str, to: str, body: str) -> bytes:
    """An Outlook .msg CFB container with the UTF-16LE property streams
    ([MS-OXMSG] __substg1.0_<prop>001F layout) for subject / sender /
    display-to / body."""
    return _build_cfb(
        {
            "__substg1.0_0037001F": subject.encode("utf-16-le"),
            "__substg1.0_0C1A001F": sender.encode("utf-16-le"),
            "__substg1.0_0E04001F": to.encode("utf-16-le"),
            "__substg1.0_1000001F": body.encode("utf-16-le"),
        }
    )


def build_png_rgb(pixels, filters=None) -> bytes:
    """A REAL 8-bit RGB PNG with pixel data (filters selectable per row
    to exercise every unfilter path); delegates to the codec module so
    fixtures and decoder share one spec implementation."""
    from rika_ray.stages.codecs import png_encode

    return png_encode(pixels, filters)


def build_bmp_rgb(pixels) -> bytes:
    """A REAL uncompressed 24-bit BMP with pixel data."""
    from rika_ray.stages.codecs import bmp_encode

    return bmp_encode(pixels)


def build_jpeg_rgb(pixels, quality: int = 90) -> bytes:
    """A REAL baseline 4:4:4 JFIF JPEG with entropy-coded pixel data."""
    from rika_ray.stages.codecs import jpeg_encode

    return jpeg_encode(pixels, quality)


def build_jpeg_exif_rgb(
    pixels,
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime: str = "",
    quality: int = 90,
) -> bytes:
    """A REAL baseline JPEG with an EXIF APP1 spliced in directly after
    SOI (the EXIF-standard position), so both the metadata surface and
    the pixel decode are genuine."""
    h, w = pixels.shape[:2]
    exif_only = build_jpeg_exif(
        w, h, make=make, model=model, orientation=orientation, datetime=datetime
    )
    # APP1 sits between SOI and SOF0 in the header-only fixture
    app1 = exif_only[2 : len(exif_only) - 15]  # strip SOI, SOF0(13), EOI
    assert app1[:2] == b"\xff\xe1"
    real = build_jpeg_rgb(pixels, quality)
    return real[:2] + app1 + real[2:]


def build_gif_rgb(pixels) -> bytes:
    """A REAL GIF89a (LZW-compressed, palette-quantized losslessly;
    pixels must use ≤256 distinct colors)."""
    from rika_ray.stages.codecs import gif_encode

    return gif_encode(pixels)


def build_tiff_rgb(
    pixels, make: str = "", packbits: bool = False, rows_per_strip=None
) -> bytes:
    """A REAL baseline little-endian RGB TIFF with strip pixel data."""
    from rika_ray.stages.codecs import tiff_encode

    return tiff_encode(
        pixels, packbits=packbits, rows_per_strip=rows_per_strip, make=make
    )


def gradient_pixels(height: int, width: int, seed: int = 0):
    """Deterministic test pattern: channel-distinct affine gradients."""
    import numpy as np

    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    r = (3 * x + 5 * y + 7 * seed) % 256
    g = (11 * x + 2 * y + 13 * seed) % 256
    bl = (x * y + 17 * seed) % 256
    return np.stack([r, g, bl], axis=-1).astype(np.uint8)
