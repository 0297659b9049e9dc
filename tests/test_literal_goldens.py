"""Hand-written LITERAL goldens — expected strings typed by hand, never
computed with the generator's helpers. This breaks the docgen↔extractor
circularity: a shared misreading of the reference semantics in
``normalize_block_text`` / ``expected_*_content`` cannot make these pass.
One document per extractor family (HTML, PDF, DOCX, legacy DOC, UTF-16
text, legacy charsets)."""

from __future__ import annotations

from rika_ray import docgen
from rika_ray.stages.charset import decode_text
from rika_ray.stages.html_extract import extract_html
from rika_ray.stages.office import extract_doc, extract_docx
from rika_ray.stages.pdf_extract import extract_pdf

# Hand-authored HTML page (NOT built by docgen.build_html_page).
_HTML_PAGE = """<!DOCTYPE html>
<html><head><title>Harbor Notes</title>
<script>track("x");</script></head>
<body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>
<li><a href="/about">About</a></li></ul></nav>
<article>
<p>The harbor   opens before
sunrise, and the first boats leave while the water is still dark.</p>
<p>Fishermen say the best catch waits where the river current meets the
tide, just beyond the last green buoy.</p>
</article>
<footer><a href="/terms">Terms</a> | <a href="/contact">Contact</a></footer>
</body></html>"""


def test_html_literal_golden():
    content, spans, meta = extract_html(_HTML_PAGE)
    # literal: whitespace inside paragraphs collapses to single spaces,
    # kept blocks joined by a single newline, boilerplate dropped
    assert content == (
        "The harbor opens before sunrise, and the first boats leave while "
        "the water is still dark.\n"
        "Fishermen say the best catch waits where the river current meets "
        "the tide, just beyond the last green buoy."
    )
    assert meta.get("dc:title") == "Harbor Notes"


def test_pdf_literal_golden():
    payload = docgen.build_pdf(
        [["First line of page one.", "Second line of page one."],
         ["Only line of page two."]],
        title="Literal PDF",
    )
    content, spans, meta = extract_pdf(payload)
    # literal: single leading newline (the reference's PDF whitespace
    # quirk, spec/rika/parser_spec.rb:157-162), then every text line
    # newline-terminated; pages run together with no separator
    assert content == (
        "\nFirst line of page one.\nSecond line of page one.\n"
        "Only line of page two.\n"
    )
    assert meta.get("dc:title") == "Literal PDF"


def test_docx_literal_golden():
    payload = docgen.build_docx(
        ["Alpha paragraph text.", "Beta paragraph text."]
    )
    content, spans, meta = extract_docx(payload)
    assert content == "Alpha paragraph text.\nBeta paragraph text.\n"


def test_doc_literal_golden():
    payload = docgen.build_doc(["Legacy doc line one.", "Legacy doc two."])
    content, spans, meta = extract_doc(payload)
    assert content == "Legacy doc line one.\nLegacy doc two.\n"


def test_utf16_literal_golden():
    data = "Snow falls on the pier.\n".encode("utf-16-le")
    text, cs = decode_text(b"\xff\xfe" + data)
    assert text == "Snow falls on the pier.\n"
    assert cs == "UTF-16LE"


def test_legacy_charset_literal_goldens():
    # windows-1251: literal byte string for "Мир и хлеб." typed from the
    # cp1251 code chart (М=0xCC, и=0xE8, р=0xF0, х=0xF5, л=0xEB, е=0xE5,
    # б=0xE1)
    raw_1251 = b"\xcc\xe8\xf0 \xe8 \xf5\xeb\xe5\xe1 \xe8 \xe3\xe0\xe7\xe5\xf2\xfb \xe8 \xe2\xee\xe4\xe0."
    text, cs = decode_text(raw_1251)
    assert text == "Мир и хлеб и газеты и вода."
    assert cs == "windows-1251"
    # KOI8-R: same sentence, KOI8 chart (м=0xCD lowercase plane 0xC0-0xDF)
    raw_koi8 = "мир и хлеб и газеты и вода.".encode("koi8-r")
    text, cs = decode_text(raw_koi8)
    assert text == "мир и хлеб и газеты и вода."
    assert cs == "KOI8-R"
