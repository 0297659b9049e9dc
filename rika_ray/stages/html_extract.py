"""HTML main-content extraction (operator M4, SURVEY.md §2.2) — the
flagship stage.

The reference gets HTML body text from Tika's HtmlParser (URL parses in
``/root/reference/spec/integration/web_url_processing_spec.rb:66-78``); the
north rule (BASELINE.json) upgrades this to a **Boilerpipe-style block
classifier**: parse the DOM, segment into text blocks at block-level element
boundaries, score each block by word count and link density, and keep only
main-content blocks.

Normative extraction spec (the corpus generator computes goldens from the
same rules — see ``docgen.expected_html_content``):

1. Decode bytes (charset stage rules), parse with an HTML tokenizer;
   ``script``/``style``/``noscript``/``template``/``svg``/``iframe``
   subtrees contribute no text.
2. A *block* is the text run between block-level tag boundaries (``p``,
   ``div``, ``h1``-``h6``, ``li``, ``td``, …). Inline tags (``a``,
   ``span``, ``b``, …) do not break blocks. A ``table`` subtree FUSES
   into one block (cells separated by single spaces): per-cell fragments
   would individually fail the word gate, so without fusion a data table
   inside an article silently vanishes — while a nav/menu table stays
   link-dense and is still dropped by rule 4 (Boilerpipe's table
   handling, re-expressed).
3. Per block: ``text`` = whitespace-normalized run (collapse runs of
   whitespace to one space, strip); ``n_words`` = split count;
   ``link_density`` = words inside ``<a>`` / ``n_words``.
4. Keep blocks with ``n_words >= MIN_WORDS`` (10) and
   ``link_density <= MAX_LINK_DENSITY`` (0.25).
5. ``content`` = kept block texts joined by ``"\\n"``; ``spans`` = one
   entry per kept block (page=0, order=index, kind="p").
6. ``<title>`` text (normalized) → metadata key ``dc:title``.
"""

from __future__ import annotations

from html.parser import HTMLParser

from rika_ray.docgen import normalize_block_text

MIN_WORDS = 10
MAX_LINK_DENSITY = 0.25

_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li td th tr table ul ol dl dd dt article
    section blockquote pre main header footer nav aside body figure
    figcaption form fieldset address hr br center""".split()
)
_SKIP_TAGS = frozenset("script style noscript template svg iframe".split())


class _Block:
    __slots__ = ("parts", "linked_words")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.linked_words = 0


class _BlockParser(HTMLParser):
    """Tokenizes HTML into text blocks with per-block link-word counts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, n_words, n_linked)
        self._cur = _Block()
        self._skip_depth = 0
        self._anchor_depth = 0
        self._table_depth = 0
        self._in_title = False
        self.title_parts: list[str] = []

    def _flush(self) -> None:
        raw = "".join(self._cur.parts)
        text = normalize_block_text(raw)
        if text:
            n_words = len(text.split())
            self.blocks.append((text, n_words, self._cur.linked_words))
        self._cur = _Block()

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag == "table":
            # table fusion: open a fused region (nested tables extend it)
            if self._table_depth == 0:
                self._flush()
            self._table_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._boundary()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag == "table":
            self._table_depth = max(0, self._table_depth - 1)
            if self._table_depth == 0:
                self._flush()
            return
        if tag in _BLOCK_TAGS:
            self._boundary()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._boundary()

    def _boundary(self) -> None:
        """Block-tag boundary: a flush outside a table, a single-space
        cell/row separator inside one (the fused-region accumulation)."""
        if self._table_depth:
            self._cur.parts.append(" ")
        else:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
            return
        if data:
            self._cur.parts.append(data)
            if self._anchor_depth:
                self._cur.linked_words += len(data.split())

    def close(self) -> None:
        super().close()
        self._flush()


import re
from html import unescape as _unescape

# One-pass tag tokenizer (the stdlib HTMLParser spends ~1 ms/page in its
# per-tag Python machinery — 98% of extraction time on HTML-heavy
# corpora; this regex pass is ~3× faster with identical events for the
# block classifier: start/end/self-closing tag names + entity-decoded
# text runs; comments/declarations/PIs skipped).
_TOKEN_RE = re.compile(
    r"""<!--.*?(?:-->|$)
      | <!\[CDATA\[.*?(?:\]\]>|$)
      | <![^>]*>?
      | <\?[^>]*>?
      | <\s*/\s*([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>
      | <([a-zA-Z][a-zA-Z0-9:_-]*)((?:"[^"]*"|'[^']*'|[^>"'])*)(/?)>
    """,
    re.S | re.X,
)
# script/style are raw-text elements: content runs to the matching close
# tag with no tokenization (same as the stdlib parser's CDATA mode)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script[^>]*>", re.I),
    "style": re.compile(r"</\s*style[^>]*>", re.I),
}


def _fast_blocks(html_text: str) -> _BlockParser:
    """Drive the same _BlockParser handler logic from the fast tokenizer.
    Returns the handler with .blocks / .title_parts populated."""
    h = _BlockParser()
    pos = 0
    n = len(html_text)
    data_start = 0
    while pos < n:
        m = _TOKEN_RE.search(html_text, pos)
        if m is None:
            break
        if m.start() > data_start:
            seg = html_text[data_start : m.start()]
            h.handle_data(_unescape(seg) if "&" in seg else seg)
        end_name, start_name, _attrs, selfclose = m.groups()
        pos = m.end()
        data_start = pos
        if start_name is not None:
            tag = start_name.lower()
            if selfclose:
                h.handle_startendtag(tag, ())
            else:
                h.handle_starttag(tag, ())
                closer = _RAWTEXT_CLOSE.get(tag)
                if closer is not None:
                    cm = closer.search(html_text, pos)
                    # raw-text content is discarded (skip tags) — jump
                    # straight past the close tag (or EOF if unclosed)
                    pos = cm.end() if cm else n
                    data_start = pos
                    h.handle_endtag(tag)
        elif end_name is not None:
            h.handle_endtag(end_name.lower())
        # other branches (comment/cdata/doctype/PI): no event
    if data_start < n:
        seg = html_text[data_start:]
        h.handle_data(_unescape(seg) if "&" in seg else seg)
    h._flush()
    return h


def _classify(parser: _BlockParser) -> tuple[str, list[dict], dict[str, str]]:
    kept: list[str] = []
    spans: list[dict] = []
    for text, n_words, n_linked in parser.blocks:
        if n_words < MIN_WORDS:
            continue
        if n_linked / n_words > MAX_LINK_DENSITY:
            continue
        spans.append(
            {"page": 0, "order": len(kept), "kind": "p", "text": text}
        )
        kept.append(text)

    metadata: dict[str, str] = {}
    title = normalize_block_text("".join(parser.title_parts))
    if title:
        metadata["dc:title"] = title
    return "\n".join(kept), spans, metadata


def extract_html(html_text: str) -> tuple[str, list[dict], dict[str, str]]:
    """Extract (content, spans, metadata) from decoded HTML text.

    Returns the main-content text per the normative spec above, spans for
    each kept block, and metadata (``dc:title`` when a title exists).
    """
    return _classify(_fast_blocks(html_text))


def extract_html_reference(
    html_text: str,
) -> tuple[str, list[dict], dict[str, str]]:
    """Reference path driving the same handler through the stdlib
    HTMLParser tokenizer — kept for the differential parity test (the
    fast tokenizer must produce identical events on realistic HTML)."""
    parser = _BlockParser()
    parser.feed(html_text)
    parser.close()
    return _classify(parser)
