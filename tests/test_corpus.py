"""Corpus generator invariants (FIXTURES.md)."""

from __future__ import annotations

import pyarrow as pa

from rika_ray.corpus import generate_corpus
from rika_ray.schema import WEB_PAGES_SCHEMA


def test_schema_matches_input_hint(corpus_tables):
    web_pages, expected = corpus_tables
    assert web_pages.schema.equals(WEB_PAGES_SCHEMA)
    assert set(expected.column_names) >= {
        "url", "content", "content_type", "media_type", "charset",
        "language", "metadata", "error_type",
    }


def test_deterministic():
    a_pages, a_exp = generate_corpus(n_per_family=2, seed=42)
    b_pages, b_exp = generate_corpus(n_per_family=2, seed=42)
    assert a_pages.equals(b_pages)
    assert a_exp.equals(b_exp)


def test_rows_aligned_and_families_present(corpus_tables):
    web_pages, expected = corpus_tables
    assert len(web_pages) == len(expected)
    urls = web_pages["url"].to_pylist()
    # dup_url family: same url twice, processed twice (no implicit dedup)
    assert urls.count("https://fixtures.test/dup/000000") == 2
    families = {u.split("/")[3] for u in urls}
    for fam in ("plain-en", "plain-ru", "plain-latin1", "html",
                "html-nomain", "pdf", "docx", "jpeg", "png", "unknown",
                "empty", "tiny", "mega", "corrupt-pdf",
                "epub", "xls", "ppt", "mp3", "mp3-bare", "jpeg-exif"):
        assert fam in families, fam


def test_error_rows_marked(corpus_tables):
    _, expected = corpus_tables
    by_err = {}
    for r in expected.to_pylist():
        by_err.setdefault(r["error_type"], []).append(r)
    assert len(by_err[None]) > 0
    assert len(by_err["empty_file"]) == 2
    # 2 random-bytes + 2 corrupt xref-stream + 1 corrupt gzip + 1 corrupt zip
    assert len(by_err["parse_error"]) == 7
    assert len(by_err["encrypted_document"]) == 1
    for r in (
        by_err["empty_file"]
        + by_err["parse_error"]
        + by_err["encrypted_document"]
    ):
        assert r["content"] is None
        assert r["metadata"] is None


def test_metadata_pairs_key_sorted(corpus_tables):
    _, expected = corpus_tables
    for r in expected.to_pylist():
        if r["metadata"] is None:
            continue
        keys = [p["key"] for p in r["metadata"]]
        assert keys == sorted(keys, key=lambda s: (s.lower(), s))
        assert "rika:data-source" in keys
        assert "Content-Type" in keys


def test_mega_docs_are_large(corpus_tables):
    web_pages, _ = corpus_tables
    sizes = [
        len(r["html"])
        for r in web_pages.to_pylist()
        if "/mega/" in r["url"]
    ]
    assert len(sizes) == 2 and all(s > 1_000_000 for s in sizes)
