"""WARC source (Common-Crawl-native ingest, SURVEY.md §2.1 S1 family).

The web_pages input tables of BASELINE.json are produced from WARC crawl
archives; read_warc closes that loop. Framing per the public ISO 28500
spec; reference analogue is the one-opaque-stream-per-document data-source
abstraction (/root/reference/lib/rika/parser.rb:59-71).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from rika_ray import docgen
from rika_ray.sources.warc import iter_warc_records

RECS = [
    (
        "https://example.test/a",
        "2026-01-02T03:04:05Z",
        b"<!DOCTYPE html><html><body><p>alpha page body</p></body></html>",
        "text/html",
    ),
    (
        "https://example.test/b",
        "2026-01-02T03:04:06Z",
        b"plain text page two",
        "text/plain",
    ),
]


def test_plain_warc_roundtrip():
    data = docgen.build_warc(RECS)
    got = list(iter_warc_records(data))
    assert [(r["url"], r["html"]) for r in got] == [
        (u, p) for u, _, p, _ in RECS
    ]
    assert got[0]["warc_ts"] == datetime(2026, 1, 2, 3, 4, 5)


def test_gzip_member_warc_roundtrip():
    data = docgen.build_warc(RECS, gzip_members=True)
    assert data[:2] == b"\x1f\x8b"
    got = list(iter_warc_records(data))
    assert [(r["url"], r["html"]) for r in got] == [
        (u, p) for u, _, p, _ in RECS
    ]


def test_whole_file_gzip_also_decodes():
    import gzip

    data = gzip.compress(docgen.build_warc(RECS), mtime=0)
    got = list(iter_warc_records(data))
    assert len(got) == 2


def test_noise_records_skipped_and_http_envelope_stripped():
    data = docgen.build_warc(RECS, include_noise_records=True)
    got = list(iter_warc_records(data))
    # warcinfo + per-record request records never surface
    assert len(got) == 2
    assert not got[0]["html"].startswith(b"HTTP/1.1")


def test_corrupt_tail_keeps_parsed_prefix():
    data = docgen.build_warc(RECS, include_noise_records=False)
    # append garbage where the next record header should be
    got = list(iter_warc_records(data + b"NOT A WARC HEADER"))
    assert [r["url"] for r in got] == [u for u, *_ in RECS]
    # truncate mid-body of the second record: only the first survives
    cut = data.find(b"page two")
    got2 = list(iter_warc_records(data[:cut]))
    assert [r["url"] for r in got2] == ["https://example.test/a"]


def test_read_warc_dataset_and_extraction_parity(ray_session, corpus_dir, tmp_path):
    """End-to-end: corpus html → WARC file → read_warc → extraction
    pipeline == extraction over the direct web_pages table (byte-identical
    content per url)."""
    import pyarrow.parquet as pq

    from rika_ray.pipelines.extraction import (
        ExtractionConfig,
        build_extraction_pipeline,
        read_web_pages,
    )
    from rika_ray.sources.warc import read_warc

    web = pq.read_table(f"{corpus_dir}/web_pages.parquet")
    rows = [
        r
        for r in web.to_pylist()
        if r["html"] and len(r["html"]) > 0
    ][:40]
    recs = [
        (
            r["url"],
            r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
            r["html"],
            "application/octet-stream",
        )
        for r in rows
    ]
    warc_path = tmp_path / "segment-00000.warc.gz"
    warc_path.write_bytes(docgen.build_warc(recs, gzip_members=True))

    out_warc = build_extraction_pipeline(
        read_warc([str(warc_path)]), ExtractionConfig()
    )
    got = {
        r["url"]: (r["content"], r["media_type"], r["error_type"])
        for r in out_warc.select_columns(
            ["url", "content", "media_type", "error_type"]
        ).take_all()
    }

    direct = build_extraction_pipeline(
        read_web_pages(f"{corpus_dir}/web_pages.parquet").filter(
            lambda r: r["url"] in {x["url"] for x in rows}
        ),
        ExtractionConfig(),
    )
    want = {
        r["url"]: (r["content"], r["media_type"], r["error_type"])
        for r in direct.select_columns(
            ["url", "content", "media_type", "error_type"]
        ).take_all()
    }
    assert len(got) == len(rows)
    assert got == want


def test_wet_conversion_records_supported():
    """Common Crawl WET files carry extracted text as ``conversion``
    records (no HTTP envelope) — the reader must yield their payload
    verbatim as the page bytes."""
    from rika_ray.sources.warc import iter_warc_records

    body = "Extracted plain text.\nSecond line.\n".encode()
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: https://example.test/wet\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}".encode()
        + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    got = list(iter_warc_records(rec))
    assert len(got) == 1
    assert got[0]["url"] == "https://example.test/wet"
    assert got[0]["html"] == body  # no envelope stripping on conversion
