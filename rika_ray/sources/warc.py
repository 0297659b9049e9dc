"""WARC ingest → ``web_pages`` table (Common-Crawl-native source, S1 family).

The north-star input is "Parquet tables of Common-Crawl-style web pages"
(``/root/repo/BASELINE.json`` input_hint); those tables are themselves
produced from WARC archives (ISO 28500 — the public Common Crawl container
format). This source closes that loop: :func:`read_warc` turns ``.warc`` /
``.warc.gz`` files into the fixed ``web_pages`` shape so the extraction
pipeline runs straight off a crawl drop with no side tooling. The reference
analogue is the data-source abstraction (one opaque byte stream per
document, ``/root/reference/lib/rika/parser.rb:59-71``) — here the "data
source" is a crawl record instead of a file path.

Format essentials (public WARC 1.0/1.1 spec):

- a WARC file is a sequence of records: a header block (``WARC/1.1\\r\\n``
  + ``Name: value`` lines + blank line), a ``Content-Length``-sized body,
  then ``\\r\\n\\r\\n``;
- ``.warc.gz`` stores **each record as its own gzip member** (concatenated
  members) so records are individually addressable; a whole-file gzip also
  decodes correctly through the same member walk;
- ``response`` records carry a full HTTP response (status line + headers +
  payload) — the page bytes are the HTTP payload; ``resource`` records
  carry the payload directly. ``warcinfo`` / ``request`` / ``metadata``
  records carry no page content and are skipped.

Scale notes (100 TB = ~100k WARC files):

- one read task per WARC file (``read_binary_files`` keeps file
  granularity); the per-file expansion emits one Arrow table per batch of
  files, and Ray's dynamic block splitting re-chunks output blocks, so a
  1 GiB WARC never forces a 1 GiB block downstream;
- gzip members are decompressed one record at a time — peak heap per task
  is O(largest record), not O(file); records above
  ``MAX_RECORD_BYTES`` are skipped (bomb guard, same policy as the archive
  kernels);
- a corrupt tail stops that file's walk (records already parsed are kept)
  rather than failing the task — a 10^12-doc job must not die on one bad
  crawl segment (§2.8 errors-as-data).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator

import pyarrow as pa
import ray.data

from rika_ray.schema import WEB_PAGES_SCHEMA

# Record types that carry page payloads.
_PAYLOAD_TYPES = ("response", "resource", "conversion")

# Bomb guard: skip records whose declared body exceeds this.
MAX_RECORD_BYTES = 256 * 1024 * 1024


class WarcParseError(Exception):
    """Framing error — the current file's walk stops here."""


def _parse_one(buf: bytes, pos: int) -> tuple[dict | None, int]:
    """Parse one record at ``pos``; return (record | None, next_pos).

    ``None`` marks a record to skip (non-payload type, over-budget, or
    missing URL). Raises :class:`WarcParseError` on broken framing.
    """
    # tolerate stray blank lines between records
    while buf[pos : pos + 2] == b"\r\n":
        pos += 2
    if pos >= len(buf):
        return None, pos
    if not buf.startswith(b"WARC/", pos):
        raise WarcParseError(f"no WARC version line at offset {pos}")
    head_end = buf.find(b"\r\n\r\n", pos)
    if head_end < 0:
        raise WarcParseError("unterminated record header")
    headers: dict[str, str] = {}
    for line in buf[pos:head_end].split(b"\r\n")[1:]:
        name, sep, value = line.partition(b":")
        if sep:
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1", "replace")
            )
    try:
        length = int(headers["content-length"])
    except (KeyError, ValueError):
        raise WarcParseError("missing/invalid Content-Length") from None
    body_start = head_end + 4
    next_pos = body_start + length + 4  # trailing \r\n\r\n
    if length < 0 or body_start + length > len(buf):
        raise WarcParseError("record body runs past end of data")
    rec_type = headers.get("warc-type", "")
    url = headers.get("warc-target-uri")
    if rec_type not in _PAYLOAD_TYPES or not url or length > MAX_RECORD_BYTES:
        return None, next_pos
    body = buf[body_start : body_start + length]
    if rec_type == "response":
        # strip the HTTP envelope: payload begins after the first blank line
        split = body.find(b"\r\n\r\n")
        payload = body[split + 4 :] if split >= 0 else b""
    else:
        payload = body
    ts = _parse_warc_date(headers.get("warc-date"))
    return {"url": url, "warc_ts": ts, "html": payload}, next_pos


def _parse_warc_date(value: str | None) -> datetime | None:
    if not value:
        return None
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _iter_plain(buf: bytes) -> Iterator[dict]:
    pos = 0
    while pos < len(buf):
        try:
            rec, pos = _parse_one(buf, pos)
        except WarcParseError:
            return  # corrupt tail: keep what we have
        if rec is not None:
            yield rec


def _iter_gzip_members(data: bytes) -> Iterator[dict]:
    """Walk concatenated gzip members (the .warc.gz layout), decompressing
    ONE member at a time — peak heap is the largest single record."""
    mv = memoryview(data)  # zero-copy member slicing
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(mv[pos:], MAX_RECORD_BYTES)
        except zlib.error:
            return  # corrupt member: stop this file's walk
        if d.unconsumed_tail:
            return  # member over budget: stop this file's walk (bomb guard)
        yield from _iter_plain(member)
        consumed = len(data) - pos - len(d.unused_data)
        if not d.eof or consumed <= 0:
            return
        pos += consumed


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield ``{url, warc_ts, html}`` dicts for every payload-bearing
    record in one WARC file (plain or gzipped)."""
    if data[:2] == b"\x1f\x8b":
        yield from _iter_gzip_members(data)
    else:
        yield from _iter_plain(data)


def read_warc(paths: list[str] | str) -> ray.data.Dataset:
    """``.warc`` / ``.warc.gz`` files → ``web_pages``-shaped Dataset.

    One read task per file; records expand inside the batch kernel into one
    Arrow table per file batch (``text`` / ``lang`` null — a fresh crawl has
    no prior extraction).
    """
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def _expand(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[datetime | None] = []
        payloads: list[bytes] = []
        for raw in batch["bytes"]:
            for rec in iter_warc_records(raw.as_py()):
                urls.append(rec["url"])
                tss.append(rec["warc_ts"])
                payloads.append(rec["html"])
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(payloads, pa.large_binary()),
                "text": pa.array([None] * n, pa.string()),
                "lang": pa.array([None] * n, pa.string()),
            },
            schema=WEB_PAGES_SCHEMA,
        )

    return ds.map_batches(_expand, batch_format="pyarrow")
