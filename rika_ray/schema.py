"""Arrow schemas for the extraction engine (SURVEY.md §1.2).

Input shape is fixed by BASELINE.json ``input_hint``: a Parquet table of
Common-Crawl-style web pages. Output shape is the scale reinterpretation of
the reference's per-document ``ParseResult`` record
(``/root/reference/lib/rika/parse_result.rb:5-15``): every ParseResult field
becomes a column; the dynamic string→string metadata hash becomes a
key-sorted ``list<struct<key,value>>`` column (Arrow map_ round-trips through
Parquet order-lossy, so we store sorted pairs explicitly — SURVEY.md §7
"Metadata map ordering").
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: web_pages (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

WEB_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),  # unique key
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.large_binary()),  # raw doc bytes; format sniffed
        pa.field("text", pa.string()),  # prior extraction, nullable
        pa.field("lang", pa.string()),  # claimed language, nullable
    ]
)

# ---------------------------------------------------------------------------
# Metadata pairs: flat string→string map, key-sorted case-insensitively
# (reference sorts with `sort_by { |k, _| k.downcase }`,
#  /root/reference/lib/rika/parser.rb:34)
# ---------------------------------------------------------------------------

METADATA_TYPE = pa.large_list(
    pa.struct([pa.field("key", pa.string()), pa.field("value", pa.string())])
)

# Ordered layout spans (page, order, kind, text); the structured intermediate
# whose deterministic concatenation is `content` (SURVEY.md §1.2).
SPANS_TYPE = pa.large_list(
    pa.struct(
        [
            pa.field("page", pa.int32()),
            pa.field("order", pa.int32()),
            pa.field("kind", pa.string()),
            pa.field("text", pa.large_string()),
        ]
    )
)

# ---------------------------------------------------------------------------
# Output: extracted (one row per input row; errors are data, never raises —
# reference accumulates per-target failures and continues,
# /root/reference/lib/rika/cli/rika_command.rb:85-89,197-216)
# ---------------------------------------------------------------------------

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("content", pa.large_string()),  # "" for no-text formats
        pa.field("content_type", pa.string()),  # full, incl. "; charset=..."
        pa.field("media_type", pa.string()),  # type without parameters
        pa.field("charset", pa.string()),  # nullable
        pa.field("language", pa.string()),  # ISO 639-1, nullable
        pa.field("input_type", pa.string()),  # "file" | "http" provenance
        pa.field("data_source", pa.string()),  # = url
        pa.field("metadata", METADATA_TYPE),
        pa.field("spans", SPANS_TYPE),
        pa.field("error_type", pa.string()),  # §2.8 taxonomy, nullable
        pa.field("error_message", pa.string()),  # nullable
    ]
)

# Error taxonomy: the reference's typed bad-target accumulation
# (/root/reference/lib/rika/cli/rika_command.rb:106-115 and
#  lib/rika/cli/args_parser.rb:160-233) reinterpreted as row-level values.
ERROR_TYPES = (
    "empty_file",  # zero-length html payload (args_parser.rb:227)
    "non_existent_file",  # file-mode ingest: path missing
    "is_symlink_wont_process",  # file-mode ingest: symlink skipped
    "file_with_url_characters",  # file-mode ingest
    "bad_url_scheme",  # URL ingest: non-http(s) scheme
    "invalid_url",  # URL ingest: unparseable
    "unknown_host",  # HTTP fetch failure (rika_command.rb:205)
    "io_error",  # stream-level failure (rika_command.rb:207)
    "invalid_input",  # ArgumentError analogue (rika_command.rb:209)
    "parse_error",  # parser kernel failed on this document
    "encrypted_document",  # Tika EncryptedDocumentException analogue
)


def empty_extracted_table() -> pa.Table:
    """An empty table with the canonical output schema."""
    return EXTRACTED_SCHEMA.empty_table()
