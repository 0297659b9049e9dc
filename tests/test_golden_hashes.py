"""The checked-in golden content-hash table must track the corpus
generator: a CORPUS_VERSION bump without re-running
tools/gen_golden_hashes.py would silently fail the driver's
extract_content_hashes oracle row — fail HERE instead, with the fix in
the message."""

from __future__ import annotations

import pyarrow.parquet as pq

from rika_ray.corpus import CORPUS_VERSION

STALE_MSG = (
    "golden_content_hashes_sf0.01.parquet is stale — regenerate with "
    "`python tools/gen_golden_hashes.py` and commit the result"
)


def test_golden_hash_table_matches_current_corpus():
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_golden_hashes import OUT, golden_table

    checked_in = pq.read_table(OUT)
    meta = checked_in.schema.metadata or {}
    assert meta.get(b"corpus_version") == str(CORPUS_VERSION).encode(), STALE_MSG

    fresh = golden_table()
    assert checked_in.num_rows == fresh.num_rows, STALE_MSG
    assert checked_in.schema.names == fresh.schema.names, STALE_MSG
    for col in fresh.schema.names:
        assert (
            checked_in.column(col).to_pylist() == fresh.column(col).to_pylist()
        ), f"{STALE_MSG} (column {col!r} differs)"


def test_golden_lang_table_matches_current_detector():
    """The lang_id golden is a detector-regression pin: recompute the full
    table (500 docs, vectorized — cheap) and require equality, plus the
    recorded input md5 to match the driver's documents table."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from gen_golden_lang import OUT as LANG_OUT
    from gen_golden_lang import docs_md5, golden_table as lang_golden

    checked_in = pq.read_table(LANG_OUT)
    meta = checked_in.schema.metadata or {}
    stale = (
        "golden_lang_id_sf0.01.parquet is stale — regenerate with "
        "`python tools/gen_golden_lang.py` and commit the result"
    )
    assert meta.get(b"docs_md5") == docs_md5().encode(), stale
    fresh = lang_golden()
    assert checked_in.column("doc_id").to_pylist() == fresh.column("doc_id").to_pylist(), stale
    assert (
        checked_in.column("language").to_pylist()
        == fresh.column("language").to_pylist()
    ), stale


def test_golden_hash_table_is_sorted_and_plausible():
    from gen_golden_hashes import OUT

    t = pq.read_table(OUT)
    rows = list(
        zip(t.column("url").to_pylist(), t.column("content_md5").to_pylist())
    )
    assert rows == sorted(rows)
    non_empty = [h for _, h in rows if h]
    assert len(non_empty) > 0.8 * len(rows)  # most rows extract cleanly
    assert all(len(h) == 32 for h in non_empty)
