"""Regenerate the checked-in golden language-ID table for the ``lang_id``
driver oracle.

The table is (doc_id, language) — the engine's n-gram detector run
directly (no Ray) over the driver-fixed ``documents`` table at the sf0.01
tier. This is a REGRESSION pin, not an independent oracle: freezing the
detector's current output makes any silent detector drift break the
driver's ``hash_match`` instead of only pytest (the same role the
reference's language fixture expectations play,
``/root/reference/spec/rika/parser_spec.rb:252-259``).

The input file's md5 is recorded in the table metadata;
``tests/test_golden_hashes.py`` recomputes the full table and fails loudly
if the detector or the input changed without a regen.

Usage: python tools/gen_golden_lang.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

DOCS = "/root/testdata/sf0.01/documents.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "rika_ray",
    "data",
    "golden_lang_id_sf0.01.parquet",
)


def docs_md5(path: str = DOCS) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def golden_table(path: str = DOCS) -> pa.Table:
    from rika_ray.stages.lang import LangDetectStage

    docs = pq.read_table(path, columns=["doc_id", "text"])
    stage = LangDetectStage()
    out = stage(
        pa.table({"doc_id": docs["doc_id"], "content": docs["text"]})
    )
    return pa.table(
        {"doc_id": out["doc_id"], "language": out["language"]}
    ).sort_by("doc_id")


def main() -> None:
    t = golden_table()
    t = t.replace_schema_metadata({"docs_md5": docs_md5()})
    pq.write_table(t, OUT)
    print(f"wrote {OUT}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
