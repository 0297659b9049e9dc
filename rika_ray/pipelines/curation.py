"""Composed training-data curation pipeline (the task brief's flagship
composition): quality filter → exact dedup → per-domain cap, end to end as
ONE streaming Dataset program.

Each stage is the already-oracled operator re-expressed over a flowing
Dataset instead of a fresh read — demonstrating that the engine's
operators compose without materializing between stages:

1. **Quality filter** — token count ≥ ``min_words`` (Arrow C++ tokenize,
   same normative tokenizer as ``text_analysis``).
2. **Exact dedup** — 128-bit content key (two independent 64-bit hashes;
   see ``dedup.dedup_exact_survivors`` for the collision math), smallest
   doc_id survives; survivors are re-joined to their metadata with a
   distributed hash join (both sides corpus-sized — no broadcast).
3. **Per-domain cap** — at most ``per_source_cap`` docs per source
   (CCNet/Gopher-style quota), one bounded-key shuffle + vectorized
   rank-per-partition (no per-domain groups).

Scale notes: text is dropped right after hashing (stage 2 ships 16-byte
keys); the join ships (doc_id) vs (doc_id, source) rows only; the cap's
shuffle key is ``hash(source) % P`` so a hot domain costs one partition
sort, never an unbounded group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Min

from rika_ray.functions.text import tokenize_arrow


def curated_docs(
    sf_dir: str,
    min_words: int = 50,
    per_source_cap: int = 20,
) -> ray.data.Dataset:
    from rika_ray.pipelines.relational import _session_parts

    from rika_ray.sources.parquet import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    # stage 1+2a fused in one scan: quality-filter the batch, then hash the
    # survivors' text and DROP it — downstream moves 16-byte keys + source
    def _filter_hash(batch: pa.Table) -> pa.Table:
        toks, _ = tokenize_arrow(batch["text"])
        n_words = pc.list_value_length(toks)
        keep = pc.greater_equal(n_words, pa.scalar(min_words, pa.int32()))
        batch = batch.filter(keep)
        texts = np.asarray(batch["text"].to_pylist(), dtype=object)
        h1 = pd.util.hash_array(texts, categorize=False)
        h2 = pd.util.hash_array(
            texts, categorize=False, hash_key="rika_ray_dedup_2"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "content_hash": pa.array(h1.view(np.int64), pa.int64()),
                "content_hash2": pa.array(h2.view(np.int64), pa.int64()),
            }
        )

    # materialized ONCE: two downstream branches (survivor aggregation and
    # the meta join side) consume it — unmaterialized, Ray's lazy plan
    # would re-run the whole read+tokenize+hash scan per branch
    hashed = docs.map_batches(
        _filter_hash, batch_format="pyarrow", batch_size=2048
    ).materialize()
    n_hashed = hashed.count()
    if n_hashed == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                }
            )
        )

    survivors = (
        hashed.select_columns(["doc_id", "content_hash", "content_hash2"])
        .groupby(["content_hash", "content_hash2"])
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )

    # survivors ⨝ (doc_id, source): hash join, both sides filtered-corpus-
    # sized. The join coalesces the key pair under the LEFT name (doc_id).
    # Partitions clamped by the known row count — unclamped
    # max(4, cluster_cpus()) on a small filtered corpus produces empty
    # partitions that lose schema and crash the join finalize (the
    # neardup_clusters round-3 bug; see dedup._join_parts)
    from rika_ray.pipelines.dedup import _join_parts

    meta = hashed.select_columns(["doc_id", "source"])
    joined = survivors.join(
        meta, "inner", num_partitions=_join_parts(n_hashed),
        on=("doc_id",), right_on=("doc_id",),
    )

    # stage 3: per-source cap — one bounded-key shuffle, vectorized rank
    def _add_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch["source"].to_numpy(zero_copy_only=False), categorize=False
        )
        part = (h % np.uint64(_session_parts())).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def _cap_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        rank = g.groupby("source", sort=False).cumcount()
        return g.loc[rank < per_source_cap, ["doc_id", "source"]]

    return (
        joined.map_batches(_add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_cap_part, batch_format="pandas")
        .sort("doc_id")
    )
