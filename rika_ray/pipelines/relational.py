"""Relational operators over the driver testdata tables (SURVEY.md §2.5/2.6
A1-A3, O2-O6, M12-M14 analogues) — each with an exact DuckDB-SQL oracle in
``__ray_entry__.oracle_sql``.

Scale notes baked into every implementation:
- reads prune columns (``read_parquet(columns=[...])``),
- high-cardinality aggregations pre-aggregate inside ``map_batches``
  (partial combine) before the hash-shuffle ``groupby``,
- small-side joins broadcast via ``ray.put`` + per-batch lookup instead of
  an all-to-all shuffle join.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from rika_ray.functions.text import tokenize, tokenize_arrow
from rika_ray.pool import pool_spec


def _rp(sf_dir: str, table: str, columns: list[str] | None = None):
    from rika_ray.sources.parquet import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Tallies (A1/A2 analogues: low-cardinality groupby)
# ---------------------------------------------------------------------------

def _counted_tally(ds, key: str, alias: str = "n"):
    """Low-cardinality tally with in-batch partial counts (value_counts in
    C++), so the groupby shuffle moves (key, partial) rows only."""

    def _partial(batch: pa.Table) -> pa.Table:
        vc = batch[key].combine_chunks().value_counts()
        return pa.table(
            {key: vc.field("values"), alias: vc.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(key)
        .aggregate(Sum(alias, alias_name=alias))
    )



def source_tally(sf_dir: str) -> ray.data.Dataset:
    """Documents per source — the content-type-tally shape of
    /root/reference/README.md:233-249 over the documents table."""
    return _counted_tally(_rp(sf_dir, "documents", ["source"]), "source").sort(
        "source"
    )


def lang_claim_tally(sf_dir: str) -> ray.data.Dataset:
    return _counted_tally(_rp(sf_dir, "documents", ["lang"]), "lang").sort(
        "lang"
    )


# ---------------------------------------------------------------------------
# Top-k words (A3, /root/reference/README.md:268-287) — partial aggregation
# inside map_batches, then a small shuffle over (word, partial-count) rows.
# ---------------------------------------------------------------------------


def top_words(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    def _partial_counts(batch: pa.Table) -> pa.Table:
        # in-batch partial count entirely in Arrow C++: tokenize → flatten
        # → value_counts; the shuffle then moves (word, partial) rows
        toks, _ = tokenize_arrow(batch["text"])
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(_partial_counts, batch_format="pyarrow", batch_size=1024)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort([("cnt"), ("word")], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Projection / filter (M12, M14)
# ---------------------------------------------------------------------------


def docs_filter_project(sf_dir: str, min_chars: int = 300) -> ray.data.Dataset:
    # final sort: Ray's streaming executor does NOT preserve input order
    # (preserve_order defaults off), so an orderless filter's row order is
    # task-completion luck — observed reordered at 32 CPUs. Every oracle'd
    # query must end in an explicit total order.
    return (
        _rp(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        .filter(expr=f"n_chars > {min_chars}")
        .select_columns(["doc_id", "lang", "n_chars"])
        .sort("doc_id")
    )


def lineitem_filter_project(sf_dir: str, min_qty: float = 45.0) -> ray.data.Dataset:
    return (
        _rp(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
        .filter(expr=f"l_quantity > {min_qty}")
        .sort(["l_orderkey", "l_linenumber"])
    )


# ---------------------------------------------------------------------------
# Grouped aggregate flagship (TPC-H Q1 shape over lineitem)
# ---------------------------------------------------------------------------


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """Pricing summary per (returnflag, linestatus): the canonical wide
    aggregate. Derived column computed vectorized per batch; doubles rounded
    to 2dp in both engines so the value-hash is stable across summation
    order."""

    def _partial(batch: pa.Table) -> pa.Table:
        # in-batch partial aggregation (pyarrow C++ hash agg) — the shuffle
        # then moves ~6 rows per batch instead of the whole table
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        batch = batch.append_column("disc_price", disc_price)
        g = batch.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )
        # rename by NAME (pyarrow's "<col>_<agg>" outputs), not position —
        # key-vs-aggregate column ordering is pyarrow-version-dependent
        return pa.table(
            {
                "l_returnflag": g["l_returnflag"],
                "l_linestatus": g["l_linestatus"],
                "sum_qty": g["l_quantity_sum"],
                "sum_disc_price": g["disc_price_sum"],
                "count_order": g["l_quantity_count"],
            }
        )

    ds = (
        _rp(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity",
             "l_extendedprice", "l_discount"],
        )
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": batch["sum_qty"],
                "sum_disc_price": pc.round(batch["sum_disc_price"], 2),
                "count_order": batch["count_order"],
            }
        )

    return ds.map_batches(_round, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def orders_priority_tally(sf_dir: str) -> ray.data.Dataset:
    return _counted_tally(
        _rp(sf_dir, "orders", ["o_orderpriority"]), "o_orderpriority"
    ).sort("o_orderpriority")


# ---------------------------------------------------------------------------
# Broadcast joins (§2.4): small side shipped once via ray.put, looked up
# per batch — no shuffle of the big side.
# ---------------------------------------------------------------------------


def orders_per_segment(sf_dir: str) -> ray.data.Dataset:
    """orders ⨝ customer (broadcast) → count per market segment."""
    cust = (
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    class SegmentJoin:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            # lookup + in-batch partial count: the shuffle moves ~5 rows
            # per batch, not one row per order
            seg = batch["o_custkey"].map(self.lookup)
            vc = seg.value_counts()
            return pd.DataFrame(
                {"c_mktsegment": vc.index, "n": vc.to_numpy()}
            )

    return (
        _rp(sf_dir, "orders", ["o_custkey"])
        .map_batches(SegmentJoin, batch_format="pandas", batch_size=65536,
                     concurrency=pool_spec(), num_cpus=0.5)
        .groupby("c_mktsegment")
        .aggregate(Sum("n", alias_name="n"))
        .sort("c_mktsegment")
    )


def supplier_revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """lineitem ⨝ supplier ⨝ nation → revenue per nation name.

    Scale shape: the two small sides (supplier keys → nation name) are
    composed driver-side into ONE broadcast dict shipped via ``ray.put``;
    each lineitem batch then does lookup + in-batch partial sum, so the
    shuffle moves ~25 (nation, partial) rows per batch, never lineitem
    rows. Partitioning assumption: the supplier→nation map fits worker
    memory (supplier is ~1/600 of lineitem rows and 2 ints wide; beyond
    that, swap the broadcast for a key-bucketed shuffle join). Doubles are
    rounded to 2dp in both engines (same rationale as pricing_summary)."""
    supp = _rp(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _rp(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp_to_nation = {
        int(k): nation_names[v]
        for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
    }
    lookup_ref = ray.put(supp_to_nation)

    class NationRevenue:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            revenue = batch["l_extendedprice"].to_numpy() * (
                1.0 - batch["l_discount"].to_numpy()
            )
            nname = batch["l_suppkey"].map(self.lookup)
            g = pd.DataFrame({"n_name": nname, "revenue": revenue}).groupby(
                "n_name", as_index=False, sort=False
            )["revenue"].sum()
            return g

    ds = (
        _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(NationRevenue, batch_format="pandas", batch_size=65536,
                     concurrency=pool_spec(), num_cpus=0.5)
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch["n_name"],
                "revenue": pc.round(batch["revenue"], 2),
            }
        )

    return ds.map_batches(_round, batch_format="pyarrow").sort("n_name")


def top_parts_by_quantity(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Top-k parts by total shipped quantity: a HIGH-cardinality groupby
    (one group per partkey) with in-batch partial sums, then the top-k
    taken with a deterministic (qty DESC, partkey ASC) tie-break — the
    heavy-groupby + topk pattern (A3/O3 over a wide key space)."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["l_partkey"]).aggregate([("l_quantity", "sum")])
        return pa.table(
            {"l_partkey": g["l_partkey"], "qty": g["l_quantity_sum"]}
        )

    return (
        _rp(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_partkey")
        .aggregate(Sum("qty", alias_name="qty"))
        .sort([("qty"), ("l_partkey")], descending=[True, False])
        .limit(k)
    )


def top_parts_per_brand(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-GROUP top-k (the windowed-ranking operator class: SQL
    ``ROW_NUMBER() OVER (PARTITION BY brand ORDER BY price DESC, key)``):
    for every brand, its k highest-priced parts with their rank.

    Scale shape: an in-batch COMBINER keeps only each batch's local
    per-brand top-k (a batch can never contribute more than k rows per
    brand to the global answer), so the shuffle moves ≤ k × brands ×
    blocks rows instead of the part table; ``map_groups`` then ranks the
    surviving ≤ k × blocks rows per brand. Partitioning assumption: the
    group count (brands) is bounded — for an unbounded key space the
    combiner still holds, but the final stage's per-group dispatch cost
    grows with distinct keys (see user_sessions for the partition-id
    alternative). Ties broken by p_partkey ASC → fully deterministic."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["p_brand", "p_partkey", "p_retailprice"]
        ).to_pandas()
        df = df.sort_values(
            ["p_brand", "p_retailprice", "p_partkey"],
            ascending=[True, False, True],
        )
        return pa.Table.from_pandas(
            df.groupby("p_brand", sort=False).head(k), preserve_index=False
        )

    def _rank(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["p_retailprice", "p_partkey"], ascending=[False, True]
        ).head(k)
        # pa.Table output: pandas frames unioned with arrow blocks trip
        # Ray's inferred_block_type assertion at high CPU counts
        return pa.table(
            {
                "p_brand": pa.array(g["p_brand"], pa.string()),
                "p_partkey": pa.array(g["p_partkey"], pa.int64()),
                "p_retailprice": pa.array(
                    g["p_retailprice"], pa.float64()
                ),
                "rank": pa.array(
                    np.arange(1, len(g) + 1), pa.int64()
                ),
            }
        )

    return (
        _rp(sf_dir, "part", ["p_brand", "p_partkey", "p_retailprice"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("p_brand")
        .map_groups(_rank, batch_format="pandas")
        .sort(["p_brand", "rank"])
    )


def customers_per_region(sf_dir: str) -> ray.data.Dataset:
    """customer ⨝ nation ⨝ region via a composed broadcast lookup."""
    nation = _rp(sf_dir, "nation").to_pandas()
    region = _rp(sf_dir, "region").to_pandas()
    region_names = dict(zip(region["r_regionkey"], region["r_name"]))
    nation_to_region = {
        int(r["n_nationkey"]): region_names[r["n_regionkey"]]
        for _, r in nation.iterrows()
    }
    lookup_ref = ray.put(nation_to_region)

    class RegionJoin:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"r_name": batch["c_nationkey"].map(self.lookup)}
            )

    return (
        _rp(sf_dir, "customer", ["c_nationkey"])
        .map_batches(RegionJoin, batch_format="pandas",
                     concurrency=pool_spec(), num_cpus=0.5)
        .groupby("r_name")
        .aggregate(Count(alias_name="n"))
        .sort("r_name")
    )


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> ray.data.Dataset:
    """TPC-H-Q3-shaped: customer ⨝ orders ⨝ lineitem → top-k undelivered
    orders by revenue for one market segment.

    Scale shape (round-4 rewrite of a driver-side broadcast — the date
    cutoff keeps most of orders, so the old ``orders.to_pandas()`` was a
    corpus-scale driver materialization): both joins are distributed HASH
    joins, same shape as ``returned_items``. The segment filter prunes the
    customer side in a vectorized batch pass straight off the read; the
    date-filtered orders join the segment keys; lineitem is shipdate-
    filtered and pre-aggregated to one partial row per (batch, orderkey)
    BEFORE its join, so the wide shuffle moves partials, never lineitem
    rows. Nothing table-sized touches the driver. Join partition counts
    clamp by the slim side's materialized count (tiny segment slices on a
    many-CPU cluster otherwise hit the empty-partition schema-loss crash —
    see dedup._join_parts)."""
    from rika_ray.pipelines.dedup import _join_parts

    cutoff_ts = pd.Timestamp(cutoff)

    def _seg_keys(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["c_mktsegment"], pa.scalar(segment))
        return pa.table({"c_custkey": batch["c_custkey"].filter(keep)})

    cust = (
        _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(_seg_keys, batch_format="pyarrow", batch_size=65536)
        .materialize()  # slim: one int64 column, segment-selective
    )
    n_cust = cust.count()
    if n_cust == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        )

    def _dated(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["o_orderdate"], pa.scalar(cutoff_ts))
        return batch.filter(keep)

    orders = _rp(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_dated, batch_format="pyarrow", batch_size=65536)

    qual = (
        orders.join(
            cust, "inner", num_partitions=_join_parts(n_cust),
            on=("o_custkey",), right_on=("c_custkey",),
        )
        .select_columns(["o_orderkey", "o_orderdate"])
        .materialize()  # slim qualifying-order rows, result-bounded side
    )
    n_qual = qual.count()
    if n_qual == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        )

    def _rev_partial(batch: pa.Table) -> pa.Table:
        keep = pc.greater(batch["l_shipdate"], pa.scalar(cutoff_ts))
        batch = batch.filter(keep)
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        g = t.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "revenue": g["rev_sum"]}
        )

    agg = (
        _rp(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(_rev_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    joined = agg.join(
        qual, "inner", num_partitions=_join_parts(n_qual),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue": pc.round(batch["revenue"], 2),
                "o_orderdate": batch["o_orderdate"],
            }
        )

    return (
        joined.map_batches(_project, batch_format="pyarrow")
        .sort([("revenue"), ("l_orderkey")], descending=[True, False])
        .limit(k)
    )


def events_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """COUNT(DISTINCT user_id) per event_type — the canonical distributed
    distinct-aggregate: in-batch pair dedupe (cheap, bounds the shuffle) →
    hash-shuffle dedupe on the (event_type, user_id) pair → count per
    event_type (pair-count-sized input, trivially small)."""

    def _pairs(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        return g

    return (
        _rp(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(_pairs, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .sort("event_type")
    )


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregate (streaming-shaped; SURVEY.md §2.10 —
# expressed as GROUP BY date_trunc in both engines)
# ---------------------------------------------------------------------------


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "window_start", pc.floor_temporal(batch["ts"], unit="hour")
        )
        g = batch.group_by(["window_start", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        # rename by name, not position (see pricing_summary)
        return pa.table(
            {
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n": g["value_count"],
                "sum_value": g["value_sum"],
            }
        )

    ds = (
        _rp(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["window_start", "event_type"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value")
        )
    )

    def _round(batch: pa.Table) -> pa.Table:
        # integer-cents stabilization: the input values are exact 2dp, so
        # round(sum*100) is an exact integer regardless of float summation
        # order, and cents/100.0 is one deterministic IEEE division —
        # bit-identical across engines. Plain round(sum, 2) is NOT: two
        # engines summing in different orders can round onto ADJACENT
        # doubles and fail the driver's value hash (observed at 32 CPUs)
        cents = pc.cast(
            pc.round(pc.multiply(batch["sum_value"], pa.scalar(100.0)), 0),
            pa.int64(),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            pc.divide(pc.cast(cents, pa.float64()), pa.scalar(100.0)),
        )
        # floor_temporal narrows to timestamp[s]; the oracle (and the input
        # ts column) are timestamp[us] — match widths for the driver hash
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pc.cast(batch["window_start"], pa.timestamp("us")),
        )

    return ds.map_batches(_round, batch_format="pyarrow").sort(
        ["window_start", "event_type"]
    )


def events_sliding(sf_dir: str, window_hours: int = 3) -> ray.data.Dataset:
    """SLIDING-window event counts: a ``window_hours``-hour window
    stepping hourly — ``(window_start, n_events)`` where n_events counts
    events with ``window_start <= ts < window_start + window_hours``.
    Complements the tumbling ``events_hourly`` (§2.10 streaming-shaped
    extension; the task brief's "windowed aggregate" custom operator).

    Scale shape: per-batch hour-bucket PARTIAL counts collapse the corpus
    to (distinct hours) rows before any shuffle; each hour row then
    explodes to the ``window_hours`` windows containing it (an hour h is
    inside windows h, h-1h, ..., h-(W-1)h) and a second result-sized
    groupby sums per window. Both all-to-alls move time-bounded tables —
    never event rows — so corpus size only affects the streaming scan."""
    us = 3_600_000_000  # one hour in microseconds

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "hour", pc.floor_temporal(batch["ts"], unit="hour")
        )
        g = batch.group_by(["hour"]).aggregate([("ts", "count")])
        return pa.table(
            {
                "hour": pc.cast(g["hour"], pa.timestamp("us")),
                "n": pc.cast(g["ts_count"], pa.int64()),
            }
        )

    hours = (
        _rp(sf_dir, "events", ["ts"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"))
    )

    def _explode(batch: pa.Table) -> pa.Table:
        parts = []
        for k in range(window_hours):
            parts.append(
                pa.table(
                    {
                        "window_start": pc.subtract(
                            pc.cast(batch["hour"], pa.timestamp("us")),
                            pa.scalar(k * us, pa.duration("us")),
                        ),
                        "n": batch["n"],
                    }
                )
            )
        return pa.concat_tables(parts)

    def _widen(batch: pa.Table) -> pa.Table:
        # the shuffle re-narrows the key to timestamp[s]; the oracle (and
        # the input ts column) are timestamp[us] — match widths for the
        # driver hash (same fix as events_hourly)
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pc.cast(batch["window_start"], pa.timestamp("us")),
        )

    return (
        hours.map_batches(_explode, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n_events"))
        .map_batches(_widen, batch_format="pyarrow")
        .sort("window_start")
    )


# ---------------------------------------------------------------------------
# Stream-shaped custom operators (SURVEY.md "Custom operators"): session
# windows + as-of join via BATCHED sort-within-partition windowing — one
# hash-shuffle on a bounded partition key (hash(user_id) % P), then ONE
# vectorized pandas pass per partition. No per-user Python: the round-2
# layout ran a Python fn per user group, paying Ray's per-group dispatch ×
# millions of users; here group count is P (a few × pool width) and every
# kernel inside (sort, cumsum sessionization, groupby agg, merge_asof
# by=user_id) is a C-speed multi-user operation. Partitioning assumption:
# one PARTITION (corpus/P, P tunable) fits a worker's heap — a hot user no
# longer needs its own group, just its partition.
# ---------------------------------------------------------------------------


def _with_user_part(ds: ray.data.Dataset, n_parts: int) -> ray.data.Dataset:
    """Append a bounded partition key hash(user_id) % n_parts (mix64 so
    sequential ids spread; int64 for Ray's shuffle)."""
    from rika_ray.functions.text import mix64

    def _add_part(batch: pa.Table) -> pa.Table:
        keys = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        part = (mix64(keys) % np.uint64(n_parts)).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    return ds.map_batches(_add_part, batch_format="pyarrow")


def _session_parts() -> int:
    # a few groups per pool slot: enough parallelism for the windowing
    # stage without per-group overhead mattering; at cluster scale raise
    # with the node count (pool_spec cap already tracks cluster CPUs)
    return max(8, pool_spec()[1] * 4)


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> ray.data.Dataset:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``. One partition-key shuffle,
    then per partition: sort by (user_id, ts) and sessionize EVERY user in
    one cumsum pass — session boundaries are user changes OR gap
    exceedances, so no per-user loop exists anywhere."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        new_session = g["user_id"].ne(g["user_id"].shift()) | (
            g["ts"].diff() > gap
        )
        sid = new_session.cumsum()
        out = (
            g.groupby(sid)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                n=("ts", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["n"] = out["n"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "session_start", "n", "sum_value"]]

    return (
        _with_user_part(
            _rp(sf_dir, "events", ["user_id", "ts", "value"]),
            _session_parts(),
        )
        .groupby("part")
        .map_groups(_sessions_part, batch_format="pandas")
        .sort(["user_id", "session_start"])
    )


def purchase_last_click(sf_dir: str) -> ray.data.Dataset:
    """As-of join inside the events log: for every purchase event, the
    most recent preceding click by the same user. One partition-key
    shuffle, then ONE ``pd.merge_asof(by="user_id")`` per partition — the
    multi-user vectorized as-of (C kernel), not a merge per user."""

    def _asof_part(g: pd.DataFrame) -> pd.DataFrame:
        purchases = g.loc[
            g["event_type"] == "purchase", ["event_id", "user_id", "ts"]
        ].sort_values("ts", kind="mergesort")
        clicks = (
            g.loc[g["event_type"] == "click", ["user_id", "ts"]]
            .rename(columns={"ts": "last_click_ts"})
            .sort_values("last_click_ts", kind="mergesort")
        )
        if purchases.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "last_click_ts": pd.Series(dtype="datetime64[us]")}
            )
        merged = pd.merge_asof(
            purchases,
            clicks,
            left_on="ts",
            right_on="last_click_ts",
            by="user_id",
            direction="backward",
        )
        return merged[["event_id", "last_click_ts"]]

    return (
        _with_user_part(
            _rp(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]),
            _session_parts(),
        )
        .groupby("part")
        .map_groups(_asof_part, batch_format="pandas")
        .sort("event_id")
    )


# ---------------------------------------------------------------------------
# Exact dedup by content (O4 scale variant: keep first per duplicate group)
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup on documents.text: keep the smallest doc_id per distinct
    text. Delegates to the hashed implementation — grouping on the raw text
    would ship full documents as the shuffle key, so the only at-scale
    layout is the 8-byte content-hash groupby (same oracle SQL)."""
    from rika_ray.pipelines.dedup import dedup_exact_survivors

    return dedup_exact_survivors(sf_dir)


def distinct_langs(sf_dir: str) -> ray.data.Dataset:
    """O6-ish set op: distinct claimed language codes."""
    ds = _counted_tally(_rp(sf_dir, "documents", ["lang"]), "lang")
    return ds.select_columns(["lang"]).sort("lang")


def sample_fraction(sf_dir: str, fraction: float = 0.1, seed: int = 7):
    """O5: seeded sampling for QA sweeps (engine extra; no SQL oracle —
    sampling RNGs differ across engines)."""
    return _rp(sf_dir, "documents", ["doc_id"]).random_sample(
        fraction, seed=seed
    )


def domain_cap_sample(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Per-domain document cap: keep at most ``k`` documents per source
    (deterministically the lowest ``doc_id``s) — the per-domain quota
    step of CCNet/Gopher-style pretraining corpus curation.

    Scale shape: same batched sort-within-partition windowing as
    user_sessions — ONE hash-shuffle on a bounded partition key
    (hash(source) % P), then per partition a single vectorized pass that
    ranks EVERY domain at once (sort + groupby.cumcount, C kernels; no
    per-domain Python). A domain hotter than ``k`` costs only its
    partition's sort, never an unbounded group."""

    def _add_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch["source"].to_numpy(zero_copy_only=False), categorize=False
        )
        part = (h % np.uint64(_session_parts())).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def _cap_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        rank = g.groupby("source", sort=False).cumcount()
        return g.loc[rank < k, ["doc_id", "source"]]

    return (
        _rp(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(_add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_cap_part, batch_format="pandas")
        .sort("doc_id")
    )


# ---------------------------------------------------------------------------
# Distributed hash joins (§2.4 at scale): when BOTH sides are too large to
# broadcast, ``Dataset.join`` hash-partitions both inputs on the key so each
# partition joins locally — the shuffle-join complement to the ray.put
# broadcast pattern above.
# ---------------------------------------------------------------------------


def _join_partitions() -> int:
    """Hash-join partition count: ~1 per cluster CPU (each partition join
    is single-threaded), floor 4 so small clusters still overlap join work
    with the shuffle."""
    from rika_ray.pool import cluster_cpus

    return max(4, cluster_cpus())


def returned_items(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Revenue per customer over RETURNED items (TPC-H Q10 shape):
    lineitem ⨝ orders ⨝ customer with both joins as distributed HASH
    joins — neither orders nor customer is broadcast.

    Scale shape: lineitem is filtered and pre-aggregated to one row per
    orderkey BEFORE the first join (the join inputs are
    result-cardinality, never lineitem-cardinality); the second join
    input is one row per customer. Doubles rounded to 2dp in both
    engines."""
    npart = _join_partitions()

    li = _rp(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).filter(expr="l_returnflag == 'R'")

    def _rev_per_order(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        g = t.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "revenue": g["rev_sum"]}
        )

    li_agg = (
        li.map_batches(_rev_per_order, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    per_order = li_agg.join(
        orders, "inner", num_partitions=npart,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def _rev_per_cust(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate([("revenue", "sum")])
        return pa.table(
            {"o_custkey": g["o_custkey"], "revenue": g["revenue_sum"]}
        )

    cust_rev = (
        per_order.map_batches(
            _rev_per_cust, batch_format="pyarrow", batch_size=65536
        )
        .groupby("o_custkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = cust_rev.join(
        cust, "inner", num_partitions=npart,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def _project(batch: pa.Table) -> pa.Table:
        # the join coalesces the key pair under the LEFT name — restore the
        # oracle's customer-side name
        return pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "c_name": batch["c_name"],
                "revenue": pc.round(batch["revenue"], 2),
            }
        )

    return (
        joined.map_batches(_project, batch_format="pyarrow")
        .sort([("revenue"), ("c_custkey")], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Conditional aggregation (CASE WHEN ... inside SUM — TPC-H Q12 shape)
# and multi-statistic aggregation (AVG / MIN / MAX per group)
# ---------------------------------------------------------------------------


def orders_value_class_tally(
    sf_dir: str, threshold: float = 150000.0
) -> ray.data.Dataset:
    """Per order priority, how many orders are above/below a total-price
    threshold — the conditional-aggregate (CASE WHEN) pattern, computed as
    vectorized bool→int partial sums per batch."""

    def _partial(batch: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.greater(batch["o_totalprice"], pa.scalar(threshold)),
            pa.int64(),
        )
        t = pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "n_high": hi,
                "n_low": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("n_high", "sum"), ("n_low", "sum")]
        )
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_high": g["n_high_sum"],
                "n_low": g["n_low_sum"],
            }
        )

    return (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_high", alias_name="n_high"),
            Sum("n_low", alias_name="n_low"),
        )
        .sort("o_orderpriority")
    )


def part_type_stats(sf_dir: str) -> ray.data.Dataset:
    """Per part type: count, mean retail price, min/max size — the
    multi-statistic aggregate shape. AVG is computed from (sum, count)
    partials so the combine stays exact under re-partitioning; doubles
    rounded to 2dp in both engines."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["p_type"]).aggregate(
            [
                ("p_retailprice", "sum"),
                ("p_retailprice", "count"),
                ("p_size", "min"),
                ("p_size", "max"),
            ]
        )
        return pa.table(
            {
                "p_type": g["p_type"],
                "price_sum": g["p_retailprice_sum"],
                "n": g["p_retailprice_count"].cast(pa.int64()),
                "min_size": g["p_size_min"],
                "max_size": g["p_size_max"],
            }
        )

    ds = (
        _rp(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
        .map_batches(_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("p_type")
        .aggregate(
            Sum("price_sum", alias_name="price_sum"),
            Sum("n", alias_name="n"),
            Min("min_size", alias_name="min_size"),
            Max("max_size", alias_name="max_size"),
        )
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_type": batch["p_type"],
                "n": batch["n"],
                "avg_price": pc.round(
                    pc.divide(batch["price_sum"], pc.cast(batch["n"], pa.float64())), 2
                ),
                "min_size": batch["min_size"],
                "max_size": batch["max_size"],
            }
        )

    return ds.map_batches(_finish, batch_format="pyarrow").sort("p_type")


def customers_without_urgent_orders(sf_dir: str) -> ray.data.Dataset:
    """Customers that never placed a 1-URGENT order — the distributed
    ANTI-join shape (NOT EXISTS). ``left_anti`` hash-partitions both sides
    on the key and keeps left rows with no match; the right side is
    filtered at the read and ships only its key column."""
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_name"])
    urgent_keys = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    ).select_columns(["o_custkey"])
    return cust.join(
        urgent_keys, "left_anti", num_partitions=_join_partitions(),
        on=("c_custkey",), right_on=("o_custkey",),
    ).sort("c_custkey")
