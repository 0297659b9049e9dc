"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting
(task brief "Text analysis" block). All run over the driver ``documents``
table; token counting and md5 fingerprints carry exact DuckDB oracles,
model-driven ops (lang-id, quality) are rows-only checks.
"""

from __future__ import annotations

import string

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from rika_ray.functions.text import (
    md5_hex,
    rolling_fingerprint,
    tokenize,
    tokenize_arrow,
)
from rika_ray.pool import pool_spec


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_token_counts(sf_dir: str) -> ray.data.Dataset:
    """doc_id → n_words (whitespace tokenizer; oracle: regexp split).
    Counting stays in Arrow C++ (``tokenize_arrow``) — no per-row Python."""

    def _count(batch: pa.Table) -> pa.Table:
        _, n = tokenize_arrow(batch["text"])
        return pa.table({"doc_id": batch["doc_id"], "n_words": n})

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_count, batch_format="pyarrow", batch_size=2048)
        .sort("doc_id")
    )


def doc_fingerprints_md5(sf_dir: str) -> ray.data.Dataset:
    """Exact content fingerprint (md5 hex) — oracle: DuckDB md5()."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [md5_hex(v.as_py()) for v in batch["text"]]
        return pa.table(
            {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_fp, batch_format="pyarrow", batch_size=2048)
        .sort("doc_id")
    )


def doc_fingerprints_rolling(sf_dir: str) -> ray.data.Dataset:
    """Winnowing-style rolling-hash fingerprint (rows-only; not
    SQL-expressible)."""

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(v.as_py()) for v in batch["text"]]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, pa.uint64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_fp, batch_format="pyarrow", batch_size=2048)
        .sort("doc_id")
    )


_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for "
    "with as on at by from not but".split()
)
_PUNCT = set(string.punctuation)
# C-speed single-pass character counters for ASCII text (the common case):
# count = len(text) - len(text.translate(delete_table))
_DEL_PUNCT = str.maketrans("", "", string.punctuation)
_DEL_NON_ALPHA_ASCII = str.maketrans(
    "", "", "".join(chr(c) for c in range(128) if not chr(c).isalpha())
)


class QualityScorer:
    """Actor-pool stage: per-document quality features (length, punctuation
    ratio, stopword ratio, mean word length, alpha ratio) — the standard
    heuristic pre-filters for web-scale training corpora. State (stopword
    set) initialized once per actor."""

    def __init__(self) -> None:
        self.stopwords = _STOPWORDS
        self.punct = _PUNCT

    def score_one(self, text: str) -> dict:
        # ratios stay RAW float64 (single divisions of integer counts):
        # the same IEEE division the DuckDB oracle computes, so values are
        # bit-identical across engines — rounding would only add banker's-
        # vs-half-away tie mismatches at the cut digit
        toks = tokenize(text)
        n_words = len(toks)
        n_chars = len(text)
        n_stop = sum(1 for t in toks if t in self.stopwords)
        if text.isascii():
            # single C pass per feature; identical counts to the per-char
            # loops below (punctuation is ASCII-only by definition)
            n_punct = n_chars - len(text.translate(_DEL_PUNCT))
            n_alpha = len(text.translate(_DEL_NON_ALPHA_ASCII))
        else:
            # exact Unicode isalpha semantics for non-ASCII text
            n_punct = sum(1 for ch in text if ch in self.punct)
            n_alpha = sum(1 for ch in text if ch.isalpha())
        return {
            "n_chars": n_chars,
            "n_words": n_words,
            "stopword_ratio": n_stop / n_words if n_words else 0.0,
            "punct_ratio": n_punct / n_chars if n_chars else 0.0,
            "alpha_ratio": n_alpha / n_chars if n_chars else 0.0,
            "mean_word_len": (
                sum(len(t) for t in toks) / n_words if n_words else 0.0
            ),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = [self.score_one(v.as_py() or "") for v in batch["text"]]
        cols = {"doc_id": batch["doc_id"]}
        for key in (
            "n_chars", "n_words", "stopword_ratio", "punct_ratio",
            "alpha_ratio", "mean_word_len",
        ):
            typ = pa.int64() if key in ("n_chars", "n_words") else pa.float64()
            cols[key] = pa.array([s[key] for s in scores], typ)
        return pa.table(cols)


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            QualityScorer, batch_format="pyarrow", batch_size=1024,
            concurrency=pool_spec(), num_cpus=0.5,
        )
        .sort("doc_id")
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Detected language per document via the engine's n-gram detector (T1
    applied as a standalone operator; rows-only — model-driven)."""
    from rika_ray.stages.lang import LangDetectStage

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["doc_id"], "content": batch["text"]}
        )

    ds = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_prep, batch_format="pyarrow")
        .map_batches(
            LangDetectStage, batch_format="pyarrow", batch_size=1024,
            concurrency=pool_spec(), num_cpus=0.5,
        )
    )
    return ds.select_columns(["doc_id", "language"]).sort("doc_id")


def quality_filter(sf_dir: str, min_words: int = 50) -> ray.data.Dataset:
    """The composed 'keep good documents' pre-filter: token-count gate
    (SQL-expressible part only, so it carries an oracle)."""

    def _count(batch: pa.Table) -> pa.Table:
        _, n = tokenize_arrow(batch["text"])
        t = batch.append_column("n_words", n)
        return t.filter(pc.greater_equal(t["n_words"], min_words))

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_count, batch_format="pyarrow", batch_size=2048)
        .select_columns(["doc_id", "n_words"])
        .sort("doc_id")
    )
