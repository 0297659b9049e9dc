"""Deduplication operators for web-scale training corpora (task brief
"Deduplication" block): exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Shuffle discipline (ray_guide.md "Aggregation at scale"):
- exact dedup: content-hash column added vectorized, then ONE hash-shuffle
  ``groupby(hash)`` + per-group min — no pairwise work.
- MinHash-LSH: signatures per batch (numpy-vectorized via
  ``pd.util.hash_array`` + 32-bit affine permutations in native uint64),
  exploded to (band, band_hash) rows. Before pairing, buckets are
  pre-filtered to COLLIDING ones (groupby count ≥ 2 → tiny hot-bucket set,
  broadcast) so the expensive per-group pairing only ever sees the few
  buckets with candidates — at 10^12 scale the non-colliding 99.9% of rows
  never reach the pairing shuffle.
- SimHash: bit votes computed with numpy unpack, no per-bit Python loops.
- embedding near-dup: random-hyperplane LSH buckets, pairwise cosine only
  within a bucket.

At test scale candidate verification broadcasts the needed texts; at 10^12
scale the same verification runs as a second groupby co-partitioned by
bucket id (documented per function).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from rika_ray.functions.text import tokenize

_MERSENNE61 = (1 << 61) - 1


def _docs(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Exact dedup (hash-partition + per-group first)
# ---------------------------------------------------------------------------


def dedup_exact_survivors(sf_dir: str) -> ray.data.Dataset:
    """Smallest doc_id per distinct text. See relational.dedup_exact for the
    oracle-checked variant; this one groups on a 64-bit content hash so the
    shuffle moves 8-byte keys, not full documents (the at-scale layout).
    """

    def _hash(batch: pa.Table) -> pa.Table:
        texts = np.asarray(batch["text"].to_pylist(), dtype=object)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": pa.array(
                    pd.util.hash_array(texts), pa.uint64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_hash, batch_format="pyarrow", batch_size=2048)
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
        .sort("doc_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3  # word shingles


def _shingle_hashes_u32(text: str) -> np.ndarray:
    """Unique 32-bit shingle hashes, vectorized via pd.util.hash_array."""
    toks = tokenize(text)
    if len(toks) < SHINGLE_K:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [
            " ".join(toks[i : i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)
        ]
    h = pd.util.hash_array(np.asarray(shingles, dtype=object))
    return np.unique(h & np.uint64(0xFFFFFFFF))


class MinHashStage:
    """Actor-pool stage: text → 64-perm MinHash signature + LSH band keys.

    Signature math stays in native uint64: shingle hashes are 32-bit and the
    affine coefficients are 32-bit, so ``a*x + b`` never overflows before
    the mod-Mersenne61 reduction. Permutation parameters are generated once
    per actor in ``__init__`` (fixed seed → identical across actors)."""

    def __init__(self, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 32, size=N_PERM, dtype=np.uint64)
        self.b = rng.randint(0, 1 << 32, size=N_PERM, dtype=np.uint64)
        self.band_mix = rng.randint(
            1, 1 << 61, size=(N_BANDS, ROWS_PER_BAND), dtype=np.uint64
        ) | np.uint64(1)

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes_u32(text)[None, :]
        vals = (self.a[:, None] * x + self.b[:, None]) % np.uint64(_MERSENNE61)
        return vals.min(axis=1)  # (N_PERM,)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        chunks = sig.reshape(N_BANDS, ROWS_PER_BAND)
        mixed = chunks * self.band_mix  # multiply-xor mix, all bands at once
        out = mixed[:, 0]
        for r in range(1, ROWS_PER_BAND):
            out = (out * np.uint64(0x9E3779B97F4A7C15)) ^ mixed[:, r]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_id_arr = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        sigs = np.empty((n, N_PERM), dtype=np.uint64)
        bhs = np.empty((n, N_BANDS), dtype=np.uint64)
        for i in range(n):
            sig = self.signature(texts[i] or "")
            sigs[i] = sig
            bhs[i] = self.band_hashes(sig)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_id_arr, N_BANDS), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(N_BANDS, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(bhs.reshape(-1), pa.uint64()),
                "sig": pa.array(
                    np.repeat(sigs, N_BANDS, axis=0).tolist(),
                    pa.list_(pa.uint64()),
                ),
            }
        )


def _minhash_band_rows(sf_dir: str, seed: int) -> ray.data.Dataset:
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashStage,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=2,
        num_cpus=0.5,
        fn_constructor_kwargs={"seed": seed},
    )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one colliding (band, band_hash) bucket: all pairs + estimated
    Jaccard from signature agreement. Only hot buckets reach this."""
    rows = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].to_numpy()
    if len(ids) < 2:
        return pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "est_jaccard": pd.Series(dtype="float64"),
            }
        )
    sigs = np.stack([np.asarray(s, dtype=np.uint64) for s in rows["sig"]])
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {
            "doc_a": ids[ii].astype("int64"),
            "doc_b": ids[jj].astype("int64"),
            "est_jaccard": eq[ii, jj],
        }
    )


def minhash_lsh_pairs(
    sf_dir: str, threshold: float = 0.5, seed: int = 42
) -> ray.data.Dataset:
    """Candidate near-dup pairs: shingle→minhash→band→bucket; buckets are
    pre-filtered to colliding ones (count ≥ 2, broadcast as a set) before
    any pairing work, then per-bucket pairing + threshold + pair dedup."""
    import ray

    # materialize: both passes (hot-bucket scan + pairing) read the band
    # rows; at test scale pinning them beats recomputing signatures. At
    # 10^12 scale, persist band rows to partitioned parquet instead (the
    # checkpointed layout) — never materialize the corpus-sized set.
    band_rows = _minhash_band_rows(sf_dir, seed).materialize()

    # Pass 1 (cheap, 8-byte keys): find colliding buckets. Small corpora
    # pull the key pairs to the driver (one Counter pass, no extra Ray
    # execution); large ones run the distributed groupby-count.
    n_band_rows = band_rows.count()
    if n_band_rows <= 2_000_000:
        from collections import Counter as _Counter

        key_counts: _Counter = _Counter(
            (r["band"], r["band_hash"])
            for r in band_rows.select_columns(["band", "band_hash"]).take_all()
        )
        hot_set = {k for k, c in key_counts.items() if c >= 2}
    else:
        hot = (
            band_rows.select_columns(["band", "band_hash"])
            .groupby(["band", "band_hash"])
            .aggregate(Count(alias_name="n"))
            .filter(expr="n >= 2")
            .select_columns(["band", "band_hash"])
            .take_all()
        )
        hot_set = {(r["band"], r["band_hash"]) for r in hot}
    if not hot_set:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        )
    hot_ref = ray.put(hot_set)

    # Pass 2: keep only hot-bucket rows (tiny), then group and pair.
    def _keep_hot(batch: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        mask = [
            (b, h) in hs for b, h in zip(batch["band"], batch["band_hash"])
        ]
        return batch[mask]

    pairs = (
        band_rows.map_batches(_keep_hot, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .filter(expr=f"est_jaccard >= {threshold}")
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Min("est_jaccard", alias_name="est_jaccard"))
        .sort(["doc_a", "doc_b"])
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact) for candidate pairs
# ---------------------------------------------------------------------------


def verify_jaccard_pairs(
    sf_dir: str, threshold: float = 0.5, seed: int = 42
) -> ray.data.Dataset:
    """MinHash candidates verified with exact shingle-set Jaccard. Texts for
    verification are broadcast at test scale (ray.put of a doc_id→text dict);
    at 10^12 scale this becomes a second groupby co-partitioned on doc_id
    buckets so each verifier task reads only its shard of texts."""
    import ray

    texts = {
        r["doc_id"]: r["text"]
        for r in _docs(sf_dir, ["doc_id", "text"]).take_all()
    }
    texts_ref = ray.put(texts)
    candidates = minhash_lsh_pairs(sf_dir, threshold=threshold * 0.6, seed=seed)

    class VerifyJaccard:
        def __init__(self):
            self.texts = ray.get(texts_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for _, row in batch.iterrows():
                sa = set(_shingle_hashes_u32(self.texts[row["doc_a"]]).tolist())
                sb = set(_shingle_hashes_u32(self.texts[row["doc_b"]]).tolist())
                union = len(sa | sb)
                j = (len(sa & sb) / union) if union else 0.0
                if j >= threshold:
                    out.append(
                        {
                            "doc_a": row["doc_a"],
                            "doc_b": row["doc_b"],
                            "jaccard": round(j, 6),
                        }
                    )
            return pd.DataFrame(
                out, columns=["doc_a", "doc_b", "jaccard"]
            ).astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})

    return candidates.map_batches(
        VerifyJaccard, batch_format="pandas", batch_size=1024,
        concurrency=2, num_cpus=0.5,
    ).sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit SimHash per text over word unigram features."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = list(set(tokenize(text or "")))
        if not toks:
            out[i] = 0
            continue
        h = pd.util.hash_array(np.asarray(toks, dtype=object))
        bits = np.unpackbits(
            h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )
        # signed accumulation — the uint sum would wrap on the subtraction
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)  # ±1 votes
        sim_bits = (votes > 0).astype(np.uint8)
        out[i] = np.packbits(sim_bits, bitorder="little").view(np.uint64)[0]
    return out


def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = simhash64_batch(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(hashes, pa.uint64()),
            }
        )


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(SimHashStage, batch_format="pyarrow", batch_size=1024,
                     concurrency=2, num_cpus=0.5)
        .sort("doc_id")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (hyperplane-LSH bucketed)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    sf_dir: str, threshold: float = 0.9, n_planes: int = 12, seed: int = 42
) -> ray.data.Dataset:
    """Near-duplicate vector pairs: sign-of-projection LSH bucket (one
    shuffle on the bucket key), exact cosine only within buckets."""
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.take(1)[0]["embedding"])
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    import ray as _ray

    planes_ref = _ray.put(planes)

    class BucketStage:
        def __init__(self):
            self.planes = _ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = np.stack(batch["embedding"].to_numpy())
            signs = (vecs @ self.planes) > 0
            bucket = signs @ (1 << np.arange(signs.shape[1]))
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": bucket.astype("int64"),
                    "embedding": batch["embedding"],
                }
            )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("vec_id")  # canonical vec_a < vec_b pairs
        vecs = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        sim = unit @ unit.T
        ids = group["vec_id"].to_numpy()
        ii, jj = np.where(np.triu(sim >= threshold, k=1))
        return pd.DataFrame(
            {
                "vec_a": ids[ii].astype("int64"),
                "vec_b": ids[jj].astype("int64"),
                "cosine": np.round(sim[ii, jj], 6),
            }
        )

    pairs = (
        emb.map_batches(BucketStage, batch_format="pandas", batch_size=1024,
                        concurrency=2, num_cpus=0.5)
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
    )
    # union with a typed empty table so a zero-pair corpus still yields a
    # stable (vec_a, vec_b, cosine) schema
    empty = ray.data.from_arrow(
        pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    )
    return empty.union(pairs).sort(["vec_a", "vec_b"])
