"""Deduplication operators for web-scale training corpora (task brief
"Deduplication" block): exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Shuffle discipline (ray_guide.md "Aggregation at scale"):
- exact dedup: content-hash column added vectorized, then ONE hash-shuffle
  ``groupby(hash)`` + per-group min — no pairwise work.
- MinHash-LSH: signatures per batch (numpy-vectorized), exploded to
  (band, band_hash) rows, ONE ``groupby`` over band buckets; candidate
  pairs only ever form inside a bucket (never all-pairs).
- SimHash / fingerprints: embarrassingly parallel map_batches.
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
from ray.data.aggregate import Min

from rika_ray.functions.text import fnv1a64, tokenize

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
        hashes = [
            fnv1a64(v.as_py().encode("utf-8")) for v in batch["text"]
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": pa.array(hashes, pa.uint64()),
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


def _minhash_params(seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=N_PERM, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE61, size=N_PERM, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str) -> np.ndarray:
    toks = tokenize(text)
    if len(toks) < SHINGLE_K:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [
            " ".join(toks[i : i + SHINGLE_K])
            for i in range(len(toks) - SHINGLE_K + 1)
        ]
    return np.array(
        sorted({fnv1a64(s.encode("utf-8")) for s in shingles}),
        dtype=np.uint64,
    )


def _signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # (a*x + b) mod p per permutation, min over shingles — numpy-vectorized.
    # Python ints avoid uint64 overflow; shingle sets are small per doc.
    x = shingles.astype(object)[None, :]
    vals = (a.astype(object)[:, None] * x + b.astype(object)[:, None]) % _MERSENNE61
    return np.min(vals, axis=1).astype(np.uint64)


class MinHashStage:
    """Actor-pool stage: text → 64-perm MinHash signature + LSH band keys.
    Permutation parameters generated once per actor in __init__ (fixed
    seed → identical across actors)."""

    def __init__(self, seed: int = 42) -> None:
        self.a, self.b = _minhash_params(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes, sigs = [], [], [], []
        for i in range(len(batch)):
            doc_id = batch["doc_id"][i].as_py()
            sig = _signature(
                _shingle_hashes(batch["text"][i].as_py() or ""), self.a, self.b
            )
            sig_list = sig.tolist()
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                doc_ids.append(doc_id)
                bands.append(band)
                band_hashes.append(fnv1a64(chunk.tobytes()))
                sigs.append(sig_list)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.uint64()),
                "sig": pa.array(sigs, pa.list_(pa.uint64())),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one (band, band_hash) bucket: all pairs + estimated Jaccard
    from signature agreement. Buckets are tiny by construction."""
    rows = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].to_numpy()
    sigs = rows["sig"].to_numpy()
    out_a, out_b, out_j = [], [], []
    for i in range(len(ids)):
        si = np.asarray(sigs[i], dtype=np.uint64)
        for j in range(i + 1, len(ids)):
            sj = np.asarray(sigs[j], dtype=np.uint64)
            out_a.append(int(ids[i]))
            out_b.append(int(ids[j]))
            out_j.append(float(np.mean(si == sj)))
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j})


def minhash_lsh_pairs(
    sf_dir: str, threshold: float = 0.5, seed: int = 42
) -> ray.data.Dataset:
    """Candidate near-dup pairs: shingle→minhash→band→bucket groupby →
    in-bucket pairs → threshold on estimated Jaccard → pair dedup."""
    pairs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            MinHashStage, batch_format="pyarrow", batch_size=512,
            concurrency=2, num_cpus=0.5, fn_constructor_kwargs={"seed": seed},
        )
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .filter(expr=f"est_jaccard >= {threshold}")
    )
    # same pair can surface from multiple bands → keep one
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
                sa = set(_shingle_hashes(self.texts[row["doc_a"]]).tolist())
                sb = set(_shingle_hashes(self.texts[row["doc_b"]]).tolist())
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
        VerifyJaccard, batch_format="pandas", batch_size=1024, concurrency=2, num_cpus=0.5
    ).sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram features (weight 1 each)."""
    votes = np.zeros(64, dtype=np.int64)
    for tok in set(tokenize(text)):
        h = fnv1a64(tok.encode("utf-8"))
        for bit in range(64):
            votes[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if votes[bit] > 0:
            out |= 1 << bit
    return out


class SimHashStage:
    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [simhash64(v.as_py() or "") for v in batch["text"]]
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

    return (
        emb.map_batches(BucketStage, batch_format="pandas", batch_size=1024,
                        concurrency=2, num_cpus=0.5)
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pandas")
        .sort(["vec_a", "vec_b"])
    )
