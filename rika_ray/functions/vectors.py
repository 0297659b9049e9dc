"""Zero-copy access to embedding columns (task brief "Similarity search" /
"embedding-cosine near-dup" blocks).

An embedding column arrives from parquet as Arrow ``list<float>`` (or
``fixed_size_list<float>`` when written that way). Converting it through
pandas (``np.stack(batch["embedding"].to_numpy())``) boxes every row into a
Python object before re-packing — O(rows) allocations on a corpus-wide
stage. The Arrow layout is already a flat values buffer + offsets, so the
(n, dim) matrix is a single ``reshape`` of the flat buffer: zero-copy from
the object store up to the one vectorized dtype cast the matmul needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(
    col: pa.ChunkedArray | pa.Array, dtype=np.float64
) -> np.ndarray:
    """(n_rows, dim) matrix view of an Arrow list-of-float column.

    Supports ``fixed_size_list``, ``list`` and ``large_list`` (the latter
    two validated rectangular via their offsets — a vectorized check, not a
    per-row loop). The flat values buffer is reshaped in place; the only
    copy is the cast to ``dtype`` (skipped when it already matches).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    n = len(col)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offsets = col.offsets.to_numpy()
        widths = np.diff(offsets)
        if n == 0:
            return np.empty((0, 0), dtype=dtype)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError(
                f"ragged embedding column: row lengths vary "
                f"({widths.min()}..{widths.max()})"
            )
    else:
        raise TypeError(f"not a list-typed embedding column: {col.type}")
    if n == 0:
        return np.empty((0, dim), dtype=dtype)
    # flatten() honors slices/offsets and returns exactly the concatenated
    # row values; to_numpy on a null-free primitive array is zero-copy
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(dtype, copy=False)


def unit_rows(mat: np.ndarray) -> np.ndarray:
    """Row-normalize to unit L2 norm (cosine via dot product)."""
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
