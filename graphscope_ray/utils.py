"""Shared helpers: hashing, dense-id assignment, broadcast lookups."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex digest per row of a string column.

    pyarrow has no sha256 kernel, so this is a per-row hashlib loop; the
    per-row cost is dominated by hashing the content bytes themselves, so
    there is nothing to vectorize away.  (Lineage invariant: the reference
    contract carries sha256(content) per row unchanged through ingestion.)
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = [
        hashlib.sha256(v.encode("utf-8", "surrogatepass")).hexdigest() if v is not None else None
        for v in col.to_pylist()
    ]
    return pa.array(out, type=pa.string())


def stable_hash64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit hash of a string column (no PYTHONHASHSEED issues)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = np.empty(len(col), dtype=np.int64)
    for i, v in enumerate(col.to_pylist()):
        d = hashlib.blake2b((v or "").encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "little", signed=True)
    return out


def zip_with_index(ds: "ray.data.Dataset", key: str, index_col: str = "vid") -> "ray.data.Dataset":
    """Globally sort ``ds`` by ``key`` and append a dense 0-based index column.

    Distributed: the driver only touches per-block row counts.  Sort is a
    range-partitioned shuffle; blocks come back in global order, so the
    index of row j of block b is ``offset[b] + j``.
    """
    sorted_ds = ds.sort(key).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    lens = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)

    @ray.remote
    def _add_index(t: pa.Table, off: int) -> pa.Table:
        idx = pa.array(np.arange(off, off + t.num_rows, dtype=np.int64))
        return t.append_column(index_col, idx)

    new_refs = [_add_index.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(new_refs)
