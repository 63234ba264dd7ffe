"""Deduplication family for training-data pipelines.

- exact:   sha256(content) → hash-partitioned groupby → keep min doc_id
- minhash: shingle → minhash signature → LSH band buckets (groupby) →
           candidate pairs → Jaccard verify → connected components via the
           graph engine's WCC → keep min doc per component
- simhash: 64-bit simhash, near-dup by identical 16-bit band (hamming≲3 path)
- ngram:   exact n-gram Jaccard between candidate pairs (the verifier)

All heavy steps are vectorized map_batches; the only shuffles are the
groupbys on hash keys (uniformly distributed — no skew by construction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.utils import sha256_column

# ---------------------------------------------------------------------------
# exact dedup


def with_text_sha(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: t.append_column("text_sha256", sha256_column(t[text_col])),
        batch_format="pyarrow",
    )


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct content hash (deterministic winner)."""
    hashed = with_text_sha(ds, text_col)

    def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("text_sha256").map_groups(_keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# minhash + LSH

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    b = text.encode("utf-8", "surrogatepass")
    if len(b) <= k:
        views = [b]
    else:
        views = [b[i : i + k] for i in range(len(b) - k + 1)]
    out = np.empty(len(views), dtype=np.uint64)
    for i, v in enumerate(views):
        out[i] = int.from_bytes(hashlib.blake2b(v, digest_size=8).digest(), "little")
    return out


class MinHasher:
    """Actor-pool stage: text → num_perm minhash values (vectorized perm apply:
    one (shingles × perms) broadcasted multiply-add per doc)."""

    def __init__(self, k: int = 5, num_perm: int = 64, seed: int = 1):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_shingles, num_perm) permuted hashes, min over shingles
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch["text"]])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs.astype(np.int64))}
        )


def minhash_signatures(ds, k=5, num_perm=64, seed=1, concurrency=(1, 8)):
    return ds.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"k": k, "num_perm": num_perm, "seed": seed},
        batch_format="pandas",
        batch_size=1024,
        concurrency=concurrency,
    )


def lsh_candidate_pairs(sig_ds: ray.data.Dataset, bands: int = 16) -> ray.data.Dataset:
    """Explode signatures to (band, band_hash, doc_id), bucket by groupby,
    emit candidate pairs (a<b) within each bucket."""

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(batch["sig"].to_numpy())
        n, num_perm = sigs.shape
        r = num_perm // bands
        rows_band, rows_hash, rows_doc = [], [], []
        for bix in range(bands):
            chunk = np.ascontiguousarray(sigs[:, bix * r : (bix + 1) * r])
            h = np.array(
                [
                    int.from_bytes(hashlib.blake2b(c.tobytes(), digest_size=8).digest(), "little", signed=True)
                    for c in chunk
                ],
                dtype=np.int64,
            )
            rows_band.append(np.full(n, bix, dtype=np.int64))
            rows_hash.append(h)
            rows_doc.append(batch["doc_id"].to_numpy())
        return pd.DataFrame(
            {
                "band": np.concatenate(rows_band),
                "band_hash": np.concatenate(rows_hash),
                "doc_id": np.concatenate(rows_doc),
            }
        )

    exploded = sig_ds.map_batches(_explode, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        # pair every member with the bucket minimum — enough to connect the
        # component without quadratic pair blowup in hot buckets
        a = np.full(len(ids) - 1, ids[0], dtype=np.int64)
        return pd.DataFrame({"a": a, "b": ids[1:]})

    pairs = exploded.groupby(["band", "band_hash"]).map_groups(_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def jaccard_verify(
    pairs: pd.DataFrame, docs: pd.DataFrame, k: int = 5, threshold: float = 0.7
) -> pd.DataFrame:
    """Exact k-shingle Jaccard on candidate pairs (the verify step; candidate
    set is small after LSH)."""
    texts = dict(zip(docs["doc_id"], docs["text"]))
    keep_a, keep_b, sims = [], [], []
    cache: dict[int, set] = {}

    def shingles(i):
        if i not in cache:
            t = texts[i].encode("utf-8", "surrogatepass")
            cache[i] = (
                {t[j : j + k] for j in range(len(t) - k + 1)} if len(t) > k else {t}
            )
        return cache[i]

    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = shingles(int(a)), shingles(int(b))
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            sims.append(j)
    return pd.DataFrame({"a": keep_a, "b": keep_b, "jaccard": sims})


def minhash_dedup_clusters(
    ds: ray.data.Dataset,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    num_partitions: int = 4,
) -> pd.DataFrame:
    """Full near-dup pipeline → (doc_id, cluster) where cluster = min doc_id of
    the near-dup component (components via the graph engine's WCC)."""
    from graphscope_ray.graph.build import build_graph_from_oids

    sigs = minhash_signatures(ds, k=k, num_perm=num_perm)
    cand = lsh_candidate_pairs(sigs, bands=bands).to_pandas()
    docs = ds.select_columns(["doc_id", "text"]).to_pandas()
    verified = jaccard_verify(cand, docs, k=k, threshold=threshold)
    all_ids = docs[["doc_id"]].rename(columns={"doc_id": "cluster"})
    if len(verified) == 0:
        out = docs[["doc_id"]].copy()
        out["cluster"] = out["doc_id"]
        return out.sort_values("doc_id").reset_index(drop=True)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src_oid": pa.array(verified["a"].to_numpy(), pa.int64()),
                "dst_oid": pa.array(verified["b"].to_numpy(), pa.int64()),
            }
        )
    )
    g = build_graph_from_oids(edges, num_partitions=num_partitions, view="undirected")
    from graphscope_ray.graph import algorithms as alg

    comp_ds, _ = alg.wcc(g)
    vmap = g.vertices_ds.to_pandas()
    comp_df = comp_ds.to_pandas().merge(vmap, on="vid")
    # comp is a vid; map back to the min oid of the component
    rep = comp_df.merge(
        vmap.rename(columns={"vid": "comp", "oid": "cluster"}), on="comp"
    )[["oid", "cluster"]].rename(columns={"oid": "doc_id"})
    out = docs[["doc_id"]].merge(rep, on="doc_id", how="left")
    out["cluster"] = out["cluster"].fillna(out["doc_id"]).astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash


class SimHasher:
    """64-bit simhash over whitespace-token FNV hashes (vectorized bit-count)."""

    def __init__(self):
        import re

        self.tok = re.compile(r"\S+")

    def _simhash(self, text: str) -> int:
        from graphscope_ray.functions.text import hash_str64

        toks = self.tok.findall(text.lower())
        if not toks:
            return 0
        hs = np.array([hash_str64(t) for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "simhash": batch["text"].map(self._simhash).astype(np.uint64).astype(np.int64),
            }
        )


def simhash_signatures(ds, concurrency=(1, 8)):
    return ds.select_columns(["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )


def simhash_candidates(sig_ds: ray.data.Dataset, bands: int = 4) -> ray.data.Dataset:
    """Near-dup candidates: docs sharing any 16-bit band of the simhash
    (catches hamming distance ≤ bands-1 by pigeonhole)."""

    def _explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        width = 64 // bands
        bs, keys, docs = [], [], []
        for b in range(bands):
            bs.append(np.full(len(h), b, dtype=np.int64))
            keys.append(((h >> np.uint64(b * width)) & np.uint64((1 << width) - 1)).astype(np.int64))
            docs.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bs)),
                "key": pa.array(np.concatenate(keys)),
                "doc_id": pa.array(np.concatenate(docs)),
            }
        )

    exploded = sig_ds.map_batches(_explode, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0], dtype=np.int64), "b": ids[1:]})

    pairs = exploded.groupby(["band", "key"]).map_groups(_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


# ---------------------------------------------------------------------------
# embedding near-dup


def embedding_near_dups(
    ds: ray.data.Dataset, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> ray.data.Dataset:
    """Cosine near-duplicate pairs via brute-force blocked matmul: the (small)
    normalized matrix is broadcast once (ray.put), each batch matmuls against
    it.  Scale path: replace the broadcast with LSH bucketing (random
    hyperplanes) — same bucket → candidate (see simhash_candidates)."""
    import ray as _ray

    all_df = ds.select_columns([id_col, vec_col]).to_pandas()
    M = np.stack(all_df[vec_col].to_numpy()).astype(np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ids = all_df[id_col].to_numpy()
    ref = _ray.put((M, ids))

    def _block(t: pa.Table) -> pa.Table:
        M_all, ids_all = _ray.get(ref)
        V = np.stack(t[vec_col].to_pylist()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        my = t[id_col].to_numpy(zero_copy_only=False)
        sims = V @ M_all.T
        ai, bj = np.nonzero(sims >= threshold)
        a, b = my[ai], ids_all[bj]
        keep = a < b
        return pa.table(
            {
                "a": pa.array(a[keep].astype(np.int64)),
                "b": pa.array(b[keep].astype(np.int64)),
                "cosine": pa.array(sims[ai, bj][keep]),
            }
        )

    return ds.map_batches(_block, batch_format="pyarrow", batch_size=512)
