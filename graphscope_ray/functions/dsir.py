"""DSIR-style importance resampling for language-model data selection.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023) — represent every document as a bag
of HASHED n-gram features (unigrams + bigrams of whitespace tokens, hashed
into K buckets), fit target and raw feature distributions by counting, and
score each raw document with the importance log-ratio

    weight(doc) = Σ_occurrences  log( (t_f + 1) / (r_f + 1) )

where t_f / r_f are the target / raw corpus counts of feature f.  The
highest-weight documents are selected as "target-like" pretraining data.
(The reference engine has no such operator; this is part of the
training-data-prep family this repo adds as first-class components.)

Deterministic divergences from the paper, both deliberate and oracle-gated:

- selection is exact top-k by (weight desc, doc_id asc) instead of
  Gumbel-noised sampling (the paper's "top-k" ablation) so re-runs,
  repartitioning and the SQL oracle agree bit-for-bit;
- the per-feature log-ratio is quantized to round(1e6·ln((t_f+1)/(r_f+1)))
  and the per-document weight accumulated as an exact int64, making the
  score independent of summation order under any partitioning;
- the K-entry quantized weight table is evaluated with DuckDB's scalar
  ``ln`` (the same implementation the SQL oracle gate runs) because
  numpy's and DuckDB's ``ln`` differ in the last ulps (measured ≤ 2e-15)
  and the round-to-int boundary must agree exactly.  The table is a
  driver-side model artifact of K rows — like a k-means centroid matrix —
  not a data-path stage.

Distributed shape (100-TB-safe): two streaming passes over the corpus —

1. per-block feature-count partials (≤ K rows of (f, t, r) ints) summed
   through one K-row hash exchange (`hash_groupby_sum`) — the classic
   sender-side combiner, nothing document-sized ever shuffles;
2. a scoring map over every document against the broadcast K-entry weight
   table (`ray.put` once, read per actor), emitting only a per-block
   partial top-k; the driver merges P·k candidate rows.

Driver state is O(K + P·k); no all-to-all exchange anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.hashing import batch_token_hashes, bigram_hashes

LOG_SCALE = 10**6


def doc_feature_occurrences(
    texts, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """(feature id per occurrence, doc index per occurrence) for the hashed
    unigram+bigram bag of each lowercased text.  Unigrams and bigrams share
    the same K-bucket space (DSIR hashes all n-grams into one table)."""
    th, tb = batch_token_hashes([(t or "").lower() for t in texts])
    bh, bb = bigram_hashes(th, tb)
    K = np.uint64(n_buckets)
    f = np.concatenate([(th % K).astype(np.int64), (bh % K).astype(np.int64)])
    doc = np.concatenate(
        [
            np.repeat(np.arange(len(tb) - 1, dtype=np.int64), np.diff(tb)),
            np.repeat(np.arange(len(bb) - 1, dtype=np.int64), np.diff(bb)),
        ]
    )
    return f, doc


def quantized_log_ratios(t: np.ndarray, r: np.ndarray) -> np.ndarray:
    """int64 table s_f = round(1e6·ln((t_f+1)/(r_f+1))), evaluated by
    DuckDB's scalar ``ln`` (see module docstring for why not numpy's).
    K scalar evaluations on the driver; everything downstream is exact
    integer arithmetic."""
    import duckdb

    df = pd.DataFrame({"t": t.astype(np.int64), "r": r.astype(np.int64)})
    con = duckdb.connect()
    try:
        con.register("c", df)
        s = con.execute(
            "SELECT CAST(round(1000000 * ln((t + 1)::DOUBLE / (r + 1)::DOUBLE)) "
            "AS BIGINT) AS s FROM c"
        ).fetchnumpy()["s"]
    finally:
        con.close()
    return np.asarray(s, dtype=np.int64)


def _count_fn(text_col: str, target_col: str, target_val, n_buckets: int):
    def _block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "f": pa.array([], pa.int64()),
                "t": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        texts = t[text_col].to_pylist()
        f, doc = doc_feature_occurrences(texts, n_buckets)
        if len(f) == 0:
            return empty
        tgt = np.asarray(t[target_col].to_pylist()) == target_val
        cnt_r = np.bincount(f, minlength=n_buckets)
        cnt_t = np.bincount(f[tgt[doc]], minlength=n_buckets)
        nz = np.flatnonzero(cnt_r)
        return pa.table(
            {
                "f": pa.array(nz.astype(np.int64)),
                "t": pa.array(cnt_t[nz].astype(np.int64)),
                "r": pa.array(cnt_r[nz].astype(np.int64)),
            }
        )

    return _block


def _score_fn(ref, id_col: str, text_col: str, n_buckets: int, k: int):
    def _block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "weight": pa.array([], pa.int64())}
        )
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        s = ray.get(ref)  # K-entry int64 weight table, shared zero-copy
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        f, doc = doc_feature_occurrences(t[text_col].to_pylist(), n_buckets)
        w = np.zeros(t.num_rows, dtype=np.int64)
        if len(f):
            # exact int64 segmented sum: sort occurrences by doc, reduceat
            # over run starts (bincount-with-weights would go through
            # float64)
            order = np.argsort(doc, kind="stable")
            dsort = doc[order]
            vals = s[f[order]]
            starts = np.flatnonzero(
                np.concatenate([[True], dsort[1:] != dsort[:-1]])
            )
            w[dsort[starts]] = np.add.reduceat(vals, starts)
        kk = min(k, len(ids))
        # block-local top-k by (weight desc, id asc)
        order = np.lexsort((ids, -w))[:kk]
        return pa.table(
            {id_col: pa.array(ids[order]), "weight": pa.array(w[order])}
        )

    return _block


def dsir_select(
    ds: ray.data.Dataset,
    *,
    target_col: str = "lang",
    target_val="en",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 200,
    n_buckets: int = 4096,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Select the ``k`` most target-like documents by quantized DSIR
    importance weight.  Returns a driver DataFrame (id_col, weight) —
    k rows, the selection result (result-sized, like every sampler here).

    ``target_col == target_val`` rows define the target distribution; the
    whole input is the raw distribution (the paper's setup with target =
    Wikipedia-like corpus, raw = web crawl)."""
    from graphscope_ray.utils import hash_groupby_sum

    counts = (
        hash_groupby_sum(
            ds.select_columns([text_col, target_col]).map_batches(
                _count_fn(text_col, target_col, target_val, n_buckets),
                batch_format="pyarrow",
            ),
            ["f"],
            ["t", "r"],
            ["t", "r"],
            num_partitions=num_partitions,
        )
        .to_pandas()
    )
    t_arr = np.zeros(n_buckets, dtype=np.int64)
    r_arr = np.zeros(n_buckets, dtype=np.int64)
    if len(counts):
        t_arr[counts["f"].to_numpy()] = counts["t"].to_numpy()
        r_arr[counts["f"].to_numpy()] = counts["r"].to_numpy()
    s = quantized_log_ratios(t_arr, r_arr)
    ref = ray.put(s)

    partials = (
        ds.select_columns([id_col, text_col])
        .map_batches(
            _score_fn(ref, id_col, text_col, n_buckets, k),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    ids = partials[id_col].to_numpy()
    w = partials["weight"].to_numpy()
    order = np.lexsort((ids, -w))[: min(k, len(ids))]
    return pd.DataFrame({id_col: ids[order], "weight": w[order]}).sort_values(
        id_col
    ).reset_index(drop=True)
