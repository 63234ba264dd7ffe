"""Deterministic k-hop neighborhood sampling (GNN minibatch construction).

The standard GraphSAGE / GNN training loader primitive: from a set of seed
vertices, sample at most ``fanouts[t]`` out-neighbors per frontier vertex
at each layer ``t``, producing the layered edge sample a minibatch trains
on.  (The reference ships this in its learning engine, GLE — out of scope
per SURVEY; this is the data-plane analogue over plain edge Datasets,
like the rest of §2.3's training-data ops.)

Determinism (the property GLE's random samplers lack): a neighbor's
sampling RANK is a pure hash of the edge — ``hash_u64(src·pair_mod + dst,
salt + layer)`` (the same full-range Knuth kernel as
``functions/sampling.py``, so the whole sample is bit-exactly reproducible
in SQL with ``row_number() OVER (PARTITION BY src ORDER BY rank, dst)``)
— and the per-vertex sample is the ``f`` smallest ranks.  Same input,
same seeds, same sample: re-runs, repartitioning and resumed jobs agree.

Distributed shape (100-TB-safe):
- the frontier is BROADCAST (``ray.put`` of a sorted id array) — by
  construction it is minibatch-sized (|seeds|·Πfanouts bounded), which is
  the entire point of fanout sampling;
- each edge block emits only its LOCAL ≤f-per-src smallest ranks
  (vectorized lexsort + segment-position mask — the same per-block
  partial-top-k + small-merge pattern as ``similarity.topk_cosine``), so
  per-src volume entering the final exchange is ≤ f·#blocks, not degree;
- the final per-src head-f reduce runs in ``groupby(src).map_groups``
  over those partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.sampling import hash_u64


def _head_per_src(src, dst, rank, f):
    """Indices of the ≤f smallest (rank, dst) rows per src (vectorized)."""
    order = np.lexsort((dst, rank, src))
    s, d = src[order], dst[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    counts = np.diff(np.r_[starts, len(s)])
    pos = np.arange(len(s)) - np.repeat(starts, counts)
    return order[pos < f]


def khop_sample(
    edges: ray.data.Dataset,
    seeds: np.ndarray,
    fanouts: list[int],
    salt: int = 0,
    pair_mod: int = 1 << 21,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Layered fanout sample: returns (layer, src, dst) — for each layer t,
    at most ``fanouts[t]`` out-edges per frontier vertex, ranked by the
    deterministic edge hash.  ``pair_mod`` packs (src, dst) into one int64
    hash key and must exceed every dst id (asserted)."""
    frontier = np.unique(np.asarray(seeds, dtype=np.int64))
    layers = []
    for t, f in enumerate(fanouts):
        if len(frontier) == 0:
            break
        ref = ray.put(frontier)  # sorted by construction (np.unique)

        def _partial(batch: pa.Table, _t=t, _f=f) -> pa.Table:
            empty = pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "prio": pa.array([], pa.int64()),
                }
            )
            if batch.num_rows == 0 or src_col not in batch.column_names:
                return empty
            fr = ray.get(ref)
            src = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            hit = np.searchsorted(fr, src)
            m = (hit < len(fr)) & (fr[np.minimum(hit, len(fr) - 1)] == src)
            src, dst = src[m], dst[m]
            if len(src) == 0:
                return empty
            assert dst.max() < pair_mod and src.max() < (1 << 62) // pair_mod, (
                "pair_mod must exceed every dst id (and src*pair_mod must fit int64)"
            )
            rank = hash_u64(src * pair_mod + dst, salt + _t)
            keep = _head_per_src(src, dst, rank, _f)
            return pa.table(
                {
                    "src": pa.array(src[keep]),
                    "dst": pa.array(dst[keep]),
                    "prio": pa.array(rank[keep].view(np.int64)),
                }
            )

        partials = edges.select_columns([src_col, dst_col]).map_batches(
            _partial, batch_format="pyarrow"
        )

        def _final(df: pd.DataFrame, _t=t, _f=f) -> pd.DataFrame:
            src = df["src"].to_numpy()
            keep = _head_per_src(
                src, df["dst"].to_numpy(), df["prio"].to_numpy().view(np.uint64), _f
            )
            out = df.iloc[np.sort(keep)][["src", "dst"]].reset_index(drop=True)
            out.insert(0, "layer", np.int64(_t))
            return out

        sampled = partials.groupby("src").map_groups(_final, batch_format="pandas")
        sampled = sampled.materialize()
        if sampled.count() == 0:  # frontier hit nothing — dead end
            break
        layers.append(sampled)
        # next frontier: the sampled dsts (minibatch-bounded: ≤ |frontier|·f)
        frontier = np.unique(
            sampled.select_columns(["dst"]).to_pandas()["dst"].to_numpy()
        ).astype(np.int64)

    if not layers:
        return ray.data.from_items([])
    out = layers[0]
    for ds in layers[1:]:
        out = out.union(ds)
    return out


def negative_sample(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    n_universe: int,
    k: int = 5,
    m: int | None = None,
    salt: int = 0,
    src_col: str = "src",
    dst_col: str = "dst",
    oid_col: str = "oid",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Deterministic negative-edge sampling for link-prediction training:
    for every vertex, ``k`` non-edges (src, dst) drawn hash-uniformly from
    the id universe ``[0, n_universe)``.

    Candidate ``i`` of vertex ``v`` is ``hash_u64(v·n_universe + i, salt)
    % n_universe`` — a pure function of (v, i), so the sample is
    partition-invariant and bit-exactly reproducible in SQL.  Each vertex
    proposes ``m ≥ k`` candidates (default ``2k + 8`` — ample unless a
    vertex neighbors most of the universe); self-loops and true edges are
    removed by one distributed hash ANTI-join against the edge table (the
    same exchange shape as ``functions/joins.semi_join``'s scale path),
    and the k surviving candidates with the smallest ``i`` win.  Vertices
    whose true neighborhood swallows all m candidates emit fewer than k —
    callers needing exactly-k re-run those few ids with a larger m."""
    from graphscope_ray.utils import hash_join

    m = m if m is not None else 2 * k + 8

    def _cands(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or oid_col not in t.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("src", "dst", "i")}
            )
        v = np.repeat(t[oid_col].to_numpy(zero_copy_only=False).astype(np.int64), m)
        i = np.tile(np.arange(m, dtype=np.int64), t.num_rows)
        d = (hash_u64(v * n_universe + i, salt) % np.uint64(n_universe)).astype(np.int64)
        keep = d != v  # self-loops out
        return pa.table(
            {"src": pa.array(v[keep]), "dst": pa.array(d[keep]), "i": pa.array(i[keep])}
        )

    cands = vertices.select_columns([oid_col]).map_batches(_cands, batch_format="pyarrow")

    # anti-join true edges on the packed pair key (one int64 per edge)
    def _pack(scol, dcol, out):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or scol not in t.column_names:
                cols = {"pair": pa.array([], pa.int64())}
                if out:
                    cols.update({"src": pa.array([], pa.int64()), "i": pa.array([], pa.int64())})
                return pa.table(cols)
            s = t[scol].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dcol].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"pair": pa.array(s * n_universe + d)}
            if out:
                cols.update({"src": pa.array(s), "i": t["i"]})
            return pa.table(cols)

        return _f

    ce = cands.map_batches(_pack("src", "dst", True), batch_format="pyarrow")
    te = edges.select_columns([src_col, dst_col]).map_batches(
        _pack(src_col, dst_col, False), batch_format="pyarrow"
    )
    # left join + null-right filter = distributed anti join
    import pyarrow.compute as pc

    te_marked = te.map_batches(
        lambda t: t.append_column("__hit", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        if t.num_rows
        else t.append_column("__hit", pa.array([], pa.int8())),
        batch_format="pyarrow",
    )
    joined = hash_join(ce, te_marked, "pair", "pair", num_partitions=num_partitions, how="left")

    def _survivors(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__hit" not in t.column_names:
            return t
        return t.filter(pc.is_null(t["__hit"])).drop_columns(["__hit"])

    surv = joined.map_batches(_survivors, batch_format="pyarrow")

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values("i").head(k)
        d = (out["pair"] % n_universe).astype(np.int64)
        return pd.DataFrame({"src": out["src"].astype(np.int64), "dst": d})

    return surv.groupby("src").map_groups(_topk, batch_format="pandas")
