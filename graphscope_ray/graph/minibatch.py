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


def _sample_layer(
    edges: ray.data.Dataset,
    frontier: np.ndarray,
    f: int,
    layer_salt: int,
    layer_idx: int,
    pair_mod: int,
    src_col: str,
    dst_col: str,
) -> ray.data.Dataset:
    """One fanout layer: the ≤f smallest-hash out-edges per frontier vertex
    (per-block partials, then a per-src head-f reduce).  ``frontier`` must
    be sorted (searchsorted membership)."""
    ref = ray.put(frontier)

    def _partial(batch: pa.Table) -> pa.Table:
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
        rank = hash_u64(src * pair_mod + dst, layer_salt)
        keep = _head_per_src(src, dst, rank, f)
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

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy()
        keep = _head_per_src(
            src, df["dst"].to_numpy(), df["prio"].to_numpy().view(np.uint64), f
        )
        out = df.iloc[np.sort(keep)][["src", "dst"]].reset_index(drop=True)
        out.insert(0, "layer", np.int64(layer_idx))
        return out

    return partials.groupby("src").map_groups(_final, batch_format="pandas").materialize()


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
        sampled = _sample_layer(
            edges, frontier, f, salt + t, t, pair_mod, src_col, dst_col
        )
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


def metapath_sample(
    pg,
    seeds: np.ndarray,
    path: list[str],
    fanouts: list[int],
    salt: int = 0,
    pair_mod: int = 1 << 21,
) -> ray.data.Dataset:
    """Metapath-guided fanout sampling over a first-class PropertyGraph —
    the HETEROGENEOUS-GNN loader primitive (GLE's `meta_path` neighbor
    sampler over a labeled graph; same role as `khop_sample` but layer t
    draws from the edge-LABEL table ``path[t]``, e.g. customer
    -[places]→ order -[contains]→ part).  Seeds are oids of
    ``path[0]``'s src label.  Ranks are the same deterministic edge hash
    as khop_sample, so the whole sample is bit-exactly SQL-reproducible.
    Returns (layer, elabel, src, dst) with oids in each label's own id
    space.  Multi-edges consume fanout slots per copy, identically on
    both sides (the rank is a pure function of the pair)."""
    assert len(path) == len(fanouts)
    frontier = np.unique(np.asarray(seeds, dtype=np.int64))
    layers = []
    for t, (elabel, f) in enumerate(zip(path, fanouts)):
        if len(frontier) == 0:
            break
        sampled = _sample_layer(
            pg.edge_table(elabel),
            frontier,
            f,
            salt + t,
            t,
            pair_mod,
            "src_oid",
            "dst_oid",
        )
        if sampled.count() == 0:
            break

        def _lab(tbl: pa.Table, _el=elabel) -> pa.Table:
            return tbl.append_column(
                "elabel", pa.array(np.full(tbl.num_rows, _el, dtype=object), pa.string())
            )

        layers.append(sampled.map_batches(_lab, batch_format="pyarrow"))
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


# ---------------------------------------------------------------------------
# link-prediction pair features

AA_SCALE = 10**12


def aa_weight_int(g):
    """Integer Adamic–Adar weight of a mid vertex with degree ``g``:
    ``round(1e12 / ln(g))``.  Both the engine and the SQL oracle use THIS
    numpy kernel (the oracle embeds the values), so the per-pair sum is an
    exact int64 on both sides — no float-accumulation order dependence."""
    return np.round(AA_SCALE / np.log(np.asarray(g, dtype=np.float64))).astype(np.int64)


def link_features(
    edges: ray.data.Dataset,
    seeds: np.ndarray,
    pair_mod: int,
    max_degree: int = 256,
    min_cn: int = 1,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Link-prediction pair features (the classic GNN/LP training-data prep,
    Liben-Nowell & Kleinberg 2003): for every candidate pair (u, v), u < v,
    that shares ≥ ``min_cn`` common neighbors in the UNDIRECTED simple
    graph and whose min endpoint u is in ``seeds`` (the candidate slice a
    trainer featurizes), emit

    - ``cn``       common-neighbor count,
    - ``aa_e12``   Adamic–Adar index Σ 1/ln(deg(w)) over common neighbors
                   w, as the EXACT integer Σ round(1e12/ln(deg(w))),
    - ``jaccard``  cn / (deg(u) + deg(v) − cn), round 8 (tie-free for
                   denominators ≤ 2·10^8: no p/q at that scale rounds on a
                   half boundary),
    - ``pref``     preferential attachment deg(u)·deg(v),
    - ``is_edge``  1 if (u, v) is a true edge (the training label).

    Distributed shape: ONE exchange groups the distinct undirected
    adjacency by mid vertex; each mid group emits its seed-filtered pairs
    with pre-combined integer partials; one hash exchange sums (cn, aaw)
    per packed pair key; degrees and the edge label attach via hash joins
    (vertex-sized sides — no broadcast).  Mids with degree > ``max_degree``
    are SKIPPED (the standard hub cap: a 10^6-degree hub contributes
    ~0 Adamic–Adar mass but deg² wedge pairs — at 100 TB that cap is what
    keeps the wedge volume Σ min(deg, cap)² instead of Σ deg²)."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    seeds_sorted = np.unique(np.asarray(seeds, dtype=np.int64))

    def _both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()), "m": pa.array([], pa.int64())})
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s):
            mx = max(int(s.max()), int(d.max()))
            assert mx < pair_mod and mx < (1 << 62) // pair_mod, (
                f"vertex id {mx} >= pair_mod {pair_mod}: packed pair keys would alias"
            )
        return pa.table(
            {"u": pa.array(np.concatenate([s, d])), "m": pa.array(np.concatenate([d, s]))}
        )

    und = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]).map_batches(_both, batch_format="pyarrow"),
        ["u", "m"],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns(["u", "m"])
    und = und.materialize()  # reused three times below
    deg = hash_groupby_sum(und, ["u"], None, "d", num_partitions=num_partitions)

    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        g = len(df)  # und is distinct, so the group size IS deg(mid)
        empty = pd.DataFrame(
            {"pk": pd.Series(dtype=np.int64), "cn": pd.Series(dtype=np.int64),
             "aaw": pd.Series(dtype=np.int64)}
        )
        if g < 2 or g > max_degree:
            return empty
        u = np.sort(df["u"].to_numpy())
        assert u[-1] < pair_mod and u[-1] < (1 << 62) // pair_mod
        # generate ONLY seed-anchored pairs (min endpoint ∈ seeds): for each
        # seed at sorted position p, partners are u[p+1:] — seedfrac·g²
        # rows materialized instead of the full C(g,2) triu
        hit = np.searchsorted(seeds_sorted, u)
        sel = np.flatnonzero(
            (hit < len(seeds_sorted))
            & (seeds_sorted[np.minimum(hit, len(seeds_sorted) - 1)] == u)
        )
        sel = sel[sel < g - 1]  # the max element anchors no pair
        if len(sel) == 0:
            return empty
        counts = g - 1 - sel
        offs = np.cumsum(counts)
        idx = (
            np.arange(offs[-1])
            - np.repeat(offs - counts, counts)
            + np.repeat(sel + 1, counts)
        )
        a, b = np.repeat(u[sel], counts), u[idx]
        w = int(aa_weight_int(g))
        return pd.DataFrame(
            {"pk": a * pair_mod + b,
             "cn": np.ones(len(a), dtype=np.int64),
             "aaw": np.full(len(a), w, dtype=np.int64)}
        )

    wed = und.groupby("m").map_groups(_wedges, batch_format="pandas")
    agg = hash_groupby_sum(
        wed, ["pk"], ["cn", "aaw"], ["cn", "aaw"], num_partitions=num_partitions
    )

    def _unpack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pk" not in t.column_names:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "cn": pa.array([], pa.int64()), "aaw": pa.array([], pa.int64()),
                 "pk": pa.array([], pa.int64())}
            )
        pk = t["pk"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"u": pa.array(pk // pair_mod), "v": pa.array(pk % pair_mod),
             "cn": t["cn"], "aaw": t["aaw"], "pk": t["pk"]}
        )

    pairs = agg.map_batches(_unpack, batch_format="pyarrow")

    def _ren(old, new):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or old[0] not in t.column_names:
                return pa.table({c: pa.array([], pa.int64()) for c in new})
            return t.select(old).rename_columns(new)
        return _f

    degu = deg.map_batches(_ren(["u", "d"], ["ju", "du"]), batch_format="pyarrow")
    degv = deg.map_batches(_ren(["u", "d"], ["jv", "dv"]), batch_format="pyarrow")
    pairs = hash_join(pairs, degu, "u", "ju", num_partitions=num_partitions)
    pairs = hash_join(pairs, degv, "v", "jv", num_partitions=num_partitions)

    # training label: (u, v) is a true edge (und holds both orientations)
    def _ekeys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"epk": pa.array([], pa.int64()), "__e": pa.array([], pa.int8())})
        u = t["u"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        keep = u < m
        return pa.table(
            {"epk": pa.array(u[keep] * pair_mod + m[keep]),
             "__e": pa.array(np.ones(int(keep.sum()), dtype=np.int8))}
        )

    ekeys = und.map_batches(_ekeys, batch_format="pyarrow")
    joined = hash_join(pairs, ekeys, "pk", "epk", num_partitions=num_partitions, how="left")

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        if "cn" not in df.columns:  # zero-left-rows hash partition
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64)
                 for c in ("u", "v", "cn", "aa_e12", "jaccard", "pref", "is_edge")}
            ).astype({"jaccard": np.float64})
        df = df[df["cn"] >= min_cn]
        cn = df["cn"].to_numpy(np.float64)
        du = df["du"].to_numpy(np.int64)
        dv = df["dv"].to_numpy(np.int64)
        return pd.DataFrame(
            {"u": df["u"].astype(np.int64), "v": df["v"].astype(np.int64),
             "cn": df["cn"].astype(np.int64), "aa_e12": df["aaw"].astype(np.int64),
             "jaccard": np.round(cn / (du + dv - cn.astype(np.int64)), 8),
             "pref": du * dv,
             "is_edge": df["__e"].notna().astype(np.int64) if "__e" in df else np.zeros(len(df), np.int64)}
        )

    return joined.map_batches(_final, batch_format="pandas")


# ---------------------------------------------------------------------------
# GraphSAGE mean aggregation (neighborhood feature propagation)


def neighbor_feature_sum(
    edges: ray.data.Dataset,
    feat_ids: np.ndarray,
    feat_mat: np.ndarray,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """GraphSAGE-style neighborhood aggregation (Hamilton et al. 2017's
    mean aggregator, returned as exact per-dimension SUM + in-degree so
    callers divide — or keep integer features integer): for every vertex v,
    Σ_{(u,v) ∈ E} f(u) per dimension, over a BROADCAST feature matrix
    (``ray.put`` once, searchsorted lookup per batch — the small-side
    pattern; for >object-store feature tables attach features with
    ``utils.hash_join`` on src instead and feed the same partial kernel).

    Distributed shape: each edge block scatters its src features into
    per-dst partial sums (np.add.at on a (unique_dst × d) local buffer),
    then ONE multi-column hash exchange sums the d partials + count per
    dst — per-dst volume entering the exchange is ≤ #blocks rows, not
    in-degree.  Returns (oid, n, s0..s{d-1})."""
    from graphscope_ray.utils import hash_groupby_sum

    order = np.argsort(feat_ids)
    ids_sorted = np.ascontiguousarray(np.asarray(feat_ids, dtype=np.int64)[order])
    mat_sorted = np.ascontiguousarray(np.asarray(feat_mat)[order])
    d = mat_sorted.shape[1]
    ref = ray.put((ids_sorted, mat_sorted))
    scols = [f"s{j}" for j in range(d)]
    # only the dtype may enter the UDF closure — capturing mat_sorted itself
    # would pickle the whole matrix into every task, defeating the broadcast
    feat_dtype = pa.from_numpy_dtype(mat_sorted.dtype)
    del order, feat_ids, feat_mat, ids_sorted, mat_sorted

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"oid": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
             **{c: pa.array([], feat_dtype) for c in scols}}
        )
        if t.num_rows == 0 or src_col not in t.column_names:
            return empty
        ids, mat = ray.get(ref)
        src = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ids, src)
        ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == src)
        if not ok.any():
            return empty
        src, dst, pos = src[ok], dst[ok], pos[ok]
        udst, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros((len(udst), mat.shape[1]), dtype=mat.dtype)
        np.add.at(sums, inv, mat[pos])
        cnt = np.bincount(inv, minlength=len(udst)).astype(np.int64)
        cols = {"oid": pa.array(udst), "n": pa.array(cnt)}
        cols.update({c: pa.array(sums[:, j]) for j, c in enumerate(scols)})
        return pa.table(cols)

    partials = edges.select_columns([src_col, dst_col]).map_batches(
        _partial, batch_format="pyarrow"
    )
    return hash_groupby_sum(
        partials, ["oid"], ["n"] + scols, ["n"] + scols, num_partitions=num_partitions
    )


# ---------------------------------------------------------------------------
# node2vec second-order biased walks


def node2vec_walks(
    edges: ray.data.Dataset,
    n_starts: int,
    length: int = 4,
    w_ret: int = 1,
    w_com: int = 4,
    w_far: int = 2,
    a: int = 1103515245,
    b: int = 12345,
    c: int = 97,
    mod: int = 2147483647,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Deterministic node2vec walks (Grover & Leskovec 2016's second-order
    p/q walk, with the search-bias weights as INTEGERS so the choice rule
    is exact): one walk starts at every vertex < ``n_starts``; at step s a
    candidate x ∈ N_out(cur) weighs ``w_ret`` if x == prev (the 1/p return
    class), ``w_com`` if (prev → x) is an edge (the distance-1 class) and
    ``w_far`` otherwise (the 1/q class); the next vertex is the ascending
    candidate whose cumulative-weight interval contains
    ``r = (a·walk_id + b·s + c·cur) mod m mod W`` (the same LCG-style
    hash as ``algorithms.random_walks``, so re-runs/partitionings agree
    and SQL reproduces the walk bit-exactly).  Step 1 uses prev = start
    (every candidate lands in one class → uniform).  Walks stop at sinks.

    Distributed shape per step: one hash join expands walks by cur's
    out-neighbors, one LEFT pair-key join classifies the distance-1 set,
    one per-walk map_groups picks the winner — candidate volume is
    Σ deg(cur) per step, the loader-primitive scale (walks are
    minibatch-sized).  Returns rows (walk_id, step, v)."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    assert min(w_ret, w_com, w_far) >= 0 and max(w_ret, w_com, w_far) > 0

    # SIMPLE-graph semantics: multi-edges collapse (the SQL twin's e is
    # DISTINCT; duplicate rows would double-count a candidate's weight)
    e = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]).map_batches(
            lambda t: t.rename_columns(["asrc", "adst"])
            if t.num_rows and src_col in t.column_names
            else pa.table({"asrc": pa.array([], pa.int64()), "adst": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        ["asrc", "adst"], None, "__n", num_partitions=num_partitions,
    ).select_columns(["asrc", "adst"]).materialize()

    def _emax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table(
            {"mx": pa.array([max(
                int(pa.compute.max(t["asrc"]).as_py() or 0),
                int(pa.compute.max(t["adst"]).as_py() or 0),
            )], type=pa.int64())}
        )

    nmax = int(e.map_batches(_emax, batch_format="pyarrow").max("mx") or 0)
    pair_mod = nmax + 1
    assert nmax * pair_mod + nmax < (1 << 63), (
        f"max vertex id {nmax}: packed (prev, next) pair keys overflow int64"
    )

    ekeys = e.map_batches(
        lambda t: pa.table(
            {
                "epk": pa.array(
                    t["asrc"].to_numpy(zero_copy_only=False).astype(np.int64) * pair_mod
                    + t["adst"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "__e": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )
        if t.num_rows
        else pa.table({"epk": pa.array([], pa.int64()), "__e": pa.array([], pa.int8())}),
        batch_format="pyarrow",
    ).materialize()

    starts = pa.table(
        {
            "walk_id": pa.array(np.arange(n_starts, dtype=np.int64)),
            "prev": pa.array(np.arange(n_starts, dtype=np.int64)),
            "cur": pa.array(np.arange(n_starts, dtype=np.int64)),
        }
    )
    walks = ray.data.from_arrow(starts)
    outs = [
        ray.data.from_arrow(
            pa.table(
                {
                    "walk_id": starts["walk_id"],
                    "step": pa.array(np.zeros(n_starts, dtype=np.int64)),
                    "v": starts["cur"],
                }
            )
        )
    ]

    for s in range(1, length + 1):
        cand = hash_join(walks, e, "cur", "asrc", num_partitions=num_partitions)

        def _key(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "adst" not in t.column_names:
                return pa.table(
                    {col: pa.array([], pa.int64())
                     for col in ("walk_id", "prev", "cur", "nxt", "ck")}
                )
            prev = t["prev"].to_numpy(zero_copy_only=False).astype(np.int64)
            nxt = t["adst"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"walk_id": t["walk_id"], "prev": t["prev"], "cur": t["cur"],
                 "nxt": pa.array(nxt), "ck": pa.array(prev * pair_mod + nxt)}
            )

        keyed = cand.map_batches(_key, batch_format="pyarrow")
        marked = hash_join(
            keyed, ekeys, "ck", "epk", num_partitions=num_partitions, how="left"
        )

        def _pick(df: pd.DataFrame, _s=s) -> pd.DataFrame:
            df = df.sort_values("nxt")
            nxt = df["nxt"].to_numpy(np.int64)
            prev = df["prev"].to_numpy(np.int64)
            com = df["__e"].notna().to_numpy() if "__e" in df else np.zeros(len(df), bool)
            ret = nxt == prev
            wt = np.where(ret, w_ret, np.where(com, w_com, w_far)).astype(np.int64)
            cum = np.cumsum(wt)
            wid = int(df["walk_id"].iloc[0])
            cur = int(df["cur"].iloc[0])
            if cum[-1] == 0:  # every candidate in a zero-weight class: dead end
                return pd.DataFrame(
                    {c_: pd.Series(dtype=np.int64) for c_ in ("walk_id", "prev", "cur")}
                )
            r = ((a * wid + b * _s + c * cur) % mod) % int(cum[-1])
            i = int(np.searchsorted(cum, r, side="right"))
            return pd.DataFrame(
                {"walk_id": [wid], "prev": [cur], "cur": [int(nxt[i])]}
            )

        walks = (
            marked.groupby("walk_id").map_groups(_pick, batch_format="pandas").materialize()
        )
        if walks.count() == 0:
            break
        outs.append(
            walks.map_batches(
                lambda t, _s=s: pa.table(
                    {"walk_id": t["walk_id"],
                     "step": pa.array(np.full(t.num_rows, _s, dtype=np.int64)),
                     "v": t["cur"]}
                )
                if t.num_rows and "walk_id" in t.column_names
                else pa.table({"walk_id": pa.array([], pa.int64()),
                               "step": pa.array([], pa.int64()),
                               "v": pa.array([], pa.int64())}),
                batch_format="pyarrow",
            )
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
