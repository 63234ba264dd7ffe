"""Community-quality metrics over (edges, labels) — the evaluation side of
community detection (CDLP/Louvain/fluid): modularity, the contracted
community graph, and per-community conductance statistics.

The reference evaluates its community apps with NetworkX modularity in
tests (python/graphscope/nx/algorithms/community); here the metrics are
first-class DISTRIBUTED operators so a 10^9-vertex partition can be scored
without collecting it: labels attach to edge endpoints via two hash-join
exchanges, per-community statistics are integer partials through one
hash-exchange groupby, and the driver folds only community-sized (or
scalar) results.

All outputs are EXACT INTEGERS (edge counts, degree sums, squared-degree
sums) so the SQL oracles are bit-exact with no float-accumulation order
dependence; callers derive the float metric (Q = q_num/q_den,
φ_c = cut/min(vol, 2m−vol)) from the integers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.utils import hash_groupby_sum, hash_join


def _i64(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False).astype(np.int64)


def _f64(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False).astype(np.float64)


def _typed_empty(**cols) -> pa.Table:
    """Typed empty table for schema-stripped empty blocks: value "i" →
    int64 column, "f" → float64."""
    return pa.table(
        {
            k: pa.array([], pa.int64() if v == "i" else pa.float64())
            for k, v in cols.items()
        }
    )


from graphscope_ray.utils import group_rank as _group_rank  # shared numpy kernel


def _undirected_simple(
    edges: ray.data.Dataset, src_col: str, dst_col: str, num_partitions: int
) -> ray.data.Dataset:
    """Distinct undirected pairs (u < v) of the simple graph."""

    def _norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"u": pa.array(np.minimum(s, d)), "v": pa.array(np.maximum(s, d))}
        )

    pairs = edges.select_columns([src_col, dst_col]).map_batches(_norm, batch_format="pyarrow")
    return hash_groupby_sum(
        pairs, ["u", "v"], None, "__n", num_partitions=num_partitions
    ).select_columns(["u", "v"])


def _rename_labels(labels: ray.data.Dataset, oid_col: str, label_col: str,
                   new_key: str, new_lab: str):
    """(oid, label) → (new_key, new_lab) with the empty-schema-block guard."""

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or oid_col not in t.column_names:
            return pa.table(
                {new_key: pa.array([], pa.int64()), new_lab: pa.array([], pa.int64())}
            )
        return t.select([oid_col, label_col]).rename_columns([new_key, new_lab])

    return labels.map_batches(_f, batch_format="pyarrow")


def _with_endpoint_labels(
    und: ray.data.Dataset, labels: ray.data.Dataset, num_partitions: int,
    oid_col: str, label_col: str,
) -> ray.data.Dataset:
    """Attach (lu, lv) to each undirected pair via two hash joins."""
    lu = _rename_labels(labels, oid_col, label_col, "ku", "lu")
    lv = _rename_labels(labels, oid_col, label_col, "kv", "lv")
    j = hash_join(und, lu, "u", "ku", num_partitions=num_partitions)
    return hash_join(j, lv, "v", "kv", num_partitions=num_partitions)


def community_edge_stats(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    oid_col: str = "oid",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Per-community integer statistics over the UNDIRECTED simple graph:
    (community, intra, cut, vol) — intra-community edge count, boundary
    (cut) edge count, and degree volume Σdeg.  A cut edge counts toward
    BOTH its endpoint communities; vol comes from the distinct undirected
    degree.  One labeled-pair exchange + one groupby; everything int64."""
    und = _undirected_simple(edges, src_col, dst_col, num_partitions).materialize()
    lab = _with_endpoint_labels(und, labels, num_partitions, oid_col, label_col)

    def _partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "lu" not in t.column_names:
            return _typed_empty(community="i", intra="i", cut="i")
        lu, lv = _i64(t, "lu"), _i64(t, "lv")
        same = lu == lv
        comm = np.concatenate([lu[same], lu[~same], lv[~same]])
        intra = np.concatenate(
            [np.ones(same.sum(), np.int64), np.zeros(2 * (~same).sum(), np.int64)]
        )
        cut = 1 - intra
        return pa.table(
            {"community": pa.array(comm), "intra": pa.array(intra), "cut": pa.array(cut)}
        )

    ic = hash_groupby_sum(
        lab.map_batches(_partials, batch_format="pyarrow"),
        ["community"], ["intra", "cut"], ["intra", "cut"],
        num_partitions=num_partitions,
    )

    # vol: undirected degree summed per community (adjacency → label join)
    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"e": pa.array([], pa.int64())})
        return pa.table(
            {"e": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
        )

    deg = hash_groupby_sum(
        und.map_batches(_ends, batch_format="pyarrow"), ["e"], None, "d",
        num_partitions=num_partitions,
    ).materialize()
    degl = hash_join(
        deg,
        _rename_labels(labels, oid_col, label_col, "ko", "community"),
        "e", "ko", num_partitions=num_partitions,
    ).materialize()
    # precondition: every edge endpoint must carry a label — an unlabeled
    # endpoint would silently drop its pairs from intra/cut while vol still
    # counted the labeled side, making the statistics mutually inconsistent
    n_ep, n_lab = deg.count(), degl.count()
    if n_lab != n_ep:
        raise ValueError(
            f"labels cover {n_lab} of {n_ep} edge-endpoint vertices; "
            "label every vertex (or filter the edges) before scoring"
        )
    vol = hash_groupby_sum(degl, ["community"], "d", "vol", num_partitions=num_partitions)
    out = hash_join(ic, vol, "community", "community", num_partitions=num_partitions)

    def _clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "community" not in t.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("community", "intra", "cut", "vol")}
            )
        return t.select(["community", "intra", "cut", "vol"])

    return out.map_batches(_clean, batch_format="pyarrow")


def modularity_stats(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 8,
    **cols,
) -> pd.DataFrame:
    """Newman modularity of a labeling, as EXACT integers: with m distinct
    undirected edges, e_c intra edges and d_c degree volume per community,
    Q = Σ_c e_c/m − Σ_c (d_c/2m)² = q_num/q_den with
    q_num = 4m·Σe_c − Σd_c², q_den = 4m².  Returns one row
    (m, q_num, q_den) — the driver folds three scalars."""
    stats = community_edge_stats(edges, labels, num_partitions=num_partitions, **cols)
    # the per-community table is the module's documented driver boundary
    # (community-sized); the fold runs in PYTHON ints so vol² cannot wrap
    # int64 (a single community with ≥3.04e9 degree volume would) — the
    # SQL oracle's HUGEINT arithmetic stays exact, and so does this.
    pdf = stats.to_pandas()
    sum_intra = int(pdf["intra"].astype(object).sum()) if len(pdf) else 0
    sum_v2 = int(sum(int(x) ** 2 for x in pdf["vol"])) if len(pdf) else 0
    vol_total = int(pdf["vol"].astype(object).sum()) if len(pdf) else 0
    # Σvol = 2m exactly (community_edge_stats enforces full label coverage)
    m = vol_total // 2
    return pd.DataFrame(
        {"m": [m], "q_num": [4 * m * sum_intra - sum_v2], "q_den": [4 * m * m]}
    )


def contract_graph(
    edges: ray.data.Dataset,
    labels: ray.data.Dataset,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    oid_col: str = "oid",
    label_col: str = "label",
) -> ray.data.Dataset:
    """The contracted community graph (Louvain's coarsening step as a
    standalone operator, ref apps/pregel/louvain aggregation): directed
    community edges (csrc, cdst, weight = multiplicity of original DISTINCT
    edges between the two communities, self-loops = intra edges kept).
    Two label hash joins + one count groupby."""
    ls = _rename_labels(labels, oid_col, label_col, "ks", "csrc")
    ld = _rename_labels(labels, oid_col, label_col, "kd", "cdst")
    j = hash_join(edges.select_columns([src_col, dst_col]), ls, src_col, "ks",
                  num_partitions=num_partitions)
    j = hash_join(j, ld, dst_col, "kd", num_partitions=num_partitions)
    return hash_groupby_sum(
        j, ["csrc", "cdst"], None, "weight", num_partitions=num_partitions
    )


def wl_colors(
    edges: ray.data.Dataset,
    rounds: int = 3,
    salt: int = 0,
    num_partitions: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """1-dimensional Weisfeiler–Lehman color refinement (the classic graph
    canonization / GNN-expressiveness primitive, cf. networkx
    weisfeiler_lehman_graph_hash): c₀(v) = 0; per round,
    ``c_{t+1}(v) = H(c_t(v) ⊞ Σ_{u~v} H(c_t(u), 2t+salt), 2t+1+salt)``
    over the undirected multigraph, where Σ/⊞ are mod-2^64 sums — an
    ORDER-INVARIANT multiset combiner, so no sorting of neighbor colors is
    needed and the whole refinement is exact-integer (bit-reproducible in
    SQL through the split-multiply HUGEINT kernel).  Two vertices get the
    same color after k rounds iff 1-WL cannot distinguish their k-hop
    neighborhoods (up to hash collisions).  Per round: one join attaching
    neighbor colors to arcs + one wrapping-sum exchange — the same volume
    as a PageRank superstep.  Returns (oid, color) with color the wrapped
    int64 view of the uint64 color."""
    from graphscope_ray.functions.sampling import hash_u64

    def _arcs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table({"vv": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"vv": pa.array(np.concatenate([d, s])), "n": pa.array(np.concatenate([s, d]))}
        )

    both = edges.select_columns([src_col, dst_col]).map_batches(
        _arcs, batch_format="pyarrow"
    ).materialize()
    colors = hash_groupby_sum(
        both.map_batches(
            lambda t: pa.table({"oid": t["vv"]}) if t.num_rows else
            pa.table({"oid": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        ),
        ["oid"], None, "__n", num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {"oid": t["oid"], "c": pa.array(np.zeros(t.num_rows, dtype=np.int64))}
        ) if t.num_rows and "oid" in t.column_names else
        pa.table({"oid": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    for t in range(rounds):
        nb = colors.map_batches(
            lambda tb: tb.select(["oid", "c"]).rename_columns(["ko", "nc"])
            if tb.num_rows and "oid" in tb.column_names
            else pa.table({"ko": pa.array([], pa.int64()), "nc": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
        arcs_c = hash_join(both, nb, "n", "ko", num_partitions=num_partitions)

        def _hmsg(tb: pa.Table, _s=2 * t + salt) -> pa.Table:
            if tb.num_rows == 0 or "nc" not in tb.column_names:
                return pa.table({"vv": pa.array([], pa.int64()), "hc": pa.array([], pa.int64())})
            hc = hash_u64(tb["nc"].to_numpy(zero_copy_only=False).astype(np.int64), _s)
            return pa.table({"vv": tb["vv"], "hc": pa.array(hc.view(np.int64))})

        msgs = hash_groupby_sum(  # int64 sums wrap mod 2^64 — the multiset combiner
            arcs_c.map_batches(_hmsg, batch_format="pyarrow"),
            ["vv"], "hc", "m", num_partitions=num_partitions,
        )
        # INNER join is exact: colors is built from arc endpoints, so every
        # vertex has ≥1 incident arc and therefore a message row.  (A left
        # join would let pandas upcast int64 messages to float64 on
        # NaN-bearing partitions — silently corrupting wrapped 64-bit sums.)
        joined = hash_join(colors, msgs, "oid", "vv", num_partitions=num_partitions)

        def _update(tb: pa.Table, _s=2 * t + 1 + salt) -> pa.Table:
            if tb.num_rows == 0 or "c" not in tb.column_names:
                return _typed_empty(oid="i", c="i")
            c = _i64(tb, "c").view(np.uint64)
            m = _i64(tb, "m").view(np.uint64)
            with np.errstate(over="ignore"):
                mixed = (c + m).view(np.int64)
            newc = hash_u64(mixed, _s).view(np.int64)
            return pa.table({"oid": pa.array(_i64(tb, "oid")), "c": pa.array(newc)})

        colors = joined.map_batches(_update, batch_format="pyarrow").materialize()

    return colors.map_batches(
        lambda tb: tb.rename_columns(["oid", "color"])
        if tb.num_rows and "oid" in tb.column_names
        else pa.table({"oid": pa.array([], pa.int64()), "color": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )


def _pairs_with_degrees(
    edges: ray.data.Dataset, src_col: str, dst_col: str, num_partitions: int
):
    """Shared degree-attachment dataflow for the degree-defined measures
    (rich-club / s-metric / average neighbor degree): canonical-edge
    distinct → one degree hash exchange → two hash joins attaching both
    endpoint degrees.  Returns (ce, deg, joined) where ce has (u, v)
    with u < v, deg has (oid, d), and joined has (u, v, d_u, d_v)."""
    ce = _undirected_simple(edges, src_col, dst_col, num_partitions)

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"oid": pa.array([], pa.int64())})
        return pa.table(
            {"oid": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
        )

    deg = hash_groupby_sum(
        ce.map_batches(_ends, batch_format="pyarrow"),
        ["oid"],
        None,
        "d",
        num_partitions=num_partitions,
    )

    # collision-free per-side degree columns: Ray Data skips projections on
    # empty blocks, so a plain select/rename can leak a stale (oid, d)
    # schema into the second join and trip pandas merge suffixing — rename
    # through guarded map_batches into names no other stage uses instead.
    def _rename_deg(side: str):
        def _rn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "d" not in t.column_names:
                return _typed_empty(**{f"oid_{side}": "i", f"d_{side}": "i"})
            return pa.table({f"oid_{side}": t["oid"], f"d_{side}": t["d"]})

        return _rn

    degu = deg.map_batches(_rename_deg("u"), batch_format="pyarrow")
    degv = deg.map_batches(_rename_deg("v"), batch_format="pyarrow")
    j = hash_join(ce, degu, left_on="u", right_on="oid_u", num_partitions=num_partitions)
    j = hash_join(j, degv, left_on="v", right_on="oid_v", num_partitions=num_partitions)
    return ce, deg, j


def rich_club_coefficient(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Unnormalized rich-club coefficient over the undirected simple graph
    (networkx rich_club_coefficient(G, normalized=False) semantics;
    cf. Colizza et al. 2006): for each degree threshold k,
    φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = #nodes of degree > k and
    E_k = #edges with both endpoint degrees > k.  Rows for k ∈
    [0, max_degree) with N_k ≥ 2.

    Dataflow: canonical-edge distinct → degree hash exchange → two hash
    joins attach endpoint degrees → per-block min-endpoint-degree histogram
    partials; the driver folds two ≤max_degree-sized count vectors and
    suffix-sums them — exact integers until the single final division, no
    O(E) driver state.
    """
    ce, deg, j = _pairs_with_degrees(edges, src_col, dst_col, num_partitions)

    def _edge_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d_u" not in t.column_names or "d_v" not in t.column_names:
            return _typed_empty(m="i", c="i")
        m = np.minimum(_i64(t, "d_u"), _i64(t, "d_v"))
        h = np.bincount(m)
        return pa.table({"m": pa.array(np.arange(len(h), dtype=np.int64)), "c": pa.array(h.astype(np.int64))})

    def _node_hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d" not in t.column_names:
            return _typed_empty(m="i", c="i")
        h = np.bincount(_i64(t, "d"))
        return pa.table({"m": pa.array(np.arange(len(h), dtype=np.int64)), "c": pa.array(h.astype(np.int64))})

    eh = j.map_batches(_edge_hist, batch_format="pyarrow").to_pandas()
    nh = deg.map_batches(_node_hist, batch_format="pyarrow").to_pandas()
    max_d = int(nh["m"].max()) if len(nh) else 0
    ec = np.zeros(max_d + 1, dtype=np.int64)
    nc = np.zeros(max_d + 1, dtype=np.int64)
    for t, acc in ((eh, ec), (nh, nc)):
        if len(t):
            g2 = t.groupby("m")["c"].sum()
            acc[g2.index.to_numpy()] += g2.to_numpy()
    # suffix sums: counts with degree / min-endpoint-degree strictly > k
    e_gt = np.concatenate([np.cumsum(ec[::-1])[::-1][1:], [0]])
    n_gt = np.concatenate([np.cumsum(nc[::-1])[::-1][1:], [0]])
    ks = np.arange(max_d, dtype=np.int64)
    keep = n_gt[:max_d] >= 2
    ks = ks[keep]
    nk = n_gt[ks]
    ek = e_gt[ks]
    phi = np.round(2.0 * ek / (nk * (nk - 1.0)), 8)
    return pd.DataFrame(
        {
            "k": ks,
            "n_nodes": nk.astype("int64"),
            "n_edges": ek.astype("int64"),
            "phi": phi,
        }
    )


def s_metric(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> int:
    """s-metric (Li, Alderson, Doyle & Willinger 2005; networkx
    ``s_metric``): Σ_{(u,v)∈E} deg(u)·deg(v) over the undirected simple
    graph — the scale-free-ness statistic (maximal when high-degree nodes
    attach to each other).  Exact integer: per-block partial products fold
    to one scalar on the driver; the dataflow is the shared rich-club
    degree-join (one degree exchange + two hash joins)."""
    _ce, _deg, j = _pairs_with_degrees(edges, src_col, dst_col, num_partitions)

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d_u" not in t.column_names:
            return _typed_empty(s="i")
        p = _i64(t, "d_u") * _i64(t, "d_v")
        return pa.table({"s": pa.array([int(p.sum())], pa.int64())})

    parts = j.map_batches(_partial, batch_format="pyarrow").to_pandas()
    return int(parts["s"].sum()) if len(parts) else 0


def avg_neighbor_degree(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Average neighbor degree per vertex over the undirected simple graph
    (networkx ``average_neighbor_degree``): knn(u) = Σ_{v∈N(u)} deg(v) /
    deg(u) — the per-vertex form of degree-degree correlation (Barrat et
    al. 2004).  Rows (oid, avg_nbr_deg) for every non-isolated vertex.

    Dataflow: the shared degree-join, then each joined edge emits both
    directions' (vertex, neighbor_degree); ONE hash-exchange groupby sums
    the integer degree totals and counts (count ≡ deg(u)), and the single
    division happens per group — float enters only at the final divide,
    so results are order-independent."""
    _ce, _deg, j = _pairs_with_degrees(edges, src_col, dst_col, num_partitions)

    def _emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d_u" not in t.column_names:
            return _typed_empty(oid="i", nd="i")
        u, v = _i64(t, "u"), _i64(t, "v")
        du, dv = _i64(t, "d_u"), _i64(t, "d_v")
        return pa.table(
            {"oid": pa.array(np.concatenate([u, v])), "nd": pa.array(np.concatenate([dv, du]))}
        )

    em = j.map_batches(_emit, batch_format="pyarrow")
    tot = hash_groupby_sum(em, ["oid"], "nd", "snd", num_partitions=num_partitions)
    cnt = hash_groupby_sum(em, ["oid"], None, "c", num_partitions=num_partitions)

    def _rn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return _typed_empty(oid_c="i", c="i")
        return pa.table({"oid_c": t["oid"], "c": t["c"]})

    jj = hash_join(
        tot,
        cnt.map_batches(_rn, batch_format="pyarrow"),
        left_on="oid",
        right_on="oid_c",
        num_partitions=num_partitions,
    )

    def _div(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "snd" not in t.column_names:
            return _typed_empty(oid="i", avg_nbr_deg="f")
        a = np.round(_i64(t, "snd") / _f64(t, "c"), 8)
        return pa.table({"oid": pa.array(_i64(t, "oid")), "avg_nbr_deg": pa.array(a)})

    return jj.map_batches(_div, batch_format="pyarrow")


def weighted_clustering(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    num_partitions: int = 16,
    formula: str = "barrat",
) -> ray.data.Dataset:
    """Weighted clustering coefficient per vertex over the weighted
    undirected simple graph (arc weights of both directions sum into the
    pair weight).  Two published formulas share one triangle dataflow:

    - ``formula="barrat"`` (Barrat, Barthélemy, Pastor-Satorras &
      Vespignani, PNAS 2004):
      C_w(u) = Σ_{triangles (u,v,w)} (w_uv + w_uw) / (2·s_u·(k_u−1)) —
      the numerator is an EXACT integer; float enters only in the one
      final division (round 8) — bit-matchable SQL.
    - ``formula="onnela"`` (Onnela, Saramäki, Kertész & Kaski 2005 — what
      networkx ``clustering(G, weight=…)`` computes):
      Ĉ(u) = Σ_{triangles} (w_uv·w_uw·w_vw)^{1/3} / (max_w·k_u·(k_u−1)),
      with the per-triangle cube root evaluated as ``pow(prod, 1/3)`` in
      BOTH engines so the doubles agree bit-for-bit before the round-8.

    0 when k_u < 2.

    Dataflow: degree-ordered orientation (the triangle-stage idiom that
    caps hub wedges at O(√E) per vertex) → per-corner wedge self-join →
    packed-key membership join closes the triangles → one corner-contrib
    exchange + one (k, s) join.  Requires oids < 2³¹ (packed int64 pair
    keys — asserted)."""

    def _canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        assert (s < 2**31).all() and (d < 2**31).all(), "packed pair keys need oid < 2^31"
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d)),
                "v": pa.array(np.maximum(s, d)),
                "w": pa.array(w),
            }
        )

    wu = hash_groupby_sum(
        edges.map_batches(_canon, batch_format="pyarrow"),
        ["u", "v"],
        "w",
        "w",
        num_partitions=num_partitions,
    ).materialize()

    def _ks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table(
                {
                    "oid": pa.array([], pa.int64()),
                    "one": pa.array([], pa.int64()),
                    "ww": pa.array([], pa.int64()),
                }
            )
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "oid": pa.array(np.concatenate([u, v])),
                "one": pa.array(np.ones(2 * len(u), dtype=np.int64)),
                "ww": pa.array(np.concatenate([w, w])),
            }
        )

    ks = hash_groupby_sum(
        wu.map_batches(_ks, batch_format="pyarrow"),
        ["oid"],
        ["one", "ww"],
        ["k", "s"],
        num_partitions=num_partitions,
    ).materialize()

    def _rnk(side):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "k" not in t.column_names:
                return _typed_empty(**{f"ko_{side}": "i", f"kk_{side}": "i"})
            return pa.table({f"ko_{side}": t["oid"], f"kk_{side}": t["k"]})

        return _f

    ju = hash_join(
        wu, ks.map_batches(_rnk("u"), batch_format="pyarrow"), left_on="u",
        right_on="ko_u", num_partitions=num_partitions,
    )
    ju = hash_join(
        ju, ks.map_batches(_rnk("v"), batch_format="pyarrow"), left_on="v",
        right_on="ko_v", num_partitions=num_partitions,
    )

    def _orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "kk_u" not in t.column_names:
            return _typed_empty(a="i", b="i", w="i")
        u, v, w = _i64(t, "u"), _i64(t, "v"), _i64(t, "w")
        ku, kv = _i64(t, "kk_u"), _i64(t, "kk_v")
        fwd = (ku < kv) | ((ku == kv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(fwd, u, v)),
                "b": pa.array(np.where(fwd, v, u)),
                "w": pa.array(w),
            }
        )

    oe = ju.map_batches(_orient, batch_format="pyarrow").materialize()

    # wedges at corner a: pairs of out-edges (a→b, a→c); membership of (b,c)
    # in the oriented edge set closes the triangle
    def _rhs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(a2="i", c="i", w2="i")
        return pa.table({"a2": t["a"], "c": t["b"], "w2": t["w"]})

    wedges = hash_join(
        oe, oe.map_batches(_rhs, batch_format="pyarrow"), left_on="a", right_on="a2",
        num_partitions=num_partitions,
    )

    def _wkey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return _typed_empty(key="i", corner="i", wab="i", wac="i")
        b, c = _i64(t, "b"), _i64(t, "c")
        keep = b < c  # each unordered out-pair once, keyed in oid order
        b, c = b[keep], c[keep]
        return pa.table(
            {
                "key": pa.array((b << np.int64(31)) | c),
                "corner": pa.array(_i64(t, "a")[keep]),
                "wab": pa.array(_i64(t, "w")[keep]),
                "wac": pa.array(_i64(t, "w2")[keep]),
            }
        )

    def _ekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(ekey="i", wbc="i")
        a, b = _i64(t, "a"), _i64(t, "b")
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"ekey": pa.array((lo << np.int64(31)) | hi), "wbc": pa.array(_i64(t, "w"))}
        )

    tri = hash_join(
        wedges.map_batches(_wkey, batch_format="pyarrow"),
        oe.map_batches(_ekey, batch_format="pyarrow"),
        left_on="key",
        right_on="ekey",
        num_partitions=num_partitions,
    )

    assert formula in ("barrat", "onnela")
    onnela = formula == "onnela"
    mw = 0
    if onnela:
        def _pmax(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "w" not in t.column_names:
                return _typed_empty(m="i")
            return pa.table({"m": pa.array([int(_i64(t, "w").max())], pa.int64())})

        pm = wu.map_batches(_pmax, batch_format="pyarrow").to_pandas()
        mw = int(pm["m"].max()) if len(pm) else 0

    def _contrib(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0 or "wbc" not in tb.column_names:
            return _typed_empty(oid="i", c2="f" if onnela else "i")
        key = _i64(tb, "key")
        b = key >> np.int64(31)
        c = key & np.int64(2**31 - 1)
        a = _i64(tb, "corner")
        wab, wac, wbc = _i64(tb, "wab"), _i64(tb, "wac"), _i64(tb, "wbc")
        if onnela:
            # pow(prod, 1/3), same construct as the SQL's power(prod, 1.0/3.0)
            t = (wab * wac * wbc).astype(np.float64) ** (1.0 / 3.0)
            return pa.table(
                {"oid": pa.array(np.concatenate([a, b, c])),
                 "c2": pa.array(np.concatenate([t, t, t]))}
            )
        return pa.table(
            {
                "oid": pa.array(np.concatenate([a, b, c])),
                "c2": pa.array(np.concatenate([wab + wac, wab + wbc, wac + wbc])),
            }
        )

    contrib = hash_groupby_sum(
        tri.map_batches(_contrib, batch_format="pyarrow"),
        ["oid"],
        "c2",
        "num2",
        num_partitions=num_partitions,
    )

    def _rc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "num2" not in t.column_names:
            return _typed_empty(kc="i", num2="f" if onnela else "i")
        return pa.table({"kc": t["oid"], "num2": t["num2"]})

    out = hash_join(
        ks, contrib.map_batches(_rc, batch_format="pyarrow"), left_on="oid",
        right_on="kc", num_partitions=num_partitions, how="left",
    )

    def _cw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return _typed_empty(oid="i", cw="f")
        k = _i64(t, "k")
        s = _i64(t, "s")
        num2 = (
            np.nan_to_num(_f64(t, "num2"), nan=0.0)
            if "num2" in t.column_names
            else np.zeros(t.num_rows)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            if onnela:
                # nx sums over ORDERED neighbor pairs — each triangle twice
                cw = np.where(
                    (k > 1) & (mw > 0), 2.0 * num2 / (mw * k * (k - 1.0)), 0.0
                )
            else:
                cw = np.where(k > 1, num2 / (2.0 * s * (k - 1)), 0.0)
        return pa.table(
            {"oid": pa.array(_i64(t, "oid")), "cw": pa.array(np.round(cw, 8))}
        )

    return out.map_batches(_cw, batch_format="pyarrow")


def two_hop_sizes(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-vertex directed 2-hop ball size: |{v ≠ u reachable from u in ≤2
    hops}| — the per-vertex form of the neighborhood function N(h) that
    hop-plot/ANF measures aggregate (and the cost model behind 2-hop
    index/friend-of-friend features).  Rows (oid, n_within_2) for vertices
    with out-edges.

    Dataflow: one mid-vertex hash self-join enumerates the 2-paths
    (volume Σ_mid in·out — the same wedge budget as the triangle and
    link-features stages), then ONE pair-key distinct exchange unioned
    with the direct arcs and a per-src count.  No driver state."""
    e = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns([src_col, dst_col])

    def _noself(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        return pa.table({"a": pa.array(s[keep]), "b": pa.array(d[keep])})

    ee = e.map_batches(_noself, batch_format="pyarrow").materialize()

    def _rhs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(m="i", c="i")
        return pa.table({"m": t["a"], "c": t["b"]})

    two = hash_join(
        ee, ee.map_batches(_rhs, batch_format="pyarrow"), left_on="b", right_on="m",
        num_partitions=num_partitions,
    )

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return _typed_empty(a="i", t="i")
        a, c = _i64(t, "a"), _i64(t, "c")
        keep = a != c
        return pa.table({"a": pa.array(a[keep]), "t": pa.array(c[keep])})

    def _direct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(a="i", t="i")
        return pa.table({"a": t["a"], "t": t["b"]})

    ball = two.map_batches(_pairs, batch_format="pyarrow").union(
        ee.map_batches(_direct, batch_format="pyarrow")
    )
    dist = hash_groupby_sum(
        ball, ["a", "t"], None, "__n", num_partitions=num_partitions
    ).select_columns(["a"])

    def _key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(oid="i")
        return pa.table({"oid": t["a"]})

    return hash_groupby_sum(
        dist.map_batches(_key, batch_format="pyarrow"),
        ["oid"],
        None,
        "n_within_2",
        num_partitions=num_partitions,
    )


def seeded_lpa(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_mod: int = 5,
    n_classes: int = 3,
    rounds: int = 6,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Semi-supervised label propagation with hard-clamped seeds (Zhu &
    Ghahramani 2002 — the label-spreading primitive of training-data
    annotation pipelines), synchronous, over the undirected simple graph:
    seeds (oid % seed_mod == 0, class = oid % n_classes) never change;
    every other vertex takes the MODE of its labeled neighbors' classes
    each round (ties → smallest class), keeps its previous state when no
    neighbor is labeled.  Unlabeled after ``rounds`` → -1.

    Distributed rounds: one neighbor-label join + one (vertex, class)
    count exchange + one per-vertex argmax exchange — the argmax rides the
    SAME integer max-combiner as every other exchange here by packing
    (count, −class) into v = count·M + (M−1−class), so no per-group sort
    materializes anywhere."""
    arcs = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns([src_col, dst_col])

    def _sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "a": pa.array(np.concatenate([s, d])),
                "b": pa.array(np.concatenate([d, s])),
            }
        )

    ne = hash_groupby_sum(
        arcs.map_batches(_sym, batch_format="pyarrow"),
        ["a", "b"],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns(["a", "b"]).materialize()

    def _verts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"oid": pa.array([], pa.int64())})
        return pa.table({"oid": t["a"]})

    verts = hash_groupby_sum(
        ne.map_batches(_verts, batch_format="pyarrow"),
        ["oid"],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns(["oid"]).materialize()

    def _init(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _typed_empty(oid="i", label="i")
        o = _i64(t, "oid")
        lab = np.where(o % seed_mod == 0, o % n_classes, -1)
        return pa.table({"oid": pa.array(o), "label": pa.array(lab.astype(np.int64))})

    labels = verts.map_batches(_init, batch_format="pyarrow").materialize()
    M = np.int64(n_classes + 1)

    def _rn(ds, key, val, nk, nv):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or key not in t.column_names:
                return _typed_empty(**{nk: "i", nv: "i"})
            return pa.table({nk: pa.array(_i64(t, key)), nv: pa.array(_i64(t, val))})

        return ds.map_batches(_f, batch_format="pyarrow")

    for _ in range(rounds):
        j = hash_join(
            ne, _rn(labels, "oid", "label", "k_l", "nl"), left_on="a", right_on="k_l",
            num_partitions=num_partitions,
        )

        def _msg(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "nl" not in t.column_names:
                return _typed_empty(oid="i", c="i")
            nl = _i64(t, "nl")
            keep = nl >= 0
            return pa.table(
                {"oid": pa.array(_i64(t, "b")[keep]), "c": pa.array(nl[keep])}
            )

        cnt = hash_groupby_sum(
            j.map_batches(_msg, batch_format="pyarrow"),
            ["oid", "c"],
            None,
            "n",
            num_partitions=num_partitions,
        )

        def _pack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "n" not in t.column_names:
                return _typed_empty(oid="i", v="i")
            v = _i64(t, "n") * M + (M - 1 - _i64(t, "c"))
            return pa.table({"oid": pa.array(_i64(t, "oid")), "v": pa.array(v)})

        mode = hash_groupby_sum(
            cnt.map_batches(_pack, batch_format="pyarrow"),
            ["oid"],
            "v",
            "vmax",
            num_partitions=num_partitions,
            agg="max",
        )
        jj = hash_join(
            labels, _rn(mode, "oid", "vmax", "k_m", "vmax"), left_on="oid",
            right_on="k_m", num_partitions=num_partitions, how="left",
        )

        def _upd(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "oid" not in t.column_names:
                return _typed_empty(oid="i", label="i")
            o = _i64(t, "oid")
            old = _i64(t, "label")
            vm = (
                _f64(t, "vmax")
                if "vmax" in t.column_names
                else np.full(t.num_rows, np.nan)
            )
            has = ~np.isnan(vm)
            picked = np.where(has, np.int64(M) - 1 - (np.nan_to_num(vm, nan=0.0).astype(np.int64) % np.int64(M)), old)
            seed = o % seed_mod == 0
            new = np.where(seed, o % n_classes, np.where(has, picked, old))
            return pa.table({"oid": pa.array(o), "label": pa.array(new.astype(np.int64))})

        labels = jj.map_batches(_upd, batch_format="pyarrow").materialize()
    return labels


def directed_assortativity(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """The four directed degree-assortativity coefficients (Foster,
    Foster, Grassberger & Paczuski, PNAS 2010; networkx
    ``degree_assortativity_coefficient(G, x=…, y=…)``): for each (x, y) ∈
    {out, in}², the Pearson correlation over distinct self-loop-free arcs
    (u→v) of (x-degree(u), y-degree(v)).  Rows (x_deg, y_deg, r, n_edges);
    r = 0 when either side is degenerate (zero variance).

    Dataflow: two degree exchanges → one (oid, od, id) vertex table → two
    hash joins attach both endpoints' degree pairs → per-block EXACT
    integer moment partials (Σx, Σy, Σxy, Σx², Σy², m per combo) fold to
    4×6 driver scalars; float enters only in the final Pearson formula
    (identical expression in the SQL twin, so round 8 is bit-stable)."""
    arcs = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns([src_col, dst_col])

    def _noself(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {"s": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
            )
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        return pa.table({"s": pa.array(s[keep]), "d": pa.array(d[keep])})

    e = arcs.map_batches(_noself, batch_format="pyarrow").materialize()
    od = hash_groupby_sum(e, ["s"], None, "od", num_partitions=num_partitions)
    idg = hash_groupby_sum(e, ["d"], None, "idg", num_partitions=num_partitions)

    def _rn(ds, key, val, nk, nv):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or key not in t.column_names:
                return _typed_empty(**{nk: "i", nv: "i"})
            return pa.table({nk: pa.array(_i64(t, key)), nv: pa.array(_i64(t, val))})

        return ds.map_batches(_f, batch_format="pyarrow")

    # degrees of the SRC endpoint (out + in), then of the DST endpoint
    j = hash_join(
        e, _rn(od, "s", "od", "k1", "od_s"), left_on="s", right_on="k1",
        num_partitions=num_partitions,
    )
    j = hash_join(
        j, _rn(idg, "d", "idg", "k2", "id_d"), left_on="d", right_on="k2",
        num_partitions=num_partitions,
    )
    j = hash_join(
        j, _rn(idg, "d", "idg", "k3", "id_s"), left_on="s", right_on="k3",
        num_partitions=num_partitions, how="left",
    )
    j = hash_join(
        j, _rn(od, "s", "od", "k4", "od_d"), left_on="d", right_on="k4",
        num_partitions=num_partitions, how="left",
    )

    COMBOS = [("out", "out"), ("out", "in"), ("in", "out"), ("in", "in")]

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "od_s" not in t.column_names:
            return pa.table(
                {"combo": pa.array([], pa.string()),
                 **{c: pa.array([], pa.int64())
                    for c in ("sx", "sy", "sxy", "sxx", "syy", "m")}}
            )
        n = t.num_rows
        side = {
            ("s", "out"): _f64(t, "od_s"),
            ("s", "in"): _f64(t, "id_s") if "id_s" in t.column_names else np.zeros(n),
            ("d", "out"): _f64(t, "od_d") if "od_d" in t.column_names else np.zeros(n),
            ("d", "in"): _f64(t, "id_d"),
        }
        combos, sx, sy, sxy, sxx, syy, m = [], [], [], [], [], [], []
        for cx, cy in COMBOS:
            x = np.nan_to_num(side[("s", cx)], nan=0.0).astype(np.int64)
            y = np.nan_to_num(side[("d", cy)], nan=0.0).astype(np.int64)
            combos.append(f"{cx}-{cy}")
            sx.append(int(x.sum())); sy.append(int(y.sum()))
            sxy.append(int((x * y).sum())); sxx.append(int((x * x).sum()))
            syy.append(int((y * y).sum())); m.append(n)
        return pa.table(
            {"combo": pa.array(combos), "sx": pa.array(sx, pa.int64()),
             "sy": pa.array(sy, pa.int64()), "sxy": pa.array(sxy, pa.int64()),
             "sxx": pa.array(sxx, pa.int64()), "syy": pa.array(syy, pa.int64()),
             "m": pa.array(m, pa.int64())}
        )

    parts = j.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = []
    for cx, cy in COMBOS:
        key = f"{cx}-{cy}"
        p = parts[parts["combo"] == key]
        m = int(p["m"].sum())
        if m == 0:
            out.append((cx, cy, 0.0, 0))
            continue
        sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
        sxy, sxx, syy = int(p["sxy"].sum()), int(p["sxx"].sum()), int(p["syy"].sum())
        den = np.sqrt(float(m * sxx - sx * sx)) * np.sqrt(float(m * syy - sy * sy))
        r = float(m * sxy - sx * sy) / den if den > 0 else 0.0
        out.append((cx, cy, round(r, 8), m))
    return pd.DataFrame(out, columns=["x_deg", "y_deg", "r", "n_edges"])


def degree_histogram(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Degree distribution of the undirected simple graph (networkx
    ``degree_histogram`` restricted to non-isolated vertices): rows
    (degree, n_vertices).  One degree exchange + one tiny count exchange —
    the result is ≤max_degree rows regardless of graph size."""
    ce = _undirected_simple(edges, src_col, dst_col, num_partitions)

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"oid": pa.array([], pa.int64())})
        return pa.table(
            {"oid": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
        )

    deg = hash_groupby_sum(
        ce.map_batches(_ends, batch_format="pyarrow"),
        ["oid"],
        None,
        "d",
        num_partitions=num_partitions,
    )

    def _d(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d" not in t.column_names:
            return pa.table({"degree": pa.array([], pa.int64())})
        return pa.table({"degree": t["d"]})

    return hash_groupby_sum(
        deg.map_batches(_d, batch_format="pyarrow"),
        ["degree"],
        None,
        "n_vertices",
        num_partitions=num_partitions,
    )


def degree_gini(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> dict:
    """Gini coefficient of the undirected simple degree distribution —
    the skew statistic behind this engine's hub-splitting design knob:
    G = 2·Σᵢ i·d₍ᵢ₎ / (n·Σd) − (n+1)/n over degrees sorted ascending
    (rank sums over equal degrees are order-invariant, so ties need no
    rule).  Distributed rank via the range-partitioned ``zip_with_index``
    sort; per-block integer partials Σ(i+1)·dᵢ / Σd / n fold to three
    driver scalars — exact until the one final division (round 8)."""
    from graphscope_ray.utils import zip_with_index

    ce = _undirected_simple(edges, src_col, dst_col, num_partitions)

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"oid": pa.array([], pa.int64())})
        return pa.table(
            {"oid": pa.concat_arrays([t["u"].combine_chunks(), t["v"].combine_chunks()])}
        )

    deg = hash_groupby_sum(
        ce.map_batches(_ends, batch_format="pyarrow"),
        ["oid"],
        None,
        "d",
        num_partitions=num_partitions,
    )
    ranked = zip_with_index(deg, "d", index_col="__i")

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d" not in t.column_names:
            return _typed_empty(wd="i", sd="i", n="i")
        d = _i64(t, "d")
        i = _i64(t, "__i") + 1
        return pa.table(
            {"wd": pa.array([int((i * d).sum())], pa.int64()),
             "sd": pa.array([int(d.sum())], pa.int64()),
             "n": pa.array([len(d)], pa.int64())}
        )

    parts = ranked.map_batches(_partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    if n == 0:
        return {"gini": 0.0, "n_vertices": 0}
    wd = int(parts["wd"].sum())
    sd = int(parts["sd"].sum())
    g = (2.0 * wd) / (n * sd) - (n + 1.0) / n if sd else 0.0
    return {"gini": round(g, 8), "n_vertices": n}


def disparity_filter(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Disparity-filter backbone scores (Serrano, Boguñá & Vespignani,
    PNAS 2009) for a weighted directed graph: for each edge,
    α_uv = (1 − w_uv/s_u)^(k_u−1) with s_u = Σ out-weights and k_u =
    out-degree of u — the p-value that the edge's weight share arises from
    a uniform split; small α marks the multiscale backbone.  Rows
    (src, dst, weight, alpha); k_u = 1 edges get α = 1 (never
    significant, the paper's convention).  Emitting the score instead of
    thresholding keeps the result knife-edge-free for bit-exact oracles;
    callers filter ``alpha < α₀`` downstream.

    Dataflow: ONE (src → k, s) hash exchange joined back to the edges —
    the per-edge math is a stateless vectorized map."""

    def _ks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {
                    "k_src": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "s": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "k_src": t[src_col],
                "k": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "s": t[weight_col].cast(pa.int64()),
            }
        )

    ks = hash_groupby_sum(
        edges.map_batches(_ks, batch_format="pyarrow"),
        ["k_src"],
        ["k", "s"],
        ["k", "s"],
        num_partitions=num_partitions,
    )
    j = hash_join(edges, ks, left_on=src_col, right_on="k_src", num_partitions=num_partitions)

    def _alpha(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return _typed_empty(src="i", dst="i", weight="i", alpha="f")
        w = _f64(t, weight_col)
        s = _f64(t, "s")
        k = _i64(t, "k")
        a = np.where(k > 1, (1.0 - w / s) ** np.maximum(k - 1, 1), 1.0)
        return pa.table(
            {
                "src": pa.array(_i64(t, src_col)),
                "dst": pa.array(_i64(t, dst_col)),
                "weight": pa.array(_i64(t, weight_col)),
                "alpha": pa.array(np.round(a, 8)),
            }
        )

    return j.map_batches(_alpha, batch_format="pyarrow")


def salsa(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """SALSA link analysis (Lempel & Moran 2000 — the stochastic HITS
    variant used for web link graphs), fixed-iteration form: starting from
    uniform hubs, alternate

        auth_k(i) = Σ_{j→i} hub_{k-1}(j) / outdeg(j)   then L1-normalize,
        hub_k(j)  = Σ_{j→i} auth_k(i) / indeg(i)        then L1-normalize.

    Rows (oid, auth, hub) for every endpoint vertex, round 8 — the same
    normalize-per-step contract as the engine's HITS program, but with the
    degree-stochastic transition SALSA defines.

    Dataflow (mirrors simrank's Dataset iteration): out/in-degrees attach
    to the arc table ONCE (two hash joins before the loop); each iteration
    is one score join + one dst-key sum exchange per direction, and the
    driver folds only the two L1 scalars per iteration — message volume
    per round is O(E) like a PageRank superstep, no broadcast."""
    e = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns([src_col, dst_col])

    def _ren(ds, key_col, val_col, nk, nv):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or key_col not in t.column_names:
                return _typed_empty(**{nk: "i", nv: "f"})
            return pa.table({nk: pa.array(_i64(t, key_col)), nv: t[val_col]})

        return ds.map_batches(_f, batch_format="pyarrow")

    od = hash_groupby_sum(e, [src_col], None, "od", num_partitions=num_partitions)
    idg = hash_groupby_sum(e, [dst_col], None, "idg", num_partitions=num_partitions)
    e1 = hash_join(
        e, _ren(od, src_col, "od", "k_od", "od"), left_on=src_col, right_on="k_od",
        num_partitions=num_partitions,
    ).materialize()
    e2 = hash_join(
        e, _ren(idg, dst_col, "idg", "k_id", "idg"), left_on=dst_col, right_on="k_id",
        num_partitions=num_partitions,
    ).materialize()

    def _verts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return _typed_empty(oid="i")
        return pa.table(
            {"oid": pa.array(np.concatenate([_i64(t, src_col), _i64(t, dst_col)]))}
        )

    verts = hash_groupby_sum(
        e.map_batches(_verts, batch_format="pyarrow"),
        ["oid"],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns(["oid"]).materialize()
    n = verts.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "oid": pa.array([], pa.int64()),
                    "auth": pa.array([], pa.float64()),
                    "hub": pa.array([], pa.float64()),
                }
            )
        )

    def _init(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _typed_empty(oid="i", val="f")
        return pa.table(
            {"oid": pa.array(_i64(t, "oid")), "val": pa.array(np.full(t.num_rows, 1.0 / n))}
        )

    def _l1(scores: ray.data.Dataset) -> float:
        def _p(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "s" not in t.column_names:
                return _typed_empty(t="f")
            return pa.table({"t": pa.array([float(_f64(t, "s").sum())])})

        parts = scores.map_batches(_p, batch_format="pyarrow").to_pandas()
        return float(parts["t"].sum()) if len(parts) else 0.0

    def _step(ej, score, t_prev, score_key, deg_col, group_key):
        """sum over arcs of (score/t_prev)/deg → grouped by group_key.
        Scores stay RAW between steps — the previous step's L1 scale
        divides lazily here with the identical float-op order
        (rv/t then /deg), so results are bit-identical to normalizing
        eagerly while saving one verts-join + map pass per half-iteration.
        Returns (raw_scores, their L1)."""
        j = hash_join(
            ej,
            _ren(score, "oid", "val", "k_s", "sv"),
            left_on=score_key,
            right_on="k_s",
            num_partitions=num_partitions,
        )

        def _msg(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "sv" not in t.column_names:
                return _typed_empty(oid="i", m="f")
            sv = _f64(t, "sv")
            sv = sv / t_prev if t_prev != 0 else np.zeros(t.num_rows)
            return pa.table(
                {
                    "oid": pa.array(_i64(t, group_key)),
                    "m": pa.array(sv / _f64(t, deg_col)),
                }
            )

        raw = hash_groupby_sum(
            j.map_batches(_msg, batch_format="pyarrow"),
            ["oid"],
            "m",
            "s",
            num_partitions=num_partitions,
        ).materialize()
        return raw.map_batches(
            lambda t: pa.table({"oid": t["oid"], "val": t["s"]})
            if t.num_rows and "s" in t.column_names
            else _typed_empty(oid="i", val="f"),
            batch_format="pyarrow",
        ).materialize(), _l1(raw)

    def _final(raw, t):
        """Normalize raw scores over the FULL vertex set (missing → 0) —
        the eager per-step pass, now applied once at the end."""
        jj = hash_join(
            verts, _ren(raw, "oid", "val", "k_r", "rv"), left_on="oid",
            right_on="k_r", num_partitions=num_partitions, how="left",
        )

        def _norm(tb: pa.Table) -> pa.Table:
            if tb.num_rows == 0 or "oid" not in tb.column_names:
                return _typed_empty(oid="i", val="f")
            rv = _f64(tb, "rv") if "rv" in tb.column_names else np.zeros(tb.num_rows)
            rv = np.nan_to_num(rv, nan=0.0)
            v = rv / t if t != 0 else np.zeros(tb.num_rows)
            return pa.table({"oid": pa.array(_i64(tb, "oid")), "val": pa.array(v)})

        return jj.map_batches(_norm, batch_format="pyarrow").materialize()

    hub = verts.map_batches(_init, batch_format="pyarrow").materialize()
    t_hub = 1.0  # init values are already the normalized uniform vector
    auth, t_auth = None, 1.0
    for _ in range(iters):
        auth, t_auth = _step(e1, hub, t_hub, src_col, "od", dst_col)
        hub, t_hub = _step(e2, auth, t_auth, dst_col, "idg", src_col)

    auth = _final(auth, t_auth)
    hub = _final(hub, t_hub)

    aj = hash_join(
        _ren(auth, "oid", "val", "oid", "auth"),
        _ren(hub, "oid", "val", "k_h", "hub"),
        left_on="oid",
        right_on="k_h",
        num_partitions=num_partitions,
    )

    def _out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _typed_empty(oid="i", auth="f", hub="f")
        return pa.table(
            {
                "oid": pa.array(_i64(t, "oid")),
                "auth": pa.array(np.round(_f64(t, "auth"), 8)),
                "hub": pa.array(np.round(_f64(t, "hub"), 8)),
            }
        )

    return aj.map_batches(_out, batch_format="pyarrow")


def bipartite_projection(
    edges: ray.data.Dataset,
    via_col: str,
    onto_col: str,
    num_partitions: int = 16,
    max_fanout: int | None = None,
) -> ray.data.Dataset:
    """One-mode projection of a bipartite graph onto the ``onto_col`` side
    (networkx ``bipartite.weighted_projected_graph`` semantics): vertices u,
    v of the onto-side are connected iff they share ≥1 via-side neighbor;
    weight = number of distinct shared neighbors.  Rows (a, b, weight) with
    a < b, once per unordered pair.

    Dataflow: distinct (via, onto) exchange → one distributed self
    hash-join on the via key (wedge enumeration co-located per via vertex)
    → one pair-key hash-exchange count.  Wedge volume is Σ_via f(f−1)/2
    for via-fanout f, so a hot via vertex is quadratic: ``max_fanout``
    deterministically drops via vertices with fanout > cap (the same skew
    rule as minibatch.link_features' wedge-mid cap — document the cap with
    the result; the SQL oracle replicates it exactly via HAVING)."""
    bp = hash_groupby_sum(
        edges.select_columns([via_col, onto_col]),
        [via_col, onto_col],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns([via_col, onto_col])

    if max_fanout is not None:
        fan = hash_groupby_sum(
            bp.select_columns([via_col]), [via_col], None, "f", num_partitions=num_partitions
        )

        def _keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "f" not in t.column_names:
                return _typed_empty(via_ok="i")
            good = _i64(t, "f") <= max_fanout
            return pa.table({"via_ok": pa.array(_i64(t, via_col)[good])})

        ok = fan.map_batches(_keep, batch_format="pyarrow")
        bp = hash_join(
            bp, ok, left_on=via_col, right_on="via_ok", num_partitions=num_partitions
        ).select_columns([via_col, onto_col])

    def _rhs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or via_col not in t.column_names:
            return _typed_empty(via_r="i", onto_r="i")
        return pa.table({"via_r": t[via_col], "onto_r": t[onto_col]})

    rhs = bp.map_batches(_rhs, batch_format="pyarrow")
    j = hash_join(bp, rhs, left_on=via_col, right_on="via_r", num_partitions=num_partitions)

    def _pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or onto_col not in t.column_names:
            return _typed_empty(a="i", b="i")
        a, b = _i64(t, onto_col), _i64(t, "onto_r")
        keep = a < b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    return hash_groupby_sum(
        j.map_batches(_pairs, batch_format="pyarrow"),
        ["a", "b"],
        None,
        "weight",
        num_partitions=num_partitions,
    )


def reciprocity(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> dict:
    """Overall reciprocity of the directed simple graph (networkx
    ``overall_reciprocity``): the fraction of distinct directed arcs whose
    reverse arc also exists.  Self-loops are excluded (the repo's simple-
    graph canon — ``_undirected_simple`` drops them too).  Returns
    {"reciprocity", "n_reciprocated", "n_edges"} with exact integer counts.

    Dataflow: per-block the distinct arcs fold into canonical (min, max)
    pairs carrying a direction bit (1 = forward, 2 = backward); ONE
    hash-exchange groupby sums the bits, so a pair summing to 3 has both
    arcs.  Per-block partials then count arcs and reciprocated arcs —
    the driver folds scalars, never rows."""
    arcs = hash_groupby_sum(
        edges.select_columns([src_col, dst_col]),
        [src_col, dst_col],
        None,
        "__n",
        num_partitions=num_partitions,
    )

    def _canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                }
            )
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d)),
                "v": pa.array(np.maximum(s, d)),
                "b": pa.array(np.where(s < d, 1, 2).astype(np.int64)),
            }
        )

    pairs = hash_groupby_sum(
        arcs.map_batches(_canon, batch_format="pyarrow"),
        ["u", "v"],
        "b",
        "s",
        num_partitions=num_partitions,
    )

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s" not in t.column_names:
            return _typed_empty(ne="i", nr="i")
        s = _i64(t, "s")
        both = int((s == 3).sum())
        return pa.table(
            {"ne": pa.array([len(s) + both], pa.int64()),
             "nr": pa.array([2 * both], pa.int64())}
        )

    parts = pairs.map_batches(_partial, batch_format="pyarrow").to_pandas()
    ne = int(parts["ne"].sum()) if len(parts) else 0
    nr = int(parts["nr"].sum()) if len(parts) else 0
    return {
        "reciprocity": round(nr / ne, 8) if ne else 0.0,
        "n_reciprocated": nr,
        "n_edges": ne,
    }


def simrank(
    edges: ray.data.Dataset,
    c: float = 0.8,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """SimRank structural similarity (Jeh & Widom, KDD 2002) after a fixed
    number of iterations: s₀(a,b) = [a=b];
    s_{k+1}(a,b) = C/(|I(a)|·|I(b)|) · Σ_{u∈I(a), v∈I(b)} s_k(u,v) for a≠b
    (0 when either in-neighborhood is empty), s_{k+1}(a,a) = 1.

    Distributed as pair-space dataflow: the nonzero pair set (a, b, s) is a
    Dataset; each iteration is two hash joins fanning every pair out along
    both endpoints' OUT-edges (u→a ⇔ u ∈ I(a)), one hash-exchange groupby
    summing contributions per (a,b), and two joins attaching the in-degree
    normalizers — no driver state, each round materialized as the iteration
    barrier (bounded by the nonzero pair count, like the k-means model).
    Per-round tuple volume is Σ_{s_k(u,v)>0} od(u)·od(v): SimRank is
    inherently pair-quadratic in the worst case, so at 100-TB scale this
    operator targets bounded similarity universes (a projected subgraph or
    a truncated/thresholded pair set), not the full web graph.

    Returns the s_k > 0 off-diagonal pairs once per unordered pair
    (src_oid < dst_oid, simrank) — s is symmetric.
    """

    def _dedup(ds: ray.data.Dataset, a: str, b: str) -> ray.data.Dataset:
        return hash_groupby_sum(
            ds, [a, b], None, "__n", num_partitions=num_partitions
        ).select_columns([a, b])

    e = _dedup(edges.select_columns([src_col, dst_col]), src_col, dst_col)

    def _rename_edges(suffix: str):
        def _rn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or src_col not in t.column_names:
                return _typed_empty(**{f"es_{suffix}": "i", f"ed_{suffix}": "i"})
            return pa.table({f"es_{suffix}": t[src_col], f"ed_{suffix}": t[dst_col]})

        return _rn

    e1 = e.map_batches(_rename_edges("1"), batch_format="pyarrow").materialize()
    e2 = e.map_batches(_rename_edges("2"), batch_format="pyarrow").materialize()

    # in-degree normalizers, one copy per join side (collision-free names)
    def _indeg(side: str):
        def _rn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "oid" not in t.column_names:
                return _typed_empty(**{f"iv_{side}": "i", f"id_{side}": "i"})
            return pa.table({f"iv_{side}": t["oid"], f"id_{side}": t["d"]})

        return _rn

    ind = hash_groupby_sum(
        e.map_batches(
            lambda t: pa.table({"oid": t[dst_col]})
            if t.num_rows and dst_col in t.column_names
            else _typed_empty(oid="i"),
            batch_format="pyarrow",
        ),
        ["oid"],
        None,
        "d",
        num_partitions=num_partitions,
    )
    inda = ind.map_batches(_indeg("a"), batch_format="pyarrow").materialize()
    indb = ind.map_batches(_indeg("b"), batch_format="pyarrow").materialize()

    def _verts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return _typed_empty(oid="i")
        return pa.table(
            {"oid": pa.array(np.concatenate([_i64(t, src_col), _i64(t, dst_col)]))}
        )

    verts = hash_groupby_sum(
        e.map_batches(_verts, batch_format="pyarrow"),
        ["oid"],
        None,
        "__n",
        num_partitions=num_partitions,
    ).select_columns(["oid"])

    def _diag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _typed_empty(a="i", b="i", s="f")
        o = _i64(t, "oid")
        return pa.table(
            {"a": pa.array(o), "b": pa.array(o), "s": pa.array(np.ones(len(o)))}
        )

    diag = verts.map_batches(_diag, batch_format="pyarrow").materialize()
    pairs = diag

    def _proj_fan1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ed_1" not in t.column_names:
            return _typed_empty(a="i", b="i", s="f")
        # fan pair (u, v, s) out along u's out-edges: new left endpoint
        return pa.table({"a": t["ed_1"], "b": t["b"], "s": t["s"]})

    def _proj_fan2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ed_2" not in t.column_names:
            return _typed_empty(a="i", b="i", s="f")
        a, b = _i64(t, "a"), _i64(t, "ed_2")
        s = _f64(t, "s")
        keep = a != b
        return pa.table(
            {"a": pa.array(a[keep]), "b": pa.array(b[keep]), "s": pa.array(s[keep])}
        )

    def _scale(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id_a" not in t.column_names:
            return _typed_empty(a="i", b="i", s="f")
        s = c * _f64(t, "t") / (_f64(t, "id_a") * _f64(t, "id_b"))
        return pa.table({"a": t["a"], "b": t["b"], "s": pa.array(s)})

    for _ in range(iters):
        j = hash_join(pairs, e1, left_on="a", right_on="es_1", num_partitions=num_partitions)
        j = j.map_batches(_proj_fan1, batch_format="pyarrow")
        j = hash_join(j, e2, left_on="b", right_on="es_2", num_partitions=num_partitions)
        j = j.map_batches(_proj_fan2, batch_format="pyarrow")
        t = hash_groupby_sum(j, ["a", "b"], "s", "t", num_partitions=num_partitions)
        t = hash_join(t, inda, left_on="a", right_on="iv_a", num_partitions=num_partitions)
        t = hash_join(t, indb, left_on="b", right_on="iv_b", num_partitions=num_partitions)
        off = t.map_batches(_scale, batch_format="pyarrow")
        pairs = diag.union(off).materialize()

    def _out(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return _typed_empty(src_oid="i", dst_oid="i", simrank="f")
        a, b = _i64(t, "a"), _i64(t, "b")
        s = np.round(_f64(t, "s"), 8)
        keep = (a < b) & (s > 0)
        return pa.table(
            {"src_oid": pa.array(a[keep]), "dst_oid": pa.array(b[keep]),
             "simrank": pa.array(s[keep])}
        )

    return pairs.map_batches(_out, batch_format="pyarrow")


def cocitation_topk(
    edges: ray.data.Dataset, k: int = 5, cap: int = 16
) -> ray.data.Dataset:
    """Co-citation similarity (Small 1973 — "repos related because the same
    repos import both"): cocit(u, v) = number of common IN-neighbors w
    (w→u and w→v), counted over a DETERMINISTIC per-source fanout cap —
    each source contributes pairs among only its ``cap`` smallest
    out-neighbors, the hub guard that bounds the wedge blowup at
    Σ min(deg, cap)² instead of Σ deg² — followed by the top-k
    most-co-cited partners per vertex (ties → smaller id).

    Dataflow: per-block partial keep-cap-smallest-per-src (a valid
    combiner: the global cap smallest ⊆ union of per-block cap smallest) →
    one groupby-src exchange emitting each group's pairs vectorized →
    one pair-key count exchange → symmetric expand → per-block partial
    top-k per u → per-u merge.  Rows (u, v, cocit, rnk)."""

    def _cap_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            # Ray strips schemas off empty blocks; return typed empty.
            return _typed_empty(src="i", dst="i")
        src, dst = _i64(t, "src"), _i64(t, "dst")
        order, rank = _group_rank(src, dst)
        keep = order[rank < cap]
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    def _pairs(g: pa.Table) -> pa.Table:
        d = np.sort(np.unique(_i64(g, "dst")))[:cap]
        n = d.size
        if n < 2:
            return _typed_empty(u="i", v="i")
        iu, iv = np.triu_indices(n, 1)
        return pa.table({"u": pa.array(d[iu]), "v": pa.array(d[iv])})

    pairs = (
        edges.map_batches(_cap_partial, batch_format="pyarrow")
        .groupby("src")
        .map_groups(_pairs, batch_format="pyarrow")
    )
    counts = hash_groupby_sum(pairs, ["u", "v"], None, "cocit")

    def _sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("u", "v", "cocit")}
            )
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["cocit"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v])),
                "v": pa.array(np.concatenate([v, u])),
                "cocit": pa.array(np.concatenate([c, c]).astype(np.int64)),
            }
        )

    sym = counts.map_batches(_sym, batch_format="pyarrow")

    def _tk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return _typed_empty(u="i", v="i", cocit="i")
        u, v, c = _i64(t, "u"), _i64(t, "v"), _i64(t, "cocit")
        order, rank = _group_rank(u, v, -c)
        keep = order[rank < k]
        return pa.table(
            {"u": pa.array(u[keep]), "v": pa.array(v[keep]), "cocit": pa.array(c[keep])}
        )

    def _tk_merge(g: pa.Table) -> pa.Table:
        u, v, c = _i64(g, "u"), _i64(g, "v"), _i64(g, "cocit")
        take = np.lexsort((v, -c))[:k]
        return pa.table(
            {
                "u": pa.array(u[take]),
                "v": pa.array(v[take]),
                "cocit": pa.array(c[take]),
                "rnk": pa.array(np.arange(1, len(take) + 1, dtype=np.int64)),
            }
        )

    return (
        sym.map_batches(_tk_partial, batch_format="pyarrow")
        .groupby("u")
        .map_groups(_tk_merge, batch_format="pyarrow")
    )


def sweep_cut(
    scores: ray.data.Dataset, arcs: ray.data.Dataset, topk: int = 64
) -> pd.DataFrame:
    """Conductance sweep (the Andersen–Chung–Lang local-clustering step,
    FOCS'06 — public method): rank vertices by score/deg (ties → smaller
    oid), then for every prefix S_k of the top-``topk`` ranking report
    cut(S_k) (arcs leaving S_k), vol(S_k) (Σ deg) and conductance
    φ = cut / min(vol, vol(V) − vol); the best local community around the
    score's seed is the argmin-φ prefix.

    Scale shape: degrees via one hash-exchange count; ranking via per-block
    partial top-k + a K-row driver merge; cut/vol come from per-block
    DIFFERENCE-ARRAY partials — each arc block folds into a (K+1)-vector
    (+1 at rank(src), −1 at rank(dst) for in-DAG arcs), so the exchange is
    K-sized regardless of edge count; the K-row curve folds driver-side.
    ``scores`` rows (oid, score); ``arcs`` the DIRECTED arc multiset whose
    src-degree defines vol (pass both directions for undirected sweeps)."""
    import ray as _ray

    arcs = arcs.materialize()  # consumed three times (deg, events, count)
    deg = hash_groupby_sum(arcs, ["src"], None, "d", num_partitions=8)
    rt = hash_join(scores, deg, "oid", "src", num_partitions=8)

    def _ratio_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _typed_empty(oid="i", d="i", ratio="f")
        oid, d = _i64(t, "oid"), _i64(t, "d")
        ratio = np.round(_f64(t, "score"), 8) / d
        take = np.lexsort((oid, -ratio))[:topk]
        return pa.table(
            {"oid": pa.array(oid[take]), "d": pa.array(d[take]),
             "ratio": pa.array(ratio[take])}
        )

    ranked = (
        rt.map_batches(_ratio_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["ratio", "oid"], ascending=[False, True])
        .head(topk)
        .reset_index(drop=True)
    )
    K = len(ranked)
    oids = ranked["oid"].to_numpy().astype(np.int64)
    order = np.argsort(oids)
    ref = _ray.put((oids[order], (order + 1).astype(np.int64)))

    def _lookup(sorted_oids, ranks, x):
        if len(sorted_oids) == 0:
            return np.zeros(len(x), dtype=np.int64)
        idx = np.minimum(np.searchsorted(sorted_oids, x), len(sorted_oids) - 1)
        return np.where(sorted_oids[idx] == x, ranks[idx], 0)

    def _events(t: pa.Table) -> pa.Table:
        sorted_oids, ranks = _ray.get(ref)
        guard = pa.table(
            {"at": pa.array([], pa.int64()), "plus": pa.array([], pa.int64()),
             "minus": pa.array([], pa.int64())}
        )
        if t.num_rows == 0 or "src" not in t.column_names:
            return guard
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        rs = _lookup(sorted_oids, ranks, s)
        rd = _lookup(sorted_oids, ranks, d)
        plus = np.zeros(K + 2, dtype=np.int64)
        minus = np.zeros(K + 2, dtype=np.int64)
        m_plus = (rs > 0) & ((rd == 0) | (rs < rd))
        np.add.at(plus, rs[m_plus], 1)
        m_minus = (rs > 0) & (rd > 0) & (rs < rd)
        np.add.at(minus, rd[m_minus], 1)
        nz = np.flatnonzero(plus + minus)
        return pa.table(
            {"at": pa.array(nz.astype(np.int64)), "plus": pa.array(plus[nz]),
             "minus": pa.array(minus[nz])}
        )

    ev = arcs.map_batches(_events, batch_format="pyarrow").to_pandas()
    plus = np.zeros(K + 2, dtype=np.int64)
    minus = np.zeros(K + 2, dtype=np.int64)
    if len(ev):
        np.add.at(plus, ev["at"].to_numpy(), ev["plus"].to_numpy())
        np.add.at(minus, ev["at"].to_numpy(), ev["minus"].to_numpy())
    m_tot = arcs.count()
    cut = np.cumsum(plus - minus)[1 : K + 1]
    vol = np.cumsum(ranked["d"].to_numpy())
    den = np.minimum(vol, m_tot - vol)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = np.where(den > 0, np.round(cut / den, 8), 0.0)
    return pd.DataFrame(
        {
            "rnk": np.arange(1, K + 1, dtype=np.int64),
            "oid": ranked["oid"].to_numpy(),
            "cut": cut.astype(np.int64),
            "vol": vol.astype(np.int64),
            "phi": phi,
        }
    )


def adamic_adar_topk(
    edges: ray.data.Dataset, k: int = 5, cap: int = 16
) -> ray.data.Dataset:
    """Adamic–Adar related-items DISCOVERY (Liben-Nowell & Kleinberg 2003):
    aa(u, v) = Σ_{w→u, w→v} 1/ln(deg(w)) over shared in-neighbors w, with
    the same deterministic per-source fanout cap as
    :func:`cocitation_topk` (pairs drawn among each source's ``cap``
    smallest out-neighbors; the 1/ln uses w's FULL out-degree).  Weights
    are the EXACT integers of minibatch.aa_weight_int (round(1e12/ln d) —
    the SQL oracle embeds the same numpy table), so per-pair sums carry no
    float-order dependence.  Top-k partners per vertex, ties → smaller id;
    rows (u, v, aa, rnk)."""
    from graphscope_ray.graph.minibatch import aa_weight_int

    def _cap_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return _typed_empty(src="i", dst="i", cnt="i")
        src, dst = _i64(t, "src"), _i64(t, "dst")
        order, rank = _group_rank(src, dst)
        keep = order[rank < cap]
        mark_src, mark_cnt = np.unique(src, return_counts=True)
        return pa.table(
            {
                "src": pa.array(np.concatenate([src[keep], mark_src])),
                "dst": pa.array(
                    np.concatenate([dst[keep], np.full(len(mark_src), -1, np.int64)])
                ),
                "cnt": pa.array(
                    np.concatenate(
                        [np.zeros(len(keep), np.int64), mark_cnt.astype(np.int64)]
                    )
                ),
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        cnt, dst = _i64(g, "cnt"), _i64(g, "dst")
        full_deg = int(cnt.sum())
        d = np.sort(np.unique(dst[dst >= 0]))[:cap]
        n = d.size
        if n < 2 or full_deg < 2:
            return _typed_empty(u="i", v="i", w="i")
        w = int(aa_weight_int(full_deg))
        iu, iv = np.triu_indices(n, 1)
        return pa.table(
            {"u": pa.array(d[iu]), "v": pa.array(d[iv]),
             "w": pa.array(np.full(iu.size, w, dtype=np.int64))}
        )

    pairs = (
        edges.map_batches(_cap_partial, batch_format="pyarrow")
        .groupby("src")
        .map_groups(_pairs, batch_format="pyarrow")
    )
    counts = hash_groupby_sum(pairs, ["u", "v"], "w", "aa")

    def _sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({c: pa.array([], pa.int64()) for c in ("u", "v", "aa")})
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        c = t["aa"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v])),
                "v": pa.array(np.concatenate([v, u])),
                "aa": pa.array(np.concatenate([c, c]).astype(np.int64)),
            }
        )

    sym = counts.map_batches(_sym, batch_format="pyarrow")

    def _tk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return _typed_empty(u="i", v="i", aa="i")
        u, v, c = _i64(t, "u"), _i64(t, "v"), _i64(t, "aa")
        order, rank = _group_rank(u, v, -c)
        keep = order[rank < k]
        return pa.table(
            {"u": pa.array(u[keep]), "v": pa.array(v[keep]), "aa": pa.array(c[keep])}
        )

    def _tk_merge(g: pa.Table) -> pa.Table:
        u, v, c = _i64(g, "u"), _i64(g, "v"), _i64(g, "aa")
        take = np.lexsort((v, -c))[:k]
        return pa.table(
            {
                "u": pa.array(u[take]),
                "v": pa.array(v[take]),
                "aa": pa.array(c[take]),
                "rnk": pa.array(np.arange(1, len(take) + 1, dtype=np.int64)),
            }
        )

    return (
        sym.map_batches(_tk_partial, batch_format="pyarrow")
        .groupby("u")
        .map_groups(_tk_merge, batch_format="pyarrow")
    )


def edge_embeddedness(
    edges: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Edge embeddedness (Granovetter's tie strength — the number of
    common neighbors of an edge's endpoints in the undirected simple
    graph) and the derived LOCAL-BRIDGE flag (embeddedness 0: removing the
    edge puts its endpoints ≥ 3 hops apart).  ``edges`` must be the
    canonical undirected set (src < dst, dedup).

    Dataflow = one round of the k-truss support computation
    (algorithms.ktruss step 1-3): degree-ordered orientation (two degree
    joins), wedge join, per-edge support count; edges in no triangle LEFT-
    join a 0.  Rows (src, dst, support, local_bridge)."""

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or not set(cols.values()).issubset(t.column_names):
                return pa.table({o: pa.array([], pa.int64()) for o in cols})
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    e = edges.select_columns(["src", "dst"]).materialize()
    ue = e.map_batches(
        lambda t: pa.table(
            {
                "tv": pa.array(
                    np.concatenate(
                        [
                            t["src"].to_numpy(zero_copy_only=False),
                            t["dst"].to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        )
        if t.num_rows
        else pa.table({"tv": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    deg = hash_groupby_sum(ue, ["tv"], None, "d", num_partitions=num_partitions)
    j1 = hash_join(e, deg, "src", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "da": "d"}), batch_format="pyarrow"
    )
    j2 = hash_join(j1, deg, "dst", "tv", num_partitions=num_partitions)

    def _orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = t["da"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        fwd = (da < db) | ((da == db) & (s < d))
        return pa.table(
            {"a": pa.array(np.where(fwd, s, d)), "b": pa.array(np.where(fwd, d, s))}
        )

    oe = j2.map_batches(_orient, batch_format="pyarrow").materialize()
    w = hash_join(
        oe,
        oe.map_batches(_proj({"b2": "a", "c": "b"}), batch_format="pyarrow"),
        "b",
        "b2",
        num_partitions=num_partitions,
    )

    def _pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({n: pa.array([], pa.int64()) for n in ("a", "b", "c", "ac")})
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "c": pa.array(c),
             "ac": pa.array((a << np.int64(32)) | c)}
        )

    w = w.map_batches(_pack, batch_format="pyarrow")
    ok = oe.map_batches(
        lambda t: pa.table(
            {"ac2": pa.array(
                (t["a"].to_numpy(zero_copy_only=False).astype(np.int64) << np.int64(32))
                | t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            )}
        )
        if t.num_rows and "a" in t.column_names
        else pa.table({"ac2": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    tri = hash_join(w, ok, "ac", "ac2", num_partitions=num_partitions)

    def _edges3(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([np.minimum(a, b), np.minimum(b, c), np.minimum(a, c)])
        v = np.concatenate([np.maximum(a, b), np.maximum(b, c), np.maximum(a, c)])
        return pa.table({"src": pa.array(u), "dst": pa.array(v)})

    sup = hash_groupby_sum(
        tri.map_batches(_edges3, batch_format="pyarrow"),
        ["src", "dst"],
        None,
        "support",
        num_partitions=num_partitions,
    )

    def _skey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table({"k2": pa.array([], pa.int64()), "support": pa.array([], pa.int64())})
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k2": pa.array((s << np.int64(32)) | d), "support": t["support"]})

    def _ekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table(
                {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                 "k": pa.array([], pa.int64())}
            )
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"], "k": pa.array((s << np.int64(32)) | d)})

    out = hash_join(
        e.map_batches(_ekey, batch_format="pyarrow"),
        sup.map_batches(_skey, batch_format="pyarrow"),
        "k",
        "k2",
        how="left",
        num_partitions=num_partitions,
    )

    def _fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("src", "dst", "support", "local_bridge")}
            )
        sup_np = (
            t["support"].to_numpy(zero_copy_only=False).astype(np.float64)
            if "support" in t.column_names
            else np.zeros(t.num_rows)
        )
        sup_np = np.nan_to_num(sup_np, nan=0.0).astype(np.int64)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "support": pa.array(sup_np),
                "local_bridge": pa.array((sup_np == 0).astype(np.int64)),
            }
        )

    return out.map_batches(_fin, batch_format="pyarrow")


def edge_jaccard(
    edges: ray.data.Dataset, num_partitions: int = 8
) -> ray.data.Dataset:
    """Neighborhood Jaccard similarity per EXISTING edge:
    J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)\\{u,v}| = cn / (deg(u)+deg(v)−cn)
    over the undirected simple graph — the normalized form of
    :func:`edge_embeddedness` (tie-strength in [0, 1]).  Two extra degree
    joins on the support table; the division is a single float op so the
    SQL oracle is digit-identical at 8dp.  Rows (src, dst, support, du,
    dv, jaccard)."""
    emb = edge_embeddedness(edges, num_partitions=num_partitions).materialize()
    ue = edges.select_columns(["src", "dst"]).map_batches(
        lambda t: pa.table(
            {
                "tv": pa.array(
                    np.concatenate(
                        [
                            t["src"].to_numpy(zero_copy_only=False),
                            t["dst"].to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        )
        if t.num_rows
        else pa.table({"tv": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    )
    deg = hash_groupby_sum(ue, ["tv"], None, "d", num_partitions=num_partitions)

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or not set(cols.values()).issubset(t.column_names):
                return pa.table({o: pa.array([], pa.int64()) for o in cols})
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    j1 = hash_join(emb, deg, "src", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "support": "support", "du": "d"}),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, deg, "dst", "tv", num_partitions=num_partitions)

    def _fin(t: pa.Table) -> pa.Table:
        cols = ("src", "dst", "support", "du", "dv", "jaccard")
        if t.num_rows == 0 or "support" not in t.column_names:
            out = {c: pa.array([], pa.int64()) for c in cols[:5]}
            out["jaccard"] = pa.array([], pa.float64())
            return pa.table(out)
        cn = t["support"].to_numpy(zero_copy_only=False).astype(np.int64)
        du = t["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        den = du + dv - cn
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(den > 0, np.round(cn / den, 8), 0.0)
        return pa.table(
            {
                "src": t["src"],
                "dst": t["dst"],
                "support": pa.array(cn),
                "du": pa.array(du),
                "dv": pa.array(dv),
                "jaccard": pa.array(j),
            }
        )

    return j2.map_batches(_fin, batch_format="pyarrow")
