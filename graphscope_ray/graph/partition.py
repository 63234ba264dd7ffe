"""Locality/degree-aware edge partitioning — the answer to the measured
×1.61 superstep boundary-growth bound (BASELINE.md "boundary-growth
bound": for a HASH-partitioned uniform-random graph the pre-combined
message volume grows P·V·(1−e^(−E/(P·V))) entries per round, ×1.61 at
8→32 partitions on the bench graph).

Reference semantics: the reference exposes pluggable vertex partitioners
(``analytical_engine/core/utils/partitioner.h:43-90`` — HashPartitioner
``hash(oid)%fnum`` vs SegmentedPartitioner contiguous ranges); this module
adds the third kind a web link graph actually wants: a **neighbor-affinity
partitioner** in the streaming-partitioning family (Stanton & Kliot
KDD'12 LDG; Tsourakakis et al. WSDM'14 Fennel — public methods), computed
distributed as a few label-propagation rounds with hard per-partition
capacity, then realized as a vid RELABELING so the existing cyclic
fragment layout (owner(vid) = vid % P, local = vid // P) carries it with
ZERO changes to the fragment/message machinery:

    vid′(v) = rank_of_v_within_its_partition · P + partition(v)

The relabeled graph is bit-compatible with every algorithm (same
vertex/edge multiset, different ids); per-oid outputs are decoded through
the (oid → vid′) mapping exactly like the perfect-hash encode path.

Everything here is Datasets + the repo's explicit hash exchanges — no
driver-side vertex state beyond P-sized load vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.functions.sampling import hash_u64
from graphscope_ray.utils import hash_groupby_sum, hash_join, zip_with_index


def _i64(t: pa.Table, c: str) -> np.ndarray:
    return t[c].to_numpy(zero_copy_only=False).astype(np.int64)


def _empty(**cols) -> pa.Table:
    return pa.table({k: pa.array([], pa.int64()) for k in cols})


def _arcs_both(edges: ray.data.Dataset, src_col: str, dst_col: str) -> ray.data.Dataset:
    """Symmetrized (v, n) neighbor arcs with multiplicity (affinity weight =
    #edges to the neighbor, both directions)."""

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src_col not in t.column_names:
            return _empty(v=1, n=1)
        s, d = _i64(t, src_col), _i64(t, dst_col)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {"v": pa.array(np.concatenate([s, d])), "n": pa.array(np.concatenate([d, s]))}
        )

    return edges.map_batches(_f, batch_format="pyarrow")


def _loads(owner: ray.data.Dataset, P: int, K: int) -> np.ndarray:
    """P-sized partition-size vector (the only driver state)."""
    df = hash_groupby_sum(
        owner.select_columns(["part"]), ["part"], None, "n", num_partitions=min(K, 8)
    ).to_pandas()
    out = np.zeros(P, dtype=np.int64)
    if len(df):
        out[df["part"].to_numpy(np.int64)] = df["n"].to_numpy(np.int64)
    return out


def cyclic_targets(N: int, P: int) -> np.ndarray:
    """Exact per-partition sizes of the cyclic layout: |{v < N : v%P == p}|.
    The final assignment must hit these exactly so the relabeled graph has
    no hole vertices (a hole would be a phantom dangling vertex and change
    PageRank's N)."""
    base = np.full(P, N // P, dtype=np.int64)
    base[: N % P] += 1
    return base


def affinity_assignment(
    edges: ray.data.Dataset,
    N: int,
    P: int,
    rounds: int = 3,
    slack: float = 0.05,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions_exchange: int = 32,
    init: str = "hash",
) -> ray.data.Dataset:
    """(oid, part) for every vid in [0, N) — neighbor-affinity label
    propagation with hard capacity, then an exact-balance spill pass so the
    sizes equal :func:`cyclic_targets` precisely.

    Per round (all hash exchanges, deterministic):
    1. join current owners onto the symmetrized arcs; count (v, neighbor's
       partition) pairs — v's affinity histogram;
    2. per-v argmax via one packed-max groupby (ties → smaller partition);
    3. a vertex proposes to move iff the best partition strictly beats its
       CURRENT partition's count; movers are admitted per target partition
       in (gain desc, oid asc) order up to the capacity slack — admission
       is one groupby over the movers, bounded by the P-sized load vector.

    ``init="hash"`` starts from the uniform spread (the engine's default
    owner); ``init="segmented"`` starts from the reference's
    SegmentedPartitioner contiguous ranges (partitioner.h:56-90) — the
    right opening move when vertex ids carry locality (crawl order, the
    rank-encode of lexicographically close repo names), which LP then
    refines.  Isolated vertices (no arcs) keep their initial assignment."""
    K = num_partitions_exchange
    arcs = _arcs_both(edges, src_col, dst_col).materialize()

    if init not in ("hash", "segmented"):
        raise ValueError(init)

    def _init(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, part=1)
        o = _i64(t, "oid")
        if init == "segmented":
            p0 = np.minimum(o * P // max(N, 1), P - 1)
        else:
            p0 = (hash_u64(o) % np.uint64(P)).astype(np.int64)
        return pa.table({"oid": pa.array(o), "part": pa.array(p0.astype(np.int64))})

    universe = ray.data.range(N).map_batches(
        lambda t: pa.table({"oid": t["id"]}), batch_format="pyarrow"
    )
    owner = universe.map_batches(_init, batch_format="pyarrow").materialize()
    cap = int(np.ceil(N / P * (1.0 + slack)))

    for r in range(max(0, rounds)):
        owner, moved = _affinity_round(owner, arcs, P, cap, K, r)
        if moved == 0:
            break
    return _exact_balance(owner, arcs, N, P, K)


def _affinity_round(owner, arcs, P, cap, K, rnd: int = 0):
    nb = hash_join(
        arcs,
        owner.map_batches(
            lambda t: pa.table({"k_n": t["oid"], "np_": t["part"]})
            if t.num_rows and "oid" in t.column_names else _empty(k_n=1, np_=1),
            batch_format="pyarrow",
        ),
        "n", "k_n", num_partitions=K,
    )
    cnt = hash_groupby_sum(
        nb.map_batches(
            lambda t: pa.table({"v": t["v"], "p": t["np_"]})
            if t.num_rows and "np_" in t.column_names else _empty(v=1, p=1),
            batch_format="pyarrow",
        ),
        ["v", "p"], None, "c", num_partitions=K,
    ).materialize()

    # per-v argmax: pack = c·P + (P−1−p); max ⇒ largest count, ties smallest p
    def _pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return _empty(v=1, pk=1)
        return pa.table(
            {"v": t["v"], "pk": pa.array(_i64(t, "c") * P + (P - 1 - _i64(t, "p")))}
        )

    best = hash_groupby_sum(
        cnt.map_batches(_pack, batch_format="pyarrow"),
        ["v"], "pk", "pkmax", num_partitions=K, agg="max",
    )
    # current-partition count: key (v·P + p) equi-join against cnt
    curkey = owner.map_batches(
        lambda t: pa.table({"oid": t["oid"], "part": t["part"],
                            "ck": pa.array(_i64(t, "oid") * P + _i64(t, "part"))})
        if t.num_rows and "oid" in t.column_names else _empty(oid=1, part=1, ck=1),
        batch_format="pyarrow",
    )
    cntkey = cnt.map_batches(
        lambda t: pa.table({"ck2": pa.array(_i64(t, "v") * P + _i64(t, "p")),
                            "ccur": t["c"]})
        if t.num_rows and "c" in t.column_names else _empty(ck2=1, ccur=1),
        batch_format="pyarrow",
    )
    j = hash_join(curkey, cntkey, "ck", "ck2", num_partitions=K, how="left")
    j = hash_join(
        j,
        best.map_batches(
            lambda t: pa.table({"k_b": t["v"], "pkmax": t["pkmax"]})
            if t.num_rows and "pkmax" in t.column_names else _empty(k_b=1, pkmax=1),
            batch_format="pyarrow",
        ),
        "oid", "k_b", num_partitions=K, how="left",
    )

    def _movers(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, cur=1, tgt=1, gain=1)
        o, curp = _i64(t, "oid"), _i64(t, "part")
        pk = (t["pkmax"].to_numpy(zero_copy_only=False).astype(np.float64)
              if "pkmax" in t.column_names else np.full(t.num_rows, np.nan))
        cc = (t["ccur"].to_numpy(zero_copy_only=False).astype(np.float64)
              if "ccur" in t.column_names else np.full(t.num_rows, np.nan))
        has = ~np.isnan(pk)
        pki = np.nan_to_num(pk, nan=0.0).astype(np.int64)
        bestp = (P - 1) - (pki % P)
        bestc = pki // P
        ccur = np.nan_to_num(cc, nan=0.0).astype(np.int64)
        # deterministic half-moves damping (two-coloring) from round 1 on:
        # round 0 moves freely (fast coarse snowball), later rounds move
        # only ~half the vertices so symmetric neighbors stop chasing each
        # other across partitions
        if rnd == 0:
            eligible = np.ones(len(o), dtype=bool)
        else:
            eligible = (hash_u64(o, salt=1000 + rnd) & np.uint64(1)) == 0
        mv = has & (bestp != curp) & (bestc > ccur) & eligible
        return pa.table(
            {"oid": pa.array(o[mv]), "cur": pa.array(curp[mv]),
             "tgt": pa.array(bestp[mv]), "gain": pa.array((bestc - ccur)[mv])}
        )

    movers = j.map_batches(_movers, batch_format="pyarrow").materialize()
    n_movers = movers.count()
    if n_movers == 0:
        return owner, 0
    loads = _loads(owner, P, K)
    # room includes each partition's own departures: every proposer leaves
    # its partition independent of where others land, so counting outflow
    # lets communities snowball into one partition instead of being choked
    # at (cap − load) ≈ slack.  Mid-stream over-admission (a leaver whose
    # own move was rejected) is bounded by outflow and repaired by the
    # exact-balance pass.
    outflow = _loads(
        movers.map_batches(
            lambda t: pa.table({"part": t["cur"]})
            if t.num_rows and "cur" in t.column_names else _empty(part=1),
            batch_format="pyarrow",
        ),
        P, K,
    )
    room = {p: max(0, cap - int(loads[p]) + int(outflow[p])) for p in range(P)}

    def _admit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "tgt" not in g.column_names:
            return _empty(oid=1, newp=1)
        tgt = int(g["tgt"][0].as_py())
        k = room.get(tgt, 0)
        if k <= 0:
            return _empty(oid=1, newp=1)
        o, gain = _i64(g, "oid"), _i64(g, "gain")
        take = np.lexsort((o, -gain))[:k]
        return pa.table(
            {"oid": pa.array(o[take]),
             "newp": pa.array(np.full(len(take), tgt, dtype=np.int64))}
        )

    # map_groups emits pandas-backed blocks; normalize to arrow so later
    # exchanges/sorts see one block type
    accepted = movers.groupby("tgt").map_groups(
        _admit, batch_format="pyarrow"
    ).map_batches(lambda t: t, batch_format="pyarrow")
    upd = hash_join(
        owner,
        accepted.map_batches(
            lambda t: pa.table({"k_a": t["oid"], "newp": t["newp"]})
            if t.num_rows and "newp" in t.column_names else _empty(k_a=1, newp=1),
            batch_format="pyarrow",
        ),
        "oid", "k_a", num_partitions=K, how="left",
    )

    def _apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, part=1)
        o, p = _i64(t, "oid"), _i64(t, "part")
        npv = (t["newp"].to_numpy(zero_copy_only=False).astype(np.float64)
               if "newp" in t.column_names else np.full(t.num_rows, np.nan))
        has = ~np.isnan(npv)
        out = np.where(has, np.nan_to_num(npv, nan=0.0).astype(np.int64), p)
        return pa.table({"oid": pa.array(o), "part": pa.array(out)})

    new_owner = upd.map_batches(_apply, batch_format="pyarrow").materialize()
    return new_owner, n_movers


def _exact_balance(owner, arcs, N, P, K):
    """Force sizes to exactly :func:`cyclic_targets`: overfull partitions
    spill their LEAST-attached vertices (own-partition affinity asc, oid
    asc); the spill set is ranked distributed and dealt into the deficits
    in cumulative order (P-sized boundary vector on the driver)."""
    targets = cyclic_targets(N, P)
    loads = _loads(owner, P, K)
    over = {p: int(loads[p] - targets[p]) for p in range(P) if loads[p] > targets[p]}
    if not over:
        return owner
    # own-partition attachment
    nb = hash_join(
        arcs,
        owner.map_batches(
            lambda t: pa.table({"k_n": t["oid"], "np_": t["part"]})
            if t.num_rows and "oid" in t.column_names else _empty(k_n=1, np_=1),
            batch_format="pyarrow",
        ),
        "n", "k_n", num_partitions=K,
    )
    ownc = hash_groupby_sum(
        nb.map_batches(
            lambda t: pa.table({"v": t["v"], "p": t["np_"]})
            if t.num_rows and "np_" in t.column_names else _empty(v=1, p=1),
            batch_format="pyarrow",
        ),
        ["v", "p"], None, "c", num_partitions=K,
    ).map_batches(
        lambda t: pa.table({"ok2": pa.array(_i64(t, "v") * P + _i64(t, "p")),
                            "own": t["c"]})
        if t.num_rows and "c" in t.column_names else _empty(ok2=1, own=1),
        batch_format="pyarrow",
    )
    withown = hash_join(
        owner.map_batches(
            lambda t: pa.table({"oid": t["oid"], "part": t["part"],
                                "ok": pa.array(_i64(t, "oid") * P + _i64(t, "part"))})
            if t.num_rows and "oid" in t.column_names else _empty(oid=1, part=1, ok=1),
            batch_format="pyarrow",
        ),
        ownc, "ok", "ok2", num_partitions=K, how="left",
    )

    def _spill_candidates(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "part" not in g.column_names:
            return _empty(oid=1, frm=1)
        p = int(g["part"][0].as_py())
        k = over.get(p, 0)
        if k <= 0:
            return _empty(oid=1, frm=1)
        o = _i64(g, "oid")
        own = (g["own"].to_numpy(zero_copy_only=False).astype(np.float64)
               if "own" in g.column_names else np.zeros(g.num_rows))
        own = np.nan_to_num(own, nan=0.0).astype(np.int64)
        take = np.lexsort((o, own))[:k]
        return pa.table({"oid": pa.array(o[take]),
                         "frm": pa.array(np.full(len(take), p, dtype=np.int64))})

    spill = withown.groupby("part").map_groups(
        _spill_candidates, batch_format="pyarrow"
    ).map_batches(lambda t: t, batch_format="pyarrow").materialize()
    deficits = np.maximum(targets - loads, 0)
    # undo: spilled counts return to their sources; recompute deficits after
    # removal: partition p ends at loads[p] - over.get(p,0); deficit vs target
    ends = loads - np.array([over.get(p, 0) for p in range(P)], dtype=np.int64)
    deficits = np.maximum(targets - ends, 0)
    bounds = np.concatenate([[0], np.cumsum(deficits)])
    ranked = zip_with_index(spill, "oid", index_col="__r")

    def _deal(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, part=1)
        r = _i64(t, "__r")
        tgt = np.searchsorted(bounds, r, side="right") - 1
        return pa.table({"oid": t["oid"], "part": pa.array(tgt.astype(np.int64))})

    dealt = ranked.map_batches(_deal, batch_format="pyarrow")
    merged = hash_join(
        owner,
        dealt.map_batches(
            lambda t: pa.table({"k_d": t["oid"], "dp": t["part"]})
            if t.num_rows and "part" in t.column_names else _empty(k_d=1, dp=1),
            batch_format="pyarrow",
        ),
        "oid", "k_d", num_partitions=K, how="left",
    )

    def _apply(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, part=1)
        o, p = _i64(t, "oid"), _i64(t, "part")
        dp = (t["dp"].to_numpy(zero_copy_only=False).astype(np.float64)
              if "dp" in t.column_names else np.full(t.num_rows, np.nan))
        has = ~np.isnan(dp)
        out = np.where(has, np.nan_to_num(dp, nan=0.0).astype(np.int64), p)
        return pa.table({"oid": pa.array(o), "part": pa.array(out)})

    return merged.map_batches(_apply, batch_format="pyarrow").materialize()


def locality_mapping(assignment: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """(oid, vid) realizing the assignment under the cyclic layout:
    vid = rank_within_partition · P + part.  Requires the assignment's
    sizes to equal :func:`cyclic_targets` (what affinity_assignment
    guarantees) — then vids are a bijection on [0, N)."""
    ranked = zip_with_index(assignment, ["part", "oid"], index_col="__i").materialize()
    sizes = hash_groupby_sum(
        ranked.select_columns(["part"]), ["part"], None, "n", num_partitions=8
    ).to_pandas().sort_values("part")
    P_seen = sizes["part"].to_numpy(np.int64)
    counts = np.zeros(P, dtype=np.int64)
    counts[P_seen] = sizes["n"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def _vid(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "oid" not in t.column_names:
            return _empty(oid=1, vid=1)
        p, i = _i64(t, "part"), _i64(t, "__i")
        vid = (i - offsets[p]) * P + p
        return pa.table({"oid": t["oid"], "vid": pa.array(vid)})

    return ranked.map_batches(_vid, batch_format="pyarrow")


def relabel_edges(
    edges: ray.data.Dataset,
    mapping: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions_exchange: int = 32,
) -> ray.data.Dataset:
    """Apply (oid → vid) to both endpoints via two hash-join exchanges
    (nothing broadcast — the >100M-vertex path)."""
    K = num_partitions_exchange

    def _fix(frm, to, drop):
        def _f(t: pa.Table) -> pa.Table:
            t = t.drop_columns([c for c in drop if c in t.column_names])
            return t.rename_columns([to if c == frm else c for c in t.column_names])

        return _f

    m1 = mapping.map_batches(
        lambda t: pa.table({"k1": t["oid"], "nsrc": t["vid"]})
        if t.num_rows and "oid" in t.column_names else _empty(k1=1, nsrc=1),
        batch_format="pyarrow",
    )
    m2 = mapping.map_batches(
        lambda t: pa.table({"k2": t["oid"], "ndst": t["vid"]})
        if t.num_rows and "oid" in t.column_names else _empty(k2=1, ndst=1),
        batch_format="pyarrow",
    )
    e = hash_join(edges, m1, src_col, "k1", num_partitions=K)
    e = e.map_batches(_fix("nsrc", "src", [src_col, "k1"]), batch_format="pyarrow")
    e = hash_join(e, m2, dst_col, "k2", num_partitions=K)
    return e.map_batches(_fix("ndst", "dst", [dst_col, "k2"]), batch_format="pyarrow")


def boundary_message_entries(
    edges: ray.data.Dataset,
    P: int,
    mapping: ray.data.Dataset | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions_exchange: int = 32,
) -> dict:
    """The north-rule scale tax, measured: per-superstep pre-combined
    message entries = |distinct (owner(src), dst)| over cross-partition
    arcs (each sender partition emits one combined message per distinct
    boundary dst per round).  ``mapping=None`` → the hash baseline
    owner(v) = v % P; with a locality mapping the owners come from the
    relabeled vids.  Returns {"entries", "cross_arcs", "arcs"}."""
    e = edges.select_columns([src_col, dst_col])
    if mapping is not None:
        e = relabel_edges(e, mapping, src_col, dst_col, num_partitions_exchange)
        src_col = dst_col = None  # relabeled to src/dst

    def _pairs(t: pa.Table) -> pa.Table:
        sc = src_col or "src"
        dc = dst_col or "dst"
        if t.num_rows == 0 or sc not in t.column_names:
            return _empty(ps=1, dst=1, cross=1)
        s, d = _i64(t, sc), _i64(t, dc)
        ps, pd_ = s % P, d % P
        return pa.table(
            {"ps": pa.array(ps), "dst": pa.array(d),
             "cross": pa.array((ps != pd_).astype(np.int64))}
        )

    pairs = e.map_batches(_pairs, batch_format="pyarrow")
    agg = hash_groupby_sum(
        pairs, ["ps", "dst"], "cross", "ncross", num_partitions=num_partitions_exchange
    ).materialize()
    total_pairs = agg.count()

    def _stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ncross" not in t.column_names:
            return _empty(entries=1, arcs=1)
        nc = _i64(t, "ncross")
        return pa.table(
            {"entries": pa.array([int((nc > 0).sum())], pa.int64()),
             "arcs": pa.array([int(nc.sum())], pa.int64())}
        )

    st = agg.map_batches(_stats, batch_format="pyarrow").to_pandas()
    return {
        "entries": int(st["entries"].sum()) if len(st) else 0,
        "cross_arcs": int(st["arcs"].sum()) if len(st) else 0,
        "distinct_sender_dst_pairs": int(total_pairs),
    }


def build_graph_locality(
    edges: ray.data.Dataset,
    *,
    num_partitions: int = 8,
    num_vertices: int | None = None,
    rounds: int = 3,
    slack: float = 0.05,
    init: str = "hash",
    **kwargs,
):
    """``build_graph`` behind the affinity partitioner: compute the
    assignment, relabel, build on the cyclic layout.  The returned graph's
    ``vertices_ds`` maps ORIGINAL vid (column ``oid``) → relabeled ``vid``,
    so exports decode exactly like the perfect-hash encode path.  Results
    are the same graph up to vertex relabeling — algorithm outputs per
    original id match hash partitioning bit-for-bit after decode (asserted
    in tests/test_partition.py)."""
    from graphscope_ray.graph.build import build_graph

    # hub_threshold composes: hub-vertex SPLIT handles the head of the
    # degree distribution on the relabeled graph while the affinity
    # assignment handles the tail (parity asserted in
    # tests/test_partition.py::test_affinity_composes_with_hub_split)
    edges = edges.materialize()
    if num_vertices is None:
        mx = edges.max(["src", "dst"])
        num_vertices = int(max(mx["max(src)"], mx["max(dst)"])) + 1 if mx else 0
    P = max(1, num_partitions)
    assignment = affinity_assignment(
        edges, num_vertices, P, rounds=rounds, slack=slack, init=init
    )
    mapping = locality_mapping(assignment, P).materialize()
    relabeled = relabel_edges(edges, mapping)
    g = build_graph(relabeled, num_partitions=P, num_vertices=num_vertices, **kwargs)
    g.vertices_ds = mapping
    return g
