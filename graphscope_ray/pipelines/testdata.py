"""Pipelines over the driver-provided testdata tables (TESTDATA.md).

The link graph ``lg`` is derived deterministically from ``lineitem``:
``src = l_orderkey % LG_MOD, dst = l_partkey % LG_MOD``, self-loops dropped,
distinct — a dense directed graph with cycles/triangles whose derivation is
equally expressible in the DuckDB oracle SQL (pipelines/oracle_sql.py).
Vertex ids (oids) are already ints; dense vids = rank of oid (order
preserving), so min-vid component labels == min-oid labels.

Graphs are cached per (sf_dir, view): the FragmentActor pools persist across
queries in one session, like the reference keeps fragments in the object
manager between RUN_APP calls (grape_instance.cc:314-347).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import Graph, build_graph, build_graph_from_oids

LG_MOD = 1000

_GRAPH_CACHE: dict = {}


def read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    """read_parquet with the pandas metadata stripped from the schema —
    pyarrow schemas WITH metadata are unhashable, which made Ray Data's
    block-schema dedup warn on every read (VERDICT r1 log-spam item)."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=schema)


# ---------------------------------------------------------------------------
# link-graph derivation


def lg_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct (src, dst) with src = l_orderkey % MOD, dst = l_partkey % MOD."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {"src": pa.array(src[keep].astype(np.int64)), "dst": pa.array(dst[keep].astype(np.int64))}
        )

    from graphscope_ray.utils import hash_groupby_sum

    # distinct via the explicit hash exchange (same plan as lg_edges_weighted):
    # Ray's sort-based groupby is overhead-bound here (VERDICT r3 #5)
    pairs = li.map_batches(_derive, batch_format="pyarrow")
    return hash_groupby_sum(pairs, ["src", "dst"], None, "__n", num_partitions=8).select_columns(
        ["src", "dst"]
    )


def lg_graphar_roundtrip(sf_dir: str, order: str = "src") -> pd.DataFrame:
    """ARCHIVE_GRAPH parity (ref dag_utils.py:1085-1114): archive the link
    graph in the open GraphAr-style layout, re-read the chunked archive with
    the external reader, decode vids back to oids positionally — the result
    must equal lg_edges exactly (same oracle).  ``order`` selects the
    adjacency orientation read back (ordered_by_source / the
    ordered_by_dest mirror — both carry the identical edge set)."""
    import shutil
    import tempfile

    from graphscope_ray.sources import graphar

    g = lg_graph(sf_dir)
    path = tempfile.mkdtemp(prefix="graphar_", dir="/tmp")
    try:
        graphar.save_graphar(g, path, vertex_chunk_size=256)
        edges = graphar.read_graphar_edges(path, order=order).to_pandas()
        verts = graphar.read_graphar_vertices(path).to_pandas()
        m = verts.set_index("vid")["oid"]
        out = pd.DataFrame(
            {
                "src": edges["src"].map(m).astype(np.int64),
                "dst": edges["dst"].map(m).astype(np.int64),
            }
        )
        return out.sort_values(["src", "dst"]).reset_index(drop=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def dyn_mutations(sf_dir: str) -> pd.DataFrame:
    """Dynamic-graph mutation pipeline (nx MODIFY/CLEAR surface, ref
    dag_utils.py:359-412): bulk-load the link-graph edges into a mutable
    DynamicGraph, delete every vertex with oid % 7 == 3 (incident edges go
    with it, across partitions), add 100 synthetic edges (i, (2i+1) % MOD),
    delete the first 50 of them again, and return the surviving edge set —
    a pure set-algebra trace the SQL oracle replays exactly."""
    from graphscope_ray.graph.dynamic import DynamicGraph

    dg = DynamicGraph(num_partitions=4, directed=True)
    dg.add_edges_dataset(lg_edges(sf_dir))
    dg.del_nodes([i for i in range(LG_MOD) if i % 7 == 3])
    dg.add_edges([(i, (i * 2 + 1) % LG_MOD) for i in range(100)])
    dg.del_edges([(i, (i * 2 + 1) % LG_MOD) for i in range(50)])
    out = dg.edges_dataset().to_pandas()[["src", "dst"]].astype(np.int64)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def dyn_view_undirected(sf_dir: str) -> pd.DataFrame:
    """VIEW_GRAPH parity (ref dag_utils.py:639-663): undirected view of the
    mutable link graph — each edge reported once as (min, max) endpoint
    pair, exactly DISTINCT (least, greatest) over the directed edge set."""
    from graphscope_ray.graph.dynamic import DynamicGraph

    dg = DynamicGraph(num_partitions=4, directed=True)
    dg.add_edges_dataset(lg_edges(sf_dir))
    ud = dg.view("undirected")
    out = ud.edges_dataset().to_pandas()[["src", "dst"]].astype(np.int64)
    lo = out[["src", "dst"]].min(axis=1)
    hi = out[["src", "dst"]].max(axis=1)
    out = pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_edges_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted edge table: weight = number of lineitem rows mapping to the
    pair (the repo-graph analogue: number of importing files per edge)."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {"src": pa.array(src[keep].astype(np.int64)), "dst": pa.array(dst[keep].astype(np.int64))}
        )

    from graphscope_ray.utils import hash_groupby_sum

    pairs = li.map_batches(_derive, batch_format="pyarrow")
    out = hash_groupby_sum(pairs, ["src", "dst"], None, "weight", num_partitions=8).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_graph(sf_dir: str, num_partitions: int = 4, **_ignored) -> Graph:
    """ONE directed graph with in-edges per sf_dir — all algorithms run on it
    (wcc/cdlp via out+in pushes, triangles/kcore via the local undirected
    merge), like the reference reuses one loaded fragment across apps."""
    key = (sf_dir, num_partitions)
    if key not in _GRAPH_CACHE:
        li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

        def _derive(t: pa.Table) -> pa.Table:
            src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
            dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
            keep = src != dst
            return pa.table(
                {
                    "src_oid": pa.array(src[keep].astype(np.int64)),
                    "dst_oid": pa.array(dst[keep].astype(np.int64)),
                }
            )

        # no global distinct: duplicates are deduped locally in the fragments
        edges = li.map_batches(_derive, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph_from_oids(
            edges,
            num_partitions=num_partitions,
            view="directed",
            store_in_edges=True,
            dedup_edges=True,
        )
    return _GRAPH_CACHE[key]


def _oid_space(g: Graph, ds: ray.data.Dataset, cols: list[str]) -> pd.DataFrame:
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    return df[["oid"] + cols].sort_values("oid").reset_index(drop=True)


def lg_vertices(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    return g.vertices_ds.to_pandas().sort_values("oid").reset_index(drop=True)


def lg_degree(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    out = _oid_space(g, g.degrees(), ["out_deg"])
    return out


def lg_pagerank_fixed(sf_dir: str, rounds: int = 15, alpha: float = 0.85) -> pd.DataFrame:
    """Exactly `rounds` PageRank iterations (tol=0) — the oracle-matched form."""
    g = lg_graph(sf_dir)
    ds, _ = alg.pagerank(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_pagerank_locality(sf_dir: str, rounds: int = 15, alpha: float = 0.85) -> pd.DataFrame:
    """PageRank on the LOCALITY-partitioned build — the round-5 affinity
    partitioner (graph/partition.py, ref partitioner.h:43-90) routed through
    ``build_graph_from_oids(partitioner="affinity")``.  Decoded to oid space
    it must match the hash-partitioned ``lg_pagerank`` SQL oracle exactly:
    the driver-gated parity proof that the relabeled layout computes the
    identical fixpoint."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src_oid": pa.array(src[keep].astype(np.int64)),
                "dst_oid": pa.array(dst[keep].astype(np.int64)),
            }
        )

    edges = li.map_batches(_derive, batch_format="pyarrow")
    g = build_graph_from_oids(
        edges,
        num_partitions=4,
        view="directed",
        store_in_edges=True,
        dedup_edges=True,
        partitioner="affinity",
        partitioner_rounds=2,
    )
    ds, _ = alg.pagerank(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_pagerank_converged(sf_dir: str, tol: float = 1e-6) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.pagerank(g, tol=tol)
    out = _oid_space(g, ds, ["score"])
    # The oracle (oracle_sql.py lg_pagerank_converged_sql) emits round(score, 8);
    # the driver gate hashes RAW values, so the engine must round identically.
    out["score"] = out["score"].round(8)
    return out


def lg_pagerank_weighted(sf_dir: str, rounds: int = 15, alpha: float = 0.85) -> pd.DataFrame:
    """Weight-proportional PageRank over the multiplicity-weighted lg graph
    (networkx pagerank(weight=...) semantics), fixed rounds for the SQL
    oracle."""
    g = lg_graph_weighted(sf_dir)
    ds, _ = alg.pagerank_weighted(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    out = ds.to_pandas()[["vid", "score"]].rename(columns={"vid": "oid"})
    out["score"] = out["score"].round(8)
    return out.sort_values("oid").reset_index(drop=True)


def lg_pagerank_push(sf_dir: str, rounds: int = 15) -> pd.DataFrame:
    """Push/delta PageRank (programs.PageRankPush — the registry's
    ``pagerank_push`` execution-strategy variant): residual propagation,
    p after k rounds = exact Neumann partial sum.  Own unrolled-push SQL
    oracle (oracle_sql.lg_pagerank_push_sql)."""
    g = lg_graph(sf_dir)
    ds, _ = alg.pagerank_push(g, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_ppr(sf_dir: str, source: int = 0, rounds: int = 10) -> pd.DataFrame:
    """FLASH personalized PageRank (apps/flash/ranking/ppr.h): α=0.5 teleport
    to the source, undirected pushes, deg = out+in, fixed rounds."""
    g = lg_graph(sf_dir)
    ds, _ = alg.ppr(g, source=source, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_ppr_seeds(sf_dir: str, n_seeds: int = 4, rounds: int = 10) -> pd.DataFrame:
    """Seed-SET personalized PageRank from the n_seeds smallest-oid
    vertices (teleport mass split uniformly — community-seed expansion)."""
    g = lg_graph(sf_dir)
    seeds = list(range(min(n_seeds, g.N)))
    ds, _ = alg.ppr_seeds(g, seeds=seeds, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_articlerank(sf_dir: str, damping: float = 0.85, rounds: int = 10) -> pd.DataFrame:
    """FLASH ArticleRank (apps/flash/ranking/articlerank.h): like PageRank but
    contributions divide by (outdeg + avg_outdeg); val' = next + 1 − d."""
    g = lg_graph(sf_dir)
    ds, _ = alg.articlerank(g, damping=damping, max_rounds=rounds)
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


def lg_wcc(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.wcc(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    # component label vid → oid (order-preserving encoding)
    df = df.merge(vmap.rename(columns={"vid": "comp", "oid": "comp_oid"}), on="comp")
    return df[["oid", "comp_oid"]].sort_values("oid").reset_index(drop=True)


def lg_wcc_locality(sf_dir: str) -> pd.DataFrame:
    """WCC on the LOCALITY-partitioned build (round-5 affinity partitioner
    through build_graph_from_oids) — component labels come out in relabeled
    vid space, so canonicalize to min ORIGINAL oid per component; must then
    match the hash build's lg_wcc SQL oracle exactly."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src_oid": pa.array(src[keep].astype(np.int64)),
                "dst_oid": pa.array(dst[keep].astype(np.int64)),
            }
        )

    edges = li.map_batches(_derive, batch_format="pyarrow")
    g = build_graph_from_oids(
        edges,
        num_partitions=4,
        view="directed",
        store_in_edges=True,
        dedup_edges=True,
        partitioner="affinity",
        partitioner_rounds=2,
    )
    ds, _ = alg.wcc(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    # canonical relabeling: component label = min original oid in component
    df["comp_oid"] = df.groupby("comp")["oid"].transform("min")
    return df[["oid", "comp_oid"]].sort_values("oid").reset_index(drop=True)


def _lg_graph_variant(sf_dir: str, **build_kw) -> Graph:
    """The lg edge derivation with non-default build options (memory knobs
    etc.) — uncached, unlike lg_graph."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src_oid": pa.array(src[keep].astype(np.int64)),
                "dst_oid": pa.array(dst[keep].astype(np.int64)),
            }
        )

    return build_graph_from_oids(
        li.map_batches(_derive, batch_format="pyarrow"),
        num_partitions=4,
        view="directed",
        store_in_edges=True,
        dedup_edges=True,
        **build_kw,
    )


def _canon_wcc(g: Graph) -> pd.DataFrame:
    """WCC with component labels canonicalized to min-oid (vid-order
    independent — valid for any vertex-map bijection)."""
    ds, _ = alg.wcc(g)
    df = ds.to_pandas().merge(g.vertices_ds.to_pandas(), on="vid")
    df["comp_oid"] = df.groupby("comp")["oid"].transform("min").astype(np.int64)
    return df[["oid", "comp_oid"]].sort_values("oid").reset_index(drop=True)


def lg_wcc_phash(sf_dir: str) -> pd.DataFrame:
    """WCC on the perfect-hash vertex map (the reference's
    ``use_perfect_hash`` loader knob, graph_builder.py:62): vids are the
    BBHash MPHF's arbitrary bijection instead of oid rank order, so the
    min-vid component labels are canonicalized to min-oid through the
    decoded vertex map — the result must equal lg_wcc exactly."""
    return _canon_wcc(_lg_graph_variant(sf_dir, use_perfect_hash=True))


def lg_wcc_compact(sf_dir: str) -> pd.DataFrame:
    """WCC on varint+delta compact adjacency (the reference's
    ``compact_edges`` memory option, arrow_projected_fragment.h:727-735):
    fragments decode the blob per superstep; result must equal lg_wcc."""
    return _canon_wcc(_lg_graph_variant(sf_dir, compact=True))


def lg_cdlp(sf_dir: str, rounds: int = 10) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.cdlp(g, max_rounds=rounds)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    df = df.merge(vmap.rename(columns={"vid": "label", "oid": "label_oid"}), on="label")
    return df[["oid", "label_oid"]].sort_values("oid").reset_index(drop=True)


def lg_triangles(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    _, pv = alg.triangles(g)
    return _oid_space(g, pv.select_columns(["vid", "tri"]), ["tri"])


def lg_triangle_total(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    total, _ = alg.triangles(g)
    return pd.DataFrame({"n_triangles": [total]})


def lg_lcc(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    out = _oid_space(g, alg.lcc(g), ["lcc"])
    out["lcc"] = out["lcc"].round(8)
    return out


def lg_bfs(sf_dir: str) -> pd.DataFrame:
    """Hop distance from the min-oid vertex (vid 0) along directed edges;
    only reached vertices."""
    g = lg_graph(sf_dir)
    ds, _ = alg.bfs(g, source=0)
    out = _oid_space(g, ds, ["depth"])
    return out[out.depth >= 0].reset_index(drop=True)


def lg_sssp(sf_dir: str) -> pd.DataFrame:
    """Same as lg_bfs but float distances (unit weights)."""
    g = lg_graph(sf_dir)
    ds, _ = alg.sssp(g, source=0)
    out = _oid_space(g, ds, ["dist"])
    out = out[np.isfinite(out.dist)].reset_index(drop=True)
    return out


def lg_hits_fixed(sf_dir: str, iters: int = 5) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.hits(g, tol=0.0, max_rounds=iters)
    out = _oid_space(g, ds, ["auth", "hub"])
    out["auth"] = out["auth"].round(8)
    out["hub"] = out["hub"].round(8)
    return out


def lg_kcore(sf_dir: str, k: int = 5) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.kcore(g, k=k)
    return _oid_space(g, ds, ["in_core"])


def lg_eigenvector_fixed(sf_dir: str, iters: int = 10) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.eigenvector_centrality(g, tol=0.0, max_rounds=iters)
    out = _oid_space(g, ds, ["centrality"])
    out["centrality"] = out["centrality"].round(8)
    return out


def lg_katz_fixed(sf_dir: str, iters: int = 8, a: float = 0.05) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    ds, _ = alg.katz_centrality(g, alpha=a, tol=0.0, max_rounds=iters)
    out = _oid_space(g, ds, ["centrality"])
    out["centrality"] = out["centrality"].round(8)
    return out


def lg_undirected_edge_count(sf_dir: str) -> pd.DataFrame:
    """TO_UNDIRECTED parity: distinct symmetrized edge count (from the
    actor-local undirected merge)."""
    import ray as _ray

    g = lg_graph(sf_dir)
    # Σ local adjacency sizes counts each undirected pair once per endpoint —
    # exactly the row count of the symmetrized-distinct edge table the SQL
    # oracle builds (the graph has no self-loops by derivation).
    counts = _ray.get([a.num_undirected_edges.remote() for a in g.actors])
    return pd.DataFrame({"n_undirected_edges": [int(sum(counts))]})


def _lg_ue(sf_dir: str) -> ray.data.Dataset:
    """Undirected distinct edge rows (both directions) — the SQL `ue` CTE."""
    e = lg_edges(sf_dir)
    rev = e.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}), batch_format="pyarrow"
    )
    return e.union(rev).groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def _lg_udeg(sf_dir: str) -> np.ndarray:
    """Undirected degree per oid (dense, index = oid) from the fragments'
    locally-merged adjacency; broadcast-sized (one entry per vertex)."""
    import ray as _ray

    g = lg_graph(sf_dir)
    tables = _ray.get([a.tri_state_degrees.remote() for a in g.actors])
    deg = np.zeros(LG_MOD, dtype=np.int64)
    vmap = g.vertices_ds.to_pandas().sort_values("vid")
    oid_by_vid = vmap["oid"].to_numpy()
    for t in tables:
        vids = t["vid"].to_numpy()
        deg[oid_by_vid[vids]] = t["deg"].to_numpy()
    return deg


def lg_degree_centrality(sf_dir: str) -> pd.DataFrame:
    """Degree centrality = out_deg/(N-1) (apps/centrality/degree semantics)."""
    g = lg_graph(sf_dir)
    out = _oid_space(g, g.degrees(), ["out_deg"])
    out["centrality"] = (out["out_deg"] / (g.N - 1)).round(8)
    return out[["oid", "centrality"]]


def lg_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity = Pearson corr of (deg(src), deg(dst)) over the
    undirected edge rows (apps/assortativity semantics).  Streaming partial
    sums per batch against the broadcast degree table — no driver loop."""
    import ray as _ray

    deg = _lg_udeg(sf_dir)
    ref = _ray.put(deg)

    def _partials(t: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        x = d[t["src"].to_numpy(zero_copy_only=False)].astype(np.float64)
        y = d[t["dst"].to_numpy(zero_copy_only=False)].astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
            }
        )

    p = _lg_ue(sf_dir).map_batches(_partials, batch_format="pyarrow").to_pandas().sum()
    num = p.n * p.sxy - p.sx * p.sy
    den = np.sqrt((p.n * p.sxx - p.sx**2) * (p.n * p.syy - p.sy**2))
    r = num / den if den else 0.0
    return pd.DataFrame({"assortativity": [round(float(r), 8)]})


def lg_avg_degree_connectivity(sf_dir: str) -> pd.DataFrame:
    """knn(k): mean neighbor degree over edge rows grouped by source degree
    (apps/assortativity average_degree_connectivity semantics)."""
    import ray as _ray

    deg = _lg_udeg(sf_dir)
    ref = _ray.put(deg)

    def _partials(t: pa.Table) -> pa.Table:
        d = _ray.get(ref)
        k = d[t["src"].to_numpy(zero_copy_only=False)]
        dd = d[t["dst"].to_numpy(zero_copy_only=False)].astype(np.float64)
        df = pd.DataFrame({"k": k, "s": dd}).groupby("k").agg(s=("s", "sum"), c=("s", "size"))
        return pa.table(
            {
                "k": pa.array(df.index.to_numpy(np.int64)),
                "s": pa.array(df["s"].to_numpy()),
                "c": pa.array(df["c"].to_numpy(np.int64)),
            }
        )

    p = _lg_ue(sf_dir).map_batches(_partials, batch_format="pyarrow").to_pandas()
    agg = p.groupby("k", as_index=False).sum()
    agg["avg_conn"] = (agg["s"] / agg["c"]).round(8)
    return agg[["k", "avg_conn"]].sort_values("k").reset_index(drop=True)


def lg_node_boundary(sf_dir: str, s_max: int = 100) -> pd.DataFrame:
    """Node boundary of S = {oid < s_max}: successors of S outside S
    (apps/boundary semantics: semi-join edges against the S set)."""
    e = lg_edges(sf_dir)

    def _f(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = (src < s_max) & (dst >= s_max)
        return pa.table({"oid": pa.array(np.unique(dst[keep]))})

    out = e.map_batches(_f, batch_format="pyarrow").to_pandas().drop_duplicates()
    return out.sort_values("oid").reset_index(drop=True)


def lg_edge_boundary(sf_dir: str, s_max: int = 100) -> pd.DataFrame:
    e = lg_edges(sf_dir)

    def _f(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = (src < s_max) & (dst >= s_max)
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    return e.map_batches(_f, batch_format="pyarrow").to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)


def lg_transitivity(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    return pd.DataFrame({"transitivity": [round(alg.transitivity(g), 8)]})


def lg_avg_clustering(sf_dir: str) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    return pd.DataFrame({"avg_clustering": [round(alg.avg_clustering(g), 8)]})


def lg_kshell(sf_dir: str) -> pd.DataFrame:
    """K-shell decomposition (core number per vertex)."""
    g = lg_graph(sf_dir)
    return _oid_space(g, alg.kshell(g), ["shell"])


def lg_closeness_harmonic(sf_dir: str) -> pd.DataFrame:
    """EXACT harmonic closeness over all sources (chunked multi-source BFS)."""
    g = lg_graph(sf_dir)
    out = _oid_space(g, alg.closeness_exact(g, harmonic=True), ["closeness"])
    out["closeness"] = out["closeness"].round(8)
    return out


def lg_apsp(sf_dir: str, s_max: int = 32) -> pd.DataFrame:
    """All-pairs shortest path lengths from sources with oid < s_max
    (apps/apsp parity, restricted fan-out)."""
    g = lg_graph(sf_dir)
    vmap = g.vertices_ds.to_pandas()
    src_vids = vmap[vmap.oid < s_max].sort_values("oid")["vid"].tolist()
    ap = alg.apsp(g, sources=src_vids).to_pandas()
    oid_by_vid = vmap.sort_values("vid")["oid"].to_numpy()
    ap["src_oid"] = oid_by_vid[ap["src"].to_numpy()]
    ap["dst_oid"] = oid_by_vid[ap["dst"].to_numpy()]
    return (
        ap[["src_oid", "dst_oid", "dist"]]
        .sort_values(["src_oid", "dst_oid"])
        .reset_index(drop=True)
    )


def lg_dfs(sf_dir: str) -> pd.DataFrame:
    """DFS preorder from the min-oid vertex, ascending-vid neighbor order."""
    g = lg_graph(sf_dir)
    out = _oid_space(g, alg.dfs(g, source=0), ["order", "parent"])
    return out


def lg_louvain(sf_dir: str) -> pd.DataFrame:
    """Louvain communities (ref apps/pregel/louvain) — (oid, comm_oid,
    modularity is data-dependent → rows-only driver check + pytest oracle)."""
    g = lg_graph(sf_dir)
    ds, _q = alg.louvain(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    df = df.merge(vmap.rename(columns={"vid": "comm", "oid": "comm_oid"}), on="comm")
    return df[["oid", "comm_oid"]].sort_values("oid").reset_index(drop=True)


def lg_louvain_level1(sf_dir: str) -> pd.DataFrame:
    """ONE deterministic synchronous Louvain move round (all vertices
    active, ties → smallest community) — the driver-checkable Louvain entry
    with an exact SQL oracle (VERDICT r2 next-step #4); the full heuristic
    stays under pytest modularity oracles.  Returns (oid, comm_oid)."""
    g = lg_graph(sf_dir)
    ds = alg.louvain_level1(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    df = df.merge(vmap.rename(columns={"vid": "comm", "oid": "comm_oid"}), on="comm")
    return df[["oid", "comm_oid"]].sort_values("oid").reset_index(drop=True)


def lg_voterank(sf_dir: str, k: int = 10) -> pd.DataFrame:
    g = lg_graph(sf_dir)
    elected = alg.voterank(g, num_elected=k)
    vmap = g.vertices_ds.to_pandas().set_index("vid")["oid"]
    return pd.DataFrame(
        {"rank": np.arange(len(elected), dtype=np.int64), "oid": [int(vmap[v]) for v in elected]}
    )


def lg_betweenness(sf_dir: str, num_sources: int = 8) -> pd.DataFrame:
    """Brandes betweenness from the num_sources smallest-oid vertices
    (deterministic sources → SQL-oracle-able)."""
    g = lg_graph(sf_dir)
    srcs = list(range(min(num_sources, g.N)))  # vids are oid-rank-ordered
    out = _oid_space(g, alg.betweenness_sampled(g, sources=srcs), ["betweenness"])
    out["betweenness"] = out["betweenness"].round(8)
    return out


def lg_edge_betweenness(sf_dir: str, num_sources: int = 8) -> pd.DataFrame:
    """Per-edge Brandes betweenness from the num_sources smallest-oid
    sources (networkx edge_betweenness_centrality semantics, directed,
    unnormalized; deterministic sources → SQL-oracle-able).  Per-edge
    accumulation is fragment-local (programs.BrandesEdge)."""
    g = lg_graph(sf_dir)
    srcs = list(range(min(num_sources, g.N)))
    df = alg.edge_betweenness_sampled(g, sources=srcs).to_pandas()
    vmap = g.vertices_ds.to_pandas()
    df = df.merge(vmap.rename(columns={"vid": "src", "oid": "src_oid"}), on="src")
    df = df.merge(vmap.rename(columns={"vid": "dst", "oid": "dst_oid"}), on="dst")
    df["ebc"] = df["ebc"].round(8)
    out = df[["src_oid", "dst_oid", "ebc"]].rename(
        columns={"src_oid": "src", "dst_oid": "dst"}
    )
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_closeness(sf_dir: str, num_sources: int = 8) -> pd.DataFrame:
    """Harmonic closeness estimated from the num_sources smallest-oid
    sources (deterministic sources → SQL-oracle-able)."""
    g = lg_graph(sf_dir)
    srcs = list(range(min(num_sources, g.N)))
    out = _oid_space(g, alg.closeness_sampled(g, sources=srcs), ["closeness"])
    out["closeness"] = out["closeness"].round(8)
    return out


# ---------------------------------------------------------------------------
# relational / framework-op parity (PROJECT, ADD_COLUMN, sorts, distinct, …)


def op_filter_project(sf_dir: str) -> ray.data.Dataset:
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_extendedprice"])
    import pyarrow.compute as pc

    return li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 30.0)), batch_format="pyarrow"
    )


def op_groupby_agg(sf_dir: str) -> pd.DataFrame:
    li = read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_price"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(6)
    out["sum_price"] = out["sum_price"].round(4)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def op_sort_topk(sf_dir: str) -> pd.DataFrame:
    o = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return (
        o.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )


def op_join_addcolumn(sf_dir: str) -> ray.data.Dataset:
    """ADD_COLUMN analogue: broadcast-join orders with the (small) customer
    dimension to attach c_mktsegment."""
    import ray as _ray

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keys = cust["c_custkey"].to_numpy()
    order = np.argsort(keys)
    ref = _ray.put((keys[order], cust["c_mktsegment"].to_numpy()[order]))

    def _join(t: pa.Table) -> pa.Table:
        k_sorted, seg_sorted = _ray.get(ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k_sorted, ck)
        pos = np.minimum(pos, len(k_sorted) - 1)
        hit = k_sorted[pos] == ck
        seg = np.where(hit, seg_sorted[pos], None)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "c_mktsegment": pa.array(seg.tolist(), pa.string()),
            }
        )

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return orders.map_batches(_join, batch_format="pyarrow")


def op_distinct(sf_dir: str) -> pd.DataFrame:
    li = read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return (
        li.groupby(["l_returnflag", "l_linestatus"])
        .count()
        .select_columns(["l_returnflag", "l_linestatus"])
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def op_union_distinct(sf_dir: str) -> pd.DataFrame:
    c = read(sf_dir, "customer", columns=["c_nationkey"]).rename_columns(
        {"c_nationkey": "nationkey"}
    )
    s = read(sf_dir, "supplier", columns=["s_nationkey"]).rename_columns(
        {"s_nationkey": "nationkey"}
    )
    return (
        c.union(s)
        .groupby("nationkey")
        .count()
        .select_columns(["nationkey"])
        .to_pandas()
        .sort_values("nationkey")
        .reset_index(drop=True)
    )


def _partkey_presence(sf_dir: str, min_qty: float = 46.0) -> pd.DataFrame:
    """Shared kernel for op_intersect / op_except: per-block DISTINCT
    (p_partkey, in_p, in_l) presence partials from part and the
    qty-filtered lineitem, merged by ONE max-exchange
    (utils.hash_groupby_sum agg="max").  The wire carries at most one row
    per (block, key) — never row multiplicity — so the set ops at 100 TB
    cost a presence exchange, not a row shuffle (the same economics as the
    reference's distinct-based set algebra)."""
    import pyarrow.compute as pc

    from graphscope_ray.utils import hash_groupby_sum

    def _mark_part(t: pa.Table) -> pa.Table:
        k = np.unique(t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        ones = np.ones(len(k), dtype=np.int64)
        return pa.table(
            {"p_partkey": pa.array(k), "in_p": pa.array(ones), "in_l": pa.array(ones * 0)}
        )

    def _mark_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["l_quantity"], min_qty))
        k = np.unique(t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64))
        ones = np.ones(len(k), dtype=np.int64)
        return pa.table(
            {"p_partkey": pa.array(k), "in_p": pa.array(ones * 0), "in_l": pa.array(ones)}
        )

    p = read(sf_dir, "part", columns=["p_partkey"]).map_batches(
        _mark_part, batch_format="pyarrow"
    )
    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"]).map_batches(
        _mark_li, batch_format="pyarrow"
    )
    pres = hash_groupby_sum(
        p.union(li), ["p_partkey"], ["in_p", "in_l"], ["in_p", "in_l"],
        num_partitions=8, agg="max",
    )
    return pres.to_pandas()


def op_intersect(sf_dir: str) -> pd.DataFrame:
    """INTERSECT (distinct set semantics): part keys with at least one
    qty>=46 lineitem — presence exchange, no row shuffle."""
    pres = _partkey_presence(sf_dir)
    out = pres.loc[(pres["in_p"] == 1) & (pres["in_l"] == 1), ["p_partkey"]]
    return out.sort_values("p_partkey").reset_index(drop=True)


def op_except(sf_dir: str) -> pd.DataFrame:
    """EXCEPT (distinct set semantics): part keys with NO qty>=46 lineitem —
    same presence exchange as op_intersect."""
    pres = _partkey_presence(sf_dir)
    out = pres.loc[(pres["in_p"] == 1) & (pres["in_l"] == 0), ["p_partkey"]]
    return out.sort_values("p_partkey").reset_index(drop=True)


def op_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT / melt: wide part columns (p_size, p_retailprice) → long
    (p_partkey, attr, value) — a stateless per-block Arrow transform (k
    stacked column slices per block), zero exchange at any scale."""
    cols = ["p_size", "p_retailprice"]

    def _melt(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.concatenate(
            [t[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in cols]
        )
        attr = np.concatenate([np.full(len(k), c, dtype=object) for c in cols])
        return pa.table(
            {
                "p_partkey": pa.array(np.tile(k, len(cols))),
                "attr": pa.array(attr, pa.string()),
                "value": pa.array(vals),
            }
        )

    out = (
        read(sf_dir, "part", columns=["p_partkey"] + cols)
        .map_batches(_melt, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["p_partkey", "attr"]).reset_index(drop=True)


def text_winnow(sf_dir: str) -> pd.DataFrame:
    """MOSS winnowing fingerprints (k=5 char grams, window w=4) over the
    documents table — the local fingerprint scheme whose density (2/(w+1))
    bounds the exchange payload at corpus scale."""
    from graphscope_ray.functions.text import winnow_fingerprints

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = winnow_fingerprints(docs, k=5, w=4).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def lpa_u2i_suppliers(sf_dir: str, max_round: int = 8) -> pd.DataFrame:
    """Property-graph lpa_u2i (apps/lpa/lpa_u2i.h) over the supplier→part
    bipartite graph (one edge per lineitem row, multiplicity kept): users =
    suppliers with label_0 = min-max-normalized acctbal (exact 0/1 at the
    extremes become pinned seeds, as the reference's semi-supervised design
    intends) and label_1 = a deterministic fraction; items = parts."""
    sup = read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).to_pandas()
    sup = sup.sort_values("s_suppkey").reset_index(drop=True)
    n_users = int(sup["s_suppkey"].max()) + 1  # keys are 0-based in testdata
    li = read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])
    n_items = int(read(sf_dir, "part", columns=["p_partkey"]).max("p_partkey")) + 1

    def _edges(t: pa.Table) -> pa.Table:
        u = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(u), "dst": pa.array(i + n_users)})

    g = build_graph(
        li.map_batches(_edges, batch_format="pyarrow"),
        num_partitions=4,
        num_vertices=n_users + n_items,
        store_in_edges=True,
    )
    lo, hi = sup["s_acctbal"].min(), sup["s_acctbal"].max()
    lab = np.zeros((n_users, 2))
    keys = sup["s_suppkey"].to_numpy()
    lab[keys, 0] = (sup["s_acctbal"].to_numpy() - lo) / (hi - lo)
    lab[keys, 1] = ((keys * 37) % 100 + 0.5) / 101.0
    ds, _ = alg.lpa_u2i(g, lab, max_round=max_round)
    df = ds.to_pandas()
    df["s_suppkey"] = df["vid"]
    df = df[df["s_suppkey"].isin(sup["s_suppkey"])]
    out = df[["s_suppkey", "label_0", "label_1"]].sort_values("s_suppkey")
    out["label_0"] = out["label_0"].round(8)
    out["label_1"] = out["label_1"].round(8)
    return out.reset_index(drop=True)


def op_csv_scan(sf_dir: str) -> pd.DataFrame:
    """CSV source parity (loader.py CSVOptions): export the region dimension
    to a '|'-delimited CSV once, read it back through the CSV source with
    column projection, return the projected rows."""
    import os

    from graphscope_ray.sources.csv import read_csv_source

    path = f"/tmp/graft_csv/{os.path.basename(sf_dir)}_region.csv"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        df = read(sf_dir, "region").to_pandas()
        tmp = path + ".tmp"
        df.to_csv(tmp, sep="|", index=False)
        os.replace(tmp, path)
    ds = read_csv_source(path, delimiter="|", columns=["r_regionkey", "r_name"])
    return ds.to_pandas().sort_values("r_regionkey").reset_index(drop=True)


def op_jsonl_scan(sf_dir: str) -> pd.DataFrame:
    """JSONL source parity: export the documents table to newline-delimited
    JSON once (atomic, idempotent per sf), read it back through the JSONL
    source with projection, return the projected rows."""
    import os

    from graphscope_ray.sources.jsonl import read_jsonl_source

    path = f"/tmp/graft_jsonl/{os.path.basename(sf_dir)}_documents.jsonl"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        df = read(sf_dir, "documents").to_pandas()
        tmp = path + ".tmp"
        df.to_json(tmp, orient="records", lines=True)
        os.replace(tmp, path)
    ds = read_jsonl_source(path, columns=["doc_id", "lang", "n_chars"])
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def op_consolidate_columns(sf_dir: str) -> ray.data.Dataset:
    """CONSOLIDATE_COLUMNS parity: merge two numeric columns into one list col
    (exported stringified for oracle comparability)."""
    p = read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def _c(t: pa.Table) -> pa.Table:
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.float64)
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        lst = [f"[{a:.0f},{b:.2f}]" for a, b in zip(size, price)]
        return pa.table({"p_partkey": t["p_partkey"], "consolidated": pa.array(lst, pa.string())})

    return p.map_batches(_c, batch_format="pyarrow")


def lg_succs(sf_dir: str) -> pd.DataFrame:
    """REPORT_GRAPH SUCCS_BY_NODE (fragment_reporter.h:145-155): out-
    neighbors of the min-oid vertex via a single point RPC to its owner."""
    g = lg_graph(sf_dir)
    vmap = g.vertices_ds.to_pandas()
    vid = int(vmap.loc[vmap["oid"].idxmin(), "vid"])
    succ_vids = g.successors(vid)
    m = vmap.set_index("vid")["oid"]
    return pd.DataFrame({"succ": np.sort(m.loc[succ_vids].to_numpy())})


def lg_preds(sf_dir: str) -> pd.DataFrame:
    """REPORT_GRAPH PREDS_BY_NODE: in-neighbors of the min-oid vertex."""
    g = lg_graph(sf_dir)
    vmap = g.vertices_ds.to_pandas()
    vid = int(vmap.loc[vmap["oid"].idxmin(), "vid"])
    pred_vids = g.predecessors(vid)
    m = vmap.set_index("vid")["oid"]
    return pd.DataFrame({"pred": np.sort(m.loc[pred_vids].to_numpy())})


def lg_simple_paths(sf_dir: str, targets=(1, 2, 3), cutoff: int = 2) -> pd.DataFrame:
    """All simple paths from the min-oid vertex to ``targets`` with ≤ cutoff
    edges (apps/simple_path/all_simple_paths.h), padded to cutoff+1 columns
    with -1 like the reference writeToCtx (:174-196).  lg oids are dense and
    rank-encoded, so vid == oid."""
    g = lg_graph(sf_dir)
    vmap = g.vertices_ds.to_pandas()
    source = int(vmap["oid"].min())
    paths = alg.all_simple_paths(g, source, list(targets), cutoff=cutoff)
    rows = [p + [-1] * (cutoff + 1 - len(p)) for p in paths]
    cols = [f"p{i}" for i in range(cutoff + 1)]
    return (
        pd.DataFrame(rows, columns=cols, dtype=np.int64)
        .sort_values(cols)
        .reset_index(drop=True)
    )


def lg_is_simple_path(sf_dir: str) -> pd.DataFrame:
    """apps/simple_path/is_simple_path.h over two fixed candidate vid lists."""
    g = lg_graph(sf_dir)
    ok = int(alg.is_simple_path(g, [0, 1, 2]))
    bad = int(alg.is_simple_path(g, [0, 1, 0]))
    return pd.DataFrame({"path_012_ok": [ok], "path_010_ok": [bad]})


def lg_path_enum(sf_dir: str, length: int = 2, start_filter: int = 5) -> pd.DataFrame:
    """k-hop path enumeration by iterative hash joins
    (apps/sampling_path/sampling_path.h analogue, single-label)."""
    g = lg_graph(sf_dir)
    ds = alg.path_enumeration(g, length=length, start_filter=start_filter)
    cols = [f"v{i}" for i in range(length + 1)]
    return ds.to_pandas()[cols].sort_values(cols).reset_index(drop=True)


# ---------------------------------------------------------------------------
# property-graph (multi-label) apps: one union graph over labeled vid ranges


def _tripartite_pgraph(sf_dir: str):
    """The first-class multi-label property graph: 3 vertex labels
    (customer, order, part — keyed by their TPC-H keys, properties loaded
    per label) and 2 edge labels (places: customer→order, contains:
    order→part).  This is the reference's ArrowFragment data model
    (graph_schema.py:249-480) expressed as per-label lazy Datasets."""
    from graphscope_ray.graph.property import PropertyGraph

    return (
        PropertyGraph(directed=True)
        .add_vertices(
            read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]),
            "customer",
            vid_field="c_custkey",
        )
        .add_vertices(
            read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]),
            "order",
            vid_field="o_orderkey",
        )
        .add_vertices(
            read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"]),
            "part",
            vid_field="p_partkey",
        )
        .add_edges(
            read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"]),
            "places",
            src_label="customer",
            dst_label="order",
            src_field="o_custkey",
            dst_field="o_orderkey",
        )
        .add_edges(
            read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]),
            "contains",
            src_label="order",
            dst_label="part",
            src_field="l_orderkey",
            dst_field="l_partkey",
        )
    )


def _tripartite_graph(sf_dir: str, num_partitions: int = 4):
    """Flatten the labeled property graph to the union simple graph the
    property apps run on (apps/property/wcc_property.h iterates per-label
    vertex ranges of ONE fragment; flatten(encode='dense') reproduces the
    same per-label dense vid blocks, so absent keys are isolated vertices
    exactly like the reference's dense per-label vertex maps)."""
    key = (sf_dir, "tripartite", num_partitions)
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]
    pgraph = _tripartite_pgraph(sf_dir).project(
        vertices={"customer": [], "order": [], "part": []},
        edges={"places": [], "contains": []},
    )
    g, info = pgraph.flatten(
        encode="dense",
        num_partitions=num_partitions,
        store_in_edges=True,
        dedup_edges=True,
    )
    _GRAPH_CACHE[key] = (g, info)
    return _GRAPH_CACHE[key]


def pg_wcc(sf_dir: str) -> pd.DataFrame:
    """WCC over the labeled union graph (apps/property/wcc_property.h — same
    min-gid semantics per label range); comp = min global vid."""
    g, info = _tripartite_graph(sf_dir)
    ds, _ = alg.wcc(g)
    df = ds.to_pandas()
    # drop vids with no incident edges (padding keys absent from the tables
    # never appear in SQL); they are their own singleton components
    deg = g.degrees().to_pandas()
    active = deg[(deg["out_deg"] > 0) | (deg["in_deg"] > 0)]["vid"]
    df = df[df["vid"].isin(active)]
    out = info.split(df)[["v_label", "v_key", "comp"]]
    return out.sort_values(["v_label", "v_key"]).reset_index(drop=True)


def pg_sssp(sf_dir: str) -> pd.DataFrame:
    """Property SSSP (apps/property/sssp_property.h, unit weights) from
    customer 0 over the union graph; reached vertices only."""
    g, info = _tripartite_graph(sf_dir)
    ds, _ = alg.bfs(g, source=0)
    df = ds.to_pandas()
    df = df[df["depth"] >= 0]
    out = info.split(df)[["v_label", "v_key", "depth"]]
    return out.sort_values(["v_label", "v_key"]).reset_index(drop=True)


def pg_project_wcc(sf_dir: str) -> pd.DataFrame:
    """PROJECT_TO_SIMPLE on the labeled graph (ref graph.py:816-869 +
    grape_instance.cc:275-313): vertex label 'order' with a self-relating
    edge label 'next' (each customer's orders chained in o_orderkey order),
    projected to a simple graph — the label's WHOLE vertex table is the
    universe, so single-order customers survive as isolated vertices — and
    run through WCC.  Components are exactly 'orders of one customer';
    comp is reported in oid space (rank vids are order-preserving, so
    min-vid ≡ min-oid like lg_wcc)."""
    from graphscope_ray.graph.property import PropertyGraph

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def _chain(gdf: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(gdf["o_orderkey"].to_numpy())
        return pd.DataFrame({"src": k[:-1], "dst": k[1:]})

    chain = (
        orders.groupby("o_custkey")
        .map_groups(_chain, batch_format="pandas")
    )
    pgraph = (
        PropertyGraph(directed=True)
        .add_vertices(orders, "order", vid_field="o_orderkey", properties=["o_custkey"])
        .add_edges(chain, "next", src_label="order", dst_label="order")
    )
    sub = pgraph.project(vertices={"order": []}, edges={"next": []})
    g = sub.project_to_simple(num_partitions=4, store_in_edges=True)
    ds, _ = alg.wcc(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    m = vmap.set_index("vid")["oid"]
    out = pd.DataFrame(
        {"oid": df["oid"].astype(np.int64), "comp": m.loc[df["comp"]].to_numpy().astype(np.int64)}
    )
    return out.sort_values("oid").reset_index(drop=True)


def pg_graphar_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Multi-label ARCHIVE_GRAPH: archive the (customer, order, places)
    slice of the labeled property graph in the GraphAr multi-label layout
    (one vertex dir per label, one edge triple dir), re-load it through the
    dest-ordered mirror, and export the places edge table decoded back to
    oids — must equal the raw orders (o_custkey, o_orderkey) pairs."""
    import shutil
    import tempfile

    from graphscope_ray.sources.graphar import load_graphar_property, save_graphar_property

    pgraph = _tripartite_pgraph(sf_dir).project(
        vertices={"customer": [], "order": []}, edges={"places": []}
    )
    path = tempfile.mkdtemp(prefix="pgar_", dir="/tmp")
    try:
        save_graphar_property(pgraph, path, vertex_chunk_size=512)
        g2 = load_graphar_property(path, order="dst")
        out = g2.edge_table("places").to_pandas()[["src_oid", "dst_oid"]].astype(np.int64)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)


def pg_addcol_consolidate(sf_dir: str) -> pd.DataFrame:
    """ADD_COLUMN + CONSOLIDATE_COLUMNS on the labeled graph (ref
    graph.py:715-814): project to (order, next), compute degrees on the
    simple projection, ADD them back onto the 'order' vertex label as new
    property columns (distributed hash join on oid), then CONSOLIDATE the
    two same-type degree columns into one list column; exported stringified
    like op_consolidate for oracle comparability."""
    from graphscope_ray.graph.property import PropertyGraph

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def _chain(gdf: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(gdf["o_orderkey"].to_numpy())
        return pd.DataFrame({"src": k[:-1], "dst": k[1:]})

    chain = orders.groupby("o_custkey").map_groups(_chain, batch_format="pandas")
    pgraph = (
        PropertyGraph(directed=True)
        .add_vertices(orders, "order", vid_field="o_orderkey", properties=[])
        .add_edges(chain, "next", src_label="order", dst_label="order")
    )
    g = pgraph.project_to_simple(num_partitions=4, store_in_edges=True)
    deg = g.degrees()  # (vid, out_deg, in_deg)
    vmap = g.vertices_ds
    from graphscope_ray.utils import hash_join

    deg_oid = hash_join(deg, vmap, "vid", "vid", num_partitions=8).map_batches(
        lambda t: t.select(["oid", "out_deg", "in_deg"]), batch_format="pyarrow"
    )
    g2 = pgraph.add_column("order", deg_oid, key="oid")
    g3 = g2.consolidate_columns("order", ["out_deg", "in_deg"], "deg")

    def _fmt(t: pa.Table) -> pa.Table:
        from graphscope_ray.utils import vecs2d

        d = vecs2d(t["deg"], dtype=np.int64)
        s = [f"[{a},{b}]" for a, b in d]
        return pa.table({"oid": t["oid"], "deg": pa.array(s, pa.string())})

    out = g3.vertex_table("order").map_batches(_fmt, batch_format="pyarrow").to_pandas()
    out["oid"] = out["oid"].astype(np.int64)
    return out.sort_values("oid").reset_index(drop=True)


def lg_graph_weighted(sf_dir: str, num_partitions: int = 4) -> Graph:
    """Weighted lg graph: weight = lineitem multiplicity per (src, dst) pair
    (the repo-graph analogue: importing-file count per edge)."""
    key = (sf_dir, "weighted", num_partitions)
    if key not in _GRAPH_CACHE:
        li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

        def _derive(t: pa.Table) -> pa.Table:
            src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
            dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
            keep = src != dst
            return pa.table(
                {
                    "src": pa.array(src[keep].astype(np.int64)),
                    "dst": pa.array(dst[keep].astype(np.int64)),
                }
            )

        from graphscope_ray.utils import hash_groupby_sum

        pairs = li.map_batches(_derive, batch_format="pyarrow")
        weighted = hash_groupby_sum(pairs, ["src", "dst"], None, "weight", num_partitions=8)
        weighted = weighted.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("weight"),
                "weight",
                pa.array(t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)),
            ),
            batch_format="pyarrow",
        )
        _GRAPH_CACHE[key] = build_graph(
            weighted,
            num_partitions=num_partitions,
            num_vertices=LG_MOD,
            store_in_edges=True,
            weight=True,
        )
    return _GRAPH_CACHE[key]


def lg_pagerank_weighted_hub(sf_dir: str, rounds: int = 15, alpha: float = 0.85,
                             hub_threshold: int = 40) -> pd.DataFrame:
    """Weighted PageRank on a HUB-SPLIT weighted build (round 5: the
    add:hub_w shard-weight reduce + weighted hub apply) — must match the
    SAME SQL oracle as the unsplit lg_pagerank_weighted exactly."""
    key = (sf_dir, "weighted_hub", 4)
    if key not in _GRAPH_CACHE:
        # same derived weighted edge table as lg_graph_weighted
        gplain = lg_graph_weighted(sf_dir)  # ensures the derivation exists
        del gplain
        li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

        def _derive(t: pa.Table) -> pa.Table:
            src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
            dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
            keep = src != dst
            return pa.table(
                {
                    "src": pa.array(src[keep].astype(np.int64)),
                    "dst": pa.array(dst[keep].astype(np.int64)),
                }
            )

        from graphscope_ray.utils import hash_groupby_sum

        pairs = li.map_batches(_derive, batch_format="pyarrow")
        weighted = hash_groupby_sum(pairs, ["src", "dst"], None, "weight",
                                    num_partitions=8)
        weighted = weighted.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("weight"),
                "weight",
                pa.array(t["weight"].to_numpy(zero_copy_only=False).astype(np.float64)),
            ),
            batch_format="pyarrow",
        )
        _GRAPH_CACHE[key] = build_graph(
            weighted, num_partitions=4, num_vertices=LG_MOD,
            weight=True, hub_threshold=hub_threshold,
        )
    g = _GRAPH_CACHE[key]
    ds, _ = alg.pagerank_weighted(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    out = ds.to_pandas()[["vid", "score"]].rename(columns={"vid": "oid"})
    out["score"] = out["score"].round(8)
    return out.sort_values("oid").reset_index(drop=True)


def lg_sssp_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted SSSP (Bellman-Ford frontier relaxation) from vertex 0 over
    the multiplicity-weighted lg graph; reached vertices only.  Weights are
    integer counts, so distance sums are exact in float64."""
    g = lg_graph_weighted(sf_dir)
    ds, _ = alg.sssp(g, source=0)
    df = ds.to_pandas()
    df = df[np.isfinite(df["dist"])]
    out = df[["vid", "dist"]].rename(columns={"vid": "oid"})
    out["dist"] = out["dist"].round(8)
    return out.sort_values("oid").reset_index(drop=True)


def lg_sssp_delta(sf_dir: str, delta: float = 3.0) -> pd.DataFrame:
    """Weighted SSSP via DELTA-STEPPING (programs.SsspDelta — the registry's
    ``sssp_dlt`` execution-strategy variant): bucketed relaxation, light
    edges (w ≤ delta) iterated per bucket, heavy edges once per settle.
    Exact — gated against the SAME unrolled Bellman-Ford SQL oracle as
    lg_sssp_weighted; weights are integer multiplicities ≥ 1 so delta=3
    exercises both the light and heavy paths."""
    g = lg_graph_weighted(sf_dir)
    ds, _ = alg.sssp_delta(g, source=0, delta=delta)
    df = ds.to_pandas()
    df = df[np.isfinite(df["dist"])]
    out = df[["vid", "dist"]].rename(columns={"vid": "oid"})
    out["dist"] = out["dist"].round(8)
    return out.sort_values("oid").reset_index(drop=True)


def lg_ktruss(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """k-truss of the canonical undirected lg edge set (FLASH truss
    decomposition building block) — iterative distributed hash-join
    triangle-support peeling (algorithms.ktruss)."""
    e = lg_edges(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "src": pa.array(
                    np.minimum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
                "dst": pa.array(
                    np.maximum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    e = e.groupby(["src", "dst"]).count().select_columns(["src", "dst"])
    out = alg.ktruss(e, k=k).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_trussness(sf_dir: str) -> pd.DataFrame:
    """Full truss decomposition (max k with the edge in the k-truss) of the
    canonical SPARSE undirected edge set — iterative distributed peeling
    (algorithms.truss_decomposition); (src, dst, trussness)."""
    from graphscope_ray.utils import hash_groupby_sum

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = (src != dst) & ((src * 31 + dst * 17) % SPARSE_MOD == 0)
        a, b = src[keep], dst[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b).astype(np.int64)),
                "dst": pa.array(np.maximum(a, b).astype(np.int64)),
            }
        )

    e = hash_groupby_sum(
        li.map_batches(_derive, batch_format="pyarrow"), ["src", "dst"], None, "n"
    ).select_columns(["src", "dst"])
    out = alg.truss_decomposition(e).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_sweep_cut(
    sf_dir: str, source: int = 0, rounds: int = 10, topk: int = 64
) -> pd.DataFrame:
    """Local community around the min-oid vertex: FLASH PPR scores swept by
    conductance (Andersen–Chung–Lang) over the undirected arc multiset —
    (rnk, oid, cut, vol, phi) per prefix of the score/deg ranking."""
    from graphscope_ray.graph.metrics import sweep_cut

    g = lg_graph(sf_dir)
    ds, _ = alg.ppr(g, source=source, max_rounds=rounds)
    scores = _oid_space(g, ds, ["score"])
    arcs = lg_edges(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()]
                )
                if t.num_rows
                else pa.array([], pa.int64()),
                "dst": pa.concat_arrays(
                    [t["dst"].combine_chunks(), t["src"].combine_chunks()]
                )
                if t.num_rows
                else pa.array([], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = sweep_cut(ray.data.from_pandas(scores), arcs, topk=topk)
    out["phi"] = out["phi"].round(8)
    return out


def lg_cocitation(sf_dir: str, k: int = 5, cap: int = 16) -> pd.DataFrame:
    """Top-k co-cited partners per vertex (shared-in-neighbor similarity
    with deterministic fanout cap — graph/metrics.cocitation_topk)."""
    from graphscope_ray.graph.metrics import cocitation_topk

    out = cocitation_topk(lg_edges(sf_dir), k=k, cap=cap).to_pandas()
    return (
        out[["u", "v", "cocit", "rnk"]]
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )


def lg_adamic_topk(sf_dir: str, k: int = 5, cap: int = 16) -> pd.DataFrame:
    """Top-k Adamic–Adar partners per vertex (capped-wedge discovery with
    exact-integer 1/ln weights — graph/metrics.adamic_adar_topk)."""
    from graphscope_ray.graph.metrics import adamic_adar_topk

    out = adamic_adar_topk(lg_edges(sf_dir), k=k, cap=cap).to_pandas()
    return (
        out[["u", "v", "aa", "rnk"]].sort_values(["u", "rnk"]).reset_index(drop=True)
    )


def lg_bibcoupling(sf_dir: str, k: int = 5, cap: int = 16) -> pd.DataFrame:
    """Top-k bibliographically-coupled partners per vertex (Kessler 1963 —
    shared OUT-neighbors, the dual of co-citation): the same capped wedge
    dataflow run on the reversed arcs (group by citation target, pair the
    citers)."""
    from graphscope_ray.graph.metrics import cocitation_topk

    rev = lg_edges(sf_dir).map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]})
        if t.num_rows
        else pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    out = cocitation_topk(rev, k=k, cap=cap).to_pandas()
    return (
        out[["u", "v", "cocit", "rnk"]]
        .rename(columns={"cocit": "coupling"})
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )


def lg_embeddedness(sf_dir: str) -> pd.DataFrame:
    """Per-edge embeddedness (common endpoint neighbors) + local-bridge
    flag over the canonical undirected lg edges
    (graph/metrics.edge_embeddedness — one k-truss support round)."""
    from graphscope_ray.graph.metrics import edge_embeddedness
    from graphscope_ray.utils import hash_groupby_sum

    e = lg_edges(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "src": pa.array(
                    np.minimum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
                "dst": pa.array(
                    np.maximum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    e = hash_groupby_sum(e, ["src", "dst"], None, "n").select_columns(["src", "dst"])
    out = edge_embeddedness(e).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_khop_sizes(sf_dir: str, num_sources: int = 8) -> pd.DataFrame:
    """Neighborhood function per source (the per-vertex hop-plot): for each
    of the num_sources smallest-oid vertices, the number of vertices at
    EXACT hop distance d (directed BFS).  One BFS program per source; the
    histogram folds per depth with a distributed count exchange (≤ diameter
    rows per source ever reach the driver)."""
    import pyarrow.compute as pc

    from graphscope_ray.utils import hash_groupby_sum

    g = lg_graph(sf_dir)
    parts = []
    for s in range(min(num_sources, g.N)):
        ds, _ = alg.bfs(g, source=s)
        depths = ds.select_columns(["depth"]).map_batches(
            lambda t: t.filter(pc.greater_equal(t["depth"], 0)), batch_format="pyarrow"
        )
        hist = hash_groupby_sum(depths, ["depth"], None, "n", num_partitions=4).to_pandas()
        hist["source"] = np.int64(s)
        parts.append(hist)
    out = pd.concat(parts, ignore_index=True)[["source", "depth", "n"]]
    out["depth"] = out["depth"].astype(np.int64)
    return out.sort_values(["source", "depth"]).reset_index(drop=True)


def lg_edge_jaccard(sf_dir: str) -> pd.DataFrame:
    """Per-edge neighborhood Jaccard (normalized embeddedness) over the
    canonical undirected lg edges (graph/metrics.edge_jaccard)."""
    from graphscope_ray.graph.metrics import edge_jaccard
    from graphscope_ray.utils import hash_groupby_sum

    e = lg_edges(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "src": pa.array(
                    np.minimum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
                "dst": pa.array(
                    np.maximum(
                        t["src"].to_numpy(zero_copy_only=False),
                        t["dst"].to_numpy(zero_copy_only=False),
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    e = hash_groupby_sum(e, ["src", "dst"], None, "n").select_columns(["src", "dst"])
    out = edge_jaccard(e).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_random_walks(sf_dir: str, n_starts: int = 64, length: int = 4) -> pd.DataFrame:
    """Deterministic random-walk corpus over the lg edges (embedding-
    training sampling): rows (walk_id, step, v)."""
    e = lg_edges(sf_dir)
    out = alg.random_walks(e, n_starts=n_starts, length=length).to_pandas()
    return out[["walk_id", "step", "v"]].sort_values(["walk_id", "step"]).reset_index(drop=True)


def lg_link_features(
    sf_dir: str, seed_step: int = 13, max_degree: int = 256, min_cn: int = 1
) -> pd.DataFrame:
    """Link-prediction pair features over the undirected link graph for the
    candidate slice whose min endpoint is a seed (oid % 13 == 0): common
    neighbors, exact-integer Adamic–Adar, Jaccard, preferential attachment,
    and the is_edge training label (graph/minibatch.link_features)."""
    from graphscope_ray.graph.minibatch import link_features

    out = link_features(
        lg_edges(sf_dir),
        seeds=np.arange(0, LG_MOD, seed_step),
        pair_mod=LG_MOD,
        max_degree=max_degree,
        min_cn=min_cn,
    ).to_pandas()
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def _cdlp_labels_ds(sf_dir: str, rounds: int = 10) -> ray.data.Dataset:
    """CDLP community labels as a (oid, label) Dataset — the vertex-sized
    export is the contract's comparison boundary, re-entering the engine
    for the metric composition."""
    lab = lg_cdlp(sf_dir, rounds=rounds).rename(columns={"label_oid": "label"})
    return ray.data.from_arrow(pa.Table.from_pandas(lab, preserve_index=False))


def lg_modularity(sf_dir: str) -> pd.DataFrame:
    """Newman modularity of the CDLP partition over the undirected simple
    link graph, as exact integers (m, q_num, q_den); Q = q_num/q_den
    (graph/metrics.modularity_stats — the community-detection evaluation
    metric, distributed)."""
    from graphscope_ray.graph.metrics import modularity_stats

    return modularity_stats(lg_edges(sf_dir), _cdlp_labels_ds(sf_dir))


def lg_community_stats(sf_dir: str) -> pd.DataFrame:
    """Per-community integer quality statistics of the CDLP partition:
    (community, intra, cut, vol) — conductance φ_c = cut/min(vol, 2m−vol)
    derives from these (graph/metrics.community_edge_stats)."""
    from graphscope_ray.graph.metrics import community_edge_stats

    out = community_edge_stats(lg_edges(sf_dir), _cdlp_labels_ds(sf_dir)).to_pandas()
    return out.sort_values("community").reset_index(drop=True)


def lg_contract(sf_dir: str) -> pd.DataFrame:
    """The contracted community graph of the CDLP partition (Louvain's
    coarsening as a standalone op): directed (csrc, cdst, weight)
    (graph/metrics.contract_graph)."""
    from graphscope_ray.graph.metrics import contract_graph

    out = contract_graph(lg_edges(sf_dir), _cdlp_labels_ds(sf_dir)).to_pandas()
    return out.sort_values(["csrc", "cdst"]).reset_index(drop=True)


def lg_node2vec(sf_dir: str, n_starts: int = 64, length: int = 4) -> pd.DataFrame:
    """Deterministic node2vec second-order biased walks over the link graph
    (integer search-bias weights 1/4/2 for return/distance-1/far classes;
    graph/minibatch.node2vec_walks)."""
    from graphscope_ray.graph.minibatch import node2vec_walks

    out = node2vec_walks(lg_edges(sf_dir), n_starts=n_starts, length=length).to_pandas()
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def lg_wl_colors(sf_dir: str, rounds: int = 3) -> pd.DataFrame:
    """1-WL color refinement over the link graph: per-vertex canonical
    structural colors after 3 rounds (graph/metrics.wl_colors — the graph
    canonization / GNN-expressiveness primitive, exact mod-2^64 multiset
    sums so the whole refinement is bit-reproducible)."""
    from graphscope_ray.graph.metrics import wl_colors

    out = wl_colors(lg_edges(sf_dir), rounds=rounds).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_deepwalk_ppmi(
    sf_dir: str, n_starts: int = 64, length: int = 4, window: int = 2
) -> pd.DataFrame:
    """DeepWalk prep, composed end-to-end: the deterministic random-walk
    corpus over the link graph → skip-gram pairs within 2 steps → PPMI
    (the SGNS factorization target).  Both stages are the engine's own
    operators (alg.random_walks + mlprep.walk_skipgram_ppmi)."""
    from graphscope_ray.functions.mlprep import walk_skipgram_ppmi

    walks = alg.random_walks(lg_edges(sf_dir), n_starts=n_starts, length=length)
    out = walk_skipgram_ppmi(walks, window=window, min_count=1).to_pandas()
    return out.sort_values(["w", "c"]).reset_index(drop=True)


def pg_metapath_sample(
    sf_dir: str, fanouts=(3, 2), salt: int = 11, seed_step: int = 97
) -> pd.DataFrame:
    """Metapath-guided heterogeneous fanout sampling over the first-class
    property graph: customer -[places]→ order -[contains]→ part, seeds =
    customers with c_custkey % 97 == 0, deterministic edge-hash ranks
    (graph/minibatch.metapath_sample — the hetero-GNN loader primitive)."""
    from graphscope_ray.graph.minibatch import metapath_sample

    cust = read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    seeds = cust[cust % seed_step == 0]
    out = metapath_sample(
        _tripartite_pgraph(sf_dir),
        seeds=seeds,
        path=["places", "contains"],
        fanouts=list(fanouts),
        salt=salt,
    ).to_pandas()
    return out.sort_values(["layer", "src", "dst"]).reset_index(drop=True)


def lg_sage_sum(sf_dir: str) -> pd.DataFrame:
    """GraphSAGE mean-aggregator statistics: per vertex, the exact integer
    per-dimension SUM of in-neighbor features + in-degree, features =
    round(1e6 · embeddings[oid % 500]) (quantized so the neighbor sums are
    bit-exact int64 on both sides; the mean is sum/(1e6·n)).  Unpivoted to
    (oid, dim, s_e6, n) for value hashing."""
    from graphscope_ray.graph.minibatch import neighbor_feature_sum

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.round(np.stack(emb["embedding"].to_numpy()).astype(np.float64) * 1e6).astype(
        np.int64
    )
    vids = np.arange(LG_MOD, dtype=np.int64)
    out = neighbor_feature_sum(
        lg_edges(sf_dir), feat_ids=vids, feat_mat=mat[vids % len(emb)]
    ).to_pandas()
    d = mat.shape[1]
    scols = [f"s{j}" for j in range(d)]
    sums = out[scols].to_numpy()
    long = pd.DataFrame(
        {
            "oid": np.repeat(out["oid"].to_numpy(np.int64), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(out)),
            "s_e6": sums.ravel(),
            "n": np.repeat(out["n"].to_numpy(np.int64), d),
        }
    )
    return long.sort_values(["oid", "dim"]).reset_index(drop=True)


def op_orc_scan(sf_dir: str) -> pd.DataFrame:
    """ORC source parity: export the nation dimension to ORC once, read it
    back through the stripe-streaming ORC source with column projection."""
    import os

    from graphscope_ray.sources.orc import read_orc_source, write_orc

    path = f"/tmp/graft_orc/{os.path.basename(sf_dir)}_nation.orc"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = pa.Table.from_pandas(
            read(sf_dir, "nation").to_pandas(), preserve_index=False
        )
        tmp = path + ".tmp"
        write_orc(t, tmp)
        os.replace(tmp, path)
    ds = read_orc_source(path, columns=["n_nationkey", "n_name", "n_regionkey"])
    return ds.to_pandas().sort_values("n_nationkey").reset_index(drop=True)


def lg_eccentricity(sf_dir: str, s_max: int = 32) -> pd.DataFrame:
    """Out-eccentricity (max finite shortest-path length) for sources with
    oid < s_max, plus the diameter restricted to those sources — the
    FLASH-style diameter/eccentricity surface on the MsBfs sweep."""
    ap = lg_apsp(sf_dir, s_max=s_max)
    ecc = ap.groupby("src_oid", as_index=False)["dist"].max().rename(columns={"dist": "ecc"})
    return ecc.sort_values("src_oid").reset_index(drop=True)


def op_topk_per_group(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k rows per group (windowed rank surface): k highest-value events
    per event_type, ties broken by event_id.  Distributed as per-block
    partial top-k (each block keeps ≤ k rows per key) → tiny global merge —
    the same partial/merge shape as sim_topk."""
    ev = read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["value", "event_id"], ascending=[False, True])
            .groupby("event_type", as_index=False)
            .head(k)
        )

    partials = ev.map_batches(_partial, batch_format="pandas")

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"], ascending=[False, True]).head(k)

    out = (
        partials.groupby("event_type")
        .map_groups(_merge, batch_format="pandas")
        .to_pandas()
    )
    out["value"] = out["value"].round(8)
    return out.sort_values(["event_type", "event_id"]).reset_index(drop=True)


def op_groupby_median(sf_dir: str) -> pd.DataFrame:
    """Exact per-group median (order statistics are non-decomposable, so
    this is a real shuffle: values hash-exchange to their key's partition,
    one quantile kernel per group)."""
    ev = read(sf_dir, "events", columns=["event_type", "value"])

    def _median(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "median_value": [float(np.median(g["value"].to_numpy()))],
            }
        )

    out = ev.groupby("event_type").map_groups(_median, batch_format="pandas").to_pandas()
    out["median_value"] = out["median_value"].round(8)
    return out.sort_values("event_type").reset_index(drop=True)


def lg_pagerank_p2p(sf_dir: str, rounds: int = 15, alpha: float = 0.85) -> pd.DataFrame:
    """Same fixed-round PageRank but over the p2p message layout (one object
    per (sender, target) pair — the multi-node wire format), so the driver
    gate also certifies the cluster exchange path, not just shared-scatter."""
    g = lg_graph(sf_dir)
    was = g.p2p_messages
    g.p2p_messages = True
    try:
        ds, _ = alg.pagerank(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    finally:
        g.p2p_messages = was
    out = _oid_space(g, ds, ["score"])
    out["score"] = out["score"].round(8)
    return out


# ---------------------------------------------------------------------------
# FLASH-suite queries (connectivity / matching / subgraph / measurement)
# over lg_sparse — a deterministic ~3-avg-degree subgraph of the link graph
# ((src*31 + dst*17) % 20 == 0) whose SCC / matching / coloring structure is
# non-degenerate (the full lg graph is one giant SCC).

SPARSE_MOD = 20


def lg_sparse_graph(sf_dir: str, num_partitions: int = 4) -> Graph:
    key = (sf_dir, num_partitions, "sparse")
    if key not in _GRAPH_CACHE:
        li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

        def _derive(t: pa.Table) -> pa.Table:
            src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
            dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
            keep = (src != dst) & ((src * 31 + dst * 17) % SPARSE_MOD == 0)
            return pa.table(
                {
                    "src_oid": pa.array(src[keep].astype(np.int64)),
                    "dst_oid": pa.array(dst[keep].astype(np.int64)),
                }
            )

        edges = li.map_batches(_derive, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph_from_oids(
            edges,
            num_partitions=num_partitions,
            view="directed",
            store_in_edges=True,
            dedup_edges=True,
        )
    return _GRAPH_CACHE[key]


def lg_scc(sf_dir: str) -> pd.DataFrame:
    """SCC labels (min oid in component) on the sparse link graph."""
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.scc(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    df = df.merge(vmap.rename(columns={"vid": "scc", "oid": "scc_oid"}), on="scc")
    return df[["oid", "scc_oid"]].sort_values("oid").reset_index(drop=True)


def lg_condensation(sf_dir: str) -> pd.DataFrame:
    """SCC condensation DAG with longest-path layering (networkx
    ``condensation`` + topological level) on the sparse link graph:
    (oid, scc_oid, lvl) — lvl is the longest path ending at the vertex's
    component in the component DAG."""
    g = lg_sparse_graph(sf_dir)
    df = alg.condensation(g).to_pandas()
    vmap = g.vertices_ds.to_pandas()
    df = df.merge(vmap, on="vid")
    df = df.merge(vmap.rename(columns={"vid": "scc", "oid": "scc_oid"}), on="scc")
    return (
        df[["oid", "scc_oid", "lvl"]].sort_values("oid").reset_index(drop=True)
    )


def lg_mis(sf_dir: str) -> pd.DataFrame:
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.mis(g)
    out = _oid_space(g, ds, ["in_mis"])
    out["in_mis"] = out["in_mis"].astype("int64")
    return out


def lg_matching(sf_dir: str) -> pd.DataFrame:
    """Maximal matching: mate oid per vertex, -1 if unmatched."""
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.matching(g)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    df = df.merge(
        vmap.rename(columns={"vid": "mate", "oid": "mate_oid"}), on="mate", how="left"
    )
    df["mate_oid"] = df["mate_oid"].fillna(-1).astype("int64")
    return df[["oid", "mate_oid"]].sort_values("oid").reset_index(drop=True)


def lg_coloring(sf_dir: str) -> pd.DataFrame:
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.coloring(g)
    return _oid_space(g, ds, ["color"])


def lg_rectangles(sf_dir: str) -> pd.DataFrame:
    """Global 4-cycle count on the (full) undirected link graph."""
    g = lg_graph(sf_dir)
    return pd.DataFrame({"n_rectangles": [alg.rectangles(g)]})


def lg_densest(sf_dir: str) -> pd.DataFrame:
    """Max-coreness subgraph density (densest-sub-2-approx semantics)."""
    g = lg_graph(sf_dir)
    d = alg.densest_core(g)
    return pd.DataFrame(
        {
            "core": [d["core"]],
            "n_vertices": [d["n_vertices"]],
            "density": [round(d["density"], 8)],
        }
    )


def lg_ecc_all(sf_dir: str) -> pd.DataFrame:
    """Exact out-eccentricity + reach count for every vertex (sparse graph)."""
    g = lg_sparse_graph(sf_dir)
    ecc = alg.eccentricity_all(g, chunk=128)
    vmap = g.vertices_ds.to_pandas()
    df = ecc.merge(vmap, left_on="src", right_on="vid")
    df = df[["oid", "ecc", "n_reach"]].sort_values("oid").reset_index(drop=True)
    df["n_reach"] = df["n_reach"].astype("int64")
    return df


def lg_diameter(sf_dir: str) -> pd.DataFrame:
    g = lg_sparse_graph(sf_dir)
    d = alg.diameter_radius(g)
    return pd.DataFrame({"diameter": [d["diameter"]], "radius": [d["radius"]]})


def lg_eff_diameter(sf_dir: str) -> pd.DataFrame:
    """90th-percentile hop-plot effective diameter on the sparse graph
    (directed finite positive-distance pairs; exact integer rule
    10·cum[d] >= 9·total)."""
    g = lg_sparse_graph(sf_dir)
    d = alg.effective_diameter(g)
    return pd.DataFrame(
        {
            "effective_diameter": [int(d["effective_diameter"])],
            "n_pairs": [int(d["n_pairs"])],
        }
    )


def lg_global_efficiency(sf_dir: str) -> pd.DataFrame:
    """Directed global efficiency (Latora–Marchiori) on the sparse graph —
    Σ 1/d over finite positive-distance ordered pairs, / N(N−1); folded
    from the same fragment-side distance histogram as lg_eff_diameter."""
    g = lg_sparse_graph(sf_dir)
    d = alg.global_efficiency(g)
    return pd.DataFrame(
        {
            "global_efficiency": [round(d["global_efficiency"], 8)],
            "n_pairs": [int(d["n_pairs"])],
        }
    )


def lg_richclub(sf_dir: str) -> pd.DataFrame:
    """Rich-club coefficient on the undirected simple sparse graph
    (networkx rich_club_coefficient(normalized=False) semantics) — the
    distributed dataflow lives in graph.metrics.rich_club_coefficient."""
    from graphscope_ray.graph.metrics import rich_club_coefficient

    return rich_club_coefficient(_sparse_edges_ds(sf_dir))


def lg_bipartite_proj(sf_dir: str, max_fanout: int = 5) -> pd.DataFrame:
    """One-mode projection of the order—part bipartite graph onto parts
    (networkx bipartite.weighted_projected_graph): parts are linked iff
    they share an order, weight = #distinct shared orders; orders with
    more than max_fanout distinct parts are dropped (the documented
    deterministic skew cap).  Dataflow in graph.metrics.bipartite_projection."""
    from graphscope_ray.graph.metrics import bipartite_projection

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _bp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "p": (
                    t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
                ).astype(np.int64),
            }
        )

    bp = li.map_batches(_bp, batch_format="pyarrow")
    out = bipartite_projection(bp, "o", "p", max_fanout=max_fanout).to_pandas()
    if "a" not in out.columns:  # empty result → zero-column blocks
        out = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "weight": pd.Series(dtype=np.int64),
            }
        )
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def lg_weighted_clustering(sf_dir: str) -> pd.DataFrame:
    """Barrat weighted clustering per vertex over the multiplicity-weighted
    undirected link graph — graph.metrics.weighted_clustering."""
    from graphscope_ray.graph.metrics import weighted_clustering

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep].astype(np.int64)),
                "dst": pa.array(dst[keep].astype(np.int64)),
                "weight": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    we = li.map_batches(_derive, batch_format="pyarrow")
    out = weighted_clustering(we).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_onnela_clustering(sf_dir: str) -> pd.DataFrame:
    """Onnela weighted clustering (the networkx clustering(weight=…)
    formula) over the same multiplicity-weighted undirected link graph —
    graph.metrics.weighted_clustering(formula='onnela')."""
    from graphscope_ray.graph.metrics import weighted_clustering

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep].astype(np.int64)),
                "dst": pa.array(dst[keep].astype(np.int64)),
                "weight": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    we = li.map_batches(_derive, batch_format="pyarrow")
    out = weighted_clustering(we, formula="onnela").to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_two_hop(sf_dir: str) -> pd.DataFrame:
    """Per-vertex directed ≤2-hop ball sizes on the sparse graph —
    graph.metrics.two_hop_sizes."""
    from graphscope_ray.graph.metrics import two_hop_sizes

    out = two_hop_sizes(_sparse_edges_ds(sf_dir)).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_seeded_lpa(sf_dir: str) -> pd.DataFrame:
    """Semi-supervised seeded label propagation (Zhu–Ghahramani hard clamp,
    6 synchronous rounds, seeds oid%5==0 → class oid%3) on the undirected
    sparse graph — graph.metrics.seeded_lpa."""
    from graphscope_ray.graph.metrics import seeded_lpa

    out = seeded_lpa(_sparse_edges_ds(sf_dir)).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_assortativity_directed(sf_dir: str) -> pd.DataFrame:
    """The four directed degree-assortativity coefficients (out/in ×
    out/in, Foster et al. 2010) on the directed sparse graph —
    graph.metrics.directed_assortativity."""
    from graphscope_ray.graph.metrics import directed_assortativity

    return directed_assortativity(_sparse_edges_ds(sf_dir))


def lg_degree_hist(sf_dir: str) -> pd.DataFrame:
    """Degree histogram (degree, n_vertices) of the undirected simple
    sparse graph — graph.metrics.degree_histogram."""
    from graphscope_ray.graph.metrics import degree_histogram

    out = degree_histogram(_sparse_edges_ds(sf_dir)).to_pandas()
    return out.sort_values("degree").reset_index(drop=True)


def lg_degree_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of the sparse graph's undirected degree
    distribution (the hub-skew statistic) — graph.metrics.degree_gini."""
    from graphscope_ray.graph.metrics import degree_gini

    r = degree_gini(_sparse_edges_ds(sf_dir))
    return pd.DataFrame(
        {"gini": [r["gini"]], "n_vertices": [np.int64(r["n_vertices"])]}
    )


def lg_backbone(sf_dir: str) -> pd.DataFrame:
    """Disparity-filter backbone α-scores (Serrano–Boguñá–Vespignani) over
    the multiplicity-weighted directed link graph (lg_edges_weighted edges)
    — dataflow in graph.metrics.disparity_filter."""
    from graphscope_ray.graph.metrics import disparity_filter

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep].astype(np.int64)),
                "dst": pa.array(dst[keep].astype(np.int64)),
            }
        )

    from graphscope_ray.utils import hash_groupby_sum

    we = hash_groupby_sum(
        li.map_batches(_derive, batch_format="pyarrow"),
        ["src", "dst"],
        None,
        "weight",
        num_partitions=8,
    )
    out = disparity_filter(we).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def lg_salsa(sf_dir: str, iters: int = 5) -> pd.DataFrame:
    """SALSA authorities/hubs (Lempel–Moran) on the directed sparse graph,
    5 alternating L1-normalized iterations from uniform hubs — dataflow in
    graph.metrics.salsa."""
    from graphscope_ray.graph.metrics import salsa

    out = salsa(_sparse_edges_ds(sf_dir), iters=iters).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Overall reciprocity of the directed simple sparse graph (networkx
    overall_reciprocity, self-loop-free) — distributed pair-bit dataflow
    in graph.metrics.reciprocity."""
    from graphscope_ray.graph.metrics import reciprocity

    r = reciprocity(_sparse_edges_ds(sf_dir))
    return pd.DataFrame(
        {
            "reciprocity": [r["reciprocity"]],
            "n_reciprocated": [np.int64(r["n_reciprocated"])],
            "n_edges": [np.int64(r["n_edges"])],
        }
    )


def lg_avg_nbr_deg(sf_dir: str) -> pd.DataFrame:
    """Average neighbor degree per vertex on the undirected simple sparse
    graph (networkx average_neighbor_degree / Barrat et al. 2004) — the
    per-vertex companion of lg_avg_degree_connectivity; dataflow in
    graph.metrics.avg_neighbor_degree."""
    from graphscope_ray.graph.metrics import avg_neighbor_degree

    out = avg_neighbor_degree(_sparse_edges_ds(sf_dir)).to_pandas()
    return out.sort_values("oid").reset_index(drop=True)


def lg_smetric(sf_dir: str) -> pd.DataFrame:
    """s-metric Σ_edges deg(u)·deg(v) on the undirected simple sparse graph
    (Li–Alderson–Doyle–Willinger; networkx s_metric) — exact integer,
    dataflow in graph.metrics.s_metric."""
    from graphscope_ray.graph.metrics import s_metric

    return pd.DataFrame({"s_metric": [np.int64(s_metric(_sparse_edges_ds(sf_dir)))]})


def lg_simrank(sf_dir: str) -> pd.DataFrame:
    """SimRank structural similarity (Jeh–Widom, 3 iterations, C=0.8) on the
    directed sparse graph — nonzero off-diagonal unordered pairs; the
    distributed pair-space dataflow lives in graph.metrics.simrank."""
    from graphscope_ray.graph.metrics import simrank

    out = simrank(_sparse_edges_ds(sf_dir), c=0.8, iters=3).to_pandas()
    return out.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)


def lg_kcenter(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Greedy farthest-point k-center on the sparse graph (directed
    distances; unreached = infinitely far, radius -2 marks an inf pick)."""
    g = lg_sparse_graph(sf_dir)
    centers = alg.k_center(g, k=k)
    vmap = g.vertices_ds.to_pandas().set_index("vid")["oid"]
    return pd.DataFrame(
        {
            "rank": np.arange(len(centers), dtype=np.int64),
            "center_oid": [int(vmap.loc[c]) for c, _r in centers],
            "radius": np.array([r for _c, r in centers], dtype=np.int64),
        }
    )


def lg_closeness_exact(sf_dir: str) -> pd.DataFrame:
    """Exact harmonic in-closeness over ALL sources (sparse graph):
    c(v) = Σ_s 1/d(s,v) / (N-1)."""
    g = lg_sparse_graph(sf_dir)
    ds = alg.closeness_exact(g, harmonic=True)
    out = _oid_space(g, ds, ["closeness"])
    out["closeness"] = out["closeness"].round(8)
    return out


def _sparse_edges_ds(sf_dir: str) -> ray.data.Dataset:
    """The sparse link-graph directed dedup edge set as a (src, dst) Dataset
    (same derivation as lg_sparse_graph, in oid space)."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = (src != dst) & ((src * 31 + dst * 17) % SPARSE_MOD == 0)
        return pa.table(
            {
                "src": pa.array(src[keep].astype(np.int64)),
                "dst": pa.array(dst[keep].astype(np.int64)),
            }
        )

    e = li.map_batches(_derive, batch_format="pyarrow")
    return e.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def lg_motifs(sf_dir: str) -> pd.DataFrame:
    """Undirected motif census on the sparse graph (FLASH subgraph family:
    triangle / tailed-triangle / 3-path / diamond counts), computed by one
    distributed per-edge-support dataflow (algorithms.undirected_motifs)."""
    e = _sparse_edges_ds(sf_dir)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(np.minimum(s, d)), "dst": pa.array(np.maximum(s, d))}
        )

    cu = e.map_batches(_canon, batch_format="pyarrow")
    cu = cu.groupby(["src", "dst"]).count().select_columns(["src", "dst"])
    m = alg.undirected_motifs(cu)
    return pd.DataFrame(
        {
            "triangles": [m["triangles"]],
            "tailed": [m["tailed"]],
            "n_3paths": [m["n_3paths"]],
            "diamonds": [m["diamonds"]],
        }
    )


def lg_directed_census(sf_dir: str) -> pd.DataFrame:
    """Directed triangle census on the sparse graph (FLASH cyclic / acyclic /
    in- / out-triangle counting), via distributed wedge joins."""
    c = alg.directed_triangle_census(_sparse_edges_ds(sf_dir))
    return pd.DataFrame(
        {
            "cyclic": [c["cyclic"]],
            "acyclic": [c["acyclic"]],
            "in_tri": [c["in_tri"]],
            "out_tri": [c["out_tri"]],
        }
    )


def _sparse_canonical_edges(sf_dir: str) -> ray.data.Dataset:
    e = _sparse_edges_ds(sf_dir)

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": pa.array(np.minimum(s, d)), "dst": pa.array(np.maximum(s, d))}
        )

    cu = e.map_batches(_canon, batch_format="pyarrow")
    return cu.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def _sparse_cores(sf_dir: str) -> ray.data.Dataset:
    """Coreness of the sparse graph in oid space (kshell program state)."""
    from graphscope_ray.utils import hash_join

    g = lg_sparse_graph(sf_dir)
    ks = alg.kshell(g)  # (vid, shell)
    j = hash_join(ks, g.vertices_ds, "vid", "vid", num_partitions=4)

    def _p(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"oid": pa.array([], pa.int64()), "core": pa.array([], pa.int64())})
        return pa.table({"oid": t["oid"], "core": t["shell"]})

    return j.map_batches(_p, batch_format="pyarrow")


def lg_degeneracy(sf_dir: str) -> pd.DataFrame:
    """Degeneracy ordering on the sparse graph (FLASH
    core/degeneracy-ordering.h): coreness + dg-threshold peel ranks."""
    out = alg.peel_ordering(
        _sparse_canonical_edges(sf_dir), _sparse_cores(sf_dir), mode="degeneracy"
    )
    for c in ("core", "rank"):
        out[c] = out[c].astype("int64")
    return out


def lg_onion(sf_dir: str) -> pd.DataFrame:
    """Onion-layer ordering on the sparse graph (FLASH
    core/onion-layer-ordering.h): same-core peel layer per vertex."""
    out = alg.peel_ordering(
        _sparse_canonical_edges(sf_dir), _sparse_cores(sf_dir), mode="onion"
    )
    for c in ("core", "rank"):
        out[c] = out[c].astype("int64")
    return out


def lg_min_cover(sf_dir: str) -> pd.DataFrame:
    """Greedy minimum vertex cover on the sparse graph (FLASH
    matching/min-cover-greedy.h)."""
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.min_cover_greedy(g)
    out = _oid_space(g, ds, ["in_cover"])
    out["in_cover"] = out["in_cover"].astype("int64")
    return out


def lg_dominating(sf_dir: str) -> pd.DataFrame:
    """Greedy minimum dominating set on the sparse graph (FLASH
    matching/min-dominating-set.h)."""
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.min_dominating_set(g)
    out = _oid_space(g, ds, ["in_set"])
    out["in_set"] = out["in_set"].astype("int64")
    return out


def lg_edge_cover(sf_dir: str) -> pd.DataFrame:
    """Minimum edge cover size on the sparse graph (FLASH
    matching/min-edge-cover.h final count over the maximal matching)."""
    g = lg_sparse_graph(sf_dir)
    return pd.DataFrame({"n_edge_cover": [alg.min_edge_cover(g)["n_edge_cover"]]})


def lg_msf(sf_dir: str) -> pd.DataFrame:
    """Minimum spanning forest of the weighted sparse graph (FLASH
    measurement/msf.h): weight = lineitem multiplicity of the canonical
    undirected pair; unique under the (w, src, dst) tie-break."""
    from graphscope_ray.utils import hash_groupby_sum

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = (src != dst) & ((src * 31 + dst * 17) % SPARSE_MOD == 0)
        s, d = src[keep].astype(np.int64), dst[keep].astype(np.int64)
        return pa.table(
            {"src": pa.array(np.minimum(s, d)), "dst": pa.array(np.maximum(s, d))}
        )

    raw = li.map_batches(_derive, batch_format="pyarrow")
    wed = hash_groupby_sum(raw, ["src", "dst"], None, "weight", num_partitions=8)
    out = alg.msf(wed)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_BICONN_CACHE: dict = {}


def _biconn(sf_dir: str) -> dict:
    """One shared connectivity decomposition of the sparse graph (FLASH
    apps/flash/connectivity/{bridge,cut-point,bcc}.h): BFS forest →
    Tarjan–Vishkin.  Cached — five queries slice it."""
    if sf_dir not in _BICONN_CACHE:
        g = lg_sparse_graph(sf_dir)
        _BICONN_CACHE[sf_dir] = alg.biconnectivity(g, _sparse_canonical_edges(sf_dir))
    return _BICONN_CACHE[sf_dir]


def lg_bfs_forest(sf_dir: str) -> pd.DataFrame:
    """Min-oid-rooted BFS spanning forest of the sparse graph (the tree
    phase shared by the FLASH connectivity apps, bridge.h:58-104)."""
    out = _biconn(sf_dir)["forest"].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_bridges(sf_dir: str) -> pd.DataFrame:
    """Bridge edges (canonical src<dst) of the sparse graph
    (apps/flash/connectivity/bridge.h)."""
    out = _biconn(sf_dir)["bridges"].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_cut_points(sf_dir: str) -> pd.DataFrame:
    """Articulation points of the sparse graph
    (apps/flash/connectivity/cut-point.h)."""
    out = _biconn(sf_dir)["cut"].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_bcc(sf_dir: str) -> pd.DataFrame:
    """Biconnected-component label per vertex — the block of the vertex's
    parent tree edge, min member oid; roots keep their own oid
    (apps/flash/connectivity/bcc.h's per-vertex union-find labels under our
    min-oid tie-breaks)."""
    out = _biconn(sf_dir)["bcc"].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_2ecc(sf_dir: str) -> pd.DataFrame:
    """2-edge-connected components (min member oid) — WCC after bridge
    removal, derived from the bridge decomposition (bridge.h)."""
    out = _biconn(sf_dir)["ecc2"].copy()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_kclique(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """K-clique count on the full link graph (FLASH
    apps/flash/subgraph/k-clique.h): degree-ordered orientation + iterative
    distributed clique-extension joins."""
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        s, d = src[keep].astype(np.int64), dst[keep].astype(np.int64)
        return pa.table(
            {"src": pa.array(np.minimum(s, d)), "dst": pa.array(np.maximum(s, d))}
        )

    cu = li.map_batches(_derive, batch_format="pyarrow")
    cu = cu.groupby(["src", "dst"]).count().select_columns(["src", "dst"])
    return pd.DataFrame({"n_4cliques": [alg.kclique_count(cu, k=k)]})


def lg_fluid(sf_dir: str, s: int = 10, rounds: int = 15) -> pd.DataFrame:
    """Fluid communities on the sparse graph (FLASH fluid-community.h with
    deterministic seeds = the s smallest oids, synchronous updates, fixed
    rounds).  comm_oid = the seed's oid, −1 if no community reached."""
    g = lg_sparse_graph(sf_dir)
    ds, _ = alg.fluid_community(g, s=s, max_rounds=rounds)
    vmap = g.vertices_ds.to_pandas()
    df = ds.to_pandas().merge(vmap, on="vid")
    seeds = vmap.sort_values("vid").head(s)["oid"].to_numpy()
    lab = df["lab"].to_numpy()
    df["comm_oid"] = np.where(lab >= 0, seeds[np.maximum(lab, 0)], -1)
    out = df[["oid", "comm_oid"]].sort_values("oid").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def lg_has_path(sf_dir: str, targets=(1, 500, 999)) -> pd.DataFrame:
    """sssp_has_path parity (apps/sssp/sssp_has_path.h): directed
    reachability source→target for fixed targets from the min-oid source."""
    g = lg_graph(sf_dir)
    ds, _ = alg.bfs(g, source=0)
    depth = ds.to_pandas().set_index("vid")["depth"]  # vid == oid (dense lg)
    return pd.DataFrame(
        {
            "target": np.asarray(targets, dtype=np.int64),
            "has_path": np.asarray(
                [int(depth.get(t, -1) >= 0) for t in targets], dtype=np.int64
            ),
        }
    )


def lg_avg_path_length(sf_dir: str, s_max: int = 32) -> pd.DataFrame:
    """sssp_average_length parity (apps/sssp/sssp_average_length.h): average
    shortest-path length over ordered reachable pairs (s, t), s ≠ t, from
    the deterministic source set oid < s_max (same fan-out restriction as
    lg_apsp — the full all-pairs sum is the identical program with every
    vertex as a source)."""
    g = lg_graph(sf_dir)
    vmap = g.vertices_ds.to_pandas()
    src_vids = vmap[vmap.oid < s_max].sort_values("oid")["vid"].tolist()
    ap = alg.apsp(g, sources=src_vids).to_pandas()
    ap = ap[ap["src"] != ap["dst"]]
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(len(ap))],
            "avg_len": [round(float(ap["dist"].mean()), 8)],
        }
    )


def lg_avg_path_length_weighted(sf_dir: str, s_max: int = 16) -> pd.DataFrame:
    """Weighted sssp_average_length parity (apps/sssp/sssp_average_length.h
    runs SSSP per source and averages the weighted distances): average
    weighted shortest-path length over ordered reachable pairs (s, t),
    s ≠ t, sources oid < s_max, on the multiplicity-weighted lg graph.
    One batched multi-source Bellman-Ford wave ("mssp") relaxes all S
    sources simultaneously — S columns of one (n_local, S) distance matrix
    per fragment instead of S sequential SSSP runs."""
    g = lg_graph_weighted(sf_dir)
    ap = alg.apsp(g, sources=list(range(s_max)), weighted=True).to_pandas()
    ap = ap[ap["src"] != ap["dst"]]
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(len(ap))],
            "avg_len": [round(float(ap["dist"].mean()), 8)],
        }
    )


def lg_sssp_path(sf_dir: str, source: int = 0) -> pd.DataFrame:
    """sssp_path parity (apps/sssp/sssp_path.h): the weighted shortest-path
    tree as (pred, oid, dist) rows.  The reference's predecessor is
    message-order-dependent; we fix the deterministic tie-break
    pred(v) = min{u : dist(u) + w(u,v) = dist(v)} (pred(source) = source).
    Distance sums are integer-valued so the equality test is exact.
    The tree edge selection is one streaming pass over the weighted edges
    against the broadcast vertex-sized distance array."""
    import ray as _ray

    from graphscope_ray.utils import hash_groupby_sum

    g = lg_graph_weighted(sf_dir)
    ds, _ = alg.sssp(g, source=source)
    ddf = ds.to_pandas()  # vertex-sized (vid == oid on the dense lg graph)
    dist = np.full(LG_MOD, np.inf)
    dist[ddf["vid"].to_numpy()] = ddf["dist"].to_numpy()
    ref = _ray.put(dist)

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def _derive(t: pa.Table) -> pa.Table:
        src = t["l_orderkey"].to_numpy(zero_copy_only=False) % LG_MOD
        dst = t["l_partkey"].to_numpy(zero_copy_only=False) % LG_MOD
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep].astype(np.int64)),
                "dst": pa.array(dst[keep].astype(np.int64)),
            }
        )

    we = hash_groupby_sum(
        li.map_batches(_derive, batch_format="pyarrow"), ["src", "dst"], None, "w",
        num_partitions=4,
    )

    def _tree_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"oid": pa.array([], pa.int64()), "cand": pa.array([], pa.int64())})
        d = _ray.get(ref)
        s = t["src"].to_numpy(zero_copy_only=False)
        v = t["dst"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(d[s]) & (d[s] + w == d[v])
        return pa.table({"oid": pa.array(v[ok]), "cand": pa.array(s[ok])})

    cand = we.map_batches(_tree_edges, batch_format="pyarrow")
    pred = hash_groupby_sum(cand, ["oid"], "cand", "pred", num_partitions=4, agg="min")
    out = pred.to_pandas()
    out = pd.concat(
        [out, pd.DataFrame({"oid": [source], "pred": [source]})], ignore_index=True
    )
    ddf = ddf[np.isfinite(ddf["dist"])].rename(columns={"vid": "oid"})
    out = out.merge(ddf[["oid", "dist"]], on="oid")
    out["dist"] = out["dist"].round(8)
    for c in ("pred", "oid"):
        out[c] = out[c].astype("int64")
    return out[["pred", "oid", "dist"]].sort_values("oid").reset_index(drop=True)


def lg_attr_assortativity(sf_dir: str, n_cat: int = 5) -> pd.DataFrame:
    """attribute_assortativity_coefficient parity
    (apps/assortativity/attribute_assortativity.h): categorical mixing over
    directed edges with the synthetic vertex attribute attr = oid % n_cat;
    r = (Σᵢ eᵢᵢ − Σᵢ aᵢ·bᵢ) / (1 − Σᵢ aᵢ·bᵢ).  One streaming pass emitting
    an n_cat×n_cat partial count matrix per batch."""
    e = lg_edges(sf_dir)

    def _mix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"m": pa.array([np.zeros(n_cat * n_cat, dtype=np.int64)])})
        ai = t["src"].to_numpy(zero_copy_only=False) % n_cat
        aj = t["dst"].to_numpy(zero_copy_only=False) % n_cat
        m = np.bincount(ai * n_cat + aj, minlength=n_cat * n_cat).astype(np.int64)
        return pa.table({"m": pa.array([m])})

    parts = e.map_batches(_mix, batch_format="pyarrow").to_pandas()
    M = np.sum(np.stack(parts["m"].to_numpy()), axis=0).reshape(n_cat, n_cat)
    E = M / M.sum()
    ab = float(E.sum(axis=1) @ E.sum(axis=0))
    r = (float(np.trace(E)) - ab) / (1.0 - ab)
    return pd.DataFrame({"coefficient": [round(r, 8)]})


def lg_lcc_directed(sf_dir: str) -> pd.DataFrame:
    """Directed clustering coefficient (grape::LCCDirected / Fagiolo) on the
    sparse directed graph — distributed weighted-triangle dataflow
    (algorithms.lcc_directed)."""
    out = alg.lcc_directed(_sparse_edges_ds(sf_dir)).to_pandas()
    out["lcc_d"] = out["lcc_d"].round(8)
    out["oid"] = out["oid"].astype("int64")
    return out.sort_values("oid").reset_index(drop=True)


# ---------------------------------------------------------------------------
# relational operators beyond the framework surface (functions/joins.py):
# as-of join, range join, semi/anti join, window functions, exact quantiles,
# pivot, positional explode — each with a DuckDB oracle.


def op_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event picks the latest order (same customer key) at
    or before its timestamp — DuckDB ``ASOF JOIN`` semantics, right side
    deduped per (key, date) keeping max o_orderkey for determinism."""
    from graphscope_ray.functions.joins import asof_join

    ev = read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    od = read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    od = od.rename_columns({"o_custkey": "user_id"})
    out = asof_join(ev, od, on="user_id", left_ts="ts", right_ts="o_orderdate").to_pandas()
    out = out[["event_id", "user_id", "o_orderkey"]].astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)


def op_asof_forward(sf_dir: str) -> pd.DataFrame:
    """FORWARD as-of join: each ORDER picks the EARLIEST event (same
    customer key) at or after its order date — the "next touchpoint after
    the conversion" join (asof_join(direction="forward")); right side
    deduped per (key, ts) keeping max event_id."""
    from graphscope_ray.functions.joins import asof_join

    od = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    ev = ev.rename_columns({"user_id": "o_custkey"})
    out = asof_join(
        od, ev, on="o_custkey", left_ts="o_orderdate", right_ts="ts",
        direction="forward",
    ).to_pandas()
    out = out[["o_orderkey", "o_custkey", "event_id"]].astype(np.int64)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def op_range_join(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: orders banded by o_totalprice against a static
    interval table, then count + sum per band."""
    from graphscope_ray.functions.joins import range_join

    bands = pd.DataFrame(
        {
            "band": ["low", "mid", "high", "top"],
            "lo": [0.0, 50_000.0, 150_000.0, 300_000.0],
            "hi": [50_000.0, 150_000.0, 300_000.0, 1e9],
        }
    )
    od = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    joined = range_join(od, bands, val_col="o_totalprice")
    out = (
        joined.groupby("band")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="sum_price"))
        .to_pandas()
    )
    out["sum_price"] = out["sum_price"].round(4)
    return out.sort_values("band").reset_index(drop=True)


def op_semi_join(sf_dir: str) -> pd.DataFrame:
    """Semi join: customers having at least one URGENT-priority order."""
    from graphscope_ray.functions.joins import semi_join

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    urgent = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    out = semi_join(cust, urgent.rename_columns({"o_custkey": "c_custkey"}), on="c_custkey")
    return out.to_pandas().sort_values("c_custkey").reset_index(drop=True)


def op_anti_join(sf_dir: str) -> pd.DataFrame:
    """Anti join: customers with NO URGENT-priority order (complement of
    op_semi_join — non-vacuous at every scale factor)."""
    from graphscope_ray.functions.joins import semi_join

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    urgent = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).filter(
        expr="o_orderpriority == '1-URGENT'"
    )
    out = semi_join(
        cust, urgent.rename_columns({"o_custkey": "c_custkey"}), on="c_custkey", anti=True
    ).to_pandas()
    if "c_custkey" not in out.columns:  # empty Dataset loses its schema
        out = pd.DataFrame(
            {"c_custkey": pd.Series([], dtype=np.int64), "c_mktsegment": pd.Series([], dtype=str)}
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


def op_window_funcs(sf_dir: str) -> pd.DataFrame:
    """Per-customer ordered window functions over orders: row_number,
    cumulative spend, previous order's price (ordered by date then key)."""
    from graphscope_ray.functions.joins import window_funcs

    od = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = window_funcs(
        od, key_col="o_custkey", order_cols=["o_orderdate", "o_orderkey"], value_col="o_totalprice"
    ).to_pandas()
    out = out[["o_orderkey", "o_custkey", "rn", "cum_value", "lag_value"]]
    out["cum_value"] = out["cum_value"].round(4)
    out["lag_value"] = out["lag_value"].fillna(-1.0).round(4)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def op_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles of events.value (quantile_disc semantics:
    1-based rank ceil(n·q)) via the 2½-pass pivot/histogram/bucket-fetch
    operator — no full materialization."""
    from graphscope_ray.functions.joins import exact_quantiles

    ev = read(sf_dir, "events", columns=["value"])
    out = exact_quantiles(ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    out["value"] = out["value"].round(8)
    return out.sort_values("q").reset_index(drop=True)


def op_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot orders: rows = o_orderpriority, columns = order status
    {F,O,P} × {count, sum(o_totalprice)}."""
    from graphscope_ray.functions.joins import pivot_agg

    od = read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    out = pivot_agg(
        od,
        row_key="o_orderpriority",
        col_key="o_orderstatus",
        categories=["F", "O", "P"],
        value_col="o_totalprice",
    ).to_pandas()
    for c in ("sum_F", "sum_O", "sum_P"):
        out[c] = out[c].round(4)
    for c in ("n_F", "n_O", "n_P"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def op_explode(sf_dir: str) -> pd.DataFrame:
    """Positional explode: documents split on single spaces → one row per
    token with its 0-based position (string_split semantics, empties kept)."""
    from graphscope_ray.functions.joins import posexplode

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = posexplode(docs, "doc_id", "text", sep=" ").to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# ML-prep operators (functions/mlprep.py): TF-IDF, bigram counts,
# per-group standardization, distributed k-means.


def text_tfidf(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.mlprep import tfidf

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = tfidf(docs).to_pandas()
    out["tfidf"] = out["tfidf"].round(8)
    out["tf"] = out["tf"].astype(np.int64)
    return out[["doc_id", "tok", "tf", "tfidf"]].sort_values(["doc_id", "tok"]).reset_index(
        drop=True
    )


def text_bigrams(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.mlprep import bigram_counts

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    out = bigram_counts(docs).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("bigram").reset_index(drop=True)


def op_zscore(sf_dir: str) -> pd.DataFrame:
    from graphscope_ray.functions.mlprep import standardize

    ev = read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    out = standardize(ev, group_col="event_type", value_col="value").to_pandas()
    out["z"] = out["z"].round(8)
    return out[["event_id", "event_type", "z"]].sort_values("event_id").reset_index(drop=True)


def op_kmeans(sf_dir: str, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the embeddings table: deterministic
    seed (k lowest vec_ids), fixed iterations, per-block partial-sum
    combine — assignment per vector."""
    from graphscope_ray.functions.mlprep import kmeans

    emb = read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    asg, _ = kmeans(emb, k=k, iters=iters)
    out = asg.to_pandas()
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def pg_pagerank(sf_dir: str, rounds: int = 10, alpha: float = 0.85) -> pd.DataFrame:
    """Property-graph PageRank (ref apps/property/ auto variants): NetworkX
    semantics over the customer→order→part labeled union graph, fixed
    rounds; isolated keys are dangling vertices (dense key spaces)."""
    g, info = _tripartite_graph(sf_dir)
    ds, _ = alg.pagerank(g, alpha=alpha, tol=0.0, max_rounds=rounds)
    out = info.split(ds.to_pandas())[["v_label", "v_key", "score"]]
    out["score"] = out["score"].round(8)
    return out.sort_values(["v_label", "v_key"]).reset_index(drop=True)


def op_count_distinct(sf_dir: str) -> pd.DataFrame:
    """Exact distributed COUNT(DISTINCT) — per-block unique + hash exchange
    (values travel, hash only routes); never collects the distinct set."""
    from graphscope_ray.functions.sketch import count_distinct_exact

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    return pd.DataFrame(
        {
            "n_parts": [count_distinct_exact(li, "l_partkey")],
            "n_supps": [count_distinct_exact(li, "l_suppkey")],
        }
    )


def op_hll_count(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """HyperLogLog estimate over l_partkey — deterministic (fmix64 hash),
    mergeable per-block register sketches; the SQL oracle replicates the
    sketch bit-for-bit (bin()-string CLZ), so even the APPROXIMATE op is
    oracle-gated."""
    from graphscope_ray.functions.sketch import hll_count

    li = read(sf_dir, "lineitem", columns=["l_partkey"])
    est = hll_count(li, "l_partkey", p=p)
    return pd.DataFrame({"estimate": [round(est, 4)]})


def op_bloom(sf_dir: str, m_bits: int = 1 << 17, k: int = 3) -> pd.DataFrame:
    """Bloom-filter membership: build the filter over orders.o_custkey
    (mergeable per-block bitmaps), probe customer.c_custkey — bloom_hit
    includes the filter's deterministic false positives, and the SQL
    oracle replicates every hash position bit-for-bit, so even the
    APPROXIMATE structure is oracle-gated (like op_hll_count)."""
    from graphscope_ray.functions.sketch import bloom_build, bloom_member

    orders = read(sf_dir, "orders", columns=["o_custkey"])
    cust = read(sf_dir, "customer", columns=["c_custkey"])
    bm = bloom_build(orders, "o_custkey", m_bits=m_bits, k=k)
    out = bloom_member(cust, bm, "c_custkey", k=k).to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def lg_kcore_size(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """K-core SEARCH (apps/flash/core/k-core-search.h GlobalRes): the size
    of the k-core — the peeling fixpoint's survivor count as one scalar."""
    df = lg_kcore(sf_dir, k=k)
    return pd.DataFrame({"core_size": [int(df["in_core"].sum())]})


def op_cms_heavy(sf_dir: str, threshold: int = 100) -> pd.DataFrame:
    """Count-min-sketch heavy-hitter tokens over documents: additively
    mergeable d×w partial sketches per block; estimates are min-over-rows
    and never undercount, so no true heavy hitter is missed."""
    from graphscope_ray.functions.sketch import cms_heavy_hitters

    docs = read(sf_dir, "documents", columns=["doc_id", "text"])
    return cms_heavy_hitters(docs, threshold=threshold)


def op_profile(sf_dir: str) -> pd.DataFrame:
    """Column profiler (DESCRIBE parity): constant-size per-block partials
    folded driver-side — count/nulls/min/max/mean per numeric column."""
    from graphscope_ray.functions.mlprep import profile_table

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = read(sf_dir, "lineitem", columns=cols)
    out = profile_table(li, cols)
    for c in ("min", "max", "mean"):
        out[c] = out[c].round(8)
    return out


def events_funnel(sf_dir: str, steps=("view", "click", "purchase")) -> pd.DataFrame:
    """Ordered funnel (MATCH_RECOGNIZE-lite): per user, how many of the
    ordered steps occur with strictly increasing timestamps (step k must
    happen AFTER the first completion of step k-1).  Per-user sequence scan
    inside `groupby.map_groups` (the sessionize contract), vectorized per
    group."""
    ev = read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def _funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        t_prev = None
        reached = 0
        for s in steps:
            m = (et == s) if t_prev is None else ((et == s) & (ts > t_prev))
            if not m.any():
                break
            t_prev = ts[m].min()
            reached += 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "steps": [reached]})

    out = ev.groupby("user_id").map_groups(_funnel, batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    out["steps"] = out["steps"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def op_full_join(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two pre-aggregated sides on nationkey (customers
    restricted to nations < 20, suppliers to ≥ 5, so each side has rows the
    other lacks): the hash-exchange join with ``how='outer'`` keeps
    unmatched rows from BOTH sides; nulls coalesce to 0 counts."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    import pyarrow.compute as pc

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.less(t["c_nationkey"], 20)), batch_format="pyarrow"
    )
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["s_nationkey"], 5)), batch_format="pyarrow"
    )
    aggc = hash_groupby_sum(cust, ["c_nationkey"], None, "n_cust", num_partitions=8)
    aggs = hash_groupby_sum(supp, ["s_nationkey"], None, "n_supp", num_partitions=8)
    j = hash_join(aggc, aggs, "c_nationkey", "s_nationkey", how="outer", num_partitions=8)

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.index
        ck = df["c_nationkey"] if "c_nationkey" in df else pd.Series(np.nan, index=idx)
        sk = df["s_nationkey"] if "s_nationkey" in df else pd.Series(np.nan, index=idx)
        return pd.DataFrame(
            {
                "nationkey": ck.fillna(sk).astype(np.int64),
                "n_cust": df.get("n_cust", pd.Series(0, index=idx)).fillna(0).astype(np.int64),
                "n_supp": df.get("n_supp", pd.Series(0, index=idx)).fillna(0).astype(np.int64),
            }
        )

    out = j.map_batches(_final, batch_format="pandas").to_pandas()
    return out.sort_values("nationkey").reset_index(drop=True)


def op_quantiles_by(sf_dir: str, qs=(0.25, 0.5, 0.9)) -> pd.DataFrame:
    """Per-group exact quantiles: quantile_disc of event value per
    event_type (joins.quantiles_by — one (key, value) exchange, vectorized
    order statistics per group)."""
    from graphscope_ray.functions.joins import quantiles_by

    ev = read(sf_dir, "events", columns=["event_type", "value"])
    out = quantiles_by(ev, "event_type", "value", list(qs)).to_pandas()
    out["value"] = out["value"].round(8)
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def _grouping_sets(sf_dir: str, sets: list[list[str]]) -> pd.DataFrame:
    """Shared ROLLUP/CUBE machinery: one streaming partial-combine aggregate
    per grouping set over orders, missing keys labeled 'ALL', unioned."""
    od = read(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def _agg(keys):
        g = (
            od.groupby(keys)
            .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="sum_price"))
            .to_pandas()
            if keys
            else pd.DataFrame(
                {
                    "n": [od.count()],
                    "sum_price": [
                        od.aggregate(Sum("o_totalprice", alias_name="s"))["s"]
                    ],
                }
            )
        )
        for c in ("o_orderpriority", "o_orderstatus"):
            if c not in g.columns:
                g[c] = "ALL"
        return g[["o_orderpriority", "o_orderstatus", "n", "sum_price"]]

    out = pd.concat([_agg(keys) for keys in sets], ignore_index=True)
    out["sum_price"] = out["sum_price"].astype(np.float64).round(4)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["o_orderpriority", "o_orderstatus"]).reset_index(drop=True)


def op_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(o_orderpriority, o_orderstatus): counts and sums at all three
    granularities, totals labeled 'ALL'."""
    return _grouping_sets(
        sf_dir,
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
    )


def op_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(o_orderpriority, o_orderstatus): the ROLLUP surface completed
    with the cross-granularity (status-only) level — all four groupings."""
    return _grouping_sets(
        sf_dir,
        [
            ["o_orderpriority", "o_orderstatus"],
            ["o_orderpriority"],
            ["o_orderstatus"],
            [],
        ],
    )


def op_left_join(sf_dir: str) -> pd.DataFrame:
    """Left outer join with aggregate fill: every customer with order count
    and total spend (0 for order-less customers) — small aggregated side
    broadcast onto the dimension scan."""
    import ray as _ray

    from graphscope_ray.utils import hash_groupby_sum

    od = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = hash_groupby_sum(od, ["o_custkey"], "o_totalprice", "spend", num_partitions=8)
    cnt = hash_groupby_sum(od, ["o_custkey"], None, "n_orders", num_partitions=8)
    adf = agg.to_pandas().merge(cnt.to_pandas(), on="o_custkey")
    keys = adf["o_custkey"].to_numpy()
    order = np.argsort(keys)
    ref = _ray.put((keys[order], adf["spend"].to_numpy()[order], adf["n_orders"].to_numpy()[order]))

    def _join(t: pa.Table) -> pa.Table:
        k_sorted, spend, n = _ray.get(ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(k_sorted, ck), max(len(k_sorted) - 1, 0))
        hit = (k_sorted[pos] == ck) if len(k_sorted) else np.zeros(len(ck), bool)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "n_orders": pa.array(np.where(hit, n[pos], 0).astype(np.int64)),
                "spend": pa.array(np.where(hit, spend[pos], 0.0)),
            }
        )

    cust = read(sf_dir, "customer", columns=["c_custkey"])
    out = cust.map_batches(_join, batch_format="pyarrow").to_pandas()
    out["spend"] = out["spend"].round(4)
    return out.sort_values("c_custkey").reset_index(drop=True)


def lg_induced_subgraph(sf_dir: str, max_oid: int = 100) -> pd.DataFrame:
    """INDUCE_SUBGRAPH (dag_utils.py:639-737 semantics on the batch engine):
    edges whose BOTH endpoints fall in the vertex set S = {oid < max_oid} —
    one streaming filter pass; no rebuild, no driver-side vertex collection
    (S here is a predicate; an explicit S would broadcast like semi_join)."""
    e = lg_edges(sf_dir)

    def _induce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.schema.names:
            return t
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((src < max_oid) & (dst < max_oid)))

    out = e.map_batches(_induce, batch_format="pyarrow").to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)
