"""Public analytical apps over a built Graph — the builtin-app surface.

Each function mirrors a reference builtin (`python/graphscope/analytical/app/
*.py` wrappers over the C++ apps listed in SURVEY.md §2.2) and returns a
``ray.data.Dataset`` of per-vertex rows in vid space (join back to oids via
``Graph.vertices_ds``).  Graph-view requirements:

The preferred build is ONE directed graph with ``store_in_edges=True``
(the GRAPE fragment shape): wcc/cdlp push along out+in edges, kcore/
triangles/lcc run on the actor-local merged undirected adjacency.  Legacy
pre-symmetrized views ('undirected' / 'undirected_multi', no in-CSR) are
also accepted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from graphscope_ray.graph.build import Graph, RunResult


def pagerank(
    g: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_rounds: int = 100,
    **run_kwargs,
) -> tuple[ray.data.Dataset, RunResult]:
    """NetworkX-semantics PageRank (apps/pagerank/pagerank_networkx.h:54-163)."""
    res = g.run_program("pagerank", alpha=alpha, tol=tol, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def wcc(g: Graph, **run_kwargs) -> tuple[ray.data.Dataset, RunResult]:
    """Weakly connected components, comp = min vid (apps/projected/wcc_projected.h:70-182)."""
    res = g.run_program("wcc", **run_kwargs)
    return g.program_state(res.name), res


def cdlp(g: Graph, max_rounds: int = 10, **run_kwargs) -> tuple[ray.data.Dataset, RunResult]:
    """LDBC community detection by label propagation (grape::CDLP semantics)."""
    res = g.run_program("cdlp", max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def sssp(g: Graph, source: int, max_rounds: int | None = None, **run_kwargs):
    res = g.run_program("sssp", source=source, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def bfs(g: Graph, source: int, depth_limit: int | None = None, **run_kwargs):
    res = g.run_program("bfs", source=source, max_rounds=depth_limit, **run_kwargs)
    return g.program_state(res.name), res


def hits(g: Graph, tol: float = 1e-8, max_rounds: int = 100, **run_kwargs):
    assert g.has_in, "hits needs build_graph(store_in_edges=True)"
    res = g.run_program("hits", tol=tol, max_rounds=2 * max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def kcore(g: Graph, k: int, **run_kwargs):
    res = g.run_program("kcore", k=k, **run_kwargs)
    return g.program_state(res.name), res


def eigenvector_centrality(g: Graph, tol: float = 1e-9, max_rounds: int = 100, **run_kwargs):
    res = g.run_program("eigenvector", tol=tol, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def katz_centrality(
    g: Graph, alpha: float = 0.1, beta: float = 1.0, tol: float = 1e-9, max_rounds: int = 1000, **run_kwargs
):
    res = g.run_program("katz", alpha=alpha, beta=beta, tol=tol, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def triangles(g: Graph, dense_threshold: int = 16384) -> tuple[int, ray.data.Dataset]:
    """Exact triangle counts: (global_count, per-vertex Dataset(vid, tri, deg))."""
    assert g.view == "undirected" or g.has_in, (
        "triangles needs the 'undirected' view or a directed graph built with "
        "store_in_edges=True"
    )
    return g.triangles(dense_threshold=dense_threshold)


def lcc(g: Graph) -> ray.data.Dataset:
    """Local clustering coefficient lcc = 2·tri / (deg·(deg-1)) on the
    undirected adjacency (apps/clustering/*.h LCC semantics)."""
    _, per_vertex = triangles(g)

    def _lcc(t: pa.Table) -> pa.Table:
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        tri = t["tri"].to_numpy(zero_copy_only=False).astype(np.float64)
        denom = deg * (deg - 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(denom > 0, 2.0 * tri / denom, 0.0)
        return pa.table({"vid": t["vid"], "lcc": pa.array(v)})

    return per_vertex.map_batches(_lcc, batch_format="pyarrow")


def degree_centrality(g: Graph) -> ray.data.Dataset:
    """degree / (N-1) (apps/centrality/degree semantics, directed: out+in?
    Here: degree on the built view — callers pick the view)."""
    N = max(g.N, 2)

    def _dc(t: pa.Table) -> pa.Table:
        d = t["out_deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"vid": t["vid"], "degree": t["out_deg"], "centrality": pa.array(d / (N - 1))}
        )

    return g.degrees().map_batches(_dc, batch_format="pyarrow")


def export_golden(
    g: Graph, ds: ray.data.Dataset, value_col: str, path: str, float_fmt: str = "%.9g"
) -> str:
    """Write per-vertex results in the reference's golden-file format: one
    ``oid value`` line per vertex, numerically sorted by oid — byte-comparable
    against `cat out/* | sort -k1n` of the reference's fragment outputs
    (analytical_engine/test/app_tests.sh:115-125, run_app.h:156-183).
    Also writes the same rows as Parquet next to it."""
    df = ds.to_pandas()
    if g.vertices_ds is not None:
        vmap = g.vertices_ds.to_pandas()
        df = df.merge(vmap, on="vid")[["oid", value_col]]
    else:
        df = df.rename(columns={"vid": "oid"})[["oid", value_col]]
    df = df.sort_values("oid")
    with open(path, "w") as fh:
        for oid, v in zip(df["oid"], df[value_col]):
            if isinstance(v, float):
                fh.write(f"{oid} {float_fmt % v}\n")
            else:
                fh.write(f"{oid} {v}\n")
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    _pq.write_table(_pa.Table.from_pandas(df, preserve_index=False), path + ".parquet")
    return path


def voterank(g: Graph, num_elected: int = 10) -> list[int]:
    """Elect the top-k influencers by iterative voting (apps/voterank
    semantics, deterministic min-vid tie-break); returns elected vids in
    order.  Two supersteps per election (apply decrement, vote)."""
    import ray as _ray

    degs = _ray.get([a.tri_state_degrees.remote() for a in g.actors])
    total_deg = sum(int(t["deg"].to_numpy().sum()) for t in degs)
    avg_deg = total_deg / max(g.N, 1)
    f = 1.0 / avg_deg if avg_deg else 0.0
    name = "voterank"
    _ray.get([a.p_init.remote(name, "voterank", {"f": f}) for a in g.actors])
    elected: list[int] = []
    last = -1
    for i in range(num_elected):
        for phase in (0, 1):
            step = 2 * i + phase
            glob = {"elected_vid": last}
            refs = [a.p_scatter_all.remote(name, step, glob) for a in g.actors]
            stats = _ray.get(
                [q.p_gather_shared.remote(name, step, glob, *refs) for q in g.actors]
            )
        cands = [(s["cand_score"], s["cand_vid"]) for s in stats if s.get("cand_vid", -1) >= 0]
        if not cands:
            break
        best = max(cands, key=lambda sv: (sv[0], -sv[1]))  # max score, tie → min vid
        if best[0] <= 0:
            break
        last = best[1]
        elected.append(last)
    return elected


def betweenness_sampled(
    g: Graph, sources: list[int] | None = None, num_sources: int = 8, seed: int = 0
) -> ray.data.Dataset:
    """Brandes betweenness restricted to sampled sources (exact for
    sources=range(N)); directed, unnormalized, endpoints excluded.  Each
    source costs ~2·diameter supersteps."""
    import ray as _ray

    assert g.has_in, "betweenness needs build_graph(store_in_edges=True)"
    if sources is None:
        rng = np.random.RandomState(seed)
        sources = rng.choice(g.N, size=min(num_sources, g.N), replace=False).tolist()
    name = "brandes"
    acts = g.actors
    _ray.get([a.p_init.remote(name, "brandes", {}) for a in acts])

    def _round(glob):
        refs = [a.p_scatter_all.remote(name, 0, glob) for a in acts]
        return _ray.get([q.p_gather_shared.remote(name, 0, glob, *refs) for q in acts])

    for s in sources:
        _round({"op": "reset", "source": int(s)})
        k = 0
        while True:
            stats = _round({"op": "fwd", "k": k})
            if sum(st.get("new", 0) for st in stats) == 0:
                break
            k += 1
        for kb in range(k, 0, -1):
            _round({"op": "bwd", "k": kb})
        _round({"op": "finish", "source": int(s)})
    return g.program_state(name)


def closeness_sampled(
    g: Graph, num_sources: int = 8, seed: int = 0, sources: list[int] | None = None
) -> ray.data.Dataset:
    """Approximate (harmonic) closeness from k BFS sources, all batched in
    ONE multi-source-BFS superstep wave (VERDICT r1 #5 fix — no per-source
    driver round-trips): c(v) = Σ_s 1/d(s,v) / k."""
    if sources is None:
        rng = np.random.RandomState(seed)
        sources = rng.choice(g.N, size=min(num_sources, g.N), replace=False).tolist()
    res = g.run_program("msbfs", name="closeness_ms", sources=[int(s) for s in sources])
    k = max(len(sources), 1)

    def _c(t: pa.Table) -> pa.Table:
        inv = t["sum_inv"].to_numpy(zero_copy_only=False)
        return pa.table({"vid": t["vid"], "closeness": pa.array(inv / k)})

    return g.program_state(res.name).map_batches(
        lambda t: _c(t.select(["vid", "sum_inv"])), batch_format="pyarrow"
    )


def closeness_exact(
    g: Graph, harmonic: bool = True, chunk: int = 128
) -> ray.data.Dataset:
    """Exact closeness centrality over ALL sources via chunked multi-source
    BFS — ceil(N/chunk) waves of ~diameter supersteps total (the batched
    equivalent of apps/apsp/all_pairs_shortest_path_length.h used per-vertex).
    harmonic=True: c(v) = Σ_{s≠v} 1/d(s,v) / (N-1); otherwise the
    Wasserman–Faust improved formula used by networkx
    ((r-1)/(N-1)) · ((r-1)/Σd) with r = #vertices reaching v."""
    N = g.N
    sum_inv = np.zeros(N)
    sum_d = np.zeros(N)
    n_reach = np.zeros(N, dtype=np.int64)
    for off in range(0, N, chunk):
        srcs = list(range(off, min(off + chunk, N)))
        res = g.run_program("msbfs", name=f"msbfs_{off}", sources=srcs)
        df = (
            g.program_state(res.name)
            .select_columns(["vid", "sum_inv", "sum_d", "n_reach"])
            .to_pandas()
        )
        vids = df["vid"].to_numpy()
        sum_inv[vids] += df["sum_inv"].to_numpy()
        sum_d[vids] += df["sum_d"].to_numpy()
        n_reach[vids] += df["n_reach"].to_numpy()
    denom = max(N - 1, 1)
    if harmonic:
        c = sum_inv / denom
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(
                sum_d > 0, (n_reach / denom) * (n_reach / np.maximum(sum_d, 1e-300)), 0.0
            )
    return ray.data.from_arrow(
        pa.table({"vid": pa.array(np.arange(N, dtype=np.int64)), "closeness": pa.array(c)})
    )


def apsp(g: Graph, sources: list[int], max_chunk: int = 64) -> ray.data.Dataset:
    """All-pairs shortest path lengths restricted to the given source vids
    (apps/apsp/all_pairs_shortest_path_length.h parity): rows
    (src, dst, dist) for every reached pair, via multi-source BFS chunks."""
    out_tables = []
    for off in range(0, len(sources), max_chunk):
        chunk = [int(s) for s in sources[off : off + max_chunk]]
        res = g.run_program("msbfs", name=f"apsp_{off}", sources=chunk)
        cols = ["vid"] + [f"d{i}" for i in range(len(chunk))]
        df = g.program_state(res.name).select_columns(cols).to_pandas()
        vids = df["vid"].to_numpy()
        for i, s in enumerate(chunk):
            d = df[f"d{i}"].to_numpy()
            m = np.isfinite(d)
            out_tables.append(
                pa.table(
                    {
                        "src": pa.array(np.full(int(m.sum()), s, dtype=np.int64)),
                        "dst": pa.array(vids[m]),
                        "dist": pa.array(d[m].astype(np.int64)),
                    }
                )
            )
    return ray.data.from_arrow(pa.concat_tables(out_tables))


def kshell(g: Graph) -> ray.data.Dataset:
    """K-shell decomposition: shell(v) = its core number (the largest k such
    that v survives k-core peeling; apps/kshell/kshell.h semantics).  One
    persistent peeling state; the driver raises k when the peel stabilizes."""
    import ray as _ray

    name = "kshell"
    acts = g.actors
    stats = _ray.get([a.p_init.remote(name, "kshell", {}) for a in acts])
    alive = sum(s["alive"] for s in stats)
    k, step = 1, 0
    while alive > 0:
        glob = {"k": k}
        refs = [a.p_scatter_all.remote(name, step, glob) for a in acts]
        stats = _ray.get(
            [q.p_gather_shared.remote(name, step, glob, *refs) for q in acts]
        )
        step += 1
        removed = sum(s["removed"] for s in stats)
        alive = sum(s["alive"] for s in stats)
        if removed == 0:
            k += 1
    return g.program_state(name).select_columns(["vid", "shell"])


def dfs(g: Graph, source: int = 0) -> ray.data.Dataset:
    """DFS preorder from ``source`` with ascending-vid neighbor order —
    inherently sequential (the reference's apps/dfs/dfs.h passes a single
    token vertex-to-vertex the same way); the adjacency is collected once
    and walked driver-side, valid for graphs whose edge list fits the
    driver (guarded)."""
    import ray as _ray

    assert g.num_edges <= 50_000_000, "dfs is sequential; edge list must fit the driver"
    tables = _ray.get([a.edges_table.remote() for a in g.actors])
    t = pa.concat_tables(tables)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(g.N + 1))
    seen = np.zeros(g.N, dtype=bool)
    order_out = np.full(g.N, -1, dtype=np.int64)
    parent = np.full(g.N, -1, dtype=np.int64)
    stack = [(int(source), -1)]
    cnt = 0
    while stack:
        v, p = stack.pop()
        if seen[v]:
            continue
        seen[v] = True
        parent[v] = p
        order_out[v] = cnt
        cnt += 1
        nbrs = dst[indptr[v] : indptr[v + 1]]
        for w in nbrs[::-1]:  # reversed push → ascending-vid visit order
            if not seen[w]:
                stack.append((int(w), v))
    m = seen
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(np.flatnonzero(m).astype(np.int64)),
                "order": pa.array(order_out[m]),
                "parent": pa.array(parent[m]),
            }
        )
    )


def transitivity(g: Graph) -> float:
    """Global transitivity = 3·triangles / open+closed wedges (undirected view)."""
    total, per_vertex = triangles(g)
    wedges = per_vertex.map_batches(
        lambda t: pa.table(
            {
                "w": pc.multiply(
                    pc.cast(t["deg"], pa.float64()),
                    pc.cast(pc.subtract(t["deg"], 1), pa.float64()),
                )
            }
        ),
        batch_format="pyarrow",
    ).sum("w")
    wedges = (wedges or 0) / 2.0
    return float(3.0 * total / wedges) if wedges else 0.0


def avg_clustering(g: Graph) -> float:
    ds = lcc(g)
    n = max(g.N, 1)
    return float((ds.sum("lcc") or 0.0) / n)
