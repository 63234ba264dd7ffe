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


def pagerank_weighted(
    g: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_rounds: int = 100,
    **run_kwargs,
) -> tuple[ray.data.Dataset, RunResult]:
    """Weight-proportional PageRank (networkx pagerank(weight=...)) over a
    graph built with build_graph(weight=True)."""
    res = g.run_program(
        "pagerank_weighted", alpha=alpha, tol=tol, max_rounds=max_rounds, **run_kwargs
    )
    return g.program_state(res.name), res


def ppr_seeds(
    g: Graph, seeds: list[int], max_rounds: int = 10, **run_kwargs
) -> tuple[ray.data.Dataset, RunResult]:
    """Seed-set personalized PageRank (programs.PprSeeds — community-seed
    expansion; reduces to FLASH ppr at |seeds| = 1)."""
    res = g.run_program(
        "ppr_seeds", seeds=[int(s) for s in seeds], max_rounds=max_rounds, **run_kwargs
    )
    return g.program_state(res.name), res


def pagerank_push(
    g: Graph,
    alpha: float = 0.85,
    tol: float = 0.0,
    max_rounds: int = 15,
    **run_kwargs,
) -> tuple[ray.data.Dataset, RunResult]:
    """Push/delta PageRank (programs.PageRankPush — the registry's
    ``pagerank_push`` execution-strategy variant; Neumann partial sum,
    converges to the same networkx fixed point)."""
    res = g.run_program(
        "pagerank_push", alpha=alpha, tol=tol, max_rounds=max_rounds, **run_kwargs
    )
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


def sssp_delta(g: Graph, source: int, delta: float = 2.0, **run_kwargs):
    """Delta-stepping SSSP (programs.SsspDelta — the registry's ``sssp_dlt``
    execution-strategy variant; exact, bit-identical distances to sssp)."""
    res = g.run_program("sssp_delta", source=source, delta=delta, **run_kwargs)
    return g.program_state(res.name), res


def bfs(g: Graph, source: int, depth_limit: int | None = None, **run_kwargs):
    res = g.run_program("bfs", source=source, max_rounds=depth_limit, **run_kwargs)
    return g.program_state(res.name), res


def hits(g: Graph, tol: float = 1e-8, max_rounds: int = 100, **run_kwargs):
    assert g.has_in, "hits needs build_graph(store_in_edges=True)"
    res = g.run_program("hits", tol=tol, max_rounds=2 * max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def lpa_u2i(
    g: Graph,
    user_labels: np.ndarray,
    max_round: int = 20,
    **run_kwargs,
) -> tuple[ray.data.Dataset, RunResult]:
    """Property-graph label propagation over a bipartite U→I graph
    (apps/lpa/lpa_u2i.h, context lpa_u2i_context.h) — vids [0, n_users)
    are Users, the rest Items; ``user_labels`` is the (n_users, prop_num)
    initial label matrix (values exactly 0/1 are pinned seeds).

    Returns the per-USER label columns after ``max_round`` reference rounds
    (the reference's LPAU2IContext output writes label_0..label_{p-1} for
    vertex label 0 only, lpa_u2i_context.h:62-66)."""
    assert g.has_in, "lpa_u2i needs build_graph(store_in_edges=True)"
    user_labels = np.asarray(user_labels, dtype=np.float64)
    n_users = user_labels.shape[0]
    full = np.zeros((g.N, user_labels.shape[1]))
    full[:n_users] = user_labels
    res = g.run_program(
        "lpa_u2i",
        labels_ref=ray.put(full),
        n_users=n_users,
        max_rounds=max_round,
        **run_kwargs,
    )
    users = g.program_state(res.name).filter(
        expr=f"vid < {n_users}"
    )
    return users, res


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


def ppr(g: Graph, source: int = 0, max_rounds: int = 10, **run_kwargs):
    """FLASH personalized PageRank (apps/flash/ranking/ppr.h:41-72)."""
    res = g.run_program("ppr", source=source, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def articlerank(g: Graph, damping: float = 0.85, max_rounds: int = 10, **run_kwargs):
    """FLASH ArticleRank (apps/flash/ranking/articlerank.h:42-74)."""
    res = g.run_program("articlerank", damping=damping, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res


def min_cover_greedy(g: Graph, **run_kwargs):
    """FLASH greedy vertex cover (apps/flash/matching/min-cover-greedy.h)."""
    res = g.run_program("mincover", **run_kwargs)
    return g.program_state(res.name), res


def min_dominating_set(g: Graph, **run_kwargs):
    """FLASH greedy dominating set (apps/flash/matching/min-dominating-set.h)."""
    res = g.run_program("dominating", **run_kwargs)
    return g.program_state(res.name), res


def min_edge_cover(g: Graph) -> dict:
    """Minimum edge cover size from the deterministic maximal matching
    (apps/flash/matching/min-edge-cover.h:82-88 final count: matched
    pairs + one edge per unmatched non-isolated vertex; the matching
    itself is our mutual max-id handshake ``mm`` rather than the
    reference's pointer-chase greedy — same maximal-matching family)."""
    ds, _ = matching(g)
    df = ds.to_pandas()
    degs = ray.get([a.tri_state_degrees.remote() for a in g.actors])
    deg = pa.concat_tables(degs).to_pandas()
    m = df.merge(deg, on="vid")
    matched = int((m["mate"] >= 0).sum()) // 2
    extra = int(((m["mate"] < 0) & (m["deg"] > 0)).sum())
    return {"n_edge_cover": matched + extra}


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


def edge_betweenness_sampled(
    g: Graph, sources: list[int] | None = None, num_sources: int = 8, seed: int = 0
) -> ray.data.Dataset:
    """Per-EDGE Brandes betweenness restricted to sampled sources (networkx
    ``edge_betweenness_centrality`` semantics at sources=range(N); directed,
    unnormalized).  Same superstep structure as :func:`betweenness_sampled`
    plus one published-values round per source — per-edge scoring stays
    fragment-local (see programs.BrandesEdge); returns (src, dst, ebc) in
    vid space."""
    import ray as _ray

    assert g.has_in, "edge betweenness needs build_graph(store_in_edges=True)"
    if sources is None:
        rng = np.random.RandomState(seed)
        sources = rng.choice(g.N, size=min(num_sources, g.N), replace=False).tolist()
    name = "brandes_edge"
    acts = g.actors
    _ray.get([a.p_init.remote(name, "brandes_edge", {}) for a in acts])

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
        pubs = [a.p_method.remote(name, "publish_vals") for a in acts]
        _ray.get([a.p_method.remote(name, "edge_accumulate", *pubs) for a in acts])
    return ray.data.from_arrow_refs([a.p_method.remote(name, "edge_state") for a in acts])


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
    import ray as _ray

    N = g.N
    # the per-vertex partials (sum_inv / sum_d / n_reach) accumulate ON the
    # fragments across MsBfs waves (p_accumulate) — the driver holds no O(N)
    # arrays and moves no per-vertex state between waves (VERDICT r3 #4)
    acc = "closeness_acc"
    _ray.get([a.acc_drop.remote(acc) for a in g.actors])
    for off in range(0, N, chunk):
        srcs = list(range(off, min(off + chunk, N)))
        name = f"msbfs_{off}"
        g.run_program("msbfs", name=name, sources=srcs)
        _ray.get(
            [a.p_accumulate.remote(acc, name, ["sum_inv", "sum_d", "n_reach"]) for a in g.actors]
        )
    denom = max(N - 1, 1)

    def _c(t: pa.Table) -> pa.Table:
        inv = t["sum_inv"].to_numpy(zero_copy_only=False)
        sd = t["sum_d"].to_numpy(zero_copy_only=False)
        nr = t["n_reach"].to_numpy(zero_copy_only=False)
        if harmonic:
            c = inv / denom
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(sd > 0, (nr / denom) * (nr / np.maximum(sd, 1e-300)), 0.0)
        return pa.table({"vid": t["vid"], "closeness": pa.array(c)})

    out = (
        ray.data.from_arrow_refs([a.acc_state.remote(acc) for a in g.actors])
        .map_batches(_c, batch_format="pyarrow")
        .materialize()
    )
    _ray.get([a.acc_drop.remote(acc) for a in g.actors])
    return out


def apsp(
    g: Graph, sources: list[int], max_chunk: int = 64, weighted: bool = False
) -> ray.data.Dataset:
    """All-pairs shortest path lengths restricted to the given source vids
    (apps/apsp/all_pairs_shortest_path_length.h parity): rows
    (src, dst, dist) for every reached pair, via multi-source BFS chunks.
    ``weighted=True`` runs the batched Bellman-Ford variant ("mssp") over
    the graph's edge weights instead (apps/sssp/sssp_average_length.h
    semantics); dist is then a float64 weighted distance."""
    out_tables = []
    dist_t = np.float64 if weighted else np.int64
    for off in range(0, len(sources), max_chunk):
        chunk = [int(s) for s in sources[off : off + max_chunk]]
        prog = "mssp" if weighted else "msbfs"
        res = g.run_program(prog, name=f"apsp_{prog}_{off}", sources=chunk)
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
                        "dist": pa.array(d[m].astype(dist_t)),
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


def all_simple_paths(
    g: Graph,
    source: int,
    targets: list[int],
    cutoff: int | None = None,
) -> list[list[int]]:
    """All simple paths from ``source`` to any of ``targets`` with at most
    ``cutoff`` edges (apps/simple_path/all_simple_paths.h semantics == nx
    all_simple_paths).  Distributed part mirrors the reference: a BFS wave
    prunes to the ≤cutoff-reachable subgraph, whose edge map is collected to
    the driver (the reference collects it to the source fragment,
    all_simple_paths.h:145-153); enumeration is a sequential DFS there
    (writeToCtx/generatePath, :174-240)."""
    import ray as _ray

    if cutoff is None:
        cutoff = g.N - 1
    tset = set(int(t) for t in targets)
    ds, _ = bfs(g, source=source)
    dep = ds.to_pandas()
    keep = dep.loc[(dep["depth"] >= 0) & (dep["depth"] <= cutoff), "vid"].to_numpy()
    keep_ref = _ray.put(np.sort(keep))

    def _prune(t: pa.Table) -> pa.Table:
        arr = _ray.get(keep_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(arr, src)
        ok = (j < arr.size) & (arr[np.minimum(j, arr.size - 1)] == src)
        return t.select(["src", "dst"]).filter(pa.array(ok))

    sub = (
        ray.data.from_arrow_refs([a.edges_table.remote() for a in g.actors])
        .map_batches(_prune, batch_format="pyarrow")
        .to_pandas()
    )
    src, dst = sub["src"].to_numpy(), sub["dst"].to_numpy()
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(g.N + 1))

    paths: list[list[int]] = []
    on_path = np.zeros(g.N, dtype=bool)
    path = [int(source)]
    on_path[source] = True

    def _dfs(v: int):
        depth = len(path) - 1  # edges so far
        for w in dst[indptr[v] : indptr[v + 1]]:
            w = int(w)
            if on_path[w]:
                continue
            if w in tset:
                paths.append(path + [w])
            if depth + 1 < cutoff:
                path.append(w)
                on_path[w] = True
                _dfs(w)
                path.pop()
                on_path[w] = False

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, cutoff + 100))
    try:
        if cutoff >= 1:
            _dfs(int(source))
    finally:
        sys.setrecursionlimit(old)
    return paths


def is_simple_path(g: Graph, path: list[int]) -> bool:
    """apps/simple_path/is_simple_path.h: the vid list is a simple path iff
    all vertices exist and are distinct and every consecutive pair is an
    edge — checked with REPORT_GRAPH point RPCs."""
    if len(path) == 0:
        return False
    if len(set(path)) != len(path):
        return False
    if not all(g.has_node(int(v)) for v in path):
        return False
    return all(g.has_edge(int(u), int(v)) for u, v in zip(path, path[1:]))


def path_enumeration(
    g: Graph,
    length: int,
    start_filter: int | None = None,
) -> ray.data.Dataset:
    """k-hop path enumeration by iterative distributed joins — the
    single-label analogue of apps/sampling_path/sampling_path.h (which
    expands label-constrained paths hop by hop, shipping partial paths to
    the frontier owner; here the partial-path table is hash-joined against
    the edge table per hop, SURVEY §2 'iterative joins with path-state
    lists').  Returns columns v0..v{length}; ``start_filter`` keeps only
    paths with v0 < start_filter (bounds the result)."""
    from graphscope_ray.utils import hash_join

    edges = ray.data.from_arrow_refs([a.edges_table.remote() for a in g.actors])
    edges = edges.map_batches(
        lambda t: t.select(["src", "dst"]), batch_format="pyarrow"
    ).materialize()
    paths = edges.map_batches(
        lambda t: t.rename_columns(["v0", "v1"]), batch_format="pyarrow"
    )
    if start_filter is not None:
        paths = paths.filter(expr=f"v0 < {start_filter}")
    paths = paths.materialize()
    for hop in range(2, length + 1):
        joined = hash_join(
            paths,
            edges.map_batches(
                lambda t, h=hop: t.rename_columns(["__s", f"v{h}"]),
                batch_format="pyarrow",
            ),
            f"v{hop - 1}",
            "__s",
            num_partitions=max(8, g.P),
        )
        paths = joined.drop_columns(["__s"]).materialize()
    return paths


def _louvain_numpy(src, dst, w, n, self_w=None, max_passes: int = 20):
    """Sequential weighted Louvain phase-1 on a symmetric edge list (the
    coarse levels after the distributed level-0 — orders of magnitude
    smaller).  Deterministic: ascending vertex order, ties → smallest
    community.  Returns (comm, modularity)."""
    order = np.argsort(src, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    indptr = np.searchsorted(src, np.arange(n + 1))
    self_w = self_w if self_w is not None else np.zeros(n)
    k = np.zeros(n)
    np.add.at(k, src, w)
    k += 2.0 * self_w
    m2 = k.sum()
    if m2 == 0:
        return np.arange(n, dtype=np.int64), 0.0
    comm = np.arange(n, dtype=np.int64)
    tot = k.copy()
    for _ in range(max_passes):
        moves = 0
        for v in range(n):
            nbr = dst[indptr[v] : indptr[v + 1]]
            wv = w[indptr[v] : indptr[v + 1]]
            if nbr.size == 0:
                continue
            cs, inv = np.unique(comm[nbr], return_inverse=True)
            kvc = np.zeros(len(cs))
            np.add.at(kvc, inv, wv)
            a = comm[v]
            ai = np.searchsorted(cs, a)
            in_a = kvc[ai] if ai < len(cs) and cs[ai] == a else 0.0
            tot[a] -= k[v]
            gain = kvc - k[v] * tot[cs] / m2
            stay = in_a - k[v] * tot[a] / m2
            o = np.lexsort((cs, -gain))
            best = o[0]
            if gain[best] > stay + 1e-12 and cs[best] != a:
                comm[v] = cs[best]
                tot[cs[best]] += k[v]
                moves += 1
            else:
                tot[a] += k[v]
        if moves == 0:
            break
    # modularity
    within = (comm[src] == comm[dst])
    s_in = w[within].sum() + 2.0 * self_w.sum()
    ctot = np.zeros(n)
    np.add.at(ctot, comm, k)
    q = s_in / m2 - ((ctot / m2) ** 2).sum()
    return comm, float(q)


def louvain(
    g: Graph, max_move_rounds: int = 64, max_levels: int = 10
) -> tuple[ray.data.Dataset, float]:
    """Louvain community detection (ref apps/pregel/louvain/louvain.h):
    level 0 (the full graph) runs DISTRIBUTED synchronous local moves with
    parity alternation — neighbors' community labels travel as pre-combined
    CDLP-style counts, and the community-degree table Σtot lives SHARDED on
    the fragments (owner = c % P): contributions are exchanged pre-combined
    fragment-to-fragment and move rules fetch exactly the entries they need
    (see _louvain_move_rounds — no driver-side vertex-sized array anywhere).
    Coarser levels (communities, orders of magnitude smaller) aggregate the
    edge list by community pair — per-fragment packed-key combine, tiny
    driver merge — and refine with a sequential weighted Louvain, exactly
    like the reference runs phase 2 on the contracted graph.  Returns
    (Dataset(vid, comm), modularity); community ids are canonical
    min-member original vids."""
    import ray as _ray

    name = "louvain0"
    acts = g.actors
    N = g.N
    # m = undirected edge count (each edge counted once)
    m = sum(_ray.get([a.num_undirected_edges.remote() for a in acts])) / 2.0
    if m == 0:
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(np.arange(N, dtype=np.int64)),
                    "comm": pa.array(np.arange(N, dtype=np.int64)),
                }
            )
        )
        return ds, 0.0
    _ray.get([a.p_init.remote(name, "louvain_move", {"m": m}) for a in acts])
    _louvain_move_rounds(g, name, max_move_rounds)

    # ---- contract to the community graph.  Driver state from here on is
    # O(#communities), never O(N): pair weights and min-member vids arrive
    # pre-combined from the fragments (one more label-exchange wave), and
    # the final per-vertex labels are applied fragment-side via an
    # O(#communities) relabel table.
    P = g.P
    refs = [a.p_scatter_all.remote(name, max_move_rounds, {}) for a in acts]
    pair_parts = _ray.get([a.p_call.remote(name, "contract_pairs", *refs) for a in acts])
    mv_parts = _ray.get([a.p_call.remote(name, "comm_min_vid") for a in acts])
    keys = np.concatenate([p[0] for p in pair_parts])
    cnts = np.concatenate([p[1] for p in pair_parts]) / 2.0
    o = np.argsort(keys, kind="stable")
    keys, cnts = keys[o], cnts[o]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(keys) != 0) + 1]).astype(np.int64)
    uk = keys[starts]
    w_pair = np.add.reduceat(cnts, starts)
    lo = (uk >> np.uint64(32)).astype(np.int64)
    hi = (uk & np.uint64(0xFFFFFFFF)).astype(np.int64)
    # community universe + min member vid per community (covers isolated
    # communities too — every owned vertex contributes to comm_min_vid)
    mc_ids = np.concatenate([p[0] for p in mv_parts])
    mc_min = np.concatenate([p[1] for p in mv_parts])
    o = np.argsort(mc_ids, kind="stable")
    mc_ids, mc_min = mc_ids[o], mc_min[o]
    cstarts = np.concatenate([[0], np.flatnonzero(np.diff(mc_ids) != 0) + 1]).astype(np.int64)
    cids = mc_ids[cstarts]
    min_vid_c0 = np.minimum.reduceat(mc_min, cstarts)
    nc = len(cids)
    lo_d, hi_d = np.searchsorted(cids, lo), np.searchsorted(cids, hi)
    self_m = lo_d == hi_d
    self_w = np.zeros(nc)
    np.add.at(self_w, lo_d[self_m], w_pair[self_m])
    es, ed, ew = lo_d[~self_m], hi_d[~self_m], w_pair[~self_m]
    src2 = np.concatenate([es, ed])
    dst2 = np.concatenate([ed, es])
    w2 = np.concatenate([ew, ew])
    cmap = np.arange(nc, dtype=np.int64)  # dense level-0 community → coarse id
    for _ in range(max_levels):
        c2, q = _louvain_numpy(src2, dst2, w2, nc, self_w=self_w)
        if (c2 == np.arange(nc)).all():
            break
        # contract again
        cids2 = np.unique(c2)
        nc2 = len(cids2)
        cmap = np.searchsorted(cids2, c2[cmap])
        cs2 = np.searchsorted(cids2, c2[src2])
        cd2 = np.searchsorted(cids2, c2[dst2])
        sm = cs2 == cd2
        new_self = np.zeros(nc2)
        np.add.at(new_self, cs2[sm], w2[sm] / 2.0)
        old_self = np.zeros(nc2)
        np.add.at(old_self, np.searchsorted(cids2, c2), self_w)
        self_w = new_self + old_self
        keys2 = cs2[~sm].astype(np.uint64) << np.uint64(32) | cd2[~sm].astype(np.uint64)
        uk2, inv2 = np.unique(keys2, return_inverse=True)
        w_agg = np.zeros(len(uk2))
        np.add.at(w_agg, inv2, w2[~sm])
        src2 = (uk2 >> np.uint64(32)).astype(np.int64)
        dst2 = (uk2 & np.uint64(0xFFFFFFFF)).astype(np.int64)
        w2 = w_agg
        nc = nc2
    # canonical labels: min original vid per FINAL community, composed down
    # to level-0 community ids and applied on the fragments
    canon = np.full(int(cmap.max()) + 1 if cmap.size else 1, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(canon, cmap, min_vid_c0)
    labels = canon[cmap]  # level-0 community (dense rank in cids) → label
    cids_ref, labels_ref = _ray.put(cids), _ray.put(labels)
    _ray.get([a.p_call.remote(name, "relabel", cids_ref, labels_ref) for a in acts])
    return g.program_state(name), float(q)


def _louvain_move_rounds(g: Graph, name: str, max_move_rounds: int) -> int:
    """Drive LouvainMove supersteps with the fully fragment-to-fragment Σtot
    exchange — the driver only routes object refs (6 waves/round: contrib →
    fold → scatter → prepare → lookup → finish; actor tasks from one caller
    execute in submission order, so fold always lands before lookup).
    Returns the number of rounds executed."""
    import ray as _ray

    acts = g.actors
    P = g.P
    idle = 0
    rounds = 0
    for step in range(max_move_rounds):
        rounds += 1
        if P == 1:
            a = acts[0]
            c = a.p_call.remote(name, "tot_contrib_parts")
            a.p_call.remote(name, "fold_tot", c)
            refs = [a.p_scatter_all.remote(name, step, {})]
            req = a.p_call.remote(name, "gather_prepare", step, *refs)
            vals = a.p_call.remote(name, "tot_lookup", req)
            stats = _ray.get([a.p_call.remote(name, "gather_finish", step, vals)])
        else:
            creq = [
                a.p_call.options(num_returns=P).remote(name, "tot_contrib_parts")
                for a in acts
            ]
            for o_ in range(P):
                acts[o_].p_call.remote(
                    name, "fold_tot", *[creq[q][o_] for q in range(P)]
                )
            refs = [a.p_scatter_all.remote(name, step, {}) for a in acts]
            preq = [
                a.p_call.options(num_returns=P).remote(name, "gather_prepare", step, *refs)
                for a in acts
            ]
            lresp = [
                acts[o_].p_call.options(num_returns=P).remote(
                    name, "tot_lookup", *[preq[q][o_] for q in range(P)]
                )
                for o_ in range(P)
            ]
            stats = _ray.get(
                [
                    acts[p].p_call.remote(
                        name, "gather_finish", step, *[lresp[o_][p] for o_ in range(P)]
                    )
                    for p in range(P)
                ]
            )
        moves = sum(s["moves"] for s in stats)
        idle = idle + 1 if moves == 0 else 0
        if idle >= 2:  # both parities stable
            break
    return rounds


def louvain_level1(g: Graph) -> ray.data.Dataset:
    """ONE deterministic synchronous Louvain move round, every vertex active
    (no parity), ties → smallest community — the driver-checkable variant
    with an exact unrolled SQL oracle (oracle_sql.lg_louvain_level1_sql).
    Returns Dataset(vid, comm) with raw community ids (initial community =
    own vid, so labels are vids)."""
    import ray as _ray

    name = "louvain_l1"
    acts = g.actors
    m = sum(_ray.get([a.num_undirected_edges.remote() for a in acts])) / 2.0
    if m == 0:
        N = g.N
        return ray.data.from_arrow(
            pa.table(
                {
                    "vid": pa.array(np.arange(N, dtype=np.int64)),
                    "comm": pa.array(np.arange(N, dtype=np.int64)),
                }
            )
        )
    _ray.get([a.p_init.remote(name, "louvain_move", {"m": m, "parity": False}) for a in acts])
    _louvain_move_rounds(g, name, 1)
    return g.program_state(name)


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


def ktruss(edges: ray.data.Dataset, k: int, max_rounds: int = 50) -> ray.data.Dataset:
    """k-truss: the maximal subgraph where every edge closes ≥ k-2 triangles
    (the FLASH suite's truss decomposition building block, ref
    apps/flash/).  Expressed Ray-Data-first as iterative distributed
    dataflow — per round:

      1. degree-ordered orientation (a→b iff deg(a)<deg(b), id tie-break —
         the same wedge-capping trick as the triangle counter) via two
         hash_joins of the surviving undirected edges against their degree
         table,
      2. triangle enumeration oe(a,b) ⋈ oe(b,c) ⋈ oe(a,c) with hash_join,
      3. per-edge support = count over the 3 canonical edge projections of
         each triangle (hash_groupby), and
      4. peel edges with support < k-2; repeat until no edge is removed.

    ``edges`` must be the canonical undirected edge set (src < dst, dedup).
    Returns the surviving (src, dst) Dataset."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    e = edges.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    e = e.materialize()
    n_prev = e.count()
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        # undirected incidence → degree per vertex
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
            ),
            batch_format="pyarrow",
        )
        deg = hash_groupby_sum(ue, ["tv"], None, "d", num_partitions=8)

        # Ray Data may strip the schema off EMPTY blocks flowing through
        # transforms, so every projection re-states its int64 output schema
        def _proj(cols: dict):
            def _f(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or t.num_columns == 0:
                    return pa.table({o: pa.array([], pa.int64()) for o in cols})
                return pa.table({o: t[s] for o, s in cols.items()})

            return _f

        def _col(t: pa.Table, name: str) -> np.ndarray:
            return t[name].to_numpy(zero_copy_only=False).astype(np.int64)

        # orient: a→b iff (deg_a, a) < (deg_b, b)
        j1 = hash_join(e, deg, "src", "tv", num_partitions=8).map_batches(
            _proj({"src": "src", "dst": "dst", "da": "d"}), batch_format="pyarrow"
        )
        j2 = hash_join(j1, deg, "dst", "tv", num_partitions=8)

        def _orient(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
            s, d = _col(t, "src"), _col(t, "dst")
            da, db = _col(t, "da"), _col(t, "d")
            fwd = (da < db) | ((da == db) & (s < d))
            return pa.table(
                {"a": pa.array(np.where(fwd, s, d)), "b": pa.array(np.where(fwd, d, s))}
            )

        oe = j2.map_batches(_orient, batch_format="pyarrow").materialize()
        # wedges a→b→c closed by a→c; emit each triangle's 3 canonical edges
        w = hash_join(
            oe,
            oe.map_batches(_proj({"b2": "a", "c": "b"}), batch_format="pyarrow"),
            "b",
            "b2",
            num_partitions=8,
        )

        def _pack(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table(
                    {n: pa.array([], pa.int64()) for n in ("a", "b", "c", "ac")}
                )
            a, b, c = _col(t, "a"), _col(t, "b"), _col(t, "c")
            return pa.table(
                {
                    "a": pa.array(a),
                    "b": pa.array(b),
                    "c": pa.array(c),
                    "ac": pa.array((a << np.int64(32)) | c),
                }
            )

        w = w.map_batches(_pack, batch_format="pyarrow")

        def _ok(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table({"ac2": pa.array([], pa.int64())})
            return pa.table(
                {"ac2": pa.array((_col(t, "a") << np.int64(32)) | _col(t, "b"))}
            )

        ok = oe.map_batches(_ok, batch_format="pyarrow")
        tri = hash_join(w, ok, "ac", "ac2", num_partitions=8)

        def _edges3(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table(
                    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
                )
            a, b, c = _col(t, "a"), _col(t, "b"), _col(t, "c")
            u = np.concatenate([np.minimum(a, b), np.minimum(b, c), np.minimum(a, c)])
            v = np.concatenate([np.maximum(a, b), np.maximum(b, c), np.maximum(a, c)])
            return pa.table({"src": pa.array(u), "dst": pa.array(v)})

        sup = hash_groupby_sum(
            tri.map_batches(_edges3, batch_format="pyarrow"),
            ["src", "dst"],
            None,
            "support",
            num_partitions=8,
        )
        survived = sup.filter(expr=f"support >= {k - 2}").map_batches(
            _proj({"src": "src", "dst": "dst"}), batch_format="pyarrow"
        )
        survived = survived.materialize()
        n_now = survived.count()
        e = survived
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return e


def truss_decomposition(
    edges: ray.data.Dataset, kmax_guard: int = 64
) -> ray.data.Dataset:
    """Full truss decomposition: trussness(e) = max k such that e survives
    in the k-truss (≥ 2 for every edge; the FLASH suite's kcore-style
    decomposition applied to trusses).  Iterates :func:`ktruss` at
    k = 3, 4, … — each stage peels the PREVIOUS stage's survivors (k-truss ⊆
    (k-1)-truss, so no work is repeated on removed edges); edges dropped at
    stage k get trussness k-1.  All set differences are distributed hash
    joins on the packed (src<<32|dst) key; returns (src, dst, trussness).

    ``edges`` must be the canonical undirected edge set (src < dst, dedup)."""
    from graphscope_ray.utils import hash_join

    def _pack(tag: bool):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                cols = {"key": pa.array([], pa.int64())}
                if not tag:
                    cols.update(
                        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
                    )
                else:
                    cols["tag"] = pa.array([], pa.int64())
                return pa.table(cols)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            key = (s << np.int64(32)) | d
            if tag:
                return pa.table(
                    {"key": pa.array(key), "tag": pa.array(np.ones(len(key), np.int64))}
                )
            return pa.table({"key": pa.array(key), "src": t["src"], "dst": t["dst"]})

        return _f

    cur = edges.map_batches(
        lambda t: t.select(["src", "dst"])
        if t.num_rows
        else pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    parts: list[ray.data.Dataset] = []
    n_prev_survivors = cur.count()
    k = 3
    while k <= kmax_guard:
        nxt = ktruss(cur, k).materialize()
        n_next = nxt.count()
        j = hash_join(
            cur.map_batches(_pack(False), batch_format="pyarrow"),
            nxt.map_batches(_pack(True), batch_format="pyarrow"),
            "key",
            "key",
            how="left",
            num_partitions=8,
        )

        def _removed(t: pa.Table, kk=k) -> pa.Table:
            guard = {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "trussness": pa.array([], pa.int64()),
            }
            if t.num_rows == 0 or "src" not in t.column_names:
                return pa.table(guard)
            if "tag" in t.column_names:
                t = t.filter(pc.is_null(t["tag"], nan_is_null=True))
            if t.num_rows == 0:
                return pa.table(guard)
            return pa.table(
                {
                    "src": t["src"],
                    "dst": t["dst"],
                    "trussness": pa.array(np.full(t.num_rows, kk - 1, dtype=np.int64)),
                }
            )

        parts.append(j.map_batches(_removed, batch_format="pyarrow").materialize())
        if n_next == 0:
            n_prev_survivors = 0
            break
        cur = nxt
        n_prev_survivors = n_next
        k += 1
    else:
        # Loop exhausted kmax_guard with edges still surviving: give them a
        # trussness row at the guard instead of silently omitting them, so
        # the output always covers every input edge.
        if n_prev_survivors > 0:

            def _at_guard(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "src" not in t.column_names:
                    return pa.table(
                        {
                            "src": pa.array([], pa.int64()),
                            "dst": pa.array([], pa.int64()),
                            "trussness": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "src": t["src"],
                        "dst": t["dst"],
                        "trussness": pa.array(
                            np.full(t.num_rows, kmax_guard, dtype=np.int64)
                        ),
                    }
                )

            parts.append(cur.map_batches(_at_guard, batch_format="pyarrow").materialize())
    if not parts:  # kmax_guard < 3 with no edges: typed empty result
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "trussness": pa.array([], pa.int64()),
                }
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _i64(t: pa.Table, name: str) -> np.ndarray:
    return t[name].to_numpy(zero_copy_only=False).astype(np.int64)


def _guard(cols: list[str]):
    """Schema for empty blocks (Ray strips schemas off empty blocks)."""
    return pa.table({c: pa.array([], pa.int64()) for c in cols})


def _sumcol(df, name: str) -> int:
    """Sum of a partials column; 0 when the dataset came back fully empty
    (Ray drops even the schema of all-empty results)."""
    return int(df[name].sum()) if name in getattr(df, "columns", []) else 0


def undirected_motifs(edges: ray.data.Dataset, num_partitions: int = 8) -> dict:
    """Undirected motif census over the canonical undirected edge set
    (src < dst, dedup, no self-loops) — the FLASH subgraph family, expressed
    as one distributed support computation + per-edge closed forms:

      triangles = Σ_e p(e) / 3                      (flash/subgraph/triangle.h)
      tailed    = ½ Σ_e p(e)·(deg(s)+deg(d)−4)      (tailed-triangle.h:57-66)
      n_3paths  = Σ_e (deg(s)−1)(deg(d)−1) − p(e)   (3-path.h:57-66)
      diamonds  = Σ_e C(p(e), 2)                    (diamond.h:56-73)

    where p(e) = common-neighbor count of the edge (its triangle support),
    computed with the same degree-ordered wedge join as :func:`ktruss`, and
    deg is the undirected set degree.  Everything is distributed hash-join /
    hash-groupby dataflow; only O(1) partial sums reach the driver."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    e = edges.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    e = e.materialize()

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["tv"])
        return pa.table({"tv": pa.array(np.concatenate([_i64(t, "src"), _i64(t, "dst")]))})

    deg = hash_groupby_sum(
        e.map_batches(_ends, batch_format="pyarrow"), ["tv"], None, "d",
        num_partitions=num_partitions,
    )

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard(list(cols))
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    j1 = hash_join(e, deg, "src", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "da": "d"}), batch_format="pyarrow"
    )
    ed = hash_join(j1, deg, "dst", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "da": "da", "db": "d"}), batch_format="pyarrow"
    ).materialize()

    # Σ (da−1)(db−1) over ALL edges (support join below only sees p>0 edges)
    def _pathlhs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["lhs"])
        da, db = _i64(t, "da"), _i64(t, "db")
        return pa.table({"lhs": pa.array([int(((da - 1) * (db - 1)).sum())])})

    path_lhs = _sumcol(ed.map_batches(_pathlhs, batch_format="pyarrow").to_pandas(), "lhs")

    # degree-ordered orientation → wedges → closure = per-edge support
    def _orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["a", "b"])
        s, d = _i64(t, "src"), _i64(t, "dst")
        da, db = _i64(t, "da"), _i64(t, "db")
        fwd = (da < db) | ((da == db) & (s < d))
        return pa.table({"a": pa.array(np.where(fwd, s, d)), "b": pa.array(np.where(fwd, d, s))})

    oe = ed.map_batches(_orient, batch_format="pyarrow").materialize()
    w = hash_join(
        oe, oe.map_batches(_proj({"b2": "a", "c": "b"}), batch_format="pyarrow"),
        "b", "b2", num_partitions=num_partitions,
    )

    def _pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["a", "b", "c", "ac"])
        a, b, c = _i64(t, "a"), _i64(t, "b"), _i64(t, "c")
        return pa.table(
            {"a": pa.array(a), "b": pa.array(b), "c": pa.array(c),
             "ac": pa.array((a << np.int64(32)) | c)}
        )

    def _ok(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["ac2"])
        return pa.table({"ac2": pa.array((_i64(t, "a") << np.int64(32)) | _i64(t, "b"))})

    tri = hash_join(
        w.map_batches(_pack, batch_format="pyarrow"),
        oe.map_batches(_ok, batch_format="pyarrow"),
        "ac", "ac2", num_partitions=num_partitions,
    )

    def _edges3(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["src", "dst"])
        a, b, c = _i64(t, "a"), _i64(t, "b"), _i64(t, "c")
        u = np.concatenate([np.minimum(a, b), np.minimum(b, c), np.minimum(a, c)])
        v = np.concatenate([np.maximum(a, b), np.maximum(b, c), np.maximum(a, c)])
        return pa.table({"src": pa.array(u), "dst": pa.array(v)})

    sup = hash_groupby_sum(
        tri.map_batches(_edges3, batch_format="pyarrow"), ["src", "dst"], None, "p",
        num_partitions=num_partitions,
    )
    s1 = hash_join(sup, deg, "src", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "p": "p", "da": "d"}), batch_format="pyarrow"
    )
    s2 = hash_join(s1, deg, "dst", "tv", num_partitions=num_partitions)

    def _terms(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["psum", "tailed2", "dia"])
        p, da, db = _i64(t, "p"), _i64(t, "da"), _i64(t, "d")
        return pa.table(
            {
                "psum": pa.array([int(p.sum())]),
                "tailed2": pa.array([int((p * (da + db - 4)).sum())]),
                "dia": pa.array([int((p * (p - 1) // 2).sum())]),
            }
        )

    parts = s2.map_batches(_terms, batch_format="pyarrow").to_pandas()
    psum = _sumcol(parts, "psum")
    return {
        "triangles": psum // 3,
        "tailed": _sumcol(parts, "tailed2") // 2,
        "n_3paths": path_lhs - psum,
        "diamonds": _sumcol(parts, "dia"),
    }


def lcc_directed(edges: ray.data.Dataset, num_partitions: int = 8) -> ray.data.Dataset:
    """Directed local clustering coefficient (Fagiolo 2007), the semantics of
    grape::LCCDirected (.gs_conf.yaml ``lcc_directed`` → ``lcc/lcc_directed.h``):

        C_i = T_i / (d_tot(i)·(d_tot(i)−1) − 2·d_bidir(i))
        T_i = ½·[(A+Aᵀ)³]_ii = Σ_{triangles {i,j,k}} w_ij·w_jk·w_ki

    with w_uv = A_uv + A_vu ∈ {1, 2} (reciprocal pairs count double),
    d_tot = in+out degree, d_bidir = number of reciprocal neighbors, and
    C_i = 0 when the denominator is 0.

    Fully distributed dataflow: canonical-pair weights → degree-ordered
    orientation → wedge join → closure join (the same 32-bit packed-key
    exchange as :func:`undirected_motifs`; vertex ids must fit in int32) →
    per-corner weighted-triangle groupby.  Only per-vertex tables flow.

    ``edges``: distinct directed (src, dst) rows, no self-loops.
    Returns a Dataset (oid, lcc_d) over every vertex."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    def _canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["a", "b"])
        s, d = _i64(t, "src"), _i64(t, "dst")
        return pa.table({"a": pa.array(np.minimum(s, d)), "b": pa.array(np.maximum(s, d))})

    # w(a,b) = number of directions present (1 or 2)
    W = hash_groupby_sum(
        edges.map_batches(_canon, batch_format="pyarrow"), ["a", "b"], None, "w",
        num_partitions=num_partitions,
    ).materialize()

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["tv", "w", "bd", "one"])
        a, b, w = _i64(t, "a"), _i64(t, "b"), _i64(t, "w")
        return pa.table(
            {
                "tv": pa.array(np.concatenate([a, b])),
                "w": pa.array(np.concatenate([w, w])),
                "bd": pa.array(np.concatenate([(w == 2).astype(np.int64)] * 2)),
                "one": pa.array(np.ones(2 * len(a), dtype=np.int64)),
            }
        )

    ends = W.map_batches(_ends, batch_format="pyarrow").materialize()
    dtot = hash_groupby_sum(ends, ["tv"], "w", "dtot", num_partitions=num_partitions)
    dbid = hash_groupby_sum(ends, ["tv"], "bd", "dbid", num_partitions=num_partitions)
    degc = hash_groupby_sum(ends, ["tv"], "one", "dc", num_partitions=num_partitions)

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard(list(cols))
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    j1 = hash_join(W, degc, "a", "tv", num_partitions=num_partitions).map_batches(
        _proj({"a": "a", "b": "b", "w": "w", "da": "dc"}), batch_format="pyarrow"
    )
    wd = hash_join(j1, degc, "b", "tv", num_partitions=num_partitions).map_batches(
        _proj({"a": "a", "b": "b", "w": "w", "da": "da", "db": "dc"}),
        batch_format="pyarrow",
    )

    def _orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["u", "v", "w"])
        a, b = _i64(t, "a"), _i64(t, "b")
        da, db = _i64(t, "da"), _i64(t, "db")
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table(
            {"u": pa.array(np.where(fwd, a, b)), "v": pa.array(np.where(fwd, b, a)),
             "w": t["w"]}
        )

    oe = wd.map_batches(_orient, batch_format="pyarrow").materialize()
    wedge = hash_join(
        oe, oe.map_batches(_proj({"u2": "u", "c": "v", "w2": "w"}), batch_format="pyarrow"),
        "v", "u2", num_partitions=num_partitions,
    )

    def _packw(t: pa.Table) -> pa.Table:  # wedge u→v→c, closure key (u,c)
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["u", "v", "c", "ww", "uc"])
        u, v, c = _i64(t, "u"), _i64(t, "v"), _i64(t, "c")
        return pa.table(
            {"u": pa.array(u), "v": pa.array(v), "c": pa.array(c),
             "ww": pa.array(_i64(t, "w") * _i64(t, "w2")),
             "uc": pa.array((u << np.int64(32)) | c)}
        )

    def _packe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["uc2", "w3"])
        return pa.table(
            {"uc2": pa.array((_i64(t, "u") << np.int64(32)) | _i64(t, "v")), "w3": t["w"]}
        )

    tri = hash_join(
        wedge.map_batches(_packw, batch_format="pyarrow"),
        oe.map_batches(_packe, batch_format="pyarrow"),
        "uc", "uc2", num_partitions=num_partitions,
    )

    def _corners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["tv", "p"])
        p = _i64(t, "ww") * _i64(t, "w3")
        return pa.table(
            {"tv": pa.array(np.concatenate([_i64(t, "u"), _i64(t, "v"), _i64(t, "c")])),
             "p": pa.array(np.concatenate([p, p, p]))}
        )

    # zero row per vertex so the final inner joins keep triangle-free vertices
    zeros = dtot.map_batches(_proj({"tv": "tv"}), batch_format="pyarrow").map_batches(
        lambda t: t.append_column("p", pa.array(np.zeros(t.num_rows, dtype=np.int64)))
        if t.num_rows and t.num_columns else _guard(["tv", "p"]),
        batch_format="pyarrow",
    )
    T = hash_groupby_sum(
        tri.map_batches(_corners, batch_format="pyarrow").union(zeros),
        ["tv"], "p", "t", num_partitions=num_partitions,
    )

    f1 = hash_join(dtot, dbid, "tv", "tv", num_partitions=num_partitions).map_batches(
        _proj({"tv": "tv", "dtot": "dtot", "dbid": "dbid"}), batch_format="pyarrow"
    )
    f2 = hash_join(f1, T, "tv", "tv", num_partitions=num_partitions)

    def _final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["oid", "lcc_d"])
        dt, db_, tt = _i64(t, "dtot"), _i64(t, "dbid"), _i64(t, "t")
        den = (dt * (dt - 1) - 2 * db_).astype(np.float64)
        c = np.where(den > 0, tt / np.maximum(den, 1.0), 0.0)
        return pa.table({"oid": t["tv"], "lcc_d": pa.array(c)})

    return f2.map_batches(_final, batch_format="pyarrow")


def peel_ordering(
    edges: ray.data.Dataset,
    cores: ray.data.Dataset,
    mode: str = "degeneracy",
    num_partitions: int = 4,
    max_rounds: int = 500,
) -> "pd.DataFrame":
    """FLASH core-ordering rank loops as iterative hash-join dataflow.

    ``mode="degeneracy"`` (apps/flash/core/degeneracy-ordering.h:73-105):
    dg = max coreness; per round, every unranked vertex with current degree
    d ≤ dg gets rank = round, then ranked vertices decrement their
    neighbors' d.

    ``mode="onion"`` (apps/flash/core/onion-layer-ordering.h:66-103): d(v)
    starts as |{w ∈ N(v): core(w) ≥ core(v)}|; per round unranked v with
    d ≤ core(v) get rank = round; decrements flow only along SAME-core
    edges (the reference's ``d.core == s.core`` edge check).

    ``edges``: canonical undirected simple edges (src < dst, oid space);
    ``cores``: (oid, core) coreness table (e.g. from :func:`kshell`).
    Returns a pandas DataFrame (oid, core, rank) — vertex-sized.
    """
    import pandas as pd
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    def _both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["src", "dst"])
        s, d = _i64(t, "src"), _i64(t, "dst")
        return pa.table(
            {"src": pa.array(np.concatenate([s, d])), "dst": pa.array(np.concatenate([d, s]))}
        )

    be = edges.map_batches(_both, batch_format="pyarrow").materialize()
    # per-edge endpoint cores (static)
    j = hash_join(be, cores, "src", "oid", num_partitions=num_partitions)

    def _p1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["src", "dst", "cs"])
        return pa.table({"src": t["src"], "dst": t["dst"], "cs": t["core"]})

    ec = hash_join(
        j.map_batches(_p1, batch_format="pyarrow"), cores, "dst", "oid",
        num_partitions=num_partitions,
    )

    def _p2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["src", "dst", "cs", "cd"])
        return pa.table({"src": t["src"], "dst": t["dst"], "cs": t["cs"], "cd": t["core"]})

    ec = ec.map_batches(_p2, batch_format="pyarrow").materialize()

    if mode == "degeneracy":
        dec_edges = be
        d0_src = be
    elif mode == "onion":
        dec_edges = ec.filter(expr="cs == cd").materialize()
        d0_src = ec.filter(expr="cd >= cs")
    else:
        raise ValueError(mode)

    d0 = hash_groupby_sum(
        d0_src.map_batches(
            lambda t: _guard(["src"]) if t.num_rows == 0 or t.num_columns == 0
            else t.select(["src"]),
            batch_format="pyarrow",
        ),
        ["src"], None, "d", num_partitions=num_partitions,
    )
    # vertex state is vertex-sized (the driver-bound table, like the oid map)
    V = hash_join(cores, d0, "oid", "src", how="left", num_partitions=num_partitions).to_pandas()
    V = V[["oid", "core", "d"]].copy()
    V["d"] = V["d"].fillna(0).astype(np.int64)
    V["rank"] = np.int64(-1)
    thr = int(V["core"].max()) if mode == "degeneracy" else None

    for rnd in range(max_rounds):
        t = thr if thr is not None else V["core"].to_numpy()
        newly = (V["rank"].to_numpy() == -1) & (V["d"].to_numpy() <= t)
        if not newly.any():
            break
        V.loc[newly, "rank"] = rnd
        if (V["rank"].to_numpy() == -1).sum() == 0:
            break
        nds = ray.data.from_arrow(
            pa.table({"noid": pa.array(V.loc[newly, "oid"].to_numpy().astype(np.int64))})
        )
        hit = hash_join(dec_edges, nds, "src", "noid", num_partitions=num_partitions)
        dec = hash_groupby_sum(
            hit.map_batches(
                lambda t: _guard(["dst"]) if t.num_rows == 0 or t.num_columns == 0
                else t.select(["dst"]),
                batch_format="pyarrow",
            ),
            ["dst"], None, "c", num_partitions=num_partitions,
        ).to_pandas()
        if len(dec):
            m = V.merge(dec, left_on="oid", right_on="dst", how="left")
            V["d"] = (V["d"].to_numpy() - m["c"].fillna(0).to_numpy()).astype(np.int64)
    return V[["oid", "core", "rank"]].sort_values("oid").reset_index(drop=True)


def _kruskal_prune(t: pa.Table) -> pa.Table:
    """Local Kruskal on one edge block: keep exactly the edges a Kruskal run
    with the total order (w, src, dst) would accept.  The MSF-filtering
    property (apps/flash/measurement/msf.h:49-61: local kruskal per
    fragment, then merged kruskal) guarantees every global-MSF edge of the
    block survives; the total order makes the global MSF unique, so the
    final merge is partition-invariant."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _guard(["src", "dst", "weight"])
    s, d, w = _i64(t, "src"), _i64(t, "dst"), _i64(t, "weight")
    order = np.lexsort((d, s, w))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    keep = []
    for i in order:
        a, b = find(int(s[i])), find(int(d[i]))
        if a != b:
            parent[a] = b
            keep.append(i)
    k = np.asarray(keep, dtype=np.int64)
    return pa.table({"src": pa.array(s[k]), "dst": pa.array(d[k]), "weight": pa.array(w[k])})


def msf(wedges: ray.data.Dataset, num_partitions: int = 4) -> "pd.DataFrame":
    """Minimum spanning forest of a weighted undirected edge set
    (canonical src < dst, int weights) — the reference's two-level design
    (apps/flash/measurement/msf.h:49-61): per-block local Kruskal prune
    (each block keeps ≤ |V(block)|−1 edges), one repartition, a second
    prune, then a driver-side merge Kruskal over the vertex-scale
    survivors.  Ties broken by the (w, src, dst) total order everywhere →
    the unique lexicographic-minimum MSF, independent of partitioning."""
    pruned = wedges.map_batches(_kruskal_prune, batch_format="pyarrow")
    pruned = pruned.repartition(num_partitions).map_batches(
        _kruskal_prune, batch_format="pyarrow"
    )
    final = _kruskal_prune(pa.Table.from_pandas(pruned.to_pandas(), preserve_index=False))
    out = final.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    return out


def directed_triangle_census(edges: ray.data.Dataset, num_partitions: int = 8) -> dict:
    """Directed triangle census over the dedup directed edge set (no
    self-loops) — FLASH subgraph semantics:

      cyclic  = |{(s,d,w): s→d, d→w, w→s}| / 3       (cyclic-triangle.h:51-75)
      acyclic = |{(s,d,w): s→d, s→w, d→w, d≠w}|      (acyclic-triangle.h:50-66)
      in_tri  = Σ_{recip pairs {s,d}} |out(s)∩out(d)| (in-triangle.h:53-69)
      out_tri = Σ_{recip pairs {s,d}} |in(s)∩in(d)|   (out-triangle.h:53-70)

    Each count is a distributed wedge hash-join + packed-key closure
    semijoin; only scalar counts reach the driver."""
    from graphscope_ray.utils import hash_join

    e = edges.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    e = e.materialize()

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard(list(cols))
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    def _packk(s_col: str, d_col: str, out: str):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard([out])
            return pa.table({out: pa.array((_i64(t, s_col) << np.int64(32)) | _i64(t, d_col))})

        return _f

    ek = e.map_batches(_packk("src", "dst", "k2"), batch_format="pyarrow").materialize()

    def _count(ds: ray.data.Dataset) -> int:
        return int(ds.count())

    # cyclic: wedge s→d→w, close with (w,s)
    wz = hash_join(
        e, e.map_batches(_proj({"src2": "src", "dst2": "dst"}), batch_format="pyarrow"),
        "dst", "src2", num_partitions=num_partitions,
    )
    cyc = _count(
        hash_join(
            wz.map_batches(_packk("dst2", "src", "k"), batch_format="pyarrow"),
            ek, "k", "k2", num_partitions=num_partitions,
        )
    ) // 3

    # acyclic: wedge s→d, s→w (d≠w), close with (d,w)
    wa = hash_join(
        e, e.map_batches(_proj({"src2": "src", "dst2": "dst"}), batch_format="pyarrow"),
        "src", "src2", num_partitions=num_partitions,
    )

    def _dw(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["k"])
        d, w = _i64(t, "dst"), _i64(t, "dst2")
        m = d != w
        return pa.table({"k": pa.array((d[m] << np.int64(32)) | w[m])})

    acy = _count(
        hash_join(wa.map_batches(_dw, batch_format="pyarrow"), ek, "k", "k2",
                  num_partitions=num_partitions)
    )

    # reciprocal pairs {s,d} (canonical s<d) via packed-key self-join
    def _revk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["rk", "s", "d"])
        s, d = _i64(t, "src"), _i64(t, "dst")
        m = s < d
        return pa.table(
            {"rk": pa.array((d[m] << np.int64(32)) | s[m]),
             "s": pa.array(s[m]), "d": pa.array(d[m])}
        )

    rp = hash_join(
        e.map_batches(_revk, batch_format="pyarrow"), ek, "rk", "k2",
        num_partitions=num_partitions,
    ).map_batches(_proj({"s": "s", "d": "d"}), batch_format="pyarrow").materialize()

    # in: w ∈ out(s) ∩ out(d); out: w ∈ in(s) ∩ in(d)
    ji = hash_join(rp, e, "s", "src", num_partitions=num_partitions)
    in_tri = _count(
        hash_join(ji.map_batches(_packk("d", "dst", "k"), batch_format="pyarrow"),
                  ek, "k", "k2", num_partitions=num_partitions)
    )
    jo = hash_join(rp, e, "s", "dst", num_partitions=num_partitions)
    out_tri = _count(
        hash_join(jo.map_batches(_packk("src", "d", "k"), batch_format="pyarrow"),
                  ek, "k", "k2", num_partitions=num_partitions)
    )
    return {"cyclic": cyc, "acyclic": acy, "in_tri": in_tri, "out_tri": out_tri}


def random_walks(
    edges: ray.data.Dataset,
    n_starts: int,
    length: int = 4,
    a: int = 1103515245,
    b: int = 12345,
    c: int = 97,
    mod: int = 2147483647,
) -> ray.data.Dataset:
    """Deterministic random-walk corpus generation (the embedding-training
    sampling op; randomness = the LCG-style hash ((a·walk_id + b·step +
    c·cur) mod m) mod deg(cur), so walks are reproducible across engines
    and parallelism levels).  One walk starts at every vertex < n_starts;
    per step the walk table is hash-joined against the out-degree table and
    then against the INDEXED adjacency (idx = rank of dst in the sorted
    neighbor list) on a packed (vertex, idx) key.  Walks stop at sinks
    (inner join drops them).  Returns rows (walk_id, step, v)."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    PACK = np.int64(1) << np.int64(32)
    e = edges.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    e = e.materialize()
    deg = hash_groupby_sum(e, ["src"], None, "deg", num_partitions=8).materialize()

    # indexed adjacency: idx = rank of dst within src's ascending neighbors —
    # per-src ranking is local after the hash exchange by src
    nbr_parts = hash_join(  # reuse the exchange: join e with deg keyed by src
        e, deg, "src", "src", num_partitions=8
    )

    def _index(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"nkey": pa.array([], pa.int64()), "nxt": pa.array([], pa.int64())}
            )
        import pandas as pd

        df = t.to_pandas().sort_values(["src", "dst"])
        idx = df.groupby("src").cumcount().to_numpy().astype(np.int64)
        src = df["src"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "nkey": pa.array(src * PACK + idx),
                "nxt": pa.array(df["dst"].to_numpy().astype(np.int64)),
            }
        )

    nbr = nbr_parts.map_batches(_index, batch_format="pyarrow").materialize()

    walks = ray.data.from_arrow(
        pa.table(
            {
                "walk_id": pa.array(np.arange(n_starts, dtype=np.int64)),
                "v": pa.array(np.arange(n_starts, dtype=np.int64)),
            }
        )
    )
    outs = [walks.map_batches(
        lambda t: t.append_column("step", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    )]
    for step in range(1, length + 1):
        j = hash_join(walks, deg, "v", "src", num_partitions=8)

        def _choose(t: pa.Table, s=step) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table(
                    {"walk_id": pa.array([], pa.int64()), "wkey": pa.array([], pa.int64())}
                )
            wid = t["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cur = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            choice = ((a * wid + b * s + c * cur) % mod) % d
            return pa.table(
                {"walk_id": pa.array(wid), "wkey": pa.array(cur * PACK + choice)}
            )

        keyed = j.map_batches(_choose, batch_format="pyarrow")
        stepped = hash_join(keyed, nbr, "wkey", "nkey", num_partitions=8)

        def _emit(t: pa.Table, s=step) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return pa.table(
                    {"walk_id": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
                )
            return pa.table({"walk_id": t["walk_id"], "v": t["nxt"]})

        walks = stepped.map_batches(_emit, batch_format="pyarrow").materialize()
        outs.append(
            walks.map_batches(
                lambda t, s=step: t.append_column(
                    "step", pa.array(np.full(t.num_rows, s, np.int64))
                )
                if t.num_rows
                else pa.table(
                    {
                        "walk_id": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64()),
                        "step": pa.array([], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


# --------------------------------------------------------------------------
# FLASH-suite apps (connectivity / matching / subgraph / measurement)


def scc(g: Graph) -> tuple[ray.data.Dataset, RunResult]:
    """Strongly connected components (apps/flash/connectivity/scc.h
    semantics): label = min vid in the component, via the FW-BW-Trim
    vertex program."""
    res = g.run_program("scc")
    return g.program_state(res.name).select_columns(["vid", "scc"]), res


def condensation(g: Graph, max_rounds: int = 64) -> ray.data.Dataset:
    """SCC condensation with longest-path layering (networkx
    ``condensation`` plus a DAG level per component): per vertex
    ``(vid, scc, lvl)`` where ``scc`` is the min-vid SCC label and
    ``lvl(c)`` is the length of the longest path ENDING at component ``c``
    in the condensation DAG (0 for source components) — the topological
    layering of the component graph.

    Dataflow: one SCC run, two hash-join exchanges map edge endpoints to
    component labels, one hash-distinct produces the component-sized DAG
    edge table, then the layering runs as ``dag_level`` max-propagation
    SUPERSTEPS on a graph built over the DAG edges (component labels are
    vids, so the same dense-vid frame fits) — ≤ DAG-depth rounds, no O(N)
    driver state anywhere."""
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    comp, _ = scc(g)
    edges = ray.data.from_arrow_refs([a.edges_table.remote() for a in g.actors])
    edges = edges.select_columns(["src", "dst"])

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or not set(cols).issubset(t.column_names):
                return pa.table({v: pa.array([], pa.int64()) for v in cols.values()})
            return pa.table({v: t[k] for k, v in cols.items()})

        return _f

    e1 = hash_join(edges, comp, "src", "vid").map_batches(
        _proj({"scc": "csrc", "dst": "dst"}), batch_format="pyarrow"
    )
    e2 = hash_join(e1, comp, "dst", "vid").map_batches(
        _proj({"csrc": "csrc", "scc": "cdst"}), batch_format="pyarrow"
    )
    e2 = e2.map_batches(
        lambda t: t.filter(pc.not_equal(t["csrc"], t["cdst"])), batch_format="pyarrow"
    )
    ce = hash_groupby_sum(e2, ["csrc", "cdst"], None, "n", num_partitions=g.P).map_batches(
        _proj({"csrc": "src", "cdst": "dst"}), batch_format="pyarrow"
    )

    cond_g = build_graph(ce, num_partitions=g.P, num_vertices=g.N)
    res = cond_g.run_program("dag_level", max_rounds=max_rounds)
    levels = cond_g.program_state(res.name).map_batches(
        _proj({"vid": "comp", "lvl": "lvl"}), batch_format="pyarrow"
    )
    out = hash_join(comp, levels, "scc", "comp", num_partitions=g.P)
    return out.map_batches(
        _proj({"vid": "vid", "scc": "scc", "lvl": "lvl"}), batch_format="pyarrow"
    )


def mis(g: Graph) -> tuple[ray.data.Dataset, RunResult]:
    """Deterministic maximal independent set (apps/flash/matching/mis.h
    priority r = deg·N + vid, smallest r wins)."""
    res = g.run_program("mis")
    return g.program_state(res.name).select_columns(["vid", "in_mis"]), res


def matching(g: Graph) -> tuple[ray.data.Dataset, RunResult]:
    """Deterministic maximal matching by mutual max-id handshake
    (apps/flash/matching/mm.h); mate = -1 for unmatched vertices."""
    res = g.run_program("mm")
    return g.program_state(res.name).select_columns(["vid", "mate"]), res


def coloring(g: Graph) -> tuple[ray.data.Dataset, RunResult]:
    """Greedy coloring in the reference's priority order (larger degree
    first, ties larger vid — apps/flash/clustering/color.h).  One degree
    exchange prepares per-edge priority masks, then the Jones–Plassmann
    program runs to fixpoint."""
    import ray as _ray

    acts, P = g.actors, g.P
    reqs = _ray.get([a.deg_requests.remote() for a in acts])
    replies = [
        [acts[q].deg_reply.remote(reqs[p][q]) for q in range(P)] for p in range(P)
    ]
    _ray.get([acts[p].color_prio.remote(*replies[p]) for p in range(P)])
    res = g.run_program("coloring")
    return g.program_state(res.name).select_columns(["vid", "color"]), res


def eccentricity_all(g: Graph, chunk: int = 128) -> "pd.DataFrame":
    """Exact out-eccentricity for EVERY vertex via chunked multi-source BFS;
    the per-source max/reach reduce stays in the fragments (p_call
    col_stats), only S scalars per chunk reach the driver.  Returns a
    pandas frame (src, ecc, n_reach) — ecc = max FINITE distance from src
    (directed convention: unreached pairs are excluded, not infinite)."""
    import pandas as pd
    import ray as _ray

    N = g.N
    rows = []
    for off in range(0, N, chunk):
        srcs = list(range(off, min(off + chunk, N)))
        res = g.run_program("msbfs", name=f"eccms_{off}", sources=srcs)
        parts = _ray.get(
            [a.p_call.remote(f"eccms_{off}", "col_stats") for a in g.actors]
        )
        mx = np.max(np.stack([p[0] for p in parts]), axis=0)
        nr = np.sum(np.stack([p[1] for p in parts]), axis=0)
        rows.append(
            pd.DataFrame({"src": srcs, "ecc": mx.astype(np.int64), "n_reach": nr})
        )
    return pd.concat(rows, ignore_index=True)


def diameter_radius(g: Graph, chunk: int = 128) -> dict:
    """Diameter (max finite pairwise distance) and radius (min out-ecc over
    vertices reaching at least one other vertex) — the exact counterpart of
    apps/flash/measurement/diameter-approx.h's double-sweep estimate."""
    ecc = eccentricity_all(g, chunk=chunk)
    has_out = ecc["ecc"] > 0
    return {
        "diameter": int(ecc["ecc"].max()),
        "radius": int(ecc.loc[has_out, "ecc"].min()) if has_out.any() else 0,
    }


def pair_distance_histogram(g: Graph, chunk: int = 128) -> np.ndarray:
    """Exact histogram of finite positive directed hop distances over all
    ordered vertex pairs: hist[d] = #{(u,v): u≠v, d(u,v)=d}.  Chunked
    multi-source BFS like eccentricity_all; each fragment returns one small
    histogram per chunk (MsBfs.dist_hist), the driver folds P tiny vectors —
    no O(N²) state anywhere."""
    import ray as _ray

    N = g.N
    hist = np.zeros(1, dtype=np.int64)
    for off in range(0, N, chunk):
        srcs = list(range(off, min(off + chunk, N)))
        name = f"effd_{off}"
        g.run_program("msbfs", name=name, sources=srcs)
        parts = _ray.get([a.p_call.remote(name, "dist_hist") for a in g.actors])
        for p in parts:
            if len(p) > len(hist):
                hist = np.concatenate(
                    [hist, np.zeros(len(p) - len(hist), dtype=np.int64)]
                )
            hist[: len(p)] += p
    return hist


def effective_diameter(g: Graph, num: int = 9, den: int = 10, chunk: int = 128) -> dict:
    """Hop-plot effective diameter (ANF / LDBC Graphalytics measurement
    convention): the smallest d such that at least num/den of the finite
    positive-distance ordered pairs lie within distance d — exact integer
    arithmetic (den·cum[d] >= num·total), no float quantile."""
    hist = pair_distance_histogram(g, chunk=chunk)
    total = int(hist.sum())
    if total == 0:
        return {"effective_diameter": 0, "n_pairs": 0}
    cum = np.cumsum(hist)
    d = int(np.flatnonzero(den * cum >= num * total).min())
    return {"effective_diameter": d, "n_pairs": total}


def global_efficiency(g: Graph, chunk: int = 128) -> dict:
    """Directed global efficiency (Latora–Marchiori, adapted to the directed
    fragment like closeness_exact): GE = Σ_{u≠v, d(u,v)<∞} 1/d(u,v) divided
    by N·(N−1).  Folds the same fragment-side distance histogram as
    effective_diameter — the float sum has one term per distinct distance
    (≤ diameter), not per pair, so the value is order-stable."""
    hist = pair_distance_histogram(g, chunk=chunk)
    N = g.N
    if N < 2:
        return {"global_efficiency": 0.0, "n_pairs": 0}
    ds = np.arange(len(hist), dtype=np.float64)
    ds[0] = 1.0  # hist[0] is always 0 (self pairs excluded); avoid 0/0
    eff = float(np.sum(hist / ds)) / (N * (N - 1))
    return {"global_efficiency": eff, "n_pairs": int(hist.sum())}


def k_center(g: Graph, k: int = 4) -> list[tuple[int, int]]:
    """Greedy farthest-point k-center (apps/flash/measurement/k-center.h
    semantics): start from vid 0, repeatedly add the vertex farthest from
    the chosen set (unreached = infinitely far; ties → smallest vid).
    Returns [(center_vid, covering_radius_before_adding)] with radius -1
    for the seed."""
    import ray as _ray

    centers = [0]
    out = [(0, -1)]
    for i in range(1, k):
        name = f"kcenter_{i}"
        g.run_program("msbfs", name=name, sources=[int(c) for c in centers])
        parts = _ray.get([a.p_call.remote(name, "farthest") for a in g.actors])
        # global max distance, ties to smallest vid; inf (unreached) first
        best_d, best_v = max(parts, key=lambda t: (t[0], -t[1]))
        centers.append(int(best_v))
        out.append((int(best_v), int(best_d) if np.isfinite(best_d) else -2))
    return out


def rectangles(g: Graph) -> int:
    """Global rectangle (4-cycle) count on the undirected simple graph
    (apps/flash/subgraph/rectangle.h).  Wedge pair-counting: fragments emit
    locally-combined common-neighbor pair counts, a hash exchange sums them,
    and C4 = Σ C(w,2) / 2 (each cycle counted once per diagonal)."""
    import ray as _ray

    from graphscope_ray.utils import hash_groupby_sum

    refs = [a.rect_wedge_pairs.remote() for a in g.actors]
    ds = ray.data.from_arrow_refs(refs)
    merged = hash_groupby_sum(ds, keys=["pair"], val="cnt", out="w", num_partitions=g.P)

    def _c2(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pairs2": pa.array([int((w * (w - 1) // 2).sum())])})

    total = merged.map_batches(_c2, batch_format="pyarrow").sum("pairs2")
    return int(total or 0) // 2


def densest_core(g: Graph) -> dict:
    """2-approximate densest subgraph = the max-coreness subgraph
    (apps/flash/subgraph/densest-sub-2-approx.h:49-92: coreness fixpoint,
    then density = Σ_{v∈S}|N(v)∩S| / |S| over S = argmax coreness)."""
    import ray as _ray

    shells = kshell(g).to_pandas()
    cmax = int(shells["shell"].max())
    S = shells.loc[shells["shell"] == cmax, "vid"].to_numpy().astype(np.int64)
    s_ref = ray.put(S)
    ne = sum(_ray.get([a.core_subgraph_edges.remote(s_ref) for a in g.actors]))
    return {"core": cmax, "n_vertices": int(S.size), "density": ne / max(S.size, 1)}


def bfs_forest(g: Graph, **run_kwargs) -> tuple[ray.data.Dataset, RunResult]:
    """Deterministic min-vid-rooted BFS spanning forest (the tree phase of
    the FLASH connectivity apps, apps/flash/connectivity/bridge.h:58-104 /
    bcc.h:58-104; the reference roots at the max-(degree, id) vertex and
    picks an arbitrary adjacency-order parent — we root at the MIN vid and
    take the min-vid parent so the forest, and everything derived from it,
    is deterministic and oracle-checkable)."""
    res = g.run_program("bfs_forest", **run_kwargs)
    return g.program_state(res.name), res


def _forest_preorder(par: np.ndarray, dis: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Preorder rank + subtree size of a forest given parent vids (roots:
    par == self), children visited in ascending vid, trees in ascending
    root vid.  Driver-side vertex-sized pass (like the oid map); the
    multi-node path is an Euler-tour + list-ranking dataflow."""
    n = par.size
    order = np.argsort(par, kind="stable")  # children grouped by parent, vid asc
    grp_par = par[order]
    starts = np.searchsorted(grp_par, np.arange(n))
    ends = np.searchsorted(grp_par, np.arange(n), side="right")
    pre = np.full(n, -1, dtype=np.int64)
    size = np.ones(n, dtype=np.int64)
    roots = np.flatnonzero(dis == 0)
    ctr = 0
    stack: list[int] = []
    for r in roots:
        stack.append(int(r))
        while stack:
            v = stack.pop()
            if pre[v] >= 0:
                continue
            pre[v] = ctr
            ctr += 1
            # push children in descending vid so ascending pops first
            kids = order[starts[v] : ends[v]]
            for c in kids[::-1]:
                if c != v:  # roots are their own parent
                    stack.append(int(c))
    # subtree sizes: accumulate bottom-up by depth
    maxd = int(dis.max()) if n else 0
    for d in range(maxd, 0, -1):
        sel = np.flatnonzero(dis == d)
        np.add.at(size, par[sel], size[sel])
    return pre, size


def biconnectivity(
    g: Graph, edges: ray.data.Dataset, num_partitions: int = 4
) -> dict[str, "pd.DataFrame"]:
    """Bridges, articulation points and biconnected-component labels of the
    undirected graph — the FLASH connectivity family
    (apps/flash/connectivity/bridge.h, cut-point.h, bcc.h) re-expressed as
    Tarjan–Vishkin over a deterministic BFS forest instead of the
    reference's sequential per-fragment cycle-climb union-find:

    1. min-vid-rooted BFS forest (superstep program; the reference builds
       the same tree at bridge.h:58-104).
    2. driver preorder/subtree intervals (vertex-sized, like the oid map).
    3. per-vertex min/max preorder reached by incident non-tree edges —
       edge-sized map_batches + hash groupby min/max; a BFS forest has no
       ancestor-descendant non-tree edges, so "exactly one endpoint in
       subtree(x)" ⟺ the far endpoint's preorder leaves x's interval.
    4. bridge(p(x), x) ⟺ no non-tree edge leaves subtree(x)  — the exact
       criterion the reference's cycle-climb tests (bridge.h:106-140).
    5. Tarjan–Vishkin auxiliary graph on tree edges (edge ≡ its child
       vertex): non-tree (a,b) joins a~b; tree (w,x) joins x~w when
       subtree(x) escapes subtree(w).  WCC of the aux graph = biconnected
       components (bcc.h:106-140's union-find, distributed).
    6. cut vertex ⟺ incident tree edges span ≥2 blocks (cut-point.h:138-151).

    Returns oid-space DataFrames: forest (oid, root_oid, depth,
    parent_oid), bridges (src, dst), bcc (oid, bcc_oid — the block of the
    vertex's parent edge, min member oid; roots/isolated keep their own
    oid), cut (oid, is_cut), ecc2 (oid, comp2_oid — 2-edge-connected
    component, min oid over the bridge-free tree relation).
    """
    import pandas as pd

    from graphscope_ray.graph.build import build_graph_from_oids
    from graphscope_ray.utils import hash_groupby_sum

    st, _ = bfs_forest(g)
    if g.vertices_ds is not None:
        vmap = g.vertices_ds.to_pandas().sort_values("vid")
        oids = vmap["oid"].to_numpy().astype(np.int64)  # vid → oid (ascending)
    else:
        oids = np.arange(g.N, dtype=np.int64)  # vid-space build: oid ≡ vid
    F = st.to_pandas().sort_values("vid")
    dis = F["dis"].to_numpy().astype(np.int64)
    parv = F["par"].to_numpy().astype(np.int64)  # vid space
    n = oids.size
    pre, size = _forest_preorder(parv, dis)

    bc = ray.put({"oids": oids, "par": parv, "dis": dis, "pre": pre})

    def _nontree(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["av", "bv"])
        b = ray.get(bc)
        sv = np.searchsorted(b["oids"], _i64(t, "src"))
        dv = np.searchsorted(b["oids"], _i64(t, "dst"))
        keep = (b["par"][sv] != dv) & (b["par"][dv] != sv)
        return pa.table({"av": pa.array(sv[keep]), "bv": pa.array(dv[keep])})

    nt = edges.map_batches(_nontree, batch_format="pyarrow").materialize()

    def _reach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["v", "p"])
        b = ray.get(bc)
        av, bv = _i64(t, "av"), _i64(t, "bv")
        return pa.table(
            {
                "v": pa.array(np.concatenate([av, bv])),
                "p": pa.array(np.concatenate([b["pre"][bv], b["pre"][av]])),
            }
        )

    reach = nt.map_batches(_reach, batch_format="pyarrow")
    mn = hash_groupby_sum(reach, ["v"], "p", "mn", num_partitions, agg="min").to_pandas()
    mx = hash_groupby_sum(reach, ["v"], "p", "mx", num_partitions, agg="max").to_pandas()
    mnA = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    mxA = np.full(n, -1, dtype=np.int64)
    if len(mn):
        mnA[mn["v"].to_numpy().astype(np.int64)] = mn["mn"].to_numpy().astype(np.int64)
        mxA[mx["v"].to_numpy().astype(np.int64)] = mx["mx"].to_numpy().astype(np.int64)
    # subtree min/max up-sweep by depth (vertex-sized)
    maxd = int(dis.max()) if n else 0
    for d in range(maxd, 0, -1):
        sel = np.flatnonzero(dis == d)
        np.minimum.at(mnA, parv[sel], mnA[sel])
        np.maximum.at(mxA, parv[sel], mxA[sel])
    nonroot = dis > 0
    inside = (mnA >= pre) & (mxA < pre + size)  # no non-tree edge escapes
    is_bridge_child = nonroot & inside

    # Tarjan–Vishkin aux edges.  rule 1: non-tree (a,b) → a~b (skip roots:
    # a root has no parent edge; its incident non-tree edges chain via rule 2
    # because the root is outside every proper subtree).
    def _rule1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["src_oid", "dst_oid"])
        b = ray.get(bc)
        av, bv = _i64(t, "av"), _i64(t, "bv")
        keep = (b["dis"][av] > 0) & (b["dis"][bv] > 0)
        return pa.table(
            {"src_oid": pa.array(av[keep]), "dst_oid": pa.array(bv[keep])}
        )

    aux1 = nt.map_batches(_rule1, batch_format="pyarrow")
    # rule 2: tree edge (w, x): x~w when subtree(x) escapes subtree(w)
    x = np.flatnonzero(nonroot & (dis[parv] > 0))
    w = parv[x]
    esc = (mnA[x] < pre[w]) | (mxA[x] >= pre[w] + size[w])
    aux2 = ray.data.from_arrow(
        pa.table(
            {
                "src_oid": pa.array(x[esc].astype(np.int64)),
                "dst_oid": pa.array(w[esc].astype(np.int64)),
            }
        )
    )
    aux = aux1.union(aux2).materialize()
    lab = np.arange(n, dtype=np.int64)  # default: own block (roots, bridges)
    if aux.count() > 0:
        ag = build_graph_from_oids(
            aux, num_partitions=num_partitions, view="directed",
            store_in_edges=True, dedup_edges=True,
        )
        cds, _ = wcc(ag)
        avm = ag.vertices_ds.to_pandas()
        cdf = cds.to_pandas().merge(avm, on="vid")
        cdf = cdf.merge(
            avm.rename(columns={"vid": "comp", "oid": "lab"}), on="comp"
        )
        lab[cdf["oid"].to_numpy().astype(np.int64)] = cdf["lab"].to_numpy().astype(np.int64)

    # cut vertices: distinct blocks among incident tree edges — own parent
    # edge (non-root) plus the children's parent edges (cut-point.h:138-151)
    kids = np.flatnonzero(nonroot)
    inc = pd.DataFrame(
        {
            "p": np.concatenate([parv[kids], kids]),
            "l": np.concatenate([lab[kids], lab[kids]]),
        }
    )
    nun = inc.groupby("p")["l"].nunique()
    is_cut = np.zeros(n, dtype=bool)
    is_cut[nun.index.to_numpy()[nun.to_numpy() >= 2]] = True

    # 2-edge-connected components: closure over bridge-free tree edges
    # (u ~ p(u) unless that edge is a bridge) — each class is a connected
    # tree region with a unique top; vertex-sized pointer doubling
    link = np.where(nonroot & ~is_bridge_child, parv, np.arange(n))
    while True:
        nl = link[link]
        if np.array_equal(nl, link):
            break
        link = nl
    minv = np.arange(n, dtype=np.int64)
    np.minimum.at(minv, link, np.arange(n, dtype=np.int64))
    e2 = minv[link]

    out = {}
    out["forest"] = pd.DataFrame(
        {
            "oid": oids,
            "root_oid": oids[F["lbl"].to_numpy().astype(np.int64)],
            "depth": dis,
            "parent_oid": oids[parv],
        }
    ).sort_values("oid").reset_index(drop=True)
    bsrc = np.minimum(oids[parv[is_bridge_child]], oids[np.flatnonzero(is_bridge_child)])
    bdst = np.maximum(oids[parv[is_bridge_child]], oids[np.flatnonzero(is_bridge_child)])
    bord = np.lexsort((bdst, bsrc))
    out["bridges"] = pd.DataFrame({"src": bsrc[bord], "dst": bdst[bord]}).reset_index(
        drop=True
    )
    out["bcc"] = pd.DataFrame(
        {"oid": oids, "bcc_oid": oids[np.where(nonroot, lab, np.arange(n))]}
    ).sort_values("oid").reset_index(drop=True)
    out["cut"] = pd.DataFrame({"oid": oids, "is_cut": is_cut.astype(np.int64)}).sort_values(
        "oid"
    ).reset_index(drop=True)
    out["ecc2"] = pd.DataFrame({"oid": oids, "comp2_oid": oids[e2]}).sort_values(
        "oid"
    ).reset_index(drop=True)
    return out


def kclique_count(edges: ray.data.Dataset, k: int = 4, num_partitions: int = 8) -> int:
    """K-clique counting (apps/flash/subgraph/k-clique.h:54-95): degree-ordered
    orientation — edge a→b when (deg, vid) of b is larger — then iterative
    clique extension.  The reference recurses over per-vertex out-sets; here
    each extension level is one distributed hash-join wave: frontier of
    (v0 < … < v_i) oriented paths joins oe on the LAST vertex to propose
    v_{i+1}, then one packed-key semi-join per earlier vertex keeps proposals
    adjacent to the whole prefix.  Every k-clique is counted exactly once
    (its vertices ordered by the orientation's total order)."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    assert k >= 3
    e = edges.map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
    e = e.materialize()

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["tv"])
        return pa.table({"tv": pa.array(np.concatenate([_i64(t, "src"), _i64(t, "dst")]))})

    deg = hash_groupby_sum(
        e.map_batches(_ends, batch_format="pyarrow"), ["tv"], None, "d",
        num_partitions=num_partitions,
    )

    def _proj(cols: dict):
        def _f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard(list(cols))
            return pa.table({o: t[s] for o, s in cols.items()})

        return _f

    j1 = hash_join(e, deg, "src", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "da": "d"}), batch_format="pyarrow"
    )
    ed = hash_join(j1, deg, "dst", "tv", num_partitions=num_partitions).map_batches(
        _proj({"src": "src", "dst": "dst", "da": "da", "db": "d"}), batch_format="pyarrow"
    )

    def _orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _guard(["v0", "v1"])
        s, d = _i64(t, "src"), _i64(t, "dst")
        da, db = _i64(t, "da"), _i64(t, "d" if "d" in t.column_names else "db")
        fwd = (da < db) | ((da == db) & (s < d))
        return pa.table(
            {"v0": pa.array(np.where(fwd, s, d)), "v1": pa.array(np.where(fwd, d, s))}
        )

    oe = ed.map_batches(_orient, batch_format="pyarrow").materialize()
    okeys = oe.map_batches(
        lambda t: _guard(["ok"]) if t.num_rows == 0 or t.num_columns == 0
        else pa.table({"ok": pa.array((_i64(t, "v0") << np.int64(32)) | _i64(t, "v1"))}),
        batch_format="pyarrow",
    ).materialize()

    F = oe
    for lvl in range(2, k):
        last = f"v{lvl - 1}"
        cols = [f"v{j}" for j in range(lvl)]

        def _prep(t: pa.Table, last=last, cols=cols) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _guard(cols)
            return t.select(cols)

        ext = hash_join(
            F.map_batches(_prep, batch_format="pyarrow"),
            oe.map_batches(_proj({"ja": "v0", f"v{lvl}": "v1"}), batch_format="pyarrow"),
            last, "ja", num_partitions=num_partitions,
        )
        # keep proposals adjacent to every earlier prefix vertex
        for j in range(lvl - 1):
            vj, nc = f"v{j}", f"v{lvl}"

            def _pk(t: pa.Table, vj=vj, nc=nc, lvl=lvl) -> pa.Table:
                if t.num_rows == 0 or t.num_columns == 0:
                    return _guard([f"v{i}" for i in range(lvl + 1)] + ["pk"])
                keep = {f"v{i}": t[f"v{i}"] for i in range(lvl + 1)}
                keep["pk"] = pa.array((_i64(t, vj) << np.int64(32)) | _i64(t, nc))
                return pa.table(keep)

            ext = hash_join(
                ext.map_batches(_pk, batch_format="pyarrow"), okeys, "pk", "ok",
                num_partitions=num_partitions,
            )
        F = ext.materialize()
    return F.count()


def fluid_community(
    g: Graph, s: int = 10, max_rounds: int = 15, **run_kwargs
) -> tuple[ray.data.Dataset, RunResult]:
    """Fluid communities (apps/flash/clustering/fluid-community.h): s seed
    labels expand by normalized density.  Deterministic variant — seeds are
    vids 0..s-1 and updates are synchronous — so a fixed round count is
    exactly reproducible (and SQL-oracle-checkable)."""
    res = g.run_program("fluid", s=s, max_rounds=max_rounds, **run_kwargs)
    return g.program_state(res.name), res
