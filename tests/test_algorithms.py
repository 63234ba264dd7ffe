"""Engine vs pure-Python oracles on micro-graphs and a seeded random graph,
at two partition counts (parallelism invariance — the in-sandbox analogue of
test_scalability.py:40-57)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph

from . import oracles

MICROS = {
    "chain5": ([(0, 1), (1, 2), (2, 3), (3, 4)], 5),
    "two_cliques": (
        [(a, b) for a, b in itertools.permutations(range(4), 2)]
        + [(a + 4, b + 4) for a, b in itertools.permutations(range(3), 2)],
        7,
    ),
    "star_hub": ([(i, 0) for i in range(1, 12)], 12),
    "self_loop_dup": ([(0, 0), (0, 1), (0, 1), (1, 2), (2, 0)], 3),
    "diamond": ([(0, 1), (0, 2), (1, 3), (2, 3)], 4),
}


def _rand_graph(n=60, m=300, seed=7):
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    e = list({(int(a), int(b)) for a, b in e})
    e.sort()
    return e, n


GRAPHS = dict(MICROS)
GRAPHS["rand60"] = _rand_graph()


def _tbl(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


def _build(edges, n, P, view="directed", **kw):
    return build_graph(_tbl(edges), num_partitions=P, view=view, num_vertices=n, **kw)


def _col(ds, col):
    df = ds.to_pandas().sort_values("vid")
    return df[col].to_numpy()


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_pagerank(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P)
    ds, res = alg.pagerank(g, tol=1e-10, max_rounds=200)
    got = _col(ds, "score")
    want = oracles.pagerank(edges, n, tol=1e-10, max_rounds=200)
    assert np.allclose(got, want, atol=1e-9)
    assert abs(got.sum() - 1.0) < 1e-9


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_wcc(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, view="undirected")
    ds, _ = alg.wcc(g)
    assert _col(ds, "comp").tolist() == oracles.wcc(edges, n)


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_cdlp(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, view="undirected_multi")
    ds, _ = alg.cdlp(g, max_rounds=10)
    assert _col(ds, "label").tolist() == oracles.cdlp(edges, n, rounds=10)


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("dense", [0, 16384], ids=["sparse", "dense"])
def test_triangles(gname, P, dense):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, view="undirected")
    total, ds = alg.triangles(g, dense_threshold=dense)
    want_total, want_tri = oracles.triangles(edges, n)
    assert total == want_total
    assert _col(ds, "tri").tolist() == want_tri


@pytest.mark.parametrize("gname", ["chain5", "two_cliques", "rand60"])
@pytest.mark.parametrize("P", [1, 3])
def test_sssp_bfs(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P)
    ds, _ = alg.sssp(g, source=0)
    assert np.allclose(_col(ds, "dist"), oracles.sssp(edges, n, 0))
    ds2, _ = alg.bfs(g, source=0)
    assert _col(ds2, "depth").tolist() == oracles.bfs_depth(edges, n, 0)


@pytest.mark.parametrize("gname", ["two_cliques", "rand60", "star_hub"])
@pytest.mark.parametrize("P", [1, 3])
def test_hits(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.hits(g, tol=1e-12, max_rounds=300)
    auth, hub = oracles.hits(edges, n, tol=1e-12, max_rounds=300)
    assert np.allclose(_col(ds, "auth"), auth, atol=1e-6)
    assert np.allclose(_col(ds, "hub"), hub, atol=1e-6)


@pytest.mark.parametrize("gname", ["two_cliques", "rand60"])
@pytest.mark.parametrize("k", [2, 3])
def test_kcore(gname, k):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, 3, view="undirected")
    ds, _ = alg.kcore(g, k=k)
    assert _col(ds, "in_core").astype(bool).tolist() == oracles.kcore(edges, n, k)


def test_lcc_and_global_stats():
    edges, n = GRAPHS["two_cliques"]
    g = _build(edges, n, 3, view="undirected")
    lcc = _col(alg.lcc(g), "lcc")
    assert np.allclose(lcc, [1, 1, 1, 1, 1, 1, 1])  # cliques: lcc = 1
    assert abs(alg.transitivity(g) - 1.0) < 1e-12
    assert abs(alg.avg_clustering(g) - 1.0) < 1e-12


def test_empty_graph():
    g = _build([], 5, 2)
    ds, _ = alg.pagerank(g)
    assert np.allclose(_col(ds, "score"), [0.2] * 5)
    gu = _build([], 5, 2, view="undirected")
    total, _ = alg.triangles(gu)
    assert total == 0


def test_centralities_run():
    edges, n = GRAPHS["rand60"]
    g = _build(edges, n, 3)
    ds, _ = alg.eigenvector_centrality(g, max_rounds=50)
    x = _col(ds, "centrality")
    assert np.isfinite(x).all() and abs((x**2).sum() - 1.0) < 1e-6
    ds2, _ = alg.katz_centrality(g, alpha=0.05, max_rounds=200)
    x2 = _col(ds2, "centrality")
    assert np.isfinite(x2).all() and abs((x2**2).sum() - 1.0) < 1e-6
    dc = alg.degree_centrality(g).to_pandas().sort_values("vid")
    outdeg = np.zeros(n, dtype=int)
    for s, d in edges:
        outdeg[s] += 1
    assert dc["degree"].tolist() == outdeg.tolist()


def test_sssp_weighted():
    edges, n = GRAPHS["rand60"]
    rng = np.random.RandomState(11)
    w = rng.randint(1, 6, size=len(edges)).astype(float)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array(w),
        }
    )
    g = build_graph(t, num_partitions=3, num_vertices=n, weight=True)
    ds, _ = alg.sssp(g, source=0)
    got = _col(ds, "dist")
    want = oracles.sssp(edges, n, 0, weights=list(w))
    assert np.allclose(got, want)


@pytest.mark.parametrize("gname", ["two_cliques", "rand60", "star_hub"])
@pytest.mark.parametrize("P", [1, 3])
def test_pagerank_push_converges_to_fixed_point(gname, P):
    """Push/delta PageRank is the Neumann partial sum: run it to a tiny
    residual mass and it must agree with the power-iteration fixed point;
    results must be partition-count invariant."""
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P)
    ds, res = alg.pagerank_push(g, tol=1e-12, max_rounds=400)
    want = oracles.pagerank(edges, n, tol=1e-14, max_rounds=2000)
    assert np.allclose(_col(ds, "score"), want, atol=1e-9)
    assert res.rounds < 400  # the tol stop actually fired


@pytest.mark.parametrize("P", [1, 3])
@pytest.mark.parametrize("delta", [0.5, 2.0, 100.0], ids=["allheavy", "mixed", "alllight"])
def test_sssp_delta_stepping_exact(P, delta):
    """Delta-stepping must be bit-identical to Bellman-Ford at every delta:
    0.5 → every weighted edge heavy, 100 → every edge light, 2.0 → mixed."""
    edges, n = GRAPHS["rand60"]
    rng = np.random.RandomState(11)
    w = rng.randint(1, 6, size=len(edges)).astype(float)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array(w),
        }
    )
    g = build_graph(t, num_partitions=P, num_vertices=n, weight=True)
    got = _col(alg.sssp_delta(g, source=0, delta=delta)[0], "dist")
    want = oracles.sssp(edges, n, 0, weights=list(w))
    assert np.allclose(got, want)
    # unweighted build: unit edges, delta<1 forces the heavy-only path
    gu = _build(edges, n, P)
    got_u = _col(alg.sssp_delta(gu, source=0, delta=0.5)[0], "dist")
    assert np.allclose(got_u, oracles.sssp(edges, n, 0))


def test_p2p_message_mode_matches_shared():
    edges, n = GRAPHS["rand60"]
    g_shared = _build(edges, n, 3)
    g_p2p = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, p2p_messages=True)
    a = _col(alg.pagerank(g_shared, tol=1e-10)[0], "score")
    b = _col(alg.pagerank(g_p2p, tol=1e-10)[0], "score")
    assert np.array_equal(a, b)
    gu = build_graph(
        _tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True, p2p_messages=True
    )
    assert _col(alg.wcc(gu)[0], "comp").tolist() == oracles.wcc(edges, n)


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_ppr(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.ppr(g, source=0, max_rounds=10)
    got = _col(ds, "score")
    want = oracles.ppr(edges, n, source=0, rounds=10)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_articlerank(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P)
    ds, _ = alg.articlerank(g, max_rounds=10)
    got = _col(ds, "score")
    want = oracles.articlerank(edges, n, rounds=10)
    assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("P", [1, 3])
def test_condensation_vs_networkx(P):
    import networkx as nx

    edges, n = _rand_graph(40, 160, seed=11)
    g = _build(edges, n, P, store_in_edges=True)
    df = alg.condensation(g).to_pandas().sort_values("vid").reset_index(drop=True)
    assert len(df) == n

    G = nx.DiGraph(edges)
    G.add_nodes_from(range(n))
    # oracle comp labels: min member per SCC
    want_comp = {}
    for scc_nodes in nx.strongly_connected_components(G):
        m = min(scc_nodes)
        for v in scc_nodes:
            want_comp[v] = m
    assert df.set_index("vid")["scc"].to_dict() == want_comp
    # oracle levels: longest path ending at each condensation node
    C = nx.condensation(G)
    lvl = {c: 0 for c in C.nodes}
    for c in nx.topological_sort(C):
        for _, w in C.out_edges(c):
            lvl[w] = max(lvl[w], lvl[c] + 1)
    # map nx condensation node -> min-vid label
    want_lvl = {}
    for c, data in C.nodes(data=True):
        m = min(data["members"])
        want_lvl[m] = lvl[c]
    got = df.drop_duplicates("scc").set_index("scc")["lvl"].to_dict()
    assert got == want_lvl


def test_condensation_dag_is_identity_levels():
    # pure DAG: every vertex is its own component; lvl = longest-path depth
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    g = _build(edges, 5, 2, store_in_edges=True)
    df = alg.condensation(g).to_pandas().sort_values("vid")
    assert (df["scc"].to_numpy() == np.arange(5)).all()
    assert df["lvl"].tolist() == [0, 1, 1, 2, 3]


@pytest.mark.parametrize("P", [1, 3])
def test_truss_decomposition_vs_networkx(P):
    import networkx as nx
    import ray
    import ray.data

    edges, n = _rand_graph(30, 140, seed=5)
    # canonical undirected set
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges})
    t = _tbl(canon)
    ds = ray.data.from_arrow(t).repartition(P)
    got = (
        alg.truss_decomposition(ds)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    G = nx.Graph(canon)
    want = {}
    k = 3
    prev = {(min(a, b), max(a, b)) for a, b in G.edges()}
    while prev:
        H = nx.k_truss(G, k)
        cur = {(min(a, b), max(a, b)) for a, b in H.edges()}
        for e in prev - cur:
            want[e] = k - 1
        prev = cur
        k += 1
    assert {(r.src, r.dst): r.trussness for r in got.itertuples()} == want


def test_hash_join_left_with_empty_right():
    import ray.data
    from graphscope_ray.utils import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": pa.array([10, 20, 30], pa.int64())})
    )
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
    )
    # filter to produce schema-stripped empty blocks mid-pipeline
    empty = empty.filter(expr="k > 100")
    out = hash_join(left, empty, "k", "k", how="left").to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]


@pytest.mark.parametrize("P", [1, 3])
def test_pagerank_weighted_vs_networkx(P):
    rng = np.random.RandomState(17)
    n = 40
    e = rng.randint(0, n, size=(220, 2))
    e = sorted({(int(a), int(b)) for a, b in e if a != b})
    w = {pair: float(rng.randint(1, 6)) for pair in e}
    t = pa.table(
        {
            "src": pa.array([x[0] for x in e], pa.int64()),
            "dst": pa.array([x[1] for x in e], pa.int64()),
            "weight": pa.array([w[x] for x in e], pa.float64()),
        }
    )
    g = build_graph(t, num_partitions=P, num_vertices=n, weight=True)
    ds, _ = alg.pagerank_weighted(g, alpha=0.85, tol=1e-12, max_rounds=200)
    got = ds.to_pandas().sort_values("vid")["score"].to_numpy()

    # pure-python weighted power iteration (networkx pagerank(weight=...)
    # semantics: dangling mass redistributed uniformly, L1 stop)
    W = np.zeros(n)
    for (a, b), wt in w.items():
        W[a] += wt
    p = np.full(n, 1.0 / n)
    for _ in range(500):
        new = np.zeros(n)
        for (a, b), wt in w.items():
            new[b] += p[a] * wt / W[a]
        dang = p[W == 0].sum()
        new = 0.85 * new + (0.85 * dang + 0.15) / n
        if np.abs(new - p).sum() < 1e-14 * n:
            p = new
            break
        p = new
    assert np.allclose(got, p, atol=1e-9)
