"""SERIALIZE/DESERIALIZE_GRAPH parity (save_graph/load_graph) + voterank +
sampled closeness."""

import numpy as np
import pyarrow as pa

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph, load_graph, save_graph

from .test_algorithms import GRAPHS, _col, _tbl


def test_save_load_roundtrip(tmp_path):
    edges, n = GRAPHS["rand60"]
    g = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)
    want_pr = _col(alg.pagerank(g, tol=1e-10)[0], "score")
    want_wcc = _col(alg.wcc(g)[0], "comp").tolist()

    path = str(tmp_path / "gsave")
    save_graph(g, path)
    g2 = load_graph(path)
    assert g2.P == g.P and g2.N == g.N and g2.num_edges == g.num_edges
    assert np.allclose(_col(alg.pagerank(g2, tol=1e-10)[0], "score"), want_pr)
    assert _col(alg.wcc(g2)[0], "comp").tolist() == want_wcc


def test_voterank_star():
    # hub with 11 leaves: hub must be elected first
    edges, n = GRAPHS["star_hub"]
    g = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)
    elected = alg.voterank(g, num_elected=3)
    assert elected[0] == 0
    assert len(set(elected)) == len(elected)


def test_voterank_deterministic_across_partitions():
    edges, n = GRAPHS["rand60"]
    a = alg.voterank(
        build_graph(_tbl(edges), num_partitions=1, num_vertices=n, store_in_edges=True), 5
    )
    b = alg.voterank(
        build_graph(_tbl(edges), num_partitions=4, num_vertices=n, store_in_edges=True), 5
    )
    assert a == b


def test_closeness_sampled():
    edges, n = GRAPHS["two_cliques"]
    g = build_graph(_tbl(edges), num_partitions=2, num_vertices=n, store_in_edges=True)
    out = alg.closeness_sampled(g, num_sources=7, seed=1).to_pandas().sort_values("vid")
    assert len(out) == n
    assert (out.closeness >= 0).all()


def test_betweenness_exact_vs_oracle():
    from . import oracles

    edges, n = GRAPHS["rand60"]
    g = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)
    ds = alg.betweenness_sampled(g, sources=list(range(n)))  # exact: all sources
    got = ds.to_pandas().sort_values("vid")["betweenness"].to_numpy()
    want = oracles.betweenness(edges, n)
    assert np.allclose(got, want, atol=1e-9)


def test_betweenness_sampled_subset():
    from . import oracles

    edges, n = GRAPHS["two_cliques"]
    g = build_graph(_tbl(edges), num_partitions=2, num_vertices=n, store_in_edges=True)
    srcs = [0, 4]
    got = (
        alg.betweenness_sampled(g, sources=srcs)
        .to_pandas()
        .sort_values("vid")["betweenness"]
        .to_numpy()
    )
    assert np.allclose(got, oracles.betweenness(edges, n, sources=srcs), atol=1e-12)


def test_export_golden_format(tmp_path):
    edges, n = GRAPHS["two_cliques"]
    g = build_graph(_tbl(edges), num_partitions=2, num_vertices=n, store_in_edges=True)
    ds, _ = alg.wcc(g)
    p = alg.export_golden(g, ds.select_columns(["vid", "comp"]), "comp", str(tmp_path / "wcc.txt"))
    lines = open(p).read().splitlines()
    assert lines == ["0 0", "1 0", "2 0", "3 0", "4 4", "5 4", "6 4"]
    import pyarrow.parquet as pq

    assert pq.read_table(p + ".parquet").num_rows == n


def test_edge_betweenness_exact_vs_networkx():
    import networkx as nx

    edges, n = GRAPHS["rand60"]
    g = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)
    df = (
        alg.edge_betweenness_sampled(g, sources=list(range(n)))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    G = nx.DiGraph(edges)
    G.add_nodes_from(range(n))
    want = nx.edge_betweenness_centrality(G, normalized=False)
    got = {(int(r.src), int(r.dst)): r.ebc for r in df.itertuples()}
    assert set(got) == set((u, v) for u, v in G.edges())
    for e, w in want.items():
        assert abs(got[e] - w) < 1e-9, (e, got[e], w)


def test_edge_betweenness_subset_partition_invariant():
    edges, n = GRAPHS["two_cliques"]
    srcs = [0, 4]
    outs = []
    for P in (1, 3):
        g = build_graph(_tbl(edges), num_partitions=P, num_vertices=n, store_in_edges=True)
        outs.append(
            alg.edge_betweenness_sampled(g, sources=srcs)
            .to_pandas()
            .sort_values(["src", "dst"])
            .reset_index(drop=True)
        )
    assert (outs[0][["src", "dst"]].values == outs[1][["src", "dst"]].values).all()
    assert np.allclose(outs[0]["ebc"], outs[1]["ebc"], atol=1e-12)
    # subset consistency: vertex delta = sum of its out-edge contributions
    vbc = (
        alg.betweenness_sampled(
            build_graph(_tbl(edges), num_partitions=2, num_vertices=n, store_in_edges=True),
            sources=srcs,
        )
        .to_pandas()
        .sort_values("vid")["betweenness"]
        .to_numpy()
    )
    per_src = outs[0].groupby("src")["ebc"].sum()
    for v in range(n):
        if v in srcs:
            continue
        assert abs(per_src.get(v, 0.0) - vbc[v]) < 1e-9


def test_khop_sizes_vs_python():
    from collections import deque

    from graphscope_ray.pipelines import testdata as td

    df = td.lg_khop_sizes("/root/testdata/sf0.001", num_sources=2)
    # python BFS oracle on the raw edge table
    e = td.lg_edges("/root/testdata/sf0.001").to_pandas()
    adj = {}
    for s, d in zip(e["src"], e["dst"]):
        adj.setdefault(int(s), []).append(int(d))
    for src in (0, 1):
        dist = {src: 0}
        q = deque([src])
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):  # noqa
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        from collections import Counter

        want = Counter(dist.values())
        rows = df[df.source == src]
        assert {int(r.depth): int(r.n) for r in rows.itertuples()} == dict(want)


def test_ppr_seeds_reduces_to_ppr():
    edges, n = GRAPHS["rand60"]
    g = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)
    a = alg.ppr(g, source=0, max_rounds=8)[0].to_pandas().sort_values("vid")["score"].to_numpy()
    b = (
        alg.ppr_seeds(g, seeds=[0], max_rounds=8)[0]
        .to_pandas()
        .sort_values("vid")["score"]
        .to_numpy()
    )
    assert np.allclose(a, b, atol=0)  # bit-identical at |S| = 1


def test_ppr_seeds_mass_concentrates_on_seed_set():
    edges, n = GRAPHS["two_cliques"]
    g = build_graph(_tbl(edges), num_partitions=2, num_vertices=n, store_in_edges=True)
    df = alg.ppr_seeds(g, seeds=[0, 1], max_rounds=12)[0].to_pandas().sort_values("vid")
    s = df["score"].to_numpy()
    # seeds in clique A: clique-A vertices outrank clique-B vertices
    assert s[:4].min() > s[4:].max()
