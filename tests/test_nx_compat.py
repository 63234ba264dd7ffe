"""networkx-compat entry point (graphscope_ray/nx_compat.py) vs networkx
itself as the oracle — the reference's third user path (SURVEY §3.3)."""

import networkx as nx
import numpy as np
import pytest

import graphscope_ray.nx_compat as gnx
from tests import oracles


def _pr_oracle(R: "nx.DiGraph", alpha=0.85, tol=1e-12):
    """Relabel to 0..n-1 and run the repo's pure-python pagerank oracle
    (nx.pagerank needs scipy, absent in this container)."""
    ns = sorted(R.nodes, key=repr)
    ix = {n: i for i, n in enumerate(ns)}
    sc = oracles.pagerank([(ix[u], ix[v]) for u, v in R.edges], len(ns),
                          alpha=alpha, tol=tol, max_rounds=500)
    return {n: sc[ix[n]] for n in ns}


def _hits_oracle(R: "nx.DiGraph", tol=1e-12):
    ns = sorted(R.nodes, key=repr)
    ix = {n: i for i, n in enumerate(ns)}
    auth, hub = oracles.hits([(ix[u], ix[v]) for u, v in R.edges], len(ns),
                             tol=tol, max_rounds=200)
    return {n: hub[ix[n]] for n in ns}, {n: auth[ix[n]] for n in ns}

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (1, 4), (5, 0), (7, 8)]


def _pair():
    G = gnx.DiGraph(EDGES, num_partitions=2)
    R = nx.DiGraph(EDGES)
    return G, R


def test_structure_and_point_reads():
    G, R = _pair()
    assert G.number_of_nodes() == R.number_of_nodes()
    assert G.number_of_edges() == R.number_of_edges()
    assert sorted(G.nodes) == sorted(R.nodes)
    assert sorted(G.edges) == sorted(R.edges)
    assert (3 in G) == (3 in R) and (99 in G) == (99 in R)
    assert G.has_edge(2, 3) and not G.has_edge(3, 2)
    assert sorted(G.successors(2)) == sorted(R.successors(2))
    assert sorted(G.predecessors(0)) == sorted(R.predecessors(0))
    assert G.in_degree(3) == R.in_degree(3) and G.out_degree(1) == R.out_degree(1)


def test_mutation_then_algorithms_match_networkx():
    G, R = _pair()
    for g in (G, R):
        g.add_edge(8, 0)
        g.remove_edge(3, 4)
        g.add_node(42)
    want = _pr_oracle(R, alpha=0.85)
    got = gnx.pagerank(G, alpha=0.85, tol=1e-10)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-6, n
    # wcc as node sets
    want_cc = sorted(map(sorted, nx.weakly_connected_components(R)))
    got_cc = sorted(map(sorted, gnx.weakly_connected_components(G)))
    assert got_cc == want_cc


def test_undirected_clustering_triangles_core():
    ue = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (1, 4), (0, 4)]
    G = gnx.Graph(ue, num_partitions=2)
    R = nx.Graph(ue)
    assert gnx.triangles(G) == nx.triangles(R)
    got = gnx.clustering(G)
    want = nx.clustering(R)
    assert all(abs(got[n] - want[n]) < 1e-12 for n in want)
    assert abs(gnx.average_clustering(G) - nx.average_clustering(R)) < 1e-12
    assert abs(gnx.transitivity(G) - nx.transitivity(R)) < 1e-12
    assert gnx.core_number(G) == nx.core_number(R)
    assert gnx.degree_centrality(G) == pytest.approx(nx.degree_centrality(R))


def test_paths_and_snapshot_cache():
    G, R = _pair()
    got = gnx.single_source_shortest_path_length(G, 0)
    want = dict(nx.single_source_shortest_path_length(R, 0))
    assert got == want
    # weighted
    GW = gnx.DiGraph(num_partitions=2)
    RW = nx.DiGraph()
    for u, v, w in [(0, 1, 2.0), (1, 2, 3.0), (0, 2, 10.0), (2, 3, 1.0)]:
        GW.add_edge(u, v, weight=w)
        RW.add_edge(u, v, weight=w)
    gotw = gnx.shortest_path_length(GW, 0, weight="weight")
    wantw = dict(nx.single_source_dijkstra_path_length(RW, 0, weight="weight"))
    assert gotw == wantw
    # snapshot cache: same static graph object until a mutation bumps version
    s1 = G._snapshot()
    s2 = G._snapshot()
    assert s1 is s2
    G.add_edge(100, 101)
    assert G._snapshot() is not s1


def test_string_node_ids():
    ed = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    G = gnx.DiGraph(ed, num_partitions=2)
    R = nx.DiGraph(ed)
    want = _pr_oracle(R)
    got = gnx.pagerank(G, tol=1e-10)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-6
    assert gnx.single_source_shortest_path_length(G, "a") == dict(
        nx.single_source_shortest_path_length(R, "a")
    )


def test_hits_and_label_propagation():
    G, R = _pair()
    hub, auth = gnx.hits(G, tol=1e-12)
    want_h, want_a = _hits_oracle(R)
    for n in want_h:
        assert abs(hub[n] - want_h[n]) < 1e-4
        assert abs(auth[n] - want_a[n]) < 1e-4
    comms = list(gnx.label_propagation_communities(G))
    assert sum(len(c) for c in comms) == G.number_of_nodes()


def test_directed_semantics_guards():
    """Directed graphs: degree_centrality counts in+out like networkx;
    undirected-only algorithms refuse instead of returning wrong numbers."""
    G = gnx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)], num_partitions=2)
    R = nx.DiGraph([(0, 1), (1, 2), (2, 0), (0, 2)])
    assert gnx.degree_centrality(G) == pytest.approx(nx.degree_centrality(R))
    for fn in (gnx.triangles, gnx.clustering, gnx.transitivity, gnx.average_clustering):
        with pytest.raises(NotImplementedError):
            fn(G)
    with pytest.raises(NotImplementedError):
        gnx.pagerank(G, weight="weight")
    # NodeView attr lookup + data view
    G.add_node(9, color="red")
    assert G.nodes[9] == {"color": "red"}
    assert (9, {"color": "red"}) in G.nodes(data=True)
    with pytest.raises(KeyError):
        G.nodes[12345]


def test_centrality_vs_networkx():
    ue = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3), (4, 5), (0, 2)]
    G = gnx.Graph(ue, num_partitions=2)
    R = nx.Graph(ue)
    got = gnx.betweenness_centrality(G)  # exact
    want = nx.betweenness_centrality(R)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
    gc = gnx.closeness_centrality(G)
    wc = nx.closeness_centrality(R)
    for n in wc:
        assert abs(gc[n] - wc[n]) < 1e-9, n
    gh = gnx.harmonic_centrality(G)
    wh = nx.harmonic_centrality(R)
    for n in wh:
        assert abs(gh[n] - wh[n]) < 1e-9, n
    comms = gnx.louvain_communities(G)
    assert sum(len(c) for c in comms) == R.number_of_nodes()


def test_directed_centrality_vs_networkx():
    de = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (1, 4)]
    G = gnx.DiGraph(de, num_partitions=2)
    R = nx.DiGraph(de)
    got = gnx.betweenness_centrality(G)
    want = nx.betweenness_centrality(R)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, n
    gc = gnx.closeness_centrality(G)
    wc = nx.closeness_centrality(R)
    for n in wc:
        assert abs(gc[n] - wc[n]) < 1e-9, n


def test_distance_measures_match_networkx():
    # connected undirected graph (petersen-ish small)
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 5), (1, 6), (2, 7), (5, 7), (6, 7)]
    G = gnx.Graph(E, num_partitions=2)
    R = nx.Graph(E)
    assert gnx.eccentricity(G) == nx.eccentricity(R)
    assert gnx.diameter(G) == nx.diameter(R)
    assert gnx.radius(G) == nx.radius(R)
    assert sorted(gnx.center(G)) == sorted(nx.center(R))
    assert sorted(gnx.periphery(G)) == sorted(nx.periphery(R))
    assert abs(
        gnx.average_shortest_path_length(G) - nx.average_shortest_path_length(R)
    ) < 1e-12
    assert abs(gnx.density(G) - nx.density(R)) < 1e-15
    assert gnx.is_connected(G) == nx.is_connected(R)


def test_distance_measures_raise_on_disconnected():
    E = [(0, 1), (2, 3)]
    G = gnx.Graph(E, num_partitions=2)
    assert not gnx.is_connected(G)
    with pytest.raises(ValueError):
        gnx.eccentricity(G)
    with pytest.raises(ValueError):
        gnx.average_shortest_path_length(G)


def test_shortest_path_and_has_path():
    E = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (7, 8)]
    G = gnx.DiGraph(E, num_partitions=2)
    R = nx.DiGraph(E)
    for s, t in [(0, 5), (0, 3), (1, 3)]:
        p = gnx.shortest_path(G, s, t)
        assert len(p) == len(nx.shortest_path(R, s, t))
        assert p[0] == s and p[-1] == t
        # verify it is a real path
        assert all(G.has_edge(u, v) for u, v in zip(p, p[1:]))
    assert gnx.has_path(G, 0, 5) and not gnx.has_path(G, 0, 7)
    with pytest.raises(ValueError):
        gnx.shortest_path(G, 0, 8)


def test_assortativity_and_voterank_match_networkx():
    rng = np.random.default_rng(3)
    E = sorted({(int(a), int(b)) for a, b in rng.integers(0, 12, (40, 2)) if a != b})
    G = gnx.Graph(E, num_partitions=2)
    R = nx.Graph(E)
    got = gnx.degree_assortativity_coefficient(G)
    want = nx.degree_assortativity_coefficient(R)
    assert abs(got - want) < 1e-9, (got, want)
    # directed
    Gd = gnx.DiGraph(E, num_partitions=2)
    Rd = nx.DiGraph(E)
    gotd = gnx.degree_assortativity_coefficient(Gd)
    wantd = nx.degree_assortativity_coefficient(Rd)
    assert abs(gotd - wantd) < 1e-9, (gotd, wantd)
    # voterank: nx breaks score ties by dict iteration order, the engine by
    # min vid — compare the untied prefix, and assert engine determinism
    assert gnx.voterank(G, 2) == nx.voterank(R, 2)
    assert gnx.voterank(G, 4) == gnx.voterank(G, 4)
    G1 = gnx.Graph(E, num_partitions=1)
    assert gnx.voterank(G1, 4) == gnx.voterank(G, 4)


def test_voterank_zero_and_assortativity_nan():
    E = [(0, 1), (1, 2), (2, 3), (3, 0)]  # 4-cycle: degree-regular
    G = gnx.Graph(E, num_partitions=2)
    R = nx.Graph(E)
    assert gnx.voterank(G, 0) == []
    got = gnx.degree_assortativity_coefficient(G)
    want = nx.degree_assortativity_coefficient(R)
    assert np.isnan(got) and np.isnan(want)


def test_big_graph_guard(monkeypatch):
    """The facade refuses driver-side materialization past MAX_DRIVER_ROWS
    with a clear redirect to the primary API (it must not OOM silently)."""
    import pytest

    G = gnx.Graph([(0, 1), (1, 2), (2, 3)], num_partitions=2)
    monkeypatch.setattr(gnx, "MAX_DRIVER_ROWS", 2)
    with pytest.raises(ValueError, match="primary Dataset API"):
        _ = G.edges
    with pytest.raises(ValueError, match="primary Dataset API"):
        list(G.nodes)
    with pytest.raises(ValueError, match="primary Dataset API"):
        gnx.pagerank(G, weight=None)
    # point reads stay fine under the cap
    assert G.number_of_nodes() == 4 and G.has_edge(1, 2)
    monkeypatch.setattr(gnx, "MAX_DRIVER_ROWS", 5_000_000)
    assert len(G.edges) == 3
