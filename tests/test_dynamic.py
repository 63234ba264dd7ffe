"""Dynamic mutable graph (graph/dynamic.py) vs networkx as the oracle —
the reference's nx client drives exactly these ops (MODIFY_VERTICES/EDGES,
CLEAR, VIEW, INDUCE_SUBGRAPH, reports; dag_utils.py:359-412,639-737)."""

import json

import networkx as nx
import numpy as np
import pytest

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.dynamic import DynamicGraph


def _edges_equal(dg: DynamicGraph, g: nx.Graph):
    got = dg.edges_dataset().to_pandas()
    mine = set()
    for _, r in got.iterrows():
        u, v = r["src"], r["dst"]
        mine.add((u, v) if dg.directed else tuple(sorted((u, v))))
    theirs = set()
    for u, v in g.edges():
        u, v = str(u), str(v)
        theirs.add((u, v) if g.is_directed() else tuple(sorted((u, v))))
    assert mine == theirs
    assert dg.number_of_edges() == g.number_of_edges()
    assert dg.number_of_nodes() == g.number_of_nodes()
    assert set(dg.nodes_dataset().to_pandas()["oid"]) == {str(n) for n in g.nodes()}


def test_modify_nodes_and_edges_directed():
    dg = DynamicGraph(num_partitions=3, directed=True)
    g = nx.DiGraph()
    dg.add_nodes([1, 2, (3, {"color": "red"})])
    g.add_nodes_from([1, 2, (3, {"color": "red"})])
    # add_edges creates missing endpoints (networkx semantics)
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 2)]
    dg.add_edges(edges, attr={"w": 1})
    g.add_edges_from(edges, w=1)
    _edges_equal(dg, g)
    assert dg.get_node_data(3) == {"color": "red"}
    assert dg.get_edge_data(1, 2) == {"w": 1}
    assert dg.has_edge(2, 2) and not dg.has_edge(2, 1)
    assert dg.degree(2) == g.degree(2)  # in+out for DiGraph
    assert dg.neighbors(1) == sorted(g.successors(1), key=repr)

    # update only touches existing
    dg.update_nodes([(3, {"size": 9}), (99, {"x": 1})])
    assert dg.get_node_data(3) == {"color": "red", "size": 9}
    assert not dg.has_node(99)
    dg.update_edges([(1, 2, {"w": 7}), (9, 9, {"w": 1})])
    assert dg.get_edge_data(1, 2) == {"w": 7}
    assert not dg.has_edge(9, 9)

    # edge deletion keeps endpoints
    dg.del_edges([(2, 3)])
    g.remove_edge(2, 3)
    _edges_equal(dg, g)

    # node deletion takes incident edges with it (both directions, remote)
    dg.del_nodes([1])
    g.remove_node(1)
    _edges_equal(dg, g)
    assert dg.predecessors(2) == sorted(g.predecessors(2), key=repr)


def test_modify_undirected_and_clear():
    dg = DynamicGraph(num_partitions=3, directed=False)
    g = nx.Graph()
    edges = [(1, 2), (2, 3), (3, 1), (3, 3)]
    dg.add_edges(edges)
    g.add_edges_from(edges)
    _edges_equal(dg, g)
    assert dg.has_edge(2, 1)  # symmetric
    assert dg.degree(3) == g.degree(3)  # selfloop counts twice
    dg.del_nodes([3])
    g.remove_node(3)
    _edges_equal(dg, g)
    dg.clear_edges()
    g.clear_edges()
    _edges_equal(dg, g)
    assert dg.number_of_nodes() == 2
    dg.clear()
    assert dg.number_of_nodes() == 0 and dg.number_of_edges() == 0


def test_views_match_networkx():
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    dg = DynamicGraph(num_partitions=2, directed=True).add_edges(edges)
    g = nx.DiGraph(edges)

    rv = dg.view("reversed")
    _edges_equal(rv, g.reverse())
    # reversed twice round-trips
    _edges_equal(rv.view("reversed"), g)

    ud = dg.view("undirected")
    _edges_equal(ud, g.to_undirected())

    # undirected -> directed: both arcs appear
    back = ud.view("directed")
    _edges_equal(back, g.to_undirected().to_directed())

    # views are copies: mutating the view leaves the source intact
    n = dg.number_of_edges()
    rv.del_nodes([1])
    assert dg.number_of_edges() == n


def test_subgraph_induced():
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    dg = DynamicGraph(num_partitions=3, directed=True).add_edges(edges)
    g = nx.DiGraph(edges)
    sub = dg.subgraph([0, 1, 2, 5, 6, 7])
    _edges_equal(sub, g.subgraph([0, 1, 2, 5, 6, 7]))


def test_edge_subgraph():
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7)]
    keep = [(0, 1), (2, 7), (9, 0)]
    dg = DynamicGraph(num_partitions=3, directed=True).add_edges(edges)
    _edges_equal(dg.edge_subgraph(keep), nx.DiGraph(edges).edge_subgraph(keep))
    # undirected: either orientation matches
    dgu = DynamicGraph(num_partitions=3, directed=False).add_edges(edges)
    _edges_equal(
        dgu.edge_subgraph([(1, 0), (2, 7)]),
        nx.Graph(edges).edge_subgraph([(1, 0), (2, 7)]),
    )


def test_randomized_mutation_fuzz_vs_networkx():
    rng = np.random.RandomState(7)
    dg = DynamicGraph(num_partitions=4, directed=True)
    g = nx.DiGraph()
    for step in range(30):
        op = rng.randint(4)
        if op == 0:
            es = [(int(rng.randint(30)), int(rng.randint(30))) for _ in range(8)]
            dg.add_edges(es)
            g.add_edges_from(es)
        elif op == 1:
            es = [(int(rng.randint(30)), int(rng.randint(30))) for _ in range(4)]
            dg.del_edges(es)
            for u, v in es:
                if g.has_edge(u, v):
                    g.remove_edge(u, v)
        elif op == 2:
            ns = [int(rng.randint(30)) for _ in range(2)]
            dg.del_nodes(ns)
            g.remove_nodes_from([n for n in ns if g.has_node(n)])
        else:
            ns = [int(rng.randint(30)) for _ in range(3)]
            dg.add_nodes(ns)
            g.add_nodes_from(ns)
    _edges_equal(dg, g)
    for n in list(g.nodes())[:10]:
        assert dg.degree(n) == g.degree(n)


def test_snapshot_runs_analytics():
    # mutate, then freeze into the static PIE engine and run PageRank
    edges = [(i, (i * 3 + 1) % 40) for i in range(40)]
    dg = DynamicGraph(num_partitions=3, directed=True).add_edges(edges)
    dg.del_nodes([0, 1])
    sg = dg.snapshot(num_partitions=2, store_in_edges=True)
    assert sg.N == dg.number_of_nodes() or sg.N == len(
        {x for e in dg.edges_dataset().to_pandas()[["src", "dst"]].values for x in e}
    )
    ds, res = alg.pagerank(sg, tol=1e-9)
    df = ds.to_pandas()
    assert len(df) == sg.N
    assert abs(df["score"].sum() - 1.0) < 1e-6


def test_string_oids_and_attrs_roundtrip():
    dg = DynamicGraph(num_partitions=3, directed=True)
    dg.add_edges([("repo/a", "repo/b", {"kind": "import"}), ("repo/b", "repo/c")])
    assert dg.has_node("repo/a") and dg.has_edge("repo/a", "repo/b")
    df = dg.edges_dataset().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert json.loads(df.loc[0, "attrs"]) == {"kind": "import"}
    assert dg.neighbors("repo/b") == ["repo/c"]
