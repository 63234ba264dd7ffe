"""reciprocity / avg_neighbor_degree / s_metric vs networkx on seeded random
graphs, at two partition counts (parallelism invariance)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph.metrics import avg_neighbor_degree, reciprocity, s_metric


def _rand_arcs(n=50, m=260, seed=7):
    """Distinct directed self-loop-free arcs, with reciprocated pairs
    guaranteed present (every 5th arc also inserts its reverse)."""
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    arcs = {(int(a), int(b)) for a, b in e}
    arcs |= {(b, a) for i, (a, b) in enumerate(sorted(arcs)) if i % 5 == 0}
    return sorted(arcs), n


def _tbl(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("seed", [7, 19])
def test_reciprocity_vs_networkx(P, seed):
    nx = pytest.importorskip("networkx")
    arcs, n = _rand_arcs(seed=seed)
    # duplicate some input rows: the operator must distinct first
    ds = ray.data.from_arrow(_tbl(arcs + arcs[:17])).repartition(max(P, 1))
    got = reciprocity(ds, num_partitions=P)

    G = nx.DiGraph()
    G.add_edges_from(arcs)
    assert got["n_edges"] == G.number_of_edges()
    assert abs(got["reciprocity"] - nx.overall_reciprocity(G)) < 1e-8
    # n_reciprocated is the arc count on both-direction pairs
    both = sum(1 for a, b in arcs if (b, a) in set(arcs))
    assert got["n_reciprocated"] == both


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("seed", [7, 19])
def test_avg_neighbor_degree_vs_networkx(P, seed):
    nx = pytest.importorskip("networkx")
    arcs, n = _rand_arcs(seed=seed)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = avg_neighbor_degree(ds, num_partitions=P).to_pandas()
    mine = dict(zip(got["oid"].tolist(), got["avg_nbr_deg"].tolist()))

    G = nx.Graph()
    G.add_edges_from(arcs)
    want = nx.average_neighbor_degree(G)
    assert set(mine) == set(want)
    for v, a in want.items():
        assert abs(mine[v] - round(a, 8)) < 1e-7, (v, mine[v], a)


@pytest.mark.parametrize("P", [1, 3])
def test_s_metric_exact(P):
    arcs, n = _rand_arcs(seed=3)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = s_metric(ds, num_partitions=P)

    und = {(min(a, b), max(a, b)) for a, b in arcs}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = sum(deg[a] * deg[b] for a, b in und)
    assert got == want


def test_empty_inputs():
    empty = ray.data.from_arrow(_tbl([]))
    assert s_metric(empty, num_partitions=2) == 0
    r = reciprocity(empty, num_partitions=2)
    assert r["n_edges"] == 0 and r["reciprocity"] == 0.0
    assert avg_neighbor_degree(empty, num_partitions=2).to_pandas().empty
