"""rich_club_coefficient and global_efficiency vs networkx on seeded random
graphs, at two partition counts (parallelism invariance)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.metrics import rich_club_coefficient


def _rand_edges(n=60, m=300, seed=11):
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    e = sorted({(int(a), int(b)) for a, b in e})
    return e, n


def _tbl(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("seed", [11, 23])
def test_rich_club_vs_networkx(P, seed):
    nx = pytest.importorskip("networkx")
    edges, n = _rand_edges(seed=seed)
    ds = ray.data.from_arrow(_tbl(edges)).repartition(max(P, 1))
    got = rich_club_coefficient(ds, num_partitions=P)

    G = nx.Graph()
    G.add_edges_from(edges)
    want = nx.rich_club_coefficient(G, normalized=False)
    mine = dict(zip(got["k"].tolist(), got["phi"].tolist()))
    assert set(mine) == set(want)
    for k, phi in want.items():
        assert abs(mine[k] - phi) < 1e-8, (k, mine[k], phi)
    # the integer counts are self-consistent with phi
    for _, r in got.iterrows():
        assert abs(r["phi"] - 2.0 * r["n_edges"] / (r["n_nodes"] * (r["n_nodes"] - 1.0))) < 1e-8


@pytest.mark.parametrize("P", [1, 3])
def test_global_efficiency_vs_networkx(P):
    nx = pytest.importorskip("networkx")
    edges, n = _rand_edges(n=40, m=120, seed=5)
    g = build_graph(_tbl(edges), num_partitions=P, view="directed", num_vertices=n)
    got = alg.global_efficiency(g, chunk=16)

    G = nx.DiGraph()
    G.add_nodes_from(range(n))
    G.add_edges_from(edges)
    s = 0.0
    pairs = 0
    for u, dd in nx.all_pairs_shortest_path_length(G):
        for v, d in dd.items():
            if d > 0:
                s += 1.0 / d
                pairs += 1
    assert got["n_pairs"] == pairs
    assert abs(got["global_efficiency"] - s / (n * (n - 1))) < 1e-9


def test_rich_club_empty_and_tiny():
    # single edge: both endpoints degree 1 → only k=0 qualifies (N_0=2)
    ds = ray.data.from_arrow(_tbl([(0, 1)]))
    got = rich_club_coefficient(ds, num_partitions=2)
    assert got["k"].tolist() == [0]
    assert got["phi"].tolist() == [1.0]
