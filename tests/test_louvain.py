"""Louvain: planted-community recovery + modularity quality + determinism
(ref apps/pregel/louvain/louvain.h semantics — distributed level-0 moves,
coarsen, refine)."""

import numpy as np
import pyarrow as pa

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph


def _clique(lo, k):
    return [(i, j) for i in range(lo, lo + k) for j in range(lo, lo + k) if i != j]


def test_two_cliques_split():
    edges = _clique(0, 12) + _clique(12, 12) + [(0, 12)]
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    g = build_graph(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)}),
        num_partitions=3,
        store_in_edges=True,
        num_vertices=24,
        dedup_edges=True,
    )
    ds, q = alg.louvain(g)
    c = ds.to_pandas().sort_values("vid").comm.to_numpy()
    assert len(set(c[:12])) == 1 and len(set(c[12:])) == 1 and c[0] != c[12]
    assert 0.45 < q < 0.5  # theoretical max ≈ 0.4925 for 2 cliques + bridge
    # canonical labels = min member vid
    assert set(c) == {0, 12}


def test_planted_modular_graph():
    rng = np.random.RandomState(1)
    es = []
    for gix in range(4):
        lo = gix * 50
        for _ in range(800):
            a, b = rng.randint(lo, lo + 50, 2)
            if a != b:
                es.append((a, b))
    for _ in range(60):
        a, b = rng.randint(0, 200, 2)
        if a != b:
            es.append((a, b))
    src = np.array([a for a, b in es], dtype=np.int64)
    dst = np.array([b for a, b in es], dtype=np.int64)
    g = build_graph(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)}),
        num_partitions=3,
        store_in_edges=True,
        num_vertices=200,
        dedup_edges=True,
    )
    ds, q = alg.louvain(g)
    c = ds.to_pandas().sort_values("vid").comm.to_numpy()
    purity = np.mean(
        [np.bincount(c[i * 50 : (i + 1) * 50]).max() / 50 for i in range(4)]
    )
    assert q > 0.5
    assert purity > 0.9
    # determinism
    ds2, q2 = alg.louvain(g)
    c2 = ds2.to_pandas().sort_values("vid").comm.to_numpy()
    assert np.array_equal(c, c2) and q == q2
