"""The single directed graph built with in-edges must reproduce the results
of the pre-symmetrized views for WCC / CDLP / triangles / k-core (the GRAPE
fragment shape: one load, every app)."""

import numpy as np
import pytest

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph

from .test_algorithms import GRAPHS, _col, _tbl


@pytest.mark.parametrize("gname", ["two_cliques", "rand60", "self_loop_dup", "star_hub"])
def test_directed_with_in_edges_matches_views(gname):
    edges, n = GRAPHS[gname]
    gd = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, store_in_edges=True)

    gu = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, view="undirected")
    gm = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, view="undirected_multi")

    assert _col(alg.wcc(gd)[0], "comp").tolist() == _col(alg.wcc(gu)[0], "comp").tolist()
    assert _col(alg.cdlp(gd)[0], "label").tolist() == _col(alg.cdlp(gm)[0], "label").tolist()

    td, dsd = alg.triangles(gd)
    tu, dsu = alg.triangles(gu)
    assert td == tu
    assert _col(dsd, "tri").tolist() == _col(dsu, "tri").tolist()

    if gname != "self_loop_dup":
        a = _col(alg.kcore(gd, k=2)[0], "in_core").tolist()
        b = _col(alg.kcore(gu, k=2)[0], "in_core").tolist()
        assert a == b
