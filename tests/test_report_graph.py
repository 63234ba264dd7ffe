"""REPORT_GRAPH point queries (core/fragment/fragment_reporter.h:87-200):
has_node / has_edge / successors / predecessors / edge_data / selfloops."""

import numpy as np
import pyarrow as pa
import pytest

from graphscope_ray.graph.build import build_graph


def _graph(weighted=False, hub_threshold=None, selfloops=False):
    rng = np.random.RandomState(23)
    src = rng.randint(0, 40, 400)
    dst = rng.randint(0, 40, 400)
    if not selfloops:
        keep = src != dst
        src, dst = src[keep], dst[keep]
    # a hub: vertex 0 points at everything
    src = np.concatenate([src, np.zeros(39, np.int64)])
    dst = np.concatenate([dst, np.arange(1, 40)])
    cols = {"src": pa.array(src.astype(np.int64)), "dst": pa.array(dst.astype(np.int64))}
    if weighted:
        cols["weight"] = pa.array((src * 100.0 + dst) + 0.5)
    g = build_graph(
        pa.table(cols),
        num_partitions=3,
        num_vertices=40,
        store_in_edges=True,
        dedup_edges=True,
        weight=weighted,
        hub_threshold=hub_threshold,
    )
    # dedup'd python-side adjacency for oracle
    pairs = set(zip(src.tolist(), dst.tolist()))
    return g, pairs


def test_point_queries_match_python():
    g, pairs = _graph()
    assert g.has_node(0) and g.has_node(39) and not g.has_node(40)
    assert g.num_selfloops() == 0
    succ0 = sorted(int(d) for s, d in pairs if s == 0)
    assert sorted(g.successors(0).tolist()) == succ0
    preds7 = sorted(int(s) for s, d in pairs if d == 7)
    assert sorted(g.predecessors(7).tolist()) == preds7
    for u, v in [(0, 1), (0, 39), (5, 5)]:
        assert g.has_edge(u, v) == ((u, v) in pairs), (u, v)
    assert not g.has_edge(0, 99)
    assert not g.has_edge(-1, 0)


def test_edge_data_weighted():
    g, pairs = _graph(weighted=True)
    u, v = next(iter(pairs))
    assert g.edge_data(u, v) == u * 100.0 + v + 0.5
    missing = next((a, b) for a in range(40) for b in range(40) if (a, b) not in pairs)
    assert g.edge_data(*missing) is None


def test_selfloops_counted():
    g, pairs = _graph(selfloops=True)
    want = len({(s, d) for s, d in pairs if s == d})
    assert g.num_selfloops() == want


def test_point_queries_on_hub_split_graph():
    # hub_threshold requires a pre-deduped edge table (build.py guard)
    plain, pairs = _graph()
    sp = sorted(pairs)
    src = pa.array([s for s, _ in sp], pa.int64())
    dst = pa.array([d for _, d in sp], pa.int64())
    g = build_graph(
        pa.table({"src": src, "dst": dst}),
        num_partitions=3,
        num_vertices=40,
        store_in_edges=True,
        hub_threshold=20,
    )
    for vid in (0, 7):
        assert sorted(g.successors(vid).tolist()) == sorted(plain.successors(vid).tolist())
    assert g.has_edge(0, 1) and not g.has_edge(1, 99)
    # hub edge data present through the shard path
    assert g.edge_data(0, 1) == 1.0


def test_out_of_range_raises():
    g, _ = _graph()
    with pytest.raises(KeyError):
        g.successors(40)
