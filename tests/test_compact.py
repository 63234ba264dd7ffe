"""compact_edges (varint+delta CSR) memory option: codec roundtrip,
bit-identical algorithm results on both layouts, measured residency drop."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.build import build_graph
from graphscope_ray.graph.fragment import (
    _delta_decode_rows,
    _delta_encode_rows,
    _varint_decode,
    _varint_encode,
)


def test_varint_roundtrip():
    rng = np.random.RandomState(0)
    for vals in (
        np.array([], dtype=np.int64),
        np.array([0], dtype=np.int64),
        np.array([0, 127, 128, 129, 2**14 - 1, 2**14, 2**31, 2**62], dtype=np.int64),
        rng.randint(0, 2**40, size=10_000).astype(np.int64),
        np.zeros(1000, dtype=np.int64),
    ):
        blob = _varint_encode(vals)
        assert blob.dtype == np.uint8
        got = _varint_decode(blob, len(vals))
        np.testing.assert_array_equal(got, vals)


def test_delta_roundtrip_rows():
    rng = np.random.RandomState(1)
    # ragged rows of sorted values, incl. empty rows
    rows = [np.sort(rng.randint(0, 10_000, size=rng.randint(0, 30))) for _ in range(200)]
    vals = np.concatenate([r for r in rows]).astype(np.int64) if rows else np.empty(0, np.int64)
    indptr = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    delta = _delta_encode_rows(vals.copy(), indptr)
    got = _delta_decode_rows(delta, indptr)
    np.testing.assert_array_equal(got, vals)


def _edges(n=400, m=3000, seed=3):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, size=m)
    dst = rng.randint(0, n, size=m)
    keep = src != dst
    return pa.table(
        {"src": pa.array(src[keep].astype(np.int64)), "dst": pa.array(dst[keep].astype(np.int64))}
    )


def test_compact_graph_parity_and_memory():
    t = _edges()
    g0 = build_graph(ray.data.from_arrow(t), num_partitions=3, store_in_edges=True, dedup_edges=True)
    g1 = build_graph(
        ray.data.from_arrow(t), num_partitions=3, store_in_edges=True, dedup_edges=True, compact=True
    )
    assert g0.num_edges == g1.num_edges

    def frame(ds, cols):
        return ds.to_pandas().sort_values("vid").reset_index(drop=True)[cols]

    # bit-identical supersteps (they run on the per-target index)
    p0, _ = alg.pagerank(g0, tol=0.0, max_rounds=8)
    p1, _ = alg.pagerank(g1, tol=0.0, max_rounds=8)
    pd.testing.assert_frame_equal(frame(p0, ["vid", "score"]), frame(p1, ["vid", "score"]))
    w0, _ = alg.wcc(g0)
    w1, _ = alg.wcc(g1)
    pd.testing.assert_frame_equal(frame(w0, ["vid", "comp"]), frame(w1, ["vid", "comp"]))
    # triangle kernels decode the compact adjacency on demand
    t0, _ = alg.triangles(g0)
    t1, _ = alg.triangles(g1)
    assert t0 == t1 and t0 > 0
    # point queries decode too
    for v in (0, 1, 17):
        np.testing.assert_array_equal(g0.successors(v), g1.successors(v))
        np.testing.assert_array_equal(g0.predecessors(v), g1.predecessors(v))
    # measured residency drop on the primary adjacency
    m0 = g0.memory_report()
    m1 = g1.memory_report()
    assert m1["compact"] and not m0["compact"]
    assert m1["total_bytes"] < m0["total_bytes"]
    # dst was E×8 raw; the blob should cut total residency noticeably
    assert m1["total_bytes"] <= 0.85 * m0["total_bytes"]
