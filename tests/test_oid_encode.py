"""Vertex-oid encoding: the distributed hash-join path must produce exactly
the same graph (vids, mapping, algorithm results) as the broadcast path.

Ref parity: the reference's vertex map assigns dense ids during loading
(analytical_engine/core/vertex_map/); our contract is vid = rank of oid in
sorted order regardless of which encode strategy ran.
"""

import numpy as np
import pyarrow as pa

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.build import build_graph_from_oids
from graphscope_ray.utils import hash_join

import ray


def _edges_table():
    rng = np.random.RandomState(17)
    src = rng.choice(200, 2000)
    dst = rng.choice(200, 2000)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return pa.table(
        {
            "src_oid": pa.array([f"repo-{s:04d}" for s in src]),
            "dst_oid": pa.array([f"repo-{d:04d}" for d in dst]),
        }
    )


def test_join_encode_matches_broadcast():
    t = _edges_table()
    kw = dict(num_partitions=3, store_in_edges=True)
    g_b = build_graph_from_oids(ray.data.from_arrow(t), encode="broadcast", **kw)
    g_j = build_graph_from_oids(ray.data.from_arrow(t), encode="join", **kw)
    assert g_j.N == g_b.N
    mb = g_b.vertices_ds.to_pandas().sort_values("oid").reset_index(drop=True)
    mj = g_j.vertices_ds.to_pandas().sort_values("oid").reset_index(drop=True)
    assert (mb["oid"] == mj["oid"]).all()
    assert (mb["vid"] == mj["vid"]).all()
    for fn in (alg.pagerank, alg.wcc):
        a = fn(g_b)[0].to_pandas().sort_values("vid").iloc[:, 1].to_numpy()
        b = fn(g_j)[0].to_pandas().sort_values("vid").iloc[:, 1].to_numpy()
        assert np.allclose(a, b, atol=1e-12), fn.__name__


def test_auto_encode_threshold_picks_join():
    t = _edges_table()
    g = build_graph_from_oids(
        ray.data.from_arrow(t), encode="auto", broadcast_limit=10,
        num_partitions=2,
    )
    # 200 distinct oids > limit 10 → join path; mapping must still be dense ranks
    m = g.vertices_ds.to_pandas().sort_values("oid")
    assert (m["vid"].to_numpy() == np.arange(len(m))).all()


def test_hash_join_inner_matches_pandas():
    import pandas as pd

    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.choice(50, 300), "a": rng.randn(300)})
    right = pd.DataFrame({"kk": np.arange(40), "b": np.arange(40) * 2})
    got = (
        hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "kk",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="kk")
        .sort_values(["k", "a"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert np.allclose(got["a"], want["a"])
    assert (got["b"] == want["b"]).all()
