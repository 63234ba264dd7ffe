"""p2p message-path parity: the per-(sender, target) object exchange
(`p2p_messages=True` — the real multi-node wire format) must produce
bit-identical results to the shared-scatter default, in both the per-step
and the pipelined driver loops (VERDICT r1: the p2p path needed evidence)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph


def _edges(n=400, m=4000, seed=3):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])}), n


def _graphs():
    t, n = _edges()
    g_shared = build_graph(
        t, num_partitions=3, store_in_edges=True, num_vertices=n, dedup_edges=True
    )
    g_p2p = build_graph(
        t,
        num_partitions=3,
        store_in_edges=True,
        num_vertices=n,
        dedup_edges=True,
        p2p_messages=True,
    )
    return g_shared, g_p2p


def _frame(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("vid").reset_index(drop=True)


def test_p2p_matches_shared_per_step():
    g_shared, g_p2p = _graphs()
    for algo, kwargs in [
        ("pagerank", dict(tol=1e-10)),
        ("wcc", {}),
        ("cdlp", dict(max_rounds=5)),
        ("sssp", dict(source=0)),
    ]:
        ds_s, res_s = getattr(alg, algo)(g_shared, **kwargs)
        ds_p, res_p = getattr(alg, algo)(g_p2p, **kwargs)
        assert res_s.rounds == res_p.rounds, algo
        pd.testing.assert_frame_equal(_frame(ds_s), _frame(ds_p), check_exact=True)


def test_p2p_matches_shared_pipelined():
    g_shared, g_p2p = _graphs()
    ds_s, res_s = alg.pagerank(g_shared, tol=0.0, max_rounds=12, pipeline=6)
    ds_p, res_p = alg.pagerank(g_p2p, tol=0.0, max_rounds=12, pipeline=6)
    assert res_s.rounds == res_p.rounds == 12
    pd.testing.assert_frame_equal(_frame(ds_s), _frame(ds_p), check_exact=True)


def test_p2p_node_grouped_matches_shared():
    """p2p_group > 1: one wire object per (sender, target node of g
    fragments) — every group size (incl. non-dividing and ≥P) must be
    bit-identical to shared-scatter in both driver loops."""
    t, n = _edges()
    g_shared = build_graph(
        t, num_partitions=4, store_in_edges=True, num_vertices=n, dedup_edges=True
    )
    ds_s, res_s = alg.pagerank(g_shared, tol=1e-10)
    pipe_s, _ = alg.pagerank(g_shared, tol=0.0, max_rounds=12, pipeline=6)
    for gsz in (2, 3, 4, 16):
        g = build_graph(
            t,
            num_partitions=4,
            store_in_edges=True,
            num_vertices=n,
            dedup_edges=True,
            p2p_messages=True,
        )
        g.p2p_group = gsz
        ds_p, res_p = alg.pagerank(g, tol=1e-10)
        assert res_s.rounds == res_p.rounds, gsz
        pd.testing.assert_frame_equal(_frame(ds_s), _frame(ds_p), check_exact=True)
        pipe_p, _ = alg.pagerank(g, tol=0.0, max_rounds=12, pipeline=6)
        pd.testing.assert_frame_equal(_frame(pipe_s), _frame(pipe_p), check_exact=True)
