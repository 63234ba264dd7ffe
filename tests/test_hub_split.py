"""Degree-skew hub splitting: out-edges of high-out-degree vertices are
routed by destination and applied fragment-locally from broadcast hub scores
(the north rule's skew requirement) — results must be identical to the
unsplit build and the oracle."""

import numpy as np
import pyarrow as pa

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph

from . import oracles


def _skewed_graph(n=200, seed=5):
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(800, 2))
    e = e[e[:, 0] != e[:, 1]]
    pairs = {(int(a), int(b)) for a, b in e}
    # vertex 0 is a mega out-hub: imports everything (like `numpy`'s reverse)
    pairs |= {(0, d) for d in range(1, n)}
    # vertex 1 is a mega in-hub
    pairs |= {(s, 1) for s in range(2, n)}
    edges = sorted(pairs)
    return edges, n


def _tbl(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


def test_hub_split_pagerank_matches():
    edges, n = _skewed_graph()
    want = oracles.pagerank(edges, n, tol=1e-12, max_rounds=200)

    g_plain = build_graph(_tbl(edges), num_partitions=4, num_vertices=n)
    ds, _ = alg.pagerank(g_plain, tol=1e-12, max_rounds=200)
    plain = ds.to_pandas().sort_values("vid")["score"].to_numpy()

    g_hub = build_graph(_tbl(edges), num_partitions=4, num_vertices=n, hub_threshold=50)
    ds2, _ = alg.pagerank(g_hub, tol=1e-12, max_rounds=200)
    split = ds2.to_pandas().sort_values("vid")["score"].to_numpy()

    assert np.allclose(plain, want, atol=1e-10)
    assert np.allclose(split, want, atol=1e-10)
    assert np.allclose(split, plain, atol=1e-12)


def test_hub_split_degrees_and_pipelined():
    edges, n = _skewed_graph()
    g = build_graph(_tbl(edges), num_partitions=4, num_vertices=n, hub_threshold=50)
    deg = g.degrees().to_pandas().sort_values("vid")["out_deg"].to_numpy()
    outdeg = np.zeros(n, dtype=int)
    for s, d in edges:
        outdeg[s] += 1
    assert deg.tolist() == outdeg.tolist()  # true_outdeg despite split edges

    # pipelined rounds carry the hub-score dict through the actor-side reduce
    g2 = build_graph(_tbl(edges), num_partitions=4, num_vertices=n, hub_threshold=50)
    a, _ = alg.pagerank(g, tol=0.0, max_rounds=13)
    b, _ = alg.pagerank(g2, tol=0.0, max_rounds=13, pipeline=5)
    av = a.to_pandas().sort_values("vid")["score"].to_numpy()
    bv = b.to_pandas().sort_values("vid")["score"].to_numpy()
    assert np.array_equal(av, bv)


def test_hub_split_checkpoint_resume(tmp_path):
    edges, n = _skewed_graph()
    ckpt = str(tmp_path / "hub_pr")
    g_full = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, hub_threshold=50)
    want = (
        alg.pagerank(g_full, tol=1e-10)[0].to_pandas().sort_values("vid")["score"].to_numpy()
    )
    g1 = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, hub_threshold=50)
    alg.pagerank(g1, tol=1e-10, max_rounds=4, checkpoint_dir=ckpt)
    g2 = build_graph(_tbl(edges), num_partitions=3, num_vertices=n, hub_threshold=50)
    ds, _ = alg.pagerank(g2, tol=1e-10, checkpoint_dir=ckpt, resume=True)
    got = ds.to_pandas().sort_values("vid")["score"].to_numpy()
    assert np.allclose(got, want, atol=1e-12)


def test_hub_split_wcc_matches():
    edges, n = _skewed_graph()
    g_plain = build_graph(
        _tbl(edges), num_partitions=4, num_vertices=n, store_in_edges=True
    )
    want = (
        alg.wcc(g_plain)[0].to_pandas().sort_values("vid")["comp"].tolist()
    )
    assert want == oracles.wcc(edges, n)
    g_hub = build_graph(
        _tbl(edges), num_partitions=4, num_vertices=n,
        store_in_edges=True, hub_threshold=50,
    )
    got = alg.wcc(g_hub)[0].to_pandas().sort_values("vid")["comp"].tolist()
    assert got == want


def test_hub_split_wcc_disconnected():
    # two components, each with its own split hub
    edges = [(0, d) for d in range(2, 50)] + [(1, d) for d in range(50, 99)]
    edges += [(5, 6), (60, 61)]
    n = 99
    g = build_graph(
        _tbl(edges), num_partitions=3, num_vertices=n,
        store_in_edges=True, hub_threshold=10,
    )
    got = alg.wcc(g)[0].to_pandas().sort_values("vid")["comp"].tolist()
    assert got == oracles.wcc(edges, n)


def test_hub_split_sssp_bfs_hits_match():
    edges, n = _skewed_graph()
    kw = dict(num_partitions=4, num_vertices=n, store_in_edges=True)
    g_plain = build_graph(_tbl(edges), **kw)
    g_hub = build_graph(_tbl(edges), hub_threshold=50, **kw)
    for algo, kwargs, col in [
        ("sssp", dict(source=0), "dist"),
        ("bfs", dict(source=0), "depth"),
        ("sssp", dict(source=7), "dist"),
        ("hits", dict(tol=0.0, max_rounds=6), "auth"),
    ]:
        a = getattr(alg, algo)(g_plain, **kwargs)[0].to_pandas().sort_values("vid")
        b = getattr(alg, algo)(g_hub, **kwargs)[0].to_pandas().sort_values("vid")
        if col == "auth":
            assert np.allclose(a["auth"], b["auth"], atol=1e-12), algo
            assert np.allclose(a["hub"], b["hub"], atol=1e-12), algo
        else:
            assert np.array_equal(a[col].to_numpy(), b[col].to_numpy()), (algo, kwargs)


def test_hub_split_weighted_sssp_matches():
    edges, n = _skewed_graph()
    rng = np.random.RandomState(9)
    w = rng.uniform(0.5, 3.0, len(edges))
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array(w),
        }
    )
    kw = dict(num_partitions=4, num_vertices=n, store_in_edges=True, weight=True)
    g_plain = build_graph(t, **kw)
    g_hub = build_graph(t, hub_threshold=50, **kw)
    a = alg.sssp(g_plain, source=0)[0].to_pandas().sort_values("vid")["dist"].to_numpy()
    b = alg.sssp(g_hub, source=0)[0].to_pandas().sort_values("vid")["dist"].to_numpy()
    assert np.allclose(a, b, atol=1e-12, equal_nan=True)


def test_hub_split_save_load_roundtrip(tmp_path):
    from graphscope_ray.graph.build import load_graph, save_graph

    edges, n = _skewed_graph()
    kw = dict(num_partitions=4, num_vertices=n, store_in_edges=True)
    g_hub = build_graph(_tbl(edges), hub_threshold=50, **kw)
    want_pr = (
        alg.pagerank(g_hub, tol=1e-12)[0].to_pandas().sort_values("vid")["score"].to_numpy()
    )
    path = str(tmp_path / "hubg")
    save_graph(g_hub, path)
    g2 = load_graph(path)
    got_pr = (
        alg.pagerank(g2, tol=1e-12)[0].to_pandas().sort_values("vid")["score"].to_numpy()
    )
    assert np.allclose(got_pr, want_pr, atol=1e-12)
    got_sssp = alg.sssp(g2, source=0)[0].to_pandas().sort_values("vid")["dist"].to_numpy()
    want_sssp = alg.sssp(g_hub, source=0)[0].to_pandas().sort_values("vid")["dist"].to_numpy()
    assert np.array_equal(got_sssp, want_sssp)


def test_hub_split_cdlp_matches():
    edges, n = _skewed_graph()
    g_plain = build_graph(
        _tbl(edges), num_partitions=4, num_vertices=n, store_in_edges=True
    )
    want = alg.cdlp(g_plain, max_rounds=10)[0].to_pandas().sort_values("vid")["label"].tolist()
    assert want == oracles.cdlp(edges, n, rounds=10)
    g_hub = build_graph(
        _tbl(edges), num_partitions=4, num_vertices=n,
        store_in_edges=True, hub_threshold=50,
    )
    got = alg.cdlp(g_hub, max_rounds=10)[0].to_pandas().sort_values("vid")["label"].tolist()
    assert got == want


def test_hub_split_pagerank_weighted_matches():
    """Round 5: weighted PageRank over a hub-split graph — shard weight
    sums (add:hub_w reduce) + the weighted hub apply must reproduce the
    plain build bit-for-bit (previously a loud NotImplementedError)."""
    edges, n = _skewed_graph()
    rng = np.random.default_rng(5)
    w = rng.integers(1, 7, len(edges)).astype(np.int64)
    tbl = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array(w),
        }
    )
    g_plain = build_graph(tbl, num_partitions=4, num_vertices=n, weight=True)
    a, _ = alg.pagerank_weighted(g_plain, tol=1e-12, max_rounds=200)
    plain = a.to_pandas().sort_values("vid")["score"].to_numpy()

    import ray as _ray

    g_hub = build_graph(tbl, num_partitions=4, num_vertices=n, weight=True,
                        hub_threshold=50)
    assert _ray.get(g_hub.actors[0].hub_tables.remote())[0] is not None
    b, _ = alg.pagerank_weighted(g_hub, tol=1e-12, max_rounds=200)
    split = b.to_pandas().sort_values("vid")["score"].to_numpy()
    np.testing.assert_allclose(split, plain, rtol=0, atol=1e-12)
    # and against a direct numpy fixpoint (networkx weighted semantics)
    W = np.zeros(n)
    np.add.at(W, [e[0] for e in edges], w.astype(float))
    score = np.full(n, 1.0 / n)
    for _ in range(200):
        nxt = np.zeros(n)
        for (u, v), wx in zip(edges, w):
            nxt[v] += 0.85 * score[u] * wx / W[u]
        nxt += (0.85 * score[W == 0].sum() + 0.15) / n
        score = nxt
    np.testing.assert_allclose(split, score, atol=1e-8)
