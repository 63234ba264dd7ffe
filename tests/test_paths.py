"""Path apps vs brute-force python oracles (ref apps/simple_path/*,
apps/sampling_path/*)."""

import itertools

import numpy as np
import pyarrow as pa

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.build import build_graph


def _rand_graph(seed=31, n=25, m=150):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    keep = src != dst
    pairs = sorted(set(zip(src[keep].tolist(), dst[keep].tolist())))
    t = pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    g = build_graph(t, num_partitions=3, num_vertices=n, store_in_edges=True)
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    return g, adj, pairs, n


def _brute_simple_paths(adj, source, targets, cutoff):
    out = []

    def rec(path):
        v = path[-1]
        if len(path) - 1 > cutoff:
            return
        for w in adj.get(v, []):
            if w in path:
                continue
            if w in targets:
                out.append(path + [w])
            if len(path) - 1 + 1 < cutoff:
                rec(path + [w])

    rec([source])
    return sorted(out)


def test_all_simple_paths_matches_brute_force():
    g, adj, _, _ = _rand_graph()
    targets = [3, 7]
    for cutoff in (1, 2, 4):
        got = sorted(alg.all_simple_paths(g, 0, targets, cutoff=cutoff))
        want = _brute_simple_paths(adj, 0, set(targets), cutoff)
        assert got == want, cutoff


def test_all_simple_paths_no_cutoff_small():
    g, adj, _, _ = _rand_graph(seed=4, n=8, m=20)
    got = sorted(alg.all_simple_paths(g, 0, [5]))
    want = _brute_simple_paths(adj, 0, {5}, 7)
    assert got == want


def test_is_simple_path():
    g, adj, pairs, n = _rand_graph()
    s, d = pairs[0]
    assert alg.is_simple_path(g, [s, d])
    assert alg.is_simple_path(g, [s])
    assert not alg.is_simple_path(g, [s, d, s])  # repeated vertex
    assert not alg.is_simple_path(g, [])
    assert not alg.is_simple_path(g, [s, n + 5])  # missing vertex
    missing = next(
        (a, b) for a in range(n) for b in range(n) if a != b and (a, b) not in set(pairs)
    )
    assert not alg.is_simple_path(g, list(missing))


def test_path_enumeration_matches_join_oracle():
    g, adj, pairs, _ = _rand_graph(seed=9, n=15, m=60)
    got = (
        alg.path_enumeration(g, length=2, start_filter=5)
        .to_pandas()
        .sort_values(["v0", "v1", "v2"])
        .reset_index(drop=True)
    )
    want = sorted(
        (a, b, c)
        for (a, b), (b2, c) in itertools.product(pairs, pairs)
        if b == b2 and a < 5
    )
    assert [tuple(r) for r in got.to_numpy()] == want


def _brute_ktruss(pairs, k):
    edges = set(pairs)
    while True:
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        keep = {
            (s, d)
            for s, d in edges
            if len(adj[s] & adj[d]) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


def test_ktruss_matches_brute_force():
    import ray

    rng = np.random.RandomState(2)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in zip(rng.randint(0, 20, 120), rng.randint(0, 20, 120))
            if a != b
        }
    )
    e = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    for k in (3, 4, 5):
        got = set(
            map(tuple, alg.ktruss(e, k=k).to_pandas()[["src", "dst"]].values.tolist())
        )
        assert got == _brute_ktruss(pairs, k), k


def test_ktruss_fully_peeled():
    import ray

    # a path graph has no triangles: 3-truss is empty
    e = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1, 2], pa.int64()), "dst": pa.array([1, 2, 3], pa.int64())})
    )
    assert alg.ktruss(e, k=3).count() == 0


def test_random_walks_sinks_and_determinism():
    import ray

    # 0→1→2, 2 is a sink; deterministic LCG choice has only one option per step
    e = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    )
    out = (
        alg.random_walks(e, n_starts=3, length=3)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    rows = set(map(tuple, out[["walk_id", "step", "v"]].values.tolist()))
    assert rows == {
        (0, 0, 0), (0, 1, 1), (0, 2, 2),   # stops at sink 2
        (1, 0, 1), (1, 1, 2),
        (2, 0, 2),                          # starts at a sink: no steps
    }
    # identical output on a second run (determinism)
    again = (
        alg.random_walks(e, n_starts=3, length=3)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    assert rows == set(map(tuple, again[["walk_id", "step", "v"]].values.tolist()))
