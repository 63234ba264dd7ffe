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
