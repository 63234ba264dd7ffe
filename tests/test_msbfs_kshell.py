"""Multi-source BFS, K-shell, DFS, exact closeness, APSP — engine vs plain
python oracles on a random directed graph."""

import collections

import numpy as np
import pyarrow as pa

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph


def _setup():
    rng = np.random.RandomState(5)
    n, m = 200, 1200
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    g = build_graph(t, num_partitions=3, store_in_edges=True, num_vertices=n, dedup_edges=True)
    adj = collections.defaultdict(set)
    for s_, d_ in zip(src[keep], dst[keep]):
        adj[int(s_)].add(int(d_))
    return g, n, adj, src[keep], dst[keep]


def _bfs_py(adj, s):
    d = {s: 0}
    q = collections.deque([s])
    while q:
        v = q.popleft()
        for w in sorted(adj[v]):
            if w not in d:
                d[w] = d[v] + 1
                q.append(w)
    return d


def test_msbfs_matches_python_bfs():
    g, n, adj, _, _ = _setup()
    srcs = [0, 7, 42, 199]
    res = g.run_program("msbfs", sources=srcs)
    df = g.program_state(res.name).to_pandas().sort_values("vid")
    for i, s in enumerate(srcs):
        want = np.full(n, np.inf)
        for k, v in _bfs_py(adj, s).items():
            want[k] = v
        got = df[f"d{i}"].to_numpy()
        assert np.array_equal(
            np.nan_to_num(got, posinf=-1), np.nan_to_num(want, posinf=-1)
        ), f"source {s}"


def test_closeness_exact_harmonic():
    g, n, adj, _, _ = _setup()
    acc = np.zeros(n)
    for s in range(n):
        for v, dist in _bfs_py(adj, s).items():
            if dist > 0:
                acc[v] += 1.0 / dist
    got = alg.closeness_exact(g, chunk=64).to_pandas().sort_values("vid")
    assert np.allclose(got["closeness"].to_numpy(), acc / (n - 1))


def test_apsp():
    g, n, adj, _, _ = _setup()
    ap = alg.apsp(g, sources=list(range(10))).to_pandas()
    for s in range(10):
        want = _bfs_py(adj, s)
        sub = ap[ap["src"] == s]
        assert dict(zip(sub["dst"], sub["dist"])) == want


def test_mssp_matches_python_dijkstra():
    """Weighted multi-source Bellman-Ford ("mssp") vs per-source heapq
    Dijkstra on a random weighted directed graph, at two partition counts
    (parallelism invariance)."""
    import heapq

    rng = np.random.RandomState(11)
    n, m = 150, 900
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    w = rng.randint(1, 9, m).astype(np.float64)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    # parallel edges kept in the CSR: min-reduction relaxes over all of
    # them, so the oracle's min weight per (src, dst) pair is equivalent
    best = {}
    for s_, d_, w_ in zip(src, dst, w):
        k = (int(s_), int(d_))
        best[k] = min(best.get(k, np.inf), float(w_))
    adj = collections.defaultdict(list)
    for (s_, d_), w_ in best.items():
        adj[s_].append((d_, w_))

    def _dijkstra(s):
        d = {s: 0.0}
        pq = [(0.0, s)]
        while pq:
            dv, v = heapq.heappop(pq)
            if dv > d.get(v, np.inf):
                continue
            for u, wu in adj[v]:
                nd = dv + wu
                if nd < d.get(u, np.inf):
                    d[u] = nd
                    heapq.heappush(pq, (nd, u))
        return d

    srcs = [0, 3, 77, 149]
    t = pa.table(
        {"src": pa.array(src), "dst": pa.array(dst), "weight": pa.array(w)}
    )
    for P in (1, 3):
        g = build_graph(
            t, num_partitions=P, store_in_edges=True, num_vertices=n, weight=True
        )
        ap = alg.apsp(g, sources=srcs, weighted=True).to_pandas()
        for s in srcs:
            want = _dijkstra(s)
            sub = ap[ap["src"] == s]
            got = dict(zip(sub["dst"], sub["dist"]))
            assert got == want, f"P={P} source {s}"


def test_kshell_matches_python_peeling():
    g, n, adj, src, dst = _setup()
    nbr = [set() for _ in range(n)]
    for s_, d_ in zip(src, dst):
        nbr[s_].add(int(d_))
        nbr[d_].add(int(s_))
    alive = np.ones(n, bool)
    degc = np.array([len(x) for x in nbr], dtype=np.int64)
    shell = np.zeros(n, int)
    k = 1
    while alive.any():
        while True:
            rem = alive & (degc < k)
            if not rem.any():
                break
            for v in np.flatnonzero(rem):
                alive[v] = False
                shell[v] = k - 1
                for w in nbr[v]:
                    degc[w] -= 1
        k += 1
    ks = alg.kshell(g).to_pandas().sort_values("vid")
    assert np.array_equal(ks["shell"].to_numpy(), shell)


def test_dfs_preorder():
    g, n, adj, _, _ = _setup()
    d = alg.dfs(g, 0).to_pandas().sort_values("order").reset_index(drop=True)
    # python oracle: iterative stack DFS with ascending-vid neighbor order
    seen, order = set(), []
    parent = {0: -1}
    stack = [(0, -1)]
    while stack:
        v, p = stack.pop()
        if v in seen:
            continue
        seen.add(v)
        parent[v] = p
        order.append(v)
        for w in sorted(adj[v], reverse=True):
            if w not in seen:
                stack.append((w, v))
    assert d["vid"].tolist() == order
    assert all(parent[v] == pv for v, pv in zip(d["vid"], d["parent"]))
