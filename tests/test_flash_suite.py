"""FLASH-suite apps (scc / mis / matching / coloring / rectangles /
densest-core / diameter / k-center) vs pure-Python oracles, at two partition
counts (parallelism invariance)."""

import numpy as np
import pytest

from graphscope_ray.graph import algorithms as alg

from .test_algorithms import GRAPHS, _build


def _und_adj(edges, n):
    """Undirected simple adjacency without self-loops (ucsr semantics)."""
    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def _dir_adj(edges, n):
    out = [set() for _ in range(n)]
    inn = [set() for _ in range(n)]
    for s, d in edges:
        out[s].add(d)
        inn[d].add(s)
    return out, inn


# ---------------------------------------------------------------- references
def ref_scc(edges, n):
    """Iterative Tarjan; label = min vid in the component."""
    out, _ = _dir_adj(edges, n)
    out = [sorted(s) for s in out]
    index = [-1] * n
    low = [0] * n
    onstk = [False] * n
    stk: list[int] = []
    label = [0] * n
    cnt = [0]
    for v0 in range(n):
        if index[v0] != -1:
            continue
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = cnt[0]
                cnt[0] += 1
                stk.append(v)
                onstk[v] = True
            advanced = False
            for i in range(pi, len(out[v])):
                w = out[v][i]
                if index[w] == -1:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                elif onstk[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return np.array(label)


def ref_mis(edges, n):
    adj = _und_adj(edges, n)
    r = {v: len(adj[v]) * n + v for v in range(n)}
    status = [0] * n
    while any(s == 0 for s in status):
        join = [
            v
            for v in range(n)
            if status[v] == 0
            and all(status[w] != 0 or r[w] > r[v] for w in adj[v])
        ]
        for v in join:
            status[v] = 1
        for v in join:
            for w in adj[v]:
                if status[w] == 0:
                    status[w] = 2
    return np.array([s == 1 for s in status])


def ref_matching(edges, n):
    adj = _und_adj(edges, n)
    mate = [-1] * n
    while True:
        act = lambda v: mate[v] == -1
        p = {}
        for v in range(n):
            if act(v):
                cand = [w for w in adj[v] if act(w)]
                if cand:
                    p[v] = max(cand)
        matched = [(v, p[v]) for v in p if p.get(p[v]) == v and v < p[v]]
        if not matched:
            break
        for u, v in matched:
            mate[u] = v
            mate[v] = u
    return np.array(mate)


def ref_coloring(edges, n):
    """Sequential greedy in (deg desc, vid desc) order == JP fixpoint."""
    adj = _und_adj(edges, n)
    order = sorted(range(n), key=lambda v: (-len(adj[v]), -v))
    color = [-1] * n
    for v in order:
        used = {color[w] for w in adj[v] if color[w] >= 0}
        c = 0
        while c in used:
            c += 1
        color[v] = c
    return np.array(color)


def ref_coreness(edges, n):
    adj = _und_adj(edges, n)
    deg = {v: len(adj[v]) for v in range(n)}
    active = set(range(n))
    cn = [0] * n
    k = 0
    while active:
        k = max(k, min(deg[v] for v in active))
        changed = True
        while changed:
            rem = [v for v in active if deg[v] <= k]
            changed = bool(rem)
            for v in rem:
                cn[v] = k
                active.discard(v)
                for w in adj[v]:
                    if w in active:
                        deg[w] -= 1
    return np.array(cn)


def ref_rectangles(edges, n):
    adj = _und_adj(edges, n)
    total = 0
    for u in range(n):
        for v in range(u + 1, n):
            w = len(adj[u] & adj[v])
            total += w * (w - 1) // 2
    return total // 2


def ref_bfs_dists(out, n, src):
    from collections import deque

    d = [-1] * n
    d[src] = 0
    q = deque([src])
    while q:
        v = q.popleft()
        for w in out[v]:
            if d[w] < 0:
                d[w] = d[v] + 1
                q.append(w)
    return d


# ---------------------------------------------------------------- tests
@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_scc(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.scc(g)
    df = ds.to_pandas().sort_values("vid")
    got = df["scc"].to_numpy()
    assert (got == ref_scc(edges, n)).all()


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_mis(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.mis(g)
    got = ds.to_pandas().sort_values("vid")["in_mis"].to_numpy()
    assert (got == ref_mis(edges, n)).all()


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_matching(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.matching(g)
    got = ds.to_pandas().sort_values("vid")["mate"].to_numpy()
    assert (got == ref_matching(edges, n)).all()


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_coloring(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.coloring(g)
    got = ds.to_pandas().sort_values("vid")["color"].to_numpy()
    assert (got == ref_coloring(edges, n)).all()


@pytest.mark.parametrize("gname", ["two_cliques", "diamond", "rand60"])
def test_rectangles(gname):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, 3, store_in_edges=True)
    assert alg.rectangles(g) == ref_rectangles(edges, n)


@pytest.mark.parametrize("gname", ["two_cliques", "rand60"])
def test_densest_core(gname):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, 3, store_in_edges=True)
    got = alg.densest_core(g)
    cn = ref_coreness(edges, n)
    cmax = int(cn.max())
    S = set(np.flatnonzero(cn == cmax).tolist())
    adj = _und_adj(edges, n)
    ne = sum(len(adj[v] & S) for v in S)
    assert got["core"] == cmax
    assert got["n_vertices"] == len(S)
    assert got["density"] == pytest.approx(ne / len(S))


def test_diameter_kcenter():
    edges, n = GRAPHS["rand60"]
    g = _build(edges, n, 3, store_in_edges=True)
    out, _ = _dir_adj(edges, n)
    dists = [ref_bfs_dists(out, n, s) for s in range(n)]
    eccs = [max((d for d in dv if d > 0), default=0) for dv in dists]
    dia = max(eccs)
    rad = min(e for e in eccs if e > 0)
    got = alg.diameter_radius(g, chunk=17)
    assert got["diameter"] == dia
    assert got["radius"] == rad

    # greedy farthest-point with the same tie rules
    centers = [0]
    for _ in range(1, 4):
        md = [
            min((dists[c][v] if dists[c][v] >= 0 else 10**9) for c in centers)
            for v in range(n)
        ]
        best = max(md)
        nxt = min(v for v in range(n) if md[v] == best)
        centers.append(nxt)
    got_c = [c for c, _r in alg.k_center(g, k=4)]
    assert got_c == centers


# ------------------------------------------------------- motif census oracles
def ref_motifs(edges, n):
    """Brute-force undirected motif census (simple graph, no self-loops)."""
    adj = _und_adj(edges, n)
    cue = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    tri = tailed = paths = dia = 0
    lhs = 0
    for s, d in cue:
        p = len(adj[s] & adj[d])
        tri += p
        tailed += p * (len(adj[s]) + len(adj[d]) - 4)
        lhs += (len(adj[s]) - 1) * (len(adj[d]) - 1)
        dia += p * (p - 1) // 2
    return {
        "triangles": tri // 3,
        "tailed": tailed // 2,
        "n_3paths": lhs - tri,
        "diamonds": dia,
    }


def ref_directed_census(edges, n):
    out, inn = _dir_adj(edges, n)
    e = {(s, d) for s, d in edges if s != d}
    cyc = sum(1 for (s, d) in e for w in out[d] if (w, s) in e) // 3
    acy = sum(1 for (s, d) in e for w in out[s] if w != d and (d, w) in e)
    rp = [(s, d) for (s, d) in e if (d, s) in e and s < d]
    itr = sum(len(out[s] & out[d]) for s, d in rp)
    otr = sum(len(inn[s] & inn[d]) for s, d in rp)
    return {"cyclic": cyc, "acyclic": acy, "in_tri": itr, "out_tri": otr}


def _edges_ds(edges, canonical=False):
    import pyarrow as pa
    import ray.data

    e = {(s, d) for s, d in edges if s != d}
    if canonical:
        e = {(min(s, d), max(s, d)) for s, d in e}
    e = sorted(e)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([x[0] for x in e], pa.int64()),
                "dst": pa.array([x[1] for x in e], pa.int64()),
            }
        )
    )


@pytest.mark.parametrize("gname", list(GRAPHS))
def test_undirected_motifs(gname):
    edges, n = GRAPHS[gname]
    got = alg.undirected_motifs(_edges_ds(edges, canonical=True))
    assert got == ref_motifs(edges, n)


@pytest.mark.parametrize("gname", list(GRAPHS))
def test_directed_census(gname):
    edges, n = GRAPHS[gname]
    got = alg.directed_triangle_census(_edges_ds(edges))
    assert got == ref_directed_census(edges, n)


# ------------------------------------------------------- peel ordering oracles
def ref_coreness_exact(adj, n):
    """Core numbers by k-level peeling."""
    core = [0] * n
    deg = [len(adj[v]) for v in range(n)]
    alive = set(range(n))
    k = 0
    while alive:
        k += 1
        changed = True
        while changed:
            drop = [v for v in alive if deg[v] < k]
            changed = bool(drop)
            for v in drop:
                core[v] = k - 1
                alive.discard(v)
                for w in adj[v]:
                    if w in alive:
                        deg[w] -= 1
    return core


def ref_peel_rank(edges, n, mode):
    adj = _und_adj(edges, n)
    core = ref_coreness_exact(adj, n)
    if mode == "degeneracy":
        dg = max(core) if n else 0
        d = [len(adj[v]) for v in range(n)]
        thr = [dg] * n
        dec_ok = lambda u, w: True
    else:
        d = [sum(1 for w in adj[v] if core[w] >= core[v]) for v in range(n)]
        thr = core
        dec_ok = lambda u, w: core[u] == core[w]
    rank = [-1] * n
    for rnd in range(10 * n + 10):
        newly = [v for v in range(n) if rank[v] == -1 and d[v] <= thr[v]]
        if not newly:
            break
        for v in newly:
            rank[v] = rnd
        for v in newly:
            for w in adj[v]:
                if dec_ok(v, w):
                    d[w] -= 1
    return core, rank


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("mode", ["degeneracy", "onion"])
def test_peel_ordering(gname, mode):
    import pyarrow as pa
    import ray.data

    edges, n = GRAPHS[gname]
    core, rank = ref_peel_rank(edges, n, mode)
    cores = ray.data.from_arrow(
        pa.table(
            {"oid": pa.array(range(n), pa.int64()), "core": pa.array(core, pa.int64())}
        )
    )
    got = alg.peel_ordering(_edges_ds(edges, canonical=True), cores, mode=mode)
    got = got.set_index("oid")
    assert [int(got.loc[v, "rank"]) for v in range(n)] == rank


# --------------------------------------------------- cover-family references
def ref_min_cover(edges, n):
    adj = _und_adj(edges, n)
    c = [False] * n
    d = [len(adj[v]) for v in range(n)]
    act = [True] * n
    for _ in range(10 * n + 10):
        newly = [
            v
            for v in range(n)
            if act[v]
            and not c[v]
            and all(c[w] or (d[w], w) < (d[v], v) for w in adj[v])
        ]
        if not any(act):
            break
        for v in newly:
            c[v] = True
        for v in newly:
            for w in adj[v]:
                if not c[w]:
                    d[w] -= 1
        for v in range(n):
            act[v] = act[v] and not c[v] and d[v] > 0
        if not newly and not any(act):
            break
    return c


def ref_dominating(edges, n):
    adj = _und_adj(edges, n)
    dom = [False] * n
    b = [False] * n
    mc = [len(adj[v]) for v in range(n)]
    mi = list(range(n))
    while not all(dom):
        for _ in range(2):
            nmc, nmi = mc[:], mi[:]
            for v in range(n):
                if dom[v]:
                    continue
                for w in adj[v]:
                    if not dom[w] and (mc[w], mi[w]) > (nmc[v], nmi[v]):
                        nmc[v], nmi[v] = mc[w], mi[w]
            mc, mi = nmc, nmi
        sel = [v for v in range(n) if not dom[v] and mi[v] == v]
        for v in sel:
            b[v] = True
            dom[v] = True
        for v in sel:
            for w in adj[v]:
                dom[w] = True
        for v in range(n):
            if not dom[v]:
                mc[v] = sum(1 for w in adj[v] if not dom[w])
                mi[v] = v
    return b


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_min_cover(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.min_cover_greedy(g)
    got = ds.to_pandas().sort_values("vid")["in_cover"].tolist()
    assert got == ref_min_cover(edges, n)


@pytest.mark.parametrize("gname", list(GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_dominating(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.min_dominating_set(g)
    got = ds.to_pandas().sort_values("vid")["in_set"].tolist()
    assert got == ref_dominating(edges, n)


# ------------------------------------------------------------- MSF reference
def ref_msf(wedges):
    """Kruskal with the (w, src, dst) total order (unique MSF)."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    keep = []
    for w, s, d in sorted((w, s, d) for s, d, w in wedges):
        a, b = find(s), find(d)
        if a != b:
            parent[a] = b
            keep.append((s, d, w))
    return sorted(keep)


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("nblocks", [1, 5])
def test_msf(seed, nblocks):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(seed)
    n, m = 40, 150
    e = rng.randint(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    wedges = sorted(
        {
            (min(a, b), max(a, b)): int(w)
            for (a, b), w in zip(map(tuple, e), rng.randint(1, 6, size=len(e)))
        }.items()
    )
    wedges = [(s, d, w) for (s, d), w in wedges]
    t = pa.table(
        {
            "src": pa.array([x[0] for x in wedges], pa.int64()),
            "dst": pa.array([x[1] for x in wedges], pa.int64()),
            "weight": pa.array([x[2] for x in wedges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(nblocks)
    got = alg.msf(ds)
    assert list(map(tuple, got.to_numpy())) == ref_msf(wedges)


def ref_kclique(edges, n, k):
    import itertools

    adj = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return sum(
        1
        for comb in itertools.combinations(range(n), k)
        if all(b in adj[a] for a, b in itertools.combinations(comb, 2))
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("k", [3, 4, 5])
def test_kclique(seed, k):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(seed)
    n, m = 16, 70
    e = rng.randint(0, n, size=(m, 2))
    edges = sorted({(min(a, b), max(a, b)) for a, b in e if a != b})
    t = pa.table(
        {
            "src": pa.array([x[0] for x in edges], pa.int64()),
            "dst": pa.array([x[1] for x in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    assert alg.kclique_count(ds, k=k) == ref_kclique(edges, n, k)


def ref_fluid(edges, n, s=4, rounds=12):
    """Synchronous fluid-community reference (fluid-community.h update rule,
    deterministic seeds 0..s-1)."""
    adj = _und_adj(edges, n)
    lab = [v if v < s else -1 for v in range(n)]
    for _ in range(rounds):
        cnt = [0] * s
        for v in range(n):
            if lab[v] >= 0:
                cnt[lab[v]] += 1
        new = list(lab)
        for v in range(n):
            d = [0.0] * s
            for i in range(s):
                if cnt[i] > 0:
                    c = sum(1 for w in adj[v] if lab[w] == i) + (1 if lab[v] == i else 0)
                    d[i] = c / cnt[i]
            cur = lab[v]
            dcur = d[cur] if cur >= 0 else 0.0
            for i in range(s):
                if d[i] > 1e-10 and (cur == -1 or d[i] > dcur + 1e-10):
                    cur, dcur = i, d[i]
            new[v] = cur
        lab = new
    return np.array(lab)


@pytest.mark.parametrize("gname", ["two_cliques", "chain5", "rand60"])
@pytest.mark.parametrize("P", [1, 3])
def test_fluid(gname, P):
    edges, n = GRAPHS[gname]
    g = _build(edges, n, P, store_in_edges=True)
    ds, _ = alg.fluid_community(g, s=4, max_rounds=12)
    got = ds.to_pandas().sort_values("vid")["lab"].to_numpy()
    assert (got == ref_fluid(edges, n)).all()


def test_lcc_directed_fagiolo():
    """algorithms.lcc_directed vs a dense-matrix Fagiolo computation on a
    small directed graph with reciprocal edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graphscope_ray.graph import algorithms as alg

    rng = np.random.default_rng(7)
    n = 30
    A = (rng.random((n, n)) < 0.15).astype(np.int64)
    np.fill_diagonal(A, 0)
    s, d = np.nonzero(A)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(s.astype(np.int64)), "dst": pa.array(d.astype(np.int64))})
    )
    out = (
        alg.lcc_directed(ds, num_partitions=3)
        .to_pandas()
        .set_index("oid")["lcc_d"]
        .sort_index()
    )

    W = A + A.T
    T = np.diagonal(np.linalg.matrix_power(W, 3)) / 2.0
    dtot = W.sum(axis=1)
    dbid = (W == 2).sum(axis=1)
    den = dtot * (dtot - 1) - 2 * dbid
    exp = np.where(den > 0, T / np.maximum(den, 1), 0.0)
    have = np.zeros(n)
    have[out.index.to_numpy()] = out.to_numpy()
    # vertices with no incident edges never enter the dataflow ⇒ 0 on both sides
    assert np.allclose(have, exp, atol=1e-12)
