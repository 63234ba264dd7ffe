"""BFS-forest / bridges / articulation points / BCC / 2ECC
(apps/flash/connectivity/{bridge,cut-point,bcc}.h semantics) vs a pure-Python
Tarjan oracle, at two partition counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph import algorithms as alg

from .test_algorithms import GRAPHS, _build

BICONN_GRAPHS = {
    # path: every edge a bridge, inner vertices cuts
    "path5": ([(0, 1), (1, 2), (2, 3), (3, 4)], 5),
    # cycle: no bridges, no cuts, one block
    "cycle6": ([(i, (i + 1) % 6) for i in range(6)], 6),
    # two triangles sharing vertex 2: 2 is a cut, no bridges, two blocks
    "bowtie": ([(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)], 5),
    # two cliques joined by a bridge
    "dumbbell": (
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        6,
    ),
    "two_cliques": GRAPHS["two_cliques"],
    "rand60": GRAPHS["rand60"],
}


def _rand_sparse(n=40, m=55, seed=11):
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(m, 2))
    return [tuple(x) for x in e[e[:, 0] != e[:, 1]]], n


BICONN_GRAPHS["sparse40a"] = _rand_sparse(seed=11)
BICONN_GRAPHS["sparse40b"] = _rand_sparse(seed=12)


def _canon(edges):
    return sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})


def ref_biconn(edges, n):
    """Recursive Tarjan with an edge stack: bridges, cut vertices and the
    biconnected-component partition of the edges."""
    import sys

    sys.setrecursionlimit(10000)
    adj = [[] for _ in range(n)]
    for s, d in _canon(edges):
        adj[s].append(d)
        adj[d].append(s)
    disc = [-1] * n
    low = [0] * n
    bridges, cuts = set(), set()
    blocks = []  # list of edge sets
    stack = []
    timer = [0]

    def dfs(v, pe):
        disc[v] = low[v] = timer[0]
        timer[0] += 1
        children = 0
        for w in sorted(adj[v]):
            e = (min(v, w), max(v, w))
            if e == pe:
                continue
            if disc[w] == -1:
                stack.append(e)
                children += 1
                dfs(w, e)
                low[v] = min(low[v], low[w])
                if low[w] > disc[v]:
                    bridges.add(e)
                if (pe is not None and low[w] >= disc[v]) or (
                    pe is None and children >= 2
                ):
                    cuts.add(v)
                if low[w] >= disc[v]:
                    blk = set()
                    while True:
                        x = stack.pop()
                        blk.add(x)
                        if x == e:
                            break
                    blocks.append(blk)
            elif disc[w] < disc[v]:
                stack.append(e)
                low[v] = min(low[v], disc[w])

    for v in range(n):
        if disc[v] == -1:
            dfs(v, None)
    return bridges, cuts, blocks


def ref_2ecc(edges, n, bridges):
    par = list(range(n))

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for s, d in _canon(edges):
        if (s, d) not in bridges:
            a, b = find(s), find(d)
            if a != b:
                par[max(a, b)] = min(a, b)
    return np.array([find(v) for v in range(n)])


def _edges_ds(edges, nblocks=3):
    ce = _canon(edges)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in ce], pa.int64()),
            "dst": pa.array([e[1] for e in ce], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(nblocks)


@pytest.mark.parametrize("gname", list(BICONN_GRAPHS))
@pytest.mark.parametrize("P", [1, 3])
def test_biconnectivity(gname, P):
    edges, n = BICONN_GRAPHS[gname]
    g = _build(_canon(edges), n, P, store_in_edges=True)
    res = alg.biconnectivity(g, _edges_ds(edges))
    bridges, cuts, blocks = ref_biconn(edges, n)

    got_b = set(map(tuple, res["bridges"][["src", "dst"]].to_numpy()))
    assert got_b == bridges

    got_c = set(res["cut"].loc[res["cut"]["is_cut"] == 1, "oid"])
    assert got_c == cuts

    got_2 = res["ecc2"].sort_values("oid")["comp2_oid"].to_numpy()
    assert (got_2 == ref_2ecc(edges, n, bridges)).all()

    # forest invariants: root = component min, depth consistent, par at depth-1
    F = res["forest"].sort_values("oid").reset_index(drop=True)
    dis = F["depth"].to_numpy()
    par = F["parent_oid"].to_numpy()
    root = F["root_oid"].to_numpy()
    assert ((dis == 0) == (par == F["oid"].to_numpy())).all()
    nz = dis > 0
    assert (dis[nz] == dis[par[nz]] + 1).all()
    assert (root[nz] == root[par[nz]]).all()
    # par is a graph neighbor
    und = {(min(s, d), max(s, d)) for s, d in _canon(edges)}
    for v in np.flatnonzero(nz):
        assert (min(v, par[v]), max(v, par[v])) in und

    # bcc labels: the partition of non-root vertices must equal the Tarjan
    # block partition of their parent edges, and each label must be the min
    # child vid of its block's tree edges
    tree_edges = {(min(v, par[v]), max(v, par[v])): v for v in np.flatnonzero(nz)}
    blk_of_edge = {}
    for i, blk in enumerate(blocks):
        for e in blk:
            blk_of_edge[e] = i
    lab = res["bcc"].sort_values("oid")["bcc_oid"].to_numpy()
    want_lab = np.empty(n, dtype=np.int64)
    blk_min: dict[int, int] = {}
    for e, child in tree_edges.items():
        b = blk_of_edge[e]
        blk_min[b] = min(blk_min.get(b, child), child)
    for v in range(n):
        if not nz[v]:
            want_lab[v] = v
        else:
            e = (min(v, par[v]), max(v, par[v]))
            want_lab[v] = blk_min[blk_of_edge[e]]
    assert (lab == want_lab).all()
