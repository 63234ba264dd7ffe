"""Pure-Python reference implementations of the cited reference semantics.

Written independently from the engine, directly to the reference's rules
(FIXTURES.md §3): PageRank per apps/pagerank/pagerank_networkx.h:54-163,
WCC per apps/projected/wcc_projected.h:70-182, CDLP per the LDBC rule
(builtin_algorithms.md:236-247), triangles per apps/clustering/
triangles.h:43-158.  Deliberately simple (dicts/loops) — the oracle for
tiny graphs only.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank(edges, n, alpha=0.85, tol=1e-6, max_rounds=100):
    """edges: list of (src, dst) over vertices 0..n-1. Returns list of scores."""
    if n == 0:
        return []
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    r = [1.0 / n] * n
    for _ in range(max_rounds):
        dangling = sum(r[v] for v in range(n) if not out.get(v))
        new = [0.0] * n
        for s, ds in out.items():
            c = r[s] / len(ds)
            for d in ds:
                new[d] += c
        new = [alpha * x + (alpha * dangling + (1 - alpha)) / n for x in new]
        err = sum(abs(a - b) for a, b in zip(new, r))
        r = new
        if err < tol * n:
            break
    return r


def wcc(edges, n):
    """Min-label components over the undirected closure; comp = min vertex id."""
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    comp = list(range(n))
    changed = True
    while changed:
        changed = False
        for v in range(n):
            m = min([comp[u] for u in adj[v]] + [comp[v]]) if adj[v] else comp[v]
            if m < comp[v]:
                comp[v] = m
                changed = True
    return comp


def cdlp(edges, n, rounds=10):
    """Synchronous LPA; neighbor multiset = in- and out-edges (each direction
    counted); new label = most frequent, ties → smallest; fixed rounds."""
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[s].append(d)
        nbrs[d].append(s)
    lab = list(range(n))
    for _ in range(rounds):
        new = lab[:]
        for v in range(n):
            if not nbrs[v]:
                continue
            cnt = Counter(lab[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return lab


def triangles(edges, n):
    """Per-vertex triangle counts on the undirected simple graph
    (self-loops/duplicates collapsed); returns (total, per-vertex list)."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    tri = [0] * n
    total = 0
    for v in range(n):
        for u in adj[v]:
            if u > v:
                for w in adj[v] & adj[u]:
                    if w > u:
                        tri[v] += 1
                        tri[u] += 1
                        tri[w] += 1
                        total += 1
    return total, tri


def transitivity(edges, n):
    """Global clustering coefficient 3*triangles / wedges on the
    undirected simple graph (self-loops/duplicates collapsed)."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    total, _ = triangles(edges, n)
    wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in range(n))
    return 3.0 * total / wedges if wedges else 0.0


def sssp(edges, n, source, weights=None):
    """Bellman-Ford over directed edges; returns dist list (inf unreached)."""
    inf = float("inf")
    dist = [inf] * n
    if n:
        dist[source] = 0.0
    w = weights or [1.0] * len(edges)
    for _ in range(n):
        changed = False
        for (s, d), wt in zip(edges, w):
            if dist[s] + wt < dist[d]:
                dist[d] = dist[s] + wt
                changed = True
        if not changed:
            break
    return dist


def bfs_depth(edges, n, source):
    d = sssp(edges, n, source)
    return [int(x) if x != float("inf") else -1 for x in d]


def hits(edges, n, tol=1e-8, max_rounds=100):
    """L1-normalized HITS (engine semantics, documented in programs.Hits)."""
    if n == 0:
        return [], []
    ins = defaultdict(list)
    outs = defaultdict(list)
    for s, d in edges:
        ins[d].append(s)
        outs[s].append(d)
    auth = [1.0 / n] * n
    hub = [1.0 / n] * n
    for _ in range(max_rounds):
        raw_a = [sum(hub[u] for u in ins[v]) for v in range(n)]
        sa = sum(raw_a) or 1.0
        new_a = [x / sa for x in raw_a]
        raw_h = [sum(new_a[u] for u in outs[v]) for v in range(n)]
        sh = sum(raw_h) or 1.0
        new_h = [x / sh for x in raw_h]
        err = sum(abs(a - b) for a, b in zip(new_a, auth)) + sum(
            abs(a - b) for a, b in zip(new_h, hub)
        )
        auth, hub = new_a, new_h
        if err < tol * n:
            break
    return auth, hub


def betweenness(edges, n, sources=None):
    """Brandes betweenness (directed, unnormalized, endpoints excluded),
    optionally restricted to the given source set."""
    from collections import deque

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    bc = [0.0] * n
    for s in sources if sources is not None else range(n):
        sigma = [0.0] * n
        dist = [-1] * n
        preds = defaultdict(list)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in out.get(v, ()):  # noqa
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = [0.0] * n
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def kcore(edges, n, k):
    """k-core membership on the undirected simple graph."""
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    alive = [True] * n
    deg = [len(adj[v]) for v in range(n)]
    changed = True
    while changed:
        changed = False
        for v in range(n):
            if alive[v] and deg[v] < k:
                alive[v] = False
                changed = True
                for u in adj[v]:
                    deg[u] -= 1
    return alive


def ppr(edges, n, source=0, rounds=10):
    """FLASH PPR (apps/flash/ranking/ppr.h:41-72): r0 = e_source; per round
    r'[v] = 0.5·Σ_{u∈N(v)} r[u]/deg[u] + 0.5·1{v=source}, undirected multi
    adjacency (each directed edge both ways), deg = out+in."""
    nbr = defaultdict(list)
    for s, d in edges:
        nbr[s].append(d)
        nbr[d].append(s)
    r = [0.0] * n
    r[source] = 1.0
    for _ in range(rounds):
        new = [0.0] * n
        for u, ds in nbr.items():
            if not ds:
                continue
            c = 0.5 * r[u] / len(ds)
            for d in ds:
                new[d] += c
        new[source] += 0.5
        r = new
    return r


def articlerank(edges, n, damping=0.85, rounds=10):
    """FLASH ArticleRank (apps/flash/ranking/articlerank.h:42-74)."""
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    avg = len(edges) / n if n else 0.0
    r = [0.0] * n
    for _ in range(rounds):
        new = [0.0] * n
        for u, ds in out.items():
            c = damping * r[u] / (len(ds) + avg)
            for d in ds:
                new[d] += c
        r = [x + 1 - damping for x in new]
    return r
