"""networkx-compatible entry point — the reference's THIRD user path
(SURVEY §3.3; ref python/graphscope/nx): ``Graph``/``DiGraph`` wrap the
hash-partitioned dynamic fragment actors (graph/dynamic.py), mutations
route to the MODIFY_* ops, point reads to the REPORT_GRAPH point RPCs,
and the builtin algorithm namespace snapshots the current state into the
static PIE engine and returns plain ``{node: value}`` dicts — mirroring
the reference's ``@project_to_simple`` + ``@context_to_dict`` bridge
(ref python/graphscope/nx/algorithms/builtin.py:84-760).

The dict outputs materialize one value per vertex on the driver — the
same contract as networkx itself and the reference's context_to_dict;
use the Dataset-returning APIs (graphscope_ray.api / graph.algorithms)
when the result must stay distributed.
"""

from __future__ import annotations

import numpy as np

from graphscope_ray.graph import algorithms as _alg
from graphscope_ray.graph.dynamic import DynamicGraph


# The nx facade materializes node- or edge-sized results on the driver (the
# same contract as networkx itself).  Guard every such site so a user who
# points it at a web-scale graph gets a clear redirect instead of an OOM.
MAX_DRIVER_ROWS = 5_000_000


def _guard_materialize(n_rows: int, what: str) -> None:
    if n_rows > MAX_DRIVER_ROWS:
        raise ValueError(
            f"nx_compat would materialize {n_rows:,} {what} on the driver "
            f"(limit {MAX_DRIVER_ROWS:,}). The networkx facade is for "
            "small/dynamic graphs; use the primary Dataset API "
            "(graphscope_ray.api / graph.algorithms) for graphs at this "
            "scale, or raise graphscope_ray.nx_compat.MAX_DRIVER_ROWS "
            "explicitly if you really have the driver memory."
        )


def _vmap(g):
    """Driver-side vid→oid map, guarded by MAX_DRIVER_ROWS."""
    _guard_materialize(g.N, "vertices")
    return g.vertices_ds.to_pandas()


def _decode(s):
    """Fragment exports stringify oids for Arrow uniformity
    (dynamic.py nodes_table/edges_table); map numeric strings back to int.
    Node-id round-trip therefore covers int and non-numeric-string ids —
    the same practical surface the reference's nx module supports."""
    if isinstance(s, str):
        try:
            return int(s)
        except ValueError:
            return s
    return s


class Graph:
    """Undirected networkx-style graph on dynamic fragment actors."""

    _directed = False

    def __init__(self, incoming_graph_data=None, num_partitions: int = 4):
        self._g = DynamicGraph(num_partitions=num_partitions, directed=self._directed)
        self._version = 0
        self._snap_cache: tuple[int, object] | None = None
        if incoming_graph_data is not None:
            self.add_edges_from(incoming_graph_data)

    # -- mutation (MODIFY_VERTICES / MODIFY_EDGES) --------------------------

    def _mut(self):
        self._version += 1

    def add_node(self, n, **attr):
        self._mut()
        self._g.add_nodes([n], attr or None)

    def add_nodes_from(self, nodes, **attr):
        self._mut()
        self._g.add_nodes(list(nodes), attr or None)

    def remove_node(self, n):
        if not self._g.has_node(n):
            raise KeyError(n)
        self._mut()
        self._g.del_nodes([n])

    def remove_nodes_from(self, nodes):
        self._mut()
        self._g.del_nodes(list(nodes))

    def add_edge(self, u, v, **attr):
        self._mut()
        self._g.add_edges([(u, v)], attr or None)

    def add_edges_from(self, edges, **attr):
        self._mut()
        self._g.add_edges(list(edges), attr or None)

    def add_weighted_edges_from(self, edges, weight: str = "weight"):
        self._mut()
        self._g.add_edges([(u, v, {weight: w}) for u, v, w in edges])

    def remove_edge(self, u, v):
        if not self._g.has_edge(u, v):
            raise KeyError((u, v))
        self._mut()
        self._g.del_edges([(u, v)])

    def remove_edges_from(self, edges):
        self._mut()
        self._g.del_edges(list(edges))

    def clear(self):
        self._mut()
        self._g.clear()

    def clear_edges(self):
        self._mut()
        self._g.clear_edges()

    # -- point reads (REPORT_GRAPH) ------------------------------------------

    def number_of_nodes(self) -> int:
        return self._g.number_of_nodes()

    order = number_of_nodes

    def number_of_edges(self) -> int:
        return self._g.number_of_edges()

    def size(self) -> int:
        return self._g.number_of_edges()

    def has_node(self, n) -> bool:
        return self._g.has_node(n)

    __contains__ = has_node

    def has_edge(self, u, v) -> bool:
        return self._g.has_edge(u, v)

    def neighbors(self, n):
        return iter(self._g.neighbors(n))

    def degree(self, n):
        return self._g.degree(n)

    def get_edge_data(self, u, v, default=None):
        d = self._g.get_edge_data(u, v)
        return default if d is None else d

    @property
    def nodes(self):
        return _NodeView(self)

    @property
    def edges(self):
        _guard_materialize(self.number_of_edges(), "edges")
        return [
            (_decode(r["src"]), _decode(r["dst"]))
            for r in self._g.edges_dataset().take_all()
        ]

    # -- views / conversions ---------------------------------------------------

    def subgraph(self, nodes) -> "Graph":
        return _wrap(self._g.subgraph(list(nodes)), self._directed)

    def edge_subgraph(self, edges) -> "Graph":
        return _wrap(self._g.edge_subgraph(list(edges)), self._directed)

    def to_directed(self) -> "DiGraph":
        return _wrap(self._g.view("directed"), True)

    def to_undirected(self) -> "Graph":
        return _wrap(self._g.view("undirected"), False)

    def copy(self):
        return _wrap(self._g.view("directed" if self._directed else "undirected"),
                     self._directed)

    # -- the nx -> analytical bridge -------------------------------------------

    def _snapshot(self, **kw):
        """Static PIE graph of the CURRENT state (cached per mutation
        version — repeated algorithm calls on an unchanged graph reuse one
        fragment set, like the reference keeps contexts between runs)."""
        if self._snap_cache is not None and self._snap_cache[0] == self._version and not kw:
            return self._snap_cache[1]
        g = self._g.snapshot(store_in_edges=True, dedup_edges=True, **kw)
        if not kw:
            self._snap_cache = (self._version, g)
        return g


class DiGraph(Graph):
    """Directed variant."""

    _directed = True

    def reverse(self) -> "DiGraph":
        return _wrap(self._g.view("reversed"), True)

    def predecessors(self, n):
        return iter(self._g.predecessors(n))

    def successors(self, n):
        return iter(self._g.neighbors(n))

    def in_degree(self, n):
        return len(self._g.predecessors(n))

    def out_degree(self, n):
        return len(self._g.neighbors(n))


class _NodeView:
    """Minimal nx NodeView: iteration/len/contains see node ids,
    ``G.nodes[n]`` returns n's attribute dict (a point read), and
    ``G.nodes(data=True)`` yields (n, attrs) pairs."""

    def __init__(self, G: "Graph"):
        self._G = G

    def _ids(self):
        _guard_materialize(self._G.number_of_nodes(), "nodes")
        return [_decode(r["oid"]) for r in self._G._g.nodes_dataset().take_all()]

    def __iter__(self):
        return iter(self._ids())

    def __len__(self):
        return self._G.number_of_nodes()

    def __contains__(self, n):
        return self._G.has_node(n)

    def __getitem__(self, n):
        d = self._G._g.get_node_data(n)
        if d is None:
            raise KeyError(n)
        return d

    def __call__(self, data: bool = False):
        if not data:
            return self._ids()
        return [(n, self._G._g.get_node_data(n)) for n in self._ids()]

    def __eq__(self, other):
        return sorted(self._ids(), key=repr) == sorted(other, key=repr)


def _wrap(dg: DynamicGraph, directed: bool):
    obj = DiGraph.__new__(DiGraph) if directed else Graph.__new__(Graph)
    obj._g = dg
    obj._version = 0
    obj._snap_cache = None
    return obj


# ---------------------------------------------------------------------------
# builtin algorithm namespace (@context_to_dict equivalents)


def _to_dict(g, ds, col) -> dict:
    vmap = _vmap(g)
    df = ds.to_pandas().merge(vmap, on="vid")
    return {_decode(o): v for o, v in zip(df["oid"], df[col])}


def pagerank(G: Graph, alpha: float = 0.85, max_iter: int = 100, tol: float = 1e-6,
             weight: str | None = None) -> dict:
    """Engine PageRank is structural (unweighted), like the reference's
    builtin app; pass ``weight=None`` explicitly when porting nx code —
    nx defaults to weight='weight', which this engine does not implement,
    and silently ignoring it would be a wrong answer."""
    if weight is not None:
        raise NotImplementedError(
            "weighted pagerank is not implemented; the engine app is "
            "structural (weight=None)"
        )
    g = G._snapshot()
    ds, _ = _alg.pagerank(g, alpha=alpha, tol=tol, max_rounds=max_iter)
    return _to_dict(g, ds, "score")


def degree_centrality(G: Graph) -> dict:
    """networkx semantics: degree/(N-1); directed graphs use in+out degree
    (nx.degree_centrality), not just the built view's out-degree."""
    g = G._snapshot()
    deg = g.degrees().to_pandas()
    total = deg["out_deg"].astype(float)
    if G._directed:
        total = total + deg.get("in_deg", 0)
    deg = deg.assign(centrality=total / max(g.N - 1, 1))
    import ray.data as _rd

    return _to_dict(g, _rd.from_pandas(deg[["vid", "centrality"]]), "centrality")


def _undirected_only(G: Graph, what: str):
    if G._directed:
        # networkx raises NetworkXNotImplemented for triangles and uses a
        # DIFFERENT (Fagiolo) formula for directed clustering — silently
        # returning the undirected numbers would be wrong either way
        raise NotImplementedError(
            f"{what} is undirected-only here; call .to_undirected() first"
        )


def clustering(G: Graph) -> dict:
    _undirected_only(G, "clustering")
    g = G._snapshot()
    return _to_dict(g, _alg.lcc(g), "lcc")


def average_clustering(G: Graph) -> float:
    _undirected_only(G, "average_clustering")
    return float(_alg.avg_clustering(G._snapshot()))


def transitivity(G: Graph) -> float:
    _undirected_only(G, "transitivity")
    return float(_alg.transitivity(G._snapshot()))


def triangles(G: Graph) -> dict:
    _undirected_only(G, "triangles")
    g = G._snapshot()
    _total, ds = _alg.triangles(g)
    return {k: int(v) for k, v in _to_dict(g, ds, "tri").items()}


def _components(G: Graph):
    g = G._snapshot()
    comp = _to_dict(g, _alg.wcc(g)[0], "comp")
    groups: dict = {}
    for n, c in comp.items():
        groups.setdefault(c, set()).add(n)
    return [groups[c] for c in sorted(groups)]


def connected_components(G: Graph):
    return iter(_components(G))


def weakly_connected_components(G: DiGraph):
    return iter(_components(G))


def number_connected_components(G: Graph) -> int:
    return len(_components(G))


def single_source_shortest_path_length(G: Graph, source) -> dict:
    from graphscope_ray.api import _vid_of

    g = G._snapshot()
    ds, _ = _alg.bfs(g, source=_vid_of(g, str(source)))
    out = _to_dict(g, ds, "depth")
    return {n: int(d) for n, d in out.items() if d >= 0}


def shortest_path_length(G: Graph, source, weight: str | None = None) -> dict:
    if weight is None:
        return single_source_shortest_path_length(G, source)
    from graphscope_ray.api import _vid_of

    eds = G._g.edges_dataset(weight_key=weight)
    from graphscope_ray.graph.build import build_graph_from_oids

    g = build_graph_from_oids(
        eds, src_col="src", dst_col="dst", num_partitions=G._g.P,
        store_in_edges=True, weight=True,
        view="directed" if G._directed else "undirected",
    )
    ds, _ = _alg.sssp(g, source=_vid_of(g, str(source)))
    out = _to_dict(g, ds, "dist")
    return {n: float(d) for n, d in out.items() if np.isfinite(d)}


def core_number(G: Graph) -> dict:
    g = G._snapshot()
    return {k: int(v) for k, v in _to_dict(g, _alg.kshell(g), "shell").items()}


def katz_centrality(G: Graph, alpha: float = 0.1, beta: float = 1.0, max_iter: int = 100) -> dict:
    g = G._snapshot()
    ds, _ = _alg.katz_centrality(g, alpha=alpha, beta=beta, max_rounds=max_iter)
    return _to_dict(g, ds, "centrality")


def eigenvector_centrality(G: Graph, max_iter: int = 100) -> dict:
    g = G._snapshot()
    ds, _ = _alg.eigenvector_centrality(g, max_rounds=max_iter)
    return _to_dict(g, ds, "centrality")


def hits(G: DiGraph, max_iter: int = 100, tol: float = 1e-8) -> tuple[dict, dict]:
    g = G._snapshot()
    ds, _ = _alg.hits(g, tol=tol, max_rounds=max_iter)
    return _to_dict(g, ds, "hub"), _to_dict(g, ds, "auth")


def label_propagation_communities(G: Graph, max_rounds: int = 10):
    g = G._snapshot()
    lab = _to_dict(g, _alg.cdlp(g, max_rounds=max_rounds)[0], "label")
    groups: dict = {}
    for n, c in lab.items():
        groups.setdefault(c, set()).add(n)
    return iter([groups[c] for c in sorted(groups)])


def betweenness_centrality(G: Graph, k: int | None = None, seed: int = 0,
                           normalized: bool = True) -> dict:
    """Brandes betweenness (exact when k is None, else k sampled sources);
    networkx normalization: directed (N-1)(N-2), undirected (N-1)(N-2)/2
    with pair-count scaling k→N for sampled runs."""
    g = G._snapshot()
    N = g.N
    if k is None:
        ds = _alg.betweenness_sampled(g, sources=list(range(N)))
        scale_sources = 1.0
    else:
        ds = _alg.betweenness_sampled(g, num_sources=min(k, N), seed=seed)
        scale_sources = N / max(min(k, N), 1)
    out = _to_dict(g, ds, "betweenness")
    scale = scale_sources
    if not G._directed:
        scale *= 0.5  # each undirected pair counted from both endpoints
    if normalized and N > 2:
        scale /= (N - 1) * (N - 2) if G._directed else (N - 1) * (N - 2) / 2.0
    return {n: v * scale for n, v in out.items()}


def closeness_centrality(G: Graph, wf_improved: bool = True) -> dict:
    """Exact closeness over all sources (fragment-accumulated multi-source
    BFS); Wasserman–Faust formula like networkx.  The engine's source-wave
    BFS accumulates d(s, v) per TARGET v — exactly the incoming-distance
    convention networkx uses for directed closeness."""
    g = G._snapshot()
    ds = _alg.closeness_exact(g, harmonic=False)
    return _to_dict(g, ds, "closeness")


def harmonic_centrality(G: Graph) -> dict:
    g = G._snapshot()
    ds = _alg.closeness_exact(g, harmonic=True)
    out = _to_dict(g, ds, "closeness")
    # engine divides by (N-1); networkx harmonic_centrality reports the sum
    return {n: v * max(g.N - 1, 1) for n, v in out.items()}


def louvain_communities(G: Graph, seed: int | None = None):
    """Louvain communities as a list of node sets (modularity maximized;
    deterministic — the seed parameter exists for nx signature parity)."""
    g = G._snapshot()
    comm = _to_dict(g, _alg.louvain(g)[0], "comm")
    groups: dict = {}
    for n, c in comm.items():
        groups.setdefault(c, set()).add(n)
    return [groups[c] for c in sorted(groups)]


def density(G: Graph) -> float:
    """nx.density: m/(n(n-1)) directed, 2m/(n(n-1)) undirected."""
    n = G.number_of_nodes()
    m = G.number_of_edges()
    if n <= 1:
        return 0.0
    d = m / (n * (n - 1))
    return d if G._directed else 2 * d


def is_connected(G: Graph) -> bool:
    if G._directed:
        raise NotImplementedError(
            "is_connected is undirected-only (nx raises NetworkXNotImplemented); "
            "use weakly_connected_components for DiGraph"
        )
    if G.number_of_nodes() == 0:
        raise ValueError("connectivity is undefined for the null graph")
    return number_connected_components(G) == 1


def _ecc_frame(G: Graph):
    """(per-node eccentricity dict, diameter, radius); raises like networkx
    when some pair is unreachable (disconnected / not strongly connected)."""
    g = G._snapshot()
    ecc = _alg.eccentricity_all(g)
    if (ecc["n_reach"] < g.N).any():
        raise ValueError(
            "eccentricity is undefined: graph is not "
            + ("strongly connected" if G._directed else "connected")
        )
    vmap = _vmap(g)
    df = ecc.merge(vmap, left_on="src", right_on="vid")
    d = {_decode(o): int(e) for o, e in zip(df["oid"], df["ecc"])}
    return d, int(ecc["ecc"].max()), int(ecc["ecc"].min())


def eccentricity(G: Graph) -> dict:
    return _ecc_frame(G)[0]


def diameter(G: Graph) -> int:
    return _ecc_frame(G)[1]


def radius(G: Graph) -> int:
    return _ecc_frame(G)[2]


def center(G: Graph) -> list:
    d, _dia, rad = _ecc_frame(G)
    return [n for n, e in d.items() if e == rad]


def periphery(G: Graph) -> list:
    d, dia, _rad = _ecc_frame(G)
    return [n for n, e in d.items() if e == dia]


def has_path(G: Graph, source, target) -> bool:
    return str(target) in {
        str(n) for n in single_source_shortest_path_length(G, source)
    }


def shortest_path(G: Graph, source, target) -> list:
    """Unweighted shortest path as a node list (BFS depths + deterministic
    min-repr predecessor backtrack — nx returns one arbitrary shortest
    path; this one is reproducible)."""
    depths = single_source_shortest_path_length(G, source)
    dep = {str(n): d for n, d in depths.items()}
    if str(target) not in dep:
        raise ValueError(f"no path between {source!r} and {target!r}")
    path = [target]
    cur = target
    while str(cur) != str(source):
        want = dep[str(cur)] - 1
        preds = G.predecessors(cur) if G._directed else G.neighbors(cur)
        cands = [u for u in preds if dep.get(str(u)) == want]
        cur = min(cands, key=repr)
        path.append(cur)
    return path[::-1]


def average_shortest_path_length(G: Graph) -> float:
    """Exact mean pairwise distance via the fragment-accumulated all-source
    closeness pass (Σd(·,v) = (N-1)/closeness_WF(v) on a connected graph)."""
    n = G.number_of_nodes()
    if n <= 1:
        raise ValueError(
            "average_shortest_path_length is undefined for graphs with < 2 nodes"
        )
    if G._directed:
        raise NotImplementedError(
            "directed average_shortest_path_length needs strong connectivity; "
            "convert with .to_undirected() first"
        )
    if not is_connected(G):
        raise ValueError("graph is not connected")
    g = G._snapshot()
    c = _to_dict(g, _alg.closeness_exact(g, harmonic=False), "closeness")
    total = sum((g.N - 1) / v for v in c.values())
    return total / (g.N * (g.N - 1))


def voterank(G: Graph, number_of_nodes: int | None = None) -> list:
    """nx.voterank: elect until no node has positive votes (or until
    number_of_nodes elected) — the engine app stops on non-positive best
    score, matching nx's rule."""
    g = G._snapshot()
    n_elect = g.N if number_of_nodes is None else number_of_nodes
    vids = _alg.voterank(g, num_elected=n_elect)
    vmap = _vmap(g).set_index("vid")["oid"]
    return [_decode(vmap.loc[v]) for v in vids]


def degree_assortativity_coefficient(G: Graph) -> float:
    """Pearson correlation of endpoint degrees over edges (nx semantics:
    undirected pairs symmetrized; directed uses (out-deg src, in-deg dst)).
    Vertex-sized degree map broadcast once; edge rows stream partial sums."""
    import ray as _ray

    g = G._snapshot()
    deg = g.degrees().to_pandas().merge(_vmap(g), on="vid")
    if G._directed:
        x_map = dict(zip(deg["oid"], deg["out_deg"].astype(float)))
        y_map = dict(zip(deg["oid"], deg["in_deg"].astype(float)))
    else:
        x_map = y_map = dict(zip(deg["oid"], deg["out_deg"].astype(float)))
    ref = _ray.put((x_map, y_map))
    directed = G._directed

    def _partials(t):
        xm, ym = _ray.get(ref)
        x = np.array([xm[a] for a in t["src"].to_pylist()], dtype=np.float64)
        y = np.array([ym[b] for b in t["dst"].to_pylist()], dtype=np.float64)
        if not directed:
            # each undirected edge is stored once — symmetrize like nx
            x, y = np.concatenate([x, y]), np.concatenate([y, x])
        import pyarrow as _pa

        return _pa.table(
            {
                "n": _pa.array([float(x.size)]),
                "sx": _pa.array([x.sum()]),
                "sy": _pa.array([y.sum()]),
                "sxy": _pa.array([(x * y).sum()]),
                "sxx": _pa.array([(x * x).sum()]),
                "syy": _pa.array([(y * y).sum()]),
            }
        )

    p = (
        G._g.edges_dataset()
        .select_columns(["src", "dst"])
        .map_batches(_partials, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    num = p.n * p.sxy - p.sx * p.sy
    den = float(np.sqrt((p.n * p.sxx - p.sx**2) * (p.n * p.syy - p.sy**2)))
    # degree-regular graph: variance 0 → undefined; nx returns nan
    return float(num / den) if den else float("nan")
