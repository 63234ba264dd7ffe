"""graphscope-compatible client API — the reference's PRIMARY user path
(SURVEY.md §3.1: ``graphscope.session()`` → ``sess.g()`` →
``add_vertices``/``add_edges`` → ``graphscope.pagerank(g)`` →
``ctx.to_dataframe()``), re-expressed 1:1 over this repo's machinery so a
user of the reference can switch with minimal edits:

    import graphscope_ray.api as gs
    sess = gs.session(num_partitions=8)          # client/session.py:82-213
    g = sess.g()                                  # framework/graph.py:105
    g = g.add_vertices(people_df, label="person") # graph.py:477-534
    g = g.add_edges(knows_df, label="knows")      # graph.py:536-612
    ctx = gs.pagerank(g, delta=0.85)              # apps/pagerank (flat apps,
    df = ctx.to_dataframe({"id": "v.id", "r": "r"})  # context.py:161-189
    arr = ctx.to_numpy("r")

Differences by design (Ray-Data-first, not a port): the "session" owns no
gRPC channel or k8s cluster — Ray is initialised by the CALLER (never
here); graphs are lazy Datasets until an app lowers them to fragment
actors; ``ctx.to_dataset()`` is the added scale path (the reference's
contexts always collect to the client, which cannot work at 100 TB).

Selector syntax (ref python/graphscope/framework/context.py:38-120):
``"v.id"`` → vertex oid, ``"r"`` → the app's default result column,
``"r.<col>"`` → a named result column (e.g. hits' ``r.auth``/``r.hub``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.graph import algorithms as _alg
from graphscope_ray.graph.build import Graph
from graphscope_ray.graph.property import PropertyGraph
from graphscope_ray.utils import hash_join

__all__ = [
    "session", "Session", "GraphDAG", "Context",
    "pagerank", "pagerank_push", "wcc", "cdlp", "lpa", "sssp", "sssp_delta",
    "bfs", "hits", "kcore", "kshell", "triangles", "clustering",
    "avg_clustering", "transitivity", "degree_centrality",
    "eigenvector_centrality", "katz_centrality", "closeness_centrality",
    "betweenness_centrality", "louvain", "voterank",
]


def session(num_partitions: int = 4, **build_kwargs) -> "Session":
    """The reference's ``graphscope.session(...)`` (client/session.py:833-889)
    — here a lightweight config holder: partition count + build options
    (p2p_messages, hub_threshold, compact, use_perfect_hash, ...) applied to
    every graph the session lowers.  No cluster is launched; the caller owns
    ``ray.init``."""
    return Session(num_partitions=num_partitions, **build_kwargs)


class Session:
    def __init__(self, num_partitions: int = 4, **build_kwargs):
        self.num_partitions = int(num_partitions)
        self.build_kwargs = dict(build_kwargs)
        self._open = True

    def g(self, directed: bool = True) -> "GraphDAG":
        """Empty graph DAG node (ref framework/graph.py:105 ``sess.g()``)."""
        self._check()
        return GraphDAG(self, PropertyGraph(directed=directed))

    def close(self) -> None:
        """Invalidate the session (ref session.py:592-640).  Fragment actors
        of graphs lowered by this session die with their Graph handles; Ray
        itself is owned by the caller and left running."""
        self._open = False

    def __enter__(self) -> "Session":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _check(self) -> None:
        if not self._open:
            raise RuntimeError("session is closed")


class GraphDAG:
    """Immutable chainable graph handle (the reference's GraphDAGNode,
    framework/graph.py:64-120): every mutator returns a NEW handle; the
    underlying multi-label tables live in a PropertyGraph and stay lazy
    until an app lowers them to fragment actors (cached per (weight,) so
    one loaded graph serves many apps, like the reference's sessions)."""

    def __init__(self, sess: Session, pg: PropertyGraph):
        self._sess = sess
        self._pg = pg
        self._lowered: dict[tuple, Graph] = {}

    # ---- construction (ref graph.py:477-612) -------------------------------
    def add_vertices(self, vertices, label: str = "_", properties=None,
                     vid_field: int | str = 0) -> "GraphDAG":
        self._sess._check()
        return GraphDAG(self._sess, self._pg.add_vertices(
            vertices, label=label, properties=properties, vid_field=vid_field))

    def add_edges(self, edges, label: str = "_e", properties=None,
                  src_label: str | None = None, dst_label: str | None = None,
                  src_field: int | str = 0, dst_field: int | str = 1) -> "GraphDAG":
        self._sess._check()
        pg = self._pg
        if not pg._v:
            # reference behavior: edges-first loading infers a vertex label
            # from the edge endpoints (graph.py:560-574 "_" label deduction).
            # Per-batch unique only — duplicates across batches are fine, the
            # fragment build dedups the vertex universe itself
            # (build_graph_from_oids' distinct scan).
            import pyarrow as pa
            import pyarrow.compute as pc

            from graphscope_ray.graph.property import _resolve_field, _to_dataset
            eds = _to_dataset(edges)
            names = eds.schema().names
            sc = _resolve_field(names, src_field)
            dc = _resolve_field(names, dst_field)

            def _ends(t: pa.Table) -> pa.Table:
                both = pa.chunked_array(list(t[sc].chunks) + list(t[dc].chunks))
                return pa.table({"oid": pc.unique(both.combine_chunks())})

            verts = eds.map_batches(_ends, batch_format="pyarrow")
            pg = pg.add_vertices(verts, label="_")
        pg = pg.add_edges(edges, label=label, properties=properties,
                          src_label=src_label, dst_label=dst_label,
                          src_field=src_field, dst_field=dst_field)
        return GraphDAG(self._sess, pg)

    # ---- transforms (thin passthroughs) ------------------------------------
    def project(self, vertices: Mapping, edges: Mapping) -> "GraphDAG":
        return GraphDAG(self._sess, self._pg.project(vertices, edges))

    def add_column(self, label: str, results, key: str = "oid",
                   columns=None) -> "GraphDAG":
        return GraphDAG(self._sess, self._pg.add_column(
            label, results, key=key, columns=columns))

    def consolidate_columns(self, label: str, columns, result_column) -> "GraphDAG":
        return GraphDAG(self._sess, self._pg.consolidate_columns(
            label, columns, result_column))

    @property
    def schema(self):
        return self._pg.schema

    @property
    def directed(self) -> bool:
        return self._pg.directed

    # ---- lowering -----------------------------------------------------------
    def _simple(self, weight_prop: str | None = None) -> Graph:
        """Lower to ONE directed fragment graph with in-edges (all apps run
        on it: wcc/cdlp push out+in, triangles/kcore merge locally — the
        same single-load-many-apps shape as pipelines.testdata.lg_graph)."""
        self._sess._check()
        key = (weight_prop,)
        if key not in self._lowered:
            kw = dict(self._sess.build_kwargs)
            kw.setdefault("num_partitions", self._sess.num_partitions)
            kw.setdefault("store_in_edges", True)
            self._lowered[key] = self._pg.project_to_simple(
                e_prop=weight_prop, **kw)
        return self._lowered[key]


class Context:
    """App result handle (ref framework/context.py:38-189): selector-based
    export to driver dataframes/arrays, plus ``to_dataset()`` — the
    distributed path the reference lacks."""

    def __init__(self, g: Graph, ds: ray.data.Dataset, default_col: str,
                 run: Any = None):
        self._g = g
        self._ds = ds
        self._default = default_col
        self.run = run  # RunResult (rounds, metrics) when the app is iterative

    def _resolve(self, sel: str) -> str:
        if sel == "v.id":
            return "oid"
        if sel == "r":
            return self._default
        if sel.startswith("r."):
            return sel[2:]
        raise ValueError(f"unsupported selector {sel!r} (use 'v.id', 'r', 'r.<col>')")

    def to_dataset(self) -> ray.data.Dataset:
        """Distributed (oid, result...) dataset — vid→oid attach is a hash
        join, nothing is collected to the driver."""
        return hash_join(self._ds, self._g.vertices_ds, "vid", "vid",
                         num_partitions=self._g.P).drop_columns(["vid"])

    def to_dataframe(self, selectors: Mapping[str, str] | None = None) -> pd.DataFrame:
        df = self.to_dataset().to_pandas().sort_values("oid").reset_index(drop=True)
        if selectors is None:
            return df
        return pd.DataFrame({name: df[self._resolve(sel)].to_numpy()
                             for name, sel in selectors.items()})

    def to_numpy(self, selector: str) -> np.ndarray:
        df = self.to_dataset().to_pandas().sort_values("oid")
        return df[self._resolve(selector)].to_numpy()


def _ctx(g: Graph, ds: ray.data.Dataset, col: str, run=None) -> Context:
    return Context(g, ds, col, run)


# ---- flat app functions (ref python/graphscope/__init__.py re-exports) -----

def pagerank(graph: GraphDAG, delta: float = 0.85, tol: float = 1e-6,
             max_round: int = 100) -> Context:
    """ref graphscope.pagerank(g, delta, max_round) — 'delta' is the
    reference's name for the damping factor."""
    g = graph._simple()
    ds, run = _alg.pagerank(g, alpha=delta, tol=tol, max_rounds=max_round)
    return _ctx(g, ds, "score", run)


def pagerank_push(graph: GraphDAG, delta: float = 0.85, tol: float = 0.0,
                  max_round: int = 15) -> Context:
    g = graph._simple()
    ds, run = _alg.pagerank_push(g, alpha=delta, tol=tol, max_rounds=max_round)
    return _ctx(g, ds, "score", run)


def wcc(graph: GraphDAG) -> Context:
    g = graph._simple()
    ds, run = _alg.wcc(g)
    return _ctx(g, ds, "comp", run)


def cdlp(graph: GraphDAG, max_round: int = 10) -> Context:
    g = graph._simple()
    ds, run = _alg.cdlp(g, max_rounds=max_round)
    return _ctx(g, ds, "label", run)


lpa = cdlp  # the reference registers both names for label propagation


def _vid_of(g: Graph, oid: int) -> int:
    """Translate a user-facing vertex id (oid) to the fragment vid the
    programs key their state by (vids are oid *ranks*, equal to oids only
    for dense 0..N-1 universes).  Distributed point lookup: the filter runs
    in the tasks; only matching rows (0 or 1) reach the driver."""
    import pyarrow.compute as pc

    rows = (
        g.vertices_ds.map_batches(
            lambda t: t.filter(pc.equal(t["oid"], oid)), batch_format="pyarrow"
        ).take_all()
    )
    if not rows:
        raise KeyError(f"vertex oid {oid} not in graph")
    return int(rows[0]["vid"])


def sssp(graph: GraphDAG, src: int = 0, weight: str | None = None) -> Context:
    g = graph._simple(weight_prop=weight)
    ds, run = _alg.sssp(g, source=_vid_of(g, src))
    return _ctx(g, ds, "dist", run)


def sssp_delta(graph: GraphDAG, src: int = 0, weight: str | None = None,
               delta: float = 2.0) -> Context:
    g = graph._simple(weight_prop=weight)
    ds, run = _alg.sssp_delta(g, source=_vid_of(g, src), delta=delta)
    return _ctx(g, ds, "dist", run)


def bfs(graph: GraphDAG, src: int = 0, depth_limit: int | None = None) -> Context:
    g = graph._simple()
    ds, run = _alg.bfs(g, source=_vid_of(g, src), depth_limit=depth_limit)
    return _ctx(g, ds, "depth", run)


def hits(graph: GraphDAG, tolerance: float = 1e-8, max_round: int = 100) -> Context:
    g = graph._simple()
    ds, run = _alg.hits(g, tol=tolerance, max_rounds=max_round)
    return _ctx(g, ds, "auth", run)  # 'r' → auth; 'r.hub' selects hub


def kcore(graph: GraphDAG, k: int = 3) -> Context:
    g = graph._simple()
    ds, run = _alg.kcore(g, k=k)
    return _ctx(g, ds, "in_core", run)


def kshell(graph: GraphDAG) -> Context:
    g = graph._simple()
    return _ctx(g, _alg.kshell(g), "shell")


def triangles(graph: GraphDAG) -> Context:
    g = graph._simple()
    _total, ds = _alg.triangles(g)
    return _ctx(g, ds, "tri")


def clustering(graph: GraphDAG) -> Context:
    g = graph._simple()
    return _ctx(g, _alg.lcc(g), "lcc")


def avg_clustering(graph: GraphDAG) -> float:
    return _alg.avg_clustering(graph._simple())


def transitivity(graph: GraphDAG) -> float:
    return _alg.transitivity(graph._simple())


def degree_centrality(graph: GraphDAG) -> Context:
    g = graph._simple()
    return _ctx(g, _alg.degree_centrality(g), "degree")


def eigenvector_centrality(graph: GraphDAG, tolerance: float = 1e-9,
                           max_round: int = 100) -> Context:
    g = graph._simple()
    ds, run = _alg.eigenvector_centrality(g, tol=tolerance, max_rounds=max_round)
    return _ctx(g, ds, "centrality", run)


def katz_centrality(graph: GraphDAG, alpha: float = 0.1, beta: float = 1.0,
                    tolerance: float = 1e-9, max_round: int = 100) -> Context:
    g = graph._simple()
    ds, run = _alg.katz_centrality(g, alpha=alpha, beta=beta, tol=tolerance,
                                   max_rounds=max_round)
    return _ctx(g, ds, "centrality", run)


def closeness_centrality(graph: GraphDAG, sources: int | None = None) -> Context:
    """sources=None → exact (all-sources chunked MsBfs); an int samples."""
    g = graph._simple()
    if sources is None:
        ds = _alg.closeness_exact(g)
    else:
        ds = _alg.closeness_sampled(g, num_sources=sources)
    return _ctx(g, ds, "closeness")


def betweenness_centrality(graph: GraphDAG, sources: int = 16) -> Context:
    g = graph._simple()
    return _ctx(g, _alg.betweenness_sampled(g, num_sources=sources), "betweenness")


def louvain(graph: GraphDAG) -> Context:
    g = graph._simple()
    ds, _q = _alg.louvain(g)
    return _ctx(g, ds, "comm")


def voterank(graph: GraphDAG, num_of_selected_nodes: int = 10) -> list[int]:
    """ref apps: returns the elected vid list (small by construction)."""
    g = graph._simple()
    vids = _alg.voterank(g, num_elected=num_of_selected_nodes)
    # O(k) driver payload: filter the k elected vids inside the tasks
    # instead of pulling the whole vertex map (N rows) to the driver
    import pyarrow.compute as pc

    want = set(int(v) for v in vids)
    rows = g.vertices_ds.map_batches(
        lambda t: t.filter(
            pc.is_in(t["vid"], value_set=pa.array(sorted(want), pa.int64()))
        ),
        batch_format="pyarrow",
    ).take_all()
    vmap = {int(r["vid"]): int(r["oid"]) for r in rows}
    return [vmap[int(v)] for v in vids]


def gremlin(graph: GraphDAG, script: str | None = None, num_partitions: int = 8):
    """Reference parity: ``sess.gremlin(graph)`` hands back an interactive
    handle whose traversals GIE executes and ``gremlin_to_subgraph``
    materializes (ref python/graphscope/client/session.py gremlin(),
    dag_utils.py:1048-1084).  Here the traversal runs on the SAME engine:
    returns the ``g`` traversal source over the handle's property graph,
    or — with ``script`` — evaluates the Gremlin string and returns its
    result (a Dataset-backed Traversal, a value, or a new PropertyGraph
    for ``..subgraph(..)`` scripts, which ``Session.g``-style chaining can
    keep querying)."""
    from graphscope_ray.graph.gremlin import run_gremlin, traversal

    graph._sess._check()
    if script is None:
        return traversal(graph._pg, num_partitions=num_partitions)
    return run_gremlin(graph._pg, script, num_partitions=num_partitions)
