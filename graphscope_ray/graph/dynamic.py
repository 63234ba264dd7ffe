"""Dynamic (mutable) property graph — the NetworkX surface of the reference.

Parity target: MODIFY_VERTICES / MODIFY_EDGES (NX_ADD / NX_DEL / NX_UPDATE,
`python/graphscope/framework/dag_utils.py:359-412`), CLEAR_GRAPH /
CLEAR_EDGES / VIEW_GRAPH (reversed | directed | undirected) /
INDUCE_SUBGRAPH (`dag_utils.py:639-737`), and the dynamic fragment's
report queries (`analytical_engine/core/fragment/dynamic_fragment.h`).

Ray-first design: P ``DynamicFragmentActor``s, vertices hash-partitioned by
a DETERMINISTIC oid hash (crc32 — Python's builtin ``hash`` is salted per
process and must never route).  Each fragment owns its vertices' attrs, the
out-adjacency of its vertices and (directed only) the in-adjacency mirror,
so every mutation is one routed batch per partition:

- add/update/del nodes: one actor call per partition (driver splits the
  batch by owner).
- add/update/del edges: TWO routed copies — by owner(u) into the
  out-adjacency, by owner(v) into the mirror — the same both-sides routing
  as the static loader's exchange (build.py _route_both).
- del nodes is two-phase: owners drop the vertex + local adjacency and
  return the remote stubs (in/out edges whose other endpoint lives
  elsewhere); the driver routes those removals in one more batch round.

Views and subgraphs preserve the partitioning (ownership depends only on
the oid), so they are pure per-fragment state transforms — no exchange.
Mutation batches scale with the batch, never with the graph; the graph
itself lives sharded on the actors.  ``snapshot()`` bridges to the static
PIE engine (build_graph_from_oids) to run the analytical apps on the
current state — the reference's nx→gs ``to_directed``/project flow.

Semantics follow networkx (the reference's client): ``add_*`` creates or
merges attrs (edges create missing endpoints), ``update_*`` merges attrs
into EXISTING entries only, ``del_*`` removes (nodes take incident edges
with them); an undirected graph stores each edge at both endpoints and
counts it once.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _owner(oid, P: int) -> int:
    if isinstance(oid, (int, np.integer)):
        return int(oid) % P
    return zlib.crc32(str(oid).encode()) % P


def _norm_nodes(nodes) -> list[tuple]:
    out = []
    for item in nodes:
        if isinstance(item, tuple) and len(item) == 2 and isinstance(item[1], dict):
            out.append((item[0], item[1]))
        else:
            out.append((item, {}))
    return out


def _norm_edges(edges, attr: dict) -> list[tuple]:
    out = []
    for item in edges:
        if len(item) == 3:
            a = dict(attr)
            a.update(item[2])
            out.append((item[0], item[1], a))
        else:
            out.append((item[0], item[1], dict(attr)))
    return out


@ray.remote
class DynamicFragmentActor:
    def __init__(self, part: int, P: int, directed: bool):
        self.part = part
        self.P = P
        self.directed = directed
        self.nodes: dict = {}  # oid -> attr dict
        self.adj: dict = {}  # owned u -> {v: attrs}
        self.pred: dict = {}  # owned v -> {u: attrs}   (directed only)

    # ---- vertex mutations -------------------------------------------------

    def modify_nodes(self, kind: str, items: list[tuple]):
        if kind == "add":
            for oid, attrs in items:
                self.nodes.setdefault(oid, {}).update(attrs)
                self.adj.setdefault(oid, {})
                if self.directed:
                    self.pred.setdefault(oid, {})
        elif kind == "update":
            for oid, attrs in items:
                if oid in self.nodes:
                    self.nodes[oid].update(attrs)
        elif kind == "del":
            # phase 1: drop local state, emit remote stubs to clean up
            stubs = []  # (owner_part, side, u, v)
            for oid, _ in items:
                if oid not in self.nodes:
                    continue
                for v in self.adj.pop(oid, {}):
                    p = _owner(v, self.P)
                    stubs.append((p, "in", oid, v))
                if self.directed:
                    for u in self.pred.pop(oid, {}):
                        p = _owner(u, self.P)
                        stubs.append((p, "out", u, oid))
                del self.nodes[oid]
            return stubs
        else:
            raise ValueError(kind)
        return []

    def remove_stubs(self, stubs: list[tuple]):
        """Phase 2 of node deletion: drop edge entries whose other endpoint
        was deleted remotely."""
        for _, side, u, v in stubs:
            if side == "in":
                if self.directed:
                    self.pred.get(v, {}).pop(u, None)
                else:
                    d = self.adj.get(v)
                    if d is not None:
                        d.pop(u, None)
            else:  # side == "out"
                self.adj.get(u, {}).pop(v, None)

    # ---- edge mutations ---------------------------------------------------

    def modify_edges(self, kind: str, side: str, items: list[tuple]):
        """side='out': items routed by owner(u) → out-adjacency.
        side='in': routed by owner(v) → mirror (pred if directed, the
        reverse adj entry if undirected)."""
        for u, v, attrs in items:
            if side == "out":
                key, near, far = u, u, v
            else:
                key, near, far = v, v, u
            if kind == "add":
                if near not in self.nodes:
                    self.nodes[near] = {}
                    self.adj.setdefault(near, {})
                    if self.directed:
                        self.pred.setdefault(near, {})
                if side == "out" or not self.directed:
                    self.adj.setdefault(near, {}).setdefault(far, {}).update(attrs)
                else:
                    self.pred.setdefault(near, {}).setdefault(far, {}).update(attrs)
            elif kind == "update":
                tgt = self.adj if (side == "out" or not self.directed) else self.pred
                d = tgt.get(near)
                if d is not None and far in d:
                    d[far].update(attrs)
            elif kind == "del":
                tgt = self.adj if (side == "out" or not self.directed) else self.pred
                d = tgt.get(near)
                if d is not None:
                    d.pop(far, None)
            else:
                raise ValueError(kind)

    # ---- clears / state transforms ----------------------------------------

    def clear(self):
        self.nodes, self.adj, self.pred = {}, {}, {}

    def clear_edges(self):
        self.adj = {u: {} for u in self.nodes}
        self.pred = {u: {} for u in self.nodes} if self.directed else {}

    def export_state(self, view: str | None = None):
        """State for a same-partitioning copy, optionally view-transformed
        (ownership is oid-only, so views never move data between parts)."""
        if view in (None, "copy"):
            return self.nodes, self.adj, self.pred, self.directed
        if view == "reversed":
            if not self.directed:
                return self.nodes, self.adj, self.pred, False
            return self.nodes, self.pred, self.adj, True
        if view == "directed":
            if self.directed:
                return self.nodes, self.adj, self.pred, True
            # each undirected edge appears at both endpoints → both arcs
            # exist; the mirror equals the adjacency.  Deep-copy the inner
            # dicts: correctness must not depend on Ray pickling the two
            # state members independently (ADVICE r3 — a local load_state
            # would otherwise alias adj and pred)
            return self.nodes, self.adj, {v: dict(d) for v, d in self.adj.items()}, True
        if view == "undirected":
            if not self.directed:
                return self.nodes, self.adj, {}, False
            merged: dict = {u: dict(d) for u, d in self.adj.items()}
            for v, d in self.pred.items():
                m = merged.setdefault(v, {})
                for u, attrs in d.items():
                    # when both arcs (u,v) and (v,u) exist with different
                    # attrs, pick the winner by an endpoint-order-independent
                    # rule — attrs of the arc whose (repr(src), repr(dst)) is
                    # lexicographically minimal — so owner(u) and owner(v)
                    # agree on the single undirected attr dict (ADVICE r3)
                    if u not in m or (repr(u), repr(v)) < (repr(v), repr(u)):
                        m[u] = attrs
            return self.nodes, merged, {}, False
        raise ValueError(view)

    def load_state(self, nodes, adj, pred, directed):
        self.nodes, self.adj, self.pred, self.directed = nodes, adj, pred, directed

    def induced_state(self, node_set_ref):
        """Node-induced subgraph state: keep owned nodes in the set and
        edges with BOTH endpoints in the set (set is a broadcast ray.put)."""
        keep = node_set_ref if isinstance(node_set_ref, set) else ray.get(node_set_ref)
        nodes = {u: a for u, a in self.nodes.items() if u in keep}
        adj = {
            u: {v: a for v, a in d.items() if v in keep}
            for u, d in self.adj.items()
            if u in keep
        }
        pred = {
            v: {u: a for u, a in d.items() if u in keep}
            for v, d in self.pred.items()
            if v in keep
        }
        return nodes, adj, pred, self.directed

    def edge_induced_state(self, edge_set):
        """Edge-induced subgraph state (nx.edge_subgraph): keep exactly the
        listed edges plus their endpoints.  The edge set is broadcast; an
        undirected graph matches either orientation.  Both endpoint owners
        see every kept edge (through adj and its mirror), so this stays a
        pure per-fragment transform like the node-induced case."""
        keep = edge_set if isinstance(edge_set, set) else ray.get(edge_set)

        def _hit(u, v):
            return (u, v) in keep or (not self.directed and (v, u) in keep)

        adj = {}
        endpoints = set()
        for u, d in self.adj.items():
            kept = {v: a for v, a in d.items() if _hit(u, v)}
            if kept:
                adj[u] = kept
                endpoints.add(u)
                endpoints.update(kept)
        pred = {}
        if self.directed:
            for v, d in self.pred.items():
                kept = {u: a for u, a in d.items() if _hit(u, v)}
                if kept:
                    pred[v] = kept
                    endpoints.add(v)
        nodes = {u: a for u, a in self.nodes.items() if u in endpoints}
        for u in nodes:
            adj.setdefault(u, {})
            if self.directed:
                pred.setdefault(u, {})
        return nodes, adj, pred, self.directed

    # ---- reports (dynamic_fragment.h point queries) ------------------------

    def counts(self) -> tuple[int, int, int]:
        n_edges = sum(len(d) for d in self.adj.values())
        selfloops = sum(1 for u, d in self.adj.items() if u in d)
        return len(self.nodes), n_edges, selfloops

    def has_node(self, oid) -> bool:
        return oid in self.nodes

    def node_data(self, oid):
        return self.nodes.get(oid)

    def has_edge(self, u, v) -> bool:
        return v in self.adj.get(u, {})

    def edge_data(self, u, v):
        return self.adj.get(u, {}).get(v)

    def neighbors(self, u) -> list:
        return sorted(self.adj.get(u, {}), key=repr)

    def predecessors(self, v) -> list:
        src = self.pred if self.directed else self.adj
        return sorted(src.get(v, {}), key=repr)

    def degree(self, u) -> int:
        d = len(self.adj.get(u, {}))
        if not self.directed:
            return d + (1 if u in self.adj.get(u, {}) else 0)
        return d + len(self.pred.get(u, {}))

    # ---- exports -----------------------------------------------------------

    def nodes_table(self, attrs: bool = True) -> pa.Table:
        import json

        oids = sorted(self.nodes, key=repr)
        cols = {"oid": pa.array([str(o) for o in oids], pa.string())}
        if attrs:  # snapshot() skips the per-node JSON serialization
            cols["attrs"] = pa.array(
                [json.dumps(self.nodes[o], sort_keys=True, default=str) for o in oids],
                pa.string(),
            )
        return pa.table(cols)

    def edges_table(self, weight_key: str | None = None) -> pa.Table:
        """Out-adjacency rows (undirected: only the u <= v copy, so each
        edge appears once globally)."""
        import json

        srcs, dsts, attrs, ws = [], [], [], []
        for u, d in self.adj.items():
            for v, a in d.items():
                if not self.directed and repr(u) > repr(v):
                    continue
                srcs.append(str(u))
                dsts.append(str(v))
                attrs.append(json.dumps(a, sort_keys=True, default=str))
                if weight_key is not None:
                    ws.append(float(a.get(weight_key, 1.0)))
        cols = {
            "src": pa.array(srcs, pa.string()),
            "dst": pa.array(dsts, pa.string()),
            "attrs": pa.array(attrs, pa.string()),
        }
        if weight_key is not None:
            cols["weight"] = pa.array(ws, pa.float64())
        return pa.table(cols)


class DynamicGraph:
    """Driver-side handle: routes mutation batches, answers reports, and
    snapshots into the static PIE engine for analytics."""

    def __init__(self, num_partitions: int = 4, directed: bool = True, _actors=None):
        self.P = num_partitions
        self.directed = directed
        self.actors = _actors or [
            DynamicFragmentActor.remote(p, num_partitions, directed)
            for p in range(num_partitions)
        ]

    # ---- routing helpers ---------------------------------------------------

    def _split_nodes(self, items: list[tuple]) -> list[list]:
        parts: list[list] = [[] for _ in range(self.P)]
        for it in items:
            parts[_owner(it[0], self.P)].append(it)
        return parts

    def _route_edges(self, kind: str, items: list[tuple]) -> None:
        by_u: list[list] = [[] for _ in range(self.P)]
        by_v: list[list] = [[] for _ in range(self.P)]
        for it in items:
            by_u[_owner(it[0], self.P)].append(it)
            by_v[_owner(it[1], self.P)].append(it)
        calls = []
        for p, a in enumerate(self.actors):
            if by_u[p]:
                calls.append(a.modify_edges.remote(kind, "out", by_u[p]))
            if by_v[p]:
                calls.append(a.modify_edges.remote(kind, "in", by_v[p]))
        ray.get(calls)

    # ---- MODIFY_VERTICES / MODIFY_EDGES -------------------------------------

    def add_nodes(self, nodes, attr: dict | None = None) -> "DynamicGraph":
        items = [(o, {**(attr or {}), **a}) for o, a in _norm_nodes(nodes)]
        parts = self._split_nodes(items)
        ray.get(
            [a.modify_nodes.remote("add", parts[p]) for p, a in enumerate(self.actors) if parts[p]]
        )
        return self

    def update_nodes(self, nodes, attr: dict | None = None) -> "DynamicGraph":
        items = [(o, {**(attr or {}), **a}) for o, a in _norm_nodes(nodes)]
        parts = self._split_nodes(items)
        ray.get(
            [a.modify_nodes.remote("update", parts[p]) for p, a in enumerate(self.actors) if parts[p]]
        )
        return self

    def del_nodes(self, nodes) -> "DynamicGraph":
        items = _norm_nodes(nodes)
        parts = self._split_nodes(items)
        stub_lists = ray.get(
            [a.modify_nodes.remote("del", parts[p]) for p, a in enumerate(self.actors) if parts[p]]
        )
        by_part: list[list] = [[] for _ in range(self.P)]
        for stubs in stub_lists:
            for s in stubs:
                by_part[s[0]].append(s)
        ray.get(
            [
                a.remove_stubs.remote(by_part[p])
                for p, a in enumerate(self.actors)
                if by_part[p]
            ]
        )
        return self

    def add_edges(self, edges, attr: dict | None = None) -> "DynamicGraph":
        self._route_edges("add", _norm_edges(edges, attr or {}))
        return self

    def update_edges(self, edges, attr: dict | None = None) -> "DynamicGraph":
        self._route_edges("update", _norm_edges(edges, attr or {}))
        return self

    def del_edges(self, edges) -> "DynamicGraph":
        self._route_edges("del", _norm_edges(edges, {}))
        return self

    def add_edges_dataset(self, ds: ray.data.Dataset, src: str = "src", dst: str = "dst") -> "DynamicGraph":
        """Bulk load: stream a Dataset of edges in per-block batches (the
        100-TB ingestion path — mutations arrive as data, not driver lists)."""
        for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            self.add_edges(list(zip(batch[src].to_pylist(), batch[dst].to_pylist())))
        return self

    # ---- CLEAR / VIEW / INDUCE ----------------------------------------------

    def clear(self) -> "DynamicGraph":
        ray.get([a.clear.remote() for a in self.actors])
        return self

    def clear_edges(self) -> "DynamicGraph":
        ray.get([a.clear_edges.remote() for a in self.actors])
        return self

    def _from_states(self, state_refs, directed: bool) -> "DynamicGraph":
        out = DynamicGraph(self.P, directed)
        ray.get(
            [
                out.actors[p].load_state.remote(*state_refs[p])
                for p in range(self.P)
            ]
        )
        return out

    def view(self, view_type: str) -> "DynamicGraph":
        """VIEW_GRAPH: 'reversed' | 'directed' | 'undirected' (a materialized
        same-partitioning copy — the reference's op also creates a graph)."""
        states = ray.get([a.export_state.remote(view_type) for a in self.actors])
        return self._from_states(states, states[0][3])

    def copy(self) -> "DynamicGraph":
        return self.view("copy")

    def subgraph(self, nodes) -> "DynamicGraph":
        """INDUCE_SUBGRAPH (node-induced): the node set is broadcast once."""
        ref = ray.put(set(nodes))
        states = ray.get([a.induced_state.remote(ref) for a in self.actors])
        return self._from_states(states, self.directed)

    def edge_subgraph(self, edges) -> "DynamicGraph":
        """INDUCE_SUBGRAPH (edge-induced; ref create_subgraph edges=...)."""
        ref = ray.put({(u, v) for u, v in edges})
        states = ray.get([a.edge_induced_state.remote(ref) for a in self.actors])
        return self._from_states(states, self.directed)

    # ---- reports -------------------------------------------------------------

    def number_of_nodes(self) -> int:
        return sum(c[0] for c in ray.get([a.counts.remote() for a in self.actors]))

    def number_of_edges(self) -> int:
        cs = ray.get([a.counts.remote() for a in self.actors])
        n_dir = sum(c[1] for c in cs)
        if self.directed:
            return n_dir
        loops = sum(c[2] for c in cs)
        return (n_dir - loops) // 2 + loops

    def has_node(self, oid) -> bool:
        return ray.get(self.actors[_owner(oid, self.P)].has_node.remote(oid))

    def has_edge(self, u, v) -> bool:
        return ray.get(self.actors[_owner(u, self.P)].has_edge.remote(u, v))

    def get_node_data(self, oid):
        return ray.get(self.actors[_owner(oid, self.P)].node_data.remote(oid))

    def get_edge_data(self, u, v):
        return ray.get(self.actors[_owner(u, self.P)].edge_data.remote(u, v))

    def neighbors(self, u) -> list:
        return ray.get(self.actors[_owner(u, self.P)].neighbors.remote(u))

    def predecessors(self, v) -> list:
        return ray.get(self.actors[_owner(v, self.P)].predecessors.remote(v))

    def degree(self, u) -> int:
        return ray.get(self.actors[_owner(u, self.P)].degree.remote(u))

    # ---- exports ---------------------------------------------------------------

    def nodes_dataset(self, attrs: bool = True) -> ray.data.Dataset:
        return ray.data.from_arrow_refs(
            [a.nodes_table.remote(attrs) for a in self.actors]
        )

    def edges_dataset(self, weight_key: str | None = None) -> ray.data.Dataset:
        return ray.data.from_arrow_refs(
            [a.edges_table.remote(weight_key) for a in self.actors]
        )

    def snapshot(self, num_partitions: int | None = None, **kw):
        """Freeze the current state into a static PIE Graph (oid-encoded) so
        the analytical apps run on it — the nx→analytical bridge."""
        from graphscope_ray.graph.build import build_graph_from_oids

        edges = self.edges_dataset()
        if not self.directed:
            kw.setdefault("view", "undirected")
        return build_graph_from_oids(
            edges.select_columns(["src", "dst"]),
            src_col="src",
            dst_col="dst",
            num_partitions=num_partitions or self.P,
            # declare the node universe so ISOLATED nodes survive the freeze
            # (networkx semantics; build only sees endpoints otherwise)
            vertices=self.nodes_dataset(attrs=False),
            **kw,
        )
