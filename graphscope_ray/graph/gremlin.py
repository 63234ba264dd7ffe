"""Gremlin-style traversals over the property graph, materializing subgraphs.

Reference semantics: ``GREMLIN_TO_SUBGRAPH`` (python/graphscope/framework/
dag_utils.py:1048-1084) runs a Gremlin traversal script against a property
graph and loads the traversal's result back as a NEW property graph;
op_executor.py:464-783 executes it by delegating to the interactive (GIE)
engine.  GIE itself — a full Gremlin/Pegasus dataflow compiler — is out of
scope per SURVEY §2.1; what this module implements is the *data plane* of
the op users actually feed to ``gremlin_to_subgraph``: linear traversals of
filter / hop / project steps (``g.V().hasLabel(..).has(..).out(..).
outE(..).subgraph(..)``), compiled step-by-step to lazy Ray Dataset
transforms over the per-label tables of ``PropertyGraph``.

Ray-Data-first execution model (NOT a port of GIE's BSP dataflow):

- A traverser frontier is a set of per-label ``ray.data.Dataset``s.  A
  vertex frontier holds one ``oid`` bag per vertex label (bag = Gremlin
  traverser multiplicity: rows may repeat; join multiplicity IS traverser
  bulk).  An edge frontier holds full edge rows per edge label; a value
  frontier is one single-column bag.
- Hops (``out``/``in_``/``both``/``outE``/``inE``) are distributed hash
  joins of the frontier against the relevant edge tables
  (``utils.hash_join`` — the same explicit exchange every join in this
  repo uses; nothing is broadcast, so frontiers may exceed object-store
  broadcast limits).
- Property filters (``has``) push down: on a frontier fresh from ``V()``
  the label table itself is filtered (zero joins — the common
  ``g.V().hasLabel(L).has(k, p)`` prefix never shuffles); after a hop the
  needed property column is joined in, used, and dropped.
- Everything stays lazy until a terminal step (``count`` / ``groupCount``
  / ``to_pandas`` / ``subgraph``).

Supported steps: ``V, E, hasLabel, has, hasId, out, in_, both, outE,
inE, bothE, outV, inV, bothV, values, dedup, limit, count, groupCount,
subgraph, to_pandas / toList``.  Predicates: ``P.eq/neq/gt/gte/lt/lte/
within/without/inside/outside/between``.  Documented boundaries (raise
``GremlinUnsupported``): branching (``union``/``repeat``/``__``), path
tracking, ``otherV`` (needs per-traverser direction memory), and
side-effect steps other than ``subgraph``.

``run_gremlin(pg, script)`` evaluates a Gremlin-Python-style script string
(``"g.V().hasLabel('x').out('y').subgraph('s')"``) against these builders —
the string surface ``gremlin_to_subgraph(graph, gremlin_script=...)``
exposes in the reference (graph_utils tests use exactly this shape).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from graphscope_ray.graph.property import PropertyGraph, _rename
from graphscope_ray.utils import hash_groupby_sum, hash_join


class GremlinUnsupported(NotImplementedError):
    """A Gremlin step outside the implemented linear-traversal subset."""


@dataclass(frozen=True)
class P:
    """Gremlin predicate (mirrors gremlin-python's ``P``): a comparison
    applied vectorized (pyarrow.compute) to a property column."""

    op: str
    value: Any

    # -- constructors (the gremlin-python surface) --
    @staticmethod
    def eq(v):
        return P("eq", v)

    @staticmethod
    def neq(v):
        return P("neq", v)

    @staticmethod
    def gt(v):
        return P("gt", v)

    @staticmethod
    def gte(v):
        return P("gte", v)

    @staticmethod
    def lt(v):
        return P("lt", v)

    @staticmethod
    def lte(v):
        return P("lte", v)

    @staticmethod
    def within(*vs):
        return P("within", list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple, set)) else list(vs))

    @staticmethod
    def without(*vs):
        return P("without", list(vs[0]) if len(vs) == 1 and isinstance(vs[0], (list, tuple, set)) else list(vs))

    @staticmethod
    def inside(lo, hi):  # exclusive both ends (Gremlin semantics)
        return P("inside", (lo, hi))

    @staticmethod
    def outside(lo, hi):
        return P("outside", (lo, hi))

    @staticmethod
    def between(lo, hi):  # [lo, hi) — Gremlin's between
        return P("between", (lo, hi))

    def mask(self, arr) -> pa.ChunkedArray:
        if self.op == "eq":
            return pc.equal(arr, self.value)
        if self.op == "neq":
            return pc.not_equal(arr, self.value)
        if self.op == "gt":
            return pc.greater(arr, self.value)
        if self.op == "gte":
            return pc.greater_equal(arr, self.value)
        if self.op == "lt":
            return pc.less(arr, self.value)
        if self.op == "lte":
            return pc.less_equal(arr, self.value)
        if self.op == "within":
            return pc.is_in(arr, value_set=pa.array(self.value))
        if self.op == "without":
            return pc.invert(pc.is_in(arr, value_set=pa.array(self.value)))
        lo, hi = self.value
        if self.op == "inside":
            return pc.and_(pc.greater(arr, lo), pc.less(arr, hi))
        if self.op == "outside":
            return pc.or_(pc.less(arr, lo), pc.greater(arr, hi))
        if self.op == "between":
            return pc.and_(pc.greater_equal(arr, lo), pc.less(arr, hi))
        raise GremlinUnsupported(f"predicate {self.op}")


def _as_pred(v) -> P:
    return v if isinstance(v, P) else P.eq(v)


def _filter_ds(ds: ray.data.Dataset, col: str, pred: P) -> ray.data.Dataset:
    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.column_names:
            return t.slice(0, 0)
        return t.filter(pc.fill_null(pred.mask(t[col]), False))

    return ds.map_batches(_f, batch_format="pyarrow")


def _distinct(ds: ray.data.Dataset, cols: list[str], num_partitions: int = 8) -> ray.data.Dataset:
    """Distinct rows over ``cols`` via the repo's explicit hash exchange
    (the sort-based ``Dataset.unique`` plan is overhead-bound; VERDICT r3 #5)."""
    return hash_groupby_sum(
        ds.select_columns(cols), cols, None, "__n", num_partitions=num_partitions
    ).select_columns(cols)


# frontier kinds
_VERTEX, _EDGE, _VALUE = "vertex", "edge", "value"


class Traversal:
    """One linear Gremlin traversal.  Immutable: every step returns a new
    ``Traversal`` sharing the (lazy) frontier datasets built so far.

    Vertex frontier state: ``{v_label: (Dataset, full_row)}`` — ``full_row``
    means the dataset is still the label's whole property table (the
    ``V()`` prefix), so ``has`` filters in place without a join; after the
    first hop only the ``oid`` bag column travels.
    """

    def __init__(self, pg: PropertyGraph, kind: str, state, num_partitions: int = 8):
        self._pg = pg
        self._kind = kind
        self._state = state
        self._K = num_partitions

    # ---- sources -----------------------------------------------------------

    @staticmethod
    def V(pg: PropertyGraph, *ids, num_partitions: int = 8) -> "Traversal":
        state = {lbl: (v.ds, True) for lbl, v in pg._v.items()}
        t = Traversal(pg, _VERTEX, state, num_partitions)
        return t.hasId(*ids) if ids else t

    @staticmethod
    def E(pg: PropertyGraph, num_partitions: int = 8) -> "Traversal":
        state = {lbl: e.ds for lbl, e in pg._e.items()}
        return Traversal(pg, _EDGE, state, num_partitions)

    def _derive(self, kind, state) -> "Traversal":
        return Traversal(self._pg, kind, state, self._K)

    # ---- filters -----------------------------------------------------------

    def hasLabel(self, *labels) -> "Traversal":
        if self._kind == _VALUE:
            raise GremlinUnsupported("hasLabel on a value frontier")
        keep = {l: s for l, s in self._state.items() if l in labels}
        return self._derive(self._kind, keep)

    def hasId(self, *ids) -> "Traversal":
        pred = P.within(list(ids))
        if self._kind == _VERTEX:
            return self._derive(
                _VERTEX,
                {l: (_filter_ds(ds, "oid", pred), full) for l, (ds, full) in self._state.items()},
            )
        raise GremlinUnsupported("hasId outside a vertex frontier")

    def has(self, key: str, value=None) -> "Traversal":
        """Filter traversers by a property predicate.  Gremlin semantics:
        elements whose label lacks ``key`` are filtered out entirely.
        ``has(key)`` alone keeps labels that define the property."""
        pred = None if value is None else _as_pred(value)
        if self._kind == _EDGE:
            out = {}
            for lbl, ds in self._state.items():
                e = self._pg._e[lbl]
                cols = ("src_oid", "dst_oid") + e.properties
                if key not in cols:
                    continue
                out[lbl] = ds if pred is None else _filter_ds(ds, key, pred)
            return self._derive(_EDGE, out)
        if self._kind != _VERTEX:
            raise GremlinUnsupported("has on a value frontier")
        out = {}
        for lbl, (ds, full) in self._state.items():
            v = self._pg._v[lbl]
            if key != "oid" and key not in v.properties:
                continue  # label lacks the property → traversers die
            if pred is None:
                out[lbl] = (ds, full)
            elif full or key == "oid":
                out[lbl] = (_filter_ds(ds, key, pred), full)
            else:
                # post-hop bag: join the one needed property column in,
                # filter, drop it — the bag multiplicity is preserved
                # because oid is unique within a label's vertex table
                prop = v.ds.select_columns(["oid", key])
                prop = _filter_ds(prop, key, pred).select_columns(["oid"])
                prop = _rename(prop, {"oid": "__k"})
                joined = hash_join(ds, prop, "oid", "__k", num_partitions=self._K)
                out[lbl] = (_drop(joined, ["__k"]), False)
        return self._derive(_VERTEX, out)

    def dedup(self) -> "Traversal":
        if self._kind == _VERTEX:
            return self._derive(
                _VERTEX,
                {l: (_distinct(ds if not full else ds.select_columns(["oid"]), ["oid"], self._K), False)
                 for l, (ds, full) in self._state.items()},
            )
        if self._kind == _EDGE:
            out = {}
            for lbl, ds in self._state.items():
                cols = ["src_oid", "dst_oid"] + list(self._pg._e[lbl].properties)
                out[lbl] = _distinct(ds, cols, self._K)
            return self._derive(_EDGE, out)
        return self._derive(_VALUE, _distinct(self._state, ["value"], self._K))

    def limit(self, n: int) -> "Traversal":
        """First ``n`` traversers in sorted-label, block order (Gremlin's
        limit is order-unspecified too; don't pair with a value-hash
        oracle)."""
        if self._kind == _VALUE:
            return self._derive(_VALUE, self._state.limit(n))
        out, left = {}, n
        for lbl in sorted(self._state):
            if left <= 0:
                break
            s = self._state[lbl]
            ds = s[0] if self._kind == _VERTEX else s
            k = min(left, ds.count())
            if k == 0:
                continue
            took = ds.limit(k)
            out[lbl] = (took, s[1]) if self._kind == _VERTEX else took
            left -= k
        return self._derive(self._kind, out)

    # ---- hops --------------------------------------------------------------

    def _vertex_bags(self) -> dict[str, ray.data.Dataset]:
        assert self._kind == _VERTEX
        return {
            l: (ds.select_columns(["oid"]) if full else ds)
            for l, (ds, full) in self._state.items()
        }

    def _hop_edges(self, elabels, direction: str) -> dict[str, list[tuple[str, ray.data.Dataset]]]:
        """Join the vertex frontier against each matching edge label's table;
        returns (joined_endpoint_column, full-edge-row dataset) pairs keyed
        by edge label (the building block for out/in_/outE/inE/subgraph)."""
        if self._kind != _VERTEX:
            raise GremlinUnsupported(f"{direction} hop needs a vertex frontier")
        bags = self._vertex_bags()
        hits: dict[str, list[tuple[str, ray.data.Dataset]]] = {}
        for lbl, e in self._pg._e.items():
            if elabels and lbl not in elabels:
                continue
            sides = []
            if direction in ("out", "both") and e.src_label in bags:
                sides.append("src_oid")
            if direction in ("in", "both") and e.dst_label in bags:
                sides.append("dst_oid")
            for key in sides:
                fr = _rename(
                    bags[e.src_label if key == "src_oid" else e.dst_label], {"oid": "__k"}
                )
                joined = hash_join(e.ds, fr, key, "__k", num_partitions=self._K)
                hits.setdefault(lbl, []).append((key, _drop(joined, ["__k"])))
        return hits

    def _hop_vertices(self, elabels, direction: str) -> "Traversal":
        out: dict[str, ray.data.Dataset] = {}
        for lbl, parts in self._hop_edges(elabels, direction).items():
            e = self._pg._e[lbl]
            for key, part in parts:
                # traverser entered via `key` → exits at the opposite endpoint
                col, vlbl = (
                    ("dst_oid", e.dst_label) if key == "src_oid" else ("src_oid", e.src_label)
                )
                bag = _rename(part.select_columns([col]), {col: "oid"})
                out[vlbl] = out[vlbl].union(bag) if vlbl in out else bag
        return self._derive(_VERTEX, {l: (ds, False) for l, ds in out.items()})

    def out(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "out")

    def in_(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "in")

    def both(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "both")

    def _hop_E(self, elabels, direction: str) -> "Traversal":
        out = {}
        for lbl, parts in self._hop_edges(elabels, direction).items():
            ds = parts[0][1]
            for _, p in parts[1:]:
                ds = ds.union(p)
            out[lbl] = ds
        return self._derive(_EDGE, out)

    def outE(self, *elabels) -> "Traversal":
        return self._hop_E(elabels, "out")

    def inE(self, *elabels) -> "Traversal":
        return self._hop_E(elabels, "in")

    def bothE(self, *elabels) -> "Traversal":
        return self._hop_E(elabels, "both")

    def _edge_end(self, which: str) -> "Traversal":
        if self._kind != _EDGE:
            raise GremlinUnsupported(f"{which}V needs an edge frontier")
        out: dict[str, tuple] = {}
        for lbl, ds in self._state.items():
            e = self._pg._e[lbl]
            ends = {"out": [("src_oid", e.src_label)], "in": [("dst_oid", e.dst_label)]}.get(
                which, [("src_oid", e.src_label), ("dst_oid", e.dst_label)]
            )
            for col, vlbl in ends:
                bag = _rename(ds.select_columns([col]), {col: "oid"})
                if vlbl in out:
                    out[vlbl] = (out[vlbl][0].union(bag), False)
                else:
                    out[vlbl] = (bag, False)
        return self._derive(_VERTEX, out)

    def outV(self) -> "Traversal":
        return self._edge_end("out")

    def inV(self) -> "Traversal":
        return self._edge_end("in")

    def bothV(self) -> "Traversal":
        return self._edge_end("both")

    def otherV(self) -> "Traversal":
        raise GremlinUnsupported("otherV needs per-traverser direction memory (path tracking)")

    # ---- projections / terminals -------------------------------------------

    def values(self, key: str) -> "Traversal":
        """Project traversers to a property-value bag.  Labels lacking the
        property contribute nothing (Gremlin semantics)."""
        parts = []
        if self._kind == _VERTEX:
            for lbl, (ds, full) in self._state.items():
                v = self._pg._v[lbl]
                if key not in v.properties and key != "oid":
                    continue
                if full:
                    parts.append(ds.select_columns([key]))
                else:
                    prop = _rename(v.ds.select_columns(["oid", key]), {"oid": "__k"})
                    joined = hash_join(ds, prop, "oid", "__k", num_partitions=self._K)
                    parts.append(joined.select_columns([key]))
        elif self._kind == _EDGE:
            for lbl, ds in self._state.items():
                e = self._pg._e[lbl]
                if key not in ("src_oid", "dst_oid") + e.properties:
                    continue
                parts.append(ds.select_columns([key]))
        else:
            raise GremlinUnsupported("values on a value frontier")
        if not parts:
            raise ValueError(f"no frontier label defines property {key!r}")
        bag = parts[0]
        for p in parts[1:]:
            bag = bag.union(p)
        return self._derive(_VALUE, _rename(bag, {key: "value"}))

    def count(self) -> int:
        if self._kind == _VALUE:
            return self._state.count()
        if self._kind == _VERTEX:
            return sum(ds.count() for ds, _ in self._state.values())
        return sum(ds.count() for ds in self._state.values())

    def groupCount(self) -> pd.DataFrame:
        """Value frontier → (value, count) sorted by value; vertex frontier →
        per-element traverser bulk (v_label, oid, count)."""
        if self._kind == _VALUE:
            out = hash_groupby_sum(self._state, ["value"], None, "count", num_partitions=self._K)
            return out.to_pandas().sort_values("value").reset_index(drop=True)
        if self._kind == _VERTEX:
            frames = []
            for lbl, bag in self._vertex_bags().items():
                df = hash_groupby_sum(bag, ["oid"], None, "count", num_partitions=self._K).to_pandas()
                df.insert(0, "v_label", lbl)
                frames.append(df)
            return (
                pd.concat(frames, ignore_index=True)
                .sort_values(["v_label", "oid"])
                .reset_index(drop=True)
            )
        raise GremlinUnsupported("groupCount on an edge frontier")

    def to_pandas(self) -> pd.DataFrame:
        """Materialize the frontier: vertex → (v_label, oid) bag; edge →
        (e_label, src_oid, dst_oid) bag; value → (value) bag.  Sorted for
        deterministic comparison (bags carry no order)."""
        if self._kind == _VALUE:
            return self._state.to_pandas().sort_values("value").reset_index(drop=True)
        frames = []
        if self._kind == _VERTEX:
            for lbl, bag in self._vertex_bags().items():
                df = bag.to_pandas()
                df.insert(0, "v_label", lbl)
                frames.append(df)
            cols = ["v_label", "oid"]
        else:
            for lbl, ds in self._state.items():
                df = ds.select_columns(["src_oid", "dst_oid"]).to_pandas()
                df.insert(0, "e_label", lbl)
                frames.append(df)
            cols = ["e_label", "src_oid", "dst_oid"]
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=cols)
        return out[cols].sort_values(cols).reset_index(drop=True)

    def toList(self) -> list:
        if self._kind == _VALUE:
            return self.to_pandas()["value"].tolist()
        return list(self.to_pandas().itertuples(index=False, name=None))

    def subgraph(self, side_effect_key: str | None = None) -> PropertyGraph:
        """GREMLIN_TO_SUBGRAPH's data plane (ref dag_utils.py:1048-1084):
        materialize the traversed edges — the frontier must be an edge
        frontier, exactly Gremlin's ``..outE(..).subgraph('s')`` shape —
        plus their incident vertices WITH their properties from the parent
        graph, as a new ``PropertyGraph``.  Edges are deduplicated (a
        Gremlin subgraph holds each edge once however many traversers
        crossed it); vertex property rows arrive via a distinct-endpoints
        hash join against the parent label tables, so nothing corpus-sized
        is broadcast."""
        if self._kind != _EDGE:
            raise GremlinUnsupported(
                "subgraph() needs an edge frontier (end the traversal with outE/inE/bothE or E())"
            )
        sub = PropertyGraph(self._pg.directed)
        need_v: dict[str, list[ray.data.Dataset]] = {}
        edges = {}
        for lbl, ds in self._state.items():
            e = self._pg._e[lbl]
            cols = ["src_oid", "dst_oid"] + list(e.properties)
            edges[lbl] = (_distinct(ds, cols, self._K), e)
            need_v.setdefault(e.src_label, []).append(ds.select_columns(["src_oid"]))
            need_v.setdefault(e.dst_label, []).append(ds.select_columns(["dst_oid"]))
        for vlbl, parts in need_v.items():
            keys = _rename(parts[0], {parts[0].schema().names[0]: "oid"})
            for p in parts[1:]:
                keys = keys.union(_rename(p, {p.schema().names[0]: "oid"}))
            keys = _rename(_distinct(keys, ["oid"], self._K), {"oid": "__k"})
            v = self._pg._v[vlbl]
            rows = _drop(hash_join(v.ds, keys, "oid", "__k", num_partitions=self._K), ["__k"])
            sub = sub.add_vertices(rows, vlbl, properties=list(v.properties), vid_field="oid")
        for lbl, (ds, e) in edges.items():
            sub = sub.add_edges(
                ds, lbl, properties=list(e.properties),
                src_label=e.src_label, dst_label=e.dst_label,
                src_field="src_oid", dst_field="dst_oid",
            )
        return sub

    # unsupported branches — explicit boundary, not silent wrong answers
    def union(self, *args):
        raise GremlinUnsupported("branching (union/repeat/__) is GIE territory")

    repeat = union
    path = union


class GraphTraversalSource:
    """``g`` — entry point mirroring gremlin-python's source object."""

    def __init__(self, pg: PropertyGraph, num_partitions: int = 8):
        self._pg = pg
        self._K = num_partitions

    def V(self, *ids) -> Traversal:
        return Traversal.V(self._pg, *ids, num_partitions=self._K)

    def E(self) -> Traversal:
        return Traversal.E(self._pg, num_partitions=self._K)


def traversal(pg: PropertyGraph, num_partitions: int = 8) -> GraphTraversalSource:
    return GraphTraversalSource(pg, num_partitions)


def run_gremlin(pg: PropertyGraph, script: str, num_partitions: int = 8):
    """Evaluate a Gremlin-Python-style traversal STRING against ``pg`` —
    the ``gremlin_to_subgraph(graph, gremlin_script=...)`` string surface.
    ``.in(`` (a Python keyword) is rewritten to ``.in_(`` like
    gremlin-python does.  The namespace exposes only ``g`` and ``P``."""
    src = script.strip().replace(".in(", ".in_(")
    if not src.startswith("g."):
        raise ValueError("gremlin script must start with 'g.'")
    return eval(  # noqa: S307 — restricted namespace, test/CLI surface
        src, {"__builtins__": {}}, {"g": traversal(pg, num_partitions), "P": P}
    )


def _drop(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    def _d(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in cols if c in t.column_names])

    return ds.map_batches(_d, batch_format="pyarrow")
