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
subgraph, to_pandas / toList`` plus (round 5, the GIE branching subset —
ref interactive_engine/compiler step tests are the semantic anchor):

- ``repeat(__.out(..)).times(k)`` — bounded iteration, compiled to a
  k-fold composition of the body's lazy hop joins; ``.emit()`` unions the
  frontier after every round (times-bounded emit-after semantics).
- ``union(__...., __....)`` — each anonymous branch applied to the same
  incoming frontier, results merged per label (bag union — traverser
  multiplicities add, exactly SQL ``UNION ALL``).
- ``__`` — anonymous sub-traversal (a step recorder replayed against the
  frontier by ``repeat``/``union``/``where``).
- ``order().by(key[, Order.desc]).range(lo, hi)`` / ``.limit(n)`` — a
  distributed sort of the (label, oid, key) bag with DETERMINISTIC
  tie-break (key, v_label, oid), then an order-preserving slice
  (``split_at_indices`` — no driver materialization).  ``hi=-1`` means
  "to the end".  Gremlin leaves ties unspecified; the deterministic
  tie-break makes ``range`` reproducible and SQL-oracle-able
  (``row_number() OVER (ORDER BY key, label, oid)``).
- ``where(__....)`` — existential filter (SQL ``EXISTS`` semi-join): a
  traverser survives iff the sub-traversal from it reaches ≥1 element.
  Implemented by tagging each distinct frontier element with an origin
  column carried through the sub-traversal's hops, then a distinct-origin
  semi-join back — no per-traverser loop, two extra exchanges total.

Predicates: ``P.eq/neq/gt/gte/lt/lte/
within/without/inside/outside/between``.  ``traversal(pg).withPath().V()
....path()`` tracks LINEAR vertex paths (position history as carry
columns through the hop joins — rows are exactly the join tuples).
``as_(name)``/``select(names..)`` project labeled positions the same
way.  Documented boundaries (raise ``GremlinUnsupported``): path under
branching (union/where/order) or edge hops,
``otherV`` (needs per-traverser direction memory), unbounded
``repeat().until()``, nested ``where``, and side-effect steps other than
``subgraph``.

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

    def __init__(
        self,
        pg: PropertyGraph,
        kind: str,
        state,
        num_partitions: int = 8,
        carry: tuple[str, ...] = (),
        pathlen: int | None = None,
    ):
        self._pg = pg
        self._kind = kind
        self._state = state
        self._K = num_partitions
        # extra bag columns carried through hops/filters (where() origin
        # tracking and withPath() position history); always () on full-table
        # V() frontiers by construction
        self._carry = carry
        # None = path tracking off; k = number of hops taken so far (the
        # carry columns __p0..__p{k-1} hold the positions before each hop)
        self._pathlen = pathlen

    # ---- sources -----------------------------------------------------------

    @staticmethod
    def V(pg: PropertyGraph, *ids, num_partitions: int = 8, path: bool = False) -> "Traversal":
        state = {lbl: (v.ds, True) for lbl, v in pg._v.items()}
        t = Traversal(pg, _VERTEX, state, num_partitions,
                      pathlen=0 if path else None)
        return t.hasId(*ids) if ids else t

    @staticmethod
    def E(pg: PropertyGraph, num_partitions: int = 8) -> "Traversal":
        state = {lbl: e.ds for lbl, e in pg._e.items()}
        return Traversal(pg, _EDGE, state, num_partitions)

    def _derive(self, kind, state, carry=None, pathlen="inherit") -> "Traversal":
        return Traversal(
            self._pg, kind, state, self._K,
            carry=self._carry if carry is None else carry,
            pathlen=self._pathlen if pathlen == "inherit" else pathlen,
        )

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

    def coin(self, p: float, salt: int = 0) -> "Traversal":
        """Gremlin ``coin(p)`` with this repo's sampler contract: the flip
        is DETERMINISTIC — keep an element iff hash_u64(oid, salt) < p·2⁶⁴
        (content-stable like every sampler in functions/sampling, so
        re-runs, repartitioning and the SQL twin agree exactly).  Applies
        per ELEMENT: all copies of a traverser share the flip (Gremlin
        flips per traverser — documented divergence, bags stay consistent)."""
        from graphscope_ray.functions.sampling import hash_u64

        if self._kind != _VERTEX:
            raise GremlinUnsupported("coin() supports vertex frontiers")
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"coin({p})")
        thresh = np.uint64(min(int(p * 2.0**64), 2**64 - 1))

        def _keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "oid" not in t.column_names:
                return t.slice(0, 0)
            h = hash_u64(
                t["oid"].to_numpy(zero_copy_only=False).astype(np.int64), salt
            )
            return t.filter(pa.array(h < thresh))

        return self._derive(
            _VERTEX,
            {l: (ds.map_batches(_keep, batch_format="pyarrow"), full)
             for l, (ds, full) in self._state.items()},
        )

    def dedup(self) -> "Traversal":
        if self._kind == _VERTEX:
            cols = ["oid", *self._carry]
            return self._derive(
                _VERTEX,
                {l: (_distinct(ds if not full else ds.select_columns(["oid"]), cols if not full else ["oid"], self._K), False)
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
            l: (ds.select_columns(["oid"]) if full else ds.select_columns(["oid", *self._carry]))
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
                sel = [col, *self._carry]
                ren = {col: "oid"}
                if self._pathlen is not None:
                    # withPath: the joined endpoint (key side) IS the
                    # traverser's position before this hop — save it
                    sel.append(key)
                    ren[key] = f"__p{self._pathlen}"
                bag = _rename(part.select_columns(sel), ren)
                out[vlbl] = out[vlbl].union(bag) if vlbl in out else bag
        new_carry = self._carry
        new_len = self._pathlen
        if self._pathlen is not None:
            new_carry = self._carry + (f"__p{self._pathlen}",)
            new_len = self._pathlen + 1
        return self._derive(
            _VERTEX, {l: (ds, False) for l, ds in out.items()},
            carry=new_carry, pathlen=new_len,
        )

    def out(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "out")

    def in_(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "in")

    def both(self, *elabels) -> "Traversal":
        return self._hop_vertices(elabels, "both")

    def _hop_E(self, elabels, direction: str) -> "Traversal":
        if self._pathlen is not None:
            raise GremlinUnsupported("edge hops under withPath() (vertex paths only)")
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
                # edge frontiers with carry columns always come from _hop_E,
                # which preserves them in every part
                bag = _rename(ds.select_columns([col, *self._carry]), {col: "oid"})
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
        if self._carry:
            raise GremlinUnsupported(
                "values() inside where()/withPath() drops the carried columns"
            )
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

    def _value_agg(self, which: str):
        """Distributed scalar aggregate of a value frontier (Gremlin's
        sum()/mean()/max()/min() terminals): per-block partials → one
        driver fold over block-count rows."""
        if self._kind != _VALUE:
            raise GremlinUnsupported(f"{which}() needs a values(..) frontier")

        def _p(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "value" not in t.column_names:
                return pa.table(
                    {"s": pa.array([], pa.float64()), "n": pa.array([], pa.int64()),
                     "mx": pa.array([], pa.float64()), "mn": pa.array([], pa.float64())}
                )
            v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {"s": pa.array([float(v.sum())]), "n": pa.array([len(v)], pa.int64()),
                 "mx": pa.array([float(v.max())]), "mn": pa.array([float(v.min())])}
            )

        parts = self._state.map_batches(_p, batch_format="pyarrow").to_pandas()
        if not len(parts) or int(parts["n"].sum()) == 0:
            raise ValueError(f"{which}() of an empty traversal")
        if which == "sum":
            return float(parts["s"].sum())
        if which == "mean":
            return float(parts["s"].sum() / parts["n"].sum())
        if which == "max":
            return float(parts["mx"].max())
        return float(parts["mn"].min())

    def sum_(self) -> float:
        return self._value_agg("sum")

    def mean_(self) -> float:
        return self._value_agg("mean")

    def max_(self) -> float:
        return self._value_agg("max")

    def min_(self) -> float:
        return self._value_agg("min")

    # gremlin-python spells these sum()/mean()/max()/min(); both spellings
    # work (methods cannot shadow builtins in the restricted eval namespace)
    sum = sum_
    mean = mean_
    max = max_
    min = min_

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

    # ---- branching / iteration / ordering (GIE subset, round 5) ------------

    def union(self, *subs) -> "Traversal":
        """Apply each anonymous branch to THIS frontier and merge the
        results per label — bag union, multiplicities add (SQL UNION ALL).
        All branches must land on the same frontier kind."""
        if self._pathlen is not None:
            raise GremlinUnsupported("union() under withPath() (branch paths diverge)")
        if not subs:
            raise GremlinUnsupported("union() needs at least one branch")
        results = []
        for s in subs:
            r = _apply_sub(s, self)
            if not isinstance(r, Traversal):
                raise GremlinUnsupported("union() branches must end in a frontier")
            results.append(r)
        kinds = {r._kind for r in results}
        if len(kinds) != 1:
            raise GremlinUnsupported(
                f"union() branches produce mixed frontier kinds {sorted(kinds)}"
            )
        return _merge_frontiers(results)

    def repeat(self, sub) -> "_RepeatBuilder":
        """Bounded iteration: ``repeat(__....).times(k)`` composes the body
        k times over the lazy frontier (a k-way join chain — exactly how a
        k-hop unrolls in SQL).  ``.emit()`` additionally unions the frontier
        after every round.  Unbounded ``until()`` is not supported."""
        return _RepeatBuilder(self, sub)

    def order(self) -> "_OrderBuilder":
        """Global ordering: ``order().by(key[, Order.desc])`` then
        ``range(lo, hi)`` / ``limit(n)``.  Distributed sort of the
        (key, v_label, oid) bag with a deterministic tie-break, then an
        order-preserving slice; the selected set returns to a normal
        per-label frontier for further steps."""
        if self._carry or self._pathlen is not None:
            raise GremlinUnsupported("order() inside where() / under withPath()")
        return _OrderBuilder(self)

    def range(self, lo: int, hi: int) -> "Traversal":
        """Positional slice without order(): Gremlin leaves the order
        unspecified, so only the COUNT is well-defined — require order()
        first for deterministic results."""
        raise GremlinUnsupported("range() requires order().by(..) first")

    def where(self, sub) -> "Traversal":
        """Existential filter (SQL EXISTS): keep each traverser iff the
        anonymous sub-traversal starting from it reaches at least one
        element.  Distributed plan: tag each DISTINCT frontier element with
        (__origin, __olabel) columns, run the sub-traversal once with the
        tags carried through every hop, distinct the surviving tags, and
        semi-join them back against the original bags — condition evaluated
        once per element regardless of traverser multiplicity."""
        if self._kind != _VERTEX:
            raise GremlinUnsupported("where(sub) needs a vertex frontier")
        if self._carry or self._pathlen is not None:
            raise GremlinUnsupported("nested where() / where() under withPath()")
        marked = {}
        for lbl, (ds, full) in self._state.items():
            bag = ds.select_columns(["oid"])
            keys = _distinct(bag, ["oid"], self._K)

            def _mark(t: pa.Table, _lbl=lbl) -> pa.Table:
                if t.num_rows == 0 or "oid" not in t.column_names:
                    return pa.table(
                        {
                            "oid": pa.array([], pa.int64()),
                            "__origin": pa.array([], pa.int64()),
                            "__olabel": pa.array([], pa.string()),
                        }
                    )
                return pa.table(
                    {
                        "oid": t["oid"],
                        "__origin": t["oid"],
                        "__olabel": pa.array([_lbl] * t.num_rows, pa.string()),
                    }
                )

            marked[lbl] = (keys.map_batches(_mark, batch_format="pyarrow"), False)
        probe = Traversal(
            self._pg, _VERTEX, marked, self._K, carry=("__origin", "__olabel")
        )
        res = _apply_sub(sub, probe)
        if not isinstance(res, Traversal) or res._kind == _VALUE:
            raise GremlinUnsupported(
                "where() sub-traversal must end as a vertex/edge frontier"
            )
        parts = []
        if res._kind == _VERTEX:
            for _, (ds, _full) in res._state.items():
                parts.append(ds.select_columns(["__olabel", "__origin"]))
        else:
            for _, ds in res._state.items():
                parts.append(ds.select_columns(["__olabel", "__origin"]))
        if not parts:
            return self._derive(_VERTEX, {})
        surv = parts[0]
        for p in parts[1:]:
            surv = surv.union(p)
        surv = _distinct(surv, ["__olabel", "__origin"], self._K)
        out = {}
        for lbl, (ds, full) in self._state.items():
            bag = ds.select_columns(["oid"]) if full else ds
            keys = _rename(
                _filter_ds(surv, "__olabel", P.eq(lbl)).select_columns(["__origin"]),
                {"__origin": "__k"},
            )
            out[lbl] = (
                _drop(hash_join(bag, keys, "oid", "__k", num_partitions=self._K), ["__k"]),
                False,
            )
        return self._derive(_VERTEX, out)

    def as_(self, name: str) -> "Traversal":
        """Label the current position (gremlin-python ``as_``): saves each
        traverser's element id in a carry column that rides through every
        later hop/filter; ``select(..)`` projects the saved positions."""
        if self._kind != _VERTEX:
            raise GremlinUnsupported("as_() supports vertex frontiers")
        col = f"__as_{name}"
        if col in self._carry:
            raise ValueError(f"step label {name!r} already used")
        out = {}
        for lbl, (ds, full) in self._state.items():
            bag = ds.select_columns(["oid"]) if full else ds

            def _mark(t: pa.Table, _c=col) -> pa.Table:
                if t.num_rows == 0 or "oid" not in t.column_names:
                    return t.append_column(_c, pa.array([], pa.int64()))
                return t.append_column(_c, t["oid"])

            out[lbl] = (bag.map_batches(_mark, batch_format="pyarrow"), False)
        return self._derive(_VERTEX, out, carry=self._carry + (col,))

    def select(self, *names: str) -> pd.DataFrame:
        """Project the positions saved by ``as_`` (the GIE select step's
        data plane): one row per traverser, columns = the selected labels'
        element ids (exactly the join tuples of the hops between the
        ``as_`` marks).  Sorted for deterministic comparison."""
        if not names:
            raise GremlinUnsupported("select() needs at least one step label")
        cols = [f"__as_{n}" for n in names]
        missing = [n for n, c in zip(names, cols) if c not in self._carry]
        if missing:
            raise ValueError(f"select({missing[0]!r}): no as_({missing[0]!r}) upstream")
        if self._kind != _VERTEX:
            raise GremlinUnsupported("select() supports vertex frontiers")
        frames = []
        for _, bag in self._vertex_bags().items():
            df = bag.to_pandas()
            frames.append(
                df[cols].rename(columns=dict(zip(cols, names)))
            )
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=list(names))
        )
        return out.sort_values(list(names)).reset_index(drop=True)

    def path(self) -> pd.DataFrame:
        """Per-traverser position history of a LINEAR traversal (round 5 —
        the data-plane slice of GIE path tracking): rows
        (v_label, p0, .., p{k-1}, pk) where p0..p{k-1} are the positions
        before each hop (the ``__p*`` carry columns) and pk the current
        element; every bag in one frontier shares the same hop count, so
        the schema is rectangular.  Requires path tracking enabled at the
        source: ``traversal(pg).withPath().V()...`` — enabling it lazily
        at the terminal would need replaying the chain (GIE territory).
        Sorted for deterministic comparison."""
        if self._pathlen is None:
            raise GremlinUnsupported(
                "path() needs path tracking on from the source: "
                "traversal(pg).withPath().V()..."
            )
        if self._kind != _VERTEX:
            raise GremlinUnsupported("path() supports vertex frontiers")
        k = self._pathlen
        cols = [f"p{i}" for i in range(k)] + [f"p{k}"]
        frames = []
        for lbl, bag in self._vertex_bags().items():
            df = bag.to_pandas()
            ren = {f"__p{i}": f"p{i}" for i in range(k)}
            ren["oid"] = f"p{k}"
            df = df.rename(columns=ren)
            df.insert(0, "v_label", lbl)
            frames.append(df[["v_label"] + cols])
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=["v_label"] + cols)
        )
        return out.sort_values(["v_label"] + cols).reset_index(drop=True)




def _apply_sub(sub, trav: "Traversal"):
    """Replay an anonymous sub-traversal (or call a plain callable) against
    a concrete frontier."""
    if isinstance(sub, AnonymousTraversal):
        return sub.apply(trav)
    if callable(sub):
        return sub(trav)
    raise GremlinUnsupported(f"cannot apply {type(sub).__name__} as a sub-traversal")


def _merge_frontiers(travs: list["Traversal"]) -> "Traversal":
    """Per-label bag union of same-kind frontiers (multiplicities add)."""
    base, kind = travs[0], travs[0]._kind
    if kind == _VALUE:
        ds = travs[0]._state
        for t in travs[1:]:
            ds = ds.union(t._state)
        return base._derive(_VALUE, ds)
    out: dict[str, ray.data.Dataset] = {}
    for t in travs:
        if kind == _VERTEX:
            for lbl, bag in t._vertex_bags().items():
                out[lbl] = out[lbl].union(bag) if lbl in out else bag
        else:
            for lbl, ds in t._state.items():
                out[lbl] = out[lbl].union(ds) if lbl in out else ds
    if kind == _VERTEX:
        return base._derive(_VERTEX, {l: (d, False) for l, d in out.items()})
    return base._derive(_EDGE, out)


class Order:
    """gremlin-python's Order tokens."""

    asc = "asc"
    desc = "desc"
    incr = "asc"
    decr = "desc"


class _RepeatBuilder:
    """``repeat(sub)`` pending its ``times(k)`` terminator."""

    def __init__(self, trav: Traversal, sub):
        self._t, self._sub, self._emit = trav, sub, False

    def emit(self) -> "_RepeatBuilder":
        self._emit = True
        return self

    def until(self, *_):
        raise GremlinUnsupported(
            "unbounded repeat().until() needs a dataflow fixpoint; use times(k)"
        )

    def times(self, k: int) -> Traversal:
        if k < 0:
            raise ValueError("times(k) needs k >= 0")
        cur = self._t
        emitted: list[Traversal] = []
        for _ in range(int(k)):
            nxt = _apply_sub(self._sub, cur)
            if not isinstance(nxt, Traversal):
                raise GremlinUnsupported("repeat() body must keep a frontier")
            if nxt._kind != cur._kind:
                raise GremlinUnsupported(
                    "repeat() body must preserve the frontier kind "
                    f"({cur._kind} -> {nxt._kind})"
                )
            cur = nxt
            if self._emit:
                emitted.append(cur)
        if not self._emit:
            return cur
        return _merge_frontiers(emitted) if emitted else cur


class _OrderBuilder:
    """``order()`` pending ``by(key[, Order])`` and a slice.  The sort is a
    Ray range-partition sort of the unified (key, v_label, oid) bag; the
    slice uses ``split_at_indices`` (order-preserving, distributed)."""

    def __init__(self, trav: Traversal):
        self._t = trav
        self._key: str | None = None
        self._desc = False

    def by(self, key: str, order: str = "asc") -> "_OrderBuilder":
        self._key = key
        self._desc = order in ("desc", "decr", Order.desc)
        return self

    def limit(self, n: int) -> Traversal:
        return self.range(0, n)

    def range_(self, lo: int, hi: int) -> Traversal:
        return self.range(lo, hi)

    def _sorted_value(self) -> ray.data.Dataset:
        return self._t._state.sort("value", descending=self._desc)

    def _sorted_vertex(self) -> ray.data.Dataset:
        t, key = self._t, self._key
        if key is None:
            raise GremlinUnsupported("order() on a vertex frontier needs .by(property)")
        parts = []
        for lbl, (ds, full) in t._state.items():
            v = t._pg._v[lbl]
            if key != "oid" and key not in v.properties:
                raise ValueError(f"order().by({key!r}): label {lbl!r} lacks the property")
            if full:
                part = ds.select_columns(["oid", key] if key != "oid" else ["oid"])
            elif key == "oid":
                part = ds.select_columns(["oid"])
            else:
                prop = _rename(v.ds.select_columns(["oid", key]), {"oid": "__k"})
                part = hash_join(ds, prop, "oid", "__k", num_partitions=t._K)
                part = part.select_columns(["oid", key])

            def _tag(tb: pa.Table, _lbl=lbl, _key=key) -> pa.Table:
                if tb.num_rows == 0 or "oid" not in tb.column_names:
                    return pa.table(
                        {
                            "v_label": pa.array([], pa.string()),
                            "oid": pa.array([], pa.int64()),
                            "__key": pa.array([], pa.int64()),
                        }
                    )
                return pa.table(
                    {
                        "v_label": pa.array([_lbl] * tb.num_rows, pa.string()),
                        "oid": tb["oid"],
                        "__key": tb["oid"] if _key == "oid" else tb[_key],
                    }
                )

            parts.append(part.map_batches(_tag, batch_format="pyarrow"))
        if not parts:
            raise ValueError("order() on an empty frontier")
        u = parts[0]
        for p in parts[1:]:
            u = u.union(p)
        return u.sort(["__key", "v_label", "oid"], descending=[self._desc, False, False])

    def range(self, lo: int, hi: int) -> Traversal:
        """[lo, hi) slice in the by()-order (hi=-1 → to the end); ties
        broken by (v_label, oid) so the selected SET is deterministic."""
        t = self._t
        if lo < 0 or (hi != -1 and hi < lo):
            raise ValueError(f"range({lo}, {hi})")
        if t._kind == _VALUE:
            s = self._sorted_value()
            if hi != -1:
                s = s.limit(hi)
            if lo > 0:
                s = s.split_at_indices([lo])[1]
            return t._derive(_VALUE, s)
        if t._kind != _VERTEX:
            raise GremlinUnsupported("order() supports vertex/value frontiers")
        s = self._sorted_vertex()
        if hi != -1:
            s = s.limit(hi)
        if lo > 0:
            s = s.split_at_indices([lo])[1]
        out = {}
        for lbl in t._state:
            bag = _filter_ds(s, "v_label", P.eq(lbl)).select_columns(["oid"])
            out[lbl] = (bag, False)
        return t._derive(_VERTEX, out)


class AnonymousTraversal:
    """gremlin-python's ``__``: an unanchored step list.  Each step call
    returns a NEW recorder (immutable, like Traversal); ``apply`` replays
    the steps against a concrete frontier — builder steps (``times``,
    ``emit``, ``by``, ``range``, ``limit``) replay equally because apply
    just chains attribute calls on whatever the previous step returned."""

    _STEPS = (
        "hasLabel", "has", "hasId", "out", "in_", "both", "outE", "inE",
        "bothE", "outV", "inV", "bothV", "dedup", "limit", "values",
        "where", "union", "repeat", "order", "range", "by", "times", "emit",
        "sum_", "mean_", "max_", "min_", "as_", "select", "path", "coin",
    )

    def __init__(self, steps: tuple = ()):
        self._steps = steps

    def _add(self, name, args, kwargs):
        return AnonymousTraversal(self._steps + ((name, args, kwargs),))

    def apply(self, trav):
        cur = trav
        for name, args, kwargs in self._steps:
            cur = getattr(cur, name)(*args, **kwargs)
        return cur


def _anon_step(name):
    def _f(self, *args, **kwargs):
        return self._add(name, args, kwargs)

    _f.__name__ = name
    return _f


for _n in AnonymousTraversal._STEPS:
    setattr(AnonymousTraversal, _n, _anon_step(_n))

#: the anonymous-traversal entry point (``from ... import __`` mirrors
#: ``from gremlin_python.process.graph_traversal import __``)
__ = AnonymousTraversal()


class GraphTraversalSource:
    """``g`` — entry point mirroring gremlin-python's source object."""

    def __init__(self, pg: PropertyGraph, num_partitions: int = 8):
        self._pg = pg
        self._K = num_partitions

    def V(self, *ids) -> Traversal:
        return Traversal.V(self._pg, *ids, num_partitions=self._K,
                           path=getattr(self, "_path", False))

    def E(self) -> Traversal:
        return Traversal.E(self._pg, num_partitions=self._K)

    def withPath(self) -> "GraphTraversalSource":
        """Enable linear path tracking for traversals from this source
        (``...V()....path()`` then returns the position-history table)."""
        src = GraphTraversalSource(self._pg, self._K)
        src._path = True
        return src


def traversal(pg: PropertyGraph, num_partitions: int = 8) -> GraphTraversalSource:
    return GraphTraversalSource(pg, num_partitions)


def run_gremlin(pg: PropertyGraph, script: str, num_partitions: int = 8):
    """Evaluate a Gremlin-Python-style traversal STRING against ``pg`` —
    the ``gremlin_to_subgraph(graph, gremlin_script=...)`` string surface.
    ``.in(`` (a Python keyword) is rewritten to ``.in_(`` like
    gremlin-python does.  The namespace exposes ``g``, ``P``, ``Order``
    and the anonymous-traversal ``__``."""
    src = script.strip().replace(".in(", ".in_(")
    if not src.startswith("g."):
        raise ValueError("gremlin script must start with 'g.'")
    return eval(  # noqa: S307 — restricted namespace, test/CLI surface
        src,
        {"__builtins__": {}},
        {"g": traversal(pg, num_partitions), "P": P, "Order": Order,
         "__": AnonymousTraversal()},
    )


def _drop(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    def _d(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in cols if c in t.column_names])

    return ds.map_batches(_d, batch_format="pyarrow")
