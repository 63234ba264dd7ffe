"""First-class multi-label property graph.

The reference's core data model: per-label vertex/edge tables with schema
objects (``python/graphscope/framework/graph_schema.py:249-480``), built
incrementally with ``add_vertices`` / ``add_edges``
(``python/graphscope/framework/graph.py:477-612``), transformed by
``project`` (``graph.py:816-869``), ``consolidate_columns``
(``graph.py:715-762``, vineyard same-type column merge) and ``add_column``
(``graph.py:772-814``), and consumed by analytical apps either per-label
(``analytical_engine/apps/property/wcc_property.h`` iterates the per-label
vertex ranges of ONE fragment) or after projecting to a simple graph
(``core/grape_instance.cc:275-313`` projectToSimple).

Ray-Data-native design (NOT a port): each (kind, label) is a lazy
``ray.data.Dataset`` — vertex tables keyed by an ``oid`` column, edge
tables by ``src_oid``/``dst_oid`` plus endpoint label names.  Schema is
read off the Arrow schemas.  ``project`` / ``consolidate_columns`` /
``add_column`` are column ops on the label datasets (select_columns /
map_batches / hash_join) and stay lazy; nothing materializes until an
algorithm needs fragments:

- ``project_to_simple(v_label, e_label, e_prop)`` — single-label graphs
  (the edge label must relate the vertex label to itself) lower onto the
  existing simple-fragment engine via ``build_graph_from_oids`` with the
  label's WHOLE vertex table as the universe (isolated vertices kept).
- ``flatten(encode=...)`` — the multi-label union graph the reference's
  property apps run on: every label gets a contiguous vid block; edges are
  encoded into the union space; returns the simple Graph plus a
  ``FlattenInfo`` that maps vids back to (v_label, v_key).
  ``encode="dense"`` (int oids): vid = oid + label base, base = Σ earlier
  labels' (max_oid + 1) — per-label key spaces taken as dense ranges, so
  absent keys are isolated vertices exactly like the reference's dense
  per-label vertex maps.  ``encode="rank"``: vid = label base + rank of
  oid within the label (any oid type); ranks come from the same
  broadcast-searchsorted / distributed-join dispatch as the simple build.

At 100-TB scale every per-label table is a streamed Dataset; the only
driver-resident state is the schema and the per-label bases (ints).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _to_dataset(obj) -> ray.data.Dataset:
    if isinstance(obj, ray.data.Dataset):
        return obj
    if isinstance(obj, pa.Table):
        return ray.data.from_arrow(obj)
    if isinstance(obj, pd.DataFrame):
        # arrow blocks, not pandas blocks: every downstream op here is
        # pyarrow-format map_batches / rename_columns
        return ray.data.from_arrow(
            pa.Table.from_pandas(obj, preserve_index=False).replace_schema_metadata(None)
        )
    raise TypeError(f"unsupported table input: {type(obj)}")


def _rename(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    """rename via a pyarrow map_batches — unlike Dataset.rename_columns this
    also coerces pandas-backed blocks (map_groups output) to arrow."""

    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(_r, batch_format="pyarrow")


def _resolve_field(names: list[str], f) -> str:
    if isinstance(f, int):
        return names[f]
    if f not in names:
        raise ValueError(f"field {f!r} not in columns {names}")
    return f


@dataclass(frozen=True)
class VertexLabel:
    label: str
    ds: ray.data.Dataset  # columns: oid + properties
    properties: tuple[str, ...]


@dataclass(frozen=True)
class EdgeLabel:
    label: str
    ds: ray.data.Dataset  # columns: src_oid, dst_oid + properties
    src_label: str
    dst_label: str
    properties: tuple[str, ...]


class PropertySchema:
    """Readable schema of a PropertyGraph (ref GraphSchema: labels, typed
    properties, edge relationships)."""

    def __init__(self, graph: "PropertyGraph"):
        self.vertex_labels = list(graph._v)
        self.edge_labels = list(graph._e)
        self.edge_relationships = {
            e.label: (e.src_label, e.dst_label) for e in graph._e.values()
        }
        self._vprops = {
            v.label: self._typed(v.ds, v.properties) for v in graph._v.values()
        }
        self._eprops = {
            e.label: self._typed(e.ds, e.properties) for e in graph._e.values()
        }

    @staticmethod
    def _typed(ds: ray.data.Dataset, props: tuple[str, ...]) -> list[tuple[str, str]]:
        sch = ds.schema()
        types = dict(zip(sch.names, [str(t) for t in sch.types]))
        return [(p, types.get(p, "?")) for p in props]

    def get_vertex_properties(self, label: str) -> list[tuple[str, str]]:
        return list(self._vprops[label])

    def get_edge_properties(self, label: str) -> list[tuple[str, str]]:
        return list(self._eprops[label])

    def to_dataframe(self) -> pd.DataFrame:
        """Flat (kind, label, property, dtype) view — exportable/testable."""
        rows = []
        for lbl in self.vertex_labels:
            rows.append(("VERTEX", lbl, "__oid__", ""))
            rows += [("VERTEX", lbl, p, t) for p, t in self._vprops[lbl]]
        for lbl in self.edge_labels:
            s, d = self.edge_relationships[lbl]
            rows.append(("EDGE", lbl, f"__rel__{s}->{d}", ""))
            rows += [("EDGE", lbl, p, t) for p, t in self._eprops[lbl]]
        return pd.DataFrame(rows, columns=["kind", "label", "property", "dtype"])

    def __repr__(self) -> str:  # mirrors the reference's schema print shape
        lines = []
        for lbl in self.vertex_labels:
            props = ", ".join(f"{p}: {t}" for p, t in self._vprops[lbl])
            lines.append(f"VERTEX {lbl} ({props})")
        for lbl in self.edge_labels:
            s, d = self.edge_relationships[lbl]
            props = ", ".join(f"{p}: {t}" for p, t in self._eprops[lbl])
            lines.append(f"EDGE {lbl} [{s} -> {d}] ({props})")
        return "\n".join(lines)


@dataclass
class FlattenInfo:
    """vid-block layout of a flattened union graph: label ℓ owns vids
    [bases[ℓ], bases[ℓ] + sizes[ℓ]).  ``split`` is the driver-side inverse
    (arithmetic — O(rows), no lookup table) for dense mode; rank mode also
    carries the per-label (oid, vid) mapping datasets."""

    labels: list[str]
    bases: dict[str, int]
    sizes: dict[str, int]
    encode: str
    vmaps: dict[str, ray.data.Dataset] = field(default_factory=dict)

    def split(self, df: pd.DataFrame, vid_col: str = "vid") -> pd.DataFrame:
        """Annotate rows with (v_label, v_key) recovered from the vid."""
        vids = df[vid_col].to_numpy()
        starts = np.array([self.bases[l] for l in self.labels], dtype=np.int64)
        idx = np.searchsorted(starts, vids, side="right") - 1
        labels = np.array(self.labels, dtype=object)[idx]
        if self.encode == "dense":
            keys = vids - starts[idx]
        else:
            # rank mode: translate vid → oid through the per-label maps
            keys = np.empty(len(vids), dtype=object)
            for li, lbl in enumerate(self.labels):
                m = (idx == li)
                if not m.any():
                    continue
                vm = self.vmaps[lbl].to_pandas().set_index("vid")["oid"]
                keys[m] = vm.loc[df[vid_col].to_numpy()[m]].to_numpy()
        out = df.copy()
        out.insert(0, "v_label", labels)
        out.insert(1, "v_key", keys)
        return out

    def vmap_ds(self) -> ray.data.Dataset:
        """(v_label, oid, vid) union mapping — rank mode only."""
        parts = []
        for lbl in self.labels:
            vm = self.vmaps[lbl]
            parts.append(
                vm.map_batches(
                    lambda t, _l=lbl: t.append_column(
                        "v_label", pa.array([_l] * t.num_rows, pa.string())
                    ),
                    batch_format="pyarrow",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out


class PropertyGraph:
    """Immutable multi-label property graph; every mutator returns a new
    graph sharing unchanged label datasets (the reference's GraphDAGNode
    chain has the same copy-on-write shape)."""

    def __init__(self, directed: bool = True):
        self.directed = directed
        self._v: dict[str, VertexLabel] = {}
        self._e: dict[str, EdgeLabel] = {}

    def _copy(self) -> "PropertyGraph":
        g = PropertyGraph(self.directed)
        g._v = dict(self._v)
        g._e = dict(self._e)
        return g

    # ---- construction (ref graph.py:477-612) -----------------------------

    def add_vertices(
        self, vertices, label: str = "_", properties: list[str] | None = None,
        vid_field: int | str = 0,
    ) -> "PropertyGraph":
        ds = _to_dataset(vertices)
        names = ds.schema().names
        vid_col = _resolve_field(names, vid_field)
        props = (
            list(properties)
            if properties is not None
            else [c for c in names if c != vid_col]
        )
        ds = ds.select_columns([vid_col] + props)
        if vid_col != "oid":
            ds = _rename(ds, {vid_col: "oid"})
        new = self._copy()
        if label in new._v:  # reference: extends existing label data (warns)
            prev = new._v[label]
            if tuple(props) != prev.properties:
                raise ValueError(
                    f"extending vertex label {label!r} needs identical properties"
                )
            ds = prev.ds.union(ds)
        new._v[label] = VertexLabel(label, ds, tuple(props))
        return new

    def add_edges(
        self, edges, label: str = "_e", properties: list[str] | None = None,
        src_label: str | None = None, dst_label: str | None = None,
        src_field: int | str = 0, dst_field: int | str = 1,
    ) -> "PropertyGraph":
        if src_label is None or dst_label is None:
            if len(self._v) == 1:  # reference infers the sole label
                only = next(iter(self._v))
                src_label = src_label or only
                dst_label = dst_label or only
            else:
                raise ValueError("src_label/dst_label required with several vertex labels")
        for vl in (src_label, dst_label):
            if vl not in self._v:
                raise ValueError(f"unknown vertex label {vl!r}")
        ds = _to_dataset(edges)
        names = ds.schema().names
        src_col = _resolve_field(names, src_field)
        dst_col = _resolve_field(names, dst_field)
        props = (
            list(properties)
            if properties is not None
            else [c for c in names if c not in (src_col, dst_col)]
        )
        ds = ds.select_columns([src_col, dst_col] + props)
        ren = {}
        if src_col != "src_oid":
            ren[src_col] = "src_oid"
        if dst_col != "dst_oid":
            ren[dst_col] = "dst_oid"
        if ren:
            ds = _rename(ds, ren)
        new = self._copy()
        if label in new._e:
            prev = new._e[label]
            if (prev.src_label, prev.dst_label) != (src_label, dst_label) or tuple(
                props
            ) != prev.properties:
                raise ValueError(f"extending edge label {label!r} needs identical shape")
            ds = prev.ds.union(ds)
        new._e[label] = EdgeLabel(label, ds, src_label, dst_label, tuple(props))
        return new

    # ---- schema -----------------------------------------------------------

    @property
    def schema(self) -> PropertySchema:
        return PropertySchema(self)

    def vertex_table(self, label: str) -> ray.data.Dataset:
        return self._v[label].ds

    def edge_table(self, label: str) -> ray.data.Dataset:
        return self._e[label].ds

    # ---- transforms -------------------------------------------------------

    def project(
        self,
        vertices: Mapping[str, list[str] | None],
        edges: Mapping[str, list[str] | None],
    ) -> "PropertyGraph":
        """PROJECT_GRAPH (ref graph.py:816-869): keep only the listed labels,
        restricted to the listed properties (None = all); the result is again
        a property graph and can be projected further."""
        if isinstance(vertices, (list, set)) or isinstance(edges, (list, set)):
            raise ValueError("project takes {label: [property, ...]} dicts, not lists")
        new = PropertyGraph(self.directed)
        for lbl, props in vertices.items():
            v = self._v[lbl]
            keep = list(v.properties) if props is None else list(props)
            missing = set(keep) - set(v.properties)
            if missing:
                raise ValueError(f"vertex label {lbl!r} has no properties {sorted(missing)}")
            new._v[lbl] = VertexLabel(lbl, v.ds.select_columns(["oid"] + keep), tuple(keep))
        for lbl, props in edges.items():
            e = self._e[lbl]
            if e.src_label not in new._v or e.dst_label not in new._v:
                raise ValueError(
                    f"edge label {lbl!r} relates {e.src_label}->{e.dst_label}; "
                    "both vertex labels must be projected too"
                )
            keep = list(e.properties) if props is None else list(props)
            missing = set(keep) - set(e.properties)
            if missing:
                raise ValueError(f"edge label {lbl!r} has no properties {sorted(missing)}")
            new._e[lbl] = EdgeLabel(
                lbl,
                e.ds.select_columns(["src_oid", "dst_oid"] + keep),
                e.src_label,
                e.dst_label,
                tuple(keep),
            )
        return new

    def consolidate_columns(
        self, label: str, columns: list[str], result_column: str
    ) -> "PropertyGraph":
        """CONSOLIDATE_COLUMNS (ref graph.py:715-762 → vineyard same-type
        column merge, fragment_wrapper.h): replace N same-type property
        columns with ONE list-valued column holding their values in order."""
        kind, entry = self._find(label)
        for c in columns:
            if c not in entry.properties:
                raise ValueError(f"{label!r} has no property {c!r}")

        def _merge(t: pa.Table) -> pa.Table:
            arrs = [t[c] for c in columns]
            fixed = pa.FixedSizeListArray.from_arrays(
                pa.concat_arrays(
                    [a.combine_chunks() for a in _interleave(arrs)]
                ),
                len(columns),
            )
            t = t.drop_columns(list(columns))
            return t.append_column(result_column, fixed)

        def _interleave(arrs):
            # row-major interleave: [a0,b0,a1,b1,...] for FixedSizeList rows
            n = len(arrs[0])
            cols = [a.combine_chunks() for a in arrs]
            out = []
            for i in range(n):
                for c in cols:
                    out.append(c.slice(i, 1))
            return out

        # vectorized path for numeric columns (the common case): numpy
        # column-stack instead of the per-row slice loop above
        def _merge_fast(t: pa.Table) -> pa.Table:
            try:
                mats = [t[c].to_numpy(zero_copy_only=False) for c in columns]
                stacked = np.column_stack(mats).reshape(-1)
                fixed = pa.FixedSizeListArray.from_arrays(pa.array(stacked), len(columns))
            except (pa.ArrowInvalid, TypeError, ValueError):
                return _merge(t)
            t = t.drop_columns(list(columns))
            return t.append_column(result_column, fixed)

        new_ds = entry.ds.map_batches(_merge_fast, batch_format="pyarrow")
        props = tuple(p for p in entry.properties if p not in columns) + (result_column,)
        return self._replace(kind, label, new_ds, props)

    def add_column(
        self, label: str, results, key: str = "oid", columns: list[str] | None = None
    ) -> "PropertyGraph":
        """ADD_COLUMN (ref graph.py:772-814): attach app-result columns to a
        vertex/edge label's table.  ``results`` is any oid-keyed Dataset /
        DataFrame (e.g. an algorithm output joined back to oid space); the
        attach is a distributed hash join — rows without a result get null."""
        from graphscope_ray.utils import hash_join

        kind, entry = self._find(label)
        res = _to_dataset(results)
        names = res.schema().names
        if key not in names:
            raise ValueError(f"results have no key column {key!r}")
        cols = [c for c in names if c != key] if columns is None else list(columns)
        res = res.select_columns([key] + cols)
        if key != "__ac_key":
            res = _rename(res, {key: "__ac_key"})
        join_on = "oid" if kind == "v" else "src_oid"
        out = hash_join(entry.ds, res, join_on, "__ac_key", how="left")
        out = out.map_batches(
            lambda t: t.drop_columns([c for c in ("__ac_key",) if c in t.column_names]),
            batch_format="pyarrow",
        )
        return self._replace(kind, label, out, entry.properties + tuple(cols))

    def update_column(
        self, label: str, results, key: str = "oid", column: str | None = None
    ) -> "PropertyGraph":
        """MODIFY in-place property update: overwrite ``column`` for rows
        matched by ``results`` (a (key, column) Dataset/DataFrame), keep the
        old value elsewhere — the coalesce twin of :meth:`add_column` (which
        ATTACHES a new column; ref graph.py:772-814's app-result writeback
        covers both shapes)."""
        from graphscope_ray.utils import hash_join

        kind, entry = self._find(label)
        res = _to_dataset(results)
        names = res.schema().names
        if key not in names:
            raise ValueError(f"results have no key column {key!r}")
        if column is None:
            others = [c for c in names if c != key]
            if len(others) != 1:
                raise ValueError("pass column= when results carry several columns")
            column = others[0]
        if column not in entry.properties:
            raise ValueError(f"label {label!r} has no property {column!r}")
        res = res.select_columns([key, column])
        res = _rename(res, {key: "__uc_key", column: "__uc_new"})
        join_on = "oid" if kind == "v" else "src_oid"
        out = hash_join(entry.ds, res, join_on, "__uc_key", how="left")

        def _coalesce(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or column not in t.column_names:
                return t
            if "__uc_new" in t.column_names:
                # pandas-backed left join marks unmatched rows NaN (not
                # Arrow null) and upcasts ints to float — go through numpy
                # so NaN means "keep old" and the dtype round-trips
                old = t[column]
                oldnp = old.to_numpy(zero_copy_only=False)
                newnp = t["__uc_new"].to_numpy(zero_copy_only=False)
                mask = pd.isna(newnp)
                merged = np.where(mask, oldnp, newnp)
                if np.issubdtype(oldnp.dtype, np.number) and merged.dtype != oldnp.dtype:
                    merged = merged.astype(oldnp.dtype)
                t = t.set_column(
                    t.schema.get_field_index(column), column,
                    pa.array(merged, type=old.type),
                )
            return t.drop_columns(
                [c for c in ("__uc_key", "__uc_new") if c in t.column_names]
            )

        out = out.map_batches(_coalesce, batch_format="pyarrow")
        return self._replace(kind, label, out, entry.properties)

    def remove_vertices(
        self, label: str, ids=None, where=None, cascade: bool = True
    ) -> "PropertyGraph":
        """MODIFY_VERTICES delete with referential re-route — the
        first-class mutation rebuild (ref grape_instance.cc:91-177's
        add/modify rebuild path and dag_utils.py:114-231 MODIFY ops; the
        reference rebuilds the ArrowFragment from the mutated tables, we
        rebuild the lazy label plan).  Select victims by explicit ``ids``
        (small-side, broadcast into a vectorized ``is_in`` filter) or by
        ``where`` (a callable ``pa.Table -> BooleanArray`` marking rows to
        REMOVE — evaluated distributed, nothing driver-side).  With
        ``cascade`` (default), every edge label incident to this vertex
        label is re-routed through a distributed semi-join so surviving
        edges reference surviving vertices only — the graph never holds a
        dangling endpoint."""
        from graphscope_ray.utils import hash_join

        if label not in self._v:
            raise ValueError(f"unknown vertex label {label!r}")
        if (ids is None) == (where is None):
            raise ValueError("remove_vertices needs exactly one of ids / where")
        v = self._v[label]
        if ids is not None:
            victim = pa.array(list(ids), pa.int64())

            def _keep(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "oid" not in t.column_names:
                    return t
                return t.filter(pc.invert(pc.is_in(t["oid"], value_set=victim)))

        else:

            def _keep(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "oid" not in t.column_names:
                    return t
                mask = where(t)
                return t.filter(pc.invert(pc.fill_null(mask, False)))

        surviving = v.ds.map_batches(_keep, batch_format="pyarrow")
        new = self._copy()
        new._v[label] = VertexLabel(label, surviving, v.properties)
        if not cascade:
            return new
        keys = _rename(surviving.select_columns(["oid"]), {"oid": "__surv"})
        for elbl, e in list(new._e.items()):
            eds = e.ds
            touched = False
            for side, vlbl in (("src_oid", e.src_label), ("dst_oid", e.dst_label)):
                if vlbl != label:
                    continue
                # oid is unique per vertex table, so the inner semi-join
                # preserves each surviving edge row exactly once
                eds = hash_join(eds, keys, side, "__surv")
                eds = eds.map_batches(
                    lambda t: t.drop_columns(
                        [c for c in ("__surv",) if c in t.column_names]
                    ),
                    batch_format="pyarrow",
                )
                touched = True
            if touched:
                new._e[elbl] = EdgeLabel(
                    elbl, eds, e.src_label, e.dst_label, e.properties
                )
        return new

    def remove_edges(self, label: str, where) -> "PropertyGraph":
        """MODIFY_EDGES delete: drop edge rows matched by ``where`` (a
        callable ``pa.Table -> BooleanArray`` of rows to REMOVE, evaluated
        distributed).  Vertices are untouched (isolated vertices are legal,
        as in the reference)."""
        if label not in self._e:
            raise ValueError(f"unknown edge label {label!r}")
        e = self._e[label]

        def _keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "src_oid" not in t.column_names:
                return t
            return t.filter(pc.invert(pc.fill_null(where(t), False)))

        new = self._copy()
        new._e[label] = EdgeLabel(
            label,
            e.ds.map_batches(_keep, batch_format="pyarrow"),
            e.src_label,
            e.dst_label,
            e.properties,
        )
        return new

    def _find(self, label: str):
        if label in self._v:
            return "v", self._v[label]
        if label in self._e:
            return "e", self._e[label]
        raise ValueError(f"unknown label {label!r}")

    def _replace(self, kind: str, label: str, ds, props) -> "PropertyGraph":
        new = self._copy()
        if kind == "v":
            new._v[label] = VertexLabel(label, ds, tuple(props))
        else:
            e = new._e[label]
            new._e[label] = EdgeLabel(label, ds, e.src_label, e.dst_label, tuple(props))
        return new

    # ---- lowering to the simple-fragment engine ---------------------------

    def project_to_simple(
        self,
        v_label: str | None = None,
        e_label: str | None = None,
        e_prop: str | None = None,
        **build_kwargs,
    ):
        """PROJECT_TO_SIMPLE (ref grape_instance.cc:275-313): a graph with
        exactly one vertex label and one self-relating edge label lowers to
        the simple-fragment engine.  The vertex universe is the label's WHOLE
        vertex table (isolated vertices kept); ``e_prop`` selects the edge
        property used as weight.  Returns the simple ``Graph`` (its
        ``vertices_ds`` maps oid ↔ vid)."""
        from graphscope_ray.graph.build import build_graph_from_oids

        if v_label is None:
            if len(self._v) != 1:
                raise ValueError("project_to_simple needs exactly one vertex label; project() first")
            v_label = next(iter(self._v))
        if e_label is None:
            if len(self._e) != 1:
                raise ValueError("project_to_simple needs exactly one edge label; project() first")
            e_label = next(iter(self._e))
        e = self._e[e_label]
        if e.src_label != v_label or e.dst_label != v_label:
            raise ValueError(
                f"edge label {e_label!r} relates {e.src_label}->{e.dst_label}, "
                f"not {v_label}->{v_label}; flatten() runs multi-label apps"
            )
        cols = ["src_oid", "dst_oid"] + ([e_prop] if e_prop else [])
        eds = e.ds.select_columns(cols)
        if e_prop:
            eds = eds.rename_columns({e_prop: "weight"})
            build_kwargs.setdefault("weight", True)
        return build_graph_from_oids(
            eds,
            vertices=self._v[v_label].ds.select_columns(["oid"]),
            **build_kwargs,
        )

    def flatten(
        self,
        encode: str = "dense",
        broadcast_limit: int = 20_000_000,
        **build_kwargs,
    ):
        """Union simple graph over ALL labels (the reference's property apps
        run on exactly this view: per-label vid ranges of one fragment,
        apps/property/wcc_property.h).  Returns (Graph, FlattenInfo)."""
        from graphscope_ray.graph.build import build_graph
        from graphscope_ray.utils import zip_with_index

        labels = list(self._v)
        bases: dict[str, int] = {}
        sizes: dict[str, int] = {}
        vmaps: dict[str, ray.data.Dataset] = {}
        lookups: dict[str, object] = {}  # label -> np oid array (broadcast) or vmap ds
        base = 0
        for lbl in labels:
            vds = self._v[lbl].ds
            if encode == "dense":
                n = int(vds.max("oid")) + 1 if vds.count() else 0
            else:
                ids = vds.select_columns(["oid"])
                n = ids.count()
                if n <= broadcast_limit:
                    arr = np.sort(ids.to_pandas()["oid"].to_numpy())
                    if len(np.unique(arr)) != len(arr):
                        raise ValueError(f"vertex label {lbl!r} has duplicate oids")
                    lookups[lbl] = arr
                    vmaps[lbl] = ray.data.from_arrow(
                        pa.table(
                            {
                                "oid": pa.array(arr),
                                "vid": pa.array(np.arange(base, base + n, dtype=np.int64)),
                            }
                        )
                    )
                else:
                    vm = zip_with_index(ids, "oid", "vid").map_batches(
                        lambda t, _b=base: t.set_column(
                            t.schema.get_field_index("vid"),
                            "vid",
                            pa.array(t["vid"].to_numpy(zero_copy_only=False) + _b),
                        ),
                        batch_format="pyarrow",
                    ).materialize()
                    lookups[lbl] = vm
                    vmaps[lbl] = vm
            bases[lbl] = base
            sizes[lbl] = n
            base += n
        total = base

        # encode every edge label into the union vid space
        enc_parts = []
        for el in self._e.values():
            sb, db = bases[el.src_label], bases[el.dst_label]
            if encode == "dense":
                sn, dn = sizes[el.src_label], sizes[el.dst_label]

                def _enc(
                    t: pa.Table, _sb=sb, _db=db, _sn=sn, _dn=dn, _el=el
                ) -> pa.Table:
                    s = t["src_oid"].to_numpy(zero_copy_only=False).astype(np.int64)
                    d = t["dst_oid"].to_numpy(zero_copy_only=False).astype(np.int64)
                    # an out-of-range oid would silently land in ANOTHER
                    # label's vid block — reject it here instead
                    for arr, n, side, vl in (
                        (s, _sn, "src", _el.src_label),
                        (d, _dn, "dst", _el.dst_label),
                    ):
                        if arr.size and (arr.min() < 0 or arr.max() >= n):
                            bad = arr[(arr < 0) | (arr >= n)][0]
                            raise ValueError(
                                f"edge label {_el.label!r}: {side} oid {bad} is outside "
                                f"vertex label {vl!r}'s dense range [0, {n})"
                            )
                    return pa.table({"src": pa.array(s + _sb), "dst": pa.array(d + _db)})

                enc_parts.append(
                    el.ds.select_columns(["src_oid", "dst_oid"]).map_batches(
                        _enc, batch_format="pyarrow"
                    )
                )
            else:
                enc_parts.append(
                    _rank_encode_edges(
                        el.ds.select_columns(["src_oid", "dst_oid"]),
                        lookups[el.src_label],
                        lookups[el.dst_label],
                        bases[el.src_label],
                        bases[el.dst_label],
                    )
                )
        if not enc_parts:
            raise ValueError("flatten needs at least one edge label")
        eds = enc_parts[0]
        for p in enc_parts[1:]:
            eds = eds.union(p)
        g = build_graph(eds, num_vertices=total, **build_kwargs)
        info = FlattenInfo(labels=labels, bases=bases, sizes=sizes, encode=encode, vmaps=vmaps)
        return g, info


def _rank_encode_edges(eds, src_lookup, dst_lookup, src_base, dst_base):
    """Encode edge endpoints through per-label lookups: numpy searchsorted
    when the label's oid array was broadcastable, hash-join otherwise."""
    from graphscope_ray.utils import hash_join

    if isinstance(src_lookup, np.ndarray) and isinstance(dst_lookup, np.ndarray):
        sref = ray.put(src_lookup)
        dref = ray.put(dst_lookup)

        def _enc(t: pa.Table) -> pa.Table:
            sa, da = ray.get(sref), ray.get(dref)

            def _rank(arr, oids, side):
                if len(arr) == 0:
                    if oids.size:
                        raise ValueError(
                            f"{side} oid {oids[0]} not in its vertex label's oid set"
                        )
                    return np.empty(0, dtype=np.int64)
                pos = np.searchsorted(arr, oids)
                # searchsorted returns an INSERTION index for a missing oid,
                # which would silently mis-wire the edge — verify the hit
                pos_c = np.minimum(pos, len(arr) - 1)
                ok = arr[pos_c] == oids
                if not np.all(ok):
                    raise ValueError(
                        f"{side} oid {oids[~ok][0]} not in its vertex label's oid set"
                    )
                return pos

            s = _rank(sa, t["src_oid"].to_numpy(zero_copy_only=False), "src")
            d = _rank(da, t["dst_oid"].to_numpy(zero_copy_only=False), "dst")
            return pa.table(
                {
                    "src": pa.array(s.astype(np.int64) + src_base),
                    "dst": pa.array(d.astype(np.int64) + dst_base),
                }
            )

        return eds.map_batches(_enc, batch_format="pyarrow")

    # distributed path: two hash-join exchanges against the (oid, vid) maps
    def _as_map(lookup, base):
        if isinstance(lookup, np.ndarray):
            return ray.data.from_arrow(
                pa.table(
                    {
                        "oid": pa.array(lookup),
                        "vid": pa.array(np.arange(base, base + len(lookup), dtype=np.int64)),
                    }
                )
            )
        return lookup  # vids already offset by base at build time

    def _fix(rename_to, drop):
        def _f(t: pa.Table) -> pa.Table:
            t = t.drop_columns([c for c in drop if c in t.column_names])
            if "vid" in t.column_names:
                t = t.rename_columns(
                    [rename_to if c == "vid" else c for c in t.column_names]
                )
            return t

        return _f

    smap = _as_map(src_lookup, src_base)
    dmap = _as_map(dst_lookup, dst_base)
    e1 = hash_join(eds, smap, "src_oid", "oid")
    e1 = e1.map_batches(_fix("src", ["src_oid", "oid"]), batch_format="pyarrow")
    e2 = hash_join(e1, dmap, "dst_oid", "oid")
    e2 = e2.map_batches(_fix("dst", ["dst_oid", "oid"]), batch_format="pyarrow")
    return e2.select_columns(["src", "dst"])
