"""GraphAr-style open-format graph archive (ARCHIVE_GRAPH parity).

The reference can persist a property graph in the open GraphAr interchange
format (`python/graphscope/framework/dag_utils.py:1085-1114` save_to_graphar →
ARCHIVE_GRAPH op; the C++ writer lives behind vineyard).  `save_graph`'s own
layout is engine-private, so this module writes the graph in a layout any
external reader can consume, following the public GraphAr v1 conventions
(github.com/apache/incubator-graphar, "gar/v1"):

    {path}/{name}.graph.yml                     graph manifest
    {path}/{vlabel}.vertex.yml                  vertex schema manifest
    {path}/{elabel}.edge.yml                    edge schema manifest
    {path}/vertex/{vlabel}/vertex_count         N (plain text)
    {path}/vertex/{vlabel}/{group}/chunk{k}.parquet
        property chunks of exactly `vertex_chunk_size` rows (last partial);
        the vertex's internal id is POSITIONAL: id = k*chunk_size + row
    {path}/edge/{etriple}/ordered_by_source/edge_count{k}
    {path}/edge/{etriple}/ordered_by_source/adj_list/part{k}/chunk{j}.parquet
        edges with source vertex in vertex-chunk k, sorted by
        (_graphArSrcIndex, _graphArDstIndex), split into chunks of
        `edge_chunk_size` rows
    {path}/edge/{etriple}/ordered_by_source/offset/chunk{k}.parquet
        per-source-vertex cumulative edge counts (vertex_chunk_size+1 rows)
    {path}/edge/{etriple}/ordered_by_source/{group}/part{k}/chunk{j}.parquet
        edge property chunks, row-aligned with the adj_list chunks

Documented subset vs the full spec: single vertex label / single edge label,
parquet file_type only, YAML manifests restricted to flat keys + one level
of lists (parseable by the bundled mini-parser, and by any real YAML lib).
Both adjacency orientations are written by default: `ordered_by_source`
(push-side scans) and the `ordered_by_dest` mirror (sorted (dst, src) with
per-destination offsets — pull-side scans); `read_graphar_edges(order=...)`
reads either.

Everything is written and read distributed: the source-chunk exchange is one
split task per fragment edge block plus one write task per (vertex chunk,
edge chunk) — the same block-split hash-routing pattern as graph/build.py,
keyed by `src // vertex_chunk_size` (a RANGE key, which is what makes the
offset arrays computable per chunk without a global sort).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

SRC_COL = "_graphArSrcIndex"
DST_COL = "_graphArDstIndex"


# ---------------------------------------------------------------------------
# mini flat-YAML emit / parse (stdlib has no yaml; manifests stay spec-shaped)


def _yaml_dump(d: dict) -> str:
    lines = []
    for k, v in d.items():
        if isinstance(v, list):
            lines.append(f"{k}:")
            for item in v:
                if isinstance(item, dict):
                    first = True
                    for ik, iv in item.items():
                        prefix = "  - " if first else "    "
                        lines.append(f"{prefix}{ik}: {json.dumps(iv)}")
                        first = False
                else:
                    lines.append(f"  - {json.dumps(item)}")
        else:
            lines.append(f"{k}: {json.dumps(v)}")
    return "\n".join(lines) + "\n"


def _yaml_load(text: str) -> dict:
    out: dict = {}
    cur_list = None
    cur_item = None
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        if not raw.startswith(" "):  # top-level key
            k, _, v = raw.partition(":")
            v = v.strip()
            if v == "":
                cur_list = []
                out[k.strip()] = cur_list
                cur_item = None
            else:
                out[k.strip()] = json.loads(v)
                cur_list = None
        elif raw.lstrip().startswith("- ") or raw.startswith("  - "):
            body = raw.lstrip()[2:]
            if ":" in body:
                ik, _, iv = body.partition(":")
                cur_item = {ik.strip(): json.loads(iv.strip())}
                cur_list.append(cur_item)
            else:
                cur_list.append(json.loads(body))
                cur_item = None
        else:  # continuation of a dict list item
            ik, _, iv = raw.strip().partition(":")
            cur_item[ik.strip()] = json.loads(iv.strip())
    return out


def _write_text(path: str, text: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(text)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# writer


@ray.remote
def _split_by_key_chunk(t: pa.Table, vcs: int, n_chunks: int, key_col: str):
    """Range-split one fragment edge block by the aligned endpoint's chunk
    (key_col = 'src' for ordered_by_source, 'dst' for ordered_by_dest)."""
    if t.num_rows == 0:
        empty = t.slice(0, 0)
        return tuple(empty for _ in range(n_chunks)) if n_chunks > 1 else empty
    key = t[key_col].to_numpy(zero_copy_only=False) // vcs
    if key.max() >= n_chunks:
        # an understated vertex count would silently drop these edges from
        # the bincount slices below (ADVICE r3)
        raise ValueError(
            f"graphar: edge {key_col} {int(t[key_col][int(np.argmax(key))])} exceeds the "
            f"declared vertex count ({n_chunks} chunks × {vcs})"
        )
    order = np.argsort(key, kind="stable")
    st = t.take(order)
    counts = np.bincount(key, minlength=n_chunks)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    out = tuple(st.slice(int(bounds[k]), int(counts[k])) for k in range(n_chunks))
    return out if n_chunks > 1 else out[0]


_ORDER_DIR = {"src": "ordered_by_source", "dst": "ordered_by_dest"}


@ray.remote
def _write_adj_chunk(path: str, etriple: str, k: int, vcs: int, n_vert: int,
                     ecs: int, prop_cols: tuple, align: str, *parts) -> int:
    """One aligned-vertex-chunk of the adjacency: sort, chunk, offsets.
    align='src' → ordered_by_source (sorted (src, dst), offsets per source);
    align='dst' → ordered_by_dest mirror (sorted (dst, src), offsets per
    destination — the pull-side layout an external consumer scans)."""
    tabs = [p for p in parts if p.num_rows]
    base = os.path.join(path, "edge", etriple, _ORDER_DIR[align])
    t = pa.concat_tables(tabs) if tabs else parts[0]
    src_v = t["src"].to_numpy(zero_copy_only=False)
    dst_v = t["dst"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst_v, src_v)) if align == "src" else np.lexsort((src_v, dst_v))
    t = t.take(order)
    src = (src_v if align == "src" else dst_v)[order]
    m = t.num_rows
    adj_dir = os.path.join(base, "adj_list", f"part{k}")
    os.makedirs(adj_dir, exist_ok=True)
    prop_dirs = {}
    for g in prop_cols:
        prop_dirs[g] = os.path.join(base, g, f"part{k}")
        os.makedirs(prop_dirs[g], exist_ok=True)
    n_ec = max(1, -(-m // ecs))
    for j in range(n_ec):
        sl = t.slice(j * ecs, ecs)
        adj = pa.table({SRC_COL: sl["src"], DST_COL: sl["dst"]})
        pq.write_table(adj, os.path.join(adj_dir, f"chunk{j}.parquet"))
        for g in prop_cols:
            pq.write_table(
                pa.table({g: sl[g]}), os.path.join(prop_dirs[g], f"chunk{j}.parquet")
            )
    # offsets: cumulative edge count per ALIGNED vertex of this chunk
    lo = k * vcs
    n_in_chunk = min(vcs, n_vert - lo)
    deg = np.bincount(src - lo, minlength=n_in_chunk).astype(np.int64)
    off = np.concatenate([[0], np.cumsum(deg)])
    off_dir = os.path.join(base, "offset")
    os.makedirs(off_dir, exist_ok=True)
    pq.write_table(
        pa.table({"offset": pa.array(off)}), os.path.join(off_dir, f"chunk{k}.parquet")
    )
    _write_text(os.path.join(base, f"edge_count{k}"), str(m))
    return m


@ray.remote
def _split_vertices(t: pa.Table, vcs: int, n_chunks: int):
    key = t["vid"].to_numpy(zero_copy_only=False) // vcs
    order = np.argsort(key, kind="stable")
    st = t.take(order)
    counts = np.bincount(key, minlength=n_chunks)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    out = tuple(st.slice(int(bounds[k]), int(counts[k])) for k in range(n_chunks))
    return out if n_chunks > 1 else out[0]


@ray.remote
def _write_vertex_chunk(path: str, vlabel: str, group: str, k: int, vcs: int,
                        n_vert: int, cols: tuple, *parts) -> int:
    """Property chunk k: rows POSITIONAL by vid (vid = k*vcs + row)."""
    tabs = [p for p in parts if p.num_rows]
    t = pa.concat_tables(tabs) if tabs else parts[0]
    vid = t["vid"].to_numpy(zero_copy_only=False)
    t = t.take(np.argsort(vid, kind="stable"))
    lo = k * vcs
    n_in_chunk = min(vcs, n_vert - lo)
    if t.num_rows != n_in_chunk:
        raise ValueError(
            f"vertex chunk {k}: {t.num_rows} rows for {n_in_chunk} vids — "
            "the oid mapping must cover every vid exactly once"
        )
    gdir = os.path.join(path, "vertex", vlabel, group)
    os.makedirs(gdir, exist_ok=True)
    pq.write_table(t.select(list(cols)), os.path.join(gdir, f"chunk{k}.parquet"))
    return t.num_rows


_ARROW_TO_GAR = {"int64": "int64", "int32": "int32", "float": "float",
                 "double": "double", "string": "string", "large_string": "string",
                 "bool": "bool"}


def save_graphar(
    g,
    path: str,
    name: str = "graph",
    vertex_label: str = "vertex",
    edge_label: str = "links",
    vertex_chunk_size: int = 1 << 18,
    edge_chunk_size: int = 1 << 22,
    orders: tuple = ("src", "dst"),
) -> str:
    """Archive a loaded Graph in the GraphAr-style layout above.

    Ray-first: one range-split task per fragment edge block, one writer task
    per source-vertex chunk (each writes its adj/property/offset chunks), one
    writer task per vertex property chunk — all independent, so a 256-node
    cluster writes every chunk in parallel and a re-run skips nothing but is
    idempotent (atomic per-file writes)."""
    N, vcs = g.N, vertex_chunk_size
    n_chunks = max(1, -(-N // vcs))
    etriple = f"{vertex_label}_{edge_label}_{vertex_label}"
    os.makedirs(os.path.join(path, "vertex", vertex_label), exist_ok=True)

    # ---- edges: fragment tables (+ hub shards) → range exchange → chunks
    has_hubs = ray.get(g.actors[0].has_hub_shard.remote()) if g.actors else False
    blocks = [a.edges_table.remote() for a in g.actors]
    if has_hubs:
        blocks += [a.hub_edges_table.remote() for a in g.actors]
    sample = ray.get(blocks[0])
    prop_cols = tuple(c for c in sample.column_names if c not in ("src", "dst"))
    counts = None
    for align in orders:  # one exchange + writer wave per adjacency order
        splits = [
            _split_by_key_chunk.options(num_returns=n_chunks).remote(b, vcs, n_chunks, align)
            for b in blocks
        ]
        if n_chunks == 1:
            splits = [[s] for s in splits]
        c = ray.get(
            [
                _write_adj_chunk.remote(
                    path, etriple, k, vcs, N, edge_chunk_size, prop_cols, align,
                    *[splits[i][k] for i in range(len(blocks))],
                )
                for k in range(n_chunks)
            ]
        )
        counts = c if counts is None else counts

    # ---- vertices: positional property chunks + count
    v_groups: list[dict] = []
    if g.vertices_ds is not None:
        vblocks = g.vertices_ds.to_arrow_refs()
        cols = [c for c in ray.get(vblocks[0]).column_names if c != "vid"]
        vsplits = [
            _split_vertices.options(num_returns=n_chunks).remote(b, vcs, n_chunks)
            for b in vblocks
        ]
        if n_chunks == 1:
            vsplits = [[s] for s in vsplits]
        ray.get(
            [
                _write_vertex_chunk.remote(
                    path, vertex_label, "id", k, vcs, N, tuple(cols),
                    *[vsplits[i][k] for i in range(len(vblocks))],
                )
                for k in range(n_chunks)
            ]
        )
        sch = ray.get(vblocks[0]).schema
        v_groups.append(
            {
                "prefix": "id/",
                "file_type": "parquet",
                "properties": [
                    {
                        "name": c,
                        "data_type": _ARROW_TO_GAR.get(str(sch.field(c).type), "string"),
                        "is_primary": c == "oid",
                    }
                    for c in cols
                ],
            }
        )
    _write_text(os.path.join(path, "vertex", vertex_label, "vertex_count"), str(N))

    # ---- manifests
    _write_text(
        os.path.join(path, f"{vertex_label}.vertex.yml"),
        _yaml_dump(
            {
                "label": vertex_label,
                "chunk_size": vcs,
                "prefix": f"vertex/{vertex_label}/",
                "property_groups": v_groups,
                "version": "gar/v1",
            }
        ),
    )
    e_groups = [
        {"prefix": f"{c}/", "file_type": "parquet",
         "properties": [{"name": c,
                         "data_type": _ARROW_TO_GAR.get(str(sample.schema.field(c).type), "double"),
                         "is_primary": False}]}
        for c in prop_cols
    ]
    _write_text(
        os.path.join(path, f"{etriple}.edge.yml"),
        _yaml_dump(
            {
                "src_label": vertex_label,
                "edge_label": edge_label,
                "dst_label": vertex_label,
                "chunk_size": edge_chunk_size,
                "src_chunk_size": vcs,
                "dst_chunk_size": vcs,
                "directed": g.view == "directed",
                "prefix": f"edge/{etriple}/",
                "adj_lists": [
                    {"ordered": True, "aligned_by": a, "file_type": "parquet",
                     "prefix": _ORDER_DIR[a] + "/"}
                    for a in orders
                ],
                "property_groups": e_groups,
                "version": "gar/v1",
            }
        ),
    )
    _write_text(
        os.path.join(path, f"{name}.graph.yml"),
        _yaml_dump(
            {
                "name": name,
                "prefix": "./",
                "vertices": [f"{vertex_label}.vertex.yml"],
                "edges": [f"{etriple}.edge.yml"],
                "total_edges": int(sum(counts)),
                "version": "gar/v1",
            }
        ),
    )
    return path


# ---------------------------------------------------------------------------
# reader


def read_graphar_edges(
    path: str, name: str = "graph", order: str = "src"
) -> ray.data.Dataset:
    """Edges of a GraphAr archive as a Dataset (src, dst[, properties]) —
    adj chunks and row-aligned property chunks zipped per file pair.
    ``order`` picks the adjacency orientation ('src' = ordered_by_source,
    'dst' = ordered_by_dest); both carry the identical edge set."""
    graph = _yaml_load(open(os.path.join(path, f"{name}.graph.yml")).read())
    einfo = _yaml_load(open(os.path.join(path, graph["edges"][0])).read())
    declared = {a.get("aligned_by", "src") for a in einfo.get("adj_lists", [])}
    if order not in declared:
        raise ValueError(f"archive has no {_ORDER_DIR[order]} adjacency (has {sorted(declared)})")
    base = os.path.join(path, einfo["prefix"], _ORDER_DIR[order])
    adj_dir = os.path.join(base, "adj_list")
    files = []
    for part in sorted(os.listdir(adj_dir)):
        for ch in sorted(os.listdir(os.path.join(adj_dir, part))):
            files.append((part, ch))
    props = [pg["properties"][0]["name"] for pg in einfo.get("property_groups", [])]

    @ray.remote
    def _read_pair(part: str, ch: str) -> pa.Table:
        adj = pq.read_table(os.path.join(adj_dir, part, ch))
        cols = {"src": adj[SRC_COL], "dst": adj[DST_COL]}
        for p in props:
            cols[p] = pq.read_table(os.path.join(base, p, part, ch))[p]
        return pa.table(cols)

    return ray.data.from_arrow_refs([_read_pair.remote(p, c) for p, c in files])


def read_graphar_vertices(path: str, name: str = "graph") -> ray.data.Dataset | None:
    """Vertex property table (vid + properties); vid reconstructed from the
    POSITIONAL contract (vid = chunk_index*chunk_size + row)."""
    graph = _yaml_load(open(os.path.join(path, f"{name}.graph.yml")).read())
    vinfo = _yaml_load(open(os.path.join(path, graph["vertices"][0])).read())
    if not vinfo.get("property_groups"):
        return None
    vcs = vinfo["chunk_size"]
    gdir = os.path.join(path, vinfo["prefix"], vinfo["property_groups"][0]["prefix"])

    @ray.remote
    def _read_chunk(k: int, f: str) -> pa.Table:
        t = pq.read_table(f)
        vid = pa.array(np.arange(k * vcs, k * vcs + t.num_rows, dtype=np.int64))
        return t.append_column("vid", vid)

    chunks = sorted(
        os.listdir(gdir), key=lambda s: int(s[len("chunk"):].split(".")[0])
    )
    return ray.data.from_arrow_refs(
        [_read_chunk.remote(k, os.path.join(gdir, f)) for k, f in enumerate(chunks)]
    )


def load_graphar(path: str, name: str = "graph", num_partitions: int = 4, **kw):
    """Rebuild a runnable Graph from a GraphAr archive (round-trip of
    save_graphar; the inverse of the reference's ARCHIVE_GRAPH)."""
    from graphscope_ray.graph.build import build_graph

    graph = _yaml_load(open(os.path.join(path, f"{name}.graph.yml")).read())
    vinfo = _yaml_load(open(os.path.join(path, graph["vertices"][0])).read())
    einfo = _yaml_load(open(os.path.join(path, graph["edges"][0])).read())
    n_vert = int(
        open(os.path.join(path, vinfo["prefix"], "vertex_count")).read().strip()
    )
    edges = read_graphar_edges(path, name)
    props = [pg["properties"][0]["name"] for pg in einfo.get("property_groups", [])]
    g = build_graph(
        edges,
        num_partitions=num_partitions,
        num_vertices=n_vert,
        view="directed" if einfo.get("directed", True) else "undirected",
        weight=kw.pop("weight", "weight" in props),
        **kw,
    )
    g.vertices_ds = read_graphar_vertices(path, name)
    return g


# ---------------------------------------------------------------------------
# multi-label property-graph archives (ARCHIVE_GRAPH over the reference's
# full ArrowFragment data model: one vertex dir per label, one edge dir per
# (src_label, edge_label, dst_label) triple — the GraphAr spec's native
# multi-label layout; the single-label save_graphar above is the special
# case the simple Graph uses)


def save_graphar_property(
    pgraph,
    path: str,
    name: str = "graph",
    vertex_chunk_size: int = 1 << 18,
    edge_chunk_size: int = 1 << 22,
    orders: tuple = ("src", "dst"),
    broadcast_limit: int = 20_000_000,
) -> str:
    """Archive a ``PropertyGraph`` (graph/property.py): every vertex label
    becomes ``vertex/{label}/`` positional property chunks (position = rank
    of oid within the label — the archive's per-label internal id), every
    edge label becomes ``edge/{src}_{elabel}_{dst}/`` adjacency in the
    requested orientations with endpoints encoded to the two labels' ranks.
    One split task per edge block, one writer per chunk — fully parallel.

    Boundary: per-label oid arrays are collected sorted to the driver for
    the rank encode (fine up to ``broadcast_limit`` per label; beyond that
    archive after a rank-mode flatten, whose zip_with_index/hash_join path
    produces the same ranks distributed)."""
    os.makedirs(path, exist_ok=True)
    vcs = vertex_chunk_size
    v_ymls, e_ymls = [], []
    rank_arrs: dict[str, np.ndarray] = {}
    # PropertySchema construction resolves ds.schema() for every label —
    # build it once, not once per access
    psch = pgraph.schema

    for lbl in psch.vertex_labels:
        vds = pgraph.vertex_table(lbl).materialize()
        oid_sorted = np.sort(
            np.concatenate(
                [
                    t["oid"].to_numpy(zero_copy_only=False)
                    for t in ray.get(vds.to_arrow_refs())
                    if t.num_rows
                ]
            )
            if vds.count()
            else np.empty(0, np.int64)
        )
        if len(oid_sorted) > broadcast_limit:
            raise ValueError(
                f"vertex label {lbl!r} exceeds the driver rank-encode limit; "
                "archive via flatten(encode='rank') instead"
            )
        if len(np.unique(oid_sorted)) != len(oid_sorted):
            raise ValueError(f"vertex label {lbl!r} has duplicate oids")
        rank_arrs[lbl] = oid_sorted
        n_l = len(oid_sorted)
        n_chunks = max(1, -(-n_l // vcs))
        ref = ray.put(oid_sorted)

        def _vidify(t: pa.Table) -> pa.Table:
            arr = ray.get(ref)
            vid = np.searchsorted(arr, t["oid"].to_numpy(zero_copy_only=False))
            return t.append_column("vid", pa.array(vid.astype(np.int64)))

        vblocks = vds.map_batches(_vidify, batch_format="pyarrow").materialize().to_arrow_refs()
        sample = ray.get(vblocks[0])
        cols = tuple(c for c in sample.column_names if c != "vid")
        vsplits = [
            _split_vertices.options(num_returns=n_chunks).remote(b, vcs, n_chunks)
            for b in vblocks
        ]
        if n_chunks == 1:
            vsplits = [[s] for s in vsplits]
        ray.get(
            [
                _write_vertex_chunk.remote(
                    path, lbl, "id", k, vcs, n_l, cols,
                    *[vsplits[i][k] for i in range(len(vblocks))],
                )
                for k in range(n_chunks)
            ]
        )
        _write_text(os.path.join(path, "vertex", lbl, "vertex_count"), str(n_l))
        sch = sample.schema
        _write_text(
            os.path.join(path, f"{lbl}.vertex.yml"),
            _yaml_dump(
                {
                    "label": lbl,
                    "chunk_size": vcs,
                    "prefix": f"vertex/{lbl}/",
                    "property_groups": [
                        {
                            "prefix": "id/",
                            "file_type": "parquet",
                            "properties": [
                                {
                                    "name": c,
                                    "data_type": _ARROW_TO_GAR.get(str(sch.field(c).type), "string"),
                                    "is_primary": c == "oid",
                                }
                                for c in cols
                            ],
                        }
                    ],
                    "version": "gar/v1",
                }
            ),
        )
        v_ymls.append(f"{lbl}.vertex.yml")

    total_edges = 0
    for elbl in psch.edge_labels:
        src_l, dst_l = psch.edge_relationships[elbl]
        etriple = f"{src_l}_{elbl}_{dst_l}"
        sref, dref = ray.put(rank_arrs[src_l]), ray.put(rank_arrs[dst_l])

        def _enc(t: pa.Table) -> pa.Table:
            sa, da = ray.get(sref), ray.get(dref)
            s = np.searchsorted(sa, t["src_oid"].to_numpy(zero_copy_only=False))
            d = np.searchsorted(da, t["dst_oid"].to_numpy(zero_copy_only=False))
            cols = {"src": pa.array(s.astype(np.int64)), "dst": pa.array(d.astype(np.int64))}
            for c in t.column_names:
                if c not in ("src_oid", "dst_oid"):
                    cols[c] = t[c]
            return pa.table(cols)

        eds = (
            pgraph.edge_table(elbl)
            .map_batches(_enc, batch_format="pyarrow")
            .materialize()
        )
        blocks = eds.to_arrow_refs()
        sample = ray.get(blocks[0])
        prop_cols = tuple(c for c in sample.column_names if c not in ("src", "dst"))
        counts = None
        for align in orders:
            n_vert = len(rank_arrs[src_l if align == "src" else dst_l])
            n_chunks = max(1, -(-n_vert // vcs))
            splits = [
                _split_by_key_chunk.options(num_returns=n_chunks).remote(b, vcs, n_chunks, align)
                for b in blocks
            ]
            if n_chunks == 1:
                splits = [[s] for s in splits]
            c = ray.get(
                [
                    _write_adj_chunk.remote(
                        path, etriple, k, vcs, n_vert, edge_chunk_size, prop_cols, align,
                        *[splits[i][k] for i in range(len(blocks))],
                    )
                    for k in range(n_chunks)
                ]
            )
            counts = c if counts is None else counts
        total_edges += int(sum(counts))
        _write_text(
            os.path.join(path, f"{etriple}.edge.yml"),
            _yaml_dump(
                {
                    "src_label": src_l,
                    "edge_label": elbl,
                    "dst_label": dst_l,
                    "chunk_size": edge_chunk_size,
                    "src_chunk_size": vcs,
                    "dst_chunk_size": vcs,
                    "directed": pgraph.directed,
                    "prefix": f"edge/{etriple}/",
                    "adj_lists": [
                        {"ordered": True, "aligned_by": a, "file_type": "parquet",
                         "prefix": _ORDER_DIR[a] + "/"}
                        for a in orders
                    ],
                    "property_groups": [
                        {"prefix": f"{c}/", "file_type": "parquet",
                         "properties": [
                             {"name": c,
                              "data_type": _ARROW_TO_GAR.get(str(sample.schema.field(c).type), "double"),
                              "is_primary": False}
                         ]}
                        for c in prop_cols
                    ],
                    "version": "gar/v1",
                }
            ),
        )
        e_ymls.append(f"{etriple}.edge.yml")

    _write_text(
        os.path.join(path, f"{name}.graph.yml"),
        _yaml_dump(
            {
                "name": name,
                "prefix": "./",
                "vertices": v_ymls,
                "edges": e_ymls,
                "total_edges": total_edges,
                "version": "gar/v1",
            }
        ),
    )
    return path


def load_graphar_property(path: str, name: str = "graph", order: str = "src"):
    """Rebuild a ``PropertyGraph`` from a multi-label archive (inverse of
    save_graphar_property): per-label vertex tables come back positional,
    edge endpoints are decoded back to oids through each label's rank→oid
    arrays (read once per label from the archive's own vertex chunks)."""
    from graphscope_ray.graph.property import PropertyGraph

    graph = _yaml_load(open(os.path.join(path, f"{name}.graph.yml")).read())
    pg = PropertyGraph()
    oid_by_rank: dict[str, np.ndarray] = {}
    for vy in graph["vertices"]:
        vinfo = _yaml_load(open(os.path.join(path, vy)).read())
        lbl = vinfo["label"]
        vcs = vinfo["chunk_size"]
        gdir = os.path.join(path, vinfo["prefix"], vinfo["property_groups"][0]["prefix"])
        chunks = sorted(os.listdir(gdir), key=lambda s: int(s[len("chunk"):].split(".")[0]))
        tabs = [pq.read_table(os.path.join(gdir, f)) for f in chunks]
        full = pa.concat_tables(tabs)
        oid_by_rank[lbl] = full["oid"].to_numpy(zero_copy_only=False)
        pg = pg.add_vertices(ray.data.from_arrow(full), lbl, vid_field="oid")
    for ey in graph["edges"]:
        einfo = _yaml_load(open(os.path.join(path, ey)).read())
        base = os.path.join(path, einfo["prefix"], _ORDER_DIR[order])
        adj_dir = os.path.join(base, "adj_list")
        files = []
        for part in sorted(os.listdir(adj_dir)):
            for ch in sorted(os.listdir(os.path.join(adj_dir, part))):
                files.append((part, ch))
        props = [pg_["properties"][0]["name"] for pg_ in einfo.get("property_groups", [])]
        sref = ray.put(oid_by_rank[einfo["src_label"]])
        dref = ray.put(oid_by_rank[einfo["dst_label"]])

        @ray.remote
        def _read_pair(part: str, ch: str, adj_dir=adj_dir, base=base, props=tuple(props)) -> pa.Table:
            sa, da = ray.get(sref), ray.get(dref)
            adj = pq.read_table(os.path.join(adj_dir, part, ch))
            cols = {
                "src_oid": pa.array(sa[adj[SRC_COL].to_numpy(zero_copy_only=False)]),
                "dst_oid": pa.array(da[adj[DST_COL].to_numpy(zero_copy_only=False)]),
            }
            for p in props:
                cols[p] = pq.read_table(os.path.join(base, p, part, ch))[p]
            return pa.table(cols)

        eds = ray.data.from_arrow_refs([_read_pair.remote(p, c) for p, c in files])
        pg = pg.add_edges(
            eds,
            einfo["edge_label"],
            src_label=einfo["src_label"],
            dst_label=einfo["dst_label"],
            src_field="src_oid",
            dst_field="dst_oid",
        )
    return pg
