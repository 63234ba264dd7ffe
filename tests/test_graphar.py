"""GraphAr-style archive (ARCHIVE_GRAPH parity, ref dag_utils.py:1085-1114):
round-trip equality with the engine-private save_graph layout, positional
vertex-id contract, offset-array correctness, external readability."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph, build_graph_from_oids
from graphscope_ray.sources.graphar import (
    _yaml_dump,
    _yaml_load,
    load_graphar,
    read_graphar_edges,
    read_graphar_vertices,
    save_graphar,
)


def _edges(n=50, m=400, seed=11):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    w = rng.rand(keep.sum())
    return (
        pa.table(
            {
                "src": pa.array(src[keep]),
                "dst": pa.array(dst[keep]),
                "weight": pa.array(w),
            }
        ),
        n,
    )


def _sorted_edges(ds) -> pd.DataFrame:
    df = ds.to_pandas().sort_values(["src", "dst", "weight"]).reset_index(drop=True)
    return df[["src", "dst", "weight"]]


def test_yaml_roundtrip():
    d = {
        "label": "vertex",
        "chunk_size": 16,
        "property_groups": [
            {"prefix": "id/", "file_type": "parquet",
             "properties": [{"name": "oid", "data_type": "int64", "is_primary": True}]},
        ],
        "vertices": ["a.vertex.yml"],
        "version": "gar/v1",
    }
    assert _yaml_load(_yaml_dump(d))["chunk_size"] == 16
    got = _yaml_load(_yaml_dump(d))
    assert got["property_groups"][0]["properties"] == d["property_groups"][0]["properties"]
    assert got["vertices"] == ["a.vertex.yml"]


def test_graphar_roundtrip(tmp_path):
    t, n = _edges()
    g = build_graph(t, num_partitions=3, num_vertices=n, weight=True, dedup_edges=True)
    path = str(tmp_path / "gar")
    save_graphar(g, path, vertex_chunk_size=16, edge_chunk_size=64)

    # edge table survives byte-for-byte (modulo order)
    src_orig = _sorted_edges(ray.data.from_arrow([ray.get(a.edges_table.remote()) for a in g.actors]))
    back = _sorted_edges(read_graphar_edges(path))
    pd.testing.assert_frame_equal(src_orig, back, check_exact=True)

    # a rebuilt graph (same partition count → identical summation order)
    # computes bit-identical algorithm results
    g2 = load_graphar(path, num_partitions=3, store_in_edges=True)
    assert g2.N == g.N
    a = alg.pagerank(g, tol=1e-10)[0].to_pandas().sort_values("vid").reset_index(drop=True)
    b = alg.pagerank(g2, tol=1e-10)[0].to_pandas().sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_graphar_dest_order_mirror(tmp_path):
    """ordered_by_dest mirror: identical edge set in both orientations,
    (dst, src)-sorted adjacency, per-destination offset arrays."""
    t, n = _edges(seed=13)
    g = build_graph(t, num_partitions=3, num_vertices=n, weight=True, dedup_edges=True)
    path = str(tmp_path / "gar")
    save_graphar(g, path, vertex_chunk_size=16, edge_chunk_size=32)

    by_src = _sorted_edges(read_graphar_edges(path, order="src"))
    by_dst = _sorted_edges(read_graphar_edges(path, order="dst"))
    pd.testing.assert_frame_equal(by_src, by_dst, check_exact=True)

    # dest-ordered chunks are (dst, src)-sorted with per-dest offsets
    base = os.path.join(path, "edge", "vertex_links_vertex", "ordered_by_dest")
    deg_in = np.zeros(n, dtype=np.int64)
    np.add.at(deg_in, by_src["dst"].to_numpy(), 1)
    for k in range(-(-n // 16)):
        parts_dir = os.path.join(base, "adj_list", f"part{k}")
        rows = pa.concat_tables(
            [pq.read_table(os.path.join(parts_dir, f)) for f in sorted(os.listdir(parts_dir))]
        )
        d = rows["_graphArDstIndex"].to_numpy()
        assert (np.diff(d) >= 0).all()
        assert (d // 16 == k).all()
        off = pq.read_table(os.path.join(base, "offset", f"chunk{k}.parquet"))["offset"].to_numpy()
        lo = k * 16
        expect = np.concatenate([[0], np.cumsum(deg_in[lo : min(lo + 16, n)])])
        assert (off == expect).all()

    # an archive written without the mirror refuses a dest read loudly
    p2 = str(tmp_path / "gar_src_only")
    save_graphar(g, p2, vertex_chunk_size=16, orders=("src",))
    with pytest.raises(ValueError):
        read_graphar_edges(p2, order="dst")


def test_graphar_offsets_and_counts(tmp_path):
    t, n = _edges(seed=5)
    g = build_graph(t, num_partitions=2, num_vertices=n, dedup_edges=True)
    path = str(tmp_path / "gar")
    save_graphar(g, path, vertex_chunk_size=16, edge_chunk_size=32)
    # external readability: plain pyarrow + the offset contract
    deg = np.zeros(n, dtype=np.int64)
    df = read_graphar_edges(path).to_pandas()
    np.add.at(deg, df["src"].to_numpy(), 1)
    base = os.path.join(path, "edge", "vertex_links_vertex", "ordered_by_source")
    total = 0
    for k in range(-(-n // 16)):
        off = pq.read_table(os.path.join(base, "offset", f"chunk{k}.parquet"))["offset"].to_numpy()
        lo = k * 16
        expect = np.concatenate([[0], np.cumsum(deg[lo : min(lo + 16, n)])])
        assert (off == expect).all()
        total += int(open(os.path.join(base, f"edge_count{k}")).read())
        # adjacency within the chunk is (src, dst)-sorted
        parts_dir = os.path.join(base, "adj_list", f"part{k}")
        rows = pa.concat_tables(
            [pq.read_table(os.path.join(parts_dir, f)) for f in sorted(os.listdir(parts_dir))]
        )
        s = rows["_graphArSrcIndex"].to_numpy()
        assert (np.diff(s) >= 0).all()
    assert total == len(df) == g.num_edges


def test_graphar_oid_vertices_positional(tmp_path):
    # oid-built graph: the vertex property chunks carry the oid mapping,
    # reconstructed positionally (vid = chunk*chunk_size + row)
    t, n = _edges(n=40, m=300, seed=7)
    oids = pa.table(
        {
            "src_oid": pa.array((t["src"].to_numpy() * 7 + 1000).astype(np.int64)),
            "dst_oid": pa.array((t["dst"].to_numpy() * 7 + 1000).astype(np.int64)),
        }
    )
    g = build_graph_from_oids(ray.data.from_arrow(oids), num_partitions=3, dedup_edges=True)
    path = str(tmp_path / "gar")
    save_graphar(g, path, vertex_chunk_size=8)
    vback = read_graphar_vertices(path).to_pandas().sort_values("vid").reset_index(drop=True)
    vorig = g.vertices_ds.to_pandas().sort_values("vid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        vorig[["vid", "oid"]], vback[["vid", "oid"]], check_exact=True, check_like=True
    )


def test_graphar_empty_chunks(tmp_path):
    # a vertex chunk with zero out-edges still gets a (all-zero) offset chunk
    t = pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 0], pa.int64())})
    g = build_graph(t, num_partitions=2, num_vertices=40)
    path = str(tmp_path / "gar")
    save_graphar(g, path, vertex_chunk_size=8)
    base = os.path.join(path, "edge", "vertex_links_vertex", "ordered_by_source")
    off = pq.read_table(os.path.join(base, "offset", "chunk4.parquet"))["offset"].to_numpy()
    assert off.shape == (9,) and (off == 0).all()
    assert read_graphar_edges(path).count() == 2


def test_graphar_property_multilabel_roundtrip(tmp_path):
    """Multi-label property archive: every label's table and every edge
    label's (endpoints + properties) survive a save/load cycle; schema
    (labels, relations, typed properties) reconstructs."""
    from graphscope_ray.graph.property import PropertyGraph
    from graphscope_ray.sources.graphar import load_graphar_property, save_graphar_property

    people = pd.DataFrame({"pid": [10, 20, 30, 99], "age": [1, 2, 3, 4]})
    items = pd.DataFrame({"iid": [7, 8, 9], "price": [1.5, 2.5, 0.5]})
    knows = pd.DataFrame({"s": [10, 20, 30], "d": [20, 30, 10], "w": [0.1, 0.2, 0.3]})
    bought = pd.DataFrame({"s": [10, 99, 20], "d": [7, 8, 7]})
    g = (
        PropertyGraph(directed=True)
        .add_vertices(people, "person", vid_field="pid")
        .add_vertices(items, "item", vid_field="iid")
        .add_edges(knows, "knows", src_label="person", dst_label="person",
                   src_field="s", dst_field="d")
        .add_edges(bought, "bought", src_label="person", dst_label="item",
                   src_field="s", dst_field="d")
    )
    path = str(tmp_path / "pgar")
    save_graphar_property(g, path, vertex_chunk_size=2, edge_chunk_size=2)

    for order in ("src", "dst"):
        g2 = load_graphar_property(path, order=order)
        s = g2.schema
        assert s.vertex_labels == ["person", "item"]
        assert s.edge_relationships == {"knows": ("person", "person"),
                                        "bought": ("person", "item")}
        pt = g2.vertex_table("person").to_pandas().sort_values("oid").reset_index(drop=True)
        assert pt["oid"].tolist() == [10, 20, 30, 99] and pt["age"].tolist() == [1, 2, 3, 4]
        it = g2.vertex_table("item").to_pandas().sort_values("oid").reset_index(drop=True)
        assert it["price"].tolist() == [1.5, 2.5, 0.5][0:3] or sorted(it["price"]) == [0.5, 1.5, 2.5]
        kt = (
            g2.edge_table("knows").to_pandas()
            .sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)
        )
        assert kt[["src_oid", "dst_oid"]].values.tolist() == [[10, 20], [20, 30], [30, 10]]
        assert sorted(kt["w"].tolist()) == [0.1, 0.2, 0.3]
        bt = (
            g2.edge_table("bought").to_pandas()
            .sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)
        )
        assert bt[["src_oid", "dst_oid"]].values.tolist() == [[10, 7], [20, 7], [99, 8]]
    # the archive is externally scannable: per-label dirs + manifests exist
    assert os.path.exists(os.path.join(path, "vertex", "item", "vertex_count"))
    assert os.path.exists(os.path.join(path, "person_bought_item.edge.yml"))
    # and the restored labeled graph still lowers onto the engine
    import graphscope_ray.graph.algorithms as alg

    sub = load_graphar_property(path).project(vertices={"person": []}, edges={"knows": []})
    sg = sub.project_to_simple(num_partitions=2, store_in_edges=True)
    ds, _ = alg.wcc(sg)
    df = ds.to_pandas().merge(sg.vertices_ds.to_pandas(), on="vid")
    comp_sizes = sorted(df.groupby("comp").size().tolist())
    assert comp_sizes == [1, 3]  # cycle {10,20,30} + isolated 99
