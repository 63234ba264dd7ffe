"""First-class multi-label property graph (graph/property.py): schema,
project, consolidate, add_column, project_to_simple, flatten dense/rank."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.property import PropertyGraph


def _graph():
    people = pd.DataFrame(
        {
            "pid": [10, 20, 30, 40, 99],
            "age": [1, 2, 3, 4, 5],
            "w0": [1.0, 2.0, 3.0, 4.0, 5.0],
            "w1": [9.0, 8.0, 7.0, 6.0, 5.0],
        }
    )
    knows = pd.DataFrame(
        {"s": [10, 20, 30], "d": [20, 30, 10], "since": [2000, 2001, 2002], "w": [1.0, 2.0, 4.0]}
    )
    items = pd.DataFrame({"iid": [7, 8], "price": [1.5, 2.5]})
    bought = pd.DataFrame({"s": [10, 40], "d": [7, 8]})
    return (
        PropertyGraph(directed=True)
        .add_vertices(people, "person", vid_field="pid")
        .add_vertices(items, "item", vid_field="iid")
        .add_edges(knows, "knows", src_label="person", dst_label="person", src_field="s", dst_field="d")
        .add_edges(bought, "bought", src_label="person", dst_label="item", src_field="s", dst_field="d")
    )


def test_schema():
    g = _graph()
    s = g.schema
    assert s.vertex_labels == ["person", "item"]
    assert s.edge_labels == ["knows", "bought"]
    assert s.edge_relationships["bought"] == ("person", "item")
    assert ("age", "int64") in s.get_vertex_properties("person")
    assert ("since", "int64") in s.get_edge_properties("knows")
    df = s.to_dataframe()
    assert set(df["kind"]) == {"VERTEX", "EDGE"}
    assert "person" in repr(s)


def test_project_validation():
    g = _graph()
    with pytest.raises(ValueError):
        g.project(vertices=["person"], edges=["knows"])  # lists rejected (ref parity)
    with pytest.raises(ValueError):
        g.project(vertices={"item": []}, edges={"knows": []})  # endpoint label missing
    with pytest.raises(ValueError):
        g.project(vertices={"person": ["nope"]}, edges={})  # unknown property
    p = g.project(vertices={"person": ["age"]}, edges={"knows": []})
    assert p.schema.vertex_labels == ["person"]
    assert p.schema.get_vertex_properties("person") == [("age", "int64")]
    assert p.schema.get_edge_properties("knows") == []


def test_project_to_simple_keeps_isolated_and_weights():
    g = _graph().project(vertices={"person": []}, edges={"knows": ["w"]})
    sg = g.project_to_simple(e_prop="w", num_partitions=2, store_in_edges=True)
    # universe = whole person table (40 and 99 have no knows edges)
    assert sg.N == 5
    vmap = sg.vertices_ds.to_pandas().sort_values("oid")
    assert vmap["oid"].tolist() == [10, 20, 30, 40, 99]
    # weighted sssp over the 10->20->30->10 cycle with w = 1,2,4
    src = int(vmap.loc[vmap["oid"] == 10, "vid"].iloc[0])
    ds, _ = alg.sssp(sg, source=src)
    df = ds.to_pandas().merge(vmap, on="vid").set_index("oid")["dist"]
    assert df.loc[10] == 0 and df.loc[20] == 1 and df.loc[30] == 3
    assert df.loc[99] < 0 or np.isinf(df.loc[99]) or df.loc[99] > 1e17  # unreached


def test_project_to_simple_requires_self_relation():
    g = _graph().project(vertices={"person": [], "item": []}, edges={"bought": []})
    with pytest.raises(ValueError):
        g.project_to_simple(v_label="person", e_label="bought")


def test_flatten_dense_vs_rank_same_components():
    g = _graph()
    gd, info_d = g.flatten(encode="dense", num_partitions=2, store_in_edges=True)
    gr, info_r = g.flatten(encode="rank", num_partitions=2, store_in_edges=True)
    # dense blocks span full key ranges; rank blocks are exact table sizes
    assert info_d.sizes == {"person": 100, "item": 9}
    assert info_r.sizes == {"person": 5, "item": 2}
    rd, _ = alg.wcc(gd)
    rr, _ = alg.wcc(gr)
    out_d = info_d.split(rd.to_pandas())
    out_r = info_r.split(rr.to_pandas())
    # project dense output to real keys only, then compare component PARTITIONS
    real = {"person": {10, 20, 30, 40, 99}, "item": {7, 8}}
    out_d = out_d[[k in real[l] for l, k in zip(out_d["v_label"], out_d["v_key"])]]

    def parts(df):
        return sorted(
            sorted((l, int(k)) for l, k in zip(g2["v_label"], g2["v_key"]))
            for _, g2 in df.groupby("comp")
        )

    assert parts(out_d) == parts(out_r)
    # the cycle + bought edges: {10,20,30,7} one comp, {40,8} one, {99} alone
    want = [
        [("item", 7), ("person", 10), ("person", 20), ("person", 30)],
        [("item", 8), ("person", 40)],
        [("person", 99)],
    ]
    assert sorted(parts(out_r)) == sorted(want)
    # rank mode exposes the union (v_label, oid, vid) mapping
    vm = info_r.vmap_ds().to_pandas()
    assert len(vm) == 7 and set(vm["v_label"]) == {"person", "item"}


def test_consolidate_and_add_column():
    g = _graph().project(vertices={"person": ["age", "w0", "w1"]}, edges={"knows": []})
    g2 = g.consolidate_columns("person", ["w0", "w1"], "w")
    t = g2.vertex_table("person").to_pandas().sort_values("oid")
    assert g2.schema.get_vertex_properties("person")[0] == ("age", "int64")
    assert [list(x) for x in t["w"]] == [[1.0, 9.0], [2.0, 8.0], [3.0, 7.0], [4.0, 6.0], [5.0, 5.0]]
    res = pd.DataFrame({"oid": [10, 40], "score": [0.5, 0.7]})
    g3 = g2.add_column("person", res, key="oid")
    t3 = g3.vertex_table("person").to_pandas().sort_values("oid")
    got = dict(zip(t3["oid"], t3["score"]))
    assert got[10] == 0.5 and got[40] == 0.7 and np.isnan(got[20])
    assert ("score", "double") in g3.schema.get_vertex_properties("person")


def test_extend_label():
    more = pd.DataFrame({"pid": [77], "age": [9], "w0": [0.0], "w1": [0.0]})
    g = _graph().add_vertices(more, "person", vid_field="pid")
    assert g.vertex_table("person").count() == 6
    with pytest.raises(ValueError):
        _graph().add_vertices(pd.DataFrame({"pid": [1], "zzz": [2]}), "person", vid_field="pid")


def test_remove_vertices_cascade_and_remove_edges():
    """First-class mutation rebuild: delete by ids / by predicate, cascade
    semi-join re-route, and edge deletes (ref grape_instance.cc:91-177)."""
    import pyarrow.compute as pc

    from graphscope_ray.graph.property import PropertyGraph

    person = pd.DataFrame({"pid": [1, 2, 3, 4], "age": [10, 20, 30, 40]})
    knows = pd.DataFrame({"a": [1, 1, 2, 3, 4], "b": [2, 3, 3, 4, 1],
                          "w": [1.0, 2.0, 3.0, 4.0, 5.0]})
    pg = (
        PropertyGraph(directed=True)
        .add_vertices(person, "person", vid_field="pid")
        .add_edges(knows, "knows", src_label="person", dst_label="person",
                   src_field="a", dst_field="b")
    )
    # delete by explicit ids with cascade: vertex 3 vanishes with all its edges
    g2 = pg.remove_vertices("person", ids=[3])
    assert sorted(g2.vertex_table("person").to_pandas()["oid"]) == [1, 2, 4]
    e2 = g2.edge_table("knows").to_pandas()
    assert sorted(zip(e2.src_oid, e2.dst_oid)) == [(1, 2), (4, 1)]
    # delete by predicate without cascade keeps edges (dangling allowed off)
    g3 = pg.remove_vertices("person", where=lambda t: pc.greater(t["age"], 25),
                            cascade=False)
    assert sorted(g3.vertex_table("person").to_pandas()["oid"]) == [1, 2]
    assert g3.edge_table("knows").count() == 5
    # remove_edges by predicate on an edge property
    g4 = pg.remove_edges("knows", where=lambda t: pc.greater(t["w"], 2.5))
    e4 = g4.edge_table("knows").to_pandas()
    assert sorted(zip(e4.src_oid, e4.dst_oid)) == [(1, 2), (1, 3)]
    # the original graph is untouched (copy-on-write)
    assert pg.vertex_table("person").count() == 4
    assert pg.edge_table("knows").count() == 5
    # exactly one selector
    with pytest.raises(ValueError):
        pg.remove_vertices("person")
    with pytest.raises(ValueError):
        pg.remove_vertices("person", ids=[1], where=lambda t: t)


def test_update_column_coalesce():
    """update_column overwrites matched rows, keeps old values elsewhere,
    and round-trips the column dtype through the NaN-marked left join."""
    from graphscope_ray.graph.property import PropertyGraph

    person = pd.DataFrame({"pid": [1, 2, 3, 4], "age": [10, 20, 30, 40],
                           "name": ["a", "b", "c", "d"]})
    pg = PropertyGraph(directed=True).add_vertices(person, "person", vid_field="pid")
    upd = pd.DataFrame({"oid": [2, 4], "age": [99, 77]})
    g2 = pg.update_column("person", upd, key="oid", column="age")
    out = g2.vertex_table("person").to_pandas().sort_values("oid")
    assert out["age"].tolist() == [10, 99, 30, 77]
    assert out["age"].dtype == np.int64
    assert out["name"].tolist() == ["a", "b", "c", "d"]
    # original untouched; unknown column refuses
    assert pg.vertex_table("person").to_pandas()["age"].sum() == 100
    with pytest.raises(ValueError):
        pg.update_column("person", upd, key="oid", column="nope")
