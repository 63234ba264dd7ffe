"""graphscope-compatible client API facade (graphscope_ray/api.py) — the
reference's primary user path (session → g() → add_vertices/add_edges →
flat app call → ctx.to_dataframe with selectors) drives the same engine."""

import numpy as np
import pandas as pd
import pytest

import graphscope_ray.api as gs
from tests import oracles

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (1, 4), (5, 0)]
N = 6


def _edge_df(weights=None):
    df = pd.DataFrame(EDGES, columns=["src", "dst"])
    if weights is not None:
        df["w"] = weights
    return df


def _vert_df():
    return pd.DataFrame({"id": range(N), "name": [f"v{i}" for i in range(N)]})


def test_primary_path_pagerank_selectors():
    sess = gs.session(num_partitions=2)
    g = sess.g()
    g = g.add_vertices(_vert_df(), label="node", vid_field="id")
    g = g.add_edges(_edge_df(), label="link")
    ctx = gs.pagerank(g, delta=0.85, tol=1e-10)
    df = ctx.to_dataframe({"node": "v.id", "r": "r"})
    assert list(df.columns) == ["node", "r"]
    want = oracles.pagerank(EDGES, N, tol=1e-12, max_rounds=500)
    got = df.sort_values("node")["r"].to_numpy()
    assert np.allclose(got, want, atol=1e-7)
    arr = ctx.to_numpy("r")
    assert np.allclose(np.sort(arr), np.sort(got))
    # schema surface
    s = g.schema
    assert s.vertex_labels == ["node"] and s.edge_labels == ["link"]
    sess.close()
    with pytest.raises(RuntimeError):
        sess.g()


def test_edges_first_label_inference_and_wcc_sssp():
    with gs.session(num_partitions=2) as sess:
        g = sess.g().add_edges(_edge_df(), label="link")
        comp = gs.wcc(g).to_dataframe({"id": "v.id", "c": "r"}).sort_values("id")
        assert comp["c"].nunique() == 1  # the toy graph is one weak component
        w = [1.0, 2.0, 1.0, 5.0, 1.0, 1.0, 3.0, 1.0]
        gw = sess.g().add_edges(_edge_df(weights=w), label="link")
        d1 = gs.sssp(gw, src=0, weight="w").to_dataframe({"id": "v.id", "d": "r"})
        d2 = gs.sssp_delta(gw, src=0, weight="w", delta=2.0).to_dataframe(
            {"id": "v.id", "d": "r"}
        )
        want = oracles.sssp(EDGES, N, 0, weights=w)
        got = d1.sort_values("id")["d"].to_numpy()
        assert np.allclose(got[np.isfinite(got)], [x for x in want if np.isfinite(x)])
        assert np.allclose(
            d1.sort_values("id")["d"].to_numpy(), d2.sort_values("id")["d"].to_numpy()
        )


def test_hits_named_selector_and_dataset_path():
    with gs.session(num_partitions=2) as sess:
        g = sess.g().add_edges(_edge_df())
        ctx = gs.hits(g, tolerance=1e-12, max_round=200)
        df = ctx.to_dataframe({"id": "v.id", "a": "r", "h": "r.hub"})
        auth, hub = oracles.hits(EDGES, N, tol=1e-12, max_rounds=300)
        srt = df.sort_values("id")
        assert np.allclose(srt["a"].to_numpy(), auth, atol=1e-6)
        assert np.allclose(srt["h"].to_numpy(), hub, atol=1e-6)
        # the scale path returns a distributed dataset, oid attached
        ds = ctx.to_dataset()
        assert "oid" in ds.schema().names and "vid" not in ds.schema().names
        with pytest.raises(ValueError):
            ctx.to_numpy("bogus")


def test_property_project_and_undirected_apps():
    with gs.session(num_partitions=2) as sess:
        g = (
            sess.g()
            .add_vertices(_vert_df(), label="node", vid_field="id")
            .add_edges(_edge_df(weights=list(range(8))), label="link")
        )
        # PROJECT: drop the weight property, keep the labels
        gp = g.project(vertices={"node": []}, edges={"link": []})
        tri = gs.triangles(gp).to_dataframe({"id": "v.id", "t": "r"}).sort_values("id")
        _, want_tri = oracles.triangles(EDGES, N)
        assert tri["t"].tolist() == want_tri
        assert gs.transitivity(gp) == pytest.approx(
            oracles.transitivity(EDGES, N)
        )
        core = gs.kcore(gp, k=2).to_dataframe({"id": "v.id", "c": "r"}).sort_values("id")
        assert core["c"].astype(bool).tolist() == oracles.kcore(EDGES, N, 2)


def test_sparse_oid_sssp_bfs_voterank():
    """Non-dense oids: user-facing src ids must be rank-translated to vids
    (regression: api.sssp passed the oid straight through as a fragment vid,
    correct only for dense 0..N-1 universes)."""
    edges = [(o * 10 + 7, (o + 1) * 10 + 7) for o in range(5)]  # path 7→17→…→57
    sess = gs.session(num_partitions=2)
    g = sess.g().add_edges(pd.DataFrame(edges, columns=["src", "dst"]), label="e")
    ctx = gs.sssp(g, src=7)
    df = ctx.to_dataframe({"node": "v.id", "d": "r"}).sort_values("node")
    got = dict(zip(df.node, df.d))
    for i, o in enumerate([7, 17, 27, 37, 47, 57]):
        assert got[o] == float(i), (o, got[o])
    ctx2 = gs.bfs(g, src=27)
    df2 = ctx2.to_dataframe({"node": "v.id", "d": "r"}).sort_values("node")
    got2 = dict(zip(df2.node, df2.d))
    assert got2[27] == 0 and got2[37] == 1 and got2[57] == 3
    # voterank returns oids, not vids
    top = gs.voterank(g, num_of_selected_nodes=3)
    assert all(t in {7, 17, 27, 37, 47, 57} for t in top)
    # unknown source oid is a loud error, not a silent wrong answer
    with pytest.raises(KeyError):
        gs.sssp(g, src=99)


def test_gremlin_accessor_on_session_graph():
    from graphscope_ray.graph.gremlin import P
    from graphscope_ray.graph.property import PropertyGraph

    sess = gs.session(num_partitions=2)
    g = sess.g()
    g = g.add_vertices(_vert_df(), label="node", vid_field="id")
    g = g.add_edges(_edge_df(), label="link")
    # traversal-source form (sess.gremlin(graph) parity)
    t = gs.gremlin(g)
    n = t.V().hasLabel("node").out("link").count()
    assert n == len(EDGES)
    assert t.V().has("name", P.within("v0", "v1")).count() == 2
    # script form materializing a subgraph
    sub = gs.gremlin(g, "g.V().hasId(2).outE('link').subgraph('s')")
    assert isinstance(sub, PropertyGraph)
    want = sorted(d for s, d in EDGES if s == 2)
    assert sorted(sub.edge_table("link").to_pandas().dst_oid) == want
    sess.close()
    with pytest.raises(RuntimeError):
        gs.gremlin(g)
