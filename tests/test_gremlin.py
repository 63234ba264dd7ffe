"""Gremlin traversal → subgraph (the GREMLIN_TO_SUBGRAPH data plane).

Oracle strategy: traversal bag semantics ARE join multiplicities, so every
step chain has an exact pandas-join twin computed here on the same small
tables.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from graphscope_ray.graph.gremlin import (
    GremlinUnsupported,
    P,
    run_gremlin,
    traversal,
)
from graphscope_ray.graph.property import PropertyGraph


@pytest.fixture(scope="module")
def tiny():
    """3 people, 4 posts, authored + likes edges (likes has a weight prop)."""
    person = pd.DataFrame({"pid": [1, 2, 3], "age": [20, 35, 50], "city": ["a", "b", "a"]})
    post = pd.DataFrame({"post_id": [10, 11, 12, 13], "score": [5, 1, 9, 3]})
    authored = pd.DataFrame({"p": [1, 1, 2, 3], "q": [10, 11, 12, 13]})
    likes = pd.DataFrame({"p": [1, 2, 2, 3, 3], "q": [12, 10, 13, 10, 11], "w": [1.0, 2.0, 0.5, 3.0, 1.5]})
    pg = (
        PropertyGraph(directed=True)
        .add_vertices(person, "person", vid_field="pid")
        .add_vertices(post, "post", vid_field="post_id")
        .add_edges(authored, "authored", src_label="person", dst_label="post",
                   src_field="p", dst_field="q")
        .add_edges(likes, "likes", src_label="person", dst_label="post",
                   src_field="p", dst_field="q")
    )
    return pg, person, post, authored, likes


def test_v_haslabel_has_filters_without_join(tiny):
    pg, person, *_ = tiny
    g = traversal(pg, num_partitions=2)
    out = g.V().hasLabel("person").has("age", P.gt(30)).to_pandas()
    want = person[person.age > 30].pid.sort_values().tolist()
    assert out.oid.tolist() == want
    assert (out.v_label == "person").all()
    # has() on a label lacking the property kills those traversers
    assert g.V().has("age", P.gt(0)).count() == 3  # posts have no 'age'
    # value predicates: eq / within / between / inside
    assert g.V().hasLabel("person").has("city", "a").count() == 2
    assert g.V().hasLabel("post").has("score", P.within(5, 9)).count() == 2
    assert g.V().hasLabel("post").has("score", P.between(1, 5)).count() == 2  # [1,5)
    assert g.V().hasLabel("post").has("score", P.inside(1, 9)).count() == 2  # (1,9)


def test_out_in_both_bag_multiplicity(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # out over both edge labels = union bag (multiplicity preserved)
    out = g.V().hasLabel("person").out().to_pandas()
    want = sorted(authored.q.tolist() + likes.q.tolist())
    assert out.oid.tolist() == want
    # in_ restricted to one label
    back = g.V().hasLabel("post").in_("likes").to_pandas()
    assert back.oid.tolist() == sorted(likes.p.tolist())
    # both from one person: out-edges + in-edges (person 1 has no in-edges)
    b = g.V(1).both().to_pandas()
    assert b.oid.tolist() == sorted(
        authored[authored.p == 1].q.tolist() + likes[likes.p == 1].q.tolist()
    )


def test_two_hop_values_and_groupcount(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # person --likes--> post, filtered, project score values (bag)
    vals = g.V().hasLabel("person").has("age", P.gte(35)).out("likes").values("score")
    merged = person[person.age >= 35].merge(likes, left_on="pid", right_on="p").merge(
        post, left_on="q", right_on="post_id"
    )
    assert vals.to_pandas()["value"].tolist() == sorted(merged.score.tolist())
    gc = vals.groupCount()
    want = merged.groupby("score").size().reset_index(name="count").rename(columns={"score": "value"})
    pd.testing.assert_frame_equal(
        gc.astype({"count": np.int64}),
        want.sort_values("value").reset_index(drop=True).astype({"count": np.int64}),
        check_dtype=False,
    )


def test_post_hop_has_joins_property_back(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # has() AFTER a hop: join the property in, keep the bag
    out = g.V().hasLabel("person").out("likes").has("score", P.gt(4)).to_pandas()
    merged = likes.merge(post, left_on="q", right_on="post_id")
    assert out.oid.tolist() == sorted(merged[merged.score > 4].q.tolist())


def test_dedup_and_hasid(tiny):
    pg, *_ = tiny
    g = traversal(pg, num_partitions=2)
    bag = g.V().hasLabel("post").in_().out()  # posts of authors-or-likers: dup-heavy
    assert bag.count() > bag.dedup().count()
    d = bag.dedup().to_pandas()
    assert d.oid.is_unique
    assert g.V(1, 3).to_pandas().oid.tolist() == [1, 3]


def test_edge_frontier_and_endpoints(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    e = g.V().hasLabel("person").has("age", P.lt(40)).outE("likes")
    kept = likes.merge(person[person.age < 40], left_on="p", right_on="pid")
    assert e.count() == len(kept)
    # edge property filter + values
    assert e.has("w", P.gte(1.0)).count() == (kept.w >= 1.0).sum()
    assert e.values("w").to_pandas()["value"].tolist() == sorted(kept.w.tolist())
    # inV / outV
    assert e.inV().to_pandas().oid.tolist() == sorted(kept.q.tolist())
    assert e.outV().dedup().to_pandas().oid.tolist() == sorted(kept.p.unique().tolist())


def test_subgraph_materializes_property_graph(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    sub = g.V().hasLabel("person").has("age", P.gt(30)).outE().subgraph("s")
    assert isinstance(sub, PropertyGraph)
    old = person[person.age > 30]
    kept_a = authored.merge(old, left_on="p", right_on="pid")
    kept_l = likes.merge(old, left_on="p", right_on="pid")
    ea = sub.edge_table("authored").to_pandas().sort_values(["src_oid", "dst_oid"])
    assert list(map(tuple, ea[["src_oid", "dst_oid"]].to_numpy())) == sorted(
        zip(kept_a.p, kept_a.q)
    )
    # vertices carry their parent properties
    pv = sub.vertex_table("person").to_pandas().sort_values("oid")
    assert pv.oid.tolist() == sorted(set(kept_a.p) | set(kept_l.p))
    assert set(pv.columns) == {"oid", "age", "city"}
    qv = sub.vertex_table("post").to_pandas()
    assert set(qv.oid) == set(kept_a.q) | set(kept_l.q)
    # edge props survive; edges are deduplicated in the subgraph
    el = sub.edge_table("likes").to_pandas()
    assert set(el.columns) == {"src_oid", "dst_oid", "w"}
    # traversing the SUBGRAPH works (it is a first-class PropertyGraph)
    g2 = traversal(sub, num_partitions=2)
    assert g2.V().hasLabel("person").count() == pv.oid.nunique()


def test_run_gremlin_string_surface(tiny):
    pg, person, post, authored, likes = tiny
    n = run_gremlin(pg, "g.V().hasLabel('person').has('age', P.gt(30)).out('likes').count()")
    assert n == len(likes.merge(person[person.age > 30], left_on="p", right_on="pid"))
    # `.in(` keyword rewrite
    m = run_gremlin(pg, "g.V().hasLabel('post').in('authored').dedup().count()")
    assert m == authored.p.nunique()
    sub = run_gremlin(pg, "g.V().hasId(2).outE('likes').subgraph('s')")
    assert sub.edge_table("likes").count() == (likes.p == 2).sum()
    with pytest.raises(ValueError):
        run_gremlin(pg, "import os")


def test_unsupported_steps_raise(tiny):
    pg, *_ = tiny
    g = traversal(pg, num_partitions=2)
    with pytest.raises(GremlinUnsupported):
        g.V().union()
    with pytest.raises(GremlinUnsupported):
        g.V().hasLabel("person").outE().otherV()
    with pytest.raises(GremlinUnsupported):
        g.V().subgraph()  # vertex frontier cannot materialize edges
    with pytest.raises(GremlinUnsupported):
        g.E().groupCount()


def test_limit_takes_n_traversers(tiny):
    pg, *_ = tiny
    g = traversal(pg, num_partitions=2)
    assert g.V().limit(4).count() == 4
    assert g.V().hasLabel("person").values("age").limit(2).count() == 2


# ---------------------------------------------------------------------------
# round-5 branching subset: repeat / union / __ / order-range / where


def test_repeat_times_is_khop_composition(tiny):
    from graphscope_ray.graph.gremlin import __

    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # repeat(out()).times(1) == out(); times(2) on this bipartite graph dies
    got1 = g.V().hasLabel("person").repeat(__.out("authored")).times(1).to_pandas()
    want1 = g.V().hasLabel("person").out("authored").to_pandas()
    pd.testing.assert_frame_equal(got1, want1)
    assert g.V().hasLabel("person").repeat(__.out("authored")).times(2).count() == 0
    # times(0) is the identity
    assert g.V().hasLabel("person").repeat(__.out()).times(0).count() == 3
    # until() is the documented boundary
    with pytest.raises(GremlinUnsupported):
        g.V().repeat(__.out()).until(None)


def test_repeat_emit_unions_rounds(tiny):
    from graphscope_ray.graph.gremlin import __

    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    got = g.V().hasLabel("person").repeat(__.out()).emit().times(2).to_pandas()
    # round 1: authored ∪ likes targets (bag); round 2: empty (posts have no out)
    r1 = pd.concat([authored.q, likes.q])
    want = pd.DataFrame({"v_label": "post", "oid": sorted(r1)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_union_adds_bags(tiny):
    from graphscope_ray.graph.gremlin import __

    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    got = (
        g.V().hasLabel("person").has("age", P.gt(30))
        .union(__.out("authored"), __.out("likes"), __.out("likes"))
        .groupCount()
    )
    base = pd.concat([
        authored[authored.p.isin([2, 3])].q,
        likes[likes.p.isin([2, 3])].q,
        likes[likes.p.isin([2, 3])].q,
    ])
    want = base.value_counts().sort_index()
    assert dict(zip(got.oid, got["count"])) == want.to_dict()
    # mixed frontier kinds refuse loudly
    with pytest.raises(GremlinUnsupported):
        g.V().hasLabel("person").union(__.out(), __.outE())


def test_order_by_range_deterministic(tiny):
    from graphscope_ray.graph.gremlin import Order

    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # post scores desc: 12(9), 10(5), 13(3), 11(1)
    got = g.V().hasLabel("post").order().by("score", Order.desc).range(1, 3).to_pandas()
    assert got.oid.tolist() == [10, 13]
    # asc with limit
    got2 = g.V().hasLabel("post").order().by("score").limit(2).to_pandas()
    assert got2.oid.tolist() == [11, 13]
    # hi=-1 → to the end
    got3 = g.V().hasLabel("post").order().by("score").range(2, -1).to_pandas()
    assert sorted(got3.oid.tolist()) == [10, 12]
    # value frontier ordering
    vals = g.V().hasLabel("post").values("score").order().range(1, 3).toList()
    assert vals == [3, 5]
    # range without order is not deterministic → boundary
    with pytest.raises(GremlinUnsupported):
        g.V().range(0, 2)


def test_where_exists_semijoin(tiny):
    from graphscope_ray.graph.gremlin import __

    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    # persons who like a post with score > 4: likes → (1→12:9, 2→10:5, 3→10:5)
    got = g.V().hasLabel("person").where(
        __.out("likes").has("score", P.gt(4))
    ).to_pandas()
    assert got.oid.tolist() == [1, 2, 3]
    got2 = g.V().hasLabel("person").where(
        __.out("likes").has("score", P.gt(5))
    ).to_pandas()
    assert got2.oid.tolist() == [1]
    # multiplicity of the ORIGINAL frontier is preserved (bag in, bag out)
    bag = g.V().hasLabel("person").out("authored").in_("authored")  # person bag with repeats
    n_before = bag.count()
    kept = bag.where(__.out("likes")).count()
    assert kept == n_before  # every person likes something
    # edge-frontier where-target works (outE terminal in the sub)
    got3 = g.V().hasLabel("person").where(__.outE("likes")).count()
    assert got3 == 3
    with pytest.raises(GremlinUnsupported):
        g.V().where(__.out().where(__.out()))  # nested where


def test_run_gremlin_branching_script_surface(tiny):
    pg, person, post, authored, likes = tiny
    n = run_gremlin(
        pg,
        "g.V().hasLabel('person').union(__.out('authored'), __.out('likes')).count()",
        num_partitions=2,
    )
    assert n == len(authored) + len(likes)
    vals = run_gremlin(
        pg,
        "g.V().hasLabel('post').order().by('score', Order.desc).limit(2).values('score').toList()",
        num_partitions=2,
    )
    assert vals == [5, 9]


def test_value_aggregates(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    vals = g.V().hasLabel("post").values("score")
    assert vals.sum_() == float(post.score.sum())
    assert vals.mean_() == float(post.score.mean())
    assert vals.max_() == float(post.score.max())
    assert vals.min_() == float(post.score.min())
    # spelled like gremlin-python too, and through the script surface
    assert g.V().hasLabel("post").values("score").sum() == float(post.score.sum())
    got = run_gremlin(pg, "g.V().hasLabel('post').values('score').mean()",
                      num_partitions=2)
    assert got == float(post.score.mean())
    with pytest.raises(GremlinUnsupported):
        g.V().sum_()  # needs a value frontier


def test_with_path_linear_tracking(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2).withPath()
    got = g.V().hasLabel("person").has("age", P.gt(30)).out("likes").path()
    want = likes[likes.p.isin([2, 3])].rename(columns={"p": "p0", "q": "p1"})
    want = want.assign(v_label="post")[["v_label", "p0", "p1"]]
    want = want.sort_values(["v_label", "p0", "p1"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # dedup under withPath = distinct PATHS; count = path multiplicity
    assert g.V().hasLabel("person").out("authored").path().shape == (4, 3)
    # boundaries: path() off-source, values/order/union/where under withPath
    with pytest.raises(GremlinUnsupported):
        traversal(pg, num_partitions=2).V().out().path()
    with pytest.raises(GremlinUnsupported):
        g.V().hasLabel("person").out("likes").values("score")
    with pytest.raises(GremlinUnsupported):
        g.V().hasLabel("person").outE("likes")


def test_as_select_projection(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    got = g.V().hasLabel("person").as_("p").out("likes").as_("q").select("p", "q")
    want = likes.rename(columns={"p": "p", "q": "q"})[["p", "q"]]
    want = want.sort_values(["p", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # single-label select; filters after as_ shrink the projection
    got2 = (g.V().hasLabel("person").as_("p").out("likes")
            .has("score", P.gt(4)).select("p"))
    assert got2["p"].tolist() == [1, 2, 3]
    with pytest.raises(ValueError):
        g.V().hasLabel("person").select("nope")
    with pytest.raises(ValueError):
        g.V().hasLabel("person").as_("x").as_("x")


def test_coin_deterministic(tiny):
    pg, person, post, authored, likes = tiny
    g = traversal(pg, num_partitions=2)
    a = g.V().hasLabel("post").coin(0.5, salt=1).to_pandas()
    b = g.V().hasLabel("post").coin(0.5, salt=1).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # content-stable flips
    assert 0 <= len(a) <= 4
    assert g.V().coin(1.0).count() == 7  # p=1 keeps everything
    assert g.V().coin(0.0).count() == 0
    with pytest.raises(ValueError):
        g.V().coin(1.5)
