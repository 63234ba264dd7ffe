"""Deterministic k-hop fanout sampling (GNN minibatch loader primitive)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from graphscope_ray.functions.sampling import hash_u64
from graphscope_ray.graph.minibatch import khop_sample


def _brute(edges: pd.DataFrame, seeds, fanouts, salt, pair_mod):
    """Reference loop: per layer, per frontier vertex, the f smallest
    (hash, dst) out-edges."""
    frontier = np.unique(np.asarray(seeds, dtype=np.int64))
    rows = []
    for t, f in enumerate(fanouts):
        sub = edges[edges.src.isin(frontier)].copy()
        if sub.empty:
            break
        rank = hash_u64((sub.src * pair_mod + sub.dst).to_numpy(), salt + t)
        sub["rk"] = rank
        nxt = []
        for s, grp in sub.groupby("src"):
            g = grp.sort_values(["rk", "dst"], key=lambda c: c.to_numpy().view(np.uint64) if c.name == "rk" else c).head(f)
            for d in g.dst:
                rows.append((t, s, d))
                nxt.append(d)
        frontier = np.unique(np.asarray(nxt, dtype=np.int64))
    return (
        pd.DataFrame(rows, columns=["layer", "src", "dst"])
        .sort_values(["layer", "src", "dst"])
        .reset_index(drop=True)
    )


def test_khop_matches_bruteforce_and_is_partition_invariant():
    rng = np.random.default_rng(3)
    n = 2500
    e = pd.DataFrame(
        {"src": rng.integers(0, 200, n).astype(np.int64),
         "dst": rng.integers(0, 200, n).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    seeds = np.arange(0, 200, 13)
    t = pa.Table.from_pandas(e, preserve_index=False)

    got = (
        khop_sample(ray.data.from_arrow(t).repartition(7), seeds, [3, 2], salt=9, pair_mod=256)
        .to_pandas()
        .sort_values(["layer", "src", "dst"])
        .reset_index(drop=True)
    )
    want = _brute(e, seeds, [3, 2], salt=9, pair_mod=256)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))

    # partitioning must not change the sample (per-block partials are exact)
    got2 = (
        khop_sample(ray.data.from_arrow(t).repartition(2), seeds, [3, 2], salt=9, pair_mod=256)
        .to_pandas()
        .sort_values(["layer", "src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), got2.astype(np.int64))

    # fanout cap per (layer, src)
    per = got.groupby(["layer", "src"]).size()
    assert per[per.index.get_level_values(0) == 0].max() <= 3
    assert per[per.index.get_level_values(0) == 1].max() <= 2
    # layer-1 srcs are exactly drawn from layer-0 sampled dsts
    l0_dst = set(got[got.layer == 0].dst)
    assert set(got[got.layer == 1].src) <= l0_dst


def test_khop_empty_seed_and_dead_end():
    e = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))
    # seeds that hit nothing
    out = khop_sample(ds, np.array([99]), [4, 4], pair_mod=128).to_pandas()
    assert len(out) == 0
    # chain runs off the graph: layer 1 samples from {2}, layer 2 from {3} (none)
    out = khop_sample(ds, np.array([1]), [4, 4, 4], pair_mod=128).to_pandas()
    assert sorted(map(tuple, out[["layer", "src", "dst"]].to_numpy())) == [
        (0, 1, 2),
        (1, 2, 3),
    ]


def test_negative_sample_yields_nonedges_and_is_deterministic():
    from graphscope_ray.graph.minibatch import negative_sample

    rng = np.random.default_rng(21)
    n_uni = 64
    e = pd.DataFrame(
        {"src": rng.integers(0, n_uni, 600).astype(np.int64),
         "dst": rng.integers(0, n_uni, 600).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    verts = pd.DataFrame({"oid": np.unique(np.r_[e.src, e.dst])})
    eds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))
    vds = ray.data.from_arrow(pa.Table.from_pandas(verts, preserve_index=False))

    out = (
        negative_sample(eds.repartition(4), vds.repartition(3), n_uni, k=3, salt=2)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    true_pairs = set(zip(e.src, e.dst))
    # every emitted pair is a non-edge and not a self-loop, ids in-universe
    for s, d in zip(out.src, out.dst):
        assert (s, d) not in true_pairs and s != d and 0 <= d < n_uni
    # ≤ k per src, and (with m=2k+8 candidates on a sparse graph) == k
    per = out.groupby("src").size()
    assert per.max() <= 3
    assert per.min() == 3
    assert set(per.index) == set(verts.oid)
    # partition-invariant / deterministic
    out2 = (
        negative_sample(eds.repartition(1), vds.repartition(8), n_uni, k=3, salt=2)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    # brute-force replica: first k surviving hash candidates by i
    m = 2 * 3 + 8
    for v in verts.oid.to_numpy()[:20]:
        cand = (hash_u64(np.int64(v) * n_uni + np.arange(m, dtype=np.int64), 2) % n_uni).astype(int)
        keep = [d for i, d in enumerate(cand) if d != v and (v, d) not in true_pairs][:3]
        got = out[out.src == v].dst.tolist()
        assert sorted(got) == sorted(keep), v


def test_link_features_matches_bruteforce():
    from graphscope_ray.graph.minibatch import aa_weight_int, link_features

    rng = np.random.default_rng(5)
    e = pd.DataFrame(
        {"src": rng.integers(0, 60, 700).astype(np.int64),
         "dst": rng.integers(0, 60, 700).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    seeds = np.arange(0, 60, 7)
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))

    got = (
        link_features(ds.repartition(5), seeds, pair_mod=64, max_degree=16, min_cn=2)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )

    # brute force over the undirected simple graph
    adj: dict = {}
    for s, d in zip(e.src, e.dst):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    rows = []
    for u in sorted(adj):
        if u not in set(seeds):
            continue
        for v in sorted(adj):
            if v <= u:
                continue
            mids = [w for w in adj[u] & adj[v] if len(adj[w]) <= 16]
            cn = len(mids)
            if cn < 2:
                continue
            aaw = int(sum(int(aa_weight_int(len(adj[w]))) for w in mids))
            du, dv = len(adj[u]), len(adj[v])
            rows.append(
                (u, v, cn, aaw, round(cn / (du + dv - cn), 8), du * dv,
                 int(v in adj[u]))
            )
    want = pd.DataFrame(
        rows, columns=["u", "v", "cn", "aa_e12", "jaccard", "pref", "is_edge"]
    )
    pd.testing.assert_frame_equal(got.astype({"jaccard": float}), want.astype({"jaccard": float}), check_dtype=False)

    # partition invariance
    got2 = (
        link_features(ds.repartition(1), seeds, pair_mod=64, max_degree=16, min_cn=2)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_neighbor_feature_sum_exact_and_partition_invariant():
    from graphscope_ray.graph.minibatch import neighbor_feature_sum

    rng = np.random.default_rng(8)
    n, d = 40, 5
    feat = rng.integers(-1000, 1000, (n, d)).astype(np.int64)
    e = pd.DataFrame(
        {"src": rng.integers(0, n, 300).astype(np.int64),
         "dst": rng.integers(0, n, 300).astype(np.int64)}
    ).drop_duplicates().reset_index(drop=True)
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))

    out = neighbor_feature_sum(
        ds.repartition(6), np.arange(n), feat
    ).to_pandas().sort_values("oid").reset_index(drop=True)

    scols = [f"s{j}" for j in range(d)]
    for _, r in out.iterrows():
        srcs = e[e.dst == r.oid].src.to_numpy()
        assert r["n"] == len(srcs)
        np.testing.assert_array_equal(r[scols].to_numpy().astype(np.int64), feat[srcs].sum(0))
    # every vertex with in-degree ≥ 1 appears
    assert set(out.oid) == set(e.dst.unique())

    out2 = neighbor_feature_sum(
        ds.repartition(1), np.arange(n), feat
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_hash_groupby_sum_multicol():
    from graphscope_ray.utils import hash_groupby_sum

    df = pd.DataFrame(
        {"k": ["a", "b", "a", "c", "b"], "x": [1, 2, 3, 4, 5], "y": [10.0, 20.0, 30.0, 40.0, 50.0]}
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    out = (
        hash_groupby_sum(ds, ["k"], ["x", "y"], ["sx", "sy"], num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k", as_index=False).agg(sx=("x", "sum"), sy=("y", "sum"))
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_metapath_sample_respects_path_and_matches_bruteforce():
    from graphscope_ray.graph.minibatch import metapath_sample
    from graphscope_ray.graph.property import PropertyGraph

    rng = np.random.default_rng(11)
    # bipartite-ish labeled graph: user -[buys]-> item -[madeby]-> brand
    users = pd.DataFrame({"uid": np.arange(20)})
    items = pd.DataFrame({"iid": np.arange(30)})
    brands = pd.DataFrame({"bid": np.arange(8)})
    buys = pd.DataFrame(
        {"u": rng.integers(0, 20, 200), "i": rng.integers(0, 30, 200)}
    )  # keep duplicates: multi-edges consume fanout slots per copy
    madeby = pd.DataFrame(
        {"i": rng.integers(0, 30, 60), "b": rng.integers(0, 8, 60)}
    ).drop_duplicates()
    pg = (
        PropertyGraph(directed=True)
        .add_vertices(users, "user", vid_field="uid")
        .add_vertices(items, "item", vid_field="iid")
        .add_vertices(brands, "brand", vid_field="bid")
        .add_edges(buys, "buys", src_label="user", dst_label="item",
                   src_field="u", dst_field="i")
        .add_edges(madeby, "madeby", src_label="item", dst_label="brand",
                   src_field="i", dst_field="b")
    )
    seeds = np.array([0, 3, 7, 19])
    got = (
        metapath_sample(pg, seeds, ["buys", "madeby"], [2, 3], salt=4, pair_mod=64)
        .to_pandas()
        .sort_values(["layer", "src", "dst"])
        .reset_index(drop=True)
    )

    # brute force, multi-edge aware
    def brute_layer(edf, frontier, f, salt_t):
        sub = edf[edf.src.isin(frontier)].copy()
        sub["rk"] = hash_u64((sub.src * 64 + sub.dst).to_numpy(np.int64), salt_t)
        rows = []
        for s, grp in sub.groupby("src"):
            g = grp.sort_values(
                ["rk", "dst"],
                key=lambda c: c.to_numpy().view(np.uint64) if c.name == "rk" else c,
            ).head(f)
            rows += [(s, d) for d in g.dst]
        return rows

    l0 = brute_layer(buys.rename(columns={"u": "src", "i": "dst"}), set(seeds), 2, 4)
    f1 = sorted({d for _, d in l0})
    l1 = brute_layer(madeby.rename(columns={"i": "src", "b": "dst"}), set(f1), 3, 5)
    want = pd.DataFrame(
        [(0, "buys", s, d) for s, d in l0] + [(1, "madeby", s, d) for s, d in l1],
        columns=["layer", "elabel", "src", "dst"],
    ).sort_values(["layer", "src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["layer", "elabel", "src", "dst"]].astype({"layer": np.int64}),
        want.astype({"layer": np.int64}),
        check_dtype=False,
    )
    # layer-0 fanout cap 2 per seed, layer-1 srcs drawn from layer-0 dsts
    per = got[got.layer == 0].groupby("src").size()
    assert per.max() <= 2
    assert set(got[got.layer == 1].src) <= set(got[got.layer == 0].dst)


def test_node2vec_walks_match_bruteforce_and_bias():
    from graphscope_ray.graph.minibatch import node2vec_walks

    rng = np.random.default_rng(31)
    n = 40
    e = pd.DataFrame(
        {"src": rng.integers(0, n, 260).astype(np.int64),
         "dst": rng.integers(0, n, 260).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))

    a, b, c, mod = 1103515245, 12345, 97, 2147483647
    wr, wc, wf = 1, 4, 2
    got = (
        node2vec_walks(ds.repartition(5), n_starts=10, length=3,
                       w_ret=wr, w_com=wc, w_far=wf)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )

    adj = {}
    eset = set(zip(e.src, e.dst))
    for s, d in zip(e.src, e.dst):
        adj.setdefault(s, []).append(d)
    rows = []
    for wid in range(10):
        prev = cur = wid
        rows.append((wid, 0, cur))
        for s in range(1, 4):
            nbrs = sorted(adj.get(cur, []))
            if not nbrs:
                break
            wts = [wr if x == prev else (wc if (prev, x) in eset else wf) for x in nbrs]
            r = ((a * wid + b * s + c * cur) % mod) % sum(wts)
            acc = 0
            for x, w in zip(nbrs, wts):
                acc += w
                if r < acc:
                    nxt = x
                    break
            rows.append((wid, s, nxt))
            prev, cur = cur, nxt
    want = pd.DataFrame(rows, columns=["walk_id", "step", "v"]).sort_values(
        ["walk_id", "step"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))

    # partition invariance
    got2 = (
        node2vec_walks(ds.repartition(1), n_starts=10, length=3,
                       w_ret=wr, w_com=wc, w_far=wf)
        .to_pandas()
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_node2vec_zero_weight_class_is_dead_end_not_crash():
    from graphscope_ray.graph.minibatch import node2vec_walks

    # star out of 0: all step-2 candidates from vertex 1 are 'far' (w_far=0)
    e = pd.DataFrame({"src": [0, 1, 1], "dst": [1, 5, 6]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))
    out = node2vec_walks(ds, n_starts=1, length=3, w_ret=0, w_com=4, w_far=0).to_pandas()
    # walk 0: step0=0, step1=1 ((0,1) is the only candidate, class com),
    # then candidates {5,6} are far (w=0) and 1 is not prev's neighbor — stop
    assert sorted(map(tuple, out[["step", "v"]].to_numpy())) == [(0, 0), (1, 1)]


def test_node2vec_collapses_multiedges():
    from graphscope_ray.graph.minibatch import node2vec_walks

    e1 = pd.DataFrame({"src": [0, 0, 1, 1], "dst": [1, 2, 2, 3]})
    e2 = pd.concat([e1, e1.iloc[[0, 2]]], ignore_index=True)  # duplicate rows
    d1 = ray.data.from_arrow(pa.Table.from_pandas(e1, preserve_index=False))
    d2 = ray.data.from_arrow(pa.Table.from_pandas(e2, preserve_index=False))
    o1 = node2vec_walks(d1, n_starts=2, length=3).to_pandas().sort_values(
        ["walk_id", "step"]).reset_index(drop=True)
    o2 = node2vec_walks(d2, n_starts=2, length=3).to_pandas().sort_values(
        ["walk_id", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o2)
