"""Community-quality metrics: modularity / stats / contraction vs networkx."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


def _dsets(rng, n=80, m=400):
    e = pd.DataFrame(
        {"src": rng.integers(0, n, m).astype(np.int64),
         "dst": rng.integers(0, n, m).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    labels = pd.DataFrame({"oid": np.arange(n, dtype=np.int64),
                           "label": (np.arange(n) // 10).astype(np.int64)})
    eds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False)).repartition(4)
    lds = ray.data.from_arrow(pa.Table.from_pandas(labels, preserve_index=False)).repartition(3)
    return e, labels, eds, lds


def test_modularity_matches_networkx():
    import networkx as nx

    from graphscope_ray.graph.metrics import modularity_stats

    rng = np.random.default_rng(7)
    e, labels, eds, lds = _dsets(rng)
    out = modularity_stats(eds, lds)
    q = out.q_num.iloc[0] / out.q_den.iloc[0]

    g = nx.Graph()
    g.add_nodes_from(labels.oid)
    g.add_edges_from(zip(e.src, e.dst))
    comms = [set(labels[labels.label == c].oid) for c in sorted(labels.label.unique())]
    want = nx.algorithms.community.modularity(g, comms)
    assert abs(q - want) < 1e-12
    assert out.m.iloc[0] == g.number_of_edges()


def test_community_stats_and_conductance_match_networkx():
    import networkx as nx

    from graphscope_ray.graph.metrics import community_edge_stats

    rng = np.random.default_rng(9)
    e, labels, eds, lds = _dsets(rng)
    out = (
        community_edge_stats(eds, lds)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    g = nx.Graph()
    g.add_nodes_from(labels.oid)
    g.add_edges_from(zip(e.src, e.dst))
    lab = labels.set_index("oid")["label"]
    for _, r in out.iterrows():
        members = set(labels[labels.label == r.community].oid)
        cut = nx.cut_size(g, members)
        vol = nx.volume(g, members)
        intra = g.subgraph(members).number_of_edges()
        assert (r.cut, r.vol, r.intra) == (cut, vol, intra), r.community
        # conductance derives exactly
        if cut:
            assert abs(
                r.cut / min(r.vol, 2 * g.number_of_edges() - r.vol)
                - nx.conductance(g, members)
            ) < 1e-12


def test_contract_graph_matches_pandas():
    from graphscope_ray.graph.metrics import contract_graph

    rng = np.random.default_rng(13)
    e, labels, eds, lds = _dsets(rng)
    got = (
        contract_graph(eds, lds)
        .to_pandas()
        .sort_values(["csrc", "cdst"])
        .reset_index(drop=True)
    )
    lab = labels.set_index("oid")["label"]
    want = (
        pd.DataFrame({"csrc": e.src.map(lab), "cdst": e.dst.map(lab)})
        .groupby(["csrc", "cdst"], as_index=False)
        .size()
        .rename(columns={"size": "weight"})
        .astype(np.int64)
        .sort_values(["csrc", "cdst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_wl_colors_isomorphism_invariant_and_refining():
    from graphscope_ray.graph.metrics import wl_colors

    rng = np.random.default_rng(21)
    n = 60
    e = pd.DataFrame(
        {"src": rng.integers(0, n, 250).astype(np.int64),
         "dst": rng.integers(0, n, 250).astype(np.int64)}
    ).drop_duplicates()
    e = e[e.src != e.dst].reset_index(drop=True)
    ds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))

    out = wl_colors(ds.repartition(5), rounds=3).to_pandas().sort_values("oid")
    # partition invariance
    out2 = wl_colors(ds.repartition(1), rounds=3).to_pandas().sort_values("oid")
    pd.testing.assert_frame_equal(out.reset_index(drop=True), out2.reset_index(drop=True))

    # relabeling invariance: a vertex permutation permutes colors with it
    perm = rng.permutation(n).astype(np.int64)
    e2 = pd.DataFrame({"src": perm[e.src], "dst": perm[e.dst]})
    ds2 = ray.data.from_arrow(pa.Table.from_pandas(e2, preserve_index=False))
    outp = wl_colors(ds2.repartition(4), rounds=3).to_pandas().set_index("oid")["color"]
    base = out.set_index("oid")["color"]
    for v in base.index:
        assert outp.loc[perm[v]] == base.loc[v]

    # WL partition refines with rounds and is at least as fine as the
    # MULTIGRAPH degree (wl_colors runs over both arcs of each directed
    # edge, like the SQL `me` table — reciprocated pairs count twice)
    mdeg = (
        pd.concat([e.src, e.dst]).value_counts().to_dict()
    )
    one = wl_colors(ds, rounds=1).to_pandas().set_index("oid")["color"]
    classes = {}
    for v in one.index:
        classes.setdefault(one.loc[v], set()).add(mdeg[v])
    for degs in classes.values():
        assert len(degs) == 1  # same round-1 color ⇒ same multigraph degree
    # round-3 classes never merge round-1 classes
    three = out.set_index("oid")["color"]
    pairmap = {}
    for v in one.index:
        pairmap.setdefault(three.loc[v], set()).add(one.loc[v])
    for s in pairmap.values():
        assert len(s) == 1


def test_community_stats_rejects_partial_labels():
    import pytest

    from graphscope_ray.graph.metrics import community_edge_stats

    e = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    labels = pd.DataFrame({"oid": [1, 2], "label": [0, 0]})  # vertex 3 unlabeled
    eds = ray.data.from_arrow(pa.Table.from_pandas(e, preserve_index=False))
    lds = ray.data.from_arrow(pa.Table.from_pandas(labels, preserve_index=False))
    with pytest.raises(ValueError, match="labels cover 2 of 3"):
        community_edge_stats(eds, lds).materialize()


@pytest.mark.parametrize("P", [1, 3])
def test_cocitation_topk_vs_python(P):
    import itertools
    from collections import Counter

    import ray.data

    from graphscope_ray.graph.metrics import cocitation_topk

    rng = np.random.RandomState(3)
    e = rng.randint(0, 25, size=(150, 2))
    e = sorted({(int(a), int(b)) for a, b in e if a != b})
    t = pa.table(
        {"src": pa.array([x[0] for x in e], pa.int64()),
         "dst": pa.array([x[1] for x in e], pa.int64())}
    )
    got = (
        cocitation_topk(ray.data.from_arrow(t).repartition(P), k=3, cap=4)
        .to_pandas()
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )
    # python oracle with identical cap rule
    out_adj = {}
    for s, d in e:
        out_adj.setdefault(s, []).append(d)
    cnt = Counter()
    for s, ds in out_adj.items():
        for u, v in itertools.combinations(sorted(ds)[:4], 2):
            cnt[(u, v)] += 1
    per_u = {}
    for (u, v), c in cnt.items():
        per_u.setdefault(u, []).append((v, c))
        per_u.setdefault(v, []).append((u, c))
    want = []
    for u in sorted(per_u):
        ranked = sorted(per_u[u], key=lambda vc: (-vc[1], vc[0]))[:3]
        for r, (v, c) in enumerate(ranked, 1):
            want.append((u, v, c, r))
    assert [tuple(map(int, r)) for r in got[["u", "v", "cocit", "rnk"]].to_numpy()] == want


@pytest.mark.parametrize("P", [1, 3])
def test_sweep_cut_vs_python(P):
    import itertools

    import ray.data

    from graphscope_ray.graph.metrics import sweep_cut

    # two 5-cliques joined by one bridge edge (4,5)
    und = (
        [(a, b) for a, b in itertools.combinations(range(5), 2)]
        + [(a + 5, b + 5) for a, b in itertools.combinations(range(5), 2)]
        + [(4, 5)]
    )
    arcs = und + [(b, a) for a, b in und]
    at = pa.table(
        {"src": pa.array([x[0] for x in arcs], pa.int64()),
         "dst": pa.array([x[1] for x in arcs], pa.int64())}
    )
    # scores concentrated on community A
    sc = [1.0, 0.9, 0.8, 0.7, 0.6, 0.05, 0.04, 0.03, 0.02, 0.01]
    st = pa.table({"oid": pa.array(range(10), pa.int64()), "score": pa.array(sc)})
    got = sweep_cut(
        ray.data.from_arrow(st).repartition(P),
        ray.data.from_arrow(at).repartition(P),
        topk=10,
    )
    # python oracle
    deg = {v: sum(1 for s, _ in arcs if s == v) for v in range(10)}
    order = sorted(range(10), key=lambda v: (-round(sc[v], 8) / deg[v], v))
    m = len(arcs)
    S = set()
    for k, v in enumerate(order, 1):
        S.add(v)
        cut = sum(1 for s, d in arcs if s in S and d not in S)
        vol = sum(deg[x] for x in S)
        den = min(vol, m - vol)
        phi = round(cut / den, 8) if den > 0 else 0.0
        row = got[got.rnk == k].iloc[0]
        assert row.oid == v and row.cut == cut and row.vol == vol, (k, dict(row))
        assert abs(row.phi - phi) < 1e-12
    # the conductance minimum over non-degenerate prefixes (vol < m) is the
    # planted community boundary (k=5)
    nd = got[got.vol < m].set_index("rnk")
    assert nd["phi"].idxmin() == 5


def test_bibcoupling_duality():
    """Coupling on G must equal co-citation on G with arcs reversed."""
    import itertools
    from collections import Counter

    import ray.data

    from graphscope_ray.graph.metrics import cocitation_topk

    rng = np.random.RandomState(9)
    e = rng.randint(0, 20, size=(120, 2))
    e = sorted({(int(a), int(b)) for a, b in e if a != b})
    rev = [(b, a) for a, b in e]
    t = pa.table(
        {"src": pa.array([x[0] for x in rev], pa.int64()),
         "dst": pa.array([x[1] for x in rev], pa.int64())}
    )
    got = (
        cocitation_topk(ray.data.from_arrow(t).repartition(2), k=3, cap=5)
        .to_pandas()
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )
    # python oracle: group original edges by TARGET, pair the citers
    by_target = {}
    for s, d in e:
        by_target.setdefault(d, []).append(s)
    cnt = Counter()
    for w, citers in by_target.items():
        for u, v in itertools.combinations(sorted(citers)[:5], 2):
            cnt[(u, v)] += 1
    per_u = {}
    for (u, v), c in cnt.items():
        per_u.setdefault(u, []).append((v, c))
        per_u.setdefault(v, []).append((u, c))
    want = []
    for u in sorted(per_u):
        for r, (v, c) in enumerate(
            sorted(per_u[u], key=lambda vc: (-vc[1], vc[0]))[:3], 1
        ):
            want.append((u, v, c, r))
    assert [tuple(map(int, r)) for r in got[["u", "v", "cocit", "rnk"]].to_numpy()] == want


@pytest.mark.parametrize("P", [1, 3])
def test_adamic_adar_topk_vs_python(P):
    import itertools
    from collections import defaultdict

    import ray.data

    from graphscope_ray.graph.metrics import adamic_adar_topk
    from graphscope_ray.graph.minibatch import aa_weight_int

    rng = np.random.RandomState(6)
    e = rng.randint(0, 22, size=(130, 2))
    e = sorted({(int(a), int(b)) for a, b in e if a != b})
    t = pa.table(
        {"src": pa.array([x[0] for x in e], pa.int64()),
         "dst": pa.array([x[1] for x in e], pa.int64())}
    )
    got = (
        adamic_adar_topk(ray.data.from_arrow(t).repartition(P), k=3, cap=4)
        .to_pandas()
        .sort_values(["u", "rnk"])
        .reset_index(drop=True)
    )
    out_adj = defaultdict(list)
    for s, d in e:
        out_adj[s].append(d)
    aa = defaultdict(int)
    for s, ds in out_adj.items():
        if len(ds) < 2:
            continue
        w = int(aa_weight_int(len(ds)))
        for u, v in itertools.combinations(sorted(ds)[:4], 2):
            aa[(u, v)] += w
    per_u = defaultdict(list)
    for (u, v), c in aa.items():
        per_u[u].append((v, c))
        per_u[v].append((u, c))
    want = []
    for u in sorted(per_u):
        for r, (v, c) in enumerate(
            sorted(per_u[u], key=lambda vc: (-vc[1], vc[0]))[:3], 1
        ):
            want.append((u, v, c, r))
    assert [tuple(map(int, r)) for r in got[["u", "v", "aa", "rnk"]].to_numpy()] == want


@pytest.mark.parametrize("P", [1, 3])
def test_edge_embeddedness_vs_networkx(P):
    import networkx as nx
    import ray.data

    from graphscope_ray.graph.metrics import edge_embeddedness

    rng = np.random.RandomState(12)
    e = rng.randint(0, 18, size=(90, 2))
    canon = sorted({(min(int(a), int(b)), max(int(a), int(b))) for a, b in e if a != b})
    t = pa.table(
        {"src": pa.array([x[0] for x in canon], pa.int64()),
         "dst": pa.array([x[1] for x in canon], pa.int64())}
    )
    got = (
        edge_embeddedness(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    G = nx.Graph(canon)
    for r in got.itertuples():
        cn = len(list(nx.common_neighbors(G, r.src, r.dst)))
        assert r.support == cn, (r.src, r.dst, r.support, cn)
        assert r.local_bridge == int(cn == 0)
    assert len(got) == len(canon)


def test_edge_jaccard_vs_networkx():
    import networkx as nx
    import ray.data

    from graphscope_ray.graph.metrics import edge_jaccard

    rng = np.random.RandomState(15)
    e = rng.randint(0, 16, size=(80, 2))
    canon = sorted({(min(int(a), int(b)), max(int(a), int(b))) for a, b in e if a != b})
    t = pa.table(
        {"src": pa.array([x[0] for x in canon], pa.int64()),
         "dst": pa.array([x[1] for x in canon], pa.int64())}
    )
    got = (
        edge_jaccard(ray.data.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    G = nx.Graph(canon)
    assert len(got) == len(canon)
    for r in got.itertuples():
        cn = len(list(nx.common_neighbors(G, r.src, r.dst)))
        du, dv = G.degree(r.src), G.degree(r.dst)
        assert (r.support, r.du, r.dv) == (cn, du, dv)
        want = round(cn / (du + dv - cn), 8) if du + dv - cn > 0 else 0.0
        assert abs(r.jaccard - want) < 1e-12
