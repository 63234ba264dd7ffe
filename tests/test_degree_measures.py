"""reciprocity / avg_neighbor_degree / s_metric vs networkx on seeded random
graphs, at two partition counts (parallelism invariance)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.graph.metrics import avg_neighbor_degree, reciprocity, s_metric


def _rand_arcs(n=50, m=260, seed=7):
    """Distinct directed self-loop-free arcs, with reciprocated pairs
    guaranteed present (every 5th arc also inserts its reverse)."""
    rng = np.random.RandomState(seed)
    e = rng.randint(0, n, size=(m, 2))
    e = e[e[:, 0] != e[:, 1]]
    arcs = {(int(a), int(b)) for a, b in e}
    arcs |= {(b, a) for i, (a, b) in enumerate(sorted(arcs)) if i % 5 == 0}
    return sorted(arcs), n


def _tbl(edges):
    return pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("seed", [7, 19])
def test_reciprocity_vs_networkx(P, seed):
    nx = pytest.importorskip("networkx")
    arcs, n = _rand_arcs(seed=seed)
    # duplicate some input rows: the operator must distinct first
    ds = ray.data.from_arrow(_tbl(arcs + arcs[:17])).repartition(max(P, 1))
    got = reciprocity(ds, num_partitions=P)

    G = nx.DiGraph()
    G.add_edges_from(arcs)
    assert got["n_edges"] == G.number_of_edges()
    assert abs(got["reciprocity"] - nx.overall_reciprocity(G)) < 1e-8
    # n_reciprocated is the arc count on both-direction pairs
    both = sum(1 for a, b in arcs if (b, a) in set(arcs))
    assert got["n_reciprocated"] == both


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("seed", [7, 19])
def test_avg_neighbor_degree_vs_networkx(P, seed):
    nx = pytest.importorskip("networkx")
    arcs, n = _rand_arcs(seed=seed)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = avg_neighbor_degree(ds, num_partitions=P).to_pandas()
    mine = dict(zip(got["oid"].tolist(), got["avg_nbr_deg"].tolist()))

    G = nx.Graph()
    G.add_edges_from(arcs)
    want = nx.average_neighbor_degree(G)
    assert set(mine) == set(want)
    for v, a in want.items():
        assert abs(mine[v] - round(a, 8)) < 1e-7, (v, mine[v], a)


@pytest.mark.parametrize("P", [1, 3])
def test_s_metric_exact(P):
    arcs, n = _rand_arcs(seed=3)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = s_metric(ds, num_partitions=P)

    und = {(min(a, b), max(a, b)) for a, b in arcs}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = sum(deg[a] * deg[b] for a, b in und)
    assert got == want


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("cap", [None, 4])
def test_bipartite_projection_vs_networkx(P, cap):
    nx = pytest.importorskip("networkx")
    from graphscope_ray.graph.metrics import bipartite_projection

    rng = np.random.RandomState(13)
    # vias 0..59 (fanout ~2-6 so cap=4 keeps some, drops some); ontos
    # 100..129; duplicate rows exercise the distinct
    via = rng.randint(0, 60, 200)
    onto = rng.randint(100, 130, 200)
    t = pa.table(
        {"via": pa.array(via, pa.int64()), "onto": pa.array(onto, pa.int64())}
    )
    ds = ray.data.from_arrow(t).repartition(max(P, 1))
    got = bipartite_projection(ds, "via", "onto", num_partitions=P, max_fanout=cap)
    got = got.to_pandas()
    if "a" not in got.columns:
        got = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "weight": pa.array([], pa.int64())}
        ).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)

    pairs = {(int(v), int(o)) for v, o in zip(via, onto)}
    if cap is not None:
        fan = {}
        for v, _o in pairs:
            fan[v] = fan.get(v, 0) + 1
        pairs = {(v, o) for v, o in pairs if fan[v] <= cap}
    B = nx.Graph()
    B.add_edges_from((("v", v), ("o", o)) for v, o in pairs)
    ontos = {n for n in B if n[0] == "o"}
    W = nx.bipartite.weighted_projected_graph(B, ontos)
    want = {
        (min(a[1], b[1]), max(a[1], b[1])): d["weight"]
        for a, b, d in W.edges(data=True)
    }
    mine = {
        (int(r["a"]), int(r["b"])): int(r["weight"]) for _, r in got.iterrows()
    }
    assert mine == want


@pytest.mark.parametrize("P", [1, 4])
def test_salsa_vs_python(P):
    from graphscope_ray.graph.metrics import salsa

    arcs, n = _rand_arcs(seed=29)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = salsa(ds, iters=4, num_partitions=P).to_pandas()
    mine = {int(r["oid"]): (r["auth"], r["hub"]) for _, r in got.iterrows()}

    verts = sorted({v for a in arcs for v in a})
    od, idg = {}, {}
    for a, b in arcs:
        od[a] = od.get(a, 0) + 1
        idg[b] = idg.get(b, 0) + 1
    hub = {v: 1.0 / len(verts) for v in verts}
    for _ in range(4):
        ra = {}
        for a, b in arcs:
            ra[b] = ra.get(b, 0.0) + hub[a] / od[a]
        t = sum(ra.values())
        auth = {v: (ra.get(v, 0.0) / t if t else 0.0) for v in verts}
        rh = {}
        for a, b in arcs:
            rh[a] = rh.get(a, 0.0) + auth[b] / idg[b]
        t = sum(rh.values())
        hub = {v: (rh.get(v, 0.0) / t if t else 0.0) for v in verts}
    assert set(mine) == set(verts)
    for v in verts:
        assert abs(mine[v][0] - auth[v]) < 1e-7, (v, "auth")
        assert abs(mine[v][1] - hub[v]) < 1e-7, (v, "hub")
    # L1 normalization holds
    assert abs(sum(a for a, _h in mine.values()) - 1.0) < 1e-6


@pytest.mark.parametrize("P", [1, 3])
def test_disparity_filter_vs_python(P):
    from graphscope_ray.graph.metrics import disparity_filter

    rng = np.random.RandomState(41)
    arcs, _ = _rand_arcs(seed=41)
    w = rng.randint(1, 9, len(arcs))
    t = pa.table(
        {
            "src": pa.array([a for a, _b in arcs], pa.int64()),
            "dst": pa.array([b for _a, b in arcs], pa.int64()),
            "weight": pa.array(w, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(max(P, 1))
    got = disparity_filter(ds, num_partitions=P).to_pandas()
    mine = {(int(r["src"]), int(r["dst"])): r["alpha"] for _, r in got.iterrows()}

    s, k = {}, {}
    for (a, _b), wt in zip(arcs, w):
        s[a] = s.get(a, 0) + int(wt)
        k[a] = k.get(a, 0) + 1
    for (a, b), wt in zip(arcs, w):
        want = (1.0 - wt / s[a]) ** (k[a] - 1) if k[a] > 1 else 1.0
        assert abs(mine[(a, b)] - round(want, 8)) < 1e-9, (a, b)
    assert len(mine) == len(arcs)


@pytest.mark.parametrize("P", [1, 4])
def test_degree_hist_and_gini(P):
    from graphscope_ray.graph.metrics import degree_gini, degree_histogram

    arcs, n = _rand_arcs(seed=17)
    und = {(min(a, b), max(a, b)) for a, b in arcs}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))

    hist = degree_histogram(ds, num_partitions=P).to_pandas()
    want_hist = {}
    for d in deg.values():
        want_hist[d] = want_hist.get(d, 0) + 1
    got_hist = dict(zip(hist["degree"].tolist(), hist["n_vertices"].tolist()))
    assert got_hist == want_hist

    g = degree_gini(ds, num_partitions=P)
    ds_sorted = sorted(deg.values())
    nn = len(ds_sorted)
    sd = sum(ds_sorted)
    want = 2.0 * sum((i + 1) * d for i, d in enumerate(ds_sorted)) / (nn * sd) - (nn + 1.0) / nn
    assert g["n_vertices"] == nn
    assert abs(g["gini"] - round(want, 8)) < 1e-9


@pytest.mark.parametrize("P", [1, 4])
def test_directed_assortativity_vs_networkx(P):
    nx = pytest.importorskip("networkx")
    from graphscope_ray.graph.metrics import directed_assortativity

    arcs, n = _rand_arcs(seed=47)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = directed_assortativity(ds, num_partitions=P)
    mine = {(r["x_deg"], r["y_deg"]): r["r"] for _, r in got.iterrows()}

    G = nx.DiGraph()
    G.add_edges_from(arcs)
    for cx in ("out", "in"):
        for cy in ("out", "in"):
            want = nx.degree_assortativity_coefficient(G, x=cx, y=cy)
            assert abs(mine[(cx, cy)] - want) < 1e-7, (cx, cy, mine[(cx, cy)], want)
    assert (got["n_edges"] == G.number_of_edges()).all()


@pytest.mark.parametrize("P", [1, 4])
def test_seeded_lpa_vs_python(P):
    from graphscope_ray.graph.metrics import seeded_lpa

    arcs, n = _rand_arcs(seed=53)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = seeded_lpa(ds, seed_mod=5, n_classes=3, rounds=4, num_partitions=P)
    mine = dict(
        zip(got.to_pandas()["oid"].tolist(), got.to_pandas()["label"].tolist())
    )

    nbrs = {}
    for a, b in arcs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    lab = {v: (v % 3 if v % 5 == 0 else -1) for v in nbrs}
    for _ in range(4):
        new = {}
        for v in nbrs:
            if v % 5 == 0:
                new[v] = v % 3
                continue
            counts = {}
            for u in nbrs[v]:
                if lab[u] >= 0:
                    counts[lab[u]] = counts.get(lab[u], 0) + 1
            if counts:
                new[v] = min(counts, key=lambda c: (-counts[c], c))
            else:
                new[v] = lab[v]
        lab = new
    assert mine == lab


@pytest.mark.parametrize("P", [1, 4])
def test_two_hop_sizes_vs_python(P):
    from graphscope_ray.graph.metrics import two_hop_sizes

    arcs, n = _rand_arcs(seed=61)
    ds = ray.data.from_arrow(_tbl(arcs)).repartition(max(P, 1))
    got = two_hop_sizes(ds, num_partitions=P).to_pandas()
    mine = dict(zip(got["oid"].tolist(), got["n_within_2"].tolist()))

    out = {}
    for a, b in arcs:
        out.setdefault(a, set()).add(b)
    want = {}
    for a in out:
        ball = set(out[a])
        for b in out[a]:
            ball |= out.get(b, set())
        ball.discard(a)
        want[a] = len(ball)
    assert mine == want


@pytest.mark.parametrize("P", [1, 4])
def test_weighted_clustering_vs_python(P):
    from graphscope_ray.graph.metrics import weighted_clustering

    rng = np.random.RandomState(67)
    arcs, _n = _rand_arcs(n=30, m=200, seed=67)  # dense enough for triangles
    w = rng.randint(1, 6, len(arcs))
    t = pa.table(
        {
            "src": pa.array([a for a, _b in arcs], pa.int64()),
            "dst": pa.array([b for _a, b in arcs], pa.int64()),
            "weight": pa.array(w, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(max(P, 1))
    got = weighted_clustering(ds, num_partitions=P).to_pandas()
    mine = dict(zip(got["oid"].tolist(), got["cw"].tolist()))

    # Barrat reference: undirected pair weight = sum of both arc weights
    pw = {}
    for (a, b), wt in zip(arcs, w):
        key = (min(a, b), max(a, b))
        pw[key] = pw.get(key, 0) + int(wt)
    nbrs = {}
    for (a, b), wt in pw.items():
        nbrs.setdefault(a, {})[b] = wt
        nbrs.setdefault(b, {})[a] = wt
    want = {}
    for u in nbrs:
        k = len(nbrs[u])
        s = sum(nbrs[u].values())
        if k < 2:
            want[u] = 0.0
            continue
        num = 0
        ns = sorted(nbrs[u])
        for i, v in enumerate(ns):
            for x in ns[i + 1 :]:
                if x in nbrs[v]:
                    num += nbrs[u][v] + nbrs[u][x]
        want[u] = round(num / (2.0 * s * (k - 1)), 8)
    assert set(mine) == set(want)
    for u in want:
        assert abs(mine[u] - want[u]) < 1e-9, u
    assert any(v > 0 for v in want.values())  # the fixture has triangles


@pytest.mark.parametrize("P", [1, 4])
def test_onnela_clustering_vs_networkx(P):
    nx = pytest.importorskip("networkx")
    from graphscope_ray.graph.metrics import weighted_clustering

    rng = np.random.RandomState(71)
    arcs, _n = _rand_arcs(n=30, m=200, seed=71)
    w = rng.randint(1, 6, len(arcs))
    t = pa.table(
        {
            "src": pa.array([a for a, _b in arcs], pa.int64()),
            "dst": pa.array([b for _a, b in arcs], pa.int64()),
            "weight": pa.array(w, pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(max(P, 1))
    got = weighted_clustering(ds, num_partitions=P, formula="onnela").to_pandas()
    mine = dict(zip(got["oid"].tolist(), got["cw"].tolist()))

    G = nx.Graph()
    for (a, b), wt in zip(arcs, w):
        if G.has_edge(a, b):
            G[a][b]["weight"] += int(wt)
        else:
            G.add_edge(a, b, weight=int(wt))
    want = nx.clustering(G, weight="weight")
    assert set(mine) == set(want)
    for v, c in want.items():
        assert abs(mine[v] - c) < 1e-7, (v, mine[v], c)
    assert any(c > 0 for c in want.values())


def test_empty_inputs():
    empty = ray.data.from_arrow(_tbl([]))
    assert s_metric(empty, num_partitions=2) == 0
    r = reciprocity(empty, num_partitions=2)
    assert r["n_edges"] == 0 and r["reciprocity"] == 0.0
    assert avg_neighbor_degree(empty, num_partitions=2).to_pandas().empty
