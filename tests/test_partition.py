"""Locality/degree-aware partitioner (graph/partition.py): exact cyclic
balance, bijective relabeling, bit-parity of algorithm results vs hash
partitioning, and measured boundary-message reduction on a community
graph (the ×1.61 boundary-growth bound's counter-move)."""

import numpy as np
import pandas as pd
import pytest
import ray

from graphscope_ray.graph.partition import (
    affinity_assignment,
    boundary_message_entries,
    build_graph_locality,
    cyclic_targets,
    locality_mapping,
    relabel_edges,
)


def _community_edges(n_comm=4, size=50, intra=6, inter=1, seed=3):
    """Deterministic community graph: each vertex gets `intra` edges inside
    its community and `inter` outside."""
    rng = np.random.default_rng(seed)
    N = n_comm * size
    src, dst = [], []
    for v in range(N):
        c = v // size
        tgt_in = c * size + rng.integers(0, size, intra)
        tgt_out = rng.integers(0, N, inter)
        for t in np.concatenate([tgt_in, tgt_out]):
            if t != v:
                src.append(v)
                dst.append(int(t))
    df = pd.DataFrame({"src": np.array(src, np.int64), "dst": np.array(dst, np.int64)})
    return df.drop_duplicates().reset_index(drop=True), N


@pytest.fixture(scope="module")
def comm():
    import pyarrow as pa

    df, N = _community_edges()
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return ray.data.from_arrow(tbl).repartition(4).materialize(), df, N


def test_assignment_exact_cyclic_balance(comm):
    ds, df, N = comm
    P = 4
    asg = affinity_assignment(ds, N, P, rounds=2).to_pandas()
    assert len(asg) == N and sorted(asg["oid"]) == list(range(N))
    sizes = asg.groupby("part").size()
    want = cyclic_targets(N, P)
    for p in range(P):
        assert sizes.get(p, 0) == want[p], (p, dict(sizes), want)


def test_locality_mapping_bijection_and_owner(comm):
    ds, df, N = comm
    P = 4
    asg = affinity_assignment(ds, N, P, rounds=2)
    m = locality_mapping(asg, P).to_pandas()
    vids = np.sort(m["vid"].to_numpy())
    np.testing.assert_array_equal(vids, np.arange(N))
    # owner of the new vid is the assigned partition
    am = asg.to_pandas().merge(m, on="oid")
    assert ((am["vid"] % P) == am["part"]).all()


def test_relabeled_graph_is_isomorphic(comm):
    ds, df, N = comm
    P = 4
    asg = affinity_assignment(ds, N, P, rounds=2)
    m = locality_mapping(asg, P).materialize()
    rel = relabel_edges(ds, m).to_pandas()
    md = m.to_pandas().set_index("oid")["vid"]
    want = pd.DataFrame({"src": md.loc[df["src"]].to_numpy(),
                         "dst": md.loc[df["dst"]].to_numpy()})
    got = rel.sort_values(["src", "dst"]).reset_index(drop=True)
    want = want.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pagerank_and_wcc_parity_vs_hash(comm):
    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph

    ds, df, N = comm
    P = 4
    # hash-partitioned baseline
    gh = build_graph(ds, num_partitions=P, num_vertices=N)
    prh = alg.pagerank(gh, tol=1e-12, max_rounds=60)[0].to_pandas()
    # locality build + decode through the mapping
    gl = build_graph_locality(ds, num_partitions=P, num_vertices=N, rounds=2)
    prl = alg.pagerank(gl, tol=1e-12, max_rounds=60)[0].to_pandas()
    m = gl.vertices_ds.to_pandas()  # (oid = original id, vid = relabeled)
    prl = prl.merge(m, on="vid")[["oid", "score"]]
    both = prh.merge(prl, left_on="vid", right_on="oid", suffixes=("_h", "_l"))
    assert len(both) == N
    np.testing.assert_allclose(
        both["score_h"], both["score_l"], rtol=0, atol=1e-10
    )
    # WCC: same partition of vertices into components (canonical min-oid)
    ghu = build_graph(ds, num_partitions=P, num_vertices=N, view="undirected")
    wh = alg.wcc(ghu)[0].to_pandas()
    glu = build_graph_locality(ds, num_partitions=P, num_vertices=N, rounds=2,
                               view="undirected")
    wl = alg.wcc(glu)[0].to_pandas()
    wl = wl.merge(m, on="vid")
    # canonicalize both labelings to min-ORIGINAL-oid per component
    wl_canon = wl.groupby("comp")["oid"].transform("min")
    wl_map = dict(zip(wl["oid"], wl_canon))
    wh_canon = wh.groupby("comp")["vid"].transform("min")
    wh_map = dict(zip(wh["vid"], wh_canon))
    assert wl_map == wh_map


def test_boundary_entries_drop_on_community_graph(comm):
    ds, df, N = comm
    P = 4
    base = boundary_message_entries(ds, P)
    # hash init: LP must recover a large share of the community structure
    asg = affinity_assignment(ds, N, P, rounds=8)
    m = locality_mapping(asg, P).materialize()
    loc = boundary_message_entries(ds, P, mapping=m)
    assert loc["entries"] < 0.65 * base["entries"], (loc, base)
    assert loc["cross_arcs"] < 0.6 * base["cross_arcs"], (loc, base)
    # segmented init (ids carry the locality): near-optimal immediately
    asg2 = affinity_assignment(ds, N, P, rounds=2, init="segmented")
    m2 = locality_mapping(asg2, P).materialize()
    loc2 = boundary_message_entries(ds, P, mapping=m2)
    assert loc2["entries"] < 0.35 * base["entries"], (loc2, base)


def test_affinity_composes_with_hub_split(comm):
    """The verdict's exact recipe — hub-vertex SPLIT for the head,
    neighbor-affinity assignment for the tail: build_graph_locality passes
    hub_threshold through to the relabeled build; PageRank parity holds."""
    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph

    ds, df, N = comm
    P = 4
    gh = build_graph(ds, num_partitions=P, num_vertices=N)
    prh = alg.pagerank(gh, tol=1e-12, max_rounds=60)[0].to_pandas()
    gl = build_graph_locality(ds, num_partitions=P, num_vertices=N, rounds=2,
                              init="segmented", hub_threshold=5)
    import ray as _ray

    assert _ray.get(gl.actors[0].hub_tables.remote())[0] is not None
    prl = alg.pagerank(gl, tol=1e-12, max_rounds=60)[0].to_pandas()
    m = gl.vertices_ds.to_pandas()
    prl = prl.merge(m, on="vid")[["oid", "score"]]
    both = prh.merge(prl, left_on="vid", right_on="oid", suffixes=("_h", "_l"))
    assert len(both) == N
    np.testing.assert_allclose(both["score_h"], both["score_l"], rtol=0, atol=1e-10)
