"""Perfect-hash vertex map (the reference's ``use_perfect_hash`` loader
knob, python/graphscope/framework/graph_builder.py:62): the MPHF must be a
bijection onto [0, n), stay far below the 8 B/key sorted-array footprint,
and a graph built on it must produce the same component PARTITION as the
rank-order build (labels differ — MPHF vids carry no order — so compare
via min-oid canonicalization)."""

import numpy as np
import pyarrow as pa
import pytest

import graphscope_ray.graph.algorithms as alg
from graphscope_ray.graph.build import build_graph_from_oids
from graphscope_ray.graph.phash import MinimalPerfectHash

import ray


@pytest.mark.parametrize("n", [0, 1, 2, 63, 64, 65, 1000, 50000])
def test_mphf_bijection(n):
    rng = np.random.RandomState(n + 5)
    keys = np.unique(rng.randint(-(2**62), 2**62, size=3 * n or 1).astype(np.int64))[:n]
    mph = MinimalPerfectHash.build(keys)
    out = mph.lookup(keys)
    assert np.array_equal(np.sort(out), np.arange(n))
    # singles re-queried agree with the batch answer
    if n:
        sub = rng.choice(n, min(n, 20), replace=False)
        assert np.array_equal(mph.lookup(keys[sub]), out[sub])


def test_mphf_rejects_duplicates():
    with pytest.raises(ValueError):
        MinimalPerfectHash.build(np.array([3, 3, 5], dtype=np.int64))


def test_mphf_memory_beats_sorted_array():
    keys = np.unique(np.random.RandomState(0).randint(0, 2**62, size=600_000))
    mph = MinimalPerfectHash.build(keys.astype(np.int64))
    assert mph.nbytes < keys.nbytes / 8  # ~0.7 B/key vs 8 B/key


def _edges():
    rng = np.random.RandomState(23)
    src = rng.choice(500, 4000).astype(np.int64) * 7  # sparse, non-dense oids
    dst = rng.choice(500, 4000).astype(np.int64) * 7
    keep = src != dst
    return pa.table(
        {"src_oid": pa.array(src[keep]), "dst_oid": pa.array(dst[keep])}
    )


def _canon_wcc(g):
    ds, _ = alg.wcc(g)
    df = ds.to_pandas().merge(g.vertices_ds.to_pandas(), on="vid")
    df["comp_oid"] = df.groupby("comp")["oid"].transform("min")
    return df[["oid", "comp_oid"]].sort_values("oid").reset_index(drop=True)


def test_phash_build_matches_rank_build():
    t = _edges()
    kw = dict(num_partitions=3, store_in_edges=True, dedup_edges=True)
    g_rank = build_graph_from_oids(ray.data.from_arrow(t), **kw)
    g_ph = build_graph_from_oids(ray.data.from_arrow(t), use_perfect_hash=True, **kw)
    assert g_ph.N == g_rank.N
    # vertex map is a bijection oid <-> vid over the same oid set
    m = g_ph.vertices_ds.to_pandas()
    assert sorted(m["vid"]) == list(range(g_ph.N))
    assert set(m["oid"]) == set(g_rank.vertices_ds.to_pandas()["oid"])
    pd_rank = _canon_wcc(g_rank)
    pd_ph = _canon_wcc(g_ph)
    assert pd_rank.equals(pd_ph)


def test_phash_rejects_string_oids():
    t = pa.table({"src_oid": pa.array(["a", "b"]), "dst_oid": pa.array(["b", "a"])})
    with pytest.raises(ValueError):
        build_graph_from_oids(
            ray.data.from_arrow(t), use_perfect_hash=True, num_partitions=2
        )
