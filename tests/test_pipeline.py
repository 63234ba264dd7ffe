"""Corpus generator, sha256 lineage invariant, mining + resolution, flagship."""

import hashlib

import numpy as np
import ray.data

from graphscope_ray.pipelines.linkgraph import flagship, mine_edges
from graphscope_ray.sources import generate_repos
from graphscope_ray.stages.ingest import lineage, with_sha256
from graphscope_ray.stages.mine import build_exports, mine_imports


def test_generator_deterministic():
    a = generate_repos(n_repos=30, seed=42)
    b = generate_repos(n_repos=30, seed=42)
    assert a.equals(b)
    c = generate_repos(n_repos=30, seed=43)
    assert not a.equals(c)


def test_sha256_invariant():
    t = generate_repos(n_repos=20, seed=1)
    ds = with_sha256(ray.data.from_arrow(t))
    df = lineage(ds).to_pandas()
    raw = t.to_pandas()
    merged = raw.merge(df, on=["repo", "path", "commit"])
    assert len(merged) == len(raw)
    for _, row in merged.head(25).iterrows():
        assert row["content_sha256"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_mining_resolves_only_real_modules():
    t = generate_repos(n_repos=30, seed=42)
    ds = ray.data.from_arrow(t)
    exports = build_exports(ds)
    assert exports["module"].is_unique
    imports = mine_imports(ds).to_pandas()
    assert len(imports) > 0
    edges = mine_edges(ds).to_pandas()
    repos = set(t["repo"].to_pylist())
    assert set(edges.src_oid) <= repos and set(edges.dst_oid) <= repos
    assert (edges.src_oid != edges.dst_oid).all()  # no self loops
    # stdlib noise must not resolve
    assert "os" not in set(exports["module"])


def test_resolve_join_path_matches_broadcast():
    """The distributed hash-join resolver (the >broadcast_limit universe
    fallback, VERDICT r3 #3) must emit the identical weighted edge set as
    the broadcast searchsorted resolver."""
    from graphscope_ray.stages.mine import resolve_edges

    t = generate_repos(n_repos=40, seed=7, clique_k=4)
    ds = ray.data.from_arrow(t)
    exports = build_exports(ds)
    imports = mine_imports(ds).materialize()

    def canon(d):
        return (
            d.to_pandas()
            .sort_values(["src_oid", "dst_oid"])
            .reset_index(drop=True)[["src_oid", "dst_oid", "weight"]]
        )

    bc = canon(resolve_edges(imports, exports))  # broadcast path
    jn = canon(resolve_edges(imports, exports, broadcast_limit=0))  # forced join path
    assert len(bc) > 0
    assert bc.equals(jn)


def test_planted_structure():
    t = generate_repos(n_repos=40, seed=42, clique_k=4, n_components=2)
    ds = ray.data.from_arrow(t)
    out = flagship(ds, num_partitions=3)
    # two disconnected components
    assert out.comp.nunique() == 2
    # the planted K4 clique yields triangles at repos 0..3
    from graphscope_ray.sources.repos import repo_name

    clique = [repo_name(i) for i in range(4)]
    sub = out[out.oid.isin(clique)]
    assert (sub.tri >= 1).all()
    # pagerank is a distribution
    assert abs(out.score.sum() - 1.0) < 1e-9


def test_flagship_parallelism_invariance():
    t = generate_repos(n_repos=25, seed=9)
    ds = ray.data.from_arrow(t)
    a = flagship(ds, num_partitions=1)
    b = flagship(ds, num_partitions=4)
    assert a.oid.tolist() == b.oid.tolist()
    assert np.allclose(a.score, b.score, atol=1e-9)
    assert a.comp.tolist() == b.comp.tolist()
    assert a.tri.tolist() == b.tri.tolist()
    assert a.label.tolist() == b.label.tolist()
