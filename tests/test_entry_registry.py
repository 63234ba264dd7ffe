"""Driver-contract consistency: queries()/oracle_sql() registries stay sane
(every oracle names a registered query, every callable is invocable, entry()
runs and returns rows — the same smoke the driver performs)."""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = sorted(set(oracles) - set(qs))
    assert not missing, f"oracles without queries: {missing}"


def test_registry_shape():
    qs = entrymod.queries()
    assert len(qs) >= 138
    assert all(callable(fn) for fn in qs.values())
    oracles = entrymod.oracle_sql()
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # rows-only queries are the documented non-SQL-expressible set
    rows_only = sorted(set(qs) - set(oracles))
    assert set(rows_only) <= {
        "lg_dfs",
        "lg_louvain",
        "sim_ivf_topk",
        "multimodal_features",
        "jpeg_features",
        "video_features",
        "repos_flagship",
        "text_bpe_train",
        "text_bpe_encode",
        "emb_pca",  # eigendecomposition — covariance gated via emb_covariance
    }, rows_only


def test_entry_smoke():
    out = entrymod.entry()
    import pandas as pd
    import ray.data

    if isinstance(out, ray.data.Dataset):
        out = out.to_pandas()
    assert isinstance(out, pd.DataFrame)
    assert len(out) >= 0 and len(out.columns) > 0
