"""Deterministic samplers (functions/sampling.py) vs python oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

@pytest.mark.parametrize("P", [1, 4])
def test_cap_per_stratum(P):
    from graphscope_ray.functions.sampling import cap_per_stratum, hash_u64

    n = 300
    langs = [["en", "fr", "de"][i % 3] for i in range(n)]
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "lang": pa.array(langs)}
    )
    got = (
        cap_per_stratum(ray.data.from_arrow(t).repartition(P), cap=7, salt=3)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    ids = np.arange(n, dtype=np.int64)
    hu = hash_u64(ids, 3)
    want = []
    for lang in ("de", "en", "fr"):
        members = [i for i in range(n) if langs[i] == lang]
        members.sort(key=lambda i: (int(hu[i]), i))
        want.extend(sorted(members[:7]))
    assert got.groupby("lang").size().tolist() == [7, 7, 7]
    assert got["doc_id"].tolist() == want
    # partition invariance is implied: same winners at P=1 and P=4
