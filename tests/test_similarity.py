"""Similarity-search operators vs numpy oracles."""

import pytest

@pytest.mark.parametrize("P", [1, 3])
def test_range_cosine_vs_numpy(P):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.similarity import range_cosine

    rng = np.random.RandomState(9)
    n, d = 200, 16
    X = rng.randn(n, d)
    t = pa.table(
        {"vec_id": pa.array(range(n), pa.int64()),
         "embedding": pa.array([list(map(float, r)) for r in X])}
    )
    Q = X[:3]
    out = (
        range_cosine(ray.data.from_arrow(t).repartition(P), Q, np.arange(3), tau=0.4)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ Xn.T
    want = {(q, v): sims[q, v] for q, v in zip(*np.nonzero(sims >= 0.4))}
    got = {(int(r.query_id), int(r.vec_id)): r.score for r in out.itertuples()}
    assert set(got) == set(want)
    for kk in want:
        assert abs(got[kk] - want[kk]) < 1e-9
    # self-matches present at sim 1
    for q in range(3):
        assert (q, q) in got
