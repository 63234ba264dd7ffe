"""ML-prep operators (functions/mlprep.py) vs pure-python oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.functions.mlprep import bigram_counts, kmeans, standardize, tfidf


def _ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_tfidf():
    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["a b a", "a c", "b b b"]}
    )
    out = tfidf(_ds(docs), num_partitions=2).to_pandas()
    out = out.set_index(["doc_id", "tok"])
    assert out.loc[(0, "a"), "tf"] == 2
    # idf(a) = ln(3/2); tfidf(0, a) = 2 ln(1.5)
    np.testing.assert_allclose(out.loc[(0, "a"), "tfidf"], 2 * np.log(1.5))
    np.testing.assert_allclose(out.loc[(2, "b"), "tfidf"], 3 * np.log(3 / 2))
    np.testing.assert_allclose(out.loc[(1, "c"), "tfidf"], np.log(3.0))


def test_bigram_counts():
    docs = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b c", "b c", "x"]})
    out = bigram_counts(_ds(docs), num_partitions=2).to_pandas()
    got = dict(zip(out["bigram"], out["n"]))
    assert got == {"a b": 1, "b c": 2}


def test_standardize():
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"g": rng.choice(["p", "q"], 300), "value": rng.normal(2.0, 3.0, 300)}
    )
    out = standardize(_ds(df), "g", "value").to_pandas()
    for g, sub in out.groupby("g"):
        exp = (sub["value"] - df[df.g == g]["value"].mean()) / df[df.g == g]["value"].std(ddof=0)
        np.testing.assert_allclose(np.sort(sub["z"]), np.sort(exp), rtol=1e-9)


def test_kmeans_separated_clusters():
    rng = np.random.default_rng(9)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    X = np.concatenate([c + 0.1 * rng.normal(size=(50, 2)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(150), "embedding": list(X)})
    asg, C = kmeans(_ds(df), k=3, iters=5)
    out = asg.to_pandas().sort_values("vec_id")
    labels = out["cluster"].to_numpy()
    # each true cluster maps to exactly one learned label
    for i in range(3):
        assert len(set(labels[i * 50 : (i + 1) * 50])) == 1
    assert len(set(labels[::50])) == 3
    # centroids land near the true centers
    d = np.abs(np.sort(C[:, 0]) - np.sort(centers[:, 0])).max()
    assert d < 0.5


def test_profile_table_with_nulls():
    from graphscope_ray.functions.mlprep import profile_table

    df = pd.DataFrame(
        {
            "a": [1.0, None, 3.0, 5.0],
            "b": [None, None, 2.0, 4.0],
        }
    )
    out = profile_table(_ds(df).repartition(2), ["a", "b"]).set_index("column")
    assert out.loc["a", "n"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "min"] == 1.0 and out.loc["a", "max"] == 5.0
    np.testing.assert_allclose(out.loc["a", "mean"], 3.0)
    assert out.loc["b", "n_null"] == 2
    np.testing.assert_allclose(out.loc["b", "mean"], 3.0)


def test_ordered_cumsum_multiblock():
    import pytest

    from graphscope_ray.functions.mlprep import ordered_cumsum

    # three range-disjoint blocks, deliberately out of order
    t1 = pa.table({"k": pa.array([10, 11], pa.int64()), "v": pa.array([5, 7], pa.int64())})
    t2 = pa.table({"k": pa.array([0, 2, 1], pa.int64()), "v": pa.array([1, 3, 2], pa.int64())})
    t3 = pa.table({"k": pa.array([20], pa.int64()), "v": pa.array([100], pa.int64())})
    ds = ray.data.from_arrow([t1, t2, t3])
    out = ordered_cumsum(ds, "k", "v").to_pandas().sort_values("k")
    # global order 0,1,2,10,11,20 with values 1,2,3,5,7,100
    assert out.cum_before.tolist() == [0, 1, 3, 6, 11, 18]
    # overlapping block ranges must be rejected
    t4 = pa.table({"k": pa.array([1, 5], pa.int64()), "v": pa.array([1, 1], pa.int64())})
    bad = ray.data.from_arrow([t2, t4])
    with pytest.raises(ValueError, match="overlap"):
        ordered_cumsum(bad, "k", "v").materialize()


def test_pack_sequences():
    from graphscope_ray.functions.mlprep import pack_sequences

    # 4 docs of 3 tokens each, seq_len=4: cum_before = 0,3,6,9
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": ["a b c"] * 4})
    out = pack_sequences(_ds(df), seq_len=4).to_pandas().sort_values("doc_id")
    assert out.n_tokens.tolist() == [3, 3, 3, 3]
    assert out.seq_id.tolist() == [0, 0, 1, 2]
    assert out.seq_offset.tolist() == [0, 3, 2, 1]


def test_mixture_replicate():
    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.sampling import mixture_replicate

    t = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "source": pa.array((["a", "b"] * 50), pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    out = mixture_replicate(
        ds, stratum="source", epochs_by_stratum={"a": 2.0, "b": 0.5}, salt=1
    ).to_pandas()
    a = out[out.source == "a"]
    b = out[out.source == "b"]
    # every 'a' doc appears exactly twice with epochs {0,1}
    assert a.groupby("doc_id").size().eq(2).all()
    assert sorted(a[a.doc_id == a.doc_id.iloc[0]].epoch.tolist()) == [0, 1]
    # 'b' keeps roughly half, all epoch 0, deterministic across re-runs
    assert 10 < len(b) < 40 and (b.epoch == 0).all()
    out2 = mixture_replicate(
        ds.repartition(7), stratum="source", epochs_by_stratum={"a": 2.0, "b": 0.5}, salt=1
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "epoch"]].to_numpy()))
    assert key(out) == key(out2)


def test_walk_skipgram_ppmi_matches_bruteforce():
    import math

    from graphscope_ray.functions.mlprep import walk_skipgram_ppmi

    walks = pd.DataFrame(
        {
            "walk_id": [0, 0, 0, 0, 1, 1, 1, 2],
            "step":    [0, 1, 2, 3, 0, 1, 2, 0],
            "v":       [5, 3, 5, 7, 3, 5, 3, 9],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(walks, preserve_index=False)).repartition(3)
    got = (
        walk_skipgram_ppmi(ds, window=2, min_count=1)
        .to_pandas()
        .sort_values(["w", "c"])
        .reset_index(drop=True)
    )

    # brute force: ordered pairs within 2 steps of the same walk
    pairs = []
    for _, g in walks.groupby("walk_id"):
        v = g.sort_values("step")["v"].tolist()
        for i in range(len(v)):
            for j in range(len(v)):
                if i != j and abs(i - j) <= 2:
                    pairs.append((v[i], v[j]))
    from collections import Counter

    cnt = Counter(pairs)
    N = sum(cnt.values())
    nw = Counter(); nc = Counter()
    for (w, c), n in cnt.items():
        nw[w] += n; nc[c] += n
    rows = sorted(
        (w, c, n, round(max(math.log(N * n / (nw[w] * nc[c])), 0.0), 8))
        for (w, c), n in cnt.items()
    )
    want = pd.DataFrame(rows, columns=["w", "c", "n", "ppmi"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # lone-vertex walk (walk 2) contributes nothing
    assert 9 not in set(got.w)


@pytest.mark.parametrize("P", [1, 3])
def test_pca_project_vs_numpy(P):
    from graphscope_ray.functions.mlprep import embedding_covariance, pca_project

    rng = np.random.RandomState(4)
    n, d, k = 200, 8, 3
    X = (rng.randn(n, d) * np.linspace(3, 0.1, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in X]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(P)

    # covariance partials agree with numpy exact-int reference
    cov = embedding_covariance(ds).to_pandas().sort_values(["i", "j"])
    Q = np.floor(X.astype(np.float64) * 1_000_000 + 0.5).astype(np.int64)
    P2 = Q.T @ Q
    S = Q.sum(axis=0)
    for r in cov.itertuples():
        assert r.n == n and r.sa == S[r.i] and r.sb == S[r.j] and r.spp == P2[r.i, r.j]

    got = pca_project(ds, n_components=k).to_pandas().sort_values("vec_id")
    Y = got[[f"pc{c}" for c in range(k)]].to_numpy()

    # numpy reference PCA on the SAME quantized covariance
    Xq = Q / 1_000_000.0
    mu = Xq.mean(axis=0)
    C = ((Xq - mu).T @ (Xq - mu)) / n
    # engine covariance uses E[xy] - E[x]E[y] (same thing up to fp order)
    w, V = np.linalg.eigh(C)
    comps = V[:, np.argsort(w)[::-1][:k]].T
    for c in comps:
        m = np.argmax(np.abs(np.round(c, 12)))
        if c[m] < 0:
            c *= -1.0
    want = (X.astype(np.float64) - mu) @ comps.T
    # projections agree up to small fp differences in the eig problem
    assert np.allclose(Y, want, atol=1e-6), np.abs(Y - want).max()

    # variance ordering: pc0 captures the most variance
    v = Y.var(axis=0)
    assert v[0] >= v[1] >= v[2]


@pytest.mark.parametrize("P", [1, 3])
def test_feature_hash_vs_python(P):
    from graphscope_ray.functions.hashing import token_hashes
    from graphscope_ray.functions.mlprep import feature_hash

    docs = ["Alpha beta GAMMA alpha", "one two  two three", "", "alpha"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(docs)})
    got = (
        feature_hash(ray.data.from_arrow(t).repartition(P), m=64)
        .to_pandas()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    want = {}
    for i, d in enumerate(docs):
        hs = token_hashes(d.lower().encode())
        for h in hs:
            b = int(h % np.uint64(64))
            want[(i, b)] = want.get((i, b), 0) + 1
    assert {(int(r.doc_id), int(r.bucket)): int(r.cnt) for r in got.itertuples()} == want


@pytest.mark.parametrize("P", [1, 3])
def test_pearson_corr_vs_numpy(P):
    from graphscope_ray.functions.mlprep import pearson_corr

    rng = np.random.RandomState(7)
    n = 400
    a = rng.rand(n) * 50
    b = a * 0.5 + rng.rand(n) * 5     # strongly correlated with a
    c = rng.rand(n)                    # independent
    t = pa.table({"a": pa.array(a), "b": pa.array(b), "c": pa.array(c)})
    out = pearson_corr(ray.data.from_arrow(t).repartition(P), ["a", "b", "c"])
    Q = {k: np.floor(v * 100 + 0.5).astype(np.int64) for k, v in {"a": a, "b": b, "c": c}.items()}
    for row in out.itertuples():
        x, y = Q[row.col_a].astype(np.float64), Q[row.col_b].astype(np.float64)
        want = np.corrcoef(x, y)[0, 1]
        assert abs(row.r - want) < 1e-6, (row.col_a, row.col_b)
    ab = out[(out.col_a == "a") & (out.col_b == "b")]["r"].iloc[0]
    ac = out[(out.col_a == "a") & (out.col_b == "c")]["r"].iloc[0]
    assert ab > 0.9 and abs(ac) < 0.2
