"""Cardinality operators (functions/sketch.py): exact hash-exchange
distinct count and the HyperLogLog sketch (error bound + merge invariance)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.sketch import count_distinct_exact, hll_count


def _ds(vals, col="x", blocks=4):
    t = pa.table({col: pa.array(vals)})
    return ray.data.from_arrow(t).repartition(blocks)


def test_count_distinct_exact_ints_and_strings():
    rng = np.random.default_rng(1)
    ints = rng.integers(0, 500, 3000)
    assert count_distinct_exact(_ds(ints), "x", num_partitions=4) == len(set(ints.tolist()))
    strs = [f"s{v}" for v in rng.integers(0, 200, 1500)]
    assert count_distinct_exact(_ds(strs), "x", num_partitions=3) == len(set(strs))


def test_hll_error_bound():
    rng = np.random.default_rng(7)
    for true_n in (100, 5000, 50000):
        vals = rng.integers(0, 1 << 62, true_n)
        vals = np.unique(vals)  # ~true_n distinct
        est = hll_count(_ds(np.concatenate([vals, vals]), blocks=6), "x", p=12)
        assert abs(est - len(vals)) / len(vals) < 0.05, (true_n, est)


def test_hll_partitioning_invariant():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 60, 20000)
    a = hll_count(_ds(vals, blocks=2), "x", p=10)
    b = hll_count(_ds(vals, blocks=13), "x", p=10)
    assert a == b  # register merge is exact, any block split


def test_cms_heavy_hitters_superset_and_estimates():
    from graphscope_ray.functions.sketch import cms_heavy_hitters

    rng = np.random.default_rng(4)
    # 3 heavy tokens + noise vocabulary
    heavy = ["aaa"] * 400 + ["bbb"] * 250 + ["ccc"] * 120
    noise = [f"w{v}" for v in rng.integers(0, 3000, 4000)]
    toks = heavy + noise
    rng.shuffle(toks)
    docs = [" ".join(toks[i::40]) for i in range(40)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(40), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
    ).repartition(5)
    out = cms_heavy_hitters(ds, threshold=100)
    got = dict(zip(out["tok"], out["est"]))
    # every true heavy hitter found, estimates never undercount
    assert got.get("aaa", 0) >= 400
    assert got.get("bbb", 0) >= 250
    assert got.get("ccc", 0) >= 120
    # CMS overestimate is bounded (w=2048, ~4.7k tokens -> small collisions)
    assert got["aaa"] < 400 + 60


def test_bloom_no_false_negatives_and_partition_invariance():
    from graphscope_ray.functions.sketch import bloom_build, bloom_member

    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=2000, replace=False).astype(np.int64)
    build = ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    m, k = 1 << 16, 3
    bm1 = bloom_build(build, "k", m_bits=m, k=k)
    bm5 = bloom_build(build.repartition(5), "k", m_bits=m, k=k)
    # OR-merge is associative: bitmap independent of blocking
    assert np.array_equal(bm1, bm5)

    probe_keys = np.concatenate([keys[:500], keys[:500] + 1])  # members + likely-absent
    probe = ray.data.from_arrow(pa.table({"k": pa.array(probe_keys, pa.int64())}))
    out = bloom_member(probe, bm1, "k", k=k).to_pandas()
    hits = out.set_index(out.index)["bloom_hit"].to_numpy()
    # zero false negatives: every true member hits
    assert hits[:500].all()
    # false-positive rate small at this load (2000*3 bits in 65536)
    assert hits[500:].mean() < 0.05


def test_bloom_incremental_dedup_shape():
    """The incremental-ingest pattern: yesterday's filter tags today's
    stream; definite-absent rows (hit=0) are provably new."""
    from graphscope_ray.functions.sketch import bloom_build, bloom_member

    old = ray.data.from_arrow(pa.table({"k": pa.array(range(100), pa.int64())}))
    new = ray.data.from_arrow(
        pa.table({"k": pa.array(range(50, 150), pa.int64())})
    )
    bm = bloom_build(old, "k", m_bits=1 << 14, k=3)
    out = bloom_member(new, bm, "k", k=3).to_pandas()
    known = out[out["k"] < 100]
    assert (known["bloom_hit"] == 1).all()


def test_bloom_member_derives_m_from_bitmap():
    from graphscope_ray.functions.sketch import bloom_build, bloom_member

    build = ray.data.from_arrow(pa.table({"k": pa.array(range(50), pa.int64())}))
    bm = bloom_build(build, "k", m_bits=1 << 14, k=3)
    # no m_bits on the probe side: derived from the bitmap; members all hit
    out = bloom_member(build, bm, "k", k=3).to_pandas()
    assert (out["bloom_hit"] == 1).all()


def test_hll_count_by_matches_exact_and_is_partition_invariant():
    from graphscope_ray.functions.sketch import hll_count_by

    rng = np.random.default_rng(11)
    keys = rng.choice(["A", "N", "R"], size=8000)
    # distinct pools of very different sizes per group
    pool = {"A": 40, "N": 900, "R": 9000}
    vals = np.array([rng.integers(0, pool[k]) for k in keys], dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out2 = hll_count_by(ray.data.from_arrow(t).repartition(2), "k", "v", p=10)
    out9 = hll_count_by(ray.data.from_arrow(t).repartition(9), "k", "v", p=10)
    # register merge is exact → estimates independent of blocking
    pd.testing.assert_frame_equal(out2, out9)
    truth = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].nunique()
    for _, row in out2.iterrows():
        true_n = truth[row["k"]]
        assert abs(row["estimate"] - true_n) / true_n < 0.12, (row["k"], row["estimate"], true_n)


def test_quantile_sketch_rank_bound_and_determinism():
    import numpy as np
    import pandas as pd
    import ray.data

    from graphscope_ray.functions.sketch import quantile_sketch

    rng = np.random.RandomState(3)
    n = 20_000
    vals = rng.lognormal(4.0, 1.0, n)
    df = pd.DataFrame(
        {"v": vals, "ok": np.arange(n, dtype=np.int64), "ln": np.zeros(n, dtype=np.int64)}
    )
    k, P = 64, 8
    out1 = quantile_sketch(
        ray.data.from_pandas(df).repartition(9), "v", ("ok", "ln"), k=k,
        num_partitions=P,
    )
    # partitioning-invariant (the hash partition, not Ray blocks, decides)
    out2 = quantile_sketch(
        ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(2),
        "v", ("ok", "ln"), k=k, num_partitions=P,
    )
    pd.testing.assert_frame_equal(out1, out2)
    # worst-case rank error: between consecutive kept items of partition p
    # there are < ceil(n_p / k) hidden rows, so the merged cumulative
    # weight is within Σ_p ceil(n_p / k) ≈ n/k of the true rank
    srt = np.sort(vals)
    bound = 2 * (n // k)
    for q, v in out1.itertuples(index=False):
        target = int(np.ceil(q * n))
        rank_lo = np.searchsorted(srt, v, side="left")
        rank_hi = np.searchsorted(srt, v, side="right")
        assert rank_lo - bound <= target <= rank_hi + bound, (q, v)


def test_quantile_sketch_exact_when_small():
    import numpy as np
    import pandas as pd
    import ray.data

    from graphscope_ray.functions.sketch import quantile_sketch

    # n_p ≤ k everywhere → stride 1 → the sketch IS the sorted data and
    # every quantile is the exact ceil(q·n)-th order statistic
    n = 100
    vals = np.arange(1, n + 1, dtype=np.float64)
    df = pd.DataFrame(
        {"v": vals, "ok": np.arange(n, dtype=np.int64), "ln": np.zeros(n, dtype=np.int64)}
    )
    out = quantile_sketch(
        ray.data.from_pandas(df), "v", ("ok", "ln"), k=128, num_partitions=4
    )
    for q, v in out.itertuples(index=False):
        assert v == float(int(np.ceil(q * n))), (q, v)
