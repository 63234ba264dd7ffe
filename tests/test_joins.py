"""Relational operators (functions/joins.py): as-of join, range join,
semi/anti join, window functions, exact quantiles, pivot, posexplode —
engine vs pandas/duckdb micro-oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions.joins import (
    asof_join,
    exact_quantiles,
    pivot_agg,
    posexplode,
    range_join,
    semi_join,
    window_funcs,
)


def _ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_asof_join_matches_duckdb():
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "id": np.arange(200),
            "k": rng.integers(0, 10, 200),
            "t": rng.integers(0, 1000, 200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 10, 80),
            "t": rng.integers(0, 1000, 80),
            "v": np.arange(80),
        }
    )
    out = (
        asof_join(_ds(left), _ds(right), on="k", left_ts="t", right_ts="t", num_partitions=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.execute(
        "WITH rd AS (SELECT k, t, max(v) AS v FROM r GROUP BY k, t) "
        "SELECT l.id, l.k, l.t AS t_x, rd.t AS t_y, rd.v FROM l ASOF JOIN rd "
        "ON l.k = rd.k AND l.t >= rd.t ORDER BY l.id"
    ).fetchdf()
    assert out["id"].tolist() == exp["id"].tolist()
    assert out["v"].astype(int).tolist() == exp["v"].astype(int).tolist()


def test_range_join_overlapping_intervals():
    left = pd.DataFrame({"x": [1.0, 5.0, 15.0, 25.0]})
    ivs = pd.DataFrame(
        {"name": ["a", "b", "wide"], "lo": [0.0, 10.0, 0.0], "hi": [10.0, 20.0, 30.0]}
    )
    out = range_join(_ds(left), ivs, val_col="x").to_pandas()
    got = sorted(zip(out["x"], out["name"]))
    assert got == [(1.0, "a"), (1.0, "wide"), (5.0, "a"), (5.0, "wide"), (15.0, "b"), (15.0, "wide"), (25.0, "wide")]


def test_semi_and_anti_join():
    left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "v": list("abcde")})
    right = pd.DataFrame({"k": [2, 4, 4, 9]})
    semi = semi_join(_ds(left), _ds(right), on="k").to_pandas()
    anti = semi_join(_ds(left), _ds(right), on="k", anti=True).to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert sorted(anti["k"]) == [1, 3, 5]


def test_window_funcs_vs_pandas():
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 100),
            "o": rng.permutation(100),
            "val": rng.normal(size=100).round(3),
        }
    )
    out = (
        window_funcs(_ds(df), key_col="k", order_cols=["o"], value_col="val")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = exp.groupby("k")["val"]
    exp["rn"] = g.cumcount() + 1
    exp["cum_value"] = g.cumsum()
    exp["lag_value"] = g.shift(1)
    for c in ("rn", "cum_value"):
        np.testing.assert_allclose(out[c].to_numpy(float), exp[c].to_numpy(float), rtol=1e-12)
    np.testing.assert_allclose(
        out["lag_value"].fillna(-9).to_numpy(float), exp["lag_value"].fillna(-9).to_numpy(float)
    )


def test_exact_quantiles_disc_semantics():
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(size=500), np.full(200, 3.14)])  # skew clump
    df = pd.DataFrame({"value": vals})
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 1.0]
    out = exact_quantiles(_ds(df), "value", qs, candidates_per_block=8)
    s = np.sort(vals)
    n = len(s)
    for q, v in zip(out["q"], out["value"]):
        k = max(int(np.ceil(n * q)), 1)
        assert v == s[k - 1], (q, v, s[k - 1])


def test_pivot_agg():
    df = pd.DataFrame(
        {
            "rk": ["x", "x", "y", "y", "y"],
            "ck": ["A", "B", "A", "A", "C"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    out = (
        pivot_agg(_ds(df), "rk", "ck", ["A", "B", "C"], "v")
        .to_pandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    assert out["n_A"].tolist() == [1, 2]
    assert out["sum_A"].tolist() == [1.0, 7.0]
    assert out["n_B"].tolist() == [1, 0]
    assert out["sum_C"].tolist() == [0.0, 5.0]


def test_posexplode_keeps_empties():
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["a b  c", "", "xy"]})
    out = (
        posexplode(_ds(df), "doc_id", "text", sep=" ")
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert out[out.doc_id == 0]["tok"].tolist() == ["a", "b", "", "c"]
    assert out[out.doc_id == 1]["tok"].tolist() == [""]
    assert out[out.doc_id == 2]["tok"].tolist() == ["xy"]
    assert out[out.doc_id == 0]["pos"].tolist() == [0, 1, 2, 3]


def test_hash_join_outer_keeps_both_unmatched_sides():
    from graphscope_ray.utils import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    right = pd.DataFrame({"j": [2, 3, 4], "b": [200, 300, 400]})
    out = hash_join(_ds(left), _ds(right), "k", "j", num_partitions=4, how="outer").to_pandas()
    want = left.merge(right, left_on="k", right_on="j", how="outer")
    key = out["k"].fillna(out["j"])
    assert sorted(key.astype(int)) == [1, 2, 3, 4]
    assert len(out) == len(want)
    # matched rows carry both payloads; unmatched carry NaN on the other side
    m = out[key == 2].iloc[0]
    assert m["a"] == 20 and m["b"] == 200
    assert np.isnan(out[key == 1]["b"].iloc[0])
    assert np.isnan(out[key == 4]["a"].iloc[0])


def test_quantiles_by_matches_duckdb_quantile_disc():
    from graphscope_ray.functions.joins import quantiles_by

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], size=3000),
            "v": rng.normal(size=3000).round(4),
        }
    )
    qs = [0.1, 0.5, 0.9]
    got = (
        quantiles_by(_ds(df).repartition(6), "g", "v", qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT g, CAST(unnest([0.1,0.5,0.9]) AS DOUBLE) AS q, unnest(vals) AS value "
        "FROM (SELECT g, quantile_disc(v, [0.1,0.5,0.9]) AS vals FROM df GROUP BY g) "
        "ORDER BY g, q"
    ).df()
    pd.testing.assert_frame_equal(got, want.rename(columns={"g": "g"}), check_dtype=False)


def test_robust_outliers_vs_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.joins import robust_outliers

    rng = np.random.RandomState(8)
    v = np.concatenate([rng.randn(500), [40.0, -35.0, 50.0]])  # 3 gross outliers
    t = pa.table({"value": pa.array(v, pa.float64())})
    out = robust_outliers(ray.data.from_arrow(t).repartition(4), "value")
    sv = np.sort(v)
    n = len(v)
    med = sv[int(np.ceil(n * 0.5)) - 1]
    dev = np.sort(np.abs(v - med))
    mad = dev[int(np.ceil(n * 0.5)) - 1]
    want_out = int((0.6745 * np.abs(v - med) / mad > 3.5).sum())
    assert out["n"].iloc[0] == n
    assert abs(out["median"].iloc[0] - round(med, 8)) < 1e-12
    assert abs(out["mad"].iloc[0] - round(mad, 8)) < 1e-12
    assert out["n_outliers"].iloc[0] == want_out >= 3


def test_asof_join_forward():
    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.joins import asof_join

    l = pa.table({"k": pa.array([1, 1, 2], pa.int64()), "lts": pa.array([5, 20, 3], pa.int64())})
    r = pa.table(
        {"k": pa.array([1, 1, 2], pa.int64()), "rts": pa.array([6, 10, 1], pa.int64()),
         "v": pa.array([100, 200, 300], pa.int64())}
    )
    out = (
        asof_join(
            ray.data.from_arrow(l).repartition(2),
            ray.data.from_arrow(r).repartition(2),
            on="k", left_ts="lts", right_ts="rts", direction="forward",
        )
        .to_pandas()
        .sort_values(["k", "lts"])
        .reset_index(drop=True)
    )
    # (1,5)->rts6 v100; (1,20)->no following; (2,3)->no following
    assert out[["k", "lts", "v"]].values.tolist() == [[1, 5, 100]]
