"""Event-log window operators (functions/windows.py) vs hand-built logs."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

@pytest.mark.parametrize("P", [1, 3])
def test_cohort_retention_vs_python(P):
    from graphscope_ray.functions.windows import cohort_retention

    WEEK = 604_800_000_000
    # user 1: first week 0, active weeks 0,1,3; user 2: first week 1, active 1,2
    # user 3: first week 0 only; duplicate events same week collapse
    rows = [
        (1, 0), (1, 0), (1, WEEK + 5), (1, 3 * WEEK),
        (2, WEEK), (2, 2 * WEEK - 1), (2, 2 * WEEK),
        (3, 10),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        cohort_retention(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    want = {
        (0, 0): 2,  # users 1, 3
        (0, 1): 1,  # user 1
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 2
        (1, 1): 1,  # user 2
    }
    assert {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in got.itertuples()
    } == want


@pytest.mark.parametrize("P", [1, 3])
def test_first_touch_vs_python(P):
    from graphscope_ray.functions.windows import first_touch

    rows = [
        (10, 100, 5, "b"),   # user 10: ties on ts → smaller event_id wins
        (11, 100, 4, "a"),
        (10, 100, 3, "a"),
        (10, 50, 9, "c"),    # earliest ts wins outright
        (11, 200, 1, "c"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    got = (
        first_touch(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [10, 11]
    assert got["first_event_id"].tolist() == [9, 4]
    assert got["first_type"].tolist() == ["c", "a"]


def test_rfm_scores_vs_python():
    from graphscope_ray.functions.windows import rfm_scores

    rng = np.random.RandomState(2)
    n = 120
    users = rng.randint(0, 25, n)
    ts = rng.randint(1, 10**9, n).astype("int64")
    vals = np.round(rng.rand(n) * 50, 3)
    t = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    got = rfm_scores(ray.data.from_arrow(t).repartition(4))

    import pandas as pd

    df = pd.DataFrame(
        {"u": users, "ts": ts, "cents": np.floor(100 * vals + 0.5).astype(np.int64)}
    )
    agg = df.groupby("u").agg(r=("ts", "max"), f=("ts", "size"), m=("cents", "sum"))
    for c in ("r", "f", "m"):
        v = np.sort(agg[c].to_numpy())
        cuts = [v[int(np.ceil(len(v) * q)) - 1] for q in (0.2, 0.4, 0.6, 0.8)]
        agg[f"{c}_score"] = 1 + sum((agg[c] > cut).astype(int) for cut in cuts)
    agg = agg.sort_index()
    for col in ("r", "f", "m", "r_score", "f_score", "m_score"):
        assert got[col].tolist() == agg[col].tolist(), col


@pytest.mark.parametrize("P", [1, 3])
def test_trending_vs_python(P):
    from collections import Counter

    from graphscope_ray.functions.windows import trending

    W = 3600 * 1_000_000
    rows = [
        (0, "a"), (1, "a"), (2, "b"), (3, "b"), (4, "c"),          # win 0: a2 b2 c1
        (W, "c"), (W + 1, "c"), (W + 2, "b"),                      # win 1: c2 b1
    ]
    t = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[1] for r in rows]),
        }
    )
    got = (
        trending(ray.data.from_arrow(t).repartition(P), k=2)
        .to_pandas()
        .sort_values(["window_start", "rnk"])
        .reset_index(drop=True)
    )
    want = [(0, 1, "a", 2), (0, 2, "b", 2), (3600, 1, "c", 2), (3600, 2, "b", 1)]
    assert [
        (int(r.window_start), int(r.rnk), r.event_type, int(r.n_events))
        for r in got.itertuples()
    ] == want


@pytest.mark.parametrize("P", [1, 3])
def test_group_trend_vs_numpy(P):
    from graphscope_ray.functions.windows import group_trend

    rng = np.random.RandomState(5)
    n = 300
    # type "up": value rises with time; type "flat": no trend
    ts = np.sort(rng.randint(0, 10**6, n)).astype("int64") * 1_000_000
    half = n // 2
    types = ["up"] * half + ["flat"] * (n - half)
    vals = np.concatenate(
        [ts[:half] / 1e9 + rng.rand(half), rng.rand(n - half) * 3]
    )
    t = pa.table(
        {
            "event_type": pa.array(types),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    got = group_trend(ray.data.from_arrow(t).repartition(P))
    t0 = int(ts.min())
    for r in got.itertuples():
        m = np.array(types) == r.event_type
        tt = (ts[m] - t0) // 1_000_000
        vv = np.floor(100 * vals[m] + 0.5).astype(np.int64)
        nn = m.sum()
        num = nn * int((tt * vv).sum()) - int(tt.sum()) * int(vv.sum())
        den = nn * int((tt * tt).sum()) - int(tt.sum()) ** 2
        want = round(num / den, 8) if den > 0 else 0.0
        assert abs(r.slope - want) < 1e-12, r.event_type
    up = got[got.event_type == "up"]["slope"].iloc[0]
    fl = got[got.event_type == "flat"]["slope"].iloc[0]
    assert up > abs(fl)


@pytest.mark.parametrize("P", [1, 3])
def test_interarrival_stats_vs_python(P):
    from graphscope_ray.functions.windows import interarrival_stats

    rows = [
        (1, 100, 1), (1, 50, 2), (1, 300, 3), (1, 300, 4),  # gaps 50,200,0 (tie order by id)
        (2, 7, 5),                                           # single event -> dropped
        (3, 10, 6), (3, 30, 7),                              # one gap 20
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    got = (
        interarrival_stats(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == [1, 3]
    r1 = got.iloc[0]
    # sorted gaps for user 1: [0, 50, 200]; median = rank ceil(3*0.5)=2 -> 50
    assert (r1.n_gaps, r1.min_gap, r1.max_gap, r1.median_gap) == (3, 0, 200, 50)
    r3 = got.iloc[1]
    assert (r3.n_gaps, r3.min_gap, r3.max_gap, r3.median_gap) == (1, 20, 20, 20)
