"""Stream-shaped operators over an ordered event log (events table).

Ray Data is batch; windows are expressed per the ray_guide pattern: tumbling
windows = vectorized epoch-floor + groupby; sessionization = per-key
``map_groups`` over ts-sorted groups (the ordering assumption: events of one
key fit one group and are sorted inside the UDF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window(
    ds: ray.data.Dataset,
    window_s: int = 3600,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (event_type, window) aggregate: count + sum/mean of value.
    window_start = floor(epoch(ts) / window_s) · window_s (UTC-naive)."""

    def _win(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = (ts // (window_s * 1_000_000)) * window_s
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pa.array(w),
                value_col: t[value_col],
            }
        )

    return (
        ds.map_batches(_win, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )


def sessionize(
    ds: ray.data.Dataset,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap since the
    previous event exceeds gap_s.  Output one row per session."""

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) / 1e6
        new = np.concatenate([[True], np.diff(ts) > gap_s])
        sid = np.cumsum(new)
        out = (
            pd.DataFrame({"sid": sid, "ts": ts, "value": g["value"].to_numpy()})
            .groupby("sid")
            .agg(n_events=("ts", "size"), t_start=("ts", "min"), t_end=("ts", "max"), sum_value=("value", "sum"))
            .reset_index(drop=True)
        )
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(_sessions, batch_format="pandas")


def hopping_window(
    ds: ray.data.Dataset,
    window_s: int = 3600,
    hop_s: int = 900,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Hopping (sliding) windows: each event lands in every window of length
    ``window_s`` that starts on a ``hop_s`` boundary and covers it — a
    vectorized per-batch replicate (window_s // hop_s copies per row, done
    with one np.repeat, no Python loop) followed by the same groupby
    aggregate as the tumbling case.  window_s must be a multiple of hop_s."""
    assert window_s % hop_s == 0, "window_s must be a multiple of hop_s"
    k = window_s // hop_s

    def _expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = (ts // (hop_s * 1_000_000)) * hop_s  # last hop boundary ≤ ts
        n = len(base)
        starts = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64) * hop_s, n)
        keep = starts >= 0
        return pa.table(
            {
                "event_type": pa.array(np.repeat(t["event_type"].to_numpy(zero_copy_only=False), k)[keep]),
                "window_start": pa.array(starts[keep]),
                value_col: pa.array(np.repeat(t[value_col].to_numpy(zero_copy_only=False), k)[keep]),
            }
        )

    return (
        ds.map_batches(_expand, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def cohort_retention(
    ds: ray.data.Dataset,
    week_us: int = 604_800_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Weekly cohort-retention matrix (the standard product-analytics
    rollup): cohort(user) = epoch-week of the user's FIRST event; for every
    (cohort_week, week_offset) report how many of that cohort's users were
    active offset weeks later.  Rows (cohort_week, week_offset, n_users);
    week_offset 0 row = cohort size.

    Dataflow: one vectorized epoch-floor map, one (user, week) hash-distinct,
    one per-user min exchange (cohort assignment), one hash join back, one
    final (cohort, offset) count exchange — all keyed partials, no
    driver-side user state."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    def _weeks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "wk": pa.array([], pa.int64())}
            )
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t[user_col],
                "wk": pa.array(ts // week_us),
            }
        )

    uw = hash_groupby_sum(
        ds.select_columns([user_col, ts_col]).map_batches(_weeks, batch_format="pyarrow"),
        ["user_id", "wk"],
        None,
        "n",
    ).select_columns(["user_id", "wk"])
    uw = uw.materialize()  # feeds both the cohort min and the join
    coh = hash_groupby_sum(uw, ["user_id"], "wk", "cw", agg="min")
    j = hash_join(uw, coh.select_columns(["user_id", "cw"]), "user_id", "user_id")

    def _off(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "wk" not in t.column_names:
            return pa.table(
                {
                    "cohort_week": pa.array([], pa.int64()),
                    "week_offset": pa.array([], pa.int64()),
                }
            )
        wk = t["wk"].to_numpy(zero_copy_only=False)
        cw = t["cw"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_week": pa.array(cw.astype(np.int64)),
                "week_offset": pa.array((wk - cw).astype(np.int64)),
            }
        )

    return hash_groupby_sum(
        j.map_batches(_off, batch_format="pyarrow"),
        ["cohort_week", "week_offset"],
        None,
        "n_users",
    )


def first_touch(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """First-touch attribution: each user's EARLIEST event (ties → smallest
    event_id) with its type — the standard acquisition-channel rollup.
    Per-block argmin partials (≤ one row per user per block, a valid
    combiner) → one user-keyed map_groups argmin merge.  Rows
    (user_id, first_ts, first_event_id, first_type)."""
    import pandas as pd

    from graphscope_ray.utils import group_rank

    cols = [user_col, ts_col, id_col, type_col]

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or user_col not in t.column_names:
            return pa.table(
                {user_col: pa.array([], pa.int64()),
                 ts_col: pa.array([], pa.timestamp("us")),
                 id_col: pa.array([], pa.int64()),
                 type_col: pa.array([], pa.string())}
            )
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].to_numpy(zero_copy_only=False).view(np.int64)
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order, rank = group_rank(u, eid, ts)
        return t.take(pa.array(order[rank == 0]))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col]).head(1)
        return g.rename(
            columns={ts_col: "first_ts", id_col: "first_event_id", type_col: "first_type"}
        )

    return (
        ds.select_columns(cols)
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(_merge, batch_format="pandas")
    )


def rfm_scores(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """RFM segmentation (the classic marketing rollup): per user, Recency =
    last event time, Frequency = event count, Monetary = Σ cents (each
    event's value quantized floor(100·v + 0.5) BEFORE summing, so the sum
    is an exact int64 with no float-order dependence); each metric scores
    1–5 by its exact population quintiles (score = 1 + #cuts strictly
    below the value; quantile_disc cut semantics via joins.exact_quantiles,
    so the SQL oracle reproduces every cut bit-for-bit).

    Dataflow: two per-user hash exchanges (max for recency, sum for
    count/cents), three exact-quantile probes over the user-sized
    aggregate (each a bounded candidate/histogram pass — nothing
    event-sized leaves the stream), one broadcast of 12 cut scalars, one
    scoring map.  Rows (user_id, r, f, m, r_score, f_score, m_score)."""
    from graphscope_ray.functions.joins import exact_quantiles
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    def _prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {user_col: pa.array([], pa.int64()), "r": pa.array([], pa.int64()),
                 "one": pa.array([], pa.int64()), "cents": pa.array([], pa.int64())}
            )
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                user_col: t[user_col],
                "r": pa.array(ts),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "cents": pa.array(np.floor(100.0 * v + 0.5).astype(np.int64)),
            }
        )

    ev = ds.select_columns([user_col, ts_col, value_col]).map_batches(
        _prep, batch_format="pyarrow"
    ).materialize()
    rmax = hash_groupby_sum(ev, [user_col], "r", "r", agg="max", num_partitions=8)
    fm = hash_groupby_sum(
        ev, [user_col], ["one", "cents"], ["f", "m"], num_partitions=8
    )
    agg = hash_join(rmax, fm, user_col, user_col, num_partitions=8).materialize()

    qs = [0.2, 0.4, 0.6, 0.8]
    cuts = {
        c: exact_quantiles(agg, c, qs)["value"].to_numpy() for c in ("r", "f", "m")
    }

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or user_col not in df.columns:
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64)
                 for c in (user_col, "r", "f", "m", "r_score", "f_score", "m_score")}
            )
        out = df[[user_col, "r", "f", "m"]].copy()
        for c in ("r", "f", "m"):
            v = df[c].to_numpy(np.float64)
            sc = np.ones(len(df), dtype=np.int64)
            for cut in cuts[c]:
                sc += (v > cut).astype(np.int64)
            out[f"{c}_score"] = sc
        return out

    return (
        agg.map_batches(_score, batch_format="pandas")
        .to_pandas()
        .sort_values(user_col)
        .reset_index(drop=True)
    )


def trending(
    ds: ray.data.Dataset,
    window_s: int = 3600,
    k: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """Trending items per tumbling window: the k most frequent event types
    in each window (ties → lexicographically smaller type), with their
    counts and rank — the leaderboard rollup every event pipeline ships.
    One (window, type) count exchange, then per-block partial top-k + a
    per-window merge (both tiny: rows are window×type aggregates).  Rows
    (window_start, rnk, event_type, n_events)."""
    from graphscope_ray.utils import hash_groupby_sum

    def _win(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"window_start": pa.array([], pa.int64()),
                 type_col: pa.array([], pa.string())}
            )
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (ts // (window_s * 1_000_000)) * window_s
        return pa.table({"window_start": pa.array(w), type_col: t[type_col]})

    counts = hash_groupby_sum(
        ds.select_columns([ts_col, type_col]).map_batches(_win, batch_format="pyarrow"),
        ["window_start", type_col],
        None,
        "n_events",
        num_partitions=8,
    )

    def _tk_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "window_start" not in t.column_names:
            return pa.table(
                {"window_start": pa.array([], pa.int64()),
                 type_col: pa.array([], pa.string()),
                 "n_events": pa.array([], pa.int64())}
            )
        from graphscope_ray.utils import group_rank

        w = t["window_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_events"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = t[type_col].to_numpy(zero_copy_only=False)
        order, rank = group_rank(w, ty, -n)
        return t.take(pa.array(order[rank < k]))

    def _tk_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_events", type_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["window_start", "rnk", type_col, "n_events"]]

    return (
        counts.map_batches(_tk_partial, batch_format="pyarrow")
        .groupby("window_start")
        .map_groups(_tk_merge, batch_format="pandas")
    )


def group_trend(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-group OLS trend slope of value against time (cents per second —
    "is this metric drifting?" per segment): exact-integer moments with
    t = whole seconds since the global min timestamp (bounds Σt² inside
    int64 partials) and v = floor(100·value + 0.5) cents; slope =
    (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²) combined with python ints (the
    n-scaled moments exceed int64), ONE float division at the end — the
    SQL oracle is digit-identical at 8dp.  One min pass + one group-keyed
    moment exchange; rows (group, n, slope).

    Bound: the int64 partials need span_seconds² × rows_per_block < 2^63 —
    fine for event logs spanning years (3·10⁸ s → 9·10¹⁶ per element);
    re-zero or bucket the clock first for longer spans."""
    from graphscope_ray.utils import hash_groupby_sum

    t0 = int(
        ds.select_columns([ts_col])
        .map_batches(
            lambda t: pa.table(
                {"m": pa.array([int(t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False).min())], pa.int64())}
            )
            if t.num_rows
            else pa.table({"m": pa.array([], pa.int64())}),
            batch_format="pyarrow",
        )
        .to_pandas()["m"]
        .min()
    )

    def _mom(t: pa.Table) -> pa.Table:
        guard = {group_col: pa.array([], pa.string())}
        guard.update({c: pa.array([], pa.int64()) for c in ("one", "t", "v", "tv", "tt")})
        if t.num_rows == 0:
            return pa.table(guard)
        ts = (t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False) - t0) // 1_000_000
        v = np.floor(
            100.0 * t[value_col].to_numpy(zero_copy_only=False).astype(np.float64) + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                group_col: t[group_col],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                "t": pa.array(ts),
                "v": pa.array(v),
                "tv": pa.array(ts * v),
                "tt": pa.array(ts * ts),
            }
        )

    agg = hash_groupby_sum(
        ds.select_columns([group_col, ts_col, value_col]).map_batches(
            _mom, batch_format="pyarrow"
        ),
        [group_col],
        ["one", "t", "v", "tv", "tt"],
        ["n", "st", "sv", "stv", "stt"],
        num_partitions=8,
    ).to_pandas()
    rows = []
    for r in agg.itertuples():
        n = int(r.n)
        num = n * int(r.stv) - int(r.st) * int(r.sv)
        den = n * int(r.stt) - int(r.st) ** 2
        slope = round(float(num) / float(den), 8) if den > 0 else 0.0
        rows.append((getattr(r, group_col), n, slope))
    out = pd.DataFrame(rows, columns=[group_col, "n", "slope"])
    return out.sort_values(group_col).reset_index(drop=True)


def interarrival_stats(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-user inter-arrival gap statistics (engagement-cadence audit):
    consecutive-event gaps in microseconds with the (ts, event_id)
    ordering, per user (n_gaps, min/max/median gap) — median by the
    quantile_disc rank rule (value at 1-based rank ceil(n·0.5)), so the
    SQL window replica is bit-exact.  One user-keyed map_groups (the
    per-key ordering contract of sessionize); users with < 2 events drop
    out, matching the SQL's WHERE gap IS NOT NULL."""
    import pandas as pd

    def _g(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        ts = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        if len(ts) < 2:
            return pd.DataFrame(
                {user_col: pd.Series(dtype=np.int64),
                 "n_gaps": pd.Series(dtype=np.int64),
                 "min_gap": pd.Series(dtype=np.int64),
                 "max_gap": pd.Series(dtype=np.int64),
                 "median_gap": pd.Series(dtype=np.int64)}
            )
        gaps = np.sort(np.diff(ts))
        n = len(gaps)
        med = gaps[int(np.ceil(n * 0.5)) - 1]
        return pd.DataFrame(
            {
                user_col: [np.int64(g[user_col].iloc[0])],
                "n_gaps": [np.int64(n)],
                "min_gap": [np.int64(gaps[0])],
                "max_gap": [np.int64(gaps[-1])],
                "median_gap": [np.int64(med)],
            }
        )

    return (
        ds.select_columns([user_col, ts_col, id_col])
        .groupby(user_col)
        .map_groups(_g, batch_format="pandas")
    )
