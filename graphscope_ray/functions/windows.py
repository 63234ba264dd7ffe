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
