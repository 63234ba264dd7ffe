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
