"""Relational operators Ray Data lacks: as-of join, range (interval) join,
semi/anti join, per-key window functions, exact distributed quantiles,
pivot, positional explode.

The reference's relational surface stops at the framework ops (SURVEY §2.1);
these are the extra operators a large-scale training-data pipeline needs
(event alignment, banding, leakage checks, per-user feature windows).  Each
is expressed Ray-Data-first:

- as-of join: explicit hash exchange on the key (same pattern as
  ``utils.hash_join``) + per-partition vectorized ``pd.merge_asof``.
- range join: the interval side is broadcast once (``ray.put``), probes are
  vectorized per batch — never a shuffle.
- semi/anti join: distinct keys of the right side broadcast once, membership
  via ``np.searchsorted`` per batch.
- window functions: ``groupby(key).map_groups`` with vectorized pandas
  (assumes one key's rows fit one group — the sessionize contract).
- exact quantiles: 2½ streaming passes (per-block candidate pivots →
  bucket-count histogram → fetch only the target buckets); never
  materializes the dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


# ---------------------------------------------------------------------------
# as-of join


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    left_ts: str,
    right_ts: str,
    num_partitions: int = 16,
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join: for every left row, attach the right row with the same
    ``on`` key and the greatest ``right_ts`` <= ``left_ts`` (backward,
    default) or the SMALLEST ``right_ts`` >= ``left_ts``
    (direction="forward" — the next-following match, e.g. "first order
    after the signup event"); inner semantics either way — DuckDB ``ASOF
    JOIN`` with ``>=`` resp. ``<=``.

    Ties on (key, right_ts) are resolved deterministically: the right side
    is deduplicated per (key, ts) keeping the row that sorts LAST by the
    remaining columns (DuckDB's ASOF leaves this unspecified — callers that
    need oracle-exact output should pre-dedupe the same way).

    Scale: both sides are hash-partitioned on the key (explicit exchange,
    one task per block with K return slots); each partition does one sorted
    vectorized ``pd.merge_asof``.  No driver-side data movement.
    """
    K = num_partitions

    def _splitter(key):
        @ray.remote
        def _split(t: pa.Table):
            df = t.to_pandas()
            if key not in df.columns:  # schema-stripped empty block
                parts = tuple(df.iloc[:0] for _ in range(K))
                return parts if K > 1 else parts[0]
            h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
            part = (h % np.uint64(K)).astype(np.int64)
            parts = tuple(df[part == p] for p in range(K))
            return parts if K > 1 else parts[0]

        return _split

    lrefs = left.materialize().to_arrow_refs()
    rrefs = right.materialize().to_arrow_refs()
    lsplit, rsplit = _splitter(on), _splitter(on)

    def _slots(split, refs):
        if K == 1:
            return [[split.remote(b) for b in refs]]
        out = [split.options(num_returns=K).remote(b) for b in refs]
        return [[o[k] for o in out] for k in range(K)]

    lparts = _slots(lsplit, lrefs)
    rparts = _slots(rsplit, rrefs)

    @ray.remote
    def _merge(nleft: int, *dfs) -> pa.Table:
        ldf = pd.concat(dfs[:nleft], ignore_index=True)
        rdf = pd.concat(dfs[nleft:], ignore_index=True)
        if on not in ldf.columns or len(ldf) == 0:
            return pa.table({})
        if on not in rdf.columns or right_ts not in rdf.columns:
            # schema-stripped empty right partition: inner semantics → no rows
            return pa.table({})
        # deterministic tie-break: per (key, ts) keep the row sorting last
        rdf = rdf.sort_values(list(rdf.columns), kind="mergesort")
        rdf = rdf.drop_duplicates(subset=[on, right_ts], keep="last")
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf.sort_values(right_ts, kind="mergesort")
        rdf = rdf.assign(__asof_matched__=np.float64(1.0))
        out = pd.merge_asof(
            ldf, rdf, left_on=left_ts, right_on=right_ts, by=on, direction=direction
        )
        # inner semantics: drop left rows with no match
        out = out[out["__asof_matched__"].notna()].drop(columns="__asof_matched__")
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ray.data.from_arrow_refs(
        [_merge.remote(len(lparts[k]), *lparts[k], *rparts[k]) for k in range(K)]
    )


# ---------------------------------------------------------------------------
# range (interval) join


def range_join(
    left: ray.data.Dataset,
    intervals: pd.DataFrame,
    val_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> ray.data.Dataset:
    """Join every left row against every interval with
    ``lo <= val < hi`` (half-open; overlapping intervals emit one output row
    per match).  The interval table is the SMALL side by contract — it is
    broadcast once via ``ray.put`` and probed vectorized per batch (one
    boolean mask per interval; no shuffle, no per-row Python).
    """
    ivs = intervals.reset_index(drop=True)
    ref = ray.put(
        (
            ivs[lo_col].to_numpy(np.float64),
            ivs[hi_col].to_numpy(np.float64),
            {c: ivs[c].to_numpy() for c in ivs.columns if c not in (lo_col, hi_col)},
        )
    )

    def _probe(t: pa.Table) -> pa.Table:
        lo, hi, extra = ray.get(ref)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        row_ix, iv_ix = [], []
        for i in range(len(lo)):
            m = np.flatnonzero((v >= lo[i]) & (v < hi[i]))
            row_ix.append(m)
            iv_ix.append(np.full(len(m), i, dtype=np.int64))
        rows = np.concatenate(row_ix) if row_ix else np.empty(0, np.int64)
        ivx = np.concatenate(iv_ix) if iv_ix else np.empty(0, np.int64)
        out = t.take(pa.array(rows))
        for c, arr in extra.items():
            out = out.append_column(c, pa.array(arr[ivx]))
        return out

    return left.map_batches(_probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# semi / anti join


def _key_set(right: ray.data.Dataset, on: str) -> np.ndarray:
    """Distinct keys of the right side, collected as one sorted array.

    Only the DISTINCT KEYS come to the driver (the per-block unique cuts the
    transfer first).  For key sets beyond driver memory use
    ``utils.hash_join`` with how='inner'/'anti' instead — this is the
    broadcast fast path.
    """
    ks = right.select_columns([on]).map_batches(
        lambda t: pa.table({on: pa.compute.unique(t[on])}), batch_format="pyarrow"
    )
    return np.unique(ks.to_pandas()[on].to_numpy())


def semi_join(
    left: ray.data.Dataset, right: ray.data.Dataset, on: str, anti: bool = False
) -> ray.data.Dataset:
    """Semi join (rows of left whose key appears in right) or anti join
    (``anti=True``: rows whose key does NOT appear).  Right-side distinct
    keys are broadcast once; membership is one ``np.searchsorted`` per
    batch."""
    keys = _key_set(right, on)
    ref = ray.put(keys)

    def _filter(t: pa.Table) -> pa.Table:
        k_sorted = ray.get(ref)
        v = t[on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k_sorted, v)
        pos = np.minimum(pos, max(len(k_sorted) - 1, 0))
        hit = (k_sorted[pos] == v) if len(k_sorted) else np.zeros(len(v), bool)
        return t.filter(pa.array(~hit if anti else hit))

    return left.map_batches(_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-key window functions


def window_funcs(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> ray.data.Dataset:
    """Per-key ordered window functions: row_number (``rn``, 1-based),
    cumulative sum of ``value_col`` (``cum_value``), previous value
    (``lag_value``, NaN for the first row).  Ordering must be made
    deterministic by the caller (include a unique tiebreak column in
    ``order_cols``).

    One key's rows are processed in one group (the sessionize contract —
    holds for per-user / per-entity windows); the per-group compute is
    vectorized pandas."""

    def _win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        v = g[value_col].to_numpy(np.float64)
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cum_value"] = np.cumsum(v)
        g["lag_value"] = np.concatenate([[np.nan], v[:-1]])
        return g

    return ds.groupby(key_col).map_groups(_win, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact distributed quantiles


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], candidates_per_block: int = 64
) -> pd.DataFrame:
    """EXACT quantiles of ``col`` (DuckDB ``quantile_disc`` semantics: the
    value with 1-based rank ``ceil(n·q)``) without materializing the data:

    1. one pass collects per-block candidate pivots (each block's own
       quantile grid — data-adaptive, so buckets stay balanced under skew);
    2. one pass counts rows ≤ each pivot (vectorized searchsorted
       histogram per batch, summed driver-side — bounded by #pivots);
    3. only the buckets containing a requested rank are fetched and the
       exact order statistic read off (bucket size ≈ n / (blocks ·
       candidates_per_block)).
    """
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64), "value": np.nan})
    ranks = {q: int(np.ceil(n * q)) if q > 0 else 1 for q in qs}

    def _cands(t: pa.Table) -> pa.Table:
        v = np.sort(t[col].to_numpy(zero_copy_only=False).astype(np.float64))
        if len(v) == 0:
            return pa.table({"pivot": pa.array([], pa.float64())})
        ix = np.linspace(0, len(v) - 1, min(candidates_per_block, len(v))).astype(np.int64)
        return pa.table({"pivot": pa.array(np.unique(v[ix]))})

    pivots = np.unique(
        ds.map_batches(_cands, batch_format="pyarrow").to_pandas()["pivot"].to_numpy()
    )

    def _hist(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        # counts of v <= pivots[i] (cumulative form keeps the merge a plain sum)
        c = np.searchsorted(np.sort(v), pivots, side="right")
        return pa.table(
            {"ix": pa.array(np.arange(len(pivots), dtype=np.int64)), "c": pa.array(c)}
        )

    hist = (
        ds.map_batches(_hist, batch_format="pyarrow")
        .groupby("ix")
        .sum("c")
        .to_pandas()
        .sort_values("ix")
    )
    cum = hist["sum(c)"].to_numpy(np.int64)  # rows <= pivots[i], global

    def _bucket_vals(lo: float, hi: float) -> np.ndarray:
        """Values in (lo, hi] — only the target bucket leaves the stream."""

        def _f(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({col: pa.array(v[(v > lo) & (v <= hi)])})

        return ds.map_batches(_f, batch_format="pyarrow").to_pandas()[col].to_numpy()

    out = {}
    cache: dict[int, np.ndarray] = {}
    for q, k in ranks.items():
        b = int(np.searchsorted(cum, k, side="left"))  # first pivot with cum >= k
        b = min(b, len(pivots) - 1)
        below = 0 if b == 0 else int(cum[b - 1])
        if b not in cache:
            lo = -np.inf if b == 0 else float(pivots[b - 1])
            vals = _bucket_vals(lo, float(pivots[b]))
            vals.sort()
            cache[b] = vals
        out[q] = float(cache[b][k - below - 1])
    return pd.DataFrame(
        {"q": pd.Series(list(out), dtype=np.float64), "value": list(out.values())}
    )


# ---------------------------------------------------------------------------
# pivot


def pivot_agg(
    ds: ray.data.Dataset,
    row_key: str,
    col_key: str,
    categories: list[str],
    value_col: str,
) -> ray.data.Dataset:
    """Pivot ``col_key`` (known category list) into per-category count and
    sum columns, grouped by ``row_key``: output columns ``n_<cat>`` and
    ``sum_<cat>``.  Partial crosstab inside ``map_batches`` (one vectorized
    pass), then ONE small groupby-sum over ``row_key`` — the shuffle carries
    |rows| ≈ |distinct row_key| · blocks, not the input."""
    from ray.data.aggregate import Sum

    cats = list(categories)

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "rk": t[row_key].to_numpy(zero_copy_only=False),
                "ck": t[col_key].to_numpy(zero_copy_only=False),
                "v": t[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        g = df.groupby(["rk", "ck"], as_index=False)["v"].agg(["size", "sum"]).reset_index()
        wide = {row_key: g["rk"].unique()}
        base = pd.DataFrame({row_key: wide[row_key]})
        for cat in cats:
            sub = g[g["ck"] == cat].set_index("rk")
            base[f"n_{cat}"] = (
                sub["size"].reindex(base[row_key]).fillna(0).to_numpy(np.int64)
            )
            base[f"sum_{cat}"] = (
                sub["sum"].reindex(base[row_key]).fillna(0.0).to_numpy(np.float64)
            )
        return pa.Table.from_pandas(base, preserve_index=False).replace_schema_metadata(None)

    aggs = []
    for cat in cats:
        aggs.append(Sum(f"n_{cat}", alias_name=f"n_{cat}"))
        aggs.append(Sum(f"sum_{cat}", alias_name=f"sum_{cat}"))
    return (
        ds.map_batches(_partial, batch_format="pyarrow").groupby(row_key).aggregate(*aggs)
    )


# ---------------------------------------------------------------------------
# positional explode


def posexplode(
    ds: ray.data.Dataset, id_col: str, text_col: str, sep: str = " "
) -> ray.data.Dataset:
    """Explode ``text_col`` split on ``sep`` into one row per token with its
    0-based position: output (id, pos, tok).  Empty tokens from consecutive
    separators are KEPT (``string_split`` semantics).  Fully vectorized:
    one Arrow split kernel + offset arithmetic per batch."""
    import pyarrow.compute as pc

    def _explode(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern(t[text_col], sep)
        counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), counts)
        pos = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                id_col: pa.array(ids),
                "pos": pa.array(pos),
                "tok": pc.list_flatten(lst),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_explode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-group exact quantiles


def quantiles_by(
    ds: ray.data.Dataset, key: str, col: str, qs: list[float]
) -> ray.data.Dataset:
    """EXACT per-group quantiles — (key, q, value) with DuckDB
    ``quantile_disc`` semantics (value at 1-based rank ``ceil(n·q)``, same
    rule as ``exact_quantiles``).  One hash exchange of (key, col) only,
    then a vectorized order statistic per group.  Assumes a single group's
    values fit one worker (true for per-category/per-language profiles at
    any corpus scale — group count grows, group size doesn't); for
    billion-row single groups run ``exact_quantiles`` per key instead."""
    qarr = np.asarray(list(qs), dtype=np.float64)

    def _g(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].to_numpy(np.float64))
        n = len(v)
        ranks = np.maximum(np.ceil(n * qarr).astype(np.int64), 1)
        return pd.DataFrame(
            {key: df[key].iloc[0], "q": qarr, "value": v[ranks - 1]}
        )

    return ds.select_columns([key, col]).groupby(key).map_groups(_g, batch_format="pandas")


def robust_outliers(
    ds: "ray.data.Dataset", col: str, z_cut: float = 3.5
) -> "pd.DataFrame":
    """Robust outlier summary by MAD (median absolute deviation — the
    Iglewicz–Hoaglin modified z-score, the filter of choice when the metric
    itself is skewed): median via :func:`exact_quantiles` (quantile_disc
    rank semantics), MAD = median(|x − median|) via a second exact-quantile
    pass over the derived deviations, outliers = rows with
    0.6745·|x − med|/mad > z_cut.  Three bounded passes, nothing
    data-sized reaches the driver; one summary row
    (n, median, mad, n_outliers)."""
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"n": [0], "median": [np.nan], "mad": [np.nan], "n_outliers": [0]})
    med = float(exact_quantiles(ds, col, [0.5])["value"].iloc[0])

    def _dev(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"__dev": pa.array(np.abs(v - med))})

    dev = ds.map_batches(_dev, batch_format="pyarrow")
    mad = float(exact_quantiles(dev, "__dev", [0.5])["value"].iloc[0])

    def _cnt(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if mad > 0:
            z = 0.6745 * np.abs(v - med) / mad
            c = int((z > z_cut).sum())
        else:
            c = 0
        return pa.table({"c": pa.array([c], pa.int64())})

    n_out = int(ds.map_batches(_cnt, batch_format="pyarrow").to_pandas()["c"].sum())
    return pd.DataFrame(
        {"n": [n], "median": [round(med, 8)], "mad": [round(mad, 8)], "n_outliers": [n_out]}
    )
