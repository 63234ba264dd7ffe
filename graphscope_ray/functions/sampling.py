"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines sample and split by CONTENT-STABLE hashes, never by
row position or RNG state: the decision for a record must survive re-runs,
repartitioning and incremental ingestion (the reference's sampling surfaces
— `apps/sampling_path`, graphlearn samplers — are likewise seeded/stable).
Every operator here is a pure map over a key column using uint64
wraparound arithmetic, so it is embarrassingly parallel at any scale and
exactly reproducible in ANSI SQL (HUGEINT mod 2^64) for the oracle gate.

bucket(key) = ((key·C1 + salt·C2 + C3) mod 2^64) >> 33, taken mod 1000 —
a multiplicative (Knuth) hash; the high bits are the well-mixed ones.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_C1 = np.uint64(11400714819323198485)  # 2^64 / golden ratio, odd
_C2 = np.uint64(14029467366897019727)
_C3 = np.uint64(1609587929392839161)


def hash_bucket(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Deterministic bucket in [0, 1000) per int64 key (vectorized)."""
    k = keys.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        h = k * _C1 + np.uint64(salt) * _C2 + _C3
    return ((h >> np.uint64(33)) % np.uint64(1000)).astype(np.int64)


def hash_u64(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Full-range deterministic uint64 hash per int64 key (the Knuth
    multiplicative kernel of ``hash_bucket`` WITHOUT the >>33 / mod-1000
    reduction — used where 64 bits of resolution matter)."""
    k = keys.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        return k * _C1 + np.uint64(salt) * _C2 + _C3


def priority_sample(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    weight_col: str = "n_tokens",
    k: int = 50,
    salt: int = 0,
) -> "pd.DataFrame":
    """Deterministic weighted sampling without replacement of fixed size k
    (priority sampling, Duffield–Lund–Thorup JACM'07 / Efraimidis–Spirakis
    exponential race): each row's rank is u/w with u uniform — here the
    integer form ``rank = hash_u64(key) // w`` (u = the full-range 64-bit
    hash, w = the row's positive integer weight, floor division) — and the
    sample is the k smallest ranks, ties broken by key.  Heavier rows get
    proportionally smaller ranks, so inclusion probability ≈ w-proportional;
    the decision is content-stable (re-runs, repartitioning and incremental
    ingestion keep the same winners, like every sampler in this module) and
    exactly reproducible in ANSI SQL (HUGEINT // w).

    Distributed shape: each block emits only its own k smallest (rank, key,
    weight) rows — a constant-size partial, the same per-block-top-k +
    tiny-driver-merge pattern as similarity.topk_cosine — so nothing
    corpus-sized ever leaves the blocks.  Returns (key, weight, rank) of
    the k winners sorted by key; prio is the uint64 rank wrapped to int64
    (two's complement) for Arrow transport."""
    import pandas as pd

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "weight": pa.array([], pa.int64()),
                "prio": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64), 1)
        rank = hash_u64(ids, salt) // w.astype(np.uint64)
        order = np.lexsort((ids, rank))[:k]
        return pa.table(
            {
                key: pa.array(ids[order]),
                "weight": pa.array(w[order]),
                "prio": pa.array(rank[order].view(np.int64)),
            }
        )

    parts = (
        ds.select_columns([key, weight_col])
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    # uint64 order == unsigned view of the int64 ranks
    parts["_u"] = parts["prio"].to_numpy().view(np.uint64)
    out = parts.sort_values(["_u", key]).head(k).drop(columns="_u")
    return out.sort_values(key).reset_index(drop=True)


def hash_sample(
    ds: ray.data.Dataset, key: str = "doc_id", permille: int = 100, salt: int = 0
) -> ray.data.Dataset:
    """Keep rows whose hash bucket < ``permille`` (‰ sample rate).

    Stateless per-batch filter: streams at any scale, no shuffle, and the
    same rows survive regardless of partitioning or run count."""

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        b = hash_bucket(t[key].to_numpy(zero_copy_only=False), salt)
        return t.filter(pa.array(b < permille))

    return ds.map_batches(_f, batch_format="pyarrow")


def hash_split(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    weights: tuple[int, ...] = (900, 50, 50),
    salt: int = 0,
) -> ray.data.Dataset:
    """Append a ``split`` column (0..len(weights)-1) by hash-bucket ranges.

    ``weights`` are ‰ and must sum to 1000 (e.g. 900/50/50 train/val/test).
    Assignment is stable under repartitioning and incremental appends —
    the property a train/test split must have so records never migrate
    between splits across pipeline runs."""
    assert sum(weights) == 1000, "weights are permille and must sum to 1000"
    bounds = np.cumsum(np.asarray(weights, dtype=np.int64))

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        b = hash_bucket(t[key].to_numpy(zero_copy_only=False), salt)
        s = np.searchsorted(bounds, b, side="right")
        return t.append_column("split", pa.array(s.astype(np.int64)))

    return ds.map_batches(_f, batch_format="pyarrow")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    stratum: str = "lang",
    permille_by_stratum: dict | None = None,
    default_permille: int = 100,
    salt: int = 0,
) -> ray.data.Dataset:
    """Per-stratum sampling rates (e.g. keep 100% of rare languages, 5% of
    the head language) — the balanced-corpus primitive.  Still a stateless
    per-batch filter; the rate table is tiny and ships in the closure."""
    rates = permille_by_stratum or {}

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        b = hash_bucket(t[key].to_numpy(zero_copy_only=False), salt)
        sv = t[stratum].to_pylist()
        thr = np.fromiter(
            (rates.get(s, default_permille) for s in sv), dtype=np.int64, count=len(sv)
        )
        return t.filter(pa.array(b < thr))

    return ds.map_batches(_f, batch_format="pyarrow")


def mixture_replicate(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    stratum: str = "source",
    epochs_by_stratum: dict | None = None,
    default_epochs: float = 1.0,
    salt: int = 0,
) -> ray.data.Dataset:
    """Deterministic data-mixture construction with UP-sampling: each row is
    emitted floor(e) times plus once more for the frac(e)-weighted hash
    slice, where e = epochs for the row's stratum (e.g. {"wiki": 2.3,
    "web": 0.5} repeats wiki ~2.3x and keeps half of web).  The epoch
    index is exposed as ``epoch`` so downstream shuffles can decorrelate
    copies.  Stateless per-batch flat-map — streams at any scale, no
    shuffle, same output rows under any partitioning (the replication
    decision hashes (key, stratum-rate) only)."""
    rates = epochs_by_stratum or {}

    def _f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t.append_column("epoch", pa.array([], pa.int64()))
        sv = t[stratum].to_pylist()
        e = np.fromiter(
            (float(rates.get(s, default_epochs)) for s in sv),
            dtype=np.float64,
            count=len(sv),
        )
        whole = np.floor(e).astype(np.int64)
        frac_permille = np.round((e - whole) * 1000).astype(np.int64)
        b = hash_bucket(t[key].to_numpy(zero_copy_only=False), salt)
        reps = whole + (b < frac_permille)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        out = t.take(pa.array(idx))
        # epoch = 0..reps[i]-1 per source row, vectorized
        cum = np.concatenate([[0], np.cumsum(reps)[:-1]])
        ep = np.arange(idx.size, dtype=np.int64) - np.repeat(cum, reps)
        return out.append_column("epoch", pa.array(ep, pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow")


def global_shuffle(
    ds: ray.data.Dataset, key: str = "doc_id", salt: int = 0
) -> ray.data.Dataset:
    """Deterministic, reproducible GLOBAL training-data shuffle: every row
    gets a dense 0-based ``pos`` in the order of its full-range Knuth hash
    ``hash_u64(key, salt)`` (ties — astronomically rare but possible at
    10^10 rows — broken by the key itself).  Unlike
    ``Dataset.random_shuffle`` the permutation is a pure function of
    (key, salt): re-runs, resumed jobs and different partitionings produce
    THE SAME order, which is what an LM training pipeline needs to replay
    a data order exactly (epoch e = salt e).

    Distributed shape: one range-partitioned sort by the hash (the same
    all-to-all a random shuffle costs) + a row-count scan for the dense
    index (``zip_with_index``); driver state is per-block counts only."""
    from graphscope_ray.utils import zip_with_index

    def _h(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # schema-stripped empty block (Ray Data quirk); keep the key's
            # real dtype when present.  A MISSING key on a non-empty block
            # is a caller bug and raises below — never an empty result.
            kcol = t[key] if key in t.column_names else pa.array([], pa.int64())
            return pa.table({key: kcol, "__h": pa.array([], pa.uint64())})
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: t[key], "__h": pa.array(hash_u64(k, salt))})

    out = zip_with_index(
        ds.map_batches(_h, batch_format="pyarrow"), ["__h", key], "pos"
    )
    return out.select_columns([key, "pos"])


def temperature_replicate(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    stratum: str = "source",
    tau: float = 2.0,
    salt: int = 6,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Temperature-based mixture sampling — the multilingual/multi-domain
    rebalancing knob (Arivazhagan et al. 2019 §4.2; mT5/UniMax): stratum s
    is sampled with probability ∝ n_s^(1/τ), flattening the natural
    distribution toward uniform as τ grows.  At the row level that is an
    expected-copies rate e_s = (N / Σ_t n_t^(1/τ)) / n_s^(1−1/τ), realized
    by the same deterministic floor + hash-slice replication as
    :func:`mixture_replicate` (budget-preserving: Σ n_s·e_s = N).

    τ = 2 (the common setting) computes weights with ``sqrt`` — an IEEE
    correctly-rounded op, so numpy and the SQL oracle produce identical
    doubles; other τ go through ``power`` and carry the repo's standard
    last-ulp float caveat.  Two passes: one tiny stratum-count exchange,
    then the stateless replication map — nothing corpus-sized leaves the
    workers."""
    from graphscope_ray.utils import hash_groupby_sum

    cnt = hash_groupby_sum(
        ds.select_columns([stratum]), [stratum], None, "n",
        num_partitions=num_partitions,
    ).to_pandas()
    n = cnt["n"].to_numpy().astype(np.float64)
    w = np.sqrt(n) if tau == 2.0 else np.power(n, 1.0 / tau)
    total = float(n.sum())
    ssum = float(w.sum())
    # expression order mirrors the SQL oracle exactly: (N / Σw) / w_s
    rates = {
        s: (total / ssum) / float(ws) for s, ws in zip(cnt[stratum], w)
    }
    return mixture_replicate(
        ds, key=key, stratum=stratum, epochs_by_stratum=rates, salt=salt
    )


def cap_per_stratum(
    ds: ray.data.Dataset,
    cap: int = 100,
    key: str = "doc_id",
    stratum: str = "lang",
    salt: int = 0,
) -> ray.data.Dataset:
    """Hard per-stratum size cap (the UniMax-style corpus-cap rebalancing
    knob — bound every language/domain at ``cap`` docs): keep each
    stratum's ``cap`` rows with the smallest ``hash_u64(key)`` (ties →
    key).  Content-stable like every sampler here — re-runs, repartitioning
    and incremental ingest keep the same winners.

    Distributed shape: per-block keep-cap-smallest-per-stratum partials (a
    valid combiner — the global cap smallest ⊆ union of per-block cap
    smallest) → one stratum-keyed map_groups merge of ≤ cap·blocks rows.
    Rows (key, stratum, h) with h the uint64 hash wrapped to int64."""
    import pandas as pd

    def _partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                stratum: pa.array([], pa.string()),
                "h": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        ids = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                key: ids,
                stratum: t[stratum].to_pylist(),
                "h": hash_u64(ids, salt).view(np.int64),
            }
        )
        # sort by the UNSIGNED hash (view back), then key
        df["_hu"] = df["h"].to_numpy().view(np.uint64)
        df = df.sort_values(["_hu", key]).groupby(stratum, as_index=False).head(cap)
        return pa.Table.from_pandas(
            df[[key, stratum, "h"]], preserve_index=False
        ).replace_schema_metadata(None)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_hu"] = g["h"].to_numpy().view(np.uint64)
        g = g.sort_values(["_hu", key]).head(cap)
        return g[[key, stratum, "h"]]

    return (
        ds.select_columns([key, stratum])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(stratum)
        .map_groups(_merge, batch_format="pandas")
    )
