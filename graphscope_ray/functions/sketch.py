"""Cardinality operators: exact distinct count (hash-exchange) and a
mergeable HyperLogLog sketch.

- exact: per-block unique (cuts the exchange to distinct-per-block) →
  hash split → per-partition unique count → sum of K small ints.  The
  same shape as the engine's dedup exchanges; skew-free for hash keys.
- HLL: ONE (2^p)-byte register array per block, merged by elementwise max
  — the classic mergeable sketch shape for 100-TB inputs where even the
  distinct set is too big to exchange.  Deterministic (fmix64 over the
  value bytes), standard bias-corrected estimate with small-range
  (linear counting) and large-range corrections.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash per value: int64 columns use the fmix64
    avalanche directly; strings hash their utf-8 bytes with the SAME
    ascending-power polynomial + fmix64 kernel as hashing.token_hashes
    (one segment per VALUE, whole column in one segmented reduceat — no
    per-value Python loop).  Empty/null values hash to mix64(0)."""
    from graphscope_ray.functions.hashing import _pow_table, mix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return mix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
    encoded = [(v or "").encode("utf-8", "surrogatepass") for v in col.to_pylist()]
    lens = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=len(encoded))
    out = np.zeros(len(encoded), dtype=np.uint64)
    nz = np.flatnonzero(lens)
    if nz.size:
        b = np.frombuffer(b"".join(encoded), dtype=np.uint8).astype(np.uint64)
        starts = np.concatenate([[0], np.cumsum(lens[nz])])[:-1].astype(np.int64)
        # byte position within its value → ascending powers, token_hashes parity
        pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens[nz])
        pw = _pow_table(int(lens.max()) + 1)
        out[nz] = np.add.reduceat(b * pw[pos], starts)
    return mix64(out)


def count_distinct_exact(
    ds: ray.data.Dataset, col: str, num_partitions: int = 16
) -> int:
    """Exact COUNT(DISTINCT col) without ever collecting the distinct set
    on the driver: per-block unique → hash split (hash routes, VALUES
    travel — no collision risk) → per-partition unique count → sum."""
    K = num_partitions
    blocks = ds.select_columns([col]).materialize().to_arrow_refs()

    @ray.remote
    def _split(t: pa.Table):
        empty = pd.Series([], dtype=object)
        if col not in t.schema.names or t.num_rows == 0:
            parts = tuple(empty for _ in range(K))
            return parts if K > 1 else parts[0]
        u = t[col].to_pandas().drop_duplicates()
        h = pd.util.hash_pandas_object(u, index=False).to_numpy()
        part = (h % np.uint64(K)).astype(np.int64)
        parts = tuple(u[part == p] for p in range(K))
        return parts if K > 1 else parts[0]

    @ray.remote
    def _count(*sers) -> int:
        return int(pd.concat(sers, ignore_index=True).nunique()) if sers else 0

    if K == 1:
        refs = [_split.remote(b) for b in blocks]
        return ray.get(_count.remote(*refs))
    split_refs = [_split.options(num_returns=K).remote(b) for b in blocks]
    counts = ray.get(
        [_count.remote(*[s[k] for s in split_refs]) for k in range(K)]
    )
    return int(sum(counts))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hll_idx_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash: bucket = top p bits, rho = CLZ of the
    remaining 64-p bits (shifted up, low bits padded) + 1."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    rho = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    for b in (32, 16, 8, 4, 2, 1):  # branchless CLZ
        mask = v < (np.uint64(1) << np.uint64(64 - b))
        rho[mask] += b
        v[mask] <<= np.uint64(b)
    return idx, np.minimum(rho + 1, 64 - p + 1).astype(np.uint8)


def _hll_estimate(regs: np.ndarray, m: int) -> float:
    """Bias-corrected harmonic estimate with the standard small-range
    (linear counting) and large-range corrections."""
    est = _hll_alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting, small range
    elif est > (1 << 64) / 30.0:
        est = -(1 << 64) * np.log(1 - est / (1 << 64))
    return float(est)


def hll_count(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """HyperLogLog cardinality estimate (±1.04/√2^p ≈ ±1.6 % at p=12):
    per-block 2^p-register partial sketches, merged by elementwise max.
    Hash collisions aside, the estimate is deterministic — same input,
    same answer, any partitioning."""
    m = 1 << p

    def _partial(t: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        if col in t.schema.names and t.num_rows:
            idx, rho = _hll_idx_rho(_hash64(t[col]), p)
            np.maximum.at(regs, idx, rho)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([col]).map_batches(_partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(m, dtype=np.uint8)
    for rb in parts["regs"]:
        regs = np.maximum(regs, np.frombuffer(rb, dtype=np.uint8))
    return _hll_estimate(regs, m)


def hll_count_by(
    ds: ray.data.Dataset, key: str, col: str, p: int = 10
) -> pd.DataFrame:
    """Per-group HyperLogLog: approximate COUNT(DISTINCT col) GROUP BY key
    — the standard cardinality profile (distinct users per domain, distinct
    docs per language) at scales where even per-group distinct SETS are too
    big to exchange.  Each block emits one 2^p-register partial per group
    PRESENT IN THAT BLOCK (vectorized 2-D scatter-max, one row per distinct
    key per block), then partials merge per key by elementwise max in a
    groupby().map_groups — the only exchange payload is
    #blocks × #groups-per-block × 2^p bytes, never the values.  Mergeable
    and deterministic like ``hll_count``; the estimate per group uses the
    same bias-corrected formula, so the SQL oracle replicates it exactly.

    Returns (key, estimate) sorted by key, estimate rounded to 4 dp."""
    m = 1 << p

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {key: pa.array([], t.schema.field(key).type), "regs": pa.array([], pa.binary())}
            )
        idx, rho = _hll_idx_rho(_hash64(t[col]), p)
        codes, uniq = pd.factorize(t[key].to_pandas(), sort=True)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        return pa.table(
            {key: pa.array(uniq), "regs": pa.array([r.tobytes() for r in regs], pa.binary())}
        )

    partials = ds.select_columns([key, col]).map_batches(_partial, batch_format="pyarrow")

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for rb in df["regs"]:
            regs = np.maximum(regs, np.frombuffer(rb, dtype=np.uint8))
        return pd.DataFrame(
            {key: [df[key].iloc[0]], "estimate": [round(_hll_estimate(regs, m), 4)]}
        )

    out = partials.groupby(key).map_groups(_merge, batch_format="pandas").to_pandas()
    return out.sort_values(key).reset_index(drop=True)


# ---------------------------------------------------------------------------
# count-min sketch heavy hitters


_CMS_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _cms_buckets(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(len(h), d) bucket indices: row i uses fmix64(h + (i+1)·φ64)."""
    from graphscope_ray.functions.hashing import mix64

    out = np.empty((len(h), d), dtype=np.int64)
    for i in range(d):
        # (i+1)·φ64 mod 2^64 precomputed in Python ints — numpy warns on
        # intended uint64 scalar wraparound
        salt = np.uint64(((i + 1) * int(_CMS_MIX)) % (1 << 64))
        out[:, i] = (mix64(h + salt) % np.uint64(w)).astype(np.int64)
    return out


def cms_heavy_hitters(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = 4,
    w: int = 2048,
    threshold: int = 50,
) -> pd.DataFrame:
    """Heavy-hitter tokens via a count-min sketch: every block contributes a
    d×w partial count table (ADDITIVELY mergeable — the d·w ints are the
    only thing that crosses the wire, never the token stream), then each
    candidate token's estimate = min over the d rows.  Deterministic:
    token hash = the segmented-polynomial fmix64 kernel over lower(text).

    Candidates here are the distinct tokens (collected per-block-unique —
    small for a vocabulary; at open-web scale feed an external candidate
    stream instead).  Returns (tok, est) with est ≥ threshold, sorted.
    CMS guarantees est ≥ true count, so no true heavy hitter is missed."""
    from graphscope_ray.functions.hashing import batch_token_hashes

    def _partial(t: pa.Table) -> pa.Table:
        texts = [(x or "").lower() for x in t[text_col].to_pylist()]
        hs, _ = batch_token_hashes(texts)
        cms = np.zeros((d, w), dtype=np.int64)
        if hs.size:
            b = _cms_buckets(hs, d, w)
            for i in range(d):
                np.add.at(cms[i], b[:, i], 1)
        return pa.table({"cms": pa.array([cms.tobytes()], pa.binary())})

    parts = ds.select_columns([text_col]).map_batches(_partial, batch_format="pyarrow").to_pandas()
    cms = np.zeros((d, w), dtype=np.int64)
    for blob in parts["cms"]:
        cms += np.frombuffer(blob, dtype=np.int64).reshape(d, w)

    # candidate set: distinct tokens, per-block unique first
    def _cands(t: pa.Table) -> pa.Table:
        toks = set()
        for x in t[text_col].to_pylist():
            toks.update((x or "").lower().split())
        return pa.table({"tok": pa.array(sorted(toks), pa.string())})

    cand = (
        ds.select_columns([text_col])
        .map_batches(_cands, batch_format="pyarrow")
        .to_pandas()["tok"]
        .drop_duplicates()
        .sort_values()
        .to_numpy()
    )
    from graphscope_ray.functions.hashing import token_hashes

    ch = np.array(
        [token_hashes(t.encode())[0] if t else 0 for t in cand], dtype=np.uint64
    )
    cb = _cms_buckets(ch, d, w)
    est = np.min(cms[np.arange(d)[None, :], cb], axis=1)
    keep = est >= threshold
    out = pd.DataFrame({"tok": cand[keep], "est": est[keep].astype(np.int64)})
    return out.sort_values("tok").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom filter: mergeable bitmap membership sketch

_BLOOM_SALT = np.uint64(0xA24BAED4963EE407)


def _bloom_h1h2(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing pair per value (Kirsch–Mitzenmacher): h1 = the
    engine's deterministic value hash, h2 = fmix64(h1 xor salt) forced odd
    so positions h1 + j·h2 cycle the whole table for any power-of-two m."""
    from graphscope_ray.functions.hashing import mix64

    h1 = _hash64(col)
    h2 = mix64(h1 ^ _BLOOM_SALT) | np.uint64(1)
    return h1, h2


def bloom_build(
    ds: ray.data.Dataset, col: str, m_bits: int = 1 << 20, k: int = 3
) -> np.ndarray:
    """Build a Bloom filter over a column: every block contributes an
    m-bit partial bitmap (OR-mergeable — the m/8 bytes are the only thing
    that crosses the wire, never the key stream; at multi-node scale the
    OR is associative, so partials tree-reduce).  Returns the bitmap as
    m/64 uint64 words.  Deterministic for a given (m_bits, k).

    The classic bounded-memory membership structure for incremental-ingest
    dedup: build over yesterday's corpus once, stream today's records
    through ``bloom_member`` — no join, no shuffle, zero false negatives.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    words = m_bits // 64
    mask = np.uint64(m_bits - 1)

    def _partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        if t.num_rows:
            h1, h2 = _bloom_h1h2(t[col])
            for j in range(k):
                pos = (h1 + np.uint64(j) * h2) & mask
                np.bitwise_or.at(
                    bm,
                    (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = (
        ds.select_columns([col]).map_batches(_partial, batch_format="pyarrow").to_pandas()
    )
    bm = np.zeros(words, dtype=np.uint64)
    for blob in parts["bm"]:
        bm |= np.frombuffer(blob, dtype=np.uint64)
    return bm


def bloom_member(
    ds: ray.data.Dataset,
    bloom: np.ndarray,
    col: str,
    k: int = 3,
    out_col: str = "bloom_hit",
) -> ray.data.Dataset:
    """Tag each row with Bloom membership (1 = maybe-member, possibly a
    false positive; 0 = definitely absent).  The bitmap broadcasts once
    via ``ray.put`` and every block probes it vectorized — the streaming
    side never shuffles.  m is derived from the bitmap itself
    (``bloom.size * 64``) so build and probe can never disagree on the
    table size; ``k`` must equal the build's k (probing with a larger k
    than was built WOULD create false negatives)."""
    import ray

    m_bits = int(bloom.size) * 64
    mask = np.uint64(m_bits - 1)
    ref = ray.put(bloom)

    def _probe(t: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        h1, h2 = _bloom_h1h2(t[col])
        hit = np.ones(h1.size, dtype=bool)
        for j in range(k):
            pos = (h1 + np.uint64(j) * h2) & mask
            bits = (bm[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
            hit &= bits.astype(bool)
        return t.append_column(out_col, pa.array(hit.astype(np.int64)))

    return ds.map_batches(_probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic mergeable quantile summary (MRL-style)


def quantile_sketch(
    ds: ray.data.Dataset,
    value_col: str,
    key_cols: tuple[str, str],
    qs: tuple = ((1, 100), (1, 4), (1, 2), (3, 4), (99, 100)),
    k: int = 128,
    num_partitions: int = 16,
    salt: int = 9,
    key_mult: int = 8,
) -> pd.DataFrame:
    """Deterministic mergeable quantile summary (the Manku–Rajagopalan–
    Lindsay '98 collapse scheme, rank-uniform variant): rows hash-partition
    by a composite integer key, each partition sorts its values and keeps
    the LAST row of every rank-chunk of size ceil(n_p / k) with the chunk
    size as its weight — a classic ε-summary with DETERMINISTIC worst-case
    rank error < max_p ceil(n_p / k) per kept item (no randomness, unlike
    KLL compactors, so re-runs and the SQL oracle agree exactly).  The
    ≤ P·k weighted items merge by value order; quantile q = num/den is the
    first merged item whose cumulative weight reaches
    ceil(q·N) = (num·N + den − 1) // den — exact integer arithmetic.

    Completes the mergeable-sketch family (HLL cardinality, CMS heavy
    hitters, Bloom membership) with rank statistics: at 100 TB the P
    partition summaries are k-sized — only O(P·k) weighted rows ever leave
    the partitions, vs the full sort an exact quantile needs.  (At extreme
    P re-collapse the merged summary once more — same operation — to keep
    the driver merge k-sized; the guarantee adds the two chunk sizes.)

    ``key_cols`` = (major, minor) integer columns whose composite
    ``major·key_mult + minor`` is unique per row (total order + stable
    partitioning); minor must be < key_mult.  Returns (q, value), one row
    per requested quantile."""
    import pyarrow.compute as pc

    from graphscope_ray.functions.sampling import hash_bucket

    maj, mino = key_cols

    def _part(t: pa.Table) -> pa.Table:
        # a missing column on a NON-empty block is a caller bug and raises
        # below; only genuinely empty (possibly schema-stripped) blocks pass
        if t.num_rows == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                    "ok": pa.array([], pa.int64()),
                    "ln": pa.array([], pa.int64()),
                }
            )
        ok = t[maj].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = t[mino].to_numpy(zero_copy_only=False).astype(np.int64)
        part = hash_bucket(ok * key_mult + ln, salt) % num_partitions
        return pa.table(
            {
                "part": pa.array(part),
                "v": pc.cast(t[value_col], pa.float64()),
                "ok": pa.array(ok),
                "ln": pa.array(ln),
            }
        )

    def _summarize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["v", "ok", "ln"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(df)
        st = -(-n // k)  # ceil(n / k)
        chunk = np.arange(n, dtype=np.int64) // st
        last = np.flatnonzero(
            np.concatenate([chunk[1:] != chunk[:-1], [True]])
        )
        w = np.diff(np.concatenate([[-1], last]))
        out = df.iloc[last][["v", "ok", "ln"]].copy()
        out["w"] = w.astype(np.int64)
        return out

    kept = (
        ds.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_summarize, batch_format="pandas")
        .to_pandas()
    )
    kept = kept.sort_values(["v", "ok", "ln"], kind="mergesort").reset_index(
        drop=True
    )
    if kept.empty:
        return pd.DataFrame(columns=["q", "value"])
    cw = kept["w"].to_numpy().cumsum()
    n_total = int(cw[-1])
    rows = []
    for num, den in qs:
        target = (num * n_total + den - 1) // den
        idx = int(np.searchsorted(cw, target, side="left"))
        rows.append((num / den, float(kept["v"].iloc[idx])))
    return pd.DataFrame(rows, columns=["q", "value"])
