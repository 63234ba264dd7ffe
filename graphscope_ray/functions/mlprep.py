"""ML-prep operators for training-data pipelines: TF-IDF, n-gram counts,
per-group standardization, distributed k-means.

Scale shapes:
- TF-IDF: two hash-exchange groupbys (term-frequency per (doc, tok), then
  document frequency per tok) + one hash join — no broadcast of the
  vocabulary, so it survives web-scale vocabularies.
- bigrams: per-doc vectorized token shift inside ``map_batches`` + one
  hash-exchange count; nothing doc-sized leaves the batch.
- standardize: one small groupby (means/stds per group) broadcast back —
  the group cardinality is the small side by contract.
- k-means: Lloyd's with the model broadcast per round and ONE partial-sum
  combine per block (k×d floats per block cross the wire, never points);
  deterministic init = the k lowest-id points.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.utils import hash_groupby_sum, hash_join


def tfidf(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """tf·idf per (doc, token): tf = in-doc count, idf = ln(N / df) with
    df = number of docs containing the token.  Tokens = non-empty
    single-space splits (the corpus contract)."""
    from graphscope_ray.functions.joins import posexplode

    n_docs = ds.count()
    toks = posexplode(ds, id_col, text_col, sep=" ").filter(expr="tok != ''")
    tf = hash_groupby_sum(
        toks.select_columns([id_col, "tok"]), [id_col, "tok"], None, "tf",
        num_partitions=num_partitions,
    )
    df = hash_groupby_sum(
        tf.select_columns(["tok"]), ["tok"], None, "df", num_partitions=num_partitions
    )
    joined = hash_join(tf, df, left_on="tok", right_on="tok", num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("tfidf", pa.array(tf_v * np.log(n_docs / df_v)))

    return joined.map_batches(_score, batch_format="pyarrow")


def bigram_counts(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
    min_count: int = 1,
) -> ray.data.Dataset:
    """Corpus-wide bigram counts: per-doc adjacent token pairs (vectorized
    shift inside the batch), then one hash-exchange count."""
    import pyarrow.compute as pc

    def _bigrams(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern(t[text_col], " ")
        counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.list_flatten(lst).to_numpy(zero_copy_only=False)
        keep = np.ones(len(toks), dtype=bool)
        ends = np.cumsum(counts) - 1  # last token of each doc starts no bigram
        keep[ends[counts > 0]] = False
        left = toks[keep]
        right = np.roll(toks, -1)[keep]
        bg = np.char.add(np.char.add(left.astype(str), " "), right.astype(str))
        return pa.table({"bigram": pa.array(bg)})

    bg = ds.select_columns([id_col, text_col]).map_batches(_bigrams, batch_format="pyarrow")
    out = hash_groupby_sum(bg, ["bigram"], None, "n", num_partitions=num_partitions)
    if min_count > 1:
        out = out.filter(expr=f"n >= {min_count}")
    return out


def standardize(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Per-group z-score (population std): z = (v − mean_g) / std_g.
    One small groupby computes the per-group moments; they are broadcast
    back and applied vectorized per batch."""
    from ray.data.aggregate import Count, Sum

    def _sq(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({group_col: t[group_col], "v": pa.array(v), "v2": pa.array(v * v)})

    stats = (
        ds.map_batches(_sq, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("v", alias_name="s"), Sum("v2", alias_name="s2"), Count(alias_name="n"))
        .to_pandas()
    )
    mean = stats["s"].to_numpy() / stats["n"].to_numpy()
    var = stats["s2"].to_numpy() / stats["n"].to_numpy() - mean * mean
    ref = ray.put(
        {
            g: (m, float(np.sqrt(max(v, 0.0))))
            for g, m, v in zip(stats[group_col], mean, var)
        }
    )

    def _apply(t: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ms = np.array([lookup[x][0] for x in g])
        ss = np.array([lookup[x][1] for x in g])
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(ss > 0, (v - ms) / ss, 0.0)
        return t.append_column("z", pa.array(z))

    return ds.map_batches(_apply, batch_format="pyarrow")


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Distributed Lloyd's k-means with deterministic init (the k lowest-id
    vectors) and a fixed iteration count.

    Per round the (k×d) centroid matrix is broadcast (``ray.put``) and each
    batch emits only partial sums + counts per centroid — points never
    leave their block; the driver reduces k×d floats per block.  Ties in
    the nearest-centroid argmin break to the LOWEST centroid id
    (np.argmin semantics).  Returns (assignments Dataset, centroids)."""
    ds = ds.materialize()
    seed = (
        ds.sort(id_col)
        .limit(k)
        .to_pandas()
    )
    C = np.stack(seed[vec_col].to_numpy()).astype(np.float64)

    for _ in range(iters):
        ref = ray.put(C)

        def _partial(t: pa.Table) -> pa.Table:
            cents = ray.get(ref)
            X = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            kk, dd = cents.shape
            sums = np.zeros((kk, dd))
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=kk).astype(np.float64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(kk, dtype=np.int64)),
                    "cnt": pa.array(cnt),
                    "sum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(C)
        cnts = np.zeros(len(C))
        for cid, cnt, sm in zip(parts["cid"], parts["cnt"], parts["sum"]):
            sums[cid] += np.asarray(sm)
            cnts[cid] += cnt
        nonzero = cnts > 0
        C = np.where(nonzero[:, None], sums / np.maximum(cnts, 1)[:, None], C)

    ref = ray.put(C)

    def _assign(t: pa.Table) -> pa.Table:
        cents = ray.get(ref)
        X = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow"), C


def profile_table(
    ds: ray.data.Dataset, numeric_cols: list[str]
) -> pd.DataFrame:
    """DESCRIBE-style column profile: one streaming pass emits per-block
    partials (count, nulls, min, max, sum) per column; the driver folds
    block partials — constant-size state, never the data.  Returns one row
    per column: (column, n, n_null, min, max, mean)."""
    import pyarrow.compute as pc

    cols = list(numeric_cols)

    def _partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = t[c]
            n = len(arr)
            nn = arr.null_count
            if n - nn > 0:
                mn = pc.min(arr).as_py()
                mx = pc.max(arr).as_py()
                sm = pc.sum(arr).as_py()
            else:
                mn, mx, sm = np.inf, -np.inf, 0.0
            rows.append((c, n, nn, float(mn), float(mx), float(sm)))
        out = pd.DataFrame(rows, columns=["column", "n", "n_null", "mn", "mx", "sm"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("column")
    out = pd.DataFrame(
        {
            "column": sorted(cols),
            "n": g["n"].sum().reindex(sorted(cols)).to_numpy(np.int64),
            "n_null": g["n_null"].sum().reindex(sorted(cols)).to_numpy(np.int64),
            "min": g["mn"].min().reindex(sorted(cols)).to_numpy(np.float64),
            "max": g["mx"].max().reindex(sorted(cols)).to_numpy(np.float64),
        }
    )
    sm = g["sm"].sum().reindex(sorted(cols)).to_numpy(np.float64)
    out["mean"] = sm / np.maximum(out["n"] - out["n_null"], 1)
    # all-null / empty column: the (inf, -inf) empty-block placeholder must
    # not leak out — SQL semantics give NULL min/max/mean there
    degenerate = (out["n"] - out["n_null"]) == 0
    out.loc[degenerate, ["min", "max", "mean"]] = np.nan
    return out.reset_index(drop=True)


def ordered_cumsum(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "cum_before",
) -> ray.data.Dataset:
    """EXCLUSIVE prefix sum of ``val_col`` in global ``key_col`` order — the
    distributed-scan primitive (for sequence packing, running totals, offset
    assignment).

    Two-pass scan: pass 1 computes per-block (min key, max key, sum) in
    parallel; the driver holds one 3-tuple PER BLOCK (never data), orders
    blocks by min key and asserts block key ranges do not overlap — the
    input must be range-partitioned on ``key_col`` (true of any sorted
    Parquet write, e.g. the testdata tables); pass 2 adds each block's
    exclusive offset to its intra-block exclusive cumsum.  Rows come back
    sorted by key within each block."""
    import ray as _ray

    blocks = ds.materialize().to_arrow_refs()

    @_ray.remote
    def _meta(t: pa.Table):
        if t.num_rows == 0:
            return (None, None, 0)
        k = t[key_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False)
        return (k.min(), k.max(), int(v.sum()))

    metas = _ray.get([_meta.remote(b) for b in blocks])
    nonempty = [i for i, m in enumerate(metas) if m[0] is not None]
    nonempty.sort(key=lambda i: metas[i][0])
    for a, b in zip(nonempty, nonempty[1:]):
        if metas[b][0] <= metas[a][1]:
            raise ValueError(
                f"ordered_cumsum: block key ranges overlap "
                f"({metas[a]} vs {metas[b]}) — input must be range-partitioned on {key_col!r}"
            )
    offsets = {}
    run = 0
    for i in nonempty:
        offsets[i] = run
        run += metas[i][2]

    @_ray.remote
    def _apply(t: pa.Table, off: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        k = t[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        t = t.take(pa.array(order))
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = off + np.concatenate([[0], np.cumsum(v)[:-1]])
        return t.append_column(out_col, pa.array(cum))

    return ray.data.from_arrow_refs(
        [_apply.remote(b, offsets.get(i, 0)) for i, b in enumerate(blocks)]
    )


def pack_sequences(
    ds: ray.data.Dataset,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """GPT-style sample packing (concat-and-chunk): documents are laid out
    end-to-end in ``id_col`` order and cut into fixed ``seq_len``-token
    training sequences; each doc is assigned the sequence and offset where
    its first token lands (docs may span sequence boundaries, as in
    standard causal-LM pretraining packing).  Output: (id, n_tokens,
    seq_id, seq_offset).

    Token counts are the whitespace \\S+ rule (functions/text.py:
    token_counts); the global layout is one :func:`ordered_cumsum` scan —
    no driver-side data, no shuffle beyond the per-block scan tasks."""
    from graphscope_ray.functions.text import token_counts

    tok = token_counts(ds.select_columns([id_col, text_col]))
    cum = ordered_cumsum(tok, id_col, "n_tokens")

    def _cut(t: pa.Table) -> pa.Table:
        c = t["cum_before"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "seq_id": pa.array(c // seq_len),
                "seq_offset": pa.array(c % seq_len),
            }
        )

    return cum.map_batches(_cut, batch_format="pyarrow")


def cooccurrence_ppmi(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    min_count: int = 2,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Skip-gram co-occurrence counts + PPMI weights (the word2vec-SGNS /
    GloVe corpus statistic, Levy & Goldberg 2014): for every ordered token
    pair within ``window`` positions in the same document,
    ``n(w, c)`` = pair count, ``ppmi = max(0, ln(N·n(w,c) / (n(w)·n(c))))``
    with marginals over the pair table and N = Σn.

    Tokens are single-space positions (the corpus contract, same rule as
    bigram_counts — empty tokens hold their position but pair into
    nothing).  Distributed shape: pairs are built by VECTORIZED shifts of
    the flattened token array (one (left, right) + (right, left) slice
    pair per offset d ≤ window, masked to same-doc), pre-combined per
    block inside ``hash_groupby_sum``; the marginals are two more
    hash-exchange groupbys OVER THE AGGREGATED pair table (vocab-sized,
    not corpus-sized) joined back with ``hash_join``.  Nothing
    corpus-sized is ever broadcast.  Returns (w, c, n, ppmi) with
    n ≥ min_count, ppmi rounded to 8 dp."""
    import pyarrow.compute as pc

    from graphscope_ray.utils import hash_join

    def _pairs(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern(t[text_col], " ")
        counts = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.list_flatten(lst).to_numpy(zero_copy_only=False).astype(str)
        doc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        ws, cs = [], []
        for d in range(1, window + 1):
            if len(toks) <= d:
                break
            same = doc[:-d] == doc[d:]
            left, right = toks[:-d], toks[d:]
            m = same & (left != "") & (right != "")
            ws.append(left[m]); cs.append(right[m])   # (w, c) forward
            ws.append(right[m]); cs.append(left[m])   # (c, w) backward
        if not ws:
            return pa.table({"w": pa.array([], pa.string()), "c": pa.array([], pa.string())})
        return pa.table(
            {"w": pa.array(np.concatenate(ws)), "c": pa.array(np.concatenate(cs))}
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(_pairs, batch_format="pyarrow")
    return ppmi_from_pairs(pairs, min_count, num_partitions, pa.string())


def ppmi_from_pairs(
    pairs: ray.data.Dataset, min_count: int, num_partitions: int, key_type
) -> ray.data.Dataset:
    """PPMI over a raw skip-gram pair stream (w, c): count exchange, two
    vocab-sized marginal groupbys joined back, vectorized score.  Shared by
    the text skip-gram path and the DeepWalk walk-corpus path."""
    from graphscope_ray.utils import hash_join

    counts = hash_groupby_sum(pairs, ["w", "c"], None, "n", num_partitions=num_partitions)
    counts = counts.materialize()
    nw = hash_groupby_sum(counts, ["w"], "n", "nw", num_partitions=num_partitions)
    nc = hash_groupby_sum(counts, ["c"], "n", "nc", num_partitions=num_partitions)
    total = float(counts.sum("n"))
    j = hash_join(counts, nw, "w", "w", num_partitions=num_partitions)
    j = hash_join(j, nc, "c", "c", num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n" not in t.column_names:
            return pa.table(
                {
                    "w": pa.array([], key_type),
                    "c": pa.array([], key_type),
                    "n": pa.array([], pa.int64()),
                    "ppmi": pa.array([], pa.float64()),
                }
            )
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        mw = t["nw"].to_numpy(zero_copy_only=False).astype(np.float64)
        mc = t["nc"].to_numpy(zero_copy_only=False).astype(np.float64)
        ppmi = np.round(np.maximum(np.log(total * n / (mw * mc)), 0.0), 8)
        keep = t["n"].to_numpy(zero_copy_only=False) >= min_count
        return pa.table(
            {
                "w": t["w"].filter(pa.array(keep)) if not keep.all() else t["w"],
                "c": t["c"].filter(pa.array(keep)) if not keep.all() else t["c"],
                "n": pa.array(t["n"].to_numpy(zero_copy_only=False)[keep]),
                "ppmi": pa.array(ppmi[keep]),
            }
        )

    return j.map_batches(_score, batch_format="pyarrow")


def walk_skipgram_ppmi(
    walks: ray.data.Dataset,
    window: int = 2,
    min_count: int = 1,
    num_partitions: int = 8,
    walk_col: str = "walk_id",
    step_col: str = "step",
    tok_col: str = "v",
) -> ray.data.Dataset:
    """DeepWalk corpus statistics (Perozzi et al. 2014 = random walks +
    word2vec; with Levy & Goldberg 2014 the SGNS factorization target is
    exactly this PPMI matrix): skip-gram pairs over each walk's step
    sequence within ``window`` steps, then PPMI over the pair table.
    Walks co-locate per walk_id in one groupby exchange; pairs come from
    vectorized shifts of the step-sorted token array; the scoring tail is
    shared with ``cooccurrence_ppmi``.  Returns (w, c, n, ppmi) with
    int64 vertex tokens."""

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        v = df.sort_values(step_col)[tok_col].to_numpy(np.int64)
        ws, cs = [], []
        for d in range(1, window + 1):
            if len(v) <= d:
                break
            ws.append(v[:-d]); cs.append(v[d:])
            ws.append(v[d:]); cs.append(v[:-d])
        if not ws:
            return pd.DataFrame({"w": pd.Series(dtype=np.int64), "c": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"w": np.concatenate(ws), "c": np.concatenate(cs)})

    pairs = (
        walks.select_columns([walk_col, step_col, tok_col])
        .groupby(walk_col)
        .map_groups(_pairs, batch_format="pandas")
    )
    return ppmi_from_pairs(pairs, min_count, num_partitions, pa.int64())


def embedding_covariance(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """Exact-integer second-moment table of an embedding column — the
    all-reduce half of distributed PCA: vectors quantize to
    q = floor(scale·x + 0.5) (floor(x+0.5) rounds identically in numpy and
    SQL, unlike banker's round), and each block folds into d(d+1)/2
    constant-size partials (n, Σq_i, Σq_j, Σq_i·q_j) — ONE tiny
    hash-exchange of dimension-pair keys regardless of corpus size.
    Rows (i, j, n, sa, sb, spp), i ≤ j, all int64 (exact: |q| ≤ scale·|x|,
    d·n·scale² far below 2^63 for unit-normalized embeddings).
    Covariance derives as (spp/n − sa·sb/n²)/scale² driver-side."""
    from graphscope_ray.utils import hash_groupby_sum, vecs2d

    def _partial(t: pa.Table) -> pa.Table:
        guard = {
            c: pa.array([], pa.int64()) for c in ("i", "j", "n", "sa", "sb", "spp")
        }
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table(guard)
        X = vecs2d(t[vec_col])
        if X.size == 0:
            return pa.table(guard)
        Q = np.floor(X * scale + 0.5).astype(np.int64)
        d = Q.shape[1]
        P = Q.T @ Q
        S = Q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "n": pa.array(np.full(iu.size, len(Q), dtype=np.int64)),
                "sa": pa.array(S[iu]),
                "sb": pa.array(S[ju]),
                "spp": pa.array(P[iu, ju]),
            }
        )

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return hash_groupby_sum(
        partials, ["i", "j"], ["n", "sa", "sb", "spp"], ["n", "sa", "sb", "spp"],
        num_partitions=8,
    )


def pca_project(
    ds: "ray.data.Dataset",
    n_components: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """Distributed PCA: covariance from :func:`embedding_covariance`
    (d²-sized, exact), eigendecomposition driver-side (d×d — constant work),
    deterministic sign convention (each component's largest-|entry|
    coordinate is positive, ties → lowest index), then one streaming
    map_batches projects every vector onto the top components (model
    broadcast once via ray.put).  Rows (vec_id, pc0..pc{k-1})."""
    import ray as _ray

    from graphscope_ray.utils import vecs2d

    cov_rows = embedding_covariance(ds, vec_col=vec_col, scale=scale).to_pandas()
    d = int(cov_rows["i"].max()) + 1
    n = int(cov_rows.loc[(cov_rows.i == 0) & (cov_rows.j == 0), "n"].iloc[0])
    C = np.zeros((d, d), dtype=np.float64)
    mu = np.zeros(d, dtype=np.float64)
    for r in cov_rows.itertuples():
        cij = (r.spp / n - (r.sa / n) * (r.sb / n)) / (scale * scale)
        C[r.i, r.j] = C[r.j, r.i] = cij
        if r.i == r.j:
            mu[r.i] = r.sa / n / scale
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:n_components]
    comps = V[:, order].T  # (k, d)
    for c in comps:
        m = np.argmax(np.abs(np.round(c, 12)))
        if c[m] < 0:
            c *= -1.0
    ref = _ray.put((mu, comps))

    def _proj(t: pa.Table) -> pa.Table:
        mu_, comps_ = _ray.get(ref)
        k = comps_.shape[0]
        guard = {id_col: pa.array([], pa.int64())}
        guard.update({f"pc{c}": pa.array([], pa.float64()) for c in range(k)})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table(guard)
        X = vecs2d(t[vec_col])
        Y = (X - mu_) @ comps_.T
        cols = {id_col: t[id_col]}
        for c in range(k):
            cols[f"pc{c}"] = pa.array(Y[:, c])
        return pa.table(cols)

    return ds.select_columns([id_col, vec_col]).map_batches(_proj, batch_format="pyarrow")


def feature_hash(
    ds: "ray.data.Dataset", m: int = 1024, text_col: str = "text"
) -> "ray.data.Dataset":
    """Hashing-trick bag-of-tokens featurization (Weinberger et al. 2009):
    sparse rows (doc_id, bucket, cnt) with bucket = token_hash mod m over
    the lowercased whitespace tokens — the fixed-width feature map that
    needs NO vocabulary broadcast at any corpus size.  Uses the repo's
    SQL-replicable polynomial+fmix64 token hash (functions/hashing.py), so
    the oracle reproduces every bucket bit-for-bit.  Stateless flat-map:
    each doc's counts complete inside its own batch — no exchange."""
    assert m & (m - 1) == 0, "m must be a power of two (hash mask)"
    from graphscope_ray.functions.hashing import batch_token_hashes

    def _f(t: pa.Table) -> pa.Table:
        guard = {
            "doc_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table(guard)
        import pyarrow.compute as pc

        texts = pc.utf8_lower(t[text_col]).to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes, bounds = batch_token_hashes(texts)
        if hashes.size == 0:
            return pa.table(guard)
        buckets = (hashes % np.uint64(m)).astype(np.int64)
        ntok = np.diff(bounds)
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), ntok)
        packed = doc_of * m + buckets
        uniq, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[uniq // m]),
                "bucket": pa.array(uniq % m),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    return ds.select_columns(["doc_id", text_col]).map_batches(_f, batch_format="pyarrow")


def pearson_corr(
    ds: "ray.data.Dataset", cols: list[str], scale: int = 100
) -> "pd.DataFrame":
    """Pairwise Pearson correlation matrix over numeric columns with
    EXACT-integer moments: values quantize to q = floor(scale·x + 0.5)
    (numpy/SQL-identical rounding), each block folds into per-pair
    (n, Σqa, Σqb, Σqa·qb) int64 partials — constant-size, one tiny driver
    fold; r derives in ONE float expression per pair, so the SQL oracle is
    digit-identical at 8dp.  Rows (col_a, col_b, n, r)."""

    def _partial(t: pa.Table) -> pa.Table:
        guard = {
            "i": pa.array([], pa.int64()), "j": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()), "sa": pa.array([], pa.int64()),
            "sb": pa.array([], pa.int64()), "spp": pa.array([], pa.int64()),
        }
        if t.num_rows == 0 or not set(cols).issubset(t.column_names):
            return pa.table(guard)
        Q = np.stack(
            [
                np.floor(
                    t[c].to_numpy(zero_copy_only=False).astype(np.float64) * scale + 0.5
                ).astype(np.int64)
                for c in cols
            ],
            axis=1,
        )
        P = Q.T @ Q
        S = Q.sum(axis=0)
        iu, ju = np.triu_indices(len(cols))
        return pa.table(
            {
                "i": pa.array(iu.astype(np.int64)),
                "j": pa.array(ju.astype(np.int64)),
                "n": pa.array(np.full(iu.size, len(Q), dtype=np.int64)),
                "sa": pa.array(S[iu]),
                "sb": pa.array(S[ju]),
                "spp": pa.array(P[iu, ju]),
            }
        )

    agg = (
        ds.select_columns(cols)
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["i", "j"], as_index=False)
        .sum()
    )
    mom = {(int(r.i), int(r.j)): r for r in agg.itertuples()}
    rows = []
    for (i, j), r in sorted(mom.items()):
        if i == j:
            continue
        n = int(r.n)
        vii, vjj = mom[(i, i)], mom[(j, j)]
        # python ints: n·Σab exceeds int64 long before the partials do
        num = n * int(r.spp) - int(r.sa) * int(r.sb)
        dena = n * int(vii.spp) - int(vii.sa) ** 2
        denb = n * int(vjj.spp) - int(vjj.sa) ** 2
        rho = float(num) / np.sqrt(float(dena) * float(denb)) if dena > 0 and denb > 0 else 0.0
        rows.append((cols[i], cols[j], n, round(rho, 8)))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "n", "r"])
