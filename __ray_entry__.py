"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship link-graph pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline
(SURVEY.md §2 coverage); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every oracle-checkable entry (iterative algorithms are unrolled CTE
chains generated in graphscope_ray/pipelines/oracle_sql.py).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # graphscope_ray importable


def _quiet():
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def entry() -> Any:
    """Flagship: derive the link graph from sf0.001 lineitem, run PageRank to
    1e-6 + WCC + per-vertex triangles; one row per vertex."""
    _quiet()
    from graphscope_ray.pipelines import testdata as td

    sf = "/root/testdata/sf0.001"
    pr = td.lg_pagerank_converged(sf)
    wc = td.lg_wcc(sf)
    tri = td.lg_triangles(sf)
    out = pr.merge(wc, on="oid").merge(tri, on="oid")
    return out


# ---------------------------------------------------------------------------


def _read_clean(path):
    """read_parquet with metadata-stripped schema (metadata-bearing pyarrow
    schemas are unhashable -> Ray Data schema-dedup warning on every read)."""
    import pyarrow.parquet as pq

    import ray.data

    return ray.data.read_parquet(path, schema=pq.read_schema(path).remove_metadata())


def _documents(sf_dir):
    return _read_clean(f"{sf_dir}/documents.parquet")


def _embeddings(sf_dir):
    return _read_clean(f"{sf_dir}/embeddings.parquet")


def _q_text_tokens(sf_dir):
    from graphscope_ray.functions.text import token_counts

    return token_counts(_documents(sf_dir))


def _q_text_tokens_bpe(sf_dir):
    from graphscope_ray.functions.text import token_counts_bpe

    return token_counts_bpe(_documents(sf_dir))


def _q_text_stats(sf_dir):
    from graphscope_ray.functions.text import text_stats

    return text_stats(_documents(sf_dir))


def _q_text_quality(sf_dir):
    from graphscope_ray.functions.text import quality_score

    df = quality_score(_documents(sf_dir)).to_pandas()
    df["quality"] = df["quality"].round(8)
    return df


def _q_text_repetition(sf_dir):
    from graphscope_ray.functions.text import repetition_stats

    return repetition_stats(_documents(sf_dir))


def _q_pii_scrub(sf_dir):
    """PII scrub with deterministic doc_id-keyed planting (the synthetic
    docs contain no PII; the plant mirrors the CASE in pii_scrub_sql)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from graphscope_ray.functions.text import pii_scrub

    plants = np.array(
        [
            " contact bob.smith+x@example-site.org or admin@host.io now",
            " server at 192.168.1.254 port 8080",
            " call +1 555 0123 or 415-555-0199 today",
            "",
            "",
        ],
        dtype=object,
    )

    def _plant(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        suf = pa.array(plants[did % 5].tolist(), pa.string())
        return pa.table(
            {"doc_id": t["doc_id"], "text": pc.binary_join_element_wise(t["text"], suf, "")}
        )

    return pii_scrub(_documents(sf_dir).map_batches(_plant, batch_format="pyarrow"))


def _q_split_by_content(sf_dir):
    """Leakage-safe split: identical texts share a fingerprint, hence a
    split — exact dups can never straddle train/test."""
    from graphscope_ray.functions.sampling import hash_split
    from graphscope_ray.functions.text import fingerprints

    fp = fingerprints(_documents(sf_dir))
    out = hash_split(fp, key="fingerprint", weights=(800, 100, 100), salt=7)
    return out.select_columns(["doc_id", "split"])


def _q_pack_sequences(sf_dir):
    from graphscope_ray.functions.mlprep import pack_sequences

    return pack_sequences(_documents(sf_dir), seq_len=256)


def _q_text_langid(sf_dir):
    from graphscope_ray.functions.text import lang_id

    return lang_id(_documents(sf_dir))


def _q_text_fingerprint(sf_dir):
    from graphscope_ray.functions.text import fingerprints

    return fingerprints(_documents(sf_dir))


def _q_text_entropy(sf_dir):
    from graphscope_ray.functions.text import char_entropy

    return char_entropy(_documents(sf_dir))


def _q_dedup_decontaminate(sf_dir, n: int = 8):
    """GPT-3-style test-set decontamination: train = doc_id%10≠0, test =
    doc_id%10==0; flag train docs sharing any 8-gram with the test set."""
    from graphscope_ray.functions.dedup import decontaminate_ngram

    import pyarrow as _pa

    def _split(want_test):
        def _f(t: _pa.Table) -> _pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 10 == 0) if want_test else (ids % 10 != 0)
            return t.filter(_pa.array(mask))

        return _f

    docs = _documents(sf_dir)
    train = docs.map_batches(_split(False), batch_format="pyarrow")
    test = docs.map_batches(_split(True), batch_format="pyarrow")
    return decontaminate_ngram(train, test, n=n)


def _q_text_c4(sf_dir):
    from graphscope_ray.functions.text import c4_clean

    return c4_clean(_documents(sf_dir))


def _q_emb_covariance(sf_dir):
    from graphscope_ray.functions.mlprep import embedding_covariance

    df = embedding_covariance(_embeddings(sf_dir)).to_pandas()
    return df.sort_values(["i", "j"]).reset_index(drop=True)


def _q_emb_pca(sf_dir):
    """Distributed PCA projection (top-4 components) — eigendecomposition is
    not SQL-expressible, so this is a rows-only driver check; the covariance
    all-reduce underneath is exact-SQL-gated as emb_covariance, and
    tests/test_mlprep.py verifies the projection against a one-box numpy
    PCA."""
    from graphscope_ray.functions.mlprep import pca_project

    ds = pca_project(_embeddings(sf_dir), n_components=4)
    df = ds.to_pandas()
    for c in df.columns:
        if c.startswith("pc"):
            df[c] = df[c].round(6)
    return df.sort_values("vec_id").reset_index(drop=True)


def _q_samp_cap(sf_dir):
    from graphscope_ray.functions.sampling import cap_per_stratum

    df = cap_per_stratum(_documents(sf_dir), cap=40, stratum="lang", salt=7).to_pandas()
    return df.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def _q_text_feature_hash(sf_dir):
    from graphscope_ray.functions.mlprep import feature_hash

    df = feature_hash(_documents(sf_dir)).to_pandas()
    return df.sort_values(["doc_id", "bucket"]).reset_index(drop=True)


def _q_text_zipf(sf_dir, k: int = 100):
    """Top-k corpus token frequencies with dense rank (the Zipf head —
    vocabulary-distribution audit): one hash-exchange token count, per-block
    partial top-k, tiny driver merge; ties -> lexicographic token."""
    import numpy as _np
    import pandas as _pd
    import pyarrow as _pa

    from graphscope_ray.functions.joins import posexplode
    from graphscope_ray.utils import hash_groupby_sum

    toks = posexplode(_documents(sf_dir), "doc_id", "text", sep=" ").filter(
        expr="tok != ''"
    )
    counts = hash_groupby_sum(
        toks.select_columns(["tok"]), ["tok"], None, "n", num_partitions=8
    )

    def _partial(df):
        if "tok" not in df.columns or df.empty:
            return _pd.DataFrame({"tok": _pd.Series(dtype=object), "n": _pd.Series(dtype=_np.int64)})
        return df.sort_values(["n", "tok"], ascending=[False, True]).head(k)

    top = (
        counts.map_batches(_partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["n", "tok"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rnk"] = _np.arange(1, len(top) + 1, dtype=_np.int64)
    return top[["rnk", "tok", "n"]]


def _q_text_chunks(sf_dir):
    from graphscope_ray.functions.text import chunk_documents

    return chunk_documents(_documents(sf_dir), size=256, overlap=64)


def _q_text_gopher(sf_dir):
    from graphscope_ray.functions.text import gopher_repetition

    return gopher_repetition(_documents(sf_dir))


def _q_dedup_keep_best(sf_dir):
    from graphscope_ray.functions.dedup import keep_best_dedup

    return keep_best_dedup(_documents(sf_dir))


def _q_corpus_funnel(sf_dir):
    """End-to-end curation FUNNEL audit — the per-stage survivor counts a
    production corpus build reports: raw → exact-dedup (sha keep-min) →
    quality gate (composite score ≥ 0.7, UNROUNDED — engine and SQL share
    the identical float expression so the threshold compare is bit-stable)
    → English only.  One row per stage: (stage, n_docs, n_tokens).  All
    stage flags attach to the token table by hash joins; the rollup is one
    4-row exchange."""
    import numpy as _np
    import pandas as _pd

    from graphscope_ray.functions.dedup import exact_dedup
    from graphscope_ray.functions.text import lang_id, quality_score, token_counts
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    docs = _documents(sf_dir)
    tok = token_counts(docs)
    kept = exact_dedup(docs)
    qs = quality_score(docs)
    lid = lang_id(docs)

    def _rn(mapping):
        def _f(df):
            if not set(mapping) <= set(df.columns):
                return _pd.DataFrame(
                    {v: _pd.Series(dtype=object) for v in mapping.values()}
                )
            return _pd.DataFrame({v: df[c].to_numpy() for c, v in mapping.items()})

        return _f

    j = hash_join(
        tok,
        kept.map_batches(_rn({"doc_id": "kept_id"}), batch_format="pandas"),
        left_on="doc_id",
        right_on="kept_id",
        num_partitions=8,
        how="left",
    )
    j = hash_join(
        j,
        qs.map_batches(
            _rn({"doc_id": "q_id", "quality": "quality"}), batch_format="pandas"
        ),
        left_on="doc_id",
        right_on="q_id",
        num_partitions=8,
    )
    j = hash_join(
        j,
        lid.map_batches(
            _rn({"doc_id": "l_id", "lang_pred": "lang_pred"}), batch_format="pandas"
        ),
        left_on="doc_id",
        right_on="l_id",
        num_partitions=8,
    )

    def _stages(df):
        if "n_tokens" not in df.columns or not len(df):
            return _pd.DataFrame(
                {
                    "stage": _pd.Series(dtype=object),
                    "one": _pd.Series(dtype="int64"),
                    "n_tokens": _pd.Series(dtype="int64"),
                }
            )
        nt = df["n_tokens"].to_numpy(_np.int64)
        dedup_ok = (
            df["kept_id"].notna().to_numpy()
            if "kept_id" in df.columns
            else _np.ones(len(df), bool)
        )
        q_ok = dedup_ok & (df["quality"].to_numpy(_np.float64) >= 0.7)
        en_ok = q_ok & (df["lang_pred"].to_numpy() == "en")
        rows = []
        for stage, mask in (
            ("1_raw", _np.ones(len(df), bool)),
            ("2_dedup", dedup_ok),
            ("3_quality", q_ok),
            ("4_english", en_ok),
        ):
            rows.append((stage, int(mask.sum()), int(nt[mask].sum())))
        return _pd.DataFrame(rows, columns=["stage", "one", "n_tokens"])

    return hash_groupby_sum(
        j.map_batches(_stages, batch_format="pandas"),
        ["stage"],
        ["one", "n_tokens"],
        ["n_docs", "n_tokens"],
        num_partitions=2,
    )


def _q_text_pii(sf_dir):
    from graphscope_ray.functions.text import pii_scan

    return pii_scan(_documents(sf_dir))


def _q_text_redact(sf_dir):
    from graphscope_ray.functions.text import pii_redact

    return pii_redact(_documents(sf_dir))


def _q_text_readability(sf_dir):
    from graphscope_ray.functions.text import readability

    return readability(_documents(sf_dir))


def _q_text_ttr(sf_dir):
    from graphscope_ray.functions.text import type_token_ratio

    return type_token_ratio(_documents(sf_dir))


def _q_text_lang_mix(sf_dir):
    """Language-mixture audit: langid × token counts rolled up per
    predicted language (one tiny lang-keyed exchange)."""
    import pandas as _pd

    from graphscope_ray.functions.text import lang_id, token_counts
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    docs = _documents(sf_dir)
    lid = lang_id(docs)
    tok = token_counts(docs)

    def _tk(df):
        if "n_tokens" not in df.columns:
            return _pd.DataFrame(
                {"tid": _pd.Series(dtype="int64"), "n_tokens": _pd.Series(dtype="int64")}
            )
        return _pd.DataFrame(
            {"tid": df["doc_id"].to_numpy(), "n_tokens": df["n_tokens"].to_numpy()}
        )

    j = hash_join(
        lid, tok.map_batches(_tk, batch_format="pandas"), left_on="doc_id",
        right_on="tid", num_partitions=8,
    )

    def _emit(df):
        if "lang_pred" not in df.columns:
            return _pd.DataFrame(
                {
                    "lang_pred": _pd.Series(dtype=object),
                    "one": _pd.Series(dtype="int64"),
                    "n_tokens": _pd.Series(dtype="int64"),
                }
            )
        import numpy as _np

        return _pd.DataFrame(
            {
                "lang_pred": df["lang_pred"].to_numpy(),
                "one": _np.ones(len(df), dtype=_np.int64),
                "n_tokens": df["n_tokens"].to_numpy(_np.int64),
            }
        )

    return hash_groupby_sum(
        j.map_batches(_emit, batch_format="pandas"),
        ["lang_pred"],
        ["one", "n_tokens"],
        ["n_docs", "n_tokens"],
        num_partitions=4,
    )


def _q_text_bpe_train(sf_dir, num_merges: int = 12):
    """Distributed BPE merge-table training (Sennrich 2016) — iterative and
    data-dependent, so pytest-oracled (tests/test_bpe.py vs a pure-python
    reference) rather than SQL-oracled, like op_kmeans's cousin lg_dfs."""
    import pandas as pd

    from graphscope_ray.functions.bpe import train_bpe

    merges = train_bpe(_documents(sf_dir), num_merges=num_merges)
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [a for a, _ in merges],
            "right": [b for _, b in merges],
        }
    )


def _q_text_bpe_encode(sf_dir, num_merges: int = 12):
    """Apply the trained BPE merge table back to the corpus — the encode
    half of the tokenizer story (train → broadcast merges → per-doc
    segmentation with per-word memoization).  Iterative/data-dependent
    like its trainer, so pytest-oracled (tests/test_bpe.py segmentation
    vs the Sennrich reference loop)."""
    from graphscope_ray.functions.bpe import bpe_segment, train_bpe

    docs = _documents(sf_dir)
    merges = train_bpe(docs, num_merges=num_merges)
    return bpe_segment(docs, merges)


def _q_llm_prep(sf_dir, qmin: float = 0.8):
    """Composed LLM-corpus prep pipeline — the operators chained the way a
    real training-data run chains them: quality gate (C4/Gopher heuristic)
    -> exact content dedup among survivors -> per-doc token counts.  All
    joins are hash exchanges; no driver-side id sets."""
    from graphscope_ray.functions.dedup import exact_dedup
    from graphscope_ray.functions.text import quality_score, token_counts
    from graphscope_ray.utils import hash_join

    docs = _documents(sf_dir)
    q = quality_score(docs)
    kept_ids = q.map_batches(
        lambda t: t.filter(t["quality"].to_numpy(zero_copy_only=False) >= qmin),
        batch_format="pyarrow",
    )
    kept = hash_join(docs, kept_ids, "doc_id", "doc_id", how="inner")
    winners = exact_dedup(kept).select_columns(["doc_id"])
    surv = hash_join(kept, winners, "doc_id", "doc_id", how="inner")
    toks = token_counts(surv.select_columns(["doc_id", "text"]))
    out = hash_join(
        toks, surv.select_columns(["doc_id", "quality"]), "doc_id", "doc_id",
        how="inner",
    ).to_pandas()
    out["quality"] = out["quality"].round(8)
    return (
        out[["doc_id", "n_tokens", "quality"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q_dedup_exact(sf_dir):
    from graphscope_ray.functions.dedup import exact_dedup

    return exact_dedup(_documents(sf_dir)).select_columns(["doc_id", "text_sha256"])


def _q_dedup_minhash(sf_dir):
    from graphscope_ray.functions.dedup import minhash_dedup_clusters

    return minhash_dedup_clusters(_documents(sf_dir))


def _q_dedup_simhash(sf_dir):
    from graphscope_ray.functions.dedup import simhash_candidates, simhash_signatures

    return simhash_candidates(simhash_signatures(_documents(sf_dir)))


def _q_decontaminate(sf_dir):
    """Benchmark decontamination: the 'eval set' is the deterministic slice
    doc_id % 41 == 3 of the documents table itself (no external data); every
    doc is tagged with its count of distinct char-8-grams that appear
    anywhere in the eval slice."""
    from graphscope_ray.functions.dedup import decontaminate

    docs = _documents(sf_dir)
    eval_ds = docs.map_batches(
        lambda t: t.filter(t["doc_id"].to_numpy(zero_copy_only=False) % 41 == 3),
        batch_format="pyarrow",
    )
    return decontaminate(docs, eval_ds, k=8)


def _q_dedup_embedding(sf_dir, n_planted: int = 10):
    """Embedding near-dup with planted exact duplicates (vec_id+10000, same
    vector) — the synthetic embeddings are near-orthogonal, so the planted
    pairs are what makes the 0.99-threshold oracle check non-vacuous."""
    import pandas as pd
    import pyarrow as pa

    from graphscope_ray.functions.dedup import embedding_near_dups

    emb = _embeddings(sf_dir)

    def _plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = ids < n_planted
        extra = t.filter(pa.array(m))
        extra = extra.set_column(
            extra.schema.get_field_index("vec_id"),
            "vec_id",
            pa.array(extra["vec_id"].to_numpy(zero_copy_only=False) + 10000),
        )
        return pa.concat_tables([t, extra])

    planted = emb.map_batches(_plant, batch_format="pyarrow")
    df = embedding_near_dups(planted, threshold=0.99).to_pandas()
    if df.empty:  # Ray loses the schema on empty datasets → re-type
        df = pd.DataFrame(
            {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        )
    return df[["a", "b"]].sort_values(["a", "b"]).reset_index(drop=True)


def _q_dedup_ngram(sf_dir, n_docs: int = 40, threshold: float = 0.2):
    """Standalone n-gram Jaccard: ALL pairs under n_docs verified with the
    distributed pair-verify kernel (pairs dataset ⋈ broadcast candidate
    texts inside map_batches)."""
    import itertools

    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.dedup import jaccard_verify_ds

    ab = list(itertools.combinations(range(n_docs), 2))
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in ab], pa.int64()),
                "b": pa.array([p[1] for p in ab], pa.int64()),
            }
        )
    )
    out = jaccard_verify_ds(pairs, _documents(sf_dir), k=5, threshold=threshold).to_pandas()
    out["jaccard"] = out["jaccard"].round(8)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_nx_pagerank(sf_dir, rounds: int = 15):
    """The networkx-compat entry point (nx_compat.py, SURVEY §3.3) end to
    end: bulk-load the lg edge table into dynamic fragment actors, snapshot
    to the PIE engine, run fixed-round PageRank — must equal the primary
    path's unrolled SQL oracle exactly."""
    import pandas as pd

    import graphscope_ray.nx_compat as gnx
    from graphscope_ray.pipelines import testdata as td

    G = gnx.DiGraph(num_partitions=4)
    G._g.add_edges_dataset(td.lg_edges(sf_dir), src="src", dst="dst")
    scores = gnx.pagerank(G, alpha=0.85, max_iter=rounds, tol=0.0)
    out = pd.DataFrame({"oid": list(scores.keys()), "score": list(scores.values())})
    # numpy/pandas round like lg_pagerank_fixed does — Python round() is
    # decimal-correct rounding and can differ in the last digit, which the
    # raw-hash gate would catch
    out["score"] = out["score"].round(8)
    return out.sort_values("oid").reset_index(drop=True)


def _q_sim_pq(sf_dir):
    """PQ ANN with exact re-rank: ADC scan over 8-byte codes -> top-100
    candidates -> exact cosine re-rank -> top-10 (matches the brute-force
    oracle when the candidate set covers the true top-k, which the pytest
    recall check asserts independently)."""
    from graphscope_ray.functions.similarity import pq_encode, pq_topk_refined, train_pq

    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    books = train_pq(emb, m=8, seed=0)
    codes = pq_encode(emb, books)
    out = pq_topk_refined(
        codes, emb, books, Q, qdf["vec_id"].to_numpy(), k=10, candidates=100
    ).to_pandas()
    out["score"] = out["score"].round(8)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def _q_samp_mixture(sf_dir):
    """Data-mixture construction with up-sampling: epoch replication at
    fractional rates per source (wiki-style 2.5x repeats)."""
    from graphscope_ray.functions.sampling import mixture_replicate

    out = mixture_replicate(
        _documents(sf_dir).select_columns(["doc_id", "source"]),
        stratum="source",
        epochs_by_stratum={"src0": 2.5, "src1": 3.0, "src2": 0.4},
        salt=5,
    ).to_pandas()
    return out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)


def _q_samp_temperature(sf_dir):
    """Temperature-based (τ=2) mixture rebalancing: per-source expected
    copies ∝ n_s^(1/τ)/n_s, realized by deterministic floor + hash-slice
    replication (sampling.temperature_replicate)."""
    from graphscope_ray.functions.sampling import temperature_replicate

    out = temperature_replicate(
        _documents(sf_dir).select_columns(["doc_id", "source"]),
        stratum="source",
        tau=2.0,
        salt=6,
    ).to_pandas()
    return out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)


def _q_text_charlm(sf_dir):
    """In-corpus char-bigram LM perplexity scoring (CCNet-style two-pass:
    distributed count partials -> broadcast model -> vectorized scoring)."""
    from graphscope_ray.functions.text import charlm_xent

    return charlm_xent(_documents(sf_dir))


def _q_dedup_substring(sf_dir, k: int = 40):
    """ExactSubstr-style duplicate length-k char windows (Lee et al. 2021),
    distributed rolling-hash variant: per-doc duplicated-window counts and
    coverage fraction."""
    from graphscope_ray.functions.dedup import substring_dup_stats

    out = substring_dup_stats(_documents(sf_dir), k=k).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dedup_paragraph(sf_dir, words: int = 8):
    """Dolma/CCNet-style paragraph-level exact dedup (word-window mode —
    the synthetic corpus has no newlines): only the globally-first
    occurrence of each distinct 8-word window survives; clean_text is the
    kept windows rejoined."""
    from graphscope_ray.functions.dedup import paragraph_dedup

    out = paragraph_dedup(_documents(sf_dir), words=words).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dedup_lsh_incr(sf_dir, threshold: float = 0.5):
    """Incremental MinHash-LSH dedup against a MATERIALIZED index: the
    frozen corpus (doc_id % 41 != 3) is indexed once (band buckets +
    signatures, partitioned stores); the 'new batch' (% 41 == 3 slice)
    probes it reading only its own touched partitions.  Probe ids with
    doc_id % 82 == 3 take the TEXT of doc_id - 2 (a corpus member) so the
    estimator has planted true positives — same plant as the SQL oracle."""
    import tempfile

    import pyarrow as pa

    from graphscope_ray.functions.dedup import build_lsh_index, lsh_index_probe
    from graphscope_ray.utils import hash_join

    docs = _documents(sf_dir)
    old = docs.map_batches(
        lambda t: t.filter(t["doc_id"].to_numpy(zero_copy_only=False) % 41 != 3),
        batch_format="pyarrow",
    )

    def _donors(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids + 2) % 82 == 3
        return pa.table(
            {"pid": pa.array(ids[m] + 2), "ptext": t["text"].filter(pa.array(m))}
        )

    probe_own = docs.map_batches(
        lambda t: t.filter(t["doc_id"].to_numpy(zero_copy_only=False) % 41 == 3),
        batch_format="pyarrow",
    ).select_columns(["doc_id", "text"])
    joined = hash_join(
        probe_own, docs.map_batches(_donors, batch_format="pyarrow"),
        "doc_id", "pid", how="left",
    )

    def _plant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
            )
        txt = t["text"].to_pylist()
        if "ptext" in t.column_names:
            pt = t["ptext"].to_pylist()
            txt = [p if isinstance(p, str) else x for x, p in zip(txt, pt)]
        return pa.table({"doc_id": t["doc_id"], "text": pa.array(txt, pa.string())})

    new = joined.map_batches(_plant, batch_format="pyarrow")
    path = tempfile.mkdtemp(prefix="graft_lsh_incr_")
    build_lsh_index(old, path)
    out = lsh_index_probe(new, path, threshold=threshold).to_pandas()
    if out.empty or "new_id" not in out.columns:
        import pandas as pd

        out = pd.DataFrame(
            {
                "new_id": pd.Series([], dtype=np.int64),
                "old_id": pd.Series([], dtype=np.int64),
                "est_jaccard": pd.Series([], dtype=np.float64),
            }
        )
    return out.sort_values(["new_id", "old_id"]).reset_index(drop=True)


def _q_sim_range(sf_dir, tau: float = 0.3):
    from graphscope_ray.functions.similarity import range_cosine

    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = range_cosine(emb, Q, qdf["vec_id"].to_numpy(), tau=tau).to_pandas()
    out["score"] = out["score"].round(8)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def _q_sim_topk(sf_dir):
    from graphscope_ray.functions.similarity import topk_cosine

    emb = _embeddings(sf_dir)
    # only the 5 query vectors come to the driver; the table streams
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = topk_cosine(emb, Q, qdf["vec_id"].to_numpy(), k=10).to_pandas()
    out["score"] = out["score"].round(8)
    return out


def _q_sim_topk_filtered(sf_dir):
    """Metadata-filtered vector search — the production ANN pattern
    (predicate + top-k in one pass): brute-force cosine top-k restricted
    to corpus vectors with label = 1.  The filter pushes into the
    streaming scan before any distance work, so the cost scales with the
    filtered subset, not the corpus."""
    from graphscope_ray.functions.similarity import topk_cosine

    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = topk_cosine(
        emb.filter(expr="label == 1"), Q, qdf["vec_id"].to_numpy(), k=10
    ).to_pandas()
    out["score"] = out["score"].round(8)
    return out


def _q_sim_ivf(sf_dir, nprobe=4, n_clusters=16):
    from graphscope_ray.functions.similarity import ivf_topk

    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    return ivf_topk(
        emb, Q, qdf["vec_id"].to_numpy(), k=10, n_clusters=n_clusters, nprobe=nprobe
    )


def _q_sim_ivf_indexed(sf_dir):
    """IVF over a MATERIALIZED centroid-partitioned index (the 100-TB read
    path: search opens only probed bucket files, not the corpus).  Run at
    nprobe == n_clusters so the result is exact top-k — oracle-checked
    against the same brute-force cosine SQL as sim_topk/sim_ivf_exact; the
    pruned-nprobe equivalence vs the scan-based IVF is pytest-gated
    (tests/test_functions.py)."""
    import shutil
    import tempfile

    from graphscope_ray.functions.similarity import build_ivf_index, ivf_topk_indexed

    emb = _embeddings(sf_dir)
    qdf = emb.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    path = tempfile.mkdtemp(prefix="ivfidx_", dir="/tmp")
    try:
        build_ivf_index(emb, path, n_clusters=16, resume=False)
        ds, stats = ivf_topk_indexed(path, Q, qdf["vec_id"].to_numpy(), k=10, nprobe=16)
        out = ds.to_pandas()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    out["score"] = out["score"].round(8)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def _q_sim_ivf_exact(sf_dir):
    """IVF with nprobe == n_clusters: every inverted list is probed, so the
    result is EXACT top-k — oracle-checkable against the brute-force cosine
    SQL (the correctness gate for the IVF machinery itself)."""
    out = _q_sim_ivf(sf_dir, nprobe=16, n_clusters=16).to_pandas()
    out["score"] = out["score"].round(8)
    return out.sort_values(["query_id", "vec_id"]).reset_index(drop=True)


def _q_events_cohort(sf_dir):
    from graphscope_ray.functions.windows import cohort_retention

    ev = _read_clean(f"{sf_dir}/events.parquet")
    df = cohort_retention(ev).to_pandas()
    return df.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)


def _q_events_first_touch(sf_dir):
    from graphscope_ray.functions.windows import first_touch

    ev = _read_clean(f"{sf_dir}/events.parquet")
    df = first_touch(ev).to_pandas()
    return df[["user_id", "first_ts", "first_event_id", "first_type"]].sort_values(
        "user_id"
    ).reset_index(drop=True)


def _q_events_rfm(sf_dir):
    from graphscope_ray.functions.windows import rfm_scores

    return rfm_scores(_read_clean(f"{sf_dir}/events.parquet"))


def _q_events_trending(sf_dir):
    from graphscope_ray.functions.windows import trending

    df = trending(_read_clean(f"{sf_dir}/events.parquet")).to_pandas()
    return df.sort_values(["window_start", "rnk"]).reset_index(drop=True)


def _q_op_corr(sf_dir):
    from graphscope_ray.functions.mlprep import pearson_corr

    li = _read_clean(f"{sf_dir}/lineitem.parquet").select_columns(
        ["l_quantity", "l_discount", "l_tax"]
    )
    return pearson_corr(li, ["l_quantity", "l_discount", "l_tax"])


def _q_op_mad(sf_dir):
    from graphscope_ray.functions.joins import robust_outliers

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(["value"])
    return robust_outliers(ev, "value")


def _q_events_trend(sf_dir):
    from graphscope_ray.functions.windows import group_trend

    return group_trend(_read_clean(f"{sf_dir}/events.parquet"))


def _q_op_histogram(sf_dir, width: float = 50.0):
    """Fixed-width histogram of events.value: bin = floor(value / width),
    count + exact cents sum per bin — one vectorized binning map + one
    hash-exchange aggregate."""
    import numpy as _np
    import pyarrow as _pa

    from graphscope_ray.utils import hash_groupby_sum

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(["value"])

    def _bin(t: _pa.Table) -> _pa.Table:
        if t.num_rows == 0:
            return _pa.table(
                {"bin": _pa.array([], _pa.int64()), "one": _pa.array([], _pa.int64()),
                 "cents": _pa.array([], _pa.int64())}
            )
        v = t["value"].to_numpy(zero_copy_only=False).astype(_np.float64)
        return _pa.table(
            {
                "bin": _pa.array(_np.floor(v / width).astype(_np.int64)),
                "one": _pa.array(_np.ones(t.num_rows, dtype=_np.int64)),
                "cents": _pa.array(_np.floor(100.0 * v + 0.5).astype(_np.int64)),
            }
        )

    out = hash_groupby_sum(
        ev.map_batches(_bin, batch_format="pyarrow"),
        ["bin"],
        ["one", "cents"],
        ["n", "sum_cents"],
        num_partitions=4,
    ).to_pandas()
    return out.sort_values("bin").reset_index(drop=True)


def _q_events_gaps(sf_dir):
    from graphscope_ray.functions.windows import interarrival_stats

    df = interarrival_stats(_read_clean(f"{sf_dir}/events.parquet")).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


def _q_events_session_stats(sf_dir, gap_s: int = 1800):
    """Corpus-level session summary over sessionize: sessions, single-event
    bounces, total events and the largest session — integer-exact
    aggregates, so the oracle nests the sessionize SQL directly."""
    import numpy as _np
    import pandas as _pd

    from graphscope_ray.functions.windows import sessionize

    ev = _read_clean(f"{sf_dir}/events.parquet")
    sess = sessionize(ev, gap_s=gap_s)

    def _p(df: _pd.DataFrame) -> _pd.DataFrame:
        if df.empty or "n_events" not in df.columns:
            return _pd.DataFrame(
                {c: _pd.Series(dtype=_np.int64)
                 for c in ("n_sessions", "n_bounce", "total_events", "max_events")}
            )
        ne = df["n_events"].to_numpy(_np.int64)
        return _pd.DataFrame(
            {
                "n_sessions": [_np.int64(len(ne))],
                "n_bounce": [_np.int64((ne == 1).sum())],
                "total_events": [_np.int64(ne.sum())],
                "max_events": [_np.int64(ne.max())],
            }
        )

    parts = sess.map_batches(_p, batch_format="pandas").to_pandas()
    if parts.empty or "n_sessions" not in parts.columns:
        # Empty events table: every block hit the guard (or Ray dropped the
        # schema entirely) — return the zero-session summary row instead of
        # letting max() produce NaN.
        return _pd.DataFrame(
            {c: [_np.int64(0)]
             for c in ("n_sessions", "n_bounce", "total_events", "max_events")}
        )
    return _pd.DataFrame(
        {
            "n_sessions": [_np.int64(parts["n_sessions"].sum())],
            "n_bounce": [_np.int64(parts["n_bounce"].sum())],
            "total_events": [_np.int64(parts["total_events"].sum())],
            "max_events": [_np.int64(parts["max_events"].max())],
        }
    )


def _q_events_window(sf_dir):
    import ray.data

    from graphscope_ray.functions.windows import tumbling_window

    ev = _read_clean(f"{sf_dir}/events.parquet")
    df = tumbling_window(ev, window_s=3600).to_pandas()
    df["sum_value"] = df["sum_value"].round(8)
    return df[["event_type", "window_start", "n_events", "sum_value"]]


def _q_events_hopping(sf_dir):
    import ray.data

    from graphscope_ray.functions.windows import hopping_window

    ev = _read_clean(f"{sf_dir}/events.parquet")
    df = hopping_window(ev, window_s=3600, hop_s=900).to_pandas()
    df["sum_value"] = df["sum_value"].round(8)
    return df[["event_type", "window_start", "n_events", "sum_value"]]


def _q_sessionize(sf_dir):
    import ray.data

    from graphscope_ray.functions.windows import sessionize

    ev = _read_clean(f"{sf_dir}/events.parquet")
    df = sessionize(ev, gap_s=1800).to_pandas()
    df["t_start"] = df["t_start"].round(6)
    df["t_end"] = df["t_end"].round(6)
    df["sum_value"] = df["sum_value"].round(8)
    return df


def _q_multimodal(sf_dir):
    """Multimodal pipeline: deterministic REAL PNG images derived from each
    document's text bytes → actor-pool probe + pure-Python PNG decode +
    mean-pool featurization (graphscope_ray/functions/imaging.py)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from graphscope_ray.functions.imaging import encode_png
    from graphscope_ray.functions.multimodal import extract_media_features

    def _to_media(t: pa.Table) -> pa.Table:
        imgs = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            b = np.frombuffer(s.encode()[:192].ljust(192, b"\0"), dtype=np.uint8)
            imgs.append(encode_png(b.reshape(8, 8, 3)))
        return pa.table(
            {"media_id": t["doc_id"], "media": pa.array(imgs, pa.binary())}
        )

    docs = _documents(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _to_media, batch_format="pyarrow"
    )
    feats = extract_media_features(docs, strict=True)  # every payload decodes
    return feats.select_columns(
        ["media_id", "n_bytes", "media_sha256", "format", "width", "height"]
    )


def _q_jpeg_features(sf_dir):
    """JPEG pipeline: deterministic REAL baseline JPEGs derived from each
    document's text bytes → actor-pool baseline-DCT decode + mean-pool
    featurization (graphscope_ray/functions/jpeg.py); strict — every
    payload must really decode, no stub fallback."""
    import numpy as np
    import pyarrow as pa

    from graphscope_ray.functions.jpeg import encode_jpeg
    from graphscope_ray.functions.multimodal import extract_media_features

    def _to_media(t: pa.Table) -> pa.Table:
        imgs = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            b = np.frombuffer(s.encode()[:768].ljust(768, b"\0"), dtype=np.uint8)
            imgs.append(
                encode_jpeg(
                    b.reshape(16, 16, 3),
                    quality=90,
                    subsampling="4:2:0" if did % 2 else "4:4:4",
                )
            )
        return pa.table({"media_id": t["doc_id"], "media": pa.array(imgs, pa.binary())})

    docs = _documents(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _to_media, batch_format="pyarrow"
    )
    feats = extract_media_features(docs, strict=True)
    return feats.select_columns(
        ["media_id", "n_bytes", "media_sha256", "format", "width", "height"]
    )


def _q_video_features(sf_dir):
    """Video pipeline: deterministic REAL animated GIFs derived from each
    document's text bytes → actor-pool LZW frame-sampled decode (stride 2)
    + temporal pooling (graphscope_ray/functions/video.py)."""
    import numpy as np
    import pyarrow as pa

    from graphscope_ray.functions.multimodal import extract_media_features
    from graphscope_ray.functions.video import encode_gif

    lv = np.array([0, 51, 102, 153, 204, 255], dtype=np.uint8)

    def _to_media(t: pa.Table) -> pa.Table:
        vids = []
        for s in t["text"].to_pylist():
            b = np.frombuffer(s.encode()[:768].ljust(768, b"\0"), dtype=np.uint8)
            vids.append(encode_gif(lv[(b % 6).reshape(4, 8, 8, 3)]))  # 4 frames 8x8
        return pa.table({"media_id": t["doc_id"], "media": pa.array(vids, pa.binary())})

    docs = _documents(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _to_media, batch_format="pyarrow"
    )
    feats = extract_media_features(docs, strict=True, frame_stride=2)
    return feats.select_columns(
        ["media_id", "n_bytes", "media_sha256", "format", "width", "height", "n_frames"]
    )


def _q_samp_sample(sf_dir):
    from graphscope_ray.functions.sampling import hash_sample

    return hash_sample(
        _documents(sf_dir).select_columns(["doc_id", "lang"]), "doc_id", permille=100, salt=1
    )


def _q_samp_split(sf_dir):
    from graphscope_ray.functions.sampling import hash_split

    ds = hash_split(
        _documents(sf_dir).select_columns(["doc_id"]), "doc_id", weights=(900, 50, 50), salt=2
    )
    return ds.select_columns(["doc_id", "split"])


def _q_samp_priority(sf_dir):
    """Weighted sampling without replacement (priority sampling): k docs
    weighted by char length, integer rank = hash_u64(doc_id) // weight."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from graphscope_ray.functions.sampling import priority_sample

    def _wt(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_chars": n})

    docs = _documents(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _wt, batch_format="pyarrow"
    )
    return priority_sample(docs, key="doc_id", weight_col="n_chars", k=50, salt=11)


def _q_samp_dsir(sf_dir):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    features, target = lang='en' docs, raw = whole corpus; top-200 docs by
    exact-int quantized importance weight (functions/dsir.py)."""
    from graphscope_ray.functions.dsir import dsir_select

    docs = _documents(sf_dir).select_columns(["doc_id", "text", "lang"])
    return dsir_select(docs, target_col="lang", target_val="en", k=200)


def _q_samp_shuffle(sf_dir):
    """Deterministic global training-data shuffle: dense position in
    hash_u64(doc_id, salt) order (functions/sampling.global_shuffle)."""
    from graphscope_ray.functions.sampling import global_shuffle

    return global_shuffle(_documents(sf_dir).select_columns(["doc_id"]), salt=3)


def _q_op_qsketch(sf_dir):
    """Deterministic MRL-style mergeable quantile summary over lineitem
    l_extendedprice (functions/sketch.quantile_sketch) — the rank-statistic
    member of the sketch family (HLL / CMS / Bloom)."""
    from graphscope_ray.functions.sketch import quantile_sketch
    from graphscope_ray.pipelines.testdata import read

    li = read(
        sf_dir, "lineitem", columns=["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    return quantile_sketch(li, "l_extendedprice", ("l_orderkey", "l_linenumber"))


def _q_text_norm(sf_dir):
    from graphscope_ray.functions.text import normalize_text

    return normalize_text(_documents(sf_dir))


def _q_op_hll_by(sf_dir):
    """Per-group HLL distinct estimate: distinct l_partkey per l_returnflag
    (p=10; the estimate itself is oracle-gated, like op_hll_count)."""
    from graphscope_ray.functions.sketch import hll_count_by
    from graphscope_ray.pipelines.testdata import read

    li = read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])
    return hll_count_by(li, "l_returnflag", "l_partkey", p=10)


def _q_lg_khop(sf_dir):
    """Deterministic GNN-minibatch k-hop fanout sampling over the link
    graph: 11 seed ids (0, 97, …, 970), fanouts [4, 3], edge-hash ranks —
    bit-exactly reproduced by row_number-over-hash SQL."""
    import numpy as np

    from graphscope_ray.graph.minibatch import khop_sample
    from graphscope_ray.pipelines.testdata import LG_MOD, lg_edges

    out = khop_sample(
        lg_edges(sf_dir),
        seeds=np.arange(0, LG_MOD, 97),
        fanouts=[4, 3],
        salt=5,
        pair_mod=LG_MOD,
    )
    return (
        out.to_pandas()
        .sort_values(["layer", "src", "dst"])
        .reset_index(drop=True)
    )


def _q_text_ppmi(sf_dir):
    """Skip-gram co-occurrence + PPMI (word2vec/GloVe corpus statistic):
    window 2, pairs ≥ 5 occurrences."""
    from graphscope_ray.functions.mlprep import cooccurrence_ppmi

    out = cooccurrence_ppmi(_documents(sf_dir), window=2, min_count=5).to_pandas()
    return out.sort_values(["w", "c"]).reset_index(drop=True)


def _q_lg_negative_sample(sf_dir, k: int = 3, salt: int = 7):
    """Deterministic negative-edge sampling over the link graph (k non-edges
    per vertex, hash-uniform candidates, distributed anti-join against the
    true edges)."""
    import pyarrow as pa

    from graphscope_ray.graph.minibatch import negative_sample
    from graphscope_ray.pipelines.testdata import LG_MOD, lg_edges
    from graphscope_ray.utils import hash_groupby_sum

    e = lg_edges(sf_dir)

    def _ends(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"oid": pa.array([], pa.int64())})
        return pa.table(
            {"oid": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])}
        )

    verts = hash_groupby_sum(
        e.map_batches(_ends, batch_format="pyarrow"), ["oid"], None, "__n", num_partitions=8
    ).select_columns(["oid"])
    out = negative_sample(e, verts, n_universe=LG_MOD, k=k, salt=salt).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def _q_dedup_semantic(sf_dir, n_planted: int = 10):
    """SemDeDup (cluster-then-prune semantic dedup) with planted exact
    duplicates (vec_id+10000, same vector — cosine exactly 1 inside the
    same cluster); the synthetic embeddings are near-orthogonal, so the
    planted copies are the rows the 0.95 threshold must flag."""
    import pyarrow as pa

    from graphscope_ray.functions.dedup import semdedup

    emb = _embeddings(sf_dir)

    def _plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        extra = t.filter(pa.array(ids < n_planted))
        extra = extra.set_column(
            extra.schema.get_field_index("vec_id"),
            "vec_id",
            pa.array(extra["vec_id"].to_numpy(zero_copy_only=False) + 10000),
        )
        return pa.concat_tables([t, extra])

    planted = emb.map_batches(_plant, batch_format="pyarrow")
    out = semdedup(planted, k=8, iters=3, threshold=0.95).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _gremlin_pg(sf_dir):
    from graphscope_ray.pipelines.testdata import _tripartite_pgraph

    return _tripartite_pgraph(sf_dir)


def _q_pg_gremlin_count(sf_dir):
    """GREMLIN_TO_SUBGRAPH data plane (ref dag_utils.py:1048-1084): a
    2-hop filtered traversal's terminal count — bag semantics, so the
    number equals the SQL join multiplicity exactly."""
    import pandas as pd

    from graphscope_ray.graph.gremlin import P, traversal

    g = traversal(_gremlin_pg(sf_dir))
    n = (
        g.V()
        .hasLabel("customer")
        .has("c_acctbal", P.gt(5000))
        .out("places")
        .out("contains")
        .count()
    )
    return pd.DataFrame({"n": [n]})


def _q_pg_gremlin_groupcount(sf_dir):
    """Same traversal projected to part sizes and groupCount()ed — the
    values() bag is the join result, so (value, count) is an exact GROUP BY."""
    from graphscope_ray.graph.gremlin import P, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V()
        .hasLabel("customer")
        .has("c_acctbal", P.gt(5000))
        .out("places")
        .out("contains")
        .values("p_size")
        .groupCount()
    )


def _q_pg_gremlin_subgraph(sf_dir):
    """The string surface: run_gremlin() evaluates the same script shape
    gremlin_to_subgraph() accepts and MATERIALIZES the traversed edges as
    a new PropertyGraph; the query returns the subgraph's own edge table
    (round-trip through the materialized graph, not the traversal)."""
    from graphscope_ray.graph.gremlin import run_gremlin

    sub = run_gremlin(
        _gremlin_pg(sf_dir),
        "g.V().hasLabel('customer').has('c_nationkey', P.within(0, 1, 2))"
        ".outE('places').subgraph('s')",
    )
    df = sub.edge_table("places").to_pandas()
    return df.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)


def _q_pg_gremlin_repeat(sf_dir):
    """``repeat(__.out()).times(2)`` — bounded iteration compiled to a
    2-fold hop composition (customer→order→part on the tripartite graph);
    groupCount gives the exact 3-table join multiplicities."""
    from graphscope_ray.graph.gremlin import P, __, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("customer").has("oid", P.lte(200))
        .repeat(__.out()).times(2).groupCount()
    )


def _q_pg_gremlin_emit(sf_dir):
    """``repeat(__.out()).emit().times(2)`` — emit unions the frontier
    after every round, so the result is orders ∪ parts reachable from the
    filtered customers (SQL UNION ALL of the 2- and 3-table joins)."""
    from graphscope_ray.graph.gremlin import P, __, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("customer").has("oid", P.lte(200))
        .repeat(__.out()).emit().times(2).groupCount()
    )


def _q_pg_gremlin_union(sf_dir):
    """``union(__.in_('places'), __.out('contains'))`` from high-value
    orders — both branches applied to the same frontier, bags add
    (customers placing the orders ∪ parts contained in them)."""
    from graphscope_ray.graph.gremlin import P, __, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("order").has("o_totalprice", P.gt(100000))
        .union(__.in_("places"), __.out("contains")).groupCount()
    )


def _q_pg_gremlin_order_range(sf_dir):
    """``order().by('p_retailprice', desc).range(5, 25)`` — distributed
    sort with deterministic (key, label, oid) tie-break then an
    order-preserving slice; the surviving parts' sizes groupCount()ed
    (= SQL row_number() window)."""
    from graphscope_ray.graph.gremlin import Order, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("part").order().by("p_retailprice", Order.desc)
        .range(5, 25).values("p_size").groupCount()
    )


def _q_pg_gremlin_where(sf_dir):
    """``where(__.out('places').has(...))`` — existential semi-join (SQL
    EXISTS): customers with at least one order over 200k, evaluated once
    per distinct element via carried origin tags."""
    from graphscope_ray.graph.gremlin import P, __, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("customer")
        .where(__.out("places").has("o_totalprice", P.gt(200000)))
        .to_pandas()
    )


def _q_pg_mutations(sf_dir):
    """First-class property-graph mutation rebuild (ref
    grape_instance.cc:91-177, dag_utils.py:114-231): EXTEND the customer
    label with supplier-derived delta rows (concat), ADD delta places
    edges from lineitem wiring new customers to existing orders, then
    REMOVE every negative-balance customer with cascade — surviving places
    edges must reference surviving customers only.  Output: the mutated
    graph's places edge table (bag, duplicates preserved)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from graphscope_ray.pipelines.testdata import _tripartite_pgraph, read

    pg = _tripartite_pgraph(sf_dir)

    delta_v = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey", "s_acctbal"])

    def _shift(t: _pa.Table) -> _pa.Table:
        return _pa.table(
            {
                "oid": _pc.add(t["s_suppkey"], 100000),
                "c_nationkey": t["s_nationkey"],
                "c_acctbal": t["s_acctbal"],
            }
        )

    delta_v = delta_v.map_batches(_shift, batch_format="pyarrow")
    pg = pg.add_vertices(delta_v, "customer", properties=["c_nationkey", "c_acctbal"],
                         vid_field="oid")

    delta_e = read(sf_dir, "lineitem", columns=["l_suppkey", "l_orderkey"])

    def _wire(t: _pa.Table) -> _pa.Table:
        return _pa.table(
            {
                "src_oid": _pc.add(t["l_suppkey"], 100000),
                "dst_oid": t["l_orderkey"],
            }
        )

    delta_e = delta_e.map_batches(_wire, batch_format="pyarrow")
    pg = pg.add_edges(delta_e, "places", src_label="customer", dst_label="order",
                      src_field="src_oid", dst_field="dst_oid")

    pg = pg.remove_vertices(
        "customer", where=lambda t: _pc.less(t["c_acctbal"], 0.0), cascade=True
    )
    df = pg.edge_table("places").to_pandas()[["src_oid", "dst_oid"]]
    return df.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)


def _q_pg_gremlin_path(sf_dir):
    """withPath() linear path tracking: per-traverser position history of
    the 2-hop traversal — rows (v_label, p0, p1, p2) are exactly the
    3-table join tuples (the ``__p*`` carry columns through the hop
    joins)."""
    from graphscope_ray.graph.gremlin import P, traversal

    g = traversal(_gremlin_pg(sf_dir)).withPath()
    return (
        g.V().hasLabel("customer").has("c_acctbal", P.gt(9000))
        .out("places").out("contains").path()
    )


def _q_pg_gremlin_select(sf_dir):
    """as_/select labeled-step projection (the GIE select step's data
    plane): saved positions ride as carry columns through the hops; the
    (c, o) projection keeps the lineitem hop's multiplicity — exactly the
    3-table join pairs."""
    from graphscope_ray.graph.gremlin import P, traversal

    g = traversal(_gremlin_pg(sf_dir))
    return (
        g.V().hasLabel("customer").has("c_acctbal", P.gt(9000)).as_("c")
        .out("places").as_("o").out("contains").select("c", "o")
    )


def _q_pg_gremlin_coin(sf_dir, p: float = 0.25, salt: int = 3):
    """Deterministic coin(p): content-stable Bernoulli per element (the
    Knuth-hash threshold), then a 1-hop groupCount — the SQL twin filters
    with the identical HUGEINT hash expression."""
    from graphscope_ray.graph.gremlin import traversal

    g = traversal(_gremlin_pg(sf_dir))
    return g.V().hasLabel("customer").coin(p, salt=salt).out("places").groupCount()


def _q_pg_gremlin_agg(sf_dir):
    """Gremlin scalar terminals sum()/mean()/max()/min() over a values()
    bag — the 2-hop traversal's o_totalprice multiset, distributed
    per-block partials folded to four driver scalars."""
    import pandas as _pd

    from graphscope_ray.graph.gremlin import P, traversal

    g = traversal(_gremlin_pg(sf_dir))
    t = g.V().hasLabel("customer").has("c_acctbal", P.gt(5000)).out("places")
    vals = t.values("o_totalprice")
    return _pd.DataFrame(
        {
            "sum_price": [round(vals.sum_(), 2)],
            "mean_price": [round(vals.mean_(), 6)],
            "max_price": [vals.max_()],
            "min_price": [vals.min_()],
        }
    )


def _q_pg_update_column(sf_dir):
    """PropertyGraph.update_column (MODIFY property writeback): overwrite
    c_acctbal with a computed per-customer order total for customers that
    HAVE orders, keep the old balance elsewhere — SQL COALESCE over a LEFT
    join."""
    import pyarrow as _pa

    from graphscope_ray.pipelines.testdata import _tripartite_pgraph, read
    from graphscope_ray.utils import hash_groupby_sum

    pg = _tripartite_pgraph(sf_dir)
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _cents(t: _pa.Table) -> _pa.Table:
        import numpy as _np

        return _pa.table(
            {
                "oid": t["o_custkey"],
                "cents": _pa.array(
                    _np.round(
                        t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
                    ).astype(_np.int64)
                ),
            }
        )

    totals = hash_groupby_sum(
        orders.map_batches(_cents, batch_format="pyarrow"), ["oid"], "cents", "tot"
    )

    def _dollars(t: _pa.Table) -> _pa.Table:
        import numpy as _np

        return _pa.table(
            {
                "oid": t["oid"],
                "c_acctbal": _pa.array(
                    t["tot"].to_numpy(zero_copy_only=False) / 100.0
                ),
            }
        )

    upd = totals.map_batches(_dollars, batch_format="pyarrow")
    pg2 = pg.update_column("customer", upd, key="oid", column="c_acctbal")
    df = pg2.vertex_table("customer").to_pandas()[["oid", "c_nationkey", "c_acctbal"]]
    df["c_acctbal"] = df["c_acctbal"].round(2)
    return df.sort_values("oid").reset_index(drop=True)


def _q_train_epoch_order(sf_dir, B: int = 64, seed: int = 11, epoch: int = 2):
    """The training hand-off's determinism contract as data: EpochIterator's
    batch stream over documents (seed=11, epoch=2) flattened to (doc_id,
    batch, pos) — the oracle replays the same Knuth-hash shuffle order with
    a row_number window, so the ENTIRE epoch permutation is verified
    bit-for-bit."""
    import numpy as _np
    import pandas as _pd

    from graphscope_ray.functions.epoch import EpochIterator

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(["doc_id"])
    it = EpochIterator(ds, key="doc_id", batch_size=B, seed=seed)
    frames = []
    for bi, batch in enumerate(it.epoch(epoch)):
        ids = _np.asarray(batch["doc_id"], dtype=_np.int64)
        frames.append(
            _pd.DataFrame(
                {
                    "doc_id": ids,
                    "batch": _np.full(len(ids), bi, dtype=_np.int64),
                    "pos": _np.arange(len(ids), dtype=_np.int64),
                }
            )
        )
    out = _pd.concat(frames, ignore_index=True)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_samp_stratified(sf_dir):
    from graphscope_ray.functions.sampling import stratified_hash_sample

    return stratified_hash_sample(
        _documents(sf_dir).select_columns(["doc_id", "lang"]),
        "doc_id",
        stratum="lang",
        permille_by_stratum={"en": 50},
        default_permille=500,
        salt=3,
    )


def _q_repos_flagship(sf_dir):
    """North-star pipeline on the synthetic source-file corpus (deterministic,
    independent of sf_dir scale): mine imports → link graph → 4 apps."""
    import ray.data

    from graphscope_ray.pipelines.linkgraph import flagship
    from graphscope_ray.sources import generate_repos

    repos = ray.data.from_arrow(generate_repos(n_repos=60, seed=42))
    return flagship(repos, num_partitions=4)


def queries() -> dict[str, Callable[[str], Any]]:
    _quiet()
    from graphscope_ray.pipelines import testdata as td

    return {
        # link-graph derivation + framework ops
        "lg_edges": lambda sf: td.lg_edges(sf),
        "lg_vertices": td.lg_vertices,
        "lg_graphar_roundtrip": td.lg_graphar_roundtrip,
        "lg_graphar_dest": lambda sf: td.lg_graphar_roundtrip(sf, order="dst"),
        "dyn_mutations": td.dyn_mutations,
        "dyn_view_undirected": td.dyn_view_undirected,
        "lg_edges_weighted": td.lg_edges_weighted,
        "lg_degree": td.lg_degree,
        "lg_undirected_edge_count": td.lg_undirected_edge_count,
        "lg_induced_subgraph": td.lg_induced_subgraph,
        # analytical apps (oracle: unrolled/recursive SQL)
        "lg_pagerank": td.lg_pagerank_fixed,
        "lg_pagerank_locality": td.lg_pagerank_locality,
        "lg_pagerank_push": td.lg_pagerank_push,
        "lg_pagerank_weighted": td.lg_pagerank_weighted,
        "lg_pagerank_weighted_hub": td.lg_pagerank_weighted_hub,
        "lg_pagerank_converged": td.lg_pagerank_converged,
        "lg_pagerank_p2p": td.lg_pagerank_p2p,
        "lg_wcc": td.lg_wcc,
        "lg_wcc_locality": td.lg_wcc_locality,
        "lg_wcc_phash": td.lg_wcc_phash,
        "lg_wcc_compact": td.lg_wcc_compact,
        "lg_cdlp": td.lg_cdlp,
        "lg_triangles": td.lg_triangles,
        "lg_triangle_total": td.lg_triangle_total,
        "lg_lcc": td.lg_lcc,
        "lg_bfs": td.lg_bfs,
        "lg_sssp": td.lg_sssp,
        "lg_hits": td.lg_hits_fixed,
        "lg_eigenvector": td.lg_eigenvector_fixed,
        "lg_katz": td.lg_katz_fixed,
        "lg_ppr": td.lg_ppr,
        "lg_ppr_seeds": td.lg_ppr_seeds,
        "lg_articlerank": td.lg_articlerank,
        "lg_motifs": td.lg_motifs,
        "lg_directed_census": td.lg_directed_census,
        "lg_degeneracy": td.lg_degeneracy,
        "lg_onion": td.lg_onion,
        "lg_min_cover": td.lg_min_cover,
        "lg_dominating": td.lg_dominating,
        "lg_edge_cover": td.lg_edge_cover,
        "lg_msf": td.lg_msf,
        "lg_kclique": td.lg_kclique,
        "lg_fluid": td.lg_fluid,
        "lg_bfs_forest": td.lg_bfs_forest,
        "lg_bridges": td.lg_bridges,
        "lg_cut_points": td.lg_cut_points,
        "lg_bcc": td.lg_bcc,
        "lg_2ecc": td.lg_2ecc,
        "lg_kcore": td.lg_kcore,
        "lg_kcore_size": td.lg_kcore_size,
        "lg_degree_centrality": td.lg_degree_centrality,
        "lg_assortativity": td.lg_assortativity,
        "lg_avg_degree_connectivity": td.lg_avg_degree_connectivity,
        "lg_node_boundary": td.lg_node_boundary,
        "lg_edge_boundary": td.lg_edge_boundary,
        "lg_transitivity": td.lg_transitivity,
        "lg_avg_clustering": td.lg_avg_clustering,
        "lg_voterank": td.lg_voterank,
        "lg_closeness_sampled": td.lg_closeness,
        "lg_betweenness_sampled": td.lg_betweenness,
        "lg_edge_betweenness": td.lg_edge_betweenness,
        "lg_kshell": td.lg_kshell,
        "lg_louvain": td.lg_louvain,
        "lg_louvain_level1": td.lg_louvain_level1,
        "lg_closeness_harmonic": td.lg_closeness_harmonic,
        "lg_apsp": td.lg_apsp,
        "lg_dfs": td.lg_dfs,
        "lg_has_path": td.lg_has_path,
        "lg_avg_path_length": td.lg_avg_path_length,
        "lg_avg_path_length_weighted": td.lg_avg_path_length_weighted,
        "lg_sssp_path": td.lg_sssp_path,
        "lg_attr_assortativity": td.lg_attr_assortativity,
        "lg_lcc_directed": td.lg_lcc_directed,
        # relational / framework-op parity
        "op_filter_project": td.op_filter_project,
        "op_groupby_agg": td.op_groupby_agg,
        "op_sort_topk": td.op_sort_topk,
        "op_join_addcolumn": td.op_join_addcolumn,
        "op_distinct": td.op_distinct,
        "op_union_distinct": td.op_union_distinct,
        "op_intersect": td.op_intersect,
        "op_except": td.op_except,
        "op_unpivot": td.op_unpivot,
        "text_winnow": td.text_winnow,
        "op_consolidate": td.op_consolidate_columns,
        "op_csv_scan": td.op_csv_scan,
        "op_jsonl_scan": td.op_jsonl_scan,
        "op_orc_scan": td.op_orc_scan,
        "op_topk_per_group": td.op_topk_per_group,
        "op_groupby_median": td.op_groupby_median,
        "op_asof_join": td.op_asof_join,
        "op_asof_forward": td.op_asof_forward,
        "op_zscore": td.op_zscore,
        "op_count_distinct": td.op_count_distinct,
        "op_hll_count": td.op_hll_count,
        "op_cms_heavy": td.op_cms_heavy,
        "op_bloom": td.op_bloom,
        "op_profile": td.op_profile,
        "op_kmeans": td.op_kmeans,
        "text_tfidf": td.text_tfidf,
        "text_bigrams": td.text_bigrams,
        "text_ppmi": _q_text_ppmi,
        "op_range_join": td.op_range_join,
        "op_semi_join": td.op_semi_join,
        "op_anti_join": td.op_anti_join,
        "op_window_funcs": td.op_window_funcs,
        "op_quantiles": td.op_quantiles,
        "op_pivot": td.op_pivot,
        "op_explode": td.op_explode,
        "lpa_u2i": td.lpa_u2i_suppliers,
        "lg_succs": td.lg_succs,
        "lg_preds": td.lg_preds,
        "lg_simple_paths": td.lg_simple_paths,
        "lg_is_simple_path": td.lg_is_simple_path,
        "lg_path_enum": td.lg_path_enum,
        "lg_khop_sample": _q_lg_khop,
        "lg_negative_sample": _q_lg_negative_sample,
        "lg_link_features": td.lg_link_features,
        "pg_metapath_sample": td.pg_metapath_sample,
        "lg_deepwalk_ppmi": td.lg_deepwalk_ppmi,
        "lg_modularity": td.lg_modularity,
        "lg_wl_colors": td.lg_wl_colors,
        "lg_node2vec": td.lg_node2vec,
        "lg_community_stats": td.lg_community_stats,
        "lg_contract": td.lg_contract,
        "lg_sage_sum": td.lg_sage_sum,
        "pg_wcc": td.pg_wcc,
        "pg_sssp": td.pg_sssp,
        "pg_pagerank": td.pg_pagerank,
        "pg_project_wcc": td.pg_project_wcc,
        "pg_addcol_consolidate": td.pg_addcol_consolidate,
        "pg_gremlin_count": _q_pg_gremlin_count,
        "pg_gremlin_groupcount": _q_pg_gremlin_groupcount,
        "pg_gremlin_subgraph": _q_pg_gremlin_subgraph,
        "pg_gremlin_repeat": _q_pg_gremlin_repeat,
        "pg_gremlin_emit": _q_pg_gremlin_emit,
        "pg_gremlin_union": _q_pg_gremlin_union,
        "pg_gremlin_order_range": _q_pg_gremlin_order_range,
        "pg_gremlin_where": _q_pg_gremlin_where,
        "pg_gremlin_agg": _q_pg_gremlin_agg,
        "pg_gremlin_path": _q_pg_gremlin_path,
        "pg_gremlin_select": _q_pg_gremlin_select,
        "pg_gremlin_coin": _q_pg_gremlin_coin,
        "pg_update_column": _q_pg_update_column,
        "train_epoch_order": _q_train_epoch_order,
        "pg_mutations": _q_pg_mutations,
        "pg_graphar_roundtrip": td.pg_graphar_roundtrip,
        "lg_sssp_weighted": td.lg_sssp_weighted,
        "lg_sssp_delta": td.lg_sssp_delta,
        "lg_ktruss": td.lg_ktruss,
        "lg_trussness": td.lg_trussness,
        "lg_embeddedness": td.lg_embeddedness,
        "lg_edge_jaccard": td.lg_edge_jaccard,
        "lg_khop_sizes": td.lg_khop_sizes,
        "lg_cocitation": td.lg_cocitation,
        "lg_bibcoupling": td.lg_bibcoupling,
        "lg_adamic_topk": td.lg_adamic_topk,
        "lg_sweep_cut": td.lg_sweep_cut,
        "lg_random_walks": td.lg_random_walks,
        "lg_eccentricity": td.lg_eccentricity,
        # FLASH-suite (connectivity / matching / subgraph / measurement)
        "lg_scc": td.lg_scc,
        "lg_condensation": td.lg_condensation,
        "lg_mis": td.lg_mis,
        "lg_matching": td.lg_matching,
        "lg_coloring": td.lg_coloring,
        "lg_rectangles": td.lg_rectangles,
        "lg_densest": td.lg_densest,
        "lg_ecc_all": td.lg_ecc_all,
        "lg_diameter": td.lg_diameter,
        "lg_eff_diameter": td.lg_eff_diameter,
        "lg_global_efficiency": td.lg_global_efficiency,
        "lg_richclub": td.lg_richclub,
        "lg_simrank": td.lg_simrank,
        "lg_bipartite_proj": td.lg_bipartite_proj,
        "lg_salsa": td.lg_salsa,
        "lg_backbone": td.lg_backbone,
        "lg_degree_hist": td.lg_degree_hist,
        "lg_degree_gini": td.lg_degree_gini,
        "lg_assortativity_directed": td.lg_assortativity_directed,
        "lg_seeded_lpa": td.lg_seeded_lpa,
        "lg_two_hop": td.lg_two_hop,
        "lg_weighted_clustering": td.lg_weighted_clustering,
        "lg_onnela_clustering": td.lg_onnela_clustering,
        "lg_reciprocity": td.lg_reciprocity,
        "lg_avg_nbr_deg": td.lg_avg_nbr_deg,
        "lg_smetric": td.lg_smetric,
        "lg_kcenter": td.lg_kcenter,
        "lg_closeness_exact": td.lg_closeness_exact,
        # events (stream-shaped)
        "events_window": _q_events_window,
        "events_cohort": _q_events_cohort,
        "events_first_touch": _q_events_first_touch,
        "events_rfm": _q_events_rfm,
        "events_trending": _q_events_trending,
        "events_trend": _q_events_trend,
        "events_gaps": _q_events_gaps,
        "events_session_stats": _q_events_session_stats,
        "events_hopping": _q_events_hopping,
        "events_sessionize": _q_sessionize,
        "events_funnel": td.events_funnel,
        "op_rollup": td.op_rollup,
        "op_cube": td.op_cube,
        "op_left_join": td.op_left_join,
        "op_full_join": td.op_full_join,
        "op_mad": _q_op_mad,
        "op_corr": _q_op_corr,
        "op_histogram": _q_op_histogram,
        "op_quantiles_by": td.op_quantiles_by,
        # text analysis
        "text_tokens": _q_text_tokens,
        "text_tokens_bpe": _q_text_tokens_bpe,
        "text_stats": _q_text_stats,
        "text_quality": _q_text_quality,
        "text_repetition": _q_text_repetition,
        "text_entropy": _q_text_entropy,
        "text_gopher": _q_text_gopher,
        "dedup_decontaminate": _q_dedup_decontaminate,
        "dedup_keep_best": _q_dedup_keep_best,
        "corpus_funnel": _q_corpus_funnel,
        "text_pii": _q_text_pii,
        "text_redact": _q_text_redact,
        "text_readability": _q_text_readability,
        "text_ttr": _q_text_ttr,
        "text_lang_mix": _q_text_lang_mix,
        "text_bpe_train": _q_text_bpe_train,
        "text_bpe_encode": _q_text_bpe_encode,
        "llm_prep": _q_llm_prep,
        "pii_scrub": _q_pii_scrub,
        "pack_sequences": _q_pack_sequences,
        "split_by_content": _q_split_by_content,
        "text_langid": _q_text_langid,
        "text_fingerprint": _q_text_fingerprint,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "dedup_ngram": _q_dedup_ngram,
        "dedup_substring": _q_dedup_substring,
        "dedup_paragraph": _q_dedup_paragraph,
        "dedup_lsh_incr": _q_dedup_lsh_incr,
        "dedup_semantic": _q_dedup_semantic,
        "text_charlm": _q_text_charlm,
        "samp_mixture": _q_samp_mixture,
        "samp_temperature": _q_samp_temperature,
        "sim_pq_refined": _q_sim_pq,
        "nx_pagerank": _q_nx_pagerank,
        "decontaminate": _q_decontaminate,
        # similarity search
        "sim_topk": _q_sim_topk,
        "sim_range": _q_sim_range,
        "sim_topk_filtered": _q_sim_topk_filtered,
        "sim_ivf_topk": _q_sim_ivf,
        "sim_ivf_exact": _q_sim_ivf_exact,
        "sim_ivf_indexed": _q_sim_ivf_indexed,
        # deterministic hash sampling / splitting
        "samp_sample": _q_samp_sample,
        "samp_split": _q_samp_split,
        "samp_stratified": _q_samp_stratified,
        "samp_cap": _q_samp_cap,
        "samp_priority": _q_samp_priority,
        "samp_dsir": _q_samp_dsir,
        "samp_shuffle": _q_samp_shuffle,
        "op_qsketch": _q_op_qsketch,
        "emb_covariance": _q_emb_covariance,
        "emb_pca": _q_emb_pca,
        "text_chunks": _q_text_chunks,
        "text_feature_hash": _q_text_feature_hash,
        "text_zipf": _q_text_zipf,
        "text_c4": _q_text_c4,
        "text_norm": _q_text_norm,
        "op_hll_by": _q_op_hll_by,
        # multimodal plumbing
        "multimodal_features": _q_multimodal,
        "jpeg_features": _q_jpeg_features,
        "video_features": _q_video_features,
        # the north-star corpus pipeline (rows-only check)
        "repos_flagship": _q_repos_flagship,
    }


def oracle_sql() -> dict[str, str]:
    from graphscope_ray.pipelines import oracle_sql as osql

    return {
        "lg_edges": osql.lg_edges_sql(),
        "lg_vertices": osql.lg_vertices_sql(),
        "lg_graphar_roundtrip": osql.lg_edges_sql(),
        "lg_graphar_dest": osql.lg_edges_sql(),
        "dyn_mutations": osql.dyn_mutations_sql(),
        "dyn_view_undirected": osql.dyn_view_undirected_sql(),
        "lg_edges_weighted": osql.lg_edges_weighted_sql(),
        "lg_degree": osql.lg_degree_sql(),
        "lg_undirected_edge_count": osql.lg_undirected_edge_count_sql(),
        "lg_induced_subgraph": osql.lg_induced_subgraph_sql(),
        "lg_pagerank": osql.lg_pagerank_sql(rounds=15),
        "lg_pagerank_locality": osql.lg_pagerank_sql(rounds=15),
        "lg_pagerank_push": osql.lg_pagerank_push_sql(rounds=15),
        "lg_pagerank_weighted": osql.lg_pagerank_weighted_sql(),
        "lg_pagerank_weighted_hub": osql.lg_pagerank_weighted_sql(),
        "lg_wcc": osql.lg_wcc_sql(),
        "lg_wcc_locality": osql.lg_wcc_sql(),
        "lg_wcc_phash": osql.lg_wcc_sql(),
        "lg_wcc_compact": osql.lg_wcc_sql(),
        "lg_cdlp": osql.lg_cdlp_sql(rounds=10),
        "lg_triangles": osql.lg_triangles_sql(),
        "lg_triangle_total": osql.lg_triangle_total_sql(),
        "lg_lcc": osql.lg_lcc_sql(),
        "lg_bfs": osql.lg_bfs_sql(),
        "lg_sssp": osql.lg_sssp_sql(),
        "lg_hits": osql.lg_hits_sql(iters=5),
        "lg_eigenvector": osql.lg_eigenvector_sql(iters=10),
        "lg_katz": osql.lg_katz_sql(iters=8),
        "lg_ppr": osql.lg_ppr_sql(rounds=10),
        "lg_ppr_seeds": osql.lg_ppr_seeds_sql(),
        "lg_articlerank": osql.lg_articlerank_sql(rounds=10),
        "lg_motifs": osql.lg_motifs_sql(),
        "lg_directed_census": osql.lg_directed_census_sql(),
        "lg_degeneracy": osql.lg_degeneracy_sql(),
        "lg_onion": osql.lg_onion_sql(),
        "lg_min_cover": osql.lg_min_cover_sql(),
        "lg_dominating": osql.lg_dominating_sql(),
        "lg_edge_cover": osql.lg_edge_cover_sql(),
        "lg_msf": osql.lg_msf_sql(),
        "lg_kclique": osql.lg_kclique_sql(),
        "lg_fluid": osql.lg_fluid_sql(),
        "lg_bfs_forest": osql.lg_bfs_forest_sql(),
        "lg_bridges": osql.lg_bridges_sql(),
        "lg_cut_points": osql.lg_cut_points_sql(),
        "lg_bcc": osql.lg_bcc_sql(),
        "lg_2ecc": osql.lg_2ecc_sql(),
        "lg_kcore": osql.lg_kcore_sql(k=5),
        "lg_kcore_size": osql.lg_kcore_size_sql(k=5),
        "lg_voterank": osql.lg_voterank_sql(k=10),
        "lg_closeness_sampled": osql.lg_closeness_sampled_sql(),
        "lg_betweenness_sampled": osql.lg_betweenness_sql(),
        "lg_edge_betweenness": osql.lg_edge_betweenness_sql(),
        "lg_closeness_harmonic": osql.lg_closeness_harmonic_sql(),
        "lg_apsp": osql.lg_apsp_sql(),
        "lg_has_path": osql.lg_has_path_sql(),
        "lg_avg_path_length": osql.lg_avg_path_length_sql(),
        "lg_avg_path_length_weighted": osql.lg_avg_path_length_weighted_sql(),
        "lg_sssp_path": osql.lg_sssp_path_sql(),
        "lg_attr_assortativity": osql.lg_attr_assortativity_sql(),
        "lg_lcc_directed": osql.lg_lcc_directed_sql(),
        "text_langid": osql.text_langid_sql(),
        "text_fingerprint": osql.text_fingerprint_sql(),
        "dedup_simhash": osql.dedup_simhash_sql(),
        "dedup_minhash": osql.dedup_minhash_sql(),
        "dedup_embedding": osql.dedup_embedding_sql(threshold=0.99),
        "lg_degree_centrality": osql.lg_degree_centrality_sql(),
        "lg_assortativity": osql.lg_assortativity_sql(),
        "lg_avg_degree_connectivity": osql.lg_avg_degree_connectivity_sql(),
        "lg_node_boundary": osql.lg_node_boundary_sql(),
        "lg_edge_boundary": osql.lg_edge_boundary_sql(),
        "lg_transitivity": osql.lg_transitivity_sql(),
        "lg_avg_clustering": osql.lg_avg_clustering_sql(),
        "op_filter_project": osql.op_filter_project_sql(),
        "op_groupby_agg": osql.op_groupby_agg_sql(),
        "op_sort_topk": osql.op_sort_topk_sql(),
        "op_join_addcolumn": osql.op_join_addcolumn_sql(),
        "op_distinct": osql.op_distinct_sql(),
        "op_union_distinct": osql.op_union_distinct_sql(),
        "op_intersect": osql.op_intersect_sql(),
        "op_except": osql.op_except_sql(),
        "op_unpivot": osql.op_unpivot_sql(),
        "text_winnow": osql.text_winnow_sql(),
        "op_consolidate": osql.op_consolidate_sql(),
        "op_csv_scan": "SELECT r_regionkey, r_name FROM region",
        "op_jsonl_scan": "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",
        "op_orc_scan": "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
        "op_topk_per_group": osql.op_topk_per_group_sql(),
        "op_groupby_median": osql.op_groupby_median_sql(),
        "op_asof_join": osql.op_asof_join_sql(),
        "op_asof_forward": osql.op_asof_forward_sql(),
        "op_zscore": osql.op_zscore_sql(),
        "op_count_distinct": osql.op_count_distinct_sql(),
        "op_hll_count": osql.op_hll_count_sql(),
        "op_cms_heavy": osql.op_cms_heavy_sql(),
        "op_bloom": osql.op_bloom_sql(),
        "op_profile": osql.op_profile_sql(),
        "op_kmeans": osql.op_kmeans_sql(),
        "text_tfidf": osql.text_tfidf_sql(),
        "text_bigrams": osql.text_bigrams_sql(),
        "text_ppmi": osql.text_ppmi_sql(),
        "op_range_join": osql.op_range_join_sql(),
        "op_semi_join": osql.op_semi_join_sql(),
        "op_anti_join": osql.op_anti_join_sql(),
        "op_window_funcs": osql.op_window_funcs_sql(),
        "op_quantiles": osql.op_quantiles_sql(),
        "op_pivot": osql.op_pivot_sql(),
        "op_explode": osql.op_explode_sql(),
        "lpa_u2i": osql.lpa_u2i_sql(),
        "lg_succs": osql.lg_succs_sql(),
        "lg_preds": osql.lg_preds_sql(),
        "lg_simple_paths": osql.lg_simple_paths_sql(),
        "lg_is_simple_path": osql.lg_is_simple_path_sql(),
        "lg_path_enum": osql.lg_path_enum_sql(),
        "lg_khop_sample": osql.lg_khop_sql(),
        "lg_negative_sample": osql.lg_negative_sample_sql(),
        "lg_link_features": osql.lg_link_features_sql(),
        "pg_metapath_sample": osql.pg_metapath_sql(),
        "lg_deepwalk_ppmi": osql.lg_deepwalk_ppmi_sql(),
        "lg_modularity": osql.lg_modularity_sql(),
        "lg_wl_colors": osql.lg_wl_colors_sql(),
        "lg_node2vec": osql.lg_node2vec_sql(),
        "lg_community_stats": osql.lg_community_stats_sql(),
        "lg_contract": osql.lg_contract_sql(),
        "lg_sage_sum": osql.lg_sage_sum_sql(),
        "pg_wcc": osql.pg_wcc_sql(),
        "pg_sssp": osql.pg_sssp_sql(),
        "pg_pagerank": osql.pg_pagerank_sql(),
        "pg_project_wcc": osql.pg_project_wcc_sql(),
        "pg_addcol_consolidate": osql.pg_addcol_consolidate_sql(),
        "pg_gremlin_count": osql.pg_gremlin_count_sql(),
        "pg_gremlin_groupcount": osql.pg_gremlin_groupcount_sql(),
        "pg_gremlin_subgraph": osql.pg_gremlin_subgraph_sql(),
        "pg_gremlin_repeat": osql.pg_gremlin_repeat_sql(),
        "pg_gremlin_emit": osql.pg_gremlin_emit_sql(),
        "pg_gremlin_union": osql.pg_gremlin_union_sql(),
        "pg_gremlin_order_range": osql.pg_gremlin_order_range_sql(),
        "pg_gremlin_where": osql.pg_gremlin_where_sql(),
        "pg_gremlin_agg": osql.pg_gremlin_agg_sql(),
        "pg_gremlin_path": osql.pg_gremlin_path_sql(),
        "pg_gremlin_select": osql.pg_gremlin_select_sql(),
        "pg_gremlin_coin": osql.pg_gremlin_coin_sql(),
        "pg_update_column": osql.pg_update_column_sql(),
        "train_epoch_order": osql.train_epoch_order_sql(),
        "pg_mutations": osql.pg_mutations_sql(),
        "pg_graphar_roundtrip": (
            "SELECT o_custkey AS src_oid, o_orderkey AS dst_oid FROM orders "
            "ORDER BY src_oid, dst_oid"
        ),
        "lg_sssp_weighted": osql.lg_sssp_weighted_sql(),
        # delta-stepping computes the same exact distances -> same oracle
        "lg_sssp_delta": osql.lg_sssp_weighted_sql(),
        "lg_ktruss": osql.lg_ktruss_sql(),
        "lg_trussness": osql.lg_trussness_sql(),
        "lg_embeddedness": osql.lg_embeddedness_sql(),
        "lg_edge_jaccard": osql.lg_edge_jaccard_sql(),
        "lg_khop_sizes": osql.lg_khop_sizes_sql(),
        "lg_cocitation": osql.lg_cocitation_sql(),
        "lg_bibcoupling": osql.lg_bibcoupling_sql(),
        "lg_adamic_topk": osql.lg_adamic_topk_sql(),
        "lg_sweep_cut": osql.lg_sweep_cut_sql(),
        "lg_random_walks": osql.lg_random_walks_sql(),
        "lg_eccentricity": osql.lg_eccentricity_sql(),
        "lg_pagerank_converged": osql.lg_pagerank_converged_sql(),
        "lg_pagerank_p2p": osql.lg_pagerank_sql(rounds=15),
        "lg_scc": osql.lg_scc_sql(),
        "lg_condensation": osql.lg_condensation_sql(),
        "lg_mis": osql.lg_mis_sql(),
        "lg_matching": osql.lg_matching_sql(),
        "lg_coloring": osql.lg_coloring_sql(),
        "lg_rectangles": osql.lg_rectangles_sql(),
        "lg_densest": osql.lg_densest_sql(),
        "lg_kshell": osql.lg_kshell_sql(),
        "lg_ecc_all": osql.lg_ecc_all_sql(),
        "lg_diameter": osql.lg_diameter_sql(),
        "lg_eff_diameter": osql.lg_eff_diameter_sql(),
        "lg_global_efficiency": osql.lg_global_efficiency_sql(),
        "lg_richclub": osql.lg_richclub_sql(),
        "lg_simrank": osql.lg_simrank_sql(),
        "lg_bipartite_proj": osql.lg_bipartite_proj_sql(),
        "lg_salsa": osql.lg_salsa_sql(),
        "lg_backbone": osql.lg_backbone_sql(),
        "lg_degree_hist": osql.lg_degree_hist_sql(),
        "lg_degree_gini": osql.lg_degree_gini_sql(),
        "lg_assortativity_directed": osql.lg_assortativity_directed_sql(),
        "lg_seeded_lpa": osql.lg_seeded_lpa_sql(),
        "lg_two_hop": osql.lg_two_hop_sql(),
        "lg_weighted_clustering": osql.lg_weighted_clustering_sql(),
        "lg_onnela_clustering": osql.lg_onnela_clustering_sql(),
        "lg_reciprocity": osql.lg_reciprocity_sql(),
        "lg_avg_nbr_deg": osql.lg_avg_nbr_deg_sql(),
        "lg_smetric": osql.lg_smetric_sql(),
        "lg_kcenter": osql.lg_kcenter_sql(),
        "lg_closeness_exact": osql.lg_closeness_exact_sql(),
        "events_window": osql.events_window_sql(),
        "events_cohort": osql.events_cohort_sql(),
        "events_first_touch": osql.events_first_touch_sql(),
        "events_rfm": osql.events_rfm_sql(),
        "events_trending": osql.events_trending_sql(),
        "events_trend": osql.events_trend_sql(),
        "events_gaps": osql.events_gaps_sql(),
        "events_session_stats": osql.events_session_stats_sql(),
        "events_hopping": osql.events_hopping_sql(),
        "events_sessionize": osql.sessionize_sql(),
        "events_funnel": osql.events_funnel_sql(),
        "op_rollup": osql.op_rollup_sql(),
        "op_cube": osql.op_cube_sql(),
        "op_left_join": osql.op_left_join_sql(),
        "op_full_join": osql.op_full_join_sql(),
        "op_mad": osql.op_mad_sql(),
        "op_corr": osql.op_corr_sql(),
        "op_histogram": osql.op_histogram_sql(),
        "op_quantiles_by": osql.op_quantiles_by_sql(),
        "text_tokens": osql.text_tokens_sql(),
        "text_tokens_bpe": osql.text_tokens_bpe_sql(),
        "text_stats": osql.text_stats_sql(),
        "text_quality": osql.text_quality_sql(),
        "text_repetition": osql.text_repetition_sql(),
        "pii_scrub": osql.pii_scrub_sql(),
        "pack_sequences": osql.pack_sequences_sql(),
        "split_by_content": osql.split_by_content_sql(),
        "dedup_exact": osql.dedup_exact_sql(),
        "dedup_ngram": osql.dedup_ngram_sql(),
        "dedup_substring": osql.dedup_substring_sql(),
        "dedup_paragraph": osql.dedup_paragraph_sql(),
        "dedup_lsh_incr": osql.dedup_lsh_incr_sql(),
        "dedup_semantic": osql.dedup_semantic_sql(),
        "text_charlm": osql.text_charlm_sql(),
        "text_entropy": osql.text_entropy_sql(),
        "text_gopher": osql.text_gopher_sql(),
        "dedup_decontaminate": osql.dedup_decontaminate_sql(),
        "dedup_keep_best": osql.dedup_keep_best_sql(),
        "corpus_funnel": osql.corpus_funnel_sql(),
        "text_pii": osql.text_pii_sql(),
        "text_redact": osql.text_redact_sql(),
        "text_readability": osql.text_readability_sql(),
        "text_ttr": osql.text_ttr_sql(),
        "text_lang_mix": osql.text_lang_mix_sql(),
        "llm_prep": osql.llm_prep_sql(),
        "samp_mixture": osql.samp_mixture_sql(),
        "samp_temperature": osql.samp_temperature_sql(),
        "sim_pq_refined": osql.sim_topk_sql(),
        "nx_pagerank": osql.lg_pagerank_sql(rounds=15),
        "decontaminate": osql.decontaminate_sql(),
        "lg_louvain_level1": osql.lg_louvain_level1_sql(),
        "sim_topk": osql.sim_topk_sql(),
        "sim_range": osql.sim_range_sql(),
        "sim_topk_filtered": osql.sim_topk_filtered_sql(),
        "sim_ivf_exact": osql.sim_topk_sql(),
        "sim_ivf_indexed": osql.sim_topk_sql(),
        "samp_sample": osql.samp_sample_sql(),
        "samp_split": osql.samp_split_sql(),
        "samp_stratified": osql.samp_stratified_sql(),
        "samp_cap": osql.samp_cap_sql(),
        "samp_priority": osql.samp_priority_sql(),
        "samp_dsir": osql.samp_dsir_sql(),
        "samp_shuffle": osql.samp_shuffle_sql(),
        "op_qsketch": osql.op_qsketch_sql(),
        "emb_covariance": osql.emb_covariance_sql(),
        "text_chunks": osql.text_chunks_sql(),
        "text_feature_hash": osql.text_feature_hash_sql(),
        "text_zipf": osql.text_zipf_sql(),
        "text_c4": osql.text_c4_sql(),
        "text_norm": osql.text_norm_sql(),
        "op_hll_by": osql.op_hll_by_sql(),
        # no SQL oracle (heuristic / sequential / approximate / stateful):
        # lg_dfs (stack order is not SQL-expressible; pytest oracle),
        # lg_louvain (labels data-dependent; pytest modularity oracles),
        # sim_ivf_topk (approximate; sim_ivf_exact gates the machinery),
        # multimodal_features / video_features (binary decode; pytest
        # oracles), lg_random_walks has its own SQL entry; repos_flagship
        # runs on a generated corpus outside the registered views —
        # driver records rows-only checks for these.
    }
