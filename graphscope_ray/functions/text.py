"""Text-analysis stages for training-data pipelines (documents table).

All stages are vectorized ``map_batches`` transforms; the stateful ones
(language ID, BPE-ish tokenizer) are callable classes → actor pools with
patterns compiled once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# ---------------------------------------------------------------------------


def token_counts(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens): whitespace tokens = count of \\S+ runs (matches the
    SQL oracle `length(list_filter(string_split_regex(text,'\\s+'), x<>''))`)."""

    def _f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], r"\S+")
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(_f, batch_format="pyarrow")


# GPT-2-style BPE pre-tokenizer (Radford et al. 2019, public regex), adapted
# to RE2 (no lookahead, so the original's `\s+(?!\S)` trailing-space rule
# folds into the plain `\s+` branch — documented divergence).  Arrow's
# count_substring_regex AND DuckDB's regexp_extract_all both run RE2, so the
# engine and its SQL oracle share one regex with identical semantics.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_counts_bpe(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_tokens): BPE-ish pre-token count — contractions, letter
    runs, digit runs, punctuation runs, whitespace runs (the unit a BPE
    tokenizer's merges operate within).  Vectorized RE2 count per batch."""

    def _f(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[text_col], BPE_PRETOKEN_RE)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(_f, batch_format="pyarrow")


def text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_chars, n_words, n_alpha, n_digit): quality-scoring raw stats."""

    def _f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t[text_col]), pa.int64()),
                "n_words": pc.cast(pc.count_substring_regex(t[text_col], r"\S+"), pa.int64()),
                "n_alpha": pc.cast(
                    pc.count_substring_regex(t[text_col], r"[A-Za-z]"), pa.int64()
                ),
                "n_digit": pc.cast(pc.count_substring_regex(t[text_col], r"[0-9]"), pa.int64()),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, quality): composite heuristic in [0,1] — length band, alpha
    ratio, mean word length band (C4/Gopher-style rules, public heuristics)."""

    def _f(t: pa.Table) -> pa.Table:
        chars = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False).astype(np.float64)
        words = (
            pc.count_substring_regex(t[text_col], r"\S+").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        alpha = (
            pc.count_substring_regex(t[text_col], r"[A-Za-z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            mwl = np.where(words > 0, chars / words, 0.0)
            alpha_ratio = np.where(chars > 0, alpha / chars, 0.0)
        len_ok = ((chars >= 50) & (chars <= 100_000)).astype(np.float64)
        mwl_ok = ((mwl >= 3) & (mwl <= 12)).astype(np.float64)
        q = 0.4 * len_ok + 0.4 * alpha_ratio + 0.2 * mwl_ok
        return pa.table({"doc_id": t["doc_id"], "quality": pa.array(q)})

    return ds.map_batches(_f, batch_format="pyarrow")


# PII patterns (RE2 syntax — no lookarounds, so Arrow's
# replace_substring_regex and DuckDB's regexp_replace, both RE2, produce
# byte-identical redactions; the public C4/CCNet-style scrub rules)
# CCNet-style normalization steps (Wenzek et al. 2020 §4.1, public
# methodology): lowercase, every digit → 0, punctuation → space, whitespace
# collapsed.  Accent folding is skipped — the synthetic corpus is pure
# ASCII and DuckDB lacks a strip_accents twin (documented divergence).
# Both regexes run RE2 on both sides (Arrow replace_substring_regex /
# DuckDB regexp_replace 'g'), so engine and oracle share one kernel.
NORM_STEPS: list[tuple[str, str]] = [
    (r"[0-9]", "0"),
    (r"[^a-z0\s]", " "),
]


def normalize_text(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, norm_text): the canonical pre-dedup text normalization —
    near-dup pipelines (CCNet, Dolma) hash the NORMALIZED text so case,
    digits and punctuation don't defeat exact/minhash dedup.  Pure
    vectorized map_batches (three RE2 passes + trim); streams, no state."""

    def _f(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t[text_col])
        for pat, repl in NORM_STEPS:
            s = pc.replace_substring_regex(s, pat, replacement=repl)
        s = pc.utf8_trim_whitespace(pc.replace_substring_regex(s, r"\s+", replacement=" "))
        return pa.table({"doc_id": t["doc_id"], "norm_text": s})

    return ds.select_columns(["doc_id", text_col]).map_batches(_f, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    size: int = 512,
    overlap: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """RAG/embedding-prep chunking: split every document into windows of
    ``size`` characters with ``overlap`` characters shared between
    consecutive chunks (stride = size - overlap).  One row per chunk:
    (doc_id, start, chunk, chunk_len); every doc emits ≥1 chunk (an empty
    doc yields one empty chunk), so no document silently disappears.

    Vectorized: per batch, one ``utf8_slice_codeunits`` call PER CHUNK
    POSITION k (start = k·stride, a fixed offset — Arrow slices the whole
    column at once) restricted to docs long enough to own chunk k; a
    stateless flat-map, streams at any corpus size with no exchange."""
    assert 0 <= overlap < size
    stride = size - overlap

    def _f(t: pa.Table) -> pa.Table:
        lens = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
        n_chunks = np.maximum(lens - 1, 0) // stride + 1
        ids_parts, start_parts, chunk_parts = [], [], []
        k = 0
        remaining = np.arange(len(lens))
        while remaining.size:
            has_k = remaining[n_chunks[remaining] > k]
            if has_k.size == 0:
                break
            sub = t.take(has_k)
            sl = pc.utf8_slice_codeunits(sub[text_col], k * stride, k * stride + size)
            ids_parts.append(sub[id_col])
            start_parts.append(pa.array(np.full(has_k.size, k * stride, dtype=np.int64)))
            chunk_parts.append(sl.combine_chunks() if isinstance(sl, pa.ChunkedArray) else sl)
            remaining = has_k
            k += 1
        if not ids_parts:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "start": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "chunk_len": pa.array([], pa.int64()),
                }
            )
        ids = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in ids_parts])
        chunks = pa.concat_arrays(chunk_parts)
        return pa.table(
            {
                id_col: ids,
                "start": pa.concat_arrays(start_parts),
                "chunk": chunks,
                "chunk_len": pc.cast(pc.utf8_length(chunks), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pyarrow")


PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\+?\d{1,3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scrub(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_email, n_ip, n_phone, clean_text): count PII matches on the
    original text, then redact by applying the three patterns in order
    (email → ip → phone).  Counts are non-overlapping leftmost matches —
    identical semantics in Arrow count_substring_regex and DuckDB
    regexp_extract_all, both RE2.  Pure vectorized map_batches; streams."""

    def _f(t: pa.Table) -> pa.Table:
        col = t[text_col]
        cols: dict = {"doc_id": t["doc_id"]}
        clean = col
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(col, pat), pa.int64())
            clean = pc.replace_substring_regex(clean, pat, replacement=repl)
        cols["clean_text"] = clean
        return pa.table(cols)

    return ds.select_columns(["doc_id", text_col]).map_batches(_f, batch_format="pyarrow")


def repetition_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Gopher-style repetition quality filter (Rae et al. 2021 §A1.1, public
    methodology): per doc, the number of characters covered by the most
    frequent word 2-gram / 3-gram (``top{n}_chars = max count(g)·len(g)``)
    and by all duplicated word 5-grams (``dup5_chars = Σ_{count≥2}
    count(g)·len(g)``), over overlapping single-space-joined word n-grams.
    ``repetitive`` applies the paper's thresholds (top-2-gram fraction > 0.2
    or dup-5-gram fraction > 0.15) via exact integer comparisons — no float
    columns, so the oracle hash is exact by construction.

    Fully vectorized: one segmented token-hash pass per batch
    (hashing.batch_token_hashes_lens), n-gram hashes via sliding windows
    over the token-hash stream masked at doc boundaries, per-(doc, gram)
    counts via one lexsort + run-length pass.  No shuffle; streams."""

    def _f(t: pa.Table) -> pa.Table:
        from graphscope_ray.functions.hashing import (
            _pow_table,
            batch_token_hashes_lens,
            mix64,
        )

        col = pc.fill_null(t[text_col], "")  # null text ≡ empty doc
        texts = col.to_pylist()
        th, cl, bounds = batch_token_hashes_lens(texts)
        n_docs = len(texts)
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(bounds))
        ccl = np.concatenate([[0], np.cumsum(cl)])
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"doc_id": t["doc_id"]}

        def _gram_runs(n: int):
            """(run_doc, run_count, run_charlen) per distinct (doc, n-gram)."""
            if th.size < n:
                e = np.empty(0, dtype=np.int64)
                return e, e, e
            W = np.lib.stride_tricks.sliding_window_view(th, n)
            pw = _pow_table(n)[:n][::-1]
            gh = mix64((W * pw).sum(axis=1, dtype=np.uint64))
            gdoc = tok_doc[: gh.size]
            valid = gdoc == tok_doc[n - 1 :]
            gh, gdoc = gh[valid], gdoc[valid]
            starts = np.flatnonzero(valid)
            glen = ccl[starts + n] - ccl[starts] + (n - 1)
            if gh.size == 0:
                e = np.empty(0, dtype=np.int64)
                return e, e, e
            order = np.lexsort((gh, gdoc))
            gh_s, gdoc_s = gh[order], gdoc[order]
            new = np.concatenate(
                [[True], (gh_s[1:] != gh_s[:-1]) | (gdoc_s[1:] != gdoc_s[:-1])]
            )
            rstart = np.flatnonzero(new)
            rcount = np.diff(np.concatenate([rstart, [gh_s.size]]))
            return gdoc_s[rstart], rcount.astype(np.int64), glen[order][rstart]

        for n in (2, 3):
            vals = np.zeros(n_docs, dtype=np.int64)
            rdoc, rcnt, rlen = _gram_runs(n)
            if rdoc.size:
                np.maximum.at(vals, rdoc, rcnt * rlen)
            cols[f"top{n}_chars"] = pa.array(vals)
        dup5 = np.zeros(n_docs, dtype=np.int64)
        rdoc, rcnt, rlen = _gram_runs(5)
        if rdoc.size:
            m = rcnt >= 2
            np.add.at(dup5, rdoc[m], (rcnt * rlen)[m])
        cols["dup5_chars"] = pa.array(dup5)
        cols["n_chars"] = pa.array(n_chars)
        top2 = cols["top2_chars"].to_numpy()
        cols["repetitive"] = pa.array((5 * top2 > n_chars) | (20 * dup5 > 3 * n_chars))
        return pa.table(cols)

    return ds.select_columns(["doc_id", text_col]).map_batches(_f, batch_format="pyarrow")


class LangId:
    """Stopword-profile language ID heuristic (actor pool; profiles built once).
    Scores = fraction of tokens in each language's top-stopword set."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
        "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"},
        "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
    }

    def __init__(self):
        self.word = re.compile(r"[a-zA-ZäöüéèêàçñÄÖÜ]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized scoring: explode tokens once, one isin per profile,
        # groupby-sum back per doc (no per-row Python scoring loop)
        toks = batch["text"].str.lower().str.findall(self.word)
        toks.index = pd.RangeIndex(len(toks))
        n = toks.str.len().to_numpy(np.float64)
        ex = toks.explode().dropna()
        score_cols = {}
        for lang, prof in self.PROFILES.items():
            m = ex.isin(prof)
            hits = m.groupby(level=0).sum().reindex(range(len(batch)), fill_value=0)
            with np.errstate(divide="ignore", invalid="ignore"):
                score_cols[lang] = np.where(n > 0, hits.to_numpy(np.float64) / n, 0.0)
        # tie-break = max score, then lexicographically largest lang
        langs = sorted(score_cols, reverse=True)
        S = np.stack([score_cols[lg] for lg in langs], axis=1)
        best_ix = S.argmax(axis=1)  # first max → largest lang name wins ties
        best = S[np.arange(len(batch)), best_ix]
        pred = np.array(langs, dtype=object)[best_ix]
        pred = np.where(best > 0.05, pred, "unknown")
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy()),
                "lang_pred": pa.array(pred.astype(str).tolist(), pa.string()),
                # oracle (text_langid_sql) emits round(best, 8); the driver
                # hashes raw values, so bake the same rounding in here
                "lang_score": pa.array(np.round(best, 8)),
            }
        )


def lang_id(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


# PII patterns shared VERBATIM with the SQL oracle (oracle_sql.text_pii_sql).
# Alternation-free greedy character-class regexes, so Python re (leftmost-
# first) and DuckDB/RE2 (leftmost-longest) agree on every match span.
# (Distinct from the word-boundary PII_PATTERNS tuple list that pii_scrub
# uses above — different pattern family, different query.)
PII_COUNT_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
    "n_phones": r"\+?[0-9][0-9()\- ]{7,}[0-9]",
    "n_ips": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


class PiiScan:
    """PII-pattern scan (the detection half of the redaction stage every
    training-data pipeline runs before release — emails / phone numbers /
    IPv4 literals): per-doc non-overlapping match counts.  Actor-pool
    stage: patterns compile once per actor in ``__init__``; ``__call__``
    counts via pandas vectorized ``str.count`` (C regex loop, no per-row
    Python)."""

    def __init__(self):
        self.pats = {k: re.compile(v) for k, v in PII_COUNT_PATTERNS.items()}

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        out = {"doc_id": pa.array(batch["doc_id"].to_numpy(np.int64))}
        txt = batch["text"].fillna("")
        for name, pat in self.pats.items():
            out[name] = pa.array(txt.str.count(pat).to_numpy(np.int64))
        return pa.table(out)


def pii_scan(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        PiiScan, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


PII_PLACEHOLDERS = {
    "n_emails": "<EMAIL>",
    "n_phones": "<PHONE>",
    "n_ips": "<IP>",
}


class PiiRedact:
    """The redaction half: every PII match replaced by its placeholder
    token, applied in the fixed PII_COUNT_PATTERNS order (emails before phones
    before IPs — order matters when spans could overlap, so both engine
    and oracle apply the same sequence).  Actor pool, vectorized
    ``str.replace`` per pattern."""

    def __init__(self):
        self.pats = [
            (re.compile(PII_COUNT_PATTERNS[k]), PII_PLACEHOLDERS[k])
            for k in PII_COUNT_PATTERNS
        ]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        txt = batch["text"].fillna("")
        for pat, repl in self.pats:
            txt = txt.str.replace(pat, repl, regex=True)
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy(np.int64)),
                "text_redacted": pa.array(txt.tolist(), pa.string()),
            }
        )


def pii_redact(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        PiiRedact, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


def type_token_ratio(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Type-token ratio per document (lexical-diversity quality feature):
    distinct whitespace tokens / total tokens, round 8 (0 for empty docs).
    One map_batches pass; the per-doc distinct runs in a pandas groupby
    nunique (C), never a Python loop."""

    def _f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lst = pc.split_pattern_regex(t[text_col], r"\s+")
        cnt = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lst.combine_chunks().flatten().to_numpy(zero_copy_only=False)
        n = t.num_rows
        drow = np.repeat(np.arange(n, dtype=np.int64), cnt)
        keep = flat != ""  # \s+ split yields empty edge tokens; \S+ runs only
        df = pd.DataFrame({"d": drow[keep], "tok": flat[keep]})
        ntok = np.zeros(n, dtype=np.int64)
        nty = np.zeros(n, dtype=np.int64)
        if len(df):
            g = df.groupby("d")["tok"]
            sz = g.size()
            un = g.nunique()
            ntok[sz.index.to_numpy()] = sz.to_numpy()
            nty[un.index.to_numpy()] = un.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ttr = np.where(ntok > 0, nty / np.maximum(ntok, 1), 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(ntok),
                "n_types": pa.array(nty),
                "ttr": np.round(ttr, 8),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pyarrow")


def readability(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Flesch reading ease + Flesch–Kincaid grade per document — the
    classic readability quality features (words = ``\\S+`` runs, sentences
    = ``[.!?]+`` runs, syllables ≈ ``[aeiouyAEIOUY]+`` vowel-group runs:
    the standard regex approximation).  The three counts are exact
    integers from pyarrow regex kernels; the two formulas evaluate the
    SAME float expression as the SQL twin (round 8).  Zero words or zero
    sentences → both scores 0.  One shuffle-free map_batches pass."""

    def _f(t: pa.Table) -> pa.Table:
        w = pc.cast(pc.count_substring_regex(t[text_col], r"\S+"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s = pc.cast(
            pc.count_substring_regex(t[text_col], r"[.!?]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        y = pc.cast(
            pc.count_substring_regex(t[text_col], r"[aeiouyAEIOUY]+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        ok = (w > 0) & (s > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            wps = np.where(ok, w / np.maximum(s, 1), 0.0)
            ypw = np.where(ok, y / np.maximum(w, 1), 0.0)
            ease = np.where(ok, 206.835 - 1.015 * wps - 84.6 * ypw, 0.0)
            grade = np.where(ok, 0.39 * wps + 11.8 * ypw - 15.59, 0.0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(w),
                "n_sentences": pa.array(s),
                "n_syllables": pa.array(y),
                "flesch_ease": np.round(ease, 8),
                "fk_grade": np.round(grade, 8),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(_f, batch_format="pyarrow")


class Fingerprinter:
    """Rolling polynomial hash document fingerprint (64-bit), deterministic:
    fp = Σ hash(token_i)·B^(n-1-i) over whitespace tokens (uint64 wraparound).
    Fully vectorized: the whole batch's tokens are hashed in one segmented
    numpy pass (functions/hashing.py), the per-doc combine is one reduceat —
    no per-token Python (VERDICT r1 fix)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from graphscope_ray.functions.hashing import _pow_table, mix64, batch_token_hashes

        th, bounds = batch_token_hashes(batch["text"].tolist())
        n_docs = len(batch)
        fps = np.zeros(n_docs, dtype=np.uint64)
        counts = np.diff(bounds)
        if th.size:
            # position from the end of each doc → B^(n-1-i) weights
            pos_from_end = (
                np.repeat(bounds[1:], counts) - 1 - np.arange(th.size, dtype=np.int64)
            )
            pw = _pow_table(int(counts.max()) + 1)
            contrib = th * pw[pos_from_end]
            nonempty = np.flatnonzero(counts)
            fps[nonempty] = mix64(np.add.reduceat(contrib, bounds[:-1][nonempty]))
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"].to_numpy()),
                "fingerprint": pa.array(fps.astype(np.int64)),
            }
        )


def hash_str64(s: str) -> int:
    """Stable 64-bit string hash of one token (matches the vectorized
    token_hashes kernel — kept for point lookups and tests)."""
    from graphscope_ray.functions.hashing import token_hashes

    h = token_hashes(s.encode("utf-8", "surrogatepass"))
    return int(h[0]) if h.size else 0


def fingerprints(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


# ---------------------------------------------------------------------------
# char-bigram LM perplexity (CCNet-style model-based quality scoring,
# deterministic: the LM is trained ON the corpus in a first distributed pass)


def charlm_xent(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Model-based quality scoring à la CCNet (Wenzek et al. 2020), with a
    deterministic in-corpus model instead of an external KenLM: pass 1
    trains an add-one-smoothed char-bigram LM over the whole corpus
    (per-block dense count partials → one hash exchange of <= 64K+256
    rows); the fitted log-prob table (256×256 float64, ~0.5 MB) is
    broadcast with ray.put; pass 2 scores every document with a single
    vectorized gather:

        xent(doc) = round(-(1/(n-1)) * sum_i ln P(c_i | c_{i-1}), 8)

    where P(b|a) = (C(a,b)+1) / (C(a,·)+V), V = number of distinct chars
    in the corpus.  Docs shorter than 2 chars score 0.  At 100 TB both
    passes stream; the only exchange payload is the bounded count table.
    ASCII caveat shared with the fingerprint oracle: SQL `ord(char)` ==
    utf-8 byte only for pure-ASCII corpora.
    """
    from graphscope_ray.utils import hash_groupby_sum

    def _counts(t: pa.Table) -> pa.Table:
        bg = np.zeros(65536, dtype=np.int64)
        un = np.zeros(256, dtype=np.int64)
        for txt in t[text_col].to_pylist():
            b = np.frombuffer((txt or "").encode("utf-8"), dtype=np.uint8)
            if b.size == 0:
                continue
            np.add.at(un, b, 1)
            if b.size >= 2:
                idx = b[:-1].astype(np.int32) * 256 + b[1:]
                np.add.at(bg, idx, 1)
        keys = np.concatenate([np.nonzero(bg)[0], 65536 + np.nonzero(un)[0]])
        vals = np.concatenate([bg[bg > 0], un[un > 0]])
        return pa.table({"ab": keys.astype(np.int64), "cnt": vals})

    parts = ds.select_columns([text_col]).map_batches(_counts, batch_format="pyarrow")
    counts = hash_groupby_sum(
        parts, ["ab"], "cnt", "cnt", num_partitions=num_partitions
    ).to_pandas()
    bg = np.zeros(65536, dtype=np.float64)
    seen = np.zeros(256, dtype=bool)
    isbg = counts["ab"].to_numpy() < 65536
    bg[counts["ab"].to_numpy()[isbg]] = counts["cnt"].to_numpy()[isbg]
    seen[counts["ab"].to_numpy()[~isbg] - 65536] = True
    V = int(seen.sum())
    row = bg.reshape(256, 256).sum(axis=1, keepdims=True)
    logp = np.log((bg.reshape(256, 256) + 1.0) / (row + float(V))).ravel()
    model = ray.put(logp)

    def _score(t: pa.Table) -> pa.Table:
        lp = ray.get(model)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(ids), dtype=np.float64)
        for j, txt in enumerate(t[text_col].to_pylist()):
            b = np.frombuffer((txt or "").encode("utf-8"), dtype=np.uint8)
            if b.size >= 2:
                idx = b[:-1].astype(np.int32) * 256 + b[1:]
                out[j] = -lp[idx].sum() / (b.size - 1)
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "xent": np.round(out, 8)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow"
    )


def char_entropy(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Per-document character (byte) Shannon entropy in bits — the
    low/high-entropy quality signal web pipelines filter on (gibberish and
    boilerplate sit at the tails; cf. Dolma/RedPajama heuristic filters).
    One vectorized pass: all byte counts per batch land in one
    ``np.add.at`` scatter over a (docs × 256) table — no per-char Python.
    Empty documents get entropy 0.0."""

    def _ent(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        enc = [(x or "").encode("utf-8") for x in texts]
        lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        out = np.zeros(len(enc), dtype=np.float64)
        nz = np.flatnonzero(lens)
        if nz.size:
            b = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
            drow = np.repeat(np.arange(nz.size, dtype=np.int64), lens[nz])
            counts = np.zeros((nz.size, 256), dtype=np.int64)
            np.add.at(counts, (drow, b), 1)
            with np.errstate(divide="ignore", invalid="ignore"):
                p = counts / lens[nz][:, None]
                h = np.where(counts > 0, -p * np.log2(np.where(p > 0, p, 1.0)), 0.0)
            out[nz] = h.sum(axis=1)
        return pa.table(
            {id_col: pa.array(ids, pa.int64()), "entropy": np.round(out, 8)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _ent, batch_format="pyarrow"
    )


def gopher_repetition(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 — the
    filters MassiveText applies before training), per document:

    - ``dup_line_frac``: repeated line occurrences beyond the first / total
      lines (lines split on ``\\n``).
    - ``dup_line_char_frac``: characters in those repeated occurrences /
      total line characters.
    - ``top_bigram_char_frac``: character mass of the most frequent
      adjacent word 2-gram (count × (len(w1)+len(w2)), ties → smallest
      (w1, w2)) / total token characters; 0 with fewer than two tokens.
    - ``dup_5gram_char_frac``: characters of tokens covered by ANY
      occurrence of a word 5-gram that appears ≥2 times in the doc
      (coverage-union, the Gopher dup-n-gram rule) / total token
      characters; 0 with fewer than five tokens.

    All three are exact-integer counts with one final division (round 8) —
    bit-matchable by the SQL oracle.  Embarrassingly parallel: each doc is
    one row, so this is ONE ``map_batches`` pass with pandas-groupby (C)
    kernels per block — no exchange, no driver state."""

    def _stats(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        dl = np.zeros(n, dtype=np.float64)
        dlc = np.zeros(n, dtype=np.float64)
        tbc = np.zeros(n, dtype=np.float64)
        d5g = np.zeros(n, dtype=np.float64)
        if n:
            # ---- line stats: explode → one (doc, line) groupby ----
            lines = pc.split_pattern(t[text_col], "\n")
            lcnt = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = lines.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            drow = np.repeat(np.arange(n, dtype=np.int64), lcnt)
            lf = pd.DataFrame({"d": drow, "line": flat})
            g = lf.groupby(["d", "line"], sort=False).size().reset_index(name="c")
            llen = g["line"].str.len().to_numpy(np.int64)
            c = g["c"].to_numpy(np.int64)
            agg = pd.DataFrame(
                {
                    "d": g["d"].to_numpy(),
                    "nl": c,
                    "nd": c - 1,
                    "ch": llen * c,
                    "chd": llen * (c - 1),
                }
            ).groupby("d").sum()
            di = agg.index.to_numpy(np.int64)
            nl = agg["nl"].to_numpy(np.int64)
            ch = agg["ch"].to_numpy(np.int64)
            with np.errstate(divide="ignore", invalid="ignore"):
                dl[di] = np.where(nl > 0, agg["nd"].to_numpy(np.int64) / nl, 0.0)
                dlc[di] = np.where(ch > 0, agg["chd"].to_numpy(np.int64) / ch, 0.0)
            # ---- bigram stats: token shift → one (doc, w1, w2) groupby ----
            toks = pc.split_pattern(t[text_col], " ")
            tcnt = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            tflat = toks.combine_chunks().flatten().to_numpy(zero_copy_only=False)
            tlen = pd.Series(tflat).str.len().to_numpy(np.int64)
            trow = np.repeat(np.arange(n, dtype=np.int64), tcnt)
            tchars = np.zeros(n, dtype=np.int64)
            np.add.at(tchars, trow, tlen)
            keep = np.ones(len(tflat), dtype=bool)
            ends = np.cumsum(tcnt) - 1
            keep[ends[tcnt > 0]] = False
            bf = pd.DataFrame(
                {
                    "d": trow[keep],
                    "w1": tflat[keep],
                    "w2": np.roll(tflat, -1)[keep],
                    "m": tlen[keep] + np.roll(tlen, -1)[keep],
                }
            )
            if len(bf):
                bg = (
                    bf.groupby(["d", "w1", "w2"], sort=False)
                    .agg(c=("m", "size"), m=("m", "first"))
                    .reset_index()
                )
                top = bg.sort_values(
                    ["d", "c", "w1", "w2"], ascending=[True, False, True, True]
                ).drop_duplicates("d")
                td = top["d"].to_numpy(np.int64)
                mass = top["c"].to_numpy(np.int64) * top["m"].to_numpy(np.int64)
                denom = tchars[td]
                with np.errstate(divide="ignore", invalid="ignore"):
                    tbc[td] = np.where(denom > 0, mass / denom, 0.0)
            # ---- dup 5-gram coverage: diff-array over flat positions ----
            W = 5
            nt = len(tflat)
            if nt >= W:
                off = np.concatenate([[0], np.cumsum(tcnt)[:-1]])
                pos = np.arange(nt, dtype=np.int64) - np.repeat(off, tcnt)
                ok = pos <= np.repeat(tcnt, tcnt) - W  # in-doc gram starts
                # joined-by-space key is injective: tokens cannot contain ' '
                key = tflat.astype(str)
                for s in range(1, W):
                    key = np.char.add(np.char.add(key, " "), np.roll(tflat, -s).astype(str))
                starts = np.flatnonzero(ok)
                if starts.size:
                    gf = pd.DataFrame({"d": trow[starts], "k": key[starts], "j": starts})
                    c5 = gf.groupby(["d", "k"], sort=False)["j"].transform("size").to_numpy()
                    dupj = gf["j"].to_numpy(np.int64)[c5 > 1]
                    if dupj.size:
                        diff = np.zeros(nt + W, dtype=np.int64)
                        np.add.at(diff, dupj, 1)
                        np.add.at(diff, dupj + W, -1)
                        covered = np.cumsum(diff[:nt]) > 0
                        cmass = np.zeros(n, dtype=np.int64)
                        np.add.at(cmass, trow[covered], tlen[covered])
                        with np.errstate(divide="ignore", invalid="ignore"):
                            d5g = np.where(tchars > 0, cmass / np.maximum(tchars, 1), 0.0)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "dup_line_frac": np.round(dl, 8),
                "dup_line_char_frac": np.round(dlc, 8),
                "top_bigram_char_frac": np.round(tbc, 8),
                "dup_5gram_char_frac": np.round(d5g, 8),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow"
    )


def winnow_fingerprints(
    ds: ray.data.Dataset,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """MOSS winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 §4): hash every k-char window (hashing.batch_shingle_hashes —
    one vectorized pass per batch), then every window of w consecutive
    hashes selects its RIGHTMOST minimal hash; the DISTINCT selected
    (pos, hash) pairs are the doc's fingerprints.  Guarantee: any substring
    match of length >= w + k - 1 shares a fingerprint, nothing shorter than
    k does; expected density 2/(w+1) — the exchange payload is ~w/2-fold
    smaller than shipping every window hash (the local-algorithm property
    that makes winnowing the right fingerprint at corpus scale).

    Stateless map_batches; docs with fewer than w hashes form one window of
    all their hashes; empty texts are skipped (no fingerprint), matching
    the SQL oracle's length(text) > 0 base.  Output: (doc_id, pos,
    fingerprint int64-wrapped)."""
    from graphscope_ray.functions.hashing import batch_shingle_hashes

    def _block(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [i for i, x in enumerate(texts) if x]
        texts = [texts[i] for i in keep]
        ids = ids[keep]
        out_doc, out_pos, out_h = [], [], []
        if texts:
            sh, bounds, _ = batch_shingle_hashes(texts, k)
            counts = np.diff(bounds)
            long = np.flatnonzero(counts >= w)
            if long.size:
                # one global sliding window over the concatenated hash
                # stream; valid starts stay inside a single doc
                Wv = np.lib.stride_tricks.sliding_window_view(sh, w)
                wc = counts[long] - w + 1
                intra = np.arange(int(wc.sum()), dtype=np.int64) - np.repeat(
                    np.concatenate([[0], np.cumsum(wc)])[:-1], wc
                )
                starts = np.repeat(bounds[:-1][long], wc) + intra
                # rightmost argmin: first min of the reversed window
                rpos = (w - 1) - np.argmin(Wv[starts][:, ::-1], axis=1)
                sel = np.unique(starts + rpos)  # global idx == (doc, pos)
                didx = np.searchsorted(bounds, sel, side="right") - 1
                out_doc.append(ids[didx])
                out_pos.append(sel - bounds[didx])
                out_h.append(sh[sel])
            for i in np.flatnonzero(counts < w):  # rare: < w hashes
                seg = sh[bounds[i] : bounds[i + 1]]
                p = len(seg) - 1 - int(np.argmin(seg[::-1]))
                out_doc.append(ids[i : i + 1])
                out_pos.append(np.array([p], dtype=np.int64))
                out_h.append(seg[p : p + 1])
        if not out_doc:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fingerprint": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_doc)),
                "pos": pa.array(np.concatenate(out_pos).astype(np.int64)),
                "fingerprint": pa.array(
                    np.concatenate(out_h).astype(np.uint64).view(np.int64)
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _block, batch_format="pyarrow"
    )


_C4_TERMINAL = re.compile(r'[.!?"]$')
_C4_WORD = re.compile(r"\S+")


def c4_clean(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2, the public
    Common-Crawl curation rules): keep only lines that (a) end in a terminal
    punctuation mark (. ! ? \"), (b) contain ≥ 3 words, and (c) do not
    contain the word "javascript"; a document is kept (keep_doc=1) iff it
    retains ≥ 3 lines AND mentions neither "lorem ipsum" nor a curly brace.
    One row per doc: (doc_id, keep_doc, n_lines, n_kept, clean_text) —
    clean_text is the kept lines re-joined with newlines (reported for
    dropped docs too, so the filter decision is auditable).

    Stateless map_batches; the per-line predicates run on the FLATTENED
    line array (one split + vectorized regex per batch), only the final
    per-doc join is a pandas groupby-agg."""

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("")
        lines = texts.str.split("\n")
        n_lines = lines.str.len().astype(np.int64)
        flat = lines.explode()
        doc_idx = flat.index.to_numpy()
        t = flat.fillna("").str.strip(" \t\r")
        words = t.str.count(_C4_WORD.pattern)
        kept_mask = (
            t.str.contains(_C4_TERMINAL.pattern, regex=True)
            & (words >= 3)
            & ~t.str.lower().str.contains("javascript", regex=False)
        ).to_numpy()
        kept = pd.Series(t.to_numpy()[kept_mask], index=doc_idx[kept_mask])
        joined = kept.groupby(level=0).agg("\n".join)
        n_kept = kept.groupby(level=0).size()
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_lines": n_lines.to_numpy(),
            },
            index=df.index,
        )
        out["n_kept"] = n_kept.reindex(df.index, fill_value=0).astype(np.int64)
        out["clean_text"] = joined.reindex(df.index, fill_value="")
        low = texts.str.lower()
        out["keep_doc"] = (
            (out["n_kept"] >= 3)
            & ~low.str.contains("lorem ipsum", regex=False)
            & ~texts.str.contains("{", regex=False)
        ).astype(np.int64)
        return out[["doc_id", "keep_doc", "n_lines", "n_kept", "clean_text"]]

    return ds.select_columns(["doc_id", text_col]).map_batches(_f, batch_format="pandas")
