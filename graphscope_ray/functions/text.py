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
        toks = batch["text"].str.lower().str.findall(self.word)

        def best(ws):
            if not ws:
                return "unknown", 0.0
            scores = {
                lang: sum(w in prof for w in ws) / len(ws)
                for lang, prof in self.PROFILES.items()
            }
            lang, sc = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return (lang, sc) if sc > 0.05 else ("unknown", sc)

        res = toks.map(best)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": res.map(lambda t: t[0]),
                "lang_score": res.map(lambda t: t[1]),
            }
        )


def lang_id(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )


class Fingerprinter:
    """Rolling polynomial hash document fingerprint (64-bit), deterministic.
    fp = Σ hash(token_i)·B^(n-1-i) mod 2^61-1 over whitespace tokens."""

    MOD = (1 << 61) - 1
    B = 1_000_003

    def __init__(self):
        self.tok = re.compile(r"\S+")

    def _fp(self, s: str) -> int:
        h = 0
        for t in self.tok.findall(s):
            th = hash_str64(t)
            h = (h * self.B + th) % self.MOD
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": batch["text"].map(self._fp).astype("int64"),
            }
        )


def hash_str64(s: str) -> int:
    """Stable 61-bit string hash (FNV-1a variant, no PYTHONHASHSEED)."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % ((1 << 61) - 1)


def fingerprints(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.select_columns(["doc_id", "text"]).map_batches(
        Fingerprinter, batch_format="pandas", batch_size=2048, concurrency=concurrency
    )
