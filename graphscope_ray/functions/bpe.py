"""Distributed BPE tokenizer-vocabulary training (Sennrich et al. 2016,
arXiv:1508.07909) — the training-data-pipeline op that learns the merge
table itself, complementing text.token_counts_bpe which only counts with a
FIXED pre-tokenizer.

Shape: the corpus collapses ONCE into a (word, freq) table via the
hash-exchange groupby (the only corpus-sized pass); every merge round then
scans just the distinct-word table with the current merge list broadcast,
emits per-block (left, right, weighted-count) partials, and a tiny argmax
fold picks the round's winner (count desc, pair lexicographically asc —
fully deterministic).  The reference engine has no tokenizer training; the
distinct-word collapse is the same first step its LPA/TF-IDF pipelines
use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _apply_merges(symbols: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to a symbol sequence, lowest rank first — the
    standard greedy BPE segmentation (identical to the reference
    implementations' `get_pairs` + min-rank loop)."""
    while len(symbols) > 1:
        pairs = [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        # merge every non-overlapping occurrence of the best-ranked pair,
        # left to right
        target = None
        for p in pairs:
            if ranks.get(p) == best_rank:
                target = p
                break
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if (
                i < len(symbols) - 1
                and (symbols[i], symbols[i + 1]) == target
            ):
                out.append(symbols[i] + symbols[i + 1])
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def word_freqs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(word, freq) over whitespace tokens — the one corpus-sized pass."""
    from graphscope_ray.utils import hash_groupby_sum

    def _words(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for x in t[text_col].to_pylist():
            toks.extend((x or "").split())
        return pa.table({"word": pa.array(toks, pa.string())})

    tok = ds.select_columns([text_col]).map_batches(_words, batch_format="pyarrow")
    return hash_groupby_sum(tok, ["word"], None, "freq", num_partitions=num_partitions)


def train_bpe(
    ds: ray.data.Dataset,
    num_merges: int = 8,
    text_col: str = "text",
    end_of_word: str = "</w>",
    num_partitions: int = 16,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.  Each round
    broadcasts the merge list learned so far, re-segments the DISTINCT
    words (not the corpus), counts adjacent symbol pairs weighted by word
    frequency, and picks the global argmax with the deterministic
    tie-break (max count, then lexicographically smallest (left, right)).

    Driver state: the merge list (num_merges tuples) and one (pair, count)
    candidate per reduce partition per round — never the vocabulary."""
    import ray

    from graphscope_ray.utils import hash_groupby_sum

    vocab = word_freqs(ds, text_col=text_col, num_partitions=num_partitions).materialize()
    merges: list[tuple[str, str]] = []

    for _round in range(num_merges):
        ranks = {p: i for i, p in enumerate(merges)}
        ref = ray.put(ranks)

        def _pairs(t: pa.Table) -> pa.Table:
            rk = ray.get(ref)
            cnt: dict[tuple[str, str], int] = {}
            words = t["word"].to_pylist()
            freqs = t["freq"].to_numpy(zero_copy_only=False)
            for w, f in zip(words, freqs):
                syms = list(w) + [end_of_word]
                syms = _apply_merges(syms, rk)
                for i in range(len(syms) - 1):
                    key = (syms[i], syms[i + 1])
                    cnt[key] = cnt.get(key, 0) + int(f)
            if not cnt:
                return pa.table(
                    {
                        "l": pa.array([], pa.string()),
                        "r": pa.array([], pa.string()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            ls, rs = zip(*cnt.keys())
            return pa.table(
                {
                    "l": pa.array(ls, pa.string()),
                    "r": pa.array(rs, pa.string()),
                    "c": pa.array(list(cnt.values()), pa.int64()),
                }
            )

        counts = hash_groupby_sum(
            vocab.map_batches(_pairs, batch_format="pyarrow"),
            ["l", "r"],
            "c",
            "total",
            num_partitions=num_partitions,
        )

        def _argmax(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "total" not in t.column_names:
                return pa.table(
                    {
                        "l": pa.array([], pa.string()),
                        "r": pa.array([], pa.string()),
                        "total": pa.array([], pa.int64()),
                    }
                )
            df = t.to_pandas().sort_values(
                ["total", "l", "r"], ascending=[False, True, True], kind="stable"
            )
            return pa.Table.from_pandas(df.head(1), preserve_index=False)

        cands = counts.map_batches(_argmax, batch_format="pyarrow").to_pandas()
        if cands.empty:
            break
        cands = cands.sort_values(
            ["total", "l", "r"], ascending=[False, True, True], kind="stable"
        )
        best = cands.iloc[0]
        if int(best["total"]) < 2:
            break  # nothing left worth merging
        merges.append((str(best["l"]), str(best["r"])))
    return merges


def bpe_segment(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    end_of_word: str = "</w>",
) -> ray.data.Dataset:
    """Apply a learned merge table: per-doc BPE token count + the joined
    segmentation of the first word (debug/inspection column).  The merge
    table broadcasts once; segmentation memoizes per distinct word within
    each batch."""
    import ray

    ranks = {p: i for i, p in enumerate(merges)}
    ref = ray.put(ranks)

    def _seg(t: pa.Table) -> pa.Table:
        rk = ray.get(ref)
        memo: dict[str, int] = {}
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out = np.zeros(len(ids), dtype=np.int64)
        for j, x in enumerate(t[text_col].to_pylist()):
            n = 0
            for w in (x or "").split():
                if w not in memo:
                    memo[w] = len(_apply_merges(list(w) + [end_of_word], rk))
                n += memo[w]
            out[j] = n
        return pa.table({id_col: pa.array(ids, pa.int64()), "n_bpe_tokens": out})

    return ds.select_columns([id_col, text_col]).map_batches(
        _seg, batch_format="pyarrow"
    )
