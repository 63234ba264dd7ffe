"""DSIR importance resampling (functions/dsir.py) against an independent
single-process reference: Counter-based feature counts, dict-lookup scoring,
plain-sorted top-k.  The weight table itself comes from the module's
DuckDB-evaluated quantizer on both sides (that function IS the spec — the
distributed machinery around it is what these tests exercise)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from graphscope_ray.functions.dsir import (
    doc_feature_occurrences,
    dsir_select,
    quantized_log_ratios,
)
from graphscope_ray.functions.hashing import (
    batch_token_hashes,
    bigram_hashes,
    mix64,
    token_hashes,
)

_B = np.uint64(1099511628211)


def test_bigram_hashes_matches_per_doc_loop():
    texts = ["a b c d", "", "x", "hello world hello", "one  two\tthree\nfour"]
    th, tb = batch_token_hashes(texts)
    bh, bb = bigram_hashes(th, tb)
    assert len(bb) == len(tb)
    for i, t in enumerate(texts):
        h = token_hashes(t.encode())
        if len(h) < 2:
            exp = np.empty(0, dtype=np.uint64)
        else:
            with np.errstate(over="ignore"):
                exp = mix64(h[:-1] * _B + h[1:])
        got = bh[bb[i] : bb[i + 1]]
        assert np.array_equal(got, exp), (i, t)


def test_quantized_log_ratios_basics():
    t = np.array([0, 5, 100, 0], dtype=np.int64)
    r = np.array([0, 5, 1, 1000], dtype=np.int64)
    s = quantized_log_ratios(t, r)
    assert s[0] == 0 and s[1] == 0  # t == r → ln 1 → 0
    assert s[2] > 0 and s[3] < 0
    # round(1e6·ln(101/2)) — independent arithmetic check at a value far
    # from any rounding boundary
    assert abs(s[2] - round(1e6 * np.log(101 / 2))) <= 1


def _reference_dsir(df: pd.DataFrame, k: int, n_buckets: int) -> pd.DataFrame:
    """Independent single-process reference implementation."""
    from collections import Counter

    feats = {}
    for row in df.itertuples():
        f, doc = doc_feature_occurrences([row.text], n_buckets)
        feats[row.doc_id] = f.tolist()
    cnt_t, cnt_r = Counter(), Counter()
    for row in df.itertuples():
        for f in feats[row.doc_id]:
            cnt_r[f] += 1
            if row.lang == "en":
                cnt_t[f] += 1
    t_arr = np.zeros(n_buckets, dtype=np.int64)
    r_arr = np.zeros(n_buckets, dtype=np.int64)
    for f, c in cnt_t.items():
        t_arr[f] = c
    for f, c in cnt_r.items():
        r_arr[f] = c
    s = quantized_log_ratios(t_arr, r_arr)
    rows = []
    for row in df.itertuples():
        rows.append((row.doc_id, int(sum(int(s[f]) for f in feats[row.doc_id]))))
    rows.sort(key=lambda x: (-x[1], x[0]))
    out = pd.DataFrame(rows[:k], columns=["doc_id", "weight"])
    return out.sort_values("doc_id").reset_index(drop=True)


@pytest.mark.parametrize("k", [5, 17])
def test_dsir_select_matches_reference(k):
    rng = np.random.RandomState(7)
    en_words = ["the", "of", "model", "data", "training", "scale", "graph"]
    de_words = ["der", "und", "daten", "modell", "graph", "skala"]
    rows = []
    for i in range(60):
        lang = "en" if i % 3 else "de"
        words = en_words if lang == "en" else de_words
        n = rng.randint(0, 12)
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(words, n)) if n else "",
                "lang": lang,
            }
        )
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df).repartition(5)
    got = dsir_select(
        ds, target_col="lang", target_val="en", k=k, n_buckets=512,
        num_partitions=3,
    )
    exp = _reference_dsir(df, k, 512)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "weight": np.int64}),
        exp.astype({"doc_id": np.int64, "weight": np.int64}),
    )


def test_dsir_empty_and_all_target():
    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["", "  "], "lang": ["en", "en"]}
    )
    out = dsir_select(
        ray.data.from_pandas(df), target_col="lang", target_val="en", k=5,
        n_buckets=64,
    )
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["weight"]) == [0, 0]
