"""gopher_repetition vs a pure-python per-doc oracle on adversarial texts."""

from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from graphscope_ray.functions.text import gopher_repetition

DOCS = [
    "a b c\na b c\nx y z",          # one duplicated line
    "same\nsame\nsame\nsame",        # all lines identical
    "unique one\nunique two",        # no duplication
    "",                              # empty doc
    "t t t t t",                     # one token repeated → one dominant bigram
    "a b a b a b c",                 # 'a b' vs 'b a' tie-breaking territory
    "x  y",                          # double space → empty middle token
    "single",                        # one token → no bigram
    "\n\n",                          # only empty lines (duplicated)
    "ab cd ab cd zz qq ab cd",       # clear top bigram 'ab cd'
    "a b c d e f a b c d e f",       # dup 5-grams with overlapping coverage
    "p q r s t u v w x",             # 5-grams present, none duplicated
    "m m m m m m m m",               # one repeated token → all covered
]


def _oracle(text):
    lines = text.split("\n")
    lc = Counter(lines)
    nl = len(lines)
    nd = sum(c - 1 for c in lc.values())
    ch = sum(len(ln) * c for ln, c in lc.items())
    chd = sum(len(ln) * (c - 1) for ln, c in lc.items())
    dup_line = nd / nl if nl else 0.0
    dup_char = chd / ch if ch else 0.0
    toks = text.split(" ")
    tc = sum(len(t) for t in toks)
    bg = Counter(zip(toks, toks[1:]))
    top = 0.0
    if bg and tc:
        (w1, w2), n = min(bg.items(), key=lambda kv: (-kv[1], kv[0]))
        top = n * (len(w1) + len(w2)) / tc
    g5 = Counter(tuple(toks[i : i + 5]) for i in range(len(toks) - 4))
    covered = set()
    for i in range(len(toks) - 4):
        if g5[tuple(toks[i : i + 5])] > 1:
            covered.update(range(i, i + 5))
    d5 = sum(len(toks[i]) for i in covered) / tc if tc else 0.0
    return round(dup_line, 8), round(dup_char, 8), round(top, 8), round(d5, 8)


@pytest.mark.parametrize("P", [1, 3])
def test_decontaminate_vs_python(P):
    from graphscope_ray.functions.dedup import decontaminate_ngram

    base = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    train = [
        base + " extra tail tokens here",        # shares 8-grams with test 0
        "completely different text with no overlap at all whatsoever okay",
        "a b c d e f g h i j",                  # shares with test 1
        "short doc",                             # < 8 tokens → never flagged
    ]
    test = [base, "z z a b c d e f g h i j z z"]

    def tbl(docs, ids):
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)}
        )

    tr = ray.data.from_arrow(tbl(train, [1, 2, 3, 4])).repartition(P)
    te = ray.data.from_arrow(tbl(test, [10, 20])).repartition(P)
    got = decontaminate_ngram(tr, te, n=8).to_pandas()
    mine = dict(zip(got["doc_id"].tolist(), got["n_contaminated"].tolist()))

    def grams(s, n=8):
        t = s.split(" ")
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    test_g = set()
    for s in test:
        test_g |= grams(s)
    want = {}
    for i, s in zip([1, 2, 3, 4], train):
        c = len(grams(s) & test_g)
        if c:
            want[i] = c
    assert mine == want
    assert 1 in want and 3 in want and 2 not in want and 4 not in want


@pytest.mark.parametrize("P", [1, 3])
def test_pii_scan_vs_python_and_duckdb(P):
    import re

    import duckdb

    from graphscope_ray.functions.text import PII_COUNT_PATTERNS, pii_scan

    docs = [
        "contact alice@example.com or bob.smith+tag@mail.co.uk today",
        "call +1 (555) 123-4567 or 555 867 5309 now",
        "server at 192.168.0.1 and 10.0.0.255, also 999.999.999.999",
        "no pii here at all",
        "a@b.cd x@y.z 1.2.3.4",  # x@y.z TLD too short → not an email
        "",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}
    )
    got = (
        pii_scan(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python-re oracle
    for i, d in enumerate(docs):
        for name, pat in PII_COUNT_PATTERNS.items():
            want = len(re.findall(pat, d))
            assert int(got.loc[i, name]) == want, (i, name, d)
    # the engine's counts must ALSO match DuckDB's RE2 on the same docs
    # (validates the alternation-free leftmost-agreement claim in the oracle)
    con = duckdb.connect()
    con.register("documents", t)
    from graphscope_ray.pipelines.oracle_sql import text_pii_sql

    ddf = con.execute(text_pii_sql()).df()
    for name in PII_COUNT_PATTERNS:
        assert (ddf[name].to_numpy() == got[name].to_numpy()).all(), name
    # sanity: the fixture exercises every pattern
    assert got["n_emails"].sum() >= 3
    assert got["n_phones"].sum() >= 2
    assert got["n_ips"].sum() >= 3


@pytest.mark.parametrize("P", [1, 3])
def test_pii_redact_vs_python_and_duckdb(P):
    import re

    import duckdb

    from graphscope_ray.functions.text import (
        PII_COUNT_PATTERNS,
        PII_PLACEHOLDERS,
        pii_redact,
    )

    docs = [
        "mail alice@example.com from 10.0.0.1 and call +1 (555) 123-4567",
        "nothing sensitive",
        "a@b.cd then 1.2.3.4 then a@b.cd again",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}
    )
    got = (
        pii_redact(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, d in enumerate(docs):
        want = d
        for name, pat in PII_COUNT_PATTERNS.items():
            want = re.sub(pat, PII_PLACEHOLDERS[name], want)
        assert got.loc[i, "text_redacted"] == want, (i, got.loc[i, "text_redacted"], want)
    con = duckdb.connect()
    con.register("documents", t)
    from graphscope_ray.pipelines.oracle_sql import text_redact_sql

    ddf = con.execute(text_redact_sql()).df()
    assert (ddf["text_redacted"].to_numpy() == got["text_redacted"].to_numpy()).all()
    assert "<EMAIL>" in got.loc[0, "text_redacted"]
    assert "<IP>" in got.loc[0, "text_redacted"]
    assert "<PHONE>" in got.loc[0, "text_redacted"]


@pytest.mark.parametrize("P", [1, 3])
def test_keep_best_dedup(P):
    from graphscope_ray.functions.dedup import keep_best_dedup

    docs = [
        (1, "Hello, World! This is DOC one."),     # normalizes same as 2,3
        (2, "hello world this is doc one"),         # shortest variant
        (3, "HELLO  WORLD -- this is doc ONE!!!"),  # longest variant → winner
        (4, "a completely different document"),
        (5, "tie a"),                                # same norm + same len as 6
        (6, "tie a"),                                # → min id 5 wins
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    got = (
        keep_best_dedup(ray.data.from_arrow(t).repartition(P), num_partitions=P)
        .to_pandas()
        .sort_values("kept_doc_id")
        .reset_index(drop=True)
    )
    kept = dict(zip(got["kept_doc_id"].tolist(), got["n_copies"].tolist()))
    assert kept == {3: 3, 4: 1, 5: 2}
    q = dict(zip(got["kept_doc_id"].tolist(), got["quality"].tolist()))
    assert q[3] == len(docs[2][1])


@pytest.mark.parametrize("P", [1, 3])
def test_readability_vs_python(P):
    import re

    from graphscope_ray.functions.text import readability

    docs = [
        "The cat sat on the mat. It was happy!",
        "Extraordinarily complicated terminology notwithstanding, comprehension persists.",
        "no sentence terminator here",
        "",
        "Hi! Go. Run? Yes!!",
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}
    )
    got = (
        readability(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, d in enumerate(docs):
        w = len(re.findall(r"\S+", d))
        s = len(re.findall(r"[.!?]+", d))
        y = len(re.findall(r"[aeiouyAEIOUY]+", d))
        assert int(got.loc[i, "n_words"]) == w
        assert int(got.loc[i, "n_sentences"]) == s
        assert int(got.loc[i, "n_syllables"]) == y
        if w and s:
            ease = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
            grade = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
        else:
            ease = grade = 0.0
        assert abs(got.loc[i, "flesch_ease"] - round(ease, 8)) < 1e-9
        assert abs(got.loc[i, "fk_grade"] - round(grade, 8)) < 1e-9
    # the hard-vocabulary doc reads as harder than the easy one
    assert got.loc[1, "fk_grade"] > got.loc[0, "fk_grade"]


@pytest.mark.parametrize("P", [1, 3])
def test_gopher_vs_python_oracle(P):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS),
        }
    )
    ds = ray.data.from_arrow(t).repartition(P)
    got = gopher_repetition(ds).to_pandas().sort_values("doc_id")
    for _, r in got.iterrows():
        want = _oracle(DOCS[int(r["doc_id"])])
        assert abs(r["dup_line_frac"] - want[0]) < 1e-9, (r["doc_id"], "line")
        assert abs(r["dup_line_char_frac"] - want[1]) < 1e-9, (r["doc_id"], "char")
        assert abs(r["top_bigram_char_frac"] - want[2]) < 1e-9, (r["doc_id"], "bg")
        assert abs(r["dup_5gram_char_frac"] - want[3]) < 1e-9, (r["doc_id"], "5g")
    assert len(got) == len(DOCS)
