"""Distributed BPE training (functions/bpe.py) vs a pure-python reference
of the classic Sennrich merge-learning loop."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.functions import bpe


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def _ref_bpe(texts, num_merges, end="</w>"):
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(list(w) + [end])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        bestc = max(pairs.values())
        if bestc < 2:
            break
        best = min(p for p, c in pairs.items() if c == bestc)
        merges.append(best)
        newv = Counter()
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            newv[tuple(out)] += f
        vocab = newv
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low newer lowest news new",
]


def test_train_bpe_matches_reference():
    want, _ = _ref_bpe(TEXTS, 12)
    got = bpe.train_bpe(_docs(TEXTS), num_merges=12)
    assert got == want, (got, want)


def test_train_bpe_partition_invariance():
    a = bpe.train_bpe(_docs(TEXTS), num_merges=8, num_partitions=1)
    b = bpe.train_bpe(_docs(TEXTS).repartition(5), num_merges=8, num_partitions=4)
    assert a == b


def test_bpe_segment_counts_match_reference():
    merges, vocab = _ref_bpe(TEXTS, 10)
    # reference per-word segment lengths from the final vocab state
    wlen = {"".join(s).replace("</w>", ""): len(s) for s in vocab}
    want = [sum(wlen[w] for w in t.split()) for t in TEXTS]
    out = (
        bpe.bpe_segment(_docs(TEXTS), merges)
        .to_pandas()
        .sort_values("doc_id")["n_bpe_tokens"]
        .tolist()
    )
    assert out == want, (out, want)


def test_train_bpe_stops_when_no_repeats():
    # every pair unique -> best count 1 -> stop immediately
    got = bpe.train_bpe(_docs(["abcd"]), num_merges=5)
    assert got == []
