"""Property-based (hypothesis) tests of the pure-numpy kernels the engine's
correctness rests on — the SURVEY §5 fuzzing leg.  No Ray: these kernels run
inside map_batches/actors; here they are driven directly with adversarial
inputs that the fixture corpora never produce (empty rows, single bytes,
64-boundary sizes, negative keys, duplicate-heavy lists)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graphscope_ray.functions.hashing import shingle_hashes
from graphscope_ray.graph.fragment import (
    _delta_decode_rows,
    _delta_encode_rows,
    _varint_decode,
    _varint_encode,
)
from graphscope_ray.graph.phash import MinimalPerfectHash, _popcount64

I64 = st.integers(min_value=-(2**62), max_value=2**62 - 1)
U63 = st.integers(min_value=0, max_value=2**62 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=300))
def test_mphf_is_bijection_on_any_key_set(keys):
    arr = np.unique(np.array(keys, dtype=np.int64))
    mph = MinimalPerfectHash.build(arr)
    assert np.array_equal(np.sort(mph.lookup(arr)), np.arange(len(arr)))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=64))
def test_popcount64_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    want = np.array([bin(int(v)).count("1") for v in vals], dtype=np.uint64)
    assert np.array_equal(_popcount64(arr), want)


@settings(max_examples=200, deadline=None)
@given(st.lists(U63, max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    blob = _varint_encode(arr)
    assert np.array_equal(_varint_decode(blob, len(arr)), arr)
    # LEB128 width property: v < 2^(7m) encodes in ≤ m bytes
    if len(arr):
        widths = np.maximum(1, np.ceil(np.log2(arr.astype(np.float64) + 2) / 7))
        assert len(blob) <= int(widths.sum()) + len(arr)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(U63, max_size=30), max_size=20))
def test_delta_rows_roundtrip(rows):
    rows = [np.sort(np.array(r, dtype=np.int64)) for r in rows]
    vals = np.concatenate(rows) if rows else np.empty(0, np.int64)
    indptr = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    delta = _delta_encode_rows(vals.copy(), indptr)
    assert np.array_equal(_delta_decode_rows(delta, indptr), vals)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(min_value=1, max_value=8))
def test_shingle_hashes_match_naive(data, k):
    got = shingle_hashes(data, k)
    # naive reference: hash of each k-window is position-independent, so
    # equal windows ANYWHERE (and across documents) must collide exactly
    n = len(data)
    if n <= k:
        assert got.shape == (1,)
        return
    assert got.shape == (n - k + 1,)
    wins = [data[i : i + k] for i in range(n - k + 1)]
    for i in range(len(wins)):
        for j in range(i + 1, len(wins)):
            if wins[i] == wins[j]:
                assert got[i] == got[j]
            elif got[i] == got[j]:
                raise AssertionError(f"hash collision on distinct windows {i},{j}")


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(max_size=40), max_size=8),
    st.integers(min_value=1, max_value=8),
)
def test_batch_shingle_hashes_bit_identical_per_doc(texts, k):
    from graphscope_ray.functions.hashing import batch_shingle_hashes

    out, bounds, blens = batch_shingle_hashes(texts, k)
    assert len(bounds) == len(texts) + 1
    for i, t in enumerate(texts):
        enc = t.encode("utf-8", "surrogatepass")
        assert blens[i] == len(enc)
        assert np.array_equal(out[bounds[i] : bounds[i + 1]], shingle_hashes(enc, k))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=30), min_size=0, max_size=12),
    st.integers(min_value=2, max_value=8),
)
def test_substring_windows_match_naive(texts, k):
    """Per-doc duplicated-window counts from the prefix/rolling-hash pipeline
    kernel semantics == a naive Python substring count (tiny alphabet forces
    heavy duplication; short docs exercise the n<=k whole-text branch)."""
    from collections import Counter

    from graphscope_ray.functions.hashing import shingle_hashes

    # naive: literal substrings
    occ = Counter()
    per_doc = []
    for t in texts:
        b = t.encode()
        if not b:
            per_doc.append([])
            continue
        L = min(k, len(b))
        wins = [b[i : i + L] for i in range(len(b) - L + 1)]
        per_doc.append(wins)
        occ.update(wins)
    for t, wins in zip(texts, per_doc):
        b = t.encode()
        if not b:
            continue
        # hash-kernel unique counts must mirror literal-substring counts
        u, c = np.unique(shingle_hashes(b, k), return_counts=True)
        lit = Counter(wins)
        assert sorted(c.tolist()) == sorted(lit.values())
    # cross-doc: global hash-value totals mirror global literal totals
    # (injective on these inputs => identical duplicate classification)
    all_hashes = Counter()
    for t in texts:
        b = t.encode()
        if b:
            all_hashes.update(shingle_hashes(b, k).tolist())
    assert sorted(all_hashes.values()) == sorted(occ.values())
