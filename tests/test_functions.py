"""Training-data ops: text analysis, dedup family, similarity search,
multimodal plumbing, windows — engine vs plain-python/pandas oracles."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from graphscope_ray.functions import dedup, multimodal, similarity, text, windows


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def test_token_counts_and_stats():
    ds = _docs(["hello world", "  a  b\tc ", "", "one"])
    out = text.token_counts(ds).to_pandas().sort_values("doc_id")
    assert out.n_tokens.tolist() == [2, 3, 0, 1]
    st = text.text_stats(ds).to_pandas().sort_values("doc_id")
    assert st.n_chars.tolist() == [11, 9, 0, 3]
    assert st.n_alpha.tolist() == [10, 3, 0, 3]


def test_quality_and_langid():
    ds = _docs(["the cat and the dog sat on the mat " * 5, "123 456 789 000", ""])
    q = text.quality_score(ds).to_pandas().sort_values("doc_id")
    assert q.quality.iloc[0] > q.quality.iloc[1] > 0.0 or q.quality.iloc[1] >= 0
    lid = text.lang_id(ds).to_pandas().sort_values("doc_id")
    assert lid.lang_pred.iloc[0] == "en"
    assert lid.lang_pred.iloc[2] == "unknown"


def test_fingerprint_deterministic():
    ds = _docs(["alpha beta gamma", "alpha beta gamma", "different text"])
    fp = text.fingerprints(ds).to_pandas().sort_values("doc_id")
    assert fp.fingerprint.iloc[0] == fp.fingerprint.iloc[1]
    assert fp.fingerprint.iloc[0] != fp.fingerprint.iloc[2]


def test_exact_dedup():
    ds = _docs(["aaa", "bbb", "aaa", "ccc", "bbb"], ids=[5, 1, 3, 2, 0])
    out = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
    # winners: min id per distinct text → aaa→3, bbb→0, ccc→2
    assert sorted(out.doc_id.tolist()) == [0, 2, 3]
    sha = hashlib.sha256(b"aaa").hexdigest()
    assert sha in set(out.text_sha256)


def test_minhash_clusters_find_near_dups():
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated content about graph engines " * 8
    ds = _docs([base, near, far, base + " tail"], ids=[0, 1, 2, 3])
    out = dedup.minhash_dedup_clusters(ds, threshold=0.6, num_partitions=2).to_pandas()
    c = dict(zip(out.doc_id, out.cluster))
    assert c[0] == c[1] == c[3]  # near-dups clustered together
    assert c[2] == 2  # singleton keeps itself


def test_repetition_stats():
    rep = "spam ham " * 20  # one dominant 2-gram
    clean = " ".join(f"uniq{i:03d}w" for i in range(30))  # all distinct words
    ds = _docs([rep.strip(), clean, "tiny", ""])
    out = text.repetition_stats(ds).to_pandas().sort_values("doc_id")
    # "spam ham" occurs 20× (len 8) → 160 chars > "ham spam" 19×8=152
    assert out.top2_chars.iloc[0] == 160
    assert out.repetitive.tolist() == [True, False, False, False]
    # clean doc: every 2-gram unique → top2 = single 2-gram length (8+1+8)
    assert out.top2_chars.iloc[1] == 17
    assert out.dup5_chars.iloc[1] == 0
    # fewer tokens than n → zero
    assert out.top2_chars.iloc[2] == 0 and out.n_chars.iloc[2] == 4


def test_split_by_content_keeps_dups_together():
    from graphscope_ray.functions.sampling import hash_split
    from graphscope_ray.functions.text import fingerprints

    texts = [f"doc number {i} content" for i in range(40)]
    # plant exact dups far apart in id space
    texts[37] = texts[2]
    texts[23] = texts[5]
    ds = _docs(texts)
    out = hash_split(fingerprints(ds), key="fingerprint", weights=(800, 100, 100), salt=7)
    df = out.to_pandas().set_index("doc_id")
    assert df.loc[2, "split"] == df.loc[37, "split"]
    assert df.loc[5, "split"] == df.loc[23, "split"]
    assert set(df["split"]) <= {0, 1, 2}


def test_pii_scrub():
    ds = _docs(
        [
            "mail a@b.co and x.y+z@host.org ok",
            "ip 10.0.0.1 and phone 415-555-0123 end",
            "nothing sensitive here",
        ]
    )
    out = text.pii_scrub(ds).to_pandas().sort_values("doc_id")
    assert out.n_email.tolist() == [2, 0, 0]
    assert out.n_ip.tolist() == [0, 1, 0]
    assert out.n_phone.tolist() == [0, 1, 0]
    assert out.clean_text.iloc[0] == "mail <EMAIL> and <EMAIL> ok"
    assert out.clean_text.iloc[1] == "ip <IP> and phone <PHONE> end"
    assert out.clean_text.iloc[2] == "nothing sensitive here"


def test_decontaminate():
    eval_texts = ["the secret benchmark answer is forty-two"]
    train = _docs(
        [
            "the secret benchmark answer is forty-two, verbatim leak",  # contains eval 8-grams
            "totally clean document about graph processing engines",
            "short",  # < k chars: never contaminated
            "",
        ]
    )
    ev = _docs(eval_texts, ids=[100])
    out = dedup.decontaminate(train, ev, k=8).to_pandas().sort_values("doc_id")
    assert out.contaminated.tolist() == [True, False, False, False]
    # leak doc shares many distinct 8-grams; clean docs share zero
    assert out.n_hits.iloc[0] > 10
    assert out.n_hits.iloc[1:].tolist() == [0, 0, 0]


def test_simhash_candidates():
    base = "one two three four five six seven eight nine ten " * 4
    ds = _docs([base, base.replace("ten", "eleven"), "zzz completely different yyy xxx"])
    sig = dedup.simhash_signatures(ds)
    cand = dedup.simhash_candidates(sig).to_pandas()
    pairs = set(map(tuple, cand[["a", "b"]].values.tolist()))
    assert (0, 1) in pairs


def test_embedding_near_dups_and_topk():
    rng = np.random.RandomState(0)
    M = rng.randn(50, 16)
    M[7] = M[3] + 1e-3 * rng.randn(16)  # planted near-dup
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(50, dtype=np.int64)),
                "embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float64())),
            }
        )
    )
    nd = dedup.embedding_near_dups(emb, threshold=0.999).to_pandas()
    assert (3, 7) in set(map(tuple, nd[["a", "b"]].values.tolist()))

    out = similarity.topk_cosine(emb, M[:3], np.arange(3), k=5).to_pandas()
    # exact: top hit for each query is itself
    top = out.sort_values(["query_id", "score"], ascending=[True, False]).groupby("query_id").head(1)
    assert top.vec_id.tolist() == [0, 1, 2]
    # brute-force oracle for query 0
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    want = set(np.argsort(-(Mn @ Mn[0]))[:5].tolist())
    got = set(out[out.query_id == 0].vec_id.tolist())
    assert got == want


def test_ivf_topk_recall():
    rng = np.random.RandomState(1)
    M = rng.randn(300, 8)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float64())),
            }
        )
    )
    out = similarity.ivf_topk(emb, M[:5], np.arange(5), k=10, n_clusters=8, nprobe=4).to_pandas()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    hits = 0
    for q in range(5):
        want = set(np.argsort(-(Mn @ Mn[q]))[:10].tolist())
        got = set(out[out.query_id == q].vec_id.tolist())
        hits += len(want & got)
    assert hits / 50 >= 0.6  # approximate search: decent recall with nprobe=4/8


def test_ivf_indexed_matches_scan_and_prunes(tmp_path):
    """The materialized centroid-partitioned index must (a) return EXACTLY
    what the scan-based IVF returns at the same centroids/nprobe, (b) read
    fewer inverted lists than exist (IO pruning evidence), and (c) resume:
    a second build over a committed index rewrites nothing."""
    rng = np.random.RandomState(2)
    M = rng.randn(300, 8)
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(300, dtype=np.int64)),
                "embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float64())),
            }
        )
    )
    C = similarity.train_centroids(emb, n_clusters=8, seed=0)
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx, centroids=C)

    def _canon(df):
        df = df.copy()
        df["score"] = df["score"].round(10)
        return df.sort_values(["query_id", "vec_id"]).reset_index(drop=True)

    for nprobe in (2, 4, 8):
        ds, stats = similarity.ivf_topk_indexed(idx, M[:5], np.arange(5), k=10, nprobe=nprobe)
        got = _canon(ds.to_pandas())
        # scan-based IVF with the SAME centroids (bypass retraining by
        # reusing the module's deterministic trainer seed/state)
        want = _canon(_scan_ivf_with_centroids(emb, C, M[:5], np.arange(5), 10, nprobe))
        pd.testing.assert_frame_equal(got, want)
        assert stats["clusters_total"] == 8
        if nprobe < 8:
            assert stats["clusters_read"] <= 5 * nprobe  # union of probe sets
    # nprobe = n_clusters is exact
    ds, stats = similarity.ivf_topk_indexed(idx, M[:5], np.arange(5), k=10, nprobe=8)
    out = ds.to_pandas()
    exact = similarity.topk_cosine(emb, M[:5], np.arange(5), k=10).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), _canon(exact))
    # resume: mtimes unchanged after a second build with resume=True
    import os

    f = os.path.join(idx, "bucket=0", "part.parquet")
    mt = os.path.getmtime(f)
    similarity.build_ivf_index(emb, idx, centroids=C, resume=True)
    assert os.path.getmtime(f) == mt


def _scan_ivf_with_centroids(emb, C, Q, qids, k, nprobe):
    """ivf_topk's scan plan with injected centroids (for parity testing)."""
    import graphscope_ray.functions.similarity as sim

    orig = sim.train_centroids
    sim.train_centroids = lambda *a, **kw: C
    try:
        return sim.ivf_topk(emb, Q, qids, k=k, n_clusters=len(C), nprobe=nprobe).to_pandas()
    finally:
        sim.train_centroids = orig


def test_multimodal_plumbing():
    t = multimodal.fake_media_table(n=16, seed=3)
    ds = ray.data.from_arrow(t)
    out = multimodal.extract_media_features(ds, feat_dim=8).to_pandas()
    assert len(out) == 16
    assert all(len(f) == 8 for f in out.feature)
    want = hashlib.sha256(t["media"][0].as_py()).hexdigest()
    assert out.sort_values("media_id").media_sha256.iloc[0] == want
    # strict mode raises (decode genuinely stubbed)
    with pytest.raises(Exception):
        multimodal.extract_media_features(ds, strict=True).count()


def test_windows():
    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 02:00", "2024-01-01 02:20"]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 8], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "b"], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        )
    )
    w = windows.tumbling_window(ds, window_s=3600).to_pandas().sort_values(["event_type", "window_start"])
    assert w.n_events.tolist() == [2, 1, 1]
    s = windows.sessionize(ds, gap_s=1800).to_pandas().sort_values(["user_id", "t_start"])
    # user 7: 00:10 → (40min gap) 00:50 → (70min gap) 02:00 — three sessions
    assert s[s.user_id == 7].n_events.tolist() == [1, 1, 1]
    assert s[s.user_id == 8].n_events.tolist() == [1]


def test_hopping_window():
    import numpy as np
    import pandas as pd

    from graphscope_ray.functions import windows

    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:05"])
    df = pd.DataFrame({"event_type": ["a", "a", "b"], "ts": ts, "value": [1.0, 2.0, 4.0]})
    out = (
        windows.hopping_window(ray.data.from_pandas(df), window_s=3600, hop_s=1800)
        .to_pandas()
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    # event at 00:10 → windows starting 23:30 (prev day, epoch ok) and 00:00, ...
    base = pd.Timestamp("2024-01-01").timestamp()
    w = out[(out.event_type == "a") & (out.window_start == base)]
    assert int(w.n_events.iloc[0]) == 2 and float(w.sum_value.iloc[0]) == 3.0
    wb = out[(out.event_type == "b") & (out.window_start == base + 1800)]
    assert int(wb.n_events.iloc[0]) == 1 and float(wb.sum_value.iloc[0]) == 4.0
    # every event appears in exactly k=2 windows
    assert out.n_events.sum() == 2 * len(df)


def test_hash_sampling_stable_and_split_disjoint():
    """sampling.py: decisions are content-stable (invariant under
    repartitioning), split classes partition the keyspace at the requested
    rates, and stratified rates are honored per stratum."""
    from graphscope_ray.functions import sampling

    n = 20000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(["en" if i % 4 else "fr" for i in range(n)], pa.string()),
        }
    )
    ds1 = ray.data.from_arrow(t)
    ds2 = ray.data.from_arrow(t).repartition(7)

    s1 = sampling.hash_sample(ds1, "doc_id", permille=100, salt=5).to_pandas()
    s2 = sampling.hash_sample(ds2, "doc_id", permille=100, salt=5).to_pandas()
    assert sorted(s1.doc_id) == sorted(s2.doc_id)  # partition-invariant
    assert abs(len(s1) / n - 0.1) < 0.02  # ~10% rate
    # different salt -> different (decorrelated) sample
    s3 = sampling.hash_sample(ds1, "doc_id", permille=100, salt=6).to_pandas()
    assert sorted(s3.doc_id) != sorted(s1.doc_id)

    sp = sampling.hash_split(ds1, "doc_id", weights=(800, 100, 100), salt=1).to_pandas()
    assert len(sp) == n  # split labels, never drops rows
    frac = sp.split.value_counts(normalize=True).sort_index()
    assert abs(frac[0] - 0.8) < 0.02 and abs(frac[1] - 0.1) < 0.015
    # nested property: sample(permille=p) ⊂ sample(permille=q) for p<q
    s_small = sampling.hash_sample(ds1, "doc_id", permille=50, salt=5).to_pandas()
    assert set(s_small.doc_id) <= set(s1.doc_id)

    st = sampling.stratified_hash_sample(
        ds1, "doc_id", stratum="lang", permille_by_stratum={"fr": 1000}, default_permille=100, salt=2
    ).to_pandas()
    assert (st.lang == "fr").sum() == n // 4  # rare stratum kept whole
    en_rate = (st.lang == "en").sum() / (n - n // 4)
    assert abs(en_rate - 0.1) < 0.02


def test_minhasher_batched_matches_per_doc():
    # the batched reduceat path must be bit-identical to the single-doc
    # reference kernel, including short (<k), empty, and unicode docs
    mh = dedup.MinHasher(k=5, num_perm=64, seed=1)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "abc",                      # shorter than k → whole-text fallback
        "abcde",                    # exactly k
        "naïve café — unicode ✓",   # multi-byte utf-8
        "aaaaaaaaaaaaaaaa",         # heavy duplicate shingles
    ]
    batch = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    got = mh(batch)
    sig_rows = got["sig"].to_pylist()
    for i, t in enumerate(texts):
        expect = mh.signature(t).astype(np.int64)
        assert sig_rows[i] == expect.tolist(), f"doc {i} mismatch"


def test_substring_dup_stats():
    # doc0 and doc1 share an exact 45-char run; doc2 is unique; doc3 repeats
    # a window WITHIN itself; doc4 is shorter than k (whole-text window).
    shared = "the exact same forty-five character run here!"  # len 45
    assert len(shared) == 45
    texts = [
        "prefix one " + shared + " suffix alpha",
        "other start " + shared + " different end",
        "completely unique text with no repeated windows at all whatsoever",
        ("repeat me " * 12) + "unique tail",
        "tiny",
    ]
    ds = _docs(texts)
    out = dedup.substring_dup_stats(ds, k=40).to_pandas().sort_values("doc_id")
    out = out.set_index("doc_id")
    # every doc present, n_windows = n - min(k, n) + 1
    for i, t in enumerate(texts):
        assert out.loc[i, "n_windows"] == len(t) - min(40, len(t)) + 1
    # both docs surround the run with spaces, so the common region is
    # " "+shared+" " = 47 chars → 47-40+1 = 8 duplicated 40-windows each
    assert out.loc[0, "n_dup"] == 8
    assert out.loc[1, "n_dup"] == 8
    assert out.loc[2, "n_dup"] == 0
    # within-doc repetition counts as duplication
    assert out.loc[3, "n_dup"] > 0
    assert out.loc[4, "n_dup"] == 0 and out.loc[4, "n_windows"] == 1
    assert abs(out.loc[0, "dup_frac"] - round(8 / out.loc[0, "n_windows"], 8)) < 1e-12


def test_substring_dup_stats_vs_plain_sql():
    """Semantic cross-check independent of the hash kernel: group windows by
    their literal substring in DuckDB and compare per-doc dup counts."""
    import duckdb

    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    texts[7] = texts[3]  # exact dup pair
    texts[11] = "x " + texts[5]  # shifted near-dup
    ds = _docs(texts)
    out = dedup.substring_dup_stats(ds, k=20).to_pandas().sort_values("doc_id")

    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    ref = con.execute(
        """
        WITH w AS (
          SELECT doc_id, substr(text, CAST(i AS INT), 20) AS win
          FROM docs, unnest(generate_series(1, greatest(length(text) - 19, 1))) AS t(i)
        ), tt AS (SELECT win, count(*) AS tot FROM w GROUP BY win)
        SELECT w.doc_id, count(*) FILTER (tt.tot >= 2) AS n_dup, count(*) AS n_windows
        FROM w JOIN tt USING (win) GROUP BY w.doc_id ORDER BY w.doc_id
        """
    ).df()
    assert out.n_dup.tolist() == ref.n_dup.tolist()
    assert out.n_windows.tolist() == ref.n_windows.tolist()


def test_charlm_xent():
    # repetitive text is more predictable under the in-corpus bigram LM
    ds = _docs(["ababababababababababababab", "q7#zk!m9@w%x&v*u+t=s-r_p~o", "", "x"])
    out = text.charlm_xent(ds).to_pandas().sort_values("doc_id")
    assert out.xent.iloc[0] < out.xent.iloc[1]
    assert out.xent.iloc[2] == 0.0 and out.xent.iloc[3] == 0.0
    # hand-check doc0: P(b|a) and P(a|b) dominate their rows
    import math

    texts = ["ababababababababababababab", "q7#zk!m9@w%x&v*u+t=s-r_p~o", "", "x"]
    from collections import Counter

    bg = Counter()
    chars = set()
    for t in texts:
        chars.update(t)
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
    V = len(chars)
    row = Counter()
    for (a, _), c in bg.items():
        row[a] += c
    t0 = texts[0]
    s = sum(math.log((bg[(a, b)] + 1) / (row[a] + V)) for a, b in zip(t0, t0[1:]))
    assert abs(out.xent.iloc[0] - round(-s / (len(t0) - 1), 8)) < 1e-8


def test_lsh_pairs_empty_input():
    # zero-block inputs must yield an empty pair table, not a concat crash
    import pyarrow as pa
    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    sig = dedup.minhash_signatures(empty)
    out = dedup.lsh_candidate_pairs(sig).to_pandas()
    assert len(out) == 0


def test_pq_recall_and_compression():
    rng = np.random.default_rng(11)
    n, d = 400, 32
    X = rng.normal(size=(n, d))
    import pyarrow as pa
    import ray.data

    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in X]),
            }
        )
    )
    books = similarity.train_pq(emb, m=8, seed=0)
    assert books.shape == (8, 256, 4)
    codes = similarity.pq_encode(emb, books)
    ct = codes.to_pandas()
    assert len(ct) == n and all(len(c) == 8 for c in ct.code)  # 8 bytes/vector
    Q = X[:3]
    exact = similarity.topk_cosine(emb, Q, np.arange(3), k=10).to_pandas()
    got = similarity.pq_topk_refined(
        codes, emb, books, Q, np.arange(3), k=10, candidates=80
    ).to_pandas()
    # exact re-rank over a 20% candidate slice recovers the true top-10
    for q in range(3):
        e = exact[exact.query_id == q].sort_values("score", ascending=False)
        g = got[got.query_id == q].sort_values("score", ascending=False)
        assert set(g.vec_id) == set(e.vec_id)
        assert np.allclose(
            sorted(g.score.to_numpy()), sorted(e.score.to_numpy()), atol=1e-12
        )
    # determinism: retraining with the same seed gives identical codebooks
    books2 = similarity.train_pq(emb, m=8, seed=0)
    assert np.array_equal(books, books2)


def test_charlm_xent_randomized_vs_reference():
    """Engine charlm_xent (both passes, through Ray) == pure-python
    reference on seeded random corpora incl. edge cases."""
    import math
    from collections import Counter

    rng = np.random.default_rng(23)
    alphabet = list("abcdefg .!")
    texts = ["".join(rng.choice(alphabet, rng.integers(0, 60))) for _ in range(30)]
    texts += ["", "x", "zz"]
    ds = _docs(texts)
    out = text.charlm_xent(ds).to_pandas().sort_values("doc_id")

    bg, chars = Counter(), set()
    for txt in texts:
        b = txt.encode()
        chars.update(b)
        for a, c in zip(b, b[1:]):
            bg[(a, c)] += 1
    V = len(chars)
    row = Counter()
    for (a, _), n in bg.items():
        row[a] += n
    for i, txt in enumerate(texts):
        b = txt.encode()
        if len(b) < 2:
            want = 0.0
        else:
            want = -sum(
                math.log((bg[(a, c)] + 1) / (row[a] + V)) for a, c in zip(b, b[1:])
            ) / (len(b) - 1)
        got = float(out[out.doc_id == i].xent.iloc[0])
        assert abs(got - round(want, 8)) < 1e-7, (i, got, want)


def test_paragraph_dedup_sep_mode():
    # doc0 para "dup me" appears again in doc0 and doc1; first occurrence
    # (doc0, idx0) survives, later ones drop; unique paras all survive
    texts = [
        "dup me\n\nunique zero\n\ndup me",
        "dup me\n\nunique one",
        "all alone here",
        "",
    ]
    out = (
        dedup.paragraph_dedup(_docs(texts), sep="\n\n")
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[0, "n_paras"] == 3 and out.loc[0, "n_dropped"] == 1
    assert out.loc[0, "clean_text"] == "dup me\n\nunique zero"
    assert out.loc[1, "n_paras"] == 2 and out.loc[1, "n_dropped"] == 1
    assert out.loc[1, "clean_text"] == "unique one"
    assert out.loc[2, "n_dropped"] == 0
    assert out.loc[2, "clean_text"] == "all alone here"
    # empty text = one empty paragraph; it is globally unique here
    assert out.loc[3, "n_paras"] == 1 and out.loc[3, "n_dropped"] == 0


def test_paragraph_dedup_word_windows():
    # word-window mode: 4-word windows; doc0 and doc1 share their first
    # window exactly; doc1's copy (later (doc,idx)) is dropped
    texts = [
        "a b c d e f",
        "a b c d x y",
    ]
    out = (
        dedup.paragraph_dedup(_docs(texts), words=4)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[0, "n_paras"] == 2 and out.loc[0, "n_dropped"] == 0
    assert out.loc[0, "clean_text"] == "a b c d e f"
    assert out.loc[1, "n_paras"] == 2 and out.loc[1, "n_dropped"] == 1
    assert out.loc[1, "clean_text"] == "x y"


def test_paragraph_dedup_partition_invariance():
    # same result at 1 block and several blocks / partitions
    texts = [f"w{i % 3} common tail" for i in range(20)]
    a = (
        dedup.paragraph_dedup(_docs(texts), sep="\n\n", num_partitions=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ds = _docs(texts).repartition(5)
    b = (
        dedup.paragraph_dedup(ds, sep="\n\n", num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_lsh_index_build_probe(tmp_path):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different sentence about distributed data engines",
        "minhash locality sensitive hashing finds near duplicate documents",
        "ray data streams arrow blocks through the object store nicely",
    ]
    # corpus: 8 docs (two copies of each base text, ids 0..7)
    corpus = _docs(base + base, ids=list(range(8)))
    idx = str(tmp_path / "lshidx")
    meta = dedup.build_lsh_index(corpus, idx, bucket_parts=8, sig_parts=4)
    assert meta["bands"] == 16

    # probe: 100 = exact copy of base[0]; 101 = near-copy of base[2];
    # 102 = unrelated
    probe = _docs(
        [
            base[0],
            base[2].replace("finds", "locates"),
            "zzz completely unrelated probe text with nothing in common qqq",
        ],
        ids=[100, 101, 102],
    )
    out = dedup.lsh_index_probe(probe, idx, threshold=0.4).to_pandas()
    got = {(int(r.new_id), int(r.old_id)): float(r.est_jaccard) for r in out.itertuples()}
    # exact copy matches BOTH stored copies at est 1.0
    assert got.get((100, 0)) == 1.0 and got.get((100, 4)) == 1.0
    # near-copy found with high (but < 1) estimate
    assert 0.4 <= got.get((101, 2), 0.0) <= 1.0
    assert got.get((101, 2)) == got.get((101, 6))
    # unrelated probe matches nothing
    assert not any(n == 102 for n, _ in got)


def test_lsh_index_resume_and_determinism(tmp_path):
    texts = [f"document number {i} with some shared boilerplate tail" for i in range(20)]
    ds = _docs(texts)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    dedup.build_lsh_index(ds, p1, bucket_parts=4, sig_parts=2)
    dedup.build_lsh_index(ds, p2, bucket_parts=4, sig_parts=2)
    # second build over the same path is a no-op resume (manifest complete)
    dedup.build_lsh_index(ds, p1, bucket_parts=4, sig_parts=2)
    probe = _docs([texts[7]], ids=[500])
    a = dedup.lsh_index_probe(probe, p1, threshold=0.9).to_pandas()
    b = dedup.lsh_index_probe(probe, p2, threshold=0.9).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["new_id", "old_id"]).reset_index(drop=True),
        b.sort_values(["new_id", "old_id"]).reset_index(drop=True),
    )
    assert (a["old_id"] == 7).any() and (a["est_jaccard"] == 1.0).any()


def test_char_entropy_known_values():
    from graphscope_ray.functions.text import char_entropy

    ds = _docs(["aaaa", "ab", "", "abcd", "aab"])
    out = char_entropy(ds).to_pandas().sort_values("doc_id").set_index("doc_id")
    assert out.loc[0, "entropy"] == 0.0
    assert out.loc[1, "entropy"] == 1.0
    assert out.loc[2, "entropy"] == 0.0
    assert out.loc[3, "entropy"] == 2.0
    import math

    want = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(out.loc[4, "entropy"] - round(want, 8)) < 1e-9


def test_paragraph_dedup_duplicate_free_corpus():
    # empty dup table: nothing drops, texts pass through unchanged
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    out = (
        dedup.paragraph_dedup(_docs(texts), sep="\n\n")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["n_dropped"] == 0).all()
    assert out["clean_text"].tolist() == texts


def test_lsh_index_param_change_raises(tmp_path):
    import pytest as _pytest

    ds = _docs(["some words here", "other words there"])
    p = str(tmp_path / "idx")
    dedup.build_lsh_index(ds, p, bucket_parts=4, sig_parts=2)
    with _pytest.raises(ValueError, match="rebuild into a fresh path"):
        dedup.build_lsh_index(ds, p, bucket_parts=8, sig_parts=2)


def test_lsh_index_probe_prunes_reads(tmp_path):
    """The incremental-ingest IO contract: a small probe batch touches a
    strict subset of the bucket partitions."""
    texts = [f"document number {i} body words alpha beta gamma {i % 7}" for i in range(60)]
    idx = str(tmp_path / "idx")
    dedup.build_lsh_index(_docs(texts), idx, bucket_parts=64, sig_parts=32)
    probe = _docs([texts[5]], ids=[999])
    stats: dict = {}
    out = dedup.lsh_index_probe(probe, idx, threshold=0.9, stats_out=stats).to_pandas()
    assert (out["old_id"] == 5).any()
    # one doc → at most `bands` = 16 bucket keys → well under the 64 parts
    assert 0 < stats["bucket_parts_read"] <= 16 < stats["bucket_parts_total"]
    assert stats["bucket_bytes_read"] < stats["bucket_bytes_total"]
    assert 0 < stats["sig_parts_read"] <= stats["sig_parts_total"]


def test_priority_sample_weighted_and_stable():
    from graphscope_ray.functions import sampling

    rng = np.random.default_rng(5)
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 10 == 0, 500, 1).astype(np.int64)  # 10% heavy rows
    t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    out = sampling.priority_sample(
        ray.data.from_arrow(t).repartition(7), key="doc_id", weight_col="w", k=100, salt=3
    )
    # exactly k winners, identical to the brute-force rank computation
    assert len(out) == 100
    brute_rank = (sampling.hash_u64(ids, 3) // w.astype(np.uint64))
    order = np.lexsort((ids, brute_rank))[:100]
    assert sorted(out["doc_id"].tolist()) == sorted(ids[order].tolist())
    # heavy rows vastly over-represented vs their 10% share
    frac_heavy = (out["doc_id"] % 10 == 0).mean()
    assert frac_heavy > 0.8
    # partition-invariant
    out1 = sampling.priority_sample(
        ray.data.from_arrow(t).repartition(2), key="doc_id", weight_col="w", k=100, salt=3
    )
    pd.testing.assert_frame_equal(out, out1)


def test_normalize_text_ccnet_rules():
    ds = _docs(["  Hello, WORLD!!  123 foo\tbar ", "a.b,c;d", ""])
    out = text.normalize_text(ds).to_pandas().sort_values("doc_id")
    assert out.norm_text.tolist() == ["hello world 000 foo bar", "a b c d", ""]


def test_semdedup_flags_planted_and_chunk_invariant():
    from graphscope_ray.functions.dedup import semdedup

    rng = np.random.default_rng(7)
    # 3 well-separated gaussian blobs + planted near-copies inside each
    # offset 10, noise sigma 1: within-blob cosine ~0.86 (below threshold),
    # blob separation ~14 vs spread ~4 (k-means recovers the blobs)
    base = rng.normal(size=(300, 16)) + np.repeat(np.eye(3, 16) * 10, 100, axis=0)
    ids = np.arange(300, dtype=np.int64)
    copies = base[:12] + rng.normal(scale=1e-4, size=(12, 16))  # ~cosine 1
    X = np.vstack([base, copies])
    allids = np.concatenate([ids, ids[:12] + 1000])
    t = pa.table(
        {"vec_id": pa.array(allids), "embedding": pa.array(list(X.astype(np.float32)))}
    )
    ds = ray.data.from_arrow(t).repartition(5)
    out = semdedup(ds, k=3, iters=4, threshold=0.99, chunk=37).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    # every planted copy is a dup (its lower-id original shares the cluster)
    assert out[out.vec_id >= 1000].dup.eq(1).all()
    # originals of the planted pairs are kept (lowest id wins)
    assert out[out.vec_id < 12].dup.eq(0).all()
    # chunk size and partitioning don't change the decision
    out2 = semdedup(ds.repartition(2), k=3, iters=4, threshold=0.99, chunk=4096).to_pandas()
    pd.testing.assert_frame_equal(out, out2.sort_values("vec_id").reset_index(drop=True))
    # clusters recover the 3 blobs: planted copies co-cluster with originals
    m = out.set_index("vec_id")["cluster"]
    assert (m.loc[allids[:12] + 1000].to_numpy() == m.loc[allids[:12]].to_numpy()).all()


def test_cooccurrence_ppmi_matches_duckdb():
    import duckdb

    from graphscope_ray.functions.mlprep import cooccurrence_ppmi

    rng = np.random.default_rng(13)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 30))) for _ in range(120)]
    texts += ["", "solo", "a  b"]  # empty doc, 1-token doc, double space
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = (
        cooccurrence_ppmi(ds, window=2, min_count=2)
        .to_pandas()
        .sort_values(["w", "c"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH tok AS (SELECT doc_id, generate_subscripts(ts, 1) AS i, unnest(ts) AS w "
        "FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM df)), "
        "pairs AS (SELECT a.w AS w, b.w AS c FROM tok a JOIN tok b "
        "ON b.doc_id = a.doc_id AND b.i BETWEEN a.i - 2 AND a.i + 2 AND b.i <> a.i "
        "WHERE a.w <> '' AND b.w <> ''), "
        "pcnt AS (SELECT w, c, count(*) AS n FROM pairs GROUP BY w, c), "
        "mw AS (SELECT w, sum(n) AS nw FROM pcnt GROUP BY w), "
        "mc AS (SELECT c, sum(n) AS nc FROM pcnt GROUP BY c), "
        "tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM pcnt) "
        "SELECT pcnt.w, pcnt.c, CAST(pcnt.n AS BIGINT) AS n, "
        "round(greatest(ln(tot.N * pcnt.n / (mw.nw * mc.nc)), 0), 8) AS ppmi "
        "FROM pcnt JOIN mw USING (w) JOIN mc USING (c), tot "
        "WHERE pcnt.n >= 2 ORDER BY w, c"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # symmetry of the statistic: n(w,c) == n(c,w)
    piv = got.set_index(["w", "c"])["n"]
    for (w, c), n in piv.items():
        assert piv.get((c, w), 0) == n


def test_global_shuffle_deterministic_permutation():
    import numpy as np
    import ray.data

    from graphscope_ray.functions import sampling

    ids = np.arange(100, dtype=np.int64)
    ds1 = ray.data.from_items([{"doc_id": int(i)} for i in ids]).repartition(7)
    ds2 = ray.data.from_items([{"doc_id": int(i)} for i in ids[::-1]]).repartition(3)
    a = sampling.global_shuffle(ds1, salt=5).to_pandas().sort_values("doc_id")
    b = sampling.global_shuffle(ds2, salt=5).to_pandas().sort_values("doc_id")
    # partition-layout- and input-order-independent permutation
    assert np.array_equal(a["pos"].to_numpy(), b["pos"].to_numpy())
    # a real permutation of 0..n-1
    assert sorted(a["pos"]) == list(range(100))
    # the hash order matches the kernel
    h = sampling.hash_u64(ids, 5)
    exp_pos = np.empty(100, dtype=np.int64)
    exp_pos[np.lexsort((ids, h))] = np.arange(100)
    assert np.array_equal(a["pos"].to_numpy(), exp_pos)
    # different salt -> different permutation
    c = sampling.global_shuffle(ds1, salt=6).to_pandas().sort_values("doc_id")
    assert not np.array_equal(a["pos"].to_numpy(), c["pos"].to_numpy())


def test_temperature_replicate_flattens_and_preserves_budget():
    import numpy as np
    import pandas as pd
    import ray.data

    from graphscope_ray.functions import sampling

    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "source": ["head"] * 900 + ["tail"] * 100,
        }
    )
    out = sampling.temperature_replicate(
        ray.data.from_pandas(df).repartition(4), stratum="source", tau=2.0, salt=6
    ).to_pandas()
    # budget-preserving: Σ n_s·e_s = N (hash-slice realization is within
    # the permille quantization of the expectation)
    assert abs(len(out) - 1000) < 50
    # flattening: e_head = (N/Σ√n)/√900 < 1 < e_tail = (N/Σ√n)/√100
    by = out.groupby("source").size()
    assert by["head"] < 900 and by["tail"] > 100
    # τ=2 closed form: e_head = (1000/40)/30 = 5/6 → 750; e_tail = 2.5 → 250
    assert abs(by["head"] - 750) < 40 and abs(by["tail"] - 250) < 25
    # partitioning-invariant
    out2 = sampling.temperature_replicate(
        ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(9),
        stratum="source", tau=2.0, salt=6,
    ).to_pandas()
    a = out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "epoch"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def _winnow_ref(s: str, k: int, w: int):
    """Pure-python MOSS winnowing oracle: rightmost-min per window."""
    from graphscope_ray.functions.hashing import shingle_hashes

    if not s:
        return set()
    h = shingle_hashes(s.encode("utf-8"), k)
    ww = min(w, len(h))
    out = set()
    for i in range(len(h) - ww + 1):
        win = h[i : i + ww]
        mn = win.min()
        pos = i + max(j for j in range(ww) if win[j] == mn)
        out.add((pos, int(h[pos])))
    return out


def test_winnow_fingerprints_vs_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "abcabcabcabcabc",
        "xy",  # shorter than k: whole-text fallback, one fingerprint
        "aaaaaaaaaaaa",  # all-equal hashes: rightmost-min tie-break path
        "",
    ]
    k, w = 5, 4
    out = text.winnow_fingerprints(_docs(texts), k=k, w=w).to_pandas()
    for i, s in enumerate(texts):
        got = {
            (int(r.pos), int(np.int64(r.fingerprint).astype(np.uint64)))
            for r in out[out.doc_id == i].itertuples()
        }
        want = {(p, h % 2**64) for p, h in _winnow_ref(s, k, w)}
        assert got == want, f"doc {i}"


def test_winnow_guarantee_and_partition_invariance():
    # any shared substring of length >= w + k - 1 shares a fingerprint
    k, w = 5, 4
    shared = "zqxwvutsrqponm"  # len 14 >= w + k - 1 = 8
    a = "prefix one " + shared + " tail alpha"
    b = "completely different " + shared + " other end"
    out = text.winnow_fingerprints(_docs([a, b]), k=k, w=w).to_pandas()
    fa = set(out[out.doc_id == 0].fingerprint)
    fb = set(out[out.doc_id == 1].fingerprint)
    assert fa & fb, "winnowing guarantee violated"
    # partition invariance
    ds1 = _docs([a, b, "third doc here"]).repartition(3)
    o1 = (
        text.winnow_fingerprints(ds1, k=k, w=w)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    o2 = (
        text.winnow_fingerprints(_docs([a, b, "third doc here"]), k=k, w=w)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(o1, o2)


@pytest.mark.parametrize("P", [1, 3])
def test_chunk_documents(P):
    from graphscope_ray.functions.text import chunk_documents

    docs = ["a" * 10, "", "xyz", "b" * 7, "héllo wörld unicode " * 3]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(docs)})
    out = (
        chunk_documents(ray.data.from_arrow(t).repartition(P), size=4, overlap=1)
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    stride = 3
    for i, d in enumerate(docs):
        rows = out[out.doc_id == i]
        want = [(s, d[s : s + 4]) for s in range(0, max(len(d) - 1, 0) + 1, stride)]
        assert list(zip(rows.start, rows.chunk)) == want, (i, list(rows.chunk), want)
        assert (rows.chunk_len == rows.chunk.str.len()).all()
    # overlap property: consecutive chunks share `overlap` chars
    r0 = out[out.doc_id == 0].chunk.tolist()
    for a, b in zip(r0, r0[1:]):
        assert a[stride:] == b[: len(a) - stride]


@pytest.mark.parametrize("P", [1, 2])
def test_c4_clean_vs_python(P):
    import re as _re

    from graphscope_ray.functions.text import c4_clean

    docs = [
        "Good line with punctuation.\nshort.\nAnother good line stays here!\nA third keeper line, yes?\nno punct line at all",
        "uses javascript here today.\nA fine line indeed it is.\nB fine line indeed it is.\nC fine line indeed it is.",
        "Lorem Ipsum dolor sit amet.\nKeep this sentence right here.\nAnd also this one too.\nAnd a third one as well.",
        "Brace { doc with lines.\nThis line is long enough.\nSo is this other line here.\nAnd this third one too.",
        "",
        "  trimmed line ends well.  \n\tTabbed line also ends fine.\t\r\nx y.\nfourth proper line is here.",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)})
    got = (
        c4_clean(ray.data.from_arrow(t).repartition(P))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    for i, d in enumerate(docs):
        lines = d.split("\n")
        kept = []
        for ln in lines:
            s = ln.strip(" \t\r")
            if (
                _re.search(r'[.!?"]$', s)
                and len(_re.findall(r"\S+", s)) >= 3
                and "javascript" not in s.lower()
            ):
                kept.append(s)
        keep_doc = int(
            len(kept) >= 3 and "lorem ipsum" not in d.lower() and "{" not in d
        )
        row = got[got.doc_id == i].iloc[0]
        assert row.n_lines == len(lines), i
        assert row.n_kept == len(kept), (i, row.n_kept, kept)
        assert row.clean_text == "\n".join(kept), i
        assert row.keep_doc == keep_doc, i
