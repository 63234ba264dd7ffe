"""Epoch iterator (training hand-off): determinism, shuffle-per-epoch,
exact resume, and the packed-sequence / khop feeders — mirroring GLE's
epoch/shuffle dataset contract (ref learning_engine/graph-learn dataset
API)."""

import numpy as np
import pandas as pd
import pytest
import ray

from graphscope_ray.functions.epoch import (
    EpochIterator,
    iter_khop_batches,
    iter_packed_batches,
    shuffled_epoch,
)


def _collect(it):
    return [{k: np.asarray(v) for k, v in b.items()} for b in it]


def _flat_ids(batches, col="k"):
    return np.concatenate([b[col] for b in batches]) if batches else np.array([])


@pytest.fixture(scope="module")
def keyed_ds():
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "val": np.arange(100, dtype=np.int64) * 7})
    return ray.data.from_pandas(df).repartition(7)


def test_epoch_stream_is_deterministic(keyed_ds):
    it = EpochIterator(keyed_ds, key="k", batch_size=16, seed=42)
    a = _collect(it.epoch(0))
    b = _collect(it.epoch(0))
    assert len(a) == len(b) == 7  # 100 rows / 16
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["k"], y["k"])
        np.testing.assert_array_equal(x["val"], y["val"])
    # the stream is a permutation of the data, rows kept aligned
    ids = _flat_ids(a)
    np.testing.assert_array_equal(np.sort(ids), np.arange(100))
    vals = np.concatenate([x["val"] for x in a])
    np.testing.assert_array_equal(vals, ids * 7)
    # and it is NOT the identity order (a real shuffle)
    assert not np.array_equal(ids, np.arange(100))


def test_partitioning_does_not_change_stream(keyed_ds):
    df = keyed_ds.to_pandas()
    other = ray.data.from_pandas(df.iloc[::-1].reset_index(drop=True)).repartition(3)
    a = _collect(EpochIterator(keyed_ds, key="k", batch_size=16, seed=42).epoch(2))
    b = _collect(EpochIterator(other, key="k", batch_size=16, seed=42).epoch(2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["k"], y["k"])


def test_epochs_differ_and_seed_differs(keyed_ds):
    it = EpochIterator(keyed_ds, key="k", batch_size=32, seed=1)
    e0 = _flat_ids(_collect(it.epoch(0)))
    e1 = _flat_ids(_collect(it.epoch(1)))
    assert not np.array_equal(e0, e1)
    other = EpochIterator(keyed_ds, key="k", batch_size=32, seed=2)
    assert not np.array_equal(e0, _flat_ids(_collect(other.epoch(0))))
    np.testing.assert_array_equal(np.sort(e0), np.sort(e1))


def test_resume_from_batch_index(keyed_ds):
    it = EpochIterator(keyed_ds, key="k", batch_size=16, seed=9)
    full = _collect(it.epoch(3))
    resumed = _collect(it.epoch(3, start_batch=4))
    assert len(resumed) == len(full) - 4
    for x, y in zip(full[4:], resumed):
        np.testing.assert_array_equal(x["k"], y["k"])
        np.testing.assert_array_equal(x["val"], y["val"])


def test_drop_last_and_epochs_loop(keyed_ds):
    it = EpochIterator(keyed_ds, key="k", batch_size=30, seed=5, drop_last=True)
    batches = _collect(it.epoch(0))
    assert [len(b["k"]) for b in batches] == [30, 30, 30]
    pairs = list(EpochIterator(keyed_ds, key="k", batch_size=50, seed=5).epochs(2))
    assert [e for e, _ in pairs] == [0, 0, 1, 1]


def test_shuffled_epoch_handles_duplicate_keys():
    df = pd.DataFrame({"k": np.array([1, 1, 2, 2, 3], dtype=np.int64),
                       "v": np.arange(5)})
    ds = ray.data.from_pandas(df).repartition(2)
    out = shuffled_epoch(ds, "k", seed=0, epoch=0).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 1, 2, 2, 3]


def test_iter_packed_batches_layout_and_resume():
    rng = np.random.default_rng(0)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": [" ".join(["tok"] * int(n)) for n in rng.integers(1, 30, 40)],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(4)
    full = _collect(iter_packed_batches(ds, seq_len=64, batch_size=3, seed=7))
    # every sequence appears exactly once; spans cover every doc exactly once
    seq_ids = np.concatenate([b["seq_id"] for b in full])
    assert len(seq_ids) == len(np.unique(seq_ids))
    all_docs = np.concatenate([np.concatenate(list(b["doc_ids"])) for b in full])
    np.testing.assert_array_equal(np.sort(all_docs), np.arange(40))
    # offsets within a sequence are strictly increasing and < seq_len
    for b in full:
        for off in b["offsets"]:
            off = np.asarray(off)
            assert (np.diff(off) > 0).all() if len(off) > 1 else True
            assert (off >= 0).all() and (off < 64).all()
    # resume contract
    resumed = _collect(iter_packed_batches(ds, seq_len=64, batch_size=3, seed=7,
                                           start_batch=2))
    assert len(resumed) == len(full) - 2
    for x, y in zip(full[2:], resumed):
        np.testing.assert_array_equal(x["seq_id"], y["seq_id"])


def test_iter_khop_batches_deterministic_and_resumable():
    rng = np.random.default_rng(1)
    e = pd.DataFrame({
        "src": rng.integers(0, 50, 400).astype(np.int64),
        "dst": rng.integers(0, 50, 400).astype(np.int64),
    }).drop_duplicates()
    ds = ray.data.from_pandas(e).repartition(3)
    seeds = np.arange(0, 20, dtype=np.int64)
    a = _collect(iter_khop_batches(ds, seeds, [3, 2], batch_size=8, seed=4))
    b = _collect(iter_khop_batches(ds, seeds, [3, 2], batch_size=8, seed=4))
    assert len(a) == len(b) == 3
    for x, y in zip(a, b):
        for k in ("seeds", "layer", "src", "dst"):
            np.testing.assert_array_equal(x[k], y[k])
    # every batch's layer-0 edges start at its seeds; fanout bound holds
    for x in a:
        l0src = x["src"][x["layer"] == 0]
        assert set(l0src) <= set(x["seeds"])
        u, c = np.unique(l0src, return_counts=True)
        assert (c <= 3).all()
    # resume = tail of the full stream
    r = _collect(iter_khop_batches(ds, seeds, [3, 2], batch_size=8, seed=4,
                                   start_batch=2))
    assert len(r) == 1
    np.testing.assert_array_equal(r[0]["seeds"], a[2]["seeds"])
    np.testing.assert_array_equal(r[0]["src"], a[2]["src"])
