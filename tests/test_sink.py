"""Resumable keyed-partitioned Parquet sink (sources/sink.py): atomic bucket
commits, manifest resume (finished buckets skipped), faithful read-back."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.sources.sink import read_partitioned, write_partitioned


def _ds(n=500):
    rng = np.random.default_rng(2)
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(rng.integers(0, 1000, n)),
                "v": pa.array(rng.normal(size=n)),
            }
        )
    )


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "sink")
    ds = _ds()
    man = write_partitioned(ds, path, key="k", num_buckets=8)
    assert len(man["buckets"]) == 8
    assert sum(b["rows"] for b in man["buckets"].values()) == 500
    back = read_partitioned(path).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    orig = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)


def test_resume_skips_committed_buckets(tmp_path):
    path = str(tmp_path / "sink")
    ds = _ds()
    write_partitioned(ds, path, key="k", num_buckets=8)
    # simulate a crash: drop 3 buckets from the manifest and delete their files
    mp = os.path.join(path, "_MANIFEST.json")
    man = json.load(open(mp))
    survivors = {}
    mtimes = {}
    for b, meta in man["buckets"].items():
        f = os.path.join(path, f"bucket={b}", "part.parquet")
        if int(b) < 3:
            shutil.rmtree(os.path.join(path, f"bucket={b}"))
        else:
            survivors[b] = meta
            mtimes[b] = os.path.getmtime(f)
    json.dump({"buckets": survivors}, open(mp, "w"))

    man2 = write_partitioned(ds, path, key="k", num_buckets=8)
    assert len(man2["buckets"]) == 8
    # committed buckets were NOT rewritten
    for b, t in mtimes.items():
        f = os.path.join(path, f"bucket={b}", "part.parquet")
        assert os.path.getmtime(f) == t
    back = read_partitioned(path).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    orig = ds.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)


def test_no_partial_files_visible(tmp_path):
    path = str(tmp_path / "sink")
    write_partitioned(_ds(100), path, key="k", num_buckets=4)
    for b in range(4):
        d = os.path.join(path, f"bucket={b}")
        assert os.listdir(d) == ["part.parquet"], os.listdir(d)


def test_jsonl_roundtrip(tmp_path):
    from graphscope_ray.sources.jsonl import read_jsonl_source, write_jsonl

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([3, 1, 2], pa.int64()),
                "text": pa.array(["a b", 'quo"te', ""], pa.string()),
                "n": pa.array([1.5, -2.0, 0.0]),
            }
        )
    )
    path = str(tmp_path / "jl")
    write_jsonl(ds, path)
    back = (
        read_jsonl_source(path)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text", "n"]]
    )
    orig = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)
    # projection path
    proj = read_jsonl_source(path, columns=["doc_id"]).to_pandas()
    assert sorted(proj.columns) == ["doc_id"] and len(proj) == 3
