"""Resumable sharded mining: a killed run resumes by skipping committed
shards; the merged edge table is identical to the single-shot pipeline."""

import json
import os
import shutil

import pyarrow.parquet as pq
import ray.data

from graphscope_ray.pipelines.linkgraph import mine_edges
from graphscope_ray.pipelines.resumable import mine_corpus_resumable
from graphscope_ray.sources import generate_repos


def _make_sharded_corpus(tmp_path, n_shards=3):
    t = generate_repos(n_repos=40, seed=7)
    inp = tmp_path / "corpus"
    inp.mkdir()
    rows = t.num_rows
    per = rows // n_shards + 1
    for i in range(n_shards):
        pq.write_table(t.slice(i * per, per), str(inp / f"shard{i}.parquet"))
    return str(inp), t


def test_resumable_equals_single_shot(tmp_path):
    inp, t = _make_sharded_corpus(tmp_path)
    out = str(tmp_path / "mined")
    merged = mine_corpus_resumable(inp, out).to_pandas()
    want = mine_edges(ray.data.from_arrow(t)).to_pandas()
    a = merged.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)
    b = want.sort_values(["src_oid", "dst_oid"]).reset_index(drop=True)
    assert a[["src_oid", "dst_oid", "weight"]].equals(b[["src_oid", "dst_oid", "weight"]])
    # lineage carries the sha256 invariant per input row
    lin = ray.data.read_parquet(os.path.join(out, "shards", "shard0.parquet", "lineage")).to_pandas()
    assert "content_sha256" in lin.columns and len(lin) > 0


def test_resume_skips_finished_shards(tmp_path):
    inp, t = _make_sharded_corpus(tmp_path)
    out = str(tmp_path / "mined2")
    mine_corpus_resumable(inp, out)
    man1 = json.load(open(os.path.join(out, "manifest.json")))
    assert len(man1) == 3

    # simulate a killed run: remove one shard's commit + leave a torn tmp dir
    victim = sorted(man1)[1]
    del man1[victim]
    json.dump(man1, open(os.path.join(out, "manifest.json"), "w"))
    shutil.rmtree(os.path.join(out, "shards", victim))
    os.makedirs(os.path.join(out, "shards", victim + ".tmp"))

    # mtimes of surviving shard outputs must not change (they're skipped)
    kept = sorted(man1)[0]
    before = os.path.getmtime(os.path.join(out, "shards", kept))
    merged = mine_corpus_resumable(inp, out).to_pandas()
    assert os.path.getmtime(os.path.join(out, "shards", kept)) == before
    man2 = json.load(open(os.path.join(out, "manifest.json")))
    assert len(man2) == 3
    want = mine_edges(ray.data.from_arrow(t)).to_pandas()
    assert len(merged) == len(want)
