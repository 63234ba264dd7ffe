"""Per-superstep checkpoint + mid-iteration resume (the kill-test analogue):
a run stopped after k rounds resumes from the manifest on a FRESH actor pool
and converges to the same result as an uninterrupted run."""

import json
import os

import numpy as np
import pyarrow as pa

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import build_graph


def _graph(P=3):
    rng = np.random.RandomState(3)
    e = rng.randint(0, 40, size=(200, 2))
    e = e[e[:, 0] != e[:, 1]]
    t = pa.table({"src": pa.array(e[:, 0], pa.int64()), "dst": pa.array(e[:, 1], pa.int64())})
    return t, 40


def test_pagerank_checkpoint_resume(tmp_path):
    t, n = _graph()
    ckpt = str(tmp_path / "pr")

    # uninterrupted reference run
    g_full = build_graph(t, num_partitions=3, num_vertices=n)
    ds_full, res_full = alg.pagerank(g_full, tol=1e-10)
    want = ds_full.to_pandas().sort_values("vid")["score"].to_numpy()

    # run only 3 rounds, checkpointing every round ("the job gets killed")
    g1 = build_graph(t, num_partitions=3, num_vertices=n)
    alg.pagerank(g1, tol=1e-10, max_rounds=3, checkpoint_dir=ckpt)
    man = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert man["step"] == 2
    assert os.path.exists(os.path.join(ckpt, "step=2", "part=1.parquet"))
    assert os.path.exists(os.path.join(ckpt, "metrics.parquet"))

    # fresh actors, resume from the manifest, run to convergence
    g2 = build_graph(t, num_partitions=3, num_vertices=n)
    ds2, res2 = alg.pagerank(g2, tol=1e-10, checkpoint_dir=ckpt, resume=True)
    got = ds2.to_pandas().sort_values("vid")["score"].to_numpy()
    assert np.allclose(got, want, atol=1e-12)
    # converged at the same absolute superstep, having re-run only steps 3+
    assert res2.rounds == res_full.rounds
    assert len(res2.metrics) == res_full.rounds - 3


def test_wcc_checkpoint_resume(tmp_path):
    t, n = _graph()
    ckpt = str(tmp_path / "wcc")
    g_full = build_graph(t, num_partitions=3, num_vertices=n, view="undirected")
    want = alg.wcc(g_full)[0].to_pandas().sort_values("vid")["comp"].tolist()

    g1 = build_graph(t, num_partitions=3, num_vertices=n, view="undirected")
    alg.wcc(g1, max_rounds=1, checkpoint_dir=ckpt)
    g2 = build_graph(t, num_partitions=3, num_vertices=n, view="undirected")
    ds2, _ = alg.wcc(g2, checkpoint_dir=ckpt, resume=True)
    assert ds2.to_pandas().sort_values("vid")["comp"].tolist() == want


def test_incomplete_checkpoint_is_ignored(tmp_path):
    t, n = _graph()
    ckpt = str(tmp_path / "bad")
    g1 = build_graph(t, num_partitions=3, num_vertices=n)
    alg.pagerank(g1, max_rounds=2, checkpoint_dir=ckpt)
    os.remove(os.path.join(ckpt, "step=1", "part=0.parquet"))  # torn write
    g2 = build_graph(t, num_partitions=3, num_vertices=n)
    ds2, res2 = alg.pagerank(g2, tol=1e-10, checkpoint_dir=ckpt, resume=True)
    # falls back to a fresh init rather than loading a torn state
    assert res2.rounds > 2
    assert abs(ds2.to_pandas()["score"].sum() - 1.0) < 1e-9
