"""`ray job submit` entrypoint: the north-star lifecycle as ONE resumable
job.

    ray job submit --working-dir . -- \
        python -m graphscope_ray.job --corpus /data/repos --workdir /data/run1 \
            [--apps pagerank,wcc,cdlp,triangles] [--tol 1e-6] [--partitions 64]

Mines the source-file corpus into the repo→repo link graph, builds the
partitioned CSR fragments, and runs the analytical apps as checkpointed
supersteps — every stage idempotent, so re-submitting the SAME command after
a kill resumes instead of restarting (the reference's equivalent lifecycle
is session reconnect + app re-run over a persisted vineyard graph;
coordinator checkpointing in `python/graphscope/client/session.py`):

1. **mine** — per-input-shard atomic commits + manifest
   (`pipelines/resumable.py`); finished shards are skipped on re-run;
   per-row content-sha256 lineage lands next to each shard's partial edges.
2. **build** — the loaded graph is serialized once
   (`graph/build.py:save_graph`, per-partition Parquet + meta manifest); a
   re-run reloads it and skips the routing shuffle.
3. **apps** — each app runs with `checkpoint_dir=workdir/ckpt/<app>`
   `resume=True`: per-superstep per-partition Parquet state + lineage +
   shuffle/compute metrics, torn-write detection; a job killed mid-iteration
   resumes from the last complete superstep.  Results + metrics are written
   under `workdir/out/<app>/` behind an atomic `_SUCCESS` rename.

Owns its own Ray session when run standalone (`ray.init` guarded): under
`ray job submit` the runtime provides the cluster address via RAY_ADDRESS.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _commit_stage(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as fh:
        fh.write(str(time.time()))


def run_job(
    corpus: str,
    workdir: str,
    apps: list[str],
    tol: float = 1e-6,
    partitions: int = 64,
    checkpoint_every: int = 1,
) -> dict:
    """Execute (or resume) the full job; returns a stage→status summary."""
    import ray.data

    import graphscope_ray.graph.algorithms as alg
    from graphscope_ray.graph.build import build_graph_from_oids, load_graph, save_graph
    from graphscope_ray.pipelines.resumable import mine_corpus_resumable

    os.makedirs(workdir, exist_ok=True)
    summary: dict = {}

    # -- stage 1: mine (per-shard resumable) --------------------------------
    mine_dir = os.path.join(workdir, "mine")
    t0 = time.time()
    if _stage_done(mine_dir):
        edges = ray.data.read_parquet(os.path.join(mine_dir, "edges"))
        summary["mine"] = "skipped (complete)"
    else:
        edges = mine_corpus_resumable(corpus, mine_dir)
        _commit_stage(mine_dir)
        summary["mine"] = f"ran ({time.time() - t0:.1f}s)"

    # -- stage 2: build + serialize (reload skips the routing shuffle) ------
    graph_dir = os.path.join(workdir, "graph")
    t0 = time.time()
    if _stage_done(graph_dir):
        g = load_graph(graph_dir)
        summary["build"] = "skipped (reloaded serialized graph)"
    else:
        n_edges = edges.count()
        p_auto = max(2, min(partitions, n_edges // 50_000 + 1))
        g = build_graph_from_oids(
            edges, num_partitions=p_auto, view="directed", store_in_edges=True
        )
        save_graph(g, graph_dir)
        _commit_stage(graph_dir)
        summary["build"] = f"ran ({time.time() - t0:.1f}s, P={p_auto})"

    # -- stage 3: apps (checkpointed supersteps, resume mid-iteration) ------
    vmap = g.vertices_ds
    for app in apps:
        out_dir = os.path.join(workdir, "out", app)
        if _stage_done(out_dir):
            summary[app] = "skipped (complete)"
            continue
        t0 = time.time()
        ckpt = os.path.join(workdir, "ckpt", app)
        run_kw = dict(checkpoint_dir=ckpt, checkpoint_every=checkpoint_every, resume=True)
        if app == "pagerank":
            state, res = alg.pagerank(g, tol=tol, **run_kw)
        elif app == "wcc":
            state, res = alg.wcc(g, **run_kw)
        elif app == "cdlp":
            state, res = alg.cdlp(g, **run_kw)
        elif app == "triangles":
            # single-pass app: no superstep checkpoint, output commit only
            _, state = alg.triangles(g)
            state = state.select_columns(["vid", "tri"])
            res = None
        else:
            raise SystemExit(f"unknown app {app!r} (pagerank|wcc|cdlp|triangles)")
        tmp = out_dir + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        if vmap is None:
            out = state
        else:
            from graphscope_ray.utils import hash_join

            out = hash_join(state, vmap, "vid", "vid", num_partitions=4)
        out.write_parquet(os.path.join(tmp, "result"))
        meta = {"app": app, "seconds": round(time.time() - t0, 3)}
        if res is not None:
            meta["rounds"] = res.rounds
            with open(os.path.join(tmp, "metrics.json"), "w") as fh:
                json.dump(res.metrics, fh)
        with open(os.path.join(tmp, "meta.json"), "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, out_dir)
        _commit_stage(out_dir)
        summary[app] = f"ran ({meta['seconds']}s" + (
            f", {res.rounds} rounds)" if res is not None else ")"
        )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--corpus", required=True, help="dir of input parquet shards")
    ap.add_argument("--workdir", required=True, help="job state dir (reused on resume)")
    ap.add_argument("--apps", default="pagerank,wcc,cdlp,triangles")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--partitions", type=int, default=64, help="fragment-count cap")
    ap.add_argument("--checkpoint-every", type=int, default=1)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    try:
        summary = run_job(
            args.corpus,
            args.workdir,
            [a.strip() for a in args.apps.split(",") if a.strip()],
            tol=args.tol,
            partitions=args.partitions,
            checkpoint_every=args.checkpoint_every,
        )
        print(json.dumps(summary))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
