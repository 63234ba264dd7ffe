"""Benchmark harness (driver contract: prints ONE JSON line).

Default: headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32).

--scaling: the north-rule two-cluster-size evidence — the SAME synthetic
link-graph PageRank job (V=4M, E=48M, seeded) at num_cpus=8 (P=8 fragments)
and num_cpus=32 (P=32 fragments) in fresh processes; reports throughput in
edges/sec per superstep at both levels and scaling_efficiency =
thr(4N) / (4·thr(N)).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

SCALE_V = 4_000_000
SCALE_E = 48_000_000
SCALE_ROUNDS = 20
CORPUS_DIR = "/tmp/graft_scaling_corpus_v2"
CORPUS_REPOS = 200_000
CORPUS_FILES = 48  # per repo → 9.6M files, ~17 GB parquet


def _init(ncpu: int):
    import logging

    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _scale_edges():
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(7)
    src = rng.randint(0, SCALE_V, SCALE_E, dtype=np.int64)
    dst = rng.randint(0, SCALE_V, SCALE_E, dtype=np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def _ensure_corpus():
    """Deterministic 2.4M-file corpus, generated once in parallel and shared
    by both scaling levels (the north rule requires the same input)."""
    if os.path.exists(os.path.join(CORPUS_DIR, "_DONE")):
        return
    _init(32)
    import ray

    from graphscope_ray.sources.repos import generate_repos_dataset

    ds = generate_repos_dataset(
        n_repos=CORPUS_REPOS,
        files_per_repo=CORPUS_FILES,
        seed=42,
        body_lines=120,
        num_blocks=512,  # ≥512 parquet files → balanced read waves at any P
    )
    ds.write_parquet(CORPUS_DIR)
    open(os.path.join(CORPUS_DIR, "_DONE"), "w").write("ok")
    ray.shutdown()


def _read_clean(path, **kw):
    """read_parquet with metadata-stripped schema (metadata-bearing schemas
    are unhashable -> Ray Data warns on every read)."""
    import pyarrow.parquet as pq

    import ray.data

    sample = path
    import glob as _glob
    import os as _os

    if _os.path.isdir(path):
        sample = sorted(_glob.glob(_os.path.join(path, "*.parquet")))[0]
    schema = pq.read_schema(sample).remove_metadata()
    if "columns" in kw:  # prune the schema with the projection (read less)
        import pyarrow as _pa

        schema = _pa.schema([schema.field(n) for n in kw["columns"]])
    return ray.data.read_parquet(path, schema=schema, **kw)


def scaling_child(ncpu: int, mine_only: bool = False, pr_only: bool = False) -> dict:
    """One cluster size: (a) corpus→edges mining throughput, STREAMING from
    parquet (the pipeline shape at 10^12 files: scan+decode+mine+exchange
    all scale with workers; nothing is pre-materialized), (b) PageRank
    superstep throughput on a 48M-edge synthetic graph via BOTH message
    layouts — shared-scatter (single-node zero-copy) and p2p per-(sender,
    target) objects (the multi-node wire format).  Best-of-2 (run-to-run
    variance on this box is large)."""
    _init(ncpu)
    import ray
    import ray.data

    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph
    from graphscope_ray.pipelines.linkgraph import mine_edges

    n_files = CORPUS_REPOS * CORPUS_FILES
    if pr_only:
        t_mine, n_edges = float("inf"), 0
    else:
        ds = _read_clean(CORPUS_DIR, override_num_blocks=256)
        mine_edges(ds).count()  # warm: page cache + worker pool
        t_mine = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_edges = mine_edges(ds).count()
            t_mine = min(t_mine, time.perf_counter() - t0)
        del ds
    if mine_only:
        out = {
            "ncpu": ncpu,
            "mine_files": n_files,
            "mine_edges": n_edges,
            "t_mine_s": round(t_mine, 3),
            "files_per_sec": round(n_files / t_mine, 1),
        }
        ray.shutdown()
        return out

    t0 = time.perf_counter()
    g = build_graph(_scale_edges(), num_partitions=ncpu, num_vertices=SCALE_V)
    t_build = time.perf_counter() - t0
    t_pr = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, res = alg.pagerank(g, tol=0.0, max_rounds=SCALE_ROUNDS, pipeline=SCALE_ROUNDS)
        t_pr = min(t_pr, time.perf_counter() - t0)
    # p2p layout on the SAME fragments (flip the wire format only).
    # Node-grouped wire: 8 fragments per simulated node at BOTH levels, so
    # ncpu=8 is one node and ncpu=32 is four — the N vs 4N cluster shape.
    # Objects/round: P×⌈P/8⌉ (128 at P=32) instead of P² (1024).
    g.p2p_messages = True
    g.p2p_group = 8
    t_pr_p2p = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, res_p = alg.pagerank(g, tol=0.0, max_rounds=SCALE_ROUNDS, pipeline=SCALE_ROUNDS)
        t_pr_p2p = min(t_pr_p2p, time.perf_counter() - t0)
    out = {
        "ncpu": ncpu,
        **(
            {}
            if pr_only
            else {
                "mine_files": n_files,
                "mine_edges": n_edges,
                "t_mine_s": round(t_mine, 3),
                "files_per_sec": round(n_files / t_mine, 1),
            }
        ),
        "pr_edges": g.num_edges,
        "pr_rounds": res.rounds,
        "t_graph_build_s": round(t_build, 3),
        "t_pagerank_s": round(t_pr, 3),
        "pr_edges_per_sec_per_superstep": round(g.num_edges * res.rounds / t_pr, 0),
        "t_pagerank_p2p_s": round(t_pr_p2p, 3),
        "pr_p2p_edges_per_sec_per_superstep": round(
            g.num_edges * res_p.rounds / t_pr_p2p, 0
        ),
    }
    ray.shutdown()
    return out


def hw_ceiling(n_iter: int = 2500) -> float:
    """The box's own pure-compute scaling ceiling: P independent OS processes
    (zero Ray, zero IO, in-memory data) each run the identical regex kernel;
    returns aggregate-throughput efficiency 8 → 32 processes.  On this
    sandbox VM the vCPUs do not deliver 4× compute from 8 → 32 (host-level
    overcommit/SMT invisible to the guest), so pipeline efficiencies must be
    read against this ceiling — a real 4×-node cluster multiplies whole
    machines instead.

    Instrumentation: workers SELF-TIME their compute window and the wall is
    max(end)-min(start) across workers, so process spawn/teardown (~100 ms
    at P=32, which at small n_iter both skewed the ceiling down and made it
    noisy run-to-run) never enters the measurement; kernel sized ≥1 s so
    scheduler jitter amortizes; best-of-2 per level."""
    import multiprocessing as mp
    import re

    def worker(n, q):
        pat = re.compile(r"^\s*import\s+(\w+)|^\s*from\s+(\w+)\s+import", re.M)
        body = "\n".join(f"import module{i}\nx = {i} * 2  # line" for i in range(60)) * 3
        t0 = time.perf_counter()
        c = 0
        for _ in range(n):
            c += len(pat.findall(body))
        q.put((t0, time.perf_counter()))

    def run(P):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(n_iter, q)) for _ in range(P)]
        [p.start() for p in ps]
        spans = [q.get() for _ in range(P)]
        [p.join() for p in ps]
        wall = max(e for _, e in spans) - min(s for s, _ in spans)
        return P * n_iter / wall

    # best throughput PER LEVEL across trials, then one ratio — a max over
    # per-trial ratios would inflate whenever the window shifts between a
    # trial's 8- and 32-process phases (observed: a "1.66 ceiling")
    t8 = max(run(8) for _ in range(2))
    t32 = max(run(32) for _ in range(2))
    return round(t32 / (4 * t8), 3)


def kernel_ceiling() -> dict:
    """THE decisive scaling control: the identical end-to-end mining kernel
    (parquet read + decode + combined-regex mine + searchsorted resolve +
    packed-key combine) run by P INDEPENDENT OS processes with ZERO Ray —
    each process owns files [p::P] of the same corpus.  Whatever efficiency
    this reaches from 8 → 32 processes is this box's true roof for the
    mining PIPELINE (the regex-only probe is cache-resident and roofs at
    ~0.9; the pipeline also streams ~17 GB through parquet decode, which
    contends on DRAM).  Engine loss = pipeline efficiency ÷ this number."""
    import glob
    import multiprocessing as mp

    _ensure_corpus()
    files = sorted(glob.glob(os.path.join(CORPUS_DIR, "*.parquet")))

    # exports table (module → repo id), computed once, inherited via fork
    import numpy as np
    import pyarrow.parquet as pq

    # scan EVERY file's repo column (cheap single-column read) so the control
    # resolves against the identical module table as the Ray pipeline — a
    # subsampled universe under-resolves and inflates eff_control (ADVICE r3)
    repos_seen = set()
    for f in files:
        repos_seen.update(pq.read_table(f, columns=["repo"])["repo"].to_pylist())
    # module = repo's exported name — the synthetic corpus exports path stem
    # per repo exactly like build_exports derives; module == repo name here
    R = np.array(sorted(repos_seen))
    mod_arr = R.copy()
    dst_ids = np.arange(len(R), dtype=np.int64)

    def worker(p, P, q):
        from graphscope_ray.stages.mine import _combined_patterns, _findall_modules

        pats = _combined_patterns()
        t0 = time.perf_counter()
        nf = 0
        ne = 0
        for f in files[p::P]:
            t = pq.read_table(f, columns=["repo", "lang", "content"])
            langs = t["lang"].to_pylist()
            contents = t["content"].to_pylist()
            repos = t["repo"].to_pylist()
            nf += len(repos)
            src_list, mod_list = [], []
            for r, lang, c in zip(repos, langs, contents):
                pat = pats.get(lang)
                if pat is None:
                    continue
                mods = _findall_modules(pat, c)
                if mods:
                    src_list.extend([r] * len(mods))
                    mod_list.extend(mods)
            if mod_list:
                m = np.asarray(mod_list)
                pos = np.searchsorted(mod_arr, m)
                pos_c = np.minimum(pos, max(len(mod_arr) - 1, 0))
                hit = mod_arr[pos_c] == m
                src = np.asarray(src_list)[hit]
                dst = dst_ids[pos_c[hit]]
                sidx = np.searchsorted(R, src)
                key = (sidx.astype(np.int64) << 32) | dst
                uk, cnt = np.unique(key, return_counts=True)
                ne += len(uk)
        q.put((t0, time.perf_counter(), nf, ne))

    def run(P):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(p, P, q)) for p in range(P)]
        [pr.start() for pr in ps]
        spans = [q.get() for _ in range(P)]
        [pr.join() for pr in ps]
        wall = max(e for _, e, _, _ in spans) - min(s for s, _, _, _ in spans)
        nf = sum(s[2] for s in spans)
        return nf / wall

    thr8 = run(8)
    thr32 = run(32)
    return {
        "metric": "no-Ray full-kernel mining ceiling (P independent processes)",
        "files_per_sec_8": round(thr8, 1),
        "files_per_sec_32": round(thr32, 1),
        "kernel_ceiling_8_to_32": round(thr32 / (4 * thr8), 3),
    }


def _pr_gather_runner():
    """Build the dst-sorted 48M-edge arrays once (fork-shared read-only)
    and return run(P) → aggregate gather edges/s for P no-framework
    processes on static contiguous shards."""
    import multiprocessing as mp

    import numpy as np

    # literally the same graph as scaling_child: one source of truth
    t = _scale_edges()
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int32)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int32)
    del t
    order = np.argsort(dst, kind="stable")
    src = src[order]
    dst = dst[order]
    x = np.full(SCALE_V, 1.0 / SCALE_V, dtype=np.float64)  # fork-shared, RO

    def worker(lo: int, hi: int, q):
        seg = dst[lo:hi]
        starts = np.flatnonzero(
            np.concatenate([[True], seg[1:] != seg[:-1]])
        ).astype(np.int64)
        sidx = src[lo:hi]
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(SCALE_ROUNDS):
            y = np.add.reduceat(x[sidx], starts)
            acc += float(y[0])  # keep the result live
        q.put((t0, time.perf_counter(), (hi - lo) * SCALE_ROUNDS, acc))

    def run(P: int) -> float:
        bounds = np.linspace(0, SCALE_E, P + 1).astype(np.int64)
        q = mp.Queue()
        ps = [
            mp.Process(target=worker, args=(int(bounds[p]), int(bounds[p + 1]), q))
            for p in range(P)
        ]
        [p.start() for p in ps]
        spans = [q.get() for _ in range(P)]
        [p.join() for p in ps]
        wall = max(e for _, e, _, _ in spans) - min(s for s, _, _, _ in spans)
        return sum(s[2] for s in spans) / wall

    return run


def pr_paired() -> dict:
    """ONE-window paired scaling evidence for the NORTH-RULE METRIC:
    hw probe → [gather-control@8, Ray-PR@8, gather-control@32, Ray-PR@32]
    → hw probe, interleaved so control and pipeline see the same box
    conditions at each level (the mining analogue is scaling_paired).
    The control is :func:`pr_control`'s no-framework gather kernel — an
    upper bound on any framework's superstep scaling here."""
    hw_before = hw_ceiling()
    run = _pr_gather_runner()
    res = {}
    ctl = {}
    for ncpu in (8, 32):
        ctl[ncpu] = run(ncpu)
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(ncpu), "--pr-only"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw_after = hw_ceiling()
    eff_ctl = ctl[32] / (4 * ctl[8])
    eff_pr = res[32]["pr_edges_per_sec_per_superstep"] / (
        4 * res[8]["pr_edges_per_sec_per_superstep"]
    )
    eff_p2p = res[32]["pr_p2p_edges_per_sec_per_superstep"] / (
        4 * res[8]["pr_p2p_edges_per_sec_per_superstep"]
    )
    return {
        "metric": "paired one-window PageRank-superstep scaling: no-framework "
        "gather control vs Ray supersteps",
        "control_edges_per_sec_8": round(ctl[8], 0),
        "control_edges_per_sec_32": round(ctl[32], 0),
        "eff_control": round(eff_ctl, 3),
        "pipeline_8": res[8],
        "pipeline_32": res[32],
        "eff_pipeline_shared": round(eff_pr, 3),
        "eff_pipeline_p2p": round(eff_p2p, 3),
        "pipeline_vs_control_at_32": round(
            max(
                res[32]["pr_edges_per_sec_per_superstep"],
                res[32]["pr_p2p_edges_per_sec_per_superstep"],
            )
            / ctl[32],
            3,
        ),
        "hw_compute_ceiling_before": hw_before,
        "hw_compute_ceiling_after": hw_after,
        "window_stable": abs(hw_before - hw_after) <= 0.08,
    }


def pr_control() -> dict:
    """Zero-framework control for the NORTH-RULE METRIC itself (PageRank
    edges/s/superstep): P independent OS processes — no Ray, no object
    store, no exchange — each own a static contiguous shard of the SAME
    48M-edge graph pre-sorted by dst, and run the identical fragment
    gather kernel (``y = np.add.reduceat(x[src_idx], runstarts)``, the
    superstep's DRAM-random inner loop) for SCALE_ROUNDS rounds against a
    fork-shared read-only rank array.  The control does STRICTLY LESS
    than a real superstep (no message combine, no rank update, no
    dangling/L1 pass, perfectly balanced static shards), so its 8→32
    aggregate-throughput efficiency is an UPPER BOUND on what any
    framework could reach for this kernel on this box.  Bracketed by hw
    probes like every paired run."""
    hw_before = hw_ceiling()
    run = _pr_gather_runner()
    thr8 = run(8)
    thr32 = run(32)
    hw_after = hw_ceiling()
    return {
        "metric": "no-Ray PageRank-gather ceiling (P independent processes, "
        "static shards, shared read-only ranks)",
        "edges_per_sec_per_superstep_8": round(thr8, 0),
        "edges_per_sec_per_superstep_32": round(thr32, 0),
        "pr_gather_ceiling_8_to_32": round(thr32 / (4 * thr8), 3),
        "hw_compute_ceiling_before": hw_before,
        "hw_compute_ceiling_after": hw_after,
        "window_stable": abs(hw_before - hw_after) <= 0.08,
    }


def scaling_paired() -> dict:
    """ONE-window scaling evidence: hw probe → [control@8, pipeline@8,
    control@32, pipeline@32] → hw probe, interleaved so every ratio is
    same-window.  control = kernel_ceiling's no-Ray process fan-out;
    pipeline = the Ray mining child.  The pair of within-level ratios
    (pipeline ÷ control) isolates engine overhead from the box's own
    scaling roof."""
    _ensure_corpus()
    hw_before = hw_ceiling()
    ctl = kernel_ceiling()
    res = {}
    for ncpu in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(ncpu), "--mine-only"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw_after = hw_ceiling()
    eff_pipe = res[32]["files_per_sec"] / (4 * res[8]["files_per_sec"])
    eff_ctl = ctl["files_per_sec_32"] / (4 * ctl["files_per_sec_8"])
    return {
        "metric": "paired one-window scaling: no-Ray control vs Ray pipeline",
        "control": ctl,
        "pipeline_8": res[8],
        "pipeline_32": res[32],
        "eff_pipeline": round(eff_pipe, 3),
        "eff_control": round(eff_ctl, 3),
        "pipeline_vs_control_at_8": round(
            res[8]["files_per_sec"] / ctl["files_per_sec_8"], 3
        ),
        "pipeline_vs_control_at_32": round(
            res[32]["files_per_sec"] / ctl["files_per_sec_32"], 3
        ),
        "hw_compute_ceiling_before": hw_before,
        "hw_compute_ceiling_after": hw_after,
        "window_stable": abs(hw_before - hw_after) <= 0.08,
    }


def scaling_mine_only() -> dict:
    """Cheap mining-only retry of the scaling protocol (~5 min): bracketed
    hw probes + the corpus→edges pipeline at 8 and 32 CPUs.  Used to hunt a
    calm VM window without re-running the PageRank half."""
    _ensure_corpus()
    hw_before = hw_ceiling()
    res = {}
    for ncpu in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(ncpu), "--mine-only"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw_after = hw_ceiling()
    eff = res[32]["files_per_sec"] / (4 * res[8]["files_per_sec"])
    hw = min(hw_before, hw_after)
    return {
        "metric": "mining-only scaling retry",
        "n8": res[8],
        "n32": res[32],
        "scaling_efficiency_mining": round(eff, 3),
        "hw_compute_ceiling_before": hw_before,
        "hw_compute_ceiling_after": hw_after,
        "window_stable": abs(hw_before - hw_after) <= 0.08,
        "scaling_efficiency_vs_hw_ceiling": round(eff / hw, 3) if hw else None,
    }


def scaling() -> dict:
    _ensure_corpus()
    # BRACKETING probes: the box's own pure-compute ceiling measured BEFORE
    # and AFTER the pipeline runs — a window is only trustworthy when both
    # probes agree (this VM has documented degraded windows where identical
    # work runs 2-4× slower; see BASELINE.md).
    hw_before = hw_ceiling()
    res = {}
    for ncpu in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(ncpu)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        res[ncpu] = json.loads(out.strip().splitlines()[-1])
    hw_after = hw_ceiling()
    lo, hi = res[8], res[32]
    eff_mine = hi["files_per_sec"] / (4 * lo["files_per_sec"])
    eff_pr = hi["pr_edges_per_sec_per_superstep"] / (4 * lo["pr_edges_per_sec_per_superstep"])
    eff_p2p = hi["pr_p2p_edges_per_sec_per_superstep"] / (
        4 * lo["pr_p2p_edges_per_sec_per_superstep"]
    )
    hw = min(hw_before, hw_after)
    return {
        "metric": "throughput at N=8 vs 4N=32 cpus, same inputs, fresh processes",
        "n8": lo,
        "n32": hi,
        "scaling_efficiency_mining": round(eff_mine, 3),
        "scaling_efficiency_pagerank_supersteps": round(eff_pr, 3),
        "scaling_efficiency_pagerank_p2p": round(eff_p2p, 3),
        # this VM's own pure-compute 8→32 process scaling (no Ray, no IO):
        # the achievable ceiling the pipeline numbers must be read against,
        # probed before AND after so the window is provably stable
        "hw_compute_ceiling_before": hw_before,
        "hw_compute_ceiling_after": hw_after,
        "hw_compute_ceiling_8_to_32": hw,
        "window_stable": abs(hw_before - hw_after) <= 0.08,
        "scaling_efficiency_vs_hw_ceiling": round(eff_mine / hw, 3) if hw else None,
        "scaling_efficiency": round(eff_mine, 3),
    }


# ---------------------------------------------------------------------------


def _headline_pass(meta: dict) -> dict:
    """One full timed pass over the headline stages (graph cache cleared so
    every stage does real work)."""
    import numpy as np
    import ray
    import ray.data

    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.pipelines import testdata as td
    from graphscope_ray.pipelines.linkgraph import flagship
    from graphscope_ray.sources import generate_repos

    td._GRAPH_CACHE.clear()
    qtimes: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        qtimes[name] = round(time.perf_counter() - t0, 3)
        return r

    P = min(NCPU, 16)
    timed("lg_build", lambda: td.lg_graph(SF_DIR, num_partitions=P))
    g = td.lg_graph(SF_DIR, num_partitions=P)

    def _pr():
        ds, res = alg.pagerank(g, tol=1e-6)
        ds.count()
        meta["rounds"] = res.rounds
        return res

    timed("pagerank_1e6", _pr)
    timed("wcc", lambda: alg.wcc(td.lg_graph(SF_DIR, num_partitions=P))[0].count())
    timed("cdlp", lambda: alg.cdlp(td.lg_graph(SF_DIR, num_partitions=P))[0].count())
    timed("triangles", lambda: alg.triangles(td.lg_graph(SF_DIR, num_partitions=P))[0])
    repos = generate_repos(n_repos=2000, seed=42, mean_files=6)
    timed("mine_flagship", lambda: flagship(ray.data.from_arrow(repos), num_partitions=P))
    timed("text_tokens", lambda: __import__("graphscope_ray.functions.text", fromlist=["token_counts"]).token_counts(_read_clean(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])).count())
    from graphscope_ray.functions.dedup import exact_dedup
    from graphscope_ray.functions.similarity import topk_cosine

    timed("dedup_exact", lambda: exact_dedup(_read_clean(f"{SF_DIR}/documents.parquet")).count())

    timed("sim_topk", lambda: topk_cosine(
        _read_clean(f"{SF_DIR}/embeddings.parquet"), meta["qv"],
        np.arange(len(meta["qv"])), k=10).count())
    meta["num_edges"] = g.num_edges
    return qtimes


def ivf_evidence() -> dict:
    """Evidence that the materialized IVF index prunes READS with nprobe
    (VERDICT r3 #1 'done' criterion): build the centroid-partitioned index
    over the sf embeddings once, then search at nprobe = 1 / 4 / all and
    report clusters read + wall time per level."""
    import shutil
    import tempfile

    import numpy as np

    _init(NCPU)
    import ray

    from graphscope_ray.functions.similarity import build_ivf_index, ivf_topk_indexed

    emb = _read_clean(f"{SF_DIR}/embeddings.parquet")
    qdf = emb.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qids = qdf["vec_id"].to_numpy()
    path = tempfile.mkdtemp(prefix="ivfbench_", dir="/tmp")
    out = {"metric": "ivf indexed search: clusters read / time vs nprobe", "levels": []}
    try:
        t0 = time.perf_counter()
        build_ivf_index(emb, path, n_clusters=32, resume=False)
        out["build_sec"] = round(time.perf_counter() - t0, 3)
        for nprobe in (1, 4, 32):
            t0 = time.perf_counter()
            ds, stats = ivf_topk_indexed(path, Q, qids, k=10, nprobe=nprobe)
            n = ds.count()
            out["levels"].append(
                {
                    "nprobe": nprobe,
                    "clusters_read": stats["clusters_read"],
                    "clusters_total": stats["clusters_total"],
                    "rows": n,
                    "sec": round(time.perf_counter() - t0, 3),
                }
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    ray.shutdown()
    return out


def lsh_evidence() -> dict:
    """Evidence that the materialized LSH dedup index prunes READS with the
    probe batch (the incremental-ingest criterion, mirroring
    --ivf-evidence): build the index once over the sf documents at high
    partition count, then probe with batches of 2 and 16 docs and report
    bucket partitions / bytes read vs the index total."""
    import shutil
    import tempfile

    _init(NCPU)
    import ray

    from graphscope_ray.functions.dedup import build_lsh_index, lsh_index_probe

    docs = _read_clean(f"{SF_DIR}/documents.parquet")
    path = tempfile.mkdtemp(prefix="lshbench_", dir="/tmp")
    out = {"metric": "lsh indexed probe: partitions read / bytes vs batch size", "levels": []}
    try:
        t0 = time.perf_counter()
        build_lsh_index(docs, path, bucket_parts=256, sig_parts=128)
        out["build_sec"] = round(time.perf_counter() - t0, 3)
        for nbatch in (2, 16):
            probe = docs.map_batches(
                lambda t, nb=nbatch: t.filter(
                    t["doc_id"].to_numpy(zero_copy_only=False) < nb
                ),
                batch_format="pyarrow",
            )
            stats: dict = {}
            t0 = time.perf_counter()
            n = lsh_index_probe(probe, path, threshold=0.9, stats_out=stats).count()
            out["levels"].append(
                {
                    "batch_docs": nbatch,
                    "pairs": n,
                    "sec": round(time.perf_counter() - t0, 3),
                    **stats,
                }
            )
    finally:
        shutil.rmtree(path, ignore_errors=True)
    ray.shutdown()
    return out


def compact_evidence() -> dict:
    """compact_edges residency measurement on the 48M-edge synthetic: build
    raw vs varint+delta fragments, report resident adjacency bytes and a
    PageRank superstep timing on each (bit-identity is pytest-gated)."""
    _init(NCPU)
    import ray

    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph

    t = _scale_edges()
    out = {"metric": "compact_edges residency on 48M-edge graph", "layouts": {}}
    for label, compact in (("raw", False), ("compact", True)):
        g = build_graph(
            ray.data.from_arrow(t), num_partitions=min(NCPU, 16),
            num_vertices=SCALE_V, compact=compact,
        )
        rep = g.memory_report()
        t0 = time.perf_counter()
        _, res = alg.pagerank(g, tol=0.0, max_rounds=3)
        dt = time.perf_counter() - t0
        out["layouts"][label] = {
            "resident_bytes": rep["total_bytes"],
            "bytes_per_edge": round(rep["bytes_per_edge"], 2),
            "pagerank_3rounds_sec": round(dt, 3),
        }
        for a in g.actors:
            ray.kill(a)
    raw = out["layouts"]["raw"]["resident_bytes"]
    cmp_ = out["layouts"]["compact"]["resident_bytes"]
    out["residency_ratio"] = round(cmp_ / raw, 3) if raw else None
    ray.shutdown()
    return out


def headline() -> dict:
    """Per-stage BEST-OF-2 over two full passes: run-to-run variance on this
    VM is 2-4× minute-to-minute on identical work (BASELINE.md degraded-VM
    windows), so a single draw measures the window, not the engine."""
    _init(NCPU)
    import numpy as np
    import ray

    # warm the page cache (untimed)
    _read_clean(f"{SF_DIR}/lineitem.parquet").count()
    qdf = _read_clean(f"{SF_DIR}/documents.parquet").count()
    emb = _read_clean(f"{SF_DIR}/embeddings.parquet").to_pandas()
    meta = {"qv": np.stack(emb[emb.vec_id < 16].sort_values("vec_id")["embedding"].to_numpy())}

    qtimes: dict[str, float] = {}
    for _rep in range(2):
        for k, v in _headline_pass(meta).items():
            qtimes[k] = min(qtimes.get(k, float("inf")), v)

    # round-4 ops measured SEPARATELY (not in `value`, so round-over-round
    # totals stay comparable): substring dedup, char-LM scoring, PQ ANN
    extras: dict[str, float] = {}

    def timed_extra(name, fn):
        t0 = time.perf_counter()
        fn()
        extras[name] = round(time.perf_counter() - t0, 3)

    from graphscope_ray.functions.dedup import substring_dup_stats
    from graphscope_ray.functions.similarity import pq_encode, pq_topk_refined, train_pq
    from graphscope_ray.functions.text import charlm_xent

    docs = _read_clean(f"{SF_DIR}/documents.parquet")
    timed_extra("dedup_substring", lambda: substring_dup_stats(docs).count())
    timed_extra("text_charlm", lambda: charlm_xent(docs).count())

    def _pq():
        e = _read_clean(f"{SF_DIR}/embeddings.parquet")
        books = train_pq(e, m=8, seed=0)
        codes = pq_encode(e, books).materialize()
        pq_topk_refined(
            codes, e, books, meta["qv"][:5], np.arange(5), k=10, candidates=100
        ).count()

    timed_extra("sim_pq_refined", _pq)

    from graphscope_ray.functions.dedup import build_lsh_index, lsh_index_probe, paragraph_dedup
    from graphscope_ray.functions.text import char_entropy

    timed_extra("dedup_paragraph", lambda: paragraph_dedup(docs, words=8).count())
    timed_extra("text_entropy", lambda: char_entropy(docs).count())

    def _dsir():
        from graphscope_ray.functions.dsir import dsir_select

        dsir_select(
            docs.select_columns(["doc_id", "text", "lang"]),
            target_col="lang",
            target_val="en",
            k=200,
        )

    timed_extra("samp_dsir", _dsir)

    def _lsh_incr():
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="bench_lsh_")
        try:
            old = docs.map_batches(
                lambda t: t.filter(t["doc_id"].to_numpy(zero_copy_only=False) % 41 != 3),
                batch_format="pyarrow",
            )
            new = docs.map_batches(
                lambda t: t.filter(t["doc_id"].to_numpy(zero_copy_only=False) % 41 == 3),
                batch_format="pyarrow",
            )
            build_lsh_index(old, d)
            lsh_index_probe(new, d).count()
        finally:
            shutil.rmtree(d, ignore_errors=True)

    timed_extra("dedup_lsh_incr", _lsh_incr)

    from graphscope_ray.functions.sketch import hll_count_by
    from graphscope_ray.functions.text import normalize_text

    timed_extra("text_norm", lambda: normalize_text(docs).count())
    li = _read_clean(f"{SF_DIR}/lineitem.parquet").select_columns(
        ["l_returnflag", "l_partkey"]
    )
    timed_extra("op_hll_by", lambda: hll_count_by(li, "l_returnflag", "l_partkey", p=10))

    def _priority():
        import pyarrow as pa
        import pyarrow.compute as pc

        from graphscope_ray.functions.sampling import priority_sample

        wt = docs.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        priority_sample(wt, key="doc_id", weight_col="n_chars", k=50, salt=11)

    timed_extra("samp_priority", _priority)

    def _gremlin():
        from graphscope_ray.graph.gremlin import P, traversal
        from graphscope_ray.pipelines.testdata import _tripartite_pgraph

        g = traversal(_tripartite_pgraph(SF_DIR), num_partitions=16)
        (
            g.V()
            .hasLabel("customer")
            .has("c_acctbal", P.gt(5000))
            .out("places")
            .out("contains")
            .count()
        )

    timed_extra("gremlin_2hop", _gremlin)

    def _semdedup():
        from graphscope_ray.functions.dedup import semdedup

        emb = _read_clean(f"{SF_DIR}/embeddings.parquet")
        semdedup(emb, k=8, iters=3, threshold=0.95).count()

    timed_extra("dedup_semantic", _semdedup)

    def _gnn_prep():
        # the GNN training-data loader family over the link graph: layered
        # fanout sampling, negative pairs, and neighborhood feature sums
        import numpy as np
        import pyarrow as pa

        from graphscope_ray.graph.minibatch import (
            khop_sample,
            negative_sample,
            neighbor_feature_sum,
        )
        from graphscope_ray.pipelines.testdata import LG_MOD, lg_edges
        from graphscope_ray.utils import hash_groupby_sum

        e = lg_edges(SF_DIR).materialize()
        khop_sample(e, np.arange(0, LG_MOD, 97), [4, 3], salt=5, pair_mod=LG_MOD).count()

        def _ends(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"oid": pa.array([], pa.int64())})
            return pa.table(
                {"oid": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])}
            )

        verts = hash_groupby_sum(
            e.map_batches(_ends, batch_format="pyarrow"), ["oid"], None, "__n",
            num_partitions=8,
        ).select_columns(["oid"])
        negative_sample(e, verts, n_universe=LG_MOD, k=3, salt=7).count()

        emb = _read_clean(f"{SF_DIR}/embeddings.parquet").to_pandas()
        mat = np.round(
            np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        vids = np.arange(LG_MOD, dtype=np.int64)
        neighbor_feature_sum(e, feat_ids=vids, feat_mat=mat[vids % len(emb)]).count()

    timed_extra("gnn_prep", _gnn_prep)

    def _winnow():
        from graphscope_ray.functions.text import winnow_fingerprints

        winnow_fingerprints(docs, k=5, w=4).count()

    timed_extra("text_winnow", _winnow)

    def _gopher():
        from graphscope_ray.functions.text import gopher_repetition

        gopher_repetition(docs).count()

    timed_extra("text_gopher", _gopher)

    def _bproj():
        import pyarrow as pa

        from graphscope_ray.graph.metrics import bipartite_projection

        li = _read_clean(f"{SF_DIR}/lineitem.parquet").select_columns(
            ["l_orderkey", "l_partkey"]
        )

        def _bp(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o": t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "p": (t["l_partkey"].to_numpy(zero_copy_only=False) % 1000).astype(
                        np.int64
                    ),
                }
            )

        bipartite_projection(
            li.map_batches(_bp, batch_format="pyarrow"), "o", "p", max_fanout=5
        ).count()

    timed_extra("bipartite_proj", _bproj)

    def _salsa():
        from graphscope_ray.graph.metrics import salsa
        from graphscope_ray.pipelines.testdata import _sparse_edges_ds

        salsa(_sparse_edges_ds(SF_DIR), iters=5).count()

    def _wclust():
        import pyarrow as pa

        from graphscope_ray.graph.metrics import weighted_clustering

        li = _read_clean(f"{SF_DIR}/lineitem.parquet").select_columns(
            ["l_orderkey", "l_partkey"]
        )

        def _we(t: pa.Table) -> pa.Table:
            # the SPARSE edge multiset (the dense sf0.1 multiplicity graph is
            # ~64% dense — adversarial for any triangle enumerator; the link
            # graph north star is sparse), multiplicity weights via weight=1
            src = t["l_orderkey"].to_numpy(zero_copy_only=False) % 1000
            dst = t["l_partkey"].to_numpy(zero_copy_only=False) % 1000
            keep = (src != dst) & ((src * 31 + dst * 17) % 20 == 0)
            return pa.table(
                {
                    "src": pa.array(src[keep].astype(np.int64)),
                    "dst": pa.array(dst[keep].astype(np.int64)),
                    "weight": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                }
            )

        weighted_clustering(li.map_batches(_we, batch_format="pyarrow")).count()

    timed_extra("salsa", _salsa)
    timed_extra("weighted_clustering", _wclust)

    total = round(sum(qtimes.values()), 3)
    out = {
        "metric": "headline pipelines wall-clock (per-stage best-of-2)",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "extras": extras,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "pagerank_rounds": meta.get("rounds"),
        "pagerank_edges": meta.get("num_edges"),
        "pagerank_edges_per_sec_per_superstep": round(
            meta.get("num_edges", 0) * meta.get("rounds", 1)
            / max(qtimes["pagerank_1e6"], 1e-9), 0
        ),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        print(
            json.dumps(
                scaling_child(
                    int(sys.argv[sys.argv.index("--scaling-child") + 1]),
                    mine_only="--mine-only" in sys.argv,
                    pr_only="--pr-only" in sys.argv,
                )
            )
        )
    elif "--scaling-mine" in sys.argv:
        print(json.dumps(scaling_mine_only()))
    elif "--kernel-ceiling" in sys.argv:
        print(json.dumps(kernel_ceiling()))
    elif "--scaling-paired" in sys.argv:
        print(json.dumps(scaling_paired()))
    elif "--pr-control" in sys.argv:
        print(json.dumps(pr_control()))
    elif "--pr-paired" in sys.argv:
        print(json.dumps(pr_paired()))
    elif "--hw-probe" in sys.argv:
        print(json.dumps({"hw_compute_ceiling": hw_ceiling()}))
    elif "--scaling" in sys.argv:
        print(json.dumps(scaling()))
    elif "--ivf-evidence" in sys.argv:
        print(json.dumps(ivf_evidence()))
    elif "--lsh-evidence" in sys.argv:
        print(json.dumps(lsh_evidence()))
    elif "--compact-evidence" in sys.argv:
        print(json.dumps(compact_evidence()))
    else:
        print(json.dumps(headline()))
