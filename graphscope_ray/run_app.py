"""CLI golden-test runner — the analogue of the reference's `run_app`
(`analytical_engine/test/run_app.h:74-138`, driven by
`test/app_tests.sh:403-417`):

    python -m graphscope_ray.run_app --efile edges.parquet \
        --application pagerank --out_prefix /tmp/out \
        [--source 0] [--k 3] [--max-rounds 10] [--partitions 8]

Reads an edge table (parquet with src/dst[/weight] columns, or whitespace
`src dst [w]` text like the reference's .e files), runs the app, and writes
`<out_prefix>/result` in the reference's golden format (oid value, sorted
numerically) plus Parquet.  Owns its own Ray session (the only CLI that
does, per the driver contract).
"""

from __future__ import annotations

import argparse


def _read_edges(path: str):
    import pyarrow as pa
    import ray.data

    if path.endswith(".parquet") or path.endswith("/"):
        return ray.data.read_parquet(path)
    if path.endswith(".csv"):
        from graphscope_ray.sources.csv import read_csv_source

        return read_csv_source(path)
    # reference .e format: "src dst [weight]" lines
    src, dst, w = [], [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 2:
                continue
            src.append(int(parts[0]))
            dst.append(int(parts[1]))
            w.append(float(parts[2]) if len(parts) > 2 else 1.0)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--efile", required=True, help="edge table (.parquet or 'src dst' text)")
    ap.add_argument(
        "--application",
        required=True,
        choices=[
            "pagerank", "wcc", "cdlp", "triangles", "sssp", "bfs", "hits",
            "kcore", "eigenvector", "katz", "lcc", "degree",
            "kshell", "louvain", "closeness", "apsp", "dfs", "voterank",
            "betweenness", "scc", "pagerank_weighted",
        ],
    )
    ap.add_argument("--out_prefix", required=True)
    ap.add_argument(
        "--format",
        choices=["golden", "csv"],
        default="golden",
        help="'csv' also writes result.csv (ctx.output file:// parity)",
    )
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--source", type=int, default=0)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--alpha", type=float, default=0.85, help="pagerank damping")
    ap.add_argument("--katz-alpha", type=float, default=0.1, help="katz attenuation")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument(
        "--unweighted",
        action="store_true",
        help="ignore the weight column even when the input has one",
    )
    ap.add_argument("--max-rounds", type=int, default=None)
    ap.add_argument("--hub-threshold", type=int, default=None)
    ap.add_argument(
        "--partitioner", choices=("hash", "affinity"), default="hash",
        help="vertex routing: hash (owner = vid %% P) or the round-5 "
        "neighbor-affinity locality partitioner (graph/partition.py)",
    )
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    import logging
    import os

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from graphscope_ray.graph import algorithms as alg
    from graphscope_ray.graph.build import build_graph

    edges = _read_edges(args.efile)
    # weighted by default when the input carries weights (the reference's
    # golden SSSP fixtures are weighted — run_app.h:96 load_graph_spec)
    has_weight = "weight" in edges.schema().names and not args.unweighted
    if args.partitioner == "affinity":
        from graphscope_ray.graph.partition import build_graph_locality

        if args.hub_threshold is not None:
            raise SystemExit("--partitioner affinity does not combine with "
                             "--hub-threshold (pick one skew strategy)")
        g = build_graph_locality(
            edges,
            num_partitions=args.partitions,
            store_in_edges=True,
            weight=has_weight,
            init="segmented",
        )
        # g.vertices_ds maps input ids -> relabeled vids; export_golden
        # decodes through it, so the output format matches the hash build
    else:
        g = build_graph(
            edges,
            num_partitions=args.partitions,
            store_in_edges=True,
            weight=has_weight,
            hub_threshold=args.hub_threshold,
        )
    run_kw = {}
    if args.checkpoint_dir:
        run_kw = {"checkpoint_dir": args.checkpoint_dir, "resume": args.resume}
    app = args.application
    if app == "pagerank":
        ds, res = alg.pagerank(g, alpha=args.alpha, tol=args.tol,
                               max_rounds=args.max_rounds or 100, **run_kw)
        col = "score"
    elif app == "wcc":
        ds, res = alg.wcc(g, **run_kw)
        col = "comp"
    elif app == "cdlp":
        ds, res = alg.cdlp(g, max_rounds=args.max_rounds or 10, **run_kw)
        col = "label"
    elif app == "triangles":
        total, ds = alg.triangles(g)
        print(f"total_triangles {total}")
        col = "tri"
    elif app == "sssp":
        ds, res = alg.sssp(g, source=args.source, **run_kw)
        col = "dist"
    elif app == "bfs":
        ds, res = alg.bfs(g, source=args.source, **run_kw)
        col = "depth"
    elif app == "hits":
        ds, res = alg.hits(g, tol=args.tol, max_rounds=args.max_rounds or 100)
        col = "auth"
    elif app == "kcore":
        ds, res = alg.kcore(g, k=args.k, **run_kw)
        col = "in_core"
    elif app == "eigenvector":
        ds, res = alg.eigenvector_centrality(g, max_rounds=args.max_rounds or 100)
        col = "centrality"
    elif app == "katz":
        ds, res = alg.katz_centrality(g, alpha=args.katz_alpha,
                                      max_rounds=args.max_rounds or 100)
        col = "centrality"
    elif app == "lcc":
        ds = alg.lcc(g)
        col = "lcc"
    elif app == "kshell":
        ds = alg.kshell(g)
        col = "shell"
    elif app == "louvain":
        ds, _q = alg.louvain(g)
        col = "comm"
    elif app == "closeness":
        ds = alg.closeness_exact(g)
        col = "closeness"
    elif app == "apsp":
        # golden export is (oid, value): emit per-source OUT-eccentricity
        # (max finite distance) from the all-pairs (src, dst, dist) rows
        import pyarrow as pa
        import ray.data as rd

        pairs = alg.apsp(g, sources=list(range(min(g.N, 4096)))).to_pandas()
        ecc = pairs.groupby("src")["dist"].max().reset_index()
        ds = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array(ecc["src"].to_numpy()),
                    "ecc": pa.array(ecc["dist"].to_numpy().astype("float64")),
                }
            )
        )
        col = "ecc"
    elif app == "betweenness":
        ds = alg.betweenness_sampled(g, sources=list(range(min(g.N, args.k or 8))))
        col = "betweenness"
    elif app == "scc":
        ds, res = alg.scc(g)
        col = "scc"
    elif app == "pagerank_weighted":
        ds, res = alg.pagerank_weighted(g, alpha=args.alpha, tol=args.tol,
                                        max_rounds=args.max_rounds or 100)
        col = "score"
    elif app == "dfs":
        ds = alg.dfs(g, source=args.source)
        col = "order"
    elif app == "voterank":
        elected = alg.voterank(g, num_elected=args.k)
        import pyarrow as pa
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array([int(v) for v in elected], pa.int64()),
                    "rank": pa.array(list(range(len(elected))), pa.int64()),
                }
            )
        )
        col = "rank"
    else:  # degree
        ds = alg.degree_centrality(g).select_columns(["vid", "degree"])
        col = "degree"
    os.makedirs(args.out_prefix, exist_ok=True)
    out = alg.export_golden(
        g, ds.select_columns(["vid", col]), col, os.path.join(args.out_prefix, "result")
    )
    if args.format == "csv":
        # ctx.output(fd="file://…") parity (framework/context.py:232-277):
        # the same sorted rows as a headered CSV next to the golden file
        import pandas as _pd

        _pd.read_parquet(out + ".parquet").to_csv(out + ".csv", index=False)
        print(f"wrote {out} (+ .parquet, .csv)")
    else:
        print(f"wrote {out} (+ .parquet)")
    ray.shutdown()


if __name__ == "__main__":
    main()
