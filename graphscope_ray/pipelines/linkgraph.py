"""End-to-end link-graph pipeline: repos table → edges → Graph → analytics.

The flagship path of the north star: read the source-file table, compute
sha256 lineage, mine import references, resolve them to repo→repo edges
(broadcast join), build partitioned CSR fragments, run the four analytical
apps as supersteps.  Matches the reference lifecycle
(SURVEY.md §3.1: load → project → app → context) re-expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from graphscope_ray.graph import algorithms as alg
from graphscope_ray.graph.build import Graph, build_graph_from_oids
from graphscope_ray.stages.ingest import lineage, with_sha256
from graphscope_ray.stages.mine import build_exports, mine_imports, resolve_edges


def mine_edges(
    repos_ds: ray.data.Dataset,
    lineage_path: str | None = None,
    K: int = 32,
) -> ray.data.Dataset:
    """repos table → distinct weighted edge table (src_oid, dst_oid, weight).

    Two physical plans:
    - no lineage sink (default): exports derive from a column-pruned
      (repo, path) pass that never touches file bodies, then ONE fused
      streaming pass does mine → broadcast resolve → local combine
      (stages/mine.mine_edge_partials); only tiny (src, dst, n) partials
      enter the final hash exchange.  No scan materialization, no driver
      barrier between mining and the exchange.
    - lineage requested: the scan_corpus pass (sha256 + mining fused, the
      north-star per-row content-sha256 invariant) is materialized once and
      feeds both the lineage sink and the edge derivation."""
    from graphscope_ray.stages.mine import (
        build_exports,
        exchange_edge_counts,
        mine_edge_partials,
        resolve_edges_fused,
        scan_corpus,
    )

    if lineage_path:
        scan = scan_corpus(repos_ds).materialize()
        scan.select_columns(["repo", "path", "commit", "content_sha256"]).write_parquet(
            lineage_path
        )

        def _dedup_batch(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(
                t.to_pandas().drop_duplicates(), preserve_index=False
            ).replace_schema_metadata(None)

        exports = (
            scan.select_columns(["export_module", "repo"])
            .map_batches(_dedup_batch, batch_format="pyarrow")
            .repartition(8)
            .map_batches(_dedup_batch, batch_format="pyarrow")
            .to_pandas()
            .drop_duplicates()
            .rename(columns={"export_module": "module"})
        )
        return resolve_edges_fused(scan.select_columns(["repo", "modules"]), exports)

    exports = build_exports(repos_ds)
    partials, repo_universe = mine_edge_partials(repos_ds, exports)
    return exchange_edge_counts(partials, repo_universe, K=K)


def build_link_graph(
    repos_ds: ray.data.Dataset,
    num_partitions: int = 8,
    view: str = "directed",
    lineage_path: str | None = None,
    **kwargs,
) -> Graph:
    edges = mine_edges(repos_ds, lineage_path=lineage_path)
    return build_graph_from_oids(
        edges, num_partitions=num_partitions, view=view, **kwargs
    )


def _with_oids(g: Graph, ds: ray.data.Dataset, value_cols: list[str]) -> pd.DataFrame:
    """Join a vid-space result back to repo oids (small driver-side result)."""
    vmap = g.vertices_ds.to_pandas()
    out = ds.to_pandas().merge(vmap, on="vid")
    return out[["oid"] + value_cols].sort_values("oid").reset_index(drop=True)


def flagship(repos_ds: ray.data.Dataset, num_partitions: int = 8) -> pd.DataFrame:
    """PageRank to 1e-6 + WCC + CDLP + triangle counts over ONE mined graph
    (directed + in-edges — the GRAPE fragment shape, loaded once and reused
    across apps); one row per repo: (oid, score, comp, label, tri).

    ``num_partitions`` is a CAP: the actual fragment count scales with the
    mined edge count (~1 fragment per 50k edges, ≥2) — a 2k-repo test graph
    gets 2 fragments (minimal superstep sync cost) while a web-scale mine
    saturates the cap.  Partition count ∝ data, not cluster, is the policy
    everywhere (SURVEY §4 partitioning row)."""
    edges = mine_edges(repos_ds).materialize()
    p_auto = max(2, min(num_partitions, edges.count() // 50_000 + 1))
    g = build_graph_from_oids(
        edges, num_partitions=p_auto, view="directed", store_in_edges=True
    )
    pr, _ = alg.pagerank(g, tol=1e-6)
    comp, _ = alg.wcc(g)
    _, tri = alg.triangles(g)
    lab, _ = alg.cdlp(g)
    out = _with_oids(g, pr, ["score"])
    out = out.merge(_with_oids(g, comp, ["comp"]), on="oid")
    out = out.merge(_with_oids(g, tri.select_columns(["vid", "tri"]), ["tri"]), on="oid")
    out = out.merge(_with_oids(g, lab, ["label"]), on="oid")
    return out
