"""Resumable sharded corpus mining — the ingest-stage checkpoint story.

At 10^12-file scale the corpus is a directory of many Parquet shards and the
scan is the dominant cost; a killed job must not rescan finished shards.
Layout (ray_guide "Sources & sinks" resumability pattern):

    out_dir/
      shards/<shard_name>/          one directory per INPUT shard, written
        lineage-*.parquet           atomically (tmp dir + rename):
        partial_edges-*.parquet     sha256 lineage + partial edge counts
      manifest.json                 {shard_name: {"rows": n, "sha": ...}}
      edges/                        final merged edge table (after all shards)

Resume = rerun the same command; shards present in the manifest are skipped.
The per-row sha256(content) invariant is preserved in each shard's lineage
output.  The final edge merge is a hash exchange over the (small) partial
edge tables only — no corpus re-read.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from graphscope_ray.stages.mine import resolve_edges_fused, scan_corpus
from graphscope_ray.utils import hash_groupby_sum


def _load_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "manifest.json")
    if os.path.exists(p):
        with open(p) as fh:
            return json.load(fh)
    return {}


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def mine_corpus_resumable(
    input_dir: str,
    out_dir: str,
    exports: pd.DataFrame | None = None,
) -> ray.data.Dataset:
    """Mine every Parquet shard under input_dir into per-shard lineage +
    partial edges, skipping shards already in the manifest; then merge the
    partials into the final weighted edge table.

    exports: module→repo table; if None, derived from the full corpus first
    (cheap narrow scan).  Returns the merged edges Dataset.
    """
    os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
    manifest = _load_manifest(out_dir)
    shards = sorted(
        f for f in os.listdir(input_dir) if f.endswith(".parquet") and not f.startswith("_")
    )
    if exports is None:
        full = ray.data.read_parquet(input_dir)
        scan = scan_corpus(full)

        def _dedup(t: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(t.to_pandas().drop_duplicates(), preserve_index=False)

        exports = (
            scan.select_columns(["export_module", "repo"])
            .map_batches(_dedup, batch_format="pyarrow")
            .to_pandas()
            .drop_duplicates()
            .rename(columns={"export_module": "module"})
        )

    for shard in shards:
        if shard in manifest:
            continue  # resume: finished shard, skip
        shard_out = os.path.join(out_dir, "shards", shard)
        tmp_out = shard_out + ".tmp"
        if os.path.exists(tmp_out):
            shutil.rmtree(tmp_out)  # torn write from a killed run
        ds = ray.data.read_parquet(os.path.join(input_dir, shard))
        scan = scan_corpus(ds).materialize()
        n_rows = scan.count()
        os.makedirs(tmp_out, exist_ok=True)
        scan.select_columns(["repo", "path", "commit", "content_sha256"]).write_parquet(
            os.path.join(tmp_out, "lineage")
        )
        edges = resolve_edges_fused(
            scan.select_columns(["repo", "modules"]), exports, K=8
        )
        edges.write_parquet(os.path.join(tmp_out, "partial_edges"))
        os.replace(tmp_out, shard_out)  # atomic shard commit
        manifest[shard] = {"rows": int(n_rows)}
        _commit_manifest(out_dir, manifest)

    # final merge: sum weights across shard partials (small side; hash exchange)
    files = []
    for s in shards:
        d = os.path.join(out_dir, "shards", s, "partial_edges")
        files.extend(
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
    partials = ray.data.read_parquet(files)
    merged = hash_groupby_sum(partials, ["src_oid", "dst_oid"], "weight", "weight", num_partitions=8)
    # write to a temp dir + atomic rename: a re-run after a kill between the
    # merge write and the caller's _SUCCESS commit must not APPEND a second
    # set of UUID-named parquet files next to the first (doubled edge table
    # on the next resume)
    edges_dir = os.path.join(out_dir, "edges")
    tmp_edges = edges_dir + ".tmp"
    if os.path.exists(tmp_edges):
        shutil.rmtree(tmp_edges)
    merged.write_parquet(tmp_edges)
    if os.path.exists(edges_dir):
        shutil.rmtree(edges_dir)
    os.replace(tmp_edges, edges_dir)
    return ray.data.read_parquet(edges_dir)
