"""Resumable keyed-partitioned Parquet sink (DATA_SINK scale path).

Writes a dataset as ``path/bucket=<b>/part.parquet`` with one bucket per
``hash(key) % num_buckets``, each bucket committed ATOMICALLY (tmp file +
rename + manifest line).  A re-run skips buckets already committed — the
resume contract the north rule asks of 100-TB outputs (a failed job redoes
only missing buckets, never the whole dataset).

Reference parity: SERIALIZE_GRAPH / ctx.output(fd="file://…") write whole
files with no partial-failure story (python/graphscope/framework/
context.py:232-277); this sink adds the per-partition commit protocol on
top (same idea as pipelines/resumable.py's per-shard mining commits, but
keyed by CONTENT hash so any dataset can be bucketed, not just file shards).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_MANIFEST.json")


def read_manifest(path: str) -> dict:
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {"buckets": {}}
    with open(mp) as f:
        return json.load(f)


def write_partitioned(
    ds: "ray.data.Dataset",
    path: str,
    key: str,
    num_buckets: int = 16,
    resume: bool = True,
    direct: bool = False,
) -> dict:
    """Write ``ds`` bucketed by ``hash(key) % num_buckets``; returns the
    manifest.  Committed buckets are skipped on re-run (``resume=True``).

    ``direct=True`` buckets by the key VALUE itself (an int already in
    ``[0, num_buckets)``) instead of its hash — the layout a reader needs
    when the bucket id is semantic (e.g. the IVF nearest-centroid id:
    probing cluster c means reading exactly ``bucket=c/``).

    Layout: one explicit hash exchange (block → num_buckets slots, same
    pattern as utils.hash_join), then ONE writer task per missing bucket:
    write ``part.parquet.tmp`` → fsync-rename → record rows in the
    manifest.  The manifest is re-flushed atomically as EACH bucket writer
    returns (ray.wait loop), so a crash mid-run loses at most the buckets
    still in flight; already-flushed buckets are skipped on retry, and a
    lost-but-written bucket is simply rewritten (idempotent: same rows,
    same file)."""
    os.makedirs(path, exist_ok=True)
    manifest = read_manifest(path) if resume else {"buckets": {}}
    missing = [b for b in range(num_buckets) if str(b) not in manifest["buckets"]]
    if not missing:
        return manifest
    K = num_buckets

    @ray.remote
    def _split(t: pa.Table):
        df = t.to_pandas()
        if key not in df.columns:
            parts = tuple(df.iloc[:0] for _ in range(K))
            return parts if K > 1 else parts[0]
        if direct:
            part = df[key].to_numpy().astype(np.int64)
            if len(part) and (part.min() < 0 or part.max() >= K):
                raise ValueError(
                    f"direct bucketing: key {key} outside [0, {K}) "
                    f"(min={part.min()}, max={part.max()})"
                )
        else:
            h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
            part = (h % np.uint64(K)).astype(np.int64)
        parts = tuple(df[part == p] for p in range(K))
        return parts if K > 1 else parts[0]

    blocks = ds.materialize().to_arrow_refs()
    if K == 1:
        slots = [[_split.remote(b) for b in blocks]]
    else:
        out = [_split.options(num_returns=K).remote(b) for b in blocks]
        slots = [[o[k] for o in out] for k in range(K)]

    @ray.remote
    def _write(bucket: int, *dfs) -> int:
        # An empty dataset (zero input blocks) still commits an empty bucket
        # so the manifest records completion rather than crashing.
        df = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
        bdir = os.path.join(path, f"bucket={bucket}")
        os.makedirs(bdir, exist_ok=True)
        tmp = os.path.join(bdir, "part.parquet.tmp")
        final = os.path.join(bdir, "part.parquet")
        table = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        return len(df)

    def _flush():
        tmp = _manifest_path(path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(path))

    pending = {_write.remote(b, *slots[b]): b for b in missing}
    refs = list(pending)
    while refs:
        done, refs = ray.wait(refs, num_returns=1)
        b = pending[done[0]]
        manifest["buckets"][str(b)] = {"rows": int(ray.get(done[0]))}
        _flush()  # per-bucket commit: crash loses only in-flight buckets
    return manifest


def read_partitioned(path: str) -> "ray.data.Dataset":
    """Read back a partitioned sink directory (committed buckets only)."""
    import ray.data

    manifest = read_manifest(path)
    files = [
        os.path.join(path, f"bucket={b}", "part.parquet")
        for b in sorted(manifest["buckets"], key=int)
    ]
    # partitioning=None: do NOT re-infer a hive "bucket" column from the path
    return ray.data.read_parquet(files, partitioning=None)
