"""Ingestion stage: sha256 lineage on the raw file table.

The per-row invariant (BASELINE.json input_hint): ``sha256(content)`` is
computed at ingestion and carried unchanged — the huge ``content`` column is
dropped immediately after mining (SURVEY.md §7.4 "very wide rows"), but the
(repo, path, commit, content_sha256) lineage survives to the manifest.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from graphscope_ray.utils import sha256_column


def _add_sha(t: pa.Table) -> pa.Table:
    return t.append_column("content_sha256", sha256_column(t["content"]))


def with_sha256(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append ``content_sha256`` per row (Arrow in/out, content untouched)."""
    return ds.map_batches(_add_sha, batch_format="pyarrow")


def lineage(ds: ray.data.Dataset) -> ray.data.Dataset:
    """The lineage table: every input row's identity + content hash, no content."""
    return ds.select_columns(["repo", "path", "commit", "content_sha256"])
