"""JSONL (newline-delimited JSON) data source/sink.

The interchange format of LLM training corpora (one JSON document per
line).  Wraps ``ray.data.read_json`` (Arrow's streaming JSON reader —
distributed, block-per-file-chunk) with the same options surface as the
CSV source (`sources/csv.py`, ref loader.py:44-91).  Note: unlike Parquet,
JSON cannot column-prune at the read — every column is decoded before the
projection drops it; that is a format property, not an engine one (at
100-TB scale convert JSONL → Parquet once via ``jsonl_to_parquet`` and
read the Parquet thereafter).
"""

from __future__ import annotations

import ray.data


def read_jsonl_source(paths, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Read JSONL file(s) as a Dataset.

    columns: projection applied immediately after decode (JSON has no
        reader-level pruning; the projection still keeps every downstream
        block narrow)."""
    ds = ray.data.read_json(paths, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    """Write a Dataset as sharded JSONL (one file per block — resumable
    consumers can track finished shards)."""
    ds.write_json(path, **kwargs)


def jsonl_to_parquet(paths, out_dir: str, columns: list[str] | None = None, **kwargs) -> None:
    """One-shot streaming conversion JSONL → partitioned Parquet (the scale
    path: convert once, column-prune forever after)."""
    read_jsonl_source(paths, columns=columns, **kwargs).write_parquet(out_dir)
