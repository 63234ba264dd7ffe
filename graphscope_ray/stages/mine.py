"""Import mining: source text → (src_repo, module) references → repo→repo edges.

This is the new surface the reference does not have as a generic op (its
closest analogue is the loaders' column projection, SURVEY.md §2.3
"per-record maps"); it is implemented Ray-Data-first:

- ``ImportMiner`` is a callable CLASS used as an actor-pool ``map_batches``
  stage — the per-language regexes are compiled ONCE per actor in
  ``__init__``, the per-batch body is vectorized pandas ``str.findall``.
- module→repo resolution is a broadcast join: the exports table (one row per
  repo — the small side) is ``ray.put`` once and looked up per batch; no
  shuffle (ray_guide "Joins and lookups").
- the only wide operation is the final ``groupby(src,dst).count`` that
  dedups edges and produces the weight (number of importing files).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

# per-language import/include patterns; group 1 = module token
IMPORT_PATTERNS: dict[str, list[str]] = {
    "python": [r"^\s*import\s+(\w+)", r"^\s*from\s+(\w+)\s+import"],
    "c": [r'^\s*#include\s*[<"](\w+)[/."]'],
    "cpp": [r'^\s*#include\s*[<"](\w+)[/."]'],
    "js": [r"require\(\s*['\"]([\w@/-]+)['\"]\s*\)", r"^\s*import\s+.*from\s+['\"]([\w@/-]+)['\"]"],
    "java": [r"^\s*import\s+com\.(\w+)\."],
    "go": [r'^\s*import\s+"([\w./-]+)"'],
    "rust": [r"^\s*use\s+(\w+)\s*::"],
}


class ImportMiner:
    """Actor-pool stage: explode each file into its imported module tokens."""

    def __init__(self):
        self.patterns = {
            lang: [re.compile(p, re.M) for p in pats] for lang, pats in IMPORT_PATTERNS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_src, out_mod = [], []
        for lang, pats in self.patterns.items():
            mask = batch["lang"] == lang
            if not mask.any():
                continue
            sub = batch.loc[mask, ["repo", "content"]]
            for pat in pats:
                found = sub["content"].str.findall(pat)
                n = found.str.len().to_numpy()
                if n.sum() == 0:
                    continue
                out_src.append(np.repeat(sub["repo"].to_numpy(), n))
                out_mod.append(np.concatenate([np.asarray(f, dtype=object) for f in found if f]))
        if not out_src:
            return pd.DataFrame({"src_repo": pd.Series([], dtype=str), "module": pd.Series([], dtype=str)})
        return pd.DataFrame(
            {"src_repo": np.concatenate(out_src), "module": np.concatenate(out_mod)}
        )


def mine_imports(ds: ray.data.Dataset, concurrency: int | tuple = (1, 8)) -> ray.data.Dataset:
    """repos table → (src_repo, module) reference rows (actor pool: regexes
    compiled once per actor; autoscaling pool so reads aren't starved)."""
    ds = ds.select_columns(["repo", "lang", "content"])
    return ds.map_batches(
        ImportMiner, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )


def build_exports(ds: ray.data.Dataset) -> pd.DataFrame:
    """exports(module, repo) from each repo's own paths: the path component
    under ``src/`` is the exported module (one row per repo — small side)."""

    def _mods(t: pa.Table) -> pa.Table:
        paths = t["path"].to_pylist()
        mods = []
        for p in paths:
            parts = p.split("/")
            mods.append(parts[1] if len(parts) > 1 and parts[0] == "src" else parts[0].split(".")[0])
        return pa.table({"module": pa.array(mods, pa.string()), "repo": t["repo"]})

    mods = ds.select_columns(["repo", "path"]).map_batches(_mods, batch_format="pyarrow")
    return mods.groupby(["module", "repo"]).count().select_columns(["module", "repo"]).to_pandas()


def resolve_edges(imports_ds: ray.data.Dataset, exports: pd.DataFrame) -> ray.data.Dataset:
    """Broadcast-join module references against the exports table →
    edges(src_oid, dst_oid, weight); unresolvable modules (stdlib noise)
    drop out; self-loops dropped; weight = number of importing files."""
    mod_arr = np.sort(exports["module"].to_numpy())
    order = np.argsort(exports["module"].to_numpy(), kind="stable")
    repo_arr = exports["repo"].to_numpy()[order]
    ref = ray.put((mod_arr, repo_arr))

    def _resolve(t: pa.Table) -> pa.Table:
        mods_sorted, repos_sorted = ray.get(ref)
        m = t["module"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(mods_sorted, m)
        pos_c = np.minimum(pos, max(len(mods_sorted) - 1, 0))
        hit = (len(mods_sorted) > 0) & (mods_sorted[pos_c] == m)
        src = t["src_repo"].to_numpy(zero_copy_only=False)[hit]
        dst = repos_sorted[pos_c[hit]]
        keep = src != dst
        return pa.table(
            {"src_oid": pa.array(src[keep], pa.string()), "dst_oid": pa.array(dst[keep], pa.string())}
        )

    resolved = imports_ds.map_batches(_resolve, batch_format="pyarrow")
    edges = (
        resolved.groupby(["src_oid", "dst_oid"])
        .count()
        .map_batches(
            lambda t: pa.table(
                {"src_oid": t["src_oid"], "dst_oid": t["dst_oid"], "weight": t["count()"]}
            ),
            batch_format="pyarrow",
        )
    )
    return edges
