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


_COMPILED: dict | None = None
_COMBINED: dict | None = None


def _compiled_patterns() -> dict:
    """Compiled per-language regexes, cached per worker process (module-level
    — stateless map_batches tasks reuse warm workers, so compilation is
    amortized exactly like actor __init__ state, while the stage stays
    elastic and scales to every free CPU)."""
    global _COMPILED
    if _COMPILED is None:
        _COMPILED = {
            lang: [re.compile(p, re.M) for p in pats] for lang, pats in IMPORT_PATTERNS.items()
        }
    return _COMPILED


def _combined_patterns() -> dict:
    """One alternation regex per language (single scan of each file body
    instead of one scan per pattern); matches with multiple groups yield
    tuples — the module token is the non-empty group."""
    global _COMBINED
    if _COMBINED is None:
        _COMBINED = {
            lang: re.compile("|".join(f"(?:{p})" for p in pats), re.M)
            for lang, pats in IMPORT_PATTERNS.items()
        }
    return _COMBINED


def _findall_modules(pat: re.Pattern, content: str) -> list[str]:
    found = pat.findall(content)
    if not found:
        return []
    if isinstance(found[0], tuple):
        return [next((g for g in tup if g), "") for tup in found]
    return found


class ImportMiner:
    """Explode each file into its imported module tokens.  Arrow-native:
    the batch arrives zero-copy from the object store; only the matching
    rows' ``content`` strings are surfaced to Python for the (inherently
    scalar) regex scan — one combined alternation regex per language, one
    pass per file body."""

    def __init__(self):
        self.patterns = _combined_patterns()

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"src_repo": pa.array([], pa.string()), "module": pa.array([], pa.string())}
        )
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return empty
        lang_np = np.asarray(batch["lang"].to_pylist(), dtype=object)
        out_src: list[np.ndarray] = []
        out_mod: list[list[str]] = []
        for lang, pat in self.patterns.items():
            idx = np.nonzero(lang_np == lang)[0]
            if idx.size == 0:
                continue
            sub = batch.take(pa.array(idx))
            repos = sub["repo"].to_pylist()
            counts = np.zeros(idx.size, dtype=np.int64)
            mods: list[str] = []
            for i, content in enumerate(sub["content"].to_pylist()):
                found = _findall_modules(pat, content)
                counts[i] = len(found)
                mods.extend(found)
            if not mods:
                continue
            out_src.append(np.repeat(np.asarray(repos, dtype=object), counts))
            out_mod.append(mods)
        if not out_src:
            return empty
        return pa.table(
            {
                "src_repo": pa.array(np.concatenate(out_src).tolist(), pa.string()),
                "module": pa.array([m for ms in out_mod for m in ms], pa.string()),
            }
        )


def _mine_batch(batch: pa.Table) -> pa.Table:
    return ImportMiner()(batch)


def scan_corpus(ds: ray.data.Dataset) -> ray.data.Dataset:
    """ONE streaming pass over the (huge) corpus → a NARROW per-file table:
    (repo, path, commit, lang, content_sha256, modules list<string>,
    export_module).  The wide ``content`` column is read once, hashed and
    mined in the same task, and dropped immediately (SURVEY.md §7.4) — at
    100 TB this is the only stage that touches file bodies; everything else
    (lineage, exports, imports, edges) derives from this output."""
    from graphscope_ray.utils import sha256_column

    def _scan(t: pa.Table) -> pa.Table:
        pats = _compiled_patterns()
        langs = t["lang"].to_pylist()
        contents = t["content"].to_pylist()
        mods: list[list[str]] = []
        for lang, content in zip(langs, contents):
            found: list[str] = []
            for pat in pats.get(lang, ()):
                found.extend(pat.findall(content))
            mods.append(found)
        paths = t["path"].to_pylist()
        exp = []
        for p in paths:
            parts = p.split("/")
            exp.append(parts[1] if len(parts) > 1 and parts[0] == "src" else parts[0].split(".")[0])
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "commit": t["commit"],
                "lang": t["lang"],
                "content_sha256": sha256_column(t["content"]),
                "modules": pa.array(mods, pa.list_(pa.string())),
                "export_module": pa.array(exp, pa.string()),
            }
        )

    return ds.map_batches(_scan, batch_format="pyarrow")


def mine_imports(ds: ray.data.Dataset, concurrency=None) -> ray.data.Dataset:
    """repos table → (src_repo, module) reference rows.  Stateless tasks:
    regexes are compiled once per worker process (module cache), and the
    stage scales elastically to every free CPU instead of a fixed pool."""
    ds = ds.select_columns(["repo", "lang", "content"])
    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_mine_batch, batch_format="pyarrow", batch_size=512, **kwargs)


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

    def _dedup(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    # small side (one row per repo): per-batch dedup then a driver-side
    # drop_duplicates — no shuffle (vs a groupby all-to-all)
    mods = ds.select_columns(["repo", "path"]).map_batches(_mods, batch_format="pyarrow")
    return mods.map_batches(_dedup, batch_format="pyarrow").to_pandas().drop_duplicates().reset_index(drop=True)


def resolve_edges_join(
    imports_ds: ray.data.Dataset,
    exports,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distributed resolve — the beyond-broadcast path (VERDICT r3 #3): at
    10^8–10^9 repos the sorted module→repo universe becomes a multi-GB
    broadcast object pinned in every node's object store.  Here the
    (src_repo, module) references hash-join against the exports Dataset
    instead (one explicit exchange keyed by module — mirroring
    build.py's encode="join" escape hatch), then the same distinct
    (src,dst)-count exchange as the broadcast path.  Output is identical
    to ``resolve_edges``: unresolvable modules and self-loops drop out,
    weight = number of importing files."""
    from graphscope_ray.utils import hash_groupby_sum, hash_join

    exp_ds = (
        exports
        if isinstance(exports, ray.data.Dataset)
        else ray.data.from_arrow(
            pa.Table.from_pandas(exports, preserve_index=False).replace_schema_metadata(None)
        )
    )
    joined = hash_join(
        imports_ds.select_columns(["src_repo", "module"]),
        exp_ds.select_columns(["module", "repo"]),
        "module",
        "module",
        num_partitions=num_partitions,
    )

    def _post(t: pa.Table) -> pa.Table:
        if "src_repo" not in t.column_names or t.num_rows == 0:
            return pa.table(
                {"src_oid": pa.array([], pa.string()), "dst_oid": pa.array([], pa.string())}
            )
        src = t["src_repo"].to_numpy(zero_copy_only=False)
        dst = t["repo"].to_numpy(zero_copy_only=False)
        keep = src != dst
        return pa.table(
            {"src_oid": pa.array(src[keep], pa.string()), "dst_oid": pa.array(dst[keep], pa.string())}
        )

    resolved = joined.map_batches(_post, batch_format="pyarrow")
    return hash_groupby_sum(resolved, ["src_oid", "dst_oid"], None, "weight")


def resolve_edges(
    imports_ds: ray.data.Dataset,
    exports: pd.DataFrame,
    broadcast_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """Broadcast-join module references against the exports table →
    edges(src_oid, dst_oid, weight); unresolvable modules (stdlib noise)
    drop out; self-loops dropped; weight = number of importing files.

    Dispatch mirrors build_graph_from_oids' encode="auto": an exports
    universe larger than ``broadcast_limit`` rows routes to the
    distributed ``resolve_edges_join`` instead of a broadcast object."""
    if len(exports) > broadcast_limit:
        return resolve_edges_join(imports_ds, exports)
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

    from graphscope_ray.utils import hash_groupby_sum

    resolved = imports_ds.map_batches(_resolve, batch_format="pyarrow")
    # explicit hash exchange (local combine → hash split → partition reduce);
    # the shuffle moves distinct (src,dst) pairs, not raw references
    return hash_groupby_sum(resolved, ["src_oid", "dst_oid"], None, "weight")


@ray.remote
def _edge_reduce(*dfs) -> pa.Table:
    nonempty = [d for d in dfs if len(d)]
    if not nonempty:
        return pa.table(
            {
                "src_oid": pa.array([], pa.string()),
                "dst_oid": pa.array([], pa.string()),
                "weight": pa.array([], pa.int64()),
            }
        )
    alldf = pd.concat(nonempty, ignore_index=True)
    red = alldf.groupby(["src_oid", "dst_oid"], as_index=False)["n"].sum()
    red = red.rename(columns={"n": "weight"})
    return pa.Table.from_pandas(red, preserve_index=False).replace_schema_metadata(None)


def mine_edge_partials(
    repos_ds: ray.data.Dataset, exports: pd.DataFrame
) -> tuple[ray.data.Dataset, np.ndarray]:
    """THE fused mining pass: ONE streaming map_batches over the corpus does
    regex mining (one combined alternation per language) → broadcast
    module→repo-ID resolve → local packed-key combine.  Repos are encoded to
    dense int32 ids against the sorted repo universe (from the exports
    table), so each block emits a tiny (key = src_id<<32|dst_id, n) int
    partial — strings never enter the exchange.  Returns (partials, R) where
    R is the sorted repo-string universe for decoding.

    This replaces the round-1 scan-materialize → exports → re-dispatch
    chain whose driver barriers capped mining scaling efficiency at 0.72
    (BASELINE r1); the elastic single pass has no serial floor beyond the
    final tiny int-key exchange."""
    R = np.unique(exports["repo"].to_numpy())
    mod_arr = np.sort(exports["module"].to_numpy())
    order = np.argsort(exports["module"].to_numpy(), kind="stable")
    dst_ids = np.searchsorted(R, exports["repo"].to_numpy()[order]).astype(np.int64)
    ref = ray.put((mod_arr, dst_ids, R))

    def _f(t: pa.Table) -> pa.Table:
        pats = _combined_patterns()
        mods_sorted, dst_by_mod, R_ = ray.get(ref)
        langs = t["lang"].to_pylist()
        contents = t["content"].to_pylist()
        repos = t["repo"].to_pylist()
        src_list: list[str] = []
        mod_list: list[str] = []
        for r, lang, c in zip(repos, langs, contents):
            pat = pats.get(lang)
            if pat is None:
                continue
            mods = _findall_modules(pat, c)
            if mods:
                mod_list.extend(mods)
                src_list.extend([r] * len(mods))
        if not mod_list:
            return pa.table({"key": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        m = np.asarray(mod_list, dtype=object)
        pos = np.minimum(np.searchsorted(mods_sorted, m), max(len(mods_sorted) - 1, 0))
        hit = (len(mods_sorted) > 0) & (mods_sorted[pos] == m)
        dst = dst_by_mod[pos[hit]]
        srcs = np.asarray(src_list, dtype=object)[hit]
        spos = np.minimum(np.searchsorted(R_, srcs), max(len(R_) - 1, 0))
        shit = R_[spos] == srcs  # corpus repos absent from exports drop out
        src_id = spos[shit]
        dst = dst[shit]
        keep = src_id != dst
        keys = (src_id[keep].astype(np.uint64) << np.uint64(32)) | dst[keep].astype(np.uint64)
        uk, counts = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "key": pa.array(uk.view(np.int64)),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = repos_ds.select_columns(["repo", "lang", "content"]).map_batches(
        _f, batch_format="pyarrow"
    )
    return partials, R


_SPLITMIX = np.uint64(0x9E3779B97F4A7C15)


def exchange_edge_counts(
    partials: ray.data.Dataset, R: np.ndarray, K: int = 32
) -> ray.data.Dataset:
    """Final mining exchange: K-way hash split of the packed-key partials,
    numpy sort+reduceat reduce per partition, decode ids → repo strings.
    Pure int arithmetic — no pandas/string hashing anywhere."""
    Rref = ray.put(R)

    @ray.remote
    def _split(t: pa.Table):
        key = t["key"].to_numpy(zero_copy_only=False).view(np.uint64)
        part = ((key * _SPLITMIX) >> np.uint64(33)) % np.uint64(K)
        order = np.argsort(part, kind="stable")
        st = t.take(order)
        counts = np.bincount(part.astype(np.int64), minlength=K)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        out = tuple(st.slice(int(bounds[p]), int(counts[p])) for p in range(K))
        return out if K > 1 else out[0]

    @ray.remote
    def _reduce(*tables) -> pa.Table:
        R_ = ray.get(Rref)
        ts = [t for t in tables if t.num_rows]
        if not ts:
            return pa.table(
                {
                    "src_oid": pa.array([], pa.string()),
                    "dst_oid": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        cat = pa.concat_tables(ts)
        key = cat["key"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = cat["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key, n = key[order], n[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(key) != 0) + 1]).astype(np.int64)
        uk = key[starts]
        sums = np.add.reduceat(n, starts)
        src = R_[(uk >> np.uint64(32)).astype(np.int64)]
        dst = R_[(uk & np.uint64(0xFFFFFFFF)).astype(np.int64)]
        return pa.table(
            {
                "src_oid": pa.array(src, pa.string()),
                "dst_oid": pa.array(dst, pa.string()),
                "weight": pa.array(sums.astype(np.int64)),
            }
        )

    blocks = partials.materialize().to_arrow_refs()
    if K == 1:
        return ray.data.from_arrow_refs([_reduce.remote(*[_split.remote(b) for b in blocks])])
    split_refs = [_split.options(num_returns=K).remote(b) for b in blocks]
    return ray.data.from_arrow_refs(
        [_reduce.remote(*[split_refs[i][k] for i in range(len(blocks))]) for k in range(K)]
    )


def resolve_edges_fused(scan_ds: ray.data.Dataset, exports: pd.DataFrame, K: int = 32) -> ray.data.Dataset:
    """Fused edge derivation from the narrow scan table: ONE task per scan
    block does explode → broadcast module→repo lookup → local (src,dst)
    combine → K-way hash split; K reduce tasks finish the groupby.  No
    intermediate Dataset materialization between mining and the exchange."""
    mod_arr = np.sort(exports["module"].to_numpy())
    order = np.argsort(exports["module"].to_numpy(), kind="stable")
    repo_arr = exports["repo"].to_numpy()[order]
    ref = ray.put((mod_arr, repo_arr))

    @ray.remote
    def _mine_split(t: pa.Table):
        mods_sorted, repos_sorted = ray.get(ref)
        mods = t["modules"]
        lens = pa.compute.list_value_length(mods).to_numpy(zero_copy_only=False)
        src_all = np.repeat(t["repo"].to_numpy(zero_copy_only=False), lens)
        m = pa.compute.list_flatten(mods).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(mods_sorted, m)
        pos_c = np.minimum(pos, max(len(mods_sorted) - 1, 0))
        hit = (len(mods_sorted) > 0) & (mods_sorted[pos_c] == m)
        src = src_all[hit]
        dst = repos_sorted[pos_c[hit]]
        keep = src != dst
        df = pd.DataFrame({"src_oid": src[keep], "dst_oid": dst[keep]})
        df = df.groupby(["src_oid", "dst_oid"], as_index=False).size().rename(columns={"size": "n"})
        h = (
            pd.util.hash_pandas_object(df["src_oid"], index=False).to_numpy()
            * np.uint64(1000003)
            + pd.util.hash_pandas_object(df["dst_oid"], index=False).to_numpy()
        )
        part = (h % np.uint64(K)).astype(np.int64)
        parts = tuple(df[part == p] for p in range(K))
        return parts if K > 1 else parts[0]

    blocks = scan_ds.to_arrow_refs()
    if K == 1:
        refs = [[_mine_split.remote(b)] for b in blocks]
        return ray.data.from_arrow_refs([_edge_reduce.remote(*[r[0] for r in refs])])
    split_refs = [_mine_split.options(num_returns=K).remote(b) for b in blocks]
    return ray.data.from_arrow_refs(
        [_edge_reduce.remote(*[split_refs[i][k] for i in range(len(blocks))]) for k in range(K)]
    )
