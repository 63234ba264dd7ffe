"""Deterministic synthetic source-code corpus generator.

Produces the driver-mandated input shape (BASELINE.json input_hint):
``repos(repo: string, path: string, commit: string, lang: string,
content: string)`` — one row per source file, with import/include lines
referencing other repos' modules so a repo→repo link graph can be mined.

Planted structure (FIXTURES.md §1), all seeded and deterministic:
- a power-law ("everyone imports the hub") target distribution → skew path
- ≥2 disconnected components (imports never cross the group boundary)
- a dangling repo (only unresolvable stdlib imports → no out-edges)
- a planted clique of ``clique_k`` repos importing each other
- a known fraction of unresolvable stdlib imports (noise)

Resolution rule shared with the miner: repo ``org{i}/name`` exports the
module ``name``; its files live under ``src/<name>/``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LANGS = ["python", "c", "cpp", "js", "java", "go", "rust"]

_ADJ = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "zeta", "nova", "flux"]
_NOUN = ["core", "util", "net", "data", "json", "math", "log", "db", "http", "fs"]

_STDLIB = {
    "python": ["os", "sys", "re", "json", "math"],
    "c": ["stdio", "stdlib", "string"],
    "cpp": ["vector", "string", "iostream"],
    "js": ["fs", "path", "http"],
    "java": ["util", "io", "net"],
    "go": ["fmt", "os", "strings"],
    "rust": ["std", "core"],
}

_EXT = {"python": "py", "c": "c", "cpp": "cc", "js": "js", "java": "java", "go": "go", "rust": "rs"}


def _module_name(i: int) -> str:
    return f"{_ADJ[i % len(_ADJ)]}{_NOUN[(i // len(_ADJ)) % len(_NOUN)]}{i}"


def repo_name(i: int) -> str:
    return f"org{i % 7}/{_module_name(i)}"


def _import_line(lang: str, module: str) -> str:
    if lang == "python":
        return f"import {module}"
    if lang == "c" or lang == "cpp":
        return f'#include <{module}/{module}.h>'
    if lang == "js":
        return f"const {module} = require('{module}');"
    if lang == "java":
        return f"import com.{module}.Core;"
    if lang == "go":
        return f'import "{module}"'
    return f"use {module}::prelude;"  # rust


def generate_repos(
    n_repos: int = 50,
    seed: int = 42,
    mean_files: float = 4.0,
    mean_imports: float = 3.0,
    clique_k: int = 4,
    n_components: int = 2,
    body_lines: int = 5,
) -> pa.Table:
    rng = np.random.RandomState(seed)
    rows_repo, rows_path, rows_commit, rows_lang, rows_content = [], [], [], [], []
    names = [repo_name(i) for i in range(n_repos)]
    mods = [_module_name(i) for i in range(n_repos)]
    langs = [LANGS[int(x)] for x in rng.randint(0, len(LANGS), n_repos)]
    # component of repo i: split index space into n_components contiguous groups
    comp_bounds = np.linspace(0, n_repos, n_components + 1).astype(int)
    comp_of = np.zeros(n_repos, dtype=int)
    for c in range(n_components):
        comp_of[comp_bounds[c] : comp_bounds[c + 1]] = c
    for i in range(n_repos):
        lang = langs[i]
        nfiles = max(1, int(rng.poisson(mean_files)))
        lo, hi = comp_bounds[comp_of[i]], comp_bounds[comp_of[i] + 1]
        group = np.arange(lo, hi)
        # power-law target weights within the group (hub = low index)
        w = 1.0 / (1.0 + np.arange(len(group))) ** 1.5
        w /= w.sum()
        commit = hashlib.sha1(f"{seed}:{names[i]}".encode()).hexdigest()
        for j in range(nfiles):
            lines = [f"// {names[i]} file {j}" if lang != "python" else f"# {names[i]} file {j}"]
            is_dangling = i == lo + 1 and len(group) > 2  # second repo of each group
            n_imp = int(rng.poisson(mean_imports))
            if i < clique_k:  # planted clique among repos 0..k-1 (first group)
                for t in range(clique_k):
                    if t != i:
                        lines.append(_import_line(lang, mods[t]))
            for _ in range(n_imp):
                if is_dangling or rng.rand() < 0.25:  # stdlib noise
                    std = _STDLIB[lang]
                    lines.append(_import_line(lang, std[rng.randint(len(std))]))
                else:
                    tgt = int(group[rng.choice(len(group), p=w)])
                    if tgt != i:
                        lines.append(_import_line(lang, mods[tgt]))
            for k in range(body_lines + rng.randint(5)):
                lines.append(f"void fn_{i}_{j}_{k}() {{ /* body {rng.randint(1 << 30)} */ }}")
            rows_repo.append(names[i])
            rows_path.append(f"src/{mods[i]}/file{j}.{_EXT[lang]}")
            rows_commit.append(commit)
            rows_lang.append(lang)
            rows_content.append("\n".join(lines))
    return pa.table(
        {
            "repo": pa.array(rows_repo, pa.string()),
            "path": pa.array(rows_path, pa.string()),
            "commit": pa.array(rows_commit, pa.string()),
            "lang": pa.array(rows_lang, pa.string()),
            "content": pa.array(rows_content, pa.string()),
        }
    )


def write_repos_parquet(path: str, **kwargs) -> str:
    import pyarrow.parquet as pq

    pq.write_table(generate_repos(**kwargs), path)
    return path


def _gen_file(repo_i: int, file_j: int, n_repos: int, seed: int, mean_imports: int, body_lines: int):
    """Deterministic content for file (repo_i, file_j) — seeded only by ids,
    so generation parallelizes over any partitioning of the file index."""
    rng = np.random.RandomState((seed * 1_000_003 + repo_i * 8191 + file_j) % (2**31))
    lang = LANGS[repo_i % len(LANGS)]
    lines = [f"// {repo_name(repo_i)} file {file_j}"]
    w_hub = rng.rand(mean_imports)
    for r in w_hub:
        if r < 0.2:
            std = _STDLIB[lang]
            lines.append(_import_line(lang, std[rng.randint(len(std))]))
        else:
            # power-law-ish target: hub repos = low indices
            tgt = int(n_repos * (rng.rand() ** 3))
            if tgt != repo_i:
                lines.append(_import_line(lang, _module_name(tgt)))
    for k in range(body_lines):
        lines.append(f"void fn_{repo_i}_{file_j}_{k}() {{ /* body {rng.randint(1 << 30)} */ }}")
    return lang, "\n".join(lines)


def generate_repos_dataset(
    n_repos: int = 10_000,
    files_per_repo: int = 10,
    seed: int = 42,
    mean_imports: int = 5,
    body_lines: int = 40,
    num_blocks: int | None = None,
):
    """Parallel deterministic corpus as a ray Dataset (bench-scale path:
    generation is a map_batches over the file-index range, so a multi-GB
    corpus materializes at cluster speed)."""
    import pyarrow as pa
    import ray.data

    total = n_repos * files_per_repo

    def _gen(batch) -> pa.Table:
        ids = batch["id"]
        rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
        for fid in ids.tolist():
            i, j = divmod(int(fid), files_per_repo)
            lang, content = _gen_file(i, j, n_repos, seed, mean_imports, body_lines)
            rows["repo"].append(repo_name(i))
            rows["path"].append(f"src/{_module_name(i)}/file{j}.{_EXT[lang]}")
            rows["commit"].append(hashlib.sha1(f"{seed}:{repo_name(i)}".encode()).hexdigest())
            rows["lang"].append(lang)
            rows["content"].append(content)
        return pa.table(
            {
                "repo": pa.array(rows["repo"], pa.string()),
                "path": pa.array(rows["path"], pa.string()),
                "commit": pa.array(rows["commit"], pa.string()),
                "lang": pa.array(rows["lang"], pa.string()),
                "content": pa.array(rows["content"], pa.string()),
            }
        )

    rng_kwargs = {"override_num_blocks": num_blocks} if num_blocks else {}
    return ray.data.range(total, **rng_kwargs).map_batches(
        _gen, batch_format="numpy", batch_size=4096
    )
