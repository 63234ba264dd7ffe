"""Git-diff-scoped query selection for the oracle gate.

``verify_oracles.py --changed`` calls :func:`select_changed` to map the
worktree's modified files onto the subset of registered queries that could
be affected, so per-commit gating stays fast (the full-registry sweep is
the round close, not the inner loop).

Selection rules (conservative — may over-select, must not under-select):

1. **Library modules** (``graphscope_ray/**``): module granularity.  A
   static import graph over the package gives the set of modules affected
   by the change (the changed modules plus everything that transitively
   imports them).  A query is selected iff the per-query module-dependency
   set of its implementing function — computed by AST analysis of the
   function body (body-level imports, module-alias attribute uses, and the
   in-module helper closure) — intersects the affected set.  This keeps a
   ``graph/metrics.py`` edit from flooding to all queries merely because
   the registry module imports everything somewhere.
2. **Registry files** (``pipelines/testdata.py``, ``__ray_entry__.py``,
   ``pipelines/oracle_sql.py``): symbol granularity.  Old
   (``git show <rev>:file``) and new sources are AST-split into top-level
   def/class/assign segments; a query is selected iff the symbol closure
   of its implementing function (or of its oracle-builder function, mapped
   from the ``"name": osql.builder(...)`` registry lines) contains a
   changed symbol.  Changes inside the ``queries()`` / ``oracle_sql()``
   registry dicts themselves are diffed entry-by-entry, so registering one
   new query selects only it.
3. Changes outside those files (tests, docs, scripts) select nothing.
"""

from __future__ import annotations

import ast
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REGISTRY_FILES = {
    "graphscope_ray/pipelines/testdata.py",
    "__ray_entry__.py",
    "graphscope_ray/pipelines/oracle_sql.py",
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args], capture_output=True, text=True
    ).stdout


def changed_files(rev: str = "HEAD") -> set[str]:
    """Worktree-vs-rev changed paths plus untracked files."""
    files = set(_git("diff", rev, "--name-only").splitlines())
    files |= set(_git("ls-files", "--others", "--exclude-standard").splitlines())
    return {f for f in files if f.strip()}


def _module_of(path: str) -> str | None:
    if path == "__ray_entry__.py":
        return "__ray_entry__"
    if path.startswith("graphscope_ray/") and path.endswith(".py"):
        mod = path[: -len(".py")].replace("/", ".")
        return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod
    return None


def _package_modules() -> dict[str, str]:
    """module name -> repo-relative path for graphscope_ray + __ray_entry__."""
    out = {}
    for p in REPO.glob("graphscope_ray/**/*.py"):
        rel = str(p.relative_to(REPO))
        m = _module_of(rel)
        if m:
            out[m] = rel
    out["__ray_entry__"] = "__ray_entry__.py"
    return out


def _mods_from_import(node: ast.AST, mods: dict[str, str]) -> set[str]:
    """Package modules referenced by one import statement."""
    out: set[str] = set()
    if isinstance(node, ast.Import):
        for a in node.names:
            name = a.name
            while name:
                if name in mods:
                    out.add(name)
                    break
                name = name.rpartition(".")[0]
    elif isinstance(node, ast.ImportFrom) and node.module:
        if node.module in mods:
            out.add(node.module)
        for a in node.names:
            sub = f"{node.module}.{a.name}"
            if sub in mods:
                out.add(sub)
    return out


def _import_graph(mods: dict[str, str]) -> dict[str, set[str]]:
    """edges[m] = package modules m imports anywhere (incl. body-level)."""
    edges: dict[str, set[str]] = {}
    for m, rel in mods.items():
        deps: set[str] = set()
        try:
            tree = ast.parse((REPO / rel).read_text())
        except (OSError, SyntaxError):
            tree = None
        if tree is not None:
            for node in ast.walk(tree):
                if isinstance(node, (ast.Import, ast.ImportFrom)):
                    deps |= _mods_from_import(node, mods)
        edges[m] = deps - {m}
    return edges


def _affected_modules(changed: set[str], edges: dict[str, set[str]]) -> set[str]:
    """Changed modules plus everything transitively importing them."""
    hit = set(changed)
    grown = True
    while grown:
        grown = False
        for m, deps in edges.items():
            if m not in hit and deps & hit:
                hit.add(m)
                grown = True
    return hit


# -- per-module symbol analysis ----------------------------------------------


class _ModuleInfo:
    """Top-level segments, per-symbol module refs and symbol refs."""

    def __init__(self, src: str, mods: dict[str, str]):
        self.segments: dict[str, str] = {}
        self.sym_mods: dict[str, set[str]] = {}
        self.sym_syms: dict[str, set[str]] = {}
        try:
            tree = ast.parse(src)
        except SyntaxError:
            self.ok = False
            return
        self.ok = True
        lines = src.splitlines()
        alias_mod: dict[str, str] = {}  # local name -> package module
        toplevel: set[str] = set()
        nodes: list[tuple[str, ast.AST]] = []
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        name = a.name
                        local = a.asname or name.split(".")[0]
                        tgt = name
                        while tgt and tgt not in mods:
                            tgt = tgt.rpartition(".")[0]
                        if tgt:
                            alias_mod[local] = tgt
                elif node.module:
                    for a in node.names:
                        local = a.asname or a.name
                        sub = f"{node.module}.{a.name}"
                        if sub in mods:
                            alias_mod[local] = sub
                        elif node.module in mods:
                            alias_mod[local] = node.module
            elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                toplevel.add(node.name)
                nodes.append((node.name, node))
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                tgts = node.targets if isinstance(node, ast.Assign) else [node.target]
                for t in tgts:
                    if isinstance(t, ast.Name):
                        toplevel.add(t.id)
                        nodes.append((t.id, node))
        for name, node in nodes:
            seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
            # a name defined twice (reassignment): concatenate segments
            self.segments[name] = self.segments.get(name, "") + seg
            m_refs: set[str] = set()
            s_refs: set[str] = set()
            for sub in ast.walk(node):
                if isinstance(sub, (ast.Import, ast.ImportFrom)):
                    m_refs |= _mods_from_import(sub, mods)
                elif isinstance(sub, ast.Name):
                    if sub.id in alias_mod:
                        m_refs.add(alias_mod[sub.id])
                    if sub.id in toplevel and sub.id != name:
                        s_refs.add(sub.id)
            self.sym_mods[name] = self.sym_mods.get(name, set()) | m_refs
            self.sym_syms[name] = self.sym_syms.get(name, set()) | s_refs

    def closure(self, sym: str) -> set[str]:
        """Symbol closure (the helpers sym reaches, incl. itself)."""
        seen, todo = set(), [sym]
        while todo:
            s = todo.pop()
            if s in seen:
                continue
            seen.add(s)
            todo.extend(self.sym_syms.get(s, ()))
        return seen

    def module_deps(self, sym: str) -> set[str]:
        return set().union(*(self.sym_mods.get(s, set()) for s in self.closure(sym)))


_ENTRY = re.compile(r"^\s*\"([\w]+)\"\s*:\s*(.+?),?\s*$")


def _registry_entries(segment: str) -> dict[str, str]:
    return {m.group(1): m.group(2) for ln in segment.splitlines() if (m := _ENTRY.match(ln))}


def _oracle_builder_map(info: _ModuleInfo) -> dict[str, str]:
    """query name -> oracle_sql builder function name (from oracle_sql())."""
    out = {}
    for name, val in _registry_entries(info.segments.get("oracle_sql", "")).items():
        m = re.match(r"osql\.(\w+)\s*\(", val)
        if m:
            out[name] = m.group(1)
    return out


# -- public entry ------------------------------------------------------------


def select_changed(qs: dict, rev: str = "HEAD") -> tuple[set[str], list[str]]:
    """(selected query names, human-readable reasons)."""
    files = changed_files(rev)
    mods = _package_modules()
    edges = _import_graph(mods)
    reasons: list[str] = []
    selected: set[str] = set()

    infos: dict[str, _ModuleInfo] = {}

    def info_of(mod: str) -> _ModuleInfo:
        if mod not in infos:
            infos[mod] = _ModuleInfo((REPO / mods[mod]).read_text(), mods)
        return infos[mod]

    qmod = {n: getattr(fn, "__module__", "?") for n, fn in qs.items()}
    qsym = {n: getattr(fn, "__name__", n) for n, fn in qs.items()}

    # 1. library-module changes -> per-query module-dependency intersection
    lib_changed = {
        m
        for f in files
        if (m := _module_of(f)) and f not in REGISTRY_FILES
    }
    if lib_changed:
        affected = _affected_modules(lib_changed, edges)
        hits: dict[str, int] = {}
        for n in qs:
            mod = qmod[n]
            if mod not in mods:
                continue
            inf = info_of(mod)
            if not inf.ok:
                selected.add(n)
                continue
            # a query is affected when its own deps (not its whole module)
            # touch the affected set
            deps = inf.module_deps(qsym[n]) & affected
            if deps:
                selected.add(n)
                for d in deps:
                    hits[d] = hits.get(d, 0) + 1
        for d, c in sorted(hits.items()):
            reasons.append(f"{c} queries depend on affected module {d}")

    # 2. registry-file changes -> symbol-closure intersection
    for rel in REGISTRY_FILES & files:
        mod = _module_of(rel)
        old_src = _git("show", f"{rev}:{rel}")
        new_inf = info_of(mod)
        if not old_src or not new_inf.ok:
            selected |= set(qs)
            reasons.append(f"{rel}: unreadable/new -> all queries")
            continue
        old_inf = _ModuleInfo(old_src, mods)
        if not old_inf.ok:
            selected |= set(qs)
            reasons.append(f"{rel}: old version unparsable -> all queries")
            continue
        syms = {
            k for k in new_inf.segments if old_inf.segments.get(k) != new_inf.segments[k]
        } | {k for k in old_inf.segments if k not in new_inf.segments}
        regfns = {"queries", "oracle_sql"} & syms
        body_syms = syms - {"queries", "oracle_sql"}
        if rel.endswith("oracle_sql.py"):
            builder_map = _oracle_builder_map(info_of("__ray_entry__"))
            direct = {
                n
                for n, b in builder_map.items()
                if n in qs and new_inf.closure(b) & body_syms
            }
            known = set().union(
                *(new_inf.closure(b) for b in builder_map.values() if b in new_inf.segments)
            ) if builder_map else set()
            orphan = body_syms - known  # changed symbols no builder reaches
            if orphan:
                reasons.append(
                    f"{rel}: symbols outside any builder closure {sorted(orphan)[:4]} -> all queries"
                )
                selected |= set(qs)
            if direct:
                reasons.append(f"{rel}: {len(direct)} queries via changed oracle builders")
                selected |= direct
        else:
            qnames_in_mod = {n for n in qs if qmod[n] == mod}
            direct = {
                n
                for n in qnames_in_mod
                if qsym[n] in new_inf.segments
                and new_inf.closure(qsym[n]) & body_syms
            }
            covered = set().union(
                *(new_inf.closure(qsym[n]) for n in direct)
            ) if direct else set()
            reachable = set().union(
                *(new_inf.closure(qsym[n]) for n in qnames_in_mod if qsym[n] in new_inf.segments)
            ) if qnames_in_mod else set()
            orphan = body_syms - reachable
            if orphan - covered:
                reasons.append(
                    f"{rel}: helper symbols outside every query closure "
                    f"{sorted(orphan - covered)[:4]} -> all {len(qnames_in_mod)} queries of file"
                )
                selected |= qnames_in_mod
            if direct:
                reasons.append(f"{rel}: {len(direct)} queries via changed defs")
                selected |= direct
        for regfn in regfns:
            o = _registry_entries(old_inf.segments.get(regfn, ""))
            n_ = _registry_entries(new_inf.segments.get(regfn, ""))
            ent = {k for k in n_ if o.get(k) != n_[k]} | {k for k in o if k not in n_}
            hit = ent & set(qs)
            if hit:
                reasons.append(f"{rel}:{regfn}: {len(hit)} re-registered entries")
                selected |= hit

    return selected & set(qs), reasons
