"""Unit tests for the AST machinery behind `verify_oracles.py --changed`
(scripts/changed_queries.py) — the per-commit gate must over-select, never
under-select, so its symbol/module analysis gets its own oracle here.
No Ray, no git mutation: pure-function coverage only."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from changed_queries import (  # noqa: E402
    _ENTRY,
    _ModuleInfo,
    _affected_modules,
    _module_of,
    _registry_entries,
)

MODS = {
    "pkg.a": "pkg/a.py",
    "pkg.b": "pkg/b.py",
    "pkg.c": "pkg/c.py",
}


def test_module_of_paths():
    assert _module_of("graphscope_ray/graph/metrics.py") == "graphscope_ray.graph.metrics"
    assert _module_of("graphscope_ray/__init__.py") == "graphscope_ray"
    assert _module_of("__ray_entry__.py") == "__ray_entry__"
    assert _module_of("tests/test_x.py") is None
    assert _module_of("scripts/foo.py") is None


def test_affected_modules_transitive():
    edges = {"pkg.a": set(), "pkg.b": {"pkg.a"}, "pkg.c": {"pkg.b"}, "pkg.d": set()}
    hit = _affected_modules({"pkg.a"}, edges)
    assert hit == {"pkg.a", "pkg.b", "pkg.c"}
    assert _affected_modules({"pkg.d"}, edges) == {"pkg.d"}


def test_moduleinfo_symbol_closure_and_module_refs():
    src = """
import pkg.a
from pkg import b as balias

CONST = 7

def helper():
    return CONST + 1

def q_one():
    from pkg.c import thing
    return helper() + thing()

def q_two():
    return balias.f() + pkg.a.g()

def q_three():
    return 0
"""
    info = _ModuleInfo(src, MODS)
    assert info.ok
    # closures: q_one reaches helper reaches CONST
    assert info.closure("q_one") == {"q_one", "helper", "CONST"}
    assert info.closure("q_three") == {"q_three"}
    # module deps: q_one via body import, q_two via aliases
    assert info.module_deps("q_one") == {"pkg.c"}
    assert info.module_deps("q_two") == {"pkg.b", "pkg.a"}
    assert info.module_deps("q_three") == set()
    # changing CONST's segment text is detected as a distinct symbol
    info2 = _ModuleInfo(src.replace("CONST = 7", "CONST = 8"), MODS)
    changed = {
        k for k in info2.segments if info.segments.get(k) != info2.segments[k]
    }
    assert changed == {"CONST"}
    # and only q_one's closure intersects it
    hits = {q for q in ("q_one", "q_two", "q_three") if info2.closure(q) & changed}
    assert hits == {"q_one"}


def test_registry_entry_diffing():
    seg_old = '''
def queries():
    return {
        "q_a": fa,
        "q_b": fb,
    }
'''
    seg_new = seg_old.replace('"q_b": fb,', '"q_b": fb2,\n        "q_c": fc,')
    o = _registry_entries(_ModuleInfo(seg_old, {}).segments["queries"])
    n = _registry_entries(_ModuleInfo(seg_new, {}).segments["queries"])
    assert o == {"q_a": "fa", "q_b": "fb"}
    changed = {k for k in n if o.get(k) != n[k]} | {k for k in o if k not in n}
    assert changed == {"q_b", "q_c"}
    # the entry regex tolerates trailing comment-free call values
    m = _ENTRY.match('        "x": osql.x_sql(rounds=3),')
    assert m and m.group(1) == "x" and m.group(2).startswith("osql.x_sql")


def test_unparsable_source_flags_not_ok():
    assert not _ModuleInfo("def broken(:\n  pass", MODS).ok
