"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side via DuckDB, compare row count + schema +
order-insensitive values.  Usage:

    python scripts/verify_oracles.py [--raw] [--changed[=REV]] [sf_dir] [name ...]

--raw replicates the driver's hash gate: NO float rounding on either side —
values must match bit-for-bit (the engine must bake any round() its oracle
emits into its own output).  Default mode rounds both sides to 8dp, which
is more forgiving and CANNOT catch engine-side rounding omissions.

--changed[=REV] selects only the queries affected by the current worktree
diff vs REV (default HEAD) — AST-scoped per-query dependency analysis, see
scripts/changed_queries.py.  Explicit names are added on top.  The full
sweep (no selector) remains the round-close gate.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame, raw: bool = False) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            if not raw:
                df[c] = df[c].round(8)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    changed_rev = None
    argv = []
    for a in sys.argv[1:]:
        if a == "--raw":
            continue
        if a == "--changed" or a.startswith("--changed="):
            changed_rev = a.partition("=")[2] or "HEAD"
            continue
        argv.append(a)
    raw = "--raw" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if changed_rev is not None:
        from changed_queries import select_changed

        sel, reasons = select_changed(qs, rev=changed_rev)
        for r in reasons:
            print(f"# {r}")
        print(f"# --changed vs {changed_rev}: {len(sel)} of {len(qs)} queries selected")
        only |= sel
        if not only:
            print("# nothing affected; 0 queries to run")
            ray.shutdown()
            sys.exit(0)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    import time as _time

    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        _tq = _time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)), raw=raw)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        _tq = _time.perf_counter() - _tq
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(got)} rows) [q {_tq:.1f}s]")
            n_ok += 1
            continue
        _to = _time.perf_counter()
        try:
            want = canon(con.execute(oracles[name]).fetchdf(), raw=raw)
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        _to = _time.perf_counter() - _to
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c].to_numpy(), want[c].to_numpy()
            if np.issubdtype(got[c].dtype, np.floating):
                atol = 0.0 if raw else 1e-7
                ok = np.allclose(a.astype(float), b.astype(float), rtol=0.0 if raw else 1e-5,
                                 atol=atol, equal_nan=True)
            else:
                ok = (a == b).all()
            if not ok:
                bad = np.flatnonzero(a != b)[:3] if a.dtype == b.dtype else [0]
                print(f"FAIL {name}: column {c} differs, e.g. rows {bad.tolist() if hasattr(bad,'tolist') else bad}")
                for i in list(bad)[:3]:
                    print(f"   got={got.iloc[int(i)].to_dict()}\n  want={want.iloc[int(i)].to_dict()}")
                eq = False
                break
        if eq:
            print(f"OK   {name} ({len(got)} rows) [q {_tq:.1f}s, oracle {_to:.1f}s]")
            n_ok += 1
        else:
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
