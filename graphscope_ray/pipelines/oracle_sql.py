"""ANSI-SQL (DuckDB) oracles mirroring every oracle-checkable pipeline.

Iterative algorithms are expressed as programmatically UNROLLED chains of
CTEs (one per superstep) with identical update rules, tie-breaks and guard
semantics as the engine programs; floats are rounded to 8 decimals on BOTH
sides.  The link graph shares its derivation CTE with
pipelines/testdata.py (src = l_orderkey % MOD, dst = l_partkey % MOD).
"""

from __future__ import annotations

import numpy as np

from graphscope_ray.pipelines.testdata import LG_MOD

_BASE = f"""
e AS MATERIALIZED (
  SELECT DISTINCT (l_orderkey % {LG_MOD}) AS src, (l_partkey % {LG_MOD}) AS dst
  FROM lineitem WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})
),
v AS MATERIALIZED (SELECT src AS oid FROM e UNION SELECT dst FROM e),
nv AS MATERIALIZED (SELECT count(*) AS n FROM v),
ue AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
me AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
outd AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM e GROUP BY src)
"""


def lg_edges_sql() -> str:
    return f"WITH {_BASE} SELECT src, dst FROM e"


def dyn_view_undirected_sql() -> str:
    return f"""
WITH {_BASE}
SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM e
"""


def dyn_mutations_sql() -> str:
    """Replays testdata.dyn_mutations' mutation trace as set algebra."""
    return f"""
WITH {_BASE},
surv AS (SELECT src, dst FROM e WHERE src % 7 <> 3 AND dst % 7 <> 3),
added AS (SELECT i AS src, (i * 2 + 1) % {LG_MOD} AS dst FROM range(100) t(i)),
unioned AS (SELECT src, dst FROM surv UNION SELECT src, dst FROM added),
deld AS (SELECT i AS src, (i * 2 + 1) % {LG_MOD} AS dst FROM range(50) t(i))
SELECT src, dst FROM unioned EXCEPT SELECT src, dst FROM deld
"""


def lg_edges_weighted_sql() -> str:
    return (
        f"SELECT (l_orderkey % {LG_MOD}) AS src, (l_partkey % {LG_MOD}) AS dst, "
        "count(*) AS weight FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD}) GROUP BY src, dst"
    )


def lg_vertices_sql() -> str:
    return f"WITH {_BASE} SELECT oid, row_number() OVER (ORDER BY oid) - 1 AS vid FROM v"


def lg_degree_sql() -> str:
    return (
        f"WITH {_BASE} SELECT v.oid, coalesce(o.d, 0) AS out_deg "
        "FROM v LEFT JOIN outd o ON o.oid = v.oid"
    )


def lg_undirected_edge_count_sql() -> str:
    return f"WITH {_BASE} SELECT count(*) AS n_undirected_edges FROM ue"


def lg_pagerank_sql(rounds: int = 15, alpha: float = 0.85) -> str:
    """Unrolled NetworkX PageRank: r' = α·insum + (α·dangling + (1-α))/N."""
    ctes = [f"p0 AS MATERIALIZED (SELECT oid, 1.0/(SELECT n FROM nv) AS score FROM v)"]
    for k in range(rounds):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(p.score),0) AS ds FROM p{k} p "
            f"LEFT JOIN outd o ON o.oid=p.oid WHERE o.d IS NULL)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT e.dst AS oid, sum(p.score / o.d) AS insum "
            f"FROM e JOIN p{k} p ON p.oid=e.src JOIN outd o ON o.oid=e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, {alpha}*coalesce(s.insum,0) + "
            f"({alpha}*(SELECT ds FROM d{k}) + {1 - alpha:.2f})/(SELECT n FROM nv) AS score "
            f"FROM v LEFT JOIN s{k} s ON s.oid=v.oid)"
        )
    return f"WITH {_BASE}, " + ",\n".join(ctes) + f" SELECT oid, round(score, 8) AS score FROM p{rounds}"


def lg_pagerank_weighted_sql(rounds: int = 15, alpha: float = 0.85) -> str:
    """Unrolled weight-proportional PageRank over the multiplicity-weighted
    edges: r' = α·Σ r[u]·w/W(u) + (α·dangling + 1−α)/N; the vertex frame is
    the engine's dense [0, LG_MOD) vid space (isolated oids score the base
    mass, exactly like the engine's num_vertices=LG_MOD build)."""
    N = LG_MOD
    ctes = [
        f"we AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst, CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD}) GROUP BY src, dst)",
        f"wpv AS MATERIALIZED (SELECT unnest(generate_series(0, {N - 1})) AS oid)",
        "wout AS MATERIALIZED (SELECT src AS oid, sum(w) AS wd FROM we GROUP BY src)",
        f"p0 AS MATERIALIZED (SELECT oid, 1.0/{N} AS score FROM wpv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(p.score),0) AS ds FROM p{k} p "
            f"LEFT JOIN wout o ON o.oid=p.oid WHERE o.wd IS NULL)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT we.dst AS oid, "
            f"sum(p.score / o.wd * we.w) AS insum "
            f"FROM we JOIN p{k} p ON p.oid=we.src JOIN wout o ON o.oid=we.src "
            "GROUP BY we.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, {alpha}*coalesce(s.insum,0) + "
            f"({alpha}*(SELECT ds FROM d{k}) + {1 - alpha:.2f})/{N} AS score "
            f"FROM wpv v LEFT JOIN s{k} s ON s.oid=v.oid)"
        )
    return "WITH " + ",\n".join(ctes) + (
        f" SELECT oid, round(score, 8) AS score FROM p{rounds} ORDER BY oid"
    )


def lg_pagerank_push_sql(rounds: int = 15, alpha: float = 0.85) -> str:
    """Unrolled PUSH/delta PageRank (programs.PageRankPush): p0 = 0,
    r0 = (1-α)/N; per round p' = p + r and r' = Σ_in α·r[u]/outdeg[u]
    + α·dangling_r/N.  The output p after ``rounds`` rounds is the exact
    Neumann partial sum — different finite-round values than the power
    iteration in lg_pagerank_sql, same limit."""
    ctes = [
        "r0 AS MATERIALIZED (SELECT oid, "
        f"{1 - alpha:.2f}/(SELECT n FROM nv) AS r FROM v)",
        "q0 AS MATERIALIZED (SELECT oid, 0.0 AS score FROM v)",
    ]
    for k in range(rounds):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(r.r),0) AS ds FROM r{k} r "
            f"LEFT JOIN outd o ON o.oid=r.oid WHERE o.d IS NULL)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT e.dst AS oid, sum({alpha}*r.r/o.d) AS insum "
            f"FROM e JOIN r{k} r ON r.oid=e.src JOIN outd o ON o.oid=e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"q{k + 1} AS MATERIALIZED (SELECT q.oid, q.score + r.r AS score "
            f"FROM q{k} q JOIN r{k} r ON r.oid=q.oid)"
        )
        ctes.append(
            f"r{k + 1} AS MATERIALIZED (SELECT v.oid, coalesce(s.insum,0) + "
            f"{alpha}*(SELECT ds FROM d{k})/(SELECT n FROM nv) AS r "
            f"FROM v LEFT JOIN s{k} s ON s.oid=v.oid)"
        )
    return (
        f"WITH {_BASE}, "
        + ",\n".join(ctes)
        + f" SELECT oid, round(score, 8) AS score FROM q{rounds}"
    )


def _ppr_ctes(rounds: int = 10, source: int = 0) -> list[str]:
    """Shared unrolled FLASH-PPR CTEs (used by lg_ppr and lg_sweep_cut)."""
    ctes = [
        "degb AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM me GROUP BY src)",
        f"p0 AS MATERIALIZED (SELECT oid, CASE WHEN oid = {source} THEN 1.0 ELSE 0.0 END AS score FROM v)",
    ]
    for k in range(rounds):
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT me.dst AS oid, sum(p.score / b.d) AS insum "
            f"FROM me JOIN p{k} p ON p.oid = me.src JOIN degb b ON b.oid = me.src "
            "GROUP BY me.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, 0.5*coalesce(s.insum, 0) + "
            f"CASE WHEN v.oid = {source} THEN 0.5 ELSE 0.0 END AS score "
            f"FROM v LEFT JOIN s{k} s ON s.oid = v.oid)"
        )
    return ctes


def lg_ppr_sql(rounds: int = 10, source: int = 0) -> str:
    """Unrolled FLASH PPR (apps/flash/ranking/ppr.h:41-72): r0 = e_source;
    r'[v] = 0.5·Σ_{u∈N(v)} r[u]/deg[u] + 0.5·1{v=source} over both edge
    directions (EU) with deg = outdeg + indeg (flash_utils.h:47)."""
    ctes = _ppr_ctes(rounds, source)
    return f"WITH {_BASE}, " + ",\n".join(ctes) + (
        f" SELECT oid, round(score, 8) AS score FROM p{rounds}"
    )


def lg_ppr_seeds_sql(rounds: int = 10, n_seeds: int = 4) -> str:
    """Unrolled seed-set PPR: p0 = (1/k)·1_S, teleport 0.5·(1/k) on the
    seed set, same me-degree diffusion as lg_ppr_sql."""
    seeds = ", ".join(str(x) for x in range(n_seeds))
    w = f"(1.0/{n_seeds})"
    ctes = [
        "degb AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM me GROUP BY src)",
        f"p0 AS MATERIALIZED (SELECT oid, CASE WHEN oid IN ({seeds}) THEN {w} "
        "ELSE 0.0 END AS score FROM v)",
    ]
    for k in range(rounds):
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT me.dst AS oid, sum(p.score / b.d) AS insum "
            f"FROM me JOIN p{k} p ON p.oid = me.src JOIN degb b ON b.oid = me.src "
            "GROUP BY me.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, 0.5*coalesce(s.insum, 0) + "
            f"CASE WHEN v.oid IN ({seeds}) THEN 0.5*{w} ELSE 0.0 END AS score "
            f"FROM v LEFT JOIN s{k} s ON s.oid = v.oid)"
        )
    return f"WITH {_BASE}, " + ",\n".join(ctes) + (
        f" SELECT oid, round(score, 8) AS score FROM p{rounds}"
    )


def lg_sweep_cut_sql(rounds: int = 10, source: int = 0, topk: int = 64) -> str:
    """Conductance sweep over the PPR ranking (Andersen–Chung–Lang):
    ratio = round(score,8)/deg, rank by (ratio DESC, oid), per-prefix cut
    from +/- rank events of each me arc (crossing while src inside, dst
    outside), vol = running Σ deg, φ = cut / min(vol, m − vol) (0 when the
    denominator is 0).  Mirrors metrics.sweep_cut bit-for-bit."""
    ctes = _ppr_ctes(rounds, source)
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f""",
rt AS MATERIALIZED (SELECT p.oid, b.d, round(p.score, 8) / b.d AS ratio
  FROM p{rounds} p JOIN degb b ON b.oid = p.oid),
rk AS MATERIALIZED (SELECT oid, d, rn FROM (
  SELECT oid, d, row_number() OVER (ORDER BY ratio DESC, oid) AS rn FROM rt)
  WHERE rn <= {topk}),
plus AS MATERIALIZED (SELECT a.rn AS at, count(*) AS c FROM me
  JOIN rk a ON a.oid = me.src LEFT JOIN rk b ON b.oid = me.dst
  WHERE b.rn IS NULL OR a.rn < b.rn GROUP BY a.rn),
minus AS MATERIALIZED (SELECT b.rn AS at, count(*) AS c FROM me
  JOIN rk a ON a.oid = me.src JOIN rk b ON b.oid = me.dst
  WHERE a.rn < b.rn GROUP BY b.rn),
tot AS MATERIALIZED (SELECT count(*) AS m FROM me),
curve AS (SELECT rk.rn AS rnk, rk.oid,
  CAST(sum(coalesce(p.c, 0) - coalesce(mi.c, 0)) OVER (ORDER BY rk.rn) AS BIGINT) AS cut,
  CAST(sum(rk.d) OVER (ORDER BY rk.rn) AS BIGINT) AS vol
  FROM rk LEFT JOIN plus p ON p.at = rk.rn LEFT JOIN minus mi ON mi.at = rk.rn)
SELECT rnk, oid, cut, vol,
  CASE WHEN least(vol, (SELECT m FROM tot) - vol) > 0
       THEN round(CAST(cut AS DOUBLE) / least(vol, (SELECT m FROM tot) - vol), 8)
       ELSE 0.0 END AS phi
FROM curve ORDER BY rnk"""
    )


def lg_articlerank_sql(rounds: int = 10, damping: float = 0.85) -> str:
    """Unrolled FLASH ArticleRank (apps/flash/ranking/articlerank.h:42-74):
    r0 = 0; r'[v] = d·Σ_{u→v} r[u]/(outdeg[u]+avg) + (1−d), avg = mean outdeg."""
    ctes = [
        "avgd AS MATERIALIZED (SELECT (SELECT CAST(coalesce(sum(d),0) AS DOUBLE) FROM outd)"
        " / (SELECT n FROM nv) AS a)",
        "p0 AS MATERIALIZED (SELECT oid, 0.0 AS score FROM v)",
    ]
    for k in range(rounds):
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT e.dst AS oid, "
            "sum(p.score / (o.d + (SELECT a FROM avgd))) AS insum "
            f"FROM e JOIN p{k} p ON p.oid = e.src JOIN outd o ON o.oid = e.src "
            "GROUP BY e.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, {damping}*coalesce(s.insum, 0) + "
            f"{1 - damping:.2f} AS score FROM v LEFT JOIN s{k} s ON s.oid = v.oid)"
        )
    return f"WITH {_BASE}, " + ",\n".join(ctes) + (
        f" SELECT oid, round(score, 8) AS score FROM p{rounds}"
    )


def lg_wcc_sql() -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        "reach(rv, c) AS MATERIALIZED (SELECT oid, oid FROM v UNION "
        "SELECT ue.dst, r.c FROM reach r JOIN ue ON ue.src = r.rv) "
        "SELECT rv AS oid, min(c) AS comp_oid FROM reach GROUP BY rv"
    )


def lg_cdlp_sql(rounds: int = 10) -> str:
    """Unrolled synchronous LPA over the neighbor multiset; mode with min-label
    tie-break; isolated vertices keep their label."""
    ctes = ["l0 AS MATERIALIZED (SELECT oid, oid AS label FROM v)"]
    for k in range(rounds):
        ctes.append(
            f"c{k} AS MATERIALIZED (SELECT me.dst AS oid, l.label, count(*) AS cnt "
            f"FROM me JOIN l{k} l ON l.oid = me.src GROUP BY me.dst, l.label)"
        )
        ctes.append(
            f"m{k} AS MATERIALIZED (SELECT oid, label FROM (SELECT oid, label, "
            f"row_number() OVER (PARTITION BY oid ORDER BY cnt DESC, label ASC) AS rn "
            f"FROM c{k}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{k + 1} AS MATERIALIZED (SELECT v.oid, coalesce(m.label, l.label) AS label "
            f"FROM v JOIN l{k} l ON l.oid=v.oid LEFT JOIN m{k} m ON m.oid=v.oid)"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes) + f" SELECT oid, label AS label_oid FROM l{rounds}"
    )


_TRI = """
deg AS MATERIALIZED (SELECT src AS tv, count(*) AS d FROM ue GROUP BY src),
oe AS MATERIALIZED (SELECT ue.src AS a, ue.dst AS b FROM ue
       JOIN deg da ON da.tv = ue.src JOIN deg db ON db.tv = ue.dst
       WHERE da.d < db.d OR (da.d = db.d AND ue.src < ue.dst)),
tr AS MATERIALIZED (SELECT ab.a AS u, ab.b AS w1, bc.b AS w2 FROM oe ab
       JOIN oe bc ON bc.a = ab.b JOIN oe ac ON ac.a = ab.a AND ac.b = bc.b)
"""


def lg_triangles_sql() -> str:
    return (
        f"WITH {_BASE}, {_TRI}, "
        "corners AS MATERIALIZED (SELECT u AS oid FROM tr UNION ALL SELECT w1 FROM tr UNION ALL SELECT w2 FROM tr) "
        "SELECT v.oid, coalesce(c.tri, 0) AS tri FROM v LEFT JOIN "
        "(SELECT oid, count(*) AS tri FROM corners GROUP BY oid) c ON c.oid = v.oid"
    )


def lg_triangle_total_sql() -> str:
    return f"WITH {_BASE}, {_TRI} SELECT count(*) AS n_triangles FROM tr"


def lg_lcc_sql() -> str:
    return (
        f"WITH {_BASE}, {_TRI}, "
        "corners AS MATERIALIZED (SELECT u AS oid FROM tr UNION ALL SELECT w1 FROM tr UNION ALL SELECT w2 FROM tr), "
        "tc AS MATERIALIZED (SELECT oid, count(*) AS tri FROM corners GROUP BY oid) "
        "SELECT v.oid, round(CASE WHEN coalesce(d.d,0) > 1 "
        "THEN 2.0 * coalesce(tc.tri,0) / (d.d * (d.d - 1)) ELSE 0 END, 8) AS lcc "
        "FROM v LEFT JOIN deg d ON d.tv = v.oid LEFT JOIN tc ON tc.oid = v.oid"
    )


def lg_bfs_sql(max_depth: int = 200) -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        "src0 AS MATERIALIZED (SELECT min(oid) AS s FROM v), "
        f"walk(wv, d) AS MATERIALIZED (SELECT s, 0 FROM src0 UNION "
        f"SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < {max_depth}) "
        "SELECT wv AS oid, min(d) AS depth FROM walk GROUP BY wv"
    )


def lg_sssp_sql(max_depth: int = 200) -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        "src0 AS MATERIALIZED (SELECT min(oid) AS s FROM v), "
        f"walk(wv, d) AS MATERIALIZED (SELECT s, 0 FROM src0 UNION "
        f"SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < {max_depth}) "
        "SELECT wv AS oid, CAST(min(d) AS DOUBLE) AS dist FROM walk GROUP BY wv"
    )


def lg_hits_sql(iters: int = 5) -> str:
    ctes = ["h0 AS MATERIALIZED (SELECT oid, 1.0/(SELECT n FROM nv) AS hub FROM v)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"ra{k} AS MATERIALIZED (SELECT e.dst AS oid, sum(h.hub) AS s FROM e "
            f"JOIN h{k - 1} h ON h.oid = e.src GROUP BY e.dst)"
        )
        ctes.append(f"sa{k} AS MATERIALIZED (SELECT coalesce(sum(s),0) AS t FROM ra{k})")
        ctes.append(
            f"a{k} AS MATERIALIZED (SELECT v.oid, CASE WHEN (SELECT t FROM sa{k}) = 0 THEN 0 "
            f"ELSE coalesce(ra.s, 0)/(SELECT t FROM sa{k}) END AS auth "
            f"FROM v LEFT JOIN ra{k} ra ON ra.oid = v.oid)"
        )
        ctes.append(
            f"rh{k} AS MATERIALIZED (SELECT e.src AS oid, sum(a.auth) AS s FROM e "
            f"JOIN a{k} a ON a.oid = e.dst GROUP BY e.src)"
        )
        ctes.append(f"sh{k} AS MATERIALIZED (SELECT coalesce(sum(s),0) AS t FROM rh{k})")
        ctes.append(
            f"h{k} AS MATERIALIZED (SELECT v.oid, CASE WHEN (SELECT t FROM sh{k}) = 0 THEN 0 "
            f"ELSE coalesce(rh.s, 0)/(SELECT t FROM sh{k}) END AS hub "
            f"FROM v LEFT JOIN rh{k} rh ON rh.oid = v.oid)"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT a.oid, round(a.auth, 8) AS auth, round(h.hub, 8) AS hub "
        f"FROM a{iters} a JOIN h{iters} h ON h.oid = a.oid"
    )


def lg_eigenvector_sql(iters: int = 10) -> str:
    ctes = ["x0 AS MATERIALIZED (SELECT oid, 1.0/(SELECT n FROM nv) AS x FROM v)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT v.oid, coalesce(s.s, 0) + x.x AS r FROM v "
            f"JOIN x{k - 1} x ON x.oid = v.oid LEFT JOIN "
            f"(SELECT e.dst AS oid, sum(x2.x) AS s FROM e JOIN x{k - 1} x2 ON x2.oid = e.src "
            f"GROUP BY e.dst) s ON s.oid = v.oid)"
        )
        ctes.append(f"n{k} AS MATERIALIZED (SELECT sqrt(sum(r*r)) AS nn FROM r{k})")
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT oid, r / (CASE WHEN (SELECT nn FROM n{k}) = 0 THEN 1 "
            f"ELSE (SELECT nn FROM n{k}) END) AS x FROM r{k})"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT oid, round(x, 8) AS centrality FROM x{iters}"
    )


def lg_katz_sql(iters: int = 8, alpha: float = 0.05, beta: float = 1.0) -> str:
    ctes = ["x0 AS MATERIALIZED (SELECT oid, 0.0 AS x FROM v)"]
    for k in range(1, iters + 1):
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT v.oid, CAST({alpha} AS DOUBLE)*coalesce(s.s, 0) + CAST({beta} AS DOUBLE) AS x FROM v LEFT JOIN "
            f"(SELECT e.dst AS oid, sum(x2.x) AS s FROM e JOIN x{k - 1} x2 ON x2.oid = e.src "
            f"GROUP BY e.dst) s ON s.oid = v.oid)"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f", nrm AS MATERIALIZED (SELECT CASE WHEN sqrt(sum(x*x)) = 0 THEN 1 ELSE sqrt(sum(x*x)) END AS nn FROM x{iters}) "
        f"SELECT oid, round(x / (SELECT nn FROM nrm), 8) AS centrality FROM x{iters}"
    )


def lg_degree_centrality_sql() -> str:
    return (
        f"WITH {_BASE} SELECT v.oid, round(coalesce(o.d, 0) / "
        "(CAST((SELECT n FROM nv) AS DOUBLE) - 1), 8) AS centrality "
        "FROM v LEFT JOIN outd o ON o.oid = v.oid"
    )


def lg_assortativity_sql() -> str:
    return (
        f"WITH {_BASE}, deg AS MATERIALIZED (SELECT src AS tv, count(*) AS d FROM ue GROUP BY src) "
        "SELECT round(corr(CAST(da.d AS DOUBLE), CAST(db.d AS DOUBLE)), 8) AS assortativity "
        "FROM ue JOIN deg da ON da.tv = ue.src JOIN deg db ON db.tv = ue.dst"
    )


def lg_avg_degree_connectivity_sql() -> str:
    return (
        f"WITH {_BASE}, deg AS MATERIALIZED (SELECT src AS tv, count(*) AS d FROM ue GROUP BY src) "
        "SELECT da.d AS k, round(avg(CAST(db.d AS DOUBLE)), 8) AS avg_conn "
        "FROM ue JOIN deg da ON da.tv = ue.src JOIN deg db ON db.tv = ue.dst GROUP BY da.d"
    )


def lg_node_boundary_sql(s_max: int = 100) -> str:
    return (
        f"WITH {_BASE} SELECT DISTINCT dst AS oid FROM e WHERE src < {s_max} AND dst >= {s_max}"
    )


def lg_edge_boundary_sql(s_max: int = 100) -> str:
    return f"WITH {_BASE} SELECT src, dst FROM e WHERE src < {s_max} AND dst >= {s_max}"


def lg_transitivity_sql() -> str:
    return (
        f"WITH {_BASE}, {_TRI}, "
        "w AS MATERIALIZED (SELECT sum(d * (d - 1)) / 2.0 AS wedges FROM deg) "
        "SELECT round(3.0 * (SELECT count(*) FROM tr) / (SELECT wedges FROM w), 8) AS transitivity"
    )


def lg_avg_clustering_sql() -> str:
    return (
        f"WITH {_BASE}, {_TRI}, "
        "corners AS MATERIALIZED (SELECT u AS oid FROM tr UNION ALL SELECT w1 FROM tr UNION ALL SELECT w2 FROM tr), "
        "tc AS MATERIALIZED (SELECT oid, count(*) AS tri FROM corners GROUP BY oid), "
        "l AS MATERIALIZED (SELECT v.oid, CASE WHEN coalesce(d.d,0) > 1 "
        "THEN 2.0 * coalesce(tc.tri,0) / (d.d * (d.d - 1)) ELSE 0 END AS lcc "
        "FROM v LEFT JOIN deg d ON d.tv = v.oid LEFT JOIN tc ON tc.oid = v.oid) "
        "SELECT round(sum(lcc) / (SELECT n FROM nv), 8) AS avg_clustering FROM l"
    )


def lg_kcore_sql(k: int = 5, rounds: int = 40) -> str:
    """Unrolled k-core peeling: per round drop alive vertices whose alive-
    degree < k (same fixpoint as the engine's KCore program; `rounds` must
    exceed the peel depth — extra rounds are no-ops)."""
    ctes = ["a0 AS MATERIALIZED (SELECT oid FROM v)"]
    for r in range(rounds):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT ue.src AS oid, count(*) AS d FROM ue "
            f"JOIN a{r} x ON x.oid = ue.src JOIN a{r} y ON y.oid = ue.dst GROUP BY ue.src)"
        )
        ctes.append(
            f"a{r + 1} AS MATERIALIZED (SELECT a.oid FROM a{r} a JOIN d{r} d "
            f"ON d.oid = a.oid WHERE d.d >= {k})"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT v.oid, CASE WHEN f.oid IS NULL THEN 0 ELSE 1 END AS in_core "
        f"FROM v LEFT JOIN a{rounds} f ON f.oid = v.oid"
    )


def lg_voterank_sql(k: int = 10) -> str:
    """Unrolled VoteRank elections: per election score(v) = Σ ability over
    undirected neighbors, winner = max score (tie → min oid, score > 0),
    then the winner's neighbors lose f = N/|ue| ability (floor 0)."""
    ctes = [
        "f0 AS MATERIALIZED (SELECT CAST((SELECT n FROM nv) AS DOUBLE) / (SELECT count(*) FROM ue) AS f)",
        "ab0 AS MATERIALIZED (SELECT oid, 1.0 AS ability FROM v)",
        "ex0 AS MATERIALIZED (SELECT oid FROM v WHERE 1=0)",
    ]
    for e in range(k):
        ctes.append(
            f"sc{e} AS MATERIALIZED (SELECT ue.dst AS oid, sum(ab.ability) AS score "
            f"FROM ue JOIN ab{e} ab ON ab.oid = ue.src GROUP BY ue.dst)"
        )
        ctes.append(
            f"w{e} AS MATERIALIZED (SELECT s.oid, s.score FROM sc{e} s "
            f"LEFT JOIN ex{e} x ON x.oid = s.oid WHERE x.oid IS NULL AND s.score > 0 "
            f"ORDER BY s.score DESC, s.oid ASC LIMIT 1)"
        )
        ctes.append(
            f"ab{e + 1} AS MATERIALIZED (SELECT a.oid, CASE WHEN nb.oid IS NOT NULL "
            f"THEN greatest(a.ability - (SELECT f FROM f0), 0) ELSE a.ability END AS ability "
            f"FROM ab{e} a LEFT JOIN (SELECT DISTINCT ue.dst AS oid FROM ue "
            f"WHERE ue.src = (SELECT oid FROM w{e})) nb ON nb.oid = a.oid)"
        )
        ctes.append(
            f"ex{e + 1} AS MATERIALIZED (SELECT oid FROM ex{e} UNION SELECT oid FROM w{e})"
        )
    ranks = " UNION ALL ".join(
        f"SELECT {e} AS rank, oid FROM w{e}" for e in range(k)
    )
    return f"WITH {_BASE}, " + ",\n".join(ctes) + f" SELECT rank, oid FROM ({ranks}) ORDER BY rank"


# NOTE: under WITH RECURSIVE, DuckDB 1.0 stops deduplicating the plain
# UNION inside the non-recursive `v` CTE (it returns 2·|e| rows) — queries
# that join or count v in the final select must use the re-deduplicated
# `vd`/`nvd` below.  (wcc/bfs/sssp are immune: they only aggregate.)
def _bfs_unrolled(sources_cte: str, depth: int = 8) -> str:
    """Level-synchronous all-sources BFS as unrolled frontier CTEs ending in
    sp(s, wv, d) — each frontier is (new pairs) EXCEPT (already reached), so
    the work is Σ|frontier| instead of the walk-enumeration blowup (the
    recursive-CTE form materialized every (s, wv, d) walk tuple and was the
    single most expensive oracle in the gate: 44 s → ~a few s)."""
    parts = [
        f"f0 AS MATERIALIZED (SELECT oid AS s, oid AS wv FROM {sources_cte})",
        "r0 AS MATERIALIZED (SELECT s, wv FROM f0)",
        "sp0 AS (SELECT s, wv, 0 AS d FROM f0)",
    ]
    for d in range(1, depth + 1):
        parts.append(
            f"f{d} AS MATERIALIZED (SELECT DISTINCT w.s, e.dst AS wv "
            f"FROM f{d-1} w JOIN e ON e.src = w.wv "
            f"EXCEPT SELECT s, wv FROM r{d-1})"
        )
        parts.append(
            f"r{d} AS MATERIALIZED (SELECT s, wv FROM r{d-1} UNION ALL SELECT s, wv FROM f{d})"
        )
        parts.append(f"sp{d} AS (SELECT s, wv, {d} AS d FROM f{d})")
    union = " UNION ALL ".join(f"SELECT * FROM sp{d}" for d in range(depth + 1))
    parts.append(f"sp AS MATERIALIZED ({union})")
    return ",\n".join(parts)


def lg_closeness_harmonic_sql() -> str:
    return (
        f"WITH {_BASE}, "
        "vd AS MATERIALIZED (SELECT DISTINCT oid FROM v), "
        "nvd AS MATERIALIZED (SELECT count(*) AS n FROM vd), "
        f"{_bfs_unrolled('vd')} "
        "SELECT vd.oid, round(coalesce(c.h, 0) / (CAST((SELECT n FROM nvd) AS DOUBLE) - 1), 8) AS closeness "
        "FROM vd LEFT JOIN (SELECT wv AS oid, sum(1.0 / d) AS h FROM sp WHERE d > 0 GROUP BY wv) c "
        "ON c.oid = vd.oid"
    )


def lg_closeness_sampled_sql(num_sources: int = 8) -> str:
    """Harmonic closeness from the num_sources smallest oids (the engine's
    deterministic sampled variant)."""
    return (
        f"WITH RECURSIVE {_BASE}, "
        "vd AS MATERIALIZED (SELECT DISTINCT oid FROM v), "
        f"s8 AS MATERIALIZED (SELECT oid FROM vd ORDER BY oid LIMIT {num_sources}), "
        "walk(s, wv, d) AS MATERIALIZED ("
        "  SELECT oid, oid, 0 FROM s8 UNION "
        "  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < 8), "
        "sp AS MATERIALIZED (SELECT s, wv, min(d) AS d FROM walk GROUP BY s, wv) "
        f"SELECT vd.oid, round(coalesce(c.h, 0) / {num_sources}, 8) AS closeness "
        "FROM vd LEFT JOIN (SELECT wv AS oid, sum(1.0 / d) AS h FROM sp WHERE d > 0 GROUP BY wv) c "
        "ON c.oid = vd.oid"
    )


def lg_apsp_sql(s_max: int = 32) -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        f"srcs AS MATERIALIZED (SELECT DISTINCT oid FROM v WHERE oid < {s_max}), "
        "walk(s, wv, d) AS MATERIALIZED ("
        "  SELECT oid, oid, 0 FROM srcs UNION "
        "  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < 8) "
        "SELECT s AS src_oid, wv AS dst_oid, min(d) AS dist FROM walk GROUP BY s, wv"
    )


def text_langid_sql() -> str:
    """Replicates LangId: stopword-profile scores over letter tokens of the
    lowercased text; winner = max score (tie → lexicographically largest
    lang), 'unknown' when best ≤ 0.05."""
    profiles = {
        "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
        "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
        "es": ["el", "la", "de", "que", "y", "los", "en", "un", "una", "es"],
    }
    score_cols = []
    for lang, words in profiles.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"CASE WHEN length(toks) = 0 THEN 0.0 ELSE "
            f"CAST(length(list_filter(toks, x -> x IN ({lst}))) AS DOUBLE) / length(toks) END AS s_{lang}"
        )
    return f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-zäöüéèêàçñ]+') AS toks FROM documents),
s AS MATERIALIZED (SELECT doc_id, {", ".join(score_cols)} FROM t),
b AS MATERIALIZED (SELECT doc_id, greatest(s_en, s_de, s_fr, s_es) AS best,
  CASE WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       ELSE 'de' END AS pred
  FROM s)
SELECT doc_id, CASE WHEN best > 0.05 THEN pred ELSE 'unknown' END AS lang_pred,
       round(best, 8) AS lang_score
FROM b
"""


def dedup_embedding_sql(threshold: float = 0.99, n_planted: int = 10) -> str:
    """Brute-force oracle for the LSH near-dup path over the embeddings
    table with ``n_planted`` planted exact duplicates (vec_id + 10000, same
    vector — cosine exactly 1, LSH recall exactly 1): the synthetic
    embeddings are near-orthogonal (max pairwise cosine ≈0.51), so without
    planting the 0.99-threshold check would pass vacuously at 0 rows."""
    return f"""
WITH em AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings
  WHERE vec_id < {n_planted}
)
SELECT a.vec_id AS a, b.vec_id AS b
FROM em a JOIN em b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
ORDER BY a, b
"""


# ---------------------------------------------------------------------------
# relational / text / similarity / events oracles


def op_filter_project_sql() -> str:
    return (
        "SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem WHERE l_quantity > 30"
    )


def op_groupby_agg_sql() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 6) AS sum_qty, "
        "round(sum(l_extendedprice), 4) AS sum_price, count(*) AS n "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    )


def op_sort_topk_sql() -> str:
    return (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
    )


def op_join_addcolumn_sql() -> str:
    return (
        "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
        "LEFT JOIN customer ON c_custkey = o_custkey"
    )


def op_distinct_sql() -> str:
    return "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def op_union_distinct_sql() -> str:
    return (
        "SELECT DISTINCT nationkey FROM (SELECT c_nationkey AS nationkey FROM customer "
        "UNION ALL SELECT s_nationkey FROM supplier)"
    )


def op_intersect_sql() -> str:
    return (
        "SELECT p_partkey FROM part INTERSECT "
        "SELECT l_partkey FROM lineitem WHERE l_quantity >= 46"
    )


def op_except_sql() -> str:
    return (
        "SELECT p_partkey FROM part EXCEPT "
        "SELECT l_partkey FROM lineitem WHERE l_quantity >= 46"
    )


def op_unpivot_sql() -> str:
    return (
        "SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS value FROM part "
        "UNION ALL "
        "SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS value FROM part"
    )


def op_consolidate_sql() -> str:
    return (
        "SELECT p_partkey, printf('[%d,%.2f]', p_size, p_retailprice) AS consolidated FROM part"
    )


def events_first_touch_sql() -> str:
    """First-touch replica: min (ts, event_id) row per user."""
    return (
        "SELECT user_id, ts AS first_ts, event_id AS first_event_id, "
        "event_type AS first_type FROM ("
        "SELECT user_id, ts, event_id, event_type, row_number() OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events) "
        "WHERE rn = 1 ORDER BY user_id"
    )


def events_rfm_sql() -> str:
    """RFM replica: per-user (max epoch-us, count, exact cents sum),
    quintile cuts via quantile_disc at 0.2/0.4/0.6/0.8, score = 1 + #cuts
    strictly below the metric."""
    cut = lambda c, q: (
        f"(SELECT quantile_disc({c}, {q}) FROM agg)"
    )
    score = lambda c: " + ".join(
        f"(CASE WHEN {c} > {cut(c, q)} THEN 1 ELSE 0 END)" for q in (0.2, 0.4, 0.6, 0.8)
    )
    return (
        "WITH agg AS MATERIALIZED (SELECT user_id, max(epoch_us(ts)) AS r, "
        "count(*) AS f, CAST(sum(CAST(floor(100 * value + 0.5) AS BIGINT)) AS BIGINT) AS m "
        "FROM events GROUP BY user_id) "
        f"SELECT user_id, r, f, m, 1 + {score('r')} AS r_score, "
        f"1 + {score('f')} AS f_score, 1 + {score('m')} AS m_score "
        "FROM agg ORDER BY user_id"
    )


def events_trending_sql(window_s: int = 3600, k: int = 3) -> str:
    """Trending replica: (window, type) counts, rank by (count DESC, type)."""
    return (
        f"WITH c AS MATERIALIZED (SELECT "
        f"(epoch_us(ts) // {window_s * 1_000_000}) * {window_s} AS window_start, "
        "event_type, count(*) AS n_events FROM events "
        "GROUP BY window_start, event_type) "
        "SELECT window_start, rnk, event_type, n_events FROM ("
        "SELECT window_start, event_type, n_events, row_number() OVER ("
        "PARTITION BY window_start ORDER BY n_events DESC, event_type) AS rnk FROM c) "
        f"WHERE rnk <= {k} ORDER BY window_start, rnk"
    )


def op_corr_sql(scale: int = 100) -> str:
    """Pearson replica over (l_quantity, l_discount, l_tax): the same
    floor(scale*x+0.5) quantization, HUGEINT moments, one float combine."""
    cols = ["l_quantity", "l_discount", "l_tax"]
    q = {c: f"CAST(floor({scale} * CAST({c} AS DOUBLE) + 0.5) AS HUGEINT)" for c in cols}
    moments = ", ".join(
        f"sum({q[a]} * {q[b]}) AS s_{ia}_{ib}"
        for ia, a in enumerate(cols)
        for ib, b in enumerate(cols)
        if ia <= ib
    ) + ", " + ", ".join(f"sum({q[c]}) AS t_{ic}" for ic, c in enumerate(cols))
    pair_rows = []
    for ia, a in enumerate(cols):
        for ib, b in enumerate(cols):
            if ia >= ib:
                continue
            num = f"(n * s_{ia}_{ib} - t_{ia} * t_{ib})"
            dena = f"(n * s_{ia}_{ia} - t_{ia} * t_{ia})"
            denb = f"(n * s_{ib}_{ib} - t_{ib} * t_{ib})"
            pair_rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n, "
                f"CASE WHEN {dena} > 0 AND {denb} > 0 THEN round("
                f"CAST({num} AS DOUBLE) / sqrt(CAST({dena} AS DOUBLE) * "
                f"CAST({denb} AS DOUBLE)), 8) ELSE 0.0 END AS r FROM m"
            )
    return (
        f"WITH m AS MATERIALIZED (SELECT count(*) AS n, {moments} FROM lineitem) "
        + " UNION ALL ".join(pair_rows)
    )


def op_histogram_sql(width: float = 50.0) -> str:
    """Histogram replica: floor(value/width) bins, count + exact cents."""
    return (
        f"SELECT CAST(floor(value / {width}) AS BIGINT) AS bin, count(*) AS n, "
        "CAST(sum(CAST(floor(100 * value + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents "
        "FROM events GROUP BY bin ORDER BY bin"
    )


def op_mad_sql(z_cut: float = 3.5) -> str:
    """MAD robust-outlier replica: quantile_disc medians, the same
    0.6745 modified-z rule."""
    return (
        "WITH med AS MATERIALIZED (SELECT quantile_disc(value, 0.5) AS m FROM events), "
        "mad AS MATERIALIZED (SELECT quantile_disc(abs(value - (SELECT m FROM med)), 0.5) AS d "
        "FROM events) "
        "SELECT count(*) AS n, round((SELECT m FROM med), 8) AS median, "
        "round((SELECT d FROM mad), 8) AS mad, "
        "CAST(coalesce(sum(CASE WHEN (SELECT d FROM mad) > 0 AND "
        f"0.6745 * abs(value - (SELECT m FROM med)) / (SELECT d FROM mad) > {z_cut} "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_outliers FROM events"
    )


def events_trend_sql() -> str:
    """Per-type OLS slope replica: seconds since global min ts, cents
    values, HUGEINT moments, one float division."""
    return (
        "WITH t0 AS MATERIALIZED (SELECT min(epoch_us(ts)) AS m FROM events), "
        "q AS MATERIALIZED (SELECT event_type, "
        "CAST((epoch_us(ts) - (SELECT m FROM t0)) // 1000000 AS HUGEINT) AS t, "
        "CAST(floor(100 * value + 0.5) AS HUGEINT) AS v FROM events), "
        "m AS MATERIALIZED (SELECT event_type, count(*) AS n, sum(t) AS st, "
        "sum(v) AS sv, sum(t * v) AS stv, sum(t * t) AS stt "
        "FROM q GROUP BY event_type) "
        "SELECT event_type, CAST(n AS BIGINT) AS n, "
        "CASE WHEN n * stt - st * st > 0 THEN round("
        "CAST(n * stv - st * sv AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE), 8) "
        "ELSE 0.0 END AS slope FROM m ORDER BY event_type"
    )


def events_gaps_sql() -> str:
    """Inter-arrival replica: lag window gaps in microseconds, min/max/
    quantile_disc median per user."""
    return (
        "WITH d AS MATERIALIZED (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events) "
        "SELECT user_id, count(gap) AS n_gaps, min(gap) AS min_gap, "
        "max(gap) AS max_gap, quantile_disc(gap, 0.5) AS median_gap "
        "FROM d WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"
    )


def events_cohort_sql(week_us: int = 604_800_000_000) -> str:
    """Weekly cohort retention replica: epoch-week floor, per-user min week
    as the cohort, distinct active (user, week), count per offset."""
    return (
        f"WITH uw AS MATERIALIZED (SELECT DISTINCT user_id, "
        f"epoch_us(ts) // {week_us} AS wk FROM events), "
        "coh AS MATERIALIZED (SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id) "
        "SELECT c.cw AS cohort_week, u.wk - c.cw AS week_offset, "
        "count(*) AS n_users FROM uw u JOIN coh c ON c.user_id = u.user_id "
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"
    )


def events_window_sql(window_s: int = 3600) -> str:
    return (
        f"SELECT event_type, CAST(floor(epoch(ts) / {window_s}) AS BIGINT) * {window_s} "
        "AS window_start, count(*) AS n_events, round(sum(value), 8) AS sum_value "
        "FROM events GROUP BY event_type, window_start"
    )


def sessionize_sql(gap_s: int = 1800) -> str:
    return f"""
WITH x AS MATERIALIZED (
  SELECT user_id, epoch(ts) AS tss, value,
    CASE WHEN lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
          OR epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) > {gap_s}
         THEN 1 ELSE 0 END AS new
  FROM events),
y AS MATERIALIZED (SELECT *, sum(new) OVER (PARTITION BY user_id ORDER BY tss
        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
SELECT user_id, count(*) AS n_events, round(min(tss), 6) AS t_start,
       round(max(tss), 6) AS t_end, round(sum(value), 8) AS sum_value
FROM y GROUP BY user_id, sid
"""


def events_session_stats_sql(gap_s: int = 1800) -> str:
    """Session-summary replica: integer aggregates over the nested
    sessionize query."""
    inner = sessionize_sql(gap_s)
    return (
        f"SELECT count(*) AS n_sessions, "
        "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce, "
        "CAST(sum(n_events) AS BIGINT) AS total_events, "
        "CAST(max(n_events) AS BIGINT) AS max_events "
        f"FROM ({inner})"
    )


def dedup_exact_sql() -> str:
    return (
        "SELECT doc_id, sha256(text) AS text_sha256 FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1"
    )


def text_tokens_sql() -> str:
    return (
        "SELECT doc_id, CAST(length(list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '')) AS BIGINT) AS n_tokens FROM documents"
    )


def text_stats_sql() -> str:
    return (
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
        "CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_words, "
        "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha, "
        "CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit "
        "FROM documents"
    )


def text_quality_sql() -> str:
    return """
WITH s AS MATERIALIZED (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS chars,
    CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE) AS words,
    CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha
  FROM documents)
SELECT doc_id, round(
  0.4 * (CASE WHEN chars >= 50 AND chars <= 100000 THEN 1 ELSE 0 END)
  + 0.4 * (CASE WHEN chars > 0 THEN alpha / chars ELSE 0 END)
  + 0.2 * (CASE WHEN words > 0 AND chars/words >= 3 AND chars/words <= 12 THEN 1 ELSE 0 END), 8)
  AS quality
FROM s
"""


def sim_topk_sql(n_queries: int = 5, k: int = 10) -> str:
    return f"""
WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
s AS MATERIALIZED (SELECT q.query_id, e.vec_id,
        list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
      FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id, round(sim, 8) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn FROM s)
WHERE rn <= {k}
"""


def sim_range_sql(n_queries: int = 5, tau: float = 0.3) -> str:
    """Cosine range-search replica: every (query, vector) pair with
    list_cosine_similarity >= tau."""
    return f"""
WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
s AS MATERIALIZED (SELECT q.query_id, e.vec_id,
        list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
      FROM q CROSS JOIN embeddings e)
SELECT query_id, vec_id, round(sim, 8) AS score FROM s WHERE sim >= {tau}
ORDER BY query_id, vec_id
"""


def lpa_u2i_sql(max_round: int = 8) -> str:
    """Unrolled lpa_u2i (apps/lpa/lpa_u2i.h IncEval steps 2..max_round) over
    the supplier→part bipartite graph: u2i at even reference steps (items
    replace labels with Σ user_label·1), i2u at odd steps ≥3 with the
    degree-normalized correction and 0/1 pinning on the CURRENT value."""
    ctes = [
        "be AS MATERIALIZED (SELECT l_suppkey AS u, l_partkey AS i FROM lineitem)",
        "odeg AS MATERIALIZED (SELECT u, count(*) AS d FROM be GROUP BY u)",
        "ideg AS MATERIALIZED (SELECT i, count(*) AS d FROM be GROUP BY i)",
        "ssum AS MATERIALIZED (SELECT be.u, sum(ideg.d) AS s FROM be "
        "JOIN ideg ON ideg.i=be.i GROUP BY be.u)",
        "norm AS MATERIALIZED (SELECT min(s_acctbal) AS lo, max(s_acctbal) AS hi FROM supplier)",
        "u0 AS MATERIALIZED (SELECT s_suppkey AS u, "
        "(s_acctbal - (SELECT lo FROM norm)) / ((SELECT hi FROM norm) - (SELECT lo FROM norm)) AS l0, "
        "((s_suppkey * 37) % 100 + CAST(0.5 AS DOUBLE)) / 101 AS l1 FROM supplier)",
    ]
    cur = "u0"
    for step in range(2, max_round + 1):
        if step % 2 == 0:  # u2i: items pull user labels
            ctes.append(
                f"i{step} AS MATERIALIZED (SELECT be.i, sum(u.l0) AS l0, sum(u.l1) AS l1 "
                f"FROM be JOIN {cur} u ON u.u=be.u GROUP BY be.i)"
            )
        else:  # i2u: users pull item labels with the correction formula
            ctes.append(
                f"t{step} AS MATERIALIZED (SELECT be.u, sum(it.l0) AS t0, sum(it.l1) AS t1 "
                f"FROM be JOIN i{step - 1} it ON it.i=be.i GROUP BY be.u)"
            )
            ctes.append(
                f"u{step} AS MATERIALIZED (SELECT u.u, "
                f"CASE WHEN u.l0 IN (0, 1) THEN u.l0 "
                f"WHEN coalesce(s.s, 0) = coalesce(o.d, 0) THEN u.l0 "
                f"ELSE (coalesce(t.t0, 0) - coalesce(o.d, 0) * u.l0) / (s.s - o.d) END AS l0, "
                f"CASE WHEN u.l1 IN (0, 1) THEN u.l1 "
                f"WHEN coalesce(s.s, 0) = coalesce(o.d, 0) THEN u.l1 "
                f"ELSE (coalesce(t.t1, 0) - coalesce(o.d, 0) * u.l1) / (s.s - o.d) END AS l1 "
                f"FROM {cur} u LEFT JOIN odeg o ON o.u=u.u "
                f"LEFT JOIN ssum s ON s.u=u.u LEFT JOIN t{step} t ON t.u=u.u)"
            )
            cur = f"u{step}"
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT u AS s_suppkey, round(l0, 8) AS label_0, round(l1, 8) AS label_1 "
        f"FROM {cur} ORDER BY s_suppkey"
    )


def lg_succs_sql() -> str:
    """REPORT_GRAPH SUCCS_BY_NODE of the min-oid vertex."""
    return (
        f"WITH {_BASE} SELECT dst AS succ FROM e "
        "WHERE src = (SELECT min(oid) FROM v) ORDER BY succ"
    )


def lg_preds_sql() -> str:
    """REPORT_GRAPH PREDS_BY_NODE of the min-oid vertex."""
    return (
        f"WITH {_BASE} SELECT src AS pred FROM e "
        "WHERE dst = (SELECT min(oid) FROM v) ORDER BY pred"
    )


def lg_simple_paths_sql(targets=(1, 2, 3), cutoff: int = 2) -> str:
    """Simple paths of ≤2 edges from the min-oid vertex to targets, -1-padded
    (matches all_simple_paths + reference padding).  Self-loops are absent
    from e, so only t<>source needs an explicit guard on 2-edge paths."""
    ts = ", ".join(str(t) for t in targets)
    assert cutoff == 2, "SQL unrolled for cutoff=2"
    return (
        f"WITH {_BASE}, s AS MATERIALIZED (SELECT min(oid) AS s FROM v), "
        f"p1 AS (SELECT src AS p0, dst AS p1, CAST(-1 AS BIGINT) AS p2 FROM e "
        f"WHERE src = (SELECT s FROM s) AND dst IN ({ts})), "
        f"p2 AS (SELECT a.src AS p0, a.dst AS p1, b.dst AS p2 FROM e a "
        f"JOIN e b ON b.src = a.dst "
        f"WHERE a.src = (SELECT s FROM s) AND b.dst IN ({ts}) AND b.dst <> a.src) "
        f"SELECT * FROM p1 UNION ALL SELECT * FROM p2 ORDER BY p0, p1, p2"
    )


def lg_is_simple_path_sql() -> str:
    return (
        f"WITH {_BASE} SELECT "
        "CAST(CASE WHEN EXISTS(SELECT 1 FROM e WHERE src=0 AND dst=1) "
        "AND EXISTS(SELECT 1 FROM e WHERE src=1 AND dst=2) THEN 1 ELSE 0 END AS BIGINT) "
        "AS path_012_ok, CAST(0 AS BIGINT) AS path_010_ok"
    )


def lg_path_enum_sql(length: int = 2, start_filter: int = 5) -> str:
    assert length == 2, "SQL unrolled for length=2"
    return (
        f"WITH {_BASE} SELECT a.src AS v0, a.dst AS v1, b.dst AS v2 "
        f"FROM e a JOIN e b ON b.src = a.dst WHERE a.src < {start_filter} "
        f"ORDER BY v0, v1, v2"
    )


_PG_BASE = """
nc AS MATERIALIZED (SELECT max(c_custkey) + 1 AS n FROM customer),
nor AS MATERIALIZED (SELECT max(o_orderkey) + 1 AS n FROM orders),
pe AS MATERIALIZED (
  SELECT o_custkey AS src, o_orderkey + (SELECT n FROM nc) AS dst FROM orders
  UNION
  SELECT l_orderkey + (SELECT n FROM nc),
         l_partkey + (SELECT n FROM nc) + (SELECT n FROM nor) FROM lineitem
),
pv AS MATERIALIZED (SELECT src AS gv FROM pe UNION SELECT dst FROM pe),
pue AS MATERIALIZED (SELECT src, dst FROM pe UNION SELECT dst AS src, src AS dst FROM pe)
"""

_PG_SPLIT = """
  CASE WHEN gv < (SELECT n FROM nc) THEN 'customer'
       WHEN gv < (SELECT n FROM nc) + (SELECT n FROM nor) THEN 'order'
       ELSE 'part' END AS v_label,
  CASE WHEN gv < (SELECT n FROM nc) THEN gv
       WHEN gv < (SELECT n FROM nc) + (SELECT n FROM nor) THEN gv - (SELECT n FROM nc)
       ELSE gv - (SELECT n FROM nc) - (SELECT n FROM nor) END AS v_key
"""


def pg_wcc_sql(rounds: int = 32) -> str:
    """Property-graph WCC over the customer→order→part union (ref
    apps/property/wcc_property.h — per-label ranges of one fragment, min-gid
    components) as UNROLLED min-label propagation: the recursive-closure
    formulation materializes |V|·|labels| rows (explodes on the ~18k-vertex
    union graph), whereas ``rounds`` ≥ diameter rounds of l' = min(l,
    min_nbr l) converge exactly like the engine's frontier WCC.  32 rounds
    is far past this graph's diameter; a too-small bound would fail the
    hash check loudly, not silently."""
    ctes = ["w0 AS MATERIALIZED (SELECT gv, gv AS c FROM pv)"]
    for k in range(rounds):
        ctes.append(
            f"n{k} AS MATERIALIZED (SELECT pue.dst AS gv, min(w.c) AS mc "
            f"FROM pue JOIN w{k} w ON w.gv = pue.src GROUP BY pue.dst)"
        )
        ctes.append(
            f"w{k + 1} AS MATERIALIZED (SELECT w.gv, "
            f"least(w.c, coalesce(n.mc, w.c)) AS c "
            f"FROM w{k} w LEFT JOIN n{k} n ON n.gv = w.gv)"
        )
    return (
        f"WITH {_PG_BASE}, " + ",\n".join(ctes)
        + f" SELECT {_PG_SPLIT}, comp FROM "
        f"(SELECT gv, c AS comp FROM w{rounds}) "
        "ORDER BY v_label, v_key"
    )


def pg_project_wcc_sql() -> str:
    """Oracle for PROJECT_TO_SIMPLE + WCC on the (order, next) labeled
    projection: the 'next' edges chain each customer's orders, so a weakly-
    connected component is exactly one customer's order set and the min-oid
    component id is the customer's smallest orderkey (single-order customers
    are isolated vertices: comp = self)."""
    return (
        "SELECT o_orderkey AS oid, "
        "min(o_orderkey) OVER (PARTITION BY o_custkey) AS comp "
        "FROM orders ORDER BY oid"
    )


def pg_addcol_consolidate_sql() -> str:
    """Oracle for ADD_COLUMN + CONSOLIDATE_COLUMNS on the labeled graph:
    out/in degree of the per-customer order chain is 1 unless the order is
    the customer's last/first; consolidated as the stringified [out,in]
    pair the engine exports."""
    return (
        "WITH d AS (SELECT o_orderkey AS oid, "
        "CASE WHEN LEAD(o_orderkey) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderkey) IS NULL THEN 0 ELSE 1 END AS outd, "
        "CASE WHEN LAG(o_orderkey) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderkey) IS NULL THEN 0 ELSE 1 END AS ind "
        "FROM orders) "
        "SELECT oid, '[' || outd || ',' || ind || ']' AS deg FROM d ORDER BY oid"
    )


def pg_sssp_sql(max_depth: int = 64) -> str:
    """Property SSSP/BFS (ref apps/property/sssp_property.h, unit weights)
    from customer 0 along directed union edges."""
    return (
        f"WITH RECURSIVE {_PG_BASE}, "
        f"walk(wv, d) AS MATERIALIZED (SELECT CAST(0 AS BIGINT), 0 UNION "
        f"SELECT pe.dst, w.d + 1 FROM walk w JOIN pe ON pe.src = w.wv WHERE w.d < {max_depth}) "
        f"SELECT {_PG_SPLIT}, depth FROM "
        "(SELECT wv AS gv, min(d) AS depth FROM walk GROUP BY wv) "
        "ORDER BY v_label, v_key"
    )


def _brandes_ctes(num_sources: int, max_depth: int) -> list[str]:
    """Shared per-source Brandes CTEs (BFS levels, forward σ, backward δ)
    used by both the vertex and the per-edge betweenness oracles."""
    ctes = []
    for s in range(num_sources):
        p = f"s{s}"
        ctes.append(
            f"lvl_{p}(v, d) AS MATERIALIZED (SELECT CAST({s} AS BIGINT), 0 "
            f"UNION SELECT e.dst, l.d + 1 FROM lvl_{p} l JOIN e ON e.src = l.v "
            f"WHERE l.d < {max_depth})"
        )
        ctes.append(
            f"lv_{p} AS MATERIALIZED (SELECT v, min(d) AS d FROM lvl_{p} GROUP BY v)"
        )
        ctes.append(f"sg0_{p} AS MATERIALIZED (SELECT CAST({s} AS BIGINT) AS v, CAST(1 AS DOUBLE) AS sig)")
        for k in range(max_depth):
            ctes.append(
                f"sg{k + 1}_{p} AS MATERIALIZED (SELECT e.dst AS v, sum(sg.sig) AS sig "
                f"FROM e JOIN sg{k}_{p} sg ON sg.v = e.src "
                f"JOIN lv_{p} l ON l.v = e.dst AND l.d = {k + 1} GROUP BY e.dst)"
            )
        ctes.append(
            f"dl{max_depth}_{p} AS MATERIALIZED (SELECT v, CAST(0 AS DOUBLE) AS del "
            f"FROM lv_{p} WHERE d = {max_depth})"
        )
        for k in range(max_depth - 1, -1, -1):
            ctes.append(
                f"dl{k}_{p} AS MATERIALIZED (SELECT sv.v, coalesce(sum("
                f"(sv.sig / sw.sig) * (1 + dw.del)), 0) AS del "
                f"FROM sg{k}_{p} sv "
                f"LEFT JOIN e ON e.src = sv.v "
                f"LEFT JOIN sg{k + 1}_{p} sw ON sw.v = e.dst "
                f"LEFT JOIN dl{k + 1}_{p} dw ON dw.v = e.dst "
                f"GROUP BY sv.v)"
            )
    return ctes


def lg_betweenness_sql(num_sources: int = 8, max_depth: int = 12) -> str:
    """Unrolled Brandes betweenness (directed, unnormalized, endpoints
    excluded) from the ``num_sources`` smallest oids: per source, BFS levels
    (recursive, depth-capped), σ path counts forward per level, δ
    dependencies backward per level (δ(v) = Σ_{v→w, lvl(w)=lvl(v)+1}
    σ(v)/σ(w)·(1+δ(w))); bc(v) = Σ_s δ_s(v), v ≠ s.  Empty levels yield
    empty CTEs and contribute nothing, so max_depth only needs to be ≥ the
    true eccentricity of each source."""
    ctes = _brandes_ctes(num_sources, max_depth)
    contribs = []
    for s in range(num_sources):
        p = f"s{s}"
        contribs.extend(
            f"SELECT v, del FROM dl{k}_{p} WHERE v <> {s}" for k in range(max_depth + 1)
        )
    union = " UNION ALL ".join(contribs)
    return (
        f"WITH RECURSIVE {_BASE}, " + ",\n".join(ctes)
        + f", contrib AS MATERIALIZED ({union}) "
        # DISTINCT guard: DuckDB 1.x drops the UNION dedup of non-recursive
        # CTEs (v) when the statement is WITH RECURSIVE
        "SELECT v.oid, round(coalesce(c.bc, 0), 8) AS betweenness "
        "FROM (SELECT DISTINCT oid FROM v) v "
        "LEFT JOIN (SELECT v, sum(del) AS bc FROM contrib GROUP BY v) c ON c.v = v.oid "
        "ORDER BY v.oid"
    )


def lg_edge_betweenness_sql(num_sources: int = 8, max_depth: int = 12) -> str:
    """Per-EDGE Brandes betweenness (networkx edge_betweenness_centrality
    semantics over the sampled sources, unnormalized): reuses the vertex
    oracle's σ/δ CTEs; the per-edge contribution of shortest-path-DAG edge
    (v, w) at level k→k+1 under source s is σ_s(v)·(1+δ_s(w))/σ_s(w)
    (Brandes 2001 Thm. 6); ebc(e) = Σ_s Σ_k contributions.  Edges off every
    source's DAG report 0."""
    ctes = _brandes_ctes(num_sources, max_depth)
    contribs = []
    for s in range(num_sources):
        p = f"s{s}"
        contribs.extend(
            f"SELECT e.src, e.dst, sv.sig * ((1 + dw.del) / sw.sig) AS c "
            f"FROM e JOIN sg{k}_{p} sv ON sv.v = e.src "
            f"JOIN sg{k + 1}_{p} sw ON sw.v = e.dst "
            f"JOIN dl{k + 1}_{p} dw ON dw.v = e.dst"
            for k in range(max_depth)
        )
    union = " UNION ALL ".join(contribs)
    return (
        f"WITH RECURSIVE {_BASE}, " + ",\n".join(ctes)
        + f", contrib AS MATERIALIZED ({union}) "
        # DISTINCT guard: see lg_betweenness_sql
        "SELECT ed.src, ed.dst, round(coalesce(c.ebc, 0), 8) AS ebc "
        "FROM (SELECT DISTINCT src, dst FROM e) ed "
        "LEFT JOIN (SELECT src, dst, sum(c) AS ebc FROM contrib GROUP BY src, dst) c "
        "ON c.src = ed.src AND c.dst = ed.dst "
        "ORDER BY ed.src, ed.dst"
    )


def lg_sssp_weighted_sql(rounds: int = 24, source: int = 0) -> str:
    """Weighted SSSP as UNROLLED Bellman-Ford rounds (d' = min(d, min over
    in-edges d[src]+w)) over the multiplicity-weighted lg edges — a
    recursive walk CTE would enumerate every (vertex, cum-distance) pair and
    explode on this dense graph; bounded min-propagation converges exactly
    like the engine's frontier relaxation.  INF is a sentinel (1e18),
    filtered at the end; ``rounds`` ≥ the hop count of the longest shortest
    path (diameter ≤ 6 here; 24 is a loud-failure margin)."""
    ctes = _sssp_w_ctes(rounds, source)
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT oid, round(dist, 8) AS dist FROM b{rounds} WHERE dist < 1e17 ORDER BY oid"
    )


def lg_avg_path_length_weighted_sql(s_max: int = 16, rounds: int = 24) -> str:
    """Weighted average path length as MULTI-SOURCE unrolled Bellman-Ford:
    the b{k} relation carries a source column s, so one round relaxes all
    s_max sources at once (the SQL mirror of the engine's (n_local, S)
    matrix relaxation in programs.MsSssp).  Weights are integer lineitem
    multiplicities, so the avg is exact to 8 decimals."""
    ctes = [
        f"we AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst, CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD}) GROUP BY src, dst)",
        "wv AS MATERIALIZED (SELECT DISTINCT oid FROM ("
        "SELECT src AS oid FROM we UNION ALL SELECT dst FROM we))",
        f"srcs AS MATERIALIZED (SELECT unnest(generate_series(0, {s_max - 1})) AS s)",
        "b0 AS MATERIALIZED (SELECT srcs.s, wv.oid, "
        "CASE WHEN wv.oid = srcs.s THEN 0.0 ELSE 1e18 END AS dist "
        "FROM srcs CROSS JOIN wv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT b.s, we.dst AS oid, min(b.dist + we.w) AS nd "
            f"FROM we JOIN b{k} b ON b.oid = we.src WHERE b.dist < 1e17 GROUP BY b.s, we.dst)"
        )
        ctes.append(
            f"b{k + 1} AS MATERIALIZED (SELECT b.s, b.oid, "
            "least(b.dist, coalesce(r.nd, b.dist)) AS dist "
            f"FROM b{k} b LEFT JOIN r{k} r ON r.s = b.s AND r.oid = b.oid)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT CAST(count(*) AS BIGINT) AS n_pairs, round(avg(dist), 8) AS avg_len "
        f"FROM b{rounds} WHERE dist < 1e17 AND s <> oid"
    )


def _sssp_w_ctes(rounds: int, source: int) -> list[str]:
    ctes = [
        f"we AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst, CAST(count(*) AS DOUBLE) AS w FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD}) GROUP BY src, dst)",
        "wv AS MATERIALIZED (SELECT DISTINCT oid FROM ("
        f"SELECT src AS oid FROM we UNION ALL SELECT dst FROM we UNION ALL SELECT {source}))",
        f"b0 AS MATERIALIZED (SELECT oid, CASE WHEN oid = {source} THEN 0.0 "
        "ELSE 1e18 END AS dist FROM wv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"r{k} AS MATERIALIZED (SELECT we.dst AS oid, min(b.dist + we.w) AS nd "
            f"FROM we JOIN b{k} b ON b.oid = we.src WHERE b.dist < 1e17 GROUP BY we.dst)"
        )
        ctes.append(
            f"b{k + 1} AS MATERIALIZED (SELECT b.oid, least(b.dist, coalesce(r.nd, b.dist)) AS dist "
            f"FROM b{k} b LEFT JOIN r{k} r ON r.oid = b.oid)"
        )
    return ctes


def events_hopping_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    """Hopping windows: event → all k = window_s/hop_s covering windows via
    a generate_series cross join."""
    k = window_s // hop_s
    return f"""
WITH ex AS MATERIALIZED (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT) // ({hop_s} * 1000000)) * {hop_s}
           - g.i * {hop_s} AS window_start,
         value
  FROM events, (SELECT unnest(generate_series(0, {k - 1})) AS i) g
)
SELECT event_type, window_start, count(*) AS n_events,
       round(sum(value), 8) AS sum_value
FROM ex WHERE window_start >= 0
GROUP BY event_type, window_start
ORDER BY event_type, window_start
"""


def dedup_ngram_sql(n_docs: int = 40, k: int = 5, threshold: float = 0.2) -> str:
    """Exact character-k-gram Jaccard between all doc pairs under n_docs
    (the standalone n-gram verifier; the engine computes it over 64-bit
    shingle hashes — injective in practice, and the texts are ASCII so byte
    and character windows coincide)."""
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < {n_docs}),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS s
  FROM d, LATERAL (SELECT unnest(generate_series(1, len(text) - {k - 1})) AS i) g),
cnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS MATERIALIZED (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT a, b, round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 8) AS jaccard
FROM inter JOIN cnt na ON na.doc_id = a JOIN cnt nb ON nb.doc_id = b
WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {threshold}
ORDER BY a, b
"""


def decontaminate_sql(k: int = 8, mod: int = 41, rem: int = 3) -> str:
    """Benchmark decontamination (functions/dedup.py:decontaminate): the eval
    set is the doc_id % mod == rem slice; n_hits = count of a doc's DISTINCT
    character-k-grams that appear anywhere in the eval slice.  Engine-side
    hashes are 64-bit (injective in practice) and the texts are ASCII, so
    byte and character windows coincide — same contract as dedup_ngram."""
    return f"""
WITH ev AS (SELECT text FROM documents WHERE doc_id % {mod} = {rem}),
evsh AS MATERIALIZED (SELECT DISTINCT substr(text, CAST(i AS INT), {k}) AS s
  FROM ev, LATERAL (SELECT unnest(generate_series(1, len(text) - {k - 1})) AS i) g),
trsh AS MATERIALIZED (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS s
  FROM documents, LATERAL (SELECT unnest(generate_series(1, len(text) - {k - 1})) AS i) g),
hits AS (SELECT t.doc_id, count(*) AS n_hits FROM trsh t JOIN evsh e USING (s) GROUP BY t.doc_id)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


def text_repetition_sql() -> str:
    """Gopher repetition filter (functions/text.py:repetition_stats): per doc,
    chars covered by the most frequent overlapping word 2-/3-gram and by all
    duplicated word 5-grams; grams are single-space-joined, len(g) = Σ word
    chars + (n-1).  Thresholds as integer comparisons (top2 frac > 0.2, dup5
    frac > 0.15) so no float column is hashed."""
    return r"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
  FROM documents),
w AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS w FROM tk),
g2 AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win AS g FROM w
       WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
g3 AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS g
       FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
g5 AS (SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win
              || ' ' || lead(w, 3) OVER win || ' ' || lead(w, 4) OVER win AS g
       FROM w WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
a2 AS (SELECT doc_id, max(c * gl) AS v FROM
         (SELECT doc_id, count(*) AS c, len(g) AS gl FROM g2
          WHERE g IS NOT NULL GROUP BY doc_id, g) GROUP BY doc_id),
a3 AS (SELECT doc_id, max(c * gl) AS v FROM
         (SELECT doc_id, count(*) AS c, len(g) AS gl FROM g3
          WHERE g IS NOT NULL GROUP BY doc_id, g) GROUP BY doc_id),
d5 AS (SELECT doc_id, sum(c * gl) AS v FROM
         (SELECT doc_id, count(*) AS c, len(g) AS gl FROM g5
          WHERE g IS NOT NULL GROUP BY doc_id, g) WHERE c >= 2 GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(a2.v, 0) AS BIGINT) AS top2_chars,
       CAST(coalesce(a3.v, 0) AS BIGINT) AS top3_chars,
       CAST(coalesce(d5.v, 0) AS BIGINT) AS dup5_chars,
       CAST(len(d.text) AS BIGINT) AS n_chars,
       (5 * coalesce(a2.v, 0) > len(d.text)
        OR 20 * coalesce(d5.v, 0) > 3 * len(d.text)) AS repetitive
FROM documents d
LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
ORDER BY doc_id
"""


def pii_scrub_sql() -> str:
    """PII scrub (functions/text.py:pii_scrub) over documents with PII
    planted deterministically from doc_id (the raw table has none — the
    plant makes the oracle non-trivial).  Same RE2 patterns, same
    email → ip → phone replace order as the engine."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    phone = "\\b\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{4}\\b"
    return f"""
WITH planted AS (
  SELECT doc_id, text || CASE doc_id % 5
    WHEN 0 THEN ' contact bob.smith+x@example-site.org or admin@host.io now'
    WHEN 1 THEN ' server at 192.168.1.254 port 8080'
    WHEN 2 THEN ' call +1 555 0123 or 415-555-0199 today'
    ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(
    text, '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'),
    '{phone}', '<PHONE>', 'g') AS clean_text
FROM planted
ORDER BY doc_id
"""


def pack_sequences_sql(seq_len: int = 256) -> str:
    """Sequence packing (functions/mlprep.py:pack_sequences): docs laid out
    end-to-end in doc_id order, cut into seq_len-token sequences; each doc
    tagged with the sequence/offset of its first token.  The exclusive
    running sum mirrors the engine's ordered_cumsum scan."""
    return rf"""
WITH tok AS (
  SELECT doc_id,
         CAST(length(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER
           (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM tok)
SELECT doc_id, n_tokens,
       CAST(cum_before // {seq_len} AS BIGINT) AS seq_id,
       CAST(cum_before % {seq_len} AS BIGINT) AS seq_offset
FROM c
ORDER BY doc_id
"""


def lg_ktruss_sql(k: int = 4, rounds: int = 8) -> str:
    """Unrolled k-truss peel over the canonical undirected lg edges: per
    round, degree-ordered orientation, triangle enumeration, per-edge
    support via the 3 canonical projections, drop support < k-2.  The peel
    is monotone and idempotent at the fixpoint, so over-unrolling is safe."""
    ctes = [
        f"ce0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, "
        f"greatest(src, dst) AS dst FROM e)"
    ]
    for r in range(rounds):
        ctes.append(
            f"kd{r} AS MATERIALIZED (SELECT tv, count(*) AS d FROM ("
            f"SELECT src AS tv FROM ce{r} UNION ALL SELECT dst FROM ce{r}) GROUP BY tv)"
        )
        ctes.append(
            f"ko{r} AS MATERIALIZED (SELECT CASE WHEN fa THEN src ELSE dst END AS a, "
            f"CASE WHEN fa THEN dst ELSE src END AS b FROM ("
            f"SELECT ce.src, ce.dst, (da.d < db.d OR (da.d = db.d AND ce.src < ce.dst)) AS fa "
            f"FROM ce{r} ce JOIN kd{r} da ON da.tv = ce.src JOIN kd{r} db ON db.tv = ce.dst))"
        )
        ctes.append(
            f"kt{r} AS MATERIALIZED (SELECT ab.a, ab.b, bc.b AS c FROM ko{r} ab "
            f"JOIN ko{r} bc ON bc.a = ab.b JOIN ko{r} ac ON ac.a = ab.a AND ac.b = bc.b)"
        )
        ctes.append(
            f"ks{r} AS MATERIALIZED (SELECT src, dst, count(*) AS sup FROM ("
            f"SELECT least(a, b) AS src, greatest(a, b) AS dst FROM kt{r} "
            f"UNION ALL SELECT least(b, c), greatest(b, c) FROM kt{r} "
            f"UNION ALL SELECT least(a, c), greatest(a, c) FROM kt{r}) GROUP BY src, dst)"
        )
        ctes.append(
            f"ce{r + 1} AS MATERIALIZED (SELECT src, dst FROM ks{r} WHERE sup >= {k - 2})"
        )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT src, dst FROM ce{rounds} ORDER BY src, dst"
    )


def lg_trussness_sql(kmax: int = 6, rounds: int = 6) -> str:
    """Full truss decomposition on the canonical SPARSE undirected edges:
    for k = 3..kmax, chain the lg_ktruss_sql peel (each k starts from the
    previous k's fixpoint — k-truss ⊆ (k-1)-truss); trussness(e) = 2 + the
    number of k-fixpoints containing e.  kmax/rounds over-unroll safely
    (peels are monotone and idempotent at their fixpoints).

    The engine (algorithms.truss_decomposition) runs with kmax_guard=64 and
    peels each k to its true fixpoint; a static SQL unroll of that budget is
    infeasible, so this oracle uses data-dependent bounds (default 6/6,
    sufficient for the SPARSE-sampled test graph at every sf) and makes the
    bounds SELF-CHECKING instead of silently saturating: the final SELECT
    calls duckdb ``error()`` if (a) any peel level failed to reach its
    fixpoint within ``rounds`` (tc{k}_{rounds} != tc{k}_{rounds-1}) or
    (b) edges survive the kmax-truss (true trussness could exceed kmax).
    On denser data the gate therefore fails LOUDLY with a named cause —
    raise kmax/rounds — rather than reporting a false value mismatch."""
    ctes = [
        "f2 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, "
        "greatest(src, dst) AS dst FROM se)"
    ]
    for k in range(3, kmax + 1):
        prev = f"f{k - 1}"
        ctes.append(f"tc{k}_0 AS MATERIALIZED (SELECT src, dst FROM {prev})")
        for r in range(rounds):
            p = f"tc{k}_{r}"
            ctes.append(
                f"td{k}_{r} AS MATERIALIZED (SELECT tv, count(*) AS d FROM ("
                f"SELECT src AS tv FROM {p} UNION ALL SELECT dst FROM {p}) GROUP BY tv)"
            )
            ctes.append(
                f"to{k}_{r} AS MATERIALIZED (SELECT CASE WHEN fa THEN src ELSE dst END AS a, "
                f"CASE WHEN fa THEN dst ELSE src END AS b FROM ("
                f"SELECT ce.src, ce.dst, (da.d < db.d OR (da.d = db.d AND ce.src < ce.dst)) AS fa "
                f"FROM {p} ce JOIN td{k}_{r} da ON da.tv = ce.src "
                f"JOIN td{k}_{r} db ON db.tv = ce.dst))"
            )
            ctes.append(
                f"tt{k}_{r} AS MATERIALIZED (SELECT ab.a, ab.b, bc.b AS c FROM to{k}_{r} ab "
                f"JOIN to{k}_{r} bc ON bc.a = ab.b "
                f"JOIN to{k}_{r} ac ON ac.a = ab.a AND ac.b = bc.b)"
            )
            ctes.append(
                f"ts{k}_{r} AS MATERIALIZED (SELECT src, dst, count(*) AS sup FROM ("
                f"SELECT least(a, b) AS src, greatest(a, b) AS dst FROM tt{k}_{r} "
                f"UNION ALL SELECT least(b, c), greatest(b, c) FROM tt{k}_{r} "
                f"UNION ALL SELECT least(a, c), greatest(a, c) FROM tt{k}_{r}) GROUP BY src, dst)"
            )
            ctes.append(
                f"tc{k}_{r + 1} AS MATERIALIZED "
                f"(SELECT src, dst FROM ts{k}_{r} WHERE sup >= {k - 2})"
            )
        ctes.append(f"f{k} AS MATERIALIZED (SELECT src, dst FROM tc{k}_{rounds})")
    member = " + ".join(
        f"(CASE WHEN EXISTS (SELECT 1 FROM f{k} WHERE f{k}.src = f2.src "
        f"AND f{k}.dst = f2.dst) THEN 1 ELSE 0 END)"
        for k in range(3, kmax + 1)
    )
    # Self-check CTEs: every peel level converged within `rounds`, and the
    # kmax-truss is empty (otherwise true trussness could exceed kmax).
    conv = " + ".join(
        f"(SELECT abs(count(*) - (SELECT count(*) FROM tc{k}_{rounds - 1})) "
        f"FROM tc{k}_{rounds})"
        for k in range(3, kmax + 1)
    )
    ctes.append(
        f"truss_guard AS (SELECT CASE WHEN ({conv}) > 0 THEN "
        f"error('lg_trussness_sql: peel unconverged within rounds={rounds}; raise rounds') "
        f"WHEN (SELECT count(*) FROM f{kmax}) > 0 THEN "
        f"error('lg_trussness_sql: edges survive the kmax={kmax}-truss; raise kmax') "
        f"ELSE 0 END AS ok)"
    )
    return (
        f"WITH {_SBASE}, " + ",\n".join(ctes)
        + f" SELECT src, dst, 2 + {member} AS trussness FROM f2, truss_guard "
        f"WHERE truss_guard.ok = 0 ORDER BY src, dst"
    )


def lg_cocitation_sql(k: int = 5, cap: int = 16) -> str:
    """Co-citation top-k replica: per-source cap smallest out-neighbors
    (row_number over dst), pair counts among capped fanouts, symmetric
    expand, rank by (cocit DESC, v ASC) per u."""
    return (
        f"WITH {_BASE}, "
        f"ecap AS MATERIALIZED (SELECT src, dst FROM ("
        f"SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn "
        f"FROM e) WHERE rn <= {cap}), "
        "pairs AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, count(*) AS cocit "
        "FROM ecap a JOIN ecap b ON a.src = b.src AND a.dst < b.dst GROUP BY u, v), "
        "sym AS MATERIALIZED (SELECT u, v, cocit FROM pairs "
        "UNION ALL SELECT v AS u, u AS v, cocit FROM pairs), "
        "rk AS (SELECT u, v, cocit, row_number() OVER ("
        "PARTITION BY u ORDER BY cocit DESC, v ASC) AS rnk FROM sym) "
        f"SELECT u, v, cocit, rnk FROM rk WHERE rnk <= {k} ORDER BY u, rnk"
    )


def lg_adamic_topk_sql(k: int = 5, cap: int = 16, max_deg: int = 2048) -> str:
    """Adamic–Adar top-k replica: the capped-wedge pair join of
    lg_cocitation_sql weighted by the shared source's full out-degree
    through the EMBEDDED numpy integer table round(1e12/ln d) —
    minibatch.aa_weight_int evaluated in python so both sides share one
    rounding kernel (degrees are bounded by the LG_MOD vertex universe)."""
    import numpy as np

    from graphscope_ray.graph.minibatch import aa_weight_int

    degs = np.arange(2, max_deg + 1)
    ws = aa_weight_int(degs)
    vals = ", ".join(f"({int(d)}, {int(w)})" for d, w in zip(degs, ws))
    return (
        f"WITH {_BASE}, "
        f"wt(d, w) AS (VALUES {vals}), "
        f"ecap AS MATERIALIZED (SELECT src, dst FROM ("
        f"SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) AS rn "
        f"FROM e) WHERE rn <= {cap}), "
        "pairs AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, "
        "CAST(sum(w.w) AS BIGINT) AS aa "
        "FROM ecap a JOIN ecap b ON a.src = b.src AND a.dst < b.dst "
        "JOIN outd o ON o.oid = a.src JOIN wt w ON w.d = o.d GROUP BY u, v), "
        "sym AS MATERIALIZED (SELECT u, v, aa FROM pairs "
        "UNION ALL SELECT v AS u, u AS v, aa FROM pairs), "
        "rk AS (SELECT u, v, aa, row_number() OVER ("
        "PARTITION BY u ORDER BY aa DESC, v ASC) AS rnk FROM sym) "
        f"SELECT u, v, aa, rnk FROM rk WHERE rnk <= {k} ORDER BY u, rnk"
    )


def lg_bibcoupling_sql(k: int = 5, cap: int = 16) -> str:
    """Bibliographic-coupling top-k replica: lg_cocitation_sql on the
    reversed arcs — per-TARGET cap smallest citers, pair counts, rank."""
    return (
        f"WITH {_BASE}, "
        f"ecap AS MATERIALIZED (SELECT src, dst FROM ("
        f"SELECT dst AS src, src AS dst, "
        f"row_number() OVER (PARTITION BY dst ORDER BY src) AS rn "
        f"FROM e) WHERE rn <= {cap}), "
        "pairs AS MATERIALIZED (SELECT a.dst AS u, b.dst AS v, count(*) AS coupling "
        "FROM ecap a JOIN ecap b ON a.src = b.src AND a.dst < b.dst GROUP BY u, v), "
        "sym AS MATERIALIZED (SELECT u, v, coupling FROM pairs "
        "UNION ALL SELECT v AS u, u AS v, coupling FROM pairs), "
        "rk AS (SELECT u, v, coupling, row_number() OVER ("
        "PARTITION BY u ORDER BY coupling DESC, v ASC) AS rnk FROM sym) "
        f"SELECT u, v, coupling, rnk FROM rk WHERE rnk <= {k} ORDER BY u, rnk"
    )


def lg_embeddedness_sql() -> str:
    """Per-edge embeddedness replica: one round of the lg_ktruss_sql
    support computation, LEFT-joined back so triangle-free edges report 0
    (local bridges)."""
    return (
        f"WITH {_BASE}, "
        "ce AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src, "
        "greatest(src, dst) AS dst FROM e), "
        "kd AS MATERIALIZED (SELECT tv, count(*) AS d FROM ("
        "SELECT src AS tv FROM ce UNION ALL SELECT dst FROM ce) GROUP BY tv), "
        "ko AS MATERIALIZED (SELECT CASE WHEN fa THEN src ELSE dst END AS a, "
        "CASE WHEN fa THEN dst ELSE src END AS b FROM ("
        "SELECT ce.src, ce.dst, (da.d < db.d OR (da.d = db.d AND ce.src < ce.dst)) AS fa "
        "FROM ce JOIN kd da ON da.tv = ce.src JOIN kd db ON db.tv = ce.dst)), "
        "kt AS MATERIALIZED (SELECT ab.a, ab.b, bc.b AS c FROM ko ab "
        "JOIN ko bc ON bc.a = ab.b JOIN ko ac ON ac.a = ab.a AND ac.b = bc.b), "
        "ks AS MATERIALIZED (SELECT src, dst, count(*) AS sup FROM ("
        "SELECT least(a, b) AS src, greatest(a, b) AS dst FROM kt "
        "UNION ALL SELECT least(b, c), greatest(b, c) FROM kt "
        "UNION ALL SELECT least(a, c), greatest(a, c) FROM kt) GROUP BY src, dst) "
        "SELECT ce.src, ce.dst, coalesce(ks.sup, 0) AS support, "
        "CAST(coalesce(ks.sup, 0) = 0 AS BIGINT) AS local_bridge "
        "FROM ce LEFT JOIN ks ON ks.src = ce.src AND ks.dst = ce.dst "
        "ORDER BY ce.src, ce.dst"
    )


def lg_khop_sizes_sql(num_sources: int = 8, max_depth: int = 24) -> str:
    """Per-source exact-hop-distance histogram: depth-capped recursive
    walk per source, min depth per vertex, count per depth."""
    ctes = []
    sels = []
    for s in range(num_sources):
        ctes.append(
            f"kl_{s}(v, d) AS MATERIALIZED (SELECT CAST({s} AS BIGINT), 0 "
            f"UNION SELECT e.dst, l.d + 1 FROM kl_{s} l JOIN e ON e.src = l.v "
            f"WHERE l.d < {max_depth})"
        )
        sels.append(
            f"SELECT CAST({s} AS BIGINT) AS source, d AS depth, count(*) AS n "
            f"FROM (SELECT v, min(d) AS d FROM kl_{s} GROUP BY v) GROUP BY d"
        )
    return (
        f"WITH RECURSIVE {_BASE}, " + ",\n".join(ctes)
        + " SELECT source, depth, n FROM (" + " UNION ALL ".join(sels)
        + ") ORDER BY source, depth"
    )


def lg_edge_jaccard_sql() -> str:
    """Edge-Jaccard replica: the lg_embeddedness_sql support round plus the
    endpoint-degree joins; J = support / (du + dv - support)."""
    base = lg_embeddedness_sql()
    head, tail = base.split("SELECT ce.src, ce.dst, coalesce(ks.sup, 0) AS support,")
    return (
        head
        + "SELECT ce.src, ce.dst, coalesce(ks.sup, 0) AS support, "
        "da.d AS du, db.d AS dv, "
        "CASE WHEN da.d + db.d - coalesce(ks.sup, 0) > 0 THEN "
        "round(CAST(coalesce(ks.sup, 0) AS DOUBLE) / "
        "(da.d + db.d - coalesce(ks.sup, 0)), 8) ELSE 0.0 END AS jaccard "
        "FROM ce LEFT JOIN ks ON ks.src = ce.src AND ks.dst = ce.dst "
        "JOIN kd da ON da.tv = ce.src JOIN kd db ON db.tv = ce.dst "
        "ORDER BY ce.src, ce.dst"
    )


def lg_random_walks_sql(
    n_starts: int = 64,
    length: int = 4,
    a: int = 1103515245,
    b: int = 12345,
    c: int = 97,
    mod: int = 2147483647,
) -> str:
    """Deterministic random walks: per step, next = the ((a·walk_id + b·step
    + c·cur) mod m mod deg)-th ascending neighbor; walks stop at sinks."""
    ctes = [
        "nbr AS MATERIALIZED (SELECT src, dst, "
        "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx FROM e)",
        "dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        f"w0 AS MATERIALIZED (SELECT oid AS walk_id, oid AS v FROM v WHERE oid < {n_starts})",
    ]
    for s in range(1, length + 1):
        ctes.append(
            f"w{s} AS MATERIALIZED (SELECT w.walk_id, n.dst AS v "
            f"FROM w{s - 1} w JOIN dg ON dg.src = w.v "
            f"JOIN nbr n ON n.src = w.v "
            f"AND n.idx = (({a} * w.walk_id + {b} * {s} + {c} * w.v) % {mod}) % dg.deg)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, CAST({s} AS BIGINT) AS step, v FROM w{s}" for s in range(length + 1)
    )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT walk_id, step, v FROM ({union}) ORDER BY walk_id, step"
    )


def lg_eccentricity_sql(s_max: int = 32) -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        f"srcs AS MATERIALIZED (SELECT DISTINCT oid FROM v WHERE oid < {s_max}), "
        "walk(s, wv, d) AS MATERIALIZED ("
        "  SELECT oid, oid, 0 FROM srcs UNION "
        "  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < 8) "
        "SELECT src_oid, max(dist) AS ecc FROM "
        "(SELECT s AS src_oid, wv, min(d) AS dist FROM walk GROUP BY s, wv) "
        "GROUP BY src_oid ORDER BY src_oid"
    )


def op_topk_per_group_sql(k: int = 3) -> str:
    return f"""
SELECT event_id, event_type, round(value, 8) AS value FROM (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events) WHERE rn <= {k} ORDER BY event_type, event_id
"""


def op_groupby_median_sql() -> str:
    return (
        "SELECT event_type, round(median(value), 8) AS median_value "
        "FROM events GROUP BY event_type ORDER BY event_type"
    )


def lg_pagerank_converged_sql(
    tol: float = 1e-6, alpha: float = 0.85, max_rounds: int = 80
) -> str:
    """PageRank TO CONVERGENCE — the engine's exact stopping rule replicated
    in SQL: rounds are unrolled with a per-round L1 residual
    r_k = Σ|p_k − p_{k−1}|, and the output is p at the FIRST k with
    r_k < tol·N (pagerank_networkx.h:147), not a fixed round count."""
    ctes = [f"p0 AS MATERIALIZED (SELECT oid, 1.0/(SELECT n FROM nv) AS score FROM v)"]
    for k in range(max_rounds):
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT coalesce(sum(p.score),0) AS ds FROM p{k} p "
            f"LEFT JOIN outd o ON o.oid=p.oid WHERE o.d IS NULL)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT e.dst AS oid, sum(p.score / o.d) AS insum "
            f"FROM e JOIN p{k} p ON p.oid=e.src JOIN outd o ON o.oid=e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"p{k + 1} AS MATERIALIZED (SELECT v.oid, {alpha}*coalesce(s.insum,0) + "
            f"({alpha}*(SELECT ds FROM d{k}) + {1 - alpha:.2f})/(SELECT n FROM nv) AS score "
            f"FROM v LEFT JOIN s{k} s ON s.oid=v.oid)"
        )
        ctes.append(
            f"r{k + 1} AS MATERIALIZED (SELECT sum(abs(a.score - b.score)) AS rv "
            f"FROM p{k + 1} a JOIN p{k} b ON b.oid = a.oid)"
        )
    resid_union = " UNION ALL ".join(
        f"SELECT {k} AS k, (SELECT rv FROM r{k}) AS rv" for k in range(1, max_rounds + 1)
    )
    all_p = " UNION ALL ".join(
        f"SELECT {k} AS k, oid, score FROM p{k}" for k in range(1, max_rounds + 1)
    )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f", resids AS MATERIALIZED ({resid_union})"
        + f", conv AS MATERIALIZED (SELECT coalesce(min(k), {max_rounds}) AS k FROM resids "
        f"WHERE rv < CAST({tol} AS DOUBLE) * (SELECT n FROM nv))"
        + f", allp AS MATERIALIZED ({all_p}) "
        "SELECT oid, round(score, 8) AS score FROM allp WHERE k = (SELECT k FROM conv) "
        "ORDER BY oid"
    )


# ---------------------------------------------------------------------------
# FLASH-suite oracles (connectivity / matching / subgraph / measurement).
# The sparse link graph keeps every (src, dst) with
# (src*31 + dst*17) % 20 == 0 — the SCC/matching structure of the full lg
# graph is degenerate (one giant component).

_SBASE = f"""
se AS MATERIALIZED (
  SELECT DISTINCT (l_orderkey % {LG_MOD}) AS src, (l_partkey % {LG_MOD}) AS dst
  FROM lineitem WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})
    AND ((l_orderkey % {LG_MOD})*31 + (l_partkey % {LG_MOD})*17) % 20 = 0
),
sv AS MATERIALIZED (SELECT DISTINCT oid FROM
  (SELECT src AS oid FROM se UNION ALL SELECT dst FROM se)),
snv AS MATERIALIZED (SELECT count(*) AS n FROM sv),
sue AS MATERIALIZED (SELECT DISTINCT src, dst FROM
  (SELECT src, dst FROM se UNION ALL SELECT dst AS src, src AS dst FROM se)),
sdeg AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM sue GROUP BY src)
"""

# all-pairs directed hop distances on the sparse graph (depth-bounded walk)
_SWALK = """
swalk(s, wv, d) AS MATERIALIZED (
  SELECT oid, oid, 0 FROM sv UNION
  SELECT w.s, se.dst, w.d + 1 FROM swalk w JOIN se ON se.src = w.wv WHERE w.d < 40),
sdist AS MATERIALIZED (SELECT s, wv, min(d) AS d FROM swalk GROUP BY s, wv)
"""


def lg_scc_sql() -> str:
    """SCC via the transitive closure: scc(v) = min u with u⇝v and v⇝u
    (self included) — the FW-BW engine's min-vid component label."""
    return (
        f"WITH RECURSIVE {_SBASE}, "
        "reach(s, t) AS MATERIALIZED (SELECT oid, oid FROM sv UNION "
        "SELECT r.s, se.dst FROM reach r JOIN se ON se.src = r.t) "
        "SELECT r1.t AS oid, min(r1.s) AS scc_oid FROM reach r1 "
        "JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s GROUP BY r1.t"
    )


def lg_condensation_sql(max_depth: int = 64) -> str:
    """SCC condensation + longest-path layering: components via the
    transitive closure (as lg_scc_sql), component DAG edges by mapping the
    sparse edges through the labels, lvl(c) = max path length ending at c
    (recursive path enumeration over the DAG — finite because the
    condensation is acyclic; max_depth is a loud-failure guard)."""
    return (
        f"WITH RECURSIVE {_SBASE}, "
        "reach(s, t) AS MATERIALIZED (SELECT oid, oid FROM sv UNION "
        "SELECT r.s, se.dst FROM reach r JOIN se ON se.src = r.t), "
        "comp AS MATERIALIZED (SELECT r1.t AS oid, min(r1.s) AS c FROM reach r1 "
        "JOIN reach r2 ON r2.s = r1.t AND r2.t = r1.s GROUP BY r1.t), "
        "ce AS MATERIALIZED (SELECT DISTINCT c1.c AS src, c2.c AS dst FROM se "
        "JOIN comp c1 ON c1.oid = se.src JOIN comp c2 ON c2.oid = se.dst "
        "WHERE c1.c <> c2.c), "
        f"paths(c, d) AS MATERIALIZED (SELECT DISTINCT c, 0 FROM comp UNION "
        f"SELECT ce.dst, p.d + 1 FROM paths p JOIN ce ON ce.src = p.c "
        f"WHERE p.d < {max_depth}) "
        "SELECT comp.oid, comp.c AS scc_oid, l.lvl FROM comp "
        "JOIN (SELECT c, max(d) AS lvl FROM paths GROUP BY c) l ON l.c = comp.c "
        "ORDER BY comp.oid"
    )


def lg_mis_sql(rounds: int = 6) -> str:
    """Unrolled deterministic Luby MIS with FLASH's priority
    r = und_deg·C + oid (C > max oid ⇒ lexicographic (deg, id))."""
    ctes = [
        "spr AS MATERIALIZED (SELECT sv.oid, coalesce(sd.d, 0)*1000000 + sv.oid AS r "
        "FROM sv LEFT JOIN sdeg sd ON sd.oid = sv.oid)",
        "st0 AS MATERIALIZED (SELECT oid, 0 AS st FROM sv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"j{k} AS MATERIALIZED (SELECT s.oid FROM st{k} s "
            f"JOIN spr pv ON pv.oid = s.oid WHERE s.st = 0 AND NOT EXISTS ("
            f"SELECT 1 FROM sue JOIN st{k} t ON t.oid = sue.dst "
            f"JOIN spr pw ON pw.oid = sue.dst "
            f"WHERE sue.src = s.oid AND t.st = 0 AND pw.r < pv.r))"
        )
        ctes.append(
            f"st{k + 1} AS MATERIALIZED (SELECT s.oid, "
            f"CASE WHEN j.oid IS NOT NULL THEN 1 "
            f"WHEN s.st = 0 AND EXISTS (SELECT 1 FROM sue JOIN j{k} jj "
            f"ON jj.oid = sue.src WHERE sue.dst = s.oid) THEN 2 "
            f"ELSE s.st END AS st FROM st{k} s LEFT JOIN j{k} j ON j.oid = s.oid)"
        )
    return (
        f"WITH {_SBASE}, "
        + ",\n".join(ctes)
        + f" SELECT oid, CAST(st = 1 AS BIGINT) AS in_mis FROM st{rounds}"
    )


def _matching_ctes(rounds: int) -> str:
    """Unrolled mutual max-id handshake (mm.h): p(v) = max unmatched
    neighbor; edge matched iff p(u)=v ∧ p(v)=u.  Final state: m{rounds}."""
    ctes = ["m0 AS MATERIALIZED (SELECT oid, CAST(-1 AS BIGINT) AS mate FROM sv)"]
    for k in range(rounds):
        ctes.append(
            f"p{k} AS MATERIALIZED (SELECT sue.src AS oid, max(sue.dst) AS p FROM sue "
            f"JOIN m{k} a ON a.oid = sue.src AND a.mate = -1 "
            f"JOIN m{k} b ON b.oid = sue.dst AND b.mate = -1 GROUP BY sue.src)"
        )
        ctes.append(
            f"x{k} AS MATERIALIZED (SELECT p1.oid, p1.p AS mate FROM p{k} p1 "
            f"JOIN p{k} p2 ON p2.oid = p1.p AND p2.p = p1.oid)"
        )
        ctes.append(
            f"m{k + 1} AS MATERIALIZED (SELECT m.oid, coalesce(x.mate, m.mate) AS mate "
            f"FROM m{k} m LEFT JOIN x{k} x ON x.oid = m.oid)"
        )
    return ",\n".join(ctes)


def lg_matching_sql(rounds: int = 13) -> str:
    return (
        f"WITH {_SBASE}, "
        + _matching_ctes(rounds)
        + f" SELECT oid, mate AS mate_oid FROM m{rounds}"
    )


def lg_edge_cover_sql(rounds: int = 13) -> str:
    """Minimum edge cover size from the maximal matching
    (min-edge-cover.h:82-88): matched pairs + one edge per unmatched
    non-isolated vertex (every sparse-graph vertex has degree ≥ 1)."""
    return (
        f"WITH {_SBASE}, "
        + _matching_ctes(rounds)
        + f""" SELECT (SELECT count(*) FROM m{rounds} WHERE mate >= 0) // 2
             + (SELECT count(*) FROM m{rounds} WHERE mate = -1) AS n_edge_cover"""
    )


def lg_min_cover_sql(rounds: int = 25) -> str:
    """Unrolled greedy vertex cover (min-cover-greedy.h:48-84): active
    uncovered vertices with the locally maximal (remaining-degree, id)
    pair join the cover; covered vertices decrement uncovered neighbors."""
    B = 1000000
    ctes = [
        "vc0 AS MATERIALIZED (SELECT sv.oid, 0 AS c, CAST(coalesce(sd.d, 0) AS BIGINT)"
        " AS d, 1 AS act FROM sv LEFT JOIN sdeg sd ON sd.oid = sv.oid)"
    ]
    for i in range(rounds):
        ctes.append(
            f"nbm{i} AS MATERIALIZED (SELECT sue.src AS oid, max(t.d*{B} + t.oid) AS m "
            f"FROM sue JOIN vc{i} t ON t.oid = sue.dst AND t.c = 0 GROUP BY sue.src)"
        )
        ctes.append(
            f"jn{i} AS MATERIALIZED (SELECT s.oid FROM vc{i} s "
            f"LEFT JOIN nbm{i} b ON b.oid = s.oid "
            f"WHERE s.act = 1 AND s.c = 0 AND (b.m IS NULL OR s.d*{B} + s.oid > b.m))"
        )
        ctes.append(
            f"dcv{i} AS MATERIALIZED (SELECT sue.dst AS oid, count(*) AS c FROM sue "
            f"JOIN jn{i} j ON j.oid = sue.src GROUP BY sue.dst)"
        )
        ctes.append(
            f"vc{i + 1} AS MATERIALIZED (SELECT s.oid, "
            f"CASE WHEN j.oid IS NOT NULL THEN 1 ELSE s.c END AS c, "
            f"CASE WHEN s.c = 0 AND j.oid IS NULL THEN s.d - coalesce(dc.c, 0) "
            f"ELSE s.d END AS d, "
            f"CASE WHEN j.oid IS NOT NULL OR s.c = 1 THEN 0 "
            f"WHEN s.d - coalesce(dc.c, 0) <= 0 THEN 0 ELSE s.act END AS act "
            f"FROM vc{i} s LEFT JOIN jn{i} j ON j.oid = s.oid "
            f"LEFT JOIN dcv{i} dc ON dc.oid = s.oid)"
        )
    return (
        f"WITH {_SBASE},\n" + ",\n".join(ctes)
        + f" SELECT oid, CAST(c AS BIGINT) AS in_cover FROM vc{rounds}"
    )


def lg_dominating_sql(rounds: int = 25) -> str:
    """Unrolled greedy dominating set (min-dominating-set.h:49-92): two
    (count, id)-max relaxations over undominated vertices, local maxima
    join and dominate their neighborhood, counts recomputed."""
    B = 1000000
    ctes = [
        "dm0 AS MATERIALIZED (SELECT sv.oid, 0 AS dom, 0 AS b, "
        "CAST(coalesce(sd.d, 0) AS BIGINT) AS mc, sv.oid AS mi "
        "FROM sv LEFT JOIN sdeg sd ON sd.oid = sv.oid)"
    ]
    for i in range(rounds):
        for r in (1, 2):
            prev = f"dm{i}" if r == 1 else f"rx{i}"
            out = f"rx{i}" if r == 1 else f"ry{i}"
            ctes.append(
                f"{out}m AS MATERIALIZED (SELECT sue.src AS oid, "
                f"max(t.mc*{B} + t.mi) AS m FROM sue "
                f"JOIN {prev} t ON t.oid = sue.dst AND t.dom = 0 GROUP BY sue.src)"
            )
            ctes.append(
                f"{out} AS MATERIALIZED (SELECT s.oid, s.dom, s.b, "
                f"CASE WHEN s.dom = 0 AND x.m IS NOT NULL AND x.m > s.mc*{B} + s.mi "
                f"THEN x.m // {B} ELSE s.mc END AS mc, "
                f"CASE WHEN s.dom = 0 AND x.m IS NOT NULL AND x.m > s.mc*{B} + s.mi "
                f"THEN x.m % {B} ELSE s.mi END AS mi "
                f"FROM {prev} s LEFT JOIN {out}m x ON x.oid = s.oid)"
            )
        ctes.append(
            f"sl{i} AS MATERIALIZED (SELECT oid FROM ry{i} WHERE dom = 0 AND mi = oid)"
        )
        ctes.append(
            f"dn{i} AS MATERIALIZED (SELECT DISTINCT sue.dst AS oid FROM sue "
            f"JOIN sl{i} s ON s.oid = sue.src)"
        )
        ctes.append(
            f"ud{i} AS MATERIALIZED (SELECT r.oid FROM ry{i} r "
            f"LEFT JOIN sl{i} s ON s.oid = r.oid LEFT JOIN dn{i} d ON d.oid = r.oid "
            f"WHERE r.dom = 0 AND s.oid IS NULL AND d.oid IS NULL)"
        )
        ctes.append(
            f"rc{i} AS MATERIALIZED (SELECT sue.src AS oid, count(*) AS c FROM sue "
            f"JOIN ud{i} u ON u.oid = sue.dst GROUP BY sue.src)"
        )
        ctes.append(
            f"dm{i + 1} AS MATERIALIZED (SELECT r.oid, "
            f"CASE WHEN u.oid IS NULL THEN 1 ELSE 0 END AS dom, "
            f"CASE WHEN s.oid IS NOT NULL THEN 1 ELSE r.b END AS b, "
            f"CASE WHEN u.oid IS NOT NULL THEN coalesce(rc.c, 0) ELSE r.mc END AS mc, "
            f"CASE WHEN u.oid IS NOT NULL THEN r.oid ELSE r.mi END AS mi "
            f"FROM ry{i} r LEFT JOIN sl{i} s ON s.oid = r.oid "
            f"LEFT JOIN ud{i} u ON u.oid = r.oid LEFT JOIN rc{i} rc ON rc.oid = r.oid)"
        )
    return (
        f"WITH {_SBASE},\n" + ",\n".join(ctes)
        + f" SELECT oid, CAST(b AS BIGINT) AS in_set FROM dm{rounds}"
    )


def lg_coloring_sql(rounds: int = 18) -> str:
    """Unrolled Jones–Plassmann greedy coloring in the reference priority
    order (larger degree first, ties larger id — color.h); color = mex of
    higher-priority neighbor colors once they are all fixed."""
    ctes = [
        "cpr AS MATERIALIZED (SELECT sv.oid, coalesce(sd.d, 0)*1000000 + sv.oid AS r "
        "FROM sv LEFT JOIN sdeg sd ON sd.oid = sv.oid)",
        "hp AS MATERIALIZED (SELECT sue.src AS w, sue.dst AS v FROM sue "
        "JOIN cpr pw ON pw.oid = sue.src JOIN cpr pv ON pv.oid = sue.dst "
        "WHERE pw.r > pv.r)",
        "c0 AS MATERIALIZED (SELECT oid, CAST(NULL AS BIGINT) AS c FROM sv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"rdy{k} AS MATERIALIZED (SELECT c.oid FROM c{k} c WHERE c.c IS NULL "
            f"AND NOT EXISTS (SELECT 1 FROM hp JOIN c{k} cw ON cw.oid = hp.w "
            f"WHERE hp.v = c.oid AND cw.c IS NULL))"
        )
        ctes.append(
            f"mex{k} AS MATERIALIZED (SELECT r.oid, min(g.g) AS c FROM rdy{k} r "
            f"CROSS JOIN generate_series(0, 63) g(g) WHERE NOT EXISTS ("
            f"SELECT 1 FROM hp JOIN c{k} cw ON cw.oid = hp.w "
            f"WHERE hp.v = r.oid AND cw.c = g.g) GROUP BY r.oid)"
        )
        ctes.append(
            f"c{k + 1} AS MATERIALIZED (SELECT c.oid, coalesce(m.c, c.c) AS c "
            f"FROM c{k} c LEFT JOIN mex{k} m ON m.oid = c.oid)"
        )
    return (
        f"WITH {_SBASE}, "
        + ",\n".join(ctes)
        + f" SELECT oid, c AS color FROM c{rounds}"
    )


def _hindex_ctes(rounds: int, ue: str = "ue", v: str = "v") -> str:
    """Coreness as the fixpoint of the local H-index iteration (Lü et al.;
    converges to k-core peeling coreness): c'(v) = min(c(v),
    H({min(c(w), c(v)) : w ∈ N(v)})) with H = max_k min(k, k-th largest).
    ``ue``/``v`` select the graph (full: ue/v, sparse: sue/sv)."""
    ctes = [
        f"hdeg AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM {ue} GROUP BY src)",
        f"h0 AS MATERIALIZED (SELECT {v}.oid, coalesce(hd.d, 0) AS c FROM {v} "
        f"LEFT JOIN hdeg hd ON hd.oid = {v}.oid)",
    ]
    for k in range(rounds):
        ctes.append(
            f"nb{k} AS MATERIALIZED (SELECT {ue}.src AS nv, least(hw.c, hv.c) AS cw, "
            f"row_number() OVER (PARTITION BY {ue}.src ORDER BY least(hw.c, hv.c) DESC) AS rn "
            f"FROM {ue} JOIN h{k} hw ON hw.oid = {ue}.dst JOIN h{k} hv ON hv.oid = {ue}.src)"
        )
        ctes.append(
            f"h{k + 1} AS MATERIALIZED (SELECT h.oid, least(h.c, coalesce(x.h, 0)) AS c "
            f"FROM h{k} h LEFT JOIN (SELECT nv, max(least(rn, cw)) AS h FROM nb{k} "
            f"GROUP BY nv) x ON x.nv = h.oid)"
        )
    return ",\n".join(ctes)


def lg_kshell_sql(rounds: int = 22) -> str:
    return (
        f"WITH {_BASE}, "
        + _hindex_ctes(rounds)
        + f" SELECT oid, c AS shell FROM h{rounds}"
    )


def lg_densest_sql(rounds: int = 22) -> str:
    return (
        f"WITH {_BASE}, "
        + _hindex_ctes(rounds)
        + f""",
cm AS MATERIALIZED (SELECT max(c) AS cmax FROM h{rounds}),
s1 AS MATERIALIZED (SELECT oid FROM h{rounds} WHERE c = (SELECT cmax FROM cm)),
ne AS MATERIALIZED (SELECT count(*) AS cnt FROM ue
  JOIN s1 a ON a.oid = ue.src JOIN s1 b ON b.oid = ue.dst)
SELECT (SELECT cmax FROM cm) AS core,
       (SELECT count(*) FROM s1) AS n_vertices,
       round((SELECT cnt FROM ne) * 1.0 / (SELECT count(*) FROM s1), 8) AS density"""
    )


def lg_rectangles_sql() -> str:
    return (
        f"WITH {_BASE}, "
        "wpairs AS MATERIALIZED (SELECT u1.dst AS a, u2.dst AS b FROM ue u1 "
        "JOIN ue u2 ON u2.src = u1.src AND u1.dst < u2.dst), "
        "wcnt AS MATERIALIZED (SELECT a, b, count(*) AS w FROM wpairs GROUP BY a, b) "
        "SELECT CAST(coalesce(sum((w*(w-1))//2), 0) // 2 AS BIGINT) AS n_rectangles FROM wcnt"
    )


def lg_ecc_all_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK} "
        "SELECT s AS oid, max(d) AS ecc, count(*) AS n_reach "
        "FROM sdist GROUP BY s"
    )


def lg_diameter_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK}, "
        "eccs AS MATERIALIZED (SELECT s, max(d) AS ecc FROM sdist GROUP BY s) "
        "SELECT (SELECT max(ecc) FROM eccs) AS diameter, "
        "coalesce((SELECT min(ecc) FROM eccs WHERE ecc > 0), 0) AS radius"
    )


def lg_eff_diameter_sql(num: int = 9, den: int = 10) -> str:
    """graph/algorithms.effective_diameter twin: smallest d with
    den·cum[d] >= num·total over the finite positive-distance pair
    histogram of the sparse graph (d=0 self rows excluded)."""
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK}, "
        "hp AS MATERIALIZED (SELECT d, count(*) AS c FROM sdist WHERE d > 0 GROUP BY d), "
        "tot AS (SELECT coalesce(sum(c), 0) AS t FROM hp), "
        "cm AS (SELECT d, sum(c) OVER (ORDER BY d) AS cum FROM hp) "
        f"SELECT CAST(coalesce((SELECT min(d) FROM cm, tot "
        f"WHERE {den} * cum >= {num} * t), 0) AS BIGINT) AS effective_diameter, "
        "CAST((SELECT t FROM tot) AS BIGINT) AS n_pairs"
    )


def lg_global_efficiency_sql() -> str:
    """graph/algorithms.global_efficiency twin: Σ 1/d over finite positive
    directed pair distances / (N·(N−1)), summed in histogram form (one term
    per distinct distance) exactly like the engine's fragment fold."""
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK}, "
        "hp AS MATERIALIZED (SELECT d, count(*) AS c FROM sdist WHERE d > 0 GROUP BY d) "
        "SELECT round(coalesce((SELECT sum(c * 1.0 / d) FROM hp), 0) "
        "/ ((SELECT n FROM snv) * ((SELECT n FROM snv) - 1)), 8) AS global_efficiency, "
        "CAST(coalesce((SELECT sum(c) FROM hp), 0) AS BIGINT) AS n_pairs"
    )


def lg_richclub_sql() -> str:
    """pipelines/testdata.lg_richclub twin: φ(k) = 2·E_k/(N_k·(N_k−1)) on
    the undirected simple sparse graph, one row per k ∈ [0, max_degree)
    with N_k ≥ 2 (networkx rich_club_coefficient(normalized=False))."""
    return (
        f"WITH {_SBASE}, "
        "ce AS MATERIALIZED (SELECT src, dst FROM sue WHERE src < dst), "
        "em AS MATERIALIZED (SELECT least(d1.d, d2.d) AS m FROM ce "
        "JOIN sdeg d1 ON d1.oid = ce.src JOIN sdeg d2 ON d2.oid = ce.dst), "
        "ks AS (SELECT DISTINCT m.k FROM sdeg, "
        "LATERAL (SELECT unnest(generate_series(0, CAST(sdeg.d AS BIGINT) - 1)) AS k) m), "
        "rc AS (SELECT k, "
        "(SELECT count(*) FROM sdeg WHERE d > k) AS n_nodes, "
        "(SELECT count(*) FROM em WHERE m > k) AS n_edges FROM ks) "
        "SELECT k, n_nodes, n_edges, "
        "round(2.0 * n_edges / (n_nodes * (n_nodes - 1.0)), 8) AS phi "
        "FROM rc WHERE n_nodes >= 2 ORDER BY k"
    )


def lg_bipartite_proj_sql(max_fanout: int = 5) -> str:
    """graph/metrics.bipartite_projection twin: parts linked iff they share
    an order, weight = #distinct shared orders, orders with more than
    max_fanout distinct parts dropped (the deterministic skew cap)."""
    return (
        f"WITH bp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, "
        f"(l_partkey % {LG_MOD}) AS p FROM lineitem), "
        f"ok AS MATERIALIZED (SELECT o FROM bp GROUP BY o "
        f"HAVING count(*) <= {max_fanout}), "
        "bpc AS (SELECT bp.o, bp.p FROM bp JOIN ok ON ok.o = bp.o) "
        "SELECT b1.p AS a, b2.p AS b, count(*) AS weight "
        "FROM bpc b1 JOIN bpc b2 ON b1.o = b2.o AND b1.p < b2.p "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


def lg_weighted_clustering_sql() -> str:
    """graph/metrics.weighted_clustering twin (Barrat): the weighted
    undirected pair graph (weight = lineitem multiplicity of both
    directions), degree-ordered triangle enumeration, per-corner exact
    integer numerator Σ(w1+w2), one division, round 8."""
    return (
        f"WITH raw AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})), "
        "wu AS MATERIALIZED (SELECT least(src, dst) AS u, greatest(src, dst) AS v, "
        "count(*) AS w FROM raw GROUP BY 1, 2), "
        "wks AS MATERIALIZED (SELECT oid, count(*) AS k, sum(w) AS s FROM "
        "(SELECT u AS oid, w FROM wu UNION ALL SELECT v, w FROM wu) GROUP BY 1), "
        "woe AS MATERIALIZED (SELECT CASE WHEN (ku.k, wu.u) < (kv.k, wu.v) "
        "THEN wu.u ELSE wu.v END AS a, "
        "CASE WHEN (ku.k, wu.u) < (kv.k, wu.v) THEN wu.v ELSE wu.u END AS b, wu.w "
        "FROM wu JOIN wks ku ON ku.oid = wu.u JOIN wks kv ON kv.oid = wu.v), "
        "wtr AS MATERIALIZED (SELECT ab.a AS corner, "
        "least(ab.b, ac.b) AS b, greatest(ab.b, ac.b) AS c, "
        "ab.w AS wab, ac.w AS wac, bc.w AS wbc "
        "FROM woe ab JOIN woe ac ON ac.a = ab.a AND ab.b < ac.b "
        "JOIN wu bc ON bc.u = least(ab.b, ac.b) AND bc.v = greatest(ab.b, ac.b)), "
        "contrib AS (SELECT corner AS oid, wab + wac AS c2 FROM wtr "
        "UNION ALL SELECT b, wab + wbc FROM wtr "
        "UNION ALL SELECT c, wac + wbc FROM wtr), "
        "csum AS (SELECT oid, sum(c2) AS num2 FROM contrib GROUP BY 1) "
        "SELECT k.oid, round(CASE WHEN k.k > 1 "
        "THEN coalesce(c.num2, 0) * 1.0 / (2.0 * k.s * (k.k - 1)) ELSE 0.0 END, 8) AS cw "
        "FROM wks k LEFT JOIN csum c ON c.oid = k.oid ORDER BY k.oid"
    )


def lg_onnela_clustering_sql() -> str:
    """graph/metrics.weighted_clustering(formula='onnela') twin: per-corner
    Σ power(w_ab·w_ac·w_bc, 1/3) over the same degree-ordered triangle
    enumeration, normalized by max_w·k·(k−1)."""
    return (
        f"WITH raw AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})), "
        "wu AS MATERIALIZED (SELECT least(src, dst) AS u, greatest(src, dst) AS v, "
        "count(*) AS w FROM raw GROUP BY 1, 2), "
        "mw AS (SELECT max(w) AS m FROM wu), "
        "wks AS MATERIALIZED (SELECT oid, count(*) AS k FROM "
        "(SELECT u AS oid FROM wu UNION ALL SELECT v FROM wu) GROUP BY 1), "
        "woe AS MATERIALIZED (SELECT CASE WHEN (ku.k, wu.u) < (kv.k, wu.v) "
        "THEN wu.u ELSE wu.v END AS a, "
        "CASE WHEN (ku.k, wu.u) < (kv.k, wu.v) THEN wu.v ELSE wu.u END AS b, wu.w "
        "FROM wu JOIN wks ku ON ku.oid = wu.u JOIN wks kv ON kv.oid = wu.v), "
        "wtr AS MATERIALIZED (SELECT ab.a AS corner, "
        "least(ab.b, ac.b) AS b, greatest(ab.b, ac.b) AS c, "
        "power(CAST(ab.w * ac.w * bc.w AS DOUBLE), 1.0/3.0) AS t "
        "FROM woe ab JOIN woe ac ON ac.a = ab.a AND ab.b < ac.b "
        "JOIN wu bc ON bc.u = least(ab.b, ac.b) AND bc.v = greatest(ab.b, ac.b)), "
        "contrib AS (SELECT corner AS oid, t FROM wtr "
        "UNION ALL SELECT b, t FROM wtr UNION ALL SELECT c, t FROM wtr), "
        "csum AS (SELECT oid, sum(t) AS num2 FROM contrib GROUP BY 1) "
        "SELECT k.oid, round(CASE WHEN k.k > 1 "
        "THEN 2.0 * coalesce(c.num2, 0) / ((SELECT m FROM mw) * k.k * (k.k - 1.0)) "
        "ELSE 0.0 END, 8) AS cw "
        "FROM wks k LEFT JOIN csum c ON c.oid = k.oid ORDER BY k.oid"
    )


def lg_two_hop_sql() -> str:
    """graph/metrics.two_hop_sizes twin: distinct targets ≠ src reachable
    in ≤2 directed hops, counted per src."""
    return (
        f"WITH {_SBASE}, "
        "h2 AS (SELECT DISTINCT e1.src AS a, e2.dst AS t FROM se e1 "
        "JOIN se e2 ON e2.src = e1.dst WHERE e2.dst <> e1.src), "
        "hu AS (SELECT a, t FROM h2 UNION SELECT src, dst FROM se) "
        "SELECT a AS oid, count(*) AS n_within_2 FROM hu GROUP BY 1 ORDER BY 1"
    )


def lg_seeded_lpa_sql(
    seed_mod: int = 5, n_classes: int = 3, rounds: int = 6
) -> str:
    """graph/metrics.seeded_lpa twin: hard-clamped seeds, per round the
    mode over labeled neighbors (count DESC, class ASC), unlabeled with no
    labeled neighbor keep state; -1 = never labeled."""
    ctes = [
        f"pl0 AS MATERIALIZED (SELECT oid, CASE WHEN oid % {seed_mod} = 0 "
        f"THEN oid % {n_classes} ELSE -1 END AS label FROM sv)"
    ]
    for k in range(rounds):
        ctes.append(
            f"pc{k} AS MATERIALIZED (SELECT e.dst AS oid, l.label, count(*) AS n "
            f"FROM sue e JOIN pl{k} l ON l.oid = e.src WHERE l.label >= 0 "
            f"GROUP BY 1, 2)"
        )
        ctes.append(
            f"pm{k} AS MATERIALIZED (SELECT oid, label FROM (SELECT oid, label, "
            f"row_number() OVER (PARTITION BY oid ORDER BY n DESC, label ASC) AS rk "
            f"FROM pc{k}) WHERE rk = 1)"
        )
        ctes.append(
            f"pl{k + 1} AS MATERIALIZED (SELECT v.oid, "
            f"CASE WHEN v.oid % {seed_mod} = 0 THEN v.oid % {n_classes} "
            f"ELSE coalesce(m.label, l.label) END AS label "
            f"FROM sv v JOIN pl{k} l ON l.oid = v.oid "
            f"LEFT JOIN pm{k} m ON m.oid = v.oid)"
        )
    return (
        f"WITH {_SBASE}, "
        + ",\n".join(ctes)
        + f" SELECT oid, label FROM pl{rounds} ORDER BY oid"
    )


def lg_assortativity_directed_sql() -> str:
    """graph/metrics.directed_assortativity twin: Pearson over arcs of
    (x-degree(src), y-degree(dst)) for the four out/in combinations —
    exact integer moments, the same final float expression, round 8."""
    xcol = {"out": "od_s", "in": "id_s"}
    ycol = {"out": "od_d", "in": "id_d"}
    sels = []
    for cx in ("out", "in"):
        for cy in ("out", "in"):
            x, y = xcol[cx], ycol[cy]
            m = (
                f"(SELECT count(*) AS m, sum({x}) AS sx, sum({y}) AS sy, "
                f"sum({x}*{y}) AS sxy, sum({x}*{x}) AS sxx, sum({y}*{y}) AS syy FROM ej)"
            )
            sels.append(
                f"SELECT '{cx}' AS x_deg, '{cy}' AS y_deg, "
                f"CASE WHEN m > 0 AND (m*sxx - sx*sx) > 0 AND (m*syy - sy*sy) > 0 "
                f"THEN round(CAST(m*sxy - sx*sy AS DOUBLE) / "
                f"(sqrt(CAST(m*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(m*syy - sy*sy AS DOUBLE))), 8) "
                f"ELSE 0.0 END AS r, CAST(m AS BIGINT) AS n_edges FROM {m}"
            )
    return (
        f"WITH {_SBASE}, "
        "aod AS MATERIALIZED (SELECT src AS oid, count(*) AS dg FROM se GROUP BY 1), "
        "aid AS MATERIALIZED (SELECT dst AS oid, count(*) AS dg FROM se GROUP BY 1), "
        "ej AS MATERIALIZED (SELECT o1.dg AS od_s, coalesce(i1.dg, 0) AS id_s, "
        "coalesce(o2.dg, 0) AS od_d, i2.dg AS id_d "
        "FROM se e JOIN aod o1 ON o1.oid = e.src "
        "LEFT JOIN aid i1 ON i1.oid = e.src "
        "LEFT JOIN aod o2 ON o2.oid = e.dst "
        "JOIN aid i2 ON i2.oid = e.dst) "
        + " UNION ALL ".join(sels)
    )


def lg_degree_hist_sql() -> str:
    """graph/metrics.degree_histogram twin over the shared sdeg CTE."""
    return (
        f"WITH {_SBASE} "
        "SELECT d AS degree, count(*) AS n_vertices FROM sdeg "
        "GROUP BY 1 ORDER BY 1"
    )


def lg_degree_gini_sql() -> str:
    """graph/metrics.degree_gini twin: G = 2·Σ i·d/(n·Σd) − (n+1)/n with
    i = ascending degree rank (tie order irrelevant: equal degrees)."""
    return (
        f"WITH {_SBASE}, "
        "r AS (SELECT d, row_number() OVER (ORDER BY d) AS i FROM sdeg) "
        "SELECT round((2.0 * sum(i * d)) / (count(*) * sum(d)) "
        "- (count(*) + 1.0) / count(*), 8) AS gini, "
        "count(*) AS n_vertices FROM r"
    )


def lg_backbone_sql() -> str:
    """graph/metrics.disparity_filter twin: α_uv = (1 − w/s_u)^(k_u−1) over
    the multiplicity-weighted directed lg edges; k=1 → α=1."""
    return (
        f"WITH we AS MATERIALIZED (SELECT (l_orderkey % {LG_MOD}) AS src, "
        f"(l_partkey % {LG_MOD}) AS dst, count(*) AS weight FROM lineitem "
        f"WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD}) GROUP BY 1, 2), "
        "ks AS MATERIALIZED (SELECT src, count(*) AS k, sum(weight) AS s "
        "FROM we GROUP BY 1) "
        "SELECT we.src, we.dst, we.weight, "
        "round(CASE WHEN ks.k > 1 "
        "THEN power(1.0 - we.weight * 1.0 / ks.s, ks.k - 1) ELSE 1.0 END, 8) AS alpha "
        "FROM we JOIN ks ON ks.src = we.src ORDER BY we.src, we.dst"
    )


def lg_salsa_sql(iters: int = 5) -> str:
    """graph/metrics.salsa twin: fixed-iteration SALSA on the sparse graph —
    auth_k(i) = Σ_{j→i} hub_{k-1}(j)/od(j), hub_k(j) = Σ_{j→i} auth_k(i)/id(i),
    each L1-normalized over all endpoint vertices; round 8 at the end."""
    ctes = [
        "sod AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM se GROUP BY 1)",
        "sid AS MATERIALIZED (SELECT dst AS oid, count(*) AS d FROM se GROUP BY 1)",
        "sh0 AS MATERIALIZED (SELECT oid, 1.0/(SELECT n FROM snv) AS val FROM sv)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"sra{k} AS MATERIALIZED (SELECT e.dst AS oid, sum(h.val / o.d) AS s "
            f"FROM se e JOIN sh{k - 1} h ON h.oid = e.src "
            f"JOIN sod o ON o.oid = e.src GROUP BY 1)"
        )
        ctes.append(f"sta{k} AS (SELECT coalesce(sum(s), 0) AS t FROM sra{k})")
        ctes.append(
            f"sa{k} AS MATERIALIZED (SELECT v.oid, "
            f"CASE WHEN (SELECT t FROM sta{k}) = 0 THEN 0.0 "
            f"ELSE coalesce(r.s, 0)/(SELECT t FROM sta{k}) END AS val "
            f"FROM sv v LEFT JOIN sra{k} r ON r.oid = v.oid)"
        )
        ctes.append(
            f"srh{k} AS MATERIALIZED (SELECT e.src AS oid, sum(a.val / i.d) AS s "
            f"FROM se e JOIN sa{k} a ON a.oid = e.dst "
            f"JOIN sid i ON i.oid = e.dst GROUP BY 1)"
        )
        ctes.append(f"sth{k} AS (SELECT coalesce(sum(s), 0) AS t FROM srh{k})")
        ctes.append(
            f"sh{k} AS MATERIALIZED (SELECT v.oid, "
            f"CASE WHEN (SELECT t FROM sth{k}) = 0 THEN 0.0 "
            f"ELSE coalesce(r.s, 0)/(SELECT t FROM sth{k}) END AS val "
            f"FROM sv v LEFT JOIN srh{k} r ON r.oid = v.oid)"
        )
    return (
        f"WITH {_SBASE}, "
        + ",\n".join(ctes)
        + f" SELECT a.oid, round(a.val, 8) AS auth, round(h.val, 8) AS hub "
        f"FROM sa{iters} a JOIN sh{iters} h ON h.oid = a.oid ORDER BY a.oid"
    )


def lg_reciprocity_sql() -> str:
    """graph/metrics.reciprocity twin: fraction of distinct self-loop-free
    directed arcs whose reverse arc also exists (networkx
    overall_reciprocity) — exact counts, one final division."""
    return (
        f"WITH {_SBASE}, "
        "rec AS (SELECT count(*) AS r FROM se a "
        "JOIN se b ON b.src = a.dst AND b.dst = a.src), "
        "tot AS (SELECT count(*) AS n FROM se) "
        "SELECT round(CAST(r AS DOUBLE) / n, 8) AS reciprocity, "
        "CAST(r AS BIGINT) AS n_reciprocated, CAST(n AS BIGINT) AS n_edges "
        "FROM rec, tot"
    )


def lg_avg_nbr_deg_sql() -> str:
    """graph/metrics.avg_neighbor_degree twin: knn(u) = Σ_{v∈N(u)} deg(v)
    / deg(u) on the undirected simple sparse graph — integer degree sum,
    one division, round 8 (matching the engine's order-independent fold)."""
    return (
        f"WITH {_SBASE} "
        "SELECT u.src AS oid, "
        "round(sum(d2.d) * 1.0 / count(*), 8) AS avg_nbr_deg "
        "FROM sue u JOIN sdeg d2 ON d2.oid = u.dst "
        "GROUP BY u.src ORDER BY oid"
    )


def lg_smetric_sql() -> str:
    """graph/metrics.s_metric twin: Σ deg(u)·deg(v) over distinct
    undirected edges (u < v) — exact integer."""
    return (
        f"WITH {_SBASE}, "
        "ce AS (SELECT src, dst FROM sue WHERE src < dst) "
        "SELECT CAST(coalesce(sum(d1.d * d2.d), 0) AS BIGINT) AS s_metric "
        "FROM ce JOIN sdeg d1 ON d1.oid = ce.src "
        "JOIN sdeg d2 ON d2.oid = ce.dst"
    )


def lg_simrank_sql(c: float = 0.8, iters: int = 3) -> str:
    """graph/metrics.simrank twin: Jeh–Widom in-neighbor SimRank unrolled
    for a fixed iteration count on the directed sparse graph —
    s_{k+1}(a,b) = C/(|I(a)|·|I(b)|)·Σ_{u∈I(a),v∈I(b)} s_k(u,v) for a≠b,
    diagonal pinned to 1; output the nonzero unordered off-diagonal."""
    ctes = [
        "ind AS MATERIALIZED (SELECT dst AS v, count(*) AS d FROM se GROUP BY dst)",
        "s0 AS MATERIALIZED (SELECT oid AS a, oid AS b, 1.0 AS s FROM sv)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"t{k} AS MATERIALIZED (SELECT e1.dst AS a, e2.dst AS b, sum(p.s) AS t "
            f"FROM s{k - 1} p JOIN se e1 ON e1.src = p.a "
            f"JOIN se e2 ON e2.src = p.b WHERE e1.dst <> e2.dst GROUP BY 1, 2)"
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT t{k}.a, t{k}.b, "
            f"{c} * t{k}.t / (ia.d * ib.d) AS s FROM t{k} "
            f"JOIN ind ia ON ia.v = t{k}.a JOIN ind ib ON ib.v = t{k}.b "
            "UNION ALL SELECT oid, oid, 1.0 FROM sv)"
        )
    return (
        f"WITH {_SBASE}, "
        + ",\n".join(ctes)
        + f" SELECT a AS src_oid, b AS dst_oid, round(s, 8) AS simrank "
        f"FROM s{iters} WHERE a < b AND s > 0 ORDER BY 1, 2"
    )


def lg_kcenter_sql(k: int = 4) -> str:
    """Greedy farthest-point k-center: seed = min oid; then repeatedly the
    vertex maximizing min-distance-to-centers (unreached ≡ 10^6, ties →
    min oid); radius -1 for the seed, -2 when the pick was unreached."""
    ctes = ["cen1 AS MATERIALIZED (SELECT min(oid) AS oid FROM sv)"]
    rows = ["SELECT 0 AS rank, (SELECT oid FROM cen1) AS center_oid, CAST(-1 AS BIGINT) AS radius"]
    for i in range(1, k):
        ctes.append(
            f"md{i} AS MATERIALIZED (SELECT sv.oid, coalesce(min(sd.d), 1000000) AS md "
            f"FROM sv LEFT JOIN sdist sd ON sd.wv = sv.oid "
            f"AND sd.s IN (SELECT oid FROM cen{i}) GROUP BY sv.oid)"
        )
        ctes.append(
            f"nx{i} AS MATERIALIZED (SELECT oid, md FROM md{i} "
            f"ORDER BY md DESC, oid ASC LIMIT 1)"
        )
        ctes.append(
            f"cen{i + 1} AS MATERIALIZED (SELECT oid FROM cen{i} UNION SELECT oid FROM nx{i})"
        )
        rows.append(
            f"SELECT {i} AS rank, (SELECT oid FROM nx{i}) AS center_oid, "
            f"(SELECT CASE WHEN md >= 1000000 THEN -2 ELSE md END FROM nx{i}) AS radius"
        )
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK}, "
        + ",\n".join(ctes)
        + " "
        + " UNION ALL ".join(rows)
    )


def lg_closeness_exact_sql() -> str:
    """Exact harmonic in-closeness on the sparse graph:
    c(v) = Σ_{s : s⇝v, s≠v} (1/d(s,v)) / (N-1)."""
    return (
        f"WITH RECURSIVE {_SBASE}, {_SWALK} "
        "SELECT sv.oid, round(coalesce(cl.sinv, 0) / ((SELECT n FROM snv) - 1), 8) AS closeness "
        "FROM sv LEFT JOIN (SELECT wv, sum(1.0/d) AS sinv FROM sdist WHERE d > 0 "
        "GROUP BY wv) cl ON cl.wv = sv.oid"
    )


def lg_motifs_sql() -> str:
    """Undirected motif census on the sparse graph — direct join forms of the
    FLASH per-edge closed formulas (tailed-triangle.h:57-66, 3-path.h:57-66,
    diamond.h:56-73): p(e) = common-neighbor count of each canonical edge."""
    return f"""WITH {_SBASE},
cue AS MATERIALIZED (SELECT src, dst FROM sue WHERE src < dst),
sup AS MATERIALIZED (
  SELECT c.src, c.dst, count(*) AS p FROM cue c
  JOIN sue a ON a.src = c.src
  JOIN sue b ON b.src = c.dst AND b.dst = a.dst
  GROUP BY c.src, c.dst),
terms AS MATERIALIZED (
  SELECT coalesce(sum(s.p), 0) AS psum,
         coalesce(sum(s.p * (da.d + db.d - 4)), 0) AS tailed2,
         coalesce(sum(s.p * (s.p - 1) // 2), 0) AS dia
  FROM sup s JOIN sdeg da ON da.oid = s.src JOIN sdeg db ON db.oid = s.dst),
lhs AS MATERIALIZED (
  SELECT coalesce(sum((da.d - 1) * (db.d - 1)), 0) AS v FROM cue c
  JOIN sdeg da ON da.oid = c.src JOIN sdeg db ON db.oid = c.dst)
SELECT CAST(psum // 3 AS BIGINT) AS triangles,
       CAST(tailed2 // 2 AS BIGINT) AS tailed,
       CAST((SELECT v FROM lhs) - psum AS BIGINT) AS n_3paths,
       CAST(dia AS BIGINT) AS diamonds
FROM terms"""


def lg_directed_census_sql() -> str:
    """Directed triangle census on the sparse graph (cyclic-triangle.h:51-75,
    acyclic-triangle.h:50-66, in-triangle.h:53-69, out-triangle.h:53-70)."""
    return f"""WITH {_SBASE},
cyc AS (SELECT count(*) // 3 AS v FROM se a
        JOIN se b ON b.src = a.dst JOIN se c ON c.src = b.dst AND c.dst = a.src),
acy AS (SELECT count(*) AS v FROM se a
        JOIN se b ON b.src = a.src AND b.dst <> a.dst
        JOIN se c ON c.src = a.dst AND c.dst = b.dst),
rp AS MATERIALIZED (SELECT a.src AS s, a.dst AS d FROM se a
        JOIN se r ON r.src = a.dst AND r.dst = a.src WHERE a.src < a.dst),
itr AS (SELECT count(*) AS v FROM rp
        JOIN se b ON b.src = rp.s JOIN se c ON c.src = rp.d AND c.dst = b.dst),
otr AS (SELECT count(*) AS v FROM rp
        JOIN se b ON b.dst = rp.s JOIN se c ON c.dst = rp.d AND c.src = b.src)
SELECT (SELECT v FROM cyc) AS cyclic, (SELECT v FROM acy) AS acyclic,
       (SELECT v FROM itr) AS in_tri, (SELECT v FROM otr) AS out_tri"""


def _peel_rank_sql(mode: str, core_rounds: int = 22, rank_rounds: int = 40) -> str:
    """Unrolled FLASH core-ordering rank loops on the sparse graph
    (degeneracy-ordering.h:73-105 / onion-layer-ordering.h:66-103): coreness
    via the H-index fixpoint, then peel-layer ranks.  Over-unrolling is safe
    (once every vertex is ranked no CTE changes anything)."""
    ctes = [_hindex_ctes(core_rounds, ue="sue", v="sv")]
    ctes.append(f"crs AS MATERIALIZED (SELECT oid, c AS core FROM h{core_rounds})")
    if mode == "degeneracy":
        ctes.append("d0 AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM sue GROUP BY src)")
        thr = "(SELECT max(core) FROM crs)"
        same = ""
    else:
        ctes.append(
            "d0 AS MATERIALIZED (SELECT sue.src AS oid, count(*) AS d FROM sue "
            "JOIN crs a ON a.oid = sue.src JOIN crs b ON b.oid = sue.dst "
            "WHERE b.core >= a.core GROUP BY sue.src)"
        )
        thr = "s.core"
        same = " JOIN crs a ON a.oid = sue.src JOIN crs b ON b.oid = sue.dst AND b.core = a.core"
    ctes.append(
        "st0 AS MATERIALIZED (SELECT c.oid, c.core, coalesce(d0.d, 0) AS d, "
        "CAST(-1 AS BIGINT) AS rnk FROM crs c LEFT JOIN d0 ON d0.oid = c.oid)"
    )
    for i in range(rank_rounds):
        thr_i = thr.replace("s.core", f"s{i}x.core") if mode == "onion" else thr
        ctes.append(
            f"nw{i} AS MATERIALIZED (SELECT s{i}x.oid FROM st{i} s{i}x "
            f"WHERE s{i}x.rnk = -1 AND s{i}x.d <= {thr_i})"
        )
        ctes.append(
            f"dc{i} AS MATERIALIZED (SELECT sue.dst AS oid, count(*) AS c FROM sue "
            f"JOIN nw{i} n ON n.oid = sue.src{same} GROUP BY sue.dst)"
        )
        thr_s = thr
        ctes.append(
            f"st{i + 1} AS MATERIALIZED (SELECT s.oid, s.core, "
            f"s.d - coalesce(dc.c, 0) AS d, "
            f"CASE WHEN s.rnk = -1 AND s.d <= {thr_s} THEN {i} ELSE s.rnk END AS rnk "
            f"FROM st{i} s LEFT JOIN dc{i} dc ON dc.oid = s.oid)"
        )
    return (
        f"WITH {_SBASE},\n" + ",\n".join(ctes)
        + f' SELECT oid, core, rnk AS "rank" FROM st{rank_rounds}'
    )


def lg_degeneracy_sql(rank_rounds: int = 40) -> str:
    return _peel_rank_sql("degeneracy", rank_rounds=rank_rounds)


def lg_onion_sql(rank_rounds: int = 40) -> str:
    return _peel_rank_sql("onion", rank_rounds=rank_rounds)


def lg_msf_sql(rounds: int = 11, jumps: int = 10) -> str:
    """Unrolled Borůvka MSF on the weighted sparse graph (msf.h semantics,
    unique under the packed (w, src, dst) total order): per round every
    component picks its minimum packed incident edge, the picked
    component-level functional graph is contracted by 2-cycle-min hooking +
    pointer doubling (2^jumps ≥ #components), and picked physical edges
    accumulate into the forest.  Over-unrolling is a no-op."""
    B, C = 1000000, 1000
    ctes = [
        f"""swe AS MATERIALIZED (
  SELECT least(a, b) AS src, greatest(a, b) AS dst, count(*) AS w FROM (
    SELECT (l_orderkey % {LG_MOD}) AS a, (l_partkey % {LG_MOD}) AS b FROM lineitem
    WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})
      AND ((l_orderkey % {LG_MOD})*31 + (l_partkey % {LG_MOD})*17) % 20 = 0)
  GROUP BY least(a, b), greatest(a, b))""",
        "cp0 AS MATERIALIZED (SELECT DISTINCT oid, oid AS c FROM "
        "(SELECT src AS oid FROM swe UNION SELECT dst FROM swe))",
    ]
    for r in range(rounds):
        ctes.append(
            f"ce{r} AS MATERIALIZED (SELECT a.c AS cu, b.c AS cv, "
            f"e.w*{B} + e.src*{C} + e.dst AS k FROM swe e "
            f"JOIN cp{r} a ON a.oid = e.src JOIN cp{r} b ON b.oid = e.dst "
            f"WHERE a.c <> b.c)"
        )
        ctes.append(
            f"mn{r} AS MATERIALIZED (SELECT cu AS c, min(k) AS k FROM "
            f"(SELECT cu, k FROM ce{r} UNION ALL SELECT cv, k FROM ce{r}) GROUP BY cu)"
        )
        ctes.append(
            f"pk{r} AS MATERIALIZED (SELECT DISTINCT (k // {B}) AS w, "
            f"(k % {B}) // {C} AS src, k % {C} AS dst FROM mn{r})"
        )
        ctes.append(
            f"fn{r} AS MATERIALIZED (SELECT m.c, "
            f"CASE WHEN a.c = m.c THEN b.c ELSE a.c END AS f FROM mn{r} m "
            f"JOIN cp{r} a ON a.oid = (m.k % {B}) // {C} "
            f"JOIN cp{r} b ON b.oid = m.k % {C})"
        )
        ctes.append(
            f"pj{r}_0 AS MATERIALIZED (SELECT f1.c, "
            f"CASE WHEN f2.f = f1.c THEN least(f1.c, f1.f) ELSE f1.f END AS p "
            f"FROM fn{r} f1 JOIN fn{r} f2 ON f2.c = f1.f)"
        )
        for j in range(jumps):
            ctes.append(
                f"pj{r}_{j + 1} AS MATERIALIZED (SELECT a.c, b.p FROM pj{r}_{j} a "
                f"JOIN pj{r}_{j} b ON b.c = a.p)"
            )
        ctes.append(
            f"cp{r + 1} AS MATERIALIZED (SELECT cp.oid, coalesce(pj.p, cp.c) AS c "
            f"FROM cp{r} cp LEFT JOIN pj{r}_{jumps} pj ON pj.c = cp.c)"
        )
    allpk = " UNION ALL ".join(f"SELECT src, dst, w FROM pk{r}" for r in range(rounds))
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT DISTINCT src, dst, CAST(w AS BIGINT) AS weight FROM ({allpk})"
    )


# ---------------------------------------------------------------------------
# FLASH connectivity family (bridge.h / cut-point.h / bcc.h): deterministic
# min-oid-rooted BFS forest, preorder/subtree intervals, Tarjan–Vishkin
# auxiliary components — the SQL mirror of graph/algorithms.py
# biconnectivity() with identical tie-breaks.

_CONN = """
reach(rv, c) AS MATERIALIZED (SELECT oid, oid FROM sv UNION
  SELECT sue.dst, r.c FROM reach r JOIN sue ON sue.src = r.rv),
comp AS MATERIALIZED (SELECT rv AS oid, min(c) AS root FROM reach GROUP BY rv),
bw(wv, d) AS MATERIALIZED (SELECT oid, 0 FROM comp WHERE oid = root UNION
  SELECT sue.dst, w.d + 1 FROM bw w JOIN sue ON sue.src = w.wv WHERE w.d < 200),
dep AS MATERIALIZED (SELECT wv AS oid, min(d) AS dis FROM bw GROUP BY wv),
parc AS MATERIALIZED (SELECT b.oid, min(sue.src) AS par FROM dep b
  JOIN sue ON sue.dst = b.oid JOIN dep a ON a.oid = sue.src AND a.dis = b.dis - 1
  GROUP BY b.oid),
forest AS MATERIALIZED (SELECT c.oid, c.root, d.dis,
  CASE WHEN d.dis = 0 THEN c.oid ELSE p.par END AS par
  FROM comp c JOIN dep d ON d.oid = c.oid LEFT JOIN parc p ON p.oid = c.oid),
pth(oid, path) AS MATERIALIZED (
  SELECT oid, lpad(CAST(oid AS VARCHAR), 4, '0') FROM forest WHERE dis = 0
  UNION ALL
  SELECT f.oid, p.path || '.' || lpad(CAST(f.oid AS VARCHAR), 4, '0')
  FROM forest f JOIN pth p ON p.oid = f.par WHERE f.dis > 0),
pre AS MATERIALIZED (SELECT oid, path, row_number() OVER (ORDER BY path) - 1 AS pr
  FROM pth),
sz AS MATERIALIZED (SELECT p1.oid, count(*) AS sub FROM pre p1 JOIN pre p2
  ON starts_with(p2.path, p1.path) GROUP BY p1.oid),
nt AS MATERIALIZED (SELECT sue.src AS a, sue.dst AS b FROM sue
  JOIN forest fa ON fa.oid = sue.src JOIN forest fb ON fb.oid = sue.dst
  WHERE fa.par <> sue.dst AND fb.par <> sue.src),
mm AS MATERIALIZED (SELECT pv.oid, min(pb.pr) AS mn, max(pb.pr) AS mx
  FROM nt JOIN pre pa ON pa.oid = nt.a JOIN pre pb ON pb.oid = nt.b
  JOIN pre pv ON starts_with(pa.path, pv.path) GROUP BY pv.oid),
br AS MATERIALIZED (SELECT least(f.par, f.oid) AS src, greatest(f.par, f.oid) AS dst
  FROM forest f JOIN pre p ON p.oid = f.oid JOIN sz s ON s.oid = f.oid
  LEFT JOIN mm ON mm.oid = f.oid
  WHERE f.dis > 0 AND (mm.oid IS NULL OR (mm.mn >= p.pr AND mm.mx < p.pr + s.sub))),
aux AS MATERIALIZED (
  SELECT nt.a AS x, nt.b AS y FROM nt
    JOIN forest fa ON fa.oid = nt.a JOIN forest fb ON fb.oid = nt.b
    WHERE fa.dis > 0 AND fb.dis > 0
  UNION
  SELECT f.oid AS x, f.par AS y FROM forest f
    JOIN forest fw ON fw.oid = f.par JOIN pre pw ON pw.oid = f.par
    JOIN sz sw ON sw.oid = f.par JOIN mm ON mm.oid = f.oid
    WHERE f.dis > 0 AND fw.dis > 0
      AND (mm.mn < pw.pr OR mm.mx >= pw.pr + sw.sub)),
auxsym AS MATERIALIZED (SELECT x, y FROM aux UNION SELECT y AS x, x AS y FROM aux),
areach(rv, c) AS MATERIALIZED (SELECT oid, oid FROM forest WHERE dis > 0 UNION
  SELECT a.y, r.c FROM areach r JOIN auxsym a ON a.x = r.rv),
blab AS MATERIALIZED (SELECT rv AS oid, min(c) AS lab FROM areach GROUP BY rv)
"""


def lg_bfs_forest_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_CONN} "
        "SELECT oid, root AS root_oid, dis AS depth, par AS parent_oid "
        "FROM forest ORDER BY oid"
    )


def lg_bridges_sql() -> str:
    return f"WITH RECURSIVE {_SBASE}, {_CONN} SELECT src, dst FROM br ORDER BY src, dst"


def lg_bcc_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_CONN} "
        "SELECT f.oid, CASE WHEN f.dis = 0 THEN f.oid ELSE b.lab END AS bcc_oid "
        "FROM forest f LEFT JOIN blab b ON b.oid = f.oid ORDER BY f.oid"
    )


def lg_cut_points_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_CONN}, "
        "incid AS MATERIALIZED ("
        "SELECT f.par AS p, b.lab AS l FROM forest f JOIN blab b ON b.oid = f.oid "
        "WHERE f.dis > 0 "
        "UNION ALL "
        "SELECT f.oid AS p, b.lab AS l FROM forest f JOIN blab b ON b.oid = f.oid "
        "WHERE f.dis > 0), "
        "cnt AS MATERIALIZED (SELECT p AS oid, count(DISTINCT l) AS c FROM incid GROUP BY p) "
        "SELECT f.oid, CASE WHEN coalesce(c.c, 0) >= 2 THEN 1 ELSE 0 END AS is_cut "
        "FROM forest f LEFT JOIN cnt c ON c.oid = f.oid ORDER BY f.oid"
    )


def lg_2ecc_sql() -> str:
    return (
        f"WITH RECURSIVE {_SBASE}, {_CONN}, "
        "te AS MATERIALIZED (SELECT f.par AS u, f.oid AS v FROM forest f "
        "WHERE f.dis > 0 AND NOT EXISTS (SELECT 1 FROM br "
        "WHERE br.src = least(f.par, f.oid) AND br.dst = greatest(f.par, f.oid))), "
        "tes AS MATERIALIZED (SELECT u, v FROM te UNION SELECT v AS u, u AS v FROM te), "
        "ereach(rv, c) AS MATERIALIZED (SELECT oid, oid FROM sv UNION "
        "SELECT t.v, r.c FROM ereach r JOIN tes t ON t.u = r.rv) "
        "SELECT rv AS oid, min(c) AS comp2_oid FROM ereach GROUP BY rv ORDER BY oid"
    )


def lg_kclique_sql() -> str:
    """4-clique count via the same degree-ordered orientation as _TRI."""
    return (
        f"WITH {_BASE}, {_TRI} "
        "SELECT count(*) AS n_4cliques FROM tr "
        "JOIN oe e1 ON e1.a = tr.w1 JOIN oe e2 ON e2.a = tr.w2 AND e2.b = e1.b "
        "JOIN oe e3 ON e3.a = tr.u AND e3.b = e1.b"
    )


def lg_louvain_level1_sql() -> str:
    """Exact replica of algorithms.louvain_level1: ONE all-active synchronous
    Louvain move round from singleton communities over the undirected dedup
    adjacency — gain(v→c) = 1 − deg_v·deg_c/(2m) (k_{v,c}=1, Σtot_c=deg_c at
    round 0), stay = 0, ties → (gain DESC, community ASC), move iff
    gain > 1e-12.  Integer-degree products are exact in float64, so the
    float comparisons are bit-identical to the engine's."""
    return (
        f"WITH {_BASE}, "
        "ud AS MATERIALIZED (SELECT src AS vv, count(*) AS d FROM ue GROUP BY src), "
        "mm AS MATERIALIZED (SELECT count(*) / 2.0 AS m FROM ue), "
        "gain AS (SELECT u.src AS vv, u.dst AS c, "
        "1.0 - (dv.d * dc.d) / (2.0 * (SELECT m FROM mm)) AS g "
        "FROM ue u JOIN ud dv ON dv.vv = u.src JOIN ud dc ON dc.vv = u.dst), "
        "best AS (SELECT vv, c, g, row_number() OVER "
        "(PARTITION BY vv ORDER BY g DESC, c ASC) AS rn FROM gain) "
        "SELECT v.oid, CAST(CASE WHEN b.g > 1e-12 THEN b.c ELSE v.oid END AS BIGINT) "
        "AS comm_oid FROM v LEFT JOIN best b ON b.vv = v.oid AND b.rn = 1"
    )


def lg_fluid_sql(s: int = 10, rounds: int = 15) -> str:
    """Unrolled synchronous fluid-community rounds: per round, community
    sizes, per-vertex neighbor-label counts, densities (ONE bigint/double
    division — bit-identical to the engine), then the reference's ascending
    label scan with 1e-10 hysteresis as a chain of CASE steps."""
    ctes = [
        "rk AS MATERIALIZED (SELECT oid, row_number() OVER (ORDER BY oid) - 1 AS vid FROM sv)",
        f"seeds AS MATERIALIZED (SELECT oid AS soid, vid AS i FROM rk WHERE vid < {s})",
        f"lab0 AS MATERIALIZED (SELECT oid, CASE WHEN vid < {s} THEN vid ELSE -1 END AS l FROM rk)",
        f"ii AS MATERIALIZED (SELECT range AS i FROM range({s}))",
    ]
    for k in range(rounds):
        ctes.append(
            f"ck{k} AS MATERIALIZED (SELECT l, count(*) AS c FROM lab{k} "
            f"WHERE l >= 0 GROUP BY l)"
        )
        ctes.append(
            f"nb{k} AS MATERIALIZED (SELECT sue.dst AS oid, l.l AS lb, count(*) AS c "
            f"FROM sue JOIN lab{k} l ON l.oid = sue.src WHERE l.l >= 0 "
            f"GROUP BY sue.dst, l.l)"
        )
        ctes.append(
            f"d{k} AS MATERIALIZED (SELECT v.oid, ii.i AS lb, "
            f"CASE WHEN c.c IS NULL THEN 0.0 "
            f"ELSE (coalesce(nb.c, 0) + CASE WHEN lv.l = ii.i THEN 1 ELSE 0 END) "
            f"/ CAST(c.c AS DOUBLE) END AS d "
            f"FROM sv v CROSS JOIN ii "
            f"JOIN lab{k} lv ON lv.oid = v.oid "
            f"LEFT JOIN nb{k} nb ON nb.oid = v.oid AND nb.lb = ii.i "
            f"LEFT JOIN ck{k} c ON c.l = ii.i)"
        )
        ctes.append(f"s0_{k} AS MATERIALIZED (SELECT oid, l AS cur FROM lab{k})")
        for i in range(s):
            ctes.append(
                f"s{i + 1}_{k} AS MATERIALIZED (SELECT sc.oid, "
                f"CASE WHEN di.d > 1e-10 AND (sc.cur = -1 OR di.d > dc.d + 1e-10) "
                f"THEN {i} ELSE sc.cur END AS cur "
                f"FROM s{i}_{k} sc "
                f"JOIN d{k} di ON di.oid = sc.oid AND di.lb = {i} "
                f"LEFT JOIN d{k} dc ON dc.oid = sc.oid AND dc.lb = sc.cur)"
            )
        ctes.append(
            f"lab{k + 1} AS MATERIALIZED (SELECT oid, cur AS l FROM s{s}_{k})"
        )
    return (
        f"WITH {_SBASE},\n" + ",\n".join(ctes) + f" "
        f"SELECT l.oid, coalesce(se.soid, -1) AS comm_oid "
        f"FROM lab{rounds} l LEFT JOIN seeds se ON se.i = l.l ORDER BY l.oid"
    )


# ---------------------------------------------------------------------------
# deterministic hash sampling / splitting (functions/sampling.py)


def _bucket_expr(col: str, salt: int) -> str:
    """ANSI-SQL twin of sampling.hash_bucket: uint64-wraparound Knuth
    multiplicative hash done in HUGEINT then taken mod 2^64; >>33 == integer
    division by 2^33. Bit-identical to the numpy kernel (validated 0..5000)."""
    return (
        f"CAST((((CAST({col} AS HUGEINT) * CAST(11400714819323198485 AS HUGEINT)"
        f" + {salt} * CAST(14029467366897019727 AS HUGEINT)"
        f" + CAST(1609587929392839161 AS HUGEINT))"
        f" % CAST(18446744073709551616 AS HUGEINT))"
        f" // CAST(8589934592 AS HUGEINT)) % 1000 AS BIGINT)"
    )


def samp_sample_sql(permille: int = 100, salt: int = 1) -> str:
    return (
        f"SELECT doc_id, lang FROM documents "
        f"WHERE {_bucket_expr('doc_id', salt)} < {permille} ORDER BY doc_id"
    )


def samp_split_sql(weights=(900, 50, 50), salt: int = 2) -> str:
    bounds, acc = [], 0
    for w in weights[:-1]:
        acc += w
        bounds.append(acc)
    case = "CASE " + " ".join(
        f"WHEN b < {b} THEN {i}" for i, b in enumerate(bounds)
    ) + f" ELSE {len(weights) - 1} END"
    return (
        f"WITH h AS (SELECT doc_id, {_bucket_expr('doc_id', salt)} AS b FROM documents) "
        f"SELECT doc_id, {case} AS split FROM h ORDER BY doc_id"
    )


def samp_stratified_sql(rates: dict | None = None, default_permille: int = 500, salt: int = 3) -> str:
    rates = rates or {"en": 50}
    case = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in rates.items()
    ) + f" ELSE {default_permille} END"
    return (
        f"WITH h AS (SELECT doc_id, lang, {_bucket_expr('doc_id', salt)} AS b FROM documents) "
        f"SELECT doc_id, lang FROM h WHERE b < ({case}) ORDER BY doc_id"
    )


def _knuth64_expr(col: str, salt: int) -> str:
    """sampling.hash_u64 twin: the full-range Knuth hash mod 2^64 as a
    HUGEINT (no >>33 / mod-1000 reduction).  Safe for small int keys only
    (key·C1 must fit INT128 — doc_id ≤ ~1e18/6.2 qualifies)."""
    return (
        f"(((CAST({col} AS HUGEINT) * CAST(11400714819323198485 AS HUGEINT)"
        f" + {salt} * CAST(14029467366897019727 AS HUGEINT)"
        f" + CAST(1609587929392839161 AS HUGEINT))"
        f" % CAST(18446744073709551616 AS HUGEINT)))"
    )


def samp_priority_sql(k: int = 50, salt: int = 11) -> str:
    """Priority sampling (sampling.priority_sample): rank = hash_u64(doc_id)
    // weight with weight = char length of text; the k smallest ranks win,
    ties by doc_id.  Integer arithmetic end to end, so the SQL is
    bit-exact; prio is the uint64 rank wrapped to int64."""
    h = _knuth64_expr("doc_id", salt)
    return (
        f"WITH h AS (SELECT doc_id, greatest(length(text), 1) AS weight, "
        f"{h} // greatest(length(text), 1) AS prio FROM documents), "
        f"win AS (SELECT * FROM h ORDER BY prio, doc_id LIMIT {k}) "
        f"SELECT doc_id, CAST(weight AS BIGINT) AS weight, "
        f"CAST(CASE WHEN prio >= 9223372036854775808 THEN prio - {_Q64} "
        f"ELSE prio END AS BIGINT) AS prio FROM win ORDER BY doc_id"
    )


def samp_cap_sql(cap: int = 40, salt: int = 7) -> str:
    """Per-stratum hard cap replica: rank each lang's docs by the HUGEINT
    Knuth hash (ties doc_id), keep rank <= cap; h wraps to int64 like the
    engine's uint64 view."""
    h = _knuth64_expr("doc_id", salt)
    return (
        f"WITH hv AS (SELECT doc_id, lang, {h} AS hu FROM documents), "
        "rk AS (SELECT doc_id, lang, hu, row_number() OVER ("
        "PARTITION BY lang ORDER BY hu, doc_id) AS rn FROM hv) "
        f"SELECT doc_id, lang, CAST(CASE WHEN hu >= 9223372036854775808 "
        f"THEN hu - {_Q64} ELSE hu END AS BIGINT) AS h "
        f"FROM rk WHERE rn <= {cap} ORDER BY lang, doc_id"
    )


def text_c4_sql() -> str:
    """C4 line-filter replica: parallel unnest zips (line, ordinal), the
    same RE2 predicates as the engine, string_agg(ORDER BY ordinal)
    reassembles kept lines."""
    ws = "' ' || chr(9) || chr(13)"
    return (
        "WITH ls AS MATERIALIZED (SELECT doc_id, text, "
        "string_split(text, chr(10)) AS arr FROM documents), "
        f"fl AS MATERIALIZED (SELECT doc_id, trim(u.line, {ws}) AS t, u.i "
        "FROM ls, LATERAL (SELECT unnest(arr) AS line, "
        "unnest(generate_series(1, len(arr))) AS i) u), "
        "kept AS MATERIALIZED (SELECT doc_id, t, i FROM fl "
        "WHERE regexp_matches(t, '[.!?\"]$') "
        "AND len(regexp_extract_all(t, '\\S+')) >= 3 "
        "AND NOT contains(lower(t), 'javascript')), "
        "agg AS MATERIALIZED (SELECT doc_id, count(*) AS n_kept, "
        "string_agg(t, chr(10) ORDER BY i) AS clean_text FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(coalesce(a.n_kept, 0) >= 3 "
        "AND NOT contains(lower(d.text), 'lorem ipsum') "
        "AND NOT contains(d.text, '{') AS BIGINT) AS keep_doc, "
        "len(string_split(d.text, chr(10))) AS n_lines, "
        "coalesce(a.n_kept, 0) AS n_kept, coalesce(a.clean_text, '') AS clean_text "
        "FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id ORDER BY d.doc_id"
    )


def emb_covariance_sql(scale: int = 1_000_000) -> str:
    """Exact-integer embedding second moments: q = floor(scale*x + 0.5)
    (identical rounding in numpy and SQL), pairwise sums per (i, j) via a
    self-join of the ordinality-zipped unnest, all BIGINT."""
    return (
        f"WITH q AS MATERIALIZED (SELECT vec_id, list_transform(embedding, "
        f"x -> CAST(floor({scale} * CAST(x AS DOUBLE) + 0.5) AS BIGINT)) AS qe "
        "FROM embeddings), "
        "flat AS MATERIALIZED (SELECT vec_id, u.i - 1 AS i, u.v FROM q, "
        "LATERAL (SELECT unnest(generate_series(1, len(qe))) AS i, "
        "unnest(qe) AS v) u) "
        "SELECT a.i AS i, b.i AS j, count(*) AS n, "
        "CAST(sum(a.v) AS BIGINT) AS sa, CAST(sum(b.v) AS BIGINT) AS sb, "
        "CAST(sum(a.v * b.v) AS BIGINT) AS spp "
        "FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i "
        "GROUP BY a.i, b.i ORDER BY i, j"
    )


def text_zipf_sql(k: int = 100) -> str:
    """Zipf head replica: non-empty single-space tokens, count, rank by
    (count DESC, token)."""
    return (
        "WITH toks AS MATERIALIZED (SELECT unnest(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
        "c AS MATERIALIZED (SELECT tok, count(*) AS n FROM toks GROUP BY tok) "
        "SELECT rnk, tok, n FROM (SELECT tok, n, row_number() OVER ("
        "ORDER BY n DESC, tok) AS rnk FROM c) "
        f"WHERE rnk <= {k} ORDER BY rnk"
    )


def text_chunks_sql(size: int = 256, overlap: int = 64) -> str:
    """RAG chunking replica: one row per (doc, window) with stride
    size-overlap; generate_series(0, greatest(len-1, 0), stride) yields
    exactly max(len-1,0)//stride + 1 starts, so empty docs still emit one
    empty chunk like the engine."""
    stride = size - overlap
    return (
        f"SELECT doc_id, s.start AS start, "
        f"substr(text, s.start + 1, {size}) AS chunk, "
        f"length(substr(text, s.start + 1, {size})) AS chunk_len "
        f"FROM documents, LATERAL (SELECT unnest(generate_series(0, "
        f"greatest(length(text) - 1, 0), {stride})) AS start) s"
    )


def text_norm_sql() -> str:
    """CCNet-style normalization (text.normalize_text): lowercase, digits→0,
    punctuation→space, whitespace collapsed + trimmed.  Same RE2 patterns
    both sides (Arrow replace_substring_regex / DuckDB regexp_replace)."""
    return (
        "SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace("
        "lower(text), '[0-9]', '0', 'g'), '[^a-z0\\s]', ' ', 'g'), "
        "'\\s+', ' ', 'g')) AS norm_text FROM documents ORDER BY doc_id"
    )


def op_hll_by_sql(p: int = 10) -> str:
    """Bit-exact SQL replica of sketch.hll_count_by over lineitem: distinct
    l_partkey per l_returnflag — the same fmix64 / CLZ-via-bin() register
    machinery as op_hll_count_sql, grouped by key (registers cross-joined
    per group so empty registers count toward linear counting)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    low = f"{1 << (64 - p)}"  # 2^(64-p)
    mix, final = _mix64_expr_ctes("h0", "r, k")
    ctes = [
        "h0 AS MATERIALIZED (SELECT row_number() OVER () AS r, "
        "l_returnflag AS k, CAST(l_partkey AS HUGEINT) AS h FROM lineitem)",
        *mix,
        f"rr AS MATERIALIZED (SELECT k, h // CAST({low} AS HUGEINT) AS bucket, "
        f"64 - length(bin((h % CAST({low} AS HUGEINT)) * CAST({1 << p} AS HUGEINT) "
        f"+ {(1 << p) - 1})) + 1 AS rho FROM {final})",
        f"grp AS (SELECT DISTINCT k FROM rr)",
        f"regs AS (SELECT g.k, b.range AS bucket, coalesce(mx.rho, 0) AS reg "
        f"FROM grp g CROSS JOIN range({m}) b LEFT JOIN "
        f"(SELECT k, bucket, max(rho) AS rho FROM rr GROUP BY k, bucket) mx "
        f"ON mx.k = g.k AND mx.bucket = b.range)",
        f"est AS (SELECT k, CAST({alpha} AS DOUBLE) * {m} * {m} "
        f"/ sum(power(2.0, -reg)) AS e, "
        f"sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS z FROM regs GROUP BY k)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + " "
        f"SELECT k AS l_returnflag, round(CASE WHEN e <= {2.5 * m} AND z > 0 "
        f"THEN {m} * ln({m} / z) ELSE e END, 4) AS estimate FROM est ORDER BY k"
    )


def lg_khop_sql(fanouts=(4, 3), salt: int = 5, seed_step: int = 97) -> str:
    """Bit-exact replica of graph/minibatch.khop_sample over the link graph:
    per layer t, rank = hash_u64(src·LG_MOD + dst, salt + t) (the same
    full-range Knuth kernel as samp_priority), sample = row_number() OVER
    (PARTITION BY src ORDER BY rank, dst) ≤ fanouts[t]; the next frontier
    is the distinct sampled dsts."""
    ctes = [f"f0 AS (SELECT range AS oid FROM range(0, {LG_MOD}, {seed_step}))"]
    sels = []
    for t, f in enumerate(fanouts):
        h = _knuth64_expr(f"(e.src * {LG_MOD} + e.dst)", salt + t)
        ctes.append(
            f"r{t} AS (SELECT e.src, e.dst, row_number() OVER "
            f"(PARTITION BY e.src ORDER BY {h}, e.dst) AS rk "
            f"FROM e JOIN f{t} ON f{t}.oid = e.src)"
        )
        ctes.append(
            f"s{t} AS (SELECT CAST({t} AS BIGINT) AS layer, src, dst FROM r{t} WHERE rk <= {f})"
        )
        ctes.append(f"f{t + 1} AS (SELECT DISTINCT dst AS oid FROM s{t})")
        sels.append(f"SELECT layer, src, dst FROM s{t}")
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes) + " "
        + " UNION ALL ".join(sels)
        + " ORDER BY layer, src, dst"
    )


def lg_negative_sample_sql(k: int = 3, salt: int = 7, m: int = 14) -> str:
    """Bit-exact replica of graph/minibatch.negative_sample over the link
    graph: candidate i of vertex v is knuth64(v·LG_MOD + i, salt) % LG_MOD
    (the engine's hash_u64 twin), self-loops and true edges anti-joined
    out, first k surviving candidates by i win.  m = 2k + 8 (the engine
    default)."""
    h = _knuth64_expr(f"(v.oid * {LG_MOD} + t.i)", salt)
    return (
        f"WITH {_BASE}, "
        f"cand AS (SELECT v.oid AS src, CAST(({h}) % {LG_MOD} AS BIGINT) AS dst, t.i AS i "
        f"FROM v CROSS JOIN range({m}) t(i)), "
        "cand2 AS (SELECT * FROM cand WHERE dst <> src), "
        "surv AS (SELECT c.src, c.dst, c.i FROM cand2 c "
        "LEFT JOIN e ON e.src = c.src AND e.dst = c.dst WHERE e.src IS NULL) "
        "SELECT src, dst FROM (SELECT src, dst, row_number() OVER "
        f"(PARTITION BY src ORDER BY i) AS rk FROM surv) WHERE rk <= {k} "
        "ORDER BY src, dst"
    )


def lg_link_features_sql(
    seed_step: int = 13, max_degree: int = 256, min_cn: int = 1
) -> str:
    """Bit-exact replica of graph/minibatch.link_features: wedges over the
    distinct undirected adjacency (mid degree ≤ max_degree, min endpoint in
    the seed slice), Adamic–Adar as the exact integer sum of the SAME
    numpy-computed round(1e12/ln(g)) weights the engine uses (embedded as
    a VALUES table), Jaccard round-8 (tie-free at these denominators)."""
    from graphscope_ray.graph.minibatch import aa_weight_int

    gs = np.arange(2, max_degree + 1)
    wt = ", ".join(f"({g}, {int(w)})" for g, w in zip(gs, aa_weight_int(gs)))
    return (
        f"WITH {_BASE}, "
        f"sd AS (SELECT range AS s FROM range(0, {LG_MOD}, {seed_step})), "
        "udeg AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM ue GROUP BY src), "
        f"wt(g, w) AS (VALUES {wt}), "
        "wedge AS (SELECT a.src AS u, b.src AS v, dm.d AS g "
        "FROM ue a JOIN ue b ON b.dst = a.dst AND a.src < b.src "
        "JOIN udeg dm ON dm.oid = a.dst "
        f"JOIN sd ON sd.s = a.src WHERE dm.d <= {max_degree}), "
        "agg AS (SELECT u, v, count(*) AS cn, sum(wt.w) AS aaw "
        "FROM wedge JOIN wt ON wt.g = wedge.g GROUP BY u, v) "
        "SELECT agg.u, agg.v, CAST(cn AS BIGINT) AS cn, CAST(aaw AS BIGINT) AS aa_e12, "
        "round(CAST(cn AS DOUBLE) / (du.d + dv.d - cn), 8) AS jaccard, "
        "CAST(du.d * dv.d AS BIGINT) AS pref, "
        "CAST(CASE WHEN t.src IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_edge "
        "FROM agg JOIN udeg du ON du.oid = agg.u JOIN udeg dv ON dv.oid = agg.v "
        "LEFT JOIN ue t ON t.src = agg.u AND t.dst = agg.v "
        f"WHERE cn >= {min_cn} ORDER BY u, v"
    )


_COMM_BASE = f"""
ce AS MATERIALIZED (
  SELECT DISTINCT (l_orderkey % {LG_MOD}) AS src, (l_partkey % {LG_MOD}) AS dst
  FROM lineitem WHERE (l_orderkey % {LG_MOD}) <> (l_partkey % {LG_MOD})
),
cue AS MATERIALIZED (SELECT src, dst FROM ce UNION SELECT dst AS src, src AS dst FROM ce)
"""
# the CDLP labeling nests as a subquery with its own WITH (_BASE inside),
# so the outer scope uses the ce/cue copies to avoid CTE-name collisions

_COMM_STATS = """
lab AS MATERIALIZED (SELECT oid, label_oid AS label FROM ({cdlp})),
up AS MATERIALIZED (SELECT src AS u, dst AS v FROM cue WHERE src < dst),
lp AS MATERIALIZED (SELECT a.label AS lu, b.label AS lv FROM up
     JOIN lab a ON a.oid = up.u JOIN lab b ON b.oid = up.v),
stat AS MATERIALIZED (SELECT community, sum(intra) AS intra, sum(cut) AS cut FROM (
     SELECT lu AS community, CASE WHEN lu = lv THEN 1 ELSE 0 END AS intra,
            CASE WHEN lu = lv THEN 0 ELSE 1 END AS cut FROM lp
     UNION ALL SELECT lv, 0, 1 FROM lp WHERE lu <> lv) GROUP BY community),
udeg2 AS MATERIALIZED (SELECT src AS oid, count(*) AS d FROM cue GROUP BY src),
cvol AS MATERIALIZED (SELECT l.label AS community, sum(d.d) AS vol
     FROM udeg2 d JOIN lab l ON l.oid = d.oid GROUP BY 1)
"""


def lg_community_stats_sql(rounds: int = 10) -> str:
    """graph/metrics.community_edge_stats twin over the CDLP labels: per
    community, intra / cut (boundary counted toward BOTH sides) / degree
    volume over the distinct undirected simple graph — exact integers."""
    body = _COMM_STATS.format(cdlp=lg_cdlp_sql(rounds))
    return (
        f"WITH {_COMM_BASE}, {body} "
        "SELECT s.community, CAST(s.intra AS BIGINT) AS intra, "
        "CAST(s.cut AS BIGINT) AS cut, CAST(cvol.vol AS BIGINT) AS vol "
        "FROM stat s JOIN cvol ON cvol.community = s.community ORDER BY s.community"
    )


def lg_modularity_sql(rounds: int = 10) -> str:
    """graph/metrics.modularity_stats twin: Q of the CDLP partition as the
    exact rational q_num/q_den (q_num = 4m·Σintra − Σvol², q_den = 4m²)."""
    body = _COMM_STATS.format(cdlp=lg_cdlp_sql(rounds))
    return (
        f"WITH {_COMM_BASE}, {body}, "
        "mm AS (SELECT count(*) AS m FROM up), "
        "si AS (SELECT sum(intra) AS s FROM stat), "
        "sv AS (SELECT sum(vol * vol) AS s2 FROM cvol) "
        "SELECT CAST(mm.m AS BIGINT) AS m, "
        "CAST(4 * mm.m * si.s - sv.s2 AS BIGINT) AS q_num, "
        "CAST(4 * mm.m * mm.m AS BIGINT) AS q_den FROM mm, si, sv"
    )


def lg_contract_sql(rounds: int = 10) -> str:
    """graph/metrics.contract_graph twin: the directed community graph of
    the CDLP partition with distinct-edge multiplicities."""
    return (
        f"WITH {_COMM_BASE}, "
        f"lab AS MATERIALIZED (SELECT oid, label_oid AS label FROM ({lg_cdlp_sql(rounds)})) "
        "SELECT a.label AS csrc, b.label AS cdst, CAST(count(*) AS BIGINT) AS weight "
        "FROM ce JOIN lab a ON a.oid = ce.src JOIN lab b ON b.oid = ce.dst "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


def lg_node2vec_sql(
    n_starts: int = 64,
    length: int = 4,
    w_ret: int = 1,
    w_com: int = 4,
    w_far: int = 2,
    a: int = 1103515245,
    b: int = 12345,
    c: int = 97,
    mod: int = 2147483647,
) -> str:
    """graph/minibatch.node2vec_walks twin: per step, candidates = cur's
    out-neighbors with integer class weights (return / distance-1 / far),
    winner = the ascending candidate whose cumulative-weight interval
    contains (a·walk_id + b·s + c·cur) mod m mod Σw — integer arithmetic
    end to end."""
    ctes = [
        f"nw0 AS MATERIALIZED (SELECT oid AS walk_id, oid AS prev, oid AS cur "
        f"FROM v WHERE oid < {n_starts})"
    ]
    for s in range(1, length + 1):
        r = f"(({a} * walk_id + {b} * {s} + {c} * cur) % {mod}) % tot"
        ctes.append(
            f"nc{s} AS MATERIALIZED (SELECT w.walk_id, w.prev, w.cur, n.dst, "
            f"CASE WHEN n.dst = w.prev THEN {w_ret} "
            f"WHEN ep.src IS NOT NULL THEN {w_com} ELSE {w_far} END AS wt "
            f"FROM nw{s - 1} w JOIN e n ON n.src = w.cur "
            f"LEFT JOIN e ep ON ep.src = w.prev AND ep.dst = n.dst)"
        )
        ctes.append(
            f"nk{s} AS MATERIALIZED (SELECT *, sum(wt) OVER (PARTITION BY walk_id "
            f"ORDER BY dst ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            f"sum(wt) OVER (PARTITION BY walk_id) AS tot FROM nc{s})"
        )
        ctes.append(
            f"nw{s} AS MATERIALIZED (SELECT walk_id, cur AS prev, dst AS cur "
            f"FROM nk{s} WHERE {r} >= cum - wt AND {r} < cum)"
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, CAST({s} AS BIGINT) AS step, cur AS v FROM nw{s}"
        for s in range(length + 1)
    )
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes)
        + f" SELECT walk_id, step, v FROM ({union}) ORDER BY walk_id, step"
    )


def lg_deepwalk_ppmi_sql(
    n_starts: int = 64, length: int = 4, window: int = 2, min_count: int = 1
) -> str:
    """testdata.lg_deepwalk_ppmi twin: the lg_random_walks SQL as a
    subquery, skip-gram pairs within ``window`` steps of the same walk,
    PPMI over the pair table (same formula as text_ppmi_sql)."""
    walks = lg_random_walks_sql(n_starts=n_starts, length=length)
    return (
        f"WITH walks AS MATERIALIZED (SELECT * FROM ({walks})), "
        f"pairs AS (SELECT a.v AS w, b.v AS c FROM walks a JOIN walks b "
        f"ON b.walk_id = a.walk_id AND b.step BETWEEN a.step - {window} "
        f"AND a.step + {window} AND b.step <> a.step), "
        "pcnt AS MATERIALIZED (SELECT w, c, count(*) AS n FROM pairs GROUP BY w, c), "
        "mw AS (SELECT w, sum(n) AS nw FROM pcnt GROUP BY w), "
        "mc AS (SELECT c, sum(n) AS nc FROM pcnt GROUP BY c), "
        "tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM pcnt) "
        "SELECT pcnt.w, pcnt.c, CAST(pcnt.n AS BIGINT) AS n, "
        "round(greatest(ln(tot.N * pcnt.n / (mw.nw * mc.nc)), 0), 8) AS ppmi "
        "FROM pcnt JOIN mw USING (w) JOIN mc USING (c), tot "
        f"WHERE pcnt.n >= {min_count} ORDER BY w, c"
    )


def pg_metapath_sql(
    fanouts=(3, 2), salt: int = 11, seed_step: int = 97, pm: int = 1 << 21
) -> str:
    """Bit-exact replica of graph/minibatch.metapath_sample over the
    tripartite property graph: layer t draws from its edge-label table
    (places = orders, contains = lineitem), rank = hash_u64(src·pm + dst,
    salt + t), sample = row_number() OVER (PARTITION BY src ORDER BY rank,
    dst) ≤ fanouts[t]; multi-edges keep their multiplicity on both sides."""
    paths = [
        ("places", "SELECT o_custkey AS src, o_orderkey AS dst FROM orders"),
        ("contains", "SELECT l_orderkey AS src, l_partkey AS dst FROM lineitem"),
    ]
    ctes = [
        f"f0 AS (SELECT c_custkey AS oid FROM customer WHERE c_custkey % {seed_step} = 0)"
    ]
    sels = []
    for t, (el, esel) in enumerate(paths):
        h = _knuth64_expr(f"(e{t}.src * {pm} + e{t}.dst)", salt + t)
        ctes.append(f"e{t} AS ({esel})")
        ctes.append(
            f"r{t} AS (SELECT e{t}.src, e{t}.dst, row_number() OVER "
            f"(PARTITION BY e{t}.src ORDER BY {h}, e{t}.dst) AS rk "
            f"FROM e{t} JOIN f{t} ON f{t}.oid = e{t}.src)"
        )
        ctes.append(
            f"s{t} AS (SELECT CAST({t} AS BIGINT) AS layer, '{el}' AS elabel, "
            f"src, dst FROM r{t} WHERE rk <= {fanouts[t]})"
        )
        ctes.append(f"f{t + 1} AS (SELECT DISTINCT dst AS oid FROM s{t})")
        sels.append(f"SELECT layer, elabel, src, dst FROM s{t}")
    return (
        "WITH " + ",\n".join(ctes) + " "
        + " UNION ALL ".join(sels)
        + " ORDER BY layer, src, dst"
    )


def lg_sage_sum_sql(n_feat: int = 500) -> str:
    """testdata.lg_sage_sum twin: per-vertex per-dimension exact integer
    sum of quantized in-neighbor features (feature of u =
    round(1e6·embeddings[u % n_feat]), float32→float64 cast is exact and
    the quantization is verified tie-free on this data) + in-degree."""
    return (
        f"WITH {_BASE}, "
        "f AS (SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim, "
        "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q "
        "FROM embeddings) "
        "SELECT e.dst AS oid, f.dim, CAST(sum(f.q) AS BIGINT) AS s_e6, "
        "CAST(count(*) AS BIGINT) AS n "
        f"FROM e JOIN f ON f.vec_id = e.src % {n_feat} "
        "GROUP BY e.dst, f.dim ORDER BY oid, dim"
    )


def dedup_semantic_sql(
    k: int = 8, iters: int = 3, threshold: float = 0.95, n_planted: int = 10
) -> str:
    """Exact replica of dedup.semdedup over the planted embeddings table:
    the same unrolled Lloyd's as op_kmeans_sql (seed = k lowest ids,
    argmin with min-cid tie-break, empty-centroid carry-over) computes the
    final cluster per vector, then the SemDeDup drop rule — dup iff an
    in-cluster LOWER-id vector is ≥ threshold cosine-similar — is one
    per-cluster causal self-join.  dup/cluster are integers, so the check
    is raw-hash exact; the 0.95 threshold sits in the wide gap between
    planted copies (cosine 1) and the near-orthogonal synthetic corpus
    (max ≈ 0.51), so float noise cannot flip a row."""
    ctes = [
        "em AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        "UNION ALL "
        f"SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id < {n_planted})",
        "pts AS MATERIALIZED (SELECT vec_id, generate_subscripts(v, 1) - 1 AS d, "
        "unnest(v) AS x FROM em)",
        f"seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid "
        f"FROM (SELECT vec_id FROM em ORDER BY vec_id LIMIT {k}))",
        "c0 AS MATERIALIZED (SELECT s.cid, p.d, p.x FROM seed s JOIN pts p ON p.vec_id = s.vec_id)",
    ]
    for t in range(iters):
        ctes.append(
            f"dist{t} AS MATERIALIZED (SELECT p.vec_id, c.cid, "
            f"sum((p.x - c.x) * (p.x - c.x)) AS d2 "
            f"FROM pts p JOIN c{t} c ON c.d = p.d GROUP BY p.vec_id, c.cid)"
        )
        ctes.append(
            f"asg{t} AS MATERIALIZED (SELECT vec_id, cid FROM "
            f"(SELECT vec_id, cid, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM dist{t}) WHERE rk = 1)"
        )
        ctes.append(
            f"nu{t} AS (SELECT a.cid, p.d, avg(p.x) AS x FROM asg{t} a "
            f"JOIN pts p ON p.vec_id = a.vec_id GROUP BY a.cid, p.d)"
        )
        ctes.append(
            f"c{t + 1} AS MATERIALIZED (SELECT c.cid, c.d, coalesce(nu.x, c.x) AS x "
            f"FROM c{t} c LEFT JOIN nu{t} nu ON nu.cid = c.cid AND nu.d = c.d)"
        )
    ctes.append(
        f"distF AS (SELECT p.vec_id, c.cid, sum((p.x - c.x) * (p.x - c.x)) AS d2 "
        f"FROM pts p JOIN c{iters} c ON c.d = p.d GROUP BY p.vec_id, c.cid)"
    )
    ctes.append(
        "asgF AS MATERIALIZED (SELECT vec_id, cid FROM "
        "(SELECT vec_id, cid, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM distF) WHERE rk = 1)"
    )
    ctes.append(
        "dups AS (SELECT a.vec_id, max(CASE WHEN "
        f"list_cosine_similarity(ea.v, eb.v) >= {threshold} THEN 1 ELSE 0 END) AS dup "
        "FROM asgF a JOIN asgF b ON b.cid = a.cid AND b.vec_id < a.vec_id "
        "JOIN em ea ON ea.vec_id = a.vec_id JOIN em eb ON eb.vec_id = b.vec_id "
        "GROUP BY a.vec_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + " "
        "SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster, "
        "CAST(coalesce(d.dup, 0) AS BIGINT) AS dup "
        "FROM asgF a LEFT JOIN dups d ON d.vec_id = a.vec_id ORDER BY a.vec_id"
    )


def pg_gremlin_count_sql() -> str:
    """gremlin.Traversal bag semantics ARE join multiplicities, so the
    2-hop count g.V().hasLabel('customer').has('c_acctbal', gt(5000))
    .out('places').out('contains').count() is exactly the 3-table join
    cardinality (places = orders rows, contains = lineitem rows)."""
    return (
        "SELECT count(*) AS n FROM customer "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_acctbal > 5000"
    )


def pg_gremlin_groupcount_sql() -> str:
    """values('p_size').groupCount() over the same traversal = GROUP BY
    p_size over the 4-table join (the part hop is the values() property
    join)."""
    return (
        "SELECT p_size AS value, count(*) AS count FROM customer "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN part ON p_partkey = l_partkey "
        "WHERE c_acctbal > 5000 "
        "GROUP BY p_size ORDER BY p_size"
    )


def pg_mutations_sql() -> str:
    """Property-graph mutation twin: customers = base UNION ALL shifted
    suppliers; places = base orders edges UNION ALL shifted lineitem wires
    (bag — duplicates preserved); cascade delete = inner semi-join of the
    edge bag against the non-negative-balance survivors."""
    return (
        "WITH cust AS (SELECT c_custkey AS oid, c_acctbal FROM customer "
        "UNION ALL SELECT s_suppkey + 100000, s_acctbal FROM supplier), "
        "surv AS (SELECT oid FROM cust WHERE NOT (c_acctbal < 0)), "
        "pl AS (SELECT o_custkey AS src_oid, o_orderkey AS dst_oid FROM orders "
        "UNION ALL SELECT l_suppkey + 100000, l_orderkey FROM lineitem) "
        "SELECT src_oid, dst_oid FROM pl JOIN surv ON surv.oid = pl.src_oid "
        "ORDER BY src_oid, dst_oid"
    )


def pg_gremlin_path_sql(minbal: int = 9000) -> str:
    """withPath() 2-hop path rows = the 3-table join tuples."""
    return (
        "SELECT 'part' AS v_label, c_custkey AS p0, o_orderkey AS p1, "
        "l_partkey AS p2 FROM customer "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE c_acctbal > {minbal} ORDER BY v_label, p0, p1, p2"
    )


def pg_gremlin_coin_sql(p: float = 0.25, salt: int = 3) -> str:
    """coin(p) twin: hash_u64(c_custkey, salt) < p*2^64 in HUGEINT, then
    the places hop's per-order multiplicities."""
    thresh = min(int(p * 2.0**64), 2**64 - 1)
    h = _knuth64_expr("c_custkey", salt)
    return (
        "SELECT 'order' AS v_label, o_orderkey AS oid, count(*) AS count "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        f"WHERE {h} < CAST('{thresh}' AS HUGEINT) "
        "GROUP BY o_orderkey ORDER BY v_label, oid"
    )


def pg_gremlin_select_sql(minbal: int = 9000) -> str:
    """as_/select projection = the join pair multiset."""
    return (
        "SELECT c_custkey AS c, o_orderkey AS o FROM customer "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE c_acctbal > {minbal} ORDER BY c, o"
    )


def pg_gremlin_agg_sql() -> str:
    """Gremlin sum/mean/max/min terminals over the values('o_totalprice')
    bag of the filtered 2-hop = plain SQL aggregates over the join.  The
    engine folds per-block float partials; at these magnitudes (<1e9, ~1e4
    rows) the sum is exact well past round(2)/round(6)."""
    return (
        "SELECT round(sum(o_totalprice), 2) AS sum_price, "
        "round(sum(o_totalprice) / count(*), 6) AS mean_price, "
        "max(o_totalprice) AS max_price, min(o_totalprice) AS min_price "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "WHERE c_acctbal > 5000"
    )


def pg_update_column_sql() -> str:
    """update_column's coalesce twin: per-customer order total in exact
    integer cents where orders exist, else the original balance."""
    return (
        "WITH tot AS (SELECT o_custkey, sum(CAST(round(o_totalprice * 100) "
        "AS BIGINT)) AS cents FROM orders GROUP BY o_custkey) "
        "SELECT c_custkey AS oid, c_nationkey, "
        "round(coalesce(cents / 100.0, c_acctbal), 2) AS c_acctbal "
        "FROM customer LEFT JOIN tot ON o_custkey = c_custkey "
        "ORDER BY oid"
    )


def train_epoch_order_sql(B: int = 64, seed: int = 11, epoch: int = 2) -> str:
    """epoch.EpochIterator order twin: rows sorted by the SIGNED int64 view
    of hash_u64(doc_id, salt) (the engine sorts the raw .view(int64), so
    hashes ≥ 2^63 wrap negative and come first), ties by doc_id; batch/pos
    from the 0-based row_number."""
    salt = (int(seed) & 0x7FFFFFFF) ^ ((int(epoch) + 1) * 0x9E3779B1)
    hu = _knuth64_expr("doc_id", salt)
    return (
        f"WITH h AS (SELECT doc_id, {hu} AS hu FROM documents), "
        "s AS (SELECT doc_id, CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT) "
        "THEN hu - CAST(18446744073709551616 AS HUGEINT) ELSE hu END AS hs FROM h), "
        "r AS (SELECT doc_id, row_number() OVER (ORDER BY hs, doc_id) - 1 AS rk FROM s) "
        f"SELECT doc_id, CAST(rk // {B} AS BIGINT) AS batch, "
        f"CAST(rk % {B} AS BIGINT) AS pos FROM r ORDER BY doc_id"
    )


def pg_gremlin_repeat_sql(cmax: int = 200) -> str:
    """repeat(out()).times(2) from customers with oid<=cmax is exactly the
    2-fold hop composition customer→order→part: groupCount = the 3-table
    join multiplicity per part."""
    return (
        "SELECT 'part' AS v_label, l_partkey AS oid, count(*) AS count "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE c_custkey <= {cmax} GROUP BY l_partkey ORDER BY v_label, oid"
    )


def pg_gremlin_emit_sql(cmax: int = 200) -> str:
    """repeat(out()).emit().times(2): frontier after round 1 (orders) UNION
    ALL frontier after round 2 (parts), each groupCount()ed."""
    return (
        "SELECT * FROM ("
        "SELECT 'order' AS v_label, o_orderkey AS oid, count(*) AS count "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        f"WHERE c_custkey <= {cmax} GROUP BY o_orderkey "
        "UNION ALL "
        "SELECT 'part', l_partkey, count(*) "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE c_custkey <= {cmax} GROUP BY l_partkey"
        ") ORDER BY v_label, oid"
    )


def pg_gremlin_union_sql(minprice: int = 100000) -> str:
    """union(in_('places'), out('contains')) from high-value orders:
    traverser bags add across branches = SQL UNION ALL of the two hops."""
    return (
        "SELECT * FROM ("
        "SELECT 'customer' AS v_label, o_custkey AS oid, count(*) AS count "
        f"FROM orders WHERE o_totalprice > {minprice} GROUP BY o_custkey "
        "UNION ALL "
        "SELECT 'part', l_partkey, count(*) "
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
        f"WHERE o_totalprice > {minprice} GROUP BY l_partkey"
        ") ORDER BY v_label, oid"
    )


def pg_gremlin_order_range_sql(lo: int = 5, hi: int = 25) -> str:
    """order().by(p_retailprice, desc).range(lo, hi): the engine's
    deterministic tie-break (key desc, label, oid asc) is the row_number
    window ORDER BY p_retailprice DESC, p_partkey."""
    return (
        "WITH ranked AS (SELECT p_partkey, p_size, "
        "row_number() OVER (ORDER BY p_retailprice DESC, p_partkey) AS rn FROM part) "
        "SELECT p_size AS value, count(*) AS count FROM ranked "
        f"WHERE rn > {lo} AND rn <= {hi} GROUP BY p_size ORDER BY value"
    )


def pg_gremlin_where_sql(minprice: int = 200000) -> str:
    """where(out('places').has(o_totalprice > minprice)) = SQL EXISTS:
    V() multiplicity is 1 per customer, preserved by the semi-join."""
    return (
        "SELECT 'customer' AS v_label, c_custkey AS oid FROM customer "
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        f"AND o_totalprice > {minprice}) ORDER BY oid"
    )


def pg_gremlin_subgraph_sql() -> str:
    """The materialized subgraph's 'places' edge table: one row per parent
    places edge whose src customer passes the nationkey filter (subgraph
    dedups edges; places edges are unique (custkey, orderkey) pairs
    already)."""
    return (
        "SELECT o_custkey AS src_oid, o_orderkey AS dst_oid FROM orders "
        "JOIN customer ON c_custkey = o_custkey "
        "WHERE c_nationkey IN (0, 1, 2) "
        "ORDER BY src_oid, dst_oid"
    )


# ---------------------------------------------------------------------------
# sssp_has_path / sssp_average_length / sssp_path / attribute assortativity /
# directed LCC (the last distinct-semantics apps in the reference registry)


def lg_has_path_sql(targets=(1, 500, 999)) -> str:
    vals = ", ".join(f"({t})" for t in targets)
    return (
        f"WITH RECURSIVE {_BASE}, "
        "src0 AS MATERIALIZED (SELECT min(oid) AS s FROM v), "
        "walk(wv) AS MATERIALIZED (SELECT s FROM src0 UNION "
        "SELECT e.dst FROM walk w JOIN e ON e.src = w.wv) "
        f"SELECT t.target, CASE WHEN r.wv IS NOT NULL THEN 1 ELSE 0 END AS has_path "
        f"FROM (VALUES {vals}) t(target) "
        "LEFT JOIN (SELECT DISTINCT wv FROM walk) r ON r.wv = t.target "
        "ORDER BY t.target"
    )


def lg_avg_path_length_sql(s_max: int = 32, max_depth: int = 8) -> str:
    return (
        f"WITH RECURSIVE {_BASE}, "
        f"srcs AS MATERIALIZED (SELECT DISTINCT oid FROM v WHERE oid < {s_max}), "
        "walk(s, wv, d) AS MATERIALIZED ("
        "  SELECT oid, oid, 0 FROM srcs UNION "
        f"  SELECT w.s, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.wv WHERE w.d < {max_depth}), "
        "sp AS MATERIALIZED (SELECT s, wv, min(d) AS dist FROM walk GROUP BY s, wv) "
        "SELECT count(*) AS n_pairs, round(avg(CAST(dist AS DOUBLE)), 8) AS avg_len "
        "FROM sp WHERE s <> wv"
    )


def lg_sssp_path_sql(rounds: int = 24, source: int = 0) -> str:
    """Shortest-path tree rows (pred, oid, dist): the Bellman-Ford fixpoint
    plus the deterministic pred(v) = min src over distance-tight in-edges
    (exact float equality — integer-valued sums on both sides)."""
    ctes = _sssp_w_ctes(rounds, source)
    ctes.append(
        f"pr AS MATERIALIZED (SELECT we.dst AS oid, min(we.src) AS pred "
        f"FROM we JOIN b{rounds} bs ON bs.oid = we.src "
        f"JOIN b{rounds} bd ON bd.oid = we.dst "
        f"WHERE bs.dist < 1e17 AND bs.dist + we.w = bd.dist GROUP BY we.dst)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT coalesce(pr.pred, {source}) AS pred, b.oid, round(b.dist, 8) AS dist "
        f"FROM b{rounds} b LEFT JOIN pr ON pr.oid = b.oid "
        "WHERE b.dist < 1e17 ORDER BY b.oid"
    )


def lg_attr_assortativity_sql(n_cat: int = 5) -> str:
    return (
        f"WITH {_BASE}, "
        "m AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS c FROM e), "
        f"mix AS MATERIALIZED (SELECT src % {n_cat} AS ai, dst % {n_cat} AS aj, "
        "count(*) AS c FROM e GROUP BY 1, 2), "
        "tr AS MATERIALIZED (SELECT coalesce(sum(c), 0) / (SELECT c FROM m) AS t "
        "FROM mix WHERE ai = aj), "
        "ra AS MATERIALIZED (SELECT ai, sum(c) / (SELECT c FROM m) AS s FROM mix GROUP BY ai), "
        "cb AS MATERIALIZED (SELECT aj, sum(c) / (SELECT c FROM m) AS s FROM mix GROUP BY aj), "
        "ab AS MATERIALIZED (SELECT coalesce(sum(ra.s * cb.s), 0) AS v FROM ra "
        "JOIN cb ON cb.aj = ra.ai) "
        "SELECT round(((SELECT t FROM tr) - (SELECT v FROM ab)) / (1.0 - (SELECT v FROM ab)), 8) "
        "AS coefficient"
    )


def lg_lcc_directed_sql() -> str:
    """Fagiolo directed clustering on the sparse graph: canonical pair
    weights w ∈ {1,2}, T_i = Σ_{a<b<c triangles} w_ab·w_bc·w_ac per corner,
    C_i = T_i / (dtot(dtot−1) − 2·dbid)."""
    return (
        f"WITH {_SBASE}, "
        "pw AS MATERIALIZED (SELECT least(src, dst) AS a, greatest(src, dst) AS b, "
        "count(*) AS w FROM se GROUP BY 1, 2), "
        "dt AS MATERIALIZED (SELECT tv, sum(w) AS dtot, "
        "sum(CASE WHEN w = 2 THEN 1 ELSE 0 END) AS dbid FROM ("
        "SELECT a AS tv, w FROM pw UNION ALL SELECT b, w FROM pw) GROUP BY tv), "
        "t3 AS MATERIALIZED (SELECT w1.a AS x, w1.b AS y, w2.b AS z, "
        "w1.w * w2.w * w3.w AS p "
        "FROM pw w1 JOIN pw w2 ON w2.a = w1.b "
        "JOIN pw w3 ON w3.a = w1.a AND w3.b = w2.b), "
        "tc AS MATERIALIZED (SELECT tv, sum(p) AS t FROM ("
        "SELECT x AS tv, p FROM t3 UNION ALL SELECT y, p FROM t3 "
        "UNION ALL SELECT z, p FROM t3) GROUP BY tv) "
        "SELECT dt.tv AS oid, round(CASE WHEN dt.dtot * (dt.dtot - 1) - 2 * dt.dbid > 0 "
        "THEN coalesce(tc.t, 0) * 1.0 / (dt.dtot * (dt.dtot - 1) - 2 * dt.dbid) "
        "ELSE 0 END, 8) AS lcc_d "
        "FROM dt LEFT JOIN tc ON tc.tv = dt.tv ORDER BY oid"
    )


# ---------------------------------------------------------------------------
# relational operators beyond the framework surface (functions/joins.py)


def op_asof_join_sql() -> str:
    """ASOF JOIN with the right side deduped per (key, date) keeping max
    o_orderkey — the same deterministic tie-break asof_join applies."""
    return (
        "WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey "
        "FROM orders GROUP BY o_custkey, o_orderdate) "
        "SELECT e.event_id, e.user_id, o.o_orderkey "
        "FROM events e ASOF JOIN od o "
        "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate "
        "ORDER BY e.event_id"
    )


def op_asof_forward_sql() -> str:
    """Forward ASOF replica (l.ts <= r.ts picks the nearest FOLLOWING
    right row): each order's first event at/after its date, events deduped
    per (user, ts) keeping max event_id."""
    return (
        "WITH ev AS (SELECT user_id, ts, max(event_id) AS event_id "
        "FROM events GROUP BY user_id, ts) "
        "SELECT o.o_orderkey, o.o_custkey, e.event_id "
        "FROM orders o ASOF JOIN ev e "
        "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts "
        "ORDER BY o.o_orderkey"
    )


def op_range_join_sql() -> str:
    return (
        "WITH bands(band, lo, hi) AS (VALUES "
        "('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0), "
        "('high', 150000.0, 300000.0), ('top', 300000.0, 1000000000.0)) "
        "SELECT band, count(*) AS n, round(sum(o_totalprice), 4) AS sum_price "
        "FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi "
        "GROUP BY band ORDER BY band"
    )


def op_semi_join_sql() -> str:
    return (
        "SELECT c_custkey, c_mktsegment FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey"
    )


def op_anti_join_sql() -> str:
    return (
        "SELECT c_custkey, c_mktsegment FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') ORDER BY c_custkey"
    )


def op_window_funcs_sql() -> str:
    return (
        "SELECT o_orderkey, o_custkey, "
        "row_number() OVER w AS rn, "
        "round(sum(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 4) AS cum_value, "
        "round(coalesce(lag(o_totalprice) OVER w, -1.0), 4) AS lag_value "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) "
        "ORDER BY o_orderkey"
    )


def op_quantiles_sql(qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    lst = "[" + ", ".join(str(q) for q in qs) + "]"
    return (
        f"SELECT CAST(unnest(qs) AS DOUBLE) AS q, round(unnest(vals), 8) AS value "
        f"FROM (SELECT quantile_disc(value, {lst}) AS vals FROM events), "
        f"(SELECT {lst} AS qs) ORDER BY q"
    )


def op_full_join_sql() -> str:
    """testdata.op_full_join twin: FULL OUTER join of the two aggregated
    sides, coalesced keys and zero-filled counts."""
    return (
        "WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer "
        "WHERE c_nationkey < 20 GROUP BY 1), "
        "s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier "
        "WHERE s_nationkey >= 5 GROUP BY 1) "
        "SELECT coalesce(c.nk, s.nk) AS nationkey, "
        "coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp "
        "FROM c FULL OUTER JOIN s ON s.nk = c.nk ORDER BY nationkey"
    )


def op_quantiles_by_sql(qs=(0.25, 0.5, 0.9)) -> str:
    """Per-group quantile_disc (joins.quantiles_by shares the ceil(n·q)
    rank rule with exact_quantiles / op_quantiles)."""
    lst = "[" + ", ".join(str(q) for q in qs) + "]"
    return (
        f"SELECT event_type, CAST(unnest(qs) AS DOUBLE) AS q, "
        f"round(unnest(vals), 8) AS value "
        f"FROM (SELECT event_type, quantile_disc(value, {lst}) AS vals "
        f"FROM events GROUP BY event_type), (SELECT {lst} AS qs) "
        f"ORDER BY event_type, q"
    )


def op_pivot_sql() -> str:
    cols = []
    for cat in ("F", "O", "P"):
        cols.append(f"count(*) FILTER (o_orderstatus = '{cat}') AS n_{cat}")
        cols.append(
            f"round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = '{cat}'), 0.0), 4)"
            f" AS sum_{cat}"
        )
    return (
        "SELECT o_orderpriority, " + ", ".join(cols) + " FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )


def op_explode_sql() -> str:
    return (
        "SELECT doc_id, CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos, "
        "unnest(toks) AS tok "
        "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) "
        "ORDER BY doc_id, pos"
    )


# ---------------------------------------------------------------------------
# document fingerprint (functions/text.py Fingerprinter) — bit-exact HUGEINT
# replica of the numpy kernel: per-token polynomial byte hash + murmur fmix64,
# then a token-level polynomial combine + fmix64.  Valid for the synthetic
# documents table (pure-ASCII, space-delimited — asserted by the kernel's
# whitespace set ∩ the data).


_Q64 = "18446744073709551616"  # 2^64
_M64 = "18446744073709551615"  # 2^64 - 1 (mask: x & _M64 == x % 2^64, x >= 0)
_M32 = "4294967296"  # 2^32
_SH33 = "8589934592"  # 2^33
_FNV_B = "1099511628211"
_MIX1 = str(0xFF51AFD7ED558CCD)
_MIX2 = str(0xC4CEB9FE1A85EC53)


def _fold_m61(y: str, m61: int = (1 << 61) - 1) -> str:
    """``y % (2^61-1)`` for 0 <= y < 2^64 without HUGEINT division:
    y ≡ (y>>61) + (y & m61) (mod m61), folded sum < m61 + 8 so one
    conditional subtract completes the reduction."""
    f = f"(({y} >> 61) + ({y} & {m61}))"
    return f"CASE WHEN {f} >= {m61} THEN {f} - {m61} ELSE {f} END"


def _mulmod64(x: str, c: str) -> str:
    """(x * c) mod 2^64 in HUGEINT without 128-bit overflow: split x into
    32-bit halves (x = a·2^32 + b): a·c mod 2^32 shifted back + b·c.
    Shift/mask forms — HUGEINT '%'/'//' are 128-bit divisions and ~10×
    slower than '&'/'>>' (measured 23→6 s on the minhash signature scan)."""
    return (
        f"((((((({x}) >> 32) * ({c})) & 4294967295) * {_M32}"
        f" + (({x}) & 4294967295) * ({c}))) & {_M64})"
    )


def _mix64_stages(src: str, keys: str, out_prefix: str) -> tuple[list[str], str]:
    """CTE chain applying murmur fmix64 to column h of CTE ``src`` (keyed
    rows); returns (ctes, final_cte_name)."""
    p = out_prefix
    xs = f"xor(h, h >> 33)"
    ctes = [
        f"{p}1 AS (SELECT {keys}, {xs} AS h FROM {src})",
        f"{p}2 AS (SELECT {keys}, {_mulmod64('h', _MIX1)} AS h FROM {p}1)",
        f"{p}3 AS (SELECT {keys}, {xs} AS h FROM {p}2)",
        f"{p}4 AS (SELECT {keys}, {_mulmod64('h', _MIX2)} AS h FROM {p}3)",
        f"{p}5 AS (SELECT {keys}, {xs} AS h FROM {p}4)",
    ]
    return ctes, f"{p}5"


def _fingerprint_ctes() -> tuple[list[str], str]:
    """CTE chain computing the UNSIGNED (HUGEINT 0..2^64-1) rolling-hash
    fingerprint per doc_id; returns (ctes, final_cte_name).  Shared by
    text_fingerprint_sql and split_by_content_sql."""
    mix_tok, tok_final = _mix64_stages("tp", "doc_id, tj", "u")
    mix_doc, doc_final = _mix64_stages("dp", "doc_id", "w")
    ctes = [
        "tk AS MATERIALIZED (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS tj, "
        "unnest(toks) AS tok, len(toks) AS ntok FROM "
        "(SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks "
        "FROM documents))",
        "mx AS (SELECT CAST(greatest(coalesce(max(len(tok)), 0), "
        "coalesce(max(ntok), 0)) AS BIGINT) AS m FROM tk)",
        f"pw(i, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        f"SELECT i + 1, (p * CAST({_FNV_B} AS HUGEINT)) & {_M64} "
        f"FROM pw, mx WHERE i < mx.m)",
        "ch AS MATERIALIZED (SELECT doc_id, tj, generate_subscripts(cs, 1) - 1 AS ci, "
        "unnest(cs) AS c, len(cs) AS m FROM "
        "(SELECT doc_id, tj, string_split(tok, '') AS cs FROM tk))",
        f"tp AS MATERIALIZED (SELECT ch.doc_id, ch.tj, "
        f"CAST(sum(CAST(ord(ch.c) AS HUGEINT) * pw.p) & {_M64} AS HUGEINT) AS h "
        f"FROM ch JOIN pw ON pw.i = ch.ci GROUP BY ch.doc_id, ch.tj)",
        *mix_tok,
        f"dp AS MATERIALIZED (SELECT t.doc_id, "
        f"CAST(sum({_mulmod64('u.h', 'pw.p')}) & {_M64} AS HUGEINT) AS h "
        f"FROM {tok_final} u JOIN tk t ON t.doc_id = u.doc_id AND t.tj = u.tj "
        f"JOIN pw ON pw.i = t.ntok - 1 - t.tj GROUP BY t.doc_id)",
        *mix_doc,
    ]
    return ctes, doc_final


def text_fingerprint_sql() -> str:
    ctes, doc_final = _fingerprint_ctes()
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        f"SELECT d.doc_id, CAST(CASE WHEN f.h IS NULL THEN 0 "
        f"WHEN f.h >= 9223372036854775808 THEN f.h - {_Q64} ELSE f.h END AS BIGINT) "
        f"AS fingerprint FROM documents d "
        f"LEFT JOIN {doc_final} f ON f.doc_id = d.doc_id ORDER BY d.doc_id"
    )


def _knuth64_full(x: str, salt: int) -> str:
    """sampling.hash_u64 for a FULL-RANGE nonneg HUGEINT expression
    (0..2^64-1): the Knuth multiply through the split ``_mulmod64`` so the
    product never overflows INT128."""
    mul = _mulmod64(f"({x})", "CAST(11400714819323198485 AS HUGEINT)")
    return (
        f"(({mul} + {salt} * CAST(14029467366897019727 AS HUGEINT)"
        f" + CAST(1609587929392839161 AS HUGEINT)) & {_M64})"
    )


def lg_wl_colors_sql(rounds: int = 3, salt: int = 0) -> str:
    """graph/metrics.wl_colors twin: 1-WL refinement with the mod-2^64
    multiset combiner — per round, m(v) = Σ_{me arcs u→v} H(c(u), 2t+salt)
    & 2^64-1 and c'(v) = H((c(v) + m(v)) & mask, 2t+1+salt), colors kept
    as nonneg HUGEINTs and wrapped to the engine's int64 view at the end."""
    ctes = ["wc0 AS MATERIALIZED (SELECT oid, CAST(0 AS HUGEINT) AS c FROM v)"]
    for t in range(rounds):
        hmsg = _knuth64_full("l.c", 2 * t + salt)
        ctes.append(
            f"wm{t} AS MATERIALIZED (SELECT me.dst AS oid, "
            f"CAST(sum({hmsg}) & {_M64} AS HUGEINT) AS m "
            f"FROM me JOIN wc{t} l ON l.oid = me.src GROUP BY me.dst)"
        )
        upd = _knuth64_full(f"(l.c + m.m) & {_M64}", 2 * t + 1 + salt)
        ctes.append(
            f"wc{t + 1} AS MATERIALIZED (SELECT l.oid, {upd} AS c "
            f"FROM wc{t} l JOIN wm{t} m ON m.oid = l.oid)"
        )
    half = "9223372036854775808"
    return (
        f"WITH {_BASE}, " + ",\n".join(ctes) + " "
        f"SELECT oid, CAST(CASE WHEN c >= {half} THEN c - {_Q64} ELSE c END "
        f"AS BIGINT) AS color FROM wc{rounds} ORDER BY oid"
    )


def _bucket_expr_u64(col: str, salt: int) -> str:
    """sampling.hash_bucket for a FULL-RANGE uint64 key column (0..2^64-1):
    the plain ``_bucket_expr`` HUGEINT multiply overflows INT128 there, so
    the Knuth multiply runs through the split-multiply ``_mulmod64``."""
    mul = _mulmod64(col, "11400714819323198485")
    return (
        f"CAST(((({mul} + {salt} * CAST(14029467366897019727 AS HUGEINT)"
        f" + CAST(1609587929392839161 AS HUGEINT)) & {_M64})"
        f" >> 33) % 1000 AS BIGINT)"
    )


def split_by_content_sql(weights=(800, 100, 100), salt: int = 7) -> str:
    """Leakage-safe train/val/test split keyed on CONTENT (the rolling-hash
    fingerprint), not row id: byte-identical docs always land in the same
    split, so exact duplicates can never straddle train and test.  Mirrors
    sampling.hash_split over functions/text.py:fingerprints."""
    ctes, doc_final = _fingerprint_ctes()
    bounds, acc = [], 0
    for w in weights[:-1]:
        acc += w
        bounds.append(acc)
    case = (
        "CASE "
        + " ".join(f"WHEN b < {b} THEN {i}" for i, b in enumerate(bounds))
        + f" ELSE {len(weights) - 1} END"
    )
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + ", "
        f"fp AS (SELECT d.doc_id, coalesce(f.h, 0) AS h FROM documents d "
        f"LEFT JOIN {doc_final} f ON f.doc_id = d.doc_id), "
        f"bk AS (SELECT doc_id, {_bucket_expr_u64('h', salt)} AS b FROM fp) "
        f"SELECT doc_id, {case} AS split FROM bk ORDER BY doc_id"
    )


# ---------------------------------------------------------------------------
# simhash candidates (functions/dedup.py SimHasher + simhash_candidates) —
# bit-exact HUGEINT replica: per-token ascending polynomial hash + fmix64
# (same kernel as the fingerprint), per-bit ±1 majority over ALL tokens
# (multiplicity kept), 4×16-bit band bucketing, bucket-min pairing.
# Valid for the synthetic documents table (ASCII, space-delimited).


def _token_hash_ctes(text_expr: str = "lower(text)") -> tuple[list[str], str]:
    """CTE chain: documents → whitespace tokens → per-token uint64 hash
    (column h of the returned CTE, keyed by doc_id, tj)."""
    mix, final = _mix64_stages("tp0", "doc_id, tj", "tu")
    ctes = [
        f"tk0 AS MATERIALIZED (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS tj, "
        f"unnest(toks) AS tok FROM "
        f"(SELECT doc_id, list_filter(string_split({text_expr}, ' '), x -> x <> '') "
        f"AS toks FROM documents))",
        "mx0 AS (SELECT CAST(coalesce(max(len(tok)), 1) AS BIGINT) AS m FROM tk0)",
        f"pw0(i, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        f"SELECT i + 1, (p * CAST({_FNV_B} AS HUGEINT)) & {_M64} "
        f"FROM pw0, mx0 WHERE i < mx0.m)",
        "ch0 AS MATERIALIZED (SELECT doc_id, tj, generate_subscripts(cs, 1) - 1 AS ci, "
        "unnest(cs) AS c FROM (SELECT doc_id, tj, string_split(tok, '') AS cs FROM tk0))",
        f"tp0 AS MATERIALIZED (SELECT doc_id, tj, "
        f"CAST(sum(CAST(ord(c) AS HUGEINT) * pw0.p) & {_M64} AS HUGEINT) AS h "
        f"FROM ch0 JOIN pw0 ON pw0.i = ch0.ci GROUP BY doc_id, tj)",
        *mix,
    ]
    return ctes, final


def text_feature_hash_sql(m: int = 1024) -> str:
    """Feature-hashing replica: the shared token-hash CTE chain, bucket =
    h & (m-1) (m a power of two), count per (doc, bucket)."""
    ctes, th = _token_hash_ctes("lower(text)")
    return (
        "WITH RECURSIVE " + ",\n".join(ctes)
        + f" SELECT doc_id, CAST(h & {m - 1} AS BIGINT) AS bucket, "
        f"count(*) AS cnt FROM {th} GROUP BY doc_id, bucket "
        "ORDER BY doc_id, bucket"
    )


def dedup_simhash_sql(bands: int = 4) -> str:
    tok_ctes, th = _token_hash_ctes("lower(text)")
    width = 64 // bands
    band_rows = ", ".join(f"({b}, {2 ** (b * width)})" for b in range(bands))
    ctes = [
        *tok_ctes,
        # powers of two for bit extraction
        "p2(i, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        "SELECT i + 1, p * 2 FROM p2 WHERE i < 63)",
        # ±1 majority per (doc, bit) over every token occurrence
        f"bv AS MATERIALIZED (SELECT t.doc_id, p2.i AS s, "
        f"sum(CASE WHEN (t.h // p2.p) % 2 = 1 THEN 1 ELSE -1 END) AS v "
        f"FROM {th} t CROSS JOIN p2 GROUP BY t.doc_id, p2.i)",
        "sh AS MATERIALIZED (SELECT bv.doc_id, "
        "CAST(sum(CASE WHEN bv.v > 0 THEN p2.p ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) "
        "AS h FROM bv JOIN p2 ON p2.i = bv.s GROUP BY bv.doc_id)",
        f"bnd(band, p) AS (VALUES {band_rows})",
        f"bucket AS MATERIALIZED (SELECT bnd.band, "
        f"(sh.h // CAST(bnd.p AS HUGEINT)) % {2 ** width} AS key, sh.doc_id "
        f"FROM sh CROSS JOIN bnd)",
        "mn AS (SELECT band, key, min(doc_id) AS m FROM bucket GROUP BY band, key)",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        "SELECT DISTINCT mn.m AS a, bucket.doc_id AS b "
        "FROM bucket JOIN mn ON mn.band = bucket.band AND mn.key = bucket.key "
        "WHERE bucket.doc_id > mn.m ORDER BY a, b"
    )


# ---------------------------------------------------------------------------
# minhash near-dup clusters (functions/dedup.py minhash_dedup_clusters) —
# bit-exact HUGEINT replica of the WHOLE pipeline: 5-byte sliding-window
# shingle hashes (descending-power polynomial + fmix64), 64 Mersenne-61
# permutations (same RandomState(1) constants as MinHasher, uint64-wraparound
# a·h+b), 16×4 band combine + fmix64, bucket-min candidate pairing, exact
# hash-set Jaccard ≥ threshold verify, connected components (recursive CTE),
# cluster = min doc of component.  Valid for ASCII documents ≥ k chars.


def _minhash_sig_band_ctes(
    k: int = 5, num_perm: int = 64, bands: int = 16, src: str = "documents"
) -> tuple[list, str]:
    """Shared CTE prefix: per-doc distinct shingle hashes (``dsh``), long-
    form minhash signatures (``sig``: doc_id, pi, s) and per-(doc, band)
    band hashes (returned final CTE) — bit-exact replicas of
    dedup.minhash_signatures + the banding kernel.  Used by
    dedup_minhash_sql and dedup_lsh_incr_sql."""
    import numpy as np

    m61 = (1 << 61) - 1
    rng = np.random.RandomState(1)
    pa_ = rng.randint(1, m61, size=num_perm, dtype=np.uint64)
    pb_ = rng.randint(0, m61, size=num_perm, dtype=np.uint64)
    bp = [pow(1099511628211, j, 1 << 64) for j in range(k)]  # B^j mod 2^64
    r = num_perm // bands
    bw_rows = ", ".join(
        f"({j}, CAST({pow(1099511628211, r - 1 - j, 1 << 64)} AS HUGEINT))" for j in range(r)
    )
    sh_terms = " + ".join(
        f"b{j} * CAST({bp[k - 1 - j]} AS HUGEINT)" for j in range(k)
    )
    leads = ", ".join(f"lead(byte, {j}) OVER w AS b{j}" for j in range(1, k))
    mix_sh, sh_final = _mix64_stages("shp", "doc_id, ci", "sm")
    mix_bh, bh_final = _mix64_stages("bpre", "doc_id, band", "bm")
    ctes = [
        "chd AS MATERIALIZED (SELECT doc_id, generate_subscripts(cs, 1) - 1 AS ci, "
        "CAST(ord(unnest(cs)) AS HUGEINT) AS byte "
        f"FROM (SELECT doc_id, string_split(text, '') AS cs FROM {src}))",
        f"ld AS MATERIALIZED (SELECT doc_id, ci, byte AS b0, {leads} FROM chd "
        f"WINDOW w AS (PARTITION BY doc_id ORDER BY ci))",
        f"shp AS MATERIALIZED (SELECT doc_id, ci, "
        f"CAST(({sh_terms}) & {_M64} AS HUGEINT) AS h FROM ld WHERE b{k - 1} IS NOT NULL)",
        *mix_sh,
        f"dsh AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM {sh_final})",
        # a < 2^61 ⇒ h·a + b < 2^126 fits HUGEINT directly (no split-multiply);
        # 64 min-aggregates in ONE scan of the distinct-shingle table, then
        # UNPIVOT back to long form — ~5× cheaper than the 9.5M-row
        # CROSS JOIN + split-mulmod formulation on the same data.  mod 2^64 is
        # a mask and mod m61=2^61-1 a shift-fold (y≡(y>>61)+(y&m61), one
        # conditional subtract) — HUGEINT '%' is 128-bit division, ~13× slower
        # than the mask+fold form (measured 23→1.8 s on this CTE at sf0.01).
        f"sigw AS MATERIALIZED (SELECT doc_id, "
        + ", ".join(
            "min(%s) AS s%d"
            % (_fold_m61(f"((h * CAST({int(pa_[p])} AS HUGEINT) + {int(pb_[p])}) & {_M64})"), p)
            for p in range(num_perm)
        )
        + " FROM dsh GROUP BY doc_id)",
        f"sig AS MATERIALIZED (SELECT doc_id, CAST(substr(pi, 2) AS INT) AS pi, "
        f"CAST(s AS HUGEINT) AS s FROM (UNPIVOT sigw ON "
        + ", ".join(f"s{p}" for p in range(num_perm))
        + " INTO NAME pi VALUE s))",
        f"bw(j, p) AS (VALUES {bw_rows})",
        # s < 2^61, p < 2^64 ⇒ direct product < 2^125, no split needed
        f"bpre AS MATERIALIZED (SELECT doc_id, pi // {r} AS band, "
        f"CAST(sum((sig.s * bw.p) & {_M64}) & {_M64} AS HUGEINT) AS h "
        f"FROM sig JOIN bw ON bw.j = pi % {r} GROUP BY doc_id, pi // {r})",
        *mix_bh,
    ]
    return ctes, bh_final


def dedup_minhash_sql(
    k: int = 5, num_perm: int = 64, bands: int = 16, threshold: float = 0.7
) -> str:
    ctes, bh_final = _minhash_sig_band_ctes(k=k, num_perm=num_perm, bands=bands)
    ctes = ctes + [
        f"mnb AS (SELECT band, h, min(doc_id) AS m FROM {bh_final} GROUP BY band, h)",
        f"cand AS MATERIALIZED (SELECT DISTINCT mnb.m AS a, t.doc_id AS b "
        f"FROM {bh_final} t JOIN mnb ON mnb.band = t.band AND mnb.h = t.h "
        f"WHERE t.doc_id > mnb.m)",
        "sz AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id)",
        "inter AS (SELECT c.a, c.b, count(*) AS i FROM cand c "
        "JOIN dsh x ON x.doc_id = c.a JOIN dsh y ON y.doc_id = c.b AND y.h = x.h "
        "GROUP BY c.a, c.b)",
        f"ver AS MATERIALIZED (SELECT c.a, c.b FROM cand c "
        f"JOIN sz sa ON sa.doc_id = c.a JOIN sz sb ON sb.doc_id = c.b "
        f"LEFT JOIN inter ON inter.a = c.a AND inter.b = c.b "
        f"WHERE CAST(coalesce(inter.i, 0) AS DOUBLE) "
        f"/ (sa.n + sb.n - coalesce(inter.i, 0)) >= {threshold})",
        "vv AS (SELECT a AS d FROM ver UNION SELECT b FROM ver)",
        "ee AS (SELECT a AS u, b AS v FROM ver UNION SELECT b, a FROM ver)",
        "reach(rv, c) AS (SELECT d, d FROM vv UNION "
        "SELECT e.v, rc.c FROM reach rc JOIN ee e ON e.u = rc.rv)",
        "comp AS (SELECT rv AS d, min(c) AS cl FROM reach GROUP BY rv)",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        "SELECT doc.doc_id, CAST(coalesce(comp.cl, doc.doc_id) AS BIGINT) AS cluster "
        "FROM documents doc LEFT JOIN comp ON comp.d = doc.doc_id ORDER BY doc.doc_id"
    )


# ---------------------------------------------------------------------------
# ML-prep operators (functions/mlprep.py)


def text_tokens_bpe_sql() -> str:
    """Same RE2 regex as functions/text.py BPE_PRETOKEN_RE (DuckDB's regexp
    engine is RE2 too, so count semantics are identical by construction)."""
    from graphscope_ray.functions.text import BPE_PRETOKEN_RE

    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return (
        f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) "
        "AS n_tokens FROM documents ORDER BY doc_id"
    )


def text_tfidf_sql() -> str:
    return (
        "WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), "
        "x -> x <> '')) AS tok FROM documents), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents) "
        "SELECT tf.doc_id, tf.tok, tf.tf, "
        "round(tf.tf * ln(nn.n / df.df), 8) AS tfidf "
        "FROM tf JOIN df USING (tok), nn ORDER BY tf.doc_id, tf.tok"
    )


def text_ppmi_sql(window: int = 2, min_count: int = 5) -> str:
    """mlprep.cooccurrence_ppmi twin: ordered same-doc token pairs within
    ``window`` positions (single-space token positions, empties pair into
    nothing), marginals over the aggregated pair table, ppmi rounded 8dp."""
    return (
        "WITH tok AS MATERIALIZED (SELECT doc_id, generate_subscripts(ts, 1) AS i, "
        "unnest(ts) AS w FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)), "
        f"pairs AS (SELECT a.w AS w, b.w AS c FROM tok a JOIN tok b "
        f"ON b.doc_id = a.doc_id AND b.i BETWEEN a.i - {window} AND a.i + {window} "
        "AND b.i <> a.i WHERE a.w <> '' AND b.w <> ''), "
        "pcnt AS MATERIALIZED (SELECT w, c, count(*) AS n FROM pairs GROUP BY w, c), "
        "mw AS (SELECT w, sum(n) AS nw FROM pcnt GROUP BY w), "
        "mc AS (SELECT c, sum(n) AS nc FROM pcnt GROUP BY c), "
        "tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM pcnt) "
        "SELECT pcnt.w, pcnt.c, CAST(pcnt.n AS BIGINT) AS n, "
        "round(greatest(ln(tot.N * pcnt.n / (mw.nw * mc.nc)), 0), 8) AS ppmi "
        "FROM pcnt JOIN mw USING (w) JOIN mc USING (c), tot "
        f"WHERE pcnt.n >= {min_count} ORDER BY w, c"
    )


def text_pii_sql() -> str:
    """functions/text.pii_scan twin: the SAME alternation-free patterns
    (PII_COUNT_PATTERNS), counted with DuckDB's RE2 — leftmost-longest and
    Python's leftmost-first agree because the patterns have no
    alternation."""
    from graphscope_ray.functions.text import PII_COUNT_PATTERNS

    # DuckDB single-quoted literals are RAW (no backslash processing) —
    # only quotes need doubling; the pattern bytes pass through verbatim
    cols = ", ".join(
        f"len(regexp_extract_all(text, '{pat.replace(chr(39), chr(39) * 2)}')) AS {name}"
        for name, pat in PII_COUNT_PATTERNS.items()
    )
    return f"SELECT doc_id, {cols} FROM documents ORDER BY doc_id"


def text_redact_sql() -> str:
    """functions/text.pii_redact twin: regexp_replace chain in the same
    fixed pattern order with 'g' (all occurrences)."""
    from graphscope_ray.functions.text import PII_COUNT_PATTERNS, PII_PLACEHOLDERS

    expr = "text"
    for name, pat in PII_COUNT_PATTERNS.items():
        lit = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', '{PII_PLACEHOLDERS[name]}', 'g')"
    return f"SELECT doc_id, {expr} AS text_redacted FROM documents ORDER BY doc_id"


def dedup_keep_best_sql() -> str:
    """functions/dedup.keep_best_dedup twin: group by sha256 of the CCNet
    normalization (text_norm's exact expression), keep the longest
    ORIGINAL text (ties → min doc_id), with the copy count."""
    return (
        "WITH c AS (SELECT doc_id, "
        "sha256(trim(regexp_replace(regexp_replace(regexp_replace("
        "lower(text), '[0-9]', '0', 'g'), '[^a-z0\\s]', ' ', 'g'), "
        "'\\s+', ' ', 'g'))) AS sha, len(text) AS q FROM documents) "
        "SELECT sha AS text_sha256, doc_id AS kept_doc_id, q AS quality, "
        "CAST(cnt AS BIGINT) AS n_copies FROM "
        "(SELECT *, count(*) OVER (PARTITION BY sha) AS cnt, "
        "row_number() OVER (PARTITION BY sha ORDER BY q DESC, doc_id) AS rk FROM c) "
        "WHERE rk = 1 ORDER BY 1"
    )


def text_ttr_sql() -> str:
    """functions/text.type_token_ratio twin: whitespace tokens, distinct
    types, one division."""
    return (
        "WITH c AS (SELECT doc_id, "
        "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks "
        "FROM documents) "
        "SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_tokens, "
        "CAST(length(list_distinct(toks)) AS BIGINT) AS n_types, "
        "round(CASE WHEN length(toks) > 0 "
        "THEN length(list_distinct(toks)) * 1.0 / length(toks) ELSE 0.0 END, 8) AS ttr "
        "FROM c ORDER BY doc_id"
    )


def text_lang_mix_sql() -> str:
    """Language-mixture audit twin: the langid SQL joined to the token
    counts, rolled up per predicted language."""
    return (
        f"WITH L AS ({text_langid_sql()}), T AS ({text_tokens_sql()}) "
        "SELECT L.lang_pred, count(*) AS n_docs, sum(T.n_tokens) AS n_tokens "
        "FROM L JOIN T ON T.doc_id = L.doc_id GROUP BY 1 ORDER BY 1"
    )


def corpus_funnel_sql() -> str:
    """__ray_entry__._q_corpus_funnel twin: per-stage survivor counts with
    the UNROUNDED quality expression (identical float arithmetic to the
    engine's quality_score, so the ≥0.7 compare is bit-stable)."""
    stages = {
        "1_raw": "TRUE",
        "2_dedup": "dk",
        "3_quality": "dk AND q >= 0.7",
        "4_english": "dk AND q >= 0.7 AND lang_pred = 'en'",
    }
    sels = " UNION ALL ".join(
        f"SELECT '{name}' AS stage, count(*) AS n_docs, "
        f"CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens FROM f WHERE {cond}"
        for name, cond in stages.items()
    )
    return (
        "WITH tok AS MATERIALIZED (SELECT doc_id, "
        "CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) "
        "AS n_tokens FROM documents), "
        "kept AS MATERIALIZED (SELECT doc_id FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "qs AS MATERIALIZED (SELECT doc_id, "
        "0.4 * (CASE WHEN chars >= 50 AND chars <= 100000 THEN 1 ELSE 0 END) "
        "+ 0.4 * (CASE WHEN chars > 0 THEN alpha / chars ELSE 0 END) "
        "+ 0.2 * (CASE WHEN words > 0 AND chars/words >= 3 AND chars/words <= 12 THEN 1 ELSE 0 END) "
        "AS q FROM (SELECT doc_id, CAST(length(text) AS DOUBLE) AS chars, "
        "CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE) AS words, "
        "CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha FROM documents)), "
        f"L AS MATERIALIZED ({text_langid_sql()}), "
        "f AS MATERIALIZED (SELECT t.doc_id, t.n_tokens, "
        "(k.doc_id IS NOT NULL) AS dk, q.q, L.lang_pred "
        "FROM tok t LEFT JOIN kept k ON k.doc_id = t.doc_id "
        "JOIN qs q ON q.doc_id = t.doc_id JOIN L ON L.doc_id = t.doc_id) "
        + sels
    )


def text_readability_sql() -> str:
    """functions/text.readability twin: the same three regex counts and
    the same float expressions (word/sentence/vowel-group runs)."""
    return (
        "WITH c AS (SELECT doc_id, "
        "len(regexp_extract_all(text, '\\S+')) AS w, "
        "len(regexp_extract_all(text, '[.!?]+')) AS s, "
        "len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS y FROM documents) "
        "SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables, "
        "round(CASE WHEN w > 0 AND s > 0 "
        "THEN 206.835 - 1.015 * (w * 1.0 / s) - 84.6 * (y * 1.0 / w) "
        "ELSE 0.0 END, 8) AS flesch_ease, "
        "round(CASE WHEN w > 0 AND s > 0 "
        "THEN 0.39 * (w * 1.0 / s) + 11.8 * (y * 1.0 / w) - 15.59 "
        "ELSE 0.0 END, 8) AS fk_grade "
        "FROM c ORDER BY doc_id"
    )


def dedup_decontaminate_sql(n: int = 8) -> str:
    """functions/dedup.decontaminate twin: train (doc_id%10≠0) docs sharing
    any word 8-gram with the test split (doc_id%10==0); count of distinct
    contaminated train-side grams per doc."""
    joins = " ".join(
        f"JOIN tok t{i} ON t{i}.doc_id = t1.doc_id AND t{i}.i = t1.i + {i - 1}"
        for i in range(2, n + 1)
    )
    gram = " || ' ' || ".join(f"t{i}.tok" for i in range(1, n + 1))
    return (
        "WITH tok AS MATERIALIZED (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS i, "
        "unnest(toks) AS tok FROM "
        "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents)), "
        f"g8 AS MATERIALIZED (SELECT t1.doc_id, {gram} AS g FROM tok t1 {joins}), "
        "trg AS MATERIALIZED (SELECT DISTINCT doc_id, g FROM g8 WHERE doc_id % 10 <> 0), "
        "teg AS MATERIALIZED (SELECT DISTINCT g FROM g8 WHERE doc_id % 10 = 0) "
        "SELECT trg.doc_id, count(*) AS n_contaminated FROM trg "
        "JOIN teg ON teg.g = trg.g GROUP BY 1 ORDER BY 1"
    )


def text_gopher_sql() -> str:
    """functions/text.gopher_repetition twin: Gopher §A1.1 repetition
    signals — duplicate-line fraction / duplicate-line character fraction
    (lines split on \\n), top-bigram character fraction (tokens split
    on ' ', ties → smallest (w1, w2)), and duplicated-5-gram coverage
    fraction (union of token positions inside any ≥2× 5-gram); exact
    integer counts, one division, round 8."""
    return (
        "WITH lines AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, chr(10))) AS line "
        "FROM documents), "
        "lg AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2), "
        "lstat AS MATERIALIZED (SELECT doc_id, sum(c) AS nl, sum(c - 1) AS nd, "
        "sum(len(line) * c) AS ch, sum(len(line) * (c - 1)) AS chd FROM lg GROUP BY 1), "
        "tok AS MATERIALIZED (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS i, "
        "unnest(toks) AS tok FROM "
        "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents)), "
        "tchars AS (SELECT doc_id, sum(len(tok)) AS tc FROM tok GROUP BY 1), "
        "bg AS (SELECT t1.doc_id, t1.tok AS w1, t2.tok AS w2, count(*) AS n "
        "FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 "
        "GROUP BY 1, 2, 3), "
        "top AS (SELECT doc_id, w1, w2, n FROM "
        "(SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, w1, w2) AS rk "
        "FROM bg) WHERE rk = 1), "
        "g5 AS MATERIALIZED (SELECT t1.doc_id, t1.i, "
        "t1.tok || ' ' || t2.tok || ' ' || t3.tok || ' ' || t4.tok || ' ' || t5.tok AS k "
        "FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 "
        "JOIN tok t3 ON t3.doc_id = t1.doc_id AND t3.i = t1.i + 2 "
        "JOIN tok t4 ON t4.doc_id = t1.doc_id AND t4.i = t1.i + 3 "
        "JOIN tok t5 ON t5.doc_id = t1.doc_id AND t5.i = t1.i + 4), "
        "dupg AS (SELECT doc_id, k FROM g5 GROUP BY 1, 2 HAVING count(*) > 1), "
        "cov AS (SELECT DISTINCT g5.doc_id, g5.i + u.s AS pos FROM g5 "
        "JOIN dupg ON dupg.doc_id = g5.doc_id AND dupg.k = g5.k, "
        "LATERAL (SELECT unnest(generate_series(0, 4)) AS s) u), "
        "cm AS (SELECT c.doc_id, sum(len(t.tok)) AS cm FROM cov c "
        "JOIN tok t ON t.doc_id = c.doc_id AND t.i = c.pos GROUP BY 1) "
        "SELECT l.doc_id, "
        "round(CASE WHEN l.nl > 0 THEN l.nd * 1.0 / l.nl ELSE 0.0 END, 8) AS dup_line_frac, "
        "round(CASE WHEN l.ch > 0 THEN l.chd * 1.0 / l.ch ELSE 0.0 END, 8) AS dup_line_char_frac, "
        "round(coalesce(t.n * (len(t.w1) + len(t.w2)) * 1.0 / nullif(tc.tc, 0), 0.0), 8) "
        "AS top_bigram_char_frac, "
        "round(coalesce(cm.cm * 1.0 / nullif(tc.tc, 0), 0.0), 8) AS dup_5gram_char_frac "
        "FROM lstat l LEFT JOIN top t ON t.doc_id = l.doc_id "
        "LEFT JOIN tchars tc ON tc.doc_id = l.doc_id "
        "LEFT JOIN cm ON cm.doc_id = l.doc_id ORDER BY l.doc_id"
    )


def text_bigrams_sql() -> str:
    return (
        "WITH tok AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS i, "
        "unnest(toks) AS tok FROM "
        "(SELECT doc_id, string_split(text, ' ') AS toks FROM documents)) "
        "SELECT t1.tok || ' ' || t2.tok AS bigram, count(*) AS n "
        "FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.i = t1.i + 1 "
        "GROUP BY bigram ORDER BY bigram"
    )


def op_zscore_sql() -> str:
    return (
        "SELECT event_id, event_type, "
        "round(CASE WHEN stddev_pop(value) OVER w > 0 "
        "THEN (value - avg(value) OVER w) / stddev_pop(value) OVER w ELSE 0.0 END, 8) AS z "
        "FROM events WINDOW w AS (PARTITION BY event_type) ORDER BY event_id"
    )


def op_kmeans_sql(k: int = 8, iters: int = 5) -> str:
    """Unrolled Lloyd's: per iteration a distance CTE (point × centroid ×
    dim sum), argmin assignment with min-cid tie-break, per-(cid, dim)
    means with empty-centroid carry-over — same semantics as mlprep.kmeans."""
    ctes = [
        "pts AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d, "
        "CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)",
        f"seed AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid "
        f"FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}))",
        "c0 AS MATERIALIZED (SELECT s.cid, p.d, p.x FROM seed s "
        "JOIN pts p ON p.vec_id = s.vec_id)",
    ]
    for t in range(iters):
        ctes.append(
            f"dist{t} AS MATERIALIZED (SELECT p.vec_id, c.cid, "
            f"sum((p.x - c.x) * (p.x - c.x)) AS d2 "
            f"FROM pts p JOIN c{t} c ON c.d = p.d GROUP BY p.vec_id, c.cid)"
        )
        ctes.append(
            f"asg{t} AS MATERIALIZED (SELECT vec_id, cid FROM "
            f"(SELECT vec_id, cid, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM dist{t}) WHERE rk = 1)"
        )
        ctes.append(
            f"nu{t} AS (SELECT a.cid, p.d, avg(p.x) AS x FROM asg{t} a "
            f"JOIN pts p ON p.vec_id = a.vec_id GROUP BY a.cid, p.d)"
        )
        ctes.append(
            f"c{t + 1} AS MATERIALIZED (SELECT c.cid, c.d, coalesce(nu.x, c.x) AS x "
            f"FROM c{t} c LEFT JOIN nu{t} nu ON nu.cid = c.cid AND nu.d = c.d)"
        )
    ctes.append(
        f"distF AS (SELECT p.vec_id, c.cid, sum((p.x - c.x) * (p.x - c.x)) AS d2 "
        f"FROM pts p JOIN c{iters} c ON c.d = p.d GROUP BY p.vec_id, c.cid)"
    )
    return (
        "WITH " + ",\n".join(ctes) + " "
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM "
        "(SELECT vec_id, cid, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY d2, cid) AS rk FROM distF) "
        "WHERE rk = 1 ORDER BY vec_id"
    )


def pg_pagerank_sql(rounds: int = 10, alpha: float = 0.85) -> str:
    """Property-graph PageRank over the labeled union graph: vertices =
    ALL keys of the three tables (dense spaces — isolated keys dangle),
    unrolled NetworkX rounds."""
    ctes = [
        "pgv AS MATERIALIZED (SELECT c_custkey AS gv FROM customer "
        "UNION ALL SELECT o_orderkey + (SELECT n FROM nc) FROM orders "
        "UNION ALL SELECT p_partkey + (SELECT n FROM nc) + (SELECT n FROM nor) FROM part)",
        "npg AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pgv)",
        "pod AS MATERIALIZED (SELECT src AS gv, count(*) AS d FROM pe GROUP BY src)",
        "q0 AS MATERIALIZED (SELECT gv, 1.0/(SELECT n FROM npg) AS score FROM pgv)",
    ]
    for k in range(rounds):
        ctes.append(
            f"dg{k} AS MATERIALIZED (SELECT coalesce(sum(q.score), 0) AS ds FROM q{k} q "
            f"LEFT JOIN pod o ON o.gv = q.gv WHERE o.d IS NULL)"
        )
        ctes.append(
            f"sm{k} AS MATERIALIZED (SELECT pe.dst AS gv, sum(q.score / o.d) AS insum "
            f"FROM pe JOIN q{k} q ON q.gv = pe.src JOIN pod o ON o.gv = pe.src "
            f"GROUP BY pe.dst)"
        )
        ctes.append(
            f"q{k + 1} AS MATERIALIZED (SELECT v.gv, {alpha}*coalesce(s.insum, 0) + "
            f"({alpha}*(SELECT ds FROM dg{k}) + {1 - alpha:.2f})/(SELECT n FROM npg) AS score "
            f"FROM pgv v LEFT JOIN sm{k} s ON s.gv = v.gv)"
        )
    return (
        f"WITH {_PG_BASE}, " + ",\n".join(ctes)
        + f" SELECT {_PG_SPLIT}, round(score, 8) AS score FROM q{rounds} "
        "ORDER BY v_label, v_key"
    )


# ---------------------------------------------------------------------------
# cardinality operators (functions/sketch.py)


def op_count_distinct_sql() -> str:
    return (
        "SELECT count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps FROM lineitem"
    )


def _mix64_expr_ctes(src: str, key: str) -> tuple[list[str], str]:
    """fmix64 stage chain over column h of ``src`` keyed by a plain row id."""
    xs = f"xor(h, h >> 33)"
    ctes = [
        f"x1 AS (SELECT {key}, {xs} AS h FROM {src})",
        f"x2 AS (SELECT {key}, {_mulmod64('h', _MIX1)} AS h FROM x1)",
        f"x3 AS (SELECT {key}, {xs} AS h FROM x2)",
        f"x4 AS (SELECT {key}, {_mulmod64('h', _MIX2)} AS h FROM x3)",
        f"x5 AS (SELECT {key}, {xs} AS h FROM x4)",
    ]
    return ctes, "x5"


def op_hll_count_sql(p: int = 12) -> str:
    """Bit-exact SQL replica of sketch.hll_count over l_partkey: fmix64 of
    the int64 value, bucket = top p bits, rho = CLZ of the low 64-p bits
    shifted up (computed EXACTLY via bin()-string length), per-bucket max,
    bias-corrected harmonic estimate with the linear-counting small-range
    branch."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    low = f"{1 << (64 - p)}"  # 2^(64-p)
    mix, final = _mix64_expr_ctes("h0", "r")
    ctes = [
        "h0 AS MATERIALIZED (SELECT row_number() OVER () AS r, "
        "CAST(l_partkey AS HUGEINT) AS h FROM lineitem)",
        *mix,
        f"rr AS MATERIALIZED (SELECT h // CAST({low} AS HUGEINT) AS bucket, "
        f"64 - length(bin((h % CAST({low} AS HUGEINT)) * CAST({1 << p} AS HUGEINT) "
        f"+ {(1 << p) - 1})) + 1 AS rho FROM {final})",
        f"regs AS (SELECT b.range AS bucket, coalesce(mx.rho, 0) AS reg "
        f"FROM range({m}) b LEFT JOIN "
        f"(SELECT bucket, max(rho) AS rho FROM rr GROUP BY bucket) mx "
        f"ON mx.bucket = b.range)",
        f"est AS (SELECT CAST({alpha} AS DOUBLE) * {m} * {m} / sum(power(2.0, -reg)) AS e, "
        f"sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS z FROM regs)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + " "
        f"SELECT round(CASE WHEN e <= {2.5 * m} AND z > 0 "
        f"THEN {m} * ln({m} / z) ELSE e END, 4) AS estimate FROM est"
    )


def lg_kcore_size_sql(k: int = 5) -> str:
    """k-core size (flash k-core-search GlobalRes) over the kcore peel."""
    inner = lg_kcore_sql(k=k)
    return (
        f"SELECT CAST(sum(in_core) AS BIGINT) AS core_size FROM ({inner})"
    )


def op_cms_heavy_sql(d: int = 4, w: int = 2048, threshold: int = 100) -> str:
    """Bit-exact SQL replica of sketch.cms_heavy_hitters: per-token-instance
    fmix64(h + (i+1)·φ64) buckets per row i, per-(row, bucket) counts, and
    min-over-rows estimates for the distinct-token candidate set."""
    phi = str(0x9E3779B97F4A7C15)
    tok_ctes, th = _token_hash_ctes("lower(text)")
    ivals = ", ".join(f"({i})" for i in range(d))
    mix_b, bfin = _mix64_stages("hb0", "doc_id, tj, i", "hb")
    mix_c, cfin = _mix64_stages("cb0", "tok, i", "cb")
    ctes = [
        *tok_ctes,
        f"iv(i) AS (VALUES {ivals})",
        f"hb0 AS MATERIALIZED (SELECT doc_id, tj, iv.i, "
        f"(h + (iv.i + 1) * CAST({phi} AS HUGEINT)) & {_M64} AS h "
        f"FROM {th} CROSS JOIN iv)",
        *mix_b,
        f"bk AS MATERIALIZED (SELECT i, h % {w} AS bucket, count(*) AS c "
        f"FROM {bfin} GROUP BY i, h % {w})",
        f"cand AS MATERIALIZED (SELECT DISTINCT t.tok, u.h "
        f"FROM tk0 t JOIN {th} u ON u.doc_id = t.doc_id AND u.tj = t.tj)",
        f"cb0 AS (SELECT tok, iv.i, "
        f"(h + (iv.i + 1) * CAST({phi} AS HUGEINT)) & {_M64} AS h "
        f"FROM cand CROSS JOIN iv)",
        *mix_c,
        f"cest AS (SELECT cbx.tok, min(coalesce(bk.c, 0)) AS est "
        f"FROM (SELECT tok, i, h % {w} AS bucket FROM {cfin}) cbx "
        f"LEFT JOIN bk ON bk.i = cbx.i AND bk.bucket = cbx.bucket GROUP BY cbx.tok)",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        f"SELECT tok, CAST(est AS BIGINT) AS est FROM cest "
        f"WHERE est >= {threshold} ORDER BY tok"
    )


def op_profile_sql(cols=("l_quantity", "l_extendedprice", "l_discount", "l_tax")) -> str:
    parts = [
        f'SELECT \'{c}\' AS "column", count(*) AS n, '
        f"count(*) - count({c}) AS n_null, "
        f"round(min({c}), 8) AS min, round(max({c}), 8) AS max, "
        f"round(sum({c}) / count({c}), 8) AS mean FROM lineitem"
        for c in sorted(cols)
    ]
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


def events_funnel_sql(steps=("view", "click", "purchase")) -> str:
    ctes = [
        f"f1 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"f{i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN f{i} ON f{i}.user_id = e.user_id AND e.ts > f{i}.t "
            f"WHERE e.event_type = '{steps[i]}' GROUP BY e.user_id)"
        )
    case = "CASE " + " ".join(
        f"WHEN f{k}.t IS NOT NULL THEN {k}" for k in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    joins = " ".join(
        f"LEFT JOIN f{k} ON f{k}.user_id = u.user_id" for k in range(1, len(steps) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + " "
        f"SELECT u.user_id, {case} AS steps "
        f"FROM (SELECT DISTINCT user_id FROM events) u {joins} ORDER BY u.user_id"
    )


def op_rollup_sql() -> str:
    return (
        "SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority, "
        "coalesce(o_orderstatus, 'ALL') AS o_orderstatus, "
        "count(*) AS n, round(sum(o_totalprice), 4) AS sum_price "
        "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus) "
        "ORDER BY o_orderpriority, o_orderstatus"
    )


def op_left_join_sql() -> str:
    return (
        "SELECT c.c_custkey, count(o.o_orderkey) AS n_orders, "
        "round(coalesce(sum(o.o_totalprice), 0.0), 4) AS spend "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey ORDER BY c.c_custkey"
    )


def lg_induced_subgraph_sql(max_oid: int = 100) -> str:
    return (
        f"WITH {_BASE} SELECT src, dst FROM e "
        f"WHERE src < {max_oid} AND dst < {max_oid} ORDER BY src, dst"
    )


_BINV = "14886173955864302971"  # _FNV_B^-1 mod 2^64 (B is odd => invertible)


def _window_hash_ctes(k: int) -> tuple[list[str], str]:
    """CTE chain computing the UNSIGNED (HUGEINT 0..2^64-1) rolling hash of
    every length-k char window (stride 1) per doc: final CTE has
    (doc_id, i, h) — bit-exact twin of hashing.shingle_hashes, incl. the
    whole-text fallback for docs shorter than k.  Shared by
    dedup_substring_sql and text_winnow_sql.

    The engine hashes window [i, i+L) with polynomial weights B^(L-1-j) +
    fmix64 (hashing.shingle_hashes).  O(n·k) per-window sums are avoided
    with the prefix trick: with whole-doc decreasing weights B^(n-1-j),
    P(i+L) - P(i) == H(i) · B^(n-i-L)  (mod 2^64); B is odd, hence
    invertible mod 2^64, so H(i) = diff · Binv^(n-i-L).  Valid for the
    pure-ASCII synthetic documents table (ord(c) == utf-8 byte)."""
    mix, hfinal = _mix64_stages("h0", "doc_id, i", "sm")
    diff = (
        f"(CASE WHEN pend >= pbeg THEN pend - pbeg "
        f"ELSE pend - pbeg + CAST({_Q64} AS HUGEINT) END)"
    )
    ctes = [
        f"doc AS (SELECT doc_id, length(text) AS n FROM documents "
        f"WHERE length(text) > 0)",
        "ch AS MATERIALIZED (SELECT doc_id, n, generate_subscripts(cs, 1) - 1 AS ci, "
        "unnest(cs) AS c FROM (SELECT doc_id, length(text) AS n, "
        "string_split(text, '') AS cs FROM documents WHERE length(text) > 0))",
        "mx AS (SELECT CAST(coalesce(max(n), 1) AS BIGINT) AS m FROM doc)",
        f"pw(i, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        f"SELECT i + 1, (p * CAST({_FNV_B} AS HUGEINT)) & {_M64} "
        f"FROM pw, mx WHERE i < mx.m)",
        f"pwi(i, p) AS (SELECT 0, CAST(1 AS HUGEINT) UNION ALL "
        f"SELECT i + 1, {_mulmod64('p', _BINV)} FROM pwi, mx WHERE i < mx.m)",
        f"term AS MATERIALIZED (SELECT ch.doc_id, ch.ci, ch.n, "
        f"((CAST(ord(ch.c) AS HUGEINT) * pw.p) & {_M64}) AS t "
        f"FROM ch JOIN pw ON pw.i = ch.n - 1 - ch.ci)",
        f"pre AS MATERIALIZED (SELECT doc_id, ci, n, (sum(t) OVER "
        f"(PARTITION BY doc_id ORDER BY ci ROWS UNBOUNDED PRECEDING)) & {_M64} "
        f"AS ps FROM term)",
        f"pos AS (SELECT doc_id, n, least({k}, n) AS L, ci AS i FROM pre "
        f"WHERE ci <= n - least({k}, n))",
        "win AS MATERIALIZED (SELECT p.doc_id, p.i, p.n, p.L, pe.ps AS pend, "
        "coalesce(pb.ps, CAST(0 AS HUGEINT)) AS pbeg FROM pos p "
        "JOIN pre pe ON pe.doc_id = p.doc_id AND pe.ci = p.i + p.L - 1 "
        "LEFT JOIN pre pb ON pb.doc_id = p.doc_id AND pb.ci = p.i - 1)",
        f"h0 AS MATERIALIZED (SELECT w.doc_id, w.i, {_mulmod64(diff, 'pwi.p')} AS h "
        f"FROM win w JOIN pwi ON pwi.i = w.n - w.i - w.L)",
        *mix,
    ]
    return ctes, hfinal


def dedup_substring_sql(k: int = 40) -> str:
    """Bit-exact HUGEINT replica of functions/dedup.py:substring_dup_stats
    (ExactSubstr-style duplicate length-k char windows, stride 1) — window
    hashing via the shared `_window_hash_ctes` prefix."""
    prefix, hfinal = _window_hash_ctes(k)
    ctes = [
        *prefix,
        f"occ AS (SELECT doc_id, h FROM {hfinal})",
        "tt AS (SELECT h, count(*) AS tot FROM occ GROUP BY h)",
        "nd AS (SELECT o.doc_id, count(*) AS n_dup FROM occ o "
        "JOIN tt ON tt.h = o.h WHERE tt.tot >= 2 GROUP BY o.doc_id)",
        f"base AS (SELECT doc_id, n - least({k}, n) + 1 AS n_windows FROM doc)",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        "SELECT b.doc_id, CAST(b.n_windows AS BIGINT) AS n_windows, "
        "CAST(coalesce(nd.n_dup, 0) AS BIGINT) AS n_dup, "
        "round(CAST(coalesce(nd.n_dup, 0) AS DOUBLE) / b.n_windows, 8) AS dup_frac "
        "FROM base b LEFT JOIN nd USING (doc_id) ORDER BY b.doc_id"
    )


def text_winnow_sql(k: int = 5, w: int = 4) -> str:
    """Bit-exact HUGEINT replica of functions/text.py:winnow_fingerprints
    (MOSS winnowing, Schleimer et al. SIGMOD'03): over the per-position
    k-gram hashes (shared `_window_hash_ctes` prefix), every window of w
    consecutive hashes selects its RIGHTMOST minimal hash; output = the
    DISTINCT selected (doc_id, pos, fingerprint) triples.  Docs with fewer
    than w hashes form one window of all their hashes (least(w, nh))."""
    half = "9223372036854775808"
    prefix, hfinal = _window_hash_ctes(k)
    ctes = [
        *prefix,
        f"occ AS MATERIALIZED (SELECT doc_id, i, h FROM {hfinal})",
        "cnt AS (SELECT doc_id, count(*) AS nh FROM occ GROUP BY doc_id)",
        f"st AS (SELECT o.doc_id, o.i AS s, least({w}, c.nh) AS wd "
        f"FROM occ o JOIN cnt c USING (doc_id) "
        f"WHERE o.i <= c.nh - least({w}, c.nh))",
        "exp AS MATERIALIZED (SELECT s.doc_id, s.s, o.i, o.h FROM st s "
        "JOIN occ o ON o.doc_id = s.doc_id AND o.i >= s.s AND o.i < s.s + s.wd)",
        "wmn AS (SELECT doc_id, s, min(h) AS mn FROM exp GROUP BY doc_id, s)",
        "sel AS (SELECT e.doc_id, max(e.i) AS pos, m.mn AS h FROM exp e "
        "JOIN wmn m ON m.doc_id = e.doc_id AND m.s = e.s AND e.h = m.mn "
        "GROUP BY e.doc_id, e.s, m.mn)",
        "fp AS (SELECT DISTINCT doc_id, pos, h FROM sel)",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        f"SELECT doc_id, CAST(pos AS BIGINT) AS pos, "
        f"CAST(CASE WHEN h >= {half} THEN h - {_Q64} ELSE h END AS BIGINT) "
        f"AS fingerprint FROM fp ORDER BY doc_id, pos"
    )


def text_charlm_sql() -> str:
    """Replica of functions/text.py:charlm_xent — in-corpus add-one char
    bigram LM, per-doc mean negative log-likelihood, round(8).  Pure-ASCII
    caveat as elsewhere (SQL chars == utf-8 bytes)."""
    return (
        "WITH ch AS MATERIALIZED (SELECT doc_id, generate_subscripts(cs, 1) - 1 AS ci, "
        "unnest(cs) AS c FROM (SELECT doc_id, string_split(text, '') AS cs "
        "FROM documents WHERE length(text) > 0)), "
        "bg AS MATERIALIZED (SELECT a.doc_id, a.c AS ca, b.c AS cb FROM ch a "
        "JOIN ch b ON b.doc_id = a.doc_id AND b.ci = a.ci + 1), "
        "cab AS (SELECT ca, cb, count(*) AS cnt FROM bg GROUP BY ca, cb), "
        "crow AS (SELECT ca, sum(cnt) AS tot FROM cab GROUP BY ca), "
        "v AS (SELECT count(DISTINCT c) AS nv FROM ch), "
        "lp AS (SELECT cab.ca, cab.cb, ln((cab.cnt + 1.0) / (crow.tot + v.nv)) AS lp "
        "FROM cab JOIN crow USING (ca), v), "
        "sc AS (SELECT bg.doc_id, -sum(lp.lp) / count(*) AS xent FROM bg "
        "JOIN lp ON lp.ca = bg.ca AND lp.cb = bg.cb GROUP BY bg.doc_id) "
        "SELECT d.doc_id, round(coalesce(sc.xent, 0.0), 8) AS xent "
        "FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"
    )


def samp_mixture_sql(salt: int = 5) -> str:
    """Replica of functions/sampling.py:mixture_replicate with the query
    config {src0: 2.5, src1: 3.0, src2: 0.4}, default 1.0: reps = floor(e)
    + (bucket < round(frac*1000)); one output row per (doc, epoch<reps)."""
    e = (
        "CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 3.0 "
        "WHEN 'src2' THEN 0.4 ELSE 1.0 END"
    )
    return (
        f"WITH r AS (SELECT doc_id, source, "
        f"CAST(floor({e}) AS BIGINT) + "
        f"CASE WHEN {_bucket_expr('doc_id', salt)} < "
        f"CAST(round(({e} - floor({e})) * 1000) AS BIGINT) THEN 1 ELSE 0 END "
        f"AS reps FROM documents), "
        f"ix(epoch) AS (SELECT unnest(generate_series(0, 9))) "
        f"SELECT r.doc_id, r.source, CAST(ix.epoch AS BIGINT) AS epoch "
        f"FROM r JOIN ix ON ix.epoch < r.reps ORDER BY r.doc_id, epoch"
    )


def dedup_paragraph_sql(words: int = 8) -> str:
    """Exact oracle of dedup.paragraph_dedup in word-window mode: fixed
    windows of ``words`` tokens; an occurrence survives iff it is the
    globally-first (doc_id, idx) of its sha256; clean_text rejoins the
    kept windows with ' '."""
    w = words
    return f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS MATERIALIZED (
  SELECT doc_id,
         CAST(unnest(range(CAST(ceil(len(toks) / {w}.0) AS BIGINT))) AS BIGINT) AS idx,
         unnest(list_transform(range(CAST(ceil(len(toks) / {w}.0) AS BIGINT)),
                i -> array_to_string(list_slice(toks, i * {w} + 1, i * {w} + {w}), ' '))) AS para
  FROM s),
k AS (SELECT doc_id, idx, para,
      row_number() OVER (PARTITION BY sha256(para) ORDER BY doc_id, idx) = 1 AS keep FROM c)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
       coalesce(string_agg(para, ' ' ORDER BY idx) FILTER (WHERE keep), '') AS clean_text
FROM k GROUP BY doc_id
"""


def op_bloom_sql(m_bits: int = 1 << 17, k: int = 3) -> str:
    """Bit-exact SQL replica of sketch.bloom_build + bloom_member: the
    filter's set-position set is built from orders.o_custkey (h1 = fmix64
    of the value, h2 = fmix64(h1 xor salt) forced odd, positions
    h1 + j*h2 mod m); customer.c_custkey probes it — bloom_hit = 1 iff
    all k positions are set, FALSE POSITIVES INCLUDED (they are
    deterministic, so both sides agree on every bit)."""
    salt = str(0xA24BAED4963EE407)
    ivals = ", ".join(f"({i})" for i in range(k))
    mix_b1, b1f = _mix64_stages("bld0", "r", "bh")
    mix_b2, b2f = _mix64_stages("bld20", "r", "bg")
    mix_p1, p1f = _mix64_stages("prb0", "r", "ph")
    mix_p2, p2f = _mix64_stages("prb20", "r", "pg")
    odd = "CASE WHEN b.h % 2 = 0 THEN b.h + 1 ELSE b.h END"
    ctes = [
        "bld0 AS MATERIALIZED (SELECT DISTINCT CAST(o_custkey AS HUGEINT) AS r, "
        "CAST(o_custkey AS HUGEINT) AS h FROM orders)",
        *mix_b1,
        f"bld20 AS (SELECT r, xor(h, CAST({salt} AS HUGEINT)) AS h FROM {b1f})",
        *mix_b2,
        f"iv(i) AS (VALUES {ivals})",
        f"bpos AS MATERIALIZED (SELECT DISTINCT "
        f"CAST((a.h + iv.i * ({odd})) % {m_bits} AS BIGINT) AS p "
        f"FROM {b1f} a JOIN {b2f} b USING (r) CROSS JOIN iv)",
        "prb0 AS MATERIALIZED (SELECT CAST(c_custkey AS HUGEINT) AS r, "
        "CAST(c_custkey AS HUGEINT) AS h FROM customer)",
        *mix_p1,
        f"prb20 AS (SELECT r, xor(h, CAST({salt} AS HUGEINT)) AS h FROM {p1f})",
        *mix_p2,
        f"ppos AS (SELECT a.r, "
        f"CAST((a.h + iv.i * ({odd})) % {m_bits} AS BIGINT) AS p "
        f"FROM {p1f} a JOIN {p2f} b USING (r) CROSS JOIN iv)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + " "
        f"SELECT CAST(pp.r AS BIGINT) AS c_custkey, "
        f"CAST(CASE WHEN count(bp.p) = {k} THEN 1 ELSE 0 END AS BIGINT) AS bloom_hit "
        f"FROM ppos pp LEFT JOIN bpos bp USING (p) GROUP BY pp.r"
    )


def dedup_lsh_incr_sql(threshold: float = 0.5, num_perm: int = 64) -> str:
    """Exact oracle of dedup.build_lsh_index + lsh_index_probe over the
    documents table: index = doc_id % 41 != 3, probe = the % 41 == 3
    slice; candidates share >= 1 (band, band_hash); est_jaccard = fraction
    of equal minhash components (the signature-agreement estimator the
    probe uses — no text verify)."""
    ctes, bh = _minhash_sig_band_ctes(num_perm=num_perm, src="pdocs")
    ctes = [
        # planted near-dups: probe ids with doc_id % 82 == 3 take the text
        # of doc_id - 2 (a corpus member), so the estimator has true
        # positives to find; all other texts are unchanged
        "pdocs AS MATERIALIZED (SELECT d.doc_id, "
        "CASE WHEN d.doc_id % 82 = 3 THEN coalesce(o.text, d.text) "
        "ELSE d.text END AS text FROM documents d "
        "LEFT JOIN documents o ON o.doc_id = d.doc_id - 2)",
    ] + ctes + [
        f"candi AS MATERIALIZED (SELECT DISTINCT nw.doc_id AS new_id, "
        f"od.doc_id AS old_id FROM {bh} nw "
        f"JOIN {bh} od ON od.band = nw.band AND od.h = nw.h "
        f"WHERE nw.doc_id % 41 = 3 AND od.doc_id % 41 <> 3)",
        "eqc AS (SELECT c.new_id, c.old_id, "
        "count(*) FILTER (WHERE y.s = x.s) AS eq "
        "FROM candi c JOIN sig x ON x.doc_id = c.new_id "
        "JOIN sig y ON y.doc_id = c.old_id AND y.pi = x.pi "
        "GROUP BY c.new_id, c.old_id)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + " "
        f"SELECT new_id, old_id, round(CAST(eq AS DOUBLE) / {num_perm}, 8) "
        f"AS est_jaccard FROM eqc "
        f"WHERE CAST(eq AS DOUBLE) / {num_perm} >= {threshold} "
        f"ORDER BY new_id, old_id"
    )


def text_entropy_sql() -> str:
    """Per-doc char Shannon entropy (ASCII corpus: SQL chars == utf-8
    bytes); empty docs 0.0; both sides round(…, 8) at the end."""
    return """
WITH ch AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(n) AS t FROM cnt GROUP BY doc_id),
ent AS (SELECT cnt.doc_id, -sum((n * 1.0 / t) * log2(n * 1.0 / t)) AS h
        FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id)
SELECT d.doc_id, round(coalesce(ent.h, 0.0), 8) AS entropy
FROM documents d LEFT JOIN ent ON ent.doc_id = d.doc_id
"""


def llm_prep_sql(qmin: float = 0.8) -> str:
    """Composed LLM-corpus prep oracle: quality gate (UNROUNDED score, same
    left-assoc double arithmetic as the numpy kernel) -> exact-dedup
    winners among survivors -> per-doc token counts."""
    return f"""
WITH s AS MATERIALIZED (
  SELECT doc_id, text,
    CAST(length(text) AS DOUBLE) AS chars,
    CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE) AS words,
    CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha
  FROM documents),
q AS (SELECT doc_id, text,
    0.4 * (CASE WHEN chars >= 50 AND chars <= 100000 THEN 1 ELSE 0 END)
    + 0.4 * (CASE WHEN chars > 0 THEN alpha / chars ELSE 0 END)
    + 0.2 * (CASE WHEN words > 0 AND chars/words >= 3 AND chars/words <= 12 THEN 1 ELSE 0 END)
    AS quality FROM s),
ded AS (SELECT doc_id, text, quality FROM q WHERE quality >= {qmin}
        QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1)
SELECT doc_id,
       CAST(length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
       round(quality, 8) AS quality
FROM ded ORDER BY doc_id
"""


def samp_dsir_sql(k: int = 200, n_buckets: int = 4096, target: str = "en") -> str:
    """Bit-exact replica of functions/dsir.dsir_select: hashed unigram +
    bigram token features (the same ascending-polynomial + fmix64 token
    hashes as the fingerprint, bigram = fmix64(h_i·B + h_{i+1})) into
    ``n_buckets`` buckets, per-feature quantized log-ratio
    round(1e6·ln((t+1)/(r+1))) — evaluated by THIS engine's ln on both
    sides (the module computes its weight table via DuckDB for exactly
    this reason) — exact int64 per-doc occurrence sums, top-k by
    (weight desc, doc_id).  Valid for the synthetic documents table
    (ASCII, space-delimited)."""
    tok_ctes, th = _token_hash_ctes("lower(text)")
    mixb, bth = _mix64_stages("bg0", "doc_id, tj", "bu")
    ctes = [
        *tok_ctes,
        f"bg0 AS (SELECT a.doc_id, a.tj, "
        f"(((a.h * CAST({_FNV_B} AS HUGEINT)) & {_M64}) + b.h) & {_M64} AS h "
        f"FROM {th} a JOIN {th} b ON b.doc_id = a.doc_id AND b.tj = a.tj + 1)",
        *mixb,
        f"af AS MATERIALIZED (SELECT doc_id, CAST(h % {n_buckets} AS BIGINT) AS f "
        f"FROM {th} UNION ALL "
        f"SELECT doc_id, CAST(h % {n_buckets} AS BIGINT) AS f FROM {bth})",
        f"cnt AS (SELECT af.f, sum(CASE WHEN d.lang = '{target}' THEN 1 ELSE 0 END) "
        f"AS t, count(*) AS r FROM af JOIN documents d USING (doc_id) GROUP BY af.f)",
        "wt AS (SELECT f, CAST(round(1000000 * ln((t + 1)::DOUBLE / (r + 1)::DOUBLE)) "
        "AS BIGINT) AS s FROM cnt)",
        "sc AS (SELECT d.doc_id, CAST(coalesce(sum(wt.s), 0) AS BIGINT) AS weight "
        "FROM documents d LEFT JOIN af ON af.doc_id = d.doc_id "
        "LEFT JOIN wt ON wt.f = af.f GROUP BY d.doc_id)",
        f"win AS (SELECT doc_id, weight FROM sc ORDER BY weight DESC, doc_id LIMIT {k})",
    ]
    return (
        "WITH RECURSIVE " + ",\n".join(ctes) + " "
        "SELECT doc_id, weight FROM win ORDER BY doc_id"
    )


def samp_shuffle_sql(salt: int = 3) -> str:
    """sampling.global_shuffle twin: pos = dense rank of the full-range
    Knuth hash of doc_id (ties by doc_id).  Integer end to end."""
    h = _knuth64_expr("doc_id", salt)
    return (
        f"WITH h AS (SELECT doc_id, {h} AS h FROM documents) "
        f"SELECT doc_id, row_number() OVER (ORDER BY h, doc_id) - 1 AS pos "
        f"FROM h ORDER BY doc_id"
    )


def op_qsketch_sql(k: int = 128, P: int = 16, salt: int = 9) -> str:
    """Bit-exact replica of sketch.quantile_sketch over lineitem
    l_extendedprice: hash-partition by the composite key
    l_orderkey·8 + l_linenumber (sampling.hash_bucket twin, mod P), keep
    the last row of every rank-chunk of size ceil(n_p/k) with the chunk
    size as weight, merge by (v, ok, ln), quantile num/den = first item
    whose cumulative weight reaches (num·N + den − 1) // den.  Integer
    arithmetic end to end; v is carried, never computed on."""
    key = "(l_orderkey * 8 + l_linenumber)"
    qrows = ", ".join(f"({n}, {d})" for n, d in ((1, 100), (1, 4), (1, 2), (3, 4), (99, 100)))
    return f"""
WITH b AS (SELECT l_extendedprice AS v, l_orderkey AS ok, l_linenumber AS ln,
           ({_bucket_expr(key, salt)}) % {P} AS part FROM lineitem),
r AS (SELECT *, row_number() OVER (PARTITION BY part ORDER BY v, ok, ln) - 1 AS rn,
      count(*) OVER (PARTITION BY part) AS np FROM b),
s AS (SELECT *, (np + {k} - 1) // {k} AS st FROM r),
kept AS (SELECT part, v, ok, ln,
         count(*) OVER (PARTITION BY part, rn // st) AS w,
         row_number() OVER (PARTITION BY part, rn // st ORDER BY rn DESC) AS rr
         FROM s QUALIFY rr = 1),
m AS (SELECT v, ok, ln, w,
      sum(w) OVER (ORDER BY v, ok, ln ROWS UNBOUNDED PRECEDING) AS cw FROM kept),
tot AS (SELECT sum(w) AS n FROM kept),
q(num, den) AS (VALUES {qrows}),
tgt AS (SELECT num, den, (num * tot.n + den - 1) // den AS target FROM q, tot),
ans AS (SELECT t.num, t.den, min(m.cw) AS c FROM tgt t
        JOIN m ON m.cw >= t.target GROUP BY t.num, t.den)
SELECT CAST(ans.num AS DOUBLE) / ans.den AS q, m.v AS value
FROM ans JOIN m ON m.cw = ans.c ORDER BY q
"""


def op_cube_sql() -> str:
    return (
        "SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority, "
        "coalesce(o_orderstatus, 'ALL') AS o_orderstatus, "
        "count(*) AS n, round(sum(o_totalprice), 4) AS sum_price "
        "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus) "
        "ORDER BY o_orderpriority, o_orderstatus"
    )


def sim_topk_filtered_sql(n_queries: int = 5, k: int = 10, label: int = 1) -> str:
    """sim_topk with a metadata predicate on the corpus side (filtered
    vector search): identical cosine/rounding/tie-break contract."""
    return f"""
WITH q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
s AS MATERIALIZED (SELECT q.query_id, e.vec_id,
        list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
      FROM q CROSS JOIN embeddings e WHERE e.label = {label})
SELECT query_id, vec_id, round(sim, 8) AS score
FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn FROM s)
WHERE rn <= {k}
"""


def samp_temperature_sql(salt: int = 6) -> str:
    """Replica of sampling.temperature_replicate at τ=2: stratum weight
    sqrt(n_s) (IEEE correctly-rounded, so numpy and DuckDB agree
    bit-for-bit; the Σ√n fold carries the repo's standard last-ulp sum
    caveat), expected copies e_s = (N / Σ√n) / √n_s, then the same
    floor + hash-slice replication as samp_mixture."""
    b = _bucket_expr("d.doc_id", salt)
    return (
        "WITH cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source), "
        "tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, "
        "sum(sqrt(CAST(n AS DOUBLE))) AS ssum FROM cnt), "
        "e AS (SELECT cnt.source, (tot.nn / tot.ssum) / "
        "sqrt(CAST(cnt.n AS DOUBLE)) AS ee FROM cnt, tot), "
        "r AS (SELECT d.doc_id, d.source, CAST(floor(e.ee) AS BIGINT) + "
        f"CASE WHEN {b} < CAST(round((e.ee - floor(e.ee)) * 1000) AS BIGINT) "
        "THEN 1 ELSE 0 END AS reps "
        "FROM documents d JOIN e ON e.source = d.source), "
        "ix(epoch) AS (SELECT unnest(generate_series(0, 99))) "
        "SELECT r.doc_id, r.source, CAST(ix.epoch AS BIGINT) AS epoch "
        "FROM r JOIN ix ON ix.epoch < r.reps ORDER BY r.doc_id, epoch"
    )
