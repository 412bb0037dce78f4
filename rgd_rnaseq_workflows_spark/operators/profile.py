"""Table profiler: ANALYZE-style per-column statistics in one report.

The statistics a cost-based optimizer (and a data engineer eyeballing a
new drop) wants per column — row count, null count, distinct
cardinality — as one small DataFrame. Exact distinct counts are the
scale trap here: COUNT(DISTINCT col) shuffles every distinct VALUE, and
profiling k columns that way shuffles the union of k corpus-scale value
sets. This profiler rides the engine's portable HLL instead
(``operators/sketches.py``): per column, only ≤ 2^p register rows cross
the wire, the estimate is deterministic (md5-derived registers — the
same number on every engine, every partitioning, every run), and the
per-day register tables would merge by max for incremental profiling.

Plan shape: one aggregation pair per column over a COLUMN-PRUNED scan
(parquet reads just that column per branch), results unioned —
profiling cost scales with columns actually profiled, not table width.
Null counts are exact integer sums; the distinct estimate carries the
documented 1.04/√m relative error (``sketches.relative_error_bound``).
An all-null column yields a NULL estimate (no registers) — both
engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.sketches import (
    hll_estimate, hll_registers, hll_distinct_sql)


def table_profile(df: DataFrame, cols: list[str],
                  p: int = 10, seed: int = 1) -> DataFrame:
    """One row per profiled column:
    (column, n_rows, n_null, n_distinct_est).

    One melt pass instead of one aggregation PAIR per column: the
    columns unpivot to (column, value-as-string) rows in a single scan
    (the hash input of :func:`hll_registers` is the string cast, so the
    melted hash is bit-identical to the per-column form), the
    row/null counts and the grouped register table each fold map-side
    off that one pass, and the estimates attach with one broadcast-size
    join — 2k scans + 2k jobs collapse to one scan + two tiny shuffles.
    A column with no non-null values carries a NULL estimate (the left
    join), exactly as the ungrouped estimator returned."""
    if not cols:
        raise ValueError("profile at least one column")
    melted = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("m")).select("m.column", "m.v")
    stats = (melted.groupBy("column")
             .agg(F.count("*").cast("long").alias("n_rows"),
                  F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_null")))
    est = hll_estimate(
        hll_registers(melted.filter(F.col("v").isNotNull()), "v",
                      p=p, seed=seed, by=("column",)),
        p=p, by=("column",))
    return (stats.join(est.select("column",
                                  F.col("estimate")
                                  .alias("n_distinct_est")),
                       "column", "left")
            .select("column", "n_rows", "n_null", "n_distinct_est"))


def fd_report(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Approximate functional-dependency audit: for each candidate
    dependency ``lhs → rhs``, how close the table comes to satisfying
    it — the g3 measure from the approximate-FD literature (TANE):
    the minimum number of rows to delete so the FD holds exactly,
    which is ``Σ_groups (group size − mode support)``.

    One row per candidate: (lhs_col, rhs_col, n_rows, n_groups,
    n_violating_groups, n_violations, conf_bp) where ``conf_bp`` =
    basis points of rows kept, an exact integer
    ``(10000·(n−viol)) div n`` — no float ratio crosses engines.
    A key candidate (lhs unique) reads conf_bp = 10000 with zero
    violating groups; a data-drop whose source labels stopped
    implying language shows up as a conf drop before any model does.

    NULL is a value on both sides (a NULL lhs is a group, a NULL rhs
    is a mode candidate) — identical grouping semantics in Spark and
    DuckDB GROUP BY.

    Scale shape, per candidate: two map-side-combined aggregations
    over a two-column pruned scan — (lhs, rhs) counts, then per-lhs
    (total, mode, distinct-rhs) — both shuffles carry compact value
    keys, never rows; the final report is one row. Candidates union
    into one frame; cost scales with candidates audited, not table
    width.
    """
    if not pairs:
        raise ValueError("audit at least one candidate dependency")
    parts = []
    for lhs, rhs in pairs:
        pc = (df.groupBy(F.col(lhs).alias("lv"), F.col(rhs).alias("rv"))
              .agg(F.count("*").alias("c")))
        g = pc.groupBy("lv").agg(F.sum("c").alias("n"),
                                 F.max("c").alias("m"),
                                 F.count("*").alias("k"))
        rep = g.agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long").alias("n_violating_groups"),
            F.sum(F.col("n") - F.col("m")).cast("long")
            .alias("n_violations"))
        parts.append(rep.select(
            F.lit(lhs).alias("lhs_col"), F.lit(rhs).alias("rhs_col"),
            "n_rows", "n_groups", "n_violating_groups", "n_violations",
            F.expr("(10000 * (n_rows - n_violations)) div n_rows")
            .cast("long").alias("conf_bp")))
    out = parts[0]
    for piece in parts[1:]:
        out = out.unionByName(piece)
    return out


def fd_report_sql(table: str, pairs: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`fd_report` (identical g3 arithmetic,
    identical NULL-as-value grouping)."""
    if not pairs:
        raise ValueError("audit at least one candidate dependency")
    pieces = []
    for lhs, rhs in pairs:
        pieces.append(f"""
SELECT '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(sum(n - m) AS BIGINT) AS n_violations,
       (10000 * (CAST(sum(n) AS BIGINT) - CAST(sum(n - m) AS BIGINT)))
         // CAST(sum(n) AS BIGINT) AS conf_bp
FROM (
  SELECT lv, CAST(sum(c) AS BIGINT) AS n, CAST(max(c) AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS k
  FROM (SELECT {lhs} AS lv, {rhs} AS rv, count(*) AS c
        FROM {table} GROUP BY 1, 2)
  GROUP BY lv)""")
    return "\nUNION ALL\n".join(pieces)


def table_profile_sql(table: str, cols: list[str],
                      p: int = 10, seed: int = 1) -> str:
    """DuckDB twin of :func:`table_profile` (identical registers,
    identical fold, identical NULL handling)."""
    if not cols:
        raise ValueError("profile at least one column")
    pieces = []
    for c in cols:
        est = hll_distinct_sql(
            f"(SELECT {c} FROM {table} WHERE {c} IS NOT NULL)", c,
            p=p, seed=seed)
        pieces.append(f"""
SELECT '{c}' AS "column", n_rows, n_null, n_distinct_est
FROM (SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_null
      FROM {table}),
     (SELECT estimate AS n_distinct_est FROM ({est}))""")
    return "\nUNION ALL\n".join(pieces)

def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: how many
    equivalence classes (distinct quasi-identifier combinations) have
    fewer than ``k`` rows, and what fraction of ROWS sit in them — the
    re-identification risk measure privacy review asks for before a
    dataset ships. One row out: (k, n_rows, n_classes,
    n_small_classes, n_risk_rows, risk_bp, min_class_size) with
    ``risk_bp`` exact integer basis points.

    NULL is a quasi-identifier value (two NULL-city rows are the same
    equivalence class — GROUP BY semantics, identical cross-engine).

    Scale shape: one map-side-combined aggregation to class-scale
    rows, one fold to a single metadata row; the quasi-identifier
    tuple never leaves the shuffle key.
    """
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    classes = (df.groupBy(*[F.col(c) for c in quasi_cols])
               .agg(F.count("*").alias("c")))
    return classes.agg(
        F.lit(k).cast("long").alias("k"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("c") < k, 1).otherwise(0)).cast("long")
        .alias("n_small_classes"),
        F.sum(F.when(F.col("c") < k, F.col("c")).otherwise(F.lit(0)))
        .cast("long").alias("n_risk_rows"),
        F.expr(f"(10000 * sum(CASE WHEN c < {k} THEN c ELSE 0 END)) "
               f"div sum(c)").cast("long").alias("risk_bp"),
        F.min("c").cast("long").alias("min_class_size"))


def k_anonymity_sql(table: str, quasi_cols: list[str],
                    k: int = 5) -> str:
    """DuckDB twin of :func:`k_anonymity_report`."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    cols = ", ".join(quasi_cols)
    return f"""
WITH classes AS (
  SELECT count(*) AS c FROM {table} GROUP BY {cols})
SELECT CAST({k} AS BIGINT) AS k,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN c < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_classes,
       CAST(sum(CASE WHEN c < {k} THEN c ELSE 0 END) AS BIGINT)
         AS n_risk_rows,
       (10000 * CAST(sum(CASE WHEN c < {k} THEN c ELSE 0 END)
                     AS BIGINT)) // CAST(sum(c) AS BIGINT) AS risk_bp,
       CAST(min(c) AS BIGINT) AS min_class_size
FROM classes"""


def l_diversity_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str, l: int = 3) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the companion
    k-anonymity misses: a large equivalence class whose SENSITIVE
    attribute is uniform still leaks it (the homogeneity attack). Per
    quasi-identifier class, count the DISTINCT sensitive values; report
    one row: (l, n_rows, n_classes, n_weak_classes, n_risk_rows,
    risk_bp, min_l) where a weak class has fewer than ``l`` distinct
    sensitive values and risk_bp is the exact-integer basis-point share
    of rows sitting in weak classes.

    NULL is a sensitive value like any other (GROUP BY semantics,
    identical cross-engine — matching :func:`k_anonymity_report`).

    Scale shape: two map-side-combined aggregations — corpus rows
    collapse to (quasi, sensitive) pairs on the first shuffle, pairs
    collapse to class rows on the second, classes fold to ONE metadata
    row; neither the rows nor the sensitive values ever fan out."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    pairs = (df.groupBy(*[F.col(c) for c in quasi_cols],
                        F.col(sensitive_col).alias("_s"))
             .agg(F.count("*").alias("c")))
    classes = (pairs.groupBy(*[F.col(c) for c in quasi_cols])
               .agg(F.sum("c").alias("n"),
                    F.count("*").alias("nd")))
    return classes.agg(
        F.lit(l).cast("long").alias("l"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("nd") < l, 1).otherwise(0)).cast("long")
        .alias("n_weak_classes"),
        F.sum(F.when(F.col("nd") < l, F.col("n")).otherwise(F.lit(0)))
        .cast("long").alias("n_risk_rows"),
        F.expr(f"(10000 * sum(CASE WHEN nd < {l} THEN n ELSE 0 END)) "
               f"div sum(n)").cast("long").alias("risk_bp"),
        F.min("nd").cast("long").alias("min_l"))


def l_diversity_sql(table: str, quasi_cols: list[str],
                    sensitive_col: str, l: int = 3) -> str:
    """DuckDB twin of :func:`l_diversity_report`."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    cols = ", ".join(quasi_cols)
    return f"""
WITH pairs AS (
  SELECT {cols}, {sensitive_col} AS _s, count(*) AS c
  FROM {table} GROUP BY {cols}, {sensitive_col}),
classes AS (
  SELECT sum(c) AS n, count(*) AS nd FROM pairs GROUP BY {cols})
SELECT CAST({l} AS BIGINT) AS l,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN nd < {l} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_weak_classes,
       CAST(sum(CASE WHEN nd < {l} THEN n ELSE 0 END) AS BIGINT)
         AS n_risk_rows,
       (10000 * CAST(sum(CASE WHEN nd < {l} THEN n ELSE 0 END)
                     AS BIGINT)) // CAST(sum(n) AS BIGINT) AS risk_bp,
       CAST(min(nd) AS BIGINT) AS min_l
FROM classes"""


# =============================================================================
# Declarative data-expectations audit (the Deequ / Great Expectations shape)
# =============================================================================

_ROW_LOCAL = {"not_null", "range", "regex", "in_set"}


def _violation_expr(kind: str, col: str, args: tuple) -> F.Column:
    """Row-local violation indicator (0/1) for one constraint."""
    c = F.col(col)
    if kind == "not_null":
        bad = c.isNull()
    elif kind == "range":
        lo, hi = args
        bad = c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    elif kind == "regex":
        (pat,) = args
        bad = c.isNull() | ~c.rlike(pat)
    elif kind == "in_set":
        (vals,) = args
        bad = c.isNull() | ~c.isin(list(vals))
    else:
        raise ValueError(f"unknown row-local constraint {kind}")
    return F.when(bad, 1).otherwise(0)


def expectations_report(df: DataFrame,
                        constraints: list[tuple]) -> DataFrame:
    """Declarative constraint-suite audit — the ingest gate every
    production pipeline runs before promoting a batch (the Deequ /
    Great Expectations operator class). ``constraints`` is a list of
    tuples: ``("not_null", col)``, ``("range", col, lo, hi)``,
    ``("regex", col, pattern)``, ``("in_set", col, values)``,
    ``("unique", col)``.

    Output: one row per constraint — (constraint, column, spec,
    n_violations, n_rows, status PASS/FAIL) — ordered by (constraint,
    column, spec).

    Scale design: every ROW-LOCAL constraint folds into ONE map-side-
    combined aggregation over a single corpus scan (conditional sums —
    adding a constraint adds an expression, not a pass). ``unique``
    needs value-scale state and runs as one count-distinct aggregation
    per audited column (the exact form; the profiler's HLL variant is
    the estimate when approximate suffices). The report itself is
    metadata (one row per constraint), assembled distributed via a
    union of aggregate frames — no driver collect.
    """
    if not constraints:
        raise ValueError("constraints must be non-empty")
    specs = []
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, con in enumerate(constraints):
        kind, col = con[0], con[1]
        if kind in _ROW_LOCAL:
            aggs.append(F.sum(_violation_expr(kind, col, tuple(con[2:])))
                        .cast("long").alias(f"_v{i}"))
        elif kind != "unique":
            raise ValueError(f"unknown constraint kind {kind}")
        specs.append(con)
    base = df.agg(*aggs)
    frames = []
    for i, con in enumerate(specs):
        kind, col = con[0], con[1]
        spec = "" if len(con) <= 2 else repr(tuple(con[2:]))
        if kind in _ROW_LOCAL:
            frames.append(base.select(
                F.lit(kind).alias("constraint"),
                F.lit(col).alias("column"),
                F.lit(spec).alias("spec"),
                F.col(f"_v{i}").alias("n_violations"),
                F.col("_n").alias("n_rows")))
        else:  # unique: violations = rows beyond one per distinct value
            frames.append(df.agg(
                F.lit("unique").alias("constraint"),
                F.lit(col).alias("column"),
                F.lit(spec).alias("spec"),
                (F.count(col) - F.countDistinct(col)).cast("long")
                .alias("n_violations"),
                F.count(F.lit(1)).cast("long").alias("n_rows")))
    rep = frames[0]
    for f_ in frames[1:]:
        rep = rep.unionByName(f_)
    return (rep.withColumn(
        "status", F.when(F.col("n_violations") == 0, "PASS")
        .otherwise("FAIL"))
        .orderBy("constraint", "column", "spec"))


def expectations_sql(table: str, constraints: list[tuple]) -> str:
    """DuckDB twin of :func:`expectations_report` — identical
    violation predicates, one UNION ALL arm per constraint."""
    if not constraints:
        raise ValueError("constraints must be non-empty")
    arms = []
    for con in constraints:
        kind, col = con[0], con[1]
        spec = "" if len(con) <= 2 else repr(tuple(con[2:]))
        spec_sql = spec.replace("'", "''")
        if kind == "not_null":
            bad = f"{col} IS NULL"
        elif kind == "range":
            lo, hi = con[2], con[3]
            bad = f"({col} IS NULL OR {col} < {lo} OR {col} > {hi})"
        elif kind == "regex":
            pat = con[2].replace("'", "''")
            bad = f"({col} IS NULL OR NOT regexp_matches({col}, '{pat}'))"
        elif kind == "in_set":
            vals = ", ".join(
                "'{}'".format(v.replace("'", "''")) if isinstance(v, str)
                else str(v) for v in con[2])
            bad = f"({col} IS NULL OR {col} NOT IN ({vals}))"
        elif kind == "unique":
            arms.append(
                f"SELECT 'unique' AS constraint, '{col}' AS \"column\", "
                f"'{spec_sql}' AS spec, "
                f"CAST(count({col}) - count(DISTINCT {col}) AS BIGINT) "
                f"AS n_violations, CAST(count(*) AS BIGINT) AS n_rows "
                f"FROM {table}")
            continue
        else:
            raise ValueError(f"unknown constraint kind {kind}")
        arms.append(
            f"SELECT '{kind}' AS constraint, '{col}' AS \"column\", "
            f"'{spec_sql}' AS spec, "
            f"CAST(sum(CASE WHEN {bad} THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS n_violations, CAST(count(*) AS BIGINT) AS n_rows "
            f"FROM {table}")
    union = "\nUNION ALL\n".join(arms)
    return (f"SELECT *, CASE WHEN n_violations = 0 THEN 'PASS' "
            f"ELSE 'FAIL' END AS status FROM (\n{union}\n)")


# =============================================================================
# Pairwise correlation matrix — exact integer moments, one pass
# =============================================================================


def correlation_report(df: DataFrame, cols: list[tuple[str, int]]
                       ) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE
    map-side-combined pass — the ANALYZE-extended-stats profiler: each
    column is fixed-pointed by its declared scale (the _isum
    discipline — ``round(x·scale)`` once, integers after), and every
    moment (Σx, Σx², Σxy) accumulates in decimal(38,0), so the moments
    are EXACT and engine-identical; r itself is the textbook
    ``(n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))`` evaluated
    as exact-decimal numerator/variance terms cast once to double
    (IEEE-deterministic), rounded to 6.

    Rows with a NULL in either column of a pair are excluded from THAT
    pair (pairwise deletion — each pair's n is reported). Output:
    (col_x, col_y, n, r6) for every unordered pair, ordered.

    Scale shape: one aggregation, no joins, no windows — moments for
    all pairs fold in the same pass; output is |cols|²/2 metadata rows.
    """
    one = (df.select(*correlation_moment_inputs(cols))
           .agg(*correlation_moment_aggs(cols)))
    return correlations_from_moments(one, cols)


def _corr_pairs(cols: list[tuple[str, int]]) -> list[tuple[str, str]]:
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    names = [c for c, _ in cols]
    if len(set(names)) != len(names):
        raise ValueError("duplicate column")
    return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]


def correlation_moment_aggs(cols: list[tuple[str, int]]) -> list:
    """The exact decimal(38,0) moment aggregates behind
    :func:`correlation_report` — factored out because the SAME
    expressions run under a Structured Streaming aggregation
    (``streaming.corpus_stream.stream_correlation_moments``): moments
    are one-row sufficient statistics, so the stream maintains them
    incrementally and :func:`correlations_from_moments` folds the
    report on demand (the HLL-register / stream_expectations
    pattern)."""
    aggs = []
    for a, b in _corr_pairs(cols):
        p = f"{a}__{b}"
        aggs.append(F.expr(f"CAST(count_if(_v_sx_{p} IS NOT NULL) "
                           f"AS BIGINT)").alias(f"n_{p}"))
        for m in ("sx", "sy", "sxx", "syy", "sxy"):
            # LIMB-SPLIT exact sums over the PRE-PROJECTED moment
            # columns (r11): a straight decimal(38,0) sum is ~12×
            # slower per row than a long sum, and putting the
            # round/cast/CASE trees inside each aggregate re-evaluates
            # them once PER AGGREGATE (HashAggregate has no
            # common-subexpression elimination across aggregate
            # expressions — measured 1.8 s with the trees inlined vs
            # 0.4 s over column refs). So :func:`correlation_moment_
            # inputs` projects each pair's nulled moment value once
            # (the projection IS CSE'd in codegen), and every
            # aggregate here is a trivial limb sum of a column ref:
            # x = l2·2^(2B) + l1·2^B + l0 with truncating div/% (the
            # identity holds for negatives), recombined exactly in
            # decimal on the ONE output row. Bounds: |fixed-point
            # value| < 2^31 keeps every product < 2^62; |limb| < 2^B
            # keeps each limb SUM exact to 2^63/2^B ≈ 4.4e12 rows —
            # past 100 TB-of-lineitem scale. Still one map-side-
            # combined pass, still mergeable (the streaming moments
            # sink sums the same limbs).
            v = f"_v_{m}_{p}"
            aggs += [
                F.expr(f"sum({v} % {1 << _LIMB_B})")
                .alias(f"{m}_{p}__l0"),
                F.expr(f"sum(({v} div {1 << _LIMB_B}) "
                       f"% {1 << _LIMB_B})").alias(f"{m}_{p}__l1"),
                F.expr(f"sum({v} div {1 << (2 * _LIMB_B)})")
                .alias(f"{m}_{p}__l2"),
            ]
    return aggs


def correlation_moment_inputs(cols: list[tuple[str, int]]) -> list:
    """The pre-aggregation projection feeding
    :func:`correlation_moment_aggs`: per pair, the five moment values
    as longs, NULL when either column is NULL (pairwise deletion).
    One codegen projection with shared subexpressions — the fixed-
    point cast of each column is computed once per row, not once per
    aggregate."""
    fx = {c: f"CAST(round({c} * {s}) AS BIGINT)" for c, s in cols}
    out = []
    for a, b in _corr_pairs(cols):
        both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
        xa, xb = fx[a], fx[b]
        p = f"{a}__{b}"
        for m, e in (("sx", xa), ("sy", xb), ("sxx", f"{xa} * {xa}"),
                     ("syy", f"{xb} * {xb}"), ("sxy", f"{xa} * {xb}")):
            out.append(F.expr(f"CASE WHEN {both} THEN {e} END")
                       .alias(f"_v_{m}_{p}"))
    return out


_LIMB_B = 21    # limb width: see correlation_moment_aggs' bound analysis


def correlations_from_moments(one: DataFrame,
                              cols: list[tuple[str, int]]) -> DataFrame:
    """Fold a 1-row moments frame (batch agg or a streaming sink's
    latest row) into the (col_x, col_y, n, r6) report — metadata-scale,
    never re-reading the corpus. Limb sums recombine into the exact
    decimal(38,0) moment here, on one row, before the textbook double
    fold."""
    dec = "decimal(38,0)"
    rows = []
    for a, b in _corr_pairs(cols):
        p = f"{a}__{b}"

        def rec(m, p=p):
            return (f"(CAST({m}_{p}__l2 AS {dec}) * {1 << (2 * _LIMB_B)}"
                    f" + CAST({m}_{p}__l1 AS {dec}) * {1 << _LIMB_B}"
                    f" + {m}_{p}__l0)")

        sx, sy = rec("sx"), rec("sy")
        sxx, syy, sxy = rec("sxx"), rec("syy"), rec("sxy")
        num = f"CAST(n_{p} * {sxy} - {sx} * {sy} AS DOUBLE)"
        dx = f"CAST(n_{p} * {sxx} - {sx} * {sx} AS DOUBLE)"
        dy = f"CAST(n_{p} * {syy} - {sy} * {sy} AS DOUBLE)"
        r6 = (f"CASE WHEN n_{p} >= 2 AND {dx} > 0 AND {dy} > 0 THEN "
              f"round({num} / (sqrt({dx}) * sqrt({dy})), 6) END")
        rows.append(F.struct(F.lit(a).alias("col_x"),
                             F.lit(b).alias("col_y"),
                             F.col(f"n_{p}").alias("n"),
                             F.expr(r6).alias("r6")))
    return (one.select(F.explode(F.array(*rows)).alias("s"))
            .select("s.*").orderBy("col_x", "col_y"))


def correlation_report_sql(table: str, cols: list[tuple[str, int]]
                           ) -> str:
    """DuckDB twin of :func:`correlation_report` — identical fixed-
    point moments in HUGEINT-capable decimals and the same single
    double division."""
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    names = [c for c, _ in cols]
    if len(set(names)) != len(names):
        raise ValueError("duplicate column")
    fx = {c: f"CAST(round({c} * {s}) AS BIGINT)" for c, s in cols}
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    moments, arms = [], []
    for a, b in pairs:
        both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
        xa, xb = fx[a], fx[b]
        p = f"{a}__{b}"
        d = "DECIMAL(38,0)"
        moments += [
            f"CAST(count(*) FILTER (WHERE {both}) AS BIGINT) AS n_{p}",
            f"sum(CAST({xa} AS {d})) FILTER (WHERE {both}) AS sx_{p}",
            f"sum(CAST({xb} AS {d})) FILTER (WHERE {both}) AS sy_{p}",
            f"sum(CAST({xa} AS {d}) * {xa}) FILTER (WHERE {both}) "
            f"AS sxx_{p}",
            f"sum(CAST({xb} AS {d}) * {xb}) FILTER (WHERE {both}) "
            f"AS syy_{p}",
            f"sum(CAST({xa} AS {d}) * {xb}) FILTER (WHERE {both}) "
            f"AS sxy_{p}",
        ]
        num = f"CAST(n_{p} * sxy_{p} - sx_{p} * sy_{p} AS DOUBLE)"
        dx = f"CAST(n_{p} * sxx_{p} - sx_{p} * sx_{p} AS DOUBLE)"
        dy = f"CAST(n_{p} * syy_{p} - sy_{p} * sy_{p} AS DOUBLE)"
        arms.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, n_{p} AS n, "
            f"CASE WHEN n_{p} >= 2 AND {dx} > 0 AND {dy} > 0 THEN "
            f"round({num} / (sqrt({dx}) * sqrt({dy})), 6) END AS r6 "
            f"FROM m")
    return (f"WITH m AS (SELECT {', '.join(moments)} FROM {table})\n"
            + "\nUNION ALL\n".join(arms)
            + "\nORDER BY col_x, col_y")


# =============================================================================
# Inclusion-dependency (foreign-key candidate) audit
# =============================================================================


def fk_candidates_report(spark, pairs: list[tuple[DataFrame, str,
                                                  DataFrame, str, str]]
                         ) -> DataFrame:
    """Inclusion-dependency audit — the FK-discovery complement of the
    FD audit: for each (child frame, child col, parent frame, parent
    col, label), how completely the child's VALUE SET is contained in
    the parent's key set. A true FK reads 10000 bp; orphaned keys
    (broken referential integrity, late-arriving dims) show up as the
    gap, with the exact orphan count alongside.

    Semantics (engine-identical): containment over DISTINCT non-NULL
    child values — ``contained = count(distinct child values found in
    parent)``; ``containment_bp = 10000·contained div n_child_values``.
    Output: (relation, n_child_values, n_contained, n_orphans,
    containment_bp) per audited pair.

    Scale shape: each side collapses to its DISTINCT value set first
    (map-side combined), then ONE left semi/anti-style join per pair at
    value-set scale — never a row-level join of the full tables.
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    outs = []
    for child, ccol, parent, pcol, label in pairs:
        cv = (child.filter(F.col(ccol).isNotNull())
              .select(F.col(ccol).cast("long").alias("v")).distinct())
        pv = (parent.filter(F.col(pcol).isNotNull())
              .select(F.col(pcol).cast("long").alias("v")).distinct())
        # ONE left join + ONE aggregation counts total and contained
        # values together (count of non-null markers) — the semi-join +
        # separate total form scanned and deduped the child twice
        outs.append(
            cv.join(pv.withColumn("_hit", F.lit(1)), "v", "left")
            .agg(F.count("*").cast("long").alias("n_child_values"),
                 F.count("_hit").cast("long").alias("n_contained"))
            .select(F.lit(label).alias("relation"), "n_child_values",
                    "n_contained",
                    (F.col("n_child_values") - F.col("n_contained"))
                    .cast("long").alias("n_orphans"),
                    F.expr("10000 * n_contained div n_child_values")
                    .cast("long").alias("containment_bp")))
    rep = outs[0]
    for o in outs[1:]:
        rep = rep.unionByName(o)
    return rep.orderBy("relation")


def fk_candidates_sql(pairs: list[tuple[str, str, str, str, str]]) -> str:
    """DuckDB twin of :func:`fk_candidates_report`: pairs of
    (child_table, child_col, parent_table, parent_col, label)."""
    if not pairs:
        raise ValueError("pairs must be non-empty")
    arms = []
    for ct, cc, pt, pc, label in pairs:
        arms.append(f"""
SELECT '{label}' AS relation,
       CAST(count(*) AS BIGINT) AS n_child_values,
       CAST(count(*) FILTER (WHERE hit) AS BIGINT) AS n_contained,
       CAST(count(*) FILTER (WHERE NOT hit) AS BIGINT) AS n_orphans,
       (10000 * count(*) FILTER (WHERE hit)) // count(*)
         AS containment_bp
FROM (
  SELECT v, EXISTS (SELECT 1 FROM {pt} p
                    WHERE CAST(p.{pc} AS BIGINT) = c.v) AS hit
  FROM (SELECT DISTINCT CAST({cc} AS BIGINT) AS v FROM {ct}
        WHERE {cc} IS NOT NULL) c)""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY relation"


def embedding_health_report(emb: DataFrame, dims: int,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Vector-column ANALYZE — the data-quality gate the ANN family
    assumes but never checks: one corpus pass counting NULL vectors,
    wrong-dimension vectors, vectors carrying a non-finite or NULL element
    (NaN/Inf/NULL poison every downstream dot product), all-zero vectors
    (cosine is undefined — the classic failed-encoder sentinel), plus
    the norm range over the healthy rest (round(·, 6) — the family's
    cross-engine float tolerance). A non-zero count in any defect
    column means the embedding job upstream needs attention BEFORE a
    100 TB index build burns compute on poisoned vectors.

    Scale shape: one map-side-combined aggregation over per-row
    array expressions — no shuffle of vector payloads, 1 row out.
    """
    return emb.agg(*embedding_health_aggs(dims, vec_col))


def embedding_health_aggs(dims: int,
                          vec_col: str = "embedding") -> list:
    """The health report's aggregate expressions, factored out because
    every one of them is trivially mergeable (counts, min, max): a
    Structured Streaming aggregation maintains the identical
    sufficient statistics incrementally
    (``streaming.corpus_stream.stream_embedding_health``) and its sink
    row IS the live report — the correlation-moments pattern."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    is_null = F.col(vec_col).isNull()
    bad_dim = ~is_null & (F.size(vec_col) != F.lit(dims))
    nonfinite = (~is_null & ~bad_dim & F.exists(
        v, lambda x: x.isNull() | x.isNaN()
        | (F.abs(x) == float("inf"))))
    zero = (~is_null & ~bad_dim & ~nonfinite
            & ~F.exists(v, lambda x: x != 0.0))
    healthy = ~is_null & ~bad_dim & ~nonfinite & ~zero
    norm = F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda acc, x: acc + x * x))
    return [
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(is_null.cast("long")).cast("long").alias("n_null"),
        F.sum(bad_dim.cast("long")).cast("long").alias("n_bad_dim"),
        F.sum(nonfinite.cast("long")).cast("long").alias("n_nonfinite"),
        F.sum(zero.cast("long")).cast("long").alias("n_zero"),
        F.round(F.min(F.when(healthy, norm)), 6).alias("min_norm6"),
        F.round(F.max(F.when(healthy, norm)), 6).alias("max_norm6")]


def embedding_health_sql(table: str, dims: int,
                         vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`embedding_health_report` — identical
    defect classes and the same rounded norm range."""
    v = f"CAST({vec_col} AS DOUBLE[])"
    is_null = f"{vec_col} IS NULL"
    bad_dim = f"(NOT {is_null} AND len({vec_col}) <> {dims})"
    nonfinite = (f"(NOT {is_null} AND NOT {bad_dim} AND "
                 f"len(list_filter({v}, x -> x IS NULL OR isnan(x) OR "
                 f"abs(x) = 'infinity'::DOUBLE)) > 0)")
    zero = (f"(NOT {is_null} AND NOT {bad_dim} AND NOT {nonfinite} "
            f"AND len(list_filter({v}, x -> x <> 0.0)) = 0)")
    healthy = (f"(NOT {is_null} AND NOT {bad_dim} AND NOT {nonfinite} "
               f"AND NOT {zero})")
    norm = (f"sqrt(list_aggregate(list_transform({v}, x -> x * x), "
            f"'sum'))")
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(coalesce(sum(CAST({is_null} AS BIGINT)), 0) AS BIGINT)
         AS n_null,
       CAST(coalesce(sum(CAST({bad_dim} AS BIGINT)), 0) AS BIGINT)
         AS n_bad_dim,
       CAST(coalesce(sum(CAST({nonfinite} AS BIGINT)), 0) AS BIGINT)
         AS n_nonfinite,
       CAST(coalesce(sum(CAST({zero} AS BIGINT)), 0) AS BIGINT)
         AS n_zero,
       round(min(CASE WHEN {healthy} THEN {norm} END), 6) AS min_norm6,
       round(max(CASE WHEN {healthy} THEN {norm} END), 6) AS max_norm6
FROM {table}
"""


def key_skew_report(df: DataFrame, key_col: str,
                    top_k: int = 10) -> DataFrame:
    """Shuffle-skew pre-flight: before keying a 100 TB join or
    aggregation on a column, measure how concentrated it is — the
    decision input for salting (``operators.skew``) and AQE skew-join
    sizing. Per top-``top_k`` key (NULL keys included — they funnel to
    one partition too): row count, exact ppm share of the table, the
    running cumulative share, and the key's multiple of the MEAN key
    load (``hot_x_mean_ppm`` ≥ a few million ⇒ one task drags the
    stage; the classic salting trigger).

    Exactness: shares are exact integer divisions over exact counts —
    both engines rank and report identical rows (count-desc, key-asc
    tiebreak). One map-side-combined groupBy + a candidate-scale rank.

    Scale shape (two-phase top-k): the keys one pre-flights before a
    100 TB shuffle (URLs, doc ids) have BILLIONS of distinct values,
    so the distinct-count table must never funnel through one global
    window. Phase 1 keeps each partition's local top-``top_k`` under
    the same total order (a global top-k row is necessarily in its own
    partition's top-k, so this prunes without loss — and it holds for
    ANY placement of the count rows, so no checkpoint is needed).
    Phase 2 ranks and cumulative-sums the ≤ partitions·top_k survivors
    — a metadata-scale window (the rank-1..k cumulative sum reads only
    rows 1..k, all of which survive phase 1). Totals come from the
    aggregate, not a window."""
    from pyspark.sql import Window
    kc = F.col(key_col).cast("string").alias("key")
    cnt = (df.select(kc).groupBy("key")
           .agg(F.count("*").alias("n_rows")))
    tot = cnt.agg(F.sum("n_rows").alias("_t"),
                  F.count("*").alias("_k"))
    cand_w = (Window.partitionBy("_pid")
              .orderBy(F.desc("n_rows"), F.asc_nulls_first("key")))
    cand = (cnt.withColumn("_pid", F.spark_partition_id())
            .withColumn("_prn", F.row_number().over(cand_w))
            .filter(F.col("_prn") <= top_k)
            .drop("_pid", "_prn"))
    w = Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
    wc = (Window.orderBy(F.desc("n_rows"), F.asc_nulls_first("key"))
          .rowsBetween(Window.unboundedPreceding, 0))
    return (cand.crossJoin(F.broadcast(tot))
            .withColumn("rank", F.row_number().over(w))
            .withColumn("_cum", F.sum("n_rows").over(wc))
            .filter(F.col("rank") <= top_k)
            .select("rank", "key",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.expr("n_rows * 1000000 div _t").cast("long")
                    .alias("share_ppm"),
                    F.expr("_cum * 1000000 div _t").cast("long")
                    .alias("cum_share_ppm"),
                    # DECIMAL(38,0) intermediate: n_rows·k·1e6 can
                    # overflow BIGINT on a 100 TB table's hottest key
                    F.expr("CAST(floor(CAST(n_rows AS DECIMAL(38,0)) "
                           "* _k * 1000000 / _t) AS BIGINT)")
                    .alias("hot_x_mean_ppm"))
            .orderBy("rank"))


def key_skew_report_sql(table: str, key_expr: str,
                        top_k: int = 10) -> str:
    """DuckDB twin of :func:`key_skew_report`."""
    return f"""
WITH cnt AS (
  SELECT CAST({key_expr} AS VARCHAR) AS key,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM {table} GROUP BY 1),
tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS k FROM cnt),
ranked AS (
  SELECT *, row_number() OVER (
      ORDER BY n_rows DESC, key ASC NULLS FIRST) AS rank,
         sum(n_rows) OVER (
      ORDER BY n_rows DESC, key ASC NULLS FIRST
      ROWS UNBOUNDED PRECEDING) AS cum
  FROM cnt)
SELECT rank, key, n_rows,
       CAST(n_rows * 1000000 // t AS BIGINT) AS share_ppm,
       CAST(cum * 1000000 // t AS BIGINT) AS cum_share_ppm,
       CAST(CAST(n_rows AS HUGEINT) * k * 1000000 // t AS BIGINT)
         AS hot_x_mean_ppm
FROM ranked, tot
WHERE rank <= {top_k}
ORDER BY rank
"""

def join_explosion_report(left: DataFrame, right: DataFrame,
                          left_key: str, right_key: str,
                          top_k: int = 10) -> DataFrame:
    """Join-cardinality pre-flight: EXACTLY how many rows an inner
    equi-join will emit — and which keys emit them — computed from the
    two per-key count tables WITHOUT running the join. The output of
    ``A ⋈ B`` on a key ``v`` is ``c_A(v)·c_B(v)``, so the predicted
    total is the integer sum of per-key products over matching keys.
    A many-to-many key (a hot user, a default URL, an empty string)
    shows up as a huge product long before it OOMs a 100 TB shuffle —
    this is the report to read before keying that join, alongside the
    per-side :func:`key_skew_report`.

    Per top-``top_k`` key by output contribution (count-desc,
    key-asc): both sides' row counts, the exact output rows, its exact
    ppm share of the predicted total, and the predicted total /
    matched-key count repeated for context. NULL keys never match in
    SQL join semantics and are excluded (standard inner-join reading).

    Scale shape: one map-side-combined groupBy per side (key-scale
    count tables), one equi-join of the COUNT TABLES (key-scale, never
    row-scale), then the two-phase top-k (per-partition candidate cut
    under the same total order — lossless for any placement — then a
    rank over ≤ partitions·top_k survivors). Totals come from the
    aggregate; no corpus-scale window anywhere."""
    from pyspark.sql import Window
    ca = (left.filter(F.col(left_key).isNotNull())
          .select(F.col(left_key).cast("string").alias("key"))
          .groupBy("key").agg(F.count("*").alias("ln")))
    cb = (right.filter(F.col(right_key).isNotNull())
          .select(F.col(right_key).cast("string").alias("key"))
          .groupBy("key").agg(F.count("*").alias("rn")))
    j = (ca.join(cb, "key")
         .withColumn("out_rows", (F.col("ln") * F.col("rn"))
                     .cast("long")))
    tot = j.agg(F.sum("out_rows").cast("long").alias("_t"),
                F.count("*").cast("long").alias("_k"))
    order = [F.desc("out_rows"), F.asc("key")]
    cand_w = Window.partitionBy("_pid").orderBy(*order)
    cand = (j.withColumn("_pid", F.spark_partition_id())
            .withColumn("_prn", F.row_number().over(cand_w))
            .filter(F.col("_prn") <= top_k)
            .drop("_pid", "_prn"))
    w = Window.orderBy(*order)
    return (cand.crossJoin(F.broadcast(tot))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("rank", "key",
                    F.col("ln").cast("long").alias("left_rows"),
                    F.col("rn").cast("long").alias("right_rows"),
                    "out_rows",
                    F.expr("out_rows * 1000000 div _t").cast("long")
                    .alias("share_ppm"),
                    F.col("_t").alias("predicted_rows"),
                    F.col("_k").alias("n_keys_matched"))
            .orderBy("rank"))


def join_explosion_sql(left_table: str, right_table: str,
                       left_key: str, right_key: str,
                       top_k: int = 10) -> str:
    """DuckDB twin of :func:`join_explosion_report`."""
    return f"""
WITH ca AS (
  SELECT CAST({left_key} AS VARCHAR) AS key,
         CAST(count(*) AS BIGINT) AS ln
  FROM {left_table} WHERE {left_key} IS NOT NULL GROUP BY 1),
cb AS (
  SELECT CAST({right_key} AS VARCHAR) AS key,
         CAST(count(*) AS BIGINT) AS rn
  FROM {right_table} WHERE {right_key} IS NOT NULL GROUP BY 1),
j AS (
  SELECT key, ln, rn, CAST(ln * rn AS BIGINT) AS out_rows
  FROM ca JOIN cb USING (key)),
tot AS (SELECT CAST(sum(out_rows) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS k FROM j),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY out_rows DESC, key) AS rank
  FROM j)
SELECT rank, key, ln AS left_rows, rn AS right_rows, out_rows,
       CAST(out_rows * 1000000 // t AS BIGINT) AS share_ppm,
       t AS predicted_rows, k AS n_keys_matched
FROM ranked, tot
WHERE rank <= {top_k}
ORDER BY rank
"""


def mutual_information_report(df: DataFrame, x_col: str,
                              y_col: str) -> DataFrame:
    """Dependence profile of two categorical columns: exact-count
    plug-in entropies H(X), H(Y), H(X,Y) and their mutual information
    — the redundancy pre-flight before treating two metadata fields as
    independent stratification keys (a high normalized MI between
    e.g. ``lang`` and ``source`` means stratifying on both double-
    counts the same structure) and the leakage check before using one
    field to predict another.

    Cross-engine exactness (the KN micro-nat discipline): every count
    is an exact BIGINT; each entropy TERM ``round(1e6·c·ln(n/c)/n)``
    is one fixed scalar expression tree over those integers rounded to
    a micro-nat BIGINT; per-entropy totals are INTEGER sums of the
    rounded terms (order-independent), and ``mi_micro = h_x + h_y −
    h_xy`` is an integer identity. ``nmi_bp`` normalizes by the
    entropy mean ``(h_x+h_y)/2`` with the slight-negative rounding
    residue clamped at 0 — Spark's ``div`` truncates while DuckDB's
    ``//`` floors, so negatives must never reach the division. Rows
    with a NULL in either column are excluded (a NULL category is its
    own upstream data-quality finding — :func:`table_profile` counts
    them).

    Scale shape: the corpus collapses to the (x, y) cell table in ONE
    map-side-combined groupBy; margins are groupBys OF THE CELL TABLE,
    the total is a 1-row broadcast, and every entropy fold runs at
    cell/margin scale. One corpus pass, no corpus-scale join or
    window."""
    pairs = (df.filter(F.col(x_col).isNotNull()
                       & F.col(y_col).isNotNull())
             .select(F.col(x_col).cast("string").alias("x"),
                     F.col(y_col).cast("string").alias("y"))
             .groupBy("x", "y").agg(F.count("*").alias("c")))
    cx = pairs.groupBy("x").agg(F.sum("c").alias("c"))
    cy = pairs.groupBy("y").agg(F.sum("c").alias("c"))
    tot = pairs.agg(F.sum("c").cast("long").alias("_n"))

    def _h(counts: DataFrame, alias: str) -> DataFrame:
        term = F.round(F.lit(1e6) * F.col("c")
                       * F.log(F.col("_n").cast("double") / F.col("c"))
                       / F.col("_n")).cast("long")
        return (counts.crossJoin(F.broadcast(tot))
                .agg(F.sum(term).cast("long").alias(alias),
                     F.count("*").cast("long").alias(f"_k_{alias}")))

    hx = _h(cx, "h_x_micro")
    hy = _h(cy, "h_y_micro")
    hxy = _h(pairs, "h_xy_micro")
    return (tot.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
            .crossJoin(F.broadcast(hxy))
            .select(F.col("_n").alias("n_rows"),
                    F.col("_k_h_x_micro").alias("n_x"),
                    F.col("_k_h_y_micro").alias("n_y"),
                    F.col("_k_h_xy_micro").alias("n_cells"),
                    "h_x_micro", "h_y_micro", "h_xy_micro",
                    F.expr("h_x_micro + h_y_micro - h_xy_micro")
                    .cast("long").alias("mi_micro"))
            .withColumn("nmi_bp", F.expr(
                "CASE WHEN h_x_micro + h_y_micro = 0 THEN 0 ELSE "
                "20000 * greatest(mi_micro, 0) "
                "div (h_x_micro + h_y_micro) END").cast("long")))


def mutual_information_sql(table: str, x_expr: str, y_expr: str) -> str:
    """DuckDB twin of :func:`mutual_information_report` — identical
    per-term micro-nat rounding and integer folds."""
    term = ("CAST(round(1e6 * c * ln(CAST(n AS DOUBLE) / c) / n) "
            "AS BIGINT)")
    return f"""
WITH base AS (
  SELECT CAST({x_expr} AS VARCHAR) AS x, CAST({y_expr} AS VARCHAR) AS y
  FROM {table}
  WHERE {x_expr} IS NOT NULL AND {y_expr} IS NOT NULL),
pairs AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY x, y),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pairs),
hx AS (SELECT CAST(sum({term}) AS BIGINT) AS h,
              CAST(count(*) AS BIGINT) AS k
       FROM (SELECT x, CAST(sum(c) AS BIGINT) AS c
             FROM pairs GROUP BY x), tot),
hy AS (SELECT CAST(sum({term}) AS BIGINT) AS h,
              CAST(count(*) AS BIGINT) AS k
       FROM (SELECT y, CAST(sum(c) AS BIGINT) AS c
             FROM pairs GROUP BY y), tot),
hxy AS (SELECT CAST(sum({term}) AS BIGINT) AS h,
               CAST(count(*) AS BIGINT) AS k
        FROM pairs, tot)
SELECT tot.n AS n_rows, hx.k AS n_x, hy.k AS n_y, hxy.k AS n_cells,
       hx.h AS h_x_micro, hy.h AS h_y_micro, hxy.h AS h_xy_micro,
       CAST(hx.h + hy.h - hxy.h AS BIGINT) AS mi_micro,
       CAST(CASE WHEN hx.h + hy.h = 0 THEN 0 ELSE
         (20000 * greatest(hx.h + hy.h - hxy.h, 0))
         // (hx.h + hy.h) END AS BIGINT) AS nmi_bp
FROM tot, hx, hy, hxy
"""


def benford_report(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-significant-digit audit of a positive numeric
    column — the forensic data-quality screen for invented or
    template-generated amounts (real multiplicative processes follow
    ``P(d) = log10(1+1/d)``; fabricated or uniformly-generated values
    don't, and TPC-H's uniform prices are a textbook violation the
    audit should FLAG). Per digit 1–9: exact count, observed ppm,
    Benford-expected ppm, signed deviation, and the digit's chi-square
    contribution — the row-wise decomposition an auditor reads to see
    WHICH digits carry the distortion.

    Exactness: values are fixed-pointed to exact integer cents
    (``round(x·100)`` — one IEEE round of the same double on both
    engines), the first digit is the leading character of the INTEGER
    rendering (integer→string is engine-identical; float formatting
    is not, which is why the cast happens after fix-pointing), the
    expected probabilities are driver-computed literals, and every
    report number is a per-term-rounded integer (the KN discipline).
    Non-positive and NULL values are excluded and do not count.

    Scale shape: one map-side-combined groupBy over a 9-value key —
    the corpus collapses to ≤ 9 rows in a single pass; everything
    after is literal arithmetic."""
    import math
    exp_ppm = {d: round(1e6 * math.log10(1 + 1 / d))
               for d in range(1, 10)}
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    base = (df.filter(F.col(value_col).isNotNull()
                      & (F.col(value_col) > 0))
            .select(digit.alias("digit"))
            .groupBy("digit").agg(F.count("*").alias("n")))
    tot = base.agg(F.sum("n").alias("_t"))
    ecase = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in exp_ppm.items()) + " END"
    return (base.crossJoin(F.broadcast(tot))
            .select("digit", F.col("n").cast("long").alias("n_values"),
                    F.expr("n * 1000000 div _t").cast("long")
                    .alias("obs_ppm"),
                    F.expr(ecase).cast("long").alias("exp_ppm"))
            .withColumn("dev_ppm",
                        (F.col("obs_ppm") - F.col("exp_ppm"))
                        .cast("long"))
            .withColumn("chi2_contrib_micro", F.round(
                F.lit(1e6)
                * (F.col("obs_ppm") - F.col("exp_ppm"))
                * (F.col("obs_ppm") - F.col("exp_ppm"))
                / (F.lit(1e6) * F.col("exp_ppm"))).cast("long"))
            .orderBy("digit"))


def benford_sql(table: str, value_expr: str) -> str:
    """DuckDB twin of :func:`benford_report` — identical fix-pointing,
    integer-string first digit, literal expectations."""
    import math
    exp_ppm = {d: round(1e6 * math.log10(1 + 1 / d))
               for d in range(1, 10)}
    ecase = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in exp_ppm.items()) + " END"
    return f"""
WITH base AS (
  SELECT CAST(substr(CAST(CAST(round(CAST({value_expr} AS DOUBLE)
                                     * 100) AS BIGINT) AS VARCHAR),
                     1, 1) AS INTEGER) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM {table}
  WHERE {value_expr} IS NOT NULL AND {value_expr} > 0
  GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM base)
SELECT digit, n AS n_values,
       CAST(n * 1000000 // t AS BIGINT) AS obs_ppm,
       CAST({ecase} AS BIGINT) AS exp_ppm,
       CAST(n * 1000000 // t - ({ecase}) AS BIGINT) AS dev_ppm,
       CAST(round(1e6 * (n * 1000000 // t - ({ecase}))
                  * (n * 1000000 // t - ({ecase}))
                  / (1e6 * ({ecase}))) AS BIGINT)
         AS chi2_contrib_micro
FROM base, tot
ORDER BY digit
"""


def group_trend_report(df: DataFrame, by: str, x_col: str,
                       y_col: str) -> DataFrame:
    """Per-group OLS trend line of ``y_col`` over ``x_col`` — the
    drift detector a corpus dashboard fits per source over ingestion
    order ("are this feed's documents getting shorter?"): slope,
    intercept, and r² from EXACT integer moments, one corpus pass.

    Exactness (the Neyman/correlations discipline): both columns must
    be integral; the five moment sums accumulate as decimal(38,0) —
    no float accumulation anywhere — so the OLS numerators
    ``num = n·Sxy − Sx·Sy``, ``dx = n·Sxx − Sx²``, ``dy = n·Syy −
    Sy²`` are exact integers (bound: |n·Sxy| < 10³⁸, i.e. corpus ×
    value products inside 38 digits — the module's documented decimal
    envelope). The final ratios are ONE fixed double expression each
    (exact-integer inputs, deterministic IEEE ops, rounded once):
    ``slope_micro = round(10⁶·num/dx)``, ``intercept_milli =
    round(10³·(Sy·dx − num·Sx)/(n·dx))``, ``r2_ppm =
    round(10⁶·num²/(dx·dy))``. Degenerate groups (constant x or
    constant y ⇒ dx·dy = 0) report NULLs — a trend over a constant
    axis is undefined, and both engines agree on the NULL.

    Scale shape: ONE map-side-combined aggregation to |groups| rows;
    everything after is per-row literal arithmetic on the metadata
    frame. The corpus is read once and never shuffled."""
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    st = (df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
          .groupBy(F.col(by).alias("g"))
          .agg(F.count("*").cast("decimal(38,0)").alias("n"),
               F.sum(x).alias("sx"), F.sum(y).alias("sy"),
               F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
               F.sum(x * y).alias("sxy")))
    st = (st.withColumn("num", F.expr("n * sxy - sx * sy"))
          .withColumn("dx", F.expr("n * sxx - sx * sx"))
          .withColumn("dy", F.expr("n * syy - sy * sy")))
    d = {c: F.col(c).cast("double") for c in
         ("n", "sx", "sy", "num", "dx", "dy")}
    bad = (F.col("dx") == 0) | (F.col("dy") == 0)
    return (st.select(
        F.col("g").alias(by),
        F.col("n").cast("long").alias("n_rows"),
        F.when(bad, F.lit(None)).otherwise(
            F.round(F.lit(1e6) * d["num"] / d["dx"]))
        .cast("long").alias("slope_micro"),
        F.when(bad, F.lit(None)).otherwise(
            F.round(F.lit(1e3) * (d["sy"] * d["dx"]
                                  - d["num"] * d["sx"])
                    / (d["n"] * d["dx"])))
        .cast("long").alias("intercept_milli"),
        F.when(bad, F.lit(None)).otherwise(
            F.round(F.lit(1e6) * d["num"] * d["num"]
                    / (d["dx"] * d["dy"])))
        .cast("long").alias("r2_ppm"))
        .orderBy(by))


def group_trend_sql(table: str, by: str, x_col: str,
                    y_col: str) -> str:
    """DuckDB twin of :func:`group_trend_report` — HUGEINT moment
    sums (the 128-bit twin of decimal-38), identical double trees."""
    return f"""
WITH st AS (
  SELECT {by} AS g, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST({x_col} AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST({y_col} AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST({x_col} AS HUGEINT)
                  * CAST({x_col} AS HUGEINT)) AS HUGEINT) AS sxx,
         CAST(sum(CAST({y_col} AS HUGEINT)
                  * CAST({y_col} AS HUGEINT)) AS HUGEINT) AS syy,
         CAST(sum(CAST({x_col} AS HUGEINT)
                  * CAST({y_col} AS HUGEINT)) AS HUGEINT) AS sxy
  FROM {table}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
  GROUP BY {by}),
mo AS (
  SELECT g, n, sx, sy,
         n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS dx,
         n * syy - sy * sy AS dy
  FROM st)
SELECT g AS {by}, CAST(n AS BIGINT) AS n_rows,
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE CAST(round(1e6 * CAST(num AS DOUBLE)
                            / CAST(dx AS DOUBLE)) AS BIGINT)
       END AS slope_micro,
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE CAST(round(1e3 * (CAST(sy AS DOUBLE)
                                   * CAST(dx AS DOUBLE)
                                   - CAST(num AS DOUBLE)
                                   * CAST(sx AS DOUBLE))
                            / (CAST(n AS DOUBLE)
                               * CAST(dx AS DOUBLE))) AS BIGINT)
       END AS intercept_milli,
       CASE WHEN dx = 0 OR dy = 0 THEN NULL
            ELSE CAST(round(1e6 * CAST(num AS DOUBLE)
                            * CAST(num AS DOUBLE)
                            / (CAST(dx AS DOUBLE)
                               * CAST(dy AS DOUBLE))) AS BIGINT)
       END AS r2_ppm
FROM mo ORDER BY {by}
"""


def dp_noisy_counts(df: DataFrame, by: str, epsilon_milli: int = 1000,
                    seed: int = 31) -> DataFrame:
    """Laplace-mechanism noisy counts per group — the
    differential-privacy release shape for a histogram (sensitivity 1:
    one row moves one count by one), completing the privacy family
    next to :func:`k_anonymity_report` / :func:`l_diversity_report`.
    Per group: the true count (for the calibration caller — drop the
    column before release), the Laplace noise drawn at scale
    ``b = 1000/epsilon_milli``, and the released noisy count clamped
    at 0.

    SEEDED form: the noise is the inverse-CDF
    ``−b·sign(u−½)·ln(1−2|u−½|)`` of the md5-uniform
    ``u = (h+½)/2³⁰`` keyed on (seed, group) — h ∈ [0, 2³⁰) makes u
    open-interval so the ln argument never reaches 0. A DETERMINISTIC
    seed makes the release reproducible and oracle-checkable (this
    module's contract) but is NOT private against an adversary who
    knows the seed — a production release swaps ``seed`` for a secret
    drawn once at release time; the mechanism, sensitivity and noise
    distribution are exactly the production ones. Noise is rounded to
    an integer count ONCE (geometric-mechanism style), so both
    engines release identical values.

    Scale shape: one map-side-combined groupBy to |groups| rows; the
    noise is per-GROUP literal arithmetic (no per-row randomness), so
    the corpus is read once and never shuffled."""
    if epsilon_milli <= 0:
        raise ValueError("epsilon_milli must be positive")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    b = 1000.0 / epsilon_milli
    cnt = (df.groupBy(F.col(by).cast("string").alias("g"))
           .agg(F.count("*").cast("long").alias("n")))
    u = ((F.pmod(md5_long(F.col("g"), seed=seed), F.lit(1 << 30))
          .cast("double") + F.lit(0.5)) / F.lit(float(1 << 30)))
    mag = F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5))
    noise = F.round(-F.lit(b) * F.signum(u - F.lit(0.5))
                    * F.log(mag)).cast("long")
    return (cnt.select(F.col("g").alias(by), "n",
                       noise.alias("noise"),
                       F.greatest(F.col("n") + noise, F.lit(0))
                       .cast("long").alias("n_noisy"))
            .orderBy(by))


def dp_noisy_counts_sql(table: str, by: str,
                        epsilon_milli: int = 1000,
                        seed: int = 31) -> str:
    """DuckDB twin of :func:`dp_noisy_counts` — identical md5-uniform,
    inverse-CDF tree, and single rounding."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    b = 1000.0 / epsilon_milli
    h = md5_long_sql("g", seed=seed)
    return f"""
WITH cnt AS (
  SELECT CAST({by} AS VARCHAR) AS g, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1),
nz AS (
  SELECT g, n,
         CAST(round(-{b!r} * sign(u - 0.5)
                    * ln(1 - 2 * abs(u - 0.5))) AS BIGINT) AS noise
  FROM (SELECT g, n,
               (CAST(({h}) % {1 << 30} AS DOUBLE) + 0.5)
               / {float(1 << 30)!r} AS u
        FROM cnt))
SELECT g AS {by}, n, noise,
       CAST(greatest(n + noise, 0) AS BIGINT) AS n_noisy
FROM nz ORDER BY {by}
"""


def t_closeness_report(df: DataFrame, quasi_cols: list[str],
                       sensitive_col: str,
                       t_milli: int = 200) -> DataFrame:
    """t-closeness audit (Li et al. 2007) — the step past
    :func:`l_diversity_report`: a class can hold l distinct sensitive
    values yet still leak by having a DIFFERENT distribution than the
    table (the skewness attack). For an ORDERED sensitive attribute
    the class-vs-global distance is the Earth Mover's Distance
    ``EMD = Σᵢ |CumP_class(i) − CumP_global(i)| / (m−1)`` over the
    global value order; classes with EMD > t are flagged. One summary
    row: (t_milli, n_rows, n_classes, n_weak_classes, n_risk_rows,
    risk_bp, max_t_milli).

    Exactness: the cumulative comparison is cross-multiplied —
    ``|N·cum_c(i) − n_c·cum_g(i)|`` over decimal(38,0)/HUGEINT
    products (no probability is ever floated), and the per-class
    ``emd_milli = 1000·Σ div (n_c·N·(m−1))`` is one integer division.
    NULL is a sensitive value ordered last (NULLS LAST on both
    engines, documented). Single-value domains (m = 1) have zero EMD
    by definition.

    Scale shape: corpus → (quasi, value) pair counts map-side; the
    audit grid is |classes|·m rows (broadcast value-domain cross
    join — the sensitive DOMAIN is audit-chosen and small); cumulative
    windows are partitioned per class over m-row partitions; classes
    fold to ONE metadata row."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    from pyspark.sql import Window
    q = [F.col(c) for c in quasi_cols]
    pairs = (df.groupBy(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                              for c in quasi_cols])
                        .alias("qk"),
                        F.col(sensitive_col).alias("v"))
             .agg(F.count("*").alias("c")))
    classes = pairs.groupBy("qk").agg(F.sum("c").alias("nc"))
    vals = (pairs.groupBy("v").agg(F.sum("c").alias("cg"))
            .withColumn("cumg", F.sum("cg").over(
                Window.orderBy(F.asc_nulls_last("v"))
                .rowsBetween(Window.unboundedPreceding, 0))))
    tot = vals.agg(F.sum("cg").cast("long").alias("N"),
                   F.count("*").cast("long").alias("m"))
    grid = (classes.crossJoin(F.broadcast(vals.select("v", "cumg")))
            .join(pairs, ["qk", "v"], "left")
            .withColumn("c", F.coalesce("c", F.lit(0)))
            .withColumn("cumc", F.sum("c").over(
                Window.partitionBy("qk")
                .orderBy(F.asc_nulls_last("v"))
                .rowsBetween(Window.unboundedPreceding, 0))))
    dec = "decimal(38,0)"
    emd = (grid.crossJoin(F.broadcast(tot))
           .withColumn("_rk", F.row_number().over(
               Window.partitionBy("qk")
               .orderBy(F.asc_nulls_last("v"))))
           .filter(F.col("_rk") < F.col("m"))   # i = 1..m-1
           .groupBy("qk")
           .agg(F.max("nc").alias("nc"), F.max("N").alias("N"),
                F.max("m").alias("m"),
                F.sum(F.abs(F.col("N").cast(dec) * F.col("cumc")
                            - F.col("nc").cast(dec) * F.col("cumg")))
                .alias("dsum"))
           .withColumn("emd_milli", F.expr(
               "CASE WHEN m <= 1 THEN 0 ELSE "
               "CAST((CAST(1000 AS decimal(38,0)) * dsum) div "
               "(CAST(nc AS decimal(38,0)) * N * (m - 1)) "
               "AS BIGINT) END")))
    # m=1 classes never enter emd (the i<m filter removes all rows);
    # re-attach them with zero distance
    emd = (classes.join(emd.select("qk", "emd_milli"), "qk", "left")
           .withColumn("emd_milli",
                       F.coalesce("emd_milli", F.lit(0))))
    return emd.agg(
        F.lit(t_milli).cast("long").alias("t_milli"),
        F.sum("nc").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.sum(F.when(F.col("emd_milli") > t_milli, 1).otherwise(0))
        .cast("long").alias("n_weak_classes"),
        F.sum(F.when(F.col("emd_milli") > t_milli, F.col("nc"))
              .otherwise(F.lit(0))).cast("long").alias("n_risk_rows"),
        F.expr(f"(10000 * sum(CASE WHEN emd_milli > {t_milli} "
               f"THEN nc ELSE 0 END)) div sum(nc)").cast("long")
        .alias("risk_bp"),
        F.max("emd_milli").cast("long").alias("max_t_milli"))


def t_closeness_sql(table: str, quasi_cols: list[str],
                    sensitive_col: str, t_milli: int = 200) -> str:
    """DuckDB twin of :func:`t_closeness_report` — identical grid,
    cross-multiplied HUGEINT cumulative comparison, integer folds.
    DuckDB truncating CAST on the emd division matches Spark's
    decimal-to-bigint CAST (both truncate the exact rational)."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    qk = " || chr(31) || ".join(
        f"CAST({c} AS VARCHAR)" for c in quasi_cols)
    return f"""
WITH pairs AS (
  SELECT ({qk}) AS qk, {sensitive_col} AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2),
classes AS (SELECT qk, CAST(sum(c) AS BIGINT) AS nc
            FROM pairs GROUP BY qk),
vals AS (
  SELECT v, cg, CAST(sum(cg) OVER (ORDER BY v ASC NULLS LAST
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumg
  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cg
        FROM pairs GROUP BY v)),
tot AS (SELECT CAST(sum(cg) AS BIGINT) AS N,
               CAST(count(*) AS BIGINT) AS m FROM vals),
grid AS (
  SELECT cl.qk, cl.nc, va.v, va.cumg,
         CAST(sum(coalesce(p.c, 0)) OVER (PARTITION BY cl.qk
              ORDER BY va.v ASC NULLS LAST
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumc,
         row_number() OVER (PARTITION BY cl.qk
                            ORDER BY va.v ASC NULLS LAST) AS rk
  FROM classes cl CROSS JOIN vals va
  LEFT JOIN pairs p ON p.qk = cl.qk
    AND (p.v = va.v OR (p.v IS NULL AND va.v IS NULL))),
emd0 AS (
  SELECT g.qk, max(g.nc) AS nc,
         CAST(CASE WHEN max(t.m) <= 1 THEN 0 ELSE
           1000 * sum(abs(CAST(t.N AS HUGEINT) * g.cumc
                          - CAST(g.nc AS HUGEINT) * g.cumg))
           // (CAST(max(g.nc) AS HUGEINT) * max(t.N)
               * (max(t.m) - 1)) END AS BIGINT) AS emd_milli
  FROM grid g, tot t
  WHERE g.rk < t.m
  GROUP BY g.qk),
emd AS (
  SELECT c.qk, c.nc, coalesce(e.emd_milli, 0) AS emd_milli
  FROM classes c LEFT JOIN emd0 e USING (qk))
SELECT CAST({t_milli} AS BIGINT) AS t_milli,
       CAST(sum(nc) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN emd_milli > {t_milli} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weak_classes,
       CAST(sum(CASE WHEN emd_milli > {t_milli} THEN nc ELSE 0 END)
            AS BIGINT) AS n_risk_rows,
       CAST((10000 * sum(CASE WHEN emd_milli > {t_milli}
                         THEN nc ELSE 0 END)) // sum(nc) AS BIGINT)
         AS risk_bp,
       CAST(max(emd_milli) AS BIGINT) AS max_t_milli
FROM emd
"""
