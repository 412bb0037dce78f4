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
    (column, n_rows, n_null, n_distinct_est)."""
    if not cols:
        raise ValueError("profile at least one column")
    parts = []
    for c in cols:
        counts = df.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias("n_null"))
        est = hll_estimate(
            hll_registers(df.filter(F.col(c).isNotNull()), c,
                          p=p, seed=seed), p=p) \
            .select(F.col("estimate").alias("n_distinct_est"))
        parts.append(counts.crossJoin(est)     # two 1-row frames
                     .select(F.lit(c).alias("column"),
                             "n_rows", "n_null", "n_distinct_est"))
    out = parts[0]
    for piece in parts[1:]:
        out = out.unionByName(piece)
    return out


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
