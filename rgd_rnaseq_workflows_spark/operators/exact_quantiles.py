"""Exact per-group quantiles over bounded integer domains.

``agg_percentiles``' documented caveat is that an exact percentile
buffers every value per group — fine as a correctness gate, wrong at
100 TB. But integer measures with bounded domains (quantities, token
counts, char lengths, star ratings, ports, status codes) admit an
EXACT path that scales: collapse corpus rows into a (group, value)
HISTOGRAM first (map-side combine does most of it before the shuffle),
then read every requested quantile off one cumulative running-sum walk
over the domain-scale histogram. Memory and shuffle are |domain| rows
per group, independent of corpus size — α≈0 by construction
(``quality_length_outliers``' sweep measured exactly that for the
median/MAD special case this generalizes).

Quantile definition (lower / type-1): the smallest value whose
cumulative count reaches ``ceil(q·n/100)`` — pure integer arithmetic
(``(n·q + 99) div 100``), so every engine picks the identical value;
no interpolation, no doubles anywhere.

Plan shape: one corpus-scale histogram aggregation, one histogram-
scale window (partitions are |domain| rows), one conditional-min
aggregation producing all requested quantiles in a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _validate(percents: list[int]) -> None:
    if not percents:
        raise ValueError("need at least one percentile")
    if any(not 0 < p <= 100 for p in percents):
        raise ValueError(f"percents {percents} must lie in (0, 100]")


def group_quantiles(df: DataFrame, by: str, value_col: str,
                    percents: list[int]) -> DataFrame:
    """(by, n_rows, p<q> for each requested percentile) — exact lower
    quantiles of ``value_col`` (cast to long) per group."""
    _validate(percents)
    v = F.col(value_col).cast("long")
    hist = (df.select(F.col(by).alias("g"), v.alias("v"))
            .groupBy("g", "v").agg(F.count("*").alias("c")))
    w = Window.partitionBy("g").orderBy("v")
    tot = hist.groupBy("g").agg(F.sum("c").alias("_n"))
    cum = (hist.join(F.broadcast(tot), "g")
           .withColumn("_cum", F.sum("c").over(w)))
    aggs = [F.max("_n").cast("long").alias("n_rows")]
    for p in percents:
        target = F.expr(f"(_n * {p} + 99) div 100")
        aggs.append(F.min(F.when(F.col("_cum") >= target, F.col("v")))
                    .cast("long").alias(f"p{p}"))
    return (cum.groupBy("g").agg(*aggs)
            .withColumnRenamed("g", by))


def group_quantiles_sql(table: str, by: str, value_col: str,
                        percents: list[int]) -> str:
    """DuckDB twin of :func:`group_quantiles` (identical histogram,
    cumulative walk and integer targets)."""
    _validate(percents)
    picks = ", ".join(
        f"CAST(min(CASE WHEN cum >= (n * {p} + 99) // 100 THEN v END) "
        f"AS BIGINT) AS p{p}" for p in percents)
    return f"""
WITH hist AS (
  SELECT {by} AS g, CAST({value_col} AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY g),
cum AS (
  SELECT h.g, h.v, t.n,
         sum(h.c) OVER (PARTITION BY h.g ORDER BY h.v) AS cum
  FROM hist h JOIN tot t USING (g))
SELECT g AS {by}, CAST(max(n) AS BIGINT) AS n_rows, {picks}
FROM cum GROUP BY g"""
