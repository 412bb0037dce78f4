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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.session import checkpoint_df


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


def global_ranks(df: DataFrame, order_cols: list[Column],
                 rank_col: str = "_rank",
                 total_col: str = "_n") -> DataFrame:
    """Exact 1-based global ``row_number`` under a TOTAL order without a
    single-task global sort — the distributed two-phase rank:

    1. ``repartitionByRange`` on the sort key: one sampled range shuffle;
       partition ids ascend with the order, ties spread by the caller's
       tiebreak column (the order must be total — strict, no duplicate
       keys — or ranks of tied rows are partition-placement-dependent).
    2. Freeze the placement with :func:`checkpoint_df`: both downstream
       consumers (the ranked rows and the per-partition sizes) must read
       the SAME materialized placement — a recompute would re-sample
       range boundaries and silently mis-rank (the pps_systematic
       checkpoint discipline).
    3. ``row_number`` within each frozen partition (balanced, never the
       whole frame in one task) + broadcast per-partition offsets.
       Offsets are partition-COUNT-scale metadata (≤ shuffle
       partitions), so their cumulative window is a metadata window —
       the dense_rank_palette precedent, not a corpus sort.

    Adds ``rank_col`` (1-based global rank) and ``total_col`` (total row
    count) to ``df``. Cost: one range shuffle + one checkpoint + one
    hash shuffle of the frame — each task holds one partition, so no
    executor ever sorts more than ``|df| / num_partitions`` rows.
    """
    part = (df.repartitionByRange(*order_cols)
            .withColumn("_pid", F.spark_partition_id()))
    # lazy is safe here: both branches reference the SAME checkpointed
    # RDD instance, so the placement materializes once (block-locked)
    # and each branch reads identical frozen blocks — while eager would
    # add a blocking job per call.
    frozen = checkpoint_df(part, eager=False)
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = frozen.withColumn("_rn", F.row_number().over(w))
    sizes = frozen.groupBy("_pid").agg(F.count("*").alias("_c"))
    w_off = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    w_tot = (Window.orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    offs = sizes.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_tot).alias(total_col))
    return (ranked.join(F.broadcast(offs), "_pid")
            .withColumn(rank_col,
                        (F.col("_off") + F.col("_rn")).cast("long"))
            .drop("_pid", "_rn", "_off"))


def ntile_from_rank(rank_col: str, total_col: str, n_tiles: int) -> Column:
    """SQL-standard ``ntile(n)`` computed arithmetically from a global
    rank — the first ``N mod n`` tiles take ``ceil(N/n)`` rows, the rest
    ``floor(N/n)`` — so a distributed rank (:func:`global_ranks`)
    replaces the partition-less ``ntile`` window exactly, ties and all.
    Pure integer arithmetic: engine-identical by construction."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles {n_tiles} must be >= 1")
    r, n = rank_col, total_col
    return F.expr(f"""CAST(CASE
        WHEN {n} div {n_tiles} = 0 THEN {r}
        WHEN {r} <= ({n} % {n_tiles}) * ({n} div {n_tiles} + 1)
          THEN ({r} + {n} div {n_tiles}) div ({n} div {n_tiles} + 1)
        ELSE {n} % {n_tiles}
             + ({r} - ({n} % {n_tiles}) * ({n} div {n_tiles} + 1)
                + {n} div {n_tiles} - 1) div ({n} div {n_tiles})
      END AS BIGINT)""")


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


def weighted_group_quantiles(df: DataFrame, by: str, value_col: str,
                             weight_col, percents: list[int]) -> DataFrame:
    """Exact WEIGHTED lower quantiles per group: the smallest value v
    whose cumulative weight reaches ⌈p·W/100⌉ — "the median TOKEN sits
    in a document of length v", not "the median document has length v".
    Training corpora are consumed token-weighted, so capacity/packing
    decisions need this form; the unweighted :func:`group_quantiles` is
    the degenerate weight≡1 case.

    ``weight_col`` is a column name or Column of non-negative integers
    (callers fix-point scale fractional weights first — exactness
    contract). Same scale shape as the unweighted walk: one map-side-
    combined fold to the (group, value) domain, a domain-scale
    cumulative window (partitioned by group), integer targets —
    zero-weight values participate in the domain but never satisfy a
    target before a weighted one does at the same value (cum is
    unchanged), so they cannot shift a pick.

    Returns (by, total_w, p<q>…) with ``total_w`` the group's exact
    weight mass.
    """
    _validate(percents)
    v = F.col(value_col).cast("long")
    wc = (F.col(weight_col) if isinstance(weight_col, str)
          else weight_col).cast("long")
    hist = (df.select(F.col(by).alias("g"), v.alias("v"),
                      wc.alias("_w"))
            .groupBy("g", "v").agg(F.sum("_w").alias("c")))
    w = Window.partitionBy("g").orderBy("v")
    tot = hist.groupBy("g").agg(F.sum("c").alias("_n"))
    cum = (hist.join(F.broadcast(tot), "g")
           .withColumn("_cum", F.sum("c").over(w)))
    aggs = [F.max("_n").cast("long").alias("total_w")]
    for p in percents:
        target = F.expr(f"(_n * {p} + 99) div 100")
        aggs.append(F.min(F.when(F.col("_cum") >= target, F.col("v")))
                    .cast("long").alias(f"p{p}"))
    return (cum.groupBy("g").agg(*aggs)
            .withColumnRenamed("g", by))


def weighted_group_quantiles_sql(table: str, by: str, value_col: str,
                                 weight_sql: str,
                                 percents: list[int]) -> str:
    """DuckDB twin of :func:`weighted_group_quantiles` — identical
    weighted histogram, cumulative walk and integer targets."""
    _validate(percents)
    picks = ", ".join(
        f"CAST(min(CASE WHEN cum >= (n * {p} + 99) // 100 THEN v END) "
        f"AS BIGINT) AS p{p}" for p in percents)
    return f"""
WITH hist AS (
  SELECT {by} AS g, CAST({value_col} AS BIGINT) AS v,
         CAST(sum(CAST({weight_sql} AS BIGINT)) AS BIGINT) AS c
  FROM {table} GROUP BY 1, 2),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY g),
cum AS (
  SELECT h.g, h.v, t.n,
         sum(h.c) OVER (PARTITION BY h.g ORDER BY h.v) AS cum
  FROM hist h JOIN tot t USING (g))
SELECT g AS {by}, CAST(max(n) AS BIGINT) AS total_w, {picks}
FROM cum GROUP BY g"""
