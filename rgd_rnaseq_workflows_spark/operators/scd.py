"""SCD2 (slowly-changing-dimension type 2) history builder.

A corpus lake tracks attributes that change over time — a document's
license, a source's crawl policy, a user's consent state. Auditing and
point-in-time reconstruction ("what was the license when we trained?")
need the VERSIONED form: one row per (entity, attribute-run) with a
validity interval, not one row per observation. This operator collapses
an observation stream into that SCD2 history — the warehouse pattern
behind dimension versioning, expressed as two windows and one
aggregation (gaps-and-islands), no self-joins.

Determinism contract: observations are totally ordered per entity by
(order column, tiebreak column); runs of consecutive IDENTICAL
attribute values (NULL-safe comparison — NULL is a value, and a
NULL→value flip is a new version) collapse into one row. The engine
works at the order column's own granularity; the registry query feeds
epoch SECONDS (+ event_id tiebreak), the events-family convention that
sidesteps sub-second timestamp precision skew between engines.

Scale shape: one shuffle on the entity key serves both windows (same
partitioning: change-flag + running run-id, then the lead over runs
rides the run-scale frame), then one map-side-combined aggregation.
History output is runs-scale, far smaller than observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(obs: DataFrame, key: str = "user_id",
                 attr: str = "event_type", order_col: str = "sec",
                 tiebreak: str = "event_id") -> DataFrame:
    """(key, attr, valid_from, valid_to, n_obs, is_current): one row
    per consecutive run of the same ``attr`` value per ``key``;
    ``valid_to`` = the next run's ``valid_from`` (NULL on the open
    current version)."""
    w = Window.partitionBy(key).orderBy(order_col, tiebreak)
    prev = F.lag(F.col(attr)).over(w)
    first = F.row_number().over(w) == 1
    chg = F.when(first | ~F.col(attr).eqNullSafe(prev), 1).otherwise(0)
    runs = (obs
            .withColumn("_chg", chg)
            .withColumn("_run", F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    hist = (runs.groupBy(key, "_run", attr)
            .agg(F.min(order_col).cast("long").alias("valid_from"),
                 F.count("*").cast("long").alias("n_obs")))
    w2 = Window.partitionBy(key).orderBy("_run")
    return (hist
            .withColumn("valid_to", F.lead("valid_from").over(w2))
            .select(key, attr, "valid_from", "valid_to", "n_obs",
                    F.col("valid_to").isNull().alias("is_current")))


def scd2_history_sql(obs_sql: str, key: str = "user_id",
                     attr: str = "event_type", order_col: str = "sec",
                     tiebreak: str = "event_id") -> str:
    """DuckDB twin of :func:`scd2_history`. ``obs_sql`` must yield
    columns (key, attr, order_col, tiebreak)."""
    return f"""
WITH obs AS ({obs_sql}),
flagged AS (
  SELECT *, CASE WHEN lag({attr}) OVER w IS NOT DISTINCT FROM {attr}
                  AND row_number() OVER w > 1
            THEN 0 ELSE 1 END AS chg
  FROM obs
  WINDOW w AS (PARTITION BY {key} ORDER BY {order_col}, {tiebreak})),
runs AS (
  SELECT *, sum(chg) OVER (PARTITION BY {key}
                           ORDER BY {order_col}, {tiebreak}
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM flagged),
hist AS (
  SELECT {key}, run, {attr},
         CAST(min({order_col}) AS BIGINT) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM runs GROUP BY {key}, run, {attr})
SELECT {key}, {attr}, valid_from,
       lead(valid_from) OVER w2 AS valid_to, n_obs,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM hist
WINDOW w2 AS (PARTITION BY {key} ORDER BY run)"""
