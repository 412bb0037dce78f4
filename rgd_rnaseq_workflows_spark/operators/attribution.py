"""Multi-touch conversion attribution over an event stream.

The marketing-warehouse classic the events family was still missing:
credit each conversion's value to the touch events (clicks, views)
that preceded it within a lookback window, under the three standard
models — first-touch, last-touch, linear — and roll the credit up per
(model, touch type). The reference's pipeline answers the analogous
question per-sample ("which upstream stage produced this unit";
`scripts/pSTARQC_v1.sh` status lineage) with ad-hoc scripts; this is
the generalized event-lineage form.

Exactness contract (the events-family oracle discipline): times are
epoch SECONDS (integer), money is exact CENTS (``round(value*100)``
once, then integers everywhere). The linear split is integer division
with the remainder cents going to the MOST RECENT touches (rank by
``sec desc, id desc``) — so ``sum(credit) == conversion cents``
exactly, per conversion, on every engine; no floating credit anywhere.

Scale shape: one user-keyed equi-join (conversions × touches of the
same user, range-filtered to the lookback — the pair count is bounded
by touches-per-conversion-window, never |touches|²); per-conversion
ranks ride windows PARTITIONED by conversion id (bounded by the same
lookback fan-out); the final rollup is models × touch-types metadata.
A 10^9-user deployment shuffles each side once on user_id — no global
window, no cross join, no driver state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MODELS = ("first_touch", "last_touch", "linear")
DIRECT = "(direct)"


def multi_touch_attribution(events: DataFrame,
                            conv_type: str = "purchase",
                            touch_types: Sequence[str] = ("click", "view"),
                            lookback_sec: int = 48 * 3600,
                            user_col: str = "user_id",
                            type_col: str = "event_type",
                            sec_col: str = "sec",
                            value_col: str = "value",
                            id_col: str = "event_id") -> DataFrame:
    """(model, touch_type, n_pairs, credited_cents) — conversion value
    attributed per model. ``n_pairs`` counts the credited touchpoints
    that model considers (1/conversion for first/last, every in-window
    touch for linear, the conversion itself for ``(direct)`` rows —
    conversions with no in-window touch, fully credited per model)."""
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if lookback_sec < 1:
        raise ValueError("lookback_sec must be >= 1")
    sec = F.col(sec_col).cast("long")
    # value >= 0 is a hard contract (NULL reads as 0): Spark div/%
    # truncate toward zero while DuckDB // floors, so negative cents
    # would break sum(credit) == cents AND cross-engine equality.
    # Refunds must be netted out upstream; we fail loudly instead of
    # mis-crediting.
    val = F.coalesce(F.col(value_col), F.lit(0.0))
    cents = F.when(val >= 0, F.round(val * 100).cast("long")).otherwise(
        F.raise_error(F.lit(
            "multi_touch_attribution: negative conversion value — "
            "value >= 0 required (net refunds upstream)")).cast("long"))
    conv = (events.filter(F.col(type_col) == conv_type)
            .select(F.col(user_col).alias("u"),
                    F.col(id_col).alias("conv_id"),
                    sec.alias("conv_sec"),
                    cents.alias("cents")))
    touch = (events.filter(F.col(type_col).isin(list(touch_types)))
             .select(F.col(user_col).alias("u"),
                     F.col(id_col).alias("touch_id"),
                     sec.alias("touch_sec"),
                     F.col(type_col).alias("touch_type")))
    j = conv.join(touch, ["u"]).filter(
        (F.col("touch_sec") < F.col("conv_sec"))
        & (F.col("touch_sec") >= F.col("conv_sec") - lookback_sec))
    w = Window.partitionBy("conv_id")
    asc = w.orderBy(F.col("touch_sec").asc(), F.col("touch_id").asc())
    desc = w.orderBy(F.col("touch_sec").desc(), F.col("touch_id").desc())
    ranked = (j.withColumn("rn_asc", F.row_number().over(asc))
              .withColumn("rn_desc", F.row_number().over(desc))
              .withColumn("n", F.count("*").over(w)))
    entry = "named_struct('model', {m}, 'tt', touch_type, 'credit', {c})"
    stacked = ranked.select(F.explode(F.array(
        F.when(F.col("rn_asc") == 1,
               F.expr(entry.format(m="'first_touch'", c="cents"))),
        F.when(F.col("rn_desc") == 1,
               F.expr(entry.format(m="'last_touch'", c="cents"))),
        F.expr(entry.format(
            m="'linear'",
            c="cents div n + CAST(rn_desc <= cents % n AS BIGINT)")),
    )).alias("s")).filter(F.col("s").isNotNull()).select("s.*")
    direct = (conv.join(j.select("conv_id").distinct(), "conv_id",
                        "left_anti")
              .select(F.explode(F.array(
                  *[F.expr(entry.format(m=f"'{m}'", c="cents")
                           .replace("touch_type", f"'{DIRECT}'"))
                    for m in MODELS])).alias("s"))
              .select("s.*"))
    return (stacked.unionByName(direct)
            .groupBy(F.col("model"), F.col("tt").alias("touch_type"))
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.sum("credit").cast("long").alias("credited_cents"))
            .orderBy("model", "touch_type"))


def multi_touch_attribution_sql(src: str, conv_type: str = "purchase",
                                touch_types: Sequence[str] = ("click",
                                                              "view"),
                                lookback_sec: int = 48 * 3600,
                                user_col: str = "user_id",
                                type_col: str = "event_type",
                                sec_col: str = "sec",
                                value_col: str = "value",
                                id_col: str = "event_id") -> str:
    """DuckDB twin of :func:`multi_touch_attribution` — identical join
    range, rank tiebreaks and integer remainder allocation. ``src``
    must yield (user, type, sec, value, id)."""
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    if lookback_sec < 1:
        raise ValueError("lookback_sec must be >= 1")
    tt = ", ".join("'{}'".format(t.replace("'", "''"))
                   for t in touch_types)
    return f"""
WITH ev AS ({src}),
conv AS (
  SELECT {user_col} AS u, {id_col} AS conv_id,
         CAST({sec_col} AS BIGINT) AS conv_sec,
         CASE WHEN coalesce({value_col}, 0) >= 0
              THEN CAST(round(coalesce({value_col}, 0) * 100) AS BIGINT)
              ELSE error('multi_touch_attribution: negative conversion '
                         'value - value >= 0 required') END AS cents
  FROM ev WHERE {type_col} = '{conv_type}'),
touch AS (
  SELECT {user_col} AS u, {id_col} AS touch_id,
         CAST({sec_col} AS BIGINT) AS touch_sec,
         {type_col} AS touch_type
  FROM ev WHERE {type_col} IN ({tt})),
j AS (
  SELECT c.*, t.touch_id, t.touch_sec, t.touch_type
  FROM conv c JOIN touch t ON c.u = t.u
  WHERE t.touch_sec < c.conv_sec
    AND t.touch_sec >= c.conv_sec - {lookback_sec}),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY conv_id
                       ORDER BY touch_sec, touch_id) AS rn_asc,
    row_number() OVER (PARTITION BY conv_id
                       ORDER BY touch_sec DESC, touch_id DESC) AS rn_desc,
    count(*) OVER (PARTITION BY conv_id) AS n
  FROM j),
stacked AS (
  SELECT 'first_touch' AS model, touch_type AS tt, cents AS credit
  FROM ranked WHERE rn_asc = 1
  UNION ALL
  SELECT 'last_touch', touch_type, cents FROM ranked WHERE rn_desc = 1
  UNION ALL
  SELECT 'linear', touch_type,
         cents // n + CAST(rn_desc <= cents % n AS BIGINT)
  FROM ranked
  UNION ALL
  SELECT m.model, '{DIRECT}', c.cents
  FROM conv c CROSS JOIN (VALUES ('first_touch'), ('last_touch'),
                                 ('linear')) m(model)
  WHERE c.conv_id NOT IN (SELECT conv_id FROM j))
SELECT model, tt AS touch_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(credit) AS BIGINT) AS credited_cents
FROM stacked GROUP BY 1, 2
"""
