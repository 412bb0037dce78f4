"""Ordered multi-step funnel analysis over an event stream.

The classic product-analytics question the reference's pipeline answers
per-sample with ad-hoc scripts (how many units pass QC, then alignment,
then quantification — `scripts/pSTARQC_v1.sh` status gating generalized
to ordered event sequences): for an ordered list of step event types,
how many users reached step k, where step k's time is the EARLIEST
event of that type STRICTLY AFTER the user's step-(k-1) time.

Exactness contract (the engine's oracle discipline): step times are
epoch SECONDS (``CAST(ts AS BIGINT)`` — floor; the same
``floor(epoch(ts))`` the sessionize/interval-join oracles pin), so
every comparison and gap is integer arithmetic; the only doubles are
single divisions of exact integers, rounded once.

Scale shape — ONE shuffle, no joins, no window sort:
- filter to the step types (pushed to the scan), project
  (user, type, tsec);
- groupBy(user) collecting one SORTED per-step second-array via
  ``array_sort(collect_list(when(type = step, tsec)))`` — map-side
  combined, per-user state bounded by that user's step events;
- the step-time chain is a pure JVM expression over those arrays:
  ``t1 = a1[0]``, ``t_k = filter(a_k, x > t_{k-1})[0]`` — whole-stage
  codegen, no Python;
- the final report folds user-scale rows into len(steps) rows with one
  more map-side-combined aggregation.

A per-user sorted fold (collect full event list) would carry event
text; this carries only per-step second arrays. Skewed users (bots with
millions of events) bound the array: cap upstream with ``cap_per_key``
if a hard bound is needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_steps(events: DataFrame, steps: Sequence[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      max_gap_seconds: int | None = None) -> DataFrame:
    """Per-user step times: (user, t1 .. tN) epoch seconds, ``t_k`` the
    earliest step-k event strictly after ``t_{k-1}`` (NULL = never
    reached — and then every later step is NULL too). With
    ``max_gap_seconds`` set, step k must also land within that many
    seconds of step k-1 (the conversion-window form every funnel tool
    offers); a later matching event OUTSIDE the window does not count —
    the funnel is first-chance, not best-chance."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    if max_gap_seconds is not None and max_gap_seconds <= 0:
        raise ValueError("max_gap_seconds must be positive")
    arrs = [F.array_sort(F.collect_list(
        F.when(F.col(type_col) == s, F.col("_tsec")))).alias(f"_a{i}")
        for i, s in enumerate(steps)]
    per = (events.filter(F.col(type_col).isin(list(steps)))
           .select(F.col(user_col).alias("user"), F.col(type_col),
                   F.col(ts_col).cast("long").alias("_tsec"))
           .groupBy("user").agg(*arrs))
    # F.get is 0-based and NULL-on-missing under ANSI too (element_at
    # would error on an empty array with ansi.enabled=true)
    out = per.select("*", F.get(F.col("_a0"), 0).alias("t1"))
    for i in range(1, len(steps)):
        prev = F.col(f"t{i}")
        if max_gap_seconds is None:
            cond = lambda x: x > prev
        else:
            cond = lambda x: (x > prev) & (x <= prev + max_gap_seconds)
        nxt = F.get(F.filter(F.col(f"_a{i}"), cond), 0)
        out = out.select(
            "*", F.when(prev.isNotNull(), nxt).alias(f"t{i + 1}"))
    return out.select(F.col("user").alias(user_col),
                      *[f"t{i + 1}" for i in range(len(steps))])


def funnel_report(events: DataFrame, steps: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  max_gap_seconds: int | None = None) -> DataFrame:
    """len(steps) rows: (step_idx, step, n_users, conversion,
    sum_gap_seconds, mean_gap_seconds) — ``conversion`` = n_users at
    step k / n_users at step 1; gaps are from the previous step (NULL
    for step 1). All counts/sums exact BIGINT; the two ratios are
    single divisions rounded to 6."""
    per = funnel_user_steps(events, steps, user_col, ts_col, type_col,
                            max_gap_seconds)
    aggs = []
    for i in range(len(steps)):
        aggs.append(F.count(F.col(f"t{i + 1}")).alias(f"n{i + 1}"))
        if i > 0:
            aggs.append(F.sum(F.col(f"t{i + 1}") - F.col(f"t{i}"))
                        .cast("long").alias(f"g{i + 1}"))
    one = per.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"n{i + 1}").cast("long").alias("n_users"),
            F.round(F.col(f"n{i + 1}")
                    / F.when(F.col("n1") > 0, F.col("n1")).cast("double"),
                    6).alias("conversion"),
            (F.col(f"g{i + 1}").cast("long") if i > 0
             else F.lit(None).cast("long")).alias("sum_gap_seconds"),
            (F.round(F.col(f"g{i + 1}")
                     / F.when(F.col(f"n{i + 1}") > 0,
                              F.col(f"n{i + 1}")).cast("double"), 6)
             if i > 0 else F.lit(None).cast("double"))
            .alias("mean_gap_seconds"))
        for i, s in enumerate(steps)])
    return (one.select(F.explode(rows).alias("r")).select("r.*"))


def funnel_report_sql(src: str, steps: Sequence[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      max_gap_seconds: int | None = None) -> str:
    """DuckDB twin of :func:`funnel_report` — identical floor-seconds
    step times via the same sorted-array + list_filter chain."""
    in_list = ", ".join(f"'{s}'" for s in steps)
    arrs = ",\n         ".join(
        f"list_sort(list(tsec) FILTER (WHERE {type_col} = '{s}')) AS a{i}"
        for i, s in enumerate(steps))
    tchain = ["a0[1] AS t1"]
    for i in range(1, len(steps)):
        gap = ("" if max_gap_seconds is None
               else f" AND x <= t{i} + {max_gap_seconds}")
        tchain.append(
            f"CASE WHEN t{i} IS NOT NULL THEN "
            f"(list_filter(a{i}, x -> x > t{i}{gap}))[1] END AS t{i + 1}")
    # DuckDB resolves lateral column references via nested selects
    tsel = "SELECT user_id_, " + tchain[0] + ", " + \
        ", ".join(f"a{i}" for i in range(1, len(steps))) + " FROM per"
    for i in range(1, len(steps)):
        keep = ", ".join(f"a{j}" for j in range(i + 1, len(steps)))
        keep = (", " + keep) if keep else ""
        tsel = (f"SELECT user_id_, "
                + ", ".join(f"t{j}" for j in range(1, i + 1))
                + f", {tchain[i]}{keep} FROM ({tsel})")
    step_rows = []
    for i, s in enumerate(steps):
        gap_n = f"CAST(g{i + 1} AS BIGINT)" if i > 0 else "CAST(NULL AS BIGINT)"
        gap_m = (f"round(CAST(g{i + 1} AS DOUBLE) / "
                 f"(CASE WHEN n{i + 1} > 0 THEN n{i + 1} END), 6)"
                 if i > 0 else "CAST(NULL AS DOUBLE)")
        step_rows.append(
            f"SELECT {i + 1} AS step_idx, '{s}' AS step, "
            f"CAST(n{i + 1} AS BIGINT) AS n_users, "
            f"round(CAST(n{i + 1} AS DOUBLE) / "
            f"(CASE WHEN n1 > 0 THEN n1 END), 6) AS conversion, "
            f"{gap_n} AS sum_gap_seconds, {gap_m} AS mean_gap_seconds "
            "FROM one")
    aggs = []
    for i in range(len(steps)):
        aggs.append(f"count(t{i + 1}) AS n{i + 1}")
        if i > 0:
            aggs.append(f"CAST(sum(t{i + 1} - t{i}) AS BIGINT) AS g{i + 1}")
    return f"""
WITH f AS (
  SELECT {user_col} AS user_id_, {type_col},
         CAST(floor(epoch({ts_col})) AS BIGINT) AS tsec
  FROM {src} WHERE {type_col} IN ({in_list})),
per AS (
  SELECT user_id_,
         {arrs}
  FROM f GROUP BY user_id_),
times AS ({tsel}),
one AS (SELECT {", ".join(aggs)} FROM times)
{" UNION ALL ".join(step_rows)}"""


# --- cohort retention ---------------------------------------------------------

def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_seconds: int = 86_400) -> DataFrame:
    """Cohort retention matrix: users cohorted by their FIRST activity
    bucket (epoch-day by default); one row per (cohort, offset) with
    the number of cohort users active ``offset`` buckets later and the
    retention fraction.

    Output: (cohort_bucket, bucket_offset, n_active, n_cohort,
    retention) — counts exact BIGINT, ``retention`` a single division
    rounded to 6. ``bucket_offset`` 0 is the cohort's first bucket, so
    every cohort has an offset-0 row with retention 1.0 only if all
    cohort users were active that bucket (they were, by definition).

    Scale shape: epoch-second integer semantics throughout (the funnel
    module's contract). Three shuffles, all on compact keys:
    groupBy(user) for first-activity; distinct (user, bucket) — both
    map-side combined; the activity×cohort join co-locates on the user
    key; the final rollup shuffles (cohort, offset) pairs. Cohort sizes
    are bucket-scale and broadcast back.
    """
    tsec = F.col(ts_col).cast("long")
    bucket = F.floor(tsec / F.lit(bucket_seconds)).cast("long")
    act = (events.select(F.col(user_col).alias("user"),
                         bucket.alias("b")).distinct())
    first = act.groupBy("user").agg(F.min("b").alias("cohort_bucket"))
    sizes = first.groupBy("cohort_bucket").agg(
        F.count("*").cast("long").alias("n_cohort"))
    ret = (act.join(first, "user")
           .groupBy("cohort_bucket",
                    (F.col("b") - F.col("cohort_bucket"))
                    .alias("bucket_offset"))
           .agg(F.count("*").cast("long").alias("n_active")))
    return (ret.join(F.broadcast(sizes), "cohort_bucket")
            .select("cohort_bucket", "bucket_offset", "n_active",
                    "n_cohort",
                    F.round(F.col("n_active")
                            / F.col("n_cohort").cast("double"), 6)
                    .alias("retention")))


def cohort_retention_sql(src: str, user_col: str = "user_id",
                         ts_col: str = "ts",
                         bucket_seconds: int = 86_400) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    return f"""
WITH act AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(floor(CAST(floor(epoch({ts_col})) AS BIGINT)
                    / {bucket_seconds}) AS BIGINT) AS b
  FROM {src}),
first AS (SELECT u, min(b) AS cohort_bucket FROM act GROUP BY u),
sizes AS (SELECT cohort_bucket, CAST(count(*) AS BIGINT) AS n_cohort
          FROM first GROUP BY cohort_bucket),
ret AS (
  SELECT cohort_bucket, b - cohort_bucket AS bucket_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM act JOIN first USING (u)
  GROUP BY cohort_bucket, b - cohort_bucket)
SELECT cohort_bucket, bucket_offset, n_active, n_cohort,
       round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
FROM ret JOIN sizes USING (cohort_bucket)"""


# --- session-scoped funnel ------------------------------------------------------

def session_funnel_report(events: DataFrame, steps: Sequence[str],
                          gap_minutes: int = 30,
                          user_col: str = "user_id", ts_col: str = "ts",
                          type_col: str = "event_type",
                          max_gap_seconds: int | None = None) -> DataFrame:
    """The funnel confined to ONE session: events are lag-gap
    sessionized per user first, and the funnel unit is the
    (user, session) pair — a step completed in a later session never
    counts (the strictest product-analytics form; the plain
    :func:`funnel_report` is the lifetime form). Output is the report
    shape with ``n_sessions`` as the unit column.

    Scale shape: sessionization is one (user)-key window (the
    sessionize shuffle), the funnel then groups by the composite
    session key — two shuffles total, both user-scale, still no joins.
    """
    from rgd_rnaseq_workflows_spark.streaming.events_stream import (
        assign_sessions)
    se = assign_sessions(
        events.select(F.col(user_col).alias("user_id"),
                      F.col(ts_col).alias("ts"),
                      F.col(type_col).alias("event_type")),
        gap_minutes)
    skey = F.concat(F.col("user_id").cast("string"), F.lit(":"),
                    F.col("session_id").cast("string"))
    rep = funnel_report(se.withColumn("skey", skey), steps,
                        user_col="skey", ts_col="ts",
                        type_col="event_type",
                        max_gap_seconds=max_gap_seconds)
    return rep.withColumnRenamed("n_users", "n_sessions")


def session_funnel_report_sql(src: str, steps: Sequence[str],
                              gap_minutes: int = 30,
                              user_col: str = "user_id",
                              ts_col: str = "ts",
                              type_col: str = "event_type",
                              max_gap_seconds: int | None = None) -> str:
    """DuckDB twin of :func:`session_funnel_report` (identical lag-gap
    session ids in floor-seconds, identical funnel chain)."""
    gap = gap_minutes * 60
    sessionized = f"""(
WITH marked AS (
  SELECT {user_col} AS user_id, {ts_col} AS ts,
         {type_col} AS event_type,
         CASE WHEN lag({ts_col}) OVER w IS NULL
                OR CAST(floor(epoch({ts_col})) AS BIGINT)
                   - CAST(floor(epoch(lag({ts_col}) OVER w)) AS BIGINT)
                   > {gap}
              THEN 1 ELSE 0 END AS is_new
  FROM {src}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col})),
sess AS (
  SELECT user_id, ts, event_type,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM marked)
SELECT CAST(user_id AS VARCHAR) || ':' || CAST(session_id AS VARCHAR)
         AS skey,
       ts, event_type
FROM sess)"""
    inner = funnel_report_sql(sessionized, steps, user_col="skey",
                              ts_col="ts", type_col="event_type",
                              max_gap_seconds=max_gap_seconds)
    return (f"SELECT step_idx, step, n_users AS n_sessions, conversion, "
            f"sum_gap_seconds, mean_gap_seconds FROM ({inner})")

def transition_matrix(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type",
                      sec_col: str = "sec",
                      tiebreak: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix of the per-user event
    stream: for every ordered pair of consecutive events (by
    ``sec_col`` then the unique ``tiebreak``), one row
    (from_type, to_type, n, row_total, p_bp) where ``p_bp`` is the
    transition probability in integer basis points
    (``(10000·n) div row_total`` — no float ratio crosses engines).

    The journey diagnostic behind funnels: funnels test ONE hypothesis
    path; the transition matrix shows every observed next-step and its
    mass (where users actually go after a signup — including the
    error loops a funnel never lists).

    Scale shape: one shuffle on the user key (the same window the
    sessionize/SCD2 family rides), then a map-side-combined pair count;
    output is |types|² metadata. The lag is per-user ordered by
    integer seconds — the events-family total-order convention.
    """
    w = Window.partitionBy(user_col).orderBy(sec_col, tiebreak)
    pairs = (events
             .withColumn("_prev", F.lag(type_col).over(w))
             .filter(F.col("_prev").isNotNull())
             .groupBy(F.col("_prev").alias("from_type"),
                      F.col(type_col).alias("to_type"))
             .agg(F.count("*").cast("long").alias("n")))
    tot = (pairs.groupBy("from_type")
           .agg(F.sum("n").cast("long").alias("row_total")))
    return (pairs.join(F.broadcast(tot), "from_type")
            .select("from_type", "to_type", "n", "row_total",
                    F.expr("(10000 * n) div row_total").cast("long")
                    .alias("p_bp")))


def transition_matrix_sql(src: str, user_col: str = "user_id",
                          type_col: str = "event_type",
                          sec_col: str = "sec",
                          tiebreak: str = "event_id") -> str:
    """DuckDB twin of :func:`transition_matrix` (identical lag order
    and integer basis points). ``src`` must yield
    (user, type, sec, tiebreak)."""
    return f"""
WITH ev AS ({src}),
lagged AS (
  SELECT {user_col},
         lag({type_col}) OVER (PARTITION BY {user_col}
                               ORDER BY {sec_col}, {tiebreak}) AS f,
         {type_col} AS t
  FROM ev),
pairs AS (
  SELECT f AS from_type, t AS to_type, CAST(count(*) AS BIGINT) AS n
  FROM lagged WHERE f IS NOT NULL GROUP BY f, t),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS row_total
        FROM pairs GROUP BY from_type)
SELECT from_type, to_type, n, row_total,
       (10000 * n) // row_total AS p_bp
FROM pairs JOIN tot USING (from_type)"""

def rfm_segments(events: DataFrame, n_tiles: int = 5,
                 user_col: str = "user_id", sec_col: str = "sec",
                 value_col: str = "value",
                 tiebreak: str = "event_id") -> DataFrame:
    """RFM segmentation (recency / frequency / monetary) — the
    warehouse-classic behavioral cube: per user, last-activity second,
    event count and exact monetary sum (fix-point cents — the _isum
    discipline, never a float sum), then each axis splits into
    ``n_tiles`` quantile buckets and the output is the segment-level
    rollup (r_tile, f_tile, m_tile, n_users).

    Determinism: tiles are SQL-standard ``ntile`` semantics over a
    TOTAL order (metric desc, then user id) — the tie order is pinned,
    so bucket boundaries are engine-identical; all metrics are exact
    integers.

    Scale shape: one map-side-combined aggregation folds the corpus to
    USER-scale rows; each axis' tile then comes from a DISTRIBUTED
    two-phase global rank (range-repartition → per-partition
    row_number + broadcast metadata offsets —
    :func:`~rgd_rnaseq_workflows_spark.operators.exact_quantiles.global_ranks`)
    fed through the exact ntile arithmetic
    (:func:`~rgd_rnaseq_workflows_spark.operators.exact_quantiles.ntile_from_rank`),
    so NO task ever sorts the whole user table — a 10^9-user frame
    splits across every executor, unlike a partition-less ``ntile``
    window which funnels it through one; the rollup is ≤ n_tiles³
    metadata rows.
    """
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        global_ranks, ntile_from_rank)
    per_user = (events.groupBy(F.col(user_col).alias("u"))
                .agg(F.max(F.col(sec_col).cast("long")).alias("last_sec"),
                     F.count("*").cast("long").alias("n_events"),
                     F.sum(F.round(F.col(value_col) * 100).cast("long"))
                     .alias("cents")))
    tiled = per_user
    for metric, out in (("last_sec", "r_tile"), ("n_events", "f_tile"),
                        ("cents", "m_tile")):
        tiled = (global_ranks(tiled,
                              [F.col(metric).desc(), F.col("u").asc()])
                 .withColumn(out, ntile_from_rank("_rank", "_n", n_tiles))
                 .drop("_rank", "_n"))
    return (tiled.groupBy("r_tile", "f_tile", "m_tile")
            .agg(F.count("*").cast("long").alias("n_users")))


def rfm_segments_sql(src: str, n_tiles: int = 5,
                     user_col: str = "user_id", sec_col: str = "sec",
                     value_col: str = "value",
                     tiebreak: str = "event_id") -> str:
    """DuckDB twin of :func:`rfm_segments` (identical total orders and
    exact integer metrics). ``src`` yields (user, sec, value)."""
    return f"""
WITH ev AS ({src}),
per_user AS (
  SELECT {user_col} AS u,
         CAST(max(CAST({sec_col} AS BIGINT)) AS BIGINT) AS last_sec,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round({value_col} * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM ev GROUP BY 1),
tiled AS (
  SELECT u,
         CAST(ntile({n_tiles}) OVER (ORDER BY last_sec DESC, u)
              AS BIGINT) AS r_tile,
         CAST(ntile({n_tiles}) OVER (ORDER BY n_events DESC, u)
              AS BIGINT) AS f_tile,
         CAST(ntile({n_tiles}) OVER (ORDER BY cents DESC, u)
              AS BIGINT) AS m_tile
  FROM per_user)
SELECT r_tile, f_tile, m_tile, CAST(count(*) AS BIGINT) AS n_users
FROM tiled GROUP BY 1, 2, 3"""



def top_event_paths(events: DataFrame, n: int = 3, top_k: int = 20,
                    cap_per_user: int = 50,
                    user_col: str = "user_id",
                    type_col: str = "event_type", sec_col: str = "sec",
                    tiebreak: str = "event_id") -> DataFrame:
    """Top-k user journeys: the most frequent runs of ``n`` CONSECUTIVE
    event types across users — the order-n generalization of
    :func:`transition_matrix` (n=2 pairs → n-step paths), the product-
    analytics "common paths" report.

    Construction (engine-identical): each user's event types in
    (sec, tiebreak) order, truncated to the user's ``cap_per_user``
    EARLIEST events (the funnel family's bot guard — one pathological
    user cannot flood the path counts, and per-user state stays
    bounded); every window of ``n`` consecutive types becomes a path
    string joined with ``' > '``; exact occurrence and distinct-user
    counts; top-k by (count desc, path) — a pinned total order, and
    TakeOrdered in the plan, never a global sort.

    Scale shape: ONE corpus shuffle (the per-user fold — map-side
    combined collect of (sec, id, type) structs), per-user array work
    for ordering/slicing/n-gramming (no window, no second shuffle of
    events), then a path-vocabulary-scale count aggregation.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (n=1 is a plain type count)")
    if top_k < 1 or cap_per_user < n:
        raise ValueError("need top_k >= 1 and cap_per_user >= n")
    per_user = (events
                .filter(F.col(type_col).isNotNull())
                .select(F.col(user_col).alias("u"),
                        F.struct(F.col(sec_col).cast("long").alias("s"),
                                 F.col(tiebreak).alias("t"),
                                 F.col(type_col).alias("e")).alias("_r"))
                .groupBy("u")
                .agg(F.slice(F.array_sort(F.collect_list("_r")), 1,
                             cap_per_user).alias("_seq")))
    types = "transform(_seq, r -> r.e)"
    grams = (f"transform(sequence(1, greatest(size(_seq) - {n - 1}, 0)), "
             f"i -> array_join(slice({types}, i, {n}), ' > '))")
    paths = (per_user.select("u", F.explode(F.expr(grams)).alias("path"))
             .groupBy("path")
             .agg(F.count("*").cast("long").alias("n_occurrences"),
                  F.countDistinct("u").cast("long").alias("n_users")))
    return (paths.select("path", "n_occurrences", "n_users")
            .orderBy(F.desc("n_occurrences"), "path").limit(top_k))


def top_event_paths_sql(src: str, n: int = 3, top_k: int = 20,
                        cap_per_user: int = 50,
                        user_col: str = "user_id",
                        type_col: str = "event_type",
                        sec_col: str = "sec",
                        tiebreak: str = "event_id") -> str:
    """DuckDB twin of :func:`top_event_paths` — identical order, cap,
    n-gram windows and tie-broken top-k. ``src`` yields (user, type,
    sec, tiebreak)."""
    if n < 2:
        raise ValueError("n must be >= 2 (n=1 is a plain type count)")
    if top_k < 1 or cap_per_user < n:
        raise ValueError("need top_k >= 1 and cap_per_user >= n")
    return f"""
WITH ev AS ({src}),
per_user AS (
  SELECT {user_col} AS u,
         list_slice(list({type_col}
           ORDER BY CAST({sec_col} AS BIGINT), {tiebreak}),
           1, {cap_per_user}) AS seq
  FROM ev WHERE {type_col} IS NOT NULL GROUP BY 1),
paths AS (
  SELECT u, unnest(list_transform(
    range(1, greatest(len(seq) - {n - 1}, 0) + 1),
    i -> array_to_string(list_slice(seq, i, i + {n - 1}), ' > ')))
    AS path
  FROM per_user)
SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT u) AS BIGINT) AS n_users
FROM paths GROUP BY path
ORDER BY n_occurrences DESC, path LIMIT {top_k}
"""


def funnel_gap_quantiles(events: DataFrame, steps: Sequence[str],
                         percents: Sequence[int] = (50, 90, 99),
                         user_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         max_gap_seconds: int | None = None) -> DataFrame:
    """EXACT step-to-step conversion-lag percentiles — the
    distribution ``funnel_report``'s mean hides (a P99 stuck at hours
    while the mean looks fine is the classic funnel pathology): per
    step transition k (2..len(steps)), the exact lower quantiles of
    ``t_k − t_{k−1}`` over converting users.

    Composition: :func:`funnel_user_steps` (one corpus fold) melts to
    (step_idx, gap_seconds) rows, then the bounded-domain histogram
    walk (``exact_quantiles.group_quantiles``) reads every percentile
    off one cumulative pass — no per-group value buffering, no global
    sort; the histogram is (step, distinct-gap)-scale. Output:
    (step_idx, n_rows, p<q>…) — integer seconds, engine-identical.
    """
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        group_quantiles)
    per = funnel_user_steps(events, steps, user_col, ts_col, type_col,
                            max_gap_seconds)
    arms = F.array(*[
        F.struct(F.lit(i + 2).cast("long").alias("step_idx"),
                 (F.col(f"t{i + 2}") - F.col(f"t{i + 1}"))
                 .cast("long").alias("gap"))
        for i in range(len(steps) - 1)])
    gaps = (per.select(F.explode(arms).alias("g"))
            .select("g.*").filter(F.col("gap").isNotNull()))
    return (group_quantiles(gaps, "step_idx", "gap", list(percents))
            .orderBy("step_idx"))


def funnel_gap_quantiles_sql(src: str, steps: Sequence[str],
                             percents: Sequence[int] = (50, 90, 99),
                             user_col: str = "user_id",
                             ts_col: str = "ts",
                             type_col: str = "event_type",
                             max_gap_seconds: int | None = None) -> str:
    """DuckDB twin of :func:`funnel_gap_quantiles` — the funnel twin's
    per-user step-time chain melted to gaps, then the shared
    histogram-walk quantile SQL over the (step, gap) relation."""
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        group_quantiles_sql)
    in_list = ", ".join(f"'{s}'" for s in steps)
    arrs = ",\n         ".join(
        f"list_sort(list(tsec) FILTER (WHERE {type_col} = '{s}')) AS a{i}"
        for i, s in enumerate(steps))
    tchain = ["a0[1] AS t1"]
    for i in range(1, len(steps)):
        gap = ("" if max_gap_seconds is None
               else f" AND x <= t{i} + {max_gap_seconds}")
        tchain.append(
            f"CASE WHEN t{i} IS NOT NULL THEN "
            f"(list_filter(a{i}, x -> x > t{i}{gap}))[1] END AS t{i + 1}")
    tsel = "SELECT user_id_, " + tchain[0] + ", " + \
        ", ".join(f"a{i}" for i in range(1, len(steps))) + " FROM per"
    for i in range(1, len(steps)):
        keep = ", ".join(f"a{j}" for j in range(i + 1, len(steps)))
        keep = (", " + keep) if keep else ""
        tsel = (f"SELECT user_id_, "
                + ", ".join(f"t{j}" for j in range(1, i + 1))
                + f", {tchain[i]}{keep} FROM ({tsel})")
    gap_arms = " UNION ALL ".join(
        f"SELECT {i + 2} AS step_idx, t{i + 2} - t{i + 1} AS gap "
        f"FROM times WHERE t{i + 2} IS NOT NULL"
        for i in range(len(steps) - 1))
    gaps_rel = f"""(
WITH f AS (
  SELECT {user_col} AS user_id_, {type_col},
         CAST(floor(epoch({ts_col})) AS BIGINT) AS tsec
  FROM {src} WHERE {type_col} IN ({in_list})),
per AS (
  SELECT user_id_,
         {arrs}
  FROM f GROUP BY user_id_),
times AS ({tsel})
{gap_arms})"""
    inner = group_quantiles_sql(gaps_rel, "step_idx", "gap",
                                list(percents))
    return f"SELECT * FROM ({inner}) ORDER BY step_idx"


def funnel_wilson_report(events: DataFrame, steps: Sequence[str],
                         user_col: str = "user_id", ts_col: str = "ts",
                         type_col: str = "event_type",
                         z_milli: int = 1960) -> DataFrame:
    """Step-to-step funnel conversion with Wilson score bounds — the
    uncertainty a product decision needs before reading a funnel drop
    as real: per step k ≥ 2, the conversion ``n_k / n_{k−1}`` and its
    Wilson interval (the binomial CI that behaves at extreme rates and
    small counts, unlike the normal approximation). A step whose
    interval overlaps the next step's tells you the "drop" may be
    noise; the ppm bounds make the read exact.

    Exactness: step counts are the exact :func:`funnel_user_steps`
    integers; the Wilson bounds are ONE fixed double tree each
    (literal z embedded driver-side, identical parenthesization in
    the SQL twin) rounded once to ppm — the engines agree because the
    inputs are exact integers and every IEEE op is deterministic.
    Steps whose predecessor count is 0 report NULL bounds.

    Scale shape: identical to :func:`funnel_report` — the per-user
    step-time fold is the only corpus work (one map-side-combined
    groupBy(user)), then a 1-row aggregation exploded to |steps|−1
    report rows."""
    z = z_milli / 1000.0
    z2 = z * z
    per = funnel_user_steps(events, steps, user_col, ts_col, type_col)
    one = per.agg(*[F.count(F.col(f"t{i + 1}")).alias(f"n{i + 1}")
                    for i in range(len(steps))])

    def bound(kc, nc, sign):
        p = kc.cast("double") / nc.cast("double")
        n = nc.cast("double")
        half = F.lit(z) * F.sqrt(p * (F.lit(1.0) - p) / n
                                 + F.lit(z2) / (F.lit(4.0) * n * n))
        center = p + F.lit(z2) / (F.lit(2.0) * n)
        val = (center + sign * half) / (F.lit(1.0) + F.lit(z2) / n)
        return F.round(F.lit(1e6) * val).cast("long")

    rows = []
    for i in range(1, len(steps)):
        kc, nc = F.col(f"n{i + 1}"), F.col(f"n{i}")
        ok = nc > 0
        rows.append(F.struct(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            nc.cast("long").alias("n_prev"),
            kc.cast("long").alias("n_conv"),
            F.when(ok, F.expr(f"n{i + 1} * 1000000 div n{i}"))
            .cast("long").alias("rate_ppm"),
            F.when(ok, bound(kc, nc, F.lit(-1.0))).cast("long")
            .alias("wilson_lo_ppm"),
            F.when(ok, bound(kc, nc, F.lit(1.0))).cast("long")
            .alias("wilson_hi_ppm")))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*").orderBy("step_idx"))


def funnel_wilson_sql(src: str, steps: Sequence[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      z_milli: int = 1960) -> str:
    """DuckDB twin of :func:`funnel_wilson_report` — identical
    step-time chain and Wilson tree."""
    z = z_milli / 1000.0
    z2 = z * z
    in_list = ", ".join(f"'{s}'" for s in steps)
    arrs = ",\n         ".join(
        f"list_sort(list(tsec) FILTER (WHERE {type_col} = '{s}')) AS a{i}"
        for i, s in enumerate(steps))
    tchain = ["a0[1] AS t1"]
    for i in range(1, len(steps)):
        tchain.append(
            f"CASE WHEN t{i} IS NOT NULL THEN "
            f"(list_filter(a{i}, x -> x > t{i}))[1] END AS t{i + 1}")
    tsel = "SELECT user_id_, " + tchain[0] + ", " + \
        ", ".join(f"a{i}" for i in range(1, len(steps))) + " FROM per"
    for i in range(1, len(steps)):
        keep = ", ".join(f"a{j}" for j in range(i + 1, len(steps)))
        keep = (", " + keep) if keep else ""
        tsel = (f"SELECT user_id_, "
                + ", ".join(f"t{j}" for j in range(1, i + 1))
                + f", {tchain[i]}{keep} FROM ({tsel})")

    def bound(k, n, sign):
        p = f"(CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE))"
        nn = f"CAST({n} AS DOUBLE)"
        half = (f"{z!r} * sqrt({p} * (1.0 - {p}) / {nn} "
                f"+ {z2!r} / (4.0 * {nn} * {nn}))")
        center = f"{p} + {z2!r} / (2.0 * {nn})"
        return (f"CAST(round(1e6 * (({center} {sign} {half}) "
                f"/ (1.0 + {z2!r} / {nn}))) AS BIGINT)")

    step_rows = []
    for i in range(1, len(steps)):
        k, n = f"n{i + 1}", f"n{i}"
        step_rows.append(
            f"SELECT {i + 1} AS step_idx, '{steps[i]}' AS step, "
            f"CAST({n} AS BIGINT) AS n_prev, "
            f"CAST({k} AS BIGINT) AS n_conv, "
            f"CASE WHEN {n} > 0 THEN CAST({k} * 1000000 // {n} "
            f"AS BIGINT) END AS rate_ppm, "
            f"CASE WHEN {n} > 0 THEN {bound(k, n, '-')} END "
            f"AS wilson_lo_ppm, "
            f"CASE WHEN {n} > 0 THEN {bound(k, n, '+')} END "
            f"AS wilson_hi_ppm FROM one")
    aggs = ", ".join(f"count(t{i + 1}) AS n{i + 1}"
                     for i in range(len(steps)))
    return f"""
WITH f AS (
  SELECT {user_col} AS user_id_, {type_col},
         CAST(floor(epoch({ts_col})) AS BIGINT) AS tsec
  FROM {src} WHERE {type_col} IN ({in_list})),
per AS (
  SELECT user_id_,
         {arrs}
  FROM f GROUP BY user_id_),
times AS ({tsel}),
one AS (SELECT {aggs} FROM times)
{" UNION ALL ".join(step_rows)}
ORDER BY step_idx"""
