"""Portable distributed sketches: HyperLogLog distinct counting built from
DataFrame primitives.

Why not ``approx_count_distinct``: Spark's built-in HLL++ uses an engine-
private hash (xxhash64 variant) and bias tables, so no other engine can
reproduce its estimate — it cannot be oracle-checked, and its sketches
cannot be merged with sketches produced outside Spark. This module builds
the classic Flajolet et al. 2007 HLL from ``md5`` (the repo's portable
hash family, functions/hashing.py), so the *identical* sketch — bucket
registers and final estimate — is computable in any ANSI-SQL engine.

Scale design (the point of a sketch):
- The register table is ``m`` rows (m = 2^p buckets, p≈8-14) regardless
  of input size: 100 TB of events reduce to a 4 KB sketch. The only
  shuffle is the ``groupBy(bucket)`` partial-max — map-side combine
  collapses each input partition to ≤m rows before the exchange.
- Registers merge by ``max`` — sketches from different days/partitions
  union losslessly (the HLL merge property), which is how a 1000-executor
  rollup or an incremental daily pipeline composes them.
- Everything is codegen'd built-ins (md5/conv/bin/pmod); the estimate's
  2^-register sum is computed as an *integer* sum of ``2^(52-M_b)``
  (max 2^12 buckets × 2^52 < 2^63), so Spark and the oracle agree
  bit-for-bit before the single final float division.

Register math on the 60-bit md5_long hash (functions/hashing.py):
``bucket = hash % m``, ``w = hash // m`` (the remaining high bits,
< 2^(60-p)), ``rank = (60-p) - bitlength(w) + 1`` — the 1-based position
of the first set bit from the left, 61-p when w == 0. ``bitlength`` is
``length(bin(w))`` (both Spark and DuckDB print minimal binary), avoiding
float ``log2`` whose round-to-nearest can misplace the boundary at
2^k - 1 for large k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

HASH_BITS = 60  # md5_long width


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _estimate_numerator(p: int) -> float:
    """α·m²·2^maxrank as ONE Python float — both engines receive the same
    literal (DuckDB would otherwise parse a long decimal literal as
    DECIMAL(18) and overflow the division)."""
    m = 1 << p
    return _alpha(m) * m * m * float(1 << (HASH_BITS - p + 1))


def hll_registers(df: DataFrame, col: str, p: int = 8, seed: int = 1,
                  by: tuple[str, ...] = ()) -> DataFrame:
    """The m=2^p HLL register table for ``df[col]``: (*by, bucket,
    register) — one sketch per ``by`` group (a grouped sketch costs the
    same single shuffle; at rollup time sketches for different groups
    union by register max — see :func:`hll_estimate`).

    Buckets with no hits are absent (register semantically 0) — the
    estimator reads absent rows as empty registers, which also keeps the
    sketch dense-free for storage. One shuffle of ≤m rows per input
    partition and group (map-side max).
    """
    if not 4 <= p <= 12:
        raise ValueError(f"p={p} outside the supported 4..12 register range")
    m = 1 << p
    h = md5_long(F.col(col).cast("string"), seed=seed)
    # h < 2^60 and m is a power of two: bucket/word split must be integer-
    # exact, so use bit ops (h/m as double would round above 2^53)
    w = F.shiftright(h, p)  # high 60-p bits; h ≥ 0 so arithmetic == logical
    rank = F.when(w == 0, F.lit(HASH_BITS - p + 1)) \
            .otherwise(HASH_BITS - p - F.length(F.bin(w)) + 1)
    return (df.select(*by,
                      h.bitwiseAND(m - 1).cast("long").alias("bucket"),
                      rank.cast("long").alias("rank"))
            .groupBy(*by, "bucket").agg(F.max("rank").alias("register")))


def hll_estimate(registers: DataFrame, p: int = 8,
                 by: tuple[str, ...] = ()) -> DataFrame:
    """Fold a register table into the HLL cardinality estimate.

    Returns one row per ``by`` group (one row total when ``by`` is
    empty): (*by, m, n_zero_registers, estimate). The indicator sum
    Σ 2^-register is carried in units of 2^-maxrank (maxrank = 61-p, the
    largest possible register) as the exact integer Σ 2^(maxrank-register)
    — exponents span [0, maxrank], the total is ≤ m·2^maxrank = 2^61, so
    the reduction is order-independent and engine-portable; only the last
    division is float.
    """
    m = 1 << p
    maxrank = HASH_BITS - p + 1
    # F.shiftleft's numBits wrapper is int-only; the SQL form takes a column
    pow_int = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {maxrank} - CAST(register AS INT))")
    agg = registers.groupBy(*by).agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(pow_int).cast("long").alias("s_hit"))
    alpha = _alpha(m)
    # absent buckets have register 0 → contribute 2^maxrank each
    s_total = (F.col("s_hit")
               + (F.lit(m).cast("long") - F.col("n_hit"))
               * F.lit(1 << maxrank).cast("long"))
    n_zero = (F.lit(m).cast("long") - F.col("n_hit"))
    raw = F.lit(_estimate_numerator(p)) / s_total
    # small-range correction: linear counting when raw ≤ 2.5m and there
    # are empty registers (Flajolet et al. 2007 §4)
    est = F.when((raw <= 2.5 * m) & (n_zero > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero)) \
           .otherwise(raw)
    return agg.select(*by,
                      F.lit(m).cast("long").alias("m"),
                      n_zero.alias("n_zero_registers"),
                      F.round(est, 4).alias("estimate"))


def hll_distinct(df: DataFrame, col: str, p: int = 8, seed: int = 1,
                 by: tuple[str, ...] = ()) -> DataFrame:
    """End-to-end portable HLL distinct estimate of ``df[col]``,
    optionally per ``by`` group."""
    return hll_estimate(hll_registers(df, col, p=p, seed=seed, by=by),
                        p=p, by=by)


def hll_merge(register_frames: list[DataFrame],
              by: tuple[str, ...] = ()) -> DataFrame:
    """Merge HLL register tables by register max — the incremental-lake
    rollup: yesterday's lake sketch (stored, ≤m rows per group) merges
    with today's delta sketch WITHOUT rescanning the lake, and the
    merged registers are bit-identical to a single-pass sketch of the
    union (max is associative/commutative/idempotent, so re-merges and
    replays are harmless). The only moving data is register rows."""
    if not register_frames:
        raise ValueError("hll_merge needs at least one register frame")
    merged = register_frames[0]
    for f in register_frames[1:]:
        merged = merged.unionByName(f)
    return (merged.groupBy(*by, "bucket")
            .agg(F.max("register").alias("register")))


def hll_registers_sql(table: str, expr: str, p: int = 8, seed: int = 1,
                      by: tuple[str, ...] = ()) -> str:
    """DuckDB twin of :func:`hll_registers` (same buckets, same registers)."""
    m = 1 << p
    h = md5_long_sql(f"CAST({expr} AS VARCHAR)", seed=seed)
    byl = "".join(f"{c}, " for c in by)
    return f"""
SELECT {byl}bucket, max(rank) AS register FROM (
  SELECT {byl}h % {m} AS bucket,
         CASE WHEN h // {m} = 0 THEN {HASH_BITS - p + 1}
              ELSE {HASH_BITS - p} - length(bin(h // {m})) + 1 END AS rank
  FROM (SELECT {byl}{h} AS h FROM {table}))
GROUP BY {byl}bucket"""


def hll_estimate_sql(regs_sql: str, p: int = 8,
                     by: tuple[str, ...] = ()) -> str:
    """DuckDB twin of :func:`hll_estimate` over any register-table
    subquery (``regs_sql`` must yield (*by, bucket, register))."""
    m = 1 << p
    maxrank = HASH_BITS - p + 1
    byl = "".join(f"{c}, " for c in by)
    group = f"GROUP BY {', '.join(by)}" if by else ""
    # one pre-multiplied float literal (scientific notation → DOUBLE);
    # inline decimal products would parse as DECIMAL(18) and overflow
    num = f"CAST({_estimate_numerator(p)!r} AS DOUBLE)"
    s_tot = f"(s_hit + ({m} - n_hit) * (CAST(1 AS BIGINT) << {maxrank}))"
    return f"""
WITH regs AS ({regs_sql}),
folded AS (
  SELECT {byl}CAST(count(*) AS BIGINT) AS n_hit,
         CAST(sum(CAST(1 AS BIGINT) << ({maxrank} - register)) AS BIGINT)
           AS s_hit
  FROM regs {group})
SELECT {byl}CAST({m} AS BIGINT) AS m,
       CAST({m} - n_hit AS BIGINT) AS n_zero_registers,
       round(CASE WHEN {num} / {s_tot} <= {2.5 * m} AND {m} - n_hit > 0
                  THEN {float(m)} * ln({float(m)} / ({m} - n_hit))
                  ELSE {num} / {s_tot} END,
             4) AS estimate
FROM folded"""


def hll_distinct_sql(table: str, expr: str, p: int = 8, seed: int = 1,
                     by: tuple[str, ...] = ()) -> str:
    """DuckDB twin of :func:`hll_distinct` — bit-identical registers, the
    same integer indicator sum (bigint ``<<``, not the float-returning
    ``**``), the same correction branch."""
    return hll_estimate_sql(
        hll_registers_sql(table, expr, p=p, seed=seed, by=by), p=p, by=by)


def relative_error_bound(p: int) -> float:
    """The theoretical 1σ relative error 1.04/√m for m = 2^p registers."""
    return 1.04 / math.sqrt(1 << p)


# --- Count-Min Sketch --------------------------------------------------------

def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 1024,
               seed: int = 9, by: tuple[str, ...] = ()) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) of ``df[col]``:
    the (row, pos, counter) table, ≤ depth·width rows regardless of
    input size — the frequency analog of the HLL register table.

    Same portability contract as HLL: md5 positions, integer counters,
    so the identical sketch is reproducible in any ANSI engine, and two
    sketches MERGE by adding counters (groupBy (row,pos) sum) — daily
    token-frequency sketches roll up without reprocessing.

    One shuffle: depth×|input| (row,pos) pairs collapse map-side to
    ≤ depth·width rows per input partition before the exchange.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth ≥ 1, width ≥ 2; got {depth}x{width}")
    c = F.col(col).cast("string")
    cells = F.explode(F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(md5_long(F.concat(F.lit(f"{seed + i}:"), c)),
                        F.lit(width)).alias("pos"))
        for i in range(depth)])).alias("cell")
    return (df.select(*by, cells)
            .select(*by, "cell.row", "cell.pos")
            .groupBy(*by, "row", "pos")
            .agg(F.count("*").cast("long").alias("counter")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024,
                 seed: int = 9, by: tuple[str, ...] = ()) -> DataFrame:
    """Point-frequency estimates for ``keys[key_col]``: min over the
    depth counters (the CMS guarantee: estimate ≥ truth, over-estimate
    bounded by ε·N w.h.p.). The sketch broadcasts (≤ depth·width rows);
    keys are never shuffled."""
    c = F.col(key_col).cast("string")
    probes = keys.select(
        *by, key_col,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     F.pmod(md5_long(F.concat(F.lit(f"{seed + i}:"), c)),
                            F.lit(width)).alias("pos"))
            for i in range(depth)])).alias("cell")) \
        .select(*by, key_col, "cell.row", "cell.pos")
    return (probes.join(F.broadcast(sketch), [*by, "row", "pos"], "left")
            .groupBy(*by, key_col)
            .agg(F.min(F.coalesce(F.col("counter"), F.lit(0)))
                 .cast("long").alias("cms_estimate")))


def cms_merge(sketches: list[DataFrame],
              by: tuple[str, ...] = ()) -> DataFrame:
    """Merge CMS counter tables by counter ADD — the frequency analog
    of :func:`hll_merge`: daily sketches roll up without reprocessing,
    and the merged counters are bit-identical to a single-pass sketch
    of the union (sum is associative/commutative — but NOT idempotent:
    never merge the same day twice; snapshot lineage is the replay
    guard, unlike HLL's max)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return (merged.groupBy(*by, "row", "pos")
            .agg(F.sum("counter").cast("long").alias("counter")))


def log2q_merge(sketches: list[DataFrame],
                by: tuple[str, ...] = ()) -> DataFrame:
    """Merge log2-quantile bucket histograms by count ADD (same
    contract as :func:`cms_merge`: exact, order-free, not idempotent)."""
    if not sketches:
        raise ValueError("log2q_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return (merged.groupBy(*by, "bucket")
            .agg(F.sum("n").cast("long").alias("n")))


def cms_sketch_sql(table: str, expr: str, depth: int = 4, width: int = 1024,
                   seed: int = 9) -> str:
    """DuckDB twin of :func:`cms_sketch` (identical cells/counters)."""
    parts = []
    for i in range(depth):
        h = md5_long_sql(f"'{seed + i}:' || CAST({expr} AS VARCHAR)")
        parts.append(f"SELECT {i} AS row, {h} % {width} AS pos FROM {table}")
    rows = " UNION ALL ".join(parts)
    return f"""
SELECT row, pos, CAST(count(*) AS BIGINT) AS counter
FROM ({rows}) GROUP BY row, pos"""


# --- log2 quantile sketch (power-of-2 DDSketch) ------------------------------

def log2_quantile_sketch(df: DataFrame, col: str, scale: int = 100,
                         by: tuple[str, ...] = ()) -> DataFrame:
    """Mergeable quantile sketch with γ=2 relative-error buckets (the
    power-of-2 special case of DDSketch, Masson et al. 2019): bucket a
    non-negative fixed-point value by the BIT LENGTH of
    ``round(x·scale)`` — ≤64 buckets from any input size, merged by
    adding counts, no floats anywhere (``length(bin(v))`` is the same
    portable integer log2 the HLL registers use; float ``log`` would
    round differently at 2^k boundaries across engines).

    Quantile estimates reconstructed from the bucket histogram are
    within a factor 2 of truth (bucket b holds [2^(b-1), 2^b)); a
    production deployment wanting γ=1.02 subdivides buckets the same
    way — the plan shape (one ≤64-row shuffle) is unchanged.
    """
    v = F.round(F.col(col).cast("double") * scale).cast("long")
    return (df.select(*by, F.length(F.bin(v)).cast("int").alias("bucket"))
            .groupBy(*by, "bucket")
            .agg(F.count("*").cast("long").alias("n")))


def log2_quantile_estimate(sketch: DataFrame, percents: list[int],
                           scale: int = 100,
                           by: tuple[str, ...] = ()) -> DataFrame:
    """(*by, percentile, est) for integer ``percents``: rank
    ``floor((N-1)·p/100)+1`` (exact integer), answered by the first
    bucket whose cumulative count reaches it; the estimate is the bucket
    midpoint ``(2^(b-1) + 2^b - 1) div 2`` rescaled. With ``by`` set the
    cumulative window and ranks partition per group (grouped sketches
    from :func:`log2_quantile_sketch`'s ``by=``)."""
    from pyspark.sql import Window
    w = Window.partitionBy(*by).orderBy("bucket")         .rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(*by, "bucket", "n",
                        F.sum("n").over(w).cast("long").alias("cum"))
    total = sketch.groupBy(*by).agg(F.sum("n").cast("long").alias("N"))
    pez = F.explode(F.array(*[F.lit(p) for p in percents])).alias("pct")
    ranks = total.select(*by, pez, "N").select(
        *by, "pct", (F.expr("(N - 1) * pct div 100") + 1).alias("rank"))
    cond = [cum["cum"] >= ranks["rank"]] +         [cum[c] == ranks[c] for c in by]
    j = (ranks.join(cum, cond)
         .groupBy(*[ranks[c] for c in by], ranks["pct"], ranks["rank"])
         .agg(F.min("bucket").cast("int").alias("bucket")))
    mid = F.expr("CAST((shiftleft(CAST(1 AS BIGINT), bucket - 1) "
                 "+ shiftleft(CAST(1 AS BIGINT), bucket) - 1) div 2 "
                 "AS BIGINT)")
    return (j.select(*by, F.col("pct").alias("percentile"), "bucket",
                     F.round(mid / scale, 6).alias("est"))
            .orderBy(*by, "percentile"))


def log2_quantiles_sql(table: str, expr: str, percents: list[int],
                       scale: int = 100, by: tuple[str, ...] = ()) -> str:
    """DuckDB twin of sketch + estimate (identical buckets, ranks,
    midpoints), optionally per ``by`` group — the grouped form mirrors
    :func:`log2_quantile_sketch`/:func:`log2_quantile_estimate` with
    ``by=``: per-group cumulative window, per-group ranks."""
    plist = ", ".join(str(p) for p in percents)
    byl = "".join(f"{c}, " for c in by)
    part = f"PARTITION BY {', '.join(by)} " if by else ""
    grp = f"GROUP BY {', '.join(by)}" if by else ""
    joinby = "".join(f" AND cum.{c} = ranks.{c}" for c in by)
    return f"""
WITH sk AS MATERIALIZED (
  SELECT {byl}CAST(length(bin(CAST(round(CAST({expr} AS DOUBLE) * {scale})
                              AS BIGINT))) AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY {byl}bucket),
cum AS (
  SELECT {byl}bucket,
         CAST(sum(n) OVER ({part}ORDER BY bucket) AS BIGINT) AS cum
  FROM sk),
tot AS (SELECT {byl}CAST(sum(n) AS BIGINT) AS N FROM sk {grp}),
ranks AS (
  SELECT {byl}pct, ((N - 1) * pct) // 100 + 1 AS rank
  FROM tot, unnest([{plist}]) AS u(pct)),
hit AS (
  SELECT {"".join(f"ranks.{c}, " for c in by)}pct, rank,
         CAST(min(bucket) AS INTEGER) AS bucket
  FROM ranks JOIN cum ON cum.cum >= ranks.rank{joinby}
  GROUP BY {"".join(f"ranks.{c}, " for c in by)}pct, rank)
SELECT {byl}CAST(pct AS INTEGER) AS percentile, bucket,
       round(CAST(((CAST(1 AS BIGINT) << (bucket - 1))
                   + (CAST(1 AS BIGINT) << bucket) - 1) // 2 AS DOUBLE)
             / {scale}, 6) AS est
FROM hit ORDER BY {byl}percentile"""
