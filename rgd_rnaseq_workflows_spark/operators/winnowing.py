"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS algorithm): local fingerprinting for PARTIAL-overlap detection.

MinHash/SimHash signatures are global — two documents sharing one large
pasted block but differing elsewhere score low. Winnowing selects, from
every sliding window of ``w`` consecutive k-gram hashes, the window's
minimum (rightmost on ties) — guaranteeing that any shared run of at
least ``w + k - 1`` tokens contributes at least one IDENTICAL selected
fingerprint in both documents, while storing only ~2/(w+1) of the
k-gram hashes.

Plan shape (all built-ins, no Python):
- per-doc k-gram hash sequence: the same md5 shingle family the dedup
  operators use (engine-portable);
- the sliding min is a WINDOW frame ``rowsBetween(0, w-1)`` per doc —
  one shuffle on the doc key (each partition = one doc's positions);
- selected fingerprints deduplicate per (doc, hash, position-of-min) —
  the standard winnowing selection set;
- cross-doc matching is an equi-join on the fingerprint hash with
  count aggregation — never all-pairs; at 100 TB the fingerprint table
  is ~2/(w+1) of corpus k-grams, each row (doc, long).

Oracle: the identical window frame + selection in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql
from rgd_rnaseq_workflows_spark.functions.text import shingles_all, shingles_all_sql

# Packed-key position budget: key = h·2^_POS_BITS + (cap-1-pos) must fit
# int64 with the 40-bit truncated hash (40 + _POS_BITS < 63). Documents
# longer than 2^_POS_BITS k-grams raise at execution (see below).
_POS_BITS = 20


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """The winnowing selection set: (id, fp, pos) — ``fp`` the selected
    k-gram hash, ``pos`` the 0-based k-gram position it was selected at.

    Rightmost-min rule: within a window, ties select the LATEST
    position (the paper's robust-winnowing choice made deterministic);
    a (fp,pos) chosen by several windows is emitted once.
    """
    if w < 1:
        raise ValueError(f"window w={w} must be ≥ 1")
    # fingerprint hash: the md5 family truncated to 40 bits so the
    # packed (hash, -pos) ordering key fits int64 (40 + 20 < 63); both
    # engines truncate identically, and 2^-40 fingerprint collisions
    # only merge a pair's shared count, never miss a true share
    grams = (docs.select(F.col(id_col).alias("_id"),
                         F.posexplode(shingles_all(text_col, k))
                         .alias("pos", "gram"))
             .select("_id", "pos",
                     F.pmod(md5_long("gram"), F.lit(1 << 40)).alias("h")))
    win = Window.partitionBy("_id").orderBy("pos").rowsBetween(0, w - 1)
    # rightmost min of the forward window starting at pos: order the
    # frame's rows by (h, -pos) via the packed key
    # key = h·2^20 + (2^20-1-pos). A document longer than 2^20 k-grams
    # would overflow the packed key — fail loudly instead of silently
    # truncating its tail (pre-chunk such documents upstream).
    pos_cap = 1 << _POS_BITS
    grams = grams.withColumn(
        "pos",
        F.when(F.col("pos") < pos_cap, F.col("pos")).otherwise(
            F.raise_error(F.concat(
                F.lit(f"winnow_fingerprints: document exceeds {pos_cap} "
                      "k-gram positions (packed-key cap) — pre-chunk it: "
                      "id="), F.col("_id").cast("string")))
            .cast("long")))
    key = F.col("h") * pos_cap + (pos_cap - 1 - F.col("pos"))
    sel = (grams
           .withColumn("_mk", F.min(key).over(win))
           # windows shorter than w exist at the tail; winnowing defines
           # selection only for FULL windows — keep starts with w grams
           .withColumn("_n", F.count("*").over(win))
           .filter(F.col("_n") == w)
           .select("_id",
                   F.shiftright(F.col("_mk"), _POS_BITS).alias("fp"),
                   (pos_cap - 1
                    - F.col("_mk").bitwiseAND(pos_cap - 1).cast("int"))
                   .cast("int").alias("pos"))
           .distinct())
    return sel.select(F.col("_id").alias(id_col), "fp", "pos")


def shared_fingerprint_pairs(fps: DataFrame, id_col: str = "doc_id",
                             min_shared: int = 2) -> DataFrame:
    """Cross-document partial-overlap report: (id_a, id_b, n_shared) for
    pairs sharing ≥ ``min_shared`` distinct selected fingerprints —
    equi-join on fp, count agg, never all-pairs."""
    a = fps.select(F.col(id_col).alias("id_a"), "fp").distinct()
    b = fps.select(F.col(id_col).alias("id_b"), "fp").distinct()
    return (a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.countDistinct("fp").cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def winnow_pairs_sql(table: str, k: int = 3, w: int = 4,
                     id_col: str = "doc_id", text_col: str = "text",
                     min_shared: int = 2) -> str:
    """DuckDB twin of fingerprints → shared pairs (identical hashes,
    window frame, rightmost-min packing, full-window rule — and the
    same overflow contract: a document longer than the packed-key cap
    ERRORS instead of silently truncating, mirroring the Spark
    ``raise_error`` guard)."""
    grams = shingles_all_sql(text_col, k)
    h = md5_long_sql("gram")
    pos_cap = 1 << _POS_BITS
    return f"""
WITH tk AS MATERIALIZED (
  SELECT {id_col} AS _id, {grams} AS g FROM {table}),
grams AS MATERIALIZED (
  SELECT _id,
         CASE WHEN i - 1 < {pos_cap} THEN CAST(i - 1 AS BIGINT)
              ELSE CAST(error('winnow: document exceeds ' ||
                              '{pos_cap} k-gram positions — pre-chunk')
                        AS BIGINT) END AS pos,
         {h.replace('gram', 'g[i]')} % {1 << 40} AS h
  FROM tk, unnest(range(1, len(g) + 1)) AS r(i)),
sel AS MATERIALIZED (
  SELECT DISTINCT _id,
         CAST(mk // {pos_cap} AS BIGINT) AS fp,
         CAST({pos_cap - 1} - mk % {pos_cap} AS INTEGER) AS pos
  FROM (
    SELECT _id,
           min(h * {pos_cap} + ({pos_cap - 1} - pos))
             OVER (PARTITION BY _id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mk,
           count(*) OVER (PARTITION BY _id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
             AS nw
    FROM grams)
  WHERE nw = {w}),
da AS (SELECT DISTINCT _id, fp FROM sel),
pairs AS (
  SELECT a._id AS id_a, b._id AS id_b,
         CAST(count(DISTINCT a.fp) AS BIGINT) AS n_shared
  FROM da a JOIN da b ON a.fp = b.fp AND a._id < b._id
  GROUP BY a._id, b._id)
SELECT id_a, id_b, n_shared FROM pairs WHERE n_shared >= {min_shared}"""
