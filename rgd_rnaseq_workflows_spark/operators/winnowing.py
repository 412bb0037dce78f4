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
from rgd_rnaseq_workflows_spark.session import checkpoint_df

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
    equi-join on fp, count agg, never all-pairs. The distinct (id, fp)
    frame is checkpoint-truncated ONCE: both join sides replay the
    materialized selection set instead of re-running the caller's
    fingerprint derivation (posexplode + two windows) per side."""
    da = checkpoint_df(
        fps.select(F.col(id_col).alias("_id"), "fp").distinct())
    a = da.select(F.col("_id").alias("id_a"), "fp")
    b = da.select(F.col("_id").alias("id_b"), "fp")
    return (a.join(b, "fp")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.countDistinct("fp").cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def cross_containment_pairs(new_fps: DataFrame, old_fps: DataFrame,
                            id_col: str = "doc_id",
                            min_shared: int = 2,
                            min_containment: float = 0.0) -> DataFrame:
    """Cross-corpus partial-overlap CONTAINMENT: for each (new, old)
    document pair sharing ≥ ``min_shared`` selected fingerprints,
    ``containment`` = shared fingerprints / the NEW document's distinct
    fingerprint count — the fraction of the incoming document already
    present in the lake document (quote / boilerplate-copy / licensing
    detection at ingest time, where a global Jaccard under-scores a
    small doc pasted into a big one).

    Inputs are fingerprint frames from :func:`winnow_fingerprints`, so
    stored lake fingerprints are reusable delta-over-delta — the same
    incremental contract as ``cross_corpus_minhash_pairs``: the match
    join is new × old ONLY, never a lake self-join.

    Scale shape: both sides are already ~2/(w+1) of their corpus
    k-grams, each row (id, long); the fp equi-join is the only
    corpus-scale shuffle, and per-new-doc sizes ride a doc-scale join.
    ``containment`` is a single division of exact integers.
    """
    # the new side feeds TWO subtrees (match join + per-doc sizes):
    # checkpoint it once so the incoming fingerprint derivation does
    # not replay per consumer; the lake side is consumed once
    na = checkpoint_df(
        new_fps.select(F.col(id_col).alias("id_new"), "fp").distinct())
    ob = old_fps.select(F.col(id_col).alias("id_old"), "fp").distinct()
    sizes = na.groupBy("id_new").agg(F.count("*").alias("n_fp_new"))
    pairs = (na.join(ob, "fp")
             .groupBy("id_new", "id_old")
             .agg(F.count("*").cast("long").alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
    return (pairs.join(sizes, "id_new")
            .withColumn("containment",
                        F.round(F.col("n_shared")
                                / F.col("n_fp_new").cast("double"), 4))
            .filter(F.col("containment") >= min_containment)
            .select("id_new", "id_old", "n_shared", "containment"))


def containment_keepers(fps: DataFrame, id_col: str = "doc_id",
                        min_shared: int = 2,
                        threshold: float = 0.5) -> DataFrame:
    """Within-corpus containment DROP POLICY ("keep the larger doc"):
    a document is dropped when ≥ ``threshold`` of its selected
    fingerprints also appear in a DOMINATING document — one with more
    distinct fingerprints, ties broken toward the smaller id. Returns
    one row per fingerprinted document: (id, n_fp, kept, contained_in,
    containment) with ``contained_in``/``containment`` NULL for
    keepers; for dropped docs they name the dominating container with
    the most shared fingerprints (ties toward the smaller container
    id — deterministic, engine-independent).

    Dominance is a STRICT TOTAL ORDER (n_fp desc, id asc), so the
    policy is acyclic and the maximal element of any containment chain
    always survives. It is deliberately GREEDY-STATIC, not iterative
    "contained in a surviving doc": if b is dropped by c and a is
    contained in b, a is dropped too even though its best container
    was itself dropped — the standard collapse of a containment
    cluster onto its maximum, and conservative (never keeps a
    contained duplicate). Documents with no selected fingerprints
    (shorter than w+k−1 tokens) carry no evidence and are absent from
    the report.

    Scale shape: inputs are the winnowing selection set (~2/(w+1) of
    corpus k-grams, each row (id, long)); the fp equi-join is the only
    corpus-scale shuffle (never all-pairs), pair scoring and the
    best-container pick ride pair-scale aggregations, and the final
    report is one broadcast-scale left join per doc row.
    """
    # the distinct selection set feeds the pair join twice and the
    # size table (itself consumed three times): checkpoint it once —
    # without this the fingerprint derivation replays per subtree
    # (measured 14 parquet scans in one containment-keepers plan)
    da = checkpoint_df(
        fps.select(F.col(id_col).alias("_id"), "fp").distinct())
    sizes = da.groupBy("_id").agg(F.count("*").cast("long").alias("n_fp"))
    und = (da.alias("a")
           .join(da.alias("b"), "fp")
           .filter(F.col("a._id") < F.col("b._id"))
           .groupBy(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"))
           .agg(F.count("*").cast("long").alias("n_shared"))
           .filter(F.col("n_shared") >= min_shared))
    # both directions: (dropped-candidate d, container e)
    directed = und.select(F.col("id_a").alias("id_d"),
                          F.col("id_b").alias("id_e"), "n_shared").union(
        und.select(F.col("id_b").alias("id_d"),
                   F.col("id_a").alias("id_e"), "n_shared"))
    sd = sizes.select(F.col("_id").alias("id_d"),
                      F.col("n_fp").alias("n_d"))
    se = sizes.select(F.col("_id").alias("id_e"),
                      F.col("n_fp").alias("n_e"))
    cand = (directed.join(sd, "id_d").join(se, "id_e")
            .filter((F.col("n_e") > F.col("n_d"))
                    | ((F.col("n_e") == F.col("n_d"))
                       & (F.col("id_e") < F.col("id_d"))))
            .filter(F.col("n_shared")
                    >= F.lit(float(threshold)) * F.col("n_d")))
    # best container per dropped doc: most shared fps (== max
    # containment, n_d fixed per doc), ties toward the smaller id —
    # integer ordering, so both engines pick identically
    w_best = Window.partitionBy("id_d").orderBy(
        F.col("n_shared").desc(), F.col("id_e").asc())
    drops = (cand.withColumn("_rn", F.row_number().over(w_best))
             .filter(F.col("_rn") == 1)
             .select("id_d", F.col("id_e").alias("contained_in"),
                     F.round(F.col("n_shared")
                             / F.col("n_d").cast("double"), 4)
                     .alias("containment")))
    return (sizes.join(drops, sizes["_id"] == drops["id_d"], "left")
            .select(F.col("_id").alias(id_col), "n_fp",
                    F.col("contained_in").isNull().alias("kept"),
                    "contained_in", "containment"))


def containment_keepers_sql(table: str, k: int = 3, w: int = 4,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            min_shared: int = 2,
                            threshold: float = 0.5) -> str:
    """DuckDB twin of fingerprints → :func:`containment_keepers`
    (identical selection set, dominance order, greedy-static policy
    and integer tie-breaks)."""
    sel = _winnow_sel_sql(table, "c", k, w, id_col, text_col)
    return f"""
WITH {sel},
da AS (SELECT DISTINCT _id, fp FROM csel),
sizes AS (SELECT _id, CAST(count(*) AS BIGINT) AS n_fp
          FROM da GROUP BY _id),
und AS (
  SELECT a._id AS id_a, b._id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM da a JOIN da b ON a.fp = b.fp AND a._id < b._id
  GROUP BY a._id, b._id
  HAVING count(*) >= {min_shared}),
directed AS (
  SELECT id_a AS id_d, id_b AS id_e, n_shared FROM und
  UNION ALL
  SELECT id_b AS id_d, id_a AS id_e, n_shared FROM und),
cand AS (
  SELECT d.id_d, d.id_e, d.n_shared, sd.n_fp AS n_d
  FROM directed d
  JOIN sizes sd ON sd._id = d.id_d
  JOIN sizes se ON se._id = d.id_e
  WHERE (se.n_fp > sd.n_fp OR (se.n_fp = sd.n_fp AND d.id_e < d.id_d))
    AND d.n_shared >= {float(threshold)} * sd.n_fp),
drops AS (
  SELECT id_d, id_e AS contained_in,
         round(CAST(n_shared AS DOUBLE) / n_d, 4) AS containment
  FROM (SELECT *, row_number() OVER (
            PARTITION BY id_d ORDER BY n_shared DESC, id_e ASC) AS rn
        FROM cand)
  WHERE rn = 1)
SELECT s._id AS {id_col}, s.n_fp,
       d.contained_in IS NULL AS kept, d.contained_in, d.containment
FROM sizes s LEFT JOIN drops d ON d.id_d = s._id"""


def _winnow_sel_sql(rel: str, prefix: str, k: int, w: int,
                    id_col: str, text_col: str,
                    with_pos: bool = False) -> str:
    """CTE chain (names prefixed) ending in ``{prefix}sel(_id, fp)`` —
    the distinct winnowing selection set of relation ``rel``, identical
    hashes / packing / full-window rule / overflow contract as
    :func:`winnow_pairs_sql`. With ``with_pos`` the selection keeps the
    selected position (the Spark frame's full (id, fp, pos) triple)."""
    grams = shingles_all_sql(text_col, k)
    h = md5_long_sql("gram")
    pos_cap = 1 << _POS_BITS
    pos_sel = (f", CAST({pos_cap - 1} - (mk % {pos_cap}) AS BIGINT) AS pos"
               if with_pos else "")
    return f"""
{prefix}tk AS MATERIALIZED (
  SELECT {id_col} AS _id, {grams} AS g FROM {rel}),
{prefix}grams AS MATERIALIZED (
  SELECT _id,
         CASE WHEN i - 1 < {pos_cap} THEN CAST(i - 1 AS BIGINT)
              ELSE CAST(error('winnow: document exceeds ' ||
                              '{pos_cap} k-gram positions — pre-chunk')
                        AS BIGINT) END AS pos,
         {h.replace('gram', 'g[i]')} % {1 << 40} AS h
  FROM {prefix}tk, unnest(range(1, len(g) + 1)) AS r(i)),
{prefix}sel AS MATERIALIZED (
  SELECT DISTINCT _id, CAST(mk // {pos_cap} AS BIGINT) AS fp{pos_sel}
  FROM (
    SELECT _id,
           min(h * {pos_cap} + ({pos_cap - 1} - pos))
             OVER (PARTITION BY _id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mk,
           count(*) OVER (PARTITION BY _id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
             AS nw
    FROM {prefix}grams)
  WHERE nw = {w})"""


def cross_containment_sql(new_rel: str, old_rel: str, k: int = 3,
                          w: int = 4, id_col: str = "doc_id",
                          text_col: str = "text", min_shared: int = 2,
                          min_containment: float = 0.0) -> str:
    """DuckDB twin of fingerprints → :func:`cross_containment_pairs`
    for two sub-relations (e.g. a doc_id-bucket split of one table)."""
    n = _winnow_sel_sql(new_rel, "n", k, w, id_col, text_col)
    o = _winnow_sel_sql(old_rel, "o", k, w, id_col, text_col)
    return f"""
WITH {n},
{o},
sizes AS (SELECT _id AS id_new, count(*) AS n_fp_new
          FROM nsel GROUP BY _id),
pairs AS (
  SELECT a._id AS id_new, b._id AS id_old,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM nsel a JOIN osel b ON a.fp = b.fp
  GROUP BY a._id, b._id
  HAVING count(*) >= {min_shared})
SELECT id_new, id_old, n_shared,
       round(CAST(n_shared AS DOUBLE) / n_fp_new, 4) AS containment
FROM pairs JOIN sizes USING (id_new)
WHERE round(CAST(n_shared AS DOUBLE) / n_fp_new, 4) >= {min_containment}"""


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

def shared_span_report(fps: DataFrame, k: int, w: int,
                       id_col: str = "doc_id", min_shared: int = 2,
                       min_run: int = 2) -> DataFrame:
    """Repeated-SPAN detection between document pairs — the
    exact-substring-dedup signal (Lee et al.'s "Deduplicating Training
    Data" concern) at winnowing granularity: a long pasted block shows
    up as a RUN of shared fingerprints on one alignment diagonal, which
    global Jaccard/containment scores can't localize.

    Mechanics (the dot-plot diagonal trick): matched fingerprints
    between a pair land at positions (pos_a, pos_b); a contiguous
    shared region keeps ``pos_a − pos_b`` constant, so grouping matches
    by that DIAGONAL and splitting where consecutive ``pos_a`` jump by
    more than ``w + k − 1`` (winnowing's guarantee: any shared run of
    ≥ w+k−1 tokens contributes a fingerprint — larger gaps mean the
    shared region broke) yields the maximal shared runs. Output per
    pair: (id_a, id_b, n_matches, n_runs, max_run_fps,
    max_span_tokens) with ``max_span_tokens`` = the k-gram span of the
    longest run + k − 1 (token-span estimate), runs below ``min_run``
    fingerprints ignored (single-fingerprint coincidences).

    All arithmetic integer; deterministic (max over exact spans).

    Scale shape: the fp equi-join is the only corpus-scale shuffle
    (same as shared_fingerprint_pairs); the islands window rides
    (pair, diagonal) keys over MATCH-scale rows — at 100 TB matches
    are pair-overlap scale, not corpus scale. All-pairs never happens:
    only documents sharing a fingerprint meet.
    """
    # the (id, fp, pos) selection set feeds both join sides:
    # checkpoint once so the fingerprint windows run once, not twice
    fps = checkpoint_df(fps.select(F.col(id_col), "fp", "pos"))
    a = fps.select(F.col(id_col).alias("id_a"), "fp",
                   F.col("pos").alias("pos_a"))
    b = fps.select(F.col(id_col).alias("id_b"), "fp",
                   F.col("pos").alias("pos_b"))
    m = (a.join(b, "fp")
         .filter(F.col("id_a") < F.col("id_b"))
         .select("id_a", "id_b", "pos_a",
                 (F.col("pos_a") - F.col("pos_b")).alias("diag")))
    gap = w + k - 1
    wd = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = (m
            .withColumn("_prev", F.lag("pos_a").over(wd))
            .withColumn("_new", F.when(
                F.col("_prev").isNull()
                | (F.col("pos_a") - F.col("_prev") > gap), 1)
                .otherwise(0))
            .withColumn("_run", F.sum("_new").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("id_a", "id_b", "diag", "_run")
            .agg(F.count("*").cast("long").alias("run_fps"),
                 (F.max("pos_a") - F.min("pos_a") + k)
                 .cast("long").alias("span_tokens")))
    return (runs
            .groupBy("id_a", "id_b")
            .agg(F.sum("run_fps").cast("long").alias("n_matches"),
                 F.sum(F.when(F.col("run_fps") >= min_run, 1)
                       .otherwise(0)).cast("long").alias("n_runs"),
                 F.max(F.when(F.col("run_fps") >= min_run,
                              F.col("run_fps"))).cast("long")
                 .alias("max_run_fps"),
                 F.max(F.when(F.col("run_fps") >= min_run,
                              F.col("span_tokens"))).cast("long")
                 .alias("max_span_tokens"))
            .filter(F.col("n_matches") >= min_shared)
            .filter(F.col("n_runs") > 0))


def shared_span_sql(table: str, k: int = 3, w: int = 4,
                    id_col: str = "doc_id", text_col: str = "text",
                    min_shared: int = 2, min_run: int = 2) -> str:
    """DuckDB twin of fingerprints → :func:`shared_span_report`
    (identical selection set with positions, identical diagonal
    islands)."""
    sel = _winnow_sel_sql(table, "s", k, w, id_col, text_col,
                          with_pos=True)
    gap = w + k - 1
    return f"""
WITH {sel},
m AS (
  SELECT a._id AS id_a, b._id AS id_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM ssel a JOIN ssel b ON a.fp = b.fp AND a._id < b._id),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR pos_a - prev > {gap}
                 THEN 1 ELSE 0 END AS newrun
  FROM (SELECT *, lag(pos_a) OVER (PARTITION BY id_a, id_b, diag
                                   ORDER BY pos_a) AS prev
        FROM m)),
runs0 AS (
  SELECT *, sum(newrun) OVER (PARTITION BY id_a, id_b, diag
                              ORDER BY pos_a
                              ROWS UNBOUNDED PRECEDING) AS run
  FROM flagged),
runs AS (
  SELECT id_a, id_b, diag, run,
         CAST(count(*) AS BIGINT) AS run_fps,
         CAST(max(pos_a) - min(pos_a) + {k} AS BIGINT) AS span_tokens
  FROM runs0 GROUP BY id_a, id_b, diag, run)
SELECT id_a, id_b,
       CAST(sum(run_fps) AS BIGINT) AS n_matches,
       CAST(sum(CASE WHEN run_fps >= {min_run} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs,
       CAST(max(CASE WHEN run_fps >= {min_run} THEN run_fps END)
            AS BIGINT) AS max_run_fps,
       CAST(max(CASE WHEN run_fps >= {min_run} THEN span_tokens END)
            AS BIGINT) AS max_span_tokens
FROM runs GROUP BY id_a, id_b
HAVING sum(run_fps) >= {min_shared}
   AND sum(CASE WHEN run_fps >= {min_run} THEN 1 ELSE 0 END) > 0"""

