"""Fuzzy record linkage: blocked edit-distance matching.

Entity resolution over noisy categorical values (product names, author
strings, source labels): find value pairs within a small edit distance
so they can merge under one canonical form. The all-pairs form is
O(V²) string comparisons; this operator uses the standard two-key
BLOCKING contract — candidate pairs must share their first-``block_len``
OR last-``block_len`` normalized characters — so matching is two
equi-joins, never a cross product. The contract is explicitly
heuristic on recall (an edit burst spanning BOTH ends of a string is
missed) and the DuckDB twin implements the identical contract, so the
oracle gate is exact over the operator's own semantics.

Scale shape — the record-linkage canonical form:
1. collapse the corpus to DISTINCT values + occurrence counts first
   (map-side combined; corpus rows never reach the pair stage);
2. block keys explode to ≤2 short strings per distinct value;
3. the block-key equi-join + length band bound the candidate set;
   ``levenshtein`` (JVM codegen, same unit-cost definition in DuckDB)
   runs on candidates only;
4. output is value-pair-scale; merging back onto the corpus is a
   broadcast join against this small table.
A hot block (every value sharing a prefix) degrades toward the block's
square — the length band splits it, and AQE skew-join handles the
rest (the dedup-family skew contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match_keys(df: DataFrame, col: str, max_dist: int = 3,
                     min_dist: int = 1, block_len: int = 4) -> DataFrame:
    """(val_a, val_b, n_a, n_b, dist): distinct-value pairs with
    ``min_dist ≤ levenshtein ≤ max_dist`` sharing a prefix or suffix
    block; val_a < val_b lexicographically; counts are corpus
    occurrences of each value (merge weights)."""
    if max_dist < min_dist or min_dist < 0:
        raise ValueError(f"bad distance band [{min_dist}, {max_dist}]")
    if block_len < 1:
        raise ValueError("block_len must be >= 1")
    vals = (df.select(F.trim(F.lower(F.col(col))).alias("v"))
            .filter(F.col("v") != "")
            .groupBy("v").agg(F.count("*").cast("long").alias("n")))
    blocked = vals.select(
        "v", "n",
        F.explode(F.array_distinct(F.array(
            F.substring("v", 1, block_len),
            # explicit short-string branch: negative-start substring
            # edge semantics differ across engines, so both twins
            # spell the same CASE
            F.when(F.length("v") >= block_len,
                   F.col("v").substr(F.length("v") - block_len + 1,
                                     F.lit(block_len)))
            .otherwise(F.col("v")))))
        .alias("bk"))
    a = blocked.select(F.col("v").alias("val_a"),
                       F.col("n").alias("n_a"), "bk")
    b = blocked.select(F.col("v").alias("val_b"),
                       F.col("n").alias("n_b"), "bk")
    cand = (a.join(b, "bk")
            .filter(F.col("val_a") < F.col("val_b"))
            .filter(F.abs(F.length("val_a") - F.length("val_b"))
                    <= max_dist)
            .select("val_a", "val_b", "n_a", "n_b")
            .distinct())        # a pair can share both blocks
    return (cand.withColumn("dist",
                            F.levenshtein("val_a", "val_b").cast("long"))
            .filter((F.col("dist") >= min_dist)
                    & (F.col("dist") <= max_dist)))


def fuzzy_match_keys_sql(table: str, col: str, max_dist: int = 3,
                         min_dist: int = 1, block_len: int = 4) -> str:
    """DuckDB twin of :func:`fuzzy_match_keys` (identical
    normalization, blocking contract, length band and unit-cost edit
    distance)."""
    if max_dist < min_dist or min_dist < 0:
        raise ValueError(f"bad distance band [{min_dist}, {max_dist}]")
    if block_len < 1:
        raise ValueError("block_len must be >= 1")
    return f"""
WITH vals AS (
  SELECT trim(lower({col})) AS v, CAST(count(*) AS BIGINT) AS n
  FROM {table} WHERE trim(lower({col})) <> '' GROUP BY 1),
blocked AS (
  SELECT v, n, bk FROM (
    SELECT v, n, unnest(list_distinct([
      substr(v, 1, {block_len}),
      CASE WHEN length(v) >= {block_len}
           THEN substr(v, length(v) - {block_len} + 1, {block_len})
           ELSE v END])) AS bk
    FROM vals)),
cand AS (
  SELECT DISTINCT a.v AS val_a, b.v AS val_b, a.n AS n_a, b.n AS n_b
  FROM blocked a JOIN blocked b ON a.bk = b.bk AND a.v < b.v
  WHERE abs(length(a.v) - length(b.v)) <= {max_dist})
SELECT val_a, val_b, n_a, n_b,
       CAST(levenshtein(val_a, val_b) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(val_a, val_b) BETWEEN {min_dist} AND {max_dist}"""


def golden_records(df: DataFrame, name_col: str, fields: list[str],
                   max_dist: int = 3, min_dist: int = 1,
                   block_len: int = 4) -> DataFrame:
    """Survivorship merge (the step AFTER fuzzy linkage): collapse each
    fuzzy-match cluster to ONE golden record — the canonical name plus
    a per-field elected value — the entity-resolution endgame every MDM
    / catalog-dedup pipeline runs once :func:`fuzzy_match_keys` has
    found the pairs.

    Clustering: connected components over the matched VALUE pairs
    (value-scale, tiny next to the corpus); unmatched values are their
    own singleton cluster.  Election rules, both deterministic:
    - canonical name  = the cluster's most frequent normalized value,
      ties to the lexicographically smallest;
    - each field      = the most frequent NON-NULL value among the
      cluster's rows (as a string — a uniform survivorship type), same
      tie-break; NULL only when every row is null.

    Output: one row per cluster — (comp, n_rows, n_values, canonical_v,
    *fields) with ``comp`` the cluster's smallest member value (the
    components labeling contract).

    Scale design (100 TB): corpus rows never pair — they take one
    BROADCAST join against the value→cluster map (only values that
    matched some pair are in it; the contamination-vocab discipline),
    then every election is a single melt (``stack``, one corpus scan
    for all fields) into (cluster, field, value)-scale aggregations.
    The pivot back is over the CALLER'S pinned field list, never
    data-driven.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    pairs = fuzzy_match_keys(df, name_col, max_dist=max_dist,
                             min_dist=min_dist, block_len=block_len)
    from rgd_rnaseq_workflows_spark.operators.components import (
        connected_components)
    comps = connected_components(pairs, "val_a", "val_b")
    rows = (df.select(F.trim(F.lower(F.col(name_col))).alias("v"),
                      *[F.col(f) for f in fields])
            .filter(F.col("v") != ""))
    lab = (rows.join(F.broadcast(comps.withColumnRenamed("id", "v")),
                     "v", "left")
           .withColumn("comp", F.coalesce("comp", "v")))
    stats = (lab.groupBy("comp")
             .agg(F.count("*").cast("long").alias("n_rows"),
                  F.countDistinct("v").cast("long").alias("n_values")))
    from pyspark.sql import Window
    name_rank = Window.partitionBy("comp").orderBy(
        F.desc("_n"), F.asc("v"))
    canon = (lab.groupBy("comp", "v").agg(F.count("*").alias("_n"))
             .withColumn("_rn", F.row_number().over(name_rank))
             .filter(F.col("_rn") == 1)
             .select("comp", F.col("v").alias("canonical_v")))
    stack_expr = ", ".join(f"'{f}', CAST({f} AS STRING)" for f in fields)
    melt = (lab.select("comp", F.expr(
        f"stack({len(fields)}, {stack_expr}) AS (field, fval)"))
        .filter(F.col("fval").isNotNull()))
    field_rank = Window.partitionBy("comp", "field").orderBy(
        F.desc("_n"), F.asc("fval"))
    elected = (melt.groupBy("comp", "field", "fval")
               .agg(F.count("*").alias("_n"))
               .withColumn("_rn", F.row_number().over(field_rank))
               .filter(F.col("_rn") == 1)
               .groupBy("comp").pivot("field", fields)
               .agg(F.first("fval")))
    return (stats.join(canon, "comp")
            .join(elected, "comp", "left")
            .select("comp", "n_rows", "n_values", "canonical_v", *fields)
            .orderBy("comp"))


def golden_records_sql(table: str, name_col: str, fields: list[str],
                       max_dist: int = 3, min_dist: int = 1,
                       block_len: int = 4) -> str:
    """DuckDB twin of :func:`golden_records`: identical pair contract
    (reuses :func:`fuzzy_match_keys_sql`), recursive-CTE components
    with the same min-member labeling, identical election tie-breaks;
    the melt is a UNION ALL over the same pinned field list."""
    if not fields:
        raise ValueError("fields must be non-empty")
    pairs_sql = fuzzy_match_keys_sql(table, name_col, max_dist=max_dist,
                                     min_dist=min_dist,
                                     block_len=block_len).strip()
    melt = "\n  UNION ALL\n".join(
        f"  SELECT comp, '{f}' AS field, CAST({f} AS VARCHAR) AS fval "
        f"FROM lab WHERE {f} IS NOT NULL" for f in fields)
    pivots = ",\n       ".join(
        f"max(CASE WHEN field = '{f}' THEN fval END) AS {f}"
        for f in fields)
    return f"""
WITH RECURSIVE fpairs AS ({pairs_sql}),
fedges AS (SELECT val_a AS a, val_b AS b FROM fpairs
           UNION SELECT val_b, val_a FROM fpairs),
reach(id, lbl) AS (
  SELECT a, a FROM fedges
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN fedges e ON e.a = r.id),
comps AS (SELECT id, min(lbl) AS comp FROM reach GROUP BY id),
rows_n AS (SELECT trim(lower({name_col})) AS v, * FROM {table}
           WHERE trim(lower({name_col})) <> ''),
lab AS MATERIALIZED (
  SELECT coalesce(c.comp, r.v) AS comp, r.* FROM rows_n r
  LEFT JOIN comps c ON c.id = r.v),
stats AS (SELECT comp, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(count(DISTINCT v) AS BIGINT) AS n_values
          FROM lab GROUP BY comp),
canon AS (
  SELECT comp, v AS canonical_v FROM (
    SELECT comp, v, row_number() OVER (
      PARTITION BY comp ORDER BY count(*) DESC, v ASC) AS rn
    FROM lab GROUP BY comp, v) WHERE rn = 1),
melt AS (
{melt}),
elected AS (
  SELECT comp,
       {pivots}
  FROM (SELECT comp, field, fval, row_number() OVER (
          PARTITION BY comp, field ORDER BY count(*) DESC, fval ASC) AS rn
        FROM melt GROUP BY comp, field, fval)
  WHERE rn = 1 GROUP BY comp)
SELECT s.comp, s.n_rows, s.n_values, c.canonical_v,
       {", ".join("e." + f for f in fields)}
FROM stats s JOIN canon c USING (comp)
LEFT JOIN elected e USING (comp)
"""
