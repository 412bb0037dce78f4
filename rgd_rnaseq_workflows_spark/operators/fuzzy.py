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
