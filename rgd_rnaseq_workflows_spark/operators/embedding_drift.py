"""Embedding-centroid drift between two corpus batches.

The embedding-space twin of ``snapshot.token_drift_report``: token
drift catches vocabulary shift, centroid drift catches SEMANTIC shift
(a crawler suddenly pulling a different topic mix moves a source's
embedding centroid long before its token histogram looks odd). Per
group (label / source), compares the centroid of batch A against
batch B: the L2 distance between the two mean vectors (original
units) and the cosine between the centroids.

Cross-engine exactness — the whole aggregation is ORDER-FREE integer
arithmetic, the known float-sum trap (row order changes double sums)
never appears:

- components fix-point to ``xi = round(x·SCALE)`` int64 (exact for
  float32 inputs, the ``clustering.py`` convention);
- per-(group, dim) sums ``sa, sb`` are exact int64;
- the per-dim mean difference is compared via the cross-multiplied
  ``Δ = sa·nb − sb·na`` (exact int64 while per-group batch rows stay
  ≤ ~3e7 at SCALE=1e4 — beyond that, promote the product to decimal);
- ``ΣΔ²``, ``Σ sa·sb``, ``Σ sa²``, ``Σ sb²`` accumulate as
  DECIMAL(38,0) in Spark / HUGEINT in DuckDB (an int64 Δ² would wrap —
  the ``snapshot.py`` drift precedent);
- only the final per-group scalars touch doubles, each a fixed chain
  of single IEEE roundings on exact inputs (cast, sqrt, divide,
  round) — bit-identical on both engines. Cosine of the SUM vectors
  equals cosine of the means (scale invariance), so no division
  happens before the end.

Scale shape: one posexplode projection (dims× row inflation, but
map-side partial aggregation collapses it to |groups|·dims rows on
the wire) + two hash aggregations; output is |groups| rows. No joins,
no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 10_000          # the clustering.py fixed-point convention

_DEC = "decimal(38,0)"


def centroid_drift(vecs: DataFrame, batch_col: Column,
                   group_col: str = "label",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-group centroid drift between the rows where ``batch_col``
    is true (batch A) and false (batch B).

    Returns (group, n_a, n_b, mean_shift, cos_centroids):
    ``mean_shift`` = ‖mean_A − mean_B‖₂ in original embedding units,
    ``cos_centroids`` = cosine(centroid_A, centroid_B), both rounded
    to 6; NULL when either batch is empty (shift) or either centroid
    is the zero vector (cosine).
    """
    xi = F.transform(F.col(vec_col),
                     lambda x: F.round(x.cast("double") * SCALE)
                     .cast("long"))
    per_dim = (vecs
               .select(F.col(group_col).alias("g"),
                       batch_col.alias("_a"),
                       F.posexplode(xi).alias("dim", "xi"))
               .groupBy("g", "dim")
               .agg(F.sum(F.when(F.col("_a"), F.col("xi"))
                          .otherwise(F.lit(0))).alias("sa"),
                    F.sum(F.when(~F.col("_a"), F.col("xi"))
                          .otherwise(F.lit(0))).alias("sb"),
                    # row counts are dim-independent; max over dims of
                    # the per-dim count = the batch size
                    F.sum(F.when(F.col("_a"), 1).otherwise(0))
                    .alias("ca"),
                    F.sum(F.when(~F.col("_a"), 1).otherwise(0))
                    .alias("cb")))
    delta = (F.col("sa") * F.col("cb") - F.col("sb") * F.col("ca"))
    agg = (per_dim.groupBy("g")
           .agg(F.max("ca").cast("long").alias("n_a"),
                F.max("cb").cast("long").alias("n_b"),
                F.sum(delta.cast(_DEC) * delta.cast(_DEC)).alias("dd"),
                F.sum(F.col("sa").cast(_DEC) * F.col("sb").cast(_DEC))
                .alias("dot"),
                F.sum(F.col("sa").cast(_DEC) * F.col("sa").cast(_DEC))
                .alias("ssa"),
                F.sum(F.col("sb").cast(_DEC) * F.col("sb").cast(_DEC))
                .alias("ssb")))
    na, nb = F.col("n_a"), F.col("n_b")
    shift = (F.sqrt(F.col("dd").cast("double"))
             / (na.cast("double") * nb.cast("double") * F.lit(float(SCALE))))
    norms = (F.sqrt(F.col("ssa").cast("double"))
             * F.sqrt(F.col("ssb").cast("double")))
    cos = F.col("dot").cast("double") / norms
    return (agg.select(
        F.col("g").alias(group_col), "n_a", "n_b",
        F.when((na > 0) & (nb > 0), F.round(shift, 6))
        .alias("mean_shift"),
        F.when((F.col("ssa") > 0) & (F.col("ssb") > 0),
               F.round(cos, 6)).alias("cos_centroids")))


def centroid_drift_sql(table: str, batch_pred: str,
                       group_col: str = "label",
                       vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`centroid_drift` — identical fix-point,
    cross-multiplied deltas, HUGEINT accumulation and final double
    chain. ``batch_pred`` is a SQL boolean marking batch A rows."""
    return f"""
WITH ed AS (
  SELECT {group_col} AS g, ({batch_pred}) AS a,
         CAST(i - 1 AS BIGINT) AS dim,
         CAST(round(CAST({vec_col}[i] AS DOUBLE) * {SCALE}) AS BIGINT)
           AS xi
  FROM {table}, unnest(range(1, len({vec_col}) + 1)) AS r(i)),
per_dim AS (
  SELECT g, dim,
         sum(CASE WHEN a THEN xi ELSE 0 END) AS sa,
         sum(CASE WHEN NOT a THEN xi ELSE 0 END) AS sb,
         sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS cb
  FROM ed GROUP BY g, dim),
agg AS (
  SELECT g, CAST(max(ca) AS BIGINT) AS n_a,
         CAST(max(cb) AS BIGINT) AS n_b,
         sum(CAST(sa * cb - sb * ca AS HUGEINT)
             * CAST(sa * cb - sb * ca AS HUGEINT)) AS dd,
         sum(CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)) AS dot,
         sum(CAST(sa AS HUGEINT) * CAST(sa AS HUGEINT)) AS ssa,
         sum(CAST(sb AS HUGEINT) * CAST(sb AS HUGEINT)) AS ssb
  FROM per_dim GROUP BY g)
SELECT g AS {group_col}, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round(sqrt(CAST(dd AS DOUBLE))
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                  * {float(SCALE)}), 6) END AS mean_shift,
       CASE WHEN ssa > 0 AND ssb > 0 THEN
         round(CAST(dot AS DOUBLE)
               / (sqrt(CAST(ssa AS DOUBLE)) * sqrt(CAST(ssb AS DOUBLE))),
               6) END AS cos_centroids
FROM agg"""
