"""Random projection (Johnson–Lindenstrauss) for embedding columns.

Dimensionality reduction ahead of the ANN / dedup chains: an Achlioptas
(2003) ±1 sign matrix — dense Gaussian quality at integer cost — derived
deterministically from the portable md5 hash family, so the *identical*
matrix is reproducible in any engine (and across cluster restarts: the
projection is a pure function of (seed, i, j), no stored model state).

Scale design:
- The sign matrix is ``in_dims × out_dims`` driver metadata (a 64×8
  projection is 512 ints) — broadcast, never shuffled.
- The corpus path is: posexplode the vector → broadcast-join the sign
  table → groupBy (id, out_dim) with map-side combine. One shuffle of
  (id, out_dim, partial-sum) rows; no Python boundary, no HOF-in-HOF
  re-evaluation (NOTES.md O(d³) trap).
- Components are fixed-point: ``round(v·10^6)`` per input coordinate,
  signed integer sums — bit-identical across engines and partition
  orders; the single trailing division is deterministic IEEE.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import HEX_DIGITS, md5_long_sql

V_SCALE = 1_000_000  # fixed-point scale for input coordinates


def _sign(seed: int, j: int, i: int) -> int:
    """±1 from the md5_long family: the same value
    ``md5_long(concat(seed,':',j,':',i)) % 2`` the SQL twin computes."""
    h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
    return 1 if int(h[:HEX_DIGITS], 16) % 2 == 0 else -1


def sign_matrix(in_dims: int, out_dims: int, seed: int = 5
                ) -> list[tuple[int, int, int]]:
    """(out_dim, in_dim, sign) rows of the projection matrix."""
    return [(j, i, _sign(seed, j, i))
            for j in range(out_dims) for i in range(in_dims)]


def random_projection(emb: DataFrame, in_dims: int, out_dims: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 5) -> DataFrame:
    """Project ``vec_col`` (array<float/double>, length ``in_dims``) to
    ``out_dims`` long-form rows: (id_col, dim, proj).

    ``proj = Σ_i sign(j,i) · round(v_i·10^6) / 10^6`` — the sum is exact
    integer arithmetic; JL scaling (1/√out_dims) is left to the caller so
    projected integers stay exact for downstream hashing.
    """
    spark = emb.sparkSession
    signs = spark.createDataFrame(
        sign_matrix(in_dims, out_dims, seed), "dim int, i int, sign int")
    coords = (emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("i", "v"))
        .select("_id", "i", F.round(F.col("v") * V_SCALE).cast("long")
                .alias("v_int")))
    return (coords.join(F.broadcast(signs), "i")
            .groupBy("_id", "dim")
            .agg(F.sum(F.col("sign") * F.col("v_int")).cast("long")
                 .alias("p_int"))
            .select(F.col("_id").alias(id_col), "dim",
                    F.round(F.col("p_int") / V_SCALE, 6).alias("proj")))


def random_projection_sql(table: str, in_dims: int, out_dims: int,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          seed: int = 5) -> str:
    """DuckDB twin of :func:`random_projection`: the sign matrix is
    regenerated from the same md5 formula via a range×range cross, the
    sums are the same exact integers."""
    h = md5_long_sql(f"CAST({seed} AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
                     f" || ':' || CAST(i AS VARCHAR)")
    return f"""
WITH signs AS (
  SELECT j AS dim, i,
         CASE WHEN {h} % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM unnest(range({out_dims})) AS a(j), unnest(range({in_dims})) AS b(i)),
coords AS (
  SELECT {id_col} AS _id, i1 - 1 AS i,
         CAST(round(CAST({vec_col}[i1] AS DOUBLE) * {V_SCALE}) AS BIGINT)
           AS v_int
  FROM {table}, unnest(range(1, {in_dims} + 1)) AS r(i1))
SELECT _id AS {id_col}, dim,
       round(CAST(sum(sign * v_int) AS BIGINT) / {float(V_SCALE)}, 6)
         AS proj
FROM coords JOIN signs USING (i)
GROUP BY _id, dim"""
