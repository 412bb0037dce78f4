"""Int8 embedding quantization + quantized similarity search.

The memory/bandwidth half of scaling ANN to 100 TB: a float32 corpus of
embeddings is 4× the bytes of symmetric per-vector int8, and the
quantized dot product is exact int32/int64 arithmetic — SIMD-friendly on
the executor and, for this engine, bit-identical across Spark, numpy and
the DuckDB oracle (no float summation order anywhere in the hot loop).

Scheme (the standard symmetric per-row quantizer, e.g. FAISS
``ScalarQuantizer QT_8bit_direct`` shape):

- ``scale = max(|x_i|) / 127`` per vector (float32 inputs are exact in
  double; max is a comparison, division one IEEE op);
- ``q_i = round(x_i / scale)`` ∈ [−127, 127] (one IEEE divide + one
  half-away-from-zero round per element — reproducible everywhere);
- approximate dot(a, b) ≈ ``(Σ qa_i·qb_i) · scale_a · scale_b`` — the
  Σ is EXACT integer arithmetic (≤ 127²·dims ≪ 2^63), the two scale
  multiplies are the only float ops, applied in a fixed order.

Zero vectors get scale 0; their quantized form is all-zero and every
score against them is 0 (coalesce guards the 0/0 divide).

Scale notes: quantization is a pure per-row projection (no shuffle, no
Python) — at ingest it runs once and lands in the stored table. The
top-k query broadcasts the 1-row query vector and TakeOrdereds k rows;
the corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QMAX = 127


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def vec_scale(vec: Column) -> Column:
    """Per-vector symmetric quantization scale ``max(|x|)/127``."""
    return (F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
            / QMAX)


def quantize_vec(vec: Column, scale: Column) -> Column:
    """Elementwise ``round(x/scale)`` as int (all-zero when scale=0)."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.round(x.cast("double") / scale)).cast("int"))


def with_quantized(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Ingest-time projection adding ``q`` (array<int>) + ``q_scale``."""
    v = _as_double(vec_col)
    s = vec_scale(F.col(vec_col))
    return emb.withColumn("q_scale", s).withColumn(
        "q", quantize_vec(F.col(vec_col), F.col("q_scale")))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
                       F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantize_report(emb: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    label_col: str = "label") -> DataFrame:
    """Per-label quantization audit: vector count, exact mean scale
    (fixed-point 1e9-unit integer sum — order-independent), and the
    total count of saturated (|q|=127) components (exact int)."""
    qd = with_quantized(emb, vec_col)
    sat = F.aggregate(
        F.col("q"), F.lit(0).cast("long"),
        lambda acc, v: acc + F.when(F.abs(v) == QMAX, 1).otherwise(0))
    return (qd.select(F.col(label_col).alias("label"),
                      F.round(F.col("q_scale") * 1_000_000_000)
                      .cast("long").alias("s9"),
                      sat.alias("n_sat"))
            .groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round(F.sum("s9") / F.count("*") / 1e9, 6)
                 .alias("mean_scale"),
                 F.sum("n_sat").alias("n_saturated")))


def quantize_report_sql(table: str = "embeddings", id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        label_col: str = "label") -> str:
    return f"""
WITH q AS (
  SELECT label, s,
         CASE WHEN s = 0 THEN 0
              ELSE len(list_filter(qv, q -> abs(q) = {QMAX})) END AS n_sat
  FROM (SELECT label, s,
               list_transform(CAST({vec_col} AS DOUBLE[]),
                              x -> CAST(CASE WHEN s = 0 THEN 0
                                        ELSE round(x / s) END AS INTEGER))
                 AS qv
        FROM (SELECT {label_col} AS label,
                     list_max(list_transform(CAST({vec_col} AS DOUBLE[]),
                                             x -> abs(x))) / {QMAX} AS s,
                     {vec_col}
              FROM {table})))
SELECT label, count(*) AS n_vecs,
       round(CAST(sum(CAST(round(s * 1000000000) AS BIGINT)) AS DOUBLE)
             / count(*) / 1e9, 6) AS mean_scale,
       CAST(sum(n_sat) AS BIGINT) AS n_saturated
FROM q GROUP BY label
"""


def int8_topk(emb: DataFrame, query_id: int, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k neighbors by quantized dot product: exact int Σqa·qb per
    pair, descaled by the two per-vector scales (two IEEE multiplies).
    The query row broadcasts; ordering (score desc, id) is deterministic
    because the int dot is exact and the descale is two fixed float ops.
    """
    qd = with_quantized(emb, vec_col).select(
        F.col(id_col).alias("id"), "q", "q_scale")
    qv = (qd.filter(F.col("id") == query_id)
          .select(F.col("q").alias("qq"), F.col("q_scale").alias("qs")))
    scored = (qd.filter(F.col("id") != query_id)
              .crossJoin(F.broadcast(qv))
              .select("id",
                      int_dot(F.col("q"), F.col("qq")).alias("idot"),
                      (F.col("q_scale") * F.col("qs")).alias("ss"))
              .select("id", "idot",
                      F.round(F.col("idot") * F.col("ss"), 6)
                      .alias("score")))
    return scored.orderBy(F.desc("score"), "id").limit(k)


def int8_topk_sql(table: str = "embeddings", query_id: int = 0, k: int = 10,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    return f"""
WITH qd AS (
  SELECT {id_col} AS id, s,
         list_transform(CAST({vec_col} AS DOUBLE[]),
                        x -> CAST(CASE WHEN s = 0 THEN 0
                                  ELSE round(x / s) END AS BIGINT)) AS qv
  FROM (SELECT {id_col},
               list_max(list_transform(CAST({vec_col} AS DOUBLE[]),
                                       x -> abs(x))) / {QMAX} AS s,
               {vec_col}
        FROM {table})),
qv AS (SELECT qv AS qq, s AS qs FROM qd WHERE id = {query_id})
SELECT id, CAST(idot AS BIGINT) AS idot, round(idot * ss, 6) AS score
FROM (
  SELECT qd.id,
         list_sum(list_transform(range(1, len(qd.qv) + 1),
                                 i -> qd.qv[i] * qv.qq[i])) AS idot,
         qd.s * qv.qs AS ss
  FROM qd, qv WHERE qd.id != {query_id})
ORDER BY score DESC, id LIMIT {k}
"""
