"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) on hashed n-gram features, as a pure DataFrame plan.

Given a small *target* slice (the distribution you want more of — a
quality domain, a language, a benchmark's style) and the raw corpus,
score every document by its log importance weight under bag-of-hashed-
unigram language models::

    weight(doc) = Σ_tokens  ln p_target(bucket(tok)) − ln q_raw(bucket(tok))

High-weight documents look target-like; resampling the corpus by these
weights (here: top-k / threshold selection, the hard-concentration
variant) shifts the pretraining mixture toward the target domain.

Scale design:
- The two feature models are B-row tables (B = 2^b hash buckets —
  production ~10^4, the paper uses 10^4 bigram buckets): 100 TB of text
  folds to B rows via one map-side-combined groupBy each. They join back
  as a broadcast — the corpus is never shuffled for scoring beyond the
  (doc, bucket) partial aggregation.
- Token → bucket is the portable md5 family (functions/hashing.py),
  codegen'd, no Python boundary.
- Per-bucket log-ratios are integerized once (``round(lr·10^6)`` —
  the tfidf round-6 precedent absorbs ≤1 ulp libm variance) so the
  per-document reduction is an exact integer sum: order-independent,
  engine-portable, and immune to summation-order drift on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

LR_SCALE = 1_000_000  # fixed-point scale for per-bucket log-ratios


def _bucket(tok: Column, n_buckets: int, seed: int) -> Column:
    return F.pmod(md5_long(tok, seed=seed), F.lit(n_buckets)).cast("long")


def _doc_buckets(docs: DataFrame, target_filter: Column, id_col: str,
                 text_col: str, n_buckets: int, seed: int) -> DataFrame:
    """(id, tgt, bucket, cnt) hashed-unigram counts — the ONE corpus
    tokenization both the model and the per-doc scoring derive from.
    The explode streams through codegen; groupBy(id, bucket) combines
    map-side before any exchange. Production note: persist this frame
    when running model + scoring in one job — otherwise the corpus is
    scanned twice (still hash-only after the first projection)."""
    tok = F.explode(TX.tokens(text_col)).alias("tok")
    return (docs.select(F.col(id_col).alias("_id"),
                        target_filter.alias("_tgt"), tok)
            .select("_id", "_tgt", _bucket(F.col("tok"), n_buckets, seed)
                    .alias("bucket"))
            .groupBy("_id", "_tgt", "bucket").agg(F.count("*").alias("cnt")))


def _model_from_buckets(db: DataFrame, n_buckets: int,
                        alpha: float) -> DataFrame:
    """Fold the per-doc bucket counts into the B-row model table:
    (bucket, lr_int) where ``lr_int = round((ln p̂_target − ln q̂_raw)
    · 10^6)`` with add-α smoothing over the bucket vocabulary. Both
    aggregates here are over ≤B·docs rows already combined map-side;
    the totals are a second, B-row agg."""
    b = (db.groupBy("bucket")
         .agg(F.sum("cnt").cast("long").alias("n_raw"),
              F.sum(F.when(F.col("_tgt"), F.col("cnt")).otherwise(0))
              .cast("long").alias("n_tgt")))
    tot = b.agg(F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt"))
    lr = (F.log((F.col("n_tgt") + alpha)
                / (F.col("t_tgt") + alpha * n_buckets))
          - F.log((F.col("n_raw") + alpha)
                  / (F.col("t_raw") + alpha * n_buckets)))
    return (b.crossJoin(F.broadcast(tot))
            .select("bucket",
                    F.round(lr * LR_SCALE).cast("long").alias("lr_int")))


def feature_log_ratios(docs: DataFrame, target_filter: Column,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = 64, alpha: float = 1.0,
                       seed: int = 11) -> DataFrame:
    """The B-row DSIR model table (see :func:`_model_from_buckets`),
    built from one corpus tokenization."""
    db = _doc_buckets(docs, target_filter, id_col, text_col,
                      n_buckets, seed)
    return _model_from_buckets(db, n_buckets, alpha)


def importance_weights(docs: DataFrame, target_filter: Column,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = 64, alpha: float = 1.0,
                       seed: int = 11) -> DataFrame:
    """Per-document DSIR log importance weights:
    (id_col, n_tokens, weight). ``weight`` is the exact integer
    Σ cnt_b · lr_int_b rescaled to 6 decimals. The model and the scoring
    share one tokenization lineage (the corpus is tokenized once; the
    second pass over it for scoring re-reads hashes only)."""
    db = _doc_buckets(docs, target_filter, id_col, text_col,
                      n_buckets, seed)
    model = _model_from_buckets(db, n_buckets, alpha)
    per_doc = (db.join(F.broadcast(model), "bucket")
               .groupBy("_id")
               .agg(F.sum("cnt").cast("long").alias("n_tokens"),
                    F.sum(F.col("cnt") * F.col("lr_int")).cast("long")
                    .alias("w_int")))
    return per_doc.select(
        F.col("_id").alias(id_col), "n_tokens",
        (F.col("w_int") / LR_SCALE).alias("weight"))


def select_top_fraction(weights: DataFrame, fraction: float,
                        id_col: str = "doc_id") -> DataFrame:
    """Hard DSIR selection: keep the top ``fraction`` of documents by
    weight (ties broken by id — deterministic). A global sort of the
    B-byte (id, weight) projection, not of the corpus; the kept-id set
    then semi-joins back against the full rows."""
    n = weights.count()
    k = max(1, int(n * fraction))
    return (weights.orderBy(F.col("weight").desc(), F.col(id_col))
            .limit(k))


def importance_weights_sql(table: str, target_pred: str,
                           id_col: str = "doc_id", text_col: str = "text",
                           n_buckets: int = 64, alpha: float = 1.0,
                           seed: int = 11) -> str:
    """DuckDB twin of :func:`importance_weights` — identical buckets,
    identical smoothing, identical integerized log-ratios and exact
    integer per-doc sums."""
    toks = TX.tokens_sql(text_col)
    h = md5_long_sql("tok", seed=seed)
    return f"""
WITH tokd AS MATERIALIZED (
  SELECT {id_col} AS _id, ({target_pred}) AS _tgt,
         {h} % {n_buckets} AS bucket
  FROM {table}, unnest({toks}) AS u(tok)),
model AS MATERIALIZED (
  SELECT bucket,
         CAST(round((ln((sum(CASE WHEN _tgt THEN 1 ELSE 0 END) + {alpha})
                     / (sum(sum(CASE WHEN _tgt THEN 1 ELSE 0 END)) OVER ()
                        + {alpha * n_buckets}))
                   - ln((count(*) + {alpha})
                     / (sum(count(*)) OVER () + {alpha * n_buckets})))
                    * {LR_SCALE}) AS BIGINT) AS lr_int
  FROM tokd GROUP BY bucket),
per_doc AS (
  SELECT _id, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM tokd GROUP BY _id, bucket)
SELECT _id AS {id_col},
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(sum(cnt * lr_int) AS BIGINT) / {float(LR_SCALE)} AS weight
FROM per_doc JOIN model USING (bucket)
GROUP BY _id"""
