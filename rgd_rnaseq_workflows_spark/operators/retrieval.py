"""BM25 full-text retrieval over the document corpus.

The retrieval primitive a training-data pipeline runs constantly:
benchmark-contamination hunts ("find the corpus docs that look like this
eval question"), targeted curation ("pull docs about X for a domain
mix"), and dedup triage all reduce to sparse lexical top-k. This is the
Okapi BM25 / Lucene scoring function (Robertson & Zaragoza 2009) as ONE
declarative plan — no inverted-index service needed; the corpus scan IS
the index probe, and Catalyst prunes it to the query's posting lists.

Scale shape (the part that matters at 100 TB):
- the token explode is filtered to the QUERY TERMS immediately — the
  shuffle carries only the query's posting lists (docs × matched terms),
  never the corpus vocabulary;
- df/N/avgdl are one tiny agg each, broadcast back (driver-scale
  metadata, the same rule the ANN codebooks follow);
- top-k is TakeOrderedAndProject on the per-doc score.

Cross-engine exactness: tf, dl, df, N, Σdl are exact BIGINTs; each
per-term score is a FIXED scalar expression tree (one ln, a handful of
*/+) rounded to 6 decimals and scaled to an exact micro-unit BIGINT, and
the per-doc score is the INTEGER sum of those units — order-independent,
so Spark and DuckDB agree bit-for-bit (the float log-prob-sum trap the
bigram LM documents is avoided the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX


def bm25_s6(n_docs, total_len, k1: float = 1.2,
            b: float = 0.75):
    """The ONE definition of the per-posting micro-unit BM25 score —
    shared by the in-query path and every persisted-index probe
    (single + batch), so probe == in-query equality is structural,
    not three hand-synced copies of the expression tree. Expects
    columns ``tf``, ``df``, ``dl`` in scope; ``n_docs``/``total_len``
    may be Columns (in-query) or Python ints (index meta)."""
    n_docs = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    total_len = F.lit(total_len) if isinstance(total_len, int) \
        else total_len
    idf = F.log(F.lit(1.0) + (n_docs - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    # dl·N and Σdl are exact ints; ONE division yields the length norm
    norm = (F.col("dl") * n_docs).cast("double") / total_len
    term_score = (idf * F.col("tf") * (k1 + 1.0)
                  / (F.col("tf") + k1 * (1.0 - b + b * norm)))
    return F.round(term_score * 1e6).cast("long")


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-``k`` documents for ``query`` (whitespace terms, matching the
    corpus tokenizer) by BM25: ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b
    + b·dl/avgdl))`` with the Lucene idf ``ln(1 + (N−df+0.5)/(df+0.5))``.
    Returns (doc_id, n_terms_hit, bm25), score desc / id asc."""
    terms = sorted({t for t in query.split() if t})
    toks = TX.tokens(text_col)
    dl = docs.select(F.col(id_col), F.size(toks).cast("long").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("total_len"))
    tf = (docs.select(F.col(id_col), F.explode(toks).alias("term"))
          .filter(F.col("term").isin(terms))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    sc = (tf.join(F.broadcast(df_), "term")
          .join(dl, id_col)
          .crossJoin(F.broadcast(stats)))
    s6 = bm25_s6(F.col("n_docs"), F.col("total_len"), k1, b)
    return (sc.groupBy(id_col)
            .agg(F.sum(s6).alias("_s6"),
                 F.count("*").alias("n_terms_hit"))
            .select(F.col(id_col), "n_terms_hit",
                    (F.col("_s6") / 1e6).alias("bm25"), "_s6")
            .orderBy(F.desc("_s6"), id_col).limit(k)
            .drop("_s6"))


def bm25_topk_sql(table: str = "documents", query: str = "", k: int = 10,
                  k1: float = 1.2, b: float = 0.75,
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    terms = sorted({t for t in query.split() if t})
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = TX.tokens_sql(text_col)
    return f"""
WITH dl AS (
  SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS dl FROM {table}),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_len FROM dl),
tf AS (
  SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT {id_col}, unnest({toks}) AS term FROM {table})
  WHERE term IN ({in_list})
  GROUP BY {id_col}, term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT t.{id_col},
         CAST(round(
           ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * t.tf * {k1 + 1.0}
           / (t.tf + {k1} * (1.0 - {b}
              + {b} * (CAST(d.dl * s.n_docs AS DOUBLE) / s.total_len)))
           * 1e6) AS BIGINT) AS s6
  FROM tf t JOIN df f USING (term) JOIN dl d USING ({id_col}), stats s)
SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_terms_hit,
       sum(s6) / 1e6 AS bm25
FROM sc GROUP BY {id_col}
ORDER BY sum(s6) DESC, {id_col} LIMIT {k}
"""


def rrf_fusion(docs: DataFrame, emb: DataFrame, query_text: str,
               query_id: int, k: int = 10, k0: int = 60,
               n_candidates: int = 20, id_col: str = "doc_id",
               vec_id_col: str = "vec_id",
               text_col: str = "text") -> DataFrame:
    """Hybrid retrieval: the BM25 lexical rank list and the exact-
    cosine dense rank list fused by Reciprocal Rank Fusion (Cormack,
    Clarke & Buettcher 2009) — the standard zero-tuning hybrid that
    outperforms either list alone because rank positions, unlike raw
    scores, are comparable across scoring functions.

    Each list contributes ``1e6 div (k0 + rank)`` micro-points (exact
    integer division — no float accumulation, so the DuckDB twin
    reproduces the fused order bit-for-bit); documents in only one
    list score that list alone (full outer join). Returns
    (doc_id, lex_rank, dense_rank, rrf_micro), fused desc / id asc,
    top ``k`` of the two ``n_candidates``-deep lists.

    Scale shape: both rank lists are already top-n_candidates
    (TakeOrdered per list — no corpus sort); ranking and fusion run on
    2·n_candidates rows of driver-adjacent metadata."""
    from pyspark.sql import Window

    from rgd_rnaseq_workflows_spark.operators.similarity import (
        brute_force_topk, query_vector)
    lex = bm25_topk(docs, query_text, k=n_candidates, id_col=id_col,
                    text_col=text_col)
    dense = brute_force_topk(emb, query_vector(emb, query_id,
                                               id_col=vec_id_col),
                             k=n_candidates, id_col=vec_id_col)
    # rank within each candidate list (candidate frames are tiny —
    # the single-partition window is metadata-scale by construction)
    w_lex = Window.orderBy(F.desc("bm25"), id_col)
    w_den = Window.orderBy(F.desc("cosine_sim"), vec_id_col)
    lr = lex.select(F.col(id_col).alias("_id"),
                    F.row_number().over(w_lex).alias("lex_rank"))
    dr = dense.select(F.col(vec_id_col).alias("_id"),
                      F.row_number().over(w_den).alias("dense_rank"))
    pts = (F.coalesce(F.expr(f"1000000 div ({k0} + lex_rank)"), F.lit(0))
           + F.coalesce(F.expr(f"1000000 div ({k0} + dense_rank)"),
                        F.lit(0)))
    return (lr.join(dr, "_id", "full_outer")
            .select(F.col("_id").alias(id_col), "lex_rank", "dense_rank",
                    pts.cast("long").alias("rrf_micro"))
            .orderBy(F.desc("rrf_micro"), id_col).limit(k))


def rrf_fusion_sql(docs_table: str, emb_table: str, query_text: str,
                   query_id: int, k: int = 10, k0: int = 60,
                   n_candidates: int = 20, id_col: str = "doc_id",
                   vec_id_col: str = "vec_id",
                   text_col: str = "text") -> str:
    """DuckDB twin of :func:`rrf_fusion` — the bm25_topk twin and the
    brute-force cosine list re-ranked and fused with the identical
    integer-division point rule."""
    lex = bm25_topk_sql(docs_table, query_text, k=n_candidates,
                        id_col=id_col, text_col=text_col)
    return f"""
WITH lex AS ({lex}),
lr AS (
  SELECT {id_col} AS _id, CAST(row_number() OVER (
    ORDER BY bm25 DESC, {id_col}) AS INTEGER) AS lex_rank
  FROM lex),
dense AS (
  SELECT {vec_id_col},
         round(list_cosine_similarity(
           CAST(embedding AS DOUBLE[]),
           (SELECT CAST(embedding AS DOUBLE[]) FROM {emb_table}
            WHERE {vec_id_col} = {query_id})), 6) AS cosine_sim
  FROM {emb_table}
  ORDER BY cosine_sim DESC, {vec_id_col} LIMIT {n_candidates}),
dr AS (
  SELECT {vec_id_col} AS _id, CAST(row_number() OVER (
    ORDER BY cosine_sim DESC, {vec_id_col}) AS INTEGER) AS dense_rank
  FROM dense)
SELECT coalesce(lr._id, dr._id) AS {id_col}, lex_rank, dense_rank,
       CAST(coalesce(1000000 // ({k0} + lex_rank), 0)
            + coalesce(1000000 // ({k0} + dense_rank), 0) AS BIGINT)
         AS rrf_micro
FROM lr FULL JOIN dr ON lr._id = dr._id
ORDER BY rrf_micro DESC, {id_col} LIMIT {k}
"""
