"""Boilerplate n-gram detection — de-templating for web-crawl corpora.

Navigation bars, cookie banners, footer legalese: the grams that appear
in a large FRACTION OF A SOURCE'S DOCUMENTS (document frequency, not
term frequency — a gram repeated inside one page is repetition, a gram
repeated across a site's pages is template). The standard pre-training
cleanup (CCNet/RefinedWeb-style) flags them per source and scores each
document by how much of it is template.

Scale design (100 TB):
- ``shingles`` emits each document's DISTINCT grams, so a plain
  count per (source, gram) IS the document frequency — no extra
  distinct pass;
- the counting shuffle carries md5-LONG gram keys (8 bytes — the
  dedup-family key discipline, measured 2.5× on the contamination
  matrix), never gram strings;
- flagged grams are few BY CONSTRUCTION (doc-frequency ≥ a percent-
  scale floor caps them at ~10000/min_doc_bps per source), so their
  TEXT is recovered with a broadcast semi-join against a second scan —
  strings only ever move for the flagged tail;
- the threshold compares exact integers (basis points), so any engine
  draws the same boundary.

Collision note (same contract as ``cross_source_matrix``): a 60-bit
collision between two grams in one source merges their document sets;
at web scale expect a handful of merged rows per ~1e9 distinct grams —
harmless for removal (both grams were near-boilerplate), and ``gram``
reports the lexicographic min of the colliding texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
from rgd_rnaseq_workflows_spark.functions.text import shingles


def boilerplate_ngrams(corpus: DataFrame, shingle_n: int = 3,
                       min_doc_bps: int = 2000, min_docs: int = 2,
                       source_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Per-source template grams: (source, gram, n_docs, doc_frac6) for
    every ``shingle_n``-gram occurring in ≥ ``min_doc_bps``/10000 of the
    source's documents AND ≥ ``min_docs`` documents."""
    g = (corpus.select(F.col(source_col).alias("source"),
                       F.explode(shingles(text_col, shingle_n))
                       .alias("g"))
         .filter(F.col("g") != ""))
    hashed = g.select("source", md5_long(F.col("g")).alias("h"), "g")
    # distinct grams per doc → count == document frequency; min(g)
    # resolves the gram NAME in the same map-side-combined pass (the
    # partial min collapses each group's gram bytes to one value per
    # map task), so the corpus explode + md5 run ONCE — the previous
    # two-pass form re-derived the whole exploded gram table a second
    # time just to name the flagged survivors
    freq = hashed.groupBy("source", "h").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("g").alias("gram"))
    totals = (corpus.groupBy(F.col(source_col).alias("source"))
              .agg(F.count("*").cast("long").alias("_n_src")))
    flagged = (freq.join(F.broadcast(totals), "source")
               .filter((F.col("n_docs") >= min_docs)
                       & (F.col("n_docs") * 10000
                          >= F.lit(min_doc_bps) * F.col("_n_src"))))
    return flagged.select("source", "gram", "n_docs",
                          F.round(F.col("n_docs") / F.col("_n_src"), 6)
                          .alias("doc_frac6"))


def boilerplate_score(corpus: DataFrame, flagged: DataFrame,
                      shingle_n: int = 3, source_col: str = "source",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document template fraction against a flagged-gram table (from
    :func:`boilerplate_ngrams`): (doc_id, n_grams, n_flagged,
    boilerplate_frac) — the quality gate input. The flagged set
    broadcasts; the corpus streams map-side (the contamination_report
    shape), both counts from ONE exploded pass."""
    marks = (flagged.select("source", md5_long(F.col("gram")).alias("h"))
             .distinct().withColumn("_hit", F.lit(1)))
    doc_g = (corpus.select(F.col(id_col), F.col(source_col).alias("source"),
                           F.explode(shingles(text_col, shingle_n))
                           .alias("g"))
             .filter(F.col("g") != "")
             .select(id_col, "source", md5_long(F.col("g")).alias("h")))
    return (doc_g.join(F.broadcast(marks), ["source", "h"], "left")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.count("_hit").cast("long").alias("n_flagged"))
            .select(id_col, "n_grams", "n_flagged",
                    F.round(F.col("n_flagged") / F.col("n_grams"), 6)
                    .alias("boilerplate_frac")))


def boilerplate_ngrams_sql(table: str = "documents", shingle_n: int = 3,
                           min_doc_bps: int = 2000, min_docs: int = 2,
                           source_col: str = "source",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`boilerplate_ngrams` — identical md5-long
    keys (collision-identical), identical integer threshold."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
    sh = shingles_sql(text_col, shingle_n)
    h = md5_long_sql("g")
    return f"""
WITH g AS MATERIALIZED (
  SELECT {source_col} AS source, g FROM (
    SELECT {source_col}, unnest({sh}) AS g FROM {table})
  WHERE g <> ''),
freq AS MATERIALIZED (
  SELECT source, {h} AS h, CAST(count(*) AS BIGINT) AS n_docs
  FROM g GROUP BY source, {h}),
tot AS (SELECT {source_col} AS source,
               CAST(count(*) AS BIGINT) AS n_src
        FROM {table} GROUP BY 1),
flagged AS MATERIALIZED (
  SELECT source, h, n_docs, n_src FROM freq JOIN tot USING (source)
  WHERE n_docs >= {min_docs}
    AND n_docs * 10000 >= {min_doc_bps} * n_src),
names AS (
  SELECT source, h, min(g) AS gram
  FROM (SELECT source, {h} AS h, g FROM g)
  JOIN (SELECT DISTINCT source, h FROM flagged) USING (source, h)
  GROUP BY source, h)
SELECT source, gram, n_docs,
       round(CAST(n_docs AS DOUBLE) / n_src, 6) AS doc_frac6
FROM flagged JOIN names USING (source, h)"""
