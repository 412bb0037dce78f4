"""Benchmark contamination detection for training corpora.

Before training, a corpus must be screened against held-out evaluation
sets: a document sharing long n-grams with a benchmark leaks the test set
into training. The standard check (n-gram overlap, as in GPT-3/PaLM data
decontamination) is relational:

    benchmark  → distinct n-gram shingles         (small: eval sets)
    corpus doc → its shingles ∩ benchmark shingles → overlap count/ratio

Scale design (100 TB):
- the benchmark shingle set is TINY relative to the corpus (eval sets are
  thousands of docs) → broadcast hash LEFT join: the corpus side streams
  through map-side, NO shuffle of corpus text;
- corpus shingles explode inside the scan stage; the per-doc aggregation
  derives BOTH counts from the exploded rows in one pass —
  ``n_shingles = count(*)`` (shingles are distinct per doc) and
  ``n_shared = count(hit marker)`` — so the shingle regex runs once per
  document, never per exploded row (a ``size(shingles(...))`` grouping
  column re-evaluates the regex 50× per doc post-explode: measured 17 s
  → 1.5 s at sf0.1 for the one-pass form);
- partial aggregation collapses the shuffle to one row per (partition,
  doc) before the exchange;
- output is the contaminated docs (tiny), not an annotated corpus — an
  anti-join against it cleans the corpus without touching clean rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.text import shingles


def contamination_report(corpus: DataFrame, benchmark: DataFrame,
                         shingle_n: int = 3, min_shared: int = 1,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Corpus docs sharing ≥ ``min_shared`` distinct word ``shingle_n``-grams
    with any benchmark doc: (doc_id, n_shingles, n_shared, overlap_ratio).

    ``shingles`` emits each doc's DISTINCT grams, so ``n_shared`` is the
    intersection cardinality |grams(doc) ∩ grams(benchmark)|.
    """
    bench_sh = (benchmark
                .select(F.explode(shingles(text_col, shingle_n)).alias("sh"))
                .distinct()
                .withColumn("_hit", F.lit(1)))
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("sh"))
    marked = doc_sh.join(F.broadcast(bench_sh), "sh", "left")
    return (marked
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shingles"),
                 F.count("_hit").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
            .select(id_col,
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    F.col("n_shared").cast("long").alias("n_shared"),
                    F.round(F.col("n_shared") / F.col("n_shingles"), 4)
                    .alias("overlap_ratio")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  shingle_n: int = 3, min_shared: int = 1,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The corpus minus contaminated docs: anti-join against the (tiny)
    report, so clean rows are never shuffled."""
    bad = contamination_report(corpus, benchmark, shingle_n, min_shared,
                               id_col, text_col).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


def cross_source_matrix(corpus: DataFrame, shingle_n: int = 3,
                        min_shared: int = 1, source_col: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how
    many distinct ``shingle_n``-grams they share — "which source leaked
    into which" (mirror-site crawls, aggregator re-posts, benchmark
    splits landing in two feeds). Returns
    (source_a, source_b, n_shared) with source_a < source_b.

    Scale shape: the per-source distinct shingle table is the only
    thing that shuffles (map-side-combined distinct on (source, gram) —
    corpus text never moves); the pair join is an equi self-join on the
    gram, and with S sources a gram shared by k sources expands to
    k(k−1)/2 ≤ S²/2 rows — sources are few, so the join output is
    pair-count scale. The matrix is S²/2 rows of metadata.
    """
    # NOT checkpointed: the self-join's two branches shuffle the same
    # subtree on the same key, so ReuseExchange already computes the
    # distinct table once — an explicit localCheckpoint was measured
    # SLOWER (161 s → 273 s at 100×: it forces a full materialization
    # the reused exchange never pays).
    # Grams are hashed to longs BEFORE the distinct (the dedup-family
    # key discipline): the shuffle and join carry 8-byte keys instead
    # of strings. r12 (guide §4.1): the hash is codegen ``xxhash64``
    # instead of md5+hex-``conv`` — the gram keys are INTERNAL (the
    # output is shared-gram COUNTS; the DuckDB twin keeps md5 keys and
    # counts the same distinct grams whenever neither family collides,
    # the dedup.hashed_shingles argument). Honest collision note: a
    # 64-bit collision between grams UNIQUE to two different sources
    # fabricates a shared key — at web scale (~1e11 distinct grams)
    # expect n²/2^65 ≈ hundreds of collisions, so treat min_shared=1
    # rows as candidates and use min_shared ≥ 2 for alerting.
    # Empty grams are dropped: shingles() emits a doc's full token
    # string when shorter than n, and a blank document would otherwise
    # pair every source containing one.
    sh = (corpus.select(F.col(source_col).alias("_src"),
                        F.explode(shingles(text_col, shingle_n))
                        .alias("_g"))
          .filter(F.col("_g") != "")
          .select("_src", F.xxhash64(F.col("_g")).alias("sh"))
          .distinct())
    a = sh.select(F.col("_src").alias("source_a"), "sh")
    b = sh.select(F.col("_src").alias("source_b"), "sh")
    # count(*), NOT countDistinct: both join sides are distinct on
    # (source, gram), so the joined triples (gram, a, b) are already
    # unique — a countDistinct here forces a useless dedup expansion
    # (measured 312 s → 161 s at the 100× replica)
    return (a.join(b, "sh")
            .filter(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count("*").cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def cross_source_matrix_sql(table: str = "documents", shingle_n: int = 3,
                            min_shared: int = 1,
                            source_col: str = "source",
                            text_col: str = "text") -> str:
    """DuckDB twin of :func:`cross_source_matrix` (md5-long gram keys;
    the Spark side uses xxhash64 — shared-gram counts agree whenever
    neither hash family collides on the gram vocabulary)."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
    sh = shingles_sql(text_col, shingle_n)
    h = md5_long_sql("g")
    return f"""
WITH sh AS MATERIALIZED (
  SELECT DISTINCT src, {h} AS g FROM (
    SELECT {source_col} AS src, unnest({sh}) AS g FROM {table})
  WHERE g <> '')
SELECT a.src AS source_a, b.src AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM sh a JOIN sh b ON a.g = b.g AND a.src < b.src
GROUP BY a.src, b.src
HAVING count(*) >= {min_shared}
"""
