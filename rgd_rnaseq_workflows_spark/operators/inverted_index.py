"""Persisted inverted (BM25) index — the layout-family treatment for
lexical retrieval, completing the index triad: ``ivf_index`` (dense
vectors), ``lsh_index`` (near-dup signatures), and this module (sparse
lexical posting lists).

The in-query BM25 path (``retrieval.bm25_topk``) tokenizes the LAKE on
every query; a production retrieval service builds posting lists ONCE
and amortizes them across every query, contamination hunt, and targeted
curation pull. Persisted artifacts:

- the posting table ``(term, doc_id, tf, dl)`` written
  ``partitionBy(_epoch, _tb)`` where ``_tb = pmod(xxhash64(term),
  num_buckets)`` and sorted ``(_tb, term)`` within partitions — a
  probe for q query terms lists only their term-hash bucket
  DIRECTORIES, and inside each bucket's files the rows are
  term-ordered so the pushed term IN-list prunes at the parquet
  row-group level (min/max footers over a sorted column — the
  ``lsh_index`` band_hash contract). ``dl`` is denormalized into the
  posting row (the Lucene "norms" statistic) so scoring needs no
  doc-length side join. The leading ``_epoch`` level is the
  exactly-once unit: each build/append/streaming micro-batch owns one
  epoch directory, retried via dynamic partition overwrite (see
  ``index_ledger``);
- a 1-row ``meta`` parquet ``(num_buckets)`` — the FROZEN bucketing
  parameter, so probes are self-describing (probing with a mismatched
  bucket count would silently scan the wrong directories);
- a ``ledger`` parquet (one row per committed epoch) carrying the
  ADDITIVE corpus statistics ``(n_docs, total_len)`` — N and
  avgdl = Σtotal_len/ΣN are ledger sums, so a replayed ingest epoch
  can no-op instead of double-counting them.

Per-term ``df`` is NOT persisted: the pruned scan already holds every
posting row of each query term, so ``df = count(*) per term`` over that
scan is exact, free, and — unlike a stored df — automatically correct
after incremental appends.

Scale shape: the build is one tokenize + two map-side-combined
aggregations + one repartition-on-bucket write (the ``write_zordered``
contract); the probe reads a 1-row meta, then ONE directory- and
footer-pruned scan whose size is the query's posting lists — the corpus
is never touched. There is no early-termination (WAND/maxscore) step by
design: in Spark's batch model the win comes from scan pruning, and the
scoring aggregation over the pruned postings is already
posting-list-sized; a skip-pointer walk would serialize what the
pruned scan parallelizes.

Cross-engine exactness: identical to ``retrieval.bm25_topk`` — tf, dl,
df, N, Σdl are exact BIGINTs, each per-term score is rounded to an
exact micro-unit BIGINT, and the per-doc score is the integer sum of
those units (probe == in-query top-k is test-pinned, not assumed).

Reference scope note: the reference pipeline has no retrieval surface;
LLM-pipeline extension family (lexical retrieval at 100 TB: the lake's
posting lists are the asset, not a per-query intermediate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rgd_rnaseq_workflows_spark.functions import text as TX


def _postings_parts(docs: DataFrame, id_col: str, text_col: str,
                    num_buckets: int) -> tuple[DataFrame, DataFrame]:
    """(postings, dl): postings is one (term, doc_id, tf, dl, _tb) row
    per (doc, term) with the doc's exact token length denormalized in;
    ``dl`` is the (doc_id, dl) length table, lineage-truncated so the
    corpus is tokenized for it ONCE and the meta statistics aggregate
    the materialized doc-scale table instead of re-scanning."""
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    toks = TX.tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("_t"))
    dl = checkpoint_df(
        base.select(id_col, F.size("_t").cast("long").alias("dl")),
        eager=False)
    tf = (base.select(F.col(id_col), F.explode("_t").alias("term"))
          .groupBy(id_col, "term").agg(F.count("*").alias("tf")))
    post = (tf.join(dl, id_col)
            .withColumn("_tb", F.pmod(F.xxhash64("term"),
                                      F.lit(num_buckets)).cast("int")))
    return post, dl


def _write_layout(post: DataFrame, dl: DataFrame, path: str,
                  epoch_key: str, base: bool) -> None:
    """One epoch's postings + its ledger commit row, in that order
    (the ledger row is the commit marker — see ``index_ledger``)."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        clear_dir, commit_ledger_row)
    if base:
        clear_dir(post.sparkSession, f"{path}/postings")
    # sort by (_tb, term), not term alone: the file writer requires its
    # input ordered by the partition columns and would otherwise insert
    # its own Sort(_tb), destroying the term order the footer pruning
    # relies on (the lsh_index band_hash lesson). The epoch is the
    # TARGET DIRECTORY, never a constant column — the optimizer would
    # eliminate a foldable sort key and re-trigger that writer sort.
    # mode("overwrite") on the epoch dir = a retried epoch heals its
    # own partial files instead of appending a second copy.
    (post.repartition(F.col("_tb"))
     .sortWithinPartitions("_tb", "term")
     .write.mode("overwrite").partitionBy("_tb")
     .parquet(f"{path}/postings/_epoch={epoch_key}"))
    commit_ledger_row(
        dl.agg(F.count("*").cast("long").alias("n_docs"),
               F.coalesce(F.sum("dl"), F.lit(0)).cast("long")
               .alias("total_len")),
        path, epoch_key, base=base)


def write_inverted_index(docs: DataFrame, path: str,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 32) -> None:
    """Persist the posting-list layout under ``{path}/postings``
    (epoch ``base``), the frozen bucketing parameter under
    ``{path}/meta``, and the base epoch's corpus statistics under
    ``{path}/ledger``."""
    post, dl = _postings_parts(docs, id_col, text_col, num_buckets)
    spark = docs.sparkSession
    (spark.createDataFrame([(num_buckets,)], "num_buckets int")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        BASE_EPOCH)
    _write_layout(post, dl, path, BASE_EPOCH, base=True)


def read_inverted_meta(spark: SparkSession,
                       path: str) -> tuple[int, int, int]:
    """(n_docs, total_len, num_buckets): the additive statistics are
    the exact sum over committed ledger epochs (never double-counted —
    an uncommitted epoch's partial postings are invisible here, and
    its retry replaces them); num_buckets is the frozen meta param."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        ledger_sum)
    [r] = spark.read.parquet(f"{path}/meta").collect()
    n_docs, total_len = ledger_sum(spark, path, ["n_docs", "total_len"])
    return n_docs, total_len, r["num_buckets"]


def append_to_inverted_index(new_docs: DataFrame, path: str,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             epoch_key: str | None = None) -> bool:
    """Incremental index maintenance, exactly-once per ``epoch_key``:
    a delta batch's postings land under their own ``_epoch`` directory
    (existing epochs are never touched) and the epoch's N/Σdl land in
    the ledger as the commit marker. A replayed epoch key is a no-op
    (returns False); a retry after a crash between the two writes
    dynamically overwrites the same partitions and then commits — so
    df/tf/N/avgdl can never double-count (test-pinned by calling the
    append twice and pinning probe equality). Probes stay exact
    because df is computed from the pruned scan and N/Σdl from the
    ledger sum.

    ``epoch_key=None`` mints a fresh ``batch-N`` key (plain append
    semantics for ad-hoc CLI use — pass an explicit key to make a
    specific append retry-safe, as the streaming sink does)."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        assert_unclaimed_epoch_dir, ledger_keys, next_batch_key)
    spark = new_docs.sparkSession
    if epoch_key is None:
        epoch_key = next_batch_key(spark, path)
        assert_unclaimed_epoch_dir(spark, f"{path}/postings", epoch_key)
    elif epoch_key in ledger_keys(spark, path):
        return False
    _, _, num_buckets = read_inverted_meta(spark, path)
    post, dl = _postings_parts(new_docs, id_col, text_col, num_buckets)
    _write_layout(post, dl, path, epoch_key, base=False)
    return True


def _pruned_scan(spark: SparkSession, path: str, terms: list[str],
                 num_buckets: int) -> DataFrame:
    """ONE pruned posting read for a term set: directory pruning on the
    term-hash bucket IN-list plus the pushed, footer-prunable term
    IN-list. Bucket ids replay the writer's pmod(xxhash64) on a
    terms-sized literal frame — metadata-scale by construction."""
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    tbs = sorted({r["_tb"] for r in
                  tdf.select(F.pmod(F.xxhash64("term"),
                                    F.lit(num_buckets)).cast("int")
                             .alias("_tb")).distinct().collect()})
    return (spark.read.parquet(f"{path}/postings")
            .filter(F.col("_tb").isin(tbs) & F.col("term").isin(terms)))


def _score_postings(scan: DataFrame, n_docs: int, total_len: int,
                    k: int, k1: float, b: float,
                    id_col: str) -> DataFrame:
    """The ``retrieval.bm25_topk`` scoring tail over an already-pruned
    posting frame: broadcast df, the SHARED ``retrieval.bm25_s6``
    micro-unit scalar tree, integer per-doc sum, TakeOrdered top-k."""
    from rgd_rnaseq_workflows_spark.operators.retrieval import bm25_s6
    df_ = scan.groupBy("term").agg(F.count("*").alias("df"))
    sc = scan.join(F.broadcast(df_), "term")
    s6 = bm25_s6(n_docs, total_len, k1, b)
    return (sc.groupBy(id_col)
            .agg(F.sum(s6).alias("_s6"),
                 F.count("*").alias("n_terms_hit"))
            .select(F.col(id_col), "n_terms_hit",
                    (F.col("_s6") / 1e6).alias("bm25"), "_s6")
            .orderBy(F.desc("_s6"), id_col).limit(k)
            .drop("_s6"))


def bm25_index_topk(spark: SparkSession, path: str, query: str,
                    k: int = 10, k1: float = 1.2, b: float = 0.75,
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for one query against the persisted layout:
    meta read (1 row) → pruned posting scan → exact micro-unit BM25.
    Returns (doc_id, n_terms_hit, bm25), score desc / id asc — equal to
    ``retrieval.bm25_topk`` over the indexed corpus (test-pinned)."""
    n_docs, total_len, num_buckets = read_inverted_meta(spark, path)
    terms = sorted({t for t in query.split() if t})
    if not terms or total_len == 0:
        scan = spark.read.parquet(f"{path}/postings")
        return (scan.select(F.col(id_col),
                            F.lit(0).cast("long").alias("n_terms_hit"),
                            F.lit(0.0).alias("bm25"))
                .filter(F.lit(False)))
    scan = _pruned_scan(spark, path, terms, num_buckets)
    return _score_postings(scan, n_docs, total_len, k, k1, b, id_col)


def bm25_index_topk_batch(spark: SparkSession, queries: DataFrame,
                          path: str, k: int = 10, k1: float = 1.2,
                          b: float = 0.75, id_col: str = "doc_id",
                          qid_col: str = "qid",
                          query_col: str = "query") -> DataFrame:
    """Many queries in ONE pass: the union of all query terms prunes
    the scan once (the term→bucket map is metadata-scale — queries ×
    terms rows), each query joins only to its own terms' postings, df
    stays a GLOBAL per-term statistic, and the house two-phase grouped
    top-k ranks per query. Returns (qid, doc_id, n_terms_hit, bm25,
    rank) — per-query rank equal to running :func:`bm25_index_topk`
    per query (test-pinned)."""
    from rgd_rnaseq_workflows_spark.operators.retrieval import bm25_s6
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        _grouped_topk)
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    n_docs, total_len, num_buckets = read_inverted_meta(spark, path)
    # \s+ split == the single-query probe's Python str.split(): both
    # APIs must parse 'foo\tbar' into the same term set or batch ==
    # per-query parity silently breaks on non-space whitespace.
    # checkpoint: the queries-scale frame feeds both the term-list
    # collect and the scored join — truncate so the explode+distinct
    # runs once, not per consumer
    qterms = checkpoint_df(
        (queries.select(F.col(qid_col).alias("qid"),
                        F.explode(F.split(F.col(query_col),
                                          r"\s+")).alias("term"))
         .filter(F.col("term") != "")
         .distinct()), eager=False)
    terms = sorted({r["term"] for r in
                    qterms.select("term").distinct().collect()})
    if not terms or total_len == 0:
        # empty result with the REAL output schema (qid keeps the
        # caller's type, doc_id the index's) — not a hardcoded guess
        idx_id_type = spark.read.parquet(f"{path}/postings") \
            .schema[id_col].dataType
        fields = T.StructType([
            T.StructField("qid", queries.schema[qid_col].dataType),
            T.StructField(id_col, idx_id_type),
            T.StructField("n_terms_hit", T.LongType()),
            T.StructField("bm25", T.DoubleType()),
            T.StructField("rank", T.IntegerType())])
        return spark.createDataFrame([], fields)
    scan = _pruned_scan(spark, path, terms, num_buckets)
    df_ = scan.groupBy("term").agg(F.count("*").alias("df"))
    sc = (qterms.join(scan, "term")
          .join(F.broadcast(df_), "term"))
    s6 = bm25_s6(n_docs, total_len, k1, b)
    per_doc = (sc.groupBy("qid", id_col)
               .agg(F.sum(s6).alias("_s6"),
                    F.count("*").alias("n_terms_hit")))
    scored = per_doc.select("qid", F.col(id_col).alias("vec_id"),
                            (F.col("_s6") / 1e6).alias("cosine_sim"),
                            "n_terms_hit")
    ranked = _grouped_topk(scored.select("qid", "vec_id", "cosine_sim"),
                           k).withColumnRenamed("rn", "rank")
    return (ranked.join(scored, ["qid", "vec_id"])
            .select("qid", F.col("vec_id").alias(id_col),
                    "n_terms_hit", F.col("cosine_sim").alias("bm25"),
                    "rank"))
