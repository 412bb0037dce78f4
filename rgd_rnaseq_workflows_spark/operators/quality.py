"""Repetition- and duplication-based document quality diagnostics.

Two operators a large-scale training-data pipeline runs before model
training (extensions beyond the reference, whose quality gates are
per-sample threshold filters — SURVEY FIL4):

- :func:`repetition_report` — within-document repetition (Gopher-rule
  shape: duplicate-token fraction + most-common-bigram coverage);
  gibberish/boilerplate generators score high and get gated.
- :func:`ngram_coverage_report` — cross-document duplicated n-gram
  coverage per document: the fraction of a doc's n-gram positions whose
  n-gram also occurs in at least one other document. This is the
  linear-scan approximation of suffix-array substring dedup (Lee et al.
  2022): no suffix array is needed to *score* documents, only to split
  them, and the scoring is what drives keep/drop.

Scale notes: both operators shuffle once on (doc, gram) with map-side
partial aggregation (the gram explode streams through codegen — no
materialized blow-up), then once on doc. ``ngram_coverage_report``'s
gram-frequency table shuffles on the gram hash — the same key class the
MinHash band join uses; skewed "stopword-run" grams partial-aggregate
before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql


def repetition_report(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_dup_token_frac: float = 0.7,
                      max_top_bigram_frac: float = 0.18) -> DataFrame:
    """Per-document repetition metrics + a PASS/FAIL-style gate flag
    (the reference's FIL4 idiom applied to text quality).

    - ``dup_token_frac`` = 1 − distinct/total tokens (array ops, no
      explode, no shuffle);
    - ``top_bigram_frac`` = occurrences of the most frequent word bigram
      × 2 / total tokens (explode → two map-side-combined aggs).
    """
    toks = TX.tokens(text_col)
    base = docs.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"))
    bi = (docs.select(id_col, F.explode(TX.shingles_all(text_col, 2))
                      .alias("g"))
          .groupBy(id_col, "g").agg(F.count("*").alias("cnt"))
          .groupBy(id_col).agg(F.max("cnt").alias("top_bigram_n")))
    rep = (base.join(bi, id_col)
           .select(id_col, "n_tokens",
                   F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 4)
                   .alias("dup_token_frac"),
                   F.col("top_bigram_n"),
                   F.round(F.col("top_bigram_n") * 2 / F.col("n_tokens"), 4)
                   .alias("top_bigram_frac")))
    gate = ((F.col("dup_token_frac") <= max_dup_token_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac))
    return rep.withColumn("status", F.when(gate, "PASS").otherwise("FAIL"))


def repetition_report_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text",
                          max_dup_token_frac: float = 0.7,
                          max_top_bigram_frac: float = 0.18) -> str:
    toks = TX.tokens_sql(text_col)
    return f"""
WITH base AS (
  SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct({toks})) AS BIGINT) AS n_distinct
  FROM {table}),
bi AS (
  SELECT {id_col}, CAST(max(cnt) AS BIGINT) AS top_bigram_n FROM (
    SELECT {id_col}, g, count(*) AS cnt FROM (
      SELECT {id_col}, unnest({TX.shingles_all_sql(text_col, 2)}) AS g
      FROM {table})
    GROUP BY {id_col}, g)
  GROUP BY {id_col}),
rep AS (
  SELECT base.{id_col}, n_tokens,
         round(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 4)
           AS dup_token_frac,
         top_bigram_n,
         round(CAST(top_bigram_n * 2 AS DOUBLE) / n_tokens, 4)
           AS top_bigram_frac
  FROM base JOIN bi USING ({id_col}))
SELECT {id_col}, n_tokens, dup_token_frac, top_bigram_n, top_bigram_frac,
       CASE WHEN dup_token_frac <= {max_dup_token_frac}
             AND top_bigram_frac <= {max_top_bigram_frac}
            THEN 'PASS' ELSE 'FAIL' END AS status
FROM rep
"""


def ngram_coverage_report(docs: DataFrame, n: int = 4,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Per-document cross-corpus duplicated n-gram coverage.

    ``dup_frac`` = positions whose n-gram occurs in ≥2 distinct docs /
    total n-gram positions. The gram-frequency side aggregates to
    distinct-doc counts BEFORE the join back (per-gram partial
    aggregation — the joined side carries one row per duplicated gram
    type, not per occurrence).
    """
    grams = docs.select(id_col, F.explode(TX.shingles_all(text_col, n))
                        .alias("g"))
    dup_grams = (grams.groupBy("g")
                 .agg(F.countDistinct(id_col).alias("nd"))
                 .filter(F.col("nd") >= 2)
                 .select("g", F.lit(1).alias("_dup")))
    # ONE join + ONE per-doc aggregation scores total and duplicated
    # positions together (count counts non-null _dup markers) — the
    # previous three-consumer form re-ran the corpus gram explode for
    # the totals and again for the dup positions; two streaming corpus
    # passes (frequency side, scoring side) are the minimum without
    # materializing the string gram table
    return (grams.join(dup_grams, "g", "left")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_positions"),
                 F.count("_dup").cast("long").alias("n_dup_positions"))
            .withColumn("dup_frac",
                        F.round(F.col("n_dup_positions")
                                / F.col("n_positions"), 4)))


def tfidf_top_terms(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    lang_col: str = "lang") -> DataFrame:
    """Top-k terms per language by TF-IDF — the corpus-characterization
    query a data pipeline runs to spot boilerplate and topic drift.

    ``tfidf(lang, term) = tf · ln(N / df)`` with ``tf`` the term's
    occurrence count within the language and ``df`` the number of
    distinct documents (corpus-wide) containing the term. Both inputs
    are exact integers; one ``ln`` + one multiply are single IEEE ops,
    so the score is bit-identical across engines and the (score desc,
    term) ordering is deterministic.

    Scale shape: the tf side shuffles on (lang, term) with map-side
    combine; the df side on term over ``array_distinct`` (per-doc dedup
    BEFORE the explode — the shuffle carries term *types*, not
    occurrences); the tf⋈df join shuffles the vocabulary, not the
    corpus. The final top-k is a per-lang window — vocabulary-scale
    partitions (the doc corpus is already reduced away), with languages
    as the partition key.
    """
    toks = TX.tokens(text_col)
    n_docs = docs.select(F.countDistinct(id_col).alias("nn"))
    tf = (docs.select(F.col(lang_col).alias("lang"),
                      F.explode(toks).alias("term"))
          .groupBy("lang", "term").agg(F.count("*").alias("tf")))
    df_ = (docs.select(id_col, F.explode(F.array_distinct(toks))
                       .alias("term"))
           .groupBy("term").agg(F.count("*").alias("df")))
    scored = (tf.join(df_, "term").crossJoin(F.broadcast(n_docs))
              .select("lang", "term", "tf", "df",
                      F.round(F.col("tf")
                              * F.log(F.col("nn") / F.col("df")), 6)
                      .alias("tfidf")))
    from pyspark.sql import Window
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "term")
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("lang", F.col("rk").cast("long").alias("rk"),
                    "term", "tf", "df", "tfidf"))


def tfidf_top_terms_sql(table: str = "documents", k: int = 5,
                        id_col: str = "doc_id", text_col: str = "text",
                        lang_col: str = "lang") -> str:
    toks = TX.tokens_sql(text_col)
    return f"""
WITH nd AS (SELECT count(DISTINCT {id_col}) AS nn FROM {table}),
tf AS (
  SELECT {lang_col} AS lang, term, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT {lang_col}, unnest({toks}) AS term FROM {table})
  GROUP BY {lang_col}, term),
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
    SELECT {id_col}, unnest(list_distinct({toks})) AS term FROM {table})
  GROUP BY term),
scored AS (
  SELECT lang, term, tf, df,
         round(tf * ln(CAST(nn AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN df USING (term), nd)
SELECT lang, CAST(rk AS BIGINT) AS rk, term, tf, df, tfidf FROM (
  SELECT lang, term, tf, df, tfidf,
         row_number() OVER (PARTITION BY lang
                            ORDER BY tfidf DESC, term) AS rk
  FROM scored)
WHERE rk <= {k}
"""


def ngram_coverage_report_sql(table: str = "documents", n: int = 4,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    return f"""
WITH grams AS (
  SELECT {id_col}, unnest({TX.shingles_all_sql(text_col, n)}) AS g
  FROM {table}),
dup_grams AS (
  SELECT g FROM (SELECT g, count(DISTINCT {id_col}) AS nd
                 FROM grams GROUP BY g)
  WHERE nd >= 2),
tot AS (SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_positions
        FROM grams GROUP BY {id_col}),
dup AS (SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_dup_positions
        FROM grams JOIN dup_grams USING (g) GROUP BY {id_col})
SELECT tot.{id_col}, n_positions,
       CAST(coalesce(n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
       round(CAST(coalesce(n_dup_positions, 0) AS DOUBLE) / n_positions, 4)
         AS dup_frac
FROM tot LEFT JOIN dup USING ({id_col})
"""


# --- corpus bigram-LM familiarity ---------------------------------------------

def bigram_lm_report(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Self-trained bigram language-model familiarity per document — the
    CCNet idea (score documents under an LM trained on the corpus
    itself) restricted to integer-exact statistics so every engine
    agrees bit-for-bit:

    - train: corpus bigram table ``c(w1 w2)`` = count of each word
      bigram across all documents (one map-side-combined groupBy);
    - score: per document, ``n_bigrams``, ``familiarity_sum`` = Σ c(bg)
      over the document's bigram positions (how much corpus mass backs
      each transition), and ``n_hapax`` = positions whose bigram occurs
      exactly once in the corpus (novel/noise transitions — high hapax
      ratio flags gibberish, near-zero flags boilerplate/duplication).

    All three are exact BIGINT sums; the two derived ratios are single
    divisions of exact integers (correctly rounded on every engine) then
    ``round(·, 6)``. No log/pow — a true log-prob LM score is a sum of
    per-position doubles whose accumulation order no distributed engine
    pins down, so it cannot be value-oracled; the integer form keeps the
    same signal (monotone in the per-position evidence) and stays exact.

    Scale shape: explode bigrams (codegen regex scan, no materialized
    blow-up) → shuffle 1: groupBy bigram with map-side combine (the LM);
    shuffle 2: join doc-bigrams to the LM on the bigram key (both sides
    large → shuffle hash join, the standard train/score co-location);
    shuffle 3: per-doc agg. Heavy-hitter bigrams (stopword pairs) are
    combined map-side before ever shuffling.
    """
    b = docs.select(F.col(id_col).alias("id"),
                    F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
    lm = b.groupBy("bg").agg(F.count("*").alias("c_bg"))
    return (b.join(lm, "bg")
            .groupBy("id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum("c_bg").alias("familiarity_sum"),
                 F.sum(F.when(F.col("c_bg") == 1, 1).otherwise(0))
                 .cast("long").alias("n_hapax"))
            .select(F.col("id").alias(id_col), "n_bigrams",
                    "familiarity_sum", "n_hapax",
                    F.round(F.col("familiarity_sum").cast("double")
                            / F.col("n_bigrams").cast("double"), 6)
                    .alias("mean_bigram_count"),
                    F.round(F.col("n_hapax").cast("double")
                            / F.col("n_bigrams").cast("double"), 6)
                    .alias("hapax_ratio")))


def bigram_lm_report_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin of :func:`bigram_lm_report` (exact integer sums, so
    the unordered aggregation is engine-independent)."""
    sh = TX.shingles_all_sql(text_col, 2)
    return f"""
WITH b AS (
  SELECT {id_col} AS id, unnest({sh}) AS bg FROM {table}),
lm AS (SELECT bg, count(*) AS c_bg FROM b GROUP BY bg),
per AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(c_bg) AS BIGINT) AS familiarity_sum,
         CAST(sum(CASE WHEN c_bg = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM b JOIN lm USING (bg) GROUP BY id)
SELECT id AS {id_col}, n_bigrams, familiarity_sum, n_hapax,
       round(CAST(familiarity_sum AS DOUBLE)
             / CAST(n_bigrams AS DOUBLE), 6) AS mean_bigram_count,
       round(CAST(n_hapax AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
         AS hapax_ratio
FROM per
"""


def lm_bucket_report(docs: DataFrame, n_buckets: int = 3,
                     id_col: str = "doc_id", text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """CCNet-style familiarity bucketing (Wenzek et al. 2020: score every
    document under a corpus LM, split per language into head/middle/tail,
    train on the head): rank documents per language by the bigram-LM
    familiarity of :func:`bigram_lm_report` and ``ntile`` them into
    ``n_buckets``. Returns per (lang, bucket): doc count, exact
    familiarity-mass totals, and the mean-familiarity range — the table
    a pipeline uses to pick its per-language sampling weights.

    Determinism: the ntile ordering key is (mean_bigram_count DESC, id)
    where the mean is ONE division of two exact BIGINTs — the same
    double on every engine — so bucket boundaries are engine-stable.

    Scale shape: the LM train/score plan is :func:`bigram_lm_report`
    (three shuffles, map-side combined); the ntile window partitions by
    LANGUAGE over the already-reduced per-doc table — rows = corpus doc
    count, but each row is ~4 numbers, and the partition key is the
    language (bounded fan-out). The final agg collapses to
    langs × buckets rows.
    """
    from pyspark.sql import Window
    per_doc = bigram_lm_report(docs, id_col, text_col).join(
        docs.select(id_col, F.col(lang_col).alias("lang")), id_col)
    w = (Window.partitionBy("lang")
         .orderBy(F.desc("mean_bigram_count"), id_col))
    bucketed = per_doc.withColumn(
        "bucket", F.ntile(n_buckets).over(w).cast("long"))
    return (bucketed.groupBy("lang", "bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("familiarity_sum").alias("familiarity_mass"),
                 F.sum("n_bigrams").alias("bigram_positions"),
                 F.max("mean_bigram_count").alias("best_mean"),
                 F.min("mean_bigram_count").alias("worst_mean"))
            .orderBy("lang", "bucket"))


def lm_bucket_report_sql(table: str = "documents", n_buckets: int = 3,
                         id_col: str = "doc_id", text_col: str = "text",
                         lang_col: str = "lang") -> str:
    lm = bigram_lm_report_sql(table, id_col, text_col).strip()
    return f"""
WITH lmrep AS ({lm}),
bucketed AS (
  SELECT d.{lang_col} AS lang, r.*,
         CAST(ntile({n_buckets}) OVER (
           PARTITION BY d.{lang_col}
           ORDER BY r.mean_bigram_count DESC, r.{id_col}) AS BIGINT)
           AS bucket
  FROM lmrep r JOIN {table} d USING ({id_col}))
SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(familiarity_sum) AS BIGINT) AS familiarity_mass,
       CAST(sum(n_bigrams) AS BIGINT) AS bigram_positions,
       max(mean_bigram_count) AS best_mean,
       min(mean_bigram_count) AS worst_mean
FROM bucketed GROUP BY lang, bucket
ORDER BY lang, bucket
"""


# --- Kneser-Ney smoothed bigram perplexity ------------------------------------

KN_DISCOUNT = 0.75  # the standard absolute-discount constant


def kn_lm_report(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document perplexity under a corpus-trained Kneser-Ney
    smoothed bigram LM — the KenLM/CCNet quality scorer (Wenzek et al.
    2020 filter documents by perplexity under exactly this model
    family; Kneser & Ney 1995, Chen & Goodman 1998 for the smoothing):

        P_KN(w2|w1) = max(c(w1 w2) - d, 0)/c(w1·)
                      + d · N1+(w1 ·)/c(w1·) · N1+(· w2)/N1+(· ·)

    with d = 0.75. The continuation probability N1+(· w2)/N1+(· ·)
    (how many distinct contexts precede w2, not how often w2 occurs)
    is what distinguishes KN from the raw-count familiarity of
    :func:`bigram_lm_report` — "San Francisco" makes "Francisco"
    frequent but nearly context-bound, and KN scores it accordingly.

    Cross-engine exactness (the ``bm25_topk`` discipline): every LM
    statistic (c12, c1, N1+ counts, bigram-type total) is an exact
    BIGINT; each DISTINCT bigram's negative log-prob is ONE fixed
    scalar expression tree rounded to an exact micro-nat BIGINT
    (``nll6``); the per-doc total is the INTEGER sum ``Σ cnt·nll6`` —
    order-independent, unlike a float log-prob accumulation, which no
    distributed engine pins down. ``ppl`` is one exp of a
    deterministic double, rounded.

    The LM here is trained on the scored corpus itself, so every
    document bigram has c12 ≥ 1 and P_KN > 0 (``n_oov`` is pinned 0 by
    the oracle). Scoring a FOREIGN corpus against a frozen or
    stream-maintained LM goes through the same factored pieces
    (:func:`bigram_counts` → :func:`kn_nll_table` → :func:`kn_score`),
    where unseen bigrams are excluded and counted in ``n_oov`` rather
    than given a backoff mass — the filter-pipeline reading (an OOV
    transition is its own quality signal, reported separately).

    Scale shape: explode bigrams → groupBy bigram (map-side combined —
    the LM, bigram-type-scale); the three stat tables (per-context,
    per-continuation, total) are vocabulary-scale GROUPs OF THE LM
    TABLE, never of the corpus; scoring joins doc-distinct bigrams to
    the scored LM on the bigram key (the train/score co-location
    shuffle) and reduces per doc. One corpus-scale explode, one
    corpus-scale join — same envelope as ``bigram_lm_report``.
    """
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    # the LM table feeds four consumers (context stats, continuation
    # stats, type total, score join) — checkpoint it once so the
    # corpus explode + LM shuffle run ONCE, not per branch
    lm = checkpoint_df(bigram_counts(docs, text_col), eager=False)
    return kn_score(docs, kn_nll_table(lm), id_col, text_col)


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The KN LM's sufficient statistic: (bg, c12) — corpus bigram
    counts via one map-side-combined groupBy. Mergeable, so the SAME
    expression tree maintains the LM under Structured Streaming
    (``corpus_stream.stream_bigram_counts``)."""
    return (docs.select(F.explode(TX.shingles_all(text_col, 2))
                        .alias("bg"))
            .groupBy("bg").agg(F.count("*").alias("c12")))


def kn_nll_table(lm: DataFrame) -> DataFrame:
    """Fold the (bg, c12) count table into the per-bigram micro-nat
    table (bg, nll6). Bigram-type-scale only — the corpus is never
    touched: context/continuation statistics are GROUPs OF THE LM
    TABLE, the type total is a 1-row broadcast."""
    lm = (lm.withColumn("w1", F.element_at(F.split("bg", " "), 1))
          .withColumn("w2", F.element_at(F.split("bg", " "), -1)))
    ctx = lm.groupBy("w1").agg(F.sum("c12").alias("c1"),
                               F.count("*").alias("n1p_fwd"))
    cont = lm.groupBy("w2").agg(F.count("*").alias("n1p_rev"))
    tot = lm.agg(F.count("*").alias("n_types"))
    d = F.lit(KN_DISCOUNT)
    p = ((F.col("c12") - d) / F.col("c1")
         + d * F.col("n1p_fwd") / F.col("c1")
         * F.col("n1p_rev") / F.col("n_types"))
    return (lm.join(ctx, "w1").join(cont, "w2")
            .crossJoin(F.broadcast(tot))
            .select("bg", F.round(-F.log(p) * 1e6).cast("long")
                    .alias("nll6")))


def _kn_fold(joined: DataFrame, id_col: str,
             weight) -> DataFrame:
    """The ONE definition of the per-document KN fold: aggregate
    (id, nll6)-joined rows — weighted per distinct bigram (batch) or
    per occurrence (streaming, weight 1) — into the
    (n_bigrams, n_oov, nll_micro, ppl) report."""
    return (joined.groupBy("id")
            .agg(F.sum(F.when(F.col("nll6").isNotNull(), weight)
                       .otherwise(0)).alias("n_bigrams"),
                 F.sum(F.when(F.col("nll6").isNull(), weight)
                       .otherwise(0)).alias("n_oov"),
                 F.sum(weight * F.coalesce(F.col("nll6"), F.lit(0)))
                 .alias("nll_micro"))
            .select(F.col("id").alias(id_col), "n_bigrams", "n_oov",
                    "nll_micro",
                    F.when(F.col("n_bigrams") == 0, F.lit(None))
                    .otherwise(
                        F.round(F.exp(F.col("nll_micro").cast("double")
                                      / 1e6 / F.col("n_bigrams")), 4))
                    .alias("ppl")))


def kn_score(docs: DataFrame, nll_table: DataFrame,
             id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Score documents against a (bg, nll6) table — the LM may be
    frozen/stream-maintained and need not come from ``docs`` itself.
    Bigrams absent from the LM are EXCLUDED from the perplexity and
    counted in ``n_oov`` (zero for the self-trained registry query,
    which pins the join semantics; nonzero when scoring a foreign
    corpus against a frozen LM — the CCNet deployment shape)."""
    b = docs.select(F.col(id_col).alias("id"),
                    F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
    tf = b.groupBy("id", "bg").agg(F.count("*").alias("cnt"))
    return _kn_fold(tf.join(nll_table, "bg", "left"), id_col,
                    F.col("cnt"))


def kn_score_occurrences(docs: DataFrame, nll_table: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """:func:`kn_score` as a SINGLE aggregation: each bigram
    OCCURRENCE joins the LM directly (no per-(doc, bigram) pre-count),
    weight 1 in the shared fold — exactly the batch scores
    (test-pinned), in the one-stateful-operator shape Structured
    Streaming requires (a stateless stream-static join followed by one
    streaming aggregation; the batch form's tf pre-count would be a
    second chained aggregation, which streaming forbids)."""
    b = docs.select(F.col(id_col).alias("id"),
                    F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
    return _kn_fold(b.join(nll_table, "bg", "left"), id_col, F.lit(1))


def kn_lm_report_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text") -> str:
    """DuckDB twin of :func:`kn_lm_report` (exact integer LM stats, one
    rounded micro-nat per distinct bigram, integer per-doc sum)."""
    sh = TX.shingles_all_sql(text_col, 2)
    d = KN_DISCOUNT
    return f"""
WITH b AS (
  -- coalesce: DuckDB's array_to_string over the empty-doc slice yields
  -- NULL where Spark's shingles_all yields '' — align on '' so the
  -- empty-document row survives the NULL-rejecting score join
  SELECT id, coalesce(bg, '') AS bg FROM (
    SELECT {id_col} AS id, unnest({sh}) AS bg FROM {table})),
tf AS (SELECT id, bg, CAST(count(*) AS BIGINT) AS cnt
       FROM b GROUP BY id, bg),
lm AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c12,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[-1] AS w2
  FROM b GROUP BY bg),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_fwd
        FROM lm GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_rev
         FROM lm GROUP BY w2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM lm),
scored AS (
  SELECT bg, CAST(round(-ln(
           (c12 - {d}) / c1
           + {d} * n1p_fwd / c1 * n1p_rev / n_types) * 1e6) AS BIGINT)
           AS nll6
  FROM lm JOIN ctx USING (w1) JOIN cont USING (w2), tot),
per AS (
  SELECT id,
         CAST(sum(CASE WHEN nll6 IS NOT NULL THEN cnt ELSE 0 END)
           AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN nll6 IS NULL THEN cnt ELSE 0 END)
           AS BIGINT) AS n_oov,
         CAST(sum(cnt * coalesce(nll6, 0)) AS BIGINT) AS nll_micro
  FROM tf LEFT JOIN scored USING (bg) GROUP BY id)
SELECT id AS {id_col}, n_bigrams, n_oov, nll_micro,
       CASE WHEN n_bigrams = 0 THEN NULL
            ELSE round(exp(CAST(nll_micro AS DOUBLE) / 1e6
                           / n_bigrams), 4) END AS ppl
FROM per
"""


# --- hashed linear classifier scoring ----------------------------------------

W_SCALE = 1_000_000  # fixed-point classifier weights (exact bigints)


def hashed_linear_score(docs: DataFrame, weights: DataFrame,
                        n_buckets: int, id_col: str = "doc_id",
                        text_col: str = "text",
                        seed: int = 5) -> DataFrame:
    """fastText-style linear quality-classifier INFERENCE at corpus
    scale (the CCNet / LLaMA corpus-filter shape): hash each token into
    one of ``n_buckets`` feature buckets, average the bucket weights,
    classify on the sign.

    ``weights`` is (bucket int, w long) with ``w`` fixed-point at
    ``W_SCALE`` — the model is driver/broadcast-scale metadata (2^18
    buckets ≈ 2 MB), the corpus is never reshuffled: token explode →
    md5 bucket → broadcast weight join → per-doc exact integer sum.
    ``logit = Σw / (n_tokens·W_SCALE)`` is one double division rounded
    to 6 (cross-engine safe — the agg8 ratio pattern); ``label`` is
    decided on the EXACT integer sum sign, never the rounded double.
    Out-of-vocabulary buckets (no weight row) contribute 0, like a
    sparse linear model.

    Measured alternative, rejected: pre-aggregating (doc, bucket, n)
    before the weight join "to shrink the join input" ADDS a shuffle
    while the broadcast probe it saves is already a map-side hash
    lookup — 11.0 s → 14.7 s at the 100× replica. The single-shuffle
    shape below (probe map-side, ONE groupBy(doc) with partial agg) is
    the right plan.

    Training: a hand-labeled set fits the driver (scikit-style), but
    CCNet-style weak supervision at corpus scale does not —
    :func:`hashed_logreg_train` trains these weights distributed with
    an exact integer trajectory.
    """
    toks = (docs.select(F.col(id_col), F.explode(TX.tokens(text_col))
                        .alias("_tok"))
            .select(id_col,
                    F.pmod(md5_long(F.col("_tok"), seed=seed),
                           F.lit(n_buckets)).alias("bucket")))
    w = weights.select(F.col("bucket"), F.col("w").cast("long"))
    scored = (toks.join(F.broadcast(w), "bucket", "left")
              .groupBy(id_col)
              .agg(F.sum(F.coalesce("w", F.lit(0))).alias("_sw"),
                   F.count("*").alias("n_tokens")))
    return scored.select(
        id_col, "n_tokens",
        F.round(F.col("_sw") / (F.col("n_tokens") * W_SCALE), 6)
        .alias("logit"),
        F.when(F.col("_sw") >= 0, F.lit("keep")).otherwise(F.lit("drop"))
        .alias("label"))


def pseudo_weights(spark, n_buckets: int, seed: int = 23) -> DataFrame:
    """Deterministic stand-in weight table (md5-derived, centered on 0,
    range ±W_SCALE) — exercises the full inference plumbing where no
    trained model is at hand; both engines generate the identical
    table."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (F.pmod(md5_long(F.col("id").cast("string"), seed=seed),
                F.lit(2 * W_SCALE + 1)) - W_SCALE).cast("long").alias("w"))


def hashed_linear_score_sql(table: str = "documents",
                            n_buckets: int = 1 << 12,
                            id_col: str = "doc_id",
                            text_col: str = "text", seed: int = 5,
                            weight_seed: int = 23) -> str:
    """DuckDB twin of :func:`hashed_linear_score` over
    :func:`pseudo_weights` — identical hashing, integer sums, one
    rounded division, sign-decided label."""
    toks = TX.tokens_sql(text_col)
    h = md5_long_sql("_tok", seed=seed)
    hw = md5_long_sql("CAST(i AS VARCHAR)", seed=weight_seed)
    return f"""
WITH _w AS MATERIALIZED (
  SELECT CAST(i AS INTEGER) AS bucket,
         CAST({hw} % {2 * W_SCALE + 1} - {W_SCALE} AS BIGINT) AS w
  FROM range({n_buckets}) r(i)),
_tk AS MATERIALIZED (
  SELECT {id_col}, CAST({h} % {n_buckets} AS INTEGER) AS bucket
  FROM (SELECT {id_col}, unnest({toks}) AS _tok FROM {table})),
_sc AS (
  SELECT t.{id_col}, CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS _sw,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM _tk t LEFT JOIN _w w USING (bucket)
  GROUP BY t.{id_col})
SELECT {id_col}, n_tokens,
       round(CAST(_sw AS DOUBLE) / (n_tokens * {W_SCALE}), 6) AS logit,
       CASE WHEN _sw >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM _sc
"""


def classifier_calibration(docs: DataFrame, weights: DataFrame,
                           n_buckets: int, truth, n_bins: int = 10,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           seed: int = 5) -> DataFrame:
    """Reliability diagram for the hashed linear quality classifier —
    the eval a corpus-filter deployment runs BEFORE trusting a score
    threshold at 100 TB: bin documents by their exact integer
    per-token logit and report each bin's observed positive rate
    against a caller-supplied boolean ``truth`` column expression
    (e.g. lang-ID agreement, a held-out label column). A calibrated
    classifier shows the positive rate rising monotonically with the
    bin; a flat diagram means the threshold is cutting noise.

    Exactness: the bin key is ``(logit_micro + 10⁶)·n_bins div
    (2·10⁶ + 1)`` of the exact integer micro-logit
    ``Σw·10⁶ div (n_tokens·W_SCALE)`` (|logit_micro| ≤ 10⁶ by the
    weight range, so the bin index is total and engine-identical);
    rates and means are exact integer divisions.

    Scale shape: same single-shuffle inference as
    :func:`hashed_linear_score` (token explode → broadcast weight
    probe → ONE groupBy(doc) carrying the row-local truth flag in the
    key), then a |bins|-row fold — the corpus is never reshuffled."""
    if n_bins < 1:
        raise ValueError(f"n_bins {n_bins} must be >= 1")
    t = truth if not isinstance(truth, str) else F.expr(truth)
    # the truth expression MUST be projected BEFORE the explode: a
    # select that carries a computed sibling next to a generator
    # re-evaluates the sibling once per exploded OUTPUT row (measured
    # 20 s vs 0.6 s at sf0.1 for a lang-ID truth — ~50 tokens/doc ×
    # 8 regex scans), while a child projection runs it once per doc
    base = docs.select(F.col(id_col), t.alias("_truth"),
                       F.col(text_col))
    toks = (base.select(id_col, "_truth",
                        F.explode(TX.tokens(text_col)).alias("_tok"))
            .select(id_col, "_truth",
                    F.pmod(md5_long(F.col("_tok"), seed=seed),
                           F.lit(n_buckets)).alias("bucket")))
    w = weights.select(F.col("bucket"), F.col("w").cast("long"))
    scored = (toks.join(F.broadcast(w), "bucket", "left")
              .groupBy(id_col, "_truth")
              .agg(F.sum(F.coalesce("w", F.lit(0))).alias("_sw"),
                   F.count("*").alias("_nt"))
              .withColumn("_lm", F.expr(
                  f"_sw * 1000000 div (_nt * {W_SCALE})"))
              .withColumn("bin", F.least(
                  F.lit(n_bins - 1),
                  F.expr(f"CAST((_lm + 1000000) * {n_bins} "
                         f"div 2000001 AS INT)")).cast("int")))
    return (scored.groupBy("bin")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 # coalesce: a bin whose truths are ALL NULL (missing
                 # labels) must report 0 positives like the SQL twin,
                 # not a NULL that hash-mismatches the oracle
                 F.coalesce(F.sum(F.col("_truth").cast("long")),
                            F.lit(0)).cast("long").alias("n_pos"),
                 F.expr("sum(_lm) div count(*)").cast("long")
                 .alias("mean_logit_micro"))
            .withColumn("pos_rate_ppm",
                        F.expr("n_pos * 1000000 div n_docs")
                        .cast("long"))
            .select("bin", "n_docs", "n_pos", "pos_rate_ppm",
                    "mean_logit_micro")
            .orderBy("bin"))


def classifier_calibration_sql(truth_expr: str,
                               table: str = "documents",
                               n_buckets: int = 1 << 12,
                               n_bins: int = 10,
                               id_col: str = "doc_id",
                               text_col: str = "text", seed: int = 5,
                               weight_seed: int = 23) -> str:
    """DuckDB twin of :func:`classifier_calibration` over
    :func:`pseudo_weights`."""
    toks = TX.tokens_sql(text_col)
    h = md5_long_sql("_tok", seed=seed)
    hw = md5_long_sql("CAST(i AS VARCHAR)", seed=weight_seed)
    return f"""
WITH _w AS MATERIALIZED (
  SELECT CAST(i AS INTEGER) AS bucket,
         CAST({hw} % {2 * W_SCALE + 1} - {W_SCALE} AS BIGINT) AS w
  FROM range({n_buckets}) r(i)),
_tk AS MATERIALIZED (
  SELECT {id_col}, _truth, CAST({h} % {n_buckets} AS INTEGER) AS bucket
  FROM (SELECT {id_col}, ({truth_expr}) AS _truth,
               unnest({toks}) AS _tok FROM {table})),
_sc AS (
  SELECT t.{id_col}, _truth,
         CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS _sw,
         CAST(count(*) AS BIGINT) AS _nt
  FROM _tk t LEFT JOIN _w w USING (bucket)
  GROUP BY t.{id_col}, _truth),
_b AS (
  SELECT _truth, _sw * 1000000 // (_nt * {W_SCALE}) AS _lm,
         least({n_bins - 1},
               CAST(((_sw * 1000000 // (_nt * {W_SCALE})) + 1000000)
                    * {n_bins} // 2000001 AS INTEGER)) AS bin
  FROM _sc)
SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CAST(_truth AS BIGINT)), 0) AS BIGINT)
         AS n_pos,
       CAST(coalesce(sum(CAST(_truth AS BIGINT)), 0) * 1000000
            // count(*) AS BIGINT) AS pos_rate_ppm,
       CAST(sum(_lm) // count(*) AS BIGINT) AS mean_logit_micro
FROM _b GROUP BY bin
ORDER BY bin
"""


def hashed_logreg_train(docs: DataFrame, truth, n_buckets: int,
                        epochs: int = 3, lr_num: int = 1,
                        lr_den: int = 2, id_col: str = "doc_id",
                        text_col: str = "text",
                        seed: int = 5) -> DataFrame:
    """Distributed TRAINING for the hashed linear quality classifier —
    full-batch logistic regression by gradient descent, every fold an
    exact integer so both engines walk the identical weight
    trajectory. This is the half :func:`hashed_linear_score` declares
    out of scope when labels fit the driver; CCNet-style weak
    supervision (wiki-vs-crawl targets over millions of documents)
    does NOT fit a driver, and the trainer is the same two-shuffle
    corpus shape as inference.

    Exact-integer trajectory (the KN micro-nat discipline):
    weights live in micro units (BIGINT). Per doc the margin
    ``z = Σ w_j·c_j`` is an exact integer sum; ``p = 1/(1+exp(−z/10⁶))``
    is one fixed scalar tree whose per-(doc,bucket) gradient term
    ``round(10⁶·(round(p,9)−y)·c)`` rounds to an exact integer; the
    per-bucket gradient is the INTEGER sum of those terms
    (order-independent), and the update
    ``w_j ← w_j − (lr_num·G_j) div (lr_den·n_docs)`` is a signed
    integer division — Spark's ``div`` and DuckDB's ``//`` BOTH
    truncate toward zero (verified), so the engines keep identical
    weights after every epoch. The logistic loss uses the
    overflow-safe softplus form ``ln(1+e^(−|z|)) + max(z,0) − y·z``,
    per-doc rounded to micro-nats and integer-summed.

    Per epoch ``e`` one report row scored with the PRE-update weights
    ``w_{e−1}`` (so row 1 is the w=0 baseline: p=½ exactly,
    loss = n·round(10⁶·ln 2)): (epoch, n_docs, n_pos, n_correct,
    accuracy_bp, loss_micro); prediction is the exact integer sign
    test ``z > 0``. Loss must fall monotonically for a sane lr — the
    trainer's own convergence gate.

    Scale shape: the (doc, y, bucket, c) feature table is built ONCE
    (one explode + one map-side-combined groupBy) and checkpointed;
    each epoch is one broadcast weight join + per-doc aggregation,
    CHECKPOINTED so the scoring subplan runs once per epoch (the
    metrics action materializes it; the gradient pass — one doc-keyed
    join back + per-bucket aggregation — re-reads the materialized
    doc-scale (id, y, z) rows instead of re-scoring the corpus).
    Two shuffles per epoch, corpus passes ``O(epochs)``. Weights and
    gradients are bucket-scale metadata (≤ n_buckets rows): the ONLY
    driver collects, exactly the k-means-centroid pattern.

    ``truth`` is a Column expression evaluated per document (0/1)."""
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    spark = docs.sparkSession
    # project the truth sibling BEFORE the explode (the r11
    # generator-sibling lesson: a computed sibling next to a generator
    # re-evaluates once per exploded OUTPUT row)
    tk = (docs.select(F.col(id_col).alias("id"),
                      truth.cast("int").alias("y"),
                      F.col(text_col).alias("_txt"))
          .select("id", "y", F.explode(TX.tokens("_txt")).alias("_tok"))
          .select("id", "y",
                  F.pmod(md5_long(F.col("_tok"), seed=seed),
                         F.lit(n_buckets)).cast("int").alias("bucket"))
          .groupBy("id", "y", "bucket")
          .agg(F.count("*").cast("long").alias("c")))
    tk = checkpoint_df(tk, eager=False)
    w = {}          # bucket -> w_micro (sparse; absent = 0)
    out = []
    for epoch in range(1, epochs + 1):
        if w:
            wdf = spark.createDataFrame(
                [(int(b), int(v)) for b, v in sorted(w.items())],
                "bucket int, w long")
            scored = tk.join(F.broadcast(wdf), "bucket", "left")
        else:
            scored = tk.withColumn("w", F.lit(None).cast("long"))
        per_doc = (scored.groupBy("id", "y")
                   .agg(F.sum(F.coalesce(F.col("w"), F.lit(0))
                              * F.col("c")).cast("long").alias("z")))
        if epoch < epochs:
            # the gradient pass below re-reads per_doc: checkpoint the
            # doc-scale (id, y, z) rows so the corpus-scale scoring
            # subplan (broadcast weight join + per-doc agg over tk)
            # runs ONCE per epoch — the metrics action materializes it
            per_doc = checkpoint_df(per_doc, eager=False)
        zd = F.col("z").cast("double") / 1e6
        loss_term = F.round(F.lit(1e6) * (
            F.log(F.lit(1.0) + F.exp(-F.abs(zd)))
            + F.greatest(zd, F.lit(0.0))
            - F.col("y") * zd)).cast("long")
        m = per_doc.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum(((F.col("z") > 0).cast("int") == F.col("y"))
                  .cast("long")).cast("long").alias("n_correct"),
            F.sum(loss_term).cast("long").alias("loss_micro")
        ).collect()[0]
        out.append((epoch, m["n_docs"], m["n_pos"], m["n_correct"],
                    10000 * m["n_correct"] // m["n_docs"]
                    if m["n_docs"] else 0, m["loss_micro"]))
        if epoch == epochs:
            break
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zd)), 9)
        grads = (tk.join(per_doc.select("id", p.alias("p")), "id")
                 .withColumn("_g", F.round(
                     F.lit(1e6) * (F.col("p") - F.col("y"))
                     * F.col("c")).cast("long"))
                 .groupBy("bucket")
                 .agg(F.sum("_g").cast("long").alias("g"))
                 .collect())
        n = int(m["n_docs"])
        for r in grads:
            b, g = int(r["bucket"]), int(r["g"])
            step = (lr_num * g) // (lr_den * n)
            if (lr_num * g) % (lr_den * n) != 0 and (lr_num * g) < 0:
                step += 1          # mirror trunc-toward-zero division
            w[b] = w.get(b, 0) - step
            if w[b] == 0:
                del w[b]
    return spark.createDataFrame(
        out, "epoch int, n_docs long, n_pos long, n_correct long, "
             "accuracy_bp long, loss_micro long").orderBy("epoch")


def hashed_logreg_train_sql(truth_expr: str, table: str = "documents",
                            n_buckets: int = 1 << 9, epochs: int = 3,
                            lr_num: int = 1, lr_den: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            seed: int = 5) -> str:
    """DuckDB twin of :func:`hashed_logreg_train` — the epoch loop
    unrolled into CTE stages with the identical integer trajectory
    (DuckDB ``//`` truncates toward zero exactly like Spark ``div``)."""
    toks = TX.tokens_sql(text_col)
    h = md5_long_sql("_tok", seed=seed)
    parts = [f"""
WITH _tk AS MATERIALIZED (
  SELECT id, y, bucket, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT {id_col} AS id, CAST(_t AS INTEGER) AS y,
           CAST({h} % {n_buckets} AS INTEGER) AS bucket
    FROM (SELECT {id_col}, ({truth_expr}) AS _t, unnest({toks}) AS _tok
          FROM {table}))
  GROUP BY id, y, bucket),
_n AS (SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM _tk)"""]
    prev_w = None
    metric_arms = []
    for e in range(1, epochs + 1):
        if prev_w is None:
            parts.append(f""",
_d{e} AS (SELECT id, y, CAST(0 AS BIGINT) AS z
          FROM _tk GROUP BY id, y)""")
        else:
            parts.append(f""",
_d{e} AS (
  SELECT t.id, t.y,
         CAST(sum(coalesce(w.w, 0) * t.c) AS BIGINT) AS z
  FROM _tk t LEFT JOIN {prev_w} w USING (bucket)
  GROUP BY t.id, t.y)""")
        parts.append(f""",
_m{e} AS (
  SELECT {e} AS epoch, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN (CASE WHEN z > 0 THEN 1 ELSE 0 END) = y
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         CAST(sum(CAST(round(1e6 * (
             ln(1 + exp(-abs(CAST(z AS DOUBLE) / 1e6)))
             + greatest(CAST(z AS DOUBLE) / 1e6, 0)
             - y * (CAST(z AS DOUBLE) / 1e6))) AS BIGINT))
           AS BIGINT) AS loss_micro
  FROM _d{e})""")
        metric_arms.append(
            f"SELECT epoch, n_docs, n_pos, n_correct, "
            f"CAST(10000 * n_correct // n_docs AS BIGINT) "
            f"AS accuracy_bp, loss_micro FROM _m{e}")
        if e == epochs:
            break
        parts.append(f""",
_g{e} AS (
  SELECT t.bucket,
         CAST(sum(CAST(round(1e6 * (
             round(1 / (1 + exp(-CAST(d.z AS DOUBLE) / 1e6)), 9)
             - t.y) * t.c) AS BIGINT)) AS BIGINT) AS g
  FROM _tk t JOIN _d{e} d USING (id)
  GROUP BY t.bucket),
_w{e} AS (
  SELECT g.bucket,
         CAST({'coalesce(w.w, 0)' if prev_w else '0'}
              - ({lr_num} * g.g) // ({lr_den} * n.n) AS BIGINT) AS w
  FROM _g{e} g{f' LEFT JOIN {prev_w} w USING (bucket)' if prev_w
               else ''}, _n n)""")
        prev_w = f"_w{e}"
    parts.append("\n" + "\nUNION ALL\n".join(metric_arms)
                 + "\nORDER BY epoch")
    return "".join(parts)


# --- corpus-shape diagnostics (Zipf head mass / Heaps type counts) -----------

def term_head_report(docs: DataFrame, by: str = "source", top_k: int = 10,
                     text_col: str = "text",
                     n_buckets: int = 256) -> DataFrame:
    """Per-group term-distribution shape — the Zipf/Heaps drift
    diagnostics a corpus dashboard tracks per source/snapshot without
    ever floating a regression:

    - ``n_tokens`` / ``n_types`` / ``n_hapax`` — token count, distinct
      terms, terms occurring once (all exact BIGINT);
    - ``top1_n`` / ``topk_sum`` — the most frequent term's count and the
      exact sum of the ``top_k`` highest term counts (ties broken by
      term text, so the set is deterministic);
    - ratios, each a single division of exact integers rounded once:
      ``ttr`` (type/token), ``hapax_frac`` (hapax/types) and
      ``head_mass`` (topk_sum/tokens — a healthy natural-language
      source holds a stable head mass; a template/boilerplate source
      spikes it, a gibberish source collapses it).

    Scale shape: the (group, term) frequency table is built with ONE
    map-side-combined shuffle; scalars are a groupBy(group) over
    vocab-scale rows. The top-k is TWO-PHASE so no single reducer sorts
    a whole source's vocabulary: phase 1 takes the per-(group,
    md5-bucket) top-k (bounded window partitions), phase 2 ranks the
    surviving ``n_buckets × top_k`` rows per group — correct because
    every global top-k row is top-k within its own bucket. The oracle
    twin ranks in one window (same result, different plan).
    """
    from pyspark.sql import Window
    terms = (docs.select(F.col(by).alias("g"),
                         F.explode(TX.tokens(text_col)).alias("t"))
             .groupBy("g", "t").agg(F.count("*").alias("c")))
    scal = terms.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
        .alias("n_hapax"))
    order = [F.col("c").desc(), F.col("t").asc()]
    w1 = Window.partitionBy("g", F.pmod(md5_long("t"),
                                        F.lit(n_buckets))).orderBy(*order)
    w2 = Window.partitionBy("g").orderBy(*order)
    top = (terms.withColumn("_r1", F.row_number().over(w1))
           .filter(F.col("_r1") <= top_k)
           .withColumn("_r2", F.row_number().over(w2))
           .filter(F.col("_r2") <= top_k)
           .groupBy("g")
           .agg(F.max(F.when(F.col("_r2") == 1, F.col("c"))).cast("long")
                .alias("top1_n"),
                F.sum("c").cast("long").alias("topk_sum")))
    return (scal.join(F.broadcast(top), "g")
            .select(F.col("g").alias(by), "n_tokens", "n_types",
                    "n_hapax", "top1_n", "topk_sum",
                    F.round(F.col("n_types") / F.col("n_tokens")
                            .cast("double"), 6).alias("ttr"),
                    F.round(F.col("n_hapax") / F.col("n_types")
                            .cast("double"), 6).alias("hapax_frac"),
                    F.round(F.col("topk_sum") / F.col("n_tokens")
                            .cast("double"), 6).alias("head_mass")))


def term_head_report_sql(table: str = "documents", by: str = "source",
                         top_k: int = 10, text_col: str = "text") -> str:
    """DuckDB twin of :func:`term_head_report` (single-window rank —
    same (count desc, term asc) order, same exact integers)."""
    toks = TX.tokens_sql(text_col)
    return f"""
WITH terms AS (
  SELECT {by} AS g, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT {by}, unnest({toks}) AS t FROM {table})
  GROUP BY {by}, t),
scal AS (
  SELECT g, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hapax
  FROM terms GROUP BY g),
ranked AS (
  SELECT g, c, row_number() OVER (PARTITION BY g
                                  ORDER BY c DESC, t ASC) AS r
  FROM terms),
top AS (
  SELECT g, CAST(max(CASE WHEN r = 1 THEN c END) AS BIGINT) AS top1_n,
         CAST(sum(c) AS BIGINT) AS topk_sum
  FROM ranked WHERE r <= {top_k} GROUP BY g)
SELECT g AS {by}, n_tokens, n_types, n_hapax, top1_n, topk_sum,
       round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
       round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_frac,
       round(CAST(topk_sum AS DOUBLE) / n_tokens, 6) AS head_mass
FROM scal JOIN top USING (g)
"""


def hill_tail_report(docs: DataFrame, ks: list[int] = (20, 50, 100),
                     text_col: str = "text",
                     n_buckets: int = 32) -> DataFrame:
    """Hill power-law tail-index estimate of the term-frequency
    distribution — the quantitative Zipf exponent
    (:func:`term_head_report` tracks head MASS; this fits the head
    SLOPE). For the k largest term counts c₍₁₎ ≥ … ≥ c₍ₖ₊₁₎ the Hill
    estimator is α̂ = k / Σᵢ₌₁..ₖ ln(c₍ᵢ₎/c₍ₖ₊₁₎); natural language
    sits near α ≈ 1 (Zipf) — a template-flooded corpus pushes α down
    (one giant head), a gibberish/uniform corpus pushes it up. One
    row per requested k, so the estimator's own k-stability (the
    classic Hill-plot read) is in the report.

    Exactness: per head rank the log ``lᵢ = round(10⁶·ln cᵢ)`` is one
    fixed scalar tree over an exact integer count; per k the ratio sum
    ``S_k = Σᵢ≤k lᵢ − k·l₍ₖ₊₁₎`` is pure integer arithmetic on the
    rounded logs (per-term rounding of ln c instead of ln-ratio —
    differs from the textbook float by ≤ k micro-nats, identically on
    both engines), and ``alpha_milli = 10⁹·k div S_k`` is one integer
    division. Ties in counts are broken by term text — a deterministic
    head set.

    Scale shape: one map-side-combined term count, then the TWO-PHASE
    head (per-md5-bucket top-(kmax+1) windows, then a rank over
    ≤ n_buckets·(kmax+1) survivors — the term_head discipline: no
    reducer ever sorts the vocabulary); all k arms fold over the ONE
    (kmax+1)-row head via conditional sums."""
    from pyspark.sql import Window
    sizes = sorted(set(int(k) for k in ks))
    if not sizes or sizes[0] < 1:
        raise ValueError("ks must be positive ints")
    kmax = sizes[-1]
    terms = (docs.select(F.explode(TX.tokens(text_col)).alias("t"))
             .groupBy("t").agg(F.count("*").alias("c")))
    order = [F.col("c").desc(), F.col("t").asc()]
    w1 = Window.partitionBy(F.pmod(md5_long("t"), F.lit(n_buckets))) \
        .orderBy(*order)
    w2 = Window.partitionBy().orderBy(*order)
    head = (terms.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= kmax + 1)
            .withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= kmax + 1)
            .withColumn("_l", F.round(F.lit(1e6)
                                      * F.log(F.col("c").cast("double")))
                        .cast("long")))
    aggs = []
    for k in sizes:
        aggs += [
            F.sum(F.when(F.col("_r2") <= k, F.col("_l"))).cast("long")
            .alias(f"suml_{k}"),
            F.max(F.when(F.col("_r2") == k + 1, F.col("_l")))
            .cast("long").alias(f"lcut_{k}"),
            F.max(F.when(F.col("_r2") == k + 1, F.col("c")))
            .cast("long").alias(f"ccut_{k}")]
    folded = head.agg(*aggs)
    arms = [F.struct(
        F.lit(k).cast("long").alias("k"),
        F.col(f"ccut_{k}").alias("cutoff_count"),
        (F.col(f"suml_{k}") - F.lit(k) * F.col(f"lcut_{k}"))
        .cast("long").alias("sum_log_ratio_micro")) for k in sizes]
    return (folded.select(F.explode(F.array(*arms)).alias("s"))
            .select("s.k", "s.cutoff_count", "s.sum_log_ratio_micro")
            .filter(F.col("cutoff_count").isNotNull())
            .withColumn("alpha_milli", F.expr(
                "CASE WHEN sum_log_ratio_micro <= 0 THEN NULL ELSE "
                "1000000000 * k div sum_log_ratio_micro END")
                .cast("long"))
            .orderBy("k"))


def hill_tail_sql(table: str = "documents",
                  ks: list[int] = (20, 50, 100),
                  text_col: str = "text") -> str:
    """DuckDB twin of :func:`hill_tail_report` (single-window rank —
    the two-phase head is lossless, so the plain form is the oracle)."""
    sizes = sorted(set(int(k) for k in ks))
    if not sizes or sizes[0] < 1:
        raise ValueError("ks must be positive ints")
    kmax = sizes[-1]
    toks = TX.tokens_sql(text_col)
    arms = " UNION ALL ".join(f"""
SELECT {k} AS k,
  (SELECT c FROM head WHERE r = {k} + 1) AS cutoff_count,
  (SELECT CAST(sum(l) - {k} * (SELECT l FROM head WHERE r = {k} + 1)
          AS BIGINT) FROM head WHERE r <= {k}) AS sum_log_ratio_micro"""
                              for k in sizes)
    return f"""
WITH terms AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest({toks}) AS t FROM {table}) GROUP BY t),
head AS (
  SELECT c, CAST(round(1e6 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS l,
         row_number() OVER (ORDER BY c DESC, t ASC) AS r
  FROM terms QUALIFY r <= {kmax} + 1),
arms AS ({arms})
SELECT CAST(k AS BIGINT) AS k, cutoff_count, sum_log_ratio_micro,
       CAST(CASE WHEN sum_log_ratio_micro <= 0 THEN NULL
                 ELSE CAST(1000000000 AS BIGINT) * k
                      // sum_log_ratio_micro END
            AS BIGINT) AS alpha_milli
FROM arms WHERE cutoff_count IS NOT NULL ORDER BY k
"""


# --- collocation mining (PMI by exact-integer lift) ---------------------------

def pmi_collocations(docs: DataFrame, top_k: int = 50,
                     min_count: int = 5,
                     text_col: str = "text") -> DataFrame:
    """Top adjacent-word collocations ranked by LIFT — the exact-integer
    monotone twin of PMI (PMI = log lift, so the ranking is identical
    and no log ever enters the oracle): lift = n_pair · N / (n_w1 ·
    n_w2), N the total bigram-position count. A single division of
    exact BIGINT products, rounded once; ties cut deterministically by
    (w1, w2), so the top-k SET is engine-independent.

    Scale shape: bigram and unigram frequency tables each come from one
    map-side-combined shuffle (stopword-pair heavy hitters combine
    before moving); the pair table joins the unigram table twice on the
    word key (vocab-scale shuffle hash joins — at 100 TB the unigram
    side is still vocab-scale, never broadcast blindly); N rides a
    one-row broadcast cross join; the final top-k is TakeOrdered, never
    a global sort.
    """
    bg = (docs.select(F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
          .groupBy("bg").agg(F.count("*").alias("n_pair"))
          .filter(F.col("n_pair") >= min_count)
          .select(F.split("bg", " ").getItem(0).alias("w1"),
                  F.split("bg", " ").getItem(1).alias("w2"),
                  "n_pair"))
    uni = (docs.select(F.explode(TX.tokens(text_col)).alias("w"))
           .groupBy("w").agg(F.count("*").alias("n_w")))
    total = (docs.select(F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
             .agg(F.count("*").cast("long").alias("n_total")))
    out = (bg
           .join(uni.select(F.col("w").alias("w1"),
                            F.col("n_w").alias("n_w1")), "w1")
           .join(uni.select(F.col("w").alias("w2"),
                            F.col("n_w").alias("n_w2")), "w2")
           .crossJoin(F.broadcast(total))
           .select("w1", "w2",
                   F.col("n_pair").cast("long").alias("n_pair"),
                   F.col("n_w1").cast("long").alias("n_w1"),
                   F.col("n_w2").cast("long").alias("n_w2"),
                   # products in IEEE double (correctly rounded, no
                   # accumulation): bigint n_pair*n_total would wrap
                   # int64 at corpus scale (DuckDB would silently go
                   # HUGEINT and diverge)
                   F.round((F.col("n_pair").cast("double")
                            * F.col("n_total"))
                           / (F.col("n_w1").cast("double")
                              * F.col("n_w2")), 6).alias("lift")))
    return (out.orderBy(F.col("lift").desc(), "w1", "w2").limit(top_k))


def pmi_collocations_sql(table: str = "documents", top_k: int = 50,
                         min_count: int = 5,
                         text_col: str = "text") -> str:
    """DuckDB twin of :func:`pmi_collocations` (identical exact-integer
    lift and deterministic tie-break)."""
    sh = TX.shingles_all_sql(text_col, 2)
    toks = TX.tokens_sql(text_col)
    return f"""
WITH bgs AS (
  SELECT unnest({sh}) AS bg FROM {table}),
bg AS (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
         CAST(count(*) AS BIGINT) AS n_pair
  FROM bgs GROUP BY bg HAVING count(*) >= {min_count}),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS n_w
  FROM (SELECT unnest({toks}) AS w FROM {table}) GROUP BY w),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM bgs)
SELECT w1, w2, n_pair, a.n_w AS n_w1, b.n_w AS n_w2,
       round((CAST(n_pair AS DOUBLE) * n_total)
             / (CAST(a.n_w AS DOUBLE) * b.n_w), 6) AS lift
FROM bg JOIN uni a ON a.w = w1 JOIN uni b ON b.w = w2, tot
ORDER BY lift DESC, w1, w2 LIMIT {top_k}"""


# --- robust outlier gate (exact median/MAD over a bounded-domain histogram) --

def length_outlier_report(docs: DataFrame, by: str = "source",
                          value_col: str = "n_chars",
                          k: int = 3) -> DataFrame:
    """Robust per-group outlier statistics on an integer measure:
    exact MEDIAN and MAD (median absolute deviation), plus the count
    and fraction of docs with ``|x − median| > k·MAD`` — the classic
    robust-z gate (a mean/stddev gate is dragged by the very outliers
    it should catch; median/MAD is 50%-breakdown robust).

    Exactness AND scale at once — the bounded-domain trick: an exact
    corpus-wide median normally buffers every value
    (``agg_percentiles``' documented caveat), but an integer measure
    with a bounded domain (chars, tokens, lines) collapses to a
    (group, value) HISTOGRAM first — corpus-scale rows fold map-side
    into domain-scale counts, and the median is a running-sum walk over
    that tiny histogram. Both medians here (value, then deviation) are
    lower medians (smallest v whose cumulative count reaches
    ceil(n/2)) in pure integer arithmetic.

    Plan shape: two map-side-combined histogram aggregations + two
    histogram-scale windows (partitions are |domain| rows, never
    corpus rows) + broadcast joins of group-scale stats; the only
    corpus-scale passes are the two histogram builds.
    """
    from pyspark.sql import Window

    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    v = F.col(value_col).cast("long")
    # the histogram feeds five subtrees (median walk ×2, deviation
    # histogram, final stats): checkpoint the domain-scale counts once
    # so the corpus scan + map-side fold run once, not per consumer
    hist = checkpoint_df(
        docs.select(F.col(by).alias("g"), v.alias("v"))
        .groupBy("g", "v").agg(F.count("*").alias("c")), eager=False)

    def lower_median(h: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("g").orderBy("v")
        tot = h.groupBy("g").agg(F.sum("c").alias("_n"))
        cum = (h.join(F.broadcast(tot), "g")
               .withColumn("_cum", F.sum("c").over(w)))
        # lower-median position: ceil(n/2) (n=4 → 2nd value, n=5 → 3rd)
        return (cum.filter(F.col("_cum") >= F.ceil(F.col("_n") / 2.0))
                .groupBy("g").agg(F.min("v").cast("long").alias(out)))

    med = lower_median(hist, "median_v")
    dev_hist = (hist.join(F.broadcast(med), "g")
                .select("g", F.abs(F.col("v") - F.col("median_v"))
                        .alias("v"), "c")
                .groupBy("g", "v").agg(F.sum("c").alias("c")))
    mad = lower_median(dev_hist, "mad_v")
    stats = (hist.join(F.broadcast(med), "g")
             .join(F.broadcast(mad), "g")
             .groupBy("g", "median_v", "mad_v")
             .agg(F.sum("c").cast("long").alias("n_docs"),
                  F.sum(F.when(F.abs(F.col("v") - F.col("median_v"))
                               > k * F.col("mad_v"), F.col("c"))
                        .otherwise(F.lit(0)))
                  .cast("long").alias("n_outliers")))
    return stats.select(
        F.col("g").alias(by),
        "n_docs",
        F.col("median_v").alias(f"median_{value_col}"),
        F.col("mad_v").alias(f"mad_{value_col}"),
        "n_outliers",
        F.round(F.col("n_outliers") / F.col("n_docs").cast("double"), 6)
        .alias("outlier_frac"))


def length_outlier_report_sql(table: str = "documents",
                              by: str = "source",
                              value_col: str = "n_chars",
                              k: int = 3) -> str:
    """DuckDB twin of :func:`length_outlier_report` (identical lower
    medians via the same histogram running-sum walk)."""
    return f"""
WITH hist AS (
  SELECT {by} AS g, CAST({value_col} AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM {table} GROUP BY {by}, {value_col}),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY g),
med AS (
  SELECT g, CAST(min(v) AS BIGINT) AS median_v FROM (
    SELECT h.g, v, sum(c) OVER (PARTITION BY h.g ORDER BY v) AS cum,
           t.n
    FROM hist h JOIN tot t USING (g))
  WHERE cum >= CAST(ceil(n / 2.0) AS BIGINT)
  GROUP BY g),
dev AS (
  SELECT h.g, abs(v - median_v) AS v, CAST(sum(c) AS BIGINT) AS c
  FROM hist h JOIN med USING (g) GROUP BY h.g, abs(v - median_v)),
dtot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM dev GROUP BY g),
mad AS (
  SELECT g, CAST(min(v) AS BIGINT) AS mad_v FROM (
    SELECT d.g, v, sum(c) OVER (PARTITION BY d.g ORDER BY v) AS cum,
           t.n
    FROM dev d JOIN dtot t USING (g))
  WHERE cum >= CAST(ceil(n / 2.0) AS BIGINT)
  GROUP BY g)
SELECT h.g AS {by},
       CAST(sum(c) AS BIGINT) AS n_docs,
       median_v AS median_{value_col},
       mad_v AS mad_{value_col},
       CAST(sum(CASE WHEN abs(v - median_v) > {k} * mad_v THEN c
                     ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN abs(v - median_v) > {k} * mad_v THEN c
                           ELSE 0 END) AS DOUBLE) / sum(c), 6)
         AS outlier_frac
FROM hist h JOIN med USING (g) JOIN mad USING (g)
GROUP BY h.g, median_v, mad_v"""

def textrank_keywords(docs: DataFrame, top_k: int = 25,
                      min_count: int = 5, iters: int = 3,
                      damping_pct: int = 85,
                      text_col: str = "text") -> DataFrame:
    """Corpus-level TextRank keywords: PageRank over the adjacent-word
    co-occurrence graph (Mihalcea & Tarau's graph ranking, run on the
    whole corpus instead of one document — the unsupervised keyword
    extractor that catches structurally-central terms raw frequency
    misses: a word bridging many contexts outranks a word repeated in
    one template).

    Graph construction contract: DIRECTED bigram occurrences are
    counted first (one map-side-combined shuffle — the PMI base),
    pairs below ``min_count`` and self-loops drop, the survivors
    canonicalize to undirected edges on the md5-long word ids (least/
    greatest), deduped. The rank is the engine's fixed-point integer
    PageRank (graph.pagerank — exact, oracle-unrollable), joined back
    to word text; the final top-k is TakeOrdered by (rank DESC, word),
    deterministic because ranks are integers underneath.

    Scale shape: bigram counting is the only corpus-scale pass; edges
    and ranks are vocabulary-graph-scale. Word ids are the house
    md5-long (identical in the oracle); collision probability at 60
    bits is negligible and engine-identical either way.
    """
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    from rgd_rnaseq_workflows_spark.operators.graph import pagerank
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    bg = (docs.select(F.explode(TX.shingles_all(text_col, 2)).alias("bg"))
          .groupBy("bg").agg(F.count("*").alias("n_pair"))
          .filter(F.col("n_pair") >= min_count)
          .select(F.split("bg", " ").getItem(0).alias("w1"),
                  F.split("bg", " ").getItem(1).alias("w2"))
          .filter(F.col("w1") != F.col("w2")))
    # vocabulary-scale after the min_count gate — checkpoint so the
    # corpus bigram pass runs ONCE (both `pairs` and `words` consume
    # bg; unchecked, the word-id join replayed the whole corpus scan)
    bg = checkpoint_df(bg, eager=False)
    ha, hb = md5_long(F.col("w1")), md5_long(F.col("w2"))
    pairs = (bg.select(F.least(ha, hb).alias("id_a"),
                       F.greatest(ha, hb).alias("id_b"))
             .distinct())
    words = (bg.select(F.col("w1").alias("word"))
             .union(bg.select("w2")).distinct()
             .select("word", md5_long(F.col("word")).alias("id")))
    ranks = pagerank(pairs, iters=iters, damping_pct=damping_pct)
    return (ranks.join(words, "id")
            .select("word", "rank")
            .orderBy(F.col("rank").desc(), "word")
            .limit(top_k))


def textrank_keywords_sql(table: str = "documents", top_k: int = 25,
                          min_count: int = 5, iters: int = 3,
                          damping_pct: int = 85,
                          text_col: str = "text") -> str:
    """DuckDB twin of :func:`textrank_keywords`: identical edge
    construction + the unrolled integer pagerank chain (CTE-wrapped,
    the centrality_keepers composition pattern)."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.operators.graph import pagerank_sql
    sh = TX.shingles_all_sql(text_col, 2)
    h1, h2 = md5_long_sql("w1"), md5_long_sql("w2")
    pr = pagerank_sql("SELECT id_a, id_b FROM tpairs",
                      iters, damping_pct).strip()
    return f"""
WITH bgc AS MATERIALIZED (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
  FROM (SELECT bg, count(*) AS n_pair
        FROM (SELECT unnest({sh}) AS bg FROM {table})
        GROUP BY bg HAVING count(*) >= {min_count})
  WHERE string_split(bg, ' ')[1] <> string_split(bg, ' ')[2]),
tpairs AS MATERIALIZED (
  SELECT DISTINCT least({h1}, {h2}) AS id_a,
         greatest({h1}, {h2}) AS id_b
  FROM bgc),
words AS (
  SELECT word, {md5_long_sql("word")} AS id
  FROM (SELECT w1 AS word FROM bgc UNION SELECT w2 FROM bgc)),
pr AS (SELECT * FROM ({pr}) q)
SELECT w.word, p.rank
FROM pr p JOIN words w ON w.id = p.id
ORDER BY p.rank DESC, w.word
LIMIT {top_k}"""



# =============================================================================
# Cross-source quantile normalization
# =============================================================================


def quantile_normalize_by_group(df: DataFrame, group_col: str,
                                value_col: str) -> DataFrame:
    """Quantile-normalize an integer metric ACROSS groups: map each
    group's value distribution onto the pooled distribution (the
    batch-effect correction classic — Bolstad et al. 2003), so one
    threshold means the same thing for every source. A length or
    quality-score gate tuned on one source otherwise over-prunes
    sources whose distribution merely sits lower.

    Construction (exact integer, engine-identical): works entirely at
    (group, value) HISTOGRAM scale — never ranks individual rows. Each
    (group, value) cell's doubled midrank ``2*cum_before + cnt + 1``
    maps to a pooled target index ``ceil(midrank * N / n_g)`` (computed
    in decimal(38,0): midrank2·N reaches 2·N² which wraps int64 near a
    trillion rows), and the normalized value is the pooled value whose
    cumulative rank interval covers that index.

    Output: one row per (group, value) — (group, value, n, norm_value),
    ordered. Corpus rows are touched by exactly ONE map-side-combined
    count aggregation; all windows and the interval join ride
    value-scale frames (bounded metric domains — lengths, scores in
    basis points — keep these tiny at any corpus size; the pooled side
    broadcasts).

    NULL contract: rows with a NULL value are EXCLUDED up front (they
    carry no rank). Without the filter the two engines silently
    diverge — Spark windows sort NULLS FIRST, DuckDB defaults to NULLS
    LAST, shifting every cum0/pooled rank — so the exclusion is pinned
    here and in the SQL twin.
    """
    from pyspark.sql import Window
    cnt = (df.filter(F.col(value_col).isNotNull())
           .groupBy(F.col(group_col).alias("g"),
                    F.col(value_col).cast("long").alias("v"))
           .agg(F.count("*").cast("long").alias("n")))
    gw = Window.partitionBy("g").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, -1)
    per_g = (cnt
             .withColumn("cum0", F.coalesce(F.sum("n").over(gw), F.lit(0)))
             .withColumn("n_g", F.sum("n").over(Window.partitionBy("g"))))
    pooled = (cnt.groupBy("v").agg(F.sum("n").alias("pn")))
    pw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pooled = (pooled
              .withColumn("p_lo", F.coalesce(F.sum("pn").over(pw),
                                             F.lit(0)) + 1)
              .withColumn("p_hi", F.col("p_lo") + F.col("pn") - 1)
              .select(F.col("v").alias("norm_value"), "p_lo", "p_hi"))
    dec = "decimal(38,0)"
    # n_tot, NOT "N": Spark column names are case-insensitive, so a
    # column named N would silently REPLACE n (the DuckDB twin hit the
    # same class of collision with W/w)
    idx = (f"CAST((CAST(2 * cum0 + n + 1 AS {dec}) * n_tot + 2 * n_g - 1) "
           f"div (2 * n_g) AS BIGINT)")
    lab = (per_g
           .withColumn("n_tot", F.sum("n").over(Window.partitionBy()))
           .withColumn("idx", F.expr(idx)))
    return (lab.join(F.broadcast(pooled),
                     (F.col("idx") >= F.col("p_lo"))
                     & (F.col("idx") <= F.col("p_hi")))
            .select(F.col("g").alias(group_col),
                    F.col("v").alias(value_col),
                    "n", "norm_value")
            .orderBy(group_col, value_col))


def quantile_normalize_sql(table: str, group_col: str,
                           value_col: str) -> str:
    """DuckDB twin of :func:`quantile_normalize_by_group` — identical
    histogram construction, midrank, HUGEINT index arithmetic and
    interval mapping (the oracle's decimal(38,0))."""
    return f"""
WITH cnt AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1, 2),
per_g AS (
  SELECT g, v, n,
         CAST(coalesce(sum(n) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum0,
         CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS n_g
  FROM cnt),
pooled AS (
  SELECT v, CAST(sum(n) AS BIGINT) AS pn FROM cnt GROUP BY v),
pooled2 AS (
  SELECT v AS norm_value,
         CAST(coalesce(sum(pn) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) + 1 AS p_lo,
         CAST(coalesce(sum(pn) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) + pn AS p_hi,
         CAST(sum(pn) OVER () AS BIGINT) AS N_tot
  FROM pooled),
lab AS (
  SELECT g, v, n,
         CAST((CAST(2 * cum0 + n + 1 AS HUGEINT) * N_tot + 2 * n_g - 1)
              // (2 * n_g) AS BIGINT) AS idx
  FROM per_g, (SELECT max(N_tot) AS N_tot FROM pooled2))
SELECT l.g AS {group_col}, l.v AS {value_col}, l.n, p.norm_value
FROM lab l JOIN pooled2 p ON l.idx BETWEEN p.p_lo AND p.p_hi
"""


def vocab_coverage_curve(docs: DataFrame,
                         vocab_sizes: list[int] = (100, 1000, 10000),
                         text_col: str = "text",
                         n_buckets: int = 32) -> DataFrame:
    """Token-coverage-vs-vocabulary-size curve — the measurement behind
    every "how big must the vocab be" tokenizer decision: for each
    candidate size K, the exact fraction of corpus TOKENS covered by
    the K most frequent terms (ties broken by term text, so the head
    set is deterministic). Output per K: (vocab_size, n_terms,
    total_tokens, covered_tokens, coverage_bp) — exact BIGINTs, one
    integer division for the basis points.

    Scale shape: ONE map-side-combined shuffle builds the term
    frequency table; totals are a vocab-scale aggregation; the head is
    the TWO-PHASE bucketed top-K (the ``term_head_report`` discipline
    — no single reducer ever sorts the whole vocabulary), taken once
    at max(K) and re-used for every curve point via conditional sums;
    phase 2's single ranking task sees <= n_buckets * max(K) rows —
    bounded by the requested head, independent of corpus size.
    """
    terms = (docs.select(F.explode(TX.tokens(text_col)).alias("t"))
             .groupBy("t").agg(F.count("*").alias("c")))
    return vocab_coverage_from_counts(terms, vocab_sizes, n_buckets)


def vocab_coverage_from_counts(terms: DataFrame,
                               vocab_sizes: list[int] = (100, 1000,
                                                         10000),
                               n_buckets: int = 32) -> DataFrame:
    """The curve fold over a PREBUILT (term, count) frequency table —
    exposed separately because the term table is the curve's
    sufficient statistic: ``streaming.corpus_stream.
    stream_token_counts`` maintains it incrementally and this fold
    reads the live curve off the sink without re-reading the corpus
    (the drift-report / moments pattern). ``terms`` must yield
    (term, count)."""
    sizes = sorted(set(int(k) for k in vocab_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError("vocab_sizes must be positive ints")
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    kmax = sizes[-1]
    cols = terms.columns
    terms = terms.select(F.col(cols[0]).alias("t"),
                         F.col(cols[1]).alias("c"))
    totals = terms.agg(F.sum("c").cast("long").alias("total_tokens"),
                       F.count("*").cast("long").alias("n_terms"))
    order = [F.col("c").desc(), F.col("t").asc()]
    w1 = Window.partitionBy(F.pmod(md5_long("t"), F.lit(n_buckets))) \
        .orderBy(*order)
    w2 = Window.partitionBy().orderBy(*order)   # <= n_buckets*kmax rows
    head = (terms.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= kmax)
            .withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= kmax))
    covs = head.agg(*[
        F.sum(F.when(F.col("_r2") <= k, F.col("c"))).cast("long")
        .alias(f"cov_{k}") for k in sizes])
    arms = [F.struct(F.lit(k).cast("long").alias("vocab_size"),
                     F.coalesce(F.col(f"cov_{k}"), F.lit(0))
                     .alias("covered_tokens")) for k in sizes]
    return (totals.crossJoin(F.broadcast(covs))
            .select("n_terms", "total_tokens",
                    F.explode(F.array(*arms)).alias("s"))
            .select("s.vocab_size", "n_terms",
                    F.coalesce("total_tokens", F.lit(0)).cast("long")
                    .alias("total_tokens"),
                    F.col("s.covered_tokens").alias("covered_tokens"),
                    # empty / zero-token term table: Spark's div would
                    # yield NULL while DuckDB's // 0 errors (ADVICE
                    # r8) — pin coverage_bp to 0 in BOTH twins so the
                    # engines agree on the empty-corpus edge.
                    F.when(F.coalesce(F.col("total_tokens"),
                                      F.lit(0)) == 0, F.lit(0))
                    .otherwise(F.expr(
                        "10000 * s.covered_tokens div total_tokens"))
                    .cast("long").alias("coverage_bp"))
            .orderBy("vocab_size"))


def vocab_coverage_curve_sql(table: str,
                             vocab_sizes: list[int] = (100, 1000, 10000),
                             text_col: str = "text") -> str:
    """DuckDB twin of :func:`vocab_coverage_curve` — single-window
    ranking (the two-phase plan is lossless for the head, so the plain
    form is the oracle)."""
    sizes = sorted(set(int(k) for k in vocab_sizes))
    if not sizes or sizes[0] < 1:
        raise ValueError("vocab_sizes must be positive ints")
    toks = TX.tokens_sql(text_col)
    arms = " UNION ALL ".join(
        f"SELECT {k} AS vocab_size, "
        f"(SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ranked "
        f" WHERE r <= {k}) AS covered_tokens" for k in sizes)
    return f"""
WITH terms AS (
  SELECT t, count(*) AS c FROM (
    SELECT unnest({toks}) AS t FROM {table}) GROUP BY t),
totals AS (
  SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_terms FROM terms),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM terms),
arms AS ({arms})
SELECT CAST(vocab_size AS BIGINT) AS vocab_size, n_terms,
       CAST(coalesce(total_tokens, 0) AS BIGINT) AS total_tokens,
       covered_tokens,
       CAST(CASE WHEN coalesce(total_tokens, 0) = 0 THEN 0
                 ELSE (10000 * covered_tokens) // total_tokens
            END AS BIGINT) AS coverage_bp
FROM arms CROSS JOIN totals
ORDER BY vocab_size
"""


def ngram_novelty_report(docs: DataFrame, n: int = 3,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-document n-gram novelty against everything that arrived
    BEFORE it (doc_id = ingestion order): what fraction of the
    document's n-gram occurrences use a gram first seen in an earlier
    document. The memorization/freshness profile of a crawl — a
    novelty collapse flags a feed re-crawling itself (dedup's leading
    indicator), and per-slice novelty ranks sources by how much NEW
    text they actually contribute.

    novelty_micro = (n_grams − n_seen_before)·10⁶ div n_grams — exact
    integer division, engine-identical. Documents shorter than ``n``
    tokens have no grams and drop (documented; they carry no signal).

    Scale shape: ONE map-side-combined groupBy(gram) for the global
    first-doc table, one equi-join back (vocabulary-scale build side —
    broadcast at small scale, SMJ beyond), one per-doc aggregation; no
    windows over the corpus, no self-join. The gram explode runs once
    per branch (two codegen corpus scans) — cheaper than materializing
    the token-scale exploded stream."""
    g = docs.select(F.col(id_col).alias("id"),
                    F.explode(TX.shingles_all(text_col, n)).alias("g"))
    first = g.groupBy("g").agg(F.min("id").alias("_first"))
    return (g.join(first, "g")
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("n_grams"),
                 F.sum((F.col("_first") < F.col("id")).cast("long"))
                 .cast("long").alias("n_seen_before"))
            .select(F.col("id").alias(id_col), "n_grams",
                    "n_seen_before",
                    F.expr("(n_grams - n_seen_before) * 1000000 "
                           "div n_grams").cast("long")
                    .alias("novelty_micro"))
            .orderBy(id_col))


def ngram_novelty_report_sql(table: str = "documents", n: int = 3,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB twin of :func:`ngram_novelty_report`."""
    sh = TX.shingles_all_sql(text_col, n)
    return f"""
WITH g AS (
  SELECT {id_col} AS id, unnest({sh}) AS g FROM {table}),
first AS (SELECT g, min(id) AS f FROM g GROUP BY g),
per AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(coalesce(sum(CAST(f < id AS BIGINT)), 0) AS BIGINT)
           AS n_seen_before
  FROM g JOIN first USING (g) GROUP BY id)
SELECT id AS {id_col}, n_grams, n_seen_before,
       CAST((n_grams - n_seen_before) * 1000000 // n_grams AS BIGINT)
         AS novelty_micro
FROM per ORDER BY {id_col}
"""


def _ccnet_ranked(docs: DataFrame, n_buckets: int, id_col: str,
                  text_col: str, nll_table: DataFrame | None = None
                  ) -> DataFrame:
    """The shared ranked frame: per scoreable doc, the exact integer
    per-bigram key, its global rank, and its bucket index.

    The rank is the distributed two-phase
    :func:`~rgd_rnaseq_workflows_spark.operators.exact_quantiles.
    global_ranks` (range shuffle + per-partition ``row_number`` +
    broadcast offsets) — NEVER a partition-less ``row_number`` window:
    this frame feeds the ``--ccnet-keep`` corpus gate, so it is
    doc-scale at 100 TB and a single-task global sort would be the
    hard bottleneck of the whole curation run. The order
    ``(_key, id)`` is total (doc ids are unique), so the two-phase
    rank is exact and engine-identical.

    ``nll_table``: a pre-built (bg, nll6) table TRAINED ON ``docs``
    (e.g. the checkpointed frozen LM a deployment persists next to
    the cut-point). When given, scoring rides
    :func:`kn_score_occurrences` against it instead of re-deriving
    the whole LM through :func:`kn_lm_report` — the occurrence fold is
    test-pinned identical to the self-trained report, so the keys and
    buckets cannot differ, and the reference corpus is scored without
    a second corpus-scale LM build."""
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        global_ranks)
    rep0 = (kn_lm_report(docs, id_col, text_col) if nll_table is None
            else kn_score_occurrences(docs, nll_table, id_col,
                                      text_col))
    rep = (rep0.filter(F.col("n_bigrams") > 0)
           .withColumn("_key", F.expr(
               "nll_micro * 1000000 div n_bigrams")))
    ranked = global_ranks(rep, [F.col("_key"), F.col(id_col)],
                          rank_col="_grank", total_col="_n")
    return ranked.withColumn("bucket", F.expr(
        f"(_grank - 1) * {n_buckets} div _n").cast("int"))


def _ccnet_band(n_buckets: int):
    return (F.when(F.col("bucket") == 0, F.lit("head"))
            .when(F.col("bucket") == n_buckets - 1, F.lit("tail"))
            .otherwise(F.lit("middle")))


def ccnet_band_assign(docs: DataFrame, n_buckets: int = 3,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document CCNet band membership — (doc_id, bucket, band):
    the filtering form of :func:`ccnet_perplexity_buckets` (join it
    back and keep band = 'head' for the CCNet training slice).
    Documents with no bigrams carry no band and are absent."""
    return (_ccnet_ranked(docs, n_buckets, id_col, text_col)
            .select(id_col, "bucket",
                    _ccnet_band(n_buckets).alias("band")))


def ccnet_perplexity_buckets(docs: DataFrame, n_buckets: int = 3,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """The CCNet head/middle/tail partition (Wenzek et al. 2020):
    rank every document by its Kneser-Ney perplexity under the
    corpus-trained LM and cut the ranking into ``n_buckets`` equal
    rank slices — head (lowest perplexity = most LM-like) is what
    CCNet keeps for LM training, tail is the junk candidate pile.

    Exactness: the ranking key is the exact integer per-bigram
    micro-nat ``nll_micro·10⁶ div n_bigrams`` (ties broken by doc id),
    the bucket is ``(rank−1)·n_buckets div n_docs``, and the per-bucket
    mean NLL is an exact integer division — no float ordering anywhere,
    so both engines cut identical buckets. Documents with no bigrams
    carry no perplexity and are excluded (the kn_score contract).

    Scale shape: the per-doc report is the ``kn_lm_report`` lineage;
    the global rank is the two-phase distributed rank (one sampled
    range shuffle, per-partition ``row_number``, broadcast
    partition-count-scale offsets — no single-task WindowExec), and
    the bucket fold is a |buckets|-row aggregation."""
    ranked = _ccnet_ranked(docs, n_buckets, id_col, text_col)
    label = _ccnet_band(n_buckets)
    return (ranked.groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_bigrams").cast("long").alias("n_bigrams"),
                 F.min("_key").cast("long").alias("min_nll_micro"),
                 F.max("_key").cast("long").alias("max_nll_micro"),
                 F.expr("sum(nll_micro) * 1000000 div sum(n_bigrams)")
                 .cast("long").alias("mean_nll_micro"))
            .withColumn("band", label)
            .select("bucket", "band", "n_docs", "n_bigrams",
                    "min_nll_micro", "max_nll_micro", "mean_nll_micro")
            .orderBy("bucket"))


def ccnet_perplexity_buckets_sql(table: str = "documents",
                                 n_buckets: int = 3,
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> str:
    """DuckDB twin of :func:`ccnet_perplexity_buckets`."""
    rep = kn_lm_report_sql(table, id_col, text_col)
    return f"""
WITH rep AS ({rep}),
keyed AS (
  SELECT {id_col} AS id, n_bigrams, nll_micro,
         nll_micro * 1000000 // n_bigrams AS key
  FROM rep WHERE n_bigrams > 0),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY key, id) AS rn,
         count(*) OVER () AS n
  FROM keyed),
bk AS (
  SELECT CAST((rn - 1) * {n_buckets} // n AS INTEGER) AS bucket, *
  FROM ranked)
SELECT bucket,
       CASE WHEN bucket = 0 THEN 'head'
            WHEN bucket = {n_buckets - 1} THEN 'tail'
            ELSE 'middle' END AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(min(key) AS BIGINT) AS min_nll_micro,
       CAST(max(key) AS BIGINT) AS max_nll_micro,
       CAST(sum(nll_micro) * 1000000 // sum(n_bigrams) AS BIGINT)
         AS mean_nll_micro
FROM bk GROUP BY bucket
ORDER BY bucket
"""


def ccnet_keep_threshold(docs: DataFrame, n_buckets: int = 3,
                         keep_buckets: int = 1, id_col: str = "doc_id",
                         text_col: str = "text",
                         nll_table: DataFrame | None = None) -> int:
    """The FROZEN CCNet keep cut-point: the maximum exact integer
    per-bigram micro-nat key among the kept (lowest-perplexity)
    ``keep_buckets`` rank buckets of the reference corpus. This is the
    artifact a deployment freezes next to the ``(bg, nll6)`` LM table:
    a STREAM cannot compute a global rank, so the ingest gate compares
    each arriving document's key against this batch-derived constant
    (:func:`ccnet_keep_gate` / ``corpus_stream.stream_ccnet_keep``).
    Driver metadata — one long from a 1-row aggregate."""
    if not 0 < keep_buckets <= n_buckets:
        raise ValueError(f"keep_buckets {keep_buckets} must be in "
                         f"(0, {n_buckets}]")
    ranked = _ccnet_ranked(docs, n_buckets, id_col, text_col,
                           nll_table=nll_table)
    [r] = (ranked.filter(F.col("bucket") < keep_buckets)
           .agg(F.max("_key").alias("k")).collect())
    if r["k"] is None:
        raise ValueError("ccnet_keep_threshold: reference corpus has "
                         "no scoreable documents")
    return int(r["k"])


def ccnet_keep_gate(docs: DataFrame, nll_table: DataFrame,
                    max_key_micro: int, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Apply the frozen CCNet keep rule to a document frame — batch OR
    streaming (the deployment shape Wenzek et al. 2020 describe: gate
    documents as they arrive, against the reference LM, without
    touching the lake). Scores with the occurrence-weighted
    single-aggregation KN fold (:func:`kn_score_occurrences` — the one
    streaming-legal shape: stateless stream-static LM join + ONE
    streaming aggregation, filtered post-aggregation), derives each
    document's exact integer per-bigram key, and keeps keys at or
    below the frozen cut-point. Documents with no in-LM bigrams carry
    no perplexity and are dropped (the band-assign contract); ties at
    the cut are kept on both engines (<=, exact integers)."""
    scored = kn_score_occurrences(docs, nll_table, id_col, text_col)
    return (scored.filter(F.col("n_bigrams") > 0)
            .withColumn("key_micro",
                        F.expr("nll_micro * 1000000 div n_bigrams")
                        .cast("long"))
            .filter(F.col("key_micro") <= F.lit(int(max_key_micro)))
            .select(id_col, "n_bigrams", "n_oov", "nll_micro",
                    "key_micro"))


def ccnet_keep_gate_sql(lm_where: str, probe_where: str,
                        n_buckets: int = 3, keep_buckets: int = 1,
                        table: str = "documents",
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of the full frozen-gate deployment: train the KN LM
    on the ``lm_where`` slice, self-score it to derive the keep
    cut-point (the batch CCNet ranking), then score the
    ``probe_where`` slice against the FROZEN LM and keep documents at
    or below the cut."""
    sh = TX.shingles_all_sql(text_col, 2)
    d = KN_DISCOUNT
    return f"""
WITH b AS (
  SELECT id, coalesce(bg, '') AS bg FROM (
    SELECT {id_col} AS id, unnest({sh}) AS bg
    FROM {table} WHERE {lm_where})),
lm AS (
  SELECT bg, CAST(count(*) AS BIGINT) AS c12,
         string_split(bg, ' ')[1] AS w1,
         string_split(bg, ' ')[-1] AS w2
  FROM b GROUP BY bg),
ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n1p_fwd
        FROM lm GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_rev
         FROM lm GROUP BY w2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM lm),
scored AS (
  SELECT bg, CAST(round(-ln(
           (c12 - {d}) / c1
           + {d} * n1p_fwd / c1 * n1p_rev / n_types) * 1e6) AS BIGINT)
           AS nll6
  FROM lm JOIN ctx USING (w1) JOIN cont USING (w2), tot),
reftf AS (SELECT id, bg, CAST(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY id, bg),
refper AS (
  SELECT id,
         CAST(sum(CASE WHEN nll6 IS NOT NULL THEN cnt ELSE 0 END)
           AS BIGINT) AS n_bigrams,
         CAST(sum(cnt * coalesce(nll6, 0)) AS BIGINT) AS nll_micro
  FROM reftf LEFT JOIN scored USING (bg) GROUP BY id),
keyed AS (SELECT id, nll_micro * 1000000 // n_bigrams AS key
          FROM refper WHERE n_bigrams > 0),
ranked AS (SELECT id, key, row_number() OVER (ORDER BY key, id) AS rn,
                  count(*) OVER () AS n
           FROM keyed),
cut AS (SELECT CAST(max(key) AS BIGINT) AS max_key FROM ranked
        WHERE (rn - 1) * {n_buckets} // n < {keep_buckets}),
bp AS (
  SELECT id, coalesce(bg, '') AS bg FROM (
    SELECT {id_col} AS id, unnest({sh}) AS bg
    FROM {table} WHERE {probe_where})),
ptf AS (SELECT id, bg, CAST(count(*) AS BIGINT) AS cnt
        FROM bp GROUP BY id, bg),
pper AS (
  SELECT id,
         CAST(sum(CASE WHEN nll6 IS NOT NULL THEN cnt ELSE 0 END)
           AS BIGINT) AS n_bigrams,
         CAST(sum(CASE WHEN nll6 IS NULL THEN cnt ELSE 0 END)
           AS BIGINT) AS n_oov,
         CAST(sum(cnt * coalesce(nll6, 0)) AS BIGINT) AS nll_micro
  FROM ptf LEFT JOIN scored USING (bg) GROUP BY id)
SELECT id AS {id_col}, n_bigrams, n_oov, nll_micro,
       CAST(nll_micro * 1000000 // n_bigrams AS BIGINT) AS key_micro
FROM pper, cut
WHERE n_bigrams > 0
  AND nll_micro * 1000000 // n_bigrams <= cut.max_key
"""


def heaps_curve(docs: DataFrame, n_buckets: int = 10,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Heaps-law vocabulary-growth curve: the corpus in ingestion order
    (ascending id) split into ``n_buckets`` equal-count slices, and per
    slice the CUMULATIVE docs / token occurrences / distinct vocabulary
    plus the slice's marginal novelty rate (new types per 10k new
    tokens, integer basis points). The curve answers the "is more crawl
    still buying new language?" question — a flattening tail means
    additional data is repetition, the signal dedup/mixing decisions
    key off; a kink localizes where a source switch changed the corpus.

    Scale shape: doc ranks come from the distributed two-phase
    ``global_ranks`` (range shuffle + frozen per-partition row_number —
    never a single-task sort); the bucket id is pure integer arithmetic
    on the rank; then ONE corpus-scale equi join (token explode ×
    bucket table) and two aggregations — tokens-per-bucket (map-side
    combined to ≤ n_buckets rows) and FIRST-OCCURRENCE bucket per type
    (``min(bucket)`` — monotone in rank, so it equals the bucket of the
    first occurrence) folding to vocabulary-scale then ≤ n_buckets
    rows. The cumulative window runs on the n_buckets-row grid —
    metadata scale by construction. Exact integers throughout; the
    novelty rate is one bigint floor division.
    """
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        global_ranks)
    spark = docs.sparkSession
    ranked = global_ranks(docs.select(F.col(id_col).alias("_id")),
                          [F.col("_id")])
    buckets = ranked.select(
        "_id",
        F.expr(f"(_rank * {n_buckets} + _n - 1) div _n").alias("bucket"))
    ex = docs.select(F.col(id_col).alias("_id"),
                     F.explode(TX.tokens(text_col)).alias("tok"))
    exb = ex.join(buckets, "_id").select("bucket", "tok")
    tokcnt = exb.groupBy("bucket").agg(
        F.count("*").cast("long").alias("nt"))
    voc = (exb.groupBy("tok").agg(F.min("bucket").alias("bucket"))
           .groupBy("bucket").agg(F.count("*").cast("long").alias("nv")))
    dc = buckets.groupBy("bucket").agg(
        F.count("*").cast("long").alias("nd"))
    grid = spark.range(1, n_buckets + 1).select(
        F.col("id").alias("bucket"))
    j = (grid.join(dc, "bucket", "left")
         .join(tokcnt, "bucket", "left")
         .join(voc, "bucket", "left")
         .select("bucket",
                 F.coalesce("nd", F.lit(0)).alias("nd"),
                 F.coalesce("nt", F.lit(0)).alias("nt"),
                 F.coalesce("nv", F.lit(0)).alias("nv")))
    from pyspark.sql import Window
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return j.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.sum("nd").over(w).cast("long").alias("cum_docs"),
        F.sum("nt").over(w).cast("long").alias("cum_tokens"),
        F.sum("nv").over(w).cast("long").alias("cum_vocab"),
        F.when(F.col("nt") > 0, F.expr("(nv * 10000) div nt"))
        .cast("long").alias("novelty_bp")).orderBy("bucket")


def heaps_curve_sql(table: str = "documents", n_buckets: int = 10,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`heaps_curve` — naive single-node
    row_number over the same total order, identical bucket arithmetic
    and integer novelty division."""
    toks = TX.tokens_sql(text_col)
    k = n_buckets
    return f"""
WITH ranked AS (
  SELECT {id_col} AS id, row_number() OVER (ORDER BY {id_col}) AS r,
         count(*) OVER () AS n
  FROM {table}),
b AS MATERIALIZED (
  SELECT id, (r * {k} + n - 1) // n AS bucket FROM ranked),
ex AS (SELECT d.{id_col} AS id, t.tok
       FROM {table} d, unnest({toks}) AS t(tok)),
exb AS MATERIALIZED (
  SELECT b.bucket, e.tok FROM ex e JOIN b ON e.id = b.id),
tokcnt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nt
           FROM exb GROUP BY bucket),
voc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nv FROM (
          SELECT tok, min(bucket) AS bucket FROM exb GROUP BY tok)
        GROUP BY bucket),
dc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nd
       FROM b GROUP BY bucket),
grid AS (SELECT i AS bucket FROM range(1, {k} + 1) r(i)),
j AS (SELECT g.bucket, coalesce(d.nd, 0) AS nd,
             coalesce(t.nt, 0) AS nt, coalesce(v.nv, 0) AS nv
      FROM grid g LEFT JOIN dc d USING (bucket)
      LEFT JOIN tokcnt t USING (bucket)
      LEFT JOIN voc v USING (bucket))
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(sum(nd) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(nt) OVER w AS BIGINT) AS cum_tokens,
       CAST(sum(nv) OVER w AS BIGINT) AS cum_vocab,
       CASE WHEN nt > 0 THEN CAST((nv * 10000) // nt AS BIGINT) END
         AS novelty_bp
FROM j
WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
ORDER BY bucket
"""


def conformal_threshold_report(docs: DataFrame, weights: DataFrame,
                               n_buckets: int,
                               alphas_pct: list[int] = (1, 5, 10),
                               split_bp: int = 5000,
                               id_col: str = "doc_id",
                               text_col: str = "text", seed: int = 5,
                               split_seed: int = 17) -> DataFrame:
    """Split-conformal calibration of the quality-filter threshold —
    the finite-sample guarantee a corpus gate should carry: pick the
    drop threshold τ_α as the k-th SMALLEST calibration logit with
    ``k = ceil((n_cal+1)·α/100)``; then for any exchangeable new clean
    document, ``P(logit < τ_α) ≤ α`` — at most an α-fraction of good
    data is dropped, a guarantee that needs NO distributional
    assumption (the conformal rank bound). One row per requested α:
    the threshold, the exact rank that produced it, and the realized
    drop rate on the held-out eval split (should sit ≤≈ α — the
    report's own validity check).

    Exactness: logits are the exact integer micro-logits of
    :func:`hashed_linear_score`; the calibration split is the
    deterministic md5 hash bucket of the doc id (engine-identical kept
    set); the order statistic is read off a VALUE-HISTOGRAM cumulative
    walk (the ``exact_quantiles`` discipline — the logit domain is
    bounded by the weight range, so the walk is domain-scale, and the
    rank arithmetic is pure integers).

    Scale shape: one token explode + broadcast weight probe + ONE
    groupBy(doc) scores the corpus (the inference lineage, run once —
    checkpointed); the histogram collapses map-side to ≤ |domain|
    rows; every α reads the same cumulative frame via conditional
    mins; eval drop counts are one broadcast join of the |α|-row
    threshold frame."""
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    alphas = sorted(set(int(a) for a in alphas_pct))
    if not alphas or alphas[0] < 1 or alphas[-1] >= 100:
        raise ValueError("alphas_pct must lie in [1, 100)")
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col))
    toks = (base.select("id", F.explode(TX.tokens(text_col))
                        .alias("_tok"))
            .select("id", F.pmod(md5_long(F.col("_tok"), seed=seed),
                                 F.lit(n_buckets)).alias("bucket")))
    w = weights.select(F.col("bucket"), F.col("w").cast("long"))
    scored = (toks.join(F.broadcast(w), "bucket", "left")
              .groupBy("id")
              .agg(F.sum(F.coalesce("w", F.lit(0))).alias("_sw"),
                   F.count("*").alias("_nt"))
              .select("id", F.expr(
                  f"_sw * 1000000 div (_nt * {W_SCALE})").alias("lm"),
                  (F.pmod(md5_long(F.col("id").cast("string"),
                                   seed=split_seed), F.lit(10000))
                   < split_bp).alias("is_cal")))
    scored = checkpoint_df(scored, eager=False)
    cal = scored.filter("is_cal")
    hist = cal.groupBy("lm").agg(F.count("*").alias("c"))
    wcum = (Window.orderBy("lm")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = hist.withColumn("_cum", F.sum("c").over(wcum)) \
        .crossJoin(F.broadcast(
            cal.agg(F.count("*").cast("long").alias("n_cal"))))
    aggs = [F.max("n_cal").alias("n_cal")]
    for a in alphas:
        k = F.expr(f"CAST(ceil((n_cal + 1) * {a} / 100.0) AS BIGINT)")
        aggs.append(F.min(F.when(F.col("_cum") >= k, F.col("lm")))
                    .cast("long").alias(f"tau_{a}"))
        aggs.append(F.max(k).cast("long").alias(f"k_{a}"))
    folded = cum.agg(*aggs)
    arms = [F.struct(F.lit(a).cast("int").alias("alpha_pct"),
                     F.col(f"k_{a}").alias("target_rank"),
                     F.col(f"tau_{a}").alias("threshold_micro"))
            for a in alphas]
    taus = (folded.select(F.col("n_cal"),
                          F.explode(F.array(*arms)).alias("s"))
            .select("n_cal", "s.alpha_pct", "s.target_rank",
                    "s.threshold_micro"))
    ev = scored.filter(~F.col("is_cal"))
    drops = (ev.crossJoin(F.broadcast(taus))
             .groupBy("alpha_pct", "n_cal", "target_rank",
                      "threshold_micro")
             .agg(F.count("*").cast("long").alias("n_eval"),
                  F.sum((F.col("lm") < F.col("threshold_micro"))
                        .cast("long")).cast("long")
                  .alias("n_eval_dropped")))
    return (drops.select("alpha_pct", F.col("n_cal").cast("long")
                         .alias("n_cal"), "target_rank",
                         "threshold_micro", "n_eval",
                         "n_eval_dropped",
                         F.expr("n_eval_dropped * 1000000 div n_eval")
                         .cast("long").alias("eval_drop_ppm"))
            .orderBy("alpha_pct"))


def conformal_threshold_sql(table: str = "documents",
                            n_buckets: int = 1 << 12,
                            alphas_pct: list[int] = (1, 5, 10),
                            split_bp: int = 5000,
                            id_col: str = "doc_id",
                            text_col: str = "text", seed: int = 5,
                            weight_seed: int = 23,
                            split_seed: int = 17) -> str:
    """DuckDB twin of :func:`conformal_threshold_report` over
    :func:`pseudo_weights` — identical logits, split, rank walk."""
    alphas = sorted(set(int(a) for a in alphas_pct))
    toks = TX.tokens_sql(text_col)
    h = md5_long_sql("_tok", seed=seed)
    hw = md5_long_sql("CAST(i AS VARCHAR)", seed=weight_seed)
    hs = md5_long_sql("CAST(t.id AS VARCHAR)", seed=split_seed)
    tau_arms = ",\n  ".join(
        f"min(CASE WHEN cum >= CAST(ceil((n_cal + 1) * {a} / 100.0) "
        f"AS BIGINT) THEN lm END) AS tau_{a},\n  "
        f"max(CAST(ceil((n_cal + 1) * {a} / 100.0) AS BIGINT)) "
        f"AS k_{a}" for a in alphas)
    rows = " UNION ALL ".join(
        f"SELECT {a} AS alpha_pct, k_{a} AS target_rank, "
        f"tau_{a} AS threshold_micro FROM folded" for a in alphas)
    return f"""
WITH _w AS MATERIALIZED (
  SELECT CAST(i AS INTEGER) AS bucket,
         CAST({hw} % {2 * W_SCALE + 1} - {W_SCALE} AS BIGINT) AS w
  FROM range({n_buckets}) r(i)),
_tk AS (
  SELECT {id_col} AS id, CAST({h} % {n_buckets} AS INTEGER) AS bucket
  FROM (SELECT {id_col}, unnest({toks}) AS _tok FROM {table})),
scored AS MATERIALIZED (
  SELECT t.id,
         CAST(sum(coalesce(w.w, 0)) AS BIGINT) * 1000000
           // (count(*) * {W_SCALE}) AS lm,
         ({hs}) % 10000 < {split_bp} AS is_cal
  FROM _tk t LEFT JOIN _w w USING (bucket)
  GROUP BY t.id),
ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal
         FROM scored WHERE is_cal),
cum AS (
  SELECT lm, sum(c) OVER (ORDER BY lm
                          ROWS UNBOUNDED PRECEDING) AS cum, n_cal
  FROM (SELECT lm, count(*) AS c FROM scored WHERE is_cal
        GROUP BY lm), ncal),
folded AS (
  SELECT max(n_cal) AS n_cal,
  {tau_arms}
  FROM cum),
taus AS ({rows}),
ev AS (SELECT lm FROM scored WHERE NOT is_cal)
SELECT t.alpha_pct, n.n_cal, t.target_rank,
       CAST(t.threshold_micro AS BIGINT) AS threshold_micro,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN e.lm < t.threshold_micro THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eval_dropped,
       CAST(sum(CASE WHEN e.lm < t.threshold_micro THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS eval_drop_ppm
FROM taus t, ncal n, ev e
GROUP BY t.alpha_pct, n.n_cal, t.target_rank, t.threshold_micro
ORDER BY t.alpha_pct
"""


def readability_report(docs: DataFrame, by: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per group — the classic readability screen
    (Flesch 1948; Kincaid's military-doc recalibration is the same
    statistic re-scaled), driven by three exact integer counts: words
    (the module's token fold), sentences (maximal ``[.!?]+`` runs,
    floored at one per document — headline-style fragments still form
    one sentence), and syllables approximated as vowel-letter runs
    (``[aeiouy]+`` — the standard cheap estimator; consistent across
    engines because both count the identical regex matches).

    ``flesch_milli = round(10³·(206.835 − 1.015·W/S − 84.6·Y/W))`` is
    ONE fixed double tree over the exact per-group integer sums —
    engine-identical by the module's rounding discipline. Score bands
    read as usual (≥ 60 plain, ≤ 30 academic); a template/gibberish
    source drifts to the extremes, which is the curation signal.

    Scale shape: every statistic is a row-local regexp/token count
    folded in ONE map-side-combined groupBy — the corpus is read once,
    never shuffled, |groups| rows out."""
    words = F.size(TX.tokens(text_col))
    sents = F.greatest(
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        F.lit(1))
    syll = F.size(F.expr(
        f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)"))
    agg = (docs.groupBy(F.col(by).alias("g"))
           .agg(F.count("*").cast("long").alias("n_docs"),
                F.sum(words).cast("long").alias("n_words"),
                F.sum(sents).cast("long").alias("n_sentences"),
                F.sum(syll).cast("long").alias("n_syllables")))
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    score = F.round(F.lit(1e3) * (F.lit(206.835)
                                  - F.lit(1.015) * w / s
                                  - F.lit(84.6) * y / w)).cast("long")
    return (agg.select(F.col("g").alias(by), "n_docs", "n_words",
                       "n_sentences", "n_syllables",
                       F.when(F.col("n_words") > 0, score)
                       .cast("long").alias("flesch_milli"))
            .orderBy(by))


def readability_sql(table: str = "documents", by: str = "source",
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`readability_report` — identical counts
    and double tree."""
    toks = TX.token_count_sql(text_col)
    return f"""
WITH agg AS (
  SELECT {by} AS g, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum({toks}) AS BIGINT) AS n_words,
         CAST(sum(greatest(
           len(regexp_extract_all({text_col}, '[.!?]+')), 1))
           AS BIGINT) AS n_sentences,
         CAST(sum(len(regexp_extract_all(lower({text_col}),
                                         '[aeiouy]+')))
           AS BIGINT) AS n_syllables
  FROM {table} GROUP BY {by})
SELECT g AS {by}, n_docs, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         CAST(round(1e3 * (206.835
           - 1.015 * CAST(n_words AS DOUBLE)
             / CAST(n_sentences AS DOUBLE)
           - 84.6 * CAST(n_syllables AS DOUBLE)
             / CAST(n_words AS DOUBLE))) AS BIGINT)
       END AS flesch_milli
FROM agg ORDER BY {by}
"""
