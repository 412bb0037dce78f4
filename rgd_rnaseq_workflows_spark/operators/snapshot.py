"""Corpus snapshot diffing — the dataset-versioning audit between two
releases of a training corpus (what changed between crawl v1 and v2,
which shards need re-tokenizing, did a "small metadata fix" silently
rewrite half the text).

Design: compare content FINGERPRINTS (md5 of the text), never the text
itself — the join moves 16 bytes per doc, not documents. The diff is a
single full-outer shuffle join on the document key; on a 100 TB lake
both snapshots would be bucketed by the key and the join runs
zero-exchange (tests/test_bucketing.py demonstrates the co-located
form). Fingerprints are md5, so any engine (and the DuckDB oracle)
reproduces them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document change labels between two corpus snapshots:
    ``added`` (only in new), ``removed`` (only in old), ``modified``
    (same id, different content hash), ``unchanged``. Returns
    (id, change) — aggregate downstream as needed."""
    fa = old.select(F.col(id_col).alias("id"),
                    F.md5(F.col(text_col)).alias("_fa"))
    fb = new.select(F.col(id_col).alias("id"),
                    F.md5(F.col(text_col)).alias("_fb"))
    j = fa.join(fb, "id", "full_outer")
    change = (F.when(F.col("_fa").isNull(), F.lit("added"))
              .when(F.col("_fb").isNull(), F.lit("removed"))
              .when(F.col("_fa") != F.col("_fb"), F.lit("modified"))
              .otherwise(F.lit("unchanged")))
    return j.select("id", change.alias("change"))


def snapshot_diff_report(old: DataFrame, new: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Aggregate diff: (change, n_docs)."""
    return (snapshot_diff(old, new, id_col, text_col)
            .groupBy("change").agg(F.count("*").alias("n_docs")))


def snapshot_diff_report_sql(old_src: str, new_src: str,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB twin (md5 is the portable fingerprint family)."""
    return f"""
WITH fa AS (SELECT {id_col} AS id, md5({text_col}) AS fa FROM {old_src}),
fb AS (SELECT {id_col} AS id, md5({text_col}) AS fb FROM {new_src}),
j AS (
  SELECT CASE WHEN fa.fa IS NULL THEN 'added'
              WHEN fb.fb IS NULL THEN 'removed'
              WHEN fa.fa <> fb.fb THEN 'modified'
              ELSE 'unchanged' END AS change
  FROM fa FULL OUTER JOIN fb ON fa.id = fb.id)
SELECT change, count(*) AS n_docs FROM j GROUP BY change
"""


def snapshot_apply(base: DataFrame, changes: DataFrame,
                   id_col: str = "doc_id",
                   op_col: str = "op") -> DataFrame:
    """MERGE INTO semantics without a table format: apply a changeset
    (``op`` ∈ upsert|delete, plus the full row payload for upserts) to a
    base snapshot and return the next snapshot.

    Pure DataFrame shape: one full-outer join on the key —
    change-side wins on conflict (upsert), delete drops, absent keys
    pass through. On a bucketed lake both sides co-locate and the merge
    runs zero-exchange; the row payload moves only for changed keys if
    the caller projects base down to (key, payload) columns it needs.

    ``changes`` must carry ``id_col``, ``op_col``, and the same payload
    columns as ``base`` (values ignored for deletes).
    """
    payload = [c for c in base.columns if c != id_col]
    missing = [c for c in payload + [id_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changeset missing columns: {missing}")
    # NULL ops must fail too: `~isin` is NULL (not true) for NULL, and
    # a NULL-op row would otherwise slip past and emit an all-NULL
    # payload via the keep predicate below.
    bad = changes.filter(F.col(op_col).isNull()
                         | ~F.col(op_col).isin("upsert", "delete")).limit(1)
    if bad.count():
        raise ValueError(f"unknown {op_col} value in changeset")
    b = base.select(F.col(id_col).alias("_id"),
                    *[F.col(c).alias(f"_b_{c}") for c in payload])
    c = changes.select(F.col(id_col).alias("_id"),
                       F.col(op_col).alias("_op"),
                       *[F.col(x).alias(f"_c_{x}") for x in payload])
    j = b.join(c, "_id", "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") == "upsert")
    picked = [F.when(F.col("_op") == "upsert", F.col(f"_c_{x}"))
              .otherwise(F.col(f"_b_{x}")).alias(x) for x in payload]
    return (j.filter(keep)
            .select(F.col("_id").alias(id_col), *picked))


def snapshot_apply_sql(base_src: str, changes_src: str,
                       payload: tuple[str, ...],
                       id_col: str = "doc_id", op_col: str = "op") -> str:
    """DuckDB twin of :func:`snapshot_apply`."""
    pick = ", ".join(
        f"CASE WHEN c.{op_col} = 'upsert' THEN c.{x} ELSE b.{x} END AS {x}"
        for x in payload)
    return f"""
SELECT coalesce(b.{id_col}, c.{id_col}) AS {id_col}, {pick}
FROM {base_src} b FULL OUTER JOIN {changes_src} c
  ON b.{id_col} = c.{id_col}
WHERE c.{op_col} IS NULL OR c.{op_col} = 'upsert'"""


# --- token-distribution drift -------------------------------------------------

def token_counts(df: DataFrame, text_col: str = "text",
                 count_col: str = "c") -> DataFrame:
    """Vocabulary-scale unigram counts (t, <count_col>) — the shared
    sufficient statistic of the drift family.  One token explode + one
    map-side-combined groupBy; under Structured Streaming the SAME
    expression tree maintains the count table incrementally
    (``streaming.corpus_stream.stream_token_counts``)."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    return (df.select(F.explode(TX.tokens(text_col)).alias("t"))
            .groupBy("t").agg(F.count("*").alias(count_col)))


def _join_counts(co: DataFrame, cn: DataFrame) -> DataFrame:
    """Full-outer join of two (t, count) vocabularies: (t, cp, cq) with
    absent-side counts as 0."""
    return (co.join(cn, "t", "full_outer")
            .select("t", F.coalesce("cp", F.lit(0)).alias("cp"),
                    F.coalesce("cq", F.lit(0)).alias("cq")))


def _vocab_join(old: DataFrame, new: DataFrame, text_col: str) -> DataFrame:
    """Joined token-count vocabularies of two SNAPSHOT frames. Lazily
    checkpointed — every consumer branches it twice (the 1-row totals
    agg + the main agg), and without the truncation both branches would
    re-run the corpus explodes; with it the corpora are tokenized ONCE."""
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    return checkpoint_df(
        _join_counts(token_counts(old, text_col, "cp"),
                     token_counts(new, text_col, "cq")),
        eager=False)


def token_drift_report(old: DataFrame, new: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """Distribution drift between two corpus snapshots: ONE row
    (n_terms_old, n_terms_new, n_shared, n_tokens_old, n_tokens_new,
    tv_distance) where ``tv_distance`` is the total-variation distance
    between the token unigram distributions,

        TV = ½ Σ_t |p_t − q_t| = Σ_t |cp_t·N2 − cq_t·N1| / (2·N1·N2).

    The monitoring gate for continuous ingestion: "did crawl v2's
    language mix / boilerplate profile shift under us". The numerator
    is an EXACT integer sum (order-independent, engine-portable — a
    KL/JS log sum's accumulation order no distributed engine pins down;
    the bigram-LM precedent), then ONE final division + round(·, 6).
    The count × total products run in DecimalType(38,0) / HUGEINT —
    int64 would silently wrap for ~3e9-token snapshots (counts ×
    totals > 2^63) under ANSI-off; decimal keeps ~1e19-token headroom
    with exactness on both engines.

    Scale shape: token explode → one map-side-combined groupBy per
    snapshot (vocabulary-scale outputs), a full-outer equi-join of two
    vocabulary tables, the 1-row totals broadcast back, one exact agg —
    the corpora themselves never join or reshuffle.
    """
    return _drift_agg(_vocab_join(old, new, text_col))


def drift_report_from_counts(co: DataFrame, cn: DataFrame) -> DataFrame:
    """:func:`token_drift_report` folded from two PRE-AGGREGATED
    vocabulary count tables — ``co`` = (t, cp), ``cn`` = (t, cq), e.g. a
    stored snapshot vocabulary and the live table a
    ``stream_token_counts`` query maintains.  Identical expression tree
    and results as the snapshot form (stream==batch test-pinned); the
    fold touches only vocabulary-scale rows, never the corpora."""
    return _drift_agg(_join_counts(co.select("t", F.col(co.columns[1])
                                             .alias("cp")),
                                   cn.select("t", F.col(cn.columns[1])
                                             .alias("cq"))))


def _drift_agg(j: DataFrame) -> DataFrame:
    """The drift family's shared final aggregation over a joined
    (t, cp, cq) vocabulary — see :func:`token_drift_report` for the
    arithmetic contract."""
    totals = j.agg(F.sum("cp").cast("long").alias("n1"),
                   F.sum("cq").cast("long").alias("n2"))
    jt = j.crossJoin(F.broadcast(totals))
    return (jt.agg(
        F.sum(F.when(F.col("cp") > 0, 1).otherwise(0)).cast("long")
        .alias("n_terms_old"),
        F.sum(F.when(F.col("cq") > 0, 1).otherwise(0)).cast("long")
        .alias("n_terms_new"),
        F.sum(F.when((F.col("cp") > 0) & (F.col("cq") > 0), 1)
              .otherwise(0)).cast("long").alias("n_shared"),
        F.first("n1").alias("n_tokens_old"),
        F.first("n2").alias("n_tokens_new"),
        F.sum(F.abs(F.col("cp").cast("decimal(38,0)") * F.col("n2")
                    - F.col("cq").cast("decimal(38,0)") * F.col("n1")))
        .alias("_num"))
        .select("n_terms_old", "n_terms_new", "n_shared",
                "n_tokens_old", "n_tokens_new",
                F.round(F.col("_num").cast("double")
                        / (2.0 * F.col("n_tokens_old")
                           * F.col("n_tokens_new")), 6)
                .alias("tv_distance")))


def top_drift_terms(old: DataFrame, new: DataFrame, k: int = 10,
                    text_col: str = "text") -> DataFrame:
    """The k terms moving the most probability mass between snapshots:
    (t, c_old, c_new, direction, shift6) ordered by exact integer drift
    |cp·N2 − cq·N1| desc (ties → term asc) — the ranking never touches
    a double (DecimalType products: int64 would wrap at ~3e9-token
    snapshots); ``shift6`` = the term's |p−q| rounded for reporting."""
    j = _vocab_join(old, new, text_col)
    totals = j.agg(F.sum("cp").cast("long").alias("n1"),
                   F.sum("cq").cast("long").alias("n2"))
    dec = "decimal(38,0)"
    jt = (j.crossJoin(F.broadcast(totals))
          .withColumn("_d", F.abs(F.col("cp").cast(dec) * F.col("n2")
                                  - F.col("cq").cast(dec) * F.col("n1"))))
    return (jt.orderBy(F.desc("_d"), "t").limit(k)
            .select(F.col("t").alias("term"),
                    F.col("cp").cast("long").alias("c_old"),
                    F.col("cq").cast("long").alias("c_new"),
                    F.when(F.col("cp").cast(dec) * F.col("n2")
                           >= F.col("cq").cast(dec) * F.col("n1"),
                           F.lit("down"))
                    .otherwise(F.lit("up")).alias("direction"),
                    F.round(F.col("_d").cast("double")
                            / (F.col("n1").cast("double")
                               * F.col("n2").cast("double")), 6)
                    .alias("shift6")))


def token_drift_sql(old_src: str, new_src: str,
                    text_col: str = "text") -> str:
    """DuckDB twin of :func:`token_drift_report` — identical exact
    integer arithmetic, one rounded division."""
    from rgd_rnaseq_workflows_spark.functions.text import tokens_sql
    toks = tokens_sql(text_col)
    return f"""
WITH co AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS cp
  FROM (SELECT unnest({toks}) AS t FROM {old_src}) GROUP BY t),
cn AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS cq
  FROM (SELECT unnest({toks}) AS t FROM {new_src}) GROUP BY t),
j AS MATERIALIZED (
  SELECT coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
  FROM co FULL OUTER JOIN cn USING (t)),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS n1,
               CAST(sum(cq) AS BIGINT) AS n2 FROM j)
SELECT CAST(sum(CASE WHEN cp > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_terms_old,
       CAST(sum(CASE WHEN cq > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_terms_new,
       CAST(sum(CASE WHEN cp > 0 AND cq > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared,
       CAST(any_value(n1) AS BIGINT) AS n_tokens_old,
       CAST(any_value(n2) AS BIGINT) AS n_tokens_new,
       round(CAST(sum(abs(CAST(cp AS HUGEINT) * n2
                          - CAST(cq AS HUGEINT) * n1)) AS DOUBLE)
             / (2.0 * any_value(n1) * any_value(n2)), 6) AS tv_distance
FROM j CROSS JOIN tot
"""


def top_drift_terms_sql(old_src: str, new_src: str, k: int = 10,
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`top_drift_terms` (exact integer ranking)."""
    from rgd_rnaseq_workflows_spark.functions.text import tokens_sql
    toks = tokens_sql(text_col)
    return f"""
WITH co AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS cp
  FROM (SELECT unnest({toks}) AS t FROM {old_src}) GROUP BY t),
cn AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS cq
  FROM (SELECT unnest({toks}) AS t FROM {new_src}) GROUP BY t),
j AS MATERIALIZED (
  SELECT t, coalesce(cp, 0) AS cp, coalesce(cq, 0) AS cq
  FROM co FULL OUTER JOIN cn USING (t)),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS n1,
               CAST(sum(cq) AS BIGINT) AS n2 FROM j)
SELECT t AS term, cp AS c_old, cq AS c_new,
       CASE WHEN CAST(cp AS HUGEINT) * n2 >= CAST(cq AS HUGEINT) * n1
            THEN 'down' ELSE 'up' END AS direction,
       round(CAST(abs(CAST(cp AS HUGEINT) * n2
                      - CAST(cq AS HUGEINT) * n1) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS shift6
FROM j CROSS JOIN tot
ORDER BY abs(CAST(cp AS HUGEINT) * n2 - CAST(cq AS HUGEINT) * n1) DESC, t
LIMIT {k}
"""


def oov_rate_report(docs: DataFrame, ref: DataFrame,
                    by: str | None = None,
                    text_col: str = "text") -> DataFrame:
    """Out-of-vocabulary drift gate: the fraction of ``docs``' token
    positions whose token never occurs in the ``ref`` snapshot —
    grouped by ``by`` (e.g. lang/source) or global. The cheap early
    warning in the drift family: a single stream-safe aggregation
    (unlike :func:`token_drift_report`'s two-phase TV), so the SAME
    expression tree runs incrementally under Structured Streaming
    (``streaming.corpus_stream.stream_oov_rate``).

    Shape: token explode → LEFT join the reference vocabulary
    (vocabulary-scale — broadcast when small, stream-static and
    stateless in streaming) → one exact-integer agg;
    ``oov_rate6 = n_oov/n_tokens`` is a single rounded division."""
    return oov_gate_agg(oov_tokens(docs, ref, by, text_col), by)


def oov_tokens(docs: DataFrame, ref: DataFrame, by: str | None = None,
               text_col: str = "text") -> DataFrame:
    """Per-token-position OOV indicator rows — the shared kernel both
    modes aggregate (one definition, both modes)."""
    from rgd_rnaseq_workflows_spark.functions import text as TX
    vocab = (ref.select(F.explode(TX.tokens(text_col)).alias("t"))
             .distinct().withColumn("_known", F.lit(1)))
    cols = ([F.col(by)] if by else []) + [
        F.explode(TX.tokens(text_col)).alias("t")]
    # broadcast the DISTINCT vocabulary (tens of MB for real corpora —
    # the contamination_report discipline): without the hint a cluster
    # plans SortMergeJoin and shuffle-writes every probe token position,
    # contradicting "vocabulary joins, corpora never do"
    return (docs.select(*cols)
            .join(F.broadcast(vocab), "t", "left")
            .select(*([by] if by else []),
                    F.when(F.col("_known").isNull(), 1).otherwise(0)
                    .alias("_oov")))


def oov_gate_agg(toks: DataFrame, by: str | None = None) -> DataFrame:
    """The single aggregation over :func:`oov_tokens` output.

    Global mode on an EMPTY probe still emits one row —
    (n_tokens=0, n_oov=0, oov_rate6=NULL): callers gating on the rate
    must also alert on ``n_tokens = 0`` (an empty snapshot means
    ingestion broke, which no rate threshold can express)."""
    g = toks.groupBy(by) if by else toks.groupBy()
    return (g.agg(F.count("*").alias("n_tokens"),
                  F.coalesce(F.sum("_oov"), F.lit(0)).cast("long")
                  .alias("n_oov"))
            .select(*([by] if by else []),
                    "n_tokens", "n_oov",
                    F.round(F.col("n_oov").cast("double")
                            / F.col("n_tokens"), 6).alias("oov_rate6")))


def oov_rate_sql(probe_src: str, ref_src: str, by: str | None = None,
                 text_col: str = "text") -> str:
    """DuckDB twin of :func:`oov_rate_report`."""
    from rgd_rnaseq_workflows_spark.functions.text import tokens_sql
    toks = tokens_sql(text_col)
    bycols = f"{by}, " if by else ""
    bygrp = f"GROUP BY {by}" if by else ""
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT DISTINCT t FROM
    (SELECT unnest({toks}) AS t FROM {ref_src})),
probe AS MATERIALIZED (
  SELECT {bycols}unnest({toks}) AS t FROM {probe_src})
SELECT {bycols}CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(coalesce(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_oov,
       round(CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS oov_rate6
FROM probe p LEFT JOIN vocab v USING (t)
{bygrp}
"""


def ks_drift_report(old: DataFrame, new: DataFrame, value,
                    value_alias: str = "v") -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift test between two
    corpus snapshots over an integer statistic (token count, char
    length, quality score) — the distribution-shift gate a crawl
    refresh runs before mixing a new snapshot into training data: TV
    drift (``token_drift_report``) sees vocabulary moves, this sees
    SHAPE moves (a new boilerplate stripper shifting every document 40
    tokens shorter changes no vocabulary mass ranking but jumps the KS
    statistic immediately).

    Exactness (the engine's no-float-ordering discipline): the KS
    statistic is reported as the exact integer numerator
    ``ks_num = max_v |F_old(v)·n_new − F_new(v)·n_old|`` (cumulative
    counts cross-multiplied — never a float CDF), its ppm form
    ``ks_num·10⁶ div (n_old·n_new)`` in decimal(38,0) (the count
    product overflows BIGINT past ~3e9 docs/side), and the smallest
    value attaining the maximum. Both engines produce identical rows
    by construction.

    Scale shape: each snapshot folds map-side into a (value, count)
    histogram — the only corpus-scale work; the full-outer histogram
    join, cumulative windows and the max fold all ride DOMAIN-scale
    rows (distinct values of a bounded integer statistic — the
    ``quality_length_outliers`` exact-histogram precedent), so the
    partition-less cumulative window is a documented domain-scale
    frame, never a corpus sort."""
    v = value if not isinstance(value, str) else F.expr(value)
    # NULL contract (the quantile_norm pin): rows whose statistic is
    # NULL carry no CDF position and are EXCLUDED on both engines —
    # without the filter the NULL histogram keys don't equi-match in
    # the full-outer join and the cumulative windows order them at
    # OPPOSITE ends (Spark NULLS FIRST, DuckDB NULLS LAST), silently
    # skewing ks_num
    ho = (old.select(v.cast("long").alias(value_alias))
          .filter(F.col(value_alias).isNotNull())
          .groupBy(value_alias).agg(F.count("*").alias("_co")))
    hn = (new.select(v.cast("long").alias(value_alias))
          .filter(F.col(value_alias).isNotNull())
          .groupBy(value_alias).agg(F.count("*").alias("_cn")))
    return ks_drift_from_histograms(ho, hn, value_alias)


def ks_drift_from_histograms(ho: DataFrame, hn: DataFrame,
                             value_alias: str = "v") -> DataFrame:
    """The KS fold over two (value, count) histograms — factored out
    because the histogram is the MERGEABLE sufficient statistic: a
    Structured Streaming aggregation maintains each side's histogram
    incrementally (the ``stream_token_counts`` /
    ``stream_correlation_moments`` pattern) and this fold prices the
    drift gate on demand from the sink, domain-scale only."""
    from pyspark.sql import Window
    j = (ho.join(hn, value_alias, "full_outer")
         .select(value_alias,
                 F.coalesce("_co", F.lit(0)).alias("_co"),
                 F.coalesce("_cn", F.lit(0)).alias("_cn")))
    w = Window.orderBy(value_alias).rowsBetween(
        Window.unboundedPreceding, 0)
    dec = "decimal(38,0)"
    cum = (j.withColumn("_fo", F.sum("_co").over(w))
           .withColumn("_fn", F.sum("_cn").over(w)))
    tot = j.agg(F.sum("_co").cast("long").alias("n_old"),
                F.sum("_cn").cast("long").alias("n_new"))
    d = (cum.crossJoin(F.broadcast(tot))
         .withColumn("_d", F.expr(
             f"abs(CAST(_fo AS {dec}) * n_new "
             f"- CAST(_fn AS {dec}) * n_old)")))
    # max + argmax in ONE aggregation: the lexicographic struct max
    # picks the largest _d and, among ties, the largest -v = smallest
    # v — no self-join against a max frame, the diff lineage is
    # consumed once (values are longs; -v is total for any real
    # statistic domain)
    return (d.agg(F.max("n_old").alias("n_old"),
                  F.max("n_new").alias("n_new"),
                  F.max(F.struct(F.col("_d").alias("d"),
                                 (-F.col(value_alias)).alias("nv")))
                  .alias("_m"))
            .select("n_old", "n_new",
                    # exact integer, reported as STRING: it exceeds
                    # BIGINT past ~3e9 docs/side and pandas maps wide
                    # decimals to float — digits are engine-identical
                    F.col("_m.d").cast(dec).cast("string")
                    .alias("ks_num"),
                    F.expr(f"CAST(_m.d * 1000000 "
                           f"div (CAST(n_old AS {dec}) * n_new) "
                           f"AS BIGINT)").alias("ks_ppm"),
                    (-F.col("_m.nv")).cast("long").alias("at_value")))


def ks_drift_sql(old_src: str, new_src: str, value_expr: str) -> str:
    """DuckDB twin of :func:`ks_drift_report`."""
    return f"""
WITH ho AS (SELECT CAST({value_expr} AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS co
            FROM ({old_src}) WHERE {value_expr} IS NOT NULL GROUP BY 1),
hn AS (SELECT CAST({value_expr} AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS cn
       FROM ({new_src}) WHERE {value_expr} IS NOT NULL GROUP BY 1),
j AS (SELECT coalesce(ho.v, hn.v) AS v,
             coalesce(co, 0) AS co, coalesce(cn, 0) AS cn
      FROM ho FULL OUTER JOIN hn ON ho.v = hn.v),
tot AS (SELECT CAST(sum(co) AS BIGINT) AS n_old,
               CAST(sum(cn) AS BIGINT) AS n_new FROM j),
cum AS (SELECT v,
               sum(co) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fo,
               sum(cn) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fn
        FROM j),
d AS (SELECT v, abs(CAST(fo AS HUGEINT) * n_new
                    - CAST(fn AS HUGEINT) * n_old) AS dd
      FROM cum, tot),
mx AS (SELECT max(dd) AS mxd FROM d)
SELECT n_old, n_new,
       CAST(CAST(mxd AS DECIMAL(38,0)) AS VARCHAR) AS ks_num,
       CAST(mxd * 1000000 // (CAST(n_old AS HUGEINT) * n_new)
            AS BIGINT) AS ks_ppm,
       CAST((SELECT min(v) FROM d WHERE dd = (SELECT mxd FROM mx))
            AS BIGINT) AS at_value
FROM tot, mx
"""
