"""Exact duplicated-substring dedup — the Lee et al. 2022 ExactSubstr
modality (``Deduplicating Training Data Makes Language Models Better``):
find every L-token window whose exact token sequence occurs at 2+
positions across the corpus, keep the FIRST occurrence (min (doc, pos)
— the house keeper discipline), and rewrite the later occurrences out
of their documents with exact token accounting.

The paper's tool builds a suffix array; a distributed suffix array is
out of scope and unnecessary for fixed-L window semantics. Instead the
engine uses the Karp–Miller–Rosenberg fingerprint-doubling ladder,
Spark-first:

- **Fingerprints are built per row, in codegen, with ZERO shuffle**:
  level 0 hashes each token (codegen ``xxhash64``; the DuckDB twin
  uses its own md5 ladder — see the cross-engine note below), level k
  combines ``h[i]`` with ``h[i + 2^(k-1)]`` via one ``zip_with`` over
  the array and a shifted ``slice`` of itself — O(n·log L) work per
  document, all inside whole-stage codegen, no explode until the final
  level. A non-power-of-two L takes one extra overlapped combine at
  offset ``L − 2^k`` (the standard KMR trick: the (prefix, suffix)
  window pair determines the L-window, so fingerprint equality still
  implies substring equality up to md5 collisions).
- **One hash shuffle finds the duplicates**: explode (pos, fp), count
  per fingerprint with map-side partial aggregation, keep fingerprints
  with count ≥ 2 and their min-(doc,pos) keeper.
- **Removal ranges are duplicate-scale, not corpus-scale**: only
  non-keeper occurrences become [pos, pos+L) ranges; the classic
  gaps-and-islands window merge runs per doc over that small set.
- The rewrite joins the per-doc merged spans (doc-scale, broadcastable)
  back onto the corpus and filters tokens by index — one more codegen
  array op.

NULL propagation does the boundary work: a position with no full
window gets a NULL partner in ``zip_with`` (or an out-of-range list
index in the DuckDB twin), the ``concat``/``||`` combine yields NULL,
and the explode filter drops it — identical in both engines.

Cross-engine semantics (r12): the Spark ladder hashes with codegen
``xxhash64`` (token level and the two-long combine) while the DuckDB
twin (:func:`exact_substring_report_sql`) keeps the md5-prefix ladder —
the fingerprints are INTERNAL (no registered surface exposes an fp
value; every output is counts/spans/token accounting), so the engines
agree whenever both hash families are injective on the corpus's window
vocabulary (collision-conditional, the ``dedup.hashed_shingles``
argument; both forms already relied on their own collision-freeness).
The swap removes one MessageDigest + hex-``conv`` + decimal-string
concat per token PER LADDER LEVEL — the dominant per-task cost of the
whole family (guide §4.1: prefer codegen built-ins).

Reference scope note: the reference pipeline has no dedup surface;
this is the LLM-pipeline extension family (the one dedup modality the
engine lacked — exact substring, alongside exact-hash, MinHash/LSH,
SimHash, CDC and semantic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql

_BIG = 1 << 30  # slice length bound (arrays are document-sized)


def _combine(a: Column, b: Column) -> Column:
    # xxhash64 over the two child fingerprints — pure codegen long
    # hashing, no string materialization. xxhash64 SKIPS null inputs
    # (hashing the seed alone) instead of propagating them, so the
    # boundary NULL (a position with no full window gets a NULL partner
    # from zip_with) is restored explicitly: the half-window must yield
    # NULL, exactly like the old NULL-propagating F.concat form.
    return F.when(a.isNull() | b.isNull(),
                  F.lit(None).cast("long")) \
        .otherwise(F.xxhash64(a, b))


def _combine_sql(a: str, b: str) -> str:
    return md5_long_sql(f"CAST({a} AS VARCHAR) || ':' || "
                        f"CAST({b} AS VARCHAR)")


def _ladder_widths(window: int) -> list[int]:
    """The doubling offsets: combine at offset 2^k while 2·2^k ≤ L,
    then one overlapped combine at L − 2^k if L is not a power of 2.
    Returns the offset sequence (each step's shift amount)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    widths, w = [], 1
    while 2 * w <= window:
        widths.append(w)
        w *= 2
    if w < window:
        widths.append(window - w)
    return widths


def window_fingerprints(docs: DataFrame, window: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(doc_id, pos, fp): one 64-bit fingerprint per 0-based start
    position that has a full ``window``-token window — fingerprint
    equality ⇔ exact token-sequence equality (mod md5 collisions).
    The ladder is pure array codegen; the only shuffle-bound output is
    the exploded (pos, fp) stream, which feeds straight into partial
    aggregation downstream."""
    toks = TX.tokens(F.col(text_col))
    # one PROJECTION per ladder level, not one nested expression:
    # zip_with references its input twice, higher-order functions are
    # interpreted (no codegen subexpression elimination), so a single
    # nested Column would re-evaluate level k-1 twice per level k —
    # 2^levels work. As successive withColumns each level is a bound
    # attribute computed once (CollapseProject keeps projects split
    # when a non-cheap alias is referenced more than once).
    lvl = docs.select(F.col(id_col).alias("doc_id"),
                      F.transform(toks, lambda t: F.xxhash64(t))
                      .alias("_h"))
    for off in _ladder_widths(window):
        lvl = lvl.withColumn(
            "_h", F.zip_with(F.col("_h"),
                             F.slice(F.col("_h"), off + 1, _BIG),
                             lambda a, b: _combine(a, b)))
    # posexplode_OUTER: the plain posexplode makes
    # InferFiltersFromGenerate add a size(_h) > 0 filter that predicate
    # pushdown re-inlines below every ladder projection — evaluating
    # the whole exponentially-nested ladder a second time per document.
    # The outer variant infers no filter; the fp null-check (needed
    # anyway for boundary positions) also drops the empty-array row.
    return (lvl.select("doc_id",
                       F.posexplode_outer("_h").alias("pos", "fp"))
            .filter(F.col("fp").isNotNull()))


def fingerprint_counts(docs: DataFrame, window: int,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(fp, n_occurrences, keeper): the per-fingerprint occurrence
    count plus the global first occurrence (min (doc, pos) struct) —
    the dedup decision's SUFFICIENT STATISTIC. Every aggregate is
    mergeable, so a Structured Streaming aggregation maintains this
    table incrementally (``streaming.corpus_stream.
    stream_fingerprint_counts``) and :func:`duplicate_spans_from_
    counts` folds the spans off the sink without re-counting the lake.
    State is fingerprint-scale (≈ token-scale) — the heaviest state
    table in the streaming family; document retention accordingly."""
    return (window_fingerprints(docs, window, id_col, text_col)
            .groupBy("fp")
            .agg(F.count("*").alias("n_occurrences"),
                 F.min(F.struct("doc_id", "pos")).alias("keeper")))


def _counted_occurrences(docs: DataFrame, window: int,
                         id_col: str, text_col: str) -> DataFrame:
    """occ2: (doc_id, pos, fp, _c, _keep) — per-fingerprint count and
    global-first keeper as WINDOW functions, not a groupBy + join
    back: the join form is a self-join on occ that recomputes the
    whole fingerprint ladder once per branch — the window is ONE
    shuffle on fp with the corpus scanned once (the margin_alignment
    min_by lesson; same shape as the DuckDB twin). The ONE definition
    shared by the report and calibration paths."""
    from pyspark.sql import Window
    occ = window_fingerprints(docs, window, id_col, text_col)
    w_fp = Window.partitionBy("fp")
    return (occ.withColumn("_c", F.count("*").over(w_fp))
            .withColumn("_keep",
                        F.min(F.struct("doc_id", "pos")).over(w_fp)))


def _removal_ranges(occ2: DataFrame, window: int) -> DataFrame:
    """Every occurrence of a 2+-count window EXCEPT the global first
    contributes [pos, pos+L) — the shared range rule."""
    return (occ2.filter((F.col("_c") >= 2)
                        & ((F.col("doc_id") != F.col("_keep.doc_id"))
                           | (F.col("pos") != F.col("_keep.pos"))))
            .select("doc_id", F.col("pos").alias("_s"),
                    (F.col("pos") + window).alias("_e")))


def duplicate_spans(docs: DataFrame, window: int,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Merged removal spans (doc_id, span_start, span_end, 0-based
    half-open): the shared count+keeper window and range rule, then
    adjacent/overlapping ranges merge (gaps-and-islands window,
    running on the duplicate-scale range set only)."""
    occ2 = _counted_occurrences(docs, window, id_col, text_col)
    return _merge_ranges(_removal_ranges(occ2, window))


def duplicate_spans_from_counts(docs: DataFrame, counts: DataFrame,
                                window: int, id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """:func:`duplicate_spans` against a PREBUILT fingerprint-count
    table (``counts`` must yield (fp, n_occurrences, keeper)) — the
    streaming fold: the stream maintains the count table, this pass
    re-fingerprints only the CURRENT corpus (one codegen ladder, no
    count shuffle) and joins the duplicate fingerprints. Equals the
    one-pass batch form over the same rows (test-pinned)."""
    occ = window_fingerprints(docs, window, id_col, text_col)
    dup = (counts.filter(F.col("n_occurrences") >= 2)
           .select("fp", F.col("keeper").alias("_keep")))
    rng = (occ.join(dup, "fp")
           .filter((F.col("doc_id") != F.col("_keep.doc_id"))
                   | (F.col("pos") != F.col("_keep.pos")))
           .select("doc_id", F.col("pos").alias("_s"),
                   (F.col("pos") + window).alias("_e")))
    return _merge_ranges(rng)


def _merge_ranges(rng: DataFrame,
                  keys: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Gaps-and-islands merge of (*keys, _s, _e) half-open ranges —
    per document by default; the calibration path merges per
    (doc, window) in one pass."""
    from pyspark.sql import Window
    w_prev = (Window.partitionBy(*keys).orderBy("_s", "_e")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.partitionBy(*keys).orderBy("_s", "_e")
             .rowsBetween(Window.unboundedPreceding, 0))
    isl = (rng.withColumn(
        "_new", (F.col("_s") > F.coalesce(F.max("_e").over(w_prev),
                                          F.lit(-1))).cast("int"))
        .withColumn("_g", F.sum("_new").over(w_cum)))
    return (isl.groupBy(*keys, "_g")
            .agg(F.min("_s").alias("span_start"),
                 F.max("_e").alias("span_end"))
            .drop("_g"))


def rewrite_without_duplicate_substrings(
        docs: DataFrame, window: int, id_col: str = "doc_id",
        text_col: str = "text") -> DataFrame:
    """The corpus with later copies of duplicated windows rewritten
    out: adds ``clean_text`` (tokens outside every removal span,
    space-joined), ``removed_tokens`` (== Σ merged span lengths — the
    byte-accounting invariant, test-pinned) and ``n_spans``. Documents
    with nothing to remove pass through with removed_tokens = 0."""
    spans = duplicate_spans(docs, window, id_col, text_col)
    # _rw_doc_id: spans derive from docs, so the join key must carry a
    # distinct name or the self-join reference is ambiguous
    per_doc = (spans.groupBy(F.col("doc_id").alias("_rw_doc_id"))
               .agg(F.sort_array(F.collect_list(
                   F.struct("span_start", "span_end"))).alias("_spans"),
                   F.sum(F.col("span_end") - F.col("span_start"))
                   .cast("long").alias("removed_tokens"),
                   F.count("*").cast("long").alias("n_spans")))
    toks = TX.tokens(F.col(text_col))
    kept = F.filter(
        toks, lambda t, i: ~F.exists(
            F.col("_spans"), lambda s: (i >= s["span_start"])
            & (i < s["span_end"])))
    return (docs.join(per_doc,
                      F.col(id_col) == F.col("_rw_doc_id"), "left")
            .drop("_rw_doc_id")
            .withColumn("_spans", F.coalesce(
                F.col("_spans"), F.array().cast(
                    "array<struct<span_start:int,span_end:int>>")))
            .withColumn("clean_text", F.array_join(kept, " "))
            .withColumn("removed_tokens",
                        F.coalesce("removed_tokens", F.lit(0)))
            .withColumn("n_spans", F.coalesce("n_spans", F.lit(0)))
            .drop("_spans"))


def exact_substring_accounting(docs: DataFrame, window: int,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> DataFrame:
    """Per-document removal accounting for docs that lost tokens:
    (doc_id, n_tokens, removed_tokens, n_spans), ordered — the registry
    / oracle surface of the modality."""
    rw = rewrite_without_duplicate_substrings(docs, window, id_col,
                                              text_col)
    return (rw.filter(F.col("removed_tokens") > 0)
            .select(F.col(id_col).alias("doc_id"),
                    TX.token_count(text_col).alias("n_tokens"),
                    "removed_tokens", "n_spans")
            .orderBy("doc_id"))


def _ladder_ctes(window: int, table: str, id_col: str,
                 text_col: str, prefix: str = "fp") -> tuple[str, str]:
    """The DuckDB ladder: one CTE per doubling level; ``h[i+off]``
    reads NULL past the end, so the combine NULL-propagates exactly
    like the Spark ``zip_with``/``slice`` form. ``prefix`` namespaces
    the CTEs so two ladders (e.g. corpus + benchmark) coexist in one
    query."""
    lvl0 = (f"SELECT {id_col} AS doc_id, "
            f"list_transform({TX.tokens_sql(text_col)}, "
            f"t -> {md5_long_sql('t')}) AS h FROM {table}")
    ctes = [f"{prefix}0 AS ({lvl0})"]
    for n, off in enumerate(_ladder_widths(window), start=1):
        comb = _combine_sql("h[i]", f"h[i + {off}]")
        ctes.append(
            f"{prefix}{n} AS (SELECT doc_id, "
            f"list_transform(range(1, len(h) + 1), i -> {comb}) AS h "
            f"FROM {prefix}{n - 1})")
    return ",\n".join(ctes), f"{prefix}{len(ctes) - 1}"


def _span_ctes(window: int, last: str) -> str:
    """occ → occ2 (count + keeper-rank) → rng → islands → merged spans:
    the ONE definition of the removal-span CTE chain, shared by the
    report and calibration twins (row_number over (doc, pos) ≡ the
    Spark min-struct keeper)."""
    return f"""occ AS (
  SELECT doc_id, generate_subscripts(h, 1) - 1 AS pos, unnest(h) AS fp
  FROM {last}),
occ2 AS (
  SELECT doc_id, pos,
         count(*) OVER (PARTITION BY fp) AS c,
         row_number() OVER (PARTITION BY fp
                            ORDER BY doc_id, pos) AS rn
  FROM occ WHERE fp IS NOT NULL),
rng AS (SELECT doc_id, pos AS s, pos + {window} AS e
        FROM occ2 WHERE c >= 2 AND rn > 1),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nw
  FROM rng),
isl2 AS (
  SELECT doc_id, s, e, sum(nw) OVER (
      PARTITION BY doc_id ORDER BY s, e
      ROWS UNBOUNDED PRECEDING) AS g
  FROM isl),
spans AS (
  SELECT doc_id, min(s) AS span_start, max(e) AS span_end
  FROM isl2 GROUP BY doc_id, g)"""


def exact_substring_report_sql(table: str, window: int,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    """DuckDB twin of :func:`exact_substring_accounting` — identical
    ladder fingerprints, the shared removal-span CTE chain, island
    merge and accounting."""
    ctes, last = _ladder_ctes(window, table, id_col, text_col)
    return f"""
WITH {ctes},
{_span_ctes(window, last)},
acct AS (
  SELECT doc_id,
         CAST(sum(span_end - span_start) AS BIGINT) AS removed_tokens,
         CAST(count(*) AS BIGINT) AS n_spans
  FROM spans GROUP BY doc_id)
SELECT t.{id_col} AS doc_id,
       {TX.token_count_sql(text_col)} AS n_tokens,
       a.removed_tokens, a.n_spans
FROM {table} t JOIN acct a ON a.doc_id = t.{id_col}
ORDER BY doc_id
"""


def multi_window_fingerprints(docs: DataFrame, windows: tuple[int, ...],
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """(doc_id, pos, fp_<w1>, …, fp_<wm>): every candidate window's
    fingerprint stream from ONE ladder pass over the corpus. The KMR
    doubling chain for the LARGEST window passes through every
    power-of-two level, so smaller power-of-two windows are harvested
    as intermediate columns for free; a non-power-of-two window costs
    exactly one extra overlapped ``zip_with`` branched off its floor
    power-of-two level. Each ``fp_<w>`` column, filtered non-NULL,
    equals :func:`window_fingerprints` at that L (test-pinned) — the
    corpus is tokenized and laddered ONCE instead of once per L."""
    ws = sorted(set(int(x) for x in windows))
    if not ws:
        raise ValueError("windows must be non-empty")
    if ws[0] < 1:
        raise ValueError("window must be >= 1")
    toks = TX.tokens(F.col(text_col))
    # one projection per level (the window_fingerprints double-eval
    # rule); _h<L> holds the level whose windows span L tokens
    lvl = docs.select(F.col(id_col).alias("doc_id"),
                      F.transform(toks, lambda t: F.xxhash64(t))
                      .alias("_h1"))
    cur = 1
    while 2 * cur <= ws[-1]:
        lvl = lvl.withColumn(
            f"_h{2 * cur}",
            F.zip_with(F.col(f"_h{cur}"),
                       F.slice(F.col(f"_h{cur}"), cur + 1, _BIG),
                       lambda a, b: _combine(a, b)))
        cur *= 2
    for w in ws:
        k = 1 << (w.bit_length() - 1)   # floor power of two
        if k != w:                      # one overlapped combine
            lvl = lvl.withColumn(
                f"_h{w}",
                F.zip_with(F.col(f"_h{k}"),
                           F.slice(F.col(f"_h{k}"), (w - k) + 1, _BIG),
                           lambda a, b: _combine(a, b)))
    zipped = F.arrays_zip(
        *[F.col(f"_h{w}").alias(f"fp_{w}") for w in ws])
    return (lvl.select("doc_id",
                       F.posexplode_outer(zipped).alias("pos", "_fps"))
            .select("doc_id", "pos",
                    *[F.col(f"_fps.fp_{w}").alias(f"fp_{w}")
                      for w in ws]))


def exact_substring_calibration(docs: DataFrame,
                                windows: tuple[int, ...] = (4, 8, 16),
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """Window-length adequacy report — the ``minhash_calibration``
    discipline applied to ExactSubstr: per candidate L, how many
    windows exist, how many are duplicated (occurrences in 2+-count
    groups), how many distinct duplicated sequences, and exactly how
    many tokens the rewrite would strip. Too-small L over-merges
    (stopword runs count as repeats); too-large L misses real
    boilerplate — this quantifies the trade on REAL data BEFORE a
    100 TB dedup commits to the parameter.

    Scale shape: ONE fingerprint ladder for all candidate Ls (the
    :func:`multi_window_fingerprints` harvest — power-of-two
    candidates are intermediate levels of the largest L's chain), its
    exploded stream checkpointed once and stacked into (w, fp) rows.
    ONE map-side-combined groupBy on (w, fp) builds every L's
    count/keeper table (fingerprint-scale out), the three headline
    stats fold from that table alone, and only the removal mass joins
    back — against the 2+-count subset, which AQE broadcasts when
    small; the span merge runs per (doc, w) in one window pass over
    the duplicate-scale range set. All-exact integers; |windows| rows
    out (candidate Ls longer than every document report exact
    zeros)."""
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ws = sorted(set(int(x) for x in windows))
    occ = checkpoint_df(
        multi_window_fingerprints(docs, tuple(ws), id_col, text_col))

    def stacked():
        return (occ.select(
            "doc_id", "pos",
            F.explode(F.array(*[
                F.struct(F.lit(w).cast("long").alias("w"),
                         F.col(f"fp_{w}").alias("fp")) for w in ws]))
            .alias("_wf"))
            .select("doc_id", "pos", F.col("_wf.w").alias("w"),
                    F.col("_wf.fp").alias("fp"))
            .filter(F.col("fp").isNotNull()))

    # the ONE corpus-scale shuffle carries only (w, fp, partial count)
    # — no keeper struct, no positions; its output is already filtered
    # to the duplicate fingerprints (dup-scale)
    dup = checkpoint_df(
        stacked().groupBy("w", "fp")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 2), eager=False)
    dupstats = (dup.groupBy("w")
                .agg(F.sum("_c").cast("long")
                     .alias("n_dup_occurrences"),
                     F.count("*").cast("long")
                     .alias("n_dup_sequences")))
    # n_windows needs no count table at all: a doc of n tokens has
    # exactly max(0, n - w + 1) full windows — one codegen scan
    tc = TX.token_count(F.col(text_col))
    nwin = (docs.select(F.explode(F.array(*[
        F.struct(F.lit(w).cast("long").alias("w"),
                 F.greatest(tc - F.lit(w) + 1, F.lit(0)).cast("long")
                 .alias("k")) for w in ws])).alias("_x"))
        .groupBy(F.col("_x.w").alias("w"))
        .agg(F.sum("_x.k").cast("long").alias("n_windows")))
    # keeper rank + ranges only over the duplicate OCCURRENCES (the
    # checkpointed occ re-read joins the dup-fp subset, which AQE
    # broadcasts when small); the span merge runs per (doc, w)
    dup_occ = stacked().join(dup.select("w", "fp"), ["w", "fp"])
    w_fp = Window.partitionBy("w", "fp")
    rng = (dup_occ.withColumn(
        "_keep", F.min(F.struct("doc_id", "pos")).over(w_fp))
        .filter((F.col("doc_id") != F.col("_keep.doc_id"))
                | (F.col("pos") != F.col("_keep.pos")))
        .select("doc_id", "w", F.col("pos").alias("_s"),
                (F.col("pos") + F.col("w")).alias("_e")))
    removed = (_merge_ranges(rng, keys=("doc_id", "w"))
               .groupBy("w")
               .agg(F.sum(F.col("span_end") - F.col("span_start"))
                    .cast("long").alias("removed_tokens")))
    # a literal windows frame guarantees one row per candidate even
    # when no document is long enough (exact zeros, not missing rows)
    wdf = docs.sparkSession.createDataFrame(
        [(w,) for w in ws], "window long")
    out = wdf
    for side in (nwin, dupstats, removed):
        out = out.join(side, out["window"] == side["w"], "left").drop("w")
    return (out.select("window",
                       F.coalesce("n_windows", F.lit(0))
                       .cast("long").alias("n_windows"),
                       F.coalesce("n_dup_occurrences", F.lit(0))
                       .cast("long").alias("n_dup_occurrences"),
                       F.coalesce("n_dup_sequences", F.lit(0))
                       .cast("long").alias("n_dup_sequences"),
                       F.coalesce("removed_tokens", F.lit(0))
                       .cast("long").alias("removed_tokens"))
            .orderBy("window"))


def exact_substring_calibration_sql(
        table: str, windows: tuple[int, ...] = (4, 8, 16),
        id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of :func:`exact_substring_calibration` — one ladder
    chain per candidate L, UNION ALL of the per-L stat rows."""
    arms = []
    for w in sorted(set(int(x) for x in windows)):
        ctes, last = _ladder_ctes(w, table, id_col, text_col)
        arms.append(f"""
SELECT * FROM (
WITH {ctes},
{_span_ctes(w, last)},
stats AS (
  SELECT CAST({w} AS BIGINT) AS "window",
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(coalesce(sum(CAST(c >= 2 AS BIGINT)), 0) AS BIGINT)
           AS n_dup_occurrences
  FROM occ2),
dupfp AS (
  SELECT CAST(count(DISTINCT fp) AS BIGINT) AS n_dup_sequences
  FROM (SELECT fp, count(*) AS c FROM occ WHERE fp IS NOT NULL
        GROUP BY fp) WHERE c >= 2),
rem AS (
  SELECT CAST(coalesce(sum(span_end - span_start), 0) AS BIGINT)
    AS removed_tokens FROM spans)
SELECT s."window", s.n_windows, s.n_dup_occurrences,
       d.n_dup_sequences, r.removed_tokens
FROM stats s CROSS JOIN dupfp d CROSS JOIN rem r)""")
    return " UNION ALL ".join(arms) + '\nORDER BY "window"'


def substring_contamination(docs: DataFrame, bench: DataFrame,
                            window: int, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Exact-substring eval contamination — the sharper sibling of the
    n-gram-overlap gate (``operators.contamination``): a training
    document is contaminated where an L-token window of it appears
    VERBATIM in the benchmark (the GPT-3/PaLM-style decontamination
    rule; n-gram Jaccard can miss a verbatim answer string embedded in
    an otherwise-different document). Returns, per contaminated doc:
    (doc_id, n_hit_positions, n_bench_docs) — how many of its window
    positions are benchmark text and how many distinct benchmark
    documents it touches; ordered.

    Scale shape: one fingerprint ladder per side, the join keys on the
    64-bit fp — the benchmark side is eval-scale and its distinct
    (fp, bench_id) table broadcasts, so the corpus never shuffles."""
    dfp = window_fingerprints(docs, window, id_col, text_col)
    bfp = (window_fingerprints(bench, window, id_col, text_col)
           .select(F.col("doc_id").alias("bench_id"), "fp").distinct())
    return (dfp.join(F.broadcast(bfp), "fp")
            .groupBy("doc_id")
            .agg(F.count_distinct("pos").cast("long")
                 .alias("n_hit_positions"),
                 F.count_distinct("bench_id").cast("long")
                 .alias("n_bench_docs"))
            .orderBy("doc_id"))


def substring_contamination_sql(docs_table: str, bench_table: str,
                                window: int, id_col: str = "doc_id",
                                text_col: str = "text") -> str:
    """DuckDB twin of :func:`substring_contamination` — both ladders
    replayed under namespaced CTE prefixes, same join + counts."""
    dctes, dlast = _ladder_ctes(window, docs_table, id_col, text_col,
                                prefix="dfp")
    bctes, blast = _ladder_ctes(window, bench_table, id_col, text_col,
                                prefix="bfp")
    return f"""
WITH {dctes},
{bctes},
docc AS (
  SELECT doc_id, generate_subscripts(h, 1) - 1 AS pos, unnest(h) AS fp
  FROM {dlast}),
bocc AS (
  SELECT DISTINCT bench_id, fp FROM (
    SELECT doc_id AS bench_id, unnest(h) AS fp FROM {blast})
  WHERE fp IS NOT NULL),
hits AS (
  SELECT d.doc_id, d.pos, b.bench_id
  FROM docc d JOIN bocc b USING (fp)
  WHERE d.fp IS NOT NULL AND b.fp IS NOT NULL)
SELECT doc_id,
       CAST(count(DISTINCT pos) AS BIGINT) AS n_hit_positions,
       CAST(count(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
FROM hits GROUP BY doc_id
ORDER BY doc_id
"""


# --- persisted decontamination index ------------------------------------------

def _write_contam_epoch(bench: DataFrame, path: str, window: int,
                        id_col: str, text_col: str, epoch_key: str,
                        base: bool) -> None:
    """One epoch's distinct (bench_id, fp) table + its ledger commit
    row (the ``index_ledger`` exactly-once discipline)."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        clear_dir, commit_ledger_row)
    if base:
        clear_dir(bench.sparkSession, f"{path}/fingerprints")
    fps = (window_fingerprints(bench, window, id_col, text_col)
           .select(F.col("doc_id").alias("bench_id"), "fp").distinct())
    (fps.write.mode("overwrite")
     .parquet(f"{path}/fingerprints/_epoch={epoch_key}"))
    commit_ledger_row(
        fps.agg(F.count("*").cast("long").alias("n_fingerprints")),
        path, epoch_key, base=base)


def write_contamination_index(bench: DataFrame, path: str, window: int,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> None:
    """Persist a benchmark's distinct (bench_id, fp) window-fingerprint
    table plus a 1-row meta (window) — the decontamination-as-a-service
    artifact: eval suites change rarely, corpus deltas arrive
    constantly, so the eval side is laddered ONCE and every delta probe
    pays only its own fingerprints. The table is eval-scale (it
    broadcasts at probe time); meta makes probes self-describing — a
    probe laddering the corpus at a different window would silently
    miss every hit otherwise. Layout follows the index-triad epoch
    discipline (``index_ledger``): the base build is epoch ``base``,
    :func:`append_to_contamination_index` adds eval-suite deltas."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        BASE_EPOCH)
    spark = bench.sparkSession
    (spark.createDataFrame([(window,)], "window int")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta"))
    _write_contam_epoch(bench, path, window, id_col, text_col,
                        BASE_EPOCH, base=True)


def append_to_contamination_index(new_bench: DataFrame, path: str,
                                  id_col: str = "doc_id",
                                  text_col: str = "text",
                                  epoch_key: str | None = None) -> bool:
    """Incremental eval-suite maintenance: a new benchmark's window
    fingerprints land in their own epoch directory, laddered at the
    INDEX'S OWN frozen window (the ``append_to_lsh_index`` frozen-
    params contract — appending at a different L would poison every
    probe). Probes see appended benchmarks immediately and equal a
    from-scratch rebuild over the union (test-pinned); per-epoch
    (bench_id, fp) rows are distinct within an epoch, and the probe's
    ``count_distinct`` aggregates make cross-epoch re-registration of
    the same benchmark harmless.

    Exactly-once per ``epoch_key`` (the ``index_ledger`` contract):
    a replayed key is a no-op (returns False); ``epoch_key=None``
    mints a fresh ``batch-N`` key."""
    from rgd_rnaseq_workflows_spark.operators.index_ledger import (
        ledger_keys, next_batch_key)
    spark = new_bench.sparkSession
    if epoch_key is None:
        epoch_key = next_batch_key(spark, path)
    elif epoch_key in ledger_keys(spark, path):
        return False
    [r] = spark.read.parquet(f"{path}/meta").collect()
    _write_contam_epoch(new_bench, path, int(r["window"]), id_col,
                        text_col, epoch_key, base=False)
    return True


def probe_contamination_index(spark, path: str, docs: DataFrame,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """Exact-substring contamination of ``docs`` against a persisted
    benchmark index: ladder the (delta) corpus at the INDEX'S window,
    broadcast-join the stored fingerprint table. Returns the
    ``substring_contamination`` report shape and equals it over the
    same benchmark (test-pinned)."""
    [r] = spark.read.parquet(f"{path}/meta").collect()
    dfp = window_fingerprints(docs, int(r["window"]), id_col, text_col)
    bfp = spark.read.parquet(f"{path}/fingerprints")
    return (dfp.join(F.broadcast(bfp), "fp")
            .groupBy("doc_id")
            .agg(F.count_distinct("pos").cast("long")
                 .alias("n_hit_positions"),
                 F.count_distinct("bench_id").cast("long")
                 .alias("n_bench_docs"))
            .orderBy("doc_id"))
