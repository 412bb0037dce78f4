"""Incremental corpus curation over a document stream.

The streaming twin of ``plans.corpus.curate_corpus``'s first three stages:
quality gate and language-consistency filter are STATELESS (the identical
codegen expressions run on the stream), exact dedup is the stateful
first-seen kernel (``stateful.stream_dedup``) with the document payload
carried through.

The near-dup stage (pair join + connected components) is deliberately NOT
streaming: set-similarity joins and iterative label propagation need the
full candidate neighborhood, so production runs them as a periodic batch
compaction over the streamed-in curated set (the classic hot/cold split);
``plans.corpus.curate_corpus`` is that compaction.

Decontamination and mix sampling ARE streaming-safe: the benchmark
shingle set joins as a broadcast static frame (stream-static joins are
stateless) and the stratified hash gate is a pure filter — so the full
training-mix pipeline short of near-dup compaction runs incrementally
(``stream_training_mix``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions import text as TX
from rgd_rnaseq_workflows_spark.streaming.stateful import stream_dedup


def quality_lang_gate(docs: DataFrame, min_tokens: int = 20) -> DataFrame:
    """The stateless curation stages — one definition, both modes."""
    return (docs.withColumn("n_tokens", TX.token_count("text"))
            .withColumn("_lang_pred", TX.lang_id("text"))
            .filter((F.col("n_tokens") >= min_tokens)
                    & (F.col("_lang_pred") == F.col("lang")))
            .drop("_lang_pred"))


def stream_curate(doc_stream: DataFrame, min_tokens: int = 20,
                  ts_col: str | None = None,
                  ttl: str = "30 minutes") -> DataFrame:
    """Streaming curation: quality + language gates, then stateful exact
    dedup emitting each content fingerprint's first qualifying document
    (payload columns carried through; state = one long per fingerprint,
    event-time bounded when ``ts_col`` is given)."""
    kept = quality_lang_gate(doc_stream, min_tokens)
    return stream_dedup(kept, ts_col=ts_col, ttl=ttl,
                        carry_cols=("lang", "source", "text", "n_tokens"))


def contamination_gate(bench_shingles: frozenset[str], contam_n: int = 4,
                       min_shared: int = 1, text_col: str = "text"):
    """A STATELESS per-row contamination predicate for streams.

    The batch operator (``operators.contamination``) counts overlap via
    explode → broadcast join → per-doc aggregation; a streaming
    aggregation after the stateful dedup kernel is unsupported
    (Structured Streaming forbids chaining aggregates behind
    applyInPandasWithState), so the streaming form trades the join for a
    per-row set probe: shingles still come from the IDENTICAL JVM-side
    regex expression (no semantic fork), and a vectorized pandas UDF
    intersects each doc's shingle array with the benchmark set captured
    in its closure. Eval benchmarks are bounded (MBs of shingles — the
    same boundedness the batch broadcast relies on), so shipping the set
    to Python workers once per executor is the LSH-plane-literal pattern,
    not a scale risk. Returns a Column predicate: True = keep (clean).
    """
    from pyspark.sql.functions import pandas_udf

    from rgd_rnaseq_workflows_spark.functions.text import shingles

    @pandas_udf("long")
    def _n_shared(sh: pd.Series) -> pd.Series:
        return sh.map(lambda arr: sum(1 for s in arr if s in bench_shingles))

    return _n_shared(shingles(text_col, contam_n)) < min_shared


def stream_training_mix(doc_stream: DataFrame, bench_shingles: frozenset[str],
                        fractions: dict[str, float],
                        min_tokens: int = 20, contam_n: int = 4,
                        min_shared: int = 1, seed: int = 7,
                        default: float = 0.0,
                        ts_col: str | None = None,
                        ttl: str = "30 minutes") -> DataFrame:
    """Incremental training-mix pipeline: :func:`stream_curate` (stateless
    gates + stateful first-seen dedup) → contamination gate → stratified
    mix gate — the same stage ORDER as the batch pipeline
    (``plans.corpus.build_training_mix``), so the mix draws on the
    keeper's doc_id, and both post-dedup gates are stateless per-row ops
    (the only shapes Structured Streaming allows after a stateful
    kernel). ``bench_shingles`` is the benchmark's distinct ``contam_n``-
    gram set (compute once, batch-side: explode + distinct + collect).
    Near-dup compaction stays batch-side per the module docstring.
    """
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        stratified_hash_sample)

    curated = stream_curate(doc_stream, min_tokens, ts_col=ts_col, ttl=ttl)
    clean = curated.filter(
        contamination_gate(bench_shingles, contam_n, min_shared))
    return stratified_hash_sample(clean, "lang", fractions, "doc_id",
                                  seed=seed, default=default)


def stream_cdc_chunk_sets(doc_stream: DataFrame, k: int = 2,
                          divisor: int | None = None,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Incremental half of the CDC containment gate (the batch stage
    behind ``run_corpus --cdc-containment``): chunk identity is
    per-document, so the stream maintains the (doc_id, chunk_hash)
    table with a purely ROW-LOCAL plan — the per-doc distinct folds
    inside each row via ``array_distinct`` (``chunk_sets_rowlocal``),
    no aggregation, no state. Append the output to a sink as documents
    arrive; pair generation and the keep-the-larger policy need the
    full chunk table (a self-join Structured Streaming cannot
    express), so they run as the periodic batch compaction
    ``operators.chunking.cdc_containment_keepers_from_chunks`` over
    the sink — the same hot/cold split as the near-dup stage (module
    docstring). Stream==batch equality is test-pinned."""
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        CDC_DIVISOR, chunk_sets_rowlocal)
    return chunk_sets_rowlocal(doc_stream, k,
                               CDC_DIVISOR if divisor is None else divisor,
                               id_col, text_col)


def collect_bench_shingles(benchmark: DataFrame,
                           contam_n: int = 4) -> frozenset[str]:
    """Benchmark → its distinct shingle set (the one driver-side collect
    in the streaming pipeline; eval sets are small by construction)."""
    from rgd_rnaseq_workflows_spark.functions.text import shingles
    rows = (benchmark
            .select(F.explode(shingles("text", contam_n)).alias("sh"))
            .distinct().collect())
    return frozenset(r["sh"] for r in rows)


def stream_oov_rate(doc_stream: DataFrame, ref: DataFrame,
                    by: str | None = None) -> DataFrame:
    """Incremental OOV drift monitoring: the batch
    ``snapshot.oov_rate_report`` expression tree running under
    Structured Streaming — the reference vocabulary joins as a STATIC
    frame (stream-static joins are stateless), and the single
    aggregation's state is one (group, n_tokens, n_oov) row per group.
    Read the current rates from a complete-mode sink at any time; after
    ingesting everything they equal the batch report (test-pinned)."""
    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        oov_gate_agg, oov_tokens)
    return oov_gate_agg(oov_tokens(doc_stream, ref, by), by)


def collect_boilerplate_grams(flagged: DataFrame) -> dict[str, frozenset]:
    """A ``boilerplate_ngrams`` report → per-source flagged-gram sets
    (the one driver-side collect; flagged grams are percent-scale
    bounded by construction — the report's min_doc_bps floor)."""
    out: dict[str, set] = {}
    for r in flagged.select("source", "gram").collect():
        out.setdefault(r["source"], set()).add(r["gram"])
    return {s: frozenset(g) for s, g in out.items()}


def boilerplate_gate(flagged_by_source: dict[str, frozenset],
                     shingle_n: int = 3, max_frac: float = 0.5,
                     source_col: str = "source",
                     text_col: str = "text"):
    """A STATELESS per-row boilerplate predicate for streams: keep a
    document iff ≤ ``max_frac`` of its grams are flagged template for
    ITS source. Same design as :func:`contamination_gate` — the batch
    form (``operators.boilerplate.boilerplate_score``) aggregates after
    a broadcast join, which Structured Streaming can't chain behind the
    stateful dedup kernel; here the grams come from the IDENTICAL
    JVM-side shingle expression and a vectorized pandas UDF probes the
    per-source frozen sets captured in its closure (bounded like the
    batch broadcast). Returns a Column predicate: True = keep.

    Fraction compare is exact-integer (``n_flagged·10⁶ ≤ max_frac_µ ·
    n_grams``), so the gate draws the same boundary as a batch filter
    on ``boilerplate_score`` (stream==batch test-pinned)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from rgd_rnaseq_workflows_spark.functions.text import shingles

    max_frac_u = int(round(max_frac * 1_000_000))

    @pandas_udf("long")
    def _n_flagged(src: pd.Series, sh: pd.Series) -> pd.Series:
        def count(s, arr):
            flags = flagged_by_source.get(s)
            if not flags:
                return 0
            return sum(1 for g in arr if g and g in flags)
        return pd.Series([count(s, a) for s, a in zip(src, sh)])

    sh = F.filter(shingles(text_col, shingle_n), lambda g: g != "")
    n_grams = F.size(sh)
    n_flag = _n_flagged(F.col(source_col), sh)
    # empty docs have no template content: keep
    return (n_grams == 0) | (n_flag * 1_000_000 <= max_frac_u * n_grams)


def stream_token_counts(doc_stream: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Incremental half of the TV-distance drift gate
    (``snapshot.token_drift_report``): the SAME ``token_counts``
    expression tree running under Structured Streaming, maintaining the
    live snapshot's vocabulary count table (one (t, c) state row per
    term — vocabulary-scale state, corpus-scale input).

    TV distance itself is a two-phase aggregation (per-term counts →
    one exact integer sum), which a single streaming query cannot chain;
    the design is the HLL-register pattern (``stream_hll_registers``):
    the stream maintains the compact sufficient statistic, and
    ``snapshot.drift_report_from_counts`` folds the 1-row drift report
    from the maintained table + the stored reference vocabulary on
    demand — a vocabulary-scale batch fold, never re-reading the corpus.
    Stream==batch equality is test-pinned (``test_streaming``)."""
    from rgd_rnaseq_workflows_spark.operators.snapshot import token_counts
    return token_counts(doc_stream, text_col, "cq")


def stream_expectations(doc_stream: DataFrame,
                        constraints: list[tuple]) -> DataFrame:
    """Streaming twin of ``profile.expectations_report`` for the
    ROW-LOCAL constraint classes (not_null / range / regex / in_set):
    the identical violation expressions under a streaming aggregation,
    so an ingest stream carries a live constraint dashboard whose
    complete-mode output equals the batch report over the same rows.
    State is one counter row per constraint — metadata, unbounded-safe.

    ``unique`` is excluded by contract: exact streaming uniqueness
    needs per-value state (the stateful dedup kernel is that operator);
    a suite containing it raises here rather than silently degrading.
    """
    from rgd_rnaseq_workflows_spark.operators.profile import (
        _ROW_LOCAL, _violation_expr)
    bad = [c for c in constraints if c[0] not in _ROW_LOCAL]
    if bad or not constraints:
        raise ValueError(
            f"stream_expectations handles row-local constraints only "
            f"(got {bad or 'empty suite'}); route 'unique' through the "
            f"stateful dedup kernel")
    import pyspark.sql.functions as F
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for i, con in enumerate(constraints):
        aggs.append(F.sum(_violation_expr(con[0], con[1], tuple(con[2:])))
                    .cast("long").alias(f"v{i}"))
    return doc_stream.agg(*aggs)


def expectations_from_counts(counts: DataFrame,
                             constraints: list[tuple]) -> DataFrame:
    """Fold a :func:`stream_expectations` counter row into the exact
    batch-report shape (constraint, column, spec, n_violations, n_rows,
    status) — a metadata-scale batch transform over the stream sink."""
    import pyspark.sql.functions as F
    frames = []
    for i, con in enumerate(constraints):
        kind, col = con[0], con[1]
        spec = "" if len(con) <= 2 else repr(tuple(con[2:]))
        frames.append(counts.select(
            F.lit(kind).alias("constraint"),
            F.lit(col).alias("column"),
            F.lit(spec).alias("spec"),
            F.col(f"v{i}").alias("n_violations"),
            F.col("n_rows").alias("n_rows")))
    rep = frames[0]
    for f_ in frames[1:]:
        rep = rep.unionByName(f_)
    return (rep.withColumn(
        "status", F.when(F.col("n_violations") == 0, "PASS")
        .otherwise("FAIL"))
        .orderBy("constraint", "column", "spec"))


def stream_correlation_moments(doc_stream: DataFrame,
                               cols: list[tuple[str, int]]) -> DataFrame:
    """Streaming twin of ``profile.correlation_report`` — the one-pass
    exact moment design is streamable BY CONSTRUCTION: the identical
    exact fixed-point limb-sum aggregates (Σx, Σx², Σxy per pair as
    long limb sums, pairwise NULL deletion) run under a Structured
    Streaming aggregation whose state is ONE row of sufficient
    statistics — limb sums are plain long adds, so they merge across
    micro-batches exactly like the batch partials. Read the sink's
    latest row any time and fold it with
    ``profile.correlations_from_moments`` — the live correlation
    matrix equals the batch report over the same rows (test-pinned),
    without re-reading the corpus. The stream_expectations /
    HLL-register pattern."""
    from rgd_rnaseq_workflows_spark.operators.profile import (
        correlation_moment_aggs, correlation_moment_inputs)
    return (doc_stream.select(*correlation_moment_inputs(cols))
            .agg(*correlation_moment_aggs(cols)))


def stream_fingerprint_counts(doc_stream: DataFrame, window: int,
                              text_col: str = "text") -> DataFrame:
    """Streaming half of exact duplicated-substring dedup
    (``operators.exact_substrings``): the per-fingerprint occurrence
    count and keep-first keeper are both mergeable (count, min-struct),
    so the SAME fingerprint-ladder + aggregation runs under Structured
    Streaming, maintaining the dedup decision table as documents
    arrive. ``exact_substrings.duplicate_spans_from_counts`` folds the
    removal spans off the sink — re-fingerprinting only the corpus
    snapshot being rewritten, never re-counting the stream's history.
    Stream==batch equality is test-pinned. State is fingerprint-scale
    (≈ one row per distinct L-window) — the heaviest state table in
    this family; pair with a TTL/compaction policy in production."""
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        fingerprint_counts)
    return fingerprint_counts(doc_stream, window, text_col=text_col)


def stream_bigram_counts(doc_stream: DataFrame,
                         text_col: str = "text") -> DataFrame:
    """Streaming half of the Kneser-Ney quality scorer
    (``quality.kn_lm_report``): the LM's sufficient statistic is the
    corpus bigram count table, which is mergeable, so the SAME
    ``bigram_counts`` expression tree maintains it under Structured
    Streaming as documents arrive. ``quality.kn_nll_table`` +
    ``quality.kn_score`` fold per-document perplexities off the
    maintained table on demand — scoring a snapshot against the LIVE
    corpus LM without re-counting the stream's history (the
    stream_token_counts / HLL-register pattern). Stream==batch
    equality is test-pinned. State is bigram-type-scale — larger than
    the unigram vocabulary; pair with a TTL/compaction policy in
    production (the stream_fingerprint_counts caveat)."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        bigram_counts)
    return bigram_counts(doc_stream, text_col)


def stream_contamination_screen(doc_stream: DataFrame, spark,
                                index_path: str,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> DataFrame:
    """Streaming ingest gate against a persisted eval-fingerprint
    index (``exact_substrings.write_contamination_index``): per
    streamed document, how many of its window positions are verbatim
    benchmark text — the exact-substring decontamination rule applied
    AS DOCUMENTS ARRIVE, before they ever reach the lake.

    Shape: the document ladder is a stateless projection+explode at
    the index's frozen window; the join side is the DISTINCT
    fingerprint set (fp only — each document position matches at most
    once, so ``count(*)`` IS ``n_hit_positions`` and the fold needs
    exactly ONE streaming aggregation; per-benchmark attribution
    needs a distinct aggregation streams can't chain — that stays the
    batch report's job, ``probe_contamination_index``). State is one
    row per in-flight contaminated doc; equals the batch probe's
    n_hit_positions over the same rows (test-pinned)."""
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        window_fingerprints)
    [r] = spark.read.parquet(f"{index_path}/meta").collect()
    bfp = (spark.read.parquet(f"{index_path}/fingerprints")
           .select("fp").distinct())
    dfp = window_fingerprints(doc_stream, int(r["window"]), id_col,
                              text_col)
    return (dfp.join(bfp, "fp")
            .groupBy(F.col("doc_id").alias(id_col))
            .agg(F.count("*").cast("long").alias("n_hit_positions")))


def stream_kn_score(doc_stream: DataFrame, nll_table: DataFrame,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Streaming KN quality gate — the OTHER half of the Kneser-Ney
    pair: :func:`stream_bigram_counts` maintains the LM from the lake;
    this scores a LIVE ingest stream against a FROZEN (bg, nll6) table
    (the CCNet deployment shape: perplexity-gate documents as they
    arrive, against the reference LM, without touching the lake).

    Shape: the frozen LM joins as a STATIC frame (stream-static joins
    are stateless), and ``quality.kn_score_occurrences`` folds the
    per-document report in ONE streaming aggregation (the batch form's
    per-(doc, bigram) pre-count would be a second chained aggregation,
    which streaming forbids — the occurrence-weighted fold is
    bit-identical, test-pinned). State is one row per in-flight
    document id; ppl/n_oov equal the batch ``kn_score`` over the same
    rows (test-pinned under out-of-order micro-batches)."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        kn_score_occurrences)
    return kn_score_occurrences(doc_stream, nll_table, id_col, text_col)


def stream_ccnet_keep(doc_stream: DataFrame, nll_table: DataFrame,
                      max_key_micro: int, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Streaming CCNet keep gate — the ``--ccnet-keep`` curation rule
    applied AS DOCUMENTS ARRIVE: a stream cannot compute the batch
    head/middle/tail GLOBAL RANK, so both artifacts are FROZEN from a
    batch run over the reference corpus — the ``(bg, nll6)`` KN table
    (``stream_kn_score``'s frozen-LM pattern) and the keep cut-point
    (``quality.ccnet_keep_threshold``, the max exact integer
    per-bigram key of the kept rank buckets). The gate is then a pure
    per-document decision: stateless stream-static LM join, ONE
    streaming aggregation (the occurrence-weighted KN fold), a
    post-aggregation integer comparison. Run in update/complete mode.

    Kept set equals the batch gate over the same rows (test-pinned
    under out-of-order micro-batches): exact integers everywhere, so
    stream and batch cannot disagree at the cut."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        ccnet_keep_gate)
    return ccnet_keep_gate(doc_stream, nll_table, max_key_micro,
                           id_col, text_col)


def stream_index_ingest(stream: DataFrame, path: str, kind: str,
                        stream_id: str):
    """Streaming maintenance for the persisted index family: each
    micro-batch appends into the layout through the SAME incremental
    path the batch CLI uses (``append_to_ivf_index`` /
    ``append_to_lsh_index`` / ``append_to_inverted_index``), so probes
    see new documents/vectors within one trigger interval and
    stream-maintained == batch-rebuilt is pinned by the append
    contracts those functions already test.

    Returns the ``DataStreamWriter`` (caller picks trigger/checkpoint
    and calls ``start()``).

    Delivery: EXACTLY-ONCE. ``foreachBatch`` is at-least-once, so each
    micro-batch is committed as the epoch ``{stream_id}-{epoch_id}``
    under the ``index_ledger`` contract: a replayed epoch no-ops
    against the ledger, and a crash between the data write and the
    ledger commit heals by dynamic partition overwrite on retry — BM25
    df/tf/N/Σdl never double-count, IVF/LSH never hold duplicate rows
    (pinned by the double-append tests in the index suites).

    ``stream_id`` is REQUIRED and must be unique per streaming-query
    LINEAGE: Spark's epoch_id restarts at 0 under a FRESH checkpoint
    directory, and a reused (stream_id, epoch_id) key would silently
    no-op real data — pass a new stream_id whenever you point a new
    checkpoint at an existing index. The sink also fails loudly on the
    fresh-checkpoint signature: a legitimate foreachBatch replay only
    re-delivers the LATEST epoch_id the checkpoint saw, so an incoming
    key that is already committed but is NOT this stream's highest
    committed epoch can only mean a second query (or a restarted-from-
    scratch checkpoint) is reusing the stream_id."""
    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        append_to_inverted_index)
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        append_to_ivf_index)
    from rgd_rnaseq_workflows_spark.operators.lsh_index import (
        append_to_lsh_index)
    appenders = {"ivf": append_to_ivf_index,
                 "lsh": append_to_lsh_index,
                 "bm25": append_to_inverted_index}
    if kind not in appenders:
        raise ValueError(f"unknown index kind {kind!r}; "
                         f"one of {sorted(appenders)}")
    fn = appenders[kind]

    import re as _re
    # exact key shape: {stream_id}-{digits}. The suffix is compared
    # NUMERICALLY — zero-padded keys sort lexicographically wrong past
    # 999999 ('s-1000000' < 's-999999'), and a bare startswith prefix
    # would also claim a DIFFERENT stream whose id extends this one
    # ('a' matching 'a-b-000001')
    epoch_re = _re.compile(_re.escape(stream_id) + r"-(\d+)$")

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from rgd_rnaseq_workflows_spark.operators.index_ledger import (
            ledger_keys)
        key = f"{stream_id}-{epoch_id:06d}"
        mine = {int(m.group(1))
                for k in ledger_keys(batch_df.sparkSession, path)
                if (m := epoch_re.match(k))}
        if mine and epoch_id in mine and epoch_id != max(mine):
            raise RuntimeError(
                f"stream_index_ingest: epoch key {key!r} is already "
                f"committed but is not stream {stream_id!r}'s latest "
                f"(epoch {max(mine)}) — a fresh checkpoint or a second "
                "query is reusing this stream_id against the same "
                "index; pass a new stream_id (silently no-oping would "
                "drop this batch's data)")
        fn(batch_df, path, epoch_key=key)

    return stream.writeStream.foreachBatch(_sink)


def stream_embedding_health(emb_stream: DataFrame, dims: int,
                            vec_col: str = "embedding") -> DataFrame:
    """Streaming twin of ``profile.embedding_health_report`` — every
    statistic in the audit (defect-class counts, healthy-norm min/max)
    is trivially mergeable, so the identical aggregate expressions run
    under a Structured Streaming aggregation whose state is ONE row.
    Read the sink's latest row any time: the live health report equals
    the batch audit over the same vectors (test-pinned) without
    re-reading the lake — catch a poisoned embedding job WHILE it
    writes, before an index build burns compute on it."""
    from rgd_rnaseq_workflows_spark.operators.profile import (
        embedding_health_aggs)
    return emb_stream.agg(*embedding_health_aggs(dims, vec_col))


def stream_token_supply(doc_stream: DataFrame, by: str = "source",
                        text_col: str = "text") -> DataFrame:
    """Streaming half of the water-filling budget allocator: the
    per-group token supply is the allocation's sufficient statistic
    (one row per group), so the stream maintains it under a plain
    streaming aggregation and ``sampling.waterfill_from_supply`` folds
    the live allocation off the sink — the stream_expectations /
    moments pattern. Stream==batch equality is test-pinned."""
    return (doc_stream
            .groupBy(F.col(by))
            .agg(F.sum(TX.token_count(text_col)).cast("long")
                 .alias("supply_tokens")))


def stream_isotropy_moments(emb_stream: DataFrame,
                            vec_col: str = "embedding") -> DataFrame:
    """Streaming twin of ``pca.isotropy_report``'s sufficient
    statistic: the per-dim fix-point integer moments (s, q, c) are
    plain sums/counts, so a Structured Streaming aggregation maintains
    the d-row table incrementally and
    ``pca.isotropy_from_moments`` folds the LIVE isotropy report off
    the sink at any time — watch an embedding job's geometry collapse
    WHILE it writes (cone-crowding or dimension starvation), before an
    ANN build trusts the cosines. Stream==batch equality is
    test-pinned; state is d rows regardless of corpus size."""
    from rgd_rnaseq_workflows_spark.operators.pca import isotropy_moments
    return isotropy_moments(emb_stream, vec_col)


def stream_source_signatures(doc_stream: DataFrame,
                             group_col: str = "source",
                             text_col: str = "text",
                             num_hashes: int = 16,
                             shingle_n: int = 3) -> DataFrame:
    """Incremental half of the source-overlap pre-flight
    (``dedup.source_overlap_minhash``): the SAME per-group slot-min
    signature expression tree running under Structured Streaming —
    every aggregate is a MIN, so the state is exactly |groups| rows of
    k longs (the O(1)-per-key state rule) and each micro-batch folds
    its shingles map-side before touching state. The pairwise report
    is a |groups|²-scale batch fold over the maintained table
    (``dedup.source_overlap_from_signatures``) — the token-counts /
    HLL-register sink-fold pattern; stream==batch is test-pinned."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        source_signatures)
    return source_signatures(doc_stream, group_col, text_col,
                             num_hashes, shingle_n)
