"""Structured Streaming: the streaming windowed agg must equal its batch twin."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from rgd_rnaseq_workflows_spark.streaming.events_stream import (
    EVENTS_SCHEMA, session_window_counts, sessionize, stream_windowed_counts,
    windowed_counts)


def _events_df(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append((i, base + dt.timedelta(minutes=7 * i), i % 3,
                     "click" if i % 2 else "view", float(i), "{}"))
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_stream_equals_batch(spark, tmp_out):
    df = _events_df(spark)
    src = os.path.join(tmp_out, "src")
    df.write.parquet(src)
    batch = {tuple(r) for r in windowed_counts(df).collect()}

    q = (stream_windowed_counts(spark, src, watermark="10 minutes")
         .writeStream.format("memory").queryName("win_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in
                    spark.sql("SELECT * FROM win_out").collect()}
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0


def test_sessionize_gap_splits(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 7, "view", 1.0, "{}"),
            (2, base + dt.timedelta(minutes=10), 7, "view", 1.0, "{}"),
            (3, base + dt.timedelta(minutes=80), 7, "view", 1.0, "{}")]
    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 2
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [1, 2]


def test_session_window_native_matches_lag_based(spark):
    df = _events_df(spark)
    lag_based = sessionize(df, gap_minutes=30)
    native = session_window_counts(df, "30 minutes")
    # same number of sessions and same total events per user
    a = {(r["user_id"], r["n_events"]) for r in lag_based.collect()}
    b = {(r["user_id"], r["n_events"]) for r in native.collect()}
    assert a == b


def test_stream_interval_join_equals_batch(spark, tmp_out):
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.streaming.events_stream import (
        interval_join, stream_interval_join)
    df = _events_df(spark)
    src = os.path.join(tmp_out, "ij_src")
    df.write.parquet(src)
    batch = {tuple(r) for r in interval_join(
        df.filter(F.col("event_type") == "click"),
        df.filter(F.col("event_type") == "view")).collect()}

    q = (stream_interval_join(spark, src, watermark="10 minutes")
         .writeStream.format("memory").queryName("ij_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in
                    spark.sql("SELECT * FROM ij_out").collect()}
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0


def test_sliding_stream_equals_batch(spark, tmp_out):
    from rgd_rnaseq_workflows_spark.streaming.events_stream import (
        sliding_counts, sliding_topk, stream_sliding_counts)
    df = _events_df(spark)
    src = os.path.join(tmp_out, "src_slide")
    df.write.parquet(src)
    batch = {tuple(r) for r in sliding_counts(df).collect()}

    q = (stream_sliding_counts(spark, src, watermark="10 minutes")
         .writeStream.format("memory").queryName("slide_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in
                    spark.sql("SELECT * FROM slide_out").collect()}
    finally:
        q.stop()
    assert streamed == batch and len(batch) > 0
    # every event lands in exactly window/slide = 4 windows
    assert sum(r[2] for r in batch) == 40 * 4
    # top-k is a per-window prefix of the counts, deterministically ranked
    top = sliding_topk(df, k=3).collect()
    per_window = {}
    for r in top:
        per_window.setdefault(r["window_start"], []).append(r)
    for rows in per_window.values():
        assert [r["rk"] for r in
                sorted(rows, key=lambda x: x["rk"])] == list(
                    range(1, len(rows) + 1))
        assert len(rows) <= 3


def test_stream_hll_equals_batch(spark, tmp_out):
    """The streaming register table after ingesting everything equals the
    batch sketch — so does the estimate folded from it."""
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        hll_estimate, hll_registers)
    from rgd_rnaseq_workflows_spark.streaming.events_stream import (
        stream_hll_registers)
    df = _events_df(spark)
    src = os.path.join(tmp_out, "hll_src")
    df.write.parquet(src)
    batch_regs = {(r.bucket, r.register)
                  for r in hll_registers(df, "user_id", p=6).collect()}

    q = (stream_hll_registers(spark, src, "user_id", p=6)
         .writeStream.format("memory").queryName("hll_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        stream_regs_df = spark.sql("SELECT * FROM hll_out")
        stream_regs = {(r.bucket, r.register)
                       for r in stream_regs_df.collect()}
        est_stream = hll_estimate(stream_regs_df, p=6).collect()[0]
    finally:
        q.stop()
    assert stream_regs == batch_regs
    est_batch = hll_estimate(hll_registers(df, "user_id", p=6),
                             p=6).collect()[0]
    assert est_stream == est_batch


def test_stream_oov_rate_equals_batch(spark, tmp_out):
    """Streaming OOV drift after ingesting everything == batch report."""
    import os

    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        oov_rate_report)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_oov_rate)
    ref = spark.createDataFrame(
        [(0, "en", "alpha beta gamma"), (1, "de", "eins zwei")],
        "doc_id long, lang string, text string")
    probe = spark.createDataFrame(
        [(2, "en", "alpha novel beta"), (3, "en", "gamma beta"),
         (4, "de", "eins drei vier")],
        "doc_id long, lang string, text string")
    src = os.path.join(tmp_out, "oov_src")
    probe.write.parquet(src)
    batch = {r.lang: (r.n_tokens, r.n_oov, r.oov_rate6)
             for r in oov_rate_report(probe, ref, by="lang").collect()}
    assert batch["en"] == (5, 1, 0.2)
    assert batch["de"] == (3, 2, round(2 / 3, 6))

    stream = spark.readStream.schema(probe.schema).parquet(src)
    q = (stream_oov_rate(stream, ref, by="lang")
         .writeStream.format("memory").queryName("oov_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {r.lang: (r.n_tokens, r.n_oov, r.oov_rate6)
               for r in spark.sql("SELECT * FROM oov_out").collect()}
    finally:
        q.stop()
    assert got == batch


def test_stream_token_drift_equals_batch(spark, tmp_out):
    """TV-distance drift folded from a STREAM-maintained vocabulary
    count table == the batch token_drift_report (VERDICT r5 item 6).
    The stream maintains the (t, c) sufficient statistic; the 1-row
    report is a vocabulary-scale batch fold over it."""
    import os

    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        drift_report_from_counts, token_counts, token_drift_report)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_token_counts)
    old = spark.createDataFrame(
        [(0, "alpha beta beta gamma"), (1, "alpha delta")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "alpha beta novel"), (3, "novel novel gamma"),
         (4, "epsilon")],
        "doc_id long, text string")
    src = os.path.join(tmp_out, "drift_src")
    new.write.parquet(src)
    batch = token_drift_report(old, new).collect()[0]

    stream = spark.readStream.schema(new.schema).parquet(src)
    q = (stream_token_counts(stream)
         .writeStream.format("memory").queryName("drift_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        cn = spark.sql("SELECT * FROM drift_counts")
        streamed = drift_report_from_counts(
            token_counts(old, count_col="cp"), cn).collect()[0]
    finally:
        q.stop()
    assert streamed == batch
    # and the counts themselves match the batch kernel
    assert ({tuple(r) for r in cn.collect()}
            == {tuple(r) for r in
                token_counts(new, count_col="cq").collect()})


def test_stream_boilerplate_gate_equals_batch(spark, tmp_out):
    """The stateless streaming boilerplate gate keeps exactly the docs a
    batch filter on boilerplate_score keeps (same shingle expression,
    same exact-integer fraction boundary)."""
    import os

    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.boilerplate import (
        boilerplate_ngrams, boilerplate_score)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        boilerplate_gate, collect_boilerplate_grams)

    tpl = "accept all cookies to continue"
    docs = spark.createDataFrame(
        [(0, "srcA", f"{tpl} plus real article content here today"),
         (1, "srcA", f"{tpl} other genuine body text follows now"),
         (2, "srcA", f"{tpl} third page body differs again fully"),
         (3, "srcA", tpl),                       # pure template -> drop
         (4, "srcA", "entirely template free writing about rivers"),
         (5, "srcB", f"{tpl} single occurrence not flagged in b")],
        "doc_id long, source string, text string")
    flagged = boilerplate_ngrams(docs, shingle_n=3, min_doc_bps=5000,
                                 min_docs=2)
    grams = collect_boilerplate_grams(flagged)
    assert "srcA" in grams and "srcB" not in grams

    max_frac = 0.5
    scores = boilerplate_score(docs, flagged, shingle_n=3)
    batch_keep = {r.doc_id for r in
                  docs.join(scores, "doc_id", "left").filter(
                      F.coalesce(F.col("n_flagged"), F.lit(0)) * 1_000_000
                      <= int(max_frac * 1_000_000)
                      * F.coalesce(F.col("n_grams"), F.lit(1)))
                  .collect()}
    assert 3 not in batch_keep and 4 in batch_keep and 5 in batch_keep

    src = os.path.join(tmp_out, "bp_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (stream.filter(boilerplate_gate(grams, shingle_n=3,
                                        max_frac=max_frac))
         .writeStream.format("memory").queryName("bp_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        streamed = {r.doc_id for r in
                    spark.sql("SELECT doc_id FROM bp_out").collect()}
    finally:
        q.stop()
    assert streamed == batch_keep


def test_stream_expectations_equals_batch(spark, tmp_out):
    """Live ingest constraint dashboard: the stream-maintained counter
    row folded to report shape == the batch expectations_report over
    the same rows (row-local constraint classes)."""
    import os

    import pytest

    from rgd_rnaseq_workflows_spark.operators.profile import (
        expectations_report)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        expectations_from_counts, stream_expectations)
    cons = [("not_null", "name"), ("range", "amt", 0, 100),
            ("in_set", "cat", ("X", "Y"))]
    rows = [(1, "a", 10, "X"), (2, None, 20, "Y"), (3, "c", 500, "Z")]
    df = spark.createDataFrame(rows, "id long, name string, amt long, "
                               "cat string")
    batch = sorted(tuple(r) for r in
                   expectations_report(df, cons).collect())
    src = os.path.join(tmp_out, "exp_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (stream_expectations(stream, cons)
         .writeStream.format("memory").queryName("exp_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        streamed = sorted(tuple(r) for r in expectations_from_counts(
            spark.sql("SELECT * FROM exp_counts"), cons).collect())
    finally:
        q.stop()
    assert streamed == batch
    # unique is excluded by contract — must raise, not degrade
    with pytest.raises(ValueError, match="stateful dedup"):
        stream_expectations(stream, [("unique", "id")])


def test_stream_correlations_equal_batch(spark, tmp_out):
    """The exact decimal moments maintained under a streaming
    aggregation, folded by correlations_from_moments, equal the batch
    correlation_report over the same rows — including a NULL cell
    (pairwise deletion) and across two micro-batches."""
    import os

    from rgd_rnaseq_workflows_spark.operators.profile import (
        correlation_report, correlations_from_moments)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_correlation_moments)

    cols = [("x", 100), ("y", 100), ("z", 1000)]
    b1 = [(1.25, 2.5, 0.111), (2.0, 4.1, 0.222), (None, 9.9, 0.333)]
    b2 = [(3.5, 7.0, 0.444), (4.25, 8.4, None)]
    schema = "x double, y double, z double"
    src = os.path.join(tmp_out, "corr_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_correlation_moments(stream, cols)
         .writeStream.format("memory").queryName("corr_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        moments = spark.sql("SELECT * FROM corr_out")
        got = sorted(tuple(r) for r in
                     correlations_from_moments(moments, cols).collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted(tuple(r) for r in
                  correlation_report(both, cols).collect())
    assert got == want
    n_by_pair = {(a, b): n for a, b, n, _ in want}
    assert n_by_pair[("x", "y")] == 4      # NULL x row excluded
    assert n_by_pair[("y", "z")] == 4      # NULL z row excluded


def test_stream_waterfill_supply_equals_batch(spark, tmp_out):
    """The water-fill allocation folded from a STREAM-maintained
    per-source supply table equals the batch allocator over the same
    documents, across two micro-batches."""
    import os

    from rgd_rnaseq_workflows_spark.functions import text as TX
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        token_waterfill_allocation, waterfill_from_supply)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_token_supply)

    schema = "doc_id long, source string, text string"
    b1 = [(1, "a", "one two three"), (2, "b", "x " * 50)]
    b2 = [(3, "b", "y " * 30), (4, "c", "z")]
    src = os.path.join(tmp_out, "wf_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_token_supply(stream)
         .writeStream.format("memory").queryName("wf_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        sup = spark.sql("SELECT * FROM wf_out")
        got = sorted(tuple(r) for r in
                     waterfill_from_supply(sup, 60).collect())
    finally:
        q.stop()

    both = (spark.createDataFrame(b1 + b2, schema)
            .withColumn("n_tokens", TX.token_count("text")))
    want = sorted(tuple(r) for r in
                  token_waterfill_allocation(both, 60).collect())
    assert got == want
    assert sum(a for _, _, a, _ in got) == (60 * (3 + 50 + 30 + 1)) // 100


def test_stream_vocab_coverage_equals_batch(spark, tmp_out):
    """The coverage curve folded from the STREAM-maintained term count
    table equals the batch curve over the same documents, across two
    micro-batches."""
    import os

    from rgd_rnaseq_workflows_spark.operators.quality import (
        vocab_coverage_curve, vocab_coverage_from_counts)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_token_counts)

    schema = "doc_id long, text string"
    b1 = [(1, "a a a b b c"), (2, "a b d")]
    b2 = [(3, "c c e a"), (4, "b e")]
    src = os.path.join(tmp_out, "vc_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_token_counts(stream)
         .writeStream.format("memory").queryName("vc_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        counts = spark.sql("SELECT * FROM vc_out")
        got = sorted(tuple(r) for r in vocab_coverage_from_counts(
            counts, [1, 3, 10]).collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted(tuple(r) for r in
                  vocab_coverage_curve(both, [1, 3, 10]).collect())
    assert got == want


def test_stream_embedding_health_equals_batch(spark, tmp_out):
    """The embedding-health audit maintained under a streaming
    aggregation equals the batch report over the same vectors — every
    defect class exercised, across two micro-batches."""
    import os

    from rgd_rnaseq_workflows_spark.operators.profile import (
        embedding_health_report)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_embedding_health)

    schema = "vec_id long, embedding array<double>"
    b1 = [(1, [0.6, 0.8]),                 # healthy
          (2, None),                       # NULL vector
          (3, [1.0, 2.0, 3.0]),            # wrong dims
          (4, [float("nan"), 1.0])]        # non-finite
    b2 = [(5, [0.0, 0.0]),                 # all-zero
          (6, [3.0, 4.0]),                 # healthy (norm 5)
          (7, [1.0, float("inf")])]        # non-finite
    src = os.path.join(tmp_out, "emb_health_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_embedding_health(stream, dims=2)
         .writeStream.format("memory").queryName("emb_health_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM emb_health_out").collect()
    finally:
        q.stop()

    want = embedding_health_report(
        spark.createDataFrame(b1 + b2, schema), dims=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    [r] = want
    assert (r["n_vecs"], r["n_null"], r["n_bad_dim"], r["n_nonfinite"],
            r["n_zero"]) == (7, 1, 1, 2, 1)
    assert (r["min_norm6"], r["max_norm6"]) == (1.0, 5.0)


def test_stream_fingerprint_counts_equals_batch(spark, tmp_out):
    """The exact-substring fingerprint-count table maintained under a
    streaming aggregation, folded by duplicate_spans_from_counts,
    yields the SAME removal spans as the one-pass batch form over the
    same documents — across two micro-batches (the duplicate pair
    spans batch boundaries)."""
    import os

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        duplicate_spans, duplicate_spans_from_counts,
        fingerprint_counts)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_fingerprint_counts)

    schema = "doc_id long, text string"
    b1 = [(1, "a b c d e f g h"), (2, "q w e r t y")]
    b2 = [(3, "z z c d e f z z"), (4, "c d e f g h x y")]
    src = os.path.join(tmp_out, "xsub_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_fingerprint_counts(stream, window=4)
         .writeStream.format("memory").queryName("xsub_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        counts = spark.sql("SELECT * FROM xsub_counts")
        both = spark.createDataFrame(b1 + b2, schema)
        got = sorted(tuple(r) for r in duplicate_spans_from_counts(
            both, counts, window=4).collect())
    finally:
        q.stop()

    want = sorted(tuple(r) for r in
                  duplicate_spans(both, window=4).collect())
    assert got == want
    # cross-batch duplicate found: docs 3 and 4 copy doc 1's windows
    assert {d for d, _, _ in got} == {3, 4}
    # and the maintained table equals the batch count table
    batch_counts = sorted(tuple(r) for r in
                          fingerprint_counts(both, 4).collect())
    assert sorted(tuple(r) for r in counts.collect()) == batch_counts


def test_stream_bigram_counts_kn_equals_batch(spark, tmp_out):
    """The bigram LM table maintained under a streaming aggregation,
    folded through kn_nll_table + kn_score, yields the SAME per-doc KN
    perplexities as the one-pass batch kn_lm_report — across two
    micro-batches (the LM statistics shift when batch 2 lands)."""
    import os

    from rgd_rnaseq_workflows_spark.operators.quality import (
        bigram_counts, kn_lm_report, kn_nll_table, kn_score)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_bigram_counts)

    schema = "doc_id long, text string"
    b1 = [(1, "a b a b"), (2, "a b c")]
    b2 = [(3, "b c a"), (4, "c a b")]
    src = os.path.join(tmp_out, "kn_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_bigram_counts(stream)
         .writeStream.format("memory").queryName("kn_counts")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        counts = spark.sql("SELECT * FROM kn_counts")
        both = spark.createDataFrame(b1 + b2, schema)
        got = sorted(tuple(r) for r in
                     kn_score(both, kn_nll_table(counts)).collect())
    finally:
        q.stop()

    want = sorted(tuple(r) for r in kn_lm_report(both).collect())
    assert got == want
    # the maintained LM equals the batch count table
    assert sorted(tuple(r) for r in counts.collect()) == \
        sorted(tuple(r) for r in bigram_counts(both).collect())
    # self-trained: no OOV positions by construction
    assert all(r[2] == 0 for r in got)


def test_stream_url_dedup_keepers_equal_batch(spark, tmp_out):
    """Streaming canonical-URL dedup: the stateful first-seen kernel
    keyed on the CANONICAL url (stream_dedup with text_col pointed at
    the canonicalized column) emits exactly the batch
    url_dedup_report keepers — refetch variants arriving in LATER
    micro-batches are suppressed."""
    import os

    from rgd_rnaseq_workflows_spark.operators.urls import (
        url_dedup_report, with_canonical_url)
    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        stream_dedup)

    schema = "doc_id long, url string"
    b1 = [(1, "https://Example.COM/p/1?a=1&b=2"),
          (2, "https://other.com/x")]
    b2 = [(3, "https://example.com:443/p/1?b=2&a=1"),   # refetch of 1
          (4, "https://www.other.com/x/"),              # refetch of 2
          (5, "http://example.com/p/1?a=1&b=2")]        # http: new
    src = os.path.join(tmp_out, "url_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    canon_stream = with_canonical_url(stream)
    q = (stream_dedup(canon_stream, text_col="canonical_url")
         .writeStream.format("memory").queryName("url_keepers")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        kept = {r["doc_id"] for r in
                spark.sql("SELECT doc_id FROM url_keepers").collect()}
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = {r["keeper_id"] for r in url_dedup_report(both).collect()}
    assert kept == want == {1, 2, 5}


def test_stream_index_ingest_bm25_and_ivf(spark, tmp_out):
    """Streaming index maintenance: micro-batches append into the
    persisted layouts via the incremental paths; after the stream
    drains, probes equal a from-scratch rebuild over base+delta."""
    import os

    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        bm25_index_topk, write_inverted_index)
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        ivf_index_topk, write_ivf_index)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_index_ingest)

    # --- bm25 ---------------------------------------------------------------
    schema = "doc_id long, text string"
    base = [(i, f"w{i} w{i % 3} common") for i in range(10)]
    delta = [(100 + i, f"w{i % 3} common fresh{i}") for i in range(4)]
    docs = spark.createDataFrame(base, schema)
    idx = os.path.join(tmp_out, "inv_stream")
    write_inverted_index(docs, idx, num_buckets=4)

    src = os.path.join(tmp_out, "inv_delta_src")
    os.makedirs(src)
    spark.createDataFrame(delta[:2], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_index_ingest(stream, idx, "bm25", "inv-s1") \
        .option("checkpointLocation",
                os.path.join(tmp_out, "inv_ckpt")).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(delta[2:], schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    idx_full = os.path.join(tmp_out, "inv_full")
    write_inverted_index(
        docs.unionByName(spark.createDataFrame(delta, schema)),
        idx_full, num_buckets=4)
    got = [tuple(r) for r in
           bm25_index_topk(spark, idx, "common w1", k=8).collect()]
    want = [tuple(r) for r in
            bm25_index_topk(spark, idx_full, "common w1", k=8).collect()]
    assert got == want
    assert any(d >= 100 for d, _, _ in got)   # streamed docs probe-visible

    # --- ivf ----------------------------------------------------------------
    eschema = "vec_id long, embedding array<float>, label int"
    ebase = [(i, [float(i % 4), 1.0], i % 4) for i in range(12)]
    edelta = [(200 + i, [float(i % 4), 1.0], 0) for i in range(4)]
    emb = spark.createDataFrame(ebase, eschema)
    eidx = os.path.join(tmp_out, "ivf_stream")
    write_ivf_index(emb, eidx)

    esrc = os.path.join(tmp_out, "ivf_delta_src")
    os.makedirs(esrc)
    spark.createDataFrame(edelta, eschema).coalesce(1) \
        .write.mode("append").parquet(esrc)
    estream = spark.readStream.schema(eschema).parquet(esrc) \
        .drop("label")           # appends are assigned by the index
    eq = stream_index_ingest(estream, eidx, "ivf", "ivf-s1") \
        .option("checkpointLocation",
                os.path.join(tmp_out, "ivf_ckpt")).start()
    try:
        eq.processAllAvailable()
    finally:
        eq.stop()
    got_ids = {r["vec_id"] for r in
               ivf_index_topk(spark, eidx, [2.0, 1.0], k=6,
                              nprobe=4).collect()}
    assert {202}.issubset(got_ids)            # streamed vector found


def test_stream_kn_score_against_frozen_lm_equals_batch(spark, tmp_out):
    """The production quality-gate shape: documents STREAM IN and are
    scored against a FROZEN reference LM — per-doc ppl/n_oov from the
    one-aggregation streaming fold equal the batch kn_score over the
    same rows, across out-of-order micro-batches, including OOV
    bigrams (the stream's vocabulary exceeds the LM's)."""
    import os

    from rgd_rnaseq_workflows_spark.operators.quality import (
        bigram_counts, kn_nll_table, kn_score)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_kn_score)

    schema = "doc_id long, text string"
    ref = spark.createDataFrame(
        [(100, "a b a b c"), (101, "b c a b")], schema)
    nll = kn_nll_table(bigram_counts(ref))
    nll.cache().count()          # the frozen LM — a static frame

    b1 = [(1, "a b a b"), (2, "a b z q")]      # doc 2: OOV bigrams
    b2 = [(3, "c a b"), (4, "q q q"), (5, "")]  # 4: all-OOV, 5: empty
    src = os.path.join(tmp_out, "knscore_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_kn_score(stream, nll)
         .writeStream.format("memory").queryName("kn_scores")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(tuple(r) for r in
                     spark.sql("SELECT * FROM kn_scores").collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted(tuple(r) for r in kn_score(both, nll).collect())
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[2][2] > 0                     # n_oov counted
    assert by_id[4][1] == 0 and by_id[4][4] is None  # all-OOV: no ppl


def test_stream_contamination_screen_equals_batch_probe(spark, tmp_out):
    """The streaming decontamination ingest gate: per-doc verbatim-
    window hit counts against a persisted eval-fingerprint index equal
    the batch probe's n_hit_positions, across micro-batches."""
    import os

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        probe_contamination_index, write_contamination_index)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_contamination_screen)

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    idx = os.path.join(tmp_out, "contam_idx")
    write_contamination_index(bench, idx, window=5)

    schema = "doc_id long, text string"
    b1 = [(10, "intro text then the quick brown fox jumps over it"),
          (11, "totally clean document with original words only")]
    b2 = [(12, "pack my box with five dozen liquor jugs verbatim"),
          (13, "")]
    src = os.path.join(tmp_out, "contam_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_contamination_screen(stream, spark, idx)
         .writeStream.format("memory").queryName("contam_hits")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(tuple(r) for r in
                     spark.sql("SELECT * FROM contam_hits").collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted((r["doc_id"], r["n_hit_positions"]) for r in
                  probe_contamination_index(spark, idx, both).collect())
    assert got == want
    assert {d for d, _ in got} == {10, 12}   # clean/empty docs absent


def test_stream_host_rate_limit_equals_batch_window_cap(spark, tmp_out):
    """Streaming politeness: per (canonical host, event-time window)
    at most `cap` admissions; equals the batch fixed-window cap when
    arrival order matches event order, and a capped host is re-admitted
    in the NEXT window."""
    import datetime as dt
    import os

    from rgd_rnaseq_workflows_spark.streaming.stateful import (
        batch_window_cap_kernel, stream_host_rate_limit)

    def t(minute, sec=0):
        return dt.datetime(2026, 1, 1, 0, minute, sec)

    schema = "doc_id long, url string, ts timestamp"
    mk = lambda i, host, ts: (i, f"https://{host}/p/{i}", ts)
    # window = 10 min; hot.com floods window 0 (7 urls, cap 3),
    # cool.org stays under; hot.com returns in window 1
    b1 = [mk(i, "hot.com", t(1, i)) for i in range(5)] + \
         [mk(100, "cool.org", t(2)), mk(101, "cool.org", t(3))]
    b2 = [mk(5, "hot.com", t(4)), mk(6, "hot.com", t(5)),
          mk(200, "hot.com", t(12)), mk(201, "hot.com", t(13))]
    src = os.path.join(tmp_out, "rate_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_host_rate_limit(stream, cap=3, window="10 minutes")
         .writeStream.format("memory").queryName("admitted")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(tuple(r) for r in
                     spark.sql("SELECT * FROM admitted").collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted(tuple(r) for r in
                  batch_window_cap_kernel(both, cap=3,
                                          window="10 minutes").collect())
    assert got == want
    hot0 = [d for d, h, w in got if h == "hot.com" and
            w == min(w for _, h2, w in got if h2 == "hot.com")]
    assert len(hot0) == 3 and hot0 == [0, 1, 2]   # earliest 3 admitted
    assert any(d in (200, 201) for d, h, _ in got if h == "hot.com")
    assert {d for d, h, _ in got if h == "cool.org"} == {100, 101}


def test_stream_index_ingest_fresh_checkpoint_collision_is_loud(
        spark, tmp_out):
    """ADVICE r10: a restarted-from-scratch checkpoint (or a second
    query) reusing a stream_id mints epoch keys that collide with
    already-committed ones — the sink must FAIL, not silently no-op
    the batch's data."""
    import os

    from pyspark.errors import StreamingQueryException

    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        append_to_inverted_index, write_inverted_index)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_index_ingest)

    schema = "doc_id long, text string"
    idx = os.path.join(tmp_out, "inv_collide")
    write_inverted_index(
        spark.createDataFrame([(i, f"w{i} common") for i in range(6)],
                              schema), idx, num_buckets=4)
    # a prior run of stream id "s1" committed epochs 0 and 1
    for e in (0, 1):
        append_to_inverted_index(
            spark.createDataFrame([(50 + e, "common prior")], schema),
            idx, epoch_key=f"s1-{e:06d}")

    src = os.path.join(tmp_out, "inv_collide_src")
    os.makedirs(src)
    spark.createDataFrame([(100, "common fresh")], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_index_ingest(stream, idx, "bm25", "s1") \
        .option("checkpointLocation",
                os.path.join(tmp_out, "inv_collide_ckpt")).start()
    try:
        with pytest.raises(StreamingQueryException,
                           match="reusing this stream_id"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_stream_ccnet_keep_equals_batch_kept_set(spark, tmp_out):
    """r11 (VERDICT r10 item 8): the --ccnet-keep ingest gate. The keep
    cut-point and the LM are FROZEN from a batch CCNet run over the
    reference corpus; documents streaming in across out-of-order
    micro-batches are kept iff their exact integer per-bigram key is at
    or below the cut — the kept set equals the batch gate over the same
    rows, and the cut equals the batch head bucket's max key."""
    import os

    from rgd_rnaseq_workflows_spark.operators.quality import (
        bigram_counts, ccnet_band_assign, ccnet_keep_gate,
        ccnet_keep_threshold, kn_nll_table)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_ccnet_keep)

    schema = "doc_id long, text string"
    # reference corpus with a spread of LM-likeness: repetitive
    # low-perplexity docs and noisier ones
    ref = spark.createDataFrame(
        [(100, "a b a b a b a b"), (101, "a b a b c d"),
         (102, "c d e f g h"), (103, "x y z w v u"),
         (104, "a b c d a b"), (105, "e f x y c d")], schema)
    nll = kn_nll_table(bigram_counts(ref))
    nll.cache().count()                     # the frozen LM
    cut = ccnet_keep_threshold(ref, n_buckets=3, keep_buckets=1)

    # sanity: the frozen cut IS the batch head bucket's max key
    bands = {r["doc_id"]: r["band"]
             for r in ccnet_band_assign(ref, n_buckets=3).collect()}
    assert set(bands.values()) == {"head", "middle", "tail"}

    b1 = [(1, "a b a b a b"), (2, "x y z q")]     # 1 LM-like, 2 noisy
    b2 = [(3, "a b a b c d a b"), (4, "q q q"),   # 4: all-OOV
          (5, ""), (6, "c d e f")]                # 5: empty
    src = os.path.join(tmp_out, "ccnet_keep_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_ccnet_keep(stream, nll, cut)
         .writeStream.format("memory").queryName("ccnet_kept")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        got = sorted(tuple(r) for r in
                     spark.sql("SELECT * FROM ccnet_kept").collect())
    finally:
        q.stop()

    both = spark.createDataFrame(b1 + b2, schema)
    want = sorted(tuple(r) for r in
                  ccnet_keep_gate(both, nll, cut).collect())
    assert got == want
    kept_ids = {r[0] for r in got}
    assert 1 in kept_ids                     # the LM-like doc survives
    assert 4 not in kept_ids and 5 not in kept_ids   # unscoreable drop


def test_stream_isotropy_equals_batch(spark, tmp_out):
    """Per-dim isotropy moments maintained under a streaming
    aggregation fold (via isotropy_from_moments) to the identical
    one-row report the batch path computes — across two
    micro-batches."""
    import os
    import random

    from rgd_rnaseq_workflows_spark.operators.pca import (
        isotropy_from_moments, isotropy_report)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_isotropy_moments)

    rng = random.Random(29)
    schema = "vec_id long, embedding array<double>"
    mk = lambda lo, hi: [(i, [rng.uniform(-1, 1) for _ in range(4)])
                         for i in range(lo, hi)]
    b1, b2 = mk(0, 15), mk(15, 40)
    src = os.path.join(tmp_out, "iso_src")
    os.makedirs(src)
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_isotropy_moments(stream)
         .writeStream.format("memory").queryName("iso_out")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
        live = isotropy_from_moments(
            spark.table("iso_out")).collect()[0]
    finally:
        q.stop()

    batch = isotropy_report(
        spark.createDataFrame(b1 + b2, schema), dims=4).collect()[0]
    assert live.asDict() == batch.asDict()


def test_stream_source_signatures_equal_batch_overlap(spark, tmp_out):
    """The stream-maintained per-source slot-min signature table folds
    to EXACTLY the batch source_overlap_minhash report (min is
    mergeable; the pair fold reads the sink, never the corpus)."""
    import os

    from rgd_rnaseq_workflows_spark.operators.dedup import (
        source_overlap_from_signatures, source_overlap_minhash)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_source_signatures)
    docs = spark.createDataFrame(
        [(1, "s1", "the quick brown fox jumps over the lazy dog"),
         (2, "s1", "a completely different sentence lives here now"),
         (3, "s2", "the quick brown fox jumps over the lazy dog"),
         (4, "s2", "yet another unrelated line of words entirely"),
         (5, "s3", "nothing in common with anything else at all")],
        "doc_id long, source string, text string")
    batch = sorted(tuple(r) for r in
                   source_overlap_minhash(docs, num_hashes=8).collect())
    src = os.path.join(tmp_out, "sig_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (stream_source_signatures(stream, num_hashes=8)
         .writeStream.format("memory").queryName("src_sigs")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        sig = spark.sql("SELECT * FROM src_sigs")
        streamed = sorted(tuple(r) for r in
                          source_overlap_from_signatures(
                              sig, num_hashes=8).collect())
    finally:
        q.stop()
    assert streamed == batch and len(batch) == 3
