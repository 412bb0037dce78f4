"""Corpus snapshot diff: label correctness on a handcrafted pair."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.snapshot import (
    snapshot_diff, snapshot_diff_report)


def test_diff_labels(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed"), (4, "brand new")],
        "doc_id long, text string")
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "modified", 3: "removed", 4: "added"}
    rep = {r["change"]: r["n_docs"]
           for r in snapshot_diff_report(old, new).collect()}
    assert rep == {"unchanged": 1, "modified": 1, "removed": 1, "added": 1}


def test_diff_join_moves_fingerprints_not_text(spark):
    # the plan projects md5(text) BEFORE the join — text never crosses
    # the exchange
    old = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (snapshot_diff(old, new)
            ._jdf.queryExecution().executedPlan().toString())
    # fingerprint columns exist below the join; "text" appears only in
    # the two scans + the two md5 projections, never in join output
    assert "md5" in plan and "_fa" in plan and "_fb" in plan
    assert plan.count("text") <= 4


def test_snapshot_apply_merge_semantics(spark):
    from rgd_rnaseq_workflows_spark.operators.snapshot import snapshot_apply
    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string")
    changes = spark.createDataFrame(
        [(2, "delete", "ignored"), (3, "upsert", "three-v2"),
         (9, "upsert", "nine")], "doc_id long, op string, text string")
    out = {r.doc_id: r.text
           for r in snapshot_apply(base, changes).collect()}
    assert out == {1: "one", 3: "three-v2", 9: "nine"}


def test_snapshot_apply_validates(spark):
    import pytest as pt
    from rgd_rnaseq_workflows_spark.operators.snapshot import snapshot_apply
    base = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pt.raises(ValueError, match="missing columns"):
        snapshot_apply(base, spark.createDataFrame(
            [(1, "delete")], "doc_id long, op string"))
    with pt.raises(ValueError, match="unknown op"):
        snapshot_apply(base, spark.createDataFrame(
            [(1, "replace", "y")], "doc_id long, op string, text string"))


def test_snapshot_apply_rejects_null_op(spark):
    """NULL op must raise like any unknown op (ADVICE r4: `~isin` is
    NULL for NULL, which previously let the row slip through and emit
    an all-NULL payload)."""
    import pytest as pt
    from rgd_rnaseq_workflows_spark.operators.snapshot import snapshot_apply
    base = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    changes = spark.createDataFrame(
        [(2, None, "y")], "doc_id long, op string, text string")
    with pt.raises(ValueError, match="unknown op"):
        snapshot_apply(base, changes)


def test_token_drift_tv_matches_python(spark):
    """TV distance and top movers agree with a direct computation."""
    from collections import Counter

    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        token_drift_report, top_drift_terms)
    old_texts = ["a a b c", "a b d"]
    new_texts = ["a b b e", "b e e"]
    old = spark.createDataFrame(list(enumerate(old_texts)),
                                "doc_id long, text string")
    new = spark.createDataFrame(list(enumerate(new_texts)),
                                "doc_id long, text string")
    cp = Counter(t for x in old_texts for t in x.split())
    cq = Counter(t for x in new_texts for t in x.split())
    n1, n2 = sum(cp.values()), sum(cq.values())
    vocab = set(cp) | set(cq)
    num = sum(abs(cp[t] * n2 - cq[t] * n1) for t in vocab)

    r = token_drift_report(old, new).collect()[0]
    assert (r.n_terms_old, r.n_terms_new) == (len(cp), len(cq))
    assert r.n_shared == len(set(cp) & set(cq))
    assert (r.n_tokens_old, r.n_tokens_new) == (n1, n2)
    assert r.tv_distance == round(num / (2.0 * n1 * n2), 6)
    assert 0.0 <= r.tv_distance <= 1.0

    top = top_drift_terms(old, new, k=3).collect()
    want = sorted(vocab, key=lambda t: (-abs(cp[t] * n2 - cq[t] * n1), t))[:3]
    assert [t.term for t in top] == want
    for t in top:
        exp_dir = "down" if cp[t.term] * n2 >= cq[t.term] * n1 else "up"
        assert t.direction == exp_dir


def test_token_drift_identical_snapshots_is_zero(spark):
    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        token_drift_report)
    d = spark.createDataFrame([(0, "x y z"), (1, "x q")],
                              "doc_id long, text string")
    r = token_drift_report(d, d).collect()[0]
    assert r.tv_distance == 0.0 and r.n_shared == r.n_terms_old


def test_oov_empty_probe_emits_zero_row(spark):
    """Empty probe → (0, 0, NULL) row, not NULLs that silently pass a
    rate gate (review r5)."""
    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        oov_rate_report)
    ref = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = oov_rate_report(empty, ref).collect()[0]
    assert (r.n_tokens, r.n_oov, r.oov_rate6) == (0, 0, None)


def test_oov_sql_twin_matches_on_empty_probe():
    """ADVICE r5: the DuckDB twin must coalesce n_oov to 0 on an empty
    probe — SUM over zero rows is NULL in SQL, but the Spark contract
    (and the gate consumers) say 0."""
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.snapshot import oov_rate_sql
    con = duckdb.connect()
    con.execute("CREATE TABLE ref_t(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO ref_t VALUES (0, 'a b')")
    con.execute("CREATE TABLE probe_t(doc_id BIGINT, text VARCHAR)")
    n_tokens, n_oov, rate = con.execute(
        oov_rate_sql("probe_t", "ref_t")).fetchone()
    assert (n_tokens, n_oov, rate) == (0, 0, None)


def test_ks_drift_known_answer(spark):
    """Hand-computed two-sample KS: old = [1,1,2,3], new = [2,3,3,4].
    CDF numerators (x n_old*n_new = 16): at v=1 |2*4-0*4|=8, v=2
    |3*4-1*4|=8, v=3 |4*4-3*4|=4, v=4 0 -> ks_num=8 at v=1 (smallest
    attaining), ks_ppm = 8*1e6 // 16 = 500000 (D = 0.5)."""
    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        ks_drift_report)
    old = spark.createDataFrame([(1,), (1,), (2,), (3,)], "x long")
    new = spark.createDataFrame([(2,), (3,), (3,), (4,)], "x long")
    [r] = ks_drift_report(old, new, "x").collect()
    assert (r.n_old, r.n_new) == (4, 4)
    assert r.ks_num == "8" and r.ks_ppm == 500000 and r.at_value == 1


def test_ks_drift_identical_distributions_zero(spark):
    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        ks_drift_report)
    d = spark.createDataFrame([(i % 5,) for i in range(50)], "x long")
    [r] = ks_drift_report(d, d, "x").collect()
    assert r.ks_num == "0" and r.ks_ppm == 0


def test_ks_drift_streaming_histograms_equal_batch(spark, tmp_out):
    """The histogram is the mergeable sufficient statistic: streaming
    per-side histograms folded by ks_drift_from_histograms equal the
    batch report over the same rows."""
    import os

    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.snapshot import (
        ks_drift_from_histograms, ks_drift_report)

    rows_old = [(i % 7 + 1,) for i in range(40)]
    rows_new = [(i % 9 + 2,) for i in range(35)]
    old = spark.createDataFrame(rows_old, "x long")
    new = spark.createDataFrame(rows_new, "x long")
    want = [tuple(r) for r in ks_drift_report(old, new, "x").collect()]

    outs = {}
    for side, rows in (("old", rows_old), ("new", rows_new)):
        src = os.path.join(tmp_out, f"ks_{side}_src")
        os.makedirs(src)
        spark.createDataFrame(rows[:20], "x long").coalesce(1) \
            .write.mode("append").parquet(src)
        stream = spark.readStream.schema("x long").parquet(src)
        hist = (stream.groupBy(F.col("x").cast("long").alias("v"))
                .agg(F.count("*").alias(f"_c{side[0]}")))
        q = (hist.writeStream.format("memory")
             .queryName(f"ks_hist_{side}").outputMode("complete")
             .start())
        try:
            q.processAllAvailable()
            spark.createDataFrame(rows[20:], "x long").coalesce(1) \
                .write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
        outs[side] = spark.sql(f"SELECT * FROM ks_hist_{side}") \
            .withColumnRenamed(f"_c{side[0]}",
                               "_co" if side == "old" else "_cn")
    got = [tuple(r) for r in
           ks_drift_from_histograms(outs["old"], outs["new"]).collect()]
    assert got == want
