"""Benchmark contamination: planted leaks are flagged, clean docs pass."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.contamination import (
    contamination_report, decontaminate)

BENCH_Q = "what is the capital of france and when was it founded"


def _frames(spark):
    corpus = spark.createDataFrame([
        # doc 1 embeds a full benchmark question — a straight leak
        (1, f"some filler text then {BENCH_Q} and more filler"),
        # doc 2 shares only scattered words, no 3-gram runs
        (2, "the capital city has france in a sentence about nothing"),
        # doc 3 completely unrelated
        (3, "spark plans shuffle data across executor partitions"),
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, BENCH_Q), (101, "name the longest river in europe")],
        ["doc_id", "text"])
    return corpus, bench


def test_planted_leak_flagged(spark):
    corpus, bench = _frames(spark)
    rep = contamination_report(corpus, bench, shingle_n=3)
    rows = {r["doc_id"]: r for r in rep.collect()}
    assert 1 in rows and 3 not in rows
    # the 10-token question contributes 8 distinct 3-grams, all shared
    assert rows[1]["n_shared"] >= 8
    assert 0 < rows[1]["overlap_ratio"] <= 1.0


def test_scattered_words_not_flagged(spark):
    corpus, bench = _frames(spark)
    rep = contamination_report(corpus, bench, shingle_n=3)
    assert 2 not in {r["doc_id"] for r in rep.collect()}


def test_decontaminate_removes_only_leaks(spark):
    corpus, bench = _frames(spark)
    clean = decontaminate(corpus, bench, shingle_n=3)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}


def test_min_shared_threshold(spark):
    corpus, bench = _frames(spark)
    rep = contamination_report(corpus, bench, shingle_n=3, min_shared=100)
    assert rep.count() == 0


def test_corpus_side_never_shuffled_before_match(spark):
    # scale contract: benchmark shingles broadcast; the corpus explode
    # feeds a BroadcastHashJoin — no SortMergeJoin anywhere in the plan
    corpus, bench = _frames(spark)
    plan = (contamination_report(corpus, bench, shingle_n=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cross_source_matrix_planted_leak(spark):
    """A 4-gram block planted in two sources shows up as their shared
    count; unrelated sources never pair."""
    from rgd_rnaseq_workflows_spark.operators.contamination import (
        cross_source_matrix)
    leak = "alpha beta gamma delta epsilon"
    rows = [
        (0, "feedA", f"intro words {leak} trailing stuff here"),
        (1, "feedB", f"{leak} completely different content after"),
        (2, "feedC", "nothing in common with anyone at all kept"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.source_a, r.source_b): r.n_shared
           for r in cross_source_matrix(d, shingle_n=3).collect()}
    # 5-token leak -> 3 distinct 3-grams shared
    assert got == {("feedA", "feedB"): 3}


def test_cross_source_matrix_ignores_blank_docs(spark):
    """Blank documents in two sources must NOT pair them (review r5:
    shingles() emits the full token string for short docs, and empty
    text hashes equal everywhere)."""
    from rgd_rnaseq_workflows_spark.operators.contamination import (
        cross_source_matrix)
    rows = [(0, "feedA", ""), (1, "feedB", ""),
            (2, "feedC", "real shared leak content here today"),
            (3, "feedD", "real shared leak content here tonight")]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.source_a, r.source_b): r.n_shared
           for r in cross_source_matrix(d, shingle_n=3).collect()}
    assert ("feedA", "feedB") not in got
    assert got[("feedC", "feedD")] >= 1
