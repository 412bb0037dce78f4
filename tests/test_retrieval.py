"""BM25 retrieval + CCNet familiarity buckets."""

from __future__ import annotations

import math

from rgd_rnaseq_workflows_spark.operators.quality import lm_bucket_report
from rgd_rnaseq_workflows_spark.operators.retrieval import bm25_topk


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hash join hash join hash", "en"),
         (2, "hash table scan", "en"),
         (3, "merge sort merge", "en"),
         (4, "nothing relevant here at all", "en"),
         (5, "join", "en")],
        ["doc_id", "text", "lang"])


def test_bm25_ranking_and_exact_score(spark):
    out = bm25_topk(_docs(spark), "hash join", k=10)
    rows = [(r["doc_id"], r["n_terms_hit"], r["bm25"])
            for r in out.collect()]
    ids = [r[0] for r in rows]
    # docs 3/4 have no query term -> absent; doc 1 hits both terms
    assert 3 not in ids and 4 not in ids
    assert ids[0] == 1 and set(ids) == {1, 2, 5}
    assert dict((i, h) for i, h, _ in rows)[1] == 2
    # hand-computed BM25 for doc 5 ("join", dl=1): tf=1, df(join)=2
    # (docs 1 and 5), N=5, total_len=5+3+3+5+1=17
    idf = math.log(1 + (5 - 2 + 0.5) / (2 + 0.5))
    denom = 1 + 1.2 * (1 - 0.75 + 0.75 * (1 * 5 / 17))
    expected = round(round(idf * 1 * 2.2 / denom * 1e6) / 1e6, 6)
    got = dict((i, s) for i, _, s in rows)[5]
    assert abs(got - expected) < 1e-9


def test_bm25_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(
        [(2, "x y", "en"), (1, "x y", "en")], ["doc_id", "text", "lang"])
    out = [r["doc_id"] for r in bm25_topk(docs, "x", k=2).collect()]
    assert out == [1, 2]                      # equal score -> id asc


def test_lm_buckets_partition_and_counts(spark):
    docs = spark.createDataFrame(
        [(i, "a b " * 5 + f"u{i} v{i}", "en") for i in range(9)]
        + [(100 + i, "c d " * 3 + f"w{i} z{i}", "de") for i in range(3)],
        ["doc_id", "text", "lang"])
    out = lm_bucket_report(docs, n_buckets=3)
    rows = {(r["lang"], r["bucket"]): r for r in out.collect()}
    assert {k[0] for k in rows} == {"en", "de"}
    assert sum(r["n_docs"] for k, r in rows.items() if k[0] == "en") == 9
    assert sum(r["n_docs"] for k, r in rows.items() if k[0] == "de") == 3
    # head bucket is at least as familiar as the tail bucket
    assert rows[("en", 1)]["worst_mean"] >= rows[("en", 3)]["best_mean"]
