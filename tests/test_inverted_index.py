"""Persisted inverted (BM25) index: layout on disk, probe pushdown,
score parity with the in-query BM25 path, and incremental appends."""

from __future__ import annotations

import glob
import os
import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.inverted_index import (
    append_to_inverted_index, bm25_index_topk, bm25_index_topk_batch,
    read_inverted_meta, write_inverted_index)
from rgd_rnaseq_workflows_spark.operators.retrieval import bm25_topk


def _corpus(spark, n=80, seed=23):
    rng = random.Random(seed)
    vocab = ["w%d" % i for i in range(120)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(8, 40))))
            for i in range(n)]
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def test_layout_and_meta(spark, tmp_path):
    rows, docs = _corpus(spark)
    path = str(tmp_path / "inv")
    write_inverted_index(docs, path, num_buckets=8)
    dirs = [os.path.basename(d) for d in
            glob.glob(f"{path}/postings/_epoch=*/_tb=*")]
    assert dirs and all(int(d.split("=")[1]) in range(8) for d in dirs)
    n_docs, total_len, nb = read_inverted_meta(spark, path)
    assert n_docs == len(rows)
    assert total_len == sum(len(t.split()) for _, t in rows)
    assert nb == 8
    # inside a bucket directory the rows are term-sorted (footer
    # min/max pruning over the probe's term IN-list relies on this)
    some = glob.glob(f"{path}/postings/_epoch=*/_tb=*/*.parquet")[:3]
    for f in some:
        ts = [r["term"] for r in
              spark.read.parquet(f).select("term").collect()]
        assert ts == sorted(ts)


def test_probe_matches_inquery_bm25(spark, tmp_path):
    """The persisted probe returns exactly the in-query bm25_topk rows
    (same micro-unit scores, same tie-break), and the scan carries both
    the partition and the pushed term predicates."""
    rows, docs = _corpus(spark)
    path = str(tmp_path / "inv2")
    write_inverted_index(docs, path, num_buckets=8)
    query = "w1 w7 w42 w99"
    got = bm25_index_topk(spark, path, query, k=12)
    want = bm25_topk(docs, query, k=12)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "PushedFilters" in plan and "term" in plan


def test_probe_empty_query_yields_nothing(spark, tmp_path):
    rows, docs = _corpus(spark, n=20)
    path = str(tmp_path / "inv3")
    write_inverted_index(docs, path, num_buckets=4)
    assert bm25_index_topk(spark, path, "   ").count() == 0
    # a query of terms absent from the corpus also returns nothing
    assert bm25_index_topk(spark, path, "zz yy").count() == 0


def test_append_equals_rebuild_and_never_rewrites(spark, tmp_path):
    """Appending a delta equals rebuilding the index over the union —
    df/N/avgdl all shift correctly — and existing posting files are
    never rewritten."""
    rows, docs = _corpus(spark, n=60)
    delta = spark.createDataFrame(
        [(1000 + i, "w1 w2 w3 w1") for i in range(10)],
        ["doc_id", "text"])
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    write_inverted_index(docs, p_inc, num_buckets=8)
    before = set(glob.glob(f"{p_inc}/postings/_epoch=*/_tb=*/*.parquet"))
    append_to_inverted_index(delta, p_inc)
    after = set(glob.glob(f"{p_inc}/postings/_epoch=*/_tb=*/*.parquet"))
    assert before <= after and len(after) > len(before)
    write_inverted_index(docs.unionByName(delta), p_full, num_buckets=8)
    q = "w1 w2 w50"
    got = [tuple(r) for r in
           bm25_index_topk(spark, p_inc, q, k=15).collect()]
    want = [tuple(r) for r in
            bm25_index_topk(spark, p_full, q, k=15).collect()]
    assert got == want
    assert read_inverted_meta(spark, p_inc) == \
        read_inverted_meta(spark, p_full)


def test_batch_matches_per_query(spark, tmp_path):
    rows, docs = _corpus(spark)
    path = str(tmp_path / "inv4")
    write_inverted_index(docs, path, num_buckets=8)
    qs = [(1, "w1 w7"), (2, "w42 w99 w3"), (3, "w5")]
    qdf = spark.createDataFrame(qs, ["qid", "query"])
    got = bm25_index_topk_batch(spark, qdf, path, k=7)
    for qid, query in qs:
        g = [(r["doc_id"], r["n_terms_hit"], r["bm25"]) for r in
             got.filter(F.col("qid") == qid)
             .orderBy("rank").collect()]
        w = [(r["doc_id"], r["n_terms_hit"], r["bm25"]) for r in
             bm25_index_topk(spark, path, query, k=7).collect()]
        assert g == w


def test_bm25_index_cli_build_and_probe(spark, tmp_path):
    """e2e: --bm25-index persists the curated corpus's posting-list
    layout; probe-bm25 ranks the term-heavy doc first through the
    CLI."""
    import glob as _glob

    from rgd_rnaseq_workflows_spark import run_corpus

    filler = ("the and of to in is it a for on " +
              " ".join("pad%d" % i for i in range(10)))
    rows = [(1, "en", "web", "spark spark spark shuffle " + filler),
            (2, "en", "web", "spark join " + filler),
            (3, "en", "web", "totally unrelated words here " + filler)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source",
                                        "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "corpus_out")
    idx = str(tmp_path / "bm25_idx")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.99",
                          "--bm25-index", idx, "--bm25-buckets", "4"])
    assert rc == 0
    assert _glob.glob(f"{idx}/postings/_epoch=*/_tb=*")

    probe_out = str(tmp_path / "probe_out")
    rc = run_corpus.main(["probe-bm25", "--index", idx,
                          "--query", "spark shuffle", "--k", "5",
                          "--out", probe_out])
    assert rc == 0
    [tsv] = _glob.glob(f"{probe_out}/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    top_doc = int(lines[1].split("\t")[0])
    assert top_doc == 1            # tf-heavy + both terms hit
    ranked = [int(ln.split("\t")[0]) for ln in lines[1:]]
    assert 3 not in ranked         # no query term -> no posting row


def test_batch_empty_query_set_keeps_real_schema(spark, tmp_path):
    """A batch whose queries tokenize to nothing returns an EMPTY frame
    with the real output schema — qid keeps the caller's type."""
    rows, docs = _corpus(spark, n=10)
    path = str(tmp_path / "inv5")
    write_inverted_index(docs, path, num_buckets=4)
    qdf = spark.createDataFrame([("qa", " "), ("qb", "")],
                                ["qid", "query"])
    out = bm25_index_topk_batch(spark, qdf, path, k=3)
    assert out.count() == 0
    assert [f.dataType.simpleString() for f in out.schema.fields] == \
        ["string", "bigint", "bigint", "double", "int"]


def test_batch_and_single_agree_on_tab_whitespace(spark, tmp_path):
    rows, docs = _corpus(spark, n=30)
    path = str(tmp_path / "inv6")
    write_inverted_index(docs, path, num_buckets=4)
    q = "w1\tw7\n w3"
    qdf = spark.createDataFrame([(1, q)], ["qid", "query"])
    got = [(r["doc_id"], r["bm25"]) for r in
           bm25_index_topk_batch(spark, qdf, path, k=6)
           .orderBy("rank").collect()]
    want = [(r["doc_id"], r["bm25"]) for r in
            bm25_index_topk(spark, path, q, k=6).collect()]
    assert got == want and got
