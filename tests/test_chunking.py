"""Overlapping RAG chunking: coverage, overlap, stability, edge cases."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(10))
    return spark.createDataFrame(
        [(0, words), (1, "a b c"), (2, ""), (3, "solo")],
        "doc_id long, text string")


def test_chunks_cover_and_overlap(spark, docs):
    out = [r for r in chunk_documents(docs, window=4, stride=3).collect()
           if r.doc_id == 0]
    out.sort(key=lambda r: r.chunk_idx)
    # 10 tokens, window 4, stride 3 → starts 0,3,6 (6+4=10 covers all)
    assert [r.chunk_start for r in out] == [0, 3, 6]
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[1].chunk_text == "w3 w4 w5 w6"        # 1-token overlap
    assert out[2].chunk_text == "w6 w7 w8 w9"
    assert all(r.n_tokens == 4 for r in out)


def test_short_and_empty_docs(spark, docs):
    rows = chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc                            # empty doc: no rows
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "a b c"
    assert by_doc[3][0].n_tokens == 1


def test_no_shuffle_plan(spark, docs):
    plan = chunk_documents(docs, window=4, stride=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_stride_raises(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)
