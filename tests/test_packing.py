"""Sequence packing: hand-computed chunk map + bucket-width invariance
(the two-phase prefix sum must equal the single-window form)."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.packing import pack_chunks


@pytest.fixture(scope="module")
def docs_df(spark):
    # token counts: 3, 4, 2, 5, 1, 4  -> offsets 0,3,7,9,14,15
    texts = ["a b c", "a b c d", "a b", "a b c d e", "a", "a b c d"]
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


def test_chunk_map_hand_computed(spark, docs_df):
    # ctx=5: starts 0,3,7,9,14,15 -> chunks 0,0,1,1,2,3
    out = {r.chunk_id: r for r in
           pack_chunks(docs_df, ctx=5, bucket_width=2).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert (out[0].n_docs, out[0].n_tokens,
            out[0].first_doc, out[0].last_doc) == (2, 7, 0, 1)
    assert (out[1].n_docs, out[1].n_tokens) == (2, 7)
    assert (out[2].n_docs, out[2].n_tokens) == (1, 1)
    assert (out[3].n_docs, out[3].first_doc) == (1, 5)


@pytest.mark.parametrize("width", [1, 2, 1000])
def test_bucket_width_invariance(spark, docs_df, width):
    base = sorted(pack_chunks(docs_df, ctx=4, bucket_width=10**6).collect())
    got = sorted(pack_chunks(docs_df, ctx=4, bucket_width=width).collect())
    assert got == base
