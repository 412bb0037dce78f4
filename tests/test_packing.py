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


def test_shard_manifest_diff_statuses(spark):
    """Known-churn diff: an edited doc flips its shard to CHANGED, a
    deleted doc flips count (CHANGED), untouched shards are UNCHANGED;
    an emptied shard reads GONE, a fresh one NEW."""
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.packing import (
        shard_fingerprints, shard_manifest_diff)

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(200)],
        "doc_id long, text string")
    # find one doc per shard so churn is targeted, not accidental
    fp = {r["shard"]: r for r in
          shard_fingerprints(docs, n_shards=8).collect()}
    assert len(fp) == 8
    # edit the docs of shard s_edit; delete all docs of shard s_gone
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    with_shard = docs.withColumn(
        "shard", F.pmod(md5_long(F.col("doc_id").cast("string"),
                                 seed=11), F.lit(8)).cast("int"))
    s_edit, s_gone = 0, 1
    new = (with_shard.filter(F.col("shard") != s_gone)
           .select("doc_id",
                   F.when(F.col("shard") == s_edit,
                          F.concat("text", F.lit(" v2")))
                   .otherwise(F.col("text")).alias("text")))
    rep = {r["shard"]: r for r in
           shard_manifest_diff(docs, new, n_shards=8).collect()}
    assert rep[s_edit]["status"] == "CHANGED"
    assert rep[s_edit]["old_docs"] == rep[s_edit]["new_docs"]
    assert rep[s_gone]["status"] == "GONE" and rep[s_gone]["new_docs"] == 0
    for s in range(2, 8):
        assert rep[s]["status"] == "UNCHANGED" and rep[s]["d_tokens"] == 0
    # NEW: a shard appearing only in the new snapshot
    extra = spark.createDataFrame([(10_000 + i, "fresh doc")
                                   for i in range(50)],
                                  "doc_id long, text string")
    rep2 = {r["shard"]: r["status"] for r in
            shard_manifest_diff(
                docs.filter(F.lit(False)), extra, n_shards=8).collect()}
    assert set(rep2.values()) == {"NEW"}


def test_padding_report_hand_computed(spark):
    from rgd_rnaseq_workflows_spark.operators.packing import padding_report
    # token lengths: 1, 2, 3, 5, 9, 20 (ctx=8 truncates 9 and 20 to 8)
    rows = [(i, " ".join(["w"] * n))
            for i, n in enumerate([1, 2, 3, 5, 9, 20])]
    rows.append((9, "   "))  # empty after trim: excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r["bucket"]: r for r in
           padding_report(docs, ctx=8, batch_size=2).collect()}
    assert set(rep) == {1, 2, 4, 8}
    assert rep[1]["n_docs"] == 1 and rep[1]["pad_tokens"] == 0
    assert rep[2]["n_docs"] == 1 and rep[2]["pad_tokens"] == 0
    # len 3 -> bucket 4 pads 1
    assert rep[4]["n_docs"] == 1 and rep[4]["pad_tokens"] == 1
    # lens 5, 8, 8 in bucket 8: pads 3+0+0, truncs 1+12, 2 batches of 2
    assert rep[8]["n_docs"] == 3 and rep[8]["n_batches"] == 2
    assert rep[8]["eff_tokens"] == 21 and rep[8]["pad_tokens"] == 3
    assert rep[8]["trunc_tokens"] == 13
    assert rep[8]["pad_bp"] == 10000 * 3 // 24


def test_padding_report_rejects_non_pow2_ctx(spark):
    import pytest
    from rgd_rnaseq_workflows_spark.operators.packing import padding_report
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        padding_report(docs, ctx=100)
