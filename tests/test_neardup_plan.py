"""Pair-graph reuse: one pair-gen feeds components + pagerank + leakage.

The PPJoin pair generator is the most expensive stage of the near-dup
family; `plans/neardup.py` checkpoints it once and every consumer must
replay the cached edge scan, never the shingle join (VERDICT r4 item 3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.dedup import ngram_jaccard_pairs
from rgd_rnaseq_workflows_spark.plans.neardup import (
    leakage_report, near_dup_pairs_cached, neardup_analysis)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def cached_pairs(docs):
    return near_dup_pairs_cached(docs, shingle_n=2, threshold=0.8)


def test_consumers_scan_cached_edges_not_shingle_join(docs, cached_pairs):
    """Every analysis frame's plan reads the checkpointed RDD; the
    shingle explode + jaccard join appears in NONE of them."""
    reports = neardup_analysis(cached_pairs, docs, pagerank_iters=1)
    for name, df in reports.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan, name
        assert "posexplode" not in plan and "Generate" not in plan, name


def test_analysis_matches_standalone_paths(spark, docs, cached_pairs):
    """Sharing the pair frame must not change any consumer's values:
    keepers == dedup_cluster_keepers's plan, leakage ==
    split_leakage_report's plan, both built from their own pair gen."""
    from rgd_rnaseq_workflows_spark.operators.components import (
        cluster_keepers)
    reports = neardup_analysis(cached_pairs, docs, pagerank_iters=3)

    fresh_pairs = ngram_jaccard_pairs(docs, block_col="lang",
                                      shingle_n=2, threshold=0.8)
    want_keep = {(r.comp, r.n_members, r.keeper_id)
                 for r in cluster_keepers(fresh_pairs).collect()}
    got_keep = {(r.comp, r.n_members, r.keeper_id)
                for r in reports["keepers"].collect()}
    assert got_keep == want_keep and want_keep

    want_leak = {(r.split_lo, r.split_hi): r.n_pairs
                 for r in leakage_report(fresh_pairs, docs).collect()}
    got_leak = {(r.split_lo, r.split_hi): r.n_pairs
                for r in reports["leakage"].collect()}
    assert got_leak == want_leak

    # pagerank ranks sum to ~n_nodes (teleport conservation, fixed-point)
    pr = reports["pagerank"]
    n = pr.count()
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert n > 0 and abs(total - n) / n < 0.2


def test_curation_graph_variant_matches_plain(spark, docs):
    """curate_corpus_graph's curated set is exactly curate_corpus's."""
    from rgd_rnaseq_workflows_spark.plans.corpus import (
        curate_corpus, curate_corpus_graph)
    plain = curate_corpus(docs)
    withg, pairs = curate_corpus_graph(docs)
    assert plain.select("doc_id").exceptAll(
        withg.select("doc_id")).count() == 0
    assert withg.select("doc_id").exceptAll(
        plain.select("doc_id")).count() == 0
    assert set(pairs.columns) >= {"id_a", "id_b"}
