"""URL canonicalization: every normalization rule, edge cases, the
DuckDB twin, and the dedup report."""

from __future__ import annotations

import duckdb
import pytest

from rgd_rnaseq_workflows_spark.operators.urls import (
    canonical_url_sql, url_dedup_report, with_canonical_url)

CASES = [
    # (raw, canonical)
    ("https://Example.COM/p/1?a=1&b=2", "https://example.com/p/1?a=1&b=2"),
    ("https://example.com:443/p/1?b=2&a=1",
     "https://example.com/p/1?a=1&b=2"),
    ("https://www.example.com/p/1/?a=1&b=2&utm_source=x",
     "https://example.com/p/1?a=1&b=2"),
    ("https://example.com/p/1?a=1&b=2#frag",
     "https://example.com/p/1?a=1&b=2"),
    ("http://example.com:80/p/1?utm_campaign=y&b=2&a=1",
     "http://example.com/p/1?a=1&b=2"),
    # scheme is semantic: http does NOT merge with https
    ("http://example.com/p/1?a=1&b=2", "http://example.com/p/1?a=1&b=2"),
    # non-default port kept
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com:8080/", "http://example.com:8080/"),
    # bare host / empty path -> '/'
    ("https://Example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com///", "https://example.com/"),
    # all params tracking -> query dropped entirely
    ("https://example.com/a?utm_source=x&utm_medium=y",
     "https://example.com/a"),
    # fragment only
    ("https://example.com/a#sec", "https://example.com/a"),
    # empty params pruned, ordering bytewise
    ("https://example.com/a?z=1&&y=2", "https://example.com/a?y=2&z=1"),
    # www kept when mid-host, stripped only as prefix
    ("https://www.wwwish.com/a", "https://wwwish.com/a"),
    ("https://notwww.com/a", "https://notwww.com/a"),
    # a second '://' (redirect target) or '?' must be PRESERVED —
    # truncating would merge genuinely different resources
    ("https://a.com/r?to=https://x.com", "https://a.com/r?to=https://x.com"),
    ("https://a.com/r?to=https://y.com", "https://a.com/r?to=https://y.com"),
    ("https://a.com/p?a=1?b=2", "https://a.com/p?a=1?b=2"),
    # bare host + query, NO path: the query must NOT fold into the
    # lowercased host — case-distinct queries stay distinct, utm params
    # are stripped and the rest sorted, path normalizes to '/'
    ("https://example.com?q=Paris", "https://example.com/?q=Paris"),
    ("https://Example.com?q=paris", "https://example.com/?q=paris"),
    ("https://example.com?utm_source=x&b=2&a=1",
     "https://example.com/?a=1&b=2"),
    ("https://example.com:443?a=1", "https://example.com/?a=1"),
    ("https://www.example.com?a=1#frag", "https://example.com/?a=1"),
]


def test_canonicalization_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)],
        ["doc_id", "url"])
    got = {r["doc_id"]: r["canonical_url"] for r in
           with_canonical_url(df).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_sql_twin_matches_spark(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)],
        ["doc_id", "url"])
    got = sorted((r["doc_id"], r["canonical_url"]) for r in
                 with_canonical_url(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE urls(doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?, ?)",
                    [(i, raw) for i, (raw, _) in enumerate(CASES)])
    exp = sorted(tuple(r) for r in con.execute(
        canonical_url_sql("urls", "url", "doc_id")).fetchall())
    assert got == exp


def test_plan_is_pure_projection(spark):
    """No shuffle, no Python: canonicalization must stay a single
    codegen projection."""
    df = spark.createDataFrame([(1, "https://a.com/x")],
                               ["doc_id", "url"])
    plan = (with_canonical_url(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_report_groups_refetches(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES[:5])]
    got = {r["canonical_url"]: r for r in
           url_dedup_report(spark.createDataFrame(
               rows, ["doc_id", "url"])).collect()}
    https = got["https://example.com/p/1?a=1&b=2"]
    assert https["n_docs"] == 4 and https["n_distinct_raw"] == 4
    assert https["keeper_id"] == 0
    http = got["http://example.com/p/1?a=1&b=2"]
    assert http["n_docs"] == 1 and http["keeper_id"] == 4


@pytest.mark.parametrize("weird", [
    "https://example.com/a?a=1#f1#f2",        # repeated '#'
    "https://example.com/a/b/c//",            # inner + trailing slashes
    "HTTPS://WWW.EXAMPLE.COM:443",            # everything at once
])
def test_twin_agrees_on_weird_inputs(spark, weird):
    df = spark.createDataFrame([(1, weird)], ["doc_id", "url"])
    [got] = [r["canonical_url"] for r in
             with_canonical_url(df).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE urls(doc_id BIGINT, url VARCHAR)")
    con.execute("INSERT INTO urls VALUES (1, ?)", [weird])
    [(_, exp)] = con.execute(
        canonical_url_sql("urls", "url", "doc_id")).fetchall()
    assert got == exp


def test_canonicalization_is_idempotent_on_canonical_forms(spark):
    """Re-canonicalizing a canonical URL is a no-op — crawl systems
    apply the normalizer at multiple pipeline stages, so the canonical
    set must be a fixpoint."""
    canons = sorted({want for _, want in CASES})
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(canons)], ["doc_id", "url"])
    got = {r["url"]: r["canonical_url"] for r in
           with_canonical_url(df).collect()}
    assert got == {c: c for c in canons}


def test_host_split_is_leakage_free_by_construction(spark):
    """Every page of a host lands in exactly one split, and all three
    splits are populated across enough hosts."""
    from rgd_rnaseq_workflows_spark.registry import REGISTRY
    rep = REGISTRY["split_host_assign"].fn(
        spark, "/root/testdata/sf0.001").collect()
    by_host = {}
    for r in rep:
        by_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_host.values())
