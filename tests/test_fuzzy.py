"""Fuzzy linkage: blocking contract, distance band, counts, SQL twin."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.fuzzy import (
    fuzzy_match_keys, fuzzy_match_keys_sql)


@pytest.fixture(scope="module")
def names(spark):
    rows = [("Widget Pro",), ("widget pro",), ("widget prX",),
            ("widget professional",), ("gadget pro",), ("sprocket",),
            ("sprocket ",), ("zzz totally different",), ("",)]
    return spark.createDataFrame(rows, "name string")


def test_normalization_and_band(spark, names):
    got = {(r.val_a, r.val_b): r for r in
           fuzzy_match_keys(names, "name", max_dist=2).collect()}
    # case/trim-normalized: "Widget Pro" == "widget pro" (dist 0,
    # excluded by min_dist=1); prX is one edit away
    assert ("widget pro", "widget prx") in got
    r = got[("widget pro", "widget prx")]
    assert r.dist == 1
    # counts: "widget pro" occurs twice after normalization
    assert r.n_a == 2 and r.n_b == 1
    # gadget/widget differ by 2 edits but share NEITHER 4-prefix nor
    # 4-suffix... suffix " pro" matches -> found
    assert ("gadget pro", "widget pro") in got
    # far value never pairs
    assert not any("zzz" in k[0] or "zzz" in k[1] for k in got)


def test_length_band_excludes(spark, names):
    got = {(r.val_a, r.val_b) for r in
           fuzzy_match_keys(names, "name", max_dist=2).collect()}
    # "widget professional" is 9 edits from "widget pro": excluded
    assert not any("professional" in a or "professional" in b
                   for a, b in got)


def test_shared_both_blocks_deduped(spark):
    df = spark.createDataFrame([("abcdef",), ("abcdxf",)], "name string")
    rows = fuzzy_match_keys(df, "name", max_dist=2).collect()
    assert len(rows) == 1 and rows[0].dist == 1


def test_validation(spark, names):
    with pytest.raises(ValueError):
        fuzzy_match_keys(names, "name", max_dist=1, min_dist=2)
    with pytest.raises(ValueError):
        fuzzy_match_keys_sql("t", "name", block_len=0)


def test_matches_sql_twin(spark):
    import duckdb
    import random
    rng = random.Random(43)
    colors = ["red", "blue", "green", "grey", "gray"]
    items = ["bolt", "bolts", "gear", "gearr", "ring", "rng"]
    rows = [(f"{rng.choice(colors)} {rng.choice(items)}",)
            for _ in range(400)] + [("  Red Bolt ",), ("red bolt",)]
    df = spark.createDataFrame(rows, "name string")
    got = sorted(tuple(r) for r in
                 fuzzy_match_keys(df, "name", max_dist=3).collect())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exp = sorted(tuple(r) for r in con.execute(
        fuzzy_match_keys_sql("t", "name", max_dist=3)).fetchall())
    assert got == exp
    assert len(got) > 0


def test_golden_records_survivorship_election(spark):
    from rgd_rnaseq_workflows_spark.operators.fuzzy import golden_records
    # 'widget' / 'widgit' / 'widgets' fuzzy-cluster; 'sprocket' stands
    # alone.  Brand election: B1 twice vs B2 once -> B1; name election:
    # 'widget' appears twice -> canonical
    rows = [("widget", "B1", 1), ("widgit", "B2", 2),
            ("widgets", "B1", 3), ("widget", "B2", 4),
            ("sprocket", "B9", 5)]
    df = spark.createDataFrame(rows, ["name", "brand", "n"])
    out = golden_records(df, "name", ["brand"], max_dist=2,
                         min_dist=1, block_len=3)
    got = {r["comp"]: (r["n_rows"], r["n_values"], r["canonical_v"],
                       r["brand"]) for r in out.collect()}
    assert got == {"widget": (4, 3, "widget", "B1"),
                   "sprocket": (1, 1, "sprocket", "B9")}


def test_golden_records_tie_breaks_deterministic(spark):
    from rgd_rnaseq_workflows_spark.operators.fuzzy import golden_records
    # equal counts everywhere: canonical name and field value must both
    # fall back to the lexicographically smallest
    rows = [("abcx", "Z", 1), ("abcy", "A", 2)]
    df = spark.createDataFrame(rows, ["name", "brand", "n"])
    out = golden_records(df, "name", ["brand"], max_dist=2,
                         min_dist=1, block_len=3).collect()
    assert len(out) == 1
    assert out[0]["canonical_v"] == "abcx"
    assert out[0]["brand"] == "A"
