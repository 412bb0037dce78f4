"""Association-rule mining: hand-checked lift, min-support pruning,
SQL-twin equality."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.baskets import (
    association_rules, association_rules_sql)


def test_hand_computed_lift_and_support(spark):
    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {4} x1  -> n=6
    rows = ([(f"b{i}", x) for i in range(3) for x in (1, 2)]
            + [("c0", 1), ("c0", 3), ("d0", 2), ("d0", 3), ("e0", 4)])
    df = spark.createDataFrame(rows, "bk string, it long")
    out = association_rules(df, "bk", "it", min_support=2,
                            top_k=10).collect()
    # only (1,2) has support >= 2
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_both"]) == (1, 2, 3)
    assert r["n_a"] == 4 and r["n_b"] == 4
    # lift = 6*3/(4*4) = 1.125 -> 1125000 ppm
    assert r["lift_ppm"] == 1_125_000
    assert r["support_ppm"] == 3 * 1_000_000 // 6
    assert r["confidence_ppm"] == 3 * 1_000_000 // 4


def test_within_basket_duplicates_ignored(spark):
    rows = [("b", 1), ("b", 1), ("b", 2), ("c", 1), ("c", 2)]
    df = spark.createDataFrame(rows, "bk string, it long")
    out = association_rules(df, "bk", "it", min_support=1).collect()
    assert out[0]["n_both"] == 2 and out[0]["n_a"] == 2


def test_matches_duckdb_twin(spark):
    import duckdb
    rows = [(i % 37, (i * 7) % 23) for i in range(500)]
    df = spark.createDataFrame(rows, "bk long, it long")
    got = [tuple(r) for r in
           association_rules(df, "bk", "it", min_support=3,
                             top_k=15).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (bk BIGINT, it BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(association_rules_sql(
        "t", "bk", "it", min_support=3, top_k=15)).fetchall()]
    assert got == exp
