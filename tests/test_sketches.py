"""Portable HLL sketch: register semantics, merge property, accuracy."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.sketches import (
    hll_distinct, hll_estimate, hll_registers, hll_registers_sql,
    relative_error_bound)


@pytest.fixture(scope="module")
def ids_df(spark):
    # 5000 rows over 1200 distinct keys
    return spark.range(5000).select(
        (F.col("id") % 1200).cast("string").alias("k"))


def test_estimate_within_error_bound(spark, ids_df):
    for p in (8, 10):
        row = hll_distinct(ids_df, "k", p=p).collect()[0]
        err = abs(row.estimate - 1200) / 1200
        # 3σ of the theoretical 1.04/√m relative error
        assert err < 3 * relative_error_bound(p), (p, row.estimate)


def test_registers_match_duckdb(spark, ids_df, tmp_path):
    path = str(tmp_path / "ids.parquet")
    ids_df.write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    oracle = {(b, r) for b, r in con.execute(
        hll_registers_sql("t", "k", p=8)).fetchall()}
    got = {(r.bucket, r.register)
           for r in hll_registers(ids_df, "k", p=8).collect()}
    assert got == oracle


def test_merge_by_register_max(spark, ids_df):
    """Sketch of a union == element-wise max of the parts' sketches —
    the property that lets daily sketches roll up without reprocessing."""
    a = ids_df.filter(F.col("k").cast("long") % 2 == 0)
    b = ids_df.filter(F.col("k").cast("long") % 2 == 1)
    merged_regs = (hll_registers(a, "k", p=8)
                   .unionByName(hll_registers(b, "k", p=8))
                   .groupBy("bucket")
                   .agg(F.max("register").alias("register")))
    whole = hll_estimate(hll_registers(ids_df, "k", p=8), p=8).collect()[0]
    via_merge = hll_estimate(merged_regs, p=8).collect()[0]
    assert whole == via_merge


def test_duplicates_do_not_move_estimate(spark):
    once = spark.range(300).select(F.col("id").cast("string").alias("k"))
    many = spark.range(3000).select(
        (F.col("id") % 300).cast("string").alias("k"))
    e1 = hll_distinct(once, "k", p=8).collect()[0].estimate
    e2 = hll_distinct(many, "k", p=8).collect()[0].estimate
    assert e1 == e2


def test_p_out_of_range_raises(spark, ids_df):
    with pytest.raises(ValueError):
        hll_registers(ids_df, "k", p=13)


def test_error_bound_formula():
    assert math.isclose(relative_error_bound(8), 1.04 / 16)


def test_grouped_registers_one_shuffle(spark, ids_df):
    """Grouped sketches: per-group estimates match per-group ungrouped
    runs, and the plan has a single Exchange (group keys ride the
    register aggregation)."""
    from pyspark.sql import functions as F2
    g = ids_df.withColumn("grp", (F2.col("k").cast("long") % 3))
    grouped = hll_distinct(g, "k", p=8, by=("grp",))
    per_group = {r.grp: r.estimate for r in grouped.collect()}
    for grp in (0, 1, 2):
        solo = hll_distinct(g.filter(F2.col("grp") == grp), "k", p=8) \
            .collect()[0].estimate
        assert per_group[grp] == solo
    plan = hll_registers(g, "k", p=8, by=("grp",)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


# --- Count-Min Sketch --------------------------------------------------------

def test_cms_never_underestimates(spark):
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        cms_estimate, cms_sketch)
    # zipf-ish: value v appears (2000 // (v+1)) times
    from pyspark.sql import functions as F2
    vals = spark.range(60).selectExpr(
        "explode(sequence(1, cast(2000 / (id + 1) as int))) as rep",
        "cast(id as string) as k").select("k")
    sk = cms_sketch(vals, "k", depth=4, width=256)
    keys = vals.distinct()
    exact = {r.k: r.n for r in
             vals.groupBy("k").agg(F2.count("*").alias("n")).collect()}
    est = {r.k: r.cms_estimate for r in
           cms_estimate(sk, keys, "k", depth=4, width=256).collect()}
    n_total = sum(exact.values())
    for k, n in exact.items():
        assert est[k] >= n                      # never under
        assert est[k] - n <= 0.1 * n_total      # loose eps*N bound


def test_cms_merge_by_counter_add(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import cms_sketch
    vals = spark.range(3000).select(
        (F2.col("id") % 37).cast("string").alias("k"))
    a = vals.filter(F2.col("id") % 2 == 0)
    b = vals.filter(F2.col("id") % 2 == 1)
    whole = {(r.row, r.pos): r.counter
             for r in cms_sketch(vals, "k", 4, 128).collect()}
    merged = {(r.row, r.pos): r.counter for r in
              (cms_sketch(a, "k", 4, 128)
               .unionByName(cms_sketch(b, "k", 4, 128))
               .groupBy("row", "pos")
               .agg(F2.sum("counter").cast("long").alias("counter"))
               .collect())}
    assert whole == merged


def test_cms_bad_params_raise(spark):
    import pytest as pt
    from rgd_rnaseq_workflows_spark.operators.sketches import cms_sketch
    df = spark.range(5).selectExpr("cast(id as string) as k")
    with pt.raises(ValueError):
        cms_sketch(df, "k", depth=0)


# --- log2 quantile sketch ----------------------------------------------------

def test_log2_quantiles_within_factor_two(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        log2_quantile_estimate, log2_quantile_sketch)
    df = spark.range(1, 10001).select((F2.col("id") / 10.0).alias("x"))
    sk = log2_quantile_sketch(df, "x", scale=100)
    est = {r.percentile: r.est
           for r in log2_quantile_estimate(sk, [50, 90, 99],
                                           scale=100).collect()}
    exact = {50: 500.05, 90: 900.0, 99: 990.0}
    for p, t in exact.items():
        assert t / 2 <= est[p] <= 2 * t, (p, est[p], t)


def test_log2_sketch_merges_by_count_add(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        log2_quantile_estimate, log2_quantile_sketch)
    df = spark.range(1, 5001).select((F2.col("id") % 997 + 1.0).alias("x"))
    a = df.limit(2500)
    whole = log2_quantile_sketch(df, "x")
    # split/merge: sketch halves then add counts
    b = df.subtract(a.limit(0)).exceptAll(a)
    merged = (log2_quantile_sketch(a, "x")
              .unionByName(log2_quantile_sketch(b, "x"))
              .groupBy("bucket").agg(F2.sum("n").cast("long").alias("n")))
    e1 = {r.percentile: r.est for r in
          log2_quantile_estimate(whole, [50, 95]).collect()}
    e2 = {r.percentile: r.est for r in
          log2_quantile_estimate(merged, [50, 95]).collect()}
    assert e1 == e2


def test_grouped_cms_equals_per_group(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        cms_estimate, cms_sketch)
    df = spark.range(2000).select(
        (F2.col("id") % 2).alias("g"),
        (F2.col("id") % 23).cast("string").alias("k"))
    sk = cms_sketch(df, "k", depth=3, width=64, by=("g",))
    est = {(r.g, r.k): r.cms_estimate for r in
           cms_estimate(sk, df.distinct(), "k", depth=3, width=64,
                        by=("g",)).collect()}
    for g in (0, 1):
        solo = cms_sketch(df.filter(F2.col("g") == g), "k",
                          depth=3, width=64)
        es = {r.k: r.cms_estimate for r in
              cms_estimate(solo, df.filter(F2.col("g") == g)
                           .select("k").distinct(), "k",
                           depth=3, width=64).collect()}
        for k, v in es.items():
            assert est[(g, k)] == v


def test_grouped_log2_sketch_counts(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        log2_quantile_sketch)
    df = spark.range(1, 1001).select(
        (F2.col("id") % 3).alias("g"), (F2.col("id") * 1.0).alias("x"))
    sk = log2_quantile_sketch(df, "x", by=("g",))
    total = sk.groupBy("g").agg(F2.sum("n").alias("n")).collect()
    counts = {r.g: r.n for r in total}
    assert sum(counts.values()) == 1000
    assert set(counts) == {0, 1, 2}


def test_grouped_log2_estimate_equals_per_group(spark):
    from pyspark.sql import functions as F2
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        log2_quantile_estimate, log2_quantile_sketch)
    df = spark.range(1, 4001).select(
        (F2.col("id") % 2).alias("g"),
        (F2.col("id") * (F2.col("id") % 2 * 9 + 1) * 1.0).alias("x"))
    grouped = log2_quantile_estimate(
        log2_quantile_sketch(df, "x", by=("g",)), [50, 95], by=("g",))
    got = {(r.g, r.percentile): r.est for r in grouped.collect()}
    for g in (0, 1):
        solo = log2_quantile_estimate(
            log2_quantile_sketch(df.filter(F2.col("g") == g), "x"),
            [50, 95])
        for r in solo.collect():
            assert got[(g, r.percentile)] == r.est


# --- hll_merge (incremental rollup) ---------------------------------------------

def test_hll_merge_bit_identical_to_single_pass(spark):
    """Registers merged by max across arbitrary splits equal the
    single-pass registers of the union — the mergeability contract."""
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        hll_merge, hll_registers)
    df = spark.range(0, 3000).selectExpr("id", "id % 7 AS g")
    parts = [df.filter(f"id % 3 = {i}") for i in range(3)]
    merged = hll_merge([hll_registers(p, "id", p=6) for p in parts])
    single = hll_registers(df, "id", p=6)
    assert sorted((r.bucket, r.register) for r in merged.collect()) == \
        sorted((r.bucket, r.register) for r in single.collect())


def test_hll_merge_idempotent_and_grouped(spark):
    """Re-merging the same sketch changes nothing (max idempotence —
    replay-safe), and grouped sketches merge per group."""
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        hll_estimate, hll_merge, hll_registers)
    df = spark.range(0, 500).selectExpr("id", "id % 2 AS g")
    regs = hll_registers(df, "id", p=5, by=("g",))
    twice = hll_merge([regs, regs], by=("g",))
    assert sorted(map(tuple, regs.collect())) == \
        sorted(map(tuple, twice.collect()))
    est = {r.g: r.estimate for r in
           hll_estimate(twice, p=5, by=("g",)).collect()}
    assert set(est) == {0, 1}


def test_hll_merge_validates_input():
    import pytest
    from rgd_rnaseq_workflows_spark.operators.sketches import hll_merge
    with pytest.raises(ValueError):
        hll_merge([])


def test_cms_and_log2q_merge_split_invariant(spark):
    """Counter-add merges across arbitrary splits equal the single-pass
    sketch of the union — exactly (integer counters)."""
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        cms_merge, cms_sketch, log2_quantile_sketch, log2q_merge)
    df = spark.range(0, 2000).selectExpr("id", "id % 13 AS k",
                                         "CAST(id % 97 AS DOUBLE) AS v")
    parts = [df.filter(f"id % 4 = {i}") for i in range(4)]

    m_cms = cms_merge([cms_sketch(p, "k", depth=3, width=32)
                       for p in parts])
    s_cms = cms_sketch(df, "k", depth=3, width=32)
    assert sorted(map(tuple, m_cms.collect())) == \
        sorted(map(tuple, s_cms.collect()))

    m_q = log2q_merge([log2_quantile_sketch(p, "v") for p in parts])
    s_q = log2_quantile_sketch(df, "v")
    assert sorted(map(tuple, m_q.collect())) == \
        sorted(map(tuple, s_q.collect()))


def test_sketch_merge_validates_input():
    import pytest
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        cms_merge, log2q_merge)
    with pytest.raises(ValueError):
        cms_merge([])
    with pytest.raises(ValueError):
        log2q_merge([])
