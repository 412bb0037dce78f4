"""Histogram quantiles: reference equality, edge percents, SQL twin."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
    group_quantiles, group_quantiles_sql)


def _lower_q(vals, p):
    sv = sorted(vals)
    target = -(-len(sv) * p // 100)        # ceil(n*p/100)
    return sv[target - 1]


@pytest.fixture(scope="module")
def data(spark):
    import random
    rng = random.Random(41)
    rows = [(["a", "b", "c"][i % 3], rng.randint(0, 40))
            for i in range(900)]
    return rows, spark.createDataFrame(rows, "grp string, x long")


def test_matches_python_reference(spark, data):
    rows, df = data
    got = {r.grp: r for r in
           group_quantiles(df, "grp", "x", [1, 25, 50, 90, 100])
           .collect()}
    for g in ("a", "b", "c"):
        vals = [x for gg, x in rows if gg == g]
        r = got[g]
        assert r.n_rows == len(vals)
        for p in (1, 25, 50, 90, 100):
            assert r[f"p{p}"] == _lower_q(vals, p), (g, p)


def test_single_value_group(spark):
    df = spark.createDataFrame([("s", 7)] * 5, "grp string, x long")
    [r] = group_quantiles(df, "grp", "x", [50, 100]).collect()
    assert (r.p50, r.p100, r.n_rows) == (7, 7, 5)


def test_validation(spark, data):
    _, df = data
    with pytest.raises(ValueError):
        group_quantiles(df, "grp", "x", [])
    with pytest.raises(ValueError):
        group_quantiles(df, "grp", "x", [0])
    with pytest.raises(ValueError):
        group_quantiles_sql("t", "grp", "x", [101])


def test_matches_sql_twin(spark, data):
    import duckdb
    _, df = data
    got = sorted(tuple(r) for r in
                 group_quantiles(df, "grp", "x", [25, 50, 99]).collect())
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exp = sorted(tuple(r) for r in con.execute(
        group_quantiles_sql("t", "grp", "x", [25, 50, 99])).fetchall())
    assert got == exp


# ---------------------------------------------------------------------------
# distributed global rank + arithmetic ntile (the rfm_segments machinery)
# ---------------------------------------------------------------------------

def test_global_ranks_matches_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        global_ranks)
    import random
    rng = random.Random(7)
    rows = [(f"u{i:04d}", rng.randint(0, 20)) for i in range(500)]
    df = spark.createDataFrame(rows, "u string, m long").repartition(16)
    order = [F.col("m").desc(), F.col("u").asc()]
    got = {r.u: r._rank for r in global_ranks(df, order).collect()}
    ref = {r.u: r.rn for r in df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order))).collect()}
    assert got == ref


def test_ntile_from_rank_matches_spark_ntile(spark):
    """The arithmetic tile equals F.ntile over the same total order for
    awkward (N, n_tiles) shapes — N < n, N % n != 0, N == n."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        global_ranks, ntile_from_rank)
    import random
    rng = random.Random(11)
    for n_rows, n_tiles in [(3, 5), (7, 5), (10, 5), (500, 7), (6, 6)]:
        rows = [(f"u{i:04d}", rng.randint(0, 9)) for i in range(n_rows)]
        df = spark.createDataFrame(rows, "u string, m long")
        order = [F.col("m").desc(), F.col("u").asc()]
        got = {r.u: r.t for r in
               global_ranks(df, order)
               .withColumn("t", ntile_from_rank("_rank", "_n", n_tiles))
               .collect()}
        ref = {r.u: r.t for r in df.withColumn(
            "t", F.ntile(n_tiles).over(Window.orderBy(*order))
            .cast("long")).collect()}
        assert got == ref, (n_rows, n_tiles)


def test_ntile_from_rank_rejects_bad_tiles():
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        ntile_from_rank)
    with pytest.raises(ValueError):
        ntile_from_rank("r", "n", 0)


# --- weighted quantiles -------------------------------------------------------

def test_weighted_quantiles_match_brute_force(spark):
    import random

    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        weighted_group_quantiles)
    rng = random.Random(31)
    rows = [("g" + str(i % 2), rng.randint(0, 15), rng.randint(0, 4))
            for i in range(120)]
    df = spark.createDataFrame(rows, ["src", "v", "w"])
    got = {r["src"]: r.asDict() for r in weighted_group_quantiles(
        df, by="src", value_col="v", weight_col="w",
        percents=[25, 50, 90]).collect()}

    for g in ("g0", "g1"):
        vw = sorted((v, w) for s, v, w in rows if s == g)
        W = sum(w for _, w in vw)
        assert got[g]["total_w"] == W
        for p in (25, 50, 90):
            target = (W * p + 99) // 100
            cum, pick = 0, None
            for v, w in vw:
                cum += w
                if cum >= target:
                    pick = v
                    break
            assert got[g][f"p{p}"] == pick, (g, p)


def test_weighted_quantiles_zero_weights_never_shift_picks(spark):
    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        weighted_group_quantiles)
    # value 1 has weight 0 — the median must skip to value 2
    rows = [("a", 0, 5), ("a", 1, 0), ("a", 2, 5)]
    df = spark.createDataFrame(rows, ["src", "v", "w"])
    r = weighted_group_quantiles(df, "src", "v", "w", [50]).collect()[0]
    assert r["total_w"] == 10 and r["p50"] == 0
    r = weighted_group_quantiles(
        df, "src", "v", "w", [51]).collect()[0]
    assert r["p51"] == 2


def test_weighted_equals_unweighted_at_unit_weight(spark):
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.exact_quantiles import (
        group_quantiles, weighted_group_quantiles)
    rows = [("a", v) for v in [3, 1, 4, 1, 5, 9, 2, 6]]
    df = spark.createDataFrame(rows, ["src", "v"])
    uw = group_quantiles(df, "src", "v", [50, 90]).collect()[0]
    ww = weighted_group_quantiles(
        df.withColumn("w", F.lit(1)), "src", "v", "w",
        [50, 90]).collect()[0]
    assert (uw["p50"], uw["p90"]) == (ww["p50"], ww["p90"])
