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
