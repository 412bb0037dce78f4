"""Pareto skyline: brute-force equivalence, tie semantics, plan shape."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.skyline import (
    pareto_skyline, pareto_skyline_sql)


def _brute(rows, dims):
    def better_eq(q, p, c, d):
        return q[c] >= p[c] if d == "max" else q[c] <= p[c]

    def strictly(q, p, c, d):
        return q[c] > p[c] if d == "max" else q[c] < p[c]

    out = []
    for p in rows:
        dominated = any(
            all(better_eq(q, p, c, d) for c, d in dims.items())
            and any(strictly(q, p, c, d) for c, d in dims.items())
            for q in rows)
        if not dominated:
            out.append(p)
    return out


def _run(spark, rows, dims, bins=4):
    df = spark.createDataFrame(
        [(i, *[r[c] for c in dims]) for i, r in enumerate(rows)],
        ["rid"] + list(dims))
    got = pareto_skyline(df, dims, id_col="rid", bins=bins).collect()
    want_ids = {i for i, r in enumerate(rows)
                if r in _brute(rows, dims)}
    # ids are positional; compare the id sets (dims follow from ids)
    exp = set()
    brute = _brute(rows, dims)
    for i, r in enumerate(rows):
        if r in brute:
            exp.add(i)
    assert {r["rid"] for r in got} == exp == want_ids
    for r in got:
        src = rows[r["rid"]]
        for c in dims:
            assert r[c] == src[c]


def test_randomized_matches_brute_force(spark):
    rng = random.Random(7)
    dims = {"a": "max", "b": "min", "c": "max"}
    for trial in range(6):
        n = rng.choice([1, 3, 20, 80])
        rows = [{c: rng.randint(-9, 9) for c in dims} for _ in range(n)]
        _run(spark, rows, dims, bins=rng.choice([1, 2, 5]))


def test_duplicate_optima_all_survive(spark):
    rows = [{"a": 5, "b": 0}, {"a": 5, "b": 0}, {"a": 1, "b": 0}]
    df = spark.createDataFrame(
        [(i, r["a"], r["b"]) for i, r in enumerate(rows)],
        ["rid", "a", "b"])
    got = pareto_skyline(df, {"a": "max", "b": "max"}, id_col="rid")
    assert sorted(r["rid"] for r in got.collect()) == [0, 1]


def test_empty_and_singleton(spark):
    df = spark.createDataFrame([], "rid long, a long")
    assert pareto_skyline(df, {"a": "max"}, id_col="rid").count() == 0
    one = spark.createDataFrame([(0, 3)], ["rid", "a"])
    assert pareto_skyline(one, {"a": "min"}, id_col="rid").count() == 1


def test_min_direction_keeps_original_values(spark):
    rows = [(0, 10, 100), (1, 10, 50), (2, 3, 200)]
    df = spark.createDataFrame(rows, ["rid", "q", "cost"])
    got = {r["rid"]: (r["q"], r["cost"]) for r in pareto_skyline(
        df, {"q": "max", "cost": "min"}, id_col="rid").collect()}
    assert got == {1: (10, 50)}


def test_sql_twin_agrees(spark):
    import duckdb
    rng = random.Random(3)
    dims = {"a": "max", "b": "min"}
    rows = [(i, rng.randint(0, 6), rng.randint(0, 6)) for i in range(60)]
    df = spark.createDataFrame(rows, ["rid", "a", "b"])
    got = sorted((r["rid"], r["a"], r["b"]) for r in
                 pareto_skyline(df, dims, id_col="rid", bins=3).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (rid BIGINT, a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        pareto_skyline_sql("SELECT * FROM t", dims, "rid")).fetchall()))
    assert got == want


def test_plan_has_no_cartesian_or_bnl(spark):
    rows = [(i, i % 7, (i * 3) % 11, i % 5) for i in range(200)]
    df = spark.createDataFrame(rows, ["rid", "a", "b", "c"])
    sky = pareto_skyline(
        df, {"a": "max", "b": "min", "c": "max"}, id_col="rid", bins=4)
    plan = sky._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
