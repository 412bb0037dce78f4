"""Table profiler: exact null counts, HLL error bound, SQL twin."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.profile import (
    table_profile, table_profile_sql)
from rgd_rnaseq_workflows_spark.operators.sketches import (
    relative_error_bound)


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [(i,
             f"tok{i % 137}" if i % 10 else None,
             ["en", "de", "fr"][i % 3],
             None)
            for i in range(1000)]
    return spark.createDataFrame(
        rows, "id long, word string, lang string, dead string")


def test_counts_exact_and_estimates_bounded(spark, tbl):
    got = {r["column"]: r for r in
           table_profile(tbl, ["id", "word", "lang", "dead"],
                         p=10).collect()}
    assert all(r.n_rows == 1000 for r in got.values())
    assert got["id"].n_null == 0
    assert got["word"].n_null == 100
    assert got["dead"].n_null == 1000
    # all-null column: no registers -> NULL estimate (documented)
    assert got["dead"].n_distinct_est is None
    err = 3 * relative_error_bound(10)
    for cname, true in [("id", 1000), ("word", 137), ("lang", 3)]:
        est = got[cname].n_distinct_est
        assert abs(est - true) <= err * true + 1


def test_deterministic_across_partitionings(spark, tbl):
    a = sorted(tuple(r) for r in
               table_profile(tbl, ["word", "lang"]).collect())
    b = sorted(tuple(r) for r in
               table_profile(tbl.repartition(13), ["word", "lang"])
               .collect())
    assert a == b


def test_matches_sql_twin(spark, tbl):
    import duckdb
    cols = ["id", "word", "lang", "dead"]
    got = sorted((tuple(r) for r in
                  table_profile(tbl, cols, p=9).collect()),
                 key=lambda t: t[0])
    con = duckdb.connect()
    con.register("t", tbl.toPandas())
    exp = sorted((tuple(r) for r in
                  con.execute(table_profile_sql("t", cols, p=9))
                  .fetchall()), key=lambda t: t[0])
    assert got == exp


def test_empty_cols_rejected(spark, tbl):
    with pytest.raises(ValueError):
        table_profile(tbl, [])
    with pytest.raises(ValueError):
        table_profile_sql("t", [])
