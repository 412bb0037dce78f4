"""Multi-touch attribution: hand-computed credit, exact remainder
allocation, the (direct) bucket, DuckDB twin equality, bad input."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.attribution import (
    multi_touch_attribution, multi_touch_attribution_sql)

COLS = ["user_id", "event_type", "sec", "value", "event_id"]


def _rows():
    # user 1: two touches then a 10.00 purchase; one late touch after
    # user 2: purchase with NO touch in window (touch too old)
    # user 3: three touches, 1.00 purchase -> linear 100 cents over 3
    return [
        (1, "click", 100, 0.0, 11),
        (1, "view", 200, 0.0, 12),
        (1, "purchase", 300, 10.0, 13),
        (1, "click", 400, 0.0, 14),          # after conversion: ignored
        (2, "click", 10, 0.0, 21),
        (2, "purchase", 100_000, 5.0, 22),   # touch outside lookback
        (3, "view", 100, 0.0, 31),
        (3, "view", 150, 0.0, 32),
        (3, "click", 200, 0.0, 33),
        (3, "purchase", 250, 1.0, 34),
    ]


def _run(spark, **kw):
    df = spark.createDataFrame(_rows(), COLS)
    out = multi_touch_attribution(df, lookback_sec=1000, **kw)
    return {(r["model"], r["touch_type"]): (r["n_pairs"],
                                            r["credited_cents"])
            for r in out.collect()}


def test_hand_computed_credit(spark):
    got = _run(spark)
    # first touch: user1 -> click(100), user3 -> view(100)
    assert got[("first_touch", "click")] == (1, 1000)
    assert got[("first_touch", "view")] == (1, 100)
    # last touch: user1 -> view(200), user3 -> click(200)
    assert got[("last_touch", "view")] == (1, 1000)
    assert got[("last_touch", "click")] == (1, 100)
    # linear user1: 1000 cents over 2 touches -> 500 each;
    # user3: 100 cents over 3 -> 33 base, remainder 1 to most recent
    assert got[("linear", "click")] == (2, 500 + 34)
    assert got[("linear", "view")] == (3, 500 + 33 + 33)
    # user 2 is (direct) under every model, full 500 cents
    for m in ("first_touch", "last_touch", "linear"):
        assert got[(m, "(direct)")] == (1, 500)


def test_credit_sums_to_conversion_total_per_model(spark):
    got = _run(spark)
    total = 1000 + 500 + 100  # all purchase cents
    for m in ("first_touch", "last_touch", "linear"):
        assert sum(c for (mm, _), (_, c) in got.items() if mm == m) == total


def test_matches_duckdb_twin(spark):
    import duckdb
    df = spark.createDataFrame(_rows(), COLS)
    got = sorted(tuple(r) for r in
                 multi_touch_attribution(df, lookback_sec=1000).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE raw_events(user_id INT, event_type VARCHAR, "
                "sec BIGINT, value DOUBLE, event_id INT)")
    con.executemany("INSERT INTO raw_events VALUES (?, ?, ?, ?, ?)", _rows())
    exp = sorted(tuple(r) for r in con.execute(
        multi_touch_attribution_sql(
            "SELECT user_id, event_type, sec, value, event_id FROM raw_events",
            lookback_sec=1000)).fetchall())
    assert got == exp


def test_rejects_bad_input(spark):
    df = spark.createDataFrame(_rows(), COLS)
    with pytest.raises(ValueError):
        multi_touch_attribution(df, touch_types=())
    with pytest.raises(ValueError):
        multi_touch_attribution(df, lookback_sec=0)
    with pytest.raises(ValueError):
        multi_touch_attribution_sql("SELECT 1", touch_types=())


def test_negative_conversion_value_raises(spark):
    """value >= 0 is a hard contract (div/% sign semantics diverge
    across Spark, DuckDB and the streaming kernel): both engines must
    fail loudly on a refund-valued conversion, and a NULL value reads
    as 0 cents in both."""
    import duckdb
    from pyspark.errors import SparkRuntimeException

    rows = [(1, "click", 100, 0.0, 11), (1, "purchase", 300, -10.0, 13)]
    df = spark.createDataFrame(rows, COLS)
    with pytest.raises(SparkRuntimeException,
                       match="negative conversion value"):
        multi_touch_attribution(df, lookback_sec=1000).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE raw_events(user_id INT, event_type VARCHAR,"
                " sec BIGINT, value DOUBLE, event_id INT)")
    con.executemany("INSERT INTO raw_events VALUES (?, ?, ?, ?, ?)", rows)
    with pytest.raises(duckdb.Error, match="negative conversion value"):
        con.execute(multi_touch_attribution_sql(
            "SELECT user_id, event_type, sec, value, event_id "
            "FROM raw_events", lookback_sec=1000)).fetchall()
    # NULL conversion value -> 0 cents, no error, engines agree
    rows_null = [(1, "click", 100, 0.0, 11),
                 (1, "purchase", 300, None, 13)]
    got = sorted(tuple(r) for r in multi_touch_attribution(
        spark.createDataFrame(rows_null, COLS),
        lookback_sec=1000).collect())
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE raw_events(user_id INT, event_type "
                 "VARCHAR, sec BIGINT, value DOUBLE, event_id INT)")
    con2.executemany("INSERT INTO raw_events VALUES (?, ?, ?, ?, ?)",
                     rows_null)
    exp = sorted(tuple(r) for r in con2.execute(
        multi_touch_attribution_sql(
            "SELECT user_id, event_type, sec, value, event_id "
            "FROM raw_events", lookback_sec=1000)).fetchall())
    assert got == exp
    assert all(c == 0 for *_, c in got)
