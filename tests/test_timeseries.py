"""Time-bucket rollup, gapfill/LOCF and rate anomalies: semantics,
determinism, SQL-twin equality."""

from __future__ import annotations

import duckdb
import pytest

from rgd_rnaseq_workflows_spark.operators.timeseries import (
    bucket_gapfill_sql, bucket_last_rollup, gapfill_locf,
    rate_anomaly_report, rate_anomaly_sql)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, sec long, event_id long, value double")


class TestBucketRollup:
    def test_counts_and_last_pick(self, spark):
        rows = [("a", 5, 1, 1.0), ("a", 9, 2, 2.5), ("a", 12, 3, 7.0),
                ("b", 3, 4, 9.0)]
        got = {(r.event_type, r.bucket): r
               for r in bucket_last_rollup(_ev(spark, rows), 10).collect()}
        assert got[("a", 0)].n_events == 2
        assert got[("a", 0)].last_value == 2.5   # sec 9 beats sec 5
        assert got[("a", 10)].last_value == 7.0
        assert got[("b", 0)].n_events == 1

    def test_same_second_tiebreak_by_event_id(self, spark):
        rows = [("a", 5, 2, 111.0), ("a", 5, 9, 222.0)]
        r = bucket_last_rollup(_ev(spark, rows), 10).collect()[0]
        assert r.last_value == 222.0   # event_id 9 wins within sec 5

    def test_width_validation(self, spark):
        with pytest.raises(ValueError):
            bucket_last_rollup(_ev(spark, [("a", 1, 1, 1.0)]), 0)


class TestGapfill:
    def test_gap_rows_carry_locf(self, spark):
        # buckets 0 and 30 observed -> gaps at 10 and 20 carrying
        # bucket 0's reading; trailing edge stays open
        rows = [("a", 5, 1, 4.0), ("a", 33, 2, 8.0)]
        out = gapfill_locf(bucket_last_rollup(_ev(spark, rows), 10), 10)
        got = {r.bucket: r for r in out.filter("event_type='a'").collect()}
        assert sorted(got) == [0, 10, 20, 30]
        assert not got[0].is_gap and not got[30].is_gap
        for b in (10, 20):
            g = got[b]
            assert g.is_gap and g.n_events == 0
            assert g.last_value is None and g.locf_value == 4.0
        assert got[30].locf_value == 8.0

    def test_adjacent_buckets_produce_no_gaps(self, spark):
        rows = [("a", 5, 1, 1.0), ("a", 15, 2, 2.0)]
        out = gapfill_locf(bucket_last_rollup(_ev(spark, rows), 10), 10)
        assert out.filter("is_gap").count() == 0

    def test_groups_fill_independently(self, spark):
        rows = [("a", 0, 1, 1.0), ("a", 25, 2, 2.0), ("b", 0, 3, 3.0)]
        out = gapfill_locf(bucket_last_rollup(_ev(spark, rows), 10), 10)
        gaps = [(r.event_type, r.bucket) for r in
                out.filter("is_gap").collect()]
        assert gaps == [("a", 10)]

    def test_sql_twin_matches(self, spark):
        rows = [("t%d" % (i % 3), (i * 7) % 100, i, float(i % 11))
                for i in range(60)]
        spark_rows = sorted(
            tuple(r) for r in gapfill_locf(
                bucket_last_rollup(_ev(spark, rows), 10), 10).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE raw_ev (event_type VARCHAR, sec BIGINT, "
                    "event_id BIGINT, value DOUBLE)")
        con.executemany("INSERT INTO raw_ev VALUES (?, ?, ?, ?)", rows)
        sql = bucket_gapfill_sql("SELECT * FROM raw_ev", 10)
        duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert spark_rows == duck_rows


class TestRateAnomaly:
    def test_flags_planted_spike(self, spark):
        # type "a": counts 2 per bucket except a 40-event spike
        rows = []
        eid = 0
        for b in range(10):
            n = 40 if b == 7 else 2
            for j in range(n):
                rows.append(("a", b * 10 + j % 10, eid, 0.0))
                eid += 1
        got = rate_anomaly_report(_ev(spark, rows), 10, k=3).collect()
        assert [(r.bucket, r.n_events) for r in got] == [(70, 40)]
        assert got[0].median_n == 2 and got[0].mad_n == 0

    def test_uniform_series_is_clean(self, spark):
        rows = [("a", b * 10, b, 0.0) for b in range(20)]
        assert rate_anomaly_report(_ev(spark, rows), 10, k=3).count() == 0

    def test_sql_twin_matches(self, spark):
        rows = [("t%d" % (i % 2), (i * i) % 200, i, 0.0)
                for i in range(80)]
        spark_rows = sorted(
            tuple(r) for r in
            rate_anomaly_report(_ev(spark, rows), 20, k=1).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE raw_ev (event_type VARCHAR, sec BIGINT, "
                    "event_id BIGINT, value DOUBLE)")
        con.executemany("INSERT INTO raw_ev VALUES (?, ?, ?, ?)", rows)
        sql = rate_anomaly_sql("SELECT * FROM raw_ev", 20, k=1)
        duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert spark_rows == duck_rows


class TestGapfillPlan:
    def test_rollup_not_replayed_by_union_branches(self, spark):
        # the led frame is checkpointed before the two-branch fan-out:
        # the executed plan must consume ExistingRDD scans only (no
        # parquet re-scan, no exchange) - the triangle-census pattern
        rows = [("a", i * 7, i, float(i)) for i in range(200)]
        out = gapfill_locf(bucket_last_rollup(_ev(spark, rows), 10), 10)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan and "FileScan" not in plan
        assert plan.count("Exchange") - plan.count("ReusedExchange") == 0
        assert "ExistingRDD" in plan


class TestDisorderReport:
    def _ev(self, spark, rows):
        from pyspark.sql import functions as F
        df = spark.createDataFrame(rows, "event_id long, us long, "
                                         "event_type string")
        return df.select("event_id",
                         F.timestamp_micros("us").alias("ts"),
                         "event_type")

    def test_hand_computed_lateness(self, spark):
        from rgd_rnaseq_workflows_spark.operators.timeseries import (
            disorder_report)
        # arrival order 1..5; ts: 100, 300, 250, 400, 150
        rows = [(1, 100, "a"), (2, 300, "a"), (3, 250, "a"),
                (4, 400, "b"), (5, 150, "b")]
        got = {r["event_type"]: r for r in
               disorder_report(self._ev(spark, rows),
                               bucket_width=2).collect()}
        # a: late rows: id3 (prev max 300 -> late 50); b: id5 (400->250)
        assert (got["a"]["n_late"], got["a"]["max_late_us"]) == (1, 50)
        assert (got["b"]["n_late"], got["b"]["max_late_us"]) == (1, 250)
        assert got["a"]["n_events"] == 3 and got["b"]["n_events"] == 2

    def test_ordered_stream_is_clean_any_bucketing(self, spark):
        from rgd_rnaseq_workflows_spark.operators.timeseries import (
            disorder_report)
        rows = [(i, i * 10, "x") for i in range(1, 200)]
        for w in (7, 50, 1000):
            r = disorder_report(self._ev(spark, rows),
                                bucket_width=w).collect()[0]
            assert r["n_late"] == 0 and r["max_late_us"] == 0

    def test_two_phase_matches_global_window_twin(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.timeseries import (
            disorder_report, disorder_sql)
        rows = [(i, ((i * 37) % 101) * 1000, f"t{i % 3}")
                for i in range(1, 300)]
        got = [tuple(r) for r in
               disorder_report(self._ev(spark, rows),
                               bucket_width=13).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE events (event_id BIGINT, "
                    "ts TIMESTAMP, event_type VARCHAR)")
        con.executemany(
            "INSERT INTO events VALUES (?, make_timestamp(?), ?)",
            rows)
        exp = [tuple(r) for r in
               con.execute(disorder_sql("events")).fetchall()]
        assert got == exp


class TestCusumChangepoint:
    def test_planted_level_shift(self, spark):
        from rgd_rnaseq_workflows_spark.operators.timeseries import (
            cusum_changepoint_report)
        # 10 buckets at rate 2, then 10 buckets at rate 8: the CUSUM
        # peak must sit at the last low bucket (sec 9*10=90)
        rows = []
        for b in range(20):
            n = 2 if b < 10 else 8
            rows += [("x", b * 10 + i % 10) for i in range(n)]
        df = spark.createDataFrame(rows, "event_type string, sec long")
        r = cusum_changepoint_report(df, 10).collect()[0]
        assert r["cp_bucket"] == 90
        assert r["mean_before_milli"] == 2000
        assert r["mean_after_milli"] == 8000
        assert r["n_buckets"] == 20 and r["total_events"] == 100

    def test_matches_duckdb_twin(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.timeseries import (
            cusum_changepoint_report, cusum_changepoint_sql)
        rows = [(f"t{i % 2}", (i * 37) % 500) for i in range(400)]
        df = spark.createDataFrame(rows, "event_type string, sec long")
        got = [tuple(r) for r in
               cusum_changepoint_report(df, 50).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE ev (event_type VARCHAR, sec BIGINT)")
        con.executemany("INSERT INTO ev VALUES (?, ?)", rows)
        exp = [tuple(r) for r in con.execute(cusum_changepoint_sql(
            "SELECT * FROM ev", 50)).fetchall()]
        assert got == exp
