"""Registry frames must not mutate the caller's session confs.

Registry queries need UTC + ANSI-off at EXECUTION time (lazy frames),
which used to be pinned by permanently mutating the caller's session —
a footgun for callers embedding registry frames in ANSI-on sessions
(VERDICT r4 "what's wrong" item 2). `session.engine_session` binds the
frames to a conf-isolated sibling session instead.
"""

from __future__ import annotations

from rgd_rnaseq_workflows_spark import registry
from rgd_rnaseq_workflows_spark.session import engine_session

SF = "/root/testdata/sf0.001"


def test_caller_ansi_and_tz_survive_query_run(spark):
    caller = spark.newSession()
    caller.conf.set("spark.sql.ansi.enabled", "true")
    caller.conf.set("spark.sql.session.timeZone", "America/Chicago")

    # a timezone- and arithmetic-sensitive query, run to COMPLETION
    rows = registry.REGISTRY["f16_date_arithmetic"].fn(caller, SF).collect()
    assert rows
    # and an events read (nanosAsLong + ntz cast path)
    assert registry.REGISTRY["stream_window_agg"].fn(caller, SF).count() > 0

    # the caller's choices survive the runs
    assert caller.conf.get("spark.sql.ansi.enabled") == "true"
    assert (caller.conf.get("spark.sql.session.timeZone")
            == "America/Chicago")
    # ANSI is live on the caller: a bad cast raises there but not on the
    # engine sibling
    import pytest
    from pyspark.sql import functions as F
    with pytest.raises(Exception):
        caller.range(1).select(
            F.lit("abc").cast("int").alias("x")).collect()
    eng = engine_session(caller)
    assert eng.range(1).select(
        F.lit("abc").cast("int").alias("x")).collect()[0].x is None


def test_engine_session_is_cached_and_idempotent(spark):
    eng1 = engine_session(spark)
    eng2 = engine_session(spark.newSession())
    assert eng1 is eng2                      # one clone per SparkContext
    assert engine_session(eng1) is eng1      # identity on the clone
    assert eng1.conf.get("spark.sql.ansi.enabled") == "false"
    assert eng1.conf.get("spark.sql.session.timeZone") == "UTC"


def test_registry_frames_bind_to_engine_session(spark):
    caller = spark.newSession()
    caller.conf.set("spark.sql.ansi.enabled", "true")
    df = registry._t(caller, SF, "orders")
    assert df.sparkSession is engine_session(caller)
    assert caller.conf.get("spark.sql.ansi.enabled") == "true"
