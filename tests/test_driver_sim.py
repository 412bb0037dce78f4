"""Worst-case driver simulation as a standing CI gate (VERDICT r5 item 8).

The grading driver runs registry queries from its OWN SparkSession —
vanilla builder, Spark-4 default ANSI ON, host (non-UTC) timezone — and
from an arbitrary cwd.  The full 112-query simulation runs at round end
(verify skill); this marked-slow test keeps a representative core of it
in the pytest suite so a registry/session change can't silently regress
the ``engine_session`` isolation between rounds.

Query selection covers each hostile-environment risk family:

- ``f16_date_arithmetic`` — date arithmetic under a foreign session TZ
- ``stream_window_agg``   — events.parquet TIMESTAMP(NANOS)/NTZ handling
- ``win4_lead_lag``       — epoch-sensitive window frames
- ``corpus_token_drift``  — Decimal(38,0) products under ANSI-on callers
- ``ann_lsh_topk``        — Arrow kernel: workers must import the package
                            via the shipped zip, not the caller's cwd
- ``quality_oov_rate``    — broadcast vocabulary + coalesce contract
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import canon  # noqa: E402  (comparator shared w/ driver)

SF = "/root/testdata/sf0.001"
QUERIES = ("f16_date_arithmetic", "stream_window_agg", "win4_lead_lag",
           "corpus_token_drift", "ann_lsh_topk", "quality_oov_rate")


@pytest.mark.slow
def test_registry_under_hostile_caller_session(spark, tmp_path, monkeypatch):
    import __spark_entry__ as entrymod
    from rgd_rnaseq_workflows_spark.schemas import TESTDATA_TABLES

    # hostile caller: ANSI on, foreign timezone, foreign cwd
    caller = spark.newSession()
    caller.conf.set("spark.sql.ansi.enabled", "true")
    caller.conf.set("spark.sql.session.timeZone", "America/Chicago")
    monkeypatch.chdir(tmp_path)

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    fails = []
    for name in QUERIES:
        sdf = qs[name](caller, SF).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        if sorted(sdf.columns) != sorted(odf.columns):
            fails.append(f"{name}: cols {sorted(sdf.columns)} "
                         f"vs {sorted(odf.columns)}")
        elif canon(sdf) != canon(odf):
            fails.append(f"{name}: values differ")
    assert not fails, fails

    # the caller's own conf choices survived every run
    assert caller.conf.get("spark.sql.ansi.enabled") == "true"
    assert (caller.conf.get("spark.sql.session.timeZone")
            == "America/Chicago")
