"""Bucketing: co-located joins with NO shuffle — the scale path for
repeated joins on the same key (SURVEY §4 'broadcast-style hash join' row;
guide: 'bucketing ... so later joins on key co-locate without a shuffle').
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # managed tables land in spark.sql.warehouse.dir; the in-memory
    # catalog is enough for bucketed tables (no Hive needed)
    return spark


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

    import shutil
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a fresh session's catalog doesn't know tables a previous test run
    # left in spark.sql.warehouse.dir — clear the physical locations too
    warehouse_dir = spark.conf.get(
        "spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse_dir}/{t}", ignore_errors=True)
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)

    # disable auto-broadcast so the join strategy decision is about
    # co-location, not size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
    # both sides pre-bucketed on the join key → SortMergeJoin with zero
    # Exchange operators
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan

    # and the result is correct
    n = joined.count()
    naive = orders.join(lineitem,
                        orders.o_orderkey == lineitem.l_orderkey).count()
    assert n == naive


def test_partitioned_write_prunes_at_scan(spark, tmp_path):
    """run_corpus publishes curated corpora partitionBy(lang); reading one
    language back must prune at the FILE level (PartitionFilters in the
    scan, non-matching directories never listed into the plan) — at
    100 TB this is the difference between scanning one language's shard
    and the whole lake."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "part_corpus")
    df = spark.createDataFrame(
        [(i, f"text {i}", ["en", "de", "zh"][i % 3]) for i in range(60)],
        "doc_id long, text string, lang string")
    df.write.mode("overwrite").partitionBy("lang").parquet(path)
    q = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1)[1][:120]
    assert q.count() == 20
    # the equality predicate itself sits in PartitionFilters (directory-
    # level pruning), NOT in DataFilters/PushedFilters (row-level)
    part_filters = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "= en" in part_filters
    data_filters = plan.split("DataFilters", 1)[1].split("]", 1)[0]
    assert "= en" not in data_filters
