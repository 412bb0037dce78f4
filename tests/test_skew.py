"""Skew operators must be result-identical to their naive forms, and the
dedup-family candidate joins must stay AQE-skew-splittable (VERDICT r5
item 5): at 100 TB a viral boilerplate shingle/band puts 30% of the corpus
behind ONE join key, and the plan must shard that partition at runtime
rather than serialize it on a single task."""

from __future__ import annotations

import contextlib
import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.skew import (
    replicate_join_skewed, salted_sum)


@contextlib.contextmanager
def _aqe_skew_confs(spark, threshold="4KB"):
    """Scale AQE's skew thresholds down to test-fixture bytes (the
    defaults are sized for 256 MB cluster partitions) and force the
    sort-merge path; every conf restored afterwards."""
    confs = {
        "spark.sql.shuffle.partitions": "200",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            threshold,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": threshold,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed(spark, n=2000):
    rng = random.Random(1)
    # 90% of rows share one hot key
    rows = [("hot" if rng.random() < 0.9 else f"k{rng.randint(0, 20)}",
             float(i % 100)) for i in range(n)]
    return spark.createDataFrame(rows, ["k", "v"]).repartition(8)


def test_salted_sum_matches_naive(spark):
    df = _skewed(spark)
    naive = {(r["k"]): (r["s"], r["n"]) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count("*").alias("n")).collect()}
    salted = {(r["k"]): (r["sum_v"], r["n"]) for r in
              salted_sum(df, ["k"], ["v"]).collect()}
    assert salted == naive


def test_replicate_join_matches_naive(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k5", "K5")], ["k", "label"])
    naive = sorted((r["k"], r["v"], r["label"]) for r in
                   big.join(small, "k").collect())
    fast = sorted((r["k"], r["v"], r["label"]) for r in
                  replicate_join_skewed(big, small, "k").collect())
    assert fast == naive


def _hot_band_signatures(spark, n=4000, hot=800):
    """MinHash signature fixture with a planted viral band: ``hot`` docs
    (20-30% of the corpus) share band 0 exactly — ONE (band, hash) join
    key holding a quadratic pair block — while the rest bucket
    uniformly."""
    rng = random.Random(7)
    rows = []
    for i in range(n):
        if i < hot:
            sig = [11, 22] + [rng.randrange(1 << 20) for _ in range(6)]
        else:
            sig = [rng.randrange(1 << 20) for _ in range(8)]
        rows.append((i, *sig))
    return spark.createDataFrame(rows,
                                 ["doc_id"] + [f"h{i}" for i in range(8)])


def test_lsh_band_join_aqe_splits_hot_bucket(spark):
    """The LSH band self-join under a planted hot bucket: AQE must mark
    the sort-merge join skew=true (the hot partition shards across
    tasks), and the split must not change the candidate set."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        lsh_candidate_pairs)
    sigs = _hot_band_signatures(spark)
    with _aqe_skew_confs(spark):
        pairs = lsh_candidate_pairs(sigs, num_hashes=8, band_size=2)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE did not split the hot band bucket"
    # every hot-band pair present exactly once, none fabricated
    hot_pairs = {(a, b) for a in range(800) for b in range(a + 1, 800)}
    assert hot_pairs <= got
    assert len(got) == len(set(got))


def test_simhash_block_join_aqe_splits_hot_block(spark):
    """The SimHash pigeonhole block join with 25% of docs sharing one
    fingerprint: the (part, key) self-join must skew-split and still
    emit the exact Hamming-ball pairs."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        hamming_near_pairs)
    rng = random.Random(11)
    hot_fp = 0x5A5A5A5A
    rows = [(i, hot_fp if i < 500 else rng.randrange(1 << 32))
            for i in range(2000)]
    fps = spark.createDataFrame(rows, "doc_id long, simhash long")
    # identical hot rows compress to almost nothing in the shuffle —
    # drop the byte threshold below the hot block's compressed size
    with _aqe_skew_confs(spark, threshold="1KB"):
        pairs = hamming_near_pairs(fps, "simhash", "doc_id", 32,
                                   max_hamming=3)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, "AQE did not split the hot simhash block"
    hot_pairs = {(a, b) for a in range(500) for b in range(a + 1, 500)}
    assert hot_pairs <= got
