"""Hilbert layout: curve property, twin equality, pruning payoff."""

from __future__ import annotations

import itertools
import random

import pytest

from rgd_rnaseq_workflows_spark.operators.hilbert import (
    column_bounds, hilbert_stats, hilbert_stats_autobounds_sql,
    with_hilbert_key, write_hilbert_clustered)


def test_hilbert_is_bijective_and_unit_step_continuous(spark):
    """The defining property (and what Z-order lacks): consecutive
    indices are GRID NEIGHBORS — Manhattan distance exactly 1."""
    bits = 4
    rows = [(x, y) for x, y in itertools.product(range(16), range(16))]
    df = spark.createDataFrame(rows, ["a", "b"])
    keyed = with_hilbert_key(df, ["a", "b"], [(0, 15), (0, 15)],
                             bits=bits)
    got = {r["hkey"]: (r["a"], r["b"]) for r in keyed.collect()}
    assert set(got) == set(range(256))
    assert all(abs(got[i][0] - got[i + 1][0])
               + abs(got[i][1] - got[i + 1][1]) == 1 for i in range(255))


def test_stats_match_duckdb_twin(spark):
    import duckdb
    rng = random.Random(5)
    rows = [(rng.randrange(1, 3000), rng.randrange(50, 777))
            for _ in range(4000)]
    df = spark.createDataFrame(rows, ["a", "b"])
    bounds = column_bounds(df, ["a", "b"])
    got = sorted(tuple(r) for r in hilbert_stats(
        df, ["a", "b"], bounds, bits=12, bucket_bits=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(a INT, b INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        hilbert_stats_autobounds_sql("t", ["a", "b"], bits=12,
                                     bucket_bits=4)).fetchall())
    assert got == exp and len(got) > 1


def test_clustered_write_prunes_and_beats_hash_layout(spark, tmp_path):
    """End-to-end payoff on real parquet footers: a small 2-D box over
    the Hilbert-clustered lake reads a small fraction of files and the
    result equals the unpruned filter exactly."""
    from rgd_rnaseq_workflows_spark.operators.zorder import (
        file_manifest, pruned_read)
    rng = random.Random(37)
    rows = [(i, rng.randint(0, 1 << 16), rng.randint(0, 1 << 16))
            for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "hlake")
    write_hilbert_clustered(df, path, ["x", "y"], bits=10, n_files=16)
    man = file_manifest(spark, path, ["x", "y"])
    assert len(man) == 16
    box = {"x": (1000, 5000), "y": (60000, 64000)}
    got, n_read, n_total = pruned_read(spark, path, man, box)
    exp = df.filter((df.x >= 1000) & (df.x <= 5000)
                    & (df.y >= 60000) & (df.y <= 64000))
    assert sorted(r.id for r in got.collect()) == \
        sorted(r.id for r in exp.collect())
    assert n_total == 16
    assert n_read <= 6


def test_key_plan_has_no_shuffle_or_python(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    keyed = with_hilbert_key(df, ["a", "b"], [(0, 100), (0, 100)],
                             bits=8)
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    with pytest.raises(ValueError):
        with_hilbert_key(df, ["a", "b", "c"],
                         [(0, 1)] * 3, bits=8)
    with pytest.raises(ValueError):
        with_hilbert_key(df, ["a", "b"], [(0, 1), (0, 1)], bits=32)
    with pytest.raises(ValueError):
        hilbert_stats_autobounds_sql("t", ["a"], bits=8)
