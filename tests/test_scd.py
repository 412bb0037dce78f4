"""SCD2 history: run collapsing, NULL-safe changes, SQL twin."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.scd import (
    scd2_history, scd2_history_sql)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, sec long, event_id long")


class TestSCD2:
    def test_collapses_runs_and_sets_intervals(self, spark):
        rows = [
            (1, "view", 10, 1), (1, "view", 20, 2), (1, "click", 30, 3),
            (1, "click", 40, 4), (1, "view", 50, 5),
            (2, "error", 5, 6),
        ]
        got = {(r.user_id, r.valid_from): r
               for r in scd2_history(_df(spark, rows)).collect()}
        a = got[(1, 10)]
        assert (a.event_type, a.valid_to, a.n_obs, a.is_current) == \
            ("view", 30, 2, False)
        b = got[(1, 30)]
        assert (b.event_type, b.valid_to, b.n_obs) == ("click", 50, 2)
        c = got[(1, 50)]
        assert (c.event_type, c.valid_to, c.is_current) == \
            ("view", None, True)
        d = got[(2, 5)]
        assert (d.event_type, d.is_current, d.n_obs) == ("error", True, 1)

    def test_null_is_a_version(self, spark):
        rows = [(1, "a", 1, 1), (1, None, 2, 2), (1, None, 3, 3),
                (1, "a", 4, 4)]
        got = sorted(scd2_history(_df(spark, rows)).collect(),
                     key=lambda r: r.valid_from)
        assert [r.event_type for r in got] == ["a", None, "a"]
        assert [r.n_obs for r in got] == [1, 2, 1]
        assert [r.valid_to for r in got] == [2, 4, None]

    def test_same_second_tiebreak_by_event_id(self, spark):
        # two observations in the same second: event_id orders them
        rows = [(1, "x", 10, 2), (1, "y", 10, 1)]
        got = sorted(scd2_history(_df(spark, rows)).collect(),
                     key=lambda r: (r.valid_from, r.event_type))
        # y (event_id 1) comes first, then x
        cur = [r for r in got if r.is_current]
        assert len(got) == 2 and len(cur) == 1
        assert cur[0].event_type == "x"

    def test_matches_brute_force(self, spark):
        import random
        rng = random.Random(23)
        rows = [(rng.randint(1, 5),
                 rng.choice(["a", "b", "c", None]),
                 rng.randint(0, 50), i)
                for i in range(300)]
        def k(t):
            return tuple((x is None, x) for x in t)
        got = sorted((tuple(r) for r in
                      scd2_history(_df(spark, rows)).collect()), key=k)
        # brute-force reference
        exp = []
        byuser = {}
        for u, a, s, e in rows:
            byuser.setdefault(u, []).append((s, e, a))
        for u, obs in byuser.items():
            obs.sort()
            runs = []
            for s, e, a in obs:
                if not runs or runs[-1][0] != a:
                    runs.append([a, s, 0])
                runs[-1][2] += 1
            for i, (a, vf, n) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else None
                exp.append((u, a, vf, vt, n, vt is None))
        assert got == sorted(exp, key=k)

    def test_matches_sql_twin(self, spark):
        import duckdb
        import random
        rng = random.Random(31)
        rows = [(rng.randint(1, 4), rng.choice(["a", "b", None]),
                 rng.randint(0, 30), i) for i in range(200)]
        df = _df(spark, rows)
        def k(t):
            return tuple((x is None, x) for x in t)
        got = sorted((tuple(r) for r in scd2_history(df).collect()),
                     key=k)
        con = duckdb.connect()
        con.register("obs_src", df.toPandas())
        exp = sorted((tuple(r) for r in con.execute(scd2_history_sql(
            "SELECT user_id, event_type, sec, event_id FROM obs_src"))
            .fetchall()), key=k)
        assert got == exp
