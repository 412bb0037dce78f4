"""Funnel analysis: ordered step semantics, strictness, gaps, report."""

from __future__ import annotations

from datetime import datetime

import pytest

from rgd_rnaseq_workflows_spark.operators.funnel import (
    funnel_report, funnel_user_steps)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: clean a -> b -> c
        (1, _ts("2024-01-01 10:00:00"), 1, "a"),
        (2, _ts("2024-01-01 10:00:10"), 1, "b"),
        (3, _ts("2024-01-01 10:00:40"), 1, "c"),
        # user 2: b BEFORE a (must not count), then a, never b after
        (4, _ts("2024-01-01 09:00:00"), 2, "b"),
        (5, _ts("2024-01-01 09:30:00"), 2, "a"),
        # user 3: a -> b at the SAME second (strict > excludes), then
        # a later b -> c; also multiple a's (earliest wins)
        (6, _ts("2024-01-01 08:00:00"), 3, "a"),
        (7, _ts("2024-01-01 08:00:00"), 3, "b"),
        (8, _ts("2024-01-01 08:00:05"), 3, "a"),
        (9, _ts("2024-01-01 08:00:20"), 3, "b"),
        (10, _ts("2024-01-01 08:01:20"), 3, "c"),
        # user 4: only unrelated events
        (11, _ts("2024-01-01 07:00:00"), 4, "x"),
        # user 5: c first, never completes step 1
        (12, _ts("2024-01-01 06:00:00"), 5, "c"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_user_step_times(spark, events):
    got = {r.user_id: (r.t1, r.t2, r.t3)
           for r in funnel_user_steps(events, ("a", "b", "c")).collect()}
    e = lambda s: int(_ts(s).timestamp())
    # user 1 full chain
    assert got[1] == (e("2024-01-01 10:00:00"),
                      e("2024-01-01 10:00:10"),
                      e("2024-01-01 10:00:40"))
    # user 2: the 09:00 b precedes a -> step 2 never reached
    assert got[2] == (e("2024-01-01 09:30:00"), None, None)
    # user 3: same-second b excluded (strict >); earliest a wins;
    # next b at +20s, c after it
    assert got[3] == (e("2024-01-01 08:00:00"),
                      e("2024-01-01 08:00:20"),
                      e("2024-01-01 08:01:20"))
    # user 4 filtered out entirely; user 5 never reaches step 1
    assert 4 not in got
    assert got[5] == (None, None, None)


def test_report_counts_and_gaps(spark, events):
    rows = {r.step: r for r in
            funnel_report(events, ("a", "b", "c")).collect()}
    assert [rows[s].step_idx for s in ("a", "b", "c")] == [1, 2, 3]
    assert rows["a"].n_users == 3          # users 1, 2, 3 (5 has t1 NULL)
    assert rows["b"].n_users == 2          # users 1, 3
    assert rows["c"].n_users == 2
    assert rows["a"].conversion == 1.0
    assert rows["b"].conversion == round(2 / 3, 6)
    # gaps: b-a = 10 (u1) + 20 (u3) = 30; c-b = 30 (u1) + 60 (u3) = 90
    assert rows["a"].sum_gap_seconds is None
    assert rows["b"].sum_gap_seconds == 30
    assert rows["c"].sum_gap_seconds == 90
    assert rows["b"].mean_gap_seconds == 15.0
    assert rows["c"].mean_gap_seconds == 45.0


def test_later_steps_null_without_earlier(spark, events):
    """Every NULL step forces all later steps NULL even if matching
    events exist afterwards (user 2 has no b after a, so a later c
    could never count)."""
    plus_c = events.union(events.sparkSession.createDataFrame(
        [(99, _ts("2024-01-01 23:00:00"), 2, "c")], SCHEMA))
    got = {r.user_id: (r.t1, r.t2, r.t3)
           for r in funnel_user_steps(plus_c, ("a", "b", "c")).collect()}
    assert got[2][1] is None and got[2][2] is None


def test_two_step_funnel_and_validation(spark, events):
    rows = funnel_report(events, ("a", "c")).collect()
    assert len(rows) == 2
    with pytest.raises(ValueError):
        funnel_user_steps(events, ("a",))
    with pytest.raises(ValueError):
        funnel_user_steps(events, ("a", "a"))


def test_single_shuffle_plan(spark, events):
    """The per-user frame carries exactly one Exchange (the groupBy) -
    no joins, no window sort."""
    plan = funnel_user_steps(events, ("a", "b", "c"))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2      # partial+final agg exchange
    assert "Join" not in plan


# --- cohort retention ----------------------------------------------------------

def test_cohort_retention_matrix(spark):
    from rgd_rnaseq_workflows_spark.operators.funnel import cohort_retention
    day = 86_400
    rows = [
        # cohort day 0: users 1, 2. u1 active days 0,1,2; u2 days 0,2
        (1, datetime.fromtimestamp(10), 1, "x"),
        (2, datetime.fromtimestamp(day + 5), 1, "x"),
        (3, datetime.fromtimestamp(2 * day + 5), 1, "x"),
        (4, datetime.fromtimestamp(20), 2, "x"),
        (5, datetime.fromtimestamp(2 * day + 9), 2, "x"),
        # two events same user same day collapse to one active mark
        (6, datetime.fromtimestamp(2 * day + 99), 2, "x"),
        # cohort day 1: user 3 active day 1 only
        (7, datetime.fromtimestamp(day + 50), 3, "x"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {(r.cohort_bucket, r.bucket_offset): (r.n_active, r.n_cohort,
                                                r.retention)
           for r in cohort_retention(ev).collect()}
    # fromtimestamp is local-time; recover the actual epoch-day buckets
    d0 = min(c for c, _ in got)
    assert got[(d0, 0)] == (2, 2, 1.0)
    assert got[(d0, 1)] == (1, 2, 0.5)
    assert got[(d0, 2)] == (2, 2, 1.0)
    assert got[(d0 + 1, 0)] == (1, 1, 1.0)
    assert set(got) == {(d0, 0), (d0, 1), (d0, 2), (d0 + 1, 0)}


def test_cohort_retention_custom_bucket(spark):
    """Hour-bucket cohorts: same semantics at another granularity."""
    from rgd_rnaseq_workflows_spark.operators.funnel import cohort_retention
    rows = [
        (1, datetime.fromtimestamp(100), 1, "x"),
        (2, datetime.fromtimestamp(3700), 1, "x"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {r.bucket_offset: r.retention
           for r in cohort_retention(ev, bucket_seconds=3600).collect()}
    assert got == {0: 1.0, 1: 1.0}


def test_max_gap_conversion_window(spark, events):
    """With a conversion window, a step landing outside the window does
    not count even though a matching event exists (first-chance)."""
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_user_steps)
    # user 1: a -> b gap 10s, b -> c gap 30s
    got = {r.user_id: (r.t1, r.t2, r.t3)
           for r in funnel_user_steps(
               events, ("a", "b", "c"), max_gap_seconds=15).collect()}
    assert got[1][1] is not None          # 10s <= 15
    assert got[1][2] is None              # 30s > 15 -> c out of window
    # user 3: earliest a at 08:00:00, next valid b at +20s > 15 -> drops
    assert got[3][1] is None
    with pytest.raises(ValueError):
        funnel_user_steps(events, ("a", "b"), max_gap_seconds=0)


# --- session-scoped funnel -------------------------------------------------------

def test_session_funnel_confines_to_one_session(spark):
    """A step completed in a LATER session never counts; within-session
    chains do. Two sessions for user 1 (gap > 30 min): a->b completes
    in session 1; session 2's c does not join session 1's chain."""
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_report, session_funnel_report)
    t = _ts
    rows = [
        # user 1 / session 1: a -> b (10s apart)
        (1, t("2024-01-01 10:00:00"), 1, "a"),
        (2, t("2024-01-01 10:00:10"), 1, "b"),
        # user 1 / session 2 (2h later): c alone
        (3, t("2024-01-01 12:30:00"), 1, "c"),
        # user 2: full chain inside one session
        (4, t("2024-01-01 09:00:00"), 2, "a"),
        (5, t("2024-01-01 09:01:00"), 2, "b"),
        (6, t("2024-01-01 09:02:00"), 2, "c"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    sess = {r.step: r for r in
            session_funnel_report(ev, ("a", "b", "c"),
                                  gap_minutes=30).collect()}
    # lifetime funnel would credit user 1 with the session-2 c
    life = {r.step: r for r in
            funnel_report(ev, ("a", "b", "c")).collect()}
    assert life["c"].n_users == 2
    assert sess["a"].n_sessions == 2      # u1/s1 and u2/s1 start with a
    assert sess["b"].n_sessions == 2
    assert sess["c"].n_sessions == 1      # only user 2 converts in-session
    assert sess["c"].conversion == 0.5


class TestTransitionMatrix:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, sec long, event_id long")

    def test_counts_and_basis_points(self, spark):
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            transition_matrix)
        rows = [(1, "a", 1, 1), (1, "b", 2, 2), (1, "a", 3, 3),
                (1, "b", 4, 4), (2, "a", 1, 5), (2, "c", 2, 6)]
        got = {(r.from_type, r.to_type): r for r in
               transition_matrix(self._ev(spark, rows)).collect()}
        # a->b twice, a->c once, b->a once
        assert got[("a", "b")].n == 2 and got[("a", "c")].n == 1
        assert got[("a", "b")].row_total == 3
        assert got[("a", "b")].p_bp == 20000 // 3
        assert got[("b", "a")].p_bp == 10000

    def test_no_cross_user_transitions(self, spark):
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            transition_matrix)
        rows = [(1, "a", 1, 1), (2, "b", 2, 2)]
        assert transition_matrix(self._ev(spark, rows)).count() == 0

    def test_same_second_ordered_by_event_id(self, spark):
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            transition_matrix)
        rows = [(1, "x", 5, 2), (1, "y", 5, 1)]
        got = transition_matrix(self._ev(spark, rows)).collect()
        assert [(r.from_type, r.to_type) for r in got] == [("y", "x")]

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            transition_matrix, transition_matrix_sql)
        rows = [((i * 3) % 5, "t%d" % (i % 4), (i * 7) % 50, i)
                for i in range(120)]
        sdf = sorted(map(tuple, transition_matrix(
            self._ev(spark, rows)).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE raw_ev (user_id BIGINT, "
                    "event_type VARCHAR, sec BIGINT, event_id BIGINT)")
        con.executemany("INSERT INTO raw_ev VALUES (?, ?, ?, ?)", rows)
        ddf = sorted(map(tuple, con.execute(transition_matrix_sql(
            "SELECT * FROM raw_ev")).fetchall()))
        assert sdf == ddf


class TestRFM:
    def test_tiles_and_exact_cents(self, spark):
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            rfm_segments)
        rows = [(u, u * 10, float(u), u) for u in range(1, 11)]
        ev = spark.createDataFrame(
            rows, "user_id long, sec long, value double, event_id long")
        out = rfm_segments(ev, n_tiles=2).collect()
        # 10 users, each axis splits 5/5. Recency and monetary favor
        # high u (desc order); frequency ties everywhere, so its
        # pinned tiebreak (u asc) puts users 1-5 in f_tile 1. Users
        # 6-10 land in (r=1, f=2, m=1), users 1-5 in (2, 1, 2).
        seg = {(r.r_tile, r.f_tile, r.m_tile): r.n_users for r in out}
        assert sum(seg.values()) == 10
        assert seg == {(1, 2, 1): 5, (2, 1, 2): 5}

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.funnel import (
            rfm_segments, rfm_segments_sql)
        rows = [((i * 3) % 7, (i * 11) % 90, float((i * i) % 40) / 4, i)
                for i in range(100)]
        ev = spark.createDataFrame(
            rows, "user_id long, sec long, value double, event_id long")
        sdf = sorted(map(tuple, rfm_segments(ev, n_tiles=3).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE raw_ev (user_id BIGINT, sec BIGINT, "
                    "value DOUBLE, event_id BIGINT)")
        con.executemany("INSERT INTO raw_ev VALUES (?, ?, ?, ?)", rows)
        ddf = sorted(map(tuple, con.execute(rfm_segments_sql(
            "SELECT * FROM raw_ev", n_tiles=3)).fetchall()))
        assert sdf == ddf


# ---------------------------------------------------------------------------
# top event paths
# ---------------------------------------------------------------------------

def _path_rows():
    # user 1: view > click > purchase > view ; user 2: view > click >
    # purchase ; user 3: error > error > error > error
    return [(1, "view", 10, 101), (1, "click", 20, 102),
            (1, "purchase", 30, 103), (1, "view", 40, 104),
            (2, "view", 11, 201), (2, "click", 21, 202),
            (2, "purchase", 31, 203),
            (3, "error", 5, 301), (3, "error", 6, 302),
            (3, "error", 7, 303), (3, "error", 8, 304)]


def test_top_paths_counts_and_order(spark):
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths)
    df = spark.createDataFrame(_path_rows(),
                               ["user_id", "event_type", "sec",
                                "event_id"])
    out = [(r["path"], r["n_occurrences"], r["n_users"])
           for r in top_event_paths(df, n=3, top_k=10).collect()]
    # view > click > purchase happens for users 1 and 2; the error run
    # gives two windows for one user
    assert out[0] == ("error > error > error", 2, 1) or \
        out[0] == ("view > click > purchase", 2, 2)
    d = dict((p, (o, u)) for p, o, u in out)
    assert d["view > click > purchase"] == (2, 2)
    assert d["error > error > error"] == (2, 1)
    assert d["click > purchase > view"] == (1, 1)


def test_top_paths_cap_bounds_bot_users(spark):
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths)
    rows = [(9, "spam", i, 900 + i) for i in range(200)]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "sec",
                                      "event_id"])
    [r] = top_event_paths(df, n=2, top_k=5, cap_per_user=10).collect()
    # 10 earliest events -> 9 windows, never 199
    assert r["n_occurrences"] == 9


def test_top_paths_match_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths, top_event_paths_sql)
    df = spark.createDataFrame(_path_rows(),
                               ["user_id", "event_type", "sec",
                                "event_id"])
    got = [tuple(r) for r in top_event_paths(df, n=2, top_k=50).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE raw_ev(user_id INT, event_type VARCHAR, "
                "sec BIGINT, event_id INT)")
    con.executemany("INSERT INTO raw_ev VALUES (?, ?, ?, ?)", _path_rows())
    exp = [tuple(r) for r in con.execute(top_event_paths_sql(
        "SELECT user_id, event_type, sec, event_id FROM raw_ev",
        n=2, top_k=50)).fetchall()]
    assert got == exp and len(got) > 3


def test_top_paths_reject_bad_params(spark):
    import pytest

    from rgd_rnaseq_workflows_spark.operators.funnel import (
        top_event_paths, top_event_paths_sql)
    df = spark.createDataFrame(_path_rows(),
                               ["user_id", "event_type", "sec",
                                "event_id"])
    with pytest.raises(ValueError):
        top_event_paths(df, n=1)
    with pytest.raises(ValueError):
        top_event_paths(df, n=3, cap_per_user=2)
    with pytest.raises(ValueError):
        top_event_paths_sql("t", top_k=0)


# ---------------------------------------------------------------------------
# funnel gap quantiles
# ---------------------------------------------------------------------------

def test_funnel_gap_quantiles_exact_values(spark):
    """Hand-checkable: three converting users with gaps 10/20/40 —
    p50 is the exact lower median (20), p100 the max."""
    from datetime import datetime

    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_gap_quantiles)
    t = lambda s: datetime.fromtimestamp(s)
    rows = [(1, t(0), 1, "a"), (2, t(10), 1, "b"),
            (3, t(0), 2, "a"), (4, t(20), 2, "b"),
            (5, t(0), 3, "a"), (6, t(40), 3, "b"),
            (7, t(0), 4, "a")]                     # never converts
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    [r] = funnel_gap_quantiles(df, ["a", "b"],
                               percents=(50, 100)).collect()
    assert (r["step_idx"], r["n_rows"], r["p50"], r["p100"]) == \
        (2, 3, 20, 40)


def test_funnel_gap_quantiles_matches_duckdb_twin(spark):
    import random
    from datetime import datetime

    import duckdb

    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_gap_quantiles, funnel_gap_quantiles_sql)
    t = lambda s: datetime.fromtimestamp(s)
    rng = random.Random(9)
    rows, eid = [], 0
    for u in range(30):
        base = rng.randint(0, 500)
        for st, lo, hi in (("view", 0, 0), ("click", 1, 60),
                           ("purchase", 61, 300)):
            if st == "view" or rng.random() < 0.7:
                rows.append((eid, t(base + rng.randint(lo, hi)),
                             u, st))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    steps = ["view", "click", "purchase"]
    got = [tuple(r) for r in funnel_gap_quantiles(df, steps).collect()]
    con = duckdb.connect()
    con.register("ev", df.toPandas())
    exp = [tuple(r) for r in con.execute(
        funnel_gap_quantiles_sql("ev", steps)).fetchall()]
    assert got == exp and len(got) == 2


def test_funnel_wilson_hand_checked(spark):
    """Wilson bounds bracket the rate; a 0-of-n step gets a positive
    upper bound (the interval's whole point at extreme rates)."""
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_wilson_report)
    rows = []
    for u in range(20):
        rows.append((u, 1000, "a"))
        if u < 5:
            rows.append((u, 2000, "b"))
    df = (spark.createDataFrame(rows, "user_id long, us long, "
                                      "event_type string")
          .select("user_id", F.timestamp_micros(F.col("us") * 1000000)
                  .alias("ts"), "event_type"))
    out = {r["step_idx"]: r for r in
           funnel_wilson_report(df, ("a", "b", "c")).collect()}
    s2 = out[2]
    assert (s2["n_prev"], s2["n_conv"], s2["rate_ppm"]) == (20, 5,
                                                            250000)
    assert s2["wilson_lo_ppm"] < 250000 < s2["wilson_hi_ppm"]
    # textbook Wilson for 5/20 at z=1.96: [0.112, 0.469]
    assert 100000 < s2["wilson_lo_ppm"] < 130000
    assert 440000 < s2["wilson_hi_ppm"] < 490000
    s3 = out[3]
    assert s3["n_conv"] == 0 and s3["rate_ppm"] == 0
    assert s3["wilson_lo_ppm"] == 0 and s3["wilson_hi_ppm"] > 0
