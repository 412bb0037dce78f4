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


class TestFDReport:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "a string, b string")

    def test_exact_fd_and_violations(self, spark):
        from rgd_rnaseq_workflows_spark.operators.profile import fd_report
        rows = [("x", "1"), ("x", "1"), ("x", "2"),   # mode 2, viol 1
                ("y", "9"), ("y", "9"),               # clean
                ("z", "5")]
        r = {t.lhs_col: t for t in
             fd_report(self._docs(spark, rows),
                       [("a", "b"), ("b", "a")]).collect()}
        ab = r["a"]
        assert (ab.n_rows, ab.n_groups, ab.n_violating_groups,
                ab.n_violations) == (6, 3, 1, 1)
        assert ab.conf_bp == (10000 * 5) // 6
        # b->a: b=1 maps only to x, b=9 only to y ... all clean
        assert r["b"].n_violations == 0 and r["b"].conf_bp == 10000

    def test_null_is_a_value(self, spark):
        from rgd_rnaseq_workflows_spark.operators.profile import fd_report
        rows = [(None, "1"), (None, "1"), (None, "2"), ("x", None)]
        r = fd_report(self._docs(spark, rows), [("a", "b")]).collect()[0]
        # NULL lhs is one group of 3 with mode 2 -> 1 violation;
        # ("x", NULL) is a clean singleton group
        assert (r.n_groups, r.n_violations) == (2, 1)

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.profile import (
            fd_report, fd_report_sql)
        rows = [("k%d" % (i % 7), "v%d" % (i % 3)) for i in range(50)]
        sdf = sorted(tuple(r) for r in
                     fd_report(self._docs(spark, rows),
                               [("a", "b"), ("b", "a")]).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t (a VARCHAR, b VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        ddf = sorted(tuple(r) for r in con.execute(
            fd_report_sql("t", [("a", "b"), ("b", "a")])).fetchall())
        assert sdf == ddf

    def test_empty_pairs_raises(self, spark):
        import pytest
        from rgd_rnaseq_workflows_spark.operators.profile import fd_report
        with pytest.raises(ValueError):
            fd_report(self._docs(spark, [("a", "b")]), [])


class TestKAnonymity:
    def test_counts_and_risk(self, spark):
        from rgd_rnaseq_workflows_spark.operators.profile import (
            k_anonymity_report)
        rows = ([("us", "a")] * 5 + [("us", "b")] * 2
                + [(None, "a")] * 1)
        df = spark.createDataFrame(rows, "country string, seg string")
        r = k_anonymity_report(df, ["country", "seg"], k=3).collect()[0]
        assert (r.n_rows, r.n_classes) == (8, 3)
        assert (r.n_small_classes, r.n_risk_rows) == (2, 3)
        assert r.risk_bp == (10000 * 3) // 8
        assert r.min_class_size == 1

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.profile import (
            k_anonymity_report, k_anonymity_sql)
        rows = [("c%d" % (i % 9), "s%d" % (i % 4)) for i in range(70)]
        df = spark.createDataFrame(rows, "country string, seg string")
        sdf = [tuple(r) for r in k_anonymity_report(
            df, ["country", "seg"], k=2).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t (country VARCHAR, seg VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        ddf = [tuple(r) for r in con.execute(
            k_anonymity_sql("t", ["country", "seg"], k=2)).fetchall()]
        assert sdf == ddf


class TestExpectations:
    def _df(self, spark):
        rows = [(1, "a", 10, "X"), (2, "b", 20, "Y"), (2, None, 200, "Z"),
                (4, "dd", -5, "X")]
        return spark.createDataFrame(rows, ["id", "name", "amt", "cat"])

    def test_violations_counted_exactly(self, spark):
        from rgd_rnaseq_workflows_spark.operators.profile import (
            expectations_report)
        cons = [("unique", "id"), ("not_null", "name"),
                ("range", "amt", 0, 100), ("in_set", "cat", ("X", "Y")),
                ("regex", "name", "^[a-z]$")]
        out = {(r["constraint"], r["column"]): (r["n_violations"],
                                                r["status"])
               for r in expectations_report(self._df(spark),
                                            cons).collect()}
        assert out[("unique", "id")] == (1, "FAIL")       # dup id=2
        assert out[("not_null", "name")] == (1, "FAIL")   # one NULL
        assert out[("range", "amt")] == (2, "FAIL")       # 200 and -5
        assert out[("in_set", "cat")] == (1, "FAIL")      # Z
        # regex: NULL counts as violation + "dd" fails ^[a-z]$
        assert out[("regex", "name")] == (2, "FAIL")

    def test_all_pass_suite(self, spark):
        from rgd_rnaseq_workflows_spark.operators.profile import (
            expectations_report)
        out = expectations_report(
            self._df(spark), [("range", "amt", -100, 1000)]).collect()
        assert len(out) == 1 and out[0]["status"] == "PASS"
        assert out[0]["n_rows"] == 4

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        from rgd_rnaseq_workflows_spark.operators.profile import (
            expectations_report, expectations_sql)
        cons = [("unique", "id"), ("not_null", "name"),
                ("range", "amt", 0, 100), ("in_set", "cat", ("X", "Y")),
                ("regex", "name", "^[a-z]$")]
        got = sorted(tuple(r) for r in
                     expectations_report(self._df(spark), cons).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE t(id INT, name VARCHAR, amt INT, "
                    "cat VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)",
                        [(1, "a", 10, "X"), (2, "b", 20, "Y"),
                         (2, None, 200, "Z"), (4, "dd", -5, "X")])
        exp = sorted(tuple(r) for r in
                     con.execute(expectations_sql("t", cons)).fetchall())
        assert got == exp

    def test_rejects_bad_input(self, spark):
        import pytest

        from rgd_rnaseq_workflows_spark.operators.profile import (
            expectations_report)
        with pytest.raises(ValueError):
            expectations_report(self._df(spark), [])
        with pytest.raises(ValueError):
            expectations_report(self._df(spark), [("bogus", "id")])


def test_expectations_sql_escapes_quoted_in_set_values(spark):
    """ADVICE r6: an in_set value containing a single quote must not
    produce malformed oracle SQL — and the two engines must agree."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.profile import (
        expectations_report, expectations_sql)
    rows = [(1, "o'brien"), (2, "plain"), (3, "x'); DROP TABLE t; --")]
    df = spark.createDataFrame(rows, ["id", "name"])
    cons = [("in_set", "name", ("o'brien", "plain"))]
    got = sorted(tuple(r) for r in
                 expectations_report(df, cons).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, name VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in
                 con.execute(expectations_sql("t", cons)).fetchall())
    assert got == exp
    assert got[0][3] == 1  # exactly the injection-looking row violates


# ---------------------------------------------------------------------------
# correlation matrix
# ---------------------------------------------------------------------------

def test_correlations_match_numpy_and_twin(spark):
    import duckdb
    import numpy as np

    from rgd_rnaseq_workflows_spark.operators.profile import (
        correlation_report, correlation_report_sql)
    rng = np.random.RandomState(2)
    x = rng.randint(0, 500, 300)
    y = 2 * x + rng.randint(0, 100, 300)     # strongly correlated
    z = rng.randint(0, 500, 300)             # independent
    rows = [(float(a) / 100, float(b) / 100, float(c) / 100)
            for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    cols = [("x", 100), ("y", 100), ("z", 100)]
    got = {(r["col_x"], r["col_y"]): (r["n"], r["r6"])
           for r in correlation_report(df, cols).collect()}
    ref = float(np.corrcoef(x, y)[0, 1])
    assert abs(got[("x", "y")][1] - ref) < 1e-6
    assert abs(got[("x", "z")][1]) < 0.2
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE, y DOUBLE, z DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = {(r[0], r[1]): (r[2], r[3]) for r in
           con.execute(correlation_report_sql("t", cols)).fetchall()}
    assert got == exp


def test_correlations_pairwise_null_deletion_and_degenerate(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        correlation_report)
    rows = [(1.0, 2.0, None), (2.0, 4.0, 5.0), (3.0, None, 5.0),
            (4.0, 8.0, 5.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_x"], r["col_y"]): (r["n"], r["r6"])
           for r in correlation_report(
               df, [("x", 10), ("y", 10), ("z", 10)]).collect()}
    assert got[("x", "y")] == (3, 1.0)       # exact linear, NULL row out
    assert got[("x", "z")][0] == 3
    assert got[("x", "z")][1] is None        # z constant: no variance
    with __import__("pytest").raises(ValueError):
        correlation_report(df, [("x", 10)])


# ---------------------------------------------------------------------------
# FK candidates
# ---------------------------------------------------------------------------

def test_fk_candidates_counts_orphans_exactly(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        fk_candidates_report)
    child = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (99,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk long")
    [r] = fk_candidates_report(
        spark, [(child, "fk", parent, "pk", "c->p")]).collect()
    # distinct non-null child values: {1,2,3,99}; 99 is the orphan
    assert (r["n_child_values"], r["n_contained"], r["n_orphans"],
            r["containment_bp"]) == (4, 3, 1, 7500)
    import pytest
    with pytest.raises(ValueError):
        fk_candidates_report(spark, [])


def test_embedding_health_report(spark):
    """Each defect class counted once with NULL > bad-dim > non-finite
    > zero precedence; healthy norm range matches the twin."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.profile import (
        embedding_health_report, embedding_health_sql)

    rows = [
        (1, [3.0, 4.0]),                  # healthy, norm 5
        (2, None),                        # null
        (3, [1.0]),                       # bad dim
        (4, [float("nan"), 1.0]),         # non-finite
        (5, [float("inf"), 0.0]),         # non-finite
        (6, [0.0, 0.0]),                  # all-zero
        (7, [0.6, 0.8]),                  # healthy, norm 1
    ]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<float>")
    [r] = embedding_health_report(emb, dims=2).collect()
    assert (r["n_vecs"], r["n_null"], r["n_bad_dim"], r["n_nonfinite"],
            r["n_zero"]) == (7, 1, 1, 2, 1)
    assert r["min_norm6"] == 1.0 and r["max_norm6"] == 5.0

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, "
                "embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    [exp] = con.execute(embedding_health_sql("embeddings",
                                             dims=2)).fetchall()
    assert tuple(r) == tuple(exp)


def test_l_diversity_hand_computed(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        l_diversity_report)
    # class (a): sensitive {x, x, y} -> 2 distinct (weak at l=3, 3 rows)
    # class (b): sensitive {x, y, z} -> 3 distinct (ok)
    # class (c): sensitive {None, x}  -> 2 distinct incl. NULL (weak, 2)
    rows = [("a", "x"), ("a", "x"), ("a", "y"),
            ("b", "x"), ("b", "y"), ("b", "z"),
            ("c", None), ("c", "x")]
    df = spark.createDataFrame(rows, "qi string, s string")
    r = l_diversity_report(df, ["qi"], "s", l=3).collect()[0]
    assert r["n_rows"] == 8 and r["n_classes"] == 3
    assert r["n_weak_classes"] == 2 and r["n_risk_rows"] == 5
    assert r["risk_bp"] == 10000 * 5 // 8 and r["min_l"] == 2


def test_join_explosion_hand_computed(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        join_explosion_report)
    # key 'a': 3x2=6, key 'b': 1x4=4, key 'c': left-only, NULL: excluded
    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] + [("c",)] + [(None,)], "k string")
    right = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 4 + [(None,)] * 5, "k string")
    rows = join_explosion_report(left, right, "k", "k", top_k=5).collect()
    assert [(r["rank"], r["key"], r["out_rows"]) for r in rows] == [
        (1, "a", 6), (2, "b", 4)]
    for r in rows:
        assert r["predicted_rows"] == 10 and r["n_keys_matched"] == 2
    assert rows[0]["share_ppm"] == 6 * 1000000 // 10
    assert rows[0]["left_rows"] == 3 and rows[0]["right_rows"] == 2


def test_join_explosion_sql_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.profile import (
        join_explosion_report, join_explosion_sql)
    rows = [(i % 13, i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(tuple(r) for r in
                 join_explosion_report(df, df, "a", "b",
                                       top_k=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        join_explosion_sql("t", "t", "a", "b", top_k=5)).fetchall())
    assert got == exp


def test_mutual_information_identical_and_independent(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        mutual_information_report)
    # identical columns: H(X)=H(Y)=H(XY) -> MI=H(X), NMI=10000
    rows = [(c, c) for c in "aabbbbcc"]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information_report(df, "x", "y").collect()[0]
    assert r["h_x_micro"] == r["h_y_micro"] == r["h_xy_micro"]
    assert r["mi_micro"] == r["h_x_micro"] and r["nmi_bp"] == 10000
    assert r["n_rows"] == 8 and r["n_cells"] == 3
    # exactly independent uniform 2x2: MI ~ 0 (rounding residue only),
    # clamped NMI stays 0
    rows2 = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df2 = spark.createDataFrame(rows2, "x string, y string")
    r2 = mutual_information_report(df2, "x", "y").collect()[0]
    assert abs(r2["mi_micro"]) <= 2 and r2["nmi_bp"] == 0
    # plug-in H for the uniform pair: ln(4) in micro-nats (per-term
    # rounded): 4 * round(1e6 * 5 * ln(4) / 20)
    import math
    assert r2["h_xy_micro"] == 4 * round(1e6 * 5 * math.log(4) / 20)


def test_mutual_information_null_rows_excluded(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        mutual_information_report)
    rows = [("a", "x"), ("a", None), (None, "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = mutual_information_report(df, "x", "y").collect()[0]
    assert r["n_rows"] == 2 and r["n_cells"] == 2


def test_source_overlap_minhash_identical_and_disjoint(spark):
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        source_overlap_minhash)
    same = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words nowhere near that sentence at all"
    rows = ([("s1", same)] * 3 + [("s2", same)] * 2
            + [("s3", other)] * 2)
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["group_a"], r["group_b"]): r for r in
           source_overlap_minhash(df, "source", "text",
                                  num_hashes=16).collect()}
    assert got[("s1", "s2")]["jaccard_bp"] == 10000  # identical sets
    assert got[("s1", "s3")]["jaccard_bp"] < 5000    # disjoint shingles
    assert len(got) == 3


def test_benford_excludes_nonpositive_and_counts_digits(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        benford_report)
    rows = [(1.0,), (19.99,), (2.50,), (0.0,), (-5.0,), (None,),
            (910.0,), (0.99,)]
    df = spark.createDataFrame(rows, "v double")
    got = {r["digit"]: r["n_values"] for r in
           benford_report(df, "v").collect()}
    # cents: 100, 1999, 250, excluded, excluded, excluded, 91000, 99
    assert got == {1: 2, 2: 1, 9: 2}


def test_benford_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.profile import (
        benford_report, benford_sql)
    rows = [(float(1 + (i * i) % 977) + 0.37,) for i in range(300)]
    df = spark.createDataFrame(rows, "v double")
    got = [tuple(r) for r in benford_report(df, "v").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    exp = [tuple(r) for r in
           con.execute(benford_sql("t", "v")).fetchall()]
    assert got == exp


def test_group_trend_recovers_planted_line(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        group_trend_report)
    # y = 3x + 7 exactly -> slope 3e6, intercept 7000, r2 = 1e6
    rows = [(i, 3 * i + 7, "lin") for i in range(50)]
    # constant y -> dy = 0 -> NULLs
    rows += [(i, 42, "flat") for i in range(10)]
    df = spark.createDataFrame(rows, "x long, y long, g string")
    got = {r["g"]: r for r in
           group_trend_report(df, "g", "x", "y").collect()}
    lin = got["lin"]
    assert (lin["slope_micro"], lin["intercept_milli"],
            lin["r2_ppm"]) == (3_000_000, 7_000, 1_000_000)
    flat = got["flat"]
    assert flat["slope_micro"] is None and flat["r2_ppm"] is None


def test_group_trend_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.profile import (
        group_trend_report, group_trend_sql)
    rows = [(i, (i * 17) % 301 + i // 3, f"g{i % 4}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "x long, y long, g string")
    got = [tuple(r) for r in
           group_trend_report(df, "g", "x", "y").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT, y BIGINT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = [tuple(r) for r in
           con.execute(group_trend_sql("t", "g", "x", "y")).fetchall()]
    assert got == exp


def test_t_closeness_hand_computed(spark):
    from rgd_rnaseq_workflows_spark.operators.profile import (
        t_closeness_report)
    # global: v in {1:4, 2:4}; class a: {1:4} (skewed), class b: {2:4}
    rows = [("a", 1)] * 4 + [("b", 2)] * 4
    df = spark.createDataFrame(rows, "q string, s long")
    r = t_closeness_report(df, ["q"], "s", t_milli=200).collect()[0]
    # m=2: EMD(a) = |P_a(cum1) - P_g(cum1)| = |1 - 0.5| = 0.5 -> 500
    assert r["max_t_milli"] == 500
    assert r["n_weak_classes"] == 2 and r["n_risk_rows"] == 8
    assert r["risk_bp"] == 10000
    # identical distributions -> EMD 0, nothing weak
    rows2 = [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
    df2 = spark.createDataFrame(rows2, "q string, s long")
    r2 = t_closeness_report(df2, ["q"], "s", t_milli=200).collect()[0]
    assert r2["max_t_milli"] == 0 and r2["n_weak_classes"] == 0


def test_t_closeness_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.profile import (
        t_closeness_report, t_closeness_sql)
    rows = [(f"q{i % 5}", (i * 7) % 9 if i % 11 else None)
            for i in range(300)]
    df = spark.createDataFrame(rows, "q string, s long")
    got = [tuple(r) for r in
           t_closeness_report(df, ["q"], "s", t_milli=100).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q VARCHAR, s BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(
        t_closeness_sql("t", ["q"], "s", t_milli=100)).fetchall()]
    assert got == exp
