"""Winnowing: guarantee property, selection density, partial overlap."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.winnowing import (
    shared_fingerprint_pairs, winnow_fingerprints)


@pytest.fixture(scope="module")
def docs(spark):
    shared_block = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"one two three four {shared_block} nine ten eleven twelve"),
        (1, f"{shared_block} completely different trailing words here now"),
        (2, "unrelated content with no common runs at all whatsoever kept"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_guarantee(spark, docs):
    """Docs 0 and 1 share an 8-token run ≥ w+k-1 = 6 → the winnowing
    guarantee promises ≥1 shared fingerprint; doc 2 shares none."""
    fps = winnow_fingerprints(docs, k=3, w=4)
    pairs = {(r.id_a, r.id_b): r.n_shared
             for r in shared_fingerprint_pairs(fps, min_shared=1).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_selection_density(spark, docs):
    """Winnowing stores far fewer fingerprints than k-grams: expected
    density 2/(w+1); assert well under half for w=4."""
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.functions.text import shingles_all
    fps = winnow_fingerprints(docs, k=3, w=4)
    n_sel = fps.count()
    n_grams = docs.select(
        F.explode(shingles_all("text", 3)).alias("g")).count()
    assert 0 < n_sel < 0.6 * n_grams


def test_matches_pure_python(spark, docs):
    """Engine selection equals the straightforward reference winnow."""
    import hashlib
    fps = {(r.doc_id, r.fp, r.pos)
           for r in winnow_fingerprints(docs, k=3, w=4).collect()}
    expect = set()
    for row in docs.collect():
        toks = row.text.split()
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % (1 << 40)
              for g in grams]
        for start in range(len(hs) - 4 + 1):
            window = hs[start:start + 4]
            m = min(window)
            # rightmost min
            off = max(i for i, v in enumerate(window) if v == m)
            expect.add((row.doc_id, m, start + off))
    assert fps == expect


def test_bad_window_raises(spark, docs):
    with pytest.raises(ValueError):
        winnow_fingerprints(docs, w=0)


def test_overlong_document_raises(spark, docs, monkeypatch):
    """A document with more k-gram positions than the packed-key cap
    must fail loudly, not silently truncate its tail (ADVICE r4). The
    cap is shrunk via the module constant so the test stays small."""
    from rgd_rnaseq_workflows_spark.operators import winnowing as W
    monkeypatch.setattr(W, "_POS_BITS", 3)        # cap = 8 positions
    long_doc = spark.createDataFrame(
        [(0, " ".join(f"tok{i}" for i in range(40)))],
        "doc_id long, text string")
    with pytest.raises(Exception, match="pre-chunk"):
        winnow_fingerprints(long_doc, k=3, w=4).collect()
    # and under the cap it still works with the shrunken key space
    short_doc = spark.createDataFrame(
        [(0, "a b c d e f")], "doc_id long, text string")
    assert winnow_fingerprints(short_doc, k=3, w=1).count() >= 1


# --- cross-corpus containment ------------------------------------------------

@pytest.fixture(scope="module")
def lake_and_new(spark):
    """A lake doc (10) whose middle contains an 8-token block; a small
    new doc (0) that is MOSTLY that block (high containment), a new doc
    (1) sharing it as a minor part of a long text (low containment),
    and an unrelated new doc (2)."""
    block = "alpha beta gamma delta epsilon zeta eta theta"
    new_rows = [
        (0, f"{block} tail"),
        (1, f"{block} " + " ".join(f"w{i}" for i in range(40))),
        (2, "totally unrelated words with no shared runs at all here"),
    ]
    lake_rows = [
        (10, f"lake preamble words here {block} lake trailing words"),
        (11, "another lake document with its own unrelated content"),
    ]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    lake = spark.createDataFrame(lake_rows, "doc_id long, text string")
    return new, lake


def test_containment_detects_pasted_block(spark, lake_and_new):
    from rgd_rnaseq_workflows_spark.operators.winnowing import (
        cross_containment_pairs)
    new, lake = lake_and_new
    nf = winnow_fingerprints(new, k=3, w=4)
    of = winnow_fingerprints(lake, k=3, w=4)
    out = {(r.id_new, r.id_old): r
           for r in cross_containment_pairs(nf, of, min_shared=1).collect()}
    # doc 0 is mostly the pasted block -> high containment vs lake 10
    assert (0, 10) in out and out[(0, 10)].containment > 0.5
    # doc 1 shares the same block but is much longer -> lower containment
    assert (1, 10) in out
    assert out[(1, 10)].containment < out[(0, 10)].containment
    # shared counts agree: same block, same fingerprints
    assert out[(1, 10)].n_shared >= 1
    # unrelated docs never pair
    assert not any(a == 2 or b == 11 for (a, b) in out)


def test_containment_never_pairs_lake_with_lake(spark, lake_and_new):
    """The incremental contract: output pairs are new x lake only."""
    from rgd_rnaseq_workflows_spark.operators.winnowing import (
        cross_containment_pairs)
    new, lake = lake_and_new
    nf = winnow_fingerprints(new, k=3, w=4)
    of = winnow_fingerprints(lake, k=3, w=4)
    rows = cross_containment_pairs(nf, of, min_shared=1).collect()
    new_ids = {r.doc_id for r in new.collect()}
    lake_ids = {r.doc_id for r in lake.collect()}
    assert all(r.id_new in new_ids and r.id_old in lake_ids for r in rows)


def test_containment_is_exact_fraction(spark, lake_and_new):
    """containment == n_shared / distinct-new-fps, to the cent."""
    from rgd_rnaseq_workflows_spark.operators.winnowing import (
        cross_containment_pairs)
    new, lake = lake_and_new
    nf = winnow_fingerprints(new, k=3, w=4)
    of = winnow_fingerprints(lake, k=3, w=4)
    n_fp = {r.doc_id: r.n for r in
            nf.select("doc_id", "fp").distinct()
              .groupBy("doc_id").count().withColumnRenamed("count", "n")
              .collect()}
    for r in cross_containment_pairs(nf, of, min_shared=1).collect():
        assert r.containment == round(r.n_shared / n_fp[r.id_new], 4)


def test_containment_thresholds_filter(spark, lake_and_new):
    from rgd_rnaseq_workflows_spark.operators.winnowing import (
        cross_containment_pairs)
    new, lake = lake_and_new
    nf = winnow_fingerprints(new, k=3, w=4)
    of = winnow_fingerprints(lake, k=3, w=4)
    all_rows = cross_containment_pairs(nf, of, min_shared=1).collect()
    hi = cross_containment_pairs(nf, of, min_shared=1,
                                 min_containment=0.5).collect()
    assert {(r.id_new, r.id_old) for r in hi} <= \
        {(r.id_new, r.id_old) for r in all_rows}
    assert all(r.containment >= 0.5 for r in hi)


# --- containment_keepers (within-corpus drop policy) -------------------------

class TestContainmentKeepers:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
        # doc 1 is a verbatim block of doc 0; doc 2 unrelated; doc 3
        # shares a token-level sprinkle with 0 but no long run
        rows = [
            (0, big),
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally different words that never appear in the big one "
                "padded out to comparable length for fingerprint volume"),
            (3, "alpha solo beta solo gamma solo delta solo epsilon solo"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_contained_doc_dropped_container_kept(self, spark, corpus):
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            containment_keepers, winnow_fingerprints)
        fps = winnow_fingerprints(corpus, k=3, w=4)
        rep = {r.doc_id: r for r in
               containment_keepers(fps, min_shared=2,
                                   threshold=0.5).collect()}
        assert rep[0].kept and rep[0].contained_in is None
        assert not rep[1].kept and rep[1].contained_in == 0
        assert rep[1].containment >= 0.5
        assert rep[2].kept
        # sprinkle overlap without a >= w+k-1 run stays under threshold
        assert rep[3].kept

    def test_identical_docs_tie_break_smaller_id(self, spark):
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            containment_keepers, winnow_fingerprints)
        txt = ("one two three four five six seven eight nine ten eleven "
               "twelve thirteen fourteen fifteen sixteen")
        docs = spark.createDataFrame(
            [(7, txt), (3, txt)], "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=3, w=4)
        rep = {r.doc_id: r for r in
               containment_keepers(fps, min_shared=1,
                                   threshold=0.9).collect()}
        assert rep[3].kept
        assert not rep[7].kept and rep[7].contained_in == 3
        assert rep[7].containment == 1.0

    def test_chain_collapses_to_maximum(self, spark):
        """a ⊂ b ⊂ c: greedy-static policy keeps only c (the chain's
        maximum); a and b are both dropped."""
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            containment_keepers, winnow_fingerprints)
        a = "alpha beta gamma delta epsilon zeta eta theta"
        b = a + " iota kappa lambda mu nu xi"
        c = b + " omicron pi rho sigma tau upsilon phi chi psi omega"
        docs = spark.createDataFrame(
            [(10, a), (11, b), (12, c)], "doc_id long, text string")
        fps = winnow_fingerprints(docs, k=3, w=4)
        rep = {r.doc_id: r for r in
               containment_keepers(fps, min_shared=2,
                                   threshold=0.6).collect()}
        assert rep[12].kept
        assert not rep[10].kept and not rep[11].kept
        # dominance never lets the chain's maximum drop
        assert rep[12].contained_in is None

    def test_matches_sql_twin(self, spark, corpus, tmp_path):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            containment_keepers, containment_keepers_sql,
            winnow_fingerprints)
        pdf = corpus.toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        got_sql = con.execute(containment_keepers_sql(
            "documents", k=3, w=4, min_shared=2, threshold=0.5)).df()
        fps = winnow_fingerprints(corpus, k=3, w=4)
        got = containment_keepers(fps, min_shared=2,
                                  threshold=0.5).toPandas()
        key = lambda df: sorted(  # noqa: E731
            (int(r.doc_id), int(r.n_fp), bool(r.kept),
             None if r.contained_in is None or r.contained_in != r.contained_in
             else int(r.contained_in),
             None if r.containment is None or r.containment != r.containment
             else round(float(r.containment), 4))
            for r in df.itertuples(index=False))
        assert key(got) == key(got_sql)
