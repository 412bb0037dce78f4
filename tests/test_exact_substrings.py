"""Exact duplicated-substring dedup (Lee et al. 2022 ExactSubstr
shape): fingerprint-ladder correctness, keep-first keeper semantics,
interval-merged spans, byte accounting, and DuckDB-twin equality on
planted repeats."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
    _ladder_widths, duplicate_spans, exact_substring_accounting,
    exact_substring_report_sql, rewrite_without_duplicate_substrings,
    window_fingerprints)


def test_ladder_widths():
    assert _ladder_widths(1) == []
    assert _ladder_widths(2) == [1]
    assert _ladder_widths(4) == [1, 2]
    assert _ladder_widths(8) == [1, 2, 4]
    # non-powers of two: one overlapped combine at L - 2^k
    assert _ladder_widths(3) == [1, 1]
    assert _ladder_widths(5) == [1, 2, 1]
    assert _ladder_widths(50) == [1, 2, 4, 8, 16, 18]
    with pytest.raises(ValueError):
        _ladder_widths(0)


def test_fingerprint_equality_iff_substring_equality(spark):
    """Equal L-windows get equal fingerprints; any differing window
    (including at non-power-of-two L where the last combine overlaps)
    gets a different one. Boundary positions yield no fingerprint."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "z a b c d e"), (3, "a b c x e")],
        ["doc_id", "text"])
    for L in (2, 3, 4, 5):
        fps = [(r["doc_id"], r["pos"], r["fp"]) for r in
               window_fingerprints(docs, L).collect()]
        # every doc contributes exactly n_tokens - L + 1 positions
        n = {1: 5, 2: 6, 3: 5}
        from collections import Counter
        per_doc = Counter(d for d, _, _ in fps)
        assert per_doc == {d: cnt - L + 1 for d, cnt in n.items()}
        by_key = {(d, p): f for d, p, f in fps}
        # doc2 is doc1 shifted by one: all windows equal at offset +1
        for p in range(5 - L + 1):
            assert by_key[(1, p)] == by_key[(2, p + 1)]
        # doc3 differs at token 3 ('x' vs 'd'): windows covering
        # position 3 differ from doc1's
        for p in range(5 - L + 1):
            covers = p <= 3 < p + L
            assert (by_key[(3, p)] == by_key[(1, p)]) != covers


def test_hand_case_spans_and_rewrite(spark):
    """Keep-first keeper, self-repeats, merged overlapping windows,
    and exact accounting on a hand-checkable corpus."""
    rows = [
        (1, "a b c d e f g h i j"),       # global keeper of "c d e f"
        (2, "x x c d e f y y c d e f z"),  # two later copies
        (3, "q w e r t y u i o p"),        # clean
        (4, "a b c d e f g h zz"),         # repeated 8-token run
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = sorted(tuple(r) for r in duplicate_spans(docs, 4).collect())
    # doc2: [2,6) and [8,12); doc4: windows 0..4 all match doc1 and
    # merge into one span [0,8)
    assert spans == [(2, 2, 6), (2, 8, 12), (4, 0, 8)]
    rw = {r["doc_id"]: (r["clean_text"], r["removed_tokens"],
                        r["n_spans"])
          for r in rewrite_without_duplicate_substrings(docs, 4)
          .collect()}
    assert rw[1] == ("a b c d e f g h i j", 0, 0)   # keeper intact
    assert rw[2] == ("x x y y z", 8, 2)
    assert rw[3] == ("q w e r t y u i o p", 0, 0)
    assert rw[4] == ("zz", 8, 1)


def test_planted_repeats_twin_equality_and_invariants(spark):
    """A messy corpus with PLANTED repeated passages: the Spark
    accounting equals the DuckDB twin bit-for-bit, and the rewrite's
    byte accounting holds (removed_tokens == n_tokens − kept tokens ==
    Σ merged span lengths, spans disjoint)."""
    rng = random.Random(41)
    vocab = ["w%d" % i for i in range(2000)]  # big vocab: no accident
    planted = [" ".join(rng.choice(vocab) for _ in range(12))
               for _ in range(5)]
    rows = []
    for i in range(120):
        toks = [rng.choice(vocab) for _ in range(rng.randint(10, 60))]
        text = " ".join(toks)
        if i % 3 == 0:   # plant a repeated passage mid-document
            cut = rng.randint(0, len(toks))
            text = " ".join(toks[:cut]) + " " + planted[i % 5] + \
                " " + " ".join(toks[cut:])
        rows.append((i, text.strip()))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    L = 8

    got = [tuple(r) for r in
           exact_substring_accounting(docs, L).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(
        exact_substring_report_sql("documents", L)).fetchall()]
    assert got == exp
    assert len(got) >= 30        # the planted repeats were found

    # accounting invariants on the rewrite
    rw = rewrite_without_duplicate_substrings(docs, L)
    from rgd_rnaseq_workflows_spark.functions import text as TX
    chk = rw.select(
        "doc_id", "removed_tokens", "n_spans",
        TX.token_count("text").alias("n"),
        TX.token_count("clean_text").alias("n_clean")).collect()
    for r in chk:
        assert r["removed_tokens"] == r["n"] - r["n_clean"]
    spans = [tuple(r) for r in duplicate_spans(docs, L).collect()]
    assert sum(e - s for _, s, e in spans) == \
        sum(r["removed_tokens"] for r in chk)
    # merged spans are disjoint with a gap (no touching intervals)
    by_doc = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    for d, ss in by_doc.items():
        ss.sort()
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert s2 > e1

    # every later copy of a planted passage was removed: re-running the
    # finder on the CLEAN text finds no window equal to a planted one
    clean = rw.select("doc_id", F.col("clean_text").alias("text"))
    fps = window_fingerprints(clean, 12)
    plant_df = spark.createDataFrame([(i, p) for i, p in
                                      enumerate(planted)],
                                     ["doc_id", "text"])
    plant_fps = window_fingerprints(plant_df, 12).filter("pos = 0") \
        .select("fp")
    hits = fps.join(plant_fps, "fp").count()
    assert hits == 5             # exactly the 5 kept first occurrences


def test_short_documents_yield_nothing(spark):
    """Documents shorter than L produce no fingerprints, no spans, and
    pass through the rewrite untouched — in both engines."""
    rows = [(1, "a b c"), (2, "a b c"), (3, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert window_fingerprints(docs, 5).count() == 0
    assert duplicate_spans(docs, 5).count() == 0
    rw = {r["doc_id"]: (r["clean_text"], r["removed_tokens"])
          for r in rewrite_without_duplicate_substrings(docs, 5)
          .collect()}
    assert rw == {1: ("a b c", 0), 2: ("a b c", 0), 3: ("", 0)}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    assert con.execute(
        exact_substring_report_sql("documents", 5)).fetchall() == []


def test_corpus_cli_exact_substr_stage(spark, tmp_path):
    """e2e: --exact-substr L rewrites duplicated windows out BEFORE
    curation; the curated corpus carries the rewritten text."""
    import os

    from rgd_rnaseq_workflows_spark import run_corpus

    base = ("the cat and dog of mouse to house in barn is red it "
            "runs over fields near rivers under stars")
    rows = [
        (1, "en", "web", base + " uniq1 uniq2 uniq3"),
        # doc 2 embeds doc 1's opening 8-token run inside other text
        (2, "en", "web", "alpha beta " + " ".join(base.split()[:8])
         + " gamma delta " + base.replace("cat", "bat")),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source",
                                        "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "corpus_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.95",
                          "--exact-substr", "8"])
    assert rc == 0
    curated = {r["doc_id"]: r["text"] for r in
               spark.read.parquet(f"{out}/curated").collect()}
    assert curated[1].startswith("the cat and dog")   # keeper intact
    # doc 2 lost the copied run (and only it — the 'bat' variant stays)
    assert "alpha beta gamma delta" in curated[2]
    assert "the cat and dog of mouse to house in" not in curated[2]
    assert "bat" in curated[2]


def test_calibration_report(spark):
    """Per-L adequacy stats: monotone window counts, dup counts shrink
    as L grows, removed mass equals the rewrite's accounting at each
    L, and the DuckDB twin agrees bit-for-bit."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        exact_substring_calibration, exact_substring_calibration_sql)

    rng = random.Random(17)
    vocab = ["w%d" % i for i in range(500)]
    planted = " ".join(rng.choice(vocab) for _ in range(10))
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(8, 50)))
             + (" " + planted if i % 4 == 0 else ""))
            for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [tuple(r) for r in
           exact_substring_calibration(docs, (3, 6, 9)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = [tuple(r) for r in con.execute(
        exact_substring_calibration_sql("documents",
                                        (3, 6, 9))).fetchall()]
    assert got == exp
    ws = [r[0] for r in got]
    assert ws == [3, 6, 9]
    # fewer windows and fewer dup occurrences as L grows
    assert got[0][1] > got[1][1] > got[2][1]
    assert got[0][2] >= got[1][2] >= got[2][2]
    # per-L removed mass equals the rewrite accounting
    for w, _, _, _, removed in got:
        rw = rewrite_without_duplicate_substrings(docs, w)
        assert removed == sum(r["removed_tokens"]
                              for r in rw.collect())


def test_substring_contamination(spark):
    """Verbatim benchmark windows are found regardless of surrounding
    text (the case n-gram Jaccard under-weights); the DuckDB twin
    agrees; clean docs are absent."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        substring_contamination, substring_contamination_sql)

    bench_rows = [(100, "what is the capital of france paris"),
                  (101, "two plus two equals four exactly")]
    doc_rows = [
        # embeds bench 100's 6-token answer string verbatim
        (1, "filler one two what is the capital of france more filler"),
        # embeds windows from BOTH bench docs
        (2, "x what is the capital of france y two plus two equals "
            "four exactly z"),
        (3, "completely unrelated content about something else here"),
    ]
    docs = spark.createDataFrame(doc_rows, ["doc_id", "text"])
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    got = [tuple(r) for r in
           substring_contamination(docs, bench, window=6).collect()]
    assert [d for d, _, _ in got] == [1, 2]
    by_doc = {d: (h, b) for d, h, b in got}
    assert by_doc[1][1] == 1
    assert by_doc[2][1] == 2

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.execute("CREATE TABLE bench(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", doc_rows)
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    exp = [tuple(r) for r in con.execute(
        substring_contamination_sql("docs", "bench", 6)).fetchall()]
    assert got == exp


def test_contamination_index_probe_equals_inquery(spark, tmp_path):
    """Persisted eval-fingerprint index: probing a corpus against the
    stored table equals the in-query substring_contamination over the
    same benchmark, and the probe ladders at the index's own window."""
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        probe_contamination_index, substring_contamination,
        write_contamination_index)

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "intro text then the quick brown fox jumps over it"),
         (11, "totally clean document with original words only"),
         (12, "pack my box with five dozen liquor jugs verbatim")],
        ["doc_id", "text"])
    path = str(tmp_path / "contam_idx")
    write_contamination_index(bench, path, window=5)

    got = [tuple(r) for r in
           probe_contamination_index(spark, path, docs).collect()]
    want = [tuple(r) for r in
            substring_contamination(docs, bench, window=5).collect()]
    assert got == want
    assert {d for d, _, _ in got} == {10, 12}   # doc 11 clean


def test_calibration_all_docs_shorter_than_window(spark):
    """Candidate windows longer than every document: the row is all
    exact ZEROS (not NULLs) on both engines — the cross-engine
    integer contract's empty edge."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        exact_substring_calibration, exact_substring_calibration_sql)
    docs = spark.createDataFrame([(1, "a b c"), (2, "d e")],
                                 ["doc_id", "text"])
    got = sorted(tuple(r) for r in
                 exact_substring_calibration(docs, (16,)).collect())
    assert got == [(16, 0, 0, 0, 0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(1, "a b c"), (2, "d e")])
    exp = sorted(tuple(r) for r in con.execute(
        exact_substring_calibration_sql("documents", (16,))).fetchall())
    assert got == exp


def test_multi_window_harvest_equals_per_window_ladders(spark):
    """The one-pass harvest: each fp_<w> column of
    multi_window_fingerprints, filtered non-NULL, equals the
    standalone per-L ladder — power-of-two harvest levels AND the
    overlapped-combine branch for non-powers-of-two."""
    import random

    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        multi_window_fingerprints, window_fingerprints)
    rng = random.Random(7)
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice("a b c d".split())
                      for _ in range(rng.randint(0, 25))))
         for i in range(30)], "doc_id long, text string")
    for ws in [(4, 8, 16), (3, 5, 12), (1, 2, 7)]:
        multi = multi_window_fingerprints(docs, ws)
        for w in ws:
            got = sorted(tuple(r) for r in
                         multi.filter(F.col(f"fp_{w}").isNotNull())
                         .select("doc_id", "pos", f"fp_{w}").collect())
            want = sorted(tuple(r) for r in
                          window_fingerprints(docs, w).collect())
            assert got == want, (ws, w)


def test_contamination_index_append_equals_rebuild(spark, tmp_path):
    """Eval suites grow: appending a new benchmark at the index's
    FROZEN window equals rebuilding over the union, probes see the
    appended suite immediately, and a replayed epoch key no-ops."""
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        append_to_contamination_index, probe_contamination_index,
        write_contamination_index)

    bench1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    bench2 = spark.createDataFrame(
        [(2, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "intro text then the quick brown fox jumps over it"),
         (11, "totally clean document with original words only"),
         (12, "pack my box with five dozen liquor jugs verbatim")],
        ["doc_id", "text"])
    p_inc = str(tmp_path / "inc")
    p_full = str(tmp_path / "full")
    write_contamination_index(bench1, p_inc, window=5)
    assert append_to_contamination_index(bench2, p_inc,
                                         epoch_key="e1") is True
    write_contamination_index(bench1.unionByName(bench2), p_full,
                              window=5)
    got = [tuple(r) for r in
           probe_contamination_index(spark, p_inc, docs).collect()]
    want = [tuple(r) for r in
            probe_contamination_index(spark, p_full, docs).collect()]
    assert got == want
    assert {d for d, _, _ in got} == {10, 12}
    # replayed epoch key = no-op; probe unchanged
    assert append_to_contamination_index(bench2, p_inc,
                                         epoch_key="e1") is False
    assert [tuple(r) for r in
            probe_contamination_index(spark, p_inc, docs).collect()] \
        == got


def test_contamination_index_cli(spark, tmp_path):
    """e2e: --contam-index builds from --benchmark, --contam-append
    extends it, probe-contam screens a delta through the CLI."""
    import glob as _glob

    from rgd_rnaseq_workflows_spark import run_corpus

    filler = ("the and of to in is it a for on " +
              " ".join(f"pad{i}" for i in range(10)))
    bench1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    bench2 = spark.createDataFrame(
        [(2, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "en", "web",
          "intro the quick brown fox jumps over it " + filler),
         (11, "en", "web", "clean original words only " + filler),
         (12, "en", "web",
          "pack my box with five dozen liquor jugs here " + filler)],
        ["doc_id", "lang", "source", "text"])
    src = str(tmp_path / "docs.parquet")
    b1 = str(tmp_path / "bench1.parquet")
    b2 = str(tmp_path / "bench2.parquet")
    docs.write.parquet(src)
    bench1.write.parquet(b1)
    bench2.write.parquet(b2)
    idx = str(tmp_path / "contam_idx")
    out = str(tmp_path / "corpus_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.99",
                          "--benchmark", b1,
                          "--contam-index", idx, "--contam-window", "5"])
    assert rc == 0
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.99",
                          "--benchmark", b2,
                          "--contam-index", idx, "--contam-append"])
    assert rc == 0
    probe_out = str(tmp_path / "probe_out")
    rc = run_corpus.main(["probe-contam", "--index", idx,
                          "--docs", src, "--out", probe_out])
    assert rc == 0
    [tsv] = _glob.glob(f"{probe_out}/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    hit_ids = {int(ln.split("\t")[0]) for ln in lines[1:]}
    assert hit_ids == {10, 12}
