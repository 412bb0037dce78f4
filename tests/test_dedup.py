"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.dedup import (
    exact_dedup, exact_duplicate_groups, minhash_dedup_pairs,
    minhash_signatures, ngram_jaccard_pairs, simhash, simhash_near_pairs)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "a"),   # exact dup
    (3, "the quick brown fox jumps over the lazy cat", "en", "a"),   # near dup
    (4, "completely different words entirely unrelated text here now", "en", "a"),
    (5, "der schnelle braune fuchs springt", "de", "b"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang", "source"])


def test_exact_dedup_keeps_lowest_id(spark):
    out = exact_dedup(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4, 5]
    groups = exact_duplicate_groups(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2 and groups[0]["keeper_id"] == 1


def test_minhash_finds_exact_and_near_dups(spark):
    pairs = minhash_dedup_pairs(_docs(spark), num_hashes=8, band_size=2,
                                shingle_n=2, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0          # identical docs always collide
    assert (1, 4) not in got and (2, 4) not in got


def test_minhash_signature_identical_for_identical_text(spark):
    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(4))
            for r in minhash_signatures(_docs(spark), num_hashes=4).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_simhash_stability_and_near_pairs(spark):
    fps = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    assert fps[1] == fps[2]                      # identical text
    assert 0 <= fps[1] < 2 ** 32
    pairs = simhash_near_pairs(_docs(spark), max_hamming=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got                         # hamming 0
    assert (1, 5) not in got


def test_ngram_jaccard_matches_naive(spark):
    """PPJoin prefix/length pruning must not change the result set."""
    docs = _docs(spark)
    fast = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, "lang", shingle_n=1,
                                         threshold=0.3).collect()}
    # naive blocked all-pairs on token sets
    from rgd_rnaseq_workflows_spark.functions.text import shingles
    s = docs.select("doc_id", F.col("lang").alias("blk"),
                    shingles("text", 1).alias("sh"))
    naive = (s.alias("a").join(s.alias("b"),
                               (F.col("a.blk") == F.col("b.blk"))
                               & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b"),
                     F.round(F.size(F.array_intersect("a.sh", "b.sh"))
                             / F.size(F.array_union("a.sh", "b.sh")), 4)
                     .alias("jaccard"))
             .filter(F.col("jaccard") >= 0.3))
    naive_map = {(r["id_a"], r["id_b"]): r["jaccard"] for r in naive.collect()}
    assert fast == naive_map
    assert (1, 2) in fast and fast[(1, 2)] == 1.0


def test_ngram_verify_join_is_size_gated(spark):
    """broadcast_verify=None must leave the verify joins to AQE's
    runtime size gate: small corpus → broadcast plan; a corpus 'too big
    to broadcast' (simulated by threshold=-1) → shuffle plan. Rows are
    identical in every mode."""
    docs = _docs(spark)

    def run(**kw):
        out = ngram_jaccard_pairs(docs, "lang", shingle_n=1,
                                  threshold=0.3, **kw)
        rows = sorted(map(tuple, out.collect()))
        return rows, out._jdf.queryExecution().executedPlan().toString()

    rows_default, plan_small = run()
    rows_forced_bc, plan_bc = run(broadcast_verify=True)
    rows_forced_sm, plan_sm = run(broadcast_verify=False)
    assert rows_default == rows_forced_bc == rows_forced_sm
    assert rows_default, "expected at least one near-dup pair"
    # small corpus, no hint: AQE's size gate chooses broadcast
    assert "BroadcastHashJoin" in plan_small
    # forced merge hint: not even AQE may broadcast the verify joins
    assert "SortMergeJoin" in plan_sm
    assert plan_sm.count("BroadcastHashJoin") < plan_bc.count(
        "BroadcastHashJoin")
    # 'large corpus': with the broadcast budget exhausted the size gate
    # must degrade the UNHINTED plan to the shuffle join, not OOM
    conf = spark.conf
    saved = (conf.get("spark.sql.autoBroadcastJoinThreshold"),
             conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                      None))
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        rows_large, plan_large = run()
        assert rows_large == rows_default
        assert "SortMergeJoin" in plan_large
        assert "BroadcastHashJoin" not in plan_large
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", saved[0])
        if saved[1] is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                     saved[1])


# --- passage-level dedup -----------------------------------------------------

def test_passage_dedup_stats(spark):
    from rgd_rnaseq_workflows_spark.operators.dedup import passage_dedup_stats
    shared = "one two three four"          # one 4-token passage
    rows = [
        (0, f"{shared} aa bb cc dd"),      # 2 passages, 1 duplicated
        (1, f"{shared} ee ff gg hh"),      # 2 passages, 1 duplicated
        (2, "ii jj kk ll mm nn oo pp"),    # 2 passages, none duplicated
        (3, f"{shared} {shared}"),         # self-duplicate: both passages dup
        (4, "tail only"),                  # single partial passage
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           passage_dedup_stats(df, window=4, max_dup_frac=0.6).collect()}
    assert out[0].n_passages == 2 and out[0].n_dup_passages == 1
    assert out[0].dup_frac == 0.5 and out[0].keep
    assert out[1].dup_frac == 0.5
    assert out[2].n_dup_passages == 0 and out[2].keep
    assert out[3].n_passages == 2 and out[3].n_dup_passages == 2
    assert out[3].dup_frac == 1.0 and not out[3].keep
    assert out[4].n_passages == 1 and out[4].n_dup_passages == 0


def test_remove_duplicate_passages(spark):
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        remove_duplicate_passages)
    shared = "one two three four"
    rows = [
        (0, f"{shared} aa bb cc dd"),
        (1, f"{shared} ee ff gg hh"),      # loses the shared passage
        (2, f"{shared} {shared}"),         # loses both copies (doc 0 owns it)
        (3, "solo words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           remove_duplicate_passages(df, window=4).collect()}
    assert out[0].clean_text == f"{shared} aa bb cc dd"
    assert out[0].n_removed == 0
    assert out[1].clean_text == "ee ff gg hh"
    assert out[1].n_removed == 1
    assert out[2].clean_text == "" and out[2].n_removed == 2
    assert out[3].clean_text == "solo words here"


def test_cross_corpus_minhash_pairs(spark):
    """New-crawl-vs-lake dedup: finds the cross-corpus near-dup, never
    emits old x old pairs even when the lake contains exact dups."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        cross_corpus_minhash_pairs)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    new = spark.createDataFrame(
        [(100, base + " extra"),               # near-dup of lake doc 1
         (101, "totally different words about completely other topics "
               "covering many unrelated subjects here")],
        "doc_id long, text string")
    old = spark.createDataFrame(
        [(1, base),
         (2, base),                            # lake-internal exact dup
         (3, "nothing in common with anything at all whatsoever")],
        "doc_id long, text string")
    pairs = {(r.id_new, r.id_old): r.jaccard
             for r in cross_corpus_minhash_pairs(
                 new, old, shingle_n=2, threshold=0.5).collect()}
    assert set(pairs) == {(100, 1), (100, 2)}
    assert all(0.5 <= j <= 1.0 for j in pairs.values())


def test_cross_corpus_equals_union_self_join_restriction(spark):
    """cross_corpus(new, old) must equal minhash_dedup_pairs(new ∪ old)
    restricted to cross pairs — same signatures, same bands, same
    verify — so the incremental path can replace the full re-self-join
    without changing results."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        cross_corpus_minhash_pairs, minhash_dedup_pairs)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    new = spark.createDataFrame(
        [(100, base + " extra"), (101, base + " other tail"),
         (102, "entirely unrelated text with distinct words only")],
        "doc_id long, text string")
    old = spark.createDataFrame(
        [(1, base), (2, base + " second"),
         (3, "different unrelated content again")],
        "doc_id long, text string")
    cross = {(r.id_new, r.id_old, r.jaccard)
             for r in cross_corpus_minhash_pairs(
                 new, old, shingle_n=2, threshold=0.5).collect()}
    new_ids = {100, 101, 102}
    full = minhash_dedup_pairs(new.unionByName(old), shingle_n=2,
                               threshold=0.5).collect()
    want = set()
    for r in full:
        a_new, b_new = r.id_a in new_ids, r.id_b in new_ids
        if a_new != b_new:  # exactly one side from the new corpus
            nid, oid = (r.id_a, r.id_b) if a_new else (r.id_b, r.id_a)
            want.add((nid, oid, r.jaccard))
    assert cross == want and cross


class TestSharedSpans:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string")

    def test_pasted_block_is_one_long_run(self, spark):
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            shared_span_report, winnow_fingerprints)
        block = " ".join("tok%d" % i for i in range(40))
        a = "alpha beta gamma " + block + " delta epsilon zeta"
        b = "one two three four five " + block + " six seven eight"
        fps = winnow_fingerprints(self._docs(spark, [a, b]), k=3, w=4)
        got = shared_span_report(fps, k=3, w=4).collect()
        assert len(got) == 1
        r = got[0]
        assert (r.id_a, r.id_b) == (0, 1)
        assert r.n_runs == 1
        # the 40-token block must be spanned nearly end to end
        assert r.max_span_tokens >= 30
        assert r.max_run_fps >= 5

    def test_scattered_shared_words_do_not_form_runs(self, spark):
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            shared_span_report, winnow_fingerprints)
        # share vocabulary but no contiguous >= k-gram runs beyond
        # coincidence: different orders
        a = " ".join("w%d" % i for i in range(30))
        b = " ".join("w%d" % i for i in range(29, -1, -1))
        fps = winnow_fingerprints(self._docs(spark, [a, b]), k=3, w=4)
        got = shared_span_report(fps, k=3, w=4, min_run=2).collect()
        assert got == []

    def test_two_separate_blocks_are_two_runs(self, spark):
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            shared_span_report, winnow_fingerprints)
        b1 = " ".join("x%d" % i for i in range(20))
        b2 = " ".join("y%d" % i for i in range(20))
        a = b1 + " filler1 filler2 filler3 filler4 filler5 " + b2
        b = b2 + " pad1 pad2 pad3 pad4 pad5 pad6 pad7 " + b1
        fps = winnow_fingerprints(self._docs(spark, [a, b]), k=3, w=4)
        got = shared_span_report(fps, k=3, w=4).collect()
        assert len(got) == 1 and got[0].n_runs >= 2

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.winnowing import (
            shared_span_report, shared_span_sql, winnow_fingerprints)
        block = " ".join("s%d" % i for i in range(15))
        texts = ["intro " + block + " outro",
                 block + " tail words here",
                 "unrelated content entirely different words",
                 "another " + block]
        fps = winnow_fingerprints(self._docs(spark, texts), k=3, w=4)
        sdf = sorted(map(tuple,
                         shared_span_report(fps, k=3, w=4).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        ddf = sorted(map(tuple, con.execute(
            shared_span_sql("documents", k=3, w=4)).fetchall()))
        assert sdf == ddf


def test_minhash_calibration_report(spark):
    """Exact duplicates land in the top bucket with est == exact ==
    10000 and zero error; every bucket's mean_est sits inside its
    bucket bounds; DuckDB twin agrees exactly."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.dedup import (
        minhash_calibration_report, minhash_calibration_sql)

    out = minhash_calibration_report(_docs(spark), num_hashes=8,
                                     band_size=2, shingle_n=3)
    rows = out.collect()
    assert rows, "LSH should produce at least the exact-dup pair"
    by_bucket = {r["bucket"]: r for r in rows}
    top = by_bucket[max(by_bucket)]
    # the (1,2) exact-dup pair: all signature components agree and the
    # shingle sets are identical
    assert top["mean_est_bp"] == 10000
    assert top["mean_exact_bp"] == 10000
    assert top["mean_abs_err_bp"] == 0
    for r in rows:
        assert r["bucket"] * 1000 <= r["mean_est_bp"] <= 10000
        assert r["n_pairs"] >= 1

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?)", DOCS)
    exp = sorted(tuple(r) for r in con.execute(
        minhash_calibration_sql("documents", num_hashes=8, band_size=2,
                                shingle_n=3)).fetchall())
    assert sorted(tuple(r) for r in rows) == exp


def test_ppjoin_boundary_pairs_epsilon_safe(spark):
    """Exact-threshold boundary pairs (r12 advisor regression): the
    pruning bounds (prefix_len, alpha, short-prefix, length filter) are
    exact rationals evaluated in doubles, and at exact-integer
    boundaries (t=0.8: sz=5 prefix, sz=9 short prefix, 4 >= 0.8*5
    length filter, alpha at sz_a+sz_b=18) the drift used to falsely
    prune pairs whose Jaccard is EXACTLY the threshold. The
    epsilon-safe bounds must return them."""
    # two 9-token docs sharing 8 tokens: J = 8/10 = 0.8 exactly
    # (advisor high finding: has_short gate pruned this pair)
    a9 = " ".join(f"w{i}" for i in range(9))
    b9 = " ".join([f"w{i}" for i in range(8)] + ["z9"])
    # 4-token doc contained in a 5-token doc: J = 4/5 = 0.8 exactly
    # (advisor medium finding: prefix_len AND the length filter both
    # pruned this pair)
    a4 = " ".join(f"v{i}" for i in range(4))
    b5 = " ".join(f"v{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, a9, "en"), (2, b9, "en"), (3, a4, "en"), (4, b5, "en")],
        ["doc_id", "text", "lang"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs, "lang", shingle_n=1,
                                        threshold=0.8).collect()}
    assert got == {(1, 2): 0.8, (3, 4): 0.8}


def test_ppjoin_collect_cap_window_fallback(spark):
    """Docs above ``collect_cap`` take the spill-safe row_number window
    prefix build (the collect_list buffer cannot spill); forcing a tiny
    cap must leave the result set bit-identical."""
    docs = _docs(spark)
    base = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "lang", shingle_n=1, threshold=0.3).collect()))
    capped = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "lang", shingle_n=1, threshold=0.3,
        collect_cap=4).collect()))   # every 5+-shingle doc → window path
    mixed = sorted(map(tuple, ngram_jaccard_pairs(
        docs, "lang", shingle_n=1, threshold=0.3,
        collect_cap=7).collect()))   # both paths populated
    assert base and capped == base and mixed == base
