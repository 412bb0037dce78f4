"""Repetition metrics and cross-doc n-gram coverage on handcrafted docs."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.quality import (
    ngram_coverage_report, repetition_report, tfidf_top_terms)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "a a a a"),
        (1, "w x y z"),
        (2, "p q r s t u v w"),
        (3, "p q r s different tail here"),
        (4, "solo unique words only here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_metrics(spark, docs_df):
    out = {r.doc_id: r for r in repetition_report(docs_df).collect()}
    r0 = out[0]
    assert r0.n_tokens == 4
    assert r0.dup_token_frac == 0.75            # 1 - 1/4
    assert r0.top_bigram_n == 3                 # "a a" overlapping x3
    assert r0.top_bigram_frac == 1.5            # 3*2/4
    assert r0.status == "FAIL"
    r1 = out[1]
    assert r1.dup_token_frac == 0.0
    assert r1.top_bigram_n == 1
    assert r1.status == "FAIL" or r1.top_bigram_frac == 0.5
    # 4 distinct tokens can't pass the 0.18 bigram bound by construction;
    # a longer diverse doc does:
    long_doc = spark.createDataFrame(
        [(9, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string")
    assert repetition_report(long_doc).first().status == "PASS"


def test_ngram_coverage(spark, docs_df):
    out = {r.doc_id: r for r in
           ngram_coverage_report(docs_df, n=4).collect()}
    # docs 2 and 3 share exactly the 4-gram "p q r s" (1 position each)
    assert out[2].n_dup_positions == 1
    assert out[3].n_dup_positions == 1
    assert out[2].n_positions == 5              # 8 tokens -> 5 positions
    assert out[2].dup_frac == 0.2
    # doc 0 repeats "a a a a" only within itself -> not cross-doc
    assert out[0].n_dup_positions == 0
    assert out[4].n_dup_positions == 0
    # every doc present, even with zero duplicated positions
    assert set(out) == {0, 1, 2, 3, 4}


def test_tfidf_top_terms(spark):
    import math
    rows = [
        (0, "cat dog", "en"),
        (1, "cat cat bird", "en"),
        (2, "chat chien", "fr"),
        (3, "cat chat", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = [(r.lang, r.rk, r.term, r.tf, r.df, r.tfidf)
           for r in tfidf_top_terms(df, k=2).collect()]
    by_lang = {}
    for lang, rk, term, tf, df_, tfidf in out:
        by_lang.setdefault(lang, []).append((rk, term, tf, df_, tfidf))
    # en: cat tf=3 df=3 -> 3*ln(4/3)=0.86; bird/dog tf=1 df=1 -> ln(4)=1.39
    # bird and dog tie at ln(4) and both outrank cat; tie breaks on term
    en = sorted(by_lang["en"])
    assert en[0][1:4] == ("bird", 1, 1)
    assert en[0][4] == pytest.approx(math.log(4.0), abs=1e-6)
    assert en[1][1] == "dog"
    assert en[1][4] == pytest.approx(math.log(4.0), abs=1e-6)
    # fr: chien tf=1 df=1 ln(4); chat tf=2 df=2 -> 2*ln(2)
    fr = sorted(by_lang["fr"])
    assert fr[0][1] == "chat" and fr[0][4] == pytest.approx(
        2 * math.log(2.0), abs=1e-6)
    assert fr[1][1] == "chien"
    # ranks are 1..k per lang
    assert [r[0] for r in en] == [1, 2] and [r[0] for r in fr] == [1, 2]


# --- bigram-LM familiarity ----------------------------------------------------

def test_bigram_lm_counts_exact(spark):
    from rgd_rnaseq_workflows_spark.operators.quality import bigram_lm_report
    rows = [
        (0, "a b c"),       # bigrams: "a b", "b c"
        (1, "a b d"),       # bigrams: "a b", "b d"
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_report(d).collect()}
    # "a b" occurs twice corpus-wide; "b c"/"b d" once each
    assert out[0].n_bigrams == 2
    assert out[0].familiarity_sum == 2 + 1
    assert out[0].n_hapax == 1
    assert out[0].mean_bigram_count == 1.5
    assert out[0].hapax_ratio == 0.5
    assert out[1].familiarity_sum == 3


def test_bigram_lm_duplicates_raise_familiarity(spark):
    from rgd_rnaseq_workflows_spark.operators.quality import bigram_lm_report
    base = [(i, f"unique{i} words{i} here{i}") for i in range(5)]
    dup = [(10 + i, "same exact boilerplate line") for i in range(4)]
    d = spark.createDataFrame(base + dup, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_lm_report(d).collect()}
    # each boilerplate copy sees its bigrams 4x corpus-wide, zero hapax
    assert out[10].mean_bigram_count == 4.0
    assert out[10].hapax_ratio == 0.0
    # fully-unique docs are all-hapax
    assert out[0].hapax_ratio == 1.0


def test_hashed_linear_score_matches_python(spark):
    """Inference agrees with a direct per-token weight-lookup model."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        W_SCALE, hashed_linear_score, pseudo_weights)
    texts = ["good clean prose here", "spam spam spam", "mixed bag of words"]
    d = spark.createDataFrame(list(enumerate(texts)),
                              "doc_id long, text string")
    nb = 256
    w = pseudo_weights(spark, nb)
    wmap = {r.bucket: r.w for r in w.collect()}

    import hashlib
    def bucket(tok):
        h = int(hashlib.md5(f"5:{tok}".encode()).hexdigest()[:15], 16)
        return h % nb

    got = {r.doc_id: r for r in
           hashed_linear_score(d, w, n_buckets=nb).collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        sw = sum(wmap.get(bucket(tk), 0) for tk in toks)
        assert got[i].n_tokens == len(toks)
        assert got[i].logit == round(sw / (len(toks) * W_SCALE), 6)
        assert got[i].label == ("keep" if sw >= 0 else "drop")


def test_hashed_linear_score_plan_is_broadcast(spark):
    """The weight table joins broadcast — the corpus side never shuffles
    for the model."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        hashed_linear_score, pseudo_weights)
    d = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (hashed_linear_score(d, pseudo_weights(spark, 64), 64)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- term_head_report (Zipf/Heaps corpus shape) --------------------------------

class TestTermHead:
    @pytest.fixture(scope="class")
    def shaped(self, spark):
        rows = [
            # source A: "the" 5x, "cat" 2x, hapax "sat","mat","on"
            (0, "the the cat sat on the mat the the cat", "en", "A"),
            # source B: every token unique (all hapax)
            (1, "one two three four five", "en", "B"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")

    def test_exact_counts(self, spark, shaped):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            term_head_report)
        got = {r.source: r for r in
               term_head_report(shaped, by="source", top_k=2).collect()}
        a = got["A"]
        assert (a.n_tokens, a.n_types, a.n_hapax) == (10, 5, 3)
        assert a.top1_n == 5                    # "the"
        assert a.topk_sum == 7                  # the(5) + cat(2)
        assert a.head_mass == 0.7
        assert a.ttr == 0.5
        assert a.hapax_frac == 0.6
        b = got["B"]
        assert (b.n_tokens, b.n_types, b.n_hapax) == (5, 5, 5)
        assert b.top1_n == 1
        # top-2 of all-ties: deterministic by term text ("five","four")
        assert b.topk_sum == 2

    def test_two_phase_equals_single_window(self, spark, shaped):
        """The bucketed two-phase top-k equals a naive global rank for
        every bucket count (bucket boundaries can't drop a winner)."""
        from rgd_rnaseq_workflows_spark.operators.quality import (
            term_head_report)
        base = {(r.source, r.top1_n, r.topk_sum) for r in
                term_head_report(shaped, top_k=3, n_buckets=1).collect()}
        for nb in (2, 7, 256):
            got = {(r.source, r.top1_n, r.topk_sum) for r in
                   term_head_report(shaped, top_k=3,
                                    n_buckets=nb).collect()}
            assert got == base

    def test_fewer_terms_than_k(self, spark, shaped):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            term_head_report)
        got = {r.source: r for r in
               term_head_report(shaped, by="source", top_k=100).collect()}
        # topk_sum degrades to n_tokens when k >= vocabulary
        assert got["A"].topk_sum == got["A"].n_tokens
        assert got["B"].topk_sum == got["B"].n_tokens


# --- pmi_collocations ----------------------------------------------------------

class TestPMICollocations:
    def test_planted_collocation_ranks_first(self, spark):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            pmi_collocations)
        # "hong kong" always adjacent and exclusive; "the cat" frequent
        # but both words are common elsewhere -> lower lift
        rows = [(i, "the cat sat on the mat hong kong " +
                 "the dog and the cat walked past hong kong")
                for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = pmi_collocations(docs, top_k=8, min_count=2).collect()
        # 17 tokens -> N = 16 bigram positions per doc x 5 docs = 80.
        # Exclusive once-per-doc adjacent pairs (dog-and, sat-on,
        # walked-past) take max lift 5*80/(5*5) = 16, tie-cut by
        # (w1,w2) asc; hong-kong (words twice per doc, paired twice)
        # = 10*80/(10*10) = 8
        assert (out[0].w1, out[0].w2, out[0].lift) == ("dog", "and", 16.0)
        got = {(r.w1, r.w2): r for r in out}
        hk = got[("hong", "kong")]
        assert hk.n_pair == 10 and hk.n_w1 == 10 and hk.n_w2 == 10
        assert hk.lift == 8.0
        lifts = [r.lift for r in out]
        assert lifts == sorted(lifts, reverse=True)

    def test_min_count_filters(self, spark):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            pmi_collocations)
        docs = spark.createDataFrame(
            [(0, "rare pairx appears once only here"),
             (1, "common duo common duo common duo")],
            "doc_id long, text string")
        out = pmi_collocations(docs, top_k=10, min_count=3).collect()
        pairs = {(r.w1, r.w2) for r in out}
        assert ("rare", "pairx") not in pairs
        assert ("common", "duo") in pairs


# --- length_outlier_report (exact median/MAD) ----------------------------------

class TestLengthOutliers:
    def test_exact_median_mad_and_gate(self, spark):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            length_outlier_report)
        # source A: values 10,10,12,14,100 -> median 12, deviations
        # {2,2,0,2,88} -> MAD 2; outliers: |x-12| > 6 -> only 100
        rows = ([(i, "t", "en", "A", v) for i, v in
                 enumerate([10, 10, 12, 14, 100])]
                + [(10 + i, "t", "en", "B", v) for i, v in
                   enumerate([5, 7])])   # even n: lower median = 5
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
                  " n_chars long")
        got = {r.source: r for r in
               length_outlier_report(docs, by="source",
                                     value_col="n_chars", k=3).collect()}
        a = got["A"]
        assert (a.n_docs, a.median_n_chars, a.mad_n_chars) == (5, 12, 2)
        assert a.n_outliers == 1 and a.outlier_frac == 0.2
        b = got["B"]
        # n=2: lower median 5; deviations {0,2} -> lower MAD 0; with
        # MAD 0 every deviation > 0 flags (degenerate-source signal)
        assert (b.median_n_chars, b.mad_n_chars) == (5, 0)
        assert b.n_outliers == 1

    def test_matches_numpy_reference(self, spark):
        import random
        from rgd_rnaseq_workflows_spark.operators.quality import (
            length_outlier_report)
        rng = random.Random(7)
        vals = [rng.randint(0, 50) for _ in range(101)]
        docs = spark.createDataFrame(
            [(i, "t", "en", "S", v) for i, v in enumerate(vals)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long")
        [r] = length_outlier_report(docs, by="source").collect()
        sv = sorted(vals)
        med = sv[(len(sv) + 1) // 2 - 1]     # lower median, odd n
        dev = sorted(abs(v - med) for v in vals)
        mad = dev[(len(dev) + 1) // 2 - 1]
        n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
        assert (r.median_n_chars, r.mad_n_chars, r.n_outliers) == \
            (med, mad, n_out)


class TestTextRank:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    def test_bridge_word_outranks_template_word(self, spark):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            textrank_keywords)
        # "hub" co-occurs with many distinct words; "spam" repeats in
        # one two-word template with the same neighbor every time
        texts = (["hub alpha", "hub beta", "hub gamma", "hub delta",
                  "hub epsilon"] * 2 + ["spam spamx"] * 10)
        out = textrank_keywords(self._docs(spark, texts), top_k=5,
                                min_count=2, iters=3)
        rows = out.collect()
        assert rows[0].word == "hub"
        ranks = {r.word: r.rank for r in rows}
        assert ranks["hub"] > ranks.get("spam", 0.0)

    def test_self_loops_and_rare_pairs_drop(self, spark):
        from rgd_rnaseq_workflows_spark.operators.quality import (
            textrank_keywords)
        texts = ["echo echo echo echo echo", "one two"]  # rare pair
        out = textrank_keywords(self._docs(spark, texts), top_k=10,
                                min_count=2, iters=2)
        assert out.count() == 0   # echo-echo is a self-loop; one-two rare

    def test_sql_twin_matches(self, spark):
        import duckdb
        from rgd_rnaseq_workflows_spark.operators.quality import (
            textrank_keywords, textrank_keywords_sql)
        texts = ["the quick brown fox jumps over the lazy dog",
                 "the quick brown cat sleeps", "quick brown fox again",
                 "lazy dog and quick fox", "the lazy dog sleeps"] * 3
        sdf = [tuple(r) for r in textrank_keywords(
            self._docs(spark, texts), top_k=10, min_count=2,
            iters=3).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(i, t) for i, t in enumerate(texts)])
        ddf = [tuple(r) for r in con.execute(textrank_keywords_sql(
            "documents", top_k=10, min_count=2, iters=3)).fetchall()]
        assert sdf == ddf


def test_quantile_norm_identity_on_single_group(spark):
    # one group: the pooled distribution IS the group's, so the mapping
    # must be the identity
    from rgd_rnaseq_workflows_spark.operators.quality import (
        quantile_normalize_by_group)
    rows = [("a", v) for v in [10, 20, 20, 30, 50, 80]]
    df = spark.createDataFrame(rows, ["src", "score"])
    out = quantile_normalize_by_group(df, "src", "score").collect()
    assert all(r["score"] == r["norm_value"] for r in out)


def test_quantile_norm_shifts_low_source_up(spark):
    # source b sits uniformly 100 below source a; after normalization
    # b's values must map onto pooled values ABOVE themselves, and the
    # two sources' normalized medians must coincide
    from rgd_rnaseq_workflows_spark.operators.quality import (
        quantile_normalize_by_group)
    a = [("a", v) for v in range(200, 300, 10)]
    b = [("b", v) for v in range(100, 200, 10)]
    df = spark.createDataFrame(a + b, ["src", "score"])
    out = quantile_normalize_by_group(df, "src", "score")
    got = {(r["src"], r["score"]): r["norm_value"] for r in out.collect()}
    assert all(got[("b", v)] > v for v in range(100, 200, 10))
    # equal ranks within each source map to the same pooled value
    assert got[("a", 250)] == got[("b", 150)]


def test_quantile_norm_matches_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.quality import (
        quantile_normalize_by_group, quantile_normalize_sql)
    rows = [("s" + str(i % 3), 1 + (i * 7) % 40) for i in range(120)]
    df = spark.createDataFrame(rows, ["src", "score"])
    got = sorted((r["src"], r["score"], r["n"], r["norm_value"])
                 for r in quantile_normalize_by_group(
                     df, "src", "score").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(src VARCHAR, score INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        quantile_normalize_sql("t", "src", "score")).fetchall())
    assert got == exp


def test_quantile_norm_excludes_null_values(spark):
    """ADVICE r6: NULL metric rows are excluded up front (Spark sorts
    NULLS FIRST, DuckDB NULLS LAST — without the filter every rank
    shifts differently per engine)."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.quality import (
        quantile_normalize_by_group, quantile_normalize_sql)
    rows = [("a", 10), ("a", None), ("a", 30), ("b", None), ("b", 20)]
    df = spark.createDataFrame(rows, "src string, score int")
    got = sorted((r["src"], r["score"], r["n"], r["norm_value"])
                 for r in quantile_normalize_by_group(
                     df, "src", "score").collect())
    assert all(s is not None for _, s, _, _ in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(src VARCHAR, score INT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        quantile_normalize_sql("t", "src", "score")).fetchall())
    assert got == exp


def test_vocab_coverage_curve(spark):
    """Hand case: coverage is monotone in K, covering every type reads
    10000 bp, and the two-phase head equals the single-window DuckDB
    twin on a messier corpus."""
    import random

    import duckdb

    from rgd_rnaseq_workflows_spark.operators.quality import (
        vocab_coverage_curve, vocab_coverage_curve_sql)

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], ["doc_id", "text"])
    got = {r["vocab_size"]: (r["covered_tokens"], r["coverage_bp"],
                             r["n_terms"], r["total_tokens"])
           for r in vocab_coverage_curve(docs, [1, 2, 4]).collect()}
    # counts: a=4, b=3, c=1, d=1 -> total 9, 4 types
    assert got[1] == (4, 4444, 4, 9)
    assert got[2] == (7, 7777, 4, 9)
    assert got[4] == (9, 10000, 4, 9)

    rng = random.Random(3)
    rows = [(i, " ".join("w%d" % rng.randint(0, 500)
                         for _ in range(30))) for i in range(300)]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    srows = sorted(tuple(r) for r in
                   vocab_coverage_curve(sdf, [10, 100]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.execute(
        vocab_coverage_curve_sql("documents", [10, 100])).fetchall())
    assert srows == exp


def test_vocab_coverage_zero_token_edge(spark):
    """Regression (ADVICE r8): a zero-token term table used to make
    Spark's div yield NULL coverage_bp while DuckDB's // 0 errors —
    both twins must now pin coverage_bp to 0 on the empty corpus."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.quality import (
        vocab_coverage_curve, vocab_coverage_curve_sql,
        vocab_coverage_from_counts)

    # empty corpus via the curve entry point
    docs = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    got = sorted(tuple(r) for r in
                 vocab_coverage_curve(docs, [1, 10]).collect())
    assert got == [(1, 0, 0, 0, 0), (10, 0, 0, 0, 0)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, '')")
    exp = sorted(tuple(r) for r in con.execute(
        vocab_coverage_curve_sql("documents", [1, 10])).fetchall())
    assert got == exp

    # zero-count term table via the from_counts fold
    terms = spark.createDataFrame([("a", 0), ("b", 0)], ["t", "c"])
    got2 = sorted(tuple(r) for r in
                  vocab_coverage_from_counts(terms, [1]).collect())
    assert got2 == [(1, 2, 0, 0, 0)]


class TestKneserNeyLM:
    def test_hand_computed_tiny_corpus(self, spark):
        """KN probabilities on a corpus small enough to hand-check:
        docs 'a b a b' and 'a b c' -> bigrams (a b)x3, (b a)x1, (b c)x1.
        Stats: c(a·)=3, c(b·)=2; N1+(a·)=1, N1+(b·)=2; N1+(·b)=1,
        N1+(·a)=1, N1+(·c)=1; types T=3."""
        import math

        from rgd_rnaseq_workflows_spark.operators.quality import (
            KN_DISCOUNT, kn_lm_report)
        d = KN_DISCOUNT
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
        got = {r["doc_id"]: r for r in kn_lm_report(docs).collect()}

        p_ab = (3 - d) / 3 + d * 1 / 3 * 1 / 3      # c12=3,c1=3,fwd=1,rev(b)=1
        p_ba = (1 - d) / 2 + d * 2 / 2 * 1 / 3      # c12=1,c1=2,fwd=2,rev(a)=1
        p_bc = (1 - d) / 2 + d * 2 / 2 * 1 / 3
        nll = {bg: round(-math.log(p) * 1e6)
               for bg, p in [("a b", p_ab), ("b a", p_ba), ("b c", p_bc)]}
        # doc 1: positions (a b), (b a), (a b); doc 2: (a b), (b c)
        want1 = 2 * nll["a b"] + nll["b a"]
        want2 = nll["a b"] + nll["b c"]
        assert got[1]["n_bigrams"] == 3 and got[1]["nll_micro"] == want1
        assert got[2]["n_bigrams"] == 2 and got[2]["nll_micro"] == want2
        assert got[1]["ppl"] == round(math.exp(want1 / 1e6 / 3), 4)

    def test_continuation_beats_raw_frequency(self, spark):
        """The KN signature: a bigram whose SECOND word appears in many
        contexts gets a higher continuation boost than an equally
        frequent context-bound one."""
        from rgd_rnaseq_workflows_spark.operators.quality import (
            kn_lm_report)
        # frequency-matched by construction: every bigram occurs once
        # and every context word has one continuation, so the raw-count
        # term (c12-d)/c1 is IDENTICAL for all bigrams; only the
        # continuation count differs — 'end' is preceded by 3 distinct
        # contexts, 'francisco' by 1.
        corpus = [(1, "x end"), (2, "san francisco"),
                  (3, "y end"), (4, "z end")]
        docs = spark.createDataFrame(corpus, ["doc_id", "text"])
        got = {r["doc_id"]: r for r in kn_lm_report(docs).collect()}
        assert got[1]["n_bigrams"] == 1 and got[2]["n_bigrams"] == 1
        # productive continuation -> more probable -> lower nll
        assert got[1]["nll_micro"] < got[2]["nll_micro"]

    def test_sql_twin_matches(self, spark):
        import duckdb

        from rgd_rnaseq_workflows_spark.operators.quality import (
            kn_lm_report, kn_lm_report_sql)
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "c"), (4, "")],
            ["doc_id", "text"])
        got = sorted(tuple(r) for r in kn_lm_report(docs).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        [(1, "a b a b"), (2, "a b c"), (3, "c"),
                         (4, "")])
        exp = sorted(tuple(r) for r in
                     con.execute(kn_lm_report_sql()).fetchall())
        assert got == exp


def test_ccnet_band_assign_partitions_scoreable_docs(spark):
    """Band assignment: every scoreable doc lands in exactly one band,
    band sizes match the bucket report, and heads have the lowest
    per-bigram NLL keys."""
    import random

    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.quality import (
        ccnet_band_assign, ccnet_perplexity_buckets, kn_lm_report)
    rng = random.Random(11)
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choice("a b c d e".split())
                      for _ in range(rng.randint(2, 30))))
         for i in range(60)] + [(999, "x")],   # 1-token doc: the house
        # shingles_all semantics yield one whole-text gram, so it
        # scores and bands like everything else
        "doc_id long, text string")
    asg = ccnet_band_assign(docs, n_buckets=3).collect()
    assert len(asg) == 61 and all(r["band"] in
                                  ("head", "middle", "tail") for r in asg)
    sizes = {r["bucket"]: 0 for r in asg}
    for r in asg:
        sizes[r["bucket"]] += 1
    rep = {r["bucket"]: r["n_docs"] for r in
           ccnet_perplexity_buckets(docs, n_buckets=3).collect()}
    assert sizes == rep
    # heads strictly precede tails on the exact ranking key
    keys = {r["doc_id"]: r for r in kn_lm_report(docs).collect()}
    def key(i):
        k = keys[i]
        return k["nll_micro"] * 1_000_000 // k["n_bigrams"]
    head = [key(r["doc_id"]) for r in asg if r["band"] == "head"]
    tail = [key(r["doc_id"]) for r in asg if r["band"] == "tail"]
    assert max(head) <= min(tail)


def test_corpus_cli_ccnet_gate(spark, tmp_path):
    """e2e: --ccnet-keep head keeps only the head band of the curated
    corpus."""
    import random

    from rgd_rnaseq_workflows_spark import run_corpus

    rng = random.Random(13)
    stop = "the and of to in is it a for on"
    rows = [(i, "en", "web",
             stop + " " + " ".join(rng.choice(["alpha", "beta", "gamma",
                                               "delta"])
                                   for _ in range(30)))
            for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source",
                                        "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "corpus_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.99",
                          "--ccnet-keep", "head"])
    assert rc == 0
    kept = spark.read.parquet(f"{out}/curated")
    n = kept.count()
    assert 0 < n <= len(rows) // 2   # head of 3 bands ≈ a third


def test_classifier_calibration_bins_and_rates(spark):
    """Hand-checkable calibration: truth = (score >= 0) itself gives a
    perfectly calibrated diagram — every bin at or above the midpoint
    has pos_rate 1e6, every bin below has 0; bin edges from the exact
    micro-logit."""
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.quality import (
        classifier_calibration, hashed_linear_score, pseudo_weights)

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i % 7} tok{(i * 3) % 11}") for i in range(60)],
        "doc_id long, text string")
    w = pseudo_weights(spark, 256)
    scores = {r["doc_id"]: r["label"] for r in
              hashed_linear_score(docs, w, n_buckets=256).collect()}
    keep_ids = {i for i, lab in scores.items() if lab == "keep"}
    truth = F.col("doc_id").isin(*keep_ids) if keep_ids else F.lit(False)
    rep = classifier_calibration(docs, w, n_buckets=256, truth=truth,
                                 n_bins=8).collect()
    assert sum(r["n_docs"] for r in rep) == 60
    for r in rep:
        assert 0 <= r["bin"] < 8
        # sign-aligned truth: bins are pure (all keep or all drop)
        # except the bin straddling logit 0 can only be pure too,
        # because truth IS the sign of the same exact integer
        assert r["pos_rate_ppm"] in (0, 1000000) or (
            r["mean_logit_micro"] != 0)
        if r["mean_logit_micro"] > 125000:    # strictly above bin mid
            assert r["pos_rate_ppm"] == 1000000


# --- Heaps-law vocabulary growth ---------------------------------------------

def _brute_heaps(texts, k):
    n = len(texts)
    buckets = [((r + 1) * k + n - 1) // n for r in range(n)]
    seen, rows, cd = set(), {}, 0
    for b in range(1, k + 1):
        rows[b] = {"nd": 0, "nt": 0, "nv": 0}
    for r, t in enumerate(texts):
        b = buckets[r]
        toks = [x for x in t.split() if x]
        rows[b]["nd"] += 1
        rows[b]["nt"] += len(toks)
        for tok in toks:
            if tok not in seen:
                seen.add(tok)
                rows[b]["nv"] += 1
    out, cd, ct, cv = [], 0, 0, 0
    for b in range(1, k + 1):
        cd += rows[b]["nd"]; ct += rows[b]["nt"]; cv += rows[b]["nv"]
        nb = (rows[b]["nv"] * 10000) // rows[b]["nt"] \
            if rows[b]["nt"] > 0 else None
        out.append((b, cd, ct, cv, nb))
    return out


def test_heaps_curve_matches_brute_force(spark):
    from rgd_rnaseq_workflows_spark.operators.quality import heaps_curve
    import random
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(3, 12)))
             for _ in range(23)]   # 23 docs: uneven bucket sizes
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = [(r["bucket"], r["cum_docs"], r["cum_tokens"],
            r["cum_vocab"], r["novelty_bp"])
           for r in heaps_curve(df, n_buckets=5).collect()]
    assert got == _brute_heaps(texts, 5)


def test_heaps_curve_monotone_and_total(spark):
    from rgd_rnaseq_workflows_spark.operators.quality import heaps_curve
    texts = ["a b c", "a b", "d e", "a", "f g h i"]
    df = spark.createDataFrame(
        [(i * 7, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = heaps_curve(df, n_buckets=3).collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3]
    assert rows[-1]["cum_docs"] == 5
    assert rows[-1]["cum_vocab"] == 9    # a..i distinct
    assert rows[-1]["cum_tokens"] == 12
    cv = [r["cum_vocab"] for r in rows]
    assert cv == sorted(cv)


def test_logreg_train_first_epoch_exact(spark):
    """Epoch 1 scores with w=0: p=1/2 exactly, every doc predicts 0,
    loss = n_docs * round(1e6*ln 2) — closed-form integer baseline."""
    import math
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.quality import (
        hashed_logreg_train)
    rows = [(1, "aa bb cc", 1), (2, "aa bb", 0), (3, "dd ee ff gg", 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    out = hashed_logreg_train(df, F.col("y") == 1, n_buckets=64,
                              epochs=2, lr_num=1,
                              lr_den=16).collect()
    e1 = out[0]
    assert e1["n_docs"] == 3 and e1["n_pos"] == 2
    assert e1["n_correct"] == 1          # z=0 -> predict 0; one y=0 doc
    assert e1["loss_micro"] == 3 * round(1e6 * math.log(2))


def test_logreg_train_learns_separable(spark):
    """A linearly separable vocabulary split must reach 100% accuracy
    with monotonically falling loss."""
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.quality import (
        hashed_logreg_train)
    pos = [(i, "good great fine nice", 1) for i in range(20)]
    neg = [(100 + i, "bad awful spam junk", 0) for i in range(20)]
    df = spark.createDataFrame(pos + neg,
                               "doc_id long, text string, y int")
    out = hashed_logreg_train(df, F.col("y") == 1, n_buckets=64,
                              epochs=5, lr_num=1, lr_den=4).collect()
    losses = [r["loss_micro"] for r in out]
    assert losses == sorted(losses, reverse=True), losses
    assert out[-1]["accuracy_bp"] == 10000


def test_logreg_train_matches_duckdb_twin(spark):
    import duckdb
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.quality import (
        hashed_logreg_train, hashed_logreg_train_sql)
    rows = [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)),
             150 + (i % 60)) for i in range(80)]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, n_chars long")
    got = [tuple(r) for r in
           hashed_logreg_train(df, F.col("n_chars") > 180, 128,
                               epochs=4, lr_num=1,
                               lr_den=16).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR, "
                "n_chars BIGINT)")
    con.executemany("INSERT INTO docs VALUES (?, ?, ?)", rows)
    exp = [tuple(r) for r in con.execute(hashed_logreg_train_sql(
        "n_chars > 180", "docs", n_buckets=128, epochs=4,
        lr_num=1, lr_den=16)).fetchall()]
    assert got == exp


def test_hill_tail_planted_zipf(spark):
    """A planted Zipf corpus (term i appearing ~N/i times) must fit
    alpha near 1; k-rows are present for every k with enough types."""
    words = []
    for i in range(1, 300):
        words += [f"w{i:03d}"] * max(1, 1000 // i)
    docs = spark.createDataFrame(
        [(j, " ".join(words[j::50])) for j in range(50)],
        "doc_id long, text string")
    rows = {r["k"]: r for r in
            __import__("rgd_rnaseq_workflows_spark.operators.quality",
                       fromlist=["hill_tail_report"])
            .hill_tail_report(docs, ks=(20, 50)).collect()}
    assert set(rows) == {20, 50}
    for r in rows.values():
        assert 600 <= r["alpha_milli"] <= 1600, r
        assert r["sum_log_ratio_micro"] > 0


def test_hill_tail_matches_duckdb_twin(spark):
    import duckdb
    from rgd_rnaseq_workflows_spark.operators.quality import (
        hill_tail_report, hill_tail_sql)
    rows = [(i, " ".join(f"t{(i + j * j) % 61}" for j in range(30)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in hill_tail_report(df, ks=(10, 25)).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    exp = [tuple(r) for r in
           con.execute(hill_tail_sql("docs", ks=(10, 25))).fetchall()]
    assert got == exp


def test_conformal_threshold_rank_bound_holds(spark):
    """The realized drop rate on the eval split must respect the
    conformal bound up to finite-sample noise, and the threshold must
    be the exact k-th smallest calibration logit."""
    from rgd_rnaseq_workflows_spark.operators.quality import (
        conformal_threshold_report, pseudo_weights)
    rows = [(i, " ".join(f"w{(i * 13 + j) % 97}" for j in range(20)))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wt = pseudo_weights(spark, 256)
    out = {r["alpha_pct"]: r for r in
           conformal_threshold_report(df, wt, 256,
                                      alphas_pct=(5, 20)).collect()}
    for a, r in out.items():
        assert r["target_rank"] == -(-(r["n_cal"] + 1) * a // 100)
        # rank bound: eval drop rate <= alpha + noise margin
        assert r["eval_drop_ppm"] <= (a + 5) * 10000, (a, r)
        assert r["n_cal"] + r["n_eval"] == 600
    assert out[5]["threshold_micro"] <= out[20]["threshold_micro"]


def test_readability_hand_checked(spark):
    import math
    from rgd_rnaseq_workflows_spark.operators.quality import (
        readability_report)
    # "the cat sat." -> 3 words, 1 sentence, 3 vowel runs (e, a, a)
    df = spark.createDataFrame([(1, "the cat sat.", "s")],
                               "doc_id long, text string, source string")
    r = readability_report(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    expect = round(1e3 * (206.835 - 1.015 * 3 / 1 - 84.6 * 3 / 3))
    assert r["flesch_milli"] == expect
    # no punctuation -> sentence floor of 1 per doc
    df2 = spark.createDataFrame([(1, "alpha beta", "s"),
                                 (2, "gamma delta epsilon", "s")],
                                "doc_id long, text string, source string")
    r2 = readability_report(df2).collect()[0]
    assert r2["n_sentences"] == 2
