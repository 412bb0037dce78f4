"""BPE vocabulary training: merge selection, fold semantics, determinism."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.bpe import (
    END_MARK, _apply_merge, train_bpe, word_counts)


def test_merges_match_hand_computation(spark):
    # words: low x3, lower, lowest, new, newer, newest
    d = spark.createDataFrame(
        [(0, "low low lower lowest"), (1, "new newer newest low")],
        "doc_id long, text string")
    out = [tuple(r) for r in train_bpe(d, rounds=3).collect()]
    # (l,o) appears in low(3) + lower + lowest = 5; then (lo,w) = 5;
    # then (e,w) in new/newer/newest = 3
    assert out == [(1, "l", "o", "lo", 5),
                   (2, "lo", "w", "low", 5),
                   (3, "e", "w", "ew", 3)]


def test_fold_handles_overlapping_runs(spark):
    # merge (a,a) over "aaaa": greedy left-to-right gives [aa][aa],
    # never [a][aa][a]
    d = spark.createDataFrame([(1, ["a", "a", "a", "a", END_MARK])],
                              "wc long, syms array<string>")
    merged = _apply_merge(d, "a", "a").first()["syms"]
    assert merged == ["aa", "aa", END_MARK]


def test_merged_symbol_is_atomic(spark):
    # after merging (l,o)->"lo", a later (lo,w) merge must match the
    # MERGED symbol, not raw characters
    d = spark.createDataFrame([(1, ["l", "o", "w", END_MARK])],
                              "wc long, syms array<string>")
    step1 = _apply_merge(d, "l", "o")
    assert step1.first()["syms"] == ["lo", "w", END_MARK]
    step2 = _apply_merge(step1, "lo", "w")
    assert step2.first()["syms"] == ["low", END_MARK]
    # merging (o,w) after (l,o) must NOT fire — "o" is inside "lo" now
    step2b = _apply_merge(step1, "o", "w")
    assert step2b.first()["syms"] == ["lo", "w", END_MARK]


def test_word_counts_is_corpus_pass(spark):
    d = spark.createDataFrame([(0, "x y x"), (1, "y")],
                              "doc_id long, text string")
    got = {r["word"]: r["wc"] for r in word_counts(d).collect()}
    assert got == {"x": 2, "y": 2}


def test_deterministic_tiebreak(spark):
    # two pairs with equal counts: the (left, right) lexicographic
    # tie-break must pick the same winner every run
    d = spark.createDataFrame([(0, "ab cd ab cd")],
                              "doc_id long, text string")
    first = [tuple(r) for r in train_bpe(d, rounds=1).collect()]
    second = [tuple(r) for r in train_bpe(d, rounds=1).collect()]
    assert first == second
    # pairs (a,b), (c,d), (b,</w>), (d,</w>) all have count 2 -> "a","b"
    assert first[0][1:4] == ("a", "b", "ab")


def _reference_trainer(texts: list[str], rounds: int):
    """Independent pure-python BPE trainer: word counts, weighted pair
    counts, (count desc, left, right) argmax, greedy pair-scan apply."""
    from collections import Counter
    words = Counter(w for t in texts for w in t.split() if w)
    vocab = {w: [*w, END_MARK] for w in words}
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += words[w]
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, a + b, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_full_trainer_matches_reference_on_random_corpora(spark):
    # rounds=100 over a wider alphabet exercises the incremental driver
    # path deep enough that a stale heap entry / stale inverted-index
    # bug would surface (most corpora exhaust earlier — the early-break
    # path is covered too)
    from hypothesis import given, settings, strategies as st

    word = st.text(alphabet="abcdef", min_size=1, max_size=8)
    corpus = st.lists(
        st.lists(word, min_size=1, max_size=16).map(" ".join),
        min_size=1, max_size=8)

    @settings(max_examples=6, deadline=None)
    @given(corpus)
    def check(texts):
        d = spark.createDataFrame(list(enumerate(texts)),
                                  "doc_id long, text string")
        got = [(r.left, r.right, r.merged, r.pair_count)
               for r in train_bpe(d, rounds=100).collect()]
        assert got == _reference_trainer(texts, 100)

    check()


def test_driver_and_distributed_paths_agree(spark):
    d = spark.createDataFrame(
        [(0, "low low lower lowest"), (1, "new newer newest low ab ab")],
        "doc_id long, text string")
    fast = [tuple(r) for r in train_bpe(d, rounds=6).collect()]
    # max_driver_vocab=0 forces the distributed per-round fallback
    slow = [tuple(r) for r in
            train_bpe(d, rounds=6, max_driver_vocab=0).collect()]
    assert fast == slow and len(fast) == 6


def test_job_count_independent_of_rounds(spark):
    # The batched trainer's Spark-job count must not grow with rounds:
    # one corpus pass + one vocab collect, then driver-side merges only.
    d = spark.createDataFrame(
        [(0, "low low lower lowest"), (1, "new newer newest low")],
        "doc_id long, text string")
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(rounds, group):
        spark.sparkContext.setJobGroup(group, "bpe job count")
        try:
            train_bpe(d, rounds=rounds)  # collect happens inside
        finally:
            spark.sparkContext.setJobGroup("", "")
        return len(tracker.getJobIdsForGroup(group))

    j2 = jobs_for(2, "bpe-r2")
    j20 = jobs_for(20, "bpe-r20")
    assert j20 == j2 and j20 <= 4


def test_encode_stats_match_manual(spark):
    """Tiny corpus where the 2-merge encode is hand-checkable."""
    from rgd_rnaseq_workflows_spark.operators.bpe import bpe_encode_stats
    # "ab" x3, "abc" x1 → merges: (a,b) then (ab,</w>)
    df = spark.createDataFrame(
        [(0, "ab ab ab abc")], "doc_id long, text string")
    r = bpe_encode_stats(df, rounds=2).collect()[0]
    assert r.n_words == 2
    # initial: ab→3 syms ×3 occ + abc→4 syms ×1 = 13
    assert r.corpus_syms_initial == 13
    # after (a,b): ab→[ab,</w>] (2), abc→[ab,c,</w>] (3)
    # after (ab,</w>): ab→[ab</w>] (1), abc unchanged (ab,c — no pair)
    assert r.corpus_syms_encoded == 1 * 3 + 3 * 1
    assert r.compression == round(13 / 6, 6)


def test_encode_compression_monotone(spark, docs_corpus=None):
    from rgd_rnaseq_workflows_spark.operators.bpe import bpe_encode_stats
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c2 = bpe_encode_stats(df, rounds=2).collect()[0]
    c5 = bpe_encode_stats(df, rounds=5).collect()[0]
    assert c5.corpus_syms_encoded <= c2.corpus_syms_encoded
    assert c5.compression >= c2.compression
    assert c2.corpus_syms_initial == c5.corpus_syms_initial


def test_fertility_by_lang_matches_reference(spark):
    """Per-lang fertility agrees with the pure-python reference trainer
    applied to the same global merges."""
    from rgd_rnaseq_workflows_spark.operators.bpe import (
        bpe_fertility_by_lang)
    rows = [(0, "en", "the cat sat"), (1, "en", "the cat ran fast"),
            (2, "de", "die katze sass"), (3, "de", "die katze")]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    texts = [t for _, _, t in rows]
    merges = _reference_trainer(texts, 4)

    def encode(word):
        syms = [*word, END_MARK]
        for a, b, m, _ in merges:
            syms = _apply(syms, a, b, m)
        return syms

    def _apply(syms, a, b, m):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(m); i += 2
            else:
                out.append(syms[i]); i += 1
        return out

    from collections import Counter
    got = {r.lang: r for r in bpe_fertility_by_lang(d, rounds=4).collect()}
    for lang in ("en", "de"):
        words = Counter(w for i, lg, t in rows if lg == lang
                        for w in t.split())
        n_tok = sum(words.values())
        n_bpe = sum(wc * len(encode(w)) for w, wc in words.items())
        assert got[lang].n_words == len(words)
        assert got[lang].n_tokens == n_tok
        assert got[lang].n_bpe_tokens == n_bpe
        import math
        assert got[lang].fertility6 == math.floor(
            n_bpe / n_tok * 10**6 + 0.5) / 10**6
    # BPE can never need MORE symbols than chars+1 nor fewer than 1/word
    for lg in got:
        max_len = max(len(w) + 1 for i, l, t in rows if l == lg
                      for w in t.split())
        assert 1.0 <= got[lg].fertility6 <= max_len


def test_fertility_null_lang_reports_not_crashes(spark):
    """A NULL lang group must report like the oracle does, not
    TypeError on the driver sort (review r5)."""
    from rgd_rnaseq_workflows_spark.operators.bpe import (
        bpe_fertility_by_lang)
    d = spark.createDataFrame(
        [(0, "en", "the cat"), (1, None, "stray doc here")],
        "doc_id long, lang string, text string")
    got = {r.lang: r for r in bpe_fertility_by_lang(d, rounds=2).collect()}
    assert set(got) == {"en", None}
    assert got[None].n_tokens == 3
