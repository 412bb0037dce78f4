"""Property-based invariants (SURVEY §5.4) via Hypothesis.

Kept to few examples per property — each example drives real Spark jobs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = settings(max_examples=8, deadline=None)

word = st.text(alphabet="abcdef", min_size=1, max_size=4)
doc = st.lists(word, min_size=1, max_size=12).map(" ".join)


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                          st.sampled_from(["g1", "g2", "g3", "g4"]),
                          st.floats(0, 1e6, allow_nan=False)),
                min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1])))
def test_pivot_preserves_per_sample_sums(spark, rows):
    from rgd_rnaseq_workflows_spark.operators.matrix import pivot_matrix
    long_df = spark.createDataFrame(
        [(s, g, v, 0.0) for s, g, v in rows],
        ["sample", "feature_id", "TPM", "expected_count"])
    wide = pivot_matrix(long_df, "TPM")
    for s in {r[0] for r in rows}:
        expected = sum(v for s2, _, v in rows if s2 == s)
        got = wide.agg(F.sum(s)).collect()[0][0] or 0.0
        assert abs(got - expected) < 1e-6


@SETTINGS
@given(st.lists(doc, min_size=2, max_size=8))
def test_jaccard_pairs_bounded_and_symmetric_ids(spark, texts):
    from rgd_rnaseq_workflows_spark.operators.dedup import ngram_jaccard_pairs
    df = spark.createDataFrame(
        [(i, t, "blk") for i, t in enumerate(texts)],
        ["doc_id", "text", "lang"])
    pairs = ngram_jaccard_pairs(df, "lang", shingle_n=1,
                                threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["id_a"] < r["id_b"]
    # identical docs → jaccard exactly 1
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts[i + 1:], i + 1):
            if set(a.split()) == set(b.split()):
                assert got[(i, j)] == 1.0


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 3), st.floats(0, 100,
                                                       allow_nan=False)),
                min_size=1, max_size=40))
def test_semi_join_is_subset_and_anti_is_complement(spark, rows):
    from rgd_rnaseq_workflows_spark.operators.relational import (
        anti_join, semi_join_filter)
    df = spark.createDataFrame([(k, v) for k, v in rows], ["k", "v"])
    keys = spark.createDataFrame([(0,), (2,)], ["k"])
    semi = semi_join_filter(df, keys, "k")
    anti = anti_join(df, keys, "k")
    assert semi.count() + anti.count() == df.count()
    assert {r["k"] for r in semi.collect()} <= {0, 2}
    assert {r["k"] for r in anti.collect()}.isdisjoint({0, 2})


@SETTINGS
@given(st.lists(doc, min_size=1, max_size=6))
def test_minhash_signature_of_identical_docs_collides(spark, texts):
    from rgd_rnaseq_workflows_spark.operators.dedup import minhash_signatures
    # duplicate every doc once with a new id
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {r["doc_id"]: tuple(r[f"h{i}"] for i in range(4))
            for r in minhash_signatures(df, num_hashes=4,
                                        shingle_n=1).collect()}
    for i in range(len(texts)):
        assert sigs[i] == sigs[100 + i]


# messy strings: words, runs of spaces, leading/trailing spaces
messy_doc = st.lists(
    st.one_of(word, st.just(" "), st.just("  ")),
    min_size=0, max_size=14).map(" ".join)


@SETTINGS
@given(st.lists(messy_doc, min_size=1, max_size=6),
       st.integers(min_value=1, max_value=4))
def test_regex_shingles_equal_reference_hof_build(spark, texts, n):
    """The codegen regex shingle scan must equal the straightforward
    transform(sequence(slice)) construction for ANY spacing — the regex
    rewrite is a pure performance substitution."""
    from rgd_rnaseq_workflows_spark.functions.text import shingles, tokens
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    toks = tokens("t")
    n_sh = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    reference = F.array_sort(F.array_distinct(F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda j: F.concat_ws(" ", F.slice(toks, j, n)))))
    diff = df.select(
        (shingles("t", n) == reference).alias("eq")).collect()
    assert all(r["eq"] for r in diff)


@SETTINGS
@given(st.lists(messy_doc, min_size=1, max_size=6))
def test_tokens_drop_empties_for_any_spacing(spark, texts):
    from rgd_rnaseq_workflows_spark.functions.text import tokens
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    got = df.select("i", tokens("t").alias("tk")).collect()
    for r in got:
        expected = [w for w in texts[r["i"]].split(" ") if w]
        assert r["tk"] == expected


@SETTINGS
@given(st.lists(
    st.lists(st.one_of(st.sampled_from(["the", "and", "der", "das", "le",
                                        "el", "que", "a", "an", "thee"]),
                       word),
             min_size=0, max_size=10).map(" ".join),
    min_size=1, max_size=6))
def test_regex_stopword_hits_equal_hof_filter(spark, texts):
    """The codegen regex stopword counter must equal filtering the token
    array (occurrences, whole-token matches only — 'thee' ≠ 'the')."""
    from rgd_rnaseq_workflows_spark.functions.text import (
        STOPWORDS, _stopword_hits, tokens)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               ["i", "t"])
    for lang, ws in sorted(STOPWORDS.items())[:2]:
        got = df.select("i", _stopword_hits("t", ws).alias("n")).collect()
        for r in got:
            expected = sum(1 for w in texts[r["i"]].split(" ") if w in ws)
            assert r["n"] == expected, (lang, texts[r["i"]])


def _greedy_pair_scan(syms: list[str], a: str, b: str) -> list[str]:
    """Reference BPE merge apply: textbook left-to-right pair scan with
    skip-after-merge — the semantics the fold claims to implement."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@SETTINGS
@given(st.lists(st.sampled_from(["a", "b", "c", "ab"]), min_size=1,
                max_size=10),
       st.sampled_from([("a", "b"), ("a", "a"), ("b", "a"), ("a", "ab")]))
def test_bpe_fold_equals_greedy_pair_scan(spark, syms, pair):
    from rgd_rnaseq_workflows_spark.operators.bpe import _apply_merge
    df = spark.createDataFrame([(1, syms)], "wc long, syms array<string>")
    folded = _apply_merge(df, *pair).first()["syms"]
    assert folded == _greedy_pair_scan(syms, *pair)


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 500),
                          st.sampled_from(["x", "y"])),
                min_size=1, max_size=40, unique_by=lambda t: t[0]),
       st.integers(1, 6))
def test_cap_per_key_two_phase_lossless(spark, rows, cap):
    from pyspark.sql import Window
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
    from rgd_rnaseq_workflows_spark.operators.sampling import cap_per_key
    d = spark.createDataFrame(rows, ["doc_id", "key"])
    got = {(r.doc_id, r.keep_rank)
           for r in cap_per_key(d, "key", cap, "doc_id", seed=9,
                                n_salts=4).collect()}
    w = Window.partitionBy("key").orderBy("_o", "doc_id")
    want = {(r.doc_id, r.rk) for r in
            (d.withColumn("_o", md5_long(F.col("doc_id").cast("string"),
                                         seed=9))
             .withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= cap)).collect()}
    assert got == want


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 2000),
                          st.sampled_from(["en", "de", "zh", "xx"])),
                min_size=2, max_size=60, unique_by=lambda t: t[0]),
       st.sampled_from([0.1, 0.3, 0.5, 0.9]))
def test_temperature_mix_matches_duckdb_exactly(spark, rows, frac):
    """The mix's every-engine-rounds-identically claim, on random stratum
    distributions: Spark's kept (doc_id, mix_bps) set must equal DuckDB's
    bit-for-bit — any drift in the floor/sqrt/division chain flips a
    bucket at a knife edge eventually."""
    import duckdb
    import pandas as pd
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        temperature_mix, temperature_mix_sql)
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = {(r.doc_id, r.mix_bps)
           for r in temperature_mix(d, "lang", "doc_id", frac, seed=3)
           .select("doc_id", "mix_bps").collect()}
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "lang"]))
    sql = temperature_mix_sql("docs", "lang", "doc_id", frac, seed=3,
                              cols="d.doc_id")
    want = {(r[0], r[1]) for r in con.execute(sql).fetchall()}
    assert got == want


@SETTINGS
@given(st.lists(st.integers(0, (1 << 24) - 1), min_size=2, max_size=12,
                unique=True),
       st.integers(1, 5))
def test_hamming_blocking_complete_vs_naive(spark, sigs, max_h):
    """Pigeonhole blocking must find EXACTLY the naive all-pairs result
    for any signature set and threshold — no pair lost, none invented."""
    from rgd_rnaseq_workflows_spark.operators.dedup import hamming_near_pairs
    fps = spark.createDataFrame(list(enumerate(sigs)), ["id", "sig"])
    got = {(r.id_a, r.id_b, r.hamming)
           for r in hamming_near_pairs(fps, "sig", "id", bits=24,
                                       max_hamming=max_h).collect()}
    want = {(i, j, bin(a ^ b).count("1"))
            for i, a in enumerate(sigs) for j, b in enumerate(sigs)
            if i < j and bin(a ^ b).count("1") <= max_h}
    assert got == want


@SETTINGS
@given(st.lists(st.integers(0, 3600 * 6), min_size=1, max_size=30))
def test_sliding_window_enumeration_matches_spark(spark, offsets):
    """Spark's window(ts, 1h, 15m) assignment must equal the oracle's
    arithmetic enumeration (4 starts per event) for arbitrary event
    times — pinning the alignment convention the SQL twin relies on."""
    import datetime as dt
    from rgd_rnaseq_workflows_spark.streaming.events_stream import (
        sliding_counts)
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=s), 0, "e", 0.0, "{}")
            for i, s in enumerate(offsets)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.window_start, r.n)
           for r in sliding_counts(df).collect()}
    base_epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    from collections import Counter
    want = Counter()
    for s in offsets:
        t = base_epoch + s
        for k in range(4):
            want[(t // 900 - k) * 900] += 1
    assert got == {(w, n) for w, n in want.items()}


@SETTINGS
@given(st.lists(st.integers(1, 40), min_size=1, max_size=25),
       st.sampled_from([1, 3, 7, 1000]), st.sampled_from([8, 32]))
def test_pack_chunks_invariant_to_bucket_width(spark, tok_counts, width,
                                               ctx):
    """The two-phase distributed prefix sum must produce the identical
    chunk map for ANY bucket width — including width=1 (every doc its
    own bucket) — and match a sequential reference."""
    from rgd_rnaseq_workflows_spark.operators.packing import pack_chunks
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(tok_counts)],
        "doc_id long, text string")
    got = {(r.chunk_id, r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
           for r in pack_chunks(docs, ctx=ctx, bucket_width=width)
           .collect()}
    ref = {(r.chunk_id, r.n_docs, r.n_tokens, r.first_doc, r.last_doc)
           for r in pack_chunks(docs, ctx=ctx, bucket_width=10**6)
           .collect()}
    assert got == ref
    from collections import defaultdict
    chunks = defaultdict(list)
    start = 0
    for i, n in enumerate(tok_counts):
        chunks[start // ctx].append((i, n))
        start += n
    want = {(cid, len(v), sum(n for _, n in v), v[0][0], v[-1][0])
            for cid, v in chunks.items()}
    assert got == want


@SETTINGS
@given(st.sets(st.integers(0, 30), min_size=1, max_size=15),
       st.sets(st.integers(0, 30), min_size=1, max_size=15),
       st.sets(st.integers(0, 30), max_size=10))
def test_snapshot_diff_labels_consistent(spark, old_ids, new_ids, edited):
    """Diff labels must agree with plain set arithmetic for any pair of
    snapshots with arbitrary edits."""
    from rgd_rnaseq_workflows_spark.operators.snapshot import snapshot_diff
    old = spark.createDataFrame([(i, f"doc {i}") for i in sorted(old_ids)],
                                "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"doc {i} v2" if i in edited else f"doc {i}")
         for i in sorted(new_ids)], "doc_id long, text string")
    got = {r.id: r.change for r in snapshot_diff(old, new).collect()}
    for i in old_ids | new_ids:
        if i not in new_ids:
            assert got[i] == "removed"
        elif i not in old_ids:
            assert got[i] == "added"
        elif i in edited:
            assert got[i] == "modified"
        else:
            assert got[i] == "unchanged"


# --- round-4 operators -------------------------------------------------------

@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 8), st.integers(1, 8))
                .filter(lambda p: p[0] != p[1]),
                min_size=1, max_size=10, unique=True))
def test_pagerank_matches_pure_python(spark, pairs):
    """Fixed-point PageRank on random small graphs equals the
    independent driver-side reference fold (exact integers ⇒ ==)."""
    from rgd_rnaseq_workflows_spark.operators.graph import (
        RANK_SCALE, pagerank)
    canon_pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    df = spark.createDataFrame(canon_pairs, "id_a long, id_b long")
    got = {r.id: r.rank for r in pagerank(df, iters=3).collect()}

    edges: dict = {}
    for a, b in canon_pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    deg = {u: len(v) for u, v in edges.items()}
    r = {u: RANK_SCALE for u in deg}
    tel = 15 * RANK_SCALE // 100
    for _ in range(3):
        inc = {u: 0 for u in deg}
        for u, vs in edges.items():
            c = r[u] // deg[u]
            for v in vs:
                inc[v] += c
        r = {u: tel + (inc[u] * 85) // 100 for u in deg}
    expect = {u: _round6_half_up(x / RANK_SCALE) for u, x in r.items()}
    assert got == expect


@SETTINGS
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=1, max_size=9),
                min_size=1, max_size=6))
def test_passage_rewrite_keeps_each_passage_exactly_once(spark, docs):
    """Global dedup invariant: after the rewrite, every distinct passage
    survives in EXACTLY one place corpus-wide, and n_removed counts
    every other occurrence."""
    from rgd_rnaseq_workflows_spark.operators.dedup import (
        remove_duplicate_passages)
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_passages(df, window=2).collect()
    kept = []
    for r in out:
        kept += [p for p in [" ".join(c) for c in _chunks2(r.clean_text)]
                 if p]
    # recompute expected multiset of all passages
    all_passages = []
    for _, text in rows:
        toks = text.split()
        all_passages += [" ".join(toks[i:i + 2])
                         for i in range(0, len(toks), 2)]
    assert sorted(kept) == sorted(set(all_passages))
    assert sum(r.n_removed for r in out) == \
        len(all_passages) - len(set(all_passages))


def _chunks2(text):
    toks = text.split()
    return [toks[i:i + 2] for i in range(0, len(toks), 2)]


@SETTINGS
@given(st.lists(st.integers(0, 30), min_size=1, max_size=60))
def test_cms_never_underestimates_property(spark, vals):
    from collections import Counter
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.operators.sketches import (
        cms_estimate, cms_sketch)
    df = spark.createDataFrame([(str(v),) for v in vals], "k string")
    sk = cms_sketch(df, "k", depth=3, width=32)
    est = {r.k: r.cms_estimate for r in
           cms_estimate(sk, df.distinct(), "k", depth=3,
                        width=32).collect()}
    for k, n in Counter(str(v) for v in vals).items():
        assert est[k] >= n


def _round6_half_up(x: float) -> float:
    """Spark/DuckDB round() semantics (HALF_UP on the shortest decimal
    repr) — python's builtin round() is banker's and disagrees at exact
    .xxxxxx5 rank values (hypothesis found one)."""
    from decimal import ROUND_HALF_UP, Decimal
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 3),          # user
                          st.integers(0, 50),          # epoch second
                          st.sampled_from(["a", "b", "c", "x"])),
                min_size=1, max_size=25))
def test_funnel_matches_pure_python(spark, events):
    """Engine funnel == the brute-force reference on arbitrary event
    sets (duplicate timestamps, shuffled arrival, missing steps)."""
    from datetime import datetime, timezone
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        funnel_user_steps)
    steps = ("a", "b", "c")
    rows = [(i, datetime.fromtimestamp(sec, tz=timezone.utc)
             .replace(tzinfo=None), u, t)
            for i, (u, sec, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.user_id: (r.t1, r.t2, r.t3)
           for r in funnel_user_steps(df, steps).collect()}

    def ref(user):
        evs = sorted((sec, t) for i, (u, sec, t) in enumerate(events)
                     if u == user)
        times, prev = [], None
        for k, s in enumerate(steps):
            if k == 0:
                cand = [sec for sec, t in evs if t == s]
            elif prev is None:
                cand = []
            else:
                cand = [sec for sec, t in evs if t == s and sec > prev]
            cur = min(cand) if cand else None
            times.append(cur)
            prev = cur
        return tuple(times)

    users_with_steps = {u for u, sec, t in events if t in steps}
    assert set(got) == users_with_steps
    for u in users_with_steps:
        assert got[u] == ref(u), f"user {u}"


@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 4),          # user
                          st.integers(0, 300)),        # epoch second
                min_size=1, max_size=25))
def test_cohort_retention_matches_pure_python(spark, events):
    """Engine cohort matrix == brute-force reference (100s buckets)."""
    from collections import defaultdict
    from datetime import datetime, timezone
    from rgd_rnaseq_workflows_spark.operators.funnel import cohort_retention
    rows = [(i, datetime.fromtimestamp(sec, tz=timezone.utc)
             .replace(tzinfo=None), u, "x")
            for i, (u, sec) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r.cohort_bucket, r.bucket_offset):
           (r.n_active, r.n_cohort, r.retention)
           for r in cohort_retention(df, bucket_seconds=100).collect()}

    active = defaultdict(set)
    for u, sec in events:
        active[u].add(sec // 100)
    first = {u: min(bs) for u, bs in active.items()}
    sizes = defaultdict(int)
    for u, f in first.items():
        sizes[f] += 1
    want = defaultdict(int)
    for u, bs in active.items():
        for b in bs:
            want[(first[u], b - first[u])] += 1
    expect = {k: (n, sizes[k[0]], round(n / sizes[k[0]], 6))
              for k, n in want.items()}
    assert got == expect


@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 3),          # user
                          st.integers(0, 500),         # epoch second
                          st.sampled_from(["a", "b", "x"])),
                min_size=1, max_size=20))
def test_session_funnel_matches_pure_python(spark, events):
    """Session-scoped funnel == brute-force reference: lag-gap (120s)
    sessions computed per user, funnel chain confined to each."""
    from collections import defaultdict
    from datetime import datetime, timezone
    from rgd_rnaseq_workflows_spark.operators.funnel import (
        session_funnel_report)
    steps, gap_s = ("a", "b"), 120
    rows = [(i, datetime.fromtimestamp(sec, tz=timezone.utc)
             .replace(tzinfo=None), u, t)
            for i, (u, sec, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {r.step: (r.n_sessions, r.sum_gap_seconds) for r in
           session_funnel_report(df, steps,
                                 gap_minutes=gap_s // 60).collect()}

    # reference: per user, sort events, split sessions on gap > gap_s,
    # then per session run the 2-step chain
    by_user = defaultdict(list)
    for u, sec, t in events:
        by_user[u].append((sec, t))
    n1 = n2 = 0
    g2 = 0
    for u, evs in by_user.items():
        evs.sort()
        sessions, cur, prev = [], [], None
        for sec, t in evs:
            if prev is not None and sec - prev > gap_s:
                sessions.append(cur)
                cur = []
            cur.append((sec, t))
            prev = sec
        sessions.append(cur)
        for sess in sessions:
            a_times = sorted(s2 for s2, t in sess if t == "a")
            if not a_times:
                continue
            t1 = a_times[0]
            n1 += 1
            b_after = sorted(s2 for s2, t in sess if t == "b" and s2 > t1)
            if b_after:
                n2 += 1
                g2 += b_after[0] - t1
    want = {"a": (n1, None), "b": (n2, g2 if n2 else None)}
    assert got == want


@SETTINGS
@given(st.lists(st.integers(1, 500), min_size=1, max_size=25),
       st.integers(1, 40), st.integers(0, 9))
def test_pps_exact_k_for_any_weights(spark, weights, k, seed):
    from rgd_rnaseq_workflows_spark.operators.sampling import pps_systematic
    df = spark.createDataFrame(list(enumerate(weights)), ["id", "w"])
    out = pps_systematic(df, "id", "w", k=k, seed=seed).collect()
    assert sum(r["n_copies"] for r in out) == k          # Madow invariant
    assert all(r["n_copies"] >= 1 for r in out)
    assert all(1 <= r["incl_bp"] <= 10000 for r in out)


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.integers(0, 30)),
                min_size=1, max_size=40))
def test_quantile_norm_is_rank_monotone_within_group(spark, rows):
    from rgd_rnaseq_workflows_spark.operators.quality import (
        quantile_normalize_by_group)
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_normalize_by_group(df, "g", "v").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["v"], r["norm_value"]))
    pooled = sorted(v for _, v in rows)
    for g, cells in by_g.items():
        cells.sort()
        # monotone: higher raw value never maps to a lower pooled value
        norms = [n for _, n in cells]
        assert norms == sorted(norms)
        # normalized values are actual pooled values
        assert all(n in pooled for n in norms)


@SETTINGS
@given(st.lists(st.tuples(st.integers(1, 4),                 # user
                          st.sampled_from(["click", "view",
                                           "purchase"]),
                          st.integers(0, 500),               # sec
                          st.floats(0, 50, allow_nan=False)),
                min_size=1, max_size=25))
def test_attribution_credit_sums_to_conversions(spark, events):
    """The money-conservation invariant: under EVERY model the credit
    sums exactly to the total conversion cents — any arrival mix of
    touches, ties, multi-conversion users, empty windows."""
    from rgd_rnaseq_workflows_spark.operators.attribution import (
        multi_touch_attribution)
    rows = [(u, t, s, round(v, 2), i)
            for i, (u, t, s, v) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, sec long, value double, "
              "event_id int")
    out = multi_touch_attribution(df, lookback_sec=100).collect()
    total = sum(int(__import__("math").floor(v * 100 + 0.5))
                for _, t, _, v, _ in rows if t == "purchase")
    for m in ("first_touch", "last_touch", "linear"):
        got = sum(r["credited_cents"] for r in out if r["model"] == m)
        assert got == total, (m, got, total)


@SETTINGS
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd",
                                          "ee", "ff"]),
                         min_size=1, max_size=40),
                min_size=1, max_size=12))
def test_cdc_chunks_partition_every_document(spark, docs):
    """CDC chunks PARTITION each doc: per-source token mass equals the
    exact token count, whatever the cut pattern (no boundary, every
    boundary, short docs below the gram size)."""
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_chunk_stats)
    rows = [(i, " ".join(toks), f"s{i % 2}")
            for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["source"]: r["sum_chunk_tokens"]
           for r in cdc_chunk_stats(df, k=2, divisor=4).collect()}
    want: dict = {}
    for i, toks in enumerate(docs):
        s = f"s{i % 2}"
        want[s] = want.get(s, 0) + len(toks)
    assert got == want


@given(st.lists(st.integers(min_value=-(2**62) + 1, max_value=2**62 - 1),
                min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_limb_split_identity_over_longs(xs):
    """r11 correlation limb sums: the three-limb truncating-div split
    x = l2*2^42 + l1*2^21 + l0 must recombine to the exact sum for ANY
    signed 62-bit values (products of |fixed-point| < 2^31 inputs).
    Pure-Python twin of the Spark expressions (same truncating div/%
    semantics as Spark's `div`/`%` on BIGINT)."""
    B = 21

    def tdiv(a, b):     # truncate-toward-zero division (Spark div)
        q = abs(a) // b
        return -q if a < 0 else q

    def tmod(a, b):     # dividend-sign modulo (Spark %)
        return a - tdiv(a, b) * b

    l0 = sum(tmod(x, 1 << B) for x in xs)
    l1 = sum(tmod(tdiv(x, 1 << B), 1 << B) for x in xs)
    l2 = sum(tdiv(x, 1 << (2 * B)) for x in xs)
    assert l2 * (1 << (2 * B)) + l1 * (1 << B) + l0 == sum(xs)
    # every limb magnitude bounded so the LONG sums cannot overflow
    # before ~4.4e12 rows
    for x in xs:
        assert abs(tmod(x, 1 << B)) < (1 << B)
        assert abs(tmod(tdiv(x, 1 << B), 1 << B)) < (1 << B)
        assert abs(tdiv(x, 1 << (2 * B))) < (1 << B)


def test_limb_split_matches_spark_semantics(spark):
    """The Spark `%`/`div` expressions used by correlation_moment_aggs
    agree with the Python twin above on a signed boundary grid —
    pinning that Spark's BIGINT div/% truncate toward zero / follow the
    dividend sign (the identity's preconditions)."""
    B = 21
    vals = [0, 1, -1, (1 << B) - 1, 1 << B, -(1 << B), (1 << 42) + 12345,
            -(1 << 42) - 12345, (1 << 61), -(1 << 61), 999999999999]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    rows = df.selectExpr(
        f"x", f"x % {1 << B} AS l0",
        f"(x div {1 << B}) % {1 << B} AS l1",
        f"x div {1 << (2 * B)} AS l2").collect()
    for r in rows:
        assert r.l2 * (1 << (2 * B)) + r.l1 * (1 << B) + r.l0 == r.x
