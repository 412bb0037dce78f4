"""Greedy max-cover selection: brute-force pick sequence, ties, edges."""
from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.selection import (
    greedy_max_cover, greedy_max_cover_sql)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def _brute_greedy(shingle_sets, k):
    covered, out, remaining = set(), [], dict(enumerate(shingle_sets))
    for rank in range(1, k + 1):
        if not remaining:
            break
        best = min(remaining,
                   key=lambda i: (-len(remaining[i] - covered), i))
        gain = len(remaining[best] - covered)
        covered |= remaining.pop(best)
        out.append((rank, best, gain, len(covered)))
    return out


def _unigram_sets(texts):
    # shingle_n=1 → shingles are the distinct tokens themselves
    return [set(t.split()) for t in texts]


def test_matches_brute_force_greedy(spark):
    texts = ["a b c d", "c d e", "e f", "a b", "g", "a c e g"]
    got = [(r["rank"], r["doc_id"], r["gain"], r["covered_total"])
           for r in greedy_max_cover(_docs(spark, texts), k=4,
                                     shingle_n=1).collect()]
    assert sorted(got) == _brute_greedy(_unigram_sets(texts), 4)


def test_tie_breaks_on_ascending_id(spark):
    texts = ["x y", "x y", "z w"]
    got = greedy_max_cover(_docs(spark, texts), k=3,
                           shingle_n=1).collect()
    ids = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    # rank1: tie between 0 and 1 (gain 2) → 0; rank2: doc 2 gains 2;
    # rank3: doc 1 gains 0 (still selected — zero-gain picks continue)
    assert ids == [0, 2, 1]
    assert [r["gain"] for r in sorted(got, key=lambda r: r["rank"])] \
        == [2, 2, 0]


def test_k_exceeding_corpus_stops_early(spark):
    texts = ["a b", "c"]
    got = greedy_max_cover(_docs(spark, texts), k=5, shingle_n=1)
    assert got.count() == 2


def test_sql_twin_reproduces_pick_sequence(spark, tmp_path):
    import duckdb
    texts = ["a b c d e f", "d e f g", "g h i", "a h", "j j j",
             "b c j k l", "m", "k l m n o"]
    df = _docs(spark, texts)
    got = sorted(
        (r["rank"], r["doc_id"], r["gain"], r["covered_total"])
        for r in greedy_max_cover(df, k=6, shingle_n=2).collect())
    pq = str(tmp_path / "docs.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{pq}/*.parquet')")
    want = sorted(map(tuple, con.execute(
        greedy_max_cover_sql("documents", k=6, shingle_n=2))
        .fetchall()))
    assert got == want


# --- k-center coreset ---------------------------------------------------------

def _vecdf(spark, X):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")


def _brute_kcenter(X, k, scale=10_000):
    XI = [[round(v * scale) for v in x] for x in X]

    def d2(a, b):
        return sum((p - q) * (p - q) for p, q in zip(a, b))

    out = [(1, 0, None)]
    centers = [0]
    remaining = set(range(1, len(XI)))
    mind = {i: d2(XI[i], XI[0]) for i in remaining}
    for rank in range(2, k + 1):
        if not remaining:
            break
        best = min(remaining, key=lambda i: (-mind[i], i))
        out.append((rank, best, mind[best]))
        remaining.discard(best)
        for i in remaining:
            mind[i] = min(mind[i], d2(XI[i], XI[best]))
        centers.append(best)
    return out


def test_kcenter_matches_brute_force(spark):
    from rgd_rnaseq_workflows_spark.operators.selection import (
        k_center_coreset)
    import random
    rng = random.Random(21)
    X = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(40)]
    got = sorted(
        (r["rank"], r["vec_id"], r["dist_sq"])
        for r in k_center_coreset(_vecdf(spark, X), k=6).collect())
    assert got == sorted(_brute_kcenter(X, 6))


def test_kcenter_duplicates_and_small_n(spark):
    from rgd_rnaseq_workflows_spark.operators.selection import (
        k_center_coreset)
    X = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    got = sorted(
        (r["rank"], r["vec_id"], r["dist_sq"])
        for r in k_center_coreset(_vecdf(spark, X), k=5).collect())
    # seed=0; farthest is 2 (dist 2e8); duplicate 1 last at dist 0
    assert got == [(1, 0, None), (2, 2, 2 * 10_000 ** 2), (3, 1, 0)]


def test_kcenter_sql_twin_agrees(spark, tmp_path):
    import duckdb
    import random
    from rgd_rnaseq_workflows_spark.operators.selection import (
        k_center_coreset, k_center_coreset_sql)
    rng = random.Random(5)
    X = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(30)]
    df = _vecdf(spark, X)
    got = sorted(
        (r["rank"], r["vec_id"], r["dist_sq"])
        for r in k_center_coreset(df, k=5).collect())
    pq = str(tmp_path / "emb.parquet")
    df.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{pq}/*.parquet')")
    want = sorted(map(tuple, con.execute(
        k_center_coreset_sql("embeddings", k=5)).fetchall()))
    assert got == want
