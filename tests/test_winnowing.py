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
