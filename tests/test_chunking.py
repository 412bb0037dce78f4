"""Overlapping RAG chunking: coverage, overlap, stability, edge cases."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    words = " ".join(f"w{i}" for i in range(10))
    return spark.createDataFrame(
        [(0, words), (1, "a b c"), (2, ""), (3, "solo")],
        "doc_id long, text string")


def test_chunks_cover_and_overlap(spark, docs):
    out = [r for r in chunk_documents(docs, window=4, stride=3).collect()
           if r.doc_id == 0]
    out.sort(key=lambda r: r.chunk_idx)
    # 10 tokens, window 4, stride 3 → starts 0,3,6 (6+4=10 covers all)
    assert [r.chunk_start for r in out] == [0, 3, 6]
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[1].chunk_text == "w3 w4 w5 w6"        # 1-token overlap
    assert out[2].chunk_text == "w6 w7 w8 w9"
    assert all(r.n_tokens == 4 for r in out)


def test_short_and_empty_docs(spark, docs):
    rows = chunk_documents(docs, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc                            # empty doc: no rows
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "a b c"
    assert by_doc[3][0].n_tokens == 1


def test_no_shuffle_plan(spark, docs):
    plan = chunk_documents(docs, window=4, stride=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bad_stride_raises(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, window=4, stride=5)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

def _cdc_rows():
    return [
        (1, "the quick brown fox jumps over the lazy dog and runs "
            "away fast", "a"),
        # same passage shifted by two tokens — fixed windows realign,
        # CDC must still find the shared chunks
        (2, "prefix token the quick brown fox jumps over the lazy dog "
            "and runs away fast", "a"),
        (3, "completely different text with no shared content here", "b"),
        (4, "tiny", "b"),
        (5, "completely different text with no shared content here", "b"),
    ]


def test_cdc_detects_shifted_duplicates(spark):
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_chunk_stats)
    df = spark.createDataFrame(_cdc_rows(), ["doc_id", "text", "source"])
    out = {r["source"]: r for r in cdc_chunk_stats(df).collect()}
    # the shifted copy shares chunks with the original
    assert out["a"]["dup_chunks"] > 0
    # the exact copy duplicates every one of its chunks
    assert out["b"]["dup_chunks"] > 0
    # chunks partition each doc: token mass is exact
    assert out["a"]["sum_chunk_tokens"] == 13 + 15
    assert out["b"]["sum_chunk_tokens"] == 8 + 1 + 8


def test_cdc_chunk_identity_is_position_free(spark):
    """The SAME text yields the SAME chunk multiset wherever it sits:
    prepending tokens must not change chunks derived from content
    after the first unaffected boundary — here the full-doc overlap
    shows up as duplicated hashes across the pair."""
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_chunk_stats)
    base = " ".join(f"w{i % 17}tok" for i in range(200))
    rows = [(1, base, "s"), (2, "shift " + base, "s")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    [r] = cdc_chunk_stats(df).collect()
    # nearly all chunks of the shifted doc re-hash identically
    assert r["dup_chunks"] >= (r["n_chunks"] // 2) - 2


def test_cdc_matches_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_chunk_stats, cdc_chunk_stats_sql)
    df = spark.createDataFrame(_cdc_rows(), ["doc_id", "text", "source"])
    got = sorted(tuple(r) for r in cdc_chunk_stats(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _cdc_rows())
    exp = sorted(tuple(r) for r in
                 con.execute(cdc_chunk_stats_sql("documents")).fetchall())
    assert got == exp


def test_cdc_rejects_bad_params(spark):
    import pytest

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_chunk_stats, cdc_chunk_stats_sql)
    df = spark.createDataFrame(_cdc_rows(), ["doc_id", "text", "source"])
    with pytest.raises(ValueError):
        cdc_chunk_stats(df, k=0)
    with pytest.raises(ValueError):
        cdc_chunk_stats(df, divisor=1)
    with pytest.raises(ValueError):
        cdc_chunk_stats_sql("t", divisor=0)


# ---------------------------------------------------------------------------
# CDC containment pairs
# ---------------------------------------------------------------------------

def _pair_rows():
    base = " ".join(f"w{i % 23}x" for i in range(120))
    boiler = ("standard license header text common to every document "
              "in the corpus here")
    return [
        (1, base, "a"),
        (2, "shifted prefix " + base, "a"),      # near-dup of 1
        (3, boiler + " unique body three "
            + " ".join(f"u3t{i}" for i in range(40)), "b"),
        (4, boiler + " unique body four "
            + " ".join(f"u4t{i}" for i in range(40)), "b"),
        (5, "entirely unrelated content "
            + " ".join(f"z{i}q" for i in range(60)), "b"),
    ]


def test_cdc_pairs_find_shifted_duplicate(spark):
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_pairs)
    df = spark.createDataFrame(_pair_rows(), ["doc_id", "text", "source"])
    out = {(r["id_a"], r["id_b"]): r["containment_bp"]
           for r in cdc_containment_pairs(
               df, min_shared=2, min_containment_bp=3000).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 5000
    assert (1, 5) not in out and (2, 5) not in out


def test_cdc_pairs_boilerplate_guard_drops_viral_chunks(spark):
    """A chunk shared by EVERY doc must not mint pairs: with
    max_chunk_df below the corpus size the boilerplate-only docs 3/4
    pair only through their genuine shared chunks (the boiler text),
    and with max_chunk_df=2 nothing changes for the true dup pair."""
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_pairs)
    boiler = "common header line repeated all over the corpus every time"
    rows = [(i, boiler + " body " + " ".join(f"d{i}t{j}" for j in range(30)),
             "s") for i in range(1, 9)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # df cap 3 < 8 docs: the boiler chunks (df=8) are dropped, no pair
    # reaches min_shared through them
    out = cdc_containment_pairs(df, min_shared=1,
                                min_containment_bp=1000,
                                max_chunk_df=3).collect()
    assert out == []


def test_cdc_pairs_match_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_pairs, cdc_containment_pairs_sql)
    df = spark.createDataFrame(_pair_rows(), ["doc_id", "text", "source"])
    got = sorted(tuple(r) for r in cdc_containment_pairs(
        df, min_shared=1, min_containment_bp=0).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _pair_rows())
    exp = sorted(tuple(r) for r in con.execute(cdc_containment_pairs_sql(
        "documents", min_shared=1, min_containment_bp=0)).fetchall())
    assert got == exp and len(got) > 0


def test_cdc_pairs_reject_bad_params(spark):
    import pytest

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_pairs, cdc_containment_pairs_sql)
    df = spark.createDataFrame(_pair_rows(), ["doc_id", "text", "source"])
    with pytest.raises(ValueError):
        cdc_containment_pairs(df, min_shared=0)
    with pytest.raises(ValueError):
        cdc_containment_pairs(df, min_containment_bp=10001)
    with pytest.raises(ValueError):
        cdc_containment_pairs_sql("t", max_chunk_df=1)


def test_cdc_keepers_keep_the_larger_doc(spark):
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_keepers)
    big = " ".join(f"w{i % 23}x" for i in range(120))
    small = " ".join(f"w{i % 23}x" for i in range(60))  # prefix excerpt
    rows = [(1, big, "s"), (2, small, "s"),
            (3, "unrelated " + " ".join(f"z{i}q" for i in range(40)), "s")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r["doc_id"]: r["kept"] for r in cdc_containment_keepers(
        df, min_shared=2, min_containment_bp=5000).collect()}
    assert got == {1: True, 2: False, 3: True}


def test_cdc_keepers_match_duckdb_twin(spark):
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_keepers, cdc_containment_keepers_sql)
    df = spark.createDataFrame(_pair_rows(), ["doc_id", "text", "source"])
    got = sorted(tuple(r) for r in cdc_containment_keepers(
        df, min_shared=1, min_containment_bp=2000).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR, "
                "source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", _pair_rows())
    exp = sorted(tuple(r) for r in con.execute(
        cdc_containment_keepers_sql(
            "documents", min_shared=1,
            min_containment_bp=2000)).fetchall())
    assert got == exp and any(not k for _, _, k in got)


def test_cdc_cross_source_overlap(spark):
    """Two sources sharing a shifted passage light up their cell; a
    source with unrelated text shares nothing; DuckDB twin agrees."""
    import duckdb

    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_cross_source_overlap, cdc_cross_source_overlap_sql)

    base = ("the cat and dog of mouse to house in barn with hay "
            "under sun by the river where fish swim past reeds "
            "and frogs sit on logs near the bank all day long")
    rows = [
        (1, "web", base),
        (2, "books", "prefix token " + base),        # shifted copy
        (3, "wiki", "completely different words entirely unrelated "
                    "text written here now about stars and planets "
                    "orbiting distant suns far away in deep space"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {(r["source_a"], r["source_b"]):
           (r["shared_chunks"], r["containment_bp"])
           for r in cdc_cross_source_overlap(docs).collect()}
    assert ("books", "web") in out
    shared, bp = out[("books", "web")]
    assert shared >= 1 and bp >= 5000      # most of the copy survives
    assert not any("wiki" in k for k in out)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    exp = {(a, b): (s, c) for a, b, s, c in con.execute(
        cdc_cross_source_overlap_sql("documents")).fetchall()}
    assert out == exp
