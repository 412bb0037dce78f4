"""Persisted LSH index: layout on disk, probe pushdown, and candidate
parity with the in-query LSH path."""

from __future__ import annotations

import glob
import os
import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.dedup import (
    lsh_bands, lsh_candidate_pairs, minhash_signatures)
from rgd_rnaseq_workflows_spark.operators.lsh_index import (
    probe_lsh_index, probe_lsh_index_batch, read_lsh_meta,
    write_lsh_index)


def _corpus(spark, n=60, seed=13):
    rng = random.Random(seed)
    vocab = ["tok%d" % i for i in range(400)]
    rows = []
    for i in range(n):
        toks = [rng.choice(vocab) for _ in range(25)]
        rows.append((i, " ".join(toks)))
        if i % 10 == 0:  # plant a near-dup of doc i as doc i+1000
            mut = list(toks)
            mut[3] = "CHANGED"
            rows.append((i + 1000, " ".join(mut)))
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def test_layout_and_meta(spark, tmp_path):
    rows, docs = _corpus(spark)
    path = str(tmp_path / "lsh")
    write_lsh_index(docs, path, num_hashes=8, band_size=2)
    dirs = sorted(os.path.basename(d) for d in
                  glob.glob(f"{path}/bands/_epoch=*/band_idx=*"))
    assert dirs == [f"band_idx={b}" for b in range(4)]
    assert read_lsh_meta(spark, path) == (8, 2, 3)
    # inside a band directory the rows are band_hash-sorted (footer
    # min/max pruning over the probe predicate relies on this)
    for f in glob.glob(f"{path}/bands/_epoch=*/band_idx=0/*.parquet"):
        hs = [r["band_hash"] for r in
              spark.read.parquet(f).select("band_hash").collect()]
        assert hs == sorted(hs)


def test_probe_single_doc_matches_inquery_lsh(spark, tmp_path):
    """Probing with a lake document's own text returns exactly the
    docs sharing an LSH bucket with it — the in-query
    lsh_candidate_pairs partners plus itself — and the scan carries
    the pushed band predicates."""
    rows, docs = _corpus(spark)
    path = str(tmp_path / "lsh2")
    write_lsh_index(docs, path, num_hashes=8, band_size=2)

    qid, qtext = rows[0][0], rows[0][1]     # doc 0 has near-dup 1000
    probed = probe_lsh_index(spark, path, qtext)
    got = sorted(r["doc_id"] for r in probed.collect())

    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=8,
                              shingle_n=3)
    pairs = lsh_candidate_pairs(sigs, "doc_id", num_hashes=8,
                                band_size=2)
    want = sorted({qid} | {
        r["id_b"] for r in pairs.filter(F.col("id_a") == qid).collect()
    } | {
        r["id_a"] for r in pairs.filter(F.col("id_b") == qid).collect()
    })
    assert got == want
    assert 1000 in got                       # the planted near-dup
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "band_hash" in plan
    assert "PartitionFilters" in plan


def test_probe_empty_doc_yields_nothing(spark, tmp_path):
    rows, docs = _corpus(spark, n=20)
    path = str(tmp_path / "lsh3")
    write_lsh_index(docs, path)
    assert probe_lsh_index(spark, path, "").count() == 0


def test_batch_probe_matches_cross_corpus_candidates(spark, tmp_path):
    """The delta-batch probe against the persisted index returns the
    same candidate set as banding both sides in-query."""
    rows, docs = _corpus(spark, n=40, seed=29)
    path = str(tmp_path / "lsh4")
    write_lsh_index(docs, path, num_hashes=8, band_size=2)

    rng = random.Random(5)
    new_rows = []
    for i, (did, text) in enumerate(rows[:6]):
        mut = text.split()
        mut[1] = "NEW"
        new_rows.append((5000 + i, " ".join(mut)))
    new_docs = spark.createDataFrame(new_rows, ["doc_id", "text"])

    got = sorted((r["id_new"], r["id_lake"]) for r in
                 probe_lsh_index_batch(spark, path, new_docs).collect())

    nsig = minhash_signatures(new_docs, "text", "doc_id", num_hashes=8,
                              shingle_n=3)
    lsig = minhash_signatures(docs, "text", "doc_id", num_hashes=8,
                              shingle_n=3)
    nb = lsh_bands(nsig, "doc_id", 8, 2).withColumnRenamed(
        "doc_id", "id_new")
    lb = lsh_bands(lsig, "doc_id", 8, 2).withColumnRenamed(
        "doc_id", "id_lake")
    want = sorted((r["id_new"], r["id_lake"]) for r in
                  nb.join(lb, ["band_idx", "band_hash"])
                  .select("id_new", "id_lake").distinct().collect())
    assert got == want and got


def test_lsh_index_cli_build_and_probe(spark, tmp_path):
    """e2e: --lsh-index persists the curated corpus's banded layout;
    probe-lsh finds the planted near-dup through the CLI."""
    from rgd_rnaseq_workflows_spark import run_corpus

    base = ("the cat and dog of mouse to house in barn is red it "
            "runs over fields near rivers under stars")
    rows = [(1, "en", "web", base + " alpha"),
            (2, "en", "web", base + " beta"),
            (3, "en", "web", "the is and to of it in " +
             " ".join("uniq%d" % i for i in range(15)))]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "source",
                                        "text"])
    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "corpus_out")
    idx = str(tmp_path / "lsh_idx")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "3", "--threshold", "0.99",
                          "--lsh-index", idx])
    assert rc == 0
    import os
    import glob as _g
    assert _g.glob(f"{idx}/bands/_epoch=*/band_idx=*")

    probe_out = str(tmp_path / "probe_out")
    rc = run_corpus.main(["probe-lsh", "--index", idx,
                          "--text", base + " gamma",
                          "--out", probe_out])
    assert rc == 0
    [tsv] = glob.glob(f"{probe_out}/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    ids = sorted(int(x) for x in lines[1:])
    # both base-variant docs collide in some band; doc 3 does not
    assert 1 in ids or 2 in ids
    assert 3 not in ids


def test_append_equals_rebuild_and_never_rewrites(spark, tmp_path):
    """Appending a delta equals rebuilding over the union (same probe
    candidates, batch and single-doc) and never rewrites existing
    band files."""
    from rgd_rnaseq_workflows_spark.operators.lsh_index import (
        append_to_lsh_index)

    rows, docs = _corpus(spark, n=40)
    # delta: near-dup of doc 0 plus two fresh docs
    base0 = rows[0][1]
    delta = spark.createDataFrame(
        [(5000, base0), (5001, "fresh " * 25), (5002, "other " * 25)],
        ["doc_id", "text"])
    p_inc = str(tmp_path / "lsh_inc")
    p_full = str(tmp_path / "lsh_full")
    write_lsh_index(docs, p_inc, num_hashes=8, band_size=2)
    before = set(glob.glob(f"{p_inc}/bands/_epoch=*/band_idx=*/*.parquet"))
    append_to_lsh_index(delta, p_inc)
    after = set(glob.glob(f"{p_inc}/bands/_epoch=*/band_idx=*/*.parquet"))
    assert before <= after and len(after) > len(before)

    write_lsh_index(docs.unionByName(delta), p_full,
                    num_hashes=8, band_size=2)
    got = sorted(r["doc_id"] for r in
                 probe_lsh_index(spark, p_inc, base0).collect())
    want = sorted(r["doc_id"] for r in
                  probe_lsh_index(spark, p_full, base0).collect())
    assert got == want and 5000 in got

    probe = spark.createDataFrame([(1, base0)], ["doc_id", "text"])
    got_b = sorted((r["id_new"], r["id_lake"]) for r in
                   probe_lsh_index_batch(spark, p_inc, probe).collect())
    want_b = sorted((r["id_new"], r["id_lake"]) for r in
                    probe_lsh_index_batch(spark, p_full, probe).collect())
    assert got_b == want_b
