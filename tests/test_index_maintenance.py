"""Exactly-once epoch ledger + compaction for the persisted index
triad: replayed epochs no-op, crash-retries heal without
double-counting, and optimize_index collapses append churn into the
fresh-build layout with probe results pinned unchanged."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.index_ledger import (
    ledger_keys, next_batch_key)
from rgd_rnaseq_workflows_spark.operators.index_maintenance import (
    optimize_index)
from rgd_rnaseq_workflows_spark.operators.inverted_index import (
    append_to_inverted_index, bm25_index_topk, read_inverted_meta,
    write_inverted_index)
from rgd_rnaseq_workflows_spark.operators.ivf_index import (
    append_to_ivf_index, ivf_index_topk, write_ivf_index)
from rgd_rnaseq_workflows_spark.operators.lsh_index import (
    append_to_lsh_index, probe_lsh_index, write_lsh_index)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common tok{i}") for i in ids],
        "doc_id long, text string")


def _bm25_probe(spark, path):
    return [tuple(r) for r in
            bm25_index_topk(spark, path, "common w1 w2", k=20).collect()]


# ---------------------------------------------------------------------------
# exactly-once appends
# ---------------------------------------------------------------------------

def test_bm25_replayed_epoch_is_noop(spark, tmp_path):
    """The foreachBatch retry shape: appending the same micro-batch
    under the same epoch key twice leaves probes AND the ledger-summed
    N/Σdl exactly where one append left them."""
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark, range(20)), path, num_buckets=4)
    delta = _docs(spark, range(100, 108))
    assert append_to_inverted_index(delta, path,
                                    epoch_key="stream-000001") is True
    probe1 = _bm25_probe(spark, path)
    meta1 = read_inverted_meta(spark, path)
    assert append_to_inverted_index(delta, path,
                                    epoch_key="stream-000001") is False
    assert _bm25_probe(spark, path) == probe1
    assert read_inverted_meta(spark, path) == meta1
    # and the replay equals a clean rebuild over base+delta
    full = str(tmp_path / "full")
    write_inverted_index(_docs(spark, range(20)).unionByName(delta),
                         full, num_buckets=4)
    assert _bm25_probe(spark, full) == probe1
    assert read_inverted_meta(spark, full) == meta1


def test_bm25_crash_before_ledger_commit_heals(spark, tmp_path):
    """The other at-least-once failure mode: postings written, crash
    BEFORE the ledger commit. The key is absent so the retry runs,
    overwriting the same epoch directory — no double-count."""
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark, range(20)), path, num_buckets=4)
    delta = _docs(spark, range(100, 108))
    append_to_inverted_index(delta, path, epoch_key="stream-000001")
    # simulate the crash: the ledger row (written LAST) vanishes while
    # the epoch's postings remain
    shutil.rmtree(f"{path}/ledger/_epoch=stream-000001")
    assert "stream-000001" not in ledger_keys(spark, path)
    assert append_to_inverted_index(delta, path,
                                    epoch_key="stream-000001") is True
    full = str(tmp_path / "full")
    write_inverted_index(_docs(spark, range(20)).unionByName(delta),
                         full, num_buckets=4)
    assert _bm25_probe(spark, path) == _bm25_probe(spark, full)
    assert read_inverted_meta(spark, path) == \
        read_inverted_meta(spark, full)


def test_ivf_replayed_epoch_is_noop(spark, tmp_path):
    path = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0], i % 4) for i in range(12)],
        "vec_id long, embedding array<float>, label int")
    write_ivf_index(emb, path)
    delta = spark.createDataFrame(
        [(200, [2.0, 1.0]), (201, [3.0, 1.0])],
        "vec_id long, embedding array<float>")
    assert append_to_ivf_index(delta, path, epoch_key="s-1") is True
    probe1 = [tuple(r) for r in
              ivf_index_topk(spark, path, [2.0, 1.0], k=30,
                             nprobe=4).collect()]
    assert append_to_ivf_index(delta, path, epoch_key="s-1") is False
    probe2 = [tuple(r) for r in
              ivf_index_topk(spark, path, [2.0, 1.0], k=30,
                             nprobe=4).collect()]
    assert probe2 == probe1
    # no duplicate vec_ids anywhere in the probed set
    ids = [v for v, _ in probe1]
    assert len(ids) == len(set(ids)) and 200 in ids


def test_lsh_replayed_epoch_is_noop(spark, tmp_path):
    path = str(tmp_path / "lsh")
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " + f"x{i}")
         for i in range(10)], "doc_id long, text string")
    write_lsh_index(docs, path)
    delta = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta y")],
        "doc_id long, text string")
    assert append_to_lsh_index(delta, path, epoch_key="s-1") is True
    probe1 = sorted(r["doc_id"] for r in probe_lsh_index(
        spark, path, "alpha beta gamma delta epsilon zeta eta theta y")
        .collect())
    assert append_to_lsh_index(delta, path, epoch_key="s-1") is False
    probe2 = sorted(r["doc_id"] for r in probe_lsh_index(
        spark, path, "alpha beta gamma delta epsilon zeta eta theta y")
        .collect())
    assert probe2 == probe1 and 100 in probe1
    rows = spark.read.parquet(f"{path}/bands")
    dup = (rows.groupBy("doc_id", "band_idx", "band_hash")
           .count().filter(F.col("count") > 1).count())
    assert dup == 0


def test_auto_batch_keys_are_distinct(spark, tmp_path):
    """epoch_key=None keeps plain append semantics: two ad-hoc CLI
    appends mint distinct keys and both land."""
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark, range(10)), path, num_buckets=4)
    k1 = next_batch_key(spark, path)
    append_to_inverted_index(_docs(spark, [100]), path)
    k2 = next_batch_key(spark, path)
    append_to_inverted_index(_docs(spark, [101]), path)
    assert k1 == "batch-000001" and k2 == "batch-000002"
    n_docs, _, _ = read_inverted_meta(spark, path)
    assert n_docs == 12


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def _churn_bm25(spark, path):
    write_inverted_index(_docs(spark, range(20)), path, num_buckets=4)
    for i in range(3):
        append_to_inverted_index(_docs(spark, range(100 + 8 * i,
                                                    108 + 8 * i)),
                                 path, epoch_key=f"s-{i}")


def test_optimize_bm25_pins_probe_and_collapses_files(spark, tmp_path):
    path = str(tmp_path / "inv")
    _churn_bm25(spark, path)
    before = _bm25_probe(spark, path)
    meta_before = read_inverted_meta(spark, path)
    stats = optimize_index(spark, path, "bm25")
    assert stats["files_after"] < stats["files_before"]
    # one epoch directory remains on disk
    assert glob.glob(f"{path}/postings/_epoch=*") == \
        [f"{path}/postings/_epoch=compacted"]
    assert _bm25_probe(spark, path) == before
    assert read_inverted_meta(spark, path) == meta_before
    # within-file term order (footer pruning) survives compaction
    for f in glob.glob(f"{path}/postings/_epoch=*/_tb=*/*.parquet"):
        ts = [r["term"] for r in
              spark.read.parquet(f).select("term").collect()]
        assert ts == sorted(ts)
    # a replay of a PRE-compaction epoch still no-ops: the ledger
    # survived the rewrite
    assert append_to_inverted_index(_docs(spark, range(100, 108)),
                                    path, epoch_key="s-0") is False
    assert _bm25_probe(spark, path) == before


def test_optimize_ivf_pins_probe(spark, tmp_path):
    path = str(tmp_path / "ivf")
    emb = spark.createDataFrame(
        [(i, [float(i % 4), 1.0], i % 4) for i in range(12)],
        "vec_id long, embedding array<float>, label int")
    write_ivf_index(emb, path)
    for i in range(3):
        append_to_ivf_index(spark.createDataFrame(
            [(200 + i, [float(i % 4), 1.0])],
            "vec_id long, embedding array<float>"),
            path, epoch_key=f"s-{i}")
    before = [tuple(r) for r in
              ivf_index_topk(spark, path, [2.0, 1.0], k=30,
                             nprobe=4).collect()]
    stats = optimize_index(spark, path, "ivf")
    assert stats["files_after"] < stats["files_before"]
    after = [tuple(r) for r in
             ivf_index_topk(spark, path, [2.0, 1.0], k=30,
                            nprobe=4).collect()]
    assert after == before


def test_optimize_lsh_pins_probe_and_sort(spark, tmp_path):
    path = str(tmp_path / "lsh")
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, base + f" x{i}") for i in range(10)],
        "doc_id long, text string")
    write_lsh_index(docs, path)
    for i in range(3):
        append_to_lsh_index(spark.createDataFrame(
            [(100 + i, base + f" y{i}")], "doc_id long, text string"),
            path, epoch_key=f"s-{i}")
    q = base + " z"
    before = sorted(r["doc_id"] for r in
                    probe_lsh_index(spark, path, q).collect())
    stats = optimize_index(spark, path, "lsh")
    assert stats["files_after"] < stats["files_before"]
    after = sorted(r["doc_id"] for r in
                   probe_lsh_index(spark, path, q).collect())
    assert after == before
    for f in glob.glob(f"{path}/bands/_epoch=*/band_idx=*/*.parquet"):
        hs = [r["band_hash"] for r in
              spark.read.parquet(f).select("band_hash").collect()]
        assert hs == sorted(hs)


def test_optimize_index_cli(spark, tmp_path):
    from rgd_rnaseq_workflows_spark import run_corpus
    path = str(tmp_path / "inv")
    _churn_bm25(spark, path)
    before = _bm25_probe(spark, path)
    rc = run_corpus.main(["optimize-index", "--index", path,
                          "--kind", "bm25"])
    assert rc == 0
    assert _bm25_probe(spark, path) == before
    assert glob.glob(f"{path}/postings/_epoch=*") == \
        [f"{path}/postings/_epoch=compacted"]


def test_optimize_contam_pins_probe(spark, tmp_path):
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        append_to_contamination_index, probe_contamination_index,
        write_contamination_index)
    path = str(tmp_path / "contam")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(2, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(10, "intro text then the quick brown fox jumps over it"),
         (12, "pack my box with five dozen liquor jugs verbatim")],
        ["doc_id", "text"])
    write_contamination_index(b1, path, window=5)
    append_to_contamination_index(b2, path, epoch_key="e1")
    before = [tuple(r) for r in
              probe_contamination_index(spark, path, docs).collect()]
    stats = optimize_index(spark, path, "contam")
    assert stats["files_after"] <= stats["files_before"]
    assert glob.glob(f"{path}/fingerprints/_epoch=*") == \
        [f"{path}/fingerprints/_epoch=compacted"]
    assert [tuple(r) for r in
            probe_contamination_index(spark, path, docs).collect()] \
        == before
    # ledger survived: pre-compaction epoch replay still no-ops
    assert append_to_contamination_index(b2, path,
                                         epoch_key="e1") is False


def test_describe_index_cli(spark, tmp_path, capsys):
    from rgd_rnaseq_workflows_spark import run_corpus
    path = str(tmp_path / "inv")
    _churn_bm25(spark, path)
    rc = run_corpus.main(["describe-index", "--index", path,
                          "--kind", "bm25"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "num_buckets" in out and "epoch base" in out
    assert "4 committed epoch(s)" in out


def test_optimize_crash_between_renames_self_heals(spark, tmp_path):
    """ADVICE r10: a crash BETWEEN optimize_index's two renames leaves
    the full data under ``__predecessor`` and no live directory — a
    retried optimize_index must roll it back and complete (probe
    results pinned), not die path-not-found."""
    import os
    path = str(tmp_path / "inv")
    _churn_bm25(spark, path)
    before = _bm25_probe(spark, path)
    # simulate the crash window: data renamed away, tmp never promoted
    os.rename(f"{path}/postings", f"{path}/postings__predecessor")
    stats = optimize_index(spark, path, "bm25")
    assert stats["files_after"] <= stats["files_before"]
    assert _bm25_probe(spark, path) == before
    assert glob.glob(f"{path}/postings/_epoch=*") == \
        [f"{path}/postings/_epoch=compacted"]
    assert not os.path.exists(f"{path}/postings__predecessor")


def test_auto_key_collision_with_orphan_epoch_dir_is_loud(
        spark, tmp_path):
    """ADVICE r10: two concurrent auto-key appenders mint the same
    batch-N (ledger read-modify-write race) — the second must FAIL at
    write time instead of silently overwriting the first's epoch data.
    Simulated via the equivalent on-disk state: the epoch directory
    exists but its ledger row does not."""
    import os

    import pytest

    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark, range(10)), path, num_buckets=4)
    nxt = next_batch_key(spark, path)
    os.makedirs(f"{path}/postings/_epoch={nxt}")
    with pytest.raises(RuntimeError, match="already exists"):
        append_to_inverted_index(_docs(spark, range(50, 55)), path)
    # healing: the EXPLICIT key overwrites the orphan idempotently
    assert append_to_inverted_index(_docs(spark, range(50, 55)), path,
                                    epoch_key=nxt) is True
    assert append_to_inverted_index(_docs(spark, range(50, 55)), path,
                                    epoch_key=nxt) is False


def test_auto_key_claim_marker_blocks_second_minter(spark, tmp_path):
    """The atomic claim (review r11): an existing claim marker for the
    next auto key — the state a concurrent minter that won the
    FileSystem.create race leaves — makes the second auto appender
    fail loudly even though the epoch data directory does not exist
    yet (the pure check-then-write window)."""
    import os

    import pytest

    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark, range(8)), path, num_buckets=4)
    nxt = next_batch_key(spark, path)
    os.makedirs(f"{path}/postings__claims", exist_ok=True)
    open(f"{path}/postings__claims/{nxt}.claim", "w").close()
    with pytest.raises(RuntimeError, match="CLAIMED"):
        append_to_inverted_index(_docs(spark, range(50, 53)), path)
    # explicit keys bypass the claim path entirely
    assert append_to_inverted_index(_docs(spark, range(50, 53)), path,
                                    epoch_key=nxt) is True
