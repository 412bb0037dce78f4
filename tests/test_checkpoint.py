"""Reliable-checkpoint option: with a checkpoint dir configured, the
iterative/reused lineages (MinHash shingle table, connected-components
loop) switch from localCheckpoint to fault-tolerant checkpoint() and
produce identical output."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.components import connected_components
from rgd_rnaseq_workflows_spark.operators.dedup import minhash_dedup_pairs
from rgd_rnaseq_workflows_spark.session import checkpoint_df

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again!"),
    (3, "a completely different document about spark checkpointing"),
    (4, "the quick brown fox jumps over the lazy dog once more today"),
    (5, "another unrelated text with nothing shared at all here"),
]


def _run_chain(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = minhash_dedup_pairs(docs, num_hashes=8, band_size=2,
                                threshold=0.3)
    comps = connected_components(pairs, id_a="id_a", id_b="id_b")
    return (sorted(map(tuple, pairs.collect())),
            sorted(map(tuple, comps.collect())))


def _reset_checkpoint_dir(spark):
    # package-private Scala var is public in bytecode; best-effort reset
    try:
        sc = spark.sparkContext
        none = sc._jvm.scala.Option.apply(None)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(none)
    except Exception:
        pass


def test_reliable_checkpoint_identical_output(spark, tmp_path):
    base = _run_chain(spark)
    ckpt = tmp_path / "ckpt"
    spark.sparkContext.setCheckpointDir(str(ckpt))
    try:
        assert spark.sparkContext.getCheckpointDir() is not None
        again = _run_chain(spark)
        assert again == base
        # the reliable path must actually have written checkpoint files
        written = [p for p in ckpt.rglob("*") if p.is_file()]
        assert written, "checkpoint() wrote nothing to the configured dir"
    finally:
        _reset_checkpoint_dir(spark)


def test_checkpoint_df_local_mode_default(spark):
    _reset_checkpoint_dir(spark)
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(10)
    out = checkpoint_df(df)
    assert out.count() == 10
