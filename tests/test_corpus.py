"""End-to-end corpus curation: quality → lang → exact dedup → near-dup
cluster removal with deterministic keepers."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.plans.corpus import (
    curate_corpus, curation_stats)

# 20 distinct tokens, English-stopword heavy → lang_id = en;
# bigram shingles are all distinct → controllable Jaccard arithmetic
BASE = ("the cat and dog of mouse to house in barn "
        "is red it runs over fields near rivers under stars")


def _docs(spark):
    near_a = BASE + " alpha"                     # J(a,b) = 19/21 ≈ 0.905
    near_b = BASE + " beta"                      # J(b,c) = 20/21 ≈ 0.952
    near_c = BASE + " beta gamma"                # J(a,c) = 19/22 ≈ 0.864
    rows = [
        (1, "en", "web", near_a),
        (2, "en", "web", near_a),                # exact dup of 1
        (3, "en", "web", near_b),                # near-dup of 1 and 4
        (4, "en", "web", near_c),                # chains to 1 only VIA 3
        (5, "en", "web", "too short"),           # quality gate
        (6, "de", "web", BASE + " delta"),       # lang mislabel (en text)
        (7, "en", "web", ("der und das ist von ein zu die " * 4).strip()),
        # ^ labeled en but German stopwords → lang_pred=de → dropped
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"])


def test_curate_corpus_stages(spark):
    # threshold 0.9: pairs (1,3) and (3,4) qualify, (1,4) does NOT —
    # only the connected-component pass can collapse the chain
    out = curate_corpus(_docs(spark), min_tokens=20,
                        shingle_n=2, threshold=0.9)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 2 exact-dups 1; 3,4 fall in 1's cluster via the chain (keeper 1);
    # 5 too short; 6,7 language mismatch
    assert ids == [1]


def test_curation_stats_shape(spark):
    curated = curate_corpus(_docs(spark), min_tokens=5, threshold=0.999)
    stats = {r["lang"]: (r["n_docs"], r["total_tokens"])
             for r in curation_stats(curated).collect()}
    assert "en" in stats and stats["en"][0] >= 1


def test_corpus_cli(spark, tmp_out):
    import glob
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    src = os.path.join(tmp_out, "docs.parquet")
    _docs(spark).write.parquet(src)
    out = os.path.join(tmp_out, "corpus_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "20", "--threshold", "0.9"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert [r["doc_id"] for r in curated.collect()] == [1]
    assert os.path.isdir(f"{out}/curated/lang=en")     # partitioned layout
    [stats] = glob.glob(f"{out}/stats/part*.csv")
    lines = open(stats).read().strip().split("\n")
    assert lines[0] == "lang\tn_docs\ttotal_tokens"


def test_stream_curate_equals_batch_stages(spark, tmp_out):
    """Streaming curation (quality + lang + exact dedup) must equal the
    batch pipeline's first three stages across micro-batches, payload
    included."""
    import os
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.functions import text as TX
    from rgd_rnaseq_workflows_spark.operators.dedup import exact_dedup
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        quality_lang_gate, stream_curate)

    b1 = _docs(spark)                                 # ids 1..7
    b2 = spark.createDataFrame(
        [(10, "en", "web", BASE + " alpha"),          # replay of doc 1 text
         (11, "en", "web", BASE + " epsilon zeta")],  # new
        ["doc_id", "lang", "source", "text"])
    src = os.path.join(tmp_out, "cur_src")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (stream_curate(stream, min_tokens=20)
         .writeStream.format("memory").queryName("cur_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = {(r["doc_id"], r["lang"], r["text"], r["n_tokens"])
                    for r in spark.sql("SELECT * FROM cur_out").collect()}
    finally:
        q.stop()

    batch = exact_dedup(quality_lang_gate(b1.unionByName(b2), 20),
                        "text", "doc_id")
    expected = {(r["doc_id"], r["lang"], r["text"], r["n_tokens"])
                for r in batch.collect()}
    assert streamed == expected and len(expected) >= 4


def test_corpus_cli_mix_pipeline(spark, tmp_out):
    """--benchmark + --mix: the full training-mix path through the CLI."""
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    # corpus: doc 1 survives curation plus two distinct long en docs
    extra = ("a quick brown fox jumps over the lazy dog while the sun "
             "sets behind green hills and the river bends away slowly")
    extra2 = ("it is a truth universally acknowledged that a reader in "
              "want of the long sentence must be in search of tokens too")
    rows = [(1, "en", "web", BASE + " alpha"),
            (10, "en", "web", extra),
            (11, "en", "web", extra2)]
    src = os.path.join(tmp_out, "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    # benchmark shares a 4-gram run with doc 10 only
    bench = os.path.join(tmp_out, "bench.parquet")
    spark.createDataFrame(
        [(100, "en", "eval", "quick brown fox jumps over nothing else")],
        ["doc_id", "lang", "source", "text"]).write.parquet(bench)
    out = os.path.join(tmp_out, "mix_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "15", "--threshold", "0.9",
                          "--benchmark", bench, "--contam-n", "4",
                          "--mix", "en=1.0", "--mix-default", "0.0"])
    assert rc == 0
    kept = {r["doc_id"]
            for r in spark.read.parquet(f"{out}/curated").collect()}
    assert 10 not in kept          # contaminated by the benchmark
    assert kept == {1, 11}         # en kept at rate 1.0


def test_parse_mix_rejects_malformed():
    import pytest
    from rgd_rnaseq_workflows_spark.run_corpus import parse_mix
    assert parse_mix("en=0.5,de=0.25") == {"en": 0.5, "de": 0.25}
    with pytest.raises(ValueError):
        parse_mix("en:0.5")


def test_stream_training_mix_equals_batch(spark, tmp_out):
    """The incremental mix pipeline (stateful dedup + stateless
    contamination/mix gates) must equal dedup -> decontaminate -> sample
    run in batch over the same documents."""
    import os
    from rgd_rnaseq_workflows_spark.operators.contamination import decontaminate
    from rgd_rnaseq_workflows_spark.operators.dedup import exact_dedup
    from rgd_rnaseq_workflows_spark.operators.sampling import (
        stratified_hash_sample)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        collect_bench_shingles, quality_lang_gate, stream_training_mix)

    extra = ("a quick brown fox jumps over the lazy dog while the sun "
             "sets behind green hills and the river bends away slowly")
    b1 = _docs(spark)                                 # ids 1..7
    b2 = spark.createDataFrame(
        [(10, "en", "web", extra),                    # contaminated below
         (11, "en", "web", BASE + " epsilon zeta")],
        ["doc_id", "lang", "source", "text"])
    bench = spark.createDataFrame(
        [(100, "en", "eval", "quick brown fox jumps over nothing")],
        ["doc_id", "lang", "source", "text"])
    bench_sh = collect_bench_shingles(bench, contam_n=4)
    fractions = {"en": 1.0}

    src = os.path.join(tmp_out, "mix_src")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (stream_training_mix(stream, bench_sh, fractions, min_tokens=20,
                             contam_n=4)
         .writeStream.format("memory").queryName("mix_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        streamed = {(r["doc_id"], r["lang"], r["n_tokens"])
                    for r in spark.sql("SELECT * FROM mix_out").collect()}
    finally:
        q.stop()

    deduped = exact_dedup(quality_lang_gate(b1.unionByName(b2), 20),
                          "text", "doc_id")
    batch = stratified_hash_sample(
        decontaminate(deduped, bench, shingle_n=4),
        "lang", fractions, "doc_id", seed=7, default=0.0)
    expected = {(r["doc_id"], r["lang"], r["n_tokens"])
                for r in batch.collect()}
    assert streamed == expected
    assert 10 not in {d for d, _, _ in streamed}       # leak dropped
    assert len(expected) >= 2


def test_corpus_cli_temperature_mix_and_shards(spark, tmp_out):
    """--temperature-mix at fraction 1.0 keeps everything (clamped rate);
    --shards writes a shard-partitioned copy + manifest whose totals
    reconcile with the curated output."""
    import glob
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    extra = ("a quick brown fox jumps over the lazy dog while the sun "
             "sets behind green hills and the river bends away slowly")
    extra2 = ("it is a truth universally acknowledged that a reader in "
              "want of the long sentence must be in search of tokens too")
    rows = [(1, "en", "web", BASE + " alpha"),
            (10, "en", "web", extra),
            (11, "en", "web", extra2)]
    src = os.path.join(tmp_out, "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "shard_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "15", "--threshold", "0.9",
                          "--temperature-mix", "1.0", "--shards", "2"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert curated.count() == 3                  # fraction 1.0 keeps all
    assert "mix_bps" not in curated.columns      # internal column dropped
    shards = spark.read.parquet(f"{out}/shards")
    assert shards.count() == 3
    assert "ord" not in shards.columns           # internal ordering key dropped
    assert os.path.isdir(f"{out}/shards/shard=0") or \
        os.path.isdir(f"{out}/shards/shard=1")
    [mf] = glob.glob(f"{out}/shard_manifest/part*.csv")
    lines = open(mf).read().strip().split("\n")
    assert lines[0].startswith("shard\tn_docs")
    n_docs = sum(int(line.split("\t")[1]) for line in lines[1:])
    assert n_docs == 3


def test_corpus_cli_mix_flags_mutually_exclusive(spark, tmp_out):
    import os
    import pytest
    from rgd_rnaseq_workflows_spark import run_corpus
    src = os.path.join(tmp_out, "d.parquet")
    spark.createDataFrame([(1, "en", "web", BASE)],
                          ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    with pytest.raises(SystemExit):
        run_corpus.main(["--docs", src, "--out", os.path.join(tmp_out, "o"),
                         "--mix", "en=1.0", "--temperature-mix", "0.5"])


def test_corpus_cli_splits_column(spark, tmp_out):
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    extra = ("a quick brown fox jumps over the lazy dog while the sun "
             "sets behind green hills and the river bends away slowly")
    rows = [(i, "en", "web", extra + f" tail{i} uniq{i} word{i}")
            for i in range(12)]
    src = os.path.join(tmp_out, "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "split_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "15", "--threshold", "0.99",
                          "--splits"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert "split" in curated.columns
    vals = {r["split"] for r in curated.select("split").distinct().collect()}
    assert vals <= {"train", "val", "test"} and "train" in vals


def test_corpus_cli_passage_dedup_and_dsir(spark, tmp_out):
    import os
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark import run_corpus
    # long stopword-rich docs that pass quality/lang gates; doc 1 repeats
    # doc 0's first 4-token passage, docs tagged by source for DSIR
    base = "the and is in of to it was for on with as"
    rows = [
        (0, f"alpha beta gamma delta {base}", "en", "tgt"),
        (1, f"alpha beta gamma delta {base} extra words here", "en", "raw"),
        (2, f"unrelated tokens entirely {base} filler words", "en", "raw"),
        (3, f"different content again {base} other filler stuff", "en", "tgt"),
    ]
    src = os.path.join(tmp_out, "pd_docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .write.parquet(src)
    out = os.path.join(tmp_out, "pd_out")
    rc = run_corpus.main([
        "--docs", src, "--out", out, "--min-tokens", "5",
        "--threshold", "0.99", "--passage-dedup", "4",
        "--dsir-target", "source = 'tgt'", "--dsir-keep", "0.5"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    texts = {r.doc_id: r.text for r in curated.collect()}
    # doc 1 survived curation but lost its duplicated leading passage
    if 1 in texts:
        assert not texts[1].startswith("alpha beta gamma delta")
    # DSIR keeps half the docs, biased toward the tgt slice
    assert 0 < len(texts) <= 2


def test_corpus_cli_chunks_stage(spark, tmp_out):
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    base = "the and is in of to it was for on with as"
    rows = [(i, f"doc {i} body words here {base}", "en", "src0")
            for i in range(6)]
    src = os.path.join(tmp_out, "ch_docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string") \
        .write.parquet(src)
    out = os.path.join(tmp_out, "ch_out")
    rc = run_corpus.main(["--docs", src, "--out", out, "--min-tokens", "5",
                          "--threshold", "0.999", "--chunks", "8"])
    assert rc == 0
    chunks = spark.read.parquet(f"{out}/chunks")
    assert set(chunks.columns) == {"doc_id", "chunk_idx", "chunk_start",
                                   "chunk_text", "n_tokens"}
    rows_ = chunks.collect()
    assert rows_ and all(r.n_tokens <= 8 for r in rows_)
    # default stride = 6 → 17-token docs chunk at 0, 6, 12
    starts = sorted(r.chunk_start for r in rows_ if r.doc_id == 0)
    assert starts == [0, 6, 12]


def test_corpus_cli_neardup_report_stage(spark, tmp_out):
    """--neardup-report writes keeper/pagerank/leakage TSVs from the
    SAME pair graph the curation's cluster removal used (one pair-gen,
    VERDICT r4 item 3); curated output unchanged vs the plain run."""
    import glob
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    src = os.path.join(tmp_out, "docs_nr.parquet")
    _docs(spark).write.parquet(src)
    out = os.path.join(tmp_out, "corpus_nr")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "20", "--threshold", "0.9",
                          "--neardup-report"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert [r["doc_id"] for r in curated.collect()] == [1]
    for rep, header in (
            ("neardup_keepers", "comp\tn_members\tkeeper_id"),
            ("neardup_pagerank", "id\trank"),
            ("neardup_leakage", "split_lo\tsplit_hi\tn_pairs")):
        [f] = glob.glob(f"{out}/{rep}/part*.csv")
        lines = open(f).read().strip().split("\n")
        assert lines[0] == header, rep
    # the 1-2-3-4 chain is one cluster: keepers reports it with min-id 1
    [kf] = glob.glob(f"{out}/neardup_keepers/part*.csv")
    rows = [ln.split("\t") for ln in open(kf).read().strip().split("\n")[1:]]
    assert any(r[0] == "1" and int(r[1]) >= 3 for r in rows)
    # byte-determinism (ADVICE r5): every report is sorted by ALL its
    # columns, so ties on the first column cannot reorder across runs
    def _v(s):
        try:
            return (0, float(s))
        except ValueError:
            return (1, s)
    for rep in ("neardup_keepers", "neardup_pagerank", "neardup_leakage"):
        [f] = glob.glob(f"{out}/{rep}/part*.csv")
        body = [tuple(_v(x) for x in ln.split("\t"))
                for ln in open(f).read().strip().split("\n")[1:]]
        assert body == sorted(body), rep


def test_full_chain_pipeline_single_pair_gen(spark, tmp_out, monkeypatch):
    """The 100 TB dress-rehearsal contract at fixture scale (VERDICT r5
    item 3): ONE CLI invocation chains passage-dedup → curation +
    near-dup reports → DSIR → decontamination → temperature mix →
    splits → chunks → shards, and the PPJoin pair generator — the most
    expensive stage — runs EXACTLY once across the curation's cluster
    removal and all three graph reports."""
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    from rgd_rnaseq_workflows_spark.plans import corpus as corpus_plan
    from rgd_rnaseq_workflows_spark.plans import neardup as neardup_plan

    calls = []
    real = corpus_plan.ngram_jaccard_pairs

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    # both plan modules bound the generator by name at import time —
    # patch each binding so ANY pair-gen in the run is counted
    monkeypatch.setattr(corpus_plan, "ngram_jaccard_pairs", counting)
    monkeypatch.setattr(neardup_plan, "ngram_jaccard_pairs", counting)

    src = os.path.join(tmp_out, "chain_docs.parquet")
    _docs(spark).write.parquet(src)
    bench = os.path.join(tmp_out, "chain_bench.parquet")
    spark.createDataFrame(
        [(100, "en", "eval", "completely unrelated benchmark prose")],
        ["doc_id", "lang", "source", "text"]).write.parquet(bench)
    out = os.path.join(tmp_out, "chain_out")

    rc = run_corpus.main([
        "--docs", src, "--out", out,
        "--min-tokens", "20", "--threshold", "0.9",
        "--passage-dedup", "64",       # window > doc length: no rewrite
        "--neardup-report",
        "--dsir-target", "source = 'web'", "--dsir-keep", "1.0",
        "--benchmark", bench,
        "--temperature-mix", "1.0",
        "--splits", "--chunks", "8", "--shards", "2"])
    assert rc == 0
    assert len(calls) == 1, f"pair graph generated {len(calls)} times"

    # every stage's artifact landed
    for sub in ("curated", "chunks", "shards", "stats", "shard_manifest",
                "neardup_keepers", "neardup_pagerank", "neardup_leakage"):
        assert os.path.exists(os.path.join(out, sub)), sub
    kept = {r.doc_id for r in
            spark.read.parquet(f"{out}/curated").collect()}
    assert kept == {1}
    assert "split" in spark.read.parquet(f"{out}/curated").columns


def test_corpus_cli_epoch_budget_stage(spark, tmp_out):
    """--epoch-budget: the data-constrained mix writes the REPEATED
    corpus — docs appear once per allocated epoch with a pass index."""
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    extra = ("a quick brown fox jumps over the lazy dog while the sun "
             "sets behind green hills and the river bends away slowly")
    rows = [(1, "en", "web", BASE + " alpha"), (10, "en", "web", extra)]
    src = os.path.join(tmp_out, "docs_eb.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "eb_out")
    # ~42 tokens of en available; budget 200 with max-epochs 2 caps en
    # at exactly 2 passes of everything
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "15", "--threshold", "0.9",
                          "--epoch-budget", "200",
                          "--epoch-weights", "en=1",
                          "--max-epochs", "2"])
    assert rc == 0
    cur = spark.read.parquet(f"{out}/curated")
    assert "epoch" in cur.columns
    per_doc = {}
    for r in cur.collect():
        per_doc.setdefault(r.doc_id, []).append(r.epoch)
    assert set(per_doc) == {1, 10}
    for d, es in per_doc.items():
        assert sorted(es) == [1, 2], (d, es)   # capped at 2 full passes

    # mutual exclusion with the other mix modes
    import pytest
    with pytest.raises(SystemExit):
        run_corpus.main(["--docs", src, "--out", out,
                         "--epoch-budget", "100", "--epoch-weights",
                         "en=1", "--mix", "en=1.0"])
    with pytest.raises(SystemExit):
        run_corpus.main(["--docs", src, "--out", out,
                         "--epoch-budget", "100"])


def test_corpus_cli_containment_report(spark, tmp_out):
    """--lake + --containment-report: the curated survivor's pasted
    block shows up against the lake doc that contains it; the report is
    new x lake only and byte-deterministically ordered."""
    import glob
    import os
    from rgd_rnaseq_workflows_spark import run_corpus
    src = os.path.join(tmp_out, "docs_cr.parquet")
    _docs(spark).write.parquet(src)
    # the lake holds a doc embedding the curated survivor's text
    lake = os.path.join(tmp_out, "lake_cr.parquet")
    near_a = BASE + " alpha"
    spark.createDataFrame(
        [(100, "en", "lake", "preamble words " + near_a + " trailing"),
         (101, "en", "lake", "completely unrelated lake text here")],
        ["doc_id", "lang", "source", "text"]).write.parquet(lake)
    out = os.path.join(tmp_out, "corpus_cr_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "20", "--threshold", "0.9",
                          "--lake", lake, "--containment-report", "0.3"])
    assert rc == 0
    [rep] = glob.glob(f"{out}/containment/part*.csv")
    lines = open(rep).read().strip().split("\n")
    assert lines[0] == "id_new\tid_old\tn_shared\tcontainment"
    body = [l.split("\t") for l in lines[1:]]
    # survivor doc 1 vs lake doc 100, high containment; never lake 101
    assert any(r[0] == "1" and r[1] == "100" and float(r[3]) > 0.5
               for r in body)
    assert not any(r[1] == "101" for r in body)
    assert body == sorted(body)


def test_corpus_cli_containment_requires_lake(spark, tmp_out):
    import os
    import pytest
    from rgd_rnaseq_workflows_spark import run_corpus
    src = os.path.join(tmp_out, "docs_cr2.parquet")
    _docs(spark).write.parquet(src)
    with pytest.raises(SystemExit, match="requires --lake"):
        run_corpus.main(["--docs", src,
                         "--out", os.path.join(tmp_out, "o2"),
                         "--containment-report", "0.3"])


def test_corpus_cli_cluster_splits(spark, tmp_out):
    """--cluster-splits: near-dup twins surviving curation must share
    one split label; --splits and --cluster-splits are exclusive."""
    import os
    import pyspark.sql.functions as F
    from rgd_rnaseq_workflows_spark import run_corpus
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet forest toward the distant river "
            "bank where tall green trees grow near clear water")
    twin = base + " today"              # borderline twin (same shingles)
    rows = [(i, base if i % 2 == 0 else twin, "en", "web")
            for i in range(40)]
    # make every doc distinct enough that exact dedup keeps them but
    # cluster-splitting still links the twins: append a unique token
    rows = [(i, t + f" marker{i}", lg, s) for i, t, lg, s in rows]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    src = os.path.join(tmp_out, "docs.parquet")
    docs.write.parquet(src)
    out = os.path.join(tmp_out, "corpus_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "5", "--threshold", "0.999",
                          "--cluster-splits", "0.5"])
    assert rc == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert "split" in curated.columns
    # all survivors are >= 0.5-similar to each other -> one component
    # -> exactly one split value across the whole set
    assert curated.select("split").distinct().count() == 1
    assert curated.filter(F.col("split").isNull()).count() == 0
    rc2 = run_corpus.main(["--docs", src, "--out", out + "2",
                           "--splits", "--cluster-splits"])
    assert rc2 == 2


def test_corpus_cli_cdc_containment_drop(spark, tmp_out):
    """--cdc-containment drops a doc mostly contained in a larger one
    (shift-robust: the excerpt is offset by a prefix token) while
    keeping the superset and unrelated docs."""
    import os

    from rgd_rnaseq_workflows_spark import run_corpus
    tail = ("and the barn was red for it is near the house "
            "of the dog and the cat runs to the fields")
    big = BASE + " " + tail                  # superset document
    excerpt = "shifted " + BASE              # contained, offset by one
    other = ("the sun in sky is high and the moon at night is far "
             "over hills where wind blows cold on stones by lakes")
    rows = [(1, "en", "web", big), (2, "en", "web", excerpt),
            (3, "en", "web", other)]
    src = os.path.join(tmp_out, "cdc_docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "cdc_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "5", "--threshold", "0.99",
                          "--cdc-containment", "5000"])
    assert rc == 0
    kept = sorted(r["doc_id"] for r in
                  spark.read.parquet(f"{out}/curated").collect())
    assert kept == [1, 3]


def test_corpus_cli_cdc_containment_keeps_unchunkable_docs(spark, tmp_out):
    """The containment stage drops contained DUPLICATES only: a zero-
    token doc (absent from the keeper report because it cannot be
    chunked) must pass through unchanged (ADVICE-r7 — the stage now
    anti-joins the losers instead of semi-joining the winners)."""
    import os

    from rgd_rnaseq_workflows_spark import run_corpus
    tail = ("and the barn was red for it is near the house "
            "of the dog and the cat runs to the fields")
    big = BASE + " " + tail
    excerpt = "shifted " + BASE
    # lang_id('') falls back to 'de' (no stopword hits) — label the
    # empty doc 'de' so curation's language gate keeps it and the
    # containment stage is what decides its fate
    rows = [(1, "en", "web", big), (2, "en", "web", excerpt),
            (3, "de", "web", "   ")]         # whitespace-only doc
    src = os.path.join(tmp_out, "cdc_zero_docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "cdc_zero_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "0", "--threshold", "0.99",
                          "--cdc-containment", "5000"])
    assert rc == 0
    kept = sorted(r["doc_id"] for r in
                  spark.read.parquet(f"{out}/curated").collect())
    assert kept == [1, 3]      # excerpt dropped, empty doc kept


def test_corpus_cli_layout_hilbert_prunes(spark, tmp_out):
    """--layout hilbert writes a curve-clustered copy whose parquet
    footers prune a 2-D box to a small fraction of the files, and the
    pruned read equals the unpruned filter exactly."""
    import os
    import random

    from rgd_rnaseq_workflows_spark import run_corpus
    from rgd_rnaseq_workflows_spark.operators.zorder import (
        file_manifest, pruned_read)

    rng = random.Random(41)
    words = ["the", "cat", "dog", "runs", "sun", "sky", "barn", "red",
             "and", "is", "on", "to", "a", "in", "it", "of"]
    rows = [(i, "en", "web",
             " ".join(rng.choice(words) for _ in range(rng.randint(21, 60))))
            for i in range(4000)]
    src = os.path.join(tmp_out, "layout_docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "layout_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--threshold", "0.99",
                          "--layout", "hilbert",
                          "--layout-cols", "doc_id,n_tokens",
                          "--layout-files", "16"])
    assert rc == 0
    path = f"{out}/clustered"
    man = file_manifest(spark, path, ["doc_id", "n_tokens"])
    assert len(man) == 16
    box = {"doc_id": (100, 600), "n_tokens": (21, 30)}
    got, n_read, n_total = pruned_read(spark, path, man, box)
    exp = (spark.read.parquet(f"{out}/curated")
           .filter("doc_id BETWEEN 100 AND 600 "
                   "AND n_tokens BETWEEN 21 AND 30"))
    assert sorted(r.doc_id for r in got.collect()) == \
        sorted(r.doc_id for r in exp.collect())
    assert n_total == 16 and n_read <= 6


def test_corpus_cli_layout_zorder_runs(spark, tmp_out):
    """--layout zorder exercises the same stage through the Morton
    key path (files written, rows conserved)."""
    import os

    from rgd_rnaseq_workflows_spark import run_corpus
    rows = [(i, "en", "web",
             "the cat and dog runs to the barn in the sun and the sky "
             f"is red over field {i} where it sits on a stone")
            for i in range(200)]
    src = os.path.join(tmp_out, "zl_docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "zl_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--threshold", "0.99",
                          "--layout", "zorder", "--layout-files", "4"])
    assert rc == 0
    cl = spark.read.parquet(f"{out}/clustered")
    cur = spark.read.parquet(f"{out}/curated")
    assert cl.count() == cur.count()


def test_stream_cdc_chunks_compaction_equals_batch(spark, tmp_out):
    """The streaming CDC gate: the stream maintains the (doc_id,
    chunk_hash) table row-locally across micro-batches, and the
    batch compaction over the sink equals cdc_containment_keepers
    run directly on all the documents — including after a restart
    replays a doc (duplicate chunk rows collapse in the compaction)."""
    import os
    from rgd_rnaseq_workflows_spark.operators.chunking import (
        cdc_containment_keepers, cdc_containment_keepers_from_chunks)
    from rgd_rnaseq_workflows_spark.streaming.corpus_stream import (
        stream_cdc_chunk_sets)

    tail = ("and the barn was red for it is near the house "
            "of the dog and the cat runs to the fields")
    big = BASE + " " + tail
    excerpt = "shifted " + BASE
    other = ("the sun in sky is high and the moon at night is far "
             "over hills where wind blows cold on stones by lakes")
    b1 = spark.createDataFrame(
        [(1, big), (2, excerpt)], ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(3, other), (2, excerpt)],        # doc 2 replayed (restart)
        ["doc_id", "text"])
    src = os.path.join(tmp_out, "cdc_stream_src")
    os.makedirs(src)
    b1.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = (stream_cdc_chunk_sets(stream)
         .writeStream.format("memory").queryName("cdc_chunks")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        sink = spark.sql("SELECT * FROM cdc_chunks")
        got = sorted(tuple(r) for r in
                     cdc_containment_keepers_from_chunks(sink).collect())
    finally:
        q.stop()

    all_docs = spark.createDataFrame(
        [(1, big), (2, excerpt), (3, other)], ["doc_id", "text"])
    want = sorted(tuple(r) for r in
                  cdc_containment_keepers(all_docs).collect())
    assert got == want
    kept = {d: k for d, _, k in got}
    assert kept == {1: True, 2: False, 3: True}


def test_corpus_cli_token_waterfill(spark, tmp_out):
    """--token-waterfill caps the curated set to the budget: the
    allocation TSV lands, the kept token count per source never
    exceeds its allocation, and the total kept is within the budget."""
    import glob
    import os

    from rgd_rnaseq_workflows_spark import run_corpus
    from rgd_rnaseq_workflows_spark.functions import text as TX
    import pyspark.sql.functions as F

    # stopword-bearing vocabulary so lang_id agrees with lang='en'
    words = ["the", "cat", "dog", "runs", "sun", "sky", "barn", "red",
             "and", "is", "on", "to", "a", "in", "it", "of"]
    import random
    rng = random.Random(13)
    rows = [(i, "en", "s%d" % (i % 3),
             " ".join(rng.choice(words)
                      for _ in range(rng.randint(21, 60))))
            for i in range(120)]
    src = os.path.join(tmp_out, "wf_docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "lang", "source", "text"]) \
        .write.parquet(src)
    out = os.path.join(tmp_out, "wf_out")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--threshold", "0.99",
                          "--token-waterfill", "50"])
    assert rc == 0
    [tsv] = glob.glob(f"{out}/waterfill/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    assert lines[0].split("\t") == ["source", "supply_tokens",
                                    "allocated_tokens", "saturated"]
    alloc = {l.split("\t")[0]: int(l.split("\t")[2])
             for l in lines[1:]}
    kept = (spark.read.parquet(f"{out}/curated")
            .withColumn("_t", TX.token_count("text"))
            .groupBy("source").agg(F.sum("_t").alias("t")).collect())
    for r in kept:
        assert r["t"] <= alloc[r["source"]]
    supply = sum(int(l.split("\t")[1]) for l in lines[1:])
    assert sum(alloc.values()) == (50 * supply) // 100
