"""Persisted IVF index: directory pruning, probe correctness, and the
end-to-end top-k equals the unpartitioned-filter form."""

from __future__ import annotations

import glob
import random

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.ivf_index import (
    ivf_index_topk, probe_labels, probe_scan, write_ivf_index)


def _emb(spark, n=400, dims=8, k=8, seed=19):
    rng = random.Random(seed)
    rows = [(i, i % k, [round(rng.uniform(-1, 1), 3) for _ in range(dims)])
            for i in range(n)]
    return rows, spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")


def test_probe_scan_prunes_directories(spark, tmp_path):
    """Probing 2 of 8 clusters lists/reads only those 2 directories,
    and the pruned result equals the unpartitioned filter."""
    rows, emb = _emb(spark)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path)
    # one directory per cluster on disk
    dirs = sorted(glob.glob(f"{path}/vectors/_epoch=*/_pt=*"))
    assert len(dirs) == 8
    probed = probe_scan(spark, path, [1, 5])
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # at execution only the probed directories' files are touched
    files = [r["f"] for r in
             probed.select(F.input_file_name().alias("f"))
             .distinct().collect()]
    assert files and all("_pt=1" in f or "_pt=5" in f for f in files)
    got = sorted(r["vec_id"] for r in probed.collect())
    want = sorted(i for i, lbl, _ in rows if lbl in (1, 5))
    assert got == want


def test_index_topk_equals_unpartitioned_rule(spark, tmp_path):
    """probe_labels ranks by the exact integer centroid dot (ties by
    label), and the end-to-end top-k equals computing the same rule on
    the raw table; probing every cluster is exact brute force."""
    rows, emb = _emb(spark, n=200, k=4)
    path = str(tmp_path / "ivf2")
    write_ivf_index(emb, path)
    qvec = rows[0][2]

    labels = probe_labels(spark, path, qvec, nprobe=2)
    assert len(labels) == 2

    got = [(r["vec_id"], r["cosine_sim"]) for r in
           ivf_index_topk(spark, path, qvec, k=5, nprobe=2).collect()]
    # same rule on the raw table: filter to the probed labels, exact
    # rounded cosine, same total order
    from rgd_rnaseq_workflows_spark.operators.similarity import cosine
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    want = [(r["vec_id"], r["cosine_sim"]) for r in
            (emb.filter(F.col("label").isin(labels))
             .select("vec_id",
                     F.round(cosine(F.transform(
                         "embedding", lambda x: x.cast("double")),
                         qlit), 6).alias("cosine_sim"))
             .orderBy(F.desc("cosine_sim"), "vec_id").limit(5)
             .collect())]
    assert got == want

    # full probe == brute force over everything
    full = [(r["vec_id"], r["cosine_sim"]) for r in
            ivf_index_topk(spark, path, qvec, k=5, nprobe=4).collect()]
    brute = [(r["vec_id"], r["cosine_sim"]) for r in
             (emb.select("vec_id",
                         F.round(cosine(F.transform(
                             "embedding", lambda x: x.cast("double")),
                             qlit), 6).alias("cosine_sim"))
              .orderBy(F.desc("cosine_sim"), "vec_id").limit(5)
              .collect())]
    assert full == brute


def test_probe_scan_label_column_unambiguous(spark, tmp_path):
    """Regression (ADVICE r8): when the index is written with the
    default label_col='label', the data files must NOT keep a second
    'label' column — selecting 'label' from probe_scan output used to
    raise AMBIGUOUS_REFERENCE after the _pt->label rename."""
    rows, emb = _emb(spark, n=80, k=4)
    path = str(tmp_path / "ivf_amb")
    write_ivf_index(emb, path)
    probed = probe_scan(spark, path, [0, 2])
    assert probed.columns.count("label") == 1
    got = sorted((r["vec_id"], r["label"])
                 for r in probed.select("vec_id", "label").collect())
    want = sorted((i, lbl) for i, lbl, _ in rows if lbl in (0, 2))
    assert got == want


def test_ann_index_cli_build_and_probe(spark, tmp_path):
    """e2e: --ann-index fits k-means and persists the partitioned
    layout; probe-ann reads only the probed cluster directories and
    its top-k equals the brute-force rule over the probed lists."""
    import os

    from rgd_rnaseq_workflows_spark import run_corpus
    from rgd_rnaseq_workflows_spark.operators.clustering import (
        kmeans_fit)
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        probe_labels)
    from rgd_rnaseq_workflows_spark.operators.similarity import cosine

    rows, emb = _emb(spark, n=240, dims=8, k=6, seed=23)
    base = ("the cat and dog of mouse to house in barn is red it "
            "runs over fields near rivers under stars tok%d")
    docs = spark.createDataFrame(
        [(i, "en", "s0", base % i) for i in range(6)],
        ["doc_id", "lang", "source", "text"])
    src = str(tmp_path / "docs.parquet")
    esrc = str(tmp_path / "emb.parquet")
    docs.write.parquet(src)
    emb.drop("label").write.parquet(esrc)
    out = str(tmp_path / "corpus_out")
    idx = str(tmp_path / "ivf_idx")
    rc = run_corpus.main(["--docs", src, "--out", out,
                          "--min-tokens", "5", "--embeddings", esrc,
                          "--ann-index", idx, "--ann-clusters", "6"])
    assert rc == 0
    # the persisted layout: one directory per non-empty cluster
    import glob as _g
    pts = [os.path.basename(d) for d in
           sorted(_g.glob(f"{idx}/vectors/_epoch=*/_pt=*"))]
    assert pts and len(pts) <= 6

    # probe subcommand: TSV out, equals the brute-force rule over the
    # probed lists (same k-means assignment, same exact-cosine order)
    qvec = [float(x) for x in rows[0][2]]
    probe_out = str(tmp_path / "probe_out")
    rc = run_corpus.main(["probe-ann", "--index", idx,
                          "--embeddings", esrc,
                          "--query-id", str(rows[0][0]),
                          "--k", "5", "--nprobe", "2",
                          "--out", probe_out])
    assert rc == 0
    import glob
    [tsv] = glob.glob(f"{probe_out}/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    got = [(int(a), float(b)) for a, b in
           (ln.split("\t") for ln in lines[1:])]

    assigned, _ = kmeans_fit(spark.read.parquet(esrc), k=6, iters=2,
                             persist=False)
    labels = probe_labels(spark, idx, qvec, nprobe=2)
    qlit = F.array(*[F.lit(x) for x in qvec])
    want = [(r["vec_id"], r["cosine_sim"]) for r in
            (assigned.filter(F.col("cluster").isin(labels))
             .select("vec_id",
                     F.round(cosine(F.transform(
                         "embedding", lambda x: x.cast("double")),
                         qlit), 6).alias("cosine_sim"))
             .orderBy(F.desc("cosine_sim"), "vec_id").limit(5)
             .collect())]
    assert got == want


def test_append_to_index_frozen_centroids(spark, tmp_path):
    """Incremental append: new vectors land in exactly the list the
    probe rule ranks first, probes see them immediately, existing
    files are never rewritten, and the centroid table is unchanged."""
    import os

    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        append_to_ivf_index, assign_by_centroids)

    rows, emb = _emb(spark, n=160, dims=8, k=4, seed=31)
    path = str(tmp_path / "ivf_app")
    write_ivf_index(emb, path)
    before_files = set(glob.glob(f"{path}/vectors/_epoch=*/_pt=*/*.parquet"))
    cents_before = sorted(tuple(r) for r in
                          spark.read.parquet(f"{path}/centroids")
                          .collect())

    rng = random.Random(77)
    new_rows = [(10_000 + i, 0,
                 [round(rng.uniform(-1, 1), 3) for _ in range(8)])
                for i in range(20)]
    new = spark.createDataFrame(
        new_rows, "vec_id long, label int, embedding array<float>"
    ).drop("label")
    append_to_ivf_index(new, path)

    # assignment rule == top-1 probe label, per appended vector
    asg = {r["vec_id"]: r["assigned_label"] for r in
           assign_by_centroids(spark, path, new).collect()}
    for vid, _, vec in new_rows:
        assert asg[vid] == probe_labels(spark, path, vec, nprobe=1)[0]

    # appended rows are readable in their assigned partitions; probes
    # see them through the normal pruned scan
    got = {r["vec_id"]: r["label"] for r in
           probe_scan(spark, path, sorted(set(asg.values()))).collect()
           if r["vec_id"] >= 10_000}
    assert got == asg

    # append-only: no pre-existing file rewritten, centroids frozen
    assert before_files <= set(
        glob.glob(f"{path}/vectors/_epoch=*/_pt=*/*.parquet"))
    cents_after = sorted(tuple(r) for r in
                         spark.read.parquet(f"{path}/centroids")
                         .collect())
    assert cents_after == cents_before


def test_batch_topk_equals_per_query_probe(spark, tmp_path):
    """The one-pass batched probe returns, per query, exactly the
    per-query ivf_index_topk ranking."""
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        ivf_index_topk_batch)

    rows, emb = _emb(spark, n=200, dims=8, k=5, seed=43)
    path = str(tmp_path / "ivf_batch")
    write_ivf_index(emb, path)

    qrows = [(qid, rows[qid * 13][2]) for qid in range(6)]
    queries = spark.createDataFrame(
        qrows, "qid long, embedding array<float>")
    got = {}
    for r in ivf_index_topk_batch(spark, queries, path, k=5,
                                  nprobe=2).collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for qid, vec in qrows:
        want = [(i + 1, r["vec_id"]) for i, r in enumerate(
            ivf_index_topk(spark, path, [float(x) for x in vec],
                           k=5, nprobe=2).collect())]
        assert sorted(got[qid]) == want, f"qid {qid}"


def test_append_raises_on_unassignable_vector(spark, tmp_path):
    """An empty-embedding delta row cannot be assigned to a list; the
    append must fail loudly, never silently drop the vector."""
    import pytest

    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        append_to_ivf_index, write_ivf_index)
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0], i % 3) for i in range(9)],
        "vec_id long, embedding array<float>, label int")
    path = str(tmp_path / "ivf_guard")
    write_ivf_index(emb, path)
    bad = spark.createDataFrame(
        [(100, [2.0, 1.0]), (101, [])],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="no centroid assignment"):
        append_to_ivf_index(bad, path)


def test_margin_from_index_equals_unpruned_reference(spark, tmp_path):
    """The index-routed margin alignment: probed-list directory pruning
    changes NOTHING about the kept set (the unpruned full-scan join
    under the same coarse rule is identical), and the scan carries
    PartitionFilters. The lake side never re-fits."""
    import random

    from rgd_rnaseq_workflows_spark.operators.clustering import kmeans_fit
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        probe_labels_batch, write_ivf_index)
    from rgd_rnaseq_workflows_spark.operators.similarity import (
        margin_alignment, margin_alignment_from_index)

    rng = random.Random(3)
    lake = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(120)], "vec_id long, embedding array<float>")
    batch = spark.createDataFrame(
        [(1000 + i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(20)], "vec_id long, embedding array<float>")
    path = str(tmp_path / "ivf_margin")
    assigned, _ = kmeans_fit(lake, k=6, iters=2, persist=False)
    write_ivf_index(assigned, path, label_col="cluster")

    got = margin_alignment_from_index(
        spark, path, batch, nprobe=2, k=4, min_margin_ppm=1_000_000)
    # unpruned reference under the SAME coarse rule: every list joins,
    # unprobed lists simply never match the batch's blk values
    qlabels = probe_labels_batch(spark, batch, path, nprobe=2)
    l_blk = (batch.join(qlabels.withColumnRenamed("qid", "vec_id"),
                        "vec_id").withColumnRenamed("label", "blk"))
    r_blk = (spark.read.parquet(f"{path}/vectors")
             .withColumnRenamed("_pt", "blk").drop("_epoch"))
    want = margin_alignment(l_blk, r_blk, k=4,
                            min_margin_ppm=1_000_000, block_col="blk")
    assert sorted(tuple(r) for r in got.collect()) == \
        sorted(tuple(r) for r in want.collect())
    assert got.count() > 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_probe_margin_cli(spark, tmp_path):
    """e2e: probe-margin aligns a batch parquet against a persisted
    lake index through the CLI and writes the kept pairs as TSV."""
    import glob as _g
    import random

    from rgd_rnaseq_workflows_spark import run_corpus
    from rgd_rnaseq_workflows_spark.operators.clustering import kmeans_fit
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        write_ivf_index)

    rng = random.Random(9)
    lake = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(80)], "vec_id long, embedding array<float>")
    idx = str(tmp_path / "lake_idx")
    assigned, _ = kmeans_fit(lake, k=4, iters=2, persist=False)
    write_ivf_index(assigned, idx, label_col="cluster")
    batch = str(tmp_path / "batch.parquet")
    # include an exact copy of a lake vector: its top-1 cosine is 1.0
    # and the margin gate keeps it
    [row] = lake.filter("vec_id = 7").collect()
    spark.createDataFrame(
        [(5007, row["embedding"])] +
        [(5100 + i, [rng.uniform(-1, 1) for _ in range(8)])
         for i in range(10)],
        "vec_id long, embedding array<float>").write.parquet(batch)
    out = str(tmp_path / "margin_out")
    rc = run_corpus.main(["probe-margin", "--index", idx,
                          "--embeddings", batch, "--nprobe", "2",
                          "--k", "4", "--min-margin-ppm", "1200000",
                          "--out", out])
    assert rc == 0
    [tsv] = _g.glob(f"{out}/part*.csv")
    lines = open(tsv).read().strip().split("\n")
    kept = {tuple(ln.split("\t")[:2]) for ln in lines[1:]}
    assert ("5007", "7") in kept
