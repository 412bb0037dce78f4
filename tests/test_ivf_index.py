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
    dirs = sorted(glob.glob(f"{path}/vectors/_pt=*"))
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
