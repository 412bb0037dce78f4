"""JN7 file-inventory join + SRT3 file-order sort + SNK5 index post-step."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.relational import (
    file_inventory_join, order_by_source_file)
from rgd_rnaseq_workflows_spark.sources.bed import (
    index_commands, write_indexed_bed)


def test_file_inventory_join(spark):
    meta = spark.createDataFrame(
        [("SRR1", "GSM1"), ("SRR2", "GSM2"), ("SRR3", "GSM3")],
        ["Run", "geo_accession"])
    inv = spark.createDataFrame(
        [("scratch/SRR1/GSM1_SRR1_2.fastq.gz",),
         ("scratch/SRR1/GSM1_SRR1_1.fastq.gz",),
         ("scratch/SRR2/GSM2_SRR2_1.fastq.gz",),
         ("scratch/misc/readme.txt",)], ["path"])
    out = file_inventory_join(meta, inv, r"_(SRR\d+)_[12]\.fastq", "Run")
    rows = {r["Run"]: r["paths"] for r in out.collect()}
    # paths sorted -> mate 1 before mate 2 (the reference's list order)
    assert rows["SRR1"] == ["scratch/SRR1/GSM1_SRR1_1.fastq.gz",
                            "scratch/SRR1/GSM1_SRR1_2.fastq.gz"]
    assert rows["SRR2"] == ["scratch/SRR2/GSM2_SRR2_1.fastq.gz"]
    # FIL9: no files -> NULL, row preserved
    assert rows["SRR3"] is None


def test_order_by_source_file(spark, tmp_out):
    # two single-row files; names chosen so file order != value order
    for fname, val in (("b_second.csv", "1"), ("a_first.csv", "9")):
        with open(os.path.join(tmp_out, fname), "w") as f:
            f.write(f"{val}\n")
    df = spark.read.schema("v int").csv(f"{tmp_out}/*.csv")
    got = [r["v"] for r in order_by_source_file(df).collect()]
    assert got == [9, 1]              # a_first before b_second


def test_write_indexed_bed_emits_post_commands(spark, tmp_out):
    df = spark.createDataFrame(
        [("chr2", 5, 9, "g2"), ("chr1", 1, 4, "g1")],
        ["chrom", "start", "end", "name"])
    out_dir = os.path.join(tmp_out, "bed_out")
    cmds = write_indexed_bed(df, out_dir, bed_name="genes.bed")
    bed = os.path.join(out_dir, "genes.bed")
    assert open(bed).read() == "chr1\t1\t4\tg1\nchr2\t5\t9\tg2\n"
    # the reference's bgzip/tabix steps (GeneTPMbed_v2.sh:139-161) as argv
    assert cmds == [["bgzip", "-f", bed],
                    ["tabix", "-p", "bed", f"{bed}.gz"]]
    assert index_commands("x.bed")[1][-1] == "x.bed.gz"
