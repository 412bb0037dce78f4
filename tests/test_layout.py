"""SRC9 — PE/SE layout classification + routing (the exit-2 contract of
SRA2QC_production.sh:207-249 / SRA2QC_SE_v1.sh:166-179 as an operator)."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.sources.layout import (
    FAILED, PAIRED_END, SINGLE_END, classify_layout, inventory_from_paths,
    route_by_layout)


def _inventory(spark):
    return inventory_from_paths(spark, [
        # SRR1: full pair → PE
        "scratch/SRR1/SRR1_1.fastq.gz", "scratch/SRR1/SRR1_2.fastq.gz",
        # SRR2: pair + unpaired remainder → still PE (the reference renames
        # the remainder and proceeds)
        "scratch/SRR2/SRR2_1.fastq", "scratch/SRR2/SRR2_2.fastq",
        "scratch/SRR2/SRR2.fastq",
        # SRR3: bare fastq only → SE (exit-2 routing)
        "scratch/SRR3/SRR3.fastq",
        # SRR4: lone mate 1 → incomplete pair → failed
        "scratch/SRR4/SRR4_1.fastq.gz",
        # non-FASTQ noise is ignored
        "scratch/SRR1/SRR1.sra",
    ])


def test_classify_layout(spark):
    got = {r["run"]: r["layout"]
           for r in classify_layout(_inventory(spark)).collect()}
    assert got == {"SRR1": PAIRED_END, "SRR2": PAIRED_END,
                   "SRR3": SINGLE_END, "SRR4": FAILED}


def test_route_by_layout_mixed_acclist(spark):
    acclist = spark.createDataFrame(
        [("SRR1", "GSM1"), ("SRR2", "GSM2"), ("SRR3", "GSM3"),
         ("SRR4", "GSM4"), ("SRR9", "GSM9")],   # SRR9: no files at all
        ["Run", "geo_accession"])
    routed = route_by_layout(acclist, classify_layout(_inventory(spark)))
    assert sorted(r["Run"] for r in routed[PAIRED_END].collect()) == \
        ["SRR1", "SRR2"]
    assert [r["Run"] for r in routed[SINGLE_END].collect()] == ["SRR3"]
    # incomplete pair AND missing-entirely both land in failed
    assert sorted(r["Run"] for r in routed[FAILED].collect()) == \
        ["SRR4", "SRR9"]
    # routing preserves the AccList schema for downstream plans
    assert routed[PAIRED_END].columns == ["Run", "geo_accession"]


def test_classify_layout_geo_prefixed_renames(spark):
    """After the reference's rename step files carry the geo prefix
    (GSM1_SRR1_1.fastq, SRA2QC_production.sh:211-224) — the run id still
    extracts from the segment before the mate suffix."""
    inv = inventory_from_paths(spark, [
        "scratch/SRR5/GSM9_SRR5_1.fastq.gz",
        "scratch/SRR5/GSM9_SRR5_2.fastq.gz",
        "scratch/SRR6/GSM9_SRR6.fastq",          # renamed unpaired/SE
    ])
    got = {r["run"]: r["layout"] for r in classify_layout(inv).collect()}
    assert got == {"SRR5": PAIRED_END, "SRR6": SINGLE_END}
