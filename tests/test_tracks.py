"""M5 — BED9 tracks + palette assignment (SURVEY JN2, F13, FIL6, SRT2, WIN1)."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.plans.tracks import (
    RGB_BLUE, RGB_DARK_BLUE, RGB_GRAY, RGB_LIGHT_BLUE, assign_track_colors,
    tpm_bed9)


def _bed(spark):
    rows = [
        ("chr1", 100, 200, "Xist"),
        ("chr2", 50, 150, "Uty"),
        ("NW_123", 10, 20, "Sry"),       # scaffold → dropped (FIL6)
        ("scaffold_9", 1, 2, "Ddx3y"),   # not ^chr → dropped
        ("chr1", 10, 20, "NoTPM"),       # no TPM match → inner-join drop
    ]
    return spark.createDataFrame(rows, ["chrom", "start", "end", "name"])


def _tpm(spark):
    rows = [("s1", "Xist", 0.4, 1.0), ("s1", "Uty", 500.0, 1.0),
            ("s1", "Sry", 5.0, 1.0), ("s1", "Ddx3y", 2000.0, 1.0),
            ("s1", "ZeroGene", 0.0, 1.0)]
    return spark.createDataFrame(
        rows, ["sample", "feature_id", "TPM", "expected_count"])


def test_bed9_filters_buckets_and_sort(spark):
    out = tpm_bed9(_bed(spark), _tpm(spark)).collect()
    names = [r["name"] for r in out]
    # sorted (chrom,start,end): chr1 before chr2; scaffolds and no-match gone
    assert names == ["Xist", "Uty"]
    rgb = {r["name"]: r["itemRgb"] for r in out}
    assert rgb["Xist"] == RGB_GRAY          # 0.4 ≤ 0.5
    assert rgb["Uty"] == RGB_BLUE           # 500 ≤ 1000
    row = {r["name"]: r for r in out}
    assert row["Xist"]["strand"] == "."
    assert row["Xist"]["thickStart"] == 100
    assert row["Uty"]["score"] == 500.0     # score = TPM verbatim


def test_rgb_bucket_boundaries(spark):
    tpm = spark.createDataFrame(
        [("s1", "A", 0.5, 1.0), ("s1", "B", 10.0, 1.0),
         ("s1", "C", 1000.0, 1.0), ("s1", "D", 1000.01, 1.0)],
        ["sample", "feature_id", "TPM", "expected_count"])
    bed = spark.createDataFrame(
        [("chr1", i, i + 1, n) for i, n in enumerate("ABCD")],
        ["chrom", "start", "end", "name"])
    rgb = {r["name"]: r["itemRgb"] for r in tpm_bed9(bed, tpm).collect()}
    # boundaries are inclusive (≤), GeneTPMbed_v2.sh:52-63
    assert rgb == {"A": RGB_GRAY, "B": RGB_LIGHT_BLUE,
                   "C": RGB_BLUE, "D": RGB_DARK_BLUE}


def test_palette_cycles_deterministically(spark):
    rows = [(f"T{i:02d}", f"Strain{i},extra", "M", "c  c") for i in range(12)]
    tracks = spark.createDataFrame(
        rows, ["Tissue", "Strain", "Sex", "Sample_characteristics"])
    out = assign_track_colors(tracks, palette_size=10)
    got = {r["Tissue"]: r["palette_idx"] for r in out.collect()}
    # 12 distinct combos cycle mod 10 in sorted first-appearance order
    assert got["T00"] == 0 and got["T09"] == 9
    assert got["T10"] == 0 and got["T11"] == 1
    # strain truncated at comma + whitespace collapsed feed the key (F8)
    one = out.filter("Tissue = 'T00'").collect()[0]
    assert one["strain_key"] == "Strain0"
    assert one["chars_key"] == "c c"
