"""Native binned coverage (AGG7) — bamCoverage semantics."""

from __future__ import annotations

from rgd_rnaseq_workflows_spark.operators.coverage import binned_coverage


def test_binned_coverage_spans_and_normalizes(spark):
    rows = [
        # read spanning bins 0 and 1 (pos 5, len 10 → 5..14)
        ("s1", "chr1", 5, 10, 255),
        # read inside bin 1
        ("s1", "chr1", 12, 5, 255),
        # low-MAPQ read filtered out (FIL10)
        ("s1", "chr1", 0, 10, 10),
        # second sample normalizes independently
        ("s2", "chr1", 0, 10, 255),
    ]
    df = spark.createDataFrame(
        rows, ["sample", "chrom", "pos", "read_len", "mapq"])
    out = {(r["sample"], r["bin_start"]): r
           for r in binned_coverage(df, bin_size=10).collect()}

    assert out[("s1", 0)]["depth"] == 1
    assert out[("s1", 10)]["depth"] == 2        # spanning read + inner read
    assert ("s1", 20) not in out                # nothing reaches bin 2
    # BPM: s1 total = 3 → bin 10 gets 2e6/3
    assert out[("s1", 10)]["bpm"] == round(2e6 / 3, 4)
    # s2: single bin holds its full million
    assert out[("s2", 0)]["bpm"] == 1000000.0
    # low-MAPQ read contributed nothing
    assert out[("s1", 0)]["depth"] + out[("s1", 10)]["depth"] == 3
