"""F18 — fragment stats extraction (SE pipeline path)."""

from __future__ import annotations

import os

from rgd_rnaseq_workflows_spark.sources.samtools_stats import (
    fragment_stats, read_samtools_stats)

STATS = """\
# This file was produced by samtools stats
SN\traw total sequences:\t1000000
SN\taverage length:\t{mean}
SN\tinsert size average:\t0.0
SN\tinsert size standard deviation:\t{sd}
"""


def test_fragment_stats_and_nan_guard(spark, tmp_out):
    with open(os.path.join(tmp_out, "GSM1.stats"), "w") as f:
        f.write(STATS.format(mean="101.5", sd="12.25"))
    with open(os.path.join(tmp_out, "GSM2.stats"), "w") as f:
        f.write(STATS.format(mean="nan", sd="0.0"))
    kv = read_samtools_stats(spark, f"{tmp_out}/*.stats")
    out = {r["sample"]: r for r in fragment_stats(kv).collect()}
    assert out["GSM1"]["fragment_mean"] == 101.5
    assert out["GSM1"]["fragment_sd"] == 12.25
    assert out["GSM1"]["valid"]
    # the reference exits 1 on nan (RSEM_SE_v1.sh:110-114); we flag it
    assert not out["GSM2"]["valid"]
