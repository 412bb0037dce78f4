"""M2 — AccList processing: dedup, PASS filtering, run→sample grouping.

Reproduces the controller's sample bookkeeping
(``scripts/run_RNApipeline_pairedG8_diskGuard.bash``):
- drop rows with empty geo_accession (FIL1, ``:262``)
- dedup to one row per GSM keeping the lexicographically-first Run
  (AGG4 ``sort -u -t$'\\t' -k2,2``, ``:362-366``) — pinned deterministic
- PASS semi-join against the STARQC report (JN1, ``:429-431``)
- PASS/FAIL/total stats + zero-PASS abort (AGG5, ``:434-449``)
- per-sample run grouping: all runs, first metadata (AGG2/AGG3, ``:281-290``)
- ``unique_name = Tissue_Strain_Sex_GSM`` (PRJ3/F1, ``:286``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.relational import (
    collect_group_list, dedup_keep_first, first_per_group, semi_join_filter)


class ZeroPassError(RuntimeError):
    """The reference aborts when no sample passes QC (``run_RNApipeline:445-449``)."""


def clean_acclist(acclist: DataFrame) -> DataFrame:
    """FIL1 — drop empty/null geo_accession rows."""
    return acclist.filter(
        F.col("geo_accession").isNotNull() & (F.col("geo_accession") != ""))


def unique_acclist(acclist: DataFrame) -> DataFrame:
    """AGG4 — one row per GSM, keeping the lexicographically-first Run."""
    return dedup_keep_first(clean_acclist(acclist),
                            ["geo_accession"], ["Run"])


def pass_filter(unique_acc: DataFrame, starqc: DataFrame) -> DataFrame:
    """JN1 — keep samples whose STARQC Status is PASS; abort on zero."""
    pass_ids = (starqc.filter(F.col("Status") == "PASS")
                .select(F.col("SampleID").alias("geo_accession")))
    out = semi_join_filter(unique_acc, pass_ids, "geo_accession")
    if out.limit(1).count() == 0:
        raise ZeroPassError("no samples passed STAR QC")
    return out


def qc_stats(starqc: DataFrame) -> DataFrame:
    """AGG5 — per-status counts (the reference's wc-l arithmetic)."""
    return starqc.groupBy("Status").agg(F.count("*").alias("n")).orderBy("Status")


def sample_groups(acclist: DataFrame) -> DataFrame:
    """AGG2 + AGG3 + PRJ3 — per-GSM run list, first metadata, unique_name."""
    cleaned = clean_acclist(acclist)
    runs = collect_group_list(cleaned, "geo_accession", "Run", alias="runs")
    meta = first_per_group(cleaned, "geo_accession", "Run",
                           ["Tissue", "Strain", "Sex"])
    return (meta.join(runs, "geo_accession")
            .withColumn("unique_name",
                        F.concat_ws("_", "Tissue", "Strain", "Sex",
                                    "geo_accession")))
