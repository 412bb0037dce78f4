"""M6 — combine/merge workflow across processing strategies.

Reproduces ``utilities/combined_project_processing/
combine_multStrategy_Directories.bash``:
- SET1 union of sex-result tables with CRLF strip + blank-drop
  (``:135-152``) — headers are schema here, so union is `unionByName`
- JN3 matrix sort-merge joins on Symbol with row-loss warnings
  (``:242-256`` etc.) — the warning becomes anti-join count metrics
- SET2 duplicate-sample detection across directories (``:506-532``) —
  `intersect`
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.relational import merge_with_loss_metrics


def union_reports(a: DataFrame, b: DataFrame) -> DataFrame:
    """SET1 — union of two same-schema report tables; string columns get
    the reference's CRLF strip (F7) and fully-blank rows are dropped."""
    out = a.unionByName(b)
    for f in out.schema.fields:
        if f.dataType.simpleString() == "string":
            out = out.withColumn(f.name,
                                 F.regexp_replace(F.col(f.name), "\r$", ""))
    non_blank = None
    for c in out.columns:
        cond = F.col(c).isNotNull() & (F.col(c).cast("string") != "")
        non_blank = cond if non_blank is None else (non_blank | cond)
    return out.filter(non_blank)


def merge_matrices(m1: DataFrame, m2: DataFrame,
                   on: str = "Symbol"):
    """JN3 + AGG10 — inner join of two wide matrices on the feature key,
    with row-loss metrics exactly where the reference warns. The metrics
    are observe-backed: read ``metrics.get`` after acting on the merge
    (zero extra jobs)."""
    return merge_with_loss_metrics(m1, m2, on)


def duplicate_keys(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """SET2 — keys present in both inputs (``comm -12`` on sorted lists)."""
    return a.select(key).intersect(b.select(key))


def combine_projects(pe: dict[str, DataFrame],
                     se: dict[str, DataFrame]) -> tuple[dict[str, DataFrame], dict]:
    """Full combine_multStrategy parity: merge a paired-end and a
    single-end processing run of the same project.

    Inputs: dicts with keys among {"tpm", "counts", "tx_tpm", "tx_counts",
    "sex"} — the four matrices (wide, Symbol-keyed) and the sex table.
    Returns (merged outputs, metrics): matrices inner-joined on Symbol with
    row-loss counts (the reference's warnings, ``:242-256`` et al. —
    ``metrics["<key>_loss"].get`` after acting on ``out[<key>]``), sex
    tables unioned with CRLF/blank cleanup (``:135-152``), and the
    duplicate-sample check across the two runs (``:506-532``).
    """
    out: dict[str, DataFrame] = {}
    metrics: dict[str, object] = {}
    for key in ("tpm", "counts", "tx_tpm", "tx_counts"):
        if key in pe and key in se:
            merged, loss = merge_with_loss_metrics(pe[key], se[key], "Symbol")
            out[key] = merged
            metrics[f"{key}_loss"] = loss
    if "sex" in pe and "sex" in se:
        out["sex"] = union_reports(pe["sex"], se["sex"])
        dups = duplicate_keys(pe["sex"], se["sex"], "SampleID")
        metrics["duplicate_samples"] = [r["SampleID"] for r in dups.collect()]
    return out, metrics
