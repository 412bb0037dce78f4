"""SRC9 — FASTQ layout detection and PE/SE routing.

Reproduces the reference's typed-exit-code routing contract
(``scripts/SRA2QC_production.sh:207-249``: ``{run}_1.fastq`` AND
``{run}_2.fastq`` present → paired-end; bare ``{run}.fastq`` only →
single-end, **exit 2** — a routing signal, not a failure; neither →
failure, exit 1 after retries. The SE pipeline mirrors the rejection in
the other direction, ``RGD_Illumina_SingleEnd_RNAseq_pipeline/
SRA2QC_SE_v1.sh:166-179``).

Spark-first shape: the classification is a relational operator over a
file-inventory DataFrame — one ``groupBy(run)`` with boolean aggregates,
then a filter-dispatch into per-layout subsets that downstream plans
consume (the PE plan joins the ``PE`` subset, the SE plan the ``SE``
subset with fragment stats from ``sources.samtools_stats``). At 100 TB
the inventory is millions of paths, still a trivial shuffle of
(run, flags) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIRED_END = "PE"
SINGLE_END = "SE"
FAILED = "failed"

# {run}_1.fastq[.gz] / {run}_2.fastq[.gz] / {run}.fastq[.gz]
_MATE_RE = r"([^/_]+?)(_([12]))?\.fastq(\.gz)?$"


def inventory_from_paths(spark: SparkSession, paths: list[str]) -> DataFrame:
    """A file inventory DataFrame from plain path strings (driver glob,
    object-store listing, or ``input_file_name()`` output)."""
    return spark.createDataFrame([(p,) for p in paths], "path string")


def classify_layout(inventory: DataFrame,
                    path_col: str = "path") -> DataFrame:
    """(path) inventory → one row per run: ``(run, layout)`` with layout ∈
    {PE, SE, failed} under the reference's detection rules
    (``SRA2QC_production.sh:207-249``).

    A paired run with an unpaired-remainder bare FASTQ is still PE (the
    reference renames the remainder and proceeds, ``:218-224``).
    """
    m = F.regexp_extract(F.col(path_col), _MATE_RE, 1)
    mate = F.regexp_extract(F.col(path_col), _MATE_RE, 3)
    parsed = (inventory
              .withColumn("run", m)
              .withColumn("mate", mate)
              .filter(F.col("run") != ""))
    flags = parsed.groupBy("run").agg(
        F.max(F.col("mate") == "1").alias("has_1"),
        F.max(F.col("mate") == "2").alias("has_2"),
        F.max(F.col("mate") == "").alias("has_bare"))
    layout = (F.when(F.col("has_1") & F.col("has_2"), PAIRED_END)
              .when(F.col("has_bare"), SINGLE_END)
              .otherwise(FAILED))         # lone _1 or _2 → incomplete pair
    return flags.select("run", layout.alias("layout"))


def route_by_layout(acclist: DataFrame, layouts: DataFrame,
                    run_col: str = "Run") -> dict[str, DataFrame]:
    """Filter-dispatch: split the AccList into per-layout subsets — the
    DataFrame form of the exit-code routing (exit 2 → SE pipeline, exit 1
    → failure report). Runs with no inventory row at all are ``failed``
    (the reference's post-hoc existence verification,
    ``SRA2QC_production.sh:134-147``)."""
    # no broadcast hint: a production inventory is millions of runs —
    # size-based planning (AQE) picks broadcast only when it actually fits
    keyed = layouts.withColumnRenamed("run", run_col)
    joined = acclist.join(keyed, run_col, "left")
    return {
        PAIRED_END: joined.filter(F.col("layout") == PAIRED_END)
                          .drop("layout"),
        SINGLE_END: joined.filter(F.col("layout") == SINGLE_END)
                          .drop("layout"),
        FAILED: joined.filter(F.col("layout").isNull()
                              | (F.col("layout") == FAILED)).drop("layout"),
    }
