"""Serve-ready coverage tracks: bedGraph sink + bedGraphToBigWig bridge.

Reference: ``scripts/STAR_bigwig2.sh:245-251`` runs bamCoverage straight
to BigWig for JBrowse serving. The engine computes the identical binned
BPM statistic relationally (``operators/coverage.binned_coverage`` —
AGG7/SNK7, oracle-checked), and this module closes the last
"user runs a binary by hand" gap: it writes the coverage as a sorted
single-file bedGraph plus the UCSC ``chrom.sizes`` file, and returns the
``bedGraphToBigWig`` argv to execute where the tool is installed — the
same tool-gated contract the bgzip/tabix BED sink uses (SNK5,
``sources/bed.py``). The binary BigWig container encoding itself stays
outside the relational engine (SURVEY §1 D11).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIGWIG_MAGIC = 0x888FFC26  # little-endian header magic of a .bw file


def coverage_to_bedgraph(cov: DataFrame, bin_size: int = 10,
                         value_col: str = "bpm") -> DataFrame:
    """Binned coverage (chrom, bin_start, value) → bedGraph intervals
    (chrom, start, end, value), genomic order. One projection + the
    sort — no shuffle beyond the range partitioning the sink needs."""
    return (cov.select(
        F.col("chrom"),
        F.col("bin_start").cast("long").alias("start"),
        (F.col("bin_start") + bin_size).cast("long").alias("end"),
        F.col(value_col).alias("value"))
        .orderBy("chrom", "start"))


def chrom_sizes(cov: DataFrame, bin_size: int = 10) -> DataFrame:
    """UCSC chrom.sizes from the coverage itself: per-chrom max bin end.
    Tiny aggregate (one row per contig) — bedGraphToBigWig requires
    every interval to fit its chrom bound."""
    return (cov.groupBy("chrom")
            .agg((F.max("bin_start") + bin_size).cast("long").alias("size"))
            .orderBy("chrom"))


def bigwig_commands(bedgraph_path: str, sizes_path: str,
                    bw_path: str) -> list[list[str]]:
    """The binary post-step argv, caller-executed when
    ``bedGraphToBigWig`` (UCSC tools) is on PATH."""
    return [["bedGraphToBigWig", bedgraph_path, sizes_path, bw_path]]


def write_bigwig_track(cov: DataFrame, dir_path: str,
                       name: str = "coverage",
                       bin_size: int = 10,
                       value_col: str = "bpm") -> list[list[str]]:
    """Write ``<dir>/<name>.bedGraph`` + ``<dir>/chrom.sizes`` from a
    ``binned_coverage`` frame and return the bedGraphToBigWig argv that
    produces ``<dir>/<name>.bw`` — mirroring ``write_indexed_bed``'s
    sink-plus-commands contract."""
    from rgd_rnaseq_workflows_spark.sources.tsv import promote_single_part
    os.makedirs(dir_path, exist_ok=True)
    bg_dir = os.path.join(dir_path, "_bedgraph_parts")
    (coverage_to_bedgraph(cov, bin_size, value_col).coalesce(1)
     .write.mode("overwrite").option("sep", "\t").csv(bg_dir))
    bg_path = promote_single_part(
        bg_dir, os.path.join(dir_path, f"{name}.bedGraph"), cleanup=True)
    sizes_path = os.path.join(dir_path, "chrom.sizes")
    with open(sizes_path, "w") as fh:
        for r in chrom_sizes(cov, bin_size).collect():  # one row/contig
            fh.write(f"{r['chrom']}\t{r['size']}\n")
    return bigwig_commands(bg_path, sizes_path,
                           os.path.join(dir_path, f"{name}.bw"))
