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


def chrom_sizes(cov: DataFrame, bin_size: int = 10,
                genome_sizes: DataFrame | None = None) -> DataFrame:
    """UCSC chrom.sizes for the coverage's contigs.

    ``genome_sizes`` (chrom, size) — e.g. BAM-header genome bounds read via
    :func:`read_chrom_sizes`, shared across all samples — is the fidelity
    path: the reference's bamCoverage emits BigWigs sized by the BAM
    header, so per-sample coverage-derived bounds would understate real
    chromosome lengths and differ sample-to-sample in a genome browser.
    When absent, fall back to the per-chrom max bin end from the coverage
    itself (always valid for bedGraphToBigWig). With genome sizes present
    the result is ``greatest(genome, coverage)`` per contig — an interval
    past the declared genome bound would make bedGraphToBigWig reject the
    file, and a contig absent from the sizes table keeps its
    coverage-derived bound. Tiny aggregate (one row per contig)."""
    derived = (cov.groupBy("chrom")
               .agg((F.max("bin_start") + bin_size).cast("long")
                    .alias("_cov_size")))
    if genome_sizes is None:
        return (derived.select("chrom",
                               F.col("_cov_size").alias("size"))
                .orderBy("chrom"))
    g = genome_sizes.select("chrom", F.col("size").cast("long")
                            .alias("_genome_size"))
    return (derived.join(F.broadcast(g), "chrom", "left")
            .select("chrom",
                    F.greatest(F.coalesce("_genome_size", "_cov_size"),
                               "_cov_size").alias("size"))
            .orderBy("chrom"))


def read_chrom_sizes(spark, path: str) -> DataFrame:
    """Read a UCSC two-column ``chrom.sizes`` file (chrom, size) — the
    shared genome bounds handed to every sample's BigWig sink."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType
    schema = StructType([StructField("chrom", StringType()),
                         StructField("size", LongType())])
    return spark.read.option("sep", "\t").schema(schema).csv(path)


def bigwig_commands(bedgraph_path: str, sizes_path: str,
                    bw_path: str) -> list[list[str]]:
    """The binary post-step argv, caller-executed when
    ``bedGraphToBigWig`` (UCSC tools) is on PATH."""
    return [["bedGraphToBigWig", bedgraph_path, sizes_path, bw_path]]


def write_bigwig_track(cov: DataFrame, dir_path: str,
                       name: str = "coverage",
                       bin_size: int = 10,
                       value_col: str = "bpm",
                       genome_sizes: DataFrame | None = None,
                       ) -> list[list[str]]:
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
    sizes = chrom_sizes(cov, bin_size, genome_sizes=genome_sizes)
    with open(sizes_path, "w") as fh:
        for r in sizes.collect():  # one row/contig
            fh.write(f"{r['chrom']}\t{r['size']}\n")
    return bigwig_commands(bg_path, sizes_path,
                           os.path.join(dir_path, f"{name}.bw"))
