"""AGG7/SNK7 — native binned genome coverage (the bamCoverage replacement).

Reference: ``bamCoverage --binSize 10 --normalizeUsing BPM
--minMappingQuality 255`` (``scripts/STAR_bigwig2.sh:245-251``) produces
per-sample BigWig. The engine computes the same statistic relationally
from an alignment table (FIXTURES.md §10 shape): MAPQ filter → per-bin
read-start counts expanded over the read span → BPM normalization
(bins-per-million: bin count × 1e6 / Σ per-sample counts).

Scale: one explode (read → touched bins, ~read_len/bin_size rows) and one
aggregation; the per-sample totals reuse the aggregated counts (tiny)
via a broadcast join, not a second pass over the alignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_coverage(alignments: DataFrame, bin_size: int = 10,
                    min_mapq: int = 255) -> DataFrame:
    """(sample, chrom, pos, read_len, mapq) → (sample, chrom, bin_start,
    depth, bpm).

    ``depth`` counts reads overlapping the bin (a read spanning k bins
    contributes to each, matching bamCoverage's coverage semantics);
    ``bpm`` is the bins-per-million normalization.
    """
    reads = alignments.filter(F.col("mapq") >= min_mapq)
    first_bin = F.floor(F.col("pos") / bin_size)
    last_bin = F.floor((F.col("pos") + F.col("read_len") - 1) / bin_size)
    binned = reads.select(
        "sample", "chrom",
        F.explode(F.sequence(first_bin, last_bin)).alias("bin"))
    counts = (binned.groupBy("sample", "chrom", "bin")
              .agg(F.count("*").alias("depth")))
    totals = counts.groupBy("sample").agg(F.sum("depth").alias("_total"))
    return (counts.join(F.broadcast(totals), "sample")
            .select("sample", "chrom",
                    (F.col("bin") * bin_size).alias("bin_start"),
                    "depth",
                    F.round(F.col("depth") * 1e6 / F.col("_total"), 4)
                    .alias("bpm")))
