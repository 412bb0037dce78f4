"""Interval (range) joins — the natural extension for coverage × annotation
(SURVEY §2.3 "not present"; D9/D11 data model).

Spark has no native interval join; a naive theta-join is quadratic. Two
strategies, by build-side size:

- small dimension of ranges → broadcast + non-equi predicate (Catalyst
  plans BroadcastNestedLoopJoin over the tiny side — optimal);
- big × big → **binning**: explode each interval into fixed-width genomic
  bins, equi-join on (chrom, bin) — co-partitioned, shuffle only on bin
  keys — then filter to true overlap and dedupe. Bin width trades fanout
  (len/width per row) against per-bin collision count; 10–100× the median
  interval length is a good default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlaps() -> "F.Column":
    """Half-open overlap predicate [start, end) for aliased tables a, b."""
    return (F.col("a.start") < F.col("b.end")) & (F.col("b.start") < F.col("a.end"))


def interval_join_broadcast(big: DataFrame, small_ranges: DataFrame) -> DataFrame:
    """Annotate a big interval/point table against a SMALL range dim:
    broadcast + range predicate (no shuffle of the big side)."""
    a, b = big.alias("a"), F.broadcast(small_ranges).alias("b")
    return a.join(b, (F.col("a.chrom") == F.col("b.chrom")) & overlaps())


def interval_join_binned(left: DataFrame, right: DataFrame,
                         bin_width: int = 10_000) -> DataFrame:
    """Big × big interval overlap join via bin explosion.

    Inputs need (chrom, start, end) plus any payload; output is one row
    per truly-overlapping pair (deduped — an overlap spanning k shared
    bins is emitted once). Both sides shuffle once, on (chrom, bin).
    """
    def binned(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.struct(*[F.col(c) for c in df.columns]).alias(side),
            F.col("chrom").alias(f"_chrom_{side}"),
            F.explode(F.sequence(
                F.floor(F.col("start") / bin_width),
                F.floor((F.col("end") - 1) / bin_width))).alias(f"_bin_{side}"))

    lb = binned(left, "a")
    rb = binned(right, "b")
    joined = lb.join(rb, (F.col("_chrom_a") == F.col("_chrom_b"))
                     & (F.col("_bin_a") == F.col("_bin_b")))
    true_overlap = ((F.col("a.start") < F.col("b.end"))
                    & (F.col("b.start") < F.col("a.end")))
    # emit each pair once: only in the first shared bin
    first_shared = F.greatest(F.floor(F.col("a.start") / bin_width),
                              F.floor(F.col("b.start") / bin_width))
    return (joined.filter(true_overlap & (F.col("_bin_a") == first_shared))
            .select("a.*", *[F.col(f"b.{c}").alias(f"b_{c}")
                             for c in right.columns]))


def coverage_annotation(coverage_bins: DataFrame,
                        annotation: DataFrame) -> DataFrame:
    """Domain form: (chrom, bin-start coverage rows) × gene annotation BED —
    per-gene mean coverage (bamCoverage output ⋈ D9, the join the reference
    never materializes but its BigWig + BED outputs imply)."""
    cov = coverage_bins.select(
        "chrom", F.col("bin_start").alias("start"),
        (F.col("bin_start") + F.col("bin_width")).alias("end"), "depth")
    ann = annotation.select("chrom", "start", "end", "name")
    j = interval_join_binned(cov, ann)
    return (j.groupBy(F.col("b_name").alias("name"))
            .agg(F.round(F.avg("depth"), 4).alias("mean_depth"),
                 F.count("*").alias("n_bins")))
