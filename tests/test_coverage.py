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


def test_bedgraph_and_chrom_sizes_sink(spark, tmp_path):
    """write_bigwig_track: sorted bedGraph + chrom.sizes on disk, and
    the returned argv is the bedGraphToBigWig contract."""
    from rgd_rnaseq_workflows_spark.sources.bigwig import write_bigwig_track
    rows = [("s1", "chr1", 5, 10, 255), ("s1", "chr1", 12, 5, 255),
            ("s1", "chr2", 0, 10, 255)]
    cov = binned_coverage(
        spark.createDataFrame(
            rows, ["sample", "chrom", "pos", "read_len", "mapq"]),
        bin_size=10).drop("sample")
    d = str(tmp_path / "trk")
    cmds = write_bigwig_track(cov, d, name="t", bin_size=10)
    assert cmds == [["bedGraphToBigWig", f"{d}/t.bedGraph",
                     f"{d}/chrom.sizes", f"{d}/t.bw"]]
    lines = open(f"{d}/t.bedGraph").read().splitlines()
    recs = [ln.split("\t") for ln in lines]
    # genomic order, half-open 10-wide intervals
    assert [(r[0], int(r[1]), int(r[2])) for r in recs] == [
        ("chr1", 0, 10), ("chr1", 10, 20), ("chr2", 0, 10)]
    sizes = dict(ln.split("\t") for ln in
                 open(f"{d}/chrom.sizes").read().splitlines())
    assert sizes == {"chr1": "20", "chr2": "10"}


def test_genome_chrom_sizes_override(spark, tmp_path):
    """chrom.sizes fidelity (ADVICE r5): a shared genome sizes table
    overrides the per-sample coverage-derived bound, contigs missing
    from it fall back, and a genome bound BELOW the coverage is raised
    to keep bedGraphToBigWig valid."""
    from rgd_rnaseq_workflows_spark.sources.bigwig import (
        chrom_sizes, read_chrom_sizes, write_bigwig_track)
    rows = [("s1", "chr1", 5, 10, 255),          # cov bound chr1 = 20
            ("s1", "chr2", 0, 10, 255),          # cov bound chr2 = 10
            ("s1", "chrUn", 95, 10, 255)]        # cov bound chrUn = 110
    cov = binned_coverage(
        spark.createDataFrame(
            rows, ["sample", "chrom", "pos", "read_len", "mapq"]),
        bin_size=10).drop("sample")
    sizes_file = str(tmp_path / "genome.chrom.sizes")
    with open(sizes_file, "w") as fh:
        # chr1 real length 248956422; chr2 UNDERSTATED (5 < 10);
        # chrUn absent entirely
        fh.write("chr1\t248956422\nchr2\t5\n")
    genome = read_chrom_sizes(spark, sizes_file)
    got = {r["chrom"]: r["size"]
           for r in chrom_sizes(cov, 10, genome_sizes=genome).collect()}
    assert got == {"chr1": 248956422,  # genome bound wins
                   "chr2": 10,         # understated genome raised to cov
                   "chrUn": 110}       # fallback: coverage-derived
    # identical per-sample output through the sink
    d = str(tmp_path / "trk")
    write_bigwig_track(cov, d, name="t", bin_size=10, genome_sizes=genome)
    sizes = dict(ln.split("\t") for ln in
                 open(f"{d}/chrom.sizes").read().splitlines())
    assert sizes == {"chr1": "248956422", "chr2": "10", "chrUn": "110"}


def test_bigwig_encoding_tool_gated(spark, tmp_path):
    """When UCSC bedGraphToBigWig is installed, the emitted commands
    produce a real .bw (header magic checked); skipped otherwise."""
    import shutil
    import struct
    import subprocess

    import pytest
    if not shutil.which("bedGraphToBigWig"):
        pytest.skip("bedGraphToBigWig not on PATH")
    from rgd_rnaseq_workflows_spark.sources.bigwig import (
        BIGWIG_MAGIC, write_bigwig_track)
    rows = [("s1", "chr1", 5, 10, 255)]
    cov = binned_coverage(
        spark.createDataFrame(
            rows, ["sample", "chrom", "pos", "read_len", "mapq"]),
        bin_size=10).drop("sample")
    d = str(tmp_path / "trk")
    for cmd in write_bigwig_track(cov, d, name="t", bin_size=10):
        subprocess.run(cmd, check=True)
    with open(f"{d}/t.bw", "rb") as fh:
        magic = struct.unpack("<I", fh.read(4))[0]
    assert magic == BIGWIG_MAGIC
