"""SNK8 — directory-tree QC aggregation (MultiQC step).

Fixture models the pipeline scratch dir MultiQC is pointed at
(run_SRA2QC_diskGuard.bash:160): per-sample subdirs with STAR logs,
samtools stats, idxstats, RSEM gene tables; one sample is missing the
samtools log to exercise the full-outer general-stats join.
"""

from __future__ import annotations

import glob
import os

from rgd_rnaseq_workflows_spark.plans.multiqc import (
    aggregate_qc_tree, discover_modules, general_stats,
    write_multiqc_report)

STAR_LOG = """\
                                 Started job on |	Feb 13 04:00:00
                          Number of input reads |	{reads}
                   Uniquely mapped reads number |	{uniq}
                        Uniquely mapped reads % |	{pct}%
"""

SAMTOOLS = """\
# This file was produced by samtools stats
SN\traw total sequences:\t{total}
SN\treads mapped:\t{mapped}
SN\terror rate:\t{err}
"""

RSEM_HEADER = ("gene_id\ttranscript_id(s)\tlength\teffective_length\t"
               "expected_count\tTPM\tFPKM\n")


def _build_tree(root):
    for sample, reads, uniq, pct in [("GSM1", "1,000,000", "900,000", "90.00"),
                                     ("GSM2", "2,000,000", "1,000,000", "50.00")]:
        d = os.path.join(root, sample)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "Log.final.out"), "w") as f:
            f.write(STAR_LOG.format(reads=reads, uniq=uniq, pct=pct))
        with open(os.path.join(d, f"{sample}.idxstats"), "w") as f:
            f.write("chr1\t1000\t800\t10\nchrX\t500\t100\t5\n")
        with open(os.path.join(d, f"{sample}.genes.results"), "w") as f:
            f.write(RSEM_HEADER)
            f.write(f"g1\tt1\t100\t80\t5.0\t1.5\t2.0\n")
            f.write(f"g2\tt2\t100\t80\t0.0\t0.0\t0.0\n")
    # samtools stats only for GSM1 — GSM2 must still appear in general stats
    with open(os.path.join(root, "GSM1", "GSM1.stats"), "w") as f:
        f.write(SAMTOOLS.format(total="1000000", mapped="950000",
                                err="1.5e-03"))


def test_discover_and_general_stats(spark, tmp_out):
    _build_tree(tmp_out)
    found = discover_modules(tmp_out)
    assert {m for m, paths in found.items() if paths} == {
        "star", "samtools_stats", "idxstats", "rsem"}
    assert len(found["star"]) == 2

    modules = aggregate_qc_tree(spark, tmp_out)
    gen = general_stats(modules)
    rows = {r["sample"]: r for r in gen.collect()}
    assert set(rows) == {"GSM1", "GSM2"}

    # STAR metrics: comma-grouping stripped, % suffix parsed
    assert rows["GSM1"]["input_reads"] == 1_000_000
    assert rows["GSM1"]["uniquely_mapped"] == 900_000
    assert rows["GSM2"]["uniquely_mapped_pct"] == 50.0

    # samtools present only for GSM1; GSM2 keeps its row with NULLs
    assert rows["GSM1"]["reads_mapped_pct"] == 95.0
    assert rows["GSM1"]["error_rate"] == 0.0015
    assert rows["GSM2"]["total_sequences"] is None

    # idxstats totals sum the per-chromosome rows
    assert rows["GSM2"]["mapped_total"] == 900
    assert rows["GSM2"]["unmapped_total"] == 15

    # RSEM: genes_detected counts expected_count > 0
    assert rows["GSM1"]["genes_total"] == 2
    assert rows["GSM1"]["genes_detected"] == 1


def test_deep_tree_discovery(spark, tmp_out):
    # MultiQC walks arbitrary depth; Hadoop globs don't recurse, so the
    # module readers must get the discovered FILE LIST, not the pattern
    d = os.path.join(tmp_out, "scratch", "SRR1", "star_out")
    os.makedirs(d)
    with open(os.path.join(d, "Log.final.out"), "w") as f:
        f.write(STAR_LOG.format(reads="100", uniq="90", pct="90.00"))
    modules = aggregate_qc_tree(spark, tmp_out)
    rows = modules["star"].collect()
    assert len(rows) == 1 and rows[0]["input_reads"] == 100


def test_missing_module_is_skipped(spark, tmp_out):
    # a tree with only STAR logs: the other modules are absent, not errors
    d = os.path.join(tmp_out, "GSM9")
    os.makedirs(d)
    with open(os.path.join(d, "Log.final.out"), "w") as f:
        f.write(STAR_LOG.format(reads="10", uniq="5", pct="50.00"))
    modules = aggregate_qc_tree(spark, tmp_out)
    assert set(modules) == {"star"}
    gen = general_stats(modules)
    assert [r["sample"] for r in gen.collect()] == ["GSM9"]


def test_report_sink_files(spark, tmp_out):
    _build_tree(tmp_out)
    out = os.path.join(tmp_out, "report_out")
    html_path = write_multiqc_report(spark, tmp_out, out, "PRJNA000")

    # reference naming: ${BIOProjectID}_..._multiQC_report(.html) + data dir
    assert html_path.endswith("PRJNA000_multiQC_report.html")
    html = open(html_path).read()
    assert "GSM1" in html and "GSM2" in html
    assert "PRJNA000" in html

    data_dir = os.path.join(out, "PRJNA000_multiQC_report_data")
    gen_parts = glob.glob(
        os.path.join(data_dir, "multiqc_general_stats.txt", "part-*"))
    assert len(gen_parts) == 1  # single_file sink
    lines = open(gen_parts[0]).read().strip().split("\n")
    assert lines[0].startswith("sample\t")
    assert len(lines) == 3  # header + 2 samples
    for mod in ["star", "samtools_stats", "idxstats", "rsem"]:
        assert glob.glob(os.path.join(data_dir, f"multiqc_{mod}.txt",
                                      "part-*")), mod
