"""SNK8 — directory-tree QC aggregation (MultiQC step).

Fixture models the pipeline scratch dir MultiQC is pointed at
(run_SRA2QC_diskGuard.bash:160): per-sample subdirs with STAR logs,
samtools stats, idxstats, RSEM gene tables; one sample is missing the
samtools log to exercise the full-outer general-stats join.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest

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


FIXTURE_TREE = os.path.join(os.path.dirname(__file__), "fixtures",
                            "multiqc_tree")
GOLDEN_TSV = os.path.join(os.path.dirname(__file__), "fixtures",
                          "multiqc_general_stats.golden.tsv")


def test_mixed_tool_tree_matches_golden(spark, tmp_out):
    """Parity-depth golden: a realistic mixed-tool scratch tree (full
    STAR Log.final.out, full samtools-stats SN section, RSEM gene
    tables, idxstats; GSM_B lacks samtools, GSM_C lacks idxstats+RSEM)
    must reproduce the checked-in general-stats TSV byte-for-byte.
    Every golden value is independently recomputed here from the raw
    fixture numbers with MultiQC's published general-stats formulas
    (reads_mapped_pct = mapped*100/total, error rate = mismatches /
    bases mapped (cigar)), so the golden is anchored to the raw logs,
    not to our own code."""
    out = os.path.join(tmp_out, "mq")
    write_multiqc_report(spark, FIXTURE_TREE, out, "PRJG")
    [part] = glob.glob(os.path.join(
        out, "PRJG_multiQC_report_data/multiqc_general_stats.txt",
        "part-*"))
    assert open(part).read() == open(GOLDEN_TSV).read()

    # independent re-derivation from the raw fixture logs
    rows = {ln.split("\t")[0]: ln.split("\t")
            for ln in open(GOLDEN_TSV).read().rstrip("\n").split("\n")[1:]}
    # GSM_A samtools: mapped 40739400 of 41423455 raw sequences
    assert rows["GSM_A"][6] == str(round(40739400 * 100 / 41423455, 2))
    # GSM_A error rate as samtools computes it (printed %e, parsed back)
    assert rows["GSM_A"][7] == str(float(f"{10748957 / 4073940000:e}"))
    # GSM_A idxstats totals incl. the `*` unmapped bucket
    assert rows["GSM_A"][8] == str(9000321 + 8123456 + 2000111 + 15000)
    assert rows["GSM_A"][9] == str(4021 + 3777 + 901 + 44 + 77)
    # GSM_B: no samtools log -> empty cells, other modules intact
    assert rows["GSM_B"][4:8] == ["", "", "", ""]
    assert rows["GSM_B"][10:12] == ["3", "1"]
    # GSM_C: STAR + samtools only; idxstats/RSEM cells empty
    assert rows["GSM_C"][6] == str(round(4900000 * 100 / 5000000, 2))
    assert rows["GSM_C"][8:12] == ["", "", "", ""]


@pytest.mark.skipif(shutil.which("multiqc") is None,
                    reason="multiqc not installed")
def test_general_stats_matches_real_multiqc(tmp_out, spark):
    """When real MultiQC is available, its own general_stats TSV for the
    same tree must agree with ours on the shared metrics."""
    import csv
    import subprocess
    mq_out = os.path.join(tmp_out, "real_mq")
    subprocess.run(["multiqc", FIXTURE_TREE, "-o", mq_out, "-n", "report"],
                   check=True, capture_output=True)
    [tsv] = glob.glob(os.path.join(mq_out, "report_data",
                                   "multiqc_general_stats.txt"))
    theirs = {r["Sample"]: r for r in
              csv.DictReader(open(tsv), delimiter="\t")}
    ours = {ln.split("\t")[0]: ln.split("\t")
            for ln in open(GOLDEN_TSV).read().rstrip("\n").split("\n")[1:]}
    for sample, row in ours.items():
        their = theirs[sample]
        uniq_pct = next((v for k, v in their.items()
                         if k.endswith("uniquely_mapped_percent")), None)
        if uniq_pct:
            assert abs(float(uniq_pct) - float(row[3])) < 0.01
        err = next((v for k, v in their.items()
                    if k.endswith("error_rate")), None)
        if err and row[7]:
            assert abs(float(err) - float(row[7]) * 100) < 1e-6
