"""SNK8 — directory-tree QC aggregation (the MultiQC step).

The reference shells out to MultiQC twice — after fetch/QC
(``scripts/run_SRA2QC_diskGuard.bash:159-160``) and after matrix assembly
(``scripts/RSEMmatrix_v5.sh:126-128``): ``multiqc <scratchDir>`` walks the
tree, detects every known tool log, aggregates per-sample metrics, and
renders ``<project>_*_multiQC_report.html`` plus a ``_data`` directory of
TSV metric tables.

The engine form keeps detection + aggregation relational:

- one distributed text scan per tool family (the SRC3/F18 readers),
  discovered from the same directory-walk patterns MultiQC uses for this
  pipeline's tools (STAR ``Log.final.out``, samtools ``*.stats``,
  ``*.idxstats``, RSEM ``*.genes.results``);
- a general-stats table as one full-outer join keyed on sample — every
  sample appears even when a tool's log is missing (MultiQC's behavior);
- the data directory is the SNK1 TSV sink; the HTML render is driver-side
  over the final table (one row per sample — small by construction), like
  SNK4's session document.

At 100 TB the scans and joins are the distributed part; only the finished
general-stats table (rows = samples, thousands at most) reaches the driver
for rendering.
"""

from __future__ import annotations

import glob as _glob
import html as _html
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.sources.idxstats import read_idxstats
from rgd_rnaseq_workflows_spark.sources.rsem import read_rsem_results
from rgd_rnaseq_workflows_spark.sources.samtools_stats import read_samtools_stats
from rgd_rnaseq_workflows_spark.sources.star_log import (kv_long_to_wide,
                                                         read_star_logs)
from rgd_rnaseq_workflows_spark.sources.tsv import write_tsv

# MultiQC's module detection for the tools this pipeline produces, as
# (module, recursive glob) — the same filename contracts the readers use.
# Discovery uses Python's recursive ** (Hadoop globs are NOT recursive:
# `**` matches one segment there), and the discovered file LIST feeds the
# distributed readers, so detect and read can never disagree on a tree.
MODULE_GLOBS = {
    "star": "**/Log.final.out",
    "samtools_stats": "**/*.stats",
    "idxstats": "**/*.idxstats",
    "rsem": "**/*.genes.results",
}

K_INPUT = "Number of input reads"
K_UNIQ_N = "Uniquely mapped reads number"
K_UNIQ_PCT = "Uniquely mapped reads %"
STAR_KEYS = [K_INPUT, K_UNIQ_N, K_UNIQ_PCT]

SN_TOTAL = "raw total sequences"
SN_ERROR = "error rate"
SN_MAPPED = "reads mapped"


def discover_modules(root: str) -> dict[str, list[str]]:
    """Tool-family file lists under ``root`` (MultiQC's directory walk,
    ``run_SRA2QC_diskGuard.bash:160`` passes the whole scratch dir). A
    local-filesystem walk like MultiQC's own; the heavy reads stay
    distributed."""
    return {mod: sorted(_glob.glob(os.path.join(root, pat), recursive=True))
            for mod, pat in MODULE_GLOBS.items()}


def star_module(spark: SparkSession, paths: list[str]) -> DataFrame:
    """STAR summary metrics, one wide row per sample (module table +
    general-stats contribution: input reads, uniquely mapped count/%)."""
    kv = read_star_logs(spark, paths)
    wide = kv_long_to_wide(kv, STAR_KEYS)
    return wide.select(
        "sample",
        F.col(f"`{K_INPUT}`").cast("long").alias("input_reads"),
        F.col(f"`{K_UNIQ_N}`").cast("long").alias("uniquely_mapped"),
        F.regexp_replace(F.col(f"`{K_UNIQ_PCT}`"), "%$", "")
        .cast("double").alias("uniquely_mapped_pct"))


def samtools_module(spark: SparkSession, paths: list[str]) -> DataFrame:
    """samtools-stats SN metrics per sample (total sequences, mapped,
    mapped %, error rate)."""
    kv = read_samtools_stats(spark, paths)
    wide = (kv.filter(F.col("key").isin(SN_TOTAL, SN_ERROR, SN_MAPPED))
            .groupBy("sample")
            .pivot("key", [SN_TOTAL, SN_ERROR, SN_MAPPED])
            .agg(F.first("value")))
    total = F.col(f"`{SN_TOTAL}`").cast("long")
    mapped = F.col(f"`{SN_MAPPED}`").cast("long")
    return wide.select(
        "sample",
        total.alias("total_sequences"),
        mapped.alias("reads_mapped"),
        F.round(mapped * 100.0 / total, 2).alias("reads_mapped_pct"),
        F.col(f"`{SN_ERROR}`").cast("double").alias("error_rate"))


def idxstats_module(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-sample totals over the idxstats per-chromosome rows."""
    df = read_idxstats(spark, paths)
    return (df.groupBy("sample")
            .agg(F.sum("mapped").alias("mapped_total"),
                 F.sum("unmapped").alias("unmapped_total")))


def rsem_module(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Per-sample expression summary over the RSEM gene tables (genes
    detected = expected_count > 0, like MultiQC's RSEM alignability bar)."""
    df = read_rsem_results(spark, paths)
    return (df.groupBy("sample")
            .agg(F.count("*").alias("genes_total"),
                 F.sum((F.col("expected_count") > 0).cast("long"))
                 .alias("genes_detected")))


def general_stats(modules: dict[str, DataFrame]) -> DataFrame:
    """Full-outer join of the present module tables on ``sample`` — the
    MultiQC general-stats table: a sample missing one tool's log still
    gets a row, with NULLs in that module's columns."""
    out: DataFrame | None = None
    for mod in MODULE_GLOBS:           # deterministic column order
        df = modules.get(mod)
        if df is None:
            continue
        out = df if out is None else out.join(df, "sample", "full_outer")
    if out is None:
        raise ValueError("no QC modules discovered under the scan root")
    return out.orderBy("sample")


def aggregate_qc_tree(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    """MultiQC's walk+detect+parse as a dict of module tables for the tool
    logs actually present under ``root``."""
    present = discover_modules(root)
    builders = {"star": star_module, "samtools_stats": samtools_module,
                "idxstats": idxstats_module, "rsem": rsem_module}
    return {mod: builders[mod](spark, paths)
            for mod, paths in present.items() if paths}


def _render_html(project: str, header: list[str],
                 rows: list[tuple]) -> str:
    """Static single-file report: the general-stats table rendered like
    MultiQC's headline table. Driver-side by design — report rendering is
    a sink, and the table is one row per sample."""
    th = "".join(f"<th>{_html.escape(h)}</th>" for h in header)
    body = "\n".join(
        "<tr>" + "".join(
            f"<td>{'' if v is None else _html.escape(str(v))}</td>"
            for v in row) + "</tr>"
        for row in rows)
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{_html.escape(project)} QC report</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
th,td{{border:1px solid #999;padding:4px 8px;text-align:right}}
th{{background:#eee}}td:first-child,th:first-child{{text-align:left}}</style>
</head><body>
<h1>{_html.escape(project)} — aggregate QC report</h1>
<p>General statistics ({len(rows)} samples)</p>
<table><thead><tr>{th}</tr></thead><tbody>
{body}
</tbody></table>
</body></html>
"""


def write_multiqc_report(spark: SparkSession, root: str, out_dir: str,
                         project: str) -> str:
    """The SNK8 sink: aggregate the QC tree and write
    ``<project>_multiQC_report.html`` + ``<project>_multiQC_report_data/``
    (general stats + one TSV per module), mirroring the reference's
    ``${BIOProjectID}_fastq_multiQC_report`` naming
    (``run_SRA2QC_diskGuard.bash:160``). Returns the HTML path."""
    modules = aggregate_qc_tree(spark, root)
    gen = general_stats(modules)

    data_dir = os.path.join(out_dir, f"{project}_multiQC_report_data")
    os.makedirs(data_dir, exist_ok=True)
    write_tsv(gen, os.path.join(data_dir, "multiqc_general_stats.txt"),
              single_file=True)
    for mod, df in modules.items():
        write_tsv(df.orderBy("sample"),
                  os.path.join(data_dir, f"multiqc_{mod}.txt"),
                  single_file=True)

    header = gen.columns
    rows = [tuple(r) for r in gen.collect()]
    html_path = os.path.join(out_dir, f"{project}_multiQC_report.html")
    with open(html_path, "w") as f:
        f.write(_render_html(project, header, rows))
    return html_path
