"""CLI entry point A: multi-project bulk orchestrator.

The Spark-native equivalent of the reference's hybrid scheduler
(``scripts/bulk_orchestrator_production_diskGuard.bash:200-452``): parse a
project list, classify each project by distinct-sample count, and drive N
``run_pipeline`` invocations through the ``Orchestrator`` admission policy
(small ≤ threshold, ≤ N concurrent; a large project runs in isolation;
``:33-34,339-364``) with ``.step*_complete`` markers honored across
re-invocations (``:266-283`` / phase 2+4 marker checks).

Per project, two steps mirror the reference DAG:

- **step1** — ingest readiness (the ``run_SRA2QC`` slot): dedup the
  AccList (AGG4 pinned keep-first), write ``Unique_AccList``, and — when a
  FASTQ inventory template is given — the SRC9 layout table. The actual
  download kernel is the SRC8 connector (``sources/fetch.py``), pluggable
  via ``bulk_runs(..., fetch_fn=...)``; the CLI default skips it, because
  fetch binaries are an external-kernel boundary (SURVEY §7.0).
- **step2** — the full analytic pipeline (``run_pipeline.run``), which
  applies its own per-stage markers underneath.

Path templates use ``{project}`` placeholders so one invocation covers the
reference's ``BASE_DATA_DIR/${{project}}`` conventions.

Usage:
  python -m rgd_rnaseq_workflows_spark.run_bulk projects.txt \
      --base-dir data \
      --star-logs-template 'data/{project}/logs/*/Log.final.out' \
      --rsem-template 'data/{project}/rsem/*.genes.results'

Project-list format (``docs/example_project_list.txt``):
``<acclist_path>  <project_id>  [read_length]``, whitespace-separated;
blank lines and ``#`` comments skipped (SRC2); read_length defaults to 150.
"""

from __future__ import annotations

import argparse
import sys
from argparse import Namespace
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark import run_pipeline
from rgd_rnaseq_workflows_spark.plans.orchestrator import (
    Orchestrator, ProjectRun, Stage)
from rgd_rnaseq_workflows_spark.schemas import ACCLIST
from rgd_rnaseq_workflows_spark.sources.tsv import read_tsv, write_tsv


@dataclass
class ProjectSpec:
    acclist: str
    project: str
    read_length: int = 150          # STAR sjdbOverhang = length - 1


def parse_project_list(path: str) -> list[ProjectSpec]:
    """``<acclist> <project> [readlen]`` per line; ``#`` comments and blank
    lines skipped; malformed lines (missing project) skipped like the
    reference's ``[[ -z "$PROJECT" ]] && continue`` (``:228-231``)."""
    specs: list[ProjectSpec] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            readlen = int(parts[2]) if len(parts) > 2 else 150
            specs.append(ProjectSpec(parts[0], parts[1], readlen))
    return specs


def count_samples(spark, acclist_path: str) -> int:
    """AGG1 — distinct non-empty ``geo_accession``; mirrors
    ``count_samples_in_acclist`` (``:73-92``: header skipped, ``#`` lines
    skipped, empty and literal-header cells excluded). Unreadable path →
    0, which classifies the project as failed."""
    try:
        acc = read_tsv(spark, acclist_path, ACCLIST, comment="#")
        return (acc.filter(F.col("geo_accession").isNotNull()
                           & (F.col("geo_accession") != "")
                           & (F.col("geo_accession") != "geo_accession"))
                .select("geo_accession").distinct().count())
    except Exception:
        return 0


def _pipeline_args(spec: ProjectSpec, args: Namespace) -> Namespace:
    def t(template: str | None) -> str | None:
        return template.format(project=spec.project) if template else None

    # Start from run_pipeline's own parser defaults so a flag added there
    # (e.g. --qc-scan-root) can never leave this Namespace missing an
    # attribute the pipeline reads.
    base = {a.dest: a.default
            for a in run_pipeline.build_parser()._actions
            if a.dest != "help"}
    base.update(
        acclist=spec.acclist,
        star_logs=t(args.star_logs_template),
        rsem=t(args.rsem_template),
        rsem_tx=t(args.rsem_tx_template),
        idxstats=t(args.idxstats_template),
        out=f"{args.base_dir}/{spec.project}/out",
        project=spec.project,
        layout=args.layout,
        fastq_inventory=t(args.fastq_inventory_template),
    )
    return Namespace(**base)


def bulk_runs(spark, specs: list[ProjectSpec], args: Namespace,
              fetch_fn: Callable[[str], str] | None = None,
              ) -> tuple[list[ProjectRun], dict[str, str]]:
    """Build one two-stage ProjectRun per project. Returns (runs, status)
    where status pre-marks 0-sample projects as failed (``:247-252``)."""
    runs: list[ProjectRun] = []
    status: dict[str, str] = {}
    for spec in specs:
        n = count_samples(spark, spec.acclist)
        if n == 0:
            print(f"[bulk] {spec.project}: 0 samples - SKIPPING",
                  file=sys.stderr)
            status[spec.project] = "failed"
            continue
        status[spec.project] = "pending"
        pargs = _pipeline_args(spec, args)

        def step1(spec=spec, pargs=pargs):
            from rgd_rnaseq_workflows_spark.plans.acclist import unique_acclist
            acc = read_tsv(spark, spec.acclist, ACCLIST, comment="#")
            unique = unique_acclist(acc)
            write_tsv(unique.select(*[f.name for f in ACCLIST.fields]),
                      f"{pargs.out}/Unique_AccList", single_file=True)
            if fetch_fn is not None:
                from rgd_rnaseq_workflows_spark.sources.fetch import fetch_runs
                st = fetch_runs(unique, fetch_fn)
                st.write.mode("overwrite").parquet(
                    f"{pargs.out}/fetch_status.parquet")

        def step2(pargs=pargs):
            rc = run_pipeline.run(pargs)
            if rc != 0:
                raise RuntimeError(f"run_pipeline exited {rc}")

        runs.append(ProjectRun(spec.project, n, [
            Stage("step1", step1),
            Stage("step2", step2),
        ]))
    return runs, status


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rgd_rnaseq_workflows_spark.run_bulk",
        description="Bulk multi-project orchestrator (entry point A): "
                    "small/large admission + marker-based resume")
    p.add_argument("project_list", help="projects file: <acclist> "
                   "<project_id> [read_length]; # comments skipped")
    p.add_argument("--base-dir", required=True,
                   help="root output dir (reference BASE_DATA_DIR); "
                        "markers live in <base>/.status")
    p.add_argument("--star-logs-template", default=None,
                   help="glob template with {project}")
    p.add_argument("--rsem-template", default=None,
                   help="glob template with {project}")
    p.add_argument("--rsem-tx-template", default=None)
    p.add_argument("--idxstats-template", default=None)
    p.add_argument("--fastq-inventory-template", default=None)
    p.add_argument("--layout", choices=["PE", "SE"], default="PE")
    p.add_argument("--small-threshold", type=int, default=20,
                   help="samples > threshold = large (reference "
                        "SMALL_PROJECT_THRESHOLD)")
    p.add_argument("--max-concurrent-small", type=int, default=4,
                   help="reference MAX_CONCURRENT_SMALL")
    p.add_argument("--dry-run", action="store_true",
                   help="print classification and admission waves only")
    return p


def run(args: Namespace) -> int:
    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("bulk-orchestrator")
    specs = parse_project_list(args.project_list)
    if not specs:
        print("[bulk] empty project list", file=sys.stderr)
        return 1

    orch = Orchestrator(f"{args.base_dir}/.status",
                        small_threshold=args.small_threshold,
                        max_concurrent_small=args.max_concurrent_small)
    runs, status = bulk_runs(spark, specs, args)

    for r in runs:
        size = "LARGE" if r.is_large(args.small_threshold) else "small"
        print(f"[bulk] {r.project_id}: {r.n_samples} samples ({size})",
              file=sys.stderr)

    if args.dry_run:
        # classification + wave preview without executing any stage
        preview = Orchestrator(f"{args.base_dir}/.status",
                               small_threshold=args.small_threshold,
                               max_concurrent_small=args.max_concurrent_small)
        waves = preview.schedule(
            [ProjectRun(r.project_id, r.n_samples, []) for r in runs])
        print(f"[bulk] admission waves: {waves}", file=sys.stderr)
        return 0

    waves = orch.schedule(runs)
    print(f"[bulk] admission waves: {waves}", file=sys.stderr)
    for project, stage, event in orch.log:
        print(f"[bulk] {project}.{stage}: {event}", file=sys.stderr)
        if event.startswith("failed"):
            status[project] = "failed"
    for r in runs:
        if status.get(r.project_id) == "pending":
            done = all(orch.is_done(r.project_id, s.name) for s in r.stages)
            status[r.project_id] = "complete" if done else "failed"

    print("[bulk] final: " + ", ".join(
        f"{p}={s}" for p, s in status.items()), file=sys.stderr)
    return 0 if all(s == "complete" for s in status.values()) else 1


def main(argv: list[str] | None = None) -> int:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    raise SystemExit(main())
