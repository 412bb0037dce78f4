"""Entry point A — bulk orchestrator CLI: project-list parsing, sample
counting, small/large admission ordering, and marker-based resume across
re-invocations (bulk_orchestrator_production_diskGuard.bash:200-452)."""

from __future__ import annotations

import glob
import os

from rgd_rnaseq_workflows_spark import run_bulk

HEADER = ("Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\tTitle\t"
          "Sample_characteristics\tStrainInfo")
GENES = ["Xist", "Uty", "Actb"]


def _project_fixture(root: str, project: str, n_samples: int) -> str:
    """AccList + STAR logs + RSEM files for one toy project; every sample
    passes QC."""
    pdir = f"{root}/{project}"
    lines = [HEADER]
    for i in range(n_samples):
        gsm = f"{project}_GSM{i}"
        lines.append(f"SRR{i}\t{gsm}\tLiver\tBN\tM\t1\tu\tt\tc\ts")
        os.makedirs(f"{pdir}/logs/{gsm}", exist_ok=True)
        with open(f"{pdir}/logs/{gsm}/Log.final.out", "w") as f:
            f.write("  Number of input reads |\t10,000\n"
                    "  Number of reads unmapped: too many mismatches |\t100\n"
                    "  Number of reads unmapped: too short |\t0\n"
                    "  Number of reads unmapped: other |\t0\n")
        os.makedirs(f"{pdir}/rsem", exist_ok=True)
        with open(f"{pdir}/rsem/{gsm}.genes.results", "w") as f:
            f.write("gene_id\ttranscript_id(s)\tlength\teffective_length\t"
                    "expected_count\tTPM\tFPKM\n")
            for gi, g in enumerate(GENES):
                f.write(f"{g}\tNM_{gi}\t1000\t900\t10.00\t{gi + 1}.00\t1.0\n")
    acclist = f"{pdir}/AccList.txt"
    with open(acclist, "w") as f:
        f.write("\n".join(lines) + "\n")
    return acclist


def _write_project_list(root: str, entries: list[tuple[str, str]]) -> str:
    path = f"{root}/projects.txt"
    with open(path, "w") as f:
        f.write("# Project list\n# Format: <acclist> <project> <readlen>\n\n")
        for acclist, project in entries:
            f.write(f"{acclist}\t{project}\t150\n")
    return path


def _argv(root: str, plist: str) -> list[str]:
    return [plist, "--base-dir", f"{root}/data",
            "--star-logs-template", f"{root}/{{project}}/logs/*/Log.final.out",
            "--rsem-template", f"{root}/{{project}}/rsem/*.genes.results",
            "--small-threshold", "2", "--max-concurrent-small", "4"]


def test_parse_project_list_skips_comments(tmp_out):
    plist = f"{tmp_out}/p.txt"
    with open(plist, "w") as f:
        f.write("# comment\n\n/a/x.txt\tP1\t100\n/a/y.txt  P2\n"
                "malformed_only_one_field\n")
    specs = run_bulk.parse_project_list(plist)
    assert [(s.acclist, s.project, s.read_length) for s in specs] == [
        ("/a/x.txt", "P1", 100), ("/a/y.txt", "P2", 150)]


def test_count_samples_distinct_nonempty(spark, tmp_out):
    acclist = f"{tmp_out}/acc.txt"
    with open(acclist, "w") as f:
        f.write(HEADER + "\n"
                "SRR1\tGSM1\tL\tB\tM\t1\tu\tt\tc\ts\n"
                "SRR2\tGSM1\tL\tB\tM\t1\tu\tt\tc\ts\n"   # dup GSM
                "# comment line\n"
                "SRR3\tGSM2\tL\tB\tF\t1\tu\tt\tc\ts\n")
    assert run_bulk.count_samples(spark, acclist) == 2
    assert run_bulk.count_samples(spark, f"{tmp_out}/missing.txt") == 0


def test_bulk_e2e_admission_resume(spark, tmp_out, capsys):
    """2 small + 1 large project: the large one is admitted in its own
    wave after the smalls; a second invocation skips every stage via the
    .step*_complete markers."""
    a1 = _project_fixture(tmp_out, "P1", 2)
    a2 = _project_fixture(tmp_out, "P2", 2)
    a3 = _project_fixture(tmp_out, "PBIG", 3)        # > threshold → large
    plist = _write_project_list(
        tmp_out, [(a1, "P1"), (a2, "P2"), (a3, "PBIG")])

    assert run_bulk.main(_argv(tmp_out, plist)) == 0
    err = capsys.readouterr().err
    assert "admission waves: [['P1', 'P2'], ['PBIG']]" in err
    assert "PBIG: 3 samples (LARGE)" in err

    # artifacts + reference-style markers for both steps of all projects
    for p in ["P1", "P2", "PBIG"]:
        assert glob.glob(f"{tmp_out}/data/{p}/out/Unique_AccList/part*")
        assert glob.glob(f"{tmp_out}/data/{p}/out/GeneMat_TPM/part*")
        for step in ["step1", "step2"]:
            assert os.path.exists(
                f"{tmp_out}/data/.status/{p}.{step}_complete")

    # resume: markers short-circuit every stage — artifacts untouched
    [mat] = glob.glob(f"{tmp_out}/data/P1/out/GeneMat_TPM/part*")
    mtime = os.path.getmtime(mat)
    assert run_bulk.main(_argv(tmp_out, plist)) == 0
    err = capsys.readouterr().err
    assert err.count("skipped") == 6                 # 3 projects × 2 steps
    assert os.path.getmtime(mat) == mtime


def test_bulk_zero_sample_project_fails_run(spark, tmp_out, capsys):
    """A project whose AccList is missing counts 0 samples → marked
    failed and the run exits nonzero, like the reference's SKIPPING
    branch (:247-252)."""
    a1 = _project_fixture(tmp_out, "P1", 2)
    plist = _write_project_list(
        tmp_out, [(a1, "P1"), (f"{tmp_out}/nope.txt", "PGONE")])
    assert run_bulk.main(_argv(tmp_out, plist)) == 1
    err = capsys.readouterr().err
    assert "PGONE: 0 samples - SKIPPING" in err
    assert "P1=complete" in err and "PGONE=failed" in err


def test_bulk_dry_run_previews_waves(spark, tmp_out, capsys):
    a1 = _project_fixture(tmp_out, "P1", 2)
    a3 = _project_fixture(tmp_out, "PBIG", 3)
    plist = _write_project_list(tmp_out, [(a1, "P1"), (a3, "PBIG")])
    assert run_bulk.main(_argv(tmp_out, plist) + ["--dry-run"]) == 0
    err = capsys.readouterr().err
    assert "admission waves: [['P1'], ['PBIG']]" in err
    # nothing executed
    assert not glob.glob(f"{tmp_out}/data/*/out/*")
