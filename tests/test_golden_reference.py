"""Golden parity: byte-compare our matrix against the REFERENCE's own
Perl builder executed on identical fixtures (SURVEY §5 strategy #2 —
goldens produced by running the reference's logic, never copying it).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

from rgd_rnaseq_workflows_spark.operators.matrix import (
    format_reference_matrix, pivot_matrix)
from rgd_rnaseq_workflows_spark.sources.rsem import read_rsem_results

REF_BIN = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
           "dependencies/rsem-generate-data-matrix")
REF_BIN_COUNTS = REF_BIN + "-counts"

GENES = ["Xist", "Uty", "Sry", "Actb"]


def _write_fixtures(root):
    paths = []
    for si, gsm in enumerate(["GSM1", "GSM2"], 1):
        p = os.path.join(root, f"{gsm}.genes.results")
        with open(p, "w") as f:
            f.write("gene_id\ttranscript_id(s)\tlength\teffective_length\t"
                    "expected_count\tTPM\tFPKM\n")
            for gi, g in enumerate(GENES):
                f.write(f"{g}\tNM_{gi}\t1000\t900\t{10 * si}.00\t"
                        f"{gi * 10 + si}.25\t1.0\n")
        paths.append(p)
    return paths


def _golden(binary, paths):
    return subprocess.run([binary, *paths], capture_output=True,
                          text=True, check=True).stdout.rstrip("\n")


def _ours(spark, root, measure):
    expr = read_rsem_results(spark, f"{root}/*.genes.results")
    wide = pivot_matrix(expr, measure)
    rendered = format_reference_matrix(wide)
    header = "\t".join(rendered.columns)
    # the Perl builder preserves the input file's row order; ours is by
    # feature key — compare as sorted row sets plus identical headers
    rows = ["\t".join(str(v) for v in r) for r in rendered.collect()]
    return header, sorted(rows)


@pytest.mark.skipif(not (shutil.which("perl") and os.path.exists(REF_BIN)),
                    reason="reference binary or perl unavailable")
def test_tpm_matrix_matches_reference_builder(spark, tmp_out):
    paths = _write_fixtures(tmp_out)
    golden_lines = _golden(REF_BIN, paths).split("\n")
    header, rows = _ours(spark, tmp_out, "TPM")
    assert header == golden_lines[0]
    assert rows == sorted(golden_lines[1:])


@pytest.mark.skipif(not (shutil.which("perl") and os.path.exists(REF_BIN_COUNTS)),
                    reason="reference binary or perl unavailable")
def test_counts_matrix_matches_reference_builder(spark, tmp_out):
    paths = _write_fixtures(tmp_out)
    golden_lines = _golden(REF_BIN_COUNTS, paths).split("\n")
    header, rows = _ours(spark, tmp_out, "expected_count")
    assert header == golden_lines[0]
    assert rows == sorted(golden_lines[1:])
