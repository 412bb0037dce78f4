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


REF_STARQC = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
              "scripts/pSTARQC_v1.sh")


@pytest.mark.skipif(not os.path.exists(REF_STARQC),
                    reason="reference script unavailable")
def test_starqc_matches_reference_script(spark, tmp_out):
    """Execute the reference's own pSTARQC_v1.sh (user config pointed at a
    temp home) on shared fixtures and byte-compare the data rows."""
    import re

    home = os.path.join(tmp_out, "home")
    prj = "PRJTEST"
    base = os.path.join(home, "data/expression/GEO", prj)
    logs = [("GSM1", "24,776,293", "1,000", "2,000", "3,000"),  # PASS
            ("GSM2", "1,000", "300", "150", "50"),               # 50.00 FAIL
            ("GSM3", "0", "0", "0", "0")]                        # INVALID
    for gsm, n, a, b, c in logs:
        d = os.path.join(base, "reads_fastq", gsm, "log_files/STARQC")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{gsm}_STARLog.final.out"), "w") as f:
            f.write(f"  Number of input reads |\t{n}\n"
                    f"  Number of reads unmapped: too many mismatches |\t{a}\n"
                    f"  Number of reads unmapped: too short |\t{b}\n"
                    f"  Number of reads unmapped: other |\t{c}\n")
    acclist = os.path.join(tmp_out, "unique.tsv")
    with open(acclist, "w") as f:
        f.write("Run\tgeo_accession\n")
        for i, (gsm, *_rest) in enumerate(logs):
            f.write(f"SRR{i}\t{gsm}\n")
        f.write("SRR9\tGSM_MISSING\n")                           # NO_LOG

    # run the reference script with its USER CONFIGURATION block pointed
    # at the temp home (executed from a throwaway copy — nothing from the
    # reference enters this repo)
    script = open(REF_STARQC).read()
    script = re.sub(r'myDir="[^"]*"', f'myDir="{home}"', script, count=1)
    script = re.sub(r'SCRATCH_BASE="[^"]*"', f'SCRATCH_BASE="{tmp_out}"',
                    script, count=1)
    tmp_script = os.path.join(tmp_out, "ref_starqc.sh")
    open(tmp_script, "w").write(script)
    # the production caller exports scratch_dir (run_RNApipeline does this
    # via --export); without it the set -u loop dies on first iteration
    subprocess.run(["bash", tmp_script, acclist, prj], check=True,
                   capture_output=True, text=True,
                   env={**os.environ, "scratch_dir": tmp_out})
    golden_path = os.path.join(base, "log_files/STARQC",
                               f"{prj}_STAR_Align_sum.txt")
    golden = open(golden_path).read().rstrip("\n").split("\n")

    # our engine on the same logs
    from rgd_rnaseq_workflows_spark.plans.starqc import starqc_summary
    from rgd_rnaseq_workflows_spark.sources.star_log import read_star_logs
    kv = read_star_logs(
        spark, f"{base}/reads_fastq/*/log_files/STARQC/*_STARLog.final.out",
        sample_pattern=r"([^/]+)_STARLog\.final\.out$")
    expected = spark.createDataFrame(
        [(g,) for g in ["GSM1", "GSM2", "GSM3", "GSM_MISSING"]], ["sample"])
    ours = starqc_summary(kv, expected).collect()

    def render(r):
        na = lambda v, fmt="{}": "NA" if v is None else fmt.format(v)
        return "\t".join([
            r["SampleID"], na(r["Input_Reads"]), na(r["Unmapped_Total"]),
            na(r["Unmapped_Rate"], "{:.2f}"), r["Status"]])

    assert sorted(render(r) for r in ours) == sorted(golden[1:])


REF_CONFLICT = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
                "scripts/ConflictedSampleReport_v4.sh")


_GAWK_SHIM = '''#!/usr/bin/env python3
"""awk shim for the one gawk-only program ConflictedSampleReport_v4.sh
runs (multidimensional arrays, tpm_values[sample][gene] — a GNU
extension): emulates that program's semantics exactly — header columns
2..NF strip the .genes.results suffix to sample names, data rows strip
quotes from $1 and, for genes in the -v genes list, print
"sample gene tpm" triples (iteration order is unspecified in gawk and
irrelevant downstream). Any other program falls through to system awk."""
import subprocess
import sys

args = sys.argv[1:]
assigns, rest = {}, []
it = iter(args)
for a in it:
    if a == "-v":
        k, v = next(it).split("=", 1)
        assigns[k] = v
    else:
        rest.append(a)
prog, files = rest[0], rest[1:]
if "tpm_values[sample][gene]" not in prog:
    # absolute path: bare "awk" would resolve back to this shim
    sys.exit(subprocess.call(["/usr/bin/awk", *args]))
gene_map = set(assigns["genes"].split())
sample_to_col = {}
with open(files[0]) as fh:
    for nr, line in enumerate(fh, 1):
        f = line.split()
        if nr == 1:
            for i, name in enumerate(f[1:], 2):
                sample_to_col[name.replace(".genes.results", "")] = i
            continue
        gene = f[0].replace(chr(34), "")
        if gene in gene_map:
            for sample, col in sample_to_col.items():
                print(sample, gene, f[col - 1])
'''


@pytest.mark.skipif(not os.path.exists(REF_CONFLICT),
                    reason="reference script unavailable")
def test_conflict_report_matches_reference_script(spark, tmp_out):
    """Execute the reference's ConflictedSampleReport_v4.sh on a shared
    sex table + TPM matrix and compare the joined gene slice. Uses real
    gawk when present, else the vendored shim above (the script's only
    gawk-ism is one multidim-array program)."""
    from rgd_rnaseq_workflows_spark.plans.sexcheck import (
        SEX_GENES, conflict_report)

    prj = "PRJC"
    prjdir = os.path.join(tmp_out, "prj")
    os.makedirs(prjdir)
    sex_rows = [("GSM1", "M", "M", "2.118354", "Agree"),
                ("GSM2", "F", "F", "Inf", "Agree"),
                ("GSM3", "M", "F", "77.5", "Conflict")]
    with open(os.path.join(prjdir, f"{prj}_sex_result.txt"), "w") as f:
        f.write("SampleID\tInputSex\tComputedSex\tRatio\tAgreement\n")
        for r in sex_rows:
            f.write("\t".join(r) + "\n")
    samples = [r[0] for r in sex_rows]
    genes = [*SEX_GENES, "Actb"]
    with open(os.path.join(prjdir, f"{prj}.genes.TPM.matrix"), "w") as f:
        f.write("Symbol\t" + "\t".join(f'"{s}.genes.results"'
                                       for s in samples) + "\n")
        for gi, g in enumerate(genes):
            f.write(f'"{g}"\t' + "\t".join(f"{gi + si + 1}.25"
                                           for si in range(3)) + "\n")

    # the script calls bare `awk`; route it to gawk when installed, else
    # to the vendored multidim-array shim
    bin_dir = os.path.join(tmp_out, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    if shutil.which("gawk"):
        os.symlink(shutil.which("gawk"), os.path.join(bin_dir, "awk"))
    else:
        shim = os.path.join(bin_dir, "awk")
        open(shim, "w").write(_GAWK_SHIM)
        os.chmod(shim, 0o755)
    subprocess.run(["bash", REF_CONFLICT, prj], check=True,
                   capture_output=True, text=True,
                   env={**os.environ, "PRJdir": prjdir,
                        "PATH": f"{bin_dir}:{os.environ['PATH']}"})
    golden_path = os.path.join(prjdir, f"{prj}_sex_conflict_report.txt")
    lines = open(golden_path).read().rstrip("\n").split("\n")
    golden = {}
    for line in lines[2:]:                      # note + header rows
        parts = line.split("\t")
        sample, input_sex, computed, ratio, agreement = parts[:5]
        tpms = [float(v) for v in parts[5].split(" ")]
        golden[sample] = (input_sex, computed, ratio, agreement, tpms)

    sex_df = spark.createDataFrame(
        [(s, i, c, None if r == "Inf" else float(r), a)
         for s, i, c, r, a in sex_rows],
        "SampleID string, InputSex string, ComputedSex string, "
        "Ratio double, Agreement string")
    expr = spark.createDataFrame(
        [(s, g, float(f"{gi + si + 1}.25"), 0.0)
         for si, s in enumerate(samples) for gi, g in enumerate(genes)],
        ["sample", "feature_id", "TPM", "expected_count"])
    ours = {r["SampleID"]: r for r in conflict_report(sex_df, expr).collect()}

    assert set(ours) == set(golden)
    for s, (input_sex, computed, ratio, agreement, tpms) in golden.items():
        r = ours[s]
        assert (r["InputSex"], r["ComputedSex"], r["Agreement"]) == \
            (input_sex, computed, agreement)
        assert [r[g] for g in SEX_GENES] == tpms
        if ratio == "Inf":
            assert r["XYRatio"] is None        # sentinel at sink
        else:
            assert r["XYRatio"] == float(ratio)


REF_COMBINE = ("/root/reference/utilities/combined_project_processing/"
               "combine_multStrategy_Directories.bash")


@pytest.mark.skipif(not os.path.exists(REF_COMBINE),
                    reason="reference script unavailable")
def test_combine_matches_reference_script(spark, tmp_out):
    """Execute the reference's combine_multStrategy_Directories.bash on a
    PE+SE fixture pair (CRLF + trailing blanks included) and compare the
    merged sex table and gene TPM matrix against plans.combine."""
    import re
    base = os.path.join(tmp_out, "data")
    d1, d2, comb = "GSE1_PE", "GSE1_SE", "GSE1"
    for d in (d1, d2):
        os.makedirs(os.path.join(base, d, "log_files"), exist_ok=True)
        os.makedirs(os.path.join(base, d, "reads_fastq"), exist_ok=True)

    # sex results: dir2 carries CRLF line endings + a trailing blank line
    with open(f"{base}/{d1}/{d1}_sex_result.txt", "w") as f:
        f.write("SampleID\tInputSex\tComputedSex\tRatio\tAgreement\n"
                "GSM1\tM\tM\t2.5\tAgree\n")
    with open(f"{base}/{d2}/{d2}_sex_result.txt", "w") as f:
        f.write("SampleID\tInputSex\tComputedSex\tRatio\tAgreement\r\n"
                "GSM2\tF\tF\tInf\tAgree\r\n\n")

    # gene TPM matrices: overlapping-but-unequal feature sets (loss path)
    with open(f"{base}/{d1}/{d1}.genes.TPM.matrix", "w") as f:
        f.write('Symbol\t"GSM1.genes.results"\n'
                '"Xist"\t1.25\n"Uty"\t2.25\n"OnlyPE"\t3.25\n')
    with open(f"{base}/{d2}/{d2}.genes.TPM.matrix", "w") as f:
        f.write('Symbol\t"GSM2.genes.results"\n'
                '"Xist"\t9.25\n"Uty"\t8.25\n"OnlySE"\t7.25\n')

    script = open(REF_COMBINE).read()
    script = re.sub(r'BASE_PATH="[^"]*"', f'BASE_PATH="{base}"', script,
                    count=1)
    stub = os.path.join(tmp_out, "jbrowse_stub.py")
    open(stub, "w").write("import sys; sys.exit(0)\n")
    script = re.sub(r'JBROWSE_PY="[^"]*"', f'JBROWSE_PY="{stub}"', script,
                    count=1)
    tmp_script = os.path.join(tmp_out, "ref_combine.sh")
    open(tmp_script, "w").write(script)
    # later copy/report steps may abort on this sparse fixture layout —
    # the merge outputs (steps 1-3) are what we compare
    subprocess.run(["bash", tmp_script, d1, d2, comb],
                   capture_output=True, text=True)

    golden_sex = open(f"{base}/{comb}/{comb}_sex_result.txt").read() \
        .rstrip("\n").split("\n")
    golden_mat = open(f"{base}/{comb}/{comb}.genes.TPM.matrix").read() \
        .rstrip("\n").split("\n")

    from rgd_rnaseq_workflows_spark.plans.combine import (
        merge_matrices, union_reports)
    sex1 = spark.createDataFrame(
        [("GSM1", "M", "M", "2.5", "Agree")],
        ["SampleID", "InputSex", "ComputedSex", "Ratio", "Agreement"])
    sex2 = spark.createDataFrame(
        [("GSM2", "F", "F", "Inf\r", "Agree")],
        ["SampleID", "InputSex", "ComputedSex", "Ratio", "Agreement"])
    merged_sex = sorted("\t".join(r) for r in union_reports(sex1, sex2).collect())
    assert merged_sex == sorted(golden_sex[1:])

    m1 = spark.createDataFrame(
        [('"Xist"', "1.25"), ('"Uty"', "2.25"), ('"OnlyPE"', "3.25")],
        ["Symbol", "GSM1"])
    m2 = spark.createDataFrame(
        [('"Xist"', "9.25"), ('"Uty"', "8.25"), ('"OnlySE"', "7.25")],
        ["Symbol", "GSM2"])
    merged, loss = merge_matrices(m1, m2)
    ours = sorted("\t".join(r) for r in merged.collect())
    assert ours == sorted(golden_mat[1:])
    # the reference's row-loss warning fires; our metrics quantify it
    # (observe-backed, populated by the collect above)
    assert loss.get == {"lost_left": 1, "lost_right": 1}


REF_BWJSON = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
              "scripts/BWjson_v7.sh")


@pytest.mark.skipif(not os.path.exists(REF_BWJSON),
                    reason="reference script unavailable")
def test_track_json_matches_reference_script(spark, tmp_out):
    """Execute BWjson_v7.sh with metadata containing JSON-hostile
    characters and compare the parsed document with our to_json output —
    the reference needed a handwritten escaper; to_json gets it free."""
    import json

    gsm, run, prj = "GSM77", "SRR77", "PRJB"
    unique = f"Liver_BN_M_{gsm}"
    prjdir = os.path.join(tmp_out, "prj")
    basedir = os.path.join(tmp_out, "base")
    scratch = os.path.join(tmp_out, "scratch")
    for d in (os.path.join(prjdir, gsm), basedir, scratch):
        os.makedirs(d, exist_ok=True)
    # sex result consulted by the script's awk lookup (JN5)
    with open(os.path.join(basedir, f"{prj}_sex_result.txt"), "w") as f:
        f.write("SampleID\tInputSex\tComputedSex\tRatio\tAgreement\n"
                f"{gsm}\tM\tF\t99.0\tConflict\n")
    # the script asserts the bigwig artifact exists
    open(os.path.join(prjdir, gsm, f"RNAseq_{unique}.bigwig"), "w").close()

    title = 'Study "quoted" with \\backslash\\ and\ttab'
    env = {
        **os.environ,
        "Run": run, "geo_accession": gsm, "BIOProjectID": prj,
        "unique_name": unique, "PRJdir": prjdir, "scratch_dir": scratch,
        "Logdir": os.path.join(tmp_out, "log"), "baseDir": basedir,
        "tissue": "Liver", "strain": "BN/NHsdMcwi, extra", "sex": "M",
        "title": title, "Sample_characteristics": "age: 12 weeks",
        "StrainInfo": "https://rgd.mcw.edu/strain/1", "PMID": "12345678",
        "GEOpath": "https://www.ncbi.nlm.nih.gov/geo/?acc=GSE1",
    }
    subprocess.run(["bash", REF_BWJSON], check=True, capture_output=True,
                   text=True, env=env)
    golden = json.load(open(os.path.join(prjdir, gsm,
                                         f"RNAseq_{unique}.json")))

    from rgd_rnaseq_workflows_spark.sources.track_json import track_document
    from pyspark.sql import functions as F
    row = spark.createDataFrame([{
        "unique_name": unique, "geo_accession": gsm, "Tissue": "Liver",
        "Strain": "BN/NHsdMcwi, extra", "Sex": "M", "ComputedSex": "F",
        "Sample_characteristics": "age: 12 weeks",
        "StrainInfo": "https://rgd.mcw.edu/strain/1", "PMID": "12345678",
        "GEOpath": "https://www.ncbi.nlm.nih.gov/geo/?acc=GSE1",
        "Title": title,
    }])
    ours = json.loads(row.select(
        F.to_json(track_document(prj)).alias("j")).collect()[0]["j"])
    assert ours == golden

    # JN5 default: sample absent from the sex table → "Unknown"
    row2 = row.withColumn("ComputedSex", F.lit(None).cast("string"))
    ours2 = json.loads(row2.select(
        F.to_json(track_document(prj)).alias("j")).collect()[0]["j"])
    assert ours2["metadata"]["Computed Sex"] == "Unknown"


REF_GENEBED = ("/root/reference/archive/illuminaPaired_multipleSRA_"
               "IDperSample_v3/GeneTPMbed_v2.sh")


@pytest.mark.skipif(not os.path.exists(REF_GENEBED),
                    reason="reference script unavailable")
def test_gene_tpm_bed_matches_reference_script(spark, tmp_out):
    """Execute GeneTPMbed_v2.sh (GBed path patched to a fixture; bgzip is
    absent here so the script fails AFTER writing the final sorted BED,
    which is the artifact compared) and byte-compare the BED9 rows."""
    import re

    gsm, prj_id = "GSM5", "PRJBED"
    unique = f"Liver_BN_M_{gsm}"
    scratch = os.path.join(tmp_out, "scratch")
    prjdir = os.path.join(tmp_out, "prj")
    os.makedirs(os.path.join(scratch, gsm), exist_ok=True)
    os.makedirs(os.path.join(prjdir, gsm), exist_ok=True)

    # RSEM genes.results: zero-TPM row filtered, plus a no-annotation gene
    genes = [("Xist", "0.40"), ("Uty", "500.00"), ("Sry", "5.00"),
             ("Ddx3y", "2000.00"), ("ZeroGene", "0.00"), ("NoBed", "7.00")]
    with open(f"{scratch}/{gsm}/{gsm}.genes.results", "w") as f:
        f.write("gene_id\ttranscript_id(s)\tlength\teffective_length\t"
                "expected_count\tTPM\tFPKM\n")
        for g, tpm in genes:
            f.write(f"{g}\tNM\t1000\t900\t10.00\t{tpm}\t1.0\n")
    # gene annotation BED (col4 = gene), includes scaffold + non-chr rows
    gbed = os.path.join(tmp_out, "mod_genes_sorted.bed")
    with open(gbed, "w") as f:
        f.write("chr1\t100\t200\tXist\n"
                "chr2\t50\t150\tUty\n"
                "chr1\t10\t20\tSry\n"
                "NW_123\t1\t2\tDdx3y\n"
                "scaff_7\t5\t6\tSry\n"
                "chr3\t7\t8\tZeroGene\n")

    script = open(REF_GENEBED).read()
    script = re.sub(r'GBed="[^"]*"', f'GBed="{gbed}"', script, count=1)
    tmp_script = os.path.join(tmp_out, "ref_genebed.sh")
    open(tmp_script, "w").write(script)
    # this container has no `bc`; shim it (the script's get_rgb pipes
    # comparison expressions like "5.00 <= 0.5" into `bc -l`)
    bin_dir = os.path.join(tmp_out, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    bc = os.path.join(bin_dir, "bc")
    with open(bc, "w") as f:
        f.write("#!/usr/bin/env python3\n"
                "import sys\n"
                "expr = sys.stdin.read()\n"
                "print(1 if eval(expr, {'__builtins__': {}}) else 0)\n")
    os.chmod(bc, 0o755)
    env = {**os.environ, "Run": "SRR5", "geo_accession": gsm,
           "BIOProjectID": prj_id, "Tissue": "Liver", "Strain": "BN",
           "Sex": "M", "unique_name": unique, "scratch_dir": scratch,
           "PRJdir": prjdir,
           "PATH": f"{bin_dir}:{os.environ['PATH']}"}
    subprocess.run(["bash", tmp_script], capture_output=True, text=True,
                   env=env)       # exits nonzero at the bgzip step
    final_bed = os.path.join(prjdir, gsm,
                             f"RNAseq_{unique}_geneTPMfinalOP.bed")
    assert os.path.exists(final_bed), "reference did not produce the BED"
    golden = open(final_bed).read().rstrip("\n").split("\n")

    from rgd_rnaseq_workflows_spark.plans.tracks import tpm_bed9
    bed = spark.createDataFrame(
        [("chr1", 100, 200, "Xist"), ("chr2", 50, 150, "Uty"),
         ("chr1", 10, 20, "Sry"), ("NW_123", 1, 2, "Ddx3y"),
         ("scaff_7", 5, 6, "Sry"), ("chr3", 7, 8, "ZeroGene")],
        ["chrom", "start", "end", "name"])
    tpm = spark.createDataFrame(
        [(gsm, g, float(t), 10.0) for g, t in genes],
        ["sample", "feature_id", "TPM", "expected_count"])
    ours = [
        "\t".join([r["chrom"], str(r["start"]), str(r["end"]), r["name"],
                   f"{r['score']:.2f}", r["strand"], str(r["thickStart"]),
                   str(r["thickEnd"]), r["itemRgb"]])
        for r in tpm_bed9(bed, tpm).collect()
    ]
    assert ours == golden


REF_COMPUTESEX = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
                  "scripts/ComputeSex_v5.sh")

_BC_SHIM = '''#!/usr/bin/env python3
"""bc shim: supports the two shapes ComputeSex pipes in —
'scale=N; A/B' (TRUNCATING division, like real bc) and comparison
expressions under -l (prints 1/0). Output formatting mirrors bc:
no leading zero before the decimal point, bare 0 for zero."""
import sys
from fractions import Fraction
expr = sys.stdin.read().strip()
scale = 20 if "-l" in sys.argv else 0
if expr.startswith("scale="):
    head, expr = expr.split(";", 1)
    scale = int(head.split("=")[1])
    expr = expr.strip()
for op in ("<=", ">=", "==", "<", ">"):
    if op in expr:
        a, b = expr.split(op)
        print(1 if eval(f"Fraction('{a.strip()}'){op}Fraction('{b.strip()}')")
              else 0)
        sys.exit(0)
a, b = expr.split("/")
q = Fraction(a.strip()) / Fraction(b.strip())
if scale == 0:
    print(int(q))
else:
    scaled = int(q * 10 ** scale)          # truncation toward zero
    if scaled == 0:
        print(0)
    else:
        s = f"{scaled / 10 ** scale:.{scale}f}"
        print(s[1:] if s.startswith("0.") else s)
'''

_SAMTOOLS_SHIM = '''#!/usr/bin/env bash
# samtools shim: `samtools idxstats <bam>` -> cat the sidecar fixture
[ "$1" = "idxstats" ] && exec cat "$2.idxstats"
exit 1
'''


@pytest.mark.skipif(not os.path.exists(REF_COMPUTESEX),
                    reason="reference script unavailable")
def test_compute_sex_matches_reference_script(spark, tmp_out):
    """Execute ComputeSex_v5.sh with samtools/bc shimmed (idxstats served
    from fixtures; bc emulated with true truncating division) and compare
    the whole sex_result table — including bc scale=6 truncation, the Inf
    guard, and the 40.00 boundary."""
    prj = "PRJS"
    scratch = os.path.join(tmp_out, "scratch")
    basedir = os.path.join(tmp_out, "base")
    logdir = os.path.join(tmp_out, "log")
    prjdir = os.path.join(tmp_out, "prj")
    os.makedirs(os.path.join(logdir, "ComputeSex"), exist_ok=True)
    os.makedirs(basedir, exist_ok=True)
    os.makedirs(prjdir, exist_ok=True)

    # (sample, input_sex, (x_len, x_map), (y_len, y_map))
    cases = [
        ("GSM1", "M", (152453651, 100000), (18730765, 1042)),  # M agree
        ("GSM2", "M", (152453651, 5000000), (18730765, 0)),    # Inf → F
        ("GSM3", "F", (1000000, 400000), (1000000, 10000)),    # exactly 40 → M
        ("GSM4", "F", (1000000, 6530), (1000000, 10000)),      # sub-1 ratio → M
    ]
    for gsm, _sex, (xl, xm), (yl, ym) in cases:
        d = os.path.join(scratch, gsm)
        os.makedirs(d, exist_ok=True)
        bam = os.path.join(d, f"{gsm}_GENOME_SORT.bam")
        open(bam, "w").close()
        with open(bam + ".idxstats", "w") as f:
            f.write(f"chr1\t1000\t99\t0\nchrX\t{xl}\t{xm}\t0\n"
                    f"chrY\t{yl}\t{ym}\t0\n")
    acclist = os.path.join(tmp_out, "acc.tsv")
    with open(acclist, "w") as f:
        f.write("Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\t"
                "Title\tSample_characteristics\tStrainInfo\n")
        for i, (gsm, sex, *_r) in enumerate(cases):
            f.write(f"SRR{i}\t{gsm}\tLiver\tBN\t{sex}\t1\tu\tt\tc\ts\n")

    bin_dir = os.path.join(tmp_out, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    for name, body in (("bc", _BC_SHIM), ("samtools", _SAMTOOLS_SHIM)):
        p = os.path.join(bin_dir, name)
        open(p, "w").write(body)
        os.chmod(p, 0o755)
    env = {**os.environ, "Run": "SRR0", "geo_accession": "GSM1",
           "BIOProjectID": prj, "PRJdir": prjdir, "baseDir": basedir,
           "Logdir": logdir, "AccList": acclist, "scratch_dir": scratch,
           "PATH": f"{bin_dir}:{os.environ['PATH']}"}
    subprocess.run(["bash", REF_COMPUTESEX], capture_output=True,
                   text=True, env=env)
    golden_path = os.path.join(scratch, f"{prj}_sex_result.txt")
    assert os.path.exists(golden_path)
    golden = {}
    for line in open(golden_path).read().rstrip("\n").split("\n")[1:]:
        s, isex, csex, ratio, agr = line.split("\t")
        golden[s] = (isex, csex, ratio, agr)
    assert len(golden) == 4

    from rgd_rnaseq_workflows_spark.plans.sexcheck import compute_sex
    idx_rows = []
    for gsm, _sex, (xl, xm), (yl, ym) in cases:
        idx_rows += [(gsm, "chr1", 1000, 99, 0),
                     (gsm, "chrX", xl, xm, 0), (gsm, "chrY", yl, ym, 0)]
    idx = spark.createDataFrame(
        idx_rows, ["sample", "chrom", "seq_length", "mapped", "unmapped"])
    input_sex = spark.createDataFrame(
        [(g, s) for g, s, *_ in cases], ["sample", "InputSex"])
    ours = {r["SampleID"]: r for r in compute_sex(idx, input_sex).collect()}

    # sink-path byte parity: the bc_fixed_str rendering must reproduce the
    # reference's bc output string exactly (".653000", "41.666666", "Inf")
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.functions.formatting import bc_fixed_str
    rendered = {r["SampleID"]: r["s"] for r in compute_sex(idx, input_sex)
                .select("SampleID",
                        F.coalesce(
                            bc_fixed_str(F.round(F.col("Ratio") * 1e6)
                                         .cast("long")),
                            F.lit("Inf")).alias("s")).collect()}

    for gsm, (isex, csex, ratio, agr) in golden.items():
        r = ours[gsm]
        assert (r["InputSex"], r["ComputedSex"], r["Agreement"]) == \
            (isex, csex, agr), gsm
        if ratio == "Inf":
            assert r["Ratio"] is None
        else:
            assert r["Ratio"] == float(ratio), (gsm, ratio, r["Ratio"])
        assert rendered[gsm] == ratio, (gsm, ratio, rendered[gsm])


REF_COUNTING = ("/root/reference/RGD_Illumina_PairedEnd_RNAseq_pipeline/"
                "scripts/sample_counting.sh")


@pytest.mark.skipif(not os.path.exists(REF_COUNTING),
                    reason="reference script unavailable")
def test_sample_counting_matches_reference_script(spark, tmp_out):
    """The reference's own 'test script': distinct-GSM count, runs-per-GSM
    distribution, and the small/large classification (AGG1/AGG9 + the
    orchestrator threshold)."""
    import re
    acclist_path = os.path.join(tmp_out, "acc.tsv")
    rows = [("SRR%d" % i, "GSM%02d" % (i % 22), "L", "B", "M",
             "1", "u", "t", "c", "s") for i in range(30)]
    rows.append(("SRRX", "", "L", "B", "M", "1", "u", "t", "c", "s"))
    with open(acclist_path, "w") as f:
        f.write("Run\tgeo_accession\tTissue\tStrain\tSex\tPMID\tGEOpath\t"
                "Title\tSample_characteristics\tStrainInfo\n")
        for r in rows:
            f.write("\t".join(r) + "\n")

    out = subprocess.run(["bash", REF_COUNTING, acclist_path], check=True,
                         capture_output=True, text=True).stdout
    golden_unique = int(re.search(r"RESULT: (\d+) unique samples", out).group(1))
    golden_class = "LARGE" if "LARGE" in out else "SMALL"
    golden_dist = dict(re.findall(r"^(GSM\d+): (\d+) runs$", out, re.M))

    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.plans.acclist import clean_acclist
    from rgd_rnaseq_workflows_spark.plans.orchestrator import ProjectRun
    acc = spark.createDataFrame(rows, ["Run", "geo_accession", "Tissue",
                                       "Strain", "Sex", "PMID", "GEOpath",
                                       "Title", "Sample_characteristics",
                                       "StrainInfo"])
    cleaned = clean_acclist(acc)
    n_unique = cleaned.select("geo_accession").distinct().count()
    assert n_unique == golden_unique
    dist = {r["geo_accession"]: str(r["n"]) for r in
            cleaned.groupBy("geo_accession").agg(F.count("*").alias("n"))
            .collect()}
    assert dist == golden_dist
    run = ProjectRun("P", n_unique)
    assert ("LARGE" if run.is_large() else "SMALL") == golden_class


REF_TXBED = ("/root/reference/archive/illuminaPaired_multipleSRA_"
             "IDperSample_v3/txTPMbed_v2.sh")


@pytest.mark.skipif(not os.path.exists(REF_TXBED),
                    reason="reference script unavailable")
def test_tx_tpm_bed_matches_reference_script(spark, tmp_out):
    """Transcript-level twin of the gene BED golden: execute
    txTPMbed_v2.sh (TBed patched, bc shimmed) and byte-compare the final
    sorted BED against tpm_bed9 on the transcript grain."""
    import re

    gsm, prj_id = "GSM6", "PRJTX"
    unique = f"Liver_BN_M_{gsm}"
    scratch = os.path.join(tmp_out, "scratch")
    prjdir = os.path.join(tmp_out, "prj")
    os.makedirs(os.path.join(scratch, gsm), exist_ok=True)
    os.makedirs(os.path.join(prjdir, gsm), exist_ok=True)

    txs = [("NM_1", "0.40"), ("NM_2", "15.00"), ("NM_3", "0.00"),
           ("NM_4", "1200.50")]
    with open(f"{scratch}/{gsm}/{gsm}.transcripts.results", "w") as f:
        f.write("transcript_id\tgene_id\tlength\teffective_length\t"
                "expected_count\tTPM\tFPKM\tIsoPct\n")
        for t, tpm in txs:
            f.write(f"{t}\tG\t1000\t900\t10.00\t{tpm}\t1.0\t100.00\n")
    tbed = os.path.join(tmp_out, "mod_transcripts_sorted.bed")
    with open(tbed, "w") as f:
        f.write("chr1\t500\t900\tNM_2\n"
                "chr1\t100\t200\tNM_1\n"
                "chr2\t10\t20\tNM_4\n"
                "chr3\t1\t5\tNM_3\n"
                "NW_9\t1\t2\tNM_2\n")

    script = open(REF_TXBED).read()
    script = re.sub(r'TBed=\S+', f'TBed="{tbed}"', script, count=1)
    tmp_script = os.path.join(tmp_out, "ref_txbed.sh")
    open(tmp_script, "w").write(script)
    bin_dir = os.path.join(tmp_out, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    bc = os.path.join(bin_dir, "bc")
    with open(bc, "w") as f:
        f.write("#!/usr/bin/env python3\n"
                "import sys\n"
                "print(1 if eval(sys.stdin.read(), {'__builtins__': {}}) "
                "else 0)\n")
    os.chmod(bc, 0o755)
    env = {**os.environ, "Run": "SRR6", "geo_accession": gsm,
           "BIOProjectID": prj_id, "Tissue": "Liver", "Strain": "BN",
           "Sex": "M", "unique_name": unique, "scratch_dir": scratch,
           "PRJdir": prjdir, "PATH": f"{bin_dir}:{os.environ['PATH']}"}
    subprocess.run(["bash", tmp_script], capture_output=True, text=True,
                   env=env)
    final_bed = os.path.join(prjdir, gsm,
                             f"RNAseq_{unique}_TXTPMfinalOP.bed")
    assert os.path.exists(final_bed)
    golden = open(final_bed).read().rstrip("\n").split("\n")

    from rgd_rnaseq_workflows_spark.plans.tracks import tpm_bed9
    bed = spark.createDataFrame(
        [("chr1", 500, 900, "NM_2"), ("chr1", 100, 200, "NM_1"),
         ("chr2", 10, 20, "NM_4"), ("chr3", 1, 5, "NM_3"),
         ("NW_9", 1, 2, "NM_2")],
        ["chrom", "start", "end", "name"])
    tpm = spark.createDataFrame(
        [(gsm, t, float(v), 10.0) for t, v in txs],
        ["sample", "feature_id", "TPM", "expected_count"])
    ours = [
        "\t".join([r["chrom"], str(r["start"]), str(r["end"]), r["name"],
                   f"{r['score']:.2f}", r["strand"], str(r["thickStart"]),
                   str(r["thickEnd"]), r["itemRgb"]])
        for r in tpm_bed9(bed, tpm).collect()
    ]
    assert ours == golden


REF_CONFLICT_SE = ("/root/reference/RGD_Illumina_SingleEnd_RNAseq_pipeline/"
                   "ConflictedSampleReport_v5.sh")


@pytest.mark.skipif(not os.path.exists(REF_CONFLICT_SE),
                    reason="reference script unavailable")
def test_conflict_report_se_matches_reference_script(spark, tmp_out):
    """The SE mirror (ConflictedSampleReport_v5.sh) KEEPS sex rows whose
    sample is absent from the matrix, filling the gene columns with NA —
    left-join semantics where the PE v4 is inner — and carries
    ratio/agreement into the data rows. Execute it (awk shimmed/gawk) and
    compare conflict_report(how='left')."""
    from rgd_rnaseq_workflows_spark.plans.sexcheck import (
        SEX_GENES, conflict_report)

    prj = "PRJSE"
    basedir = os.path.join(tmp_out, "base")
    os.makedirs(basedir, exist_ok=True)
    sex_rows = [("GSM1", "M", "M", "2.118354", "Agree"),
                ("GSM2", "F", "F", "Inf", "Agree"),
                ("GSMX", "F", "M", "1.5", "Conflict")]   # not in matrix
    with open(os.path.join(basedir, f"{prj}_sex_result.txt"), "w") as f:
        f.write("SampleID\tInputSex\tComputedSex\tRatio\tAgreement\n")
        for r in sex_rows:
            f.write("\t".join(r) + "\n")
    samples = ["GSM1", "GSM2"]
    genes = [*SEX_GENES, "Actb"]
    with open(os.path.join(basedir, f"{prj}.genes.TPM.matrix"), "w") as f:
        f.write("Symbol\t" + "\t".join(f'"{s}.genes.results"'
                                       for s in samples) + "\n")
        for gi, g in enumerate(genes):
            f.write(f'"{g}"\t' + "\t".join(f"{gi + si + 1}.25"
                                           for si in range(2)) + "\n")

    bin_dir = os.path.join(tmp_out, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    if shutil.which("gawk"):
        os.symlink(shutil.which("gawk"), os.path.join(bin_dir, "awk"))
    else:
        shim = os.path.join(bin_dir, "awk")
        open(shim, "w").write(_GAWK_SHIM)
        os.chmod(shim, 0o755)
    subprocess.run(["bash", REF_CONFLICT_SE, prj], check=True,
                   capture_output=True, text=True,
                   env={**os.environ, "baseDir": basedir,
                        "PATH": f"{bin_dir}:{os.environ['PATH']}"})
    golden_path = os.path.join(basedir, f"{prj}_sex_conflict_report.txt")
    lines = open(golden_path).read().rstrip("\n").split("\n")
    golden = {}
    for line in lines[2:]:
        parts = line.split("\t")
        golden[parts[0]] = (parts[1], parts[2], parts[3], parts[4],
                            parts[5:])
    assert set(golden) == {"GSM1", "GSM2", "GSMX"}

    sex_df = spark.createDataFrame(
        [(s, i, c, None if r == "Inf" else float(r), a)
         for s, i, c, r, a in sex_rows],
        "SampleID string, InputSex string, ComputedSex string, "
        "Ratio double, Agreement string")
    expr = spark.createDataFrame(
        [(s, g, float(f"{gi + si + 1}.25"), 0.0)
         for si, s in enumerate(samples) for gi, g in enumerate(genes)],
        ["sample", "feature_id", "TPM", "expected_count"])
    ours = {r["SampleID"]: r
            for r in conflict_report(sex_df, expr, how="left").collect()}

    assert set(ours) == set(golden)
    for s, (isex, csex, _ratio, agr, tpms) in golden.items():
        r = ours[s]
        assert (r["InputSex"], r["ComputedSex"], r["Agreement"]) == \
            (isex, csex, agr), s
        for g, tv in zip(SEX_GENES, tpms):
            if tv == "NA":
                assert r[g] is None, (s, g)      # NA at the sink
            else:
                assert r[g] == float(tv), (s, g)
