"""Fixed schemas for every table the engine touches.

The reference's schemas are positional and implicit (SURVEY §1.3: "fixed
by position, never inferred"; the Perl matrix builder hard-fails on row
mismatch, ``dependencies/rsem-generate-data-matrix:46-54``). Here every
table gets an explicit ``StructType``: metadata is ``StringType``, read
counts ``LongType``, TPM/coverage/ratios ``DoubleType`` — sentinel strings
(``NA``, ``Inf``, ``Unknown``) are represented as NULL internally and
re-materialized only at sink time (see ``functions.formatting``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- D1: AccList — run-level sample metadata -------------------------------
# Columns destructured at run_RNApipeline_pairedG8_diskGuard.bash:557
# (read -r run geo_accession Tissue Strain Sex PMID GEOpath Title
#  Sample_characteristics StrainInfo).
ACCLIST = T.StructType([
    T.StructField("Run", T.StringType()),
    T.StructField("geo_accession", T.StringType()),
    T.StructField("Tissue", T.StringType()),
    T.StructField("Strain", T.StringType()),
    T.StructField("Sex", T.StringType()),
    T.StructField("PMID", T.StringType()),
    T.StructField("GEOpath", T.StringType()),
    T.StructField("Title", T.StringType()),
    T.StructField("Sample_characteristics", T.StringType()),
    T.StructField("StrainInfo", T.StringType()),
])

# --- D2: project list — orchestrator input ----------------------------------
# Parsed at bulk_orchestrator_production_diskGuard.bash:220-231.
PROJECT_LIST = T.StructType([
    T.StructField("acclist_path", T.StringType()),
    T.StructField("BioProjectID", T.StringType()),
    T.StructField("read_length", T.IntegerType()),
])

# --- D3: STAR Log.final.out, long form (after SRC3 key-value scan) ----------
STAR_LOG_KV = T.StructType([
    T.StructField("sample", T.StringType()),
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
])

# --- STARQC summary (output of plans.starqc; header at pSTARQC_v1.sh:63) ----
STARQC_SUMMARY = T.StructType([
    T.StructField("SampleID", T.StringType()),
    T.StructField("Input_Reads", T.LongType()),
    T.StructField("Unmapped_Total", T.LongType()),
    T.StructField("Unmapped_Rate", T.DoubleType()),
    T.StructField("Status", T.StringType()),  # PASS/FAIL/NO_LOG/INVALID_LOG
])

# --- D4: samtools idxstats table --------------------------------------------
# Consumed at scripts/ComputeSex_v5.sh:111-117.
IDXSTATS = T.StructType([
    T.StructField("sample", T.StringType()),
    T.StructField("chrom", T.StringType()),
    T.StructField("seq_length", T.LongType()),
    T.StructField("mapped", T.LongType()),
    T.StructField("unmapped", T.LongType()),
])

# --- D5: RSEM per-sample results ---------------------------------------------
# Column positions hardcoded at dependencies/rsem-generate-data-matrix:16-17;
# we read by NAME, fixing the reference's positional fragility (SURVEY SRC5).
RSEM_GENES = T.StructType([
    T.StructField("gene_id", T.StringType()),
    T.StructField("transcript_ids", T.StringType()),
    T.StructField("length", T.DoubleType()),
    T.StructField("effective_length", T.DoubleType()),
    T.StructField("expected_count", T.DoubleType()),
    T.StructField("TPM", T.DoubleType()),
    T.StructField("FPKM", T.DoubleType()),
])

# Isoform layout: transcript_id leads, gene_id second, IsoPct appended
# (dependencies/rsem-generate-data-matrix:16-17 positional contract).
RSEM_ISOFORMS = T.StructType(
    [T.StructField("transcript_id", T.StringType()),
     T.StructField("gene_id", T.StringType())]
    + RSEM_GENES.fields[2:]
    + [T.StructField("IsoPct", T.DoubleType())]
)

# Long-form expression fact table — the engine's canonical internal shape
# (SURVEY §7.2: "keep long-form canonical, pivot lazily").
EXPRESSION_LONG = T.StructType([
    T.StructField("sample", T.StringType()),
    T.StructField("feature_id", T.StringType()),
    T.StructField("TPM", T.DoubleType()),
    T.StructField("expected_count", T.DoubleType()),
])

# --- D7: sex result table (schema written at ComputeSex_v5.sh:148) ----------
# Ratio is nullable double internally; the literal "Inf" sentinel
# (ComputeSex_v5.sh:120-124) is re-materialized at TSV-sink time.
SEX_RESULT = T.StructType([
    T.StructField("SampleID", T.StringType()),
    T.StructField("InputSex", T.StringType()),
    T.StructField("ComputedSex", T.StringType()),
    T.StructField("Ratio", T.DoubleType()),
    T.StructField("Agreement", T.StringType()),
])

# --- D9: BED interval tables --------------------------------------------------
BED4 = T.StructType([
    T.StructField("chrom", T.StringType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("name", T.StringType()),
])

BED9 = T.StructType(BED4.fields + [
    T.StructField("score", T.LongType()),
    T.StructField("strand", T.StringType()),
    T.StructField("thickStart", T.LongType()),
    T.StructField("thickEnd", T.LongType()),
    T.StructField("itemRgb", T.StringType()),
])

# --- D11 input: simplified alignment table (FIXTURES.md §10) -----------------
ALIGNMENTS = T.StructType([
    T.StructField("sample", T.StringType()),
    T.StructField("chrom", T.StringType()),
    T.StructField("pos", T.LongType()),
    T.StructField("read_len", T.IntegerType()),
    T.StructField("mapq", T.IntegerType()),
])

# --- Driver test tables (TESTDATA.md) ----------------------------------------
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load the driver's parquet tables. Parquet scans get column pruning
    and predicate pushdown from Catalyst for free."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
