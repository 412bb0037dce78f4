"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard near-dup — all built from built-in expressions
over the portable md5 hash family (``functions.hashing``), so every step is
reproducible in the DuckDB oracle AND runs JVM-side with whole-stage codegen.

Scale design notes (100 TB):
- the only shuffles are the per-doc signature aggregation and the band
  bucket join; candidate pairs are generated per-bucket, never all-pairs;
- md5-per-shingle is CPU inside codegen — no Python boundary anywhere;
- band hashes are 60-bit ints, so the bucket join shuffles (long, long)
  keys, not shingle strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long
from rgd_rnaseq_workflows_spark.session import checkpoint_df
from rgd_rnaseq_workflows_spark.functions.text import shingles, tokens


# --- exact -------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 fingerprint groupBy, keep the lowest id per group
    (deterministic — `dropDuplicates` would keep an arbitrary row)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: (fingerprint, n_copies, keeper_id) for
    groups with >1 member."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("fingerprint"))
            .agg(F.count("*").alias("n_copies"),
                 F.min(id_col).alias("keeper_id"))
            .filter(F.col("n_copies") > 1))


# --- MinHash + LSH -------------------------------------------------------------

MINHASH_P = (1 << 31) - 1  # Mersenne prime > the 2^30-reduced base universe


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the universal family
    h_i(x) = (a_i·x + b_i) mod p — fixed integer literals, so any engine
    (the DuckDB oracle included) reproduces them exactly."""
    return [((2654435761 * (i + 1)) % MINHASH_P | 1,
             (40503 * (i + 7919) + 12345) % MINHASH_P)
            for i in range(num_hashes)]


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: k columns ``h0..h{k-1}``.

    ONE md5 per shingle (not k): the 60-bit md5 is reduced to a 30-bit
    base, then k universal hashes (a_i·x + b_i) mod p permute it — pure
    int64 arithmetic inside codegen, overflow-free (a_i < 2^31, x < 2^30).
    One explode + one groupBy with k partial-aggregated mins.
    """
    base = F.pmod(md5_long(F.col("s")), F.lit(1 << 30))
    sh = (df.select(F.col(id_col),
                    F.explode(shingles(text_col, shingle_n)).alias("s"))
          .select(F.col(id_col), base.alias("x")))
    aggs = [F.min((F.col("x") * a + b) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id",
              num_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """Banded signature table (id, band_idx, band_hash) — the LSH bucket
    keys. 60-bit band hashes, so any bucket join shuffles (long, long)
    keys, not signature strings."""
    n_bands = num_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + r}").cast("string")
                for r in range(band_size)]
        bands.append(F.struct(
            F.lit(b).alias("band_idx"),
            md5_long(F.concat_ws("_", *cols)).alias("band_hash")))
    return (signatures
            .select(F.col(id_col), F.explode(F.array(*bands)).alias("band"))
            .select(id_col, "band.band_idx", "band.band_hash"))


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        num_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """LSH banding: hash each band of the signature, bucket-join docs that
    collide in ANY band → candidate pairs (a << b).

    The self-join shuffles only (band_idx, band_hash, id) — tiny rows —
    and buckets are natural partitions; a skewed bucket (e.g. empty-doc
    signature) is handled by AQE skew-join splitting (test-pinned,
    ``tests/test_skew.py``).
    """
    banded = lsh_bands(signatures, id_col, num_hashes, band_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, ["band_idx", "band_hash"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def verify_jaccard(pairs: DataFrame, df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", shingle_n: int = 3,
                   threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard verification of candidate pairs: join each side's
    shingle set back, ``|∩| / |∪|``, keep pairs ≥ threshold.

    Sets are carried as md5-hashed sorted longs (8 bytes/shingle instead
    of the shingle string) — the candidate-pair join shuffles a fraction
    of the bytes and the intersection compares longs. Set cardinalities
    are preserved (60-bit hashes; a collision inside one pair's union is
    ~2^-40 at 1M shingles)."""
    sets_df = df.select(
        F.col(id_col),
        F.array_sort(F.transform(shingles(text_col, shingle_n),
                                 lambda s: md5_long(s))).alias("sh"))
    out = (pairs
           .join(sets_df.withColumnRenamed(id_col, "id_a")
                        .withColumnRenamed("sh", "sh_a"), "id_a")
           .join(sets_df.withColumnRenamed(id_col, "id_b")
                        .withColumnRenamed("sh", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (out.withColumn("jaccard", F.round(inter / union, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", num_hashes: int = 8,
                        band_size: int = 2, shingle_n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """End-to-end MinHash-LSH near-dup: signatures → banded candidates →
    exact-Jaccard verification.

    The hashed shingle-set table is built ONCE (``checkpoint_df`` —
    reliable ``checkpoint()`` when a checkpoint dir is configured,
    ``localCheckpoint`` otherwise) and
    feeds both stages: signatures derive from the exploded 60-bit hashes
    (the signature's base is the same md5 family), and verification
    intersects the sorted arrays — without the shared materialization the
    shingle scan runs three times (signature + two verify sides)."""
    hashed = (df.select(
        F.col(id_col),
        F.array_sort(F.transform(shingles(text_col, shingle_n),
                                 lambda s: md5_long(s))).alias("hs"))
        .transform(checkpoint_df, eager=False))
    base = F.pmod(F.col("h"), F.lit(1 << 30))
    sh = (hashed.select(F.col(id_col), F.explode("hs").alias("h"))
          .select(F.col(id_col), base.alias("x")))
    aggs = [F.min((F.col("x") * a + b) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))]
    # checkpoint the doc-scale signature table (r12, guide §2.4/§5):
    # the banded candidate self-join consumes it from BOTH sides, and
    # one side sits under a BroadcastExchange, so exchange reuse never
    # matches the two subtrees — un-truncated, the shingle explode +
    # k-min aggregation ran twice (the 0b09c40 PPJoin failure mode,
    # same cure as minhash_calibration_report already had)
    sigs = (sh.groupBy(id_col).agg(*aggs)
            .transform(checkpoint_df, eager=False))
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    sets_df = hashed
    out = (cand
           .join(sets_df.withColumnRenamed(id_col, "id_a")
                        .withColumnRenamed("hs", "sh_a"), "id_a")
           .join(sets_df.withColumnRenamed(id_col, "id_b")
                        .withColumnRenamed("hs", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (out.withColumn("jaccard", F.round(inter / union, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_calibration_report(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id",
                               num_hashes: int = 8, band_size: int = 2,
                               shingle_n: int = 3,
                               n_buckets: int = 10) -> DataFrame:
    """Measured MinHash estimator quality — the dedup family's
    "measure, don't guess" gate (the ``retrieval_recall_report``
    discipline applied to near-dup): over the LSH candidate pairs
    themselves, the signature-AGREEMENT estimate of Jaccard
    (``est_bp = 10000·|{i: hᵢ(a)=hᵢ(b)}| div k``) is compared against
    the exact shingle-set Jaccard, bucketed by estimate decile —
    (bucket, n_pairs, mean_est_bp, mean_exact_bp, mean_abs_err_bp),
    exact integers end to end. A drifting mean_abs_err says the
    signature width is too small for the corpus's similarity range;
    a systematic est>exact bias in low buckets quantifies the LSH
    false-candidate cost BEFORE committing a 100 TB dedup run to
    those parameters.

    Scale shape: the hashed shingle-set frame is built once
    (checkpoint) and feeds signatures AND the exact side; candidates
    come from the banded bucket join (never all-pairs); the report
    aggregation is n_buckets rows.
    """
    if num_hashes < 1 or num_hashes % band_size:
        raise ValueError("num_hashes must be a positive multiple of "
                         "band_size")
    if not 1 <= n_buckets <= 10000:
        raise ValueError("n_buckets must be in [1, 10000]")
    hashed = (df.select(
        F.col(id_col),
        F.array_sort(F.transform(shingles(text_col, shingle_n),
                                 lambda s: md5_long(s))).alias("hs"))
        .transform(checkpoint_df, eager=False))
    base = F.pmod(F.col("h"), F.lit(1 << 30))
    sh = (hashed.select(F.col(id_col), F.explode("hs").alias("h"))
          .select(F.col(id_col), base.alias("x")))
    aggs = [F.min((F.col("x") * a + b) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))]
    sigs = (sh.groupBy(id_col).agg(*aggs)
            .transform(checkpoint_df, eager=False))
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    sa = sigs.select(F.col(id_col).alias("id_a"),
                     *[F.col(f"h{i}").alias(f"a{i}")
                       for i in range(num_hashes)])
    sb = sigs.select(F.col(id_col).alias("id_b"),
                     *[F.col(f"h{i}").alias(f"b{i}")
                       for i in range(num_hashes)])
    sets_a = (hashed.withColumnRenamed(id_col, "id_a")
              .withColumnRenamed("hs", "sh_a"))
    sets_b = (hashed.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("hs", "sh_b"))
    agree = " + ".join(f"CAST(a{i} = b{i} AS BIGINT)"
                       for i in range(num_hashes))
    pairs = (cand.join(sa, "id_a").join(sb, "id_b")
             .join(sets_a, "id_a").join(sets_b, "id_b")
             .select(
                 F.expr(f"10000 * ({agree}) div {num_hashes}")
                 .alias("est_bp"),
                 F.expr("10000 * size(array_intersect(sh_a, sh_b)) div "
                        "size(array_union(sh_a, sh_b))").alias("exact_bp")))
    bw = 10000 // n_buckets
    return (pairs
            .select(F.least(F.expr(f"est_bp div {bw}"),
                            F.lit(n_buckets - 1)).cast("long")
                    .alias("bucket"), "est_bp", "exact_bp")
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.expr("sum(est_bp) div count(*)").cast("long")
                 .alias("mean_est_bp"),
                 F.expr("sum(exact_bp) div count(*)").cast("long")
                 .alias("mean_exact_bp"),
                 F.expr("sum(abs(est_bp - exact_bp)) div count(*)")
                 .cast("long").alias("mean_abs_err_bp"))
            .orderBy("bucket"))


def minhash_calibration_sql(table: str, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_hashes: int = 8, band_size: int = 2,
                            shingle_n: int = 3,
                            n_buckets: int = 10) -> str:
    """DuckDB twin of :func:`minhash_calibration_report` — identical
    hash family, banding, agreement estimate, exact Jaccard and
    integer bucketing."""
    if num_hashes < 1 or num_hashes % band_size:
        raise ValueError("num_hashes must be a positive multiple of "
                         "band_size")
    if not 1 <= n_buckets <= 10000:
        raise ValueError("n_buckets must be in [1, 10000]")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
    sh_expr = shingles_sql(text_col, shingle_n)
    base = f"(({md5_long_sql('s')}) % {1 << 30})"
    mins = ",\n         ".join(
        f"MIN(({base} * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes)))
    n_bands = num_hashes // band_size
    band_selects = []
    for b in range(n_bands):
        cols = " || '_' || ".join(
            f"CAST(h{b * band_size + r} AS VARCHAR)"
            for r in range(band_size))
        band_selects.append(
            f"SELECT {id_col}, {b} AS band_idx, "
            f"{md5_long_sql(f'({cols})')} AS band_hash FROM sig")
    bands = " UNION ALL ".join(band_selects)
    agree = " + ".join(f"CAST(x.h{i} = y.h{i} AS BIGINT)"
                       for i in range(num_hashes))
    bw = 10000 // n_buckets
    return f"""
WITH sh AS (SELECT {id_col}, unnest({sh_expr}) AS s FROM {table}),
sig AS (SELECT {id_col}, {mins} FROM sh GROUP BY {id_col}),
bands AS ({bands}),
cand AS (SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
         FROM bands a JOIN bands b USING (band_idx, band_hash)
         WHERE a.{id_col} < b.{id_col}),
sets AS (SELECT {id_col}, {sh_expr} AS sh FROM {table}),
pairs AS (
  SELECT (10000 * ({agree})) // {num_hashes} AS est_bp,
         (10000 * len(list_intersect(sx.sh, sy.sh)))
           // len(list_distinct(sx.sh || sy.sh)) AS exact_bp
  FROM cand c
  JOIN sig x ON x.{id_col} = c.id_a
  JOIN sig y ON y.{id_col} = c.id_b
  JOIN sets sx ON sx.{id_col} = c.id_a
  JOIN sets sy ON sy.{id_col} = c.id_b)
SELECT CAST(least(est_bp // {bw}, {n_buckets - 1}) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(est_bp) // count(*) AS BIGINT) AS mean_est_bp,
       CAST(sum(exact_bp) // count(*) AS BIGINT) AS mean_exact_bp,
       CAST(sum(abs(est_bp - exact_bp)) // count(*) AS BIGINT)
         AS mean_abs_err_bp
FROM pairs GROUP BY 1 ORDER BY 1
"""


def cross_corpus_minhash_pairs(new: DataFrame, old: DataFrame,
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               num_hashes: int = 8, band_size: int = 2,
                               shingle_n: int = 3,
                               threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora — dedup a new crawl/delta
    against the existing lake: (id_new, id_old, jaccard).

    The incremental-ingestion shape a 100 TB pipeline actually runs
    daily: the candidate join is new-bands × old-bands ONLY (never
    old × old — the lake is already deduped, and re-self-joining it per
    delta would dominate everything). With |new| ≪ |old| the banded new
    side broadcasts; either way the bucket join shuffles (long, long)
    band keys and verification intersects md5-hashed sorted-long shingle
    sets, so corpus text never moves. Same signature family as
    :func:`minhash_dedup_pairs`, so stored lake signatures/bands can be
    reused delta-over-delta instead of recomputed.
    """
    def _hashed(df):
        return (df.select(
            F.col(id_col),
            F.array_sort(F.transform(shingles(text_col, shingle_n),
                                     lambda s: md5_long(s))).alias("hs"))
            .transform(checkpoint_df, eager=False))

    def _sigs(hashed):
        base = F.pmod(F.col("h"), F.lit(1 << 30))
        sh = (hashed.select(F.col(id_col), F.explode("hs").alias("h"))
              .select(F.col(id_col), base.alias("x")))
        aggs = [F.min((F.col("x") * a + b) % MINHASH_P).alias(f"h{i}")
                for i, (a, b) in enumerate(minhash_params(num_hashes))]
        return sh.groupBy(id_col).agg(*aggs)

    hn, ho = _hashed(new), _hashed(old)
    bn = (lsh_bands(_sigs(hn), id_col, num_hashes, band_size)
          .withColumnRenamed(id_col, "id_new"))
    bo = (lsh_bands(_sigs(ho), id_col, num_hashes, band_size)
          .withColumnRenamed(id_col, "id_old"))
    cand = (bn.join(bo, ["band_idx", "band_hash"])
            .select("id_new", "id_old").distinct())
    out = (cand
           .join(hn.select(F.col(id_col).alias("id_new"),
                           F.col("hs").alias("sh_n")), "id_new")
           .join(ho.select(F.col(id_col).alias("id_old"),
                           F.col("hs").alias("sh_o")), "id_old"))
    inter = F.size(F.array_intersect("sh_n", "sh_o"))
    union = F.size(F.array_union("sh_n", "sh_o"))
    return (out.withColumn("jaccard", F.round(inter / union, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_new", "id_old", "jaccard"))


def minhash_diversity_report(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id",
                             num_hashes: int = 8,
                             shingle_n: int = 3) -> DataFrame:
    """Corpus-level diversity from MinHash collision counts: the mean
    pairwise Jaccard similarity ESTIMATOR, computed exactly without
    materializing a single pair. Per slot h, two documents collide iff
    their minimum permuted shingle agrees — an event with probability
    J(a,b) — so the per-slot colliding-pair share ``Σ_v C(c_v, 2) /
    C(n, 2)`` is an unbiased estimate of the corpus mean pairwise
    Jaccard (higher = more redundant corpus, the dedup pre-flight
    number). The per-slot spread across ``num_hashes`` independent
    permutations is the estimator's own error bar.

    All counts are exact integers; the share is integer basis points,
    so both engines agree bit-for-bit. Returns one row per slot:
    (slot, n_docs, n_distinct, colliding_pairs, mean_jaccard_bp).

    Scale shape: signatures are the standard one-explode / one-groupBy
    lineage (:func:`minhash_signatures`); the slot-value histogram
    collapses map-side to ≤ k·|distinct| rows and the report is k rows
    — NO pair is ever enumerated, unlike the LSH candidate path, which
    is what makes this runnable as a pre-flight on the full corpus."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    slots = F.array(*[
        F.struct(F.lit(i).alias("slot"), F.col(f"h{i}").alias("v"))
        for i in range(num_hashes)])
    hist = (sig.select(F.explode(slots).alias("s"))
            .groupBy("s.slot", "s.v").agg(F.count("*").alias("c")))
    return (hist.groupBy("slot")
            .agg(F.sum("c").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_distinct"),
                 F.sum(F.expr("c * (c - 1) div 2")).cast("long")
                 .alias("colliding_pairs"))
            .withColumn("mean_jaccard_bp", F.expr(
                "CASE WHEN n_docs < 2 THEN 0 ELSE 10000 * "
                "colliding_pairs div (n_docs * (n_docs - 1) div 2) END")
                .cast("long"))
            .select(F.col("slot").cast("int").alias("slot"), "n_docs",
                    "n_distinct", "colliding_pairs", "mean_jaccard_bp")
            .orderBy("slot"))


def minhash_diversity_sql(table: str, text_col: str = "text",
                          id_col: str = "doc_id", num_hashes: int = 8,
                          shingle_n: int = 3) -> str:
    """DuckDB twin of :func:`minhash_diversity_report` — identical hash
    family, per-slot histogram and integer pair counts."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
    sh_expr = shingles_sql(text_col, shingle_n)
    base = f"(({md5_long_sql('s')}) % {1 << 30})"
    mins = ",\n         ".join(
        f"MIN(({base} * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes)))
    arms = " UNION ALL ".join(
        f"SELECT {i} AS slot, h{i} AS v FROM sig"
        for i in range(num_hashes))
    return f"""
WITH sh AS (SELECT {id_col}, unnest({sh_expr}) AS s FROM {table}),
sig AS (SELECT {id_col}, {mins} FROM sh GROUP BY {id_col}),
hist AS (
  SELECT slot, v, count(*) AS c FROM ({arms}) GROUP BY slot, v)
SELECT CAST(slot AS INTEGER) AS slot,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS colliding_pairs,
       CAST(CASE WHEN sum(c) < 2 THEN 0 ELSE 10000 *
              sum(c * (c - 1) // 2)
              // (sum(c) * (sum(c) - 1) // 2) END AS BIGINT)
         AS mean_jaccard_bp
FROM hist GROUP BY slot ORDER BY slot
"""


def source_overlap_minhash(df: DataFrame, group_col: str = "source",
                           text_col: str = "text",
                           num_hashes: int = 16,
                           shingle_n: int = 3) -> DataFrame:
    """Pairwise SOURCE-level shingle-set overlap — the corpus-mixing
    pre-flight that answers "which feeds are re-crawling each other?"
    before any document-level dedup runs. Each group's shingle SET is
    summarized by one MinHash signature (slot i = min permuted hash
    over every shingle in every document of the group); for two groups
    the share of agreeing slots is the standard unbiased estimate of
    the Jaccard similarity of their shingle sets. Two sources with
    high estimated Jaccard are near-mirror feeds — dedup them
    cross-corpus (:func:`cross_corpus_minhash_pairs`) before burning
    compute curating both.

    All slot minima are exact integers from the shared md5-universal
    hash family, so both engines compute identical signatures and the
    agreement count is engine-exact. Returns one row per unordered
    group pair (group_a < group_b): (group_a, group_b, n_agree,
    jaccard_bp = 10000·n_agree div num_hashes).

    Scale shape: ONE shingle explode + ONE map-side-combined
    groupBy(group) with k partial mins — the corpus collapses to
    |groups| signature rows; the pair join runs on that metadata-scale
    frame (broadcast self-join), so no document pair and no shingle
    pair is ever enumerated. The slot mins are MERGEABLE (min), so
    ``streaming.corpus_stream.stream_source_signatures`` maintains the
    identical signature table incrementally and
    :func:`source_overlap_from_signatures` folds the live pair report
    off the sink without re-reading the corpus."""
    sig = source_signatures(df, group_col, text_col, num_hashes,
                            shingle_n)
    return source_overlap_from_signatures(sig, num_hashes)


def source_signatures(df: DataFrame, group_col: str = "source",
                      text_col: str = "text", num_hashes: int = 16,
                      shingle_n: int = 3) -> DataFrame:
    """The overlap report's sufficient statistic: per group the k slot
    minima (g, h0..h{k-1}) — one explode + one map-side-combined
    groupBy whose aggregates are all MIN (mergeable ⇒ maintainable
    under Structured Streaming in complete mode)."""
    base = F.pmod(md5_long(F.col("s")), F.lit(1 << 30))
    sh = (df.select(F.col(group_col).alias("g"),
                    F.explode(shingles(text_col, shingle_n)).alias("s"))
          .select("g", base.alias("x")))
    aggs = [F.min((F.col("x") * a + b) % MINHASH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(minhash_params(num_hashes))]
    return sh.groupBy("g").agg(*aggs)


def source_overlap_from_signatures(sig: DataFrame,
                                   num_hashes: int = 16) -> DataFrame:
    """Fold the pairwise overlap report from a PREBUILT signature
    table (batch-computed or stream-maintained) — |groups|²-scale
    metadata work only. Sides are disambiguated by RENAME, not alias:
    a memory-sink view self-joined through aliases trips Spark's
    self-join attribute resolution."""
    a = sig.select(F.col("g").alias("ga"),
                   *[F.col(f"h{i}").alias(f"xa{i}")
                     for i in range(num_hashes)])
    b = sig.select(F.col("g").alias("gb"),
                   *[F.col(f"h{i}").alias(f"xb{i}")
                     for i in range(num_hashes)])
    agree = sum(
        (F.col(f"xa{i}") == F.col(f"xb{i}")).cast("long")
        for i in range(num_hashes))
    return (a.join(F.broadcast(b), F.col("ga") < F.col("gb"))
            .select(F.col("ga").alias("group_a"),
                    F.col("gb").alias("group_b"),
                    agree.alias("n_agree"))
            .withColumn("jaccard_bp", F.expr(
                f"10000 * n_agree div {num_hashes}").cast("long"))
            .orderBy("group_a", "group_b"))


def source_overlap_minhash_sql(table: str, group_col: str = "source",
                               text_col: str = "text",
                               num_hashes: int = 16,
                               shingle_n: int = 3) -> str:
    """DuckDB twin of :func:`source_overlap_minhash` — identical hash
    family, per-group slot minima, and slot-agreement count."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
    sh_expr = shingles_sql(text_col, shingle_n)
    base = f"(({md5_long_sql('s')}) % {1 << 30})"
    mins = ",\n         ".join(
        f"MIN(({base} * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_params(num_hashes)))
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes))
    return f"""
WITH sh AS (SELECT {group_col} AS g, unnest({sh_expr}) AS s
            FROM {table}),
sig AS (SELECT g, {mins} FROM sh GROUP BY g)
SELECT a.g AS group_a, b.g AS group_b,
       CAST({agree} AS BIGINT) AS n_agree,
       CAST((10000 * ({agree})) // {num_hashes} AS BIGINT)
         AS jaccard_bp
FROM sig a JOIN sig b ON a.g < b.g
ORDER BY group_a, group_b
"""


# --- n-gram Jaccard with key blocking -------------------------------------------

def hashed_shingles(text_col: str = "text", n: int = 1):
    """The PPJoin token set as a COLUMN expression: sorted 64-bit
    xxhash64 hashes of the word n-gram shingles. Exposed so a pipeline
    can materialize it ONCE on its shared survivor frame (the
    one-token-frame curation contract, ``plans.corpus``) and hand it to
    :func:`ngram_jaccard_pairs` via ``hashed_col`` instead of paying a
    second derivation + checkpoint round.

    Hash choice (r11, guide §4.1 "prefer built-ins"): these hashes are
    INTERNAL set elements only — every consumer's oracle compares
    string-shingle results (``ngram_jaccard`` twins) or pure set
    CARDINALITIES (``greedy_max_cover``), never the hash values — so
    the portable-md5 requirement that binds ``md5_long`` users does not
    apply here. ``xxhash64`` runs in whole-stage codegen (no
    MessageDigest + hex `conv` per shingle); measured 0.94 → 0.70 s for
    the sf0.1 shingle table. 64-bit vs the md5-substring's 60-bit also
    strictly lowers the collision odds both forms already rely on."""
    return F.array_sort(F.transform(shingles(text_col, n),
                                    lambda s: F.xxhash64(s)))


# Per-doc shingle-count bound for the collect_list prefix build: a doc
# with more distinct shingles than this routes through the spill-safe
# row_number window instead (see ngram_jaccard_pairs). 2^18 structs of
# (int df, long tok) keep the largest aggregation buffer ~4 MB.
PPJOIN_PREFIX_COLLECT_CAP = 1 << 18


def ngram_jaccard_pairs(df: DataFrame, block_col: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 1,
                        threshold: float = 0.5,
                        broadcast_verify: bool | None = None,
                        hashed_col: str | None = None,
                        collect_cap: int = PPJOIN_PREFIX_COLLECT_CAP
                        ) -> DataFrame:
    """Blocked n-gram Jaccard: compare only docs sharing ``block_col``
    (at scale the block is a cheap partition key — source, language, LSH
    bucket), then exact set Jaccard.

    Scale design — this is a PPJoin set-similarity join, never an
    all-pairs loop:
    - shingles are hashed to 64-bit xxhash64 ints once (array ops on
      longs, not strings — see :func:`hashed_shingles` for the
      collision-conditional cross-engine note); the hashed table is
      materialized once (``checkpoint_df``) because four plan subtrees
      consume it;
    - **canonical frequency ordering**: tokens are ranked per block by
      ascending document frequency (one agg + one per-doc window), so each
      doc's prefix holds its RAREST tokens — the classic PPJoin ordering;
      a hot token that appears in thousands of docs lands in nobody's
      prefix and generates no candidates;
    - **prefix filtering**: two sets with J(A,B) ≥ t must share a token
      among each one's first ⌊(1−t)·|A|⌋+1 under the shared order; only
      those are exploded into the inverted index (~20% at t=0.8);
    - **length + position filtering** pushed into the join condition:
      |A| ≥ t·|B|, and from match positions the overlap upper bound
      1 + min(|A|−i, |B|−j) must reach α = ⌈t·(|A|+|B|)/(1+t)⌉;
    - exact Jaccard verifies each distinct candidate once via sorted-long
      array intersection: |A∩B| / (|A|+|B|−|A∩B|). ``broadcast_verify``
      is SIZE-GATED by default (``None``): the verify joins carry no
      hint, and AQE decides broadcast-vs-shuffle at runtime from the
      actual shuffle-stage size — small corpora get the broadcast plan
      for free, a full-scale corpus degrades cleanly to the shuffle
      join instead of OOMing the executors on a forced broadcast.
      ``True`` forces the broadcast hint (caller knows the per-doc set
      table fits); ``False`` forces sort-merge (the ``merge`` hint, so
      not even AQE broadcasts).

    Output is provably identical to the naive blocked all-pairs version —
    the DuckDB oracle runs that naive form, so the pruning logic itself is
    cross-checked.

    ``hashed_col``: a pre-computed :func:`hashed_shingles` array column
    on ``df``. When given, the four consumer subtrees project straight
    off ``df`` — the caller has already materialized the frame (the
    shared-token-frame contract: ``plans.corpus`` checkpoints ONE
    survivor frame carrying text + token stats + hashed shingles, so
    the chain pays one materialization round, not two).
    """
    if hashed_col is not None:
        hashed = (df.select(F.col(id_col), F.col(block_col).alias("_blk"),
                            F.col(hashed_col).alias("hs"))
                  .withColumn("sz", F.size("hs")))
    else:
        hashed = (df.select(F.col(id_col), F.col(block_col).alias("_blk"),
                            hashed_shingles(text_col, shingle_n)
                            .alias("hs"))
                  .withColumn("sz", F.size("hs"))
                  .transform(checkpoint_df, eager=False))
    exploded = hashed.select(F.col(id_col), "_blk", "sz",
                             F.explode("hs").alias("tok"))
    freq = exploded.groupBy("_blk", "tok").agg(F.count("*").alias("df"))
    # epsilon-safe rounding (r12, advisor finding): every pruning bound
    # below is an exact rational (e.g. sz·(1−t)) evaluated in doubles,
    # and at exact-integer boundaries the double drifts BELOW the true
    # value (5·0.2 → 0.999…8), silently SHORTENING the prefix /
    # RAISING alpha / FAILING the length filter — a false negative vs
    # the naive oracle on boundary pairs (two 9-shingle docs sharing 8
    # at t=0.8). The epsilon is always applied in the pruning-WEAKENING
    # direction (longer prefix, smaller alpha, permissive length
    # filter), so it can only admit extra candidates for the exact
    # verify stage to re-check — never drop a true pair.
    _EPS = 1e-9
    prefix_len = (F.floor(F.col("sz") * (1.0 - threshold) + _EPS) + 1) \
        .cast("int")
    # canonical per-doc rank in the ARRAY domain (r11): collect each
    # doc's (df, tok) pairs, sort once per doc, slice the prefix, THEN
    # posexplode — same single exchange as the old
    # row_number().over(partitionBy(id)) window, but the prefix filter
    # runs before any row leaves the aggregation (the window ranked all
    # tokens and filtered after its partition-wide sort), and the sort
    # is per-doc (Σ sz·log sz) instead of per-partition
    # (N·log N over every exploded row). (df, tok) struct order ==
    # (df ASC, tok ASC), the exact window order; ties are impossible
    # (hs is distinct per doc).
    joined = exploded.join(freq, ["_blk", "tok"])
    pref = (joined.filter(F.col("sz") <= collect_cap)
            .groupBy(F.col(id_col), "_blk", "sz")
            .agg(F.sort_array(F.collect_list(F.struct("df", "tok")))
                 .alias("_st"))
            .select(F.col(id_col), "_blk", "sz",
                    F.posexplode(F.slice("_st", F.lit(1), prefix_len)))
            .select(F.col(id_col), "_blk", "sz",
                    (F.col("pos") + 1).cast("int").alias("pos"),
                    F.col("col.tok").alias("tok")))
    # memory guard (r12, r11-verdict task 6): collect_list cannot
    # spill, so one pathological document (shingle count above
    # ``collect_cap``) would OOM its aggregation task where the old
    # WindowExec form spilled its sort to disk. Docs over the cap take
    # exactly that window form — a per-doc sort-based rank that spills
    # safely — and produce the identical (pos, tok) prefix rows
    # ((df, tok) struct order == (df ASC, tok ASC), ties impossible).
    # The fallback branch's freq subtree is exchange-identical to the
    # main branch's, so it is planned as a reused shuffle stage, and
    # its doc side prunes to zero rows at the checkpoint scan when no
    # doc exceeds the cap (the normal case: plan shape gains one empty
    # union arm, verified in the r12 plan dumps / A-B).
    w_doc = Window.partitionBy(id_col, "_blk").orderBy("df", "tok")
    big = (joined.filter(F.col("sz") > collect_cap)
           .select(F.col(id_col), "_blk", "sz", "tok",
                   F.row_number().over(w_doc).cast("int").alias("pos"))
           .filter(F.col("pos") <= prefix_len)
           .select(F.col(id_col), "_blk", "sz", "pos", "tok"))
    pref = pref.unionByName(big)
    # the prefix table feeds BOTH sides of the candidate self-join;
    # planned un-truncated, each side re-runs the freq join + per-doc
    # rank window (one side sits under a BroadcastExchange, so AQE's
    # exchange reuse never matches the two subtrees). One lazy
    # checkpoint makes the prefix derivation run once — measured
    # 3.32s -> 2.72s (0.82x) interleaved at sf0.1, and at 100 TB it is
    # the difference between one and two passes over the ~20% prefix
    # slice of the token table
    pref = checkpoint_df(pref, eager=False)
    a, b = pref.alias("a"), pref.alias("b")
    alpha = F.ceil((F.col("a.sz") + F.col("b.sz"))
                   * threshold / (1.0 + threshold) - _EPS)
    # per-row positional bound, valid for EVERY matched token of a truly
    # similar pair: shared tokens ranked ≤ this one all sit in both
    # prefixes (≤ min(i,j) of them — global canonical order), shared
    # tokens ranked above it sit after (i, j) in both docs
    ubound = (F.least(F.col("a.pos"), F.col("b.pos"))
              + F.least(F.col("a.sz") - F.col("a.pos"),
                        F.col("b.sz") - F.col("b.pos")))
    # indexing-prefix gate (r11, Xiao et al. PPJoin): a true pair's
    # (sz, id)-SMALLER record must contribute a shared token from its
    # first ⌊(1−t)/(1+t)·sz⌋+1 tokens (overlap α ≥ ⌈2t/(1+t)·sz_small⌉
    # once the partner is at least as large bounds the smaller side's
    # needed prefix by the SHORT length, the larger side's by the long
    # probe prefix). Rather than restricting the join itself — which
    # drops match rows and thereby WEAKENS the accumulated filter
    # below (measured: candidates rose 106,718 → 141,707 at sf0.1
    # because smaller c also shrinks max_pos) — each match row carries
    # an ``is_short`` flag and the candidate aggregation requires ≥ 1
    # flagged row per pair: the accumulated bound keeps its full
    # symmetric-match strength AND the pair gains a strictly-pruning
    # extra requirement (hot tokens sit in ~45% fewer short prefixes
    # at t=0.8, the adversarial hot-key case at corpus scale; on the
    # high-overlap sf0.1 fixture it prunes only 106,718 → 106,670).
    short_a = (F.floor(F.col("a.sz") * (1.0 - threshold)
                       / (1.0 + threshold) + _EPS) + 1).cast("int")
    short_b = (F.floor(F.col("b.sz") * (1.0 - threshold)
                       / (1.0 + threshold) + _EPS) + 1).cast("int")
    # id_a < id_b in the join, so sz_a <= sz_b ⇒ a is the (sz, id)-min
    short_row = F.when(F.col("a.sz") <= F.col("b.sz"),
                       F.col("a.pos") <= short_a) \
                 .otherwise(F.col("b.pos") <= short_b)
    matches = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                      & (F.col("a._blk") == F.col("b._blk"))
                      & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
                      & (F.col("a.sz") >= F.col("b.sz") * threshold - _EPS)
                      & (F.col("b.sz") >= F.col("a.sz") * threshold - _EPS)
                      & (ubound >= alpha))
               .select(F.col(f"a.{id_col}").alias("id_a"),
                       F.col(f"b.{id_col}").alias("id_b"),
                       F.col("a.sz").alias("sz_a"),
                       F.col("b.sz").alias("sz_b"),
                       F.col("a.pos").alias("pos_a"),
                       F.col("b.pos").alias("pos_b"),
                       short_row.cast("int").alias("is_short")))
    # accumulated PPJoin filter (replaces the plain distinct, same one
    # shuffle): c = shared prefix tokens; by the canonical order every
    # shared token ranked below the LAST match is one of those c, and the
    # rest lie after (max_pos_a, max_pos_b) in both docs, so
    # overlap ≤ c + min(sz_a − max_pos_a, sz_b − max_pos_b) — a strictly
    # tighter candidate gate than any single-match bound
    agg_alpha = F.ceil((F.col("sz_a") + F.col("sz_b"))
                       * threshold / (1.0 + threshold) - _EPS)
    cand = (matches.groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count("*").alias("c"),
                 F.max("pos_a").alias("mpa"),
                 F.max("pos_b").alias("mpb"),
                 F.max("is_short").alias("has_short"))
            .filter((F.col("c")
                     + F.least(F.col("sz_a") - F.col("mpa"),
                               F.col("sz_b") - F.col("mpb")) >= agg_alpha)
                    & (F.col("has_short") == 1))
            .select("id_a", "id_b"))
    sets = hashed.select(F.col(id_col), "hs", "sz")
    if broadcast_verify is True:
        maybe_bc = F.broadcast
    elif broadcast_verify is False:
        maybe_bc = lambda x: x.hint("merge")  # noqa: E731
    else:  # size-gated: AQE picks broadcast iff runtime stats allow
        maybe_bc = lambda x: x  # noqa: E731
    out = (cand
           .join(maybe_bc(sets.select(F.col(id_col).alias("id_a"),
                                      F.col("hs").alias("hs_a"),
                                      F.col("sz").alias("sz_a"))), "id_a")
           .join(maybe_bc(sets.select(F.col(id_col).alias("id_b"),
                                      F.col("hs").alias("hs_b"),
                                      F.col("sz").alias("sz_b"))), "id_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.col("sz_a") + F.col("sz_b") - inter
    return (out.select("id_a", "id_b",
                       F.round(inter / union, 4).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# --- SimHash -------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32, seed: int = 101, shingle_n: int = 1) -> DataFrame:
    """Per-doc SimHash over distinct features (tokens, or word n-grams when
    ``shingle_n`` > 1 — much more discriminative on small vocabularies):
    for each bit j, sum ±1 votes from the feature hash's j-th bit; the
    sign becomes the fingerprint bit.

    Explode + one groupBy with ``bits`` conditional sums (all partial-
    aggregated). Portable: the same bit extraction runs in ANSI SQL."""
    feats = (F.array_distinct(tokens(text_col)) if shingle_n == 1
             else shingles(text_col, shingle_n))
    toks = df.select(F.col(id_col), F.explode(feats).alias("t"))
    h = md5_long(F.col("t"), seed=seed)

    # Bit-packed vote aggregation: instead of `bits` conditional sums,
    # pack 3 bit-lanes of 20-bit one-counts per int64 (ones_j < 2^20 ⇒
    # docs < 1M distinct features) → bits/3 sums. votes_j = 2·ones_j − n,
    # so bit_j = (2·ones_j > n). Result identical to the naive ±1 voting
    # (ties → 0), which is what the SQL oracle computes.
    lanes_per_word = 3
    n_words = (bits + lanes_per_word - 1) // lanes_per_word
    packed_sums = []
    for w in range(n_words):
        word = None
        for lane in range(lanes_per_word):
            j = w * lanes_per_word + lane
            if j >= bits:
                break
            one = F.shiftright(h, j).bitwiseAND(F.lit(1))
            contrib = one.cast("long") * F.lit(1 << (20 * lane))
            word = contrib if word is None else word + contrib
        packed_sums.append(F.sum(word).alias(f"w{w}"))
    per_doc = toks.groupBy(id_col).agg(*packed_sums,
                                       F.count("*").alias("_n"))
    fp = None
    for j in range(bits):
        w, lane = divmod(j, lanes_per_word)
        ones = F.shiftright(F.col(f"w{w}"), 20 * lane) \
                .bitwiseAND(F.lit((1 << 20) - 1))
        bit = F.when(ones * 2 > F.col("_n"), F.lit(2 ** j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32,
                       max_hamming: int = 3,
                       shingle_n: int = 1) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, COMPLETE under the
    standard Hamming-LSH guarantee: the fingerprint is split into
    ``max_hamming + 1`` disjoint bit blocks, so any pair differing in at
    most ``max_hamming`` bits must agree exactly on at least one block
    (pigeonhole over the blocks), and the join is equi on (block, key) —
    never cross. (Two halves would only cover ``max_hamming`` ≤ 1.)"""
    fps = simhash(df, text_col, id_col, bits, shingle_n=shingle_n)
    return hamming_near_pairs(fps, "simhash", id_col, bits, max_hamming)


def hamming_near_pairs(fps: DataFrame, sig_col: str, id_col: str,
                       bits: int, max_hamming: int = 3) -> DataFrame:
    """Near pairs by Hamming distance over ANY integer signature column
    (SimHash fingerprints, image perceptual hashes, audio fingerprints):
    the (max_hamming+1)-disjoint-block pigeonhole blocking — a pair
    within ``max_hamming`` bits must agree exactly on ≥1 block, so the
    join is equi on (block, key), never cross.

    The signature frame is checkpoint-truncated first: the blocked
    frame feeds BOTH sides of the equi-join, and un-truncated each side
    replays the caller's whole fingerprint derivation (for simhash: the
    feature explode + packed-vote aggregation over the corpus)."""
    fps = checkpoint_df(fps, eager=False)
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    parts, off = [], 0
    for p in range(n_blocks):
        width = base + (1 if p < extra else 0)
        parts.append(F.struct(
            F.lit(p).alias("part"),
            (F.shiftright(sig_col, off)
             .bitwiseAND(F.lit(2 ** width - 1))).alias("key")))
        off += width
    blocked = fps.select(
        id_col, sig_col, F.explode(F.array(*parts)).alias("blk")
    ).select(id_col, sig_col, "blk.part", "blk.key")
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(F.col(f"a.{sig_col}")
                          .bitwiseXOR(F.col(f"b.{sig_col}")))
    return (a.join(b, ["part", "key"])
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


# --- passage-level exact dedup (Dolma / Penedo et al. line-dedup shape) ------

def passage_dedup_stats(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", window: int = 8,
                        max_dup_frac: float = 0.3) -> DataFrame:
    """Passage-level exact dedup statistics: the sub-document analog of
    Dolma's paragraph dedup, for corpora whose documents carry no line
    structure — passages are consecutive non-overlapping ``window``-token
    chunks (the trailing partial chunk included).

    Per document: ``n_passages``, ``n_dup_passages`` (passages whose
    exact text occurs more than once in the whole corpus, including
    within one document), ``dup_frac``, and a ``keep`` gate at
    ``dup_frac < max_dup_frac``.

    Scale: NO corpus-scale join. An occurrence is either globally unique
    (its hash has n_occ == 1, and then exactly ONE document owns it —
    carried by ``min(id)`` inside the same frequency aggregation) or a
    duplicate, so ``n_dup = n_passages − n_unique``. The only
    corpus-token-scale movement is the map-side-combined (hash → count,
    min-id) aggregation; the unique-owner rollup shuffles hash-scale
    rows down to doc-scale, and per-doc passage totals come from a
    second tokenize scan (no explode) joined doc-scale. The previous
    form joined the full passage table back to the frequencies — a
    corpus-scale sort-merge join that dominated at 100× (measured
    57 s → see NOTES r6; the tokenize re-scan it buys costs ~5 s).
    No broadcast of anything corpus-sized, no all-pairs step.
    """
    toks = tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * window + 1, window), " "))
    passages = (df.filter(F.size(toks) > 0)
                .select(F.col(id_col).alias("_id"),
                        F.explode(chunk).alias("passage"))
                .select("_id", md5_long("passage").alias("h")))
    # one corpus-scale pass, partially aggregated map-side: global
    # occurrence count + the sole owner when the count is 1
    freq = passages.groupBy("h").agg(F.count("*").alias("n_occ"),
                                     F.min("_id").alias("_owner"))
    uniq = (freq.filter(F.col("n_occ") == 1)
            .groupBy(F.col("_owner").alias("_id"))
            .agg(F.count("*").cast("long").alias("_n_uniq")))
    totals = (df.filter(F.size(toks) > 0)
              .select(F.col(id_col).alias("_id"),
                      n_chunks.cast("long").alias("n_passages")))
    per_doc = (totals.join(uniq, "_id", "left")
               .select("_id", "n_passages",
                       (F.col("n_passages")
                        - F.coalesce("_n_uniq", F.lit(0)))
                       .alias("n_dup_passages")))
    dup_frac = F.round(F.col("n_dup_passages") / F.col("n_passages"), 4)
    return per_doc.select(
        F.col("_id").alias(id_col), "n_passages", "n_dup_passages",
        dup_frac.alias("dup_frac"),
        (dup_frac < max_dup_frac).alias("keep"))


def passage_dedup_stats_sql(table: str, text_col: str = "text",
                            id_col: str = "doc_id", window: int = 8,
                            max_dup_frac: float = 0.3) -> str:
    """DuckDB twin of :func:`passage_dedup_stats` — identical chunking
    (1-based inclusive list slice), identical hashes and gate."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import tokens_sql
    toks = tokens_sql(text_col)
    h = md5_long_sql("passage")
    return f"""
WITH tk AS (
  SELECT {id_col} AS _id, {toks} AS toks FROM {table}
  WHERE len({toks}) > 0),
chunks AS (
  SELECT _id,
         array_to_string(toks[(i * {window} + 1):(i * {window} + {window})],
                         ' ') AS passage
  FROM tk, unnest(range(CAST(ceil(len(toks) / {window}.0) AS BIGINT)))
       AS r(i)),
hashes AS MATERIALIZED (SELECT _id, {h} AS h FROM chunks),
freq AS (SELECT h, count(*) AS n_occ FROM hashes GROUP BY h),
per_doc AS (
  SELECT _id, CAST(count(*) AS BIGINT) AS n_passages,
         CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_passages
  FROM hashes JOIN freq USING (h) GROUP BY _id)
SELECT _id AS {id_col}, n_passages, n_dup_passages,
       round(CAST(n_dup_passages AS DOUBLE) / n_passages, 4) AS dup_frac,
       round(CAST(n_dup_passages AS DOUBLE) / n_passages, 4)
         < {max_dup_frac} AS keep
FROM per_doc"""


def remove_duplicate_passages(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              window: int = 8) -> DataFrame:
    """Passage-level dedup REWRITE (the step Dolma actually performs):
    every duplicated passage keeps exactly its first occurrence —
    ordered by (doc id, position) — and is dropped everywhere else;
    documents are re-assembled from their surviving passages in order.

    Returns (id_col, clean_text, n_passages, n_removed). Documents with
    no tokens are absent (nothing to rewrite).

    Scale: one shuffle of (hash → occurrence) rows for the keeper
    window (same 60-bit key class as :func:`passage_dedup_stats`'s
    frequency aggregation), one doc-rollup shuffle to re-assemble.
    Text rides only the explode → re-assemble path; the keeper decision
    moves hashes and positions, not text.
    """
    toks = tokens(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunk = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * window + 1, window), " "))
    occ = (df.filter(F.size(toks) > 0)
           .select(F.col(id_col).alias("_id"),
                   F.posexplode(chunk).alias("idx", "passage"))
           .withColumn("h", md5_long("passage")))
    w = Window.partitionBy("h").orderBy("_id", "idx")
    kept = (occ.withColumn("_rn", F.row_number().over(w))
            .withColumn("_keep", F.col("_rn") == 1))
    rebuilt = (kept.groupBy("_id")
               .agg(F.count("*").cast("long").alias("n_passages"),
                    F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
                    .cast("long").alias("n_removed"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.when(F.col("_keep"),
                                       F.struct("idx", "passage")))),
                            lambda s: s.passage),
                        " ").alias("clean_text")))
    return rebuilt.select(F.col("_id").alias(id_col), "clean_text",
                          "n_passages", "n_removed")


def remove_duplicate_passages_sql(table: str, text_col: str = "text",
                                  id_col: str = "doc_id",
                                  window: int = 8) -> str:
    """DuckDB twin of :func:`remove_duplicate_passages` — identical
    chunking, keeper window, and ordered re-assembly."""
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import tokens_sql
    toks = tokens_sql(text_col)
    h = md5_long_sql("passage")
    return f"""
WITH tk AS (
  SELECT {id_col} AS _id, {toks} AS toks FROM {table}
  WHERE len({toks}) > 0),
occ AS (
  SELECT _id, CAST(i AS INTEGER) AS idx,
         array_to_string(toks[(i * {window} + 1):(i * {window} + {window})],
                         ' ') AS passage
  FROM tk, unnest(range(CAST(ceil(len(toks) / {window}.0) AS BIGINT)))
       AS r(i)),
kept AS MATERIALIZED (
  SELECT _id, idx, passage,
         row_number() OVER (PARTITION BY {h} ORDER BY _id, idx) = 1
           AS _keep
  FROM occ)
SELECT _id AS {id_col},
       coalesce(string_agg(CASE WHEN _keep THEN passage END, ' '
                           ORDER BY idx), '') AS clean_text,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(sum(CASE WHEN _keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
FROM kept GROUP BY _id"""
