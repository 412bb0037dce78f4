"""Portable Bloom-filter semi-join prefilter.

The 100 TB join pattern: when a huge fact table must be semi-joined
against a key set that is too large to broadcast as an equality filter
but whose *Bloom filter* fits in a few KB–MB, build the filter
distributed, collect the m/64-word bitmap as driver metadata (the
repo's k-means-centroid / PQ-codebook pattern), and apply it to the
probe side as a PURE FILTER — no shuffle, no join, evaluated inside
whole-stage codegen at the scan. The exact join that follows then
shuffles only the ~fp_rate tail instead of the full fact table.
Spark's own runtime row-level filtering does this JVM-internally; this
implementation uses the portable md5 hash family so the identical
filter — every bit — is reproducible in the DuckDB oracle (and in any
engine that will consume the published bitmap).

Math: k hash functions, m bits (m a power of two). Standard fp rate
(1 - e^{-kn/m})^k; ``suggest_params`` picks m,k for a target rate.
The k positions come from TWO md5 evaluations via Kirsch–Mitzenmacher
double hashing — ``pos_i = (g1 + i·g2) mod m`` with an odd step g2, so
per-row CPU is 2 hashes however large k is (measured: the k-md5 form
was the entire probe cost; element_at/getbit are free next to md5).

Scale notes:
- Build: keys → 2 hashes → k positions → ``groupBy(word)`` +
  ``bit_or`` — ≤ m/64 rows after map-side combine, one tiny shuffle.
- The bitmap is ``m/64`` longs of driver metadata (2^20 bits = 16 K
  longs = 128 KB), embedded as an array literal like the k-means
  centroids; at larger m you'd publish it as a broadcast variable —
  same plan shape.
- Probe: 2 hash evaluations + k element_at/getbit tests per row, all
  codegen'd; no Python, no shuffle, no join. Measured ~0.3–1.2 µs/row
  (hash_fn and k dependent): the prefilter pays where the avoided cost
  is network shuffle / spill of wide fact rows or a gated explosion —
  NOT against a local in-memory shuffle of narrow columns. In-job
  prefilters should use ``hash_fn="xxhash64"`` (no cross-engine
  portability needed) and a small k / higher fp target.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

WORD_BITS = 64


def suggest_params(n_keys: int, target_fp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate: the textbook
    m = -n·ln p / ln²2 rounded up to a power of two, k = m/n·ln 2."""
    m = max(64, 2 ** math.ceil(math.log2(-n_keys * math.log(target_fp)
                                         / (math.log(2) ** 2))))
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _km_hashes(key: Column, m_bits: int, seed: int,
               hash_fn: str = "md5") -> tuple[Column, Column]:
    """The Kirsch–Mitzenmacher pair: base position g1 ∈ [0, m) and odd
    step g2 — odd so the stride cycles the full power-of-two ring.
    Two hash evaluations total, CSE'd across the k uses.

    ``hash_fn="md5"`` (default) is the portable family — the bitmap is
    reproducible in any engine (the oracle contract, or publishing the
    bitmap for external consumers). ``"xxhash64"`` is the in-job fast
    path: ~6× cheaper per row (measured), bit-compatible only between a
    build and probe inside Spark — the right choice when the prefilter
    exists to cut a shuffle in the same job.
    """
    s = key.cast("string")
    if hash_fn == "xxhash64":
        g1 = F.pmod(F.xxhash64(s, F.lit(seed * 2)), F.lit(m_bits))
        g2 = F.pmod(F.xxhash64(s, F.lit(seed * 2 + 1)),
                    F.lit(m_bits // 2)) * 2 + 1
        return g1, g2
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    g1 = F.pmod(md5_long(F.concat(F.lit(f"{seed}:a:"), s)), F.lit(m_bits))
    g2 = F.pmod(md5_long(F.concat(F.lit(f"{seed}:b:"), s)),
                F.lit(m_bits // 2)) * 2 + 1
    return g1, g2


def _km_position(key: Column, i: int, m_bits: int, seed: int,
                 hash_fn: str = "md5") -> Column:
    """pos_i = (g1 + i·g2) mod m — all operands < 2^40, no overflow."""
    g1, g2 = _km_hashes(key, m_bits, seed, hash_fn)
    return F.pmod(g1 + i * g2, F.lit(m_bits))


def km_position_sql(key_expr: str, i: int, m_bits: int, seed: int) -> str:
    """DuckDB twin of :func:`_km_position` (identical positions)."""
    h1 = md5_long_sql(f"'{seed}:a:' || CAST({key_expr} AS VARCHAR)")
    h2 = md5_long_sql(f"'{seed}:b:' || CAST({key_expr} AS VARCHAR)")
    return (f"(({h1} % {m_bits}) + {i} * (({h2} % {m_bits // 2}) * 2 + 1))"
            f" % {m_bits}")


def build_bloom(keys: DataFrame, key_col: str, m_bits: int,
                k: int, seed: int = 17,
                hash_fn: str = "md5") -> list[int]:
    """Distributed build → driver-side bitmap: a list of m/64 longs.

    The groupBy(word) bit_or is the only shuffle (≤ m/64 rows after
    map-side combine); the collect moves metadata, not data.
    """
    if m_bits % WORD_BITS or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits={m_bits} must be a power of two ≥ 64")
    # materialize the TWO KM hashes by projection before fanning out to
    # k positions — inlining _km_position(i) k times puts both md5
    # trees inside every array element, and the Generate path does not
    # CSE them (measured 1.9 s → 0.4 s at k=7 on the build side; the
    # same hoist bloom_filter_probe documents for the AND chain)
    g1, g2 = _km_hashes(F.col(key_col), m_bits, seed, hash_fn)
    pos = F.explode(F.array(
        *[F.pmod(F.col("_g1") + i * F.col("_g2"), F.lit(m_bits))
          for i in range(k)])).alias("pos")
    words = (keys.select(g1.alias("_g1"), g2.alias("_g2"))
             .select(pos)
             .select((F.col("pos") / WORD_BITS).cast("long").alias("word"),
                     F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                            f"CAST(pos % {WORD_BITS} AS INT))").alias("mask"))
             .groupBy("word").agg(F.bit_or("mask").alias("bits"))
             .collect())
    bitmap = [0] * (m_bits // WORD_BITS)
    for r in words:
        bitmap[r.word] = r.bits
    return bitmap


def bloom_might_contain(key: Column, bitmap: list[int], m_bits: int,
                        k: int, seed: int = 17,
                        hash_fn: str = "md5") -> Column:
    """Boolean probe column: all k bits set. Pure codegen'd expressions
    over an array literal — no shuffle, no join, no Python. Bit tests
    use ``getbit`` (the shiftleft/shiftright Python wrappers take only
    int shift amounts).

    ``hash_fn`` MUST match the one the bitmap was built with
    (build_bloom's default is md5; the in-job fast path is xxhash64) —
    probing with a mismatched family silently loses the
    no-false-negative guarantee."""
    # ONE array literal node (F.lit of the list), not m/64 child
    # expressions — keeps plan size and analysis time flat in m. The
    # cast pins element type: F.lit infers from VALUES, and a bitmap
    # whose set words all fit int32 would infer array<int>, capping
    # getbit positions at 32.
    arr = F.lit(bitmap).cast("array<bigint>")
    out = None
    for i in range(k):
        pos = _km_position(key, i, m_bits, seed, hash_fn)
        # pos < m_bits ≤ 2^30: the /64 stays integer-exact in double
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        t = F.getbit(word, pos % WORD_BITS) == 1
        out = t if out is None else (out & t)
    return out


def _bit_tests_from(g1: Column, g2: Column, bitmap: list[int],
                    m_bits: int, k: int) -> Column:
    """The k-way AND of bit tests over precomputed KM hash columns."""
    arr = F.lit(bitmap).cast("array<bigint>")
    out = None
    for i in range(k):
        pos = F.pmod(g1 + i * g2, F.lit(m_bits))
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        t = F.getbit(word, pos % WORD_BITS) == 1
        out = t if out is None else (out & t)
    return out


def bloom_filter_probe(probe: DataFrame, key_col: str, bitmap: list[int],
                       m_bits: int, k: int, seed: int = 17,
                       hash_fn: str = "md5") -> DataFrame:
    """probe rows whose key might be in the build set (all k bits set).

    The two KM hashes are materialized by a projection BEFORE the k-way
    AND: conditional (short-circuit) predicate branches are excluded
    from Spark's codegen subexpression elimination, so an inline AND
    chain re-evaluates both md5 trees per term — measured ~4× slower.
    """
    g1, g2 = _km_hashes(F.col(key_col), m_bits, seed, hash_fn)
    return (probe.withColumn("_g1", g1).withColumn("_g2", g2)
            .filter(_bit_tests_from(F.col("_g1"), F.col("_g2"),
                                    bitmap, m_bits, k))
            .drop("_g1", "_g2"))


def bloom_semi_join_stats(probe: DataFrame, probe_key: str,
                          build: DataFrame, build_key: str,
                          m_bits: int, k: int, seed: int = 17) -> DataFrame:
    """The prefilter effectiveness report, one row:
    (n_probe_rows, n_pass_rows, n_exact_rows, n_false_pos_rows,
    n_probe_keys, n_false_pos_keys, key_fp_rate).

    ``n_pass_rows`` is what the bloom-prefiltered exact join would still
    have to shuffle; ``n_exact_rows`` is the true semi-join size;
    ``key_fp_rate`` = false-positive keys / not-in-build keys (the rate
    the m,k sizing promises). The exact-set comparison joins only
    DISTINCT probe keys — driver-metadata scale for TPC-H-shaped keys.
    """
    keys = build.select(F.col(build_key).cast("string").alias("_bk")) \
        .distinct()
    bitmap = build_bloom(keys, "_bk", m_bits, k, seed)
    # ONE probe scan: reduce to (key, row count) with map-side combine,
    # then hash/test each DISTINCT key once — per-key md5 cost, not
    # per-row (the pure-filter per-row form is bloom_filter_probe; this
    # report needs the exact comparison anyway, so the key rollup is the
    # cheaper plan and the bloom tests ride the reduced table).
    pk = (probe.groupBy(probe_key)
          .agg(F.count("*").cast("long").alias("_rows"))
          .select(F.col(probe_key).cast("string").alias("_pk"), "_rows"))
    inb = keys.withColumn("_inb", F.lit(1))
    g1, g2 = _km_hashes(F.col("_pk"), m_bits, seed)
    verdict = (pk.withColumn("_g1", g1).withColumn("_g2", g2)
               .withColumn(
        "_pass",
        _bit_tests_from(F.col("_g1"), F.col("_g2"), bitmap, m_bits, k)
        .cast("long"))
        .join(F.broadcast(inb), F.col("_pk") == F.col("_bk"), "left")
        .withColumn("_in", F.col("_inb").isNotNull().cast("long")))
    fp = F.col("_pass") * (1 - F.col("_in"))
    return (verdict.agg(
        F.sum("_rows").cast("long").alias("n_probe_rows"),
        F.sum(F.col("_rows") * F.col("_pass")).cast("long")
        .alias("n_pass_rows"),
        F.sum(F.col("_rows") * F.col("_in")).cast("long")
        .alias("n_exact_rows"),
        F.sum(F.col("_rows") * fp).cast("long").alias("n_false_pos_rows"),
        F.count("*").cast("long").alias("n_probe_keys"),
        F.sum(fp).cast("long").alias("n_false_pos_keys"),
        F.sum(1 - F.col("_in")).cast("long").alias("_n_out_keys"))
        .select("n_probe_rows", "n_pass_rows", "n_exact_rows",
                "n_false_pos_rows", "n_probe_keys", "n_false_pos_keys",
                F.round(F.col("n_false_pos_keys")
                        / F.greatest(F.col("_n_out_keys"), F.lit(1)), 6)
                .alias("key_fp_rate")))


def bloom_semi_join_stats_sql(probe_table: str, probe_key: str,
                              build_sql: str, m_bits: int, k: int,
                              seed: int = 17) -> str:
    """DuckDB twin of :func:`bloom_semi_join_stats`: rebuild the
    identical bitmap in CTEs (same hashes, same words, same bit_or) and
    probe DISTINCT keys via an exploded bit-position → word join counting
    k hits. Different *shape* from the Spark literal-array filter,
    identical *bits* — the oracle checks values, the Spark plan carries
    the scale story. ``build_sql`` must yield one VARCHAR column ``bk``.
    """
    build_pos = " UNION ALL ".join(
        f"SELECT {km_position_sql('bk', i, m_bits, seed)} AS p FROM build"
        for i in range(k))
    probe_pos = " UNION ALL ".join(
        f"SELECT _pk, {km_position_sql('_pk', i, m_bits, seed)} AS p "
        f"FROM pkeys" for i in range(k))
    return f"""
WITH build AS MATERIALIZED ({build_sql}),
bitmap AS MATERIALIZED (
  -- DuckDB rejects 1<<63 (overflow-checked); the sign bit is the
  -- explicit min-long two's-complement value, matching Spark's wrap
  SELECT p // {WORD_BITS} AS word,
         CAST(bit_or(CASE WHEN p % {WORD_BITS} = 63
                          THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                          ELSE CAST(1 AS BIGINT)
                               << CAST(p % {WORD_BITS} AS INT) END)
              AS BIGINT) AS bits
  FROM ({build_pos}) GROUP BY word),
pkeys AS MATERIALIZED (SELECT DISTINCT CAST({probe_key} AS VARCHAR) AS _pk
          FROM {probe_table}),
khit AS (
  SELECT _pk FROM ({probe_pos}) pp
  JOIN bitmap ON pp.p // {WORD_BITS} = bitmap.word
  WHERE (bitmap.bits >> CAST(pp.p % {WORD_BITS} AS INT)) & 1 = 1
  GROUP BY _pk HAVING count(*) = {k}),
verdict AS MATERIALIZED (
  SELECT _pk,
         CASE WHEN _pk IN (SELECT _pk FROM khit) THEN 1 ELSE 0 END AS _pass,
         CASE WHEN _pk IN (SELECT bk FROM build) THEN 1 ELSE 0 END AS _inb
  FROM pkeys),
rowv AS (
  SELECT CAST(p.{probe_key} AS VARCHAR) AS _pk, v._pass, v._inb
  FROM {probe_table} p JOIN verdict v ON CAST(p.{probe_key} AS VARCHAR) = v._pk),
row_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probe_rows,
         CAST(sum(_pass) AS BIGINT) AS n_pass_rows,
         CAST(sum(_inb) AS BIGINT) AS n_exact_rows,
         CAST(sum(CASE WHEN _inb = 0 AND _pass = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos_rows
  FROM rowv),
key_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probe_keys,
         CAST(sum(CASE WHEN _inb = 0 AND _pass = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos_keys,
         CAST(sum(CASE WHEN _inb = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS _n_out_keys
  FROM verdict)
SELECT n_probe_rows, n_pass_rows, n_exact_rows, n_false_pos_rows,
       n_probe_keys, n_false_pos_keys,
       round(CAST(n_false_pos_keys AS DOUBLE)
             / greatest(_n_out_keys, 1), 6) AS key_fp_rate
FROM row_stats, key_stats"""

# --- per-file Bloom index: point-lookup file skipping ------------------------

def file_bloom_manifest(spark, path: str, key_col: str,
                        m_bits: int = 4096, k: int = 4,
                        seed: int = 17) -> dict[str, list[int]]:
    """Per-FILE Bloom bitmaps over ``key_col`` — the Iceberg/Delta
    bloom-filter index for POINT lookups, the case min/max manifests
    (``zorder.file_manifest``) can't prune: a high-cardinality key
    whose values interleave across files makes every [min,max] interval
    overlap every probe, while a few KB of bloom bits per file answers
    "does this exact key live here" with no false negatives.

    One scan builds every file's bitmap: rows tag themselves with
    ``input_file_name()``, fan out to k positions, and
    ``groupBy(file, word) + bit_or`` folds map-side to
    files × m/64 metadata rows — the driver collects bitmaps, never
    data. A production lake writes these at ingest (the write has the
    rows anyway) and stores them in the table's manifest, exactly like
    the min/max stats.

    Uses the portable md5 KM family so published bitmaps are
    reproducible by any engine (and by the driver-side probe below).
    """
    df = spark.read.parquet(path.rstrip("/"))
    pos = F.explode(F.array(
        *[_km_position(F.col(key_col), i, m_bits, seed)
          for i in range(k)])).alias("pos")
    rows = (df.select(F.input_file_name().alias("file"),
                      F.col(key_col))
            .select("file", pos)
            .select("file",
                    (F.col("pos") / WORD_BITS).cast("long").alias("word"),
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                           f"CAST(pos % {WORD_BITS} AS INT))")
                    .alias("mask"))
            .groupBy("file", "word").agg(F.bit_or("mask").alias("bits"))
            .collect())
    out: dict[str, list[int]] = {}
    for r in rows:
        bm = out.setdefault(r.file, [0] * (m_bits // WORD_BITS))
        bm[r.word] = r.bits
    return out


def _km_positions_py(key, m_bits: int, k: int, seed: int) -> list[int]:
    """Driver-side twin of :func:`_km_position` (hashlib md5 is the
    same md5 — the constant-hash-literal house precedent). ``key`` must
    be an int or string whose ``str()`` equals Spark's string cast
    (ints and strings do; floats don't — don't bloom-index floats)."""
    import hashlib

    def h(tag: str) -> int:
        return int(hashlib.md5(
            f"{seed}:{tag}:{key}".encode()).hexdigest()[:15], 16)

    g1 = h("a") % m_bits
    g2 = (h("b") % (m_bits // 2)) * 2 + 1
    return [(g1 + i * g2) % m_bits for i in range(k)]


def bloom_pruned_point_read(spark, path: str,
                            manifest: dict[str, list[int]],
                            key_col: str, keys: list, m_bits: int,
                            k: int = 4, seed: int = 17):
    """Point-lookup read that SKIPS files whose Bloom bitmap rules out
    every probed key (no false negatives ⇒ skipping is always safe).
    Returns (df, n_files_read, n_files_total); the DataFrame carries
    the residual IN-filter, so correctness never depends on the index —
    a false positive only costs an extra file read (the
    ``zorder.pruned_read`` contract)."""
    def might_contain(bm: list[int], key) -> bool:
        for p in _km_positions_py(key, m_bits, k, seed):
            if not (bm[p // WORD_BITS] >> (p % WORD_BITS)) & 1:
                return False
        return True

    keep = [f for f, bm in sorted(manifest.items())
            if any(might_contain(bm, key) for key in keys)]
    if keep:
        df = spark.read.parquet(*keep)
    else:
        df = spark.read.parquet(path.rstrip("/")).limit(0)
    df = df.filter(F.col(key_col).isin(keys))
    return df, len(keep), len(manifest)

