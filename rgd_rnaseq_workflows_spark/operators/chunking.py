"""Overlapping document chunking — the retrieval/RAG indexing shape.

Passage dedup (operators/dedup.py) uses NON-overlapping windows because
its unit is "content that repeats"; retrieval indexing wants OVERLAPPING
windows (stride < window) so no query-relevant span is split across a
chunk boundary. This module produces the chunk table an embedding or
BM25 index builds over, with deterministic chunk identity
(doc id + start offset), so re-chunking a grown corpus yields stable ids
for unchanged documents.

Scale: pure codegen — tokens → per-doc start-offset sequence →
slice/join per chunk; the explode streams through the scan stage, no
shuffle at all until whatever consumes the chunks aggregates. Chunk
count per doc is ceil(max(n-window,0)/stride)+1 ≈ n/stride.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.text import tokens, tokens_sql


def chunk_documents(docs: DataFrame, window: int = 64, stride: int = 48,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id_col, chunk_idx, chunk_start, chunk_text, n_tokens) — one row
    per overlapping window. The last chunk starts at the largest
    multiple of ``stride`` < n, so trailing tokens are always covered;
    empty documents yield no rows."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride({stride}) <= window({window})")
    toks = tokens(text_col)
    n = F.size(toks)
    # start offsets 0, stride, ... , covering the last token
    n_chunks = (F.ceil((F.greatest(n - window, F.lit(0)))
                       / F.lit(stride)).cast("int") + 1)
    starts = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: i * stride)
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, window)
    return (docs.filter(n > 0)
            .select(F.col(id_col), toks.alias("_toks"),
                    F.posexplode(starts).alias("chunk_idx", "chunk_start"))
            .select(id_col, "chunk_idx", "chunk_start",
                    F.array_join(chunk, " ").alias("chunk_text"),
                    F.size(chunk).cast("int").alias("n_tokens")))


def chunk_documents_sql(table: str, window: int = 64, stride: int = 48,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    toks = tokens_sql(text_col)
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
  WHERE len({toks}) > 0),
st AS (
  SELECT {id_col}, toks, CAST(i AS INTEGER) AS chunk_idx,
         CAST(i * {stride} AS INTEGER) AS chunk_start
  FROM tk, unnest(range(CAST(ceil(greatest(len(toks) - {window}, 0)
                                  / {stride}.0) AS BIGINT) + 1)) AS r(i))
SELECT {id_col}, chunk_idx, chunk_start,
       array_to_string(toks[(chunk_start + 1)
                            :(chunk_start + {window})], ' ') AS chunk_text,
       CAST(len(toks[(chunk_start + 1):(chunk_start + {window})])
            AS INTEGER) AS n_tokens
FROM st"""


# =============================================================================
# Content-defined chunking (CDC) duplication audit
# =============================================================================

# Cut probability 1/CDC_DIVISOR per token position -> mean chunk length
# ~= CDC_DIVISOR tokens. The CUT hash is the house md5 60-bit family —
# it is semantically load-bearing (it decides WHERE boundaries fall, so
# chunk counts/lengths depend on its exact values) and the SQL twin
# replays identical boundaries. Chunk IDENTITY (below) is equality-only
# and uses codegen xxhash64.
CDC_DIVISOR = 8


def _md5_long_expr(s: str) -> str:
    """Spark-SQL text of functions.hashing.md5_long over expression
    ``s`` (60-bit: 15 hex digits)."""
    return f"CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"


def _chunk_id_expr(s: str) -> str:
    """Chunk-identity hash (r12, guide §4.1): ``xxhash64`` in codegen
    instead of one MessageDigest + hex-``conv`` per chunk. The identity
    hash is INTERNAL — every registered output is a count, containment
    ratio or keeper flag over hash EQUALITY, never a hash value — so
    the DuckDB twins keep md5 identity and the engines agree whenever
    both families are injective on the corpus's chunk vocabulary
    (collision-conditional, as both already were). The CUT hash above
    must stay md5: boundary positions are part of the semantics."""
    return f"xxhash64({s})"


def _cdc_base(docs: DataFrame, k: int, divisor: int,
              keep_cols: list[str], id_col: str,
              text_col: str) -> tuple[DataFrame, str]:
    """Shared CDC cut-rule front end: (keep_cols..., _id, _t, _e) with
    the boundary-end array materialized, plus the span-struct
    expression over ``_e`` — everything row-local (no aggregation), so
    every consumer (batch chunk rows, the streaming row-local chunk
    sets) replays identical boundaries."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    from rgd_rnaseq_workflows_spark.functions.text import shingles_all
    base = (docs.select(*keep_cols, F.col(id_col).alias("_id"),
                        tokens(text_col).alias("_t"),
                        shingles_all(text_col, k).alias("_g"))
            .filter(F.size("_t") > 0))
    n = "size(_t)"
    cut_h = _md5_long_expr("element_at(_g, CAST(i AS INT))")
    ends = (f"filter(transform(sequence(1, size(_g)), "
            f"i -> CASE WHEN {cut_h} % {divisor} = 0 "
            f"THEN least(CAST(i AS INT) + {k - 1}, {n}) END), "
            f"x -> x IS NOT NULL)")
    ends2 = (f"CASE WHEN size({ends}) = 0 OR element_at({ends}, -1) <> {n} "
             f"THEN concat({ends}, array({n})) ELSE {ends} END")
    spans = (f"transform(sequence(1, size(_e)), j -> named_struct("
             f"'_start', CASE WHEN j = 1 THEN 1 "
             f"ELSE element_at(_e, CAST(j AS INT) - 1) + 1 END, "
             f"'_end', element_at(_e, CAST(j AS INT))))")
    return base.withColumn("_e", F.expr(ends2)).drop("_g"), spans


def _cdc_chunks(docs: DataFrame, k: int, divisor: int,
                keep_cols: list[str], id_col: str,
                text_col: str) -> DataFrame:
    """Shared CDC chunk builder: (keep_cols..., _id, _h, _len) — one
    row per chunk, built as per-document array work in the scan stage
    (see :func:`cdc_chunk_stats` for the cut rule and scale shape)."""
    cut, spans = _cdc_base(docs, k, divisor, keep_cols, id_col, text_col)
    chunk_str = "array_join(slice(_t, _s._start, _s._end - _s._start + 1), ' ')"
    return (cut.select(*keep_cols, "_id", "_t",
                       F.explode(F.expr(spans)).alias("_s"))
            .select(*keep_cols, "_id",
                    F.expr(_chunk_id_expr(chunk_str)).alias("_h"),
                    F.expr("_s._end - _s._start + 1").cast("long")
                    .alias("_len")))


def chunk_sets_rowlocal(docs: DataFrame, k: int = 2,
                        divisor: int = CDC_DIVISOR,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """The distinct per-doc CDC chunk-hash rows (_id, _h) with NO
    aggregation anywhere in the plan: the per-doc distinct folds
    INSIDE the row (``array_distinct`` over the span-hash array before
    the explode), so the identical expression tree runs under
    Structured Streaming — the incremental half of the CDC containment
    gate (a stream maintains the chunk table; the keep-the-larger
    policy compacts over it batch-side, see
    :func:`cdc_containment_keepers_from_chunks`)."""
    cut, spans = _cdc_base(docs, k, divisor, [], id_col, text_col)
    chunk_h = _chunk_id_expr(
        "array_join(slice(_t, s._start, s._end - s._start + 1), ' ')")
    hashes = f"array_distinct(transform({spans}, s -> {chunk_h}))"
    return cut.select("_id", F.explode(F.expr(hashes)).alias("_h"))


def cdc_chunk_stats(docs: DataFrame, k: int = 2,
                    divisor: int = CDC_DIVISOR,
                    by: str = "source", id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Content-defined-chunking duplication audit per group — the
    boundary-shift-robust exact-substring dedup primitive (Rabin/gear
    CDC as used in storage dedup and corpus exact-substring work):
    fixed-window passage dedup misses a duplicate paragraph shifted by
    ONE token, because every downstream window realigns; CDC cuts where
    the CONTENT says to (hash of the k-gram ending at a token ≡ 0 mod
    ``divisor``), so identical passages chunk identically regardless of
    position, and chunk-hash equality finds them.

    Construction (engine-identical): boundaries after token j whenever
    ``md5_60bit(k-gram ending at j) % divisor == 0`` (positions j < k
    never cut; a final boundary always lands at n), chunks are the
    token spans between consecutive boundaries, identity is the md5 of
    the chunk's token string. All exact integers.

    Output per ``by`` group: (by, n_docs, n_chunks, n_unique_chunks,
    dup_chunks, dup_bp, sum_chunk_tokens) — ``dup_bp`` the duplicated-
    chunk share in basis points, ``sum_chunk_tokens`` the exact token
    mass (equals the group's token count: chunks partition each doc).

    Scale shape: chunk construction is per-document ARRAY work in the
    scan stage (map-side, no explode-regroup round trip — the chunk
    list never leaves its row until the final hash explode); the only
    corpus-scale shuffle is the chunk-HASH aggregation, which carries
    (group, 60-bit hash) rows, never text. A 100 TB corpus shuffles
    ~tokens/divisor longs once.
    """
    chunks = _cdc_chunks(docs.withColumn("_grp", F.col(by)), k, divisor,
                         ["_grp"], id_col, text_col) \
        .withColumnRenamed("_grp", "g")
    return (chunks.groupBy("g")
            .agg(F.countDistinct("_id").cast("long").alias("n_docs"),
                 F.count("*").cast("long").alias("n_chunks"),
                 F.countDistinct("_h").cast("long")
                 .alias("n_unique_chunks"),
                 F.sum("_len").cast("long").alias("sum_chunk_tokens"))
            .withColumn("dup_chunks",
                        F.col("n_chunks") - F.col("n_unique_chunks"))
            .withColumn("dup_bp",
                        F.expr("10000 * dup_chunks div n_chunks")
                        .cast("long"))
            .select(F.col("g").alias(by), "n_docs", "n_chunks",
                    "n_unique_chunks", "dup_chunks", "dup_bp",
                    "sum_chunk_tokens")
            .orderBy(by))


def cdc_chunk_stats_sql(table: str, k: int = 2,
                        divisor: int = CDC_DIVISOR,
                        by: str = "source", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB twin of :func:`cdc_chunk_stats` — identical k-gram cut
    rule, span construction and chunk identity hash."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import (
        shingles_all_sql, tokens_sql)
    toks = tokens_sql(text_col)
    grams = shingles_all_sql(text_col, k)
    cut_h = md5_long_sql("g[i]")
    return f"""
WITH base AS (
  SELECT {by} AS g, {id_col} AS id, {toks} AS t, {grams} AS gr
  FROM {table} WHERE len({toks}) > 0),
cuts AS (
  SELECT g, id, t,
    list_filter(list_transform(range(1, len(gr) + 1),
      i -> CASE WHEN {cut_h.replace('g[i]', 'gr[i]')} % {divisor} = 0
           THEN least(i + {k - 1}, len(t)) END),
      x -> x IS NOT NULL) AS e0
  FROM base),
ends AS (
  SELECT g, id, t,
    CASE WHEN len(e0) = 0 OR e0[-1] <> len(t)
         THEN list_append(e0, len(t)) ELSE e0 END AS e
  FROM cuts),
spans AS (
  SELECT g, id,
    unnest(list_transform(range(1, len(e) + 1),
      j -> {{'s': CASE WHEN j = 1 THEN 1 ELSE e[j - 1] + 1 END,
            'e': e[j]}})) AS sp,
    t
  FROM ends),
chunks AS (
  SELECT g, id,
    {md5_long_sql("array_to_string(t[(sp.s):(sp.e)], ' ')")} AS h,
    CAST(sp.e - sp.s + 1 AS BIGINT) AS len
  FROM spans)
SELECT g AS {by}, CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT h) AS BIGINT) AS n_unique_chunks,
       CAST(count(*) - count(DISTINCT h) AS BIGINT) AS dup_chunks,
       (10000 * (count(*) - count(DISTINCT h))) // count(*) AS dup_bp,
       CAST(sum(len) AS BIGINT) AS sum_chunk_tokens
FROM chunks GROUP BY g
"""


def chunk_sets(docs: DataFrame, k: int = 2,
               divisor: int = CDC_DIVISOR, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """The distinct per-doc CDC chunk-hash set (_id, _h), lineage-
    frozen with a lazy checkpoint: the pair/keeper operators consume it
    from several branches (sizes, df cap, both join sides), and without
    the freeze each branch would re-run the whole chunk build — four
    corpus scans instead of one. Post-chunking rows are (id, hash)
    longs only, so the materialization never stores text."""
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ch = (_cdc_chunks(docs, k, divisor, [], id_col, text_col)
          .select("_id", "_h").distinct())
    return checkpoint_df(ch, eager=False)


def cdc_containment_pairs(docs: DataFrame, k: int = 2,
                          divisor: int = CDC_DIVISOR,
                          min_shared: int = 2,
                          min_containment_bp: int = 5000,
                          max_chunk_df: int = 100,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Shift-robust near-duplicate / containment pairs from CDC chunk
    identity — the payoff of :func:`cdc_chunk_stats`' cut rule: two
    docs sharing a long passage share its CDC chunks wherever the
    passage sits, so pairing is a chunk-hash EQUI-join, never all-pairs
    and never alignment-sensitive.

    Output: (id_a, id_b, shared_chunks, containment_bp) for ordered
    pairs with ``shared_chunks >= min_shared`` distinct common chunk
    hashes and ``containment_bp = 10000 * shared div min(|A|, |B|)``
    (chunk-SET containment of the smaller doc) at or above the
    threshold — exact integers end to end.

    Scale guards (the minhash/winnowing discipline): chunk hashes with
    document frequency above ``max_chunk_df`` are boilerplate
    (headers, license blocks shared by thousands of docs) and are
    DROPPED before the self-join — otherwise one viral chunk creates
    df² pair rows; the cap bounds per-chunk fan-out at max_chunk_df²
    and is reported honestly by the stats operator, not here. Per-doc
    chunk sets are DISTINCT hashes (a chunk repeated inside one doc
    counts once for containment).
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if not 0 <= min_containment_bp <= 10000:
        raise ValueError("min_containment_bp must be in [0, 10000]")
    if max_chunk_df < 2:
        raise ValueError("max_chunk_df must be >= 2 (a pair needs df 2)")
    ch = chunk_sets(docs, k, divisor, id_col, text_col)
    sizes = _chunk_sizes(ch)
    return (_containment_pairs_from_chunks(
        ch, sizes, min_shared, min_containment_bp, max_chunk_df)
            .select("id_a", "id_b", "shared_chunks", "containment_bp")
            .orderBy("id_a", "id_b"))


def _chunk_sizes(ch: DataFrame) -> DataFrame:
    """Per-doc distinct-chunk counts (_id, _nc) off a frozen chunk-set
    frame, lazily checkpointed because pairs AND keepers consume it
    from multiple join branches (both pair sides, the keeper output) —
    without the freeze each branch re-runs the aggregation."""
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    return checkpoint_df(
        ch.groupBy("_id").agg(F.count("*").cast("long").alias("_nc")),
        eager=False)


def _containment_pairs_from_chunks(ch: DataFrame, sizes: DataFrame,
                                   min_shared: int,
                                   min_containment_bp: int,
                                   max_chunk_df: int) -> DataFrame:
    """Pair generation over a PREBUILT chunk-set frame — shared by
    :func:`cdc_containment_pairs` and :func:`cdc_containment_keepers`
    so the corpus chunk build runs exactly once per caller. Keeps the
    per-side sizes (_na, _nb) so the keeper's drop rule reads them
    without re-joining the sizes table."""
    rare = (ch.groupBy("_h").agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_chunk_df).select("_h"))
    kept = ch.join(rare, "_h")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (a.join(b, (F.col("a._h") == F.col("b._h"))
                    & (F.col("a._id") < F.col("b._id")))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count("*").cast("long").alias("shared_chunks"))
             .filter(F.col("shared_chunks") >= min_shared))
    sa = sizes.select(F.col("_id").alias("id_a"),
                      F.col("_nc").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"),
                      F.col("_nc").alias("_nb"))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .withColumn("containment_bp",
                        F.expr("10000 * shared_chunks div "
                               "least(_na, _nb)").cast("long"))
            .filter(F.col("containment_bp") >= min_containment_bp))


def cdc_containment_pairs_sql(table: str, k: int = 2,
                              divisor: int = CDC_DIVISOR,
                              min_shared: int = 2,
                              min_containment_bp: int = 5000,
                              max_chunk_df: int = 100,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB twin of :func:`cdc_containment_pairs` — identical chunk
    identity, df cap, distinct chunk sets and integer containment."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if not 0 <= min_containment_bp <= 10000:
        raise ValueError("min_containment_bp must be in [0, 10000]")
    if max_chunk_df < 2:
        raise ValueError("max_chunk_df must be >= 2 (a pair needs df 2)")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import (
        shingles_all_sql, tokens_sql)
    toks = tokens_sql(text_col)
    grams = shingles_all_sql(text_col, k)
    cut_h = md5_long_sql("gr[i]")
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS t, {grams} AS gr
  FROM {table} WHERE len({toks}) > 0),
cuts AS (
  SELECT id, t,
    list_filter(list_transform(range(1, len(gr) + 1),
      i -> CASE WHEN {cut_h} % {divisor} = 0
           THEN least(i + {k - 1}, len(t)) END),
      x -> x IS NOT NULL) AS e0
  FROM base),
ends AS (
  SELECT id, t,
    CASE WHEN len(e0) = 0 OR e0[-1] <> len(t)
         THEN list_append(e0, len(t)) ELSE e0 END AS e
  FROM cuts),
ch AS (
  SELECT DISTINCT id,
    {md5_long_sql("array_to_string(t[(sp.s):(sp.e)], ' ')")} AS h
  FROM (SELECT id, t,
          unnest(list_transform(range(1, len(e) + 1),
            j -> {{'s': CASE WHEN j = 1 THEN 1 ELSE e[j - 1] + 1 END,
                  'e': e[j]}})) AS sp
        FROM ends)),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS nc FROM ch GROUP BY id),
rare AS (SELECT h FROM ch GROUP BY h HAVING count(*) <= {max_chunk_df}),
kept AS (SELECT ch.id, ch.h FROM ch JOIN rare USING (h)),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(count(*) AS BIGINT) AS shared_chunks
  FROM kept a JOIN kept b ON a.h = b.h AND a.id < b.id
  GROUP BY 1, 2
  HAVING count(*) >= {min_shared})
SELECT p.id_a, p.id_b, p.shared_chunks,
       (10000 * p.shared_chunks) // least(sa.nc, sb.nc) AS containment_bp
FROM pairs p
JOIN sizes sa ON sa.id = p.id_a
JOIN sizes sb ON sb.id = p.id_b
WHERE (10000 * p.shared_chunks) // least(sa.nc, sb.nc)
      >= {min_containment_bp}
"""


def cdc_containment_keepers(docs: DataFrame, k: int = 2,
                            divisor: int = CDC_DIVISOR,
                            min_shared: int = 2,
                            min_containment_bp: int = 5000,
                            max_chunk_df: int = 100,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """The keep-the-larger drop policy over CDC containment pairs —
    near-dup dedup that keeps the SUPERSET document: when a smaller
    doc is mostly contained in a bigger one (a quote, an excerpt, a
    truncated mirror), exact dedup keeps both and random-keeper near-
    dup dedup may keep the fragment; this keeps the doc with MORE
    distinct chunks (ties: the smaller id), dropping any doc that is
    the lesser side of at least one qualifying pair.

    Deterministic single rule, no transitive clustering: a doc
    survives iff NO qualifying pair condemns it — engine-identical
    set algebra (an anti-join), no iteration. Output: (doc_id,
    n_chunks, kept) for every chunked doc.

    Scale shape: ONE chunk build (the frozen :func:`chunk_sets` frame
    and its checkpointed per-doc sizes feed pair generation AND the
    keeper output — no second corpus scan), the chunk-hash equi-join,
    then one value-scale outer join against the loser set.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if not 0 <= min_containment_bp <= 10000:
        raise ValueError("min_containment_bp must be in [0, 10000]")
    if max_chunk_df < 2:
        raise ValueError("max_chunk_df must be >= 2 (a pair needs df 2)")
    ch = chunk_sets(docs, k, divisor, id_col, text_col)
    return _keepers_from_frozen(ch, min_shared, min_containment_bp,
                                max_chunk_df, id_col)


def _keepers_from_frozen(ch: DataFrame, min_shared: int,
                         min_containment_bp: int, max_chunk_df: int,
                         id_col: str) -> DataFrame:
    """Keep-the-larger fold over a FROZEN (_id, _h) chunk frame."""
    sizes = _chunk_sizes(ch)
    pairs = _containment_pairs_from_chunks(
        ch, sizes, min_shared, min_containment_bp, max_chunk_df)
    losers = (pairs
              .select(F.when((F.col("_na") > F.col("_nb"))
                             | ((F.col("_na") == F.col("_nb"))
                                & (F.col("id_a") < F.col("id_b"))),
                             F.col("id_b"))
                      .otherwise(F.col("id_a")).alias("_id"))
              .distinct())
    return (sizes.withColumnRenamed("_nc", "n_chunks")
            .join(losers.withColumn("_lost", F.lit(True)), "_id", "left")
            .withColumn("kept", F.col("_lost").isNull())
            .select(F.col("_id").alias(id_col), "n_chunks", "kept")
            .orderBy(id_col))


def cdc_containment_keepers_from_chunks(chunks: DataFrame,
                                        min_shared: int = 2,
                                        min_containment_bp: int = 5000,
                                        max_chunk_df: int = 100,
                                        id_col: str = "doc_id") -> DataFrame:
    """The keep-the-larger policy over an EXTERNALLY MAINTAINED chunk
    table — the periodic-compaction half of the streaming CDC gate: a
    stream appends (doc_id, chunk_hash) rows incrementally (row-local
    :func:`chunk_sets_rowlocal` — Structured-Streaming-safe), and this
    fold produces the exact batch keeper report from the sink WITHOUT
    re-chunking the corpus (the ``stream_curate`` near-dup hot/cold
    pattern). ``chunks`` must yield (id_col, chunk-hash) rows;
    duplicates (e.g. stream restarts) are collapsed here."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if not 0 <= min_containment_bp <= 10000:
        raise ValueError("min_containment_bp must be in [0, 10000]")
    if max_chunk_df < 2:
        raise ValueError("max_chunk_df must be >= 2 (a pair needs df 2)")
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    cols = chunks.columns
    ch = checkpoint_df(
        chunks.select(F.col(cols[0]).alias("_id"),
                      F.col(cols[1]).alias("_h")).distinct(),
        eager=False)
    return _keepers_from_frozen(ch, min_shared, min_containment_bp,
                                max_chunk_df, id_col)


def cdc_containment_keepers_sql(table: str, k: int = 2,
                                divisor: int = CDC_DIVISOR,
                                min_shared: int = 2,
                                min_containment_bp: int = 5000,
                                max_chunk_df: int = 100,
                                id_col: str = "doc_id",
                                text_col: str = "text") -> str:
    """DuckDB twin of :func:`cdc_containment_keepers`."""
    pairs = cdc_containment_pairs_sql(
        table, k=k, divisor=divisor, min_shared=min_shared,
        min_containment_bp=min_containment_bp,
        max_chunk_df=max_chunk_df, id_col=id_col, text_col=text_col)
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import (
        shingles_all_sql, tokens_sql)
    toks = tokens_sql(text_col)
    grams = shingles_all_sql(text_col, k)
    cut_h = md5_long_sql("gr[i]")
    return f"""
WITH p AS ({pairs}),
base AS (
  SELECT {id_col} AS id, {toks} AS t, {grams} AS gr
  FROM {table} WHERE len({toks}) > 0),
cuts AS (
  SELECT id, t,
    list_filter(list_transform(range(1, len(gr) + 1),
      i -> CASE WHEN {cut_h} % {divisor} = 0
           THEN least(i + {k - 1}, len(t)) END),
      x -> x IS NOT NULL) AS e0
  FROM base),
ends AS (
  SELECT id, t,
    CASE WHEN len(e0) = 0 OR e0[-1] <> len(t)
         THEN list_append(e0, len(t)) ELSE e0 END AS e
  FROM cuts),
sizes AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_chunks FROM (
    SELECT DISTINCT id,
      {md5_long_sql("array_to_string(t[(sp.s):(sp.e)], ' ')")} AS h
    FROM (SELECT id, t,
            unnest(list_transform(range(1, len(e) + 1),
              j -> {{'s': CASE WHEN j = 1 THEN 1 ELSE e[j - 1] + 1 END,
                    'e': e[j]}})) AS sp
          FROM ends)) GROUP BY id),
losers AS (
  SELECT DISTINCT CASE WHEN sa.n_chunks > sb.n_chunks
              OR (sa.n_chunks = sb.n_chunks AND p.id_a < p.id_b)
         THEN p.id_b ELSE p.id_a END AS id
  FROM p JOIN sizes sa ON sa.id = p.id_a
         JOIN sizes sb ON sb.id = p.id_b)
SELECT s.id AS {id_col}, s.n_chunks,
       (l.id IS NULL) AS kept
FROM sizes s LEFT JOIN losers l ON l.id = s.id
ORDER BY {id_col}
"""


def cdc_cross_source_overlap(docs: DataFrame, k: int = 2,
                             divisor: int = CDC_DIVISOR,
                             by: str = "source",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Source × source shared-chunk heatmap — WHERE the duplication
    lives, not just how much: for every unordered group pair, the
    number of distinct CDC chunk hashes present in BOTH groups and the
    containment of the smaller side (``10000·shared div min(|A|,|B|)``
    basis points). Shift-robust by the CDC cut rule, so a mirror site
    that prepends a banner still lights up. The curation payoff: a hot
    cell says cross-source dedup between those two sources pays before
    any pair enumeration is attempted.

    Scale shape: chunking is per-doc array work in the scan; the group
    chunk-SET frame (group, hash) is one distinct aggregation; the
    self-join fans out per chunk hash by the number of GROUPS sharing
    it (bounded by the source vocabulary, never document df); output
    is |groups|² metadata.
    """
    ch = (_cdc_chunks(docs, k, divisor, [by], id_col, text_col)
          .select(F.col(by).alias("_g"), "_h").distinct())
    from rgd_rnaseq_workflows_spark.session import checkpoint_df
    ch = checkpoint_df(ch, eager=False)
    sizes = ch.groupBy("_g").agg(F.count("*").cast("long").alias("_n"))
    a, b = ch.alias("a"), ch.alias("b")
    shared = (a.join(b, (F.col("a._h") == F.col("b._h"))
                     & (F.col("a._g") < F.col("b._g")))
              .groupBy(F.col("a._g").alias("source_a"),
                       F.col("b._g").alias("source_b"))
              .agg(F.count("*").cast("long").alias("shared_chunks")))
    sa = sizes.select(F.col("_g").alias("source_a"),
                      F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_g").alias("source_b"),
                      F.col("_n").alias("_nb"))
    return (shared.join(F.broadcast(sa), "source_a")
            .join(F.broadcast(sb), "source_b")
            .select("source_a", "source_b", "shared_chunks",
                    F.expr("10000 * shared_chunks div least(_na, _nb)")
                    .cast("long").alias("containment_bp"))
            .orderBy("source_a", "source_b"))


def cdc_cross_source_overlap_sql(table: str, k: int = 2,
                                 divisor: int = CDC_DIVISOR,
                                 by: str = "source",
                                 id_col: str = "doc_id",
                                 text_col: str = "text") -> str:
    """DuckDB twin of :func:`cdc_cross_source_overlap` — identical cut
    rule, chunk identity, distinct group sets and integer containment."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if divisor < 2:
        raise ValueError("divisor must be >= 2")
    from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
    from rgd_rnaseq_workflows_spark.functions.text import (
        shingles_all_sql, tokens_sql)
    toks = tokens_sql(text_col)
    grams = shingles_all_sql(text_col, k)
    cut_h = md5_long_sql("gr[i]")
    return f"""
WITH base AS (
  SELECT {by} AS g, {toks} AS t, {grams} AS gr
  FROM {table} WHERE len({toks}) > 0),
cuts AS (
  SELECT g, t,
    list_filter(list_transform(range(1, len(gr) + 1),
      i -> CASE WHEN {cut_h} % {divisor} = 0
           THEN least(i + {k - 1}, len(t)) END),
      x -> x IS NOT NULL) AS e0
  FROM base),
ends AS (
  SELECT g, t,
    CASE WHEN len(e0) = 0 OR e0[-1] <> len(t)
         THEN list_append(e0, len(t)) ELSE e0 END AS e
  FROM cuts),
grp AS (
  SELECT DISTINCT g,
    {md5_long_sql("array_to_string(t[(sp.s):(sp.e)], ' ')")} AS h
  FROM (SELECT g, t,
          unnest(list_transform(range(1, len(e) + 1),
            j -> {{'s': CASE WHEN j = 1 THEN 1 ELSE e[j - 1] + 1 END,
                  'e': e[j]}})) AS sp
        FROM ends)),
sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM grp GROUP BY g),
shared AS (
  SELECT a.g AS source_a, b.g AS source_b,
         CAST(count(*) AS BIGINT) AS shared_chunks
  FROM grp a JOIN grp b ON a.h = b.h AND a.g < b.g
  GROUP BY 1, 2)
SELECT source_a, source_b, shared_chunks,
       CAST((10000 * shared_chunks) // least(sa.n, sb.n) AS BIGINT)
         AS containment_bp
FROM shared
JOIN sizes sa ON sa.g = source_a
JOIN sizes sb ON sb.g = source_b
ORDER BY source_a, source_b
"""
