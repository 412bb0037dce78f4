"""Z-order (Morton) multi-dimensional data layout for file skipping.

At 100 TB the fastest scan is the one that never happens: parquet
readers prune whole files/row-groups from footer min/max statistics,
but those statistics only help when the written layout CLUSTERS rows
so each file covers a narrow value range. A single-column sort fixes
one predicate dimension and destroys the others; interleaving the bits
of several quantized columns (the Z-order / Morton curve) gives every
file a compact hyper-rectangle in ALL interleaved dimensions at once,
so multi-dimensional point/range predicates skip most files — the same
layout trick behind Delta/Iceberg OPTIMIZE ZORDER, built here from
plain Spark expressions.

Engine-portable exactness: quantization is a clamp + pre-shift +
integer multiply-div
``q = (((x − lo) >> s0) · (2^bits − 1)) div ((hi − lo) >> s0)`` with
``s0`` chosen so the multiply fits int64 — midpoint bucket splits
(every interleaved bit is informative; pure shift quantization's
power-of-two splits can leave a dimension's top bits constant), no
doubles anywhere (a float quantizer silently loses bits past 2^53 on
wide domains like nanosecond timestamps), and no overflow on those
same wide domains (the naive multiply ``(x−lo)·(2^bits−1)`` wraps
int64 at range ≈ 1.4e14 for 16 bits). The interleave is an OR of
disjoint single-bit shifts. All of it is bit-identical in Spark and
DuckDB, so the key and any stats built on it oracle-check. Total key
width ``bits · ncols`` must stay ≤ 62.

Scale shape: the key is a pure projection (no shuffle, codegen-fused
with the scan); ``write_zordered`` adds exactly one range shuffle
(``repartitionByRange`` on the key — Spark samples range boundaries,
so output files stay balanced even on skewed data) plus an
in-partition sort — the cost of any clustered write, paid once at
ingest and amortized over every subsequent pruned scan;
``zorder_stats`` is one map-side-combined aggregation over the top
key bits. Bounds are 2 scalars per column — driver metadata on the
codebook/centroid precedent (:func:`column_bounds` is one agg pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check(cols, bits: int) -> None:
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (plain sort for 1)")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits={bits} x {len(cols)} columns must fit 62 key bits")


def column_bounds(df: DataFrame, cols: list[str]) -> list[tuple[int, int]]:
    """(lo, hi) per column in ONE aggregation pass — bounded driver
    metadata (2 scalars per column)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"_lo_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(int(row[f"_lo_{c}"]), int(row[f"_hi_{c}"])) for c in cols]


def _preshift(lo: int, hi: int, bits: int) -> int:
    """Pre-shift keeping ``((range >> s0) · (2^bits − 1))`` inside
    int64: s0 = max(0, bitlength(range) + bits − 62)."""
    return max(0, (hi - lo).bit_length() + bits - 62)


def _quant(col: str, lo: int, hi: int, bits: int) -> Column:
    """q = (((x−lo) >> s0) · top) div (range >> s0), x clamped to
    [lo, hi] — exact integers, q ∈ [0, 2^bits)."""
    if hi <= lo:                       # degenerate domain: single bucket
        return F.lit(0).cast("long")
    s0 = _preshift(lo, hi, bits)
    top = (1 << bits) - 1
    rs = (hi - lo) >> s0
    return F.expr(
        f"(shiftright(least(greatest(cast(`{col}` as bigint), "
        f"cast({lo} as bigint)), cast({hi} as bigint)) "
        f"- cast({lo} as bigint), {s0}) * cast({top} as bigint)) "
        f"div cast({rs} as bigint)")


def zorder_key(cols: list[str], bounds: list[tuple[int, int]],
               bits: int = 16) -> Column:
    """The Morton key: clamp + shift-quantize each column to ``bits``
    bits, then interleave — column 0 owns the LOWEST bit of each
    group, matching :func:`zorder_key_sql` bit-for-bit. Out-of-bounds
    values clamp into the edge buckets instead of corrupting the key.
    Pure projection — no shuffle."""
    _check(cols, bits)
    qs = [_quant(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    key = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for ci, q in enumerate(qs):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + ci))
    return key


def zorder_key_sql(cols: list[str], bounds: list[tuple[int, int]],
                   bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` (identical clamp, shift
    quantization and interleave)."""
    _check(cols, bits)
    qs = []
    for c, (lo, hi) in zip(cols, bounds):
        if hi <= lo:
            qs.append("CAST(0 AS BIGINT)")
        else:
            s0 = _preshift(lo, hi, bits)
            top = (1 << bits) - 1
            rs = (hi - lo) >> s0
            qs.append(
                f"((((least(greatest(CAST({c} AS BIGINT), "
                f"CAST({lo} AS BIGINT)), CAST({hi} AS BIGINT))"
                f" - {lo}) >> {s0}) * {top}) // {rs})")
    n = len(cols)
    terms = [f"((({q} >> {i}) & 1) << {i * n + ci})"
             for i in range(bits) for ci, q in enumerate(qs)]
    return "(" + " | ".join(terms) + ")"


def zorder_stats(df: DataFrame, cols: list[str],
                 bounds: list[tuple[int, int]], bits: int = 16,
                 bucket_bits: int = 4) -> DataFrame:
    """Locality report over the top ``bucket_bits`` of the key — one
    row per leading-Z-prefix bucket (the file/row-group surrogate):
    row count plus each dimension's min/max span. On a Z-ordered
    layout every bucket's spans are narrow slices of the global
    range — exactly the property parquet footer pruning feeds on. One
    map-side-combined aggregation; output is ≤ 2^bucket_bits rows."""
    _check(cols, bits)
    key = zorder_key(cols, bounds, bits)
    shift = bits * len(cols) - bucket_bits
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"min_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"max_{c}")]
    return (df.withColumn("zbucket", F.shiftright(key, shift))
            .groupBy("zbucket").agg(*aggs))


def zorder_stats_sql(table: str, cols: list[str],
                     bounds: list[tuple[int, int]], bits: int = 16,
                     bucket_bits: int = 4) -> str:
    """DuckDB twin of :func:`zorder_stats`."""
    key = zorder_key_sql(cols, bounds, bits)
    shift = bits * len(cols) - bucket_bits
    spans = ", ".join(
        f"CAST(min({c}) AS BIGINT) AS min_{c}, "
        f"CAST(max({c}) AS BIGINT) AS max_{c}" for c in cols)
    return f"""
SELECT ({key} >> {shift}) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows, {spans}
FROM {table}
GROUP BY 1"""


def zorder_stats_autobounds_sql(table: str, cols: list[str],
                                bits: int = 12,
                                bucket_bits: int = 4) -> str:
    """DuckDB twin of ``column_bounds`` + :func:`zorder_stats` with the
    bounds computed IN SQL (one min/max CTE) — for oracles that must be
    a static string while the Spark side derives bounds from the same
    data. Valid when the pre-shift is 0, i.e. the domain width keeps
    ``range · (2^bits − 1)`` inside int64 (≈ 1.1e15 for 12 bits) —
    DuckDB errors loudly on overflow rather than wrapping."""
    _check(cols, bits)
    top = (1 << bits) - 1
    bnds = ", ".join(
        f"CAST(min({c}) AS BIGINT) AS lo_{c}, "
        f"CAST(max({c}) AS BIGINT) AS hi_{c}" for c in cols)
    qdefs = ", ".join(
        f"CASE WHEN hi_{c} <= lo_{c} THEN CAST(0 AS BIGINT) "
        f"ELSE ((least(greatest(CAST({c} AS BIGINT), lo_{c}), hi_{c})"
        f" - lo_{c}) * {top}) // (hi_{c} - lo_{c}) END AS q_{c}"
        for c in cols)
    passthrough = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    n = len(cols)
    terms = [f"(((q_{c} >> {i}) & 1) << {i * n + ci})"
             for i in range(bits) for ci, c in enumerate(cols)]
    key = "(" + " | ".join(terms) + ")"
    shift = bits * n - bucket_bits
    spans = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in cols)
    return f"""
WITH zb AS (SELECT {bnds} FROM {table}),
qv AS (SELECT {passthrough}, {qdefs} FROM {table}, zb)
SELECT ({key} >> {shift}) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows, {spans}
FROM qv
GROUP BY 1"""


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 16, n_files: int = 8,
                   bounds: list[tuple[int, int]] | None = None) -> None:
    """Cluster-write ``df`` as parquet along the Z-order curve:
    ``repartitionByRange`` on the Morton key (one sampled range
    shuffle → balanced files) + in-partition sort, key dropped before
    write. Each output file covers a compact hyper-rectangle in every
    interleaved dimension, so footer min/max stats prune files for
    multi-dimensional predicates."""
    bounds = bounds if bounds is not None else column_bounds(df, cols)
    key = zorder_key(cols, bounds, bits)
    (df.withColumn("_zkey", key)
     .repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))


def file_manifest(spark, path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max manifest from parquet FOOTERS (no data read) —
    the metadata an Iceberg/Delta table keeps per data file. Returns a
    list of {file, min_<c>, max_<c>} dicts; manifest size is
    files-scale (driver metadata by definition). A production lake
    writes this at ingest time (the write already has the stats);
    computing it on demand here reads only footers."""
    import glob
    import pyarrow.parquet as pq
    out = []
    for f in sorted(glob.glob(f"{path.rstrip('/')}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                name = cc.path_in_schema
                if name in cols and cc.statistics is not None:
                    st = cc.statistics
                    lo[name] = st.min if name not in lo \
                        else min(lo[name], st.min)
                    hi[name] = st.max if name not in hi \
                        else max(hi[name], st.max)
        entry = {"file": f}
        for c in cols:
            entry[f"min_{c}"] = lo.get(c)
            entry[f"max_{c}"] = hi.get(c)
        out.append(entry)
    return out


def pruned_read(spark, path: str, manifest: list[dict],
                ranges: dict[str, tuple[int, int]]):
    """Range-predicate read that SKIPS files whose manifest interval
    misses every predicate: the file-level pruning parquet row-group
    stats can't give you (Spark prunes row groups inside a file, but
    still opens and plans every file — at 100 TB the planner-side file
    cut is the win, which is exactly why Z-ordering + manifests exist).

    Returns (df, n_files_read, n_files_total): the DataFrame still
    carries the residual filter, so correctness never depends on the
    manifest — pruning is a pure fast-path. A file with no stats for a
    predicated column is conservatively kept."""
    keep = []
    for e in manifest:
        ok = True
        for c, (lo, hi) in ranges.items():
            mn, mx = e.get(f"min_{c}"), e.get(f"max_{c}")
            if mn is not None and mx is not None and (mx < lo or mn > hi):
                ok = False
                break
        keep.append(e["file"]) if ok else None
    df = spark.read.parquet(*keep) if keep else \
        spark.read.parquet(path).limit(0)
    for c, (lo, hi) in ranges.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, len(keep), len(manifest)
