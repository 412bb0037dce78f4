"""Hilbert-curve data layout for file skipping — the locality upgrade
over Z-order.

The Morton curve (operators/zorder.py) jumps across the space at every
power-of-two boundary, so a file of consecutive Z-keys can still span a
wide slice of one dimension. The Hilbert curve visits grid cells so
that CONSECUTIVE indices are always GRID NEIGHBORS (Manhattan distance
1 — pinned by test), which keeps every run of consecutive keys inside a
compact blob and tightens parquet footer min/max spans further; it is
the curve choice behind modern liquid-clustering layouts.

Construction: the classic bitwise transform (the standard quadrant-
rotation formulation of Hilbert's curve): from the top bit level down,
take the two dimensions' bits (rx, ry), add ``s² · ((3·rx) XOR ry)`` to
the index, and rotate/reflect the remaining low bits into the
quadrant's frame. Everything is integer shifts/masks/xor on the SAME
clamp + multiply-div quantization Z-order uses — bit-identical in
Spark and DuckDB, so the key and any stats on it oracle-check. The
rotation makes each level's output depend on the previous level's
(x, y), so the key is built as a CHAIN of ``bits`` narrow projections
(still scan-fused, still no shuffle) rather than one expression.

Two dimensions only: the rotation group for d > 2 needs a state table
(Gray-code + direction bookkeeping) that buys little at file-skipping
granularity — interleave more dimensions with Z-order instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.operators.zorder import (  # noqa: F401
    column_bounds)  # re-exported: callers mirror the zorder flow


def _check(cols, bits: int) -> None:
    if len(cols) != 2:
        raise ValueError("hilbert key is 2-dimensional (use zorder for "
                         f"{len(cols)} columns)")
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits={bits}: 2*bits must fit 62 key bits")


def _level_exprs(i: int, bits: int, dialect: str) -> tuple[str, str, str]:
    """(d', x', y') SQL for one Hilbert level over columns _hd/_hx/_hy.
    ``dialect``: 'spark' (shiftright, ^) or 'duckdb' (>>, xor)."""
    s = 1 << i
    n = 1 << bits
    if dialect == "spark":
        def shr(e, k):
            return f"shiftright({e}, {k})"

        def xor(a, b):
            return f"({a} ^ {b})"
    else:
        def shr(e, k):
            return f"({e} >> {k})"

        def xor(a, b):
            return f"xor({a}, {b})"
    rx = f"({shr('_hx', i)} & 1)"
    ry = f"({shr('_hy', i)} & 1)"
    d = f"_hd + {s} * {s} * CAST({xor(f'3 * {rx}', ry)} AS BIGINT)"
    # ry=0: reflect when rx=1 (about n-1), then swap x/y; ry=1: identity
    x = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
         f"THEN {n - 1} - _hy ELSE _hy END) ELSE _hx END")
    y = (f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
         f"THEN {n - 1} - _hx ELSE _hx END) ELSE _hy END")
    return d, x, y


def with_hilbert_key(df: DataFrame, cols: list[str],
                     bounds: list[tuple[int, int]], bits: int = 12,
                     out: str = "hkey") -> DataFrame:
    """Adds ``out`` = the Hilbert index of the two quantized columns.
    A chain of ``bits`` projections (codegen-fused, no shuffle)."""
    _check(cols, bits)
    from rgd_rnaseq_workflows_spark.operators.zorder import _quant
    others = list(df.columns)
    cur = df.select(*others,
                    _quant(cols[0], *bounds[0], bits).alias("_hx"),
                    _quant(cols[1], *bounds[1], bits).alias("_hy"),
                    F.lit(0).cast("long").alias("_hd"))
    for i in reversed(range(bits)):
        d, x, y = _level_exprs(i, bits, "spark")
        cur = cur.select(*others,
                         F.expr(x).alias("_hx"),
                         F.expr(y).alias("_hy"),
                         F.expr(d).alias("_hd"))
    return cur.select(*others, F.col("_hd").cast("long").alias(out))


def hilbert_stats(df: DataFrame, cols: list[str],
                  bounds: list[tuple[int, int]], bits: int = 12,
                  bucket_bits: int = 4) -> DataFrame:
    """Locality report over the top ``bucket_bits`` of the Hilbert
    index — the zorder_stats shape: one row per leading-prefix bucket
    (the file/row-group surrogate) with row count and each dimension's
    min/max span. One map-side-combined aggregation."""
    _check(cols, bits)
    keyed = with_hilbert_key(df, cols, bounds, bits)
    shift = 2 * bits - bucket_bits
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")).alias(f"min_{c}"),
                 F.max(F.col(c).cast("long")).alias(f"max_{c}")]
    return (keyed.withColumn("hbucket",
                             F.shiftright(F.col("hkey"), shift))
            .groupBy("hbucket").agg(*aggs))


def write_hilbert_clustered(df: DataFrame, path: str, cols: list[str],
                            bits: int = 12, n_files: int = 8,
                            bounds: list[tuple[int, int]] | None = None
                            ) -> None:
    """Cluster-write on the Hilbert index — ONE sampled range shuffle
    (balanced files even on skew) + in-partition sort, the
    write_zordered contract."""
    bounds = bounds if bounds is not None else column_bounds(df, cols)
    (with_hilbert_key(df, cols, bounds, bits, out="_hkey")
     .repartitionByRange(n_files, "_hkey")
     .sortWithinPartitions("_hkey")
     .drop("_hkey")
     .write.mode("overwrite").parquet(path))


def hilbert_stats_autobounds_sql(table: str, cols: list[str],
                                 bits: int = 12,
                                 bucket_bits: int = 4) -> str:
    """DuckDB twin of ``column_bounds`` + :func:`hilbert_stats` with
    bounds computed IN SQL — valid when ``range · (2^bits − 1)`` fits
    int64 (the zorder_stats_autobounds_sql contract; DuckDB errors
    loudly on overflow rather than wrapping)."""
    _check(cols, bits)
    top = (1 << bits) - 1
    cx, cy = cols
    bnds = ", ".join(
        f"CAST(min({c}) AS BIGINT) AS lo_{c}, "
        f"CAST(max({c}) AS BIGINT) AS hi_{c}" for c in cols)
    qdefs = []
    for c, alias in ((cx, "_hx"), (cy, "_hy")):
        qdefs.append(
            f"CASE WHEN hi_{c} <= lo_{c} THEN CAST(0 AS BIGINT) "
            f"ELSE ((least(greatest(CAST({c} AS BIGINT), lo_{c}), hi_{c})"
            f" - lo_{c}) * {top}) // (hi_{c} - lo_{c}) END AS {alias}")
    passthrough = ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
    ctes = [f"qv0 AS (SELECT {passthrough}, {', '.join(qdefs)}, "
            f"CAST(0 AS BIGINT) AS _hd FROM {table}, hb)"]
    prev = "qv0"
    for step, i in enumerate(reversed(range(bits)), start=1):
        d, x, y = _level_exprs(i, bits, "duckdb")
        ctes.append(f"qv{step} AS (SELECT {cx}, {cy}, ({d}) AS _hd, "
                    f"({x}) AS _hx, ({y}) AS _hy FROM {prev})")
        prev = f"qv{step}"
    shift = 2 * bits - bucket_bits
    spans = ", ".join(
        f"min({c}) AS min_{c}, max({c}) AS max_{c}" for c in cols)
    return (f"WITH hb AS (SELECT {bnds} FROM {table}),\n"
            + ",\n".join(ctes)
            + f"\nSELECT (_hd >> {shift}) AS hbucket, "
            f"CAST(count(*) AS BIGINT) AS n_rows, {spans} "
            f"FROM {prev} GROUP BY 1")
