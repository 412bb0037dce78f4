"""Deterministic stratified sampling for training-mix construction.

Building a training mix means sampling each stratum (language, source,
quality band) at its own rate. ``df.sample`` is seed-dependent per
partitioning and not reproducible across engines; the scalable,
reproducible form is HASH-BUCKET Bernoulli sampling:

    keep row  ⇔  md5(seed:key) mod 10000  <  rate(stratum) * 10000

Scale design (100 TB):
- a pure FILTER — no shuffle, no sort, no state; runs inside the parquet
  scan's whole-stage codegen and composes with predicate pushdown on the
  stratum column;
- deterministic in the row KEY, not the partitioning: the same row is
  kept on any cluster size, any engine with md5 (the DuckDB oracle
  reproduces the exact kept set);
- changing one stratum's rate only touches that stratum's rows
  (monotone: raising a rate only ADDS rows — bucket thresholds nest),
  which makes mix iteration cheap and auditable.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long, md5_long_sql

BUCKETS = 10_000  # basis points: rates quantized to 0.01%


def _bps(fraction: float) -> int:
    bps = int(round(fraction * BUCKETS))
    if not 0 <= bps <= BUCKETS:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return bps


def sample_bucket(key_col: Column | str, seed: int = 1) -> Column:
    """The row's sampling bucket in [0, 10000) — md5-derived, so identical
    in any engine (``md5_long``'s contract)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return md5_long(c.cast("string"), seed=seed) % BUCKETS


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], key_col: str,
                           seed: int = 1,
                           default: float = 0.0) -> DataFrame:
    """Keep each stratum at its own rate, deterministically in ``key_col``.

    ``fractions`` maps stratum value → keep rate in [0, 1]; strata not
    listed keep ``default``. The per-stratum threshold is a broadcast-free
    literal map lookup (``element_at`` on a map literal — JVM expression,
    no join).
    """
    thresholds = F.create_map(*chain.from_iterable(
        (F.lit(k), F.lit(_bps(v))) for k, v in sorted(fractions.items())))
    thr = F.coalesce(F.element_at(thresholds, F.col(strata_col)),
                     F.lit(_bps(default)))
    return df.filter(sample_bucket(key_col, seed) < thr)


def stratified_hash_sample_sql(src: str, strata_col: str,
                               fractions: dict[str, float], key_col: str,
                               seed: int = 1,
                               default: float = 0.0) -> str:
    """ANSI-SQL twin of :func:`stratified_hash_sample` (DuckDB oracle)."""
    whens = "\n".join(
        f"    WHEN '{k}' THEN {_bps(v)}"
        for k, v in sorted(fractions.items()))
    bucket = f"{md5_long_sql(f'CAST({key_col} AS VARCHAR)', seed=seed)} % {BUCKETS}"
    return f"""
SELECT * FROM {src}
WHERE {bucket} < (CASE {strata_col}
{whens}
    ELSE {_bps(default)} END)
"""
