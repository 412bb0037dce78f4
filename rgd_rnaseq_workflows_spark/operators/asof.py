"""As-of join — Spark lacks a native one (SURVEY §2.3 "not present";
guide: bucketize or merge_asof). This implementation uses the
union-and-window technique, which scales better than any join:

1. tag left (probe) and right (reference) rows, union them;
2. one window per key, ordered by the time axis;
3. every probe row picks the last preceding reference row with
   ``last(..., ignorenulls)`` over an UNBOUNDED PRECEDING .. 1 PRECEDING
   frame.

Cost: ONE shuffle on the key (same as any join would need), no row
explosion, no skew amplification — a hot key degrades to a sort, not a
cross product. Works identically in batch and (with minor changes)
``applyInPandasWithState`` streaming.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probe: DataFrame, reference: DataFrame,
              keys: Sequence[str], order_cols: Sequence[str],
              payload_cols: Sequence[str],
              strict: bool = True) -> DataFrame:
    """For each probe row, attach the payload of the latest reference row
    with the same keys and order position ≤ (or < when ``strict``) the
    probe's.

    ``order_cols`` must totally order rows within a key (add a tiebreaker
    id column — determinism is on the caller).
    Returns the probe rows plus ``asof_<payload>`` columns (NULL when no
    reference row precedes).
    """
    missing = [c for c in order_cols
               if c not in probe.columns or c not in reference.columns]
    if missing:
        raise ValueError(
            f"order_cols must exist on BOTH sides (missing: {missing}); "
            "a one-sided order column would be NULL-filled on the other "
            "side and silently corrupt the as-of ordering")
    p = probe.withColumn("_side", F.lit(1))
    r = reference.withColumn("_side", F.lit(0))
    for c in probe.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    for c in reference.columns:
        if c not in p.columns:
            p = p.withColumn(c, F.lit(None).cast(dict(reference.dtypes)[c]))
    unioned = p.unionByName(r)

    # tie handling at an identical order position decides strictness:
    # strict  → reference sorts AFTER the probe (desc _side), so a
    #           same-instant reference is outside the preceding frame;
    # lenient → reference sorts BEFORE the probe and the frame includes
    #           it via the 1-PRECEDING bound.
    side_order = F.desc("_side") if strict else F.asc("_side")
    w = (Window.partitionBy(*keys)
         .orderBy(*[F.col(c) for c in order_cols], side_order)
         .rowsBetween(Window.unboundedPreceding, -1))
    out = unioned
    for c in payload_cols:
        out = out.withColumn(
            f"asof_{c}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w))
    return (out.filter(F.col("_side") == 1)
            .select(*probe.columns, *[f"asof_{c}" for c in payload_cols]))
