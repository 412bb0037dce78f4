"""Output formatting & sentinel fidelity (SURVEY §7.2 "hard parts" #1/#4).

The reference formats floats with ``printf %.2f`` / ``bc scale=6``
(``scripts/pSTARQC_v1.sh:90-91``, ``scripts/ComputeSex_v5.sh:113-124``)
and writes sentinel strings where a typed engine holds NULL. These helpers
isolate that byte-fidelity in one module so sinks reproduce it exactly
while internal plans stay typed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def printf_round(col: Column | str, places: int) -> Column:
    """``printf %.Nf``-style rounding (half-up for the positive values the
    reference emits; SURVEY F15)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, places)


def bc_scale_truncate(col: Column | str, scale: int = 6) -> Column:
    """``bc scale=N`` semantics: TRUNCATE toward zero at N decimals — bc
    does not round (``ComputeSex_v5.sh:113,117,124``)."""
    c = F.col(col) if isinstance(col, str) else col
    factor = 10 ** scale
    return (c * factor).cast("long") / F.lit(float(factor))


def sentinel_inf(col: Column | str) -> Column:
    """Render a nullable double as the reference's string column whose NULL
    means division-by-zero: literal ``Inf`` (``ComputeSex_v5.sh:120-124``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit("Inf")).otherwise(c.cast("string"))


def sentinel_na(col: Column | str, sentinel: str = "NA") -> Column:
    """NULL → ``NA`` (e.g. STARQC NO_LOG rows, ``pSTARQC_v1.sh:74``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(sentinel))
