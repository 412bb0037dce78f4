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


def bc_div_scaled(numer: Column | str, denom: Column | str,
                  scale: int = 6) -> Column:
    """``bc scale=N`` division of two non-negative INTEGER columns, returned
    as the scaled integer ``trunc(numer/denom · 10^N)`` (long) — bc does not
    round (``ComputeSex_v5.sh:113,117,124``).

    Exact: computed as ``floor(numer·10^N / denom)`` in decimal(38) integer
    arithmetic, never through a double. (Multiplying a double quotient by
    10^N and casting diverges from bc — e.g. 249/1000000 at scale 6 gives
    double 248.999…e-6 → 248, while bc yields 249.)
    """
    n = (F.col(numer) if isinstance(numer, str) else numer).cast("decimal(38,0)")
    d = (F.col(denom) if isinstance(denom, str) else denom).cast("decimal(38,0)")
    return F.floor(n * F.lit(10 ** scale) / d).cast("long")


def bc_div(numer: Column | str, denom: Column | str,
           scale: int = 6) -> Column:
    """:func:`bc_div_scaled` as a double (``scaled / 10^N``) for typed
    plans; format with :func:`bc_fixed_str` at the sink for byte parity."""
    return bc_div_scaled(numer, denom, scale) / F.lit(float(10 ** scale))


def bc_fixed_str(scaled: Column | str, scale: int = 6) -> Column:
    """Render a bc ``scale=N`` result from its scaled-integer form exactly
    as bc prints it: ``0`` for zero, no leading integer zero for |x| < 1
    (``.000249``), fixed N fractional digits otherwise (``2.500000``)."""
    s = F.col(scaled) if isinstance(scaled, str) else scaled
    factor = 10 ** scale
    intpart = F.floor(s / F.lit(float(factor))).cast("long")
    frac = F.lpad(F.pmod(s, F.lit(factor)).cast("string"), scale, "0")
    return (F.when(s == 0, F.lit("0"))
            .when(intpart == 0, F.concat(F.lit("."), frac))
            .otherwise(F.concat(intpart.cast("string"), F.lit("."), frac)))


def sentinel_inf(col: Column | str) -> Column:
    """Render a nullable double as the reference's string column whose NULL
    means division-by-zero: literal ``Inf`` (``ComputeSex_v5.sh:120-124``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit("Inf")).otherwise(c.cast("string"))


def sentinel_na(col: Column | str, sentinel: str = "NA") -> Column:
    """NULL → ``NA`` (e.g. STARQC NO_LOG rows, ``pSTARQC_v1.sh:74``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(sentinel))
