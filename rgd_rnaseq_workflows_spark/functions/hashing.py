"""Portable deterministic hashing used by dedup/fingerprint operators.

Built on ``md5`` so the exact same hash family is computable in any ANSI-SQL
engine (the DuckDB oracle included) — unlike ``xxhash64``/``hash`` whose
implementations differ across engines. 15 hex digits = 60 bits, safely
inside a signed 64-bit integer.

At 100 TB scale md5-per-token is pure CPU inside whole-stage codegen — no
shuffle, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 2^63


def md5_long(col: Column | str, seed: int | None = None) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    Equivalent DuckDB SQL:
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`` and with a seed
    ``md5(CAST(seed AS VARCHAR) || ':' || x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: int | None = None) -> str:
    """The matching DuckDB/ANSI SQL text for :func:`md5_long`."""
    inner = f"CAST({seed} AS VARCHAR) || ':' || {expr}" if seed is not None else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, {HEX_DIGITS})) AS BIGINT)"
