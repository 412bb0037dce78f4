"""Skew mitigation operators.

AQE's skew-join splitting (enabled in ``session.py``) handles most runtime
skew; these explicit forms cover the two cases AQE can't re-plan:

- **salted aggregation** — a single hot group key (the empty-document
  fingerprint, the null sample, one giant project) funnels into one task.
  Two-phase: partial aggregate on (key, salt), final on key. The partial
  phase spreads the hot key over N tasks; the final phase sees N rows per
  key, not millions.
- **salted broadcast-replicate join** — a hot probe-side key joined
  against a small-but-replicable build side: build rows are exploded once
  per salt so the probe side can keep its natural (deterministic, hashed)
  salt and still match.

Both are result-identical to their naive forms (asserted in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, keys: Sequence[str],
               sum_cols: Sequence[str], n_salts: int = 16) -> DataFrame:
    """Two-phase sum/count: partial on (keys, salt), final on keys.
    The salt is deterministic (hash of the whole row via monotonic id is
    NOT — use spark_partition_id, which is stable per task and needs no
    extra column)."""
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    partial = (salted.groupBy(*keys, "_salt")
               .agg(*[F.sum(c).alias(f"_p_{c}") for c in sum_cols],
                    F.count("*").alias("_p_n")))
    return (partial.groupBy(*keys)
            .agg(*[F.sum(f"_p_{c}").alias(f"sum_{c}") for c in sum_cols],
                 F.sum("_p_n").alias("n")))


def replicate_join_skewed(big: DataFrame, small: DataFrame, key: str,
                          n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed big table against a small build side by replicating
    the build side once per salt; the big side salts deterministically by
    partition. Equivalent to ``big.join(small, key)`` row-for-row."""
    big_s = big.withColumn("_salt", F.spark_partition_id() % n_salts)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = big_s.join(small_r, [key, "_salt"], how)
    return out.drop("_salt")
