"""Market-basket association mining: support / confidence / lift over
transaction baskets — the classic frequent-pair analysis (Agrawal &
Srikant 1994's A-priori restricted to pairs, which is the part that
scales declaratively) applied to any (basket, item) relation: parts per
order, domains per user session, tags per document.

Scale design (100 TB): the pair generator is a SELF-JOIN ON THE BASKET
KEY, so the blowup is Σ_b C(|b|, 2) — bounded by the per-basket item
count (retail baskets are tens of items), never |items|² and never
|baskets|². The min-support filter applies to the PAIR COUNT table
(vocabulary-scale) before any ranking; item margins are one
map-side-combined groupBy; the top-k ranking uses the two-phase
candidate cut (the key_skew discipline) so no reducer sorts the full
pair vocabulary. Lift is reported as an exact integer ppm ratio —
``lift = n·c_ab/(c_a·c_b)`` — so both engines rank identically with a
deterministic (lift desc, item_a, item_b) tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.session import checkpoint_df


def association_rules(tx: DataFrame, basket_col: str, item_col: str,
                      min_support: int = 5, top_k: int = 20,
                      n_buckets: int = 32) -> DataFrame:
    """Top-``top_k`` item pairs by lift among pairs co-occurring in at
    least ``min_support`` baskets. Items are deduplicated within a
    basket first (a basket either contains an item or not — quantity
    is :mod:`relational`'s business). Output per pair (item_a <
    item_b): basket counts of each item and the pair, and exact ppm
    support / confidence(a→b) / lift.

    ``lift_ppm = 10⁶·n_baskets·c_ab div (c_a·c_b)`` — an exact integer
    division of exact counts (c_a·c_b < n²: bound documented in the
    module docstring envelope), so the (lift desc, pair asc) rank is
    engine-identical. Confidence is directional a→b; the symmetric
    pair is read with a,b swapped (confidence(b→a) =
    support·10⁶ div c_b — derivable, not repeated).

    Scale shape: basket-dedup groupBy → basket-keyed self-join (pair
    blowup bounded per basket) → map-side-combined pair count →
    min-support filter at pair-vocabulary scale → two-phase top-k
    (per-partition candidate cut under the total order, then a rank
    over ≤ P·top_k survivors) → broadcast item margins."""
    # the deduped basket table feeds FOUR subtrees (basket total, item
    # margins, both self-join sides); checkpoint it once so the
    # distinct shuffle runs once instead of once per consumer
    b = checkpoint_df(
        tx.select(F.col(basket_col).alias("bk"),
                  F.col(item_col).cast("long").alias("it"))
        .filter(F.col("it").isNotNull())
        .distinct(), eager=False)
    nb = b.agg(F.countDistinct("bk").cast("long").alias("_n"))
    items = b.groupBy("it").agg(F.count("*").alias("c"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (a.join(c, "bk")
             .filter(F.col("a.it") < F.col("c.it"))
             .select(F.col("a.it").alias("ia"),
                     F.col("c.it").alias("ib"))
             .groupBy("ia", "ib").agg(F.count("*").alias("cab"))
             .filter(F.col("cab") >= min_support))
    pairs = (pairs
             .join(F.broadcast(items.select(F.col("it").alias("ia"),
                                            F.col("c").alias("ca"))),
                   "ia")
             .join(F.broadcast(items.select(F.col("it").alias("ib"),
                                            F.col("c").alias("cb"))),
                   "ib")
             .crossJoin(F.broadcast(nb))
             .withColumn("lift_ppm", F.expr(
                 "1000000 * _n * cab div (ca * cb)").cast("long")))
    order = [F.desc("lift_ppm"), F.asc("ia"), F.asc("ib")]
    cand_w = Window.partitionBy("_pid").orderBy(*order)
    cand = (pairs.withColumn("_pid", F.spark_partition_id())
            .withColumn("_prn", F.row_number().over(cand_w))
            .filter(F.col("_prn") <= top_k)
            .drop("_pid", "_prn"))
    w = Window.orderBy(*order)
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("rank", F.col("ia").alias("item_a"),
                    F.col("ib").alias("item_b"),
                    F.col("ca").cast("long").alias("n_a"),
                    F.col("cb").cast("long").alias("n_b"),
                    F.col("cab").cast("long").alias("n_both"),
                    F.expr("cab * 1000000 div _n")
                    .cast("long").alias("support_ppm"),
                    F.expr("cab * 1000000 div ca").cast("long")
                    .alias("confidence_ppm"),
                    "lift_ppm")
            .orderBy("rank"))


def association_rules_sql(src: str, basket_col: str, item_col: str,
                          min_support: int = 5,
                          top_k: int = 20) -> str:
    """DuckDB twin of :func:`association_rules` (single-window rank —
    the two-phase cut is lossless)."""
    return f"""
WITH b AS (
  SELECT DISTINCT {basket_col} AS bk, CAST({item_col} AS BIGINT) AS it
  FROM {src} WHERE {item_col} IS NOT NULL),
nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM b),
items AS (SELECT it, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY it),
pairs AS (
  SELECT a.it AS ia, c.it AS ib, CAST(count(*) AS BIGINT) AS cab
  FROM b a JOIN b c USING (bk)
  WHERE a.it < c.it
  GROUP BY a.it, c.it
  HAVING count(*) >= {min_support}),
scored AS (
  SELECT p.ia, p.ib, p.cab, x.c AS ca, y.c AS cb,
         CAST(1000000 * nb.n * p.cab // (x.c * y.c) AS BIGINT)
           AS lift_ppm
  FROM pairs p
  JOIN items x ON x.it = p.ia
  JOIN items y ON y.it = p.ib, nb),
ranked AS (
  SELECT *, row_number() OVER (
    ORDER BY lift_ppm DESC, ia ASC, ib ASC) AS rank
  FROM scored)
SELECT rank, ia AS item_a, ib AS item_b, ca AS n_a, cb AS n_b,
       cab AS n_both,
       CAST(cab * 1000000 // (SELECT n FROM nb) AS BIGINT)
         AS support_ppm,
       CAST(cab * 1000000 // ca AS BIGINT) AS confidence_ppm,
       lift_ppm
FROM ranked WHERE rank <= {top_k}
ORDER BY rank
"""
