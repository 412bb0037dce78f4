"""Distributed Pareto skyline (maximal-vector) operator.

Data selection for training mixes is rarely one-dimensional: the docs
worth keeping are the ones no other doc beats on EVERY axis at once
(vocabulary richness vs length vs repetitiveness, quality vs novelty
vs cost). The skyline — the set of non-dominated rows under a set of
maximize/minimize criteria — is the classic relational answer
(Börzsönyi et al., "The Skyline Operator", ICDE 2001), and Spark has
no built-in for it.

Scale design — grid-pruned, never a naive all-pairs:

1. **One metadata pass** computes per-dim min/max (1 row collected),
   fixing a ``bins``-wide grid per dimension.
2. **Cell statistics**: one map-side-combined aggregation to the cell
   grid (≤ ``bins^d`` rows — driver metadata no matter the corpus
   size) carrying each cell's per-dim *point* min/max corners.
3. **Driver-side cell pruning** (O(cells²) on metadata): cell C is
   discarded when some cell C' has its min-corner strictly better
   than C's max-corner in every dim — then ANY point of C' dominates
   ALL of C (each C' point is ≥ its cell's min corner; each C point
   ≤ its cell's max corner). Skyline points can never be pruned, so
   the surviving cells contain every possible dominator that matters:
   dominance is transitive, hence every dominated point is dominated
   by some *skyline* point, which lives in a surviving cell.
4. **Equi-partitioned verify**: candidate (cell → dominator-cell)
   pairs — only those whose corners allow dominance — broadcast onto
   the surviving points; the point-level dominance check is then an
   EQUI join on the candidate-cell id (hash-partitioned, never a
   cartesian/BNL plan), followed by one left-anti on the unique id.

Worst case is inherent to the operator (anticorrelated dims ⇒ a huge
skyline ⇒ dense candidate pairs); ``bins`` tunes prune granularity —
more bins, tighter corners, fewer false candidate pairs, more (still
metadata-scale) cells. All arithmetic is integer ⇒ bit-exact vs the
DuckDB ``NOT EXISTS`` twin, which runs the naive definitional form so
the pruning logic itself is cross-checked.

No reference-repo counterpart: this is an LLM-pipeline extension
(multi-criteria corpus selection), same family as the quality /
sampling operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.session import checkpoint_df

Direction = str  # "max" | "min"


def _signed(col: str, direction: Direction) -> Column:
    c = F.col(col).cast("long")
    return c if direction == "max" else -c


def pareto_skyline(df: DataFrame, dims: dict[str, Direction],
                   id_col: str, bins: int = 8) -> DataFrame:
    """Rows of ``df`` not dominated under ``dims`` (col → "max"/"min").

    q dominates p iff q is better-or-equal on every dim and strictly
    better on at least one — duplicates of the same dim vector never
    dominate each other, so tied optima all survive (the definitional
    semantics the SQL twin encodes). ``id_col`` must be unique per row
    (it keys the final anti-join). Dim columns must be integral —
    exactness contract (callers fix-point scale floats first, the
    clustering.py convention).

    Returns ``id_col`` + the dim columns, original values and names.
    """
    if not dims or bins < 1:
        raise ValueError("dims must be non-empty and bins >= 1")
    names = list(dims)
    # checkpoint BEFORE the min/max pre-pass: the upstream lineage
    # (often a tokenize/aggregate feature derivation) would otherwise
    # run once for the grid bounds and again for the cell stats
    pts = checkpoint_df(
        df.select(id_col, *names,
                  *[_signed(c, dims[c]).alias(f"_s_{k}")
                    for k, c in enumerate(names)]),
        eager=False)
    sc = [f"_s_{k}" for k in range(len(names))]

    row = pts.agg(*[m for c in sc
                    for m in (F.min(c).alias(f"mn_{c}"),
                              F.max(c).alias(f"mx_{c}"))]).first()
    if row is None or row[0] is None:
        return df.select(id_col, *names).limit(0)
    lo = {c: row[f"mn_{c}"] for c in sc}
    width = {c: max(1, (row[f"mx_{c}"] - lo[c]) // bins + 1) for c in sc}

    cell = None
    for c in sc:
        coord = F.expr(f"({c} - {lo[c]}) div {width[c]}")
        cell = coord if cell is None else cell * bins + coord
    # cheap projection over the checkpointed frame; the three consumers
    # below re-run only this projection, not the upstream derivation
    pts = pts.withColumn("_cell", cell.cast("long"))

    stats = (pts.groupBy("_cell")
             .agg(*[m for c in sc
                    for m in (F.min(c).alias(f"mn_{c}"),
                              F.max(c).alias(f"mx_{c}"))])
             .collect())  # ≤ bins^d rows — metadata scale by construction

    def _cell_dominates(a, b) -> bool:
        # any point of a beats every point of b, strictly, in all dims
        return all(a[f"mn_{c}"] > b[f"mx_{c}"] for c in sc)

    surviving = [s for s in stats
                 if not any(_cell_dominates(o, s) for o in stats)]
    pairs = [(s["_cell"], o["_cell"])
             for s in surviving for o in surviving
             if all(o[f"mx_{c}"] >= s[f"mn_{c}"] for c in sc)]

    spark = df.sparkSession
    pairs_df = spark.createDataFrame(pairs, "cell long, cand long")
    surv = pts.join(
        F.broadcast(pairs_df.select(F.col("cell").alias("_cell"))
                    .distinct()),
        "_cell", "left_semi")
    probe = surv.join(
        F.broadcast(pairs_df.withColumnRenamed("cell", "_cell")), "_cell")
    qside = surv.select(
        F.col("_cell").alias("_qcell"),
        *[F.col(c).alias(f"_q{c}") for c in sc])
    ge = [F.col(f"_q{c}") >= F.col(c) for c in sc]
    gt = [F.col(f"_q{c}") > F.col(c) for c in sc]
    cond = (F.col("cand") == F.col("_qcell"))
    for g in ge:
        cond = cond & g
    strict = gt[0]
    for g in gt[1:]:
        strict = strict | g
    dominated = (probe.join(qside, cond & strict, "left_semi")
                 .select(id_col).distinct())
    return (surv.join(dominated, id_col, "left_anti")
            .select(id_col, *names))


def pareto_skyline_sql(source_sql: str, dims: dict[str, Direction],
                       id_col: str) -> str:
    """DuckDB twin: the definitional ``NOT EXISTS`` dominance test over
    the same source relation — naive (quadratic) on purpose, so the
    distributed grid-prune path is verified against first principles."""
    names = list(dims)
    ge = " AND ".join(
        f"q.{c} {'>=' if dims[c] == 'max' else '<='} p.{c}" for c in names)
    gt = " OR ".join(
        f"q.{c} {'>' if dims[c] == 'max' else '<'} p.{c}" for c in names)
    cols = ", ".join([f"p.{id_col}"] + [f"p.{c}" for c in names])
    return (f"SELECT {cols} FROM ({source_sql}) p "
            f"WHERE NOT EXISTS (SELECT 1 FROM ({source_sql}) q "
            f"WHERE {ge} AND ({gt}))")
