"""Submodular (greedy max-cover) diversity selection.

Picking a small, maximally-diverse subset of a corpus — seed sets for
active learning, eval-slice curation, dedup-aware "show me what's in
here" sampling — is coverage maximization: choose k documents whose
shingle sets jointly cover as much of the corpus vocabulary as
possible. Coverage is submodular, so the greedy sweep (pick the doc
with the largest marginal gain, k times) carries the classic
(1 − 1/e) optimality guarantee (Nemhauser/Wolsey/Fisher 1978) — the
standard algorithm for data-subset selection.

Scale shape: the shingle table is derived ONCE (sorted 64-bit
xxhash64-long arrays — the PPJoin token-set representation,
``dedup.hashed_shingles``) and lineage-truncated; each of the k rounds
is one distributed
TakeOrdered(1) over ``size(array_except(hs, covered))`` — a JVM array
expression against a broadcast literal of the shingles covered so far
(bounded by the k selected docs' sets, driver metadata). k rounds ⇒
k corpus passes and k one-row collects; no pair joins, no shuffles
beyond the scan. Ties break on ascending id; selection stops early
only when the corpus is exhausted (zero-gain picks still select, so
exactly ``min(k, |docs|)`` rows come back — the deterministic contract
the SQL twin encodes level by level).

Exactness: gains are integer set CARDINALITIES. The Spark side hashes
shingles with ``xxhash64`` (r11, codegen) while the DuckDB twin keeps
``md5_long_sql`` — the universes differ, so pick-sequence parity is
COLLISION-CONDITIONAL (both hash families must be injective on the
shingle vocabulary), not bit-identical by construction; set sizes, and
therefore gains and picks, agree whenever neither family collides.
LLM-pipeline extension (no reference counterpart); family:
sampling/selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rgd_rnaseq_workflows_spark.functions.hashing import md5_long_sql
from rgd_rnaseq_workflows_spark.functions.text import shingles_sql
from rgd_rnaseq_workflows_spark.operators.dedup import hashed_shingles
from rgd_rnaseq_workflows_spark.session import checkpoint_df


def greedy_max_cover(docs: DataFrame, k: int, shingle_n: int = 2,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Greedy coverage selection: ``min(k, |docs|)`` rows of
    ``(rank, id, gain, covered_total)`` where ``gain`` is the number
    of corpus shingles the pick newly covers and ``covered_total``
    the running union size.

    Incremental-remainder form (r11): instead of re-scanning the full
    shingle table against a GROWING ``covered`` literal (round r cost
    n·|covered| per row, plus a plan literal of |covered| longs that is
    re-analyzed/re-codegen'd and shipped in every task binary), each
    round maintains ``hs := hs \\ pick_hs`` behind a lazy checkpoint —
    so ``gain`` is just ``size(hs)`` and the only literal is the last
    pick's remaining shingles (≤ one doc's worth). Pick sequence is
    unchanged: ``hs`` after r rounds equals the original
    ``array_except(hs, covered_r)`` exactly, ``covered_total`` is the
    running gain sum (each gain counts exactly the newly covered
    shingles), and ties stay (gain DESC, id ASC). Superseded round
    tables are dropped by the driver's ContextCleaner once their frames
    go out of scope — at any moment one remainder table is live plus
    the one being built."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = docs.sparkSession
    rem = checkpoint_df(
        docs.select(F.col(id_col).alias("id"),
                    hashed_shingles(text_col, shingle_n).alias("hs")),
        eager=False)

    out: list[tuple] = []
    covered_total = 0
    for rank in range(1, k + 1):
        pick = (rem.select("id", F.size("hs").alias("gain"), "hs")
                .orderBy(F.desc("gain"), F.asc("id")).limit(1).collect())
        if not pick:
            break
        row = pick[0]
        covered_total += row["gain"]
        out.append((rank, row["id"], row["gain"], covered_total))
        if rank == k:
            break  # no next round to prepare
        pick_lit = F.lit(list(row["hs"])).cast("array<bigint>")
        rem = checkpoint_df(
            rem.filter(F.col("id") != row["id"])
            .select("id", F.array_except("hs", pick_lit).alias("hs")),
            eager=False)
    return spark.createDataFrame(
        out, f"rank long, {id_col} long, gain long, covered_total long")


def greedy_max_cover_sql(table: str, k: int, shingle_n: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin: the k greedy levels unrolled as chained CTEs —
    each level anti-joins the exploded shingle table against the
    union of previously-picked docs' shingles, re-ranks marginal
    gains (gain DESC, id ASC), and takes one row. Quadratic-ish and
    oracle-only; the distributed path above must reproduce its pick
    sequence exactly."""
    sh = shingles_sql(text_col, shingle_n)
    h = md5_long_sql("s")
    parts = [
        # MATERIALIZED: DuckDB re-executes plain CTEs per reference —
        # k levels × (hs, ex) references would rescan the parquet k×
        # times (and blow the fd limit on a threaded scan)
        f"WITH hs AS MATERIALIZED (SELECT {id_col} AS id, "
        f"list_transform({sh}, s -> {h}) AS hs FROM {table}),",
        "ex AS MATERIALIZED (SELECT id, unnest(hs) AS tok FROM hs),",
        # level 1: gain = full distinct shingle count (LEFT JOIN keeps
        # empty-shingle docs at gain 0, the distributed side's shape)
        "g1 AS (SELECT h.id, CAST(coalesce(n.gain, 0) AS BIGINT) "
        "AS gain FROM hs h LEFT JOIN (SELECT id, count(*) AS gain "
        "FROM ex GROUP BY id) n ON h.id = n.id),",
        "s1 AS MATERIALIZED (SELECT id, gain FROM g1 "
        "ORDER BY gain DESC, id LIMIT 1),",
        "c1 AS MATERIALIZED (SELECT DISTINCT e.tok FROM ex e "
        "JOIN s1 ON e.id = s1.id),",
    ]
    for i in range(2, k + 1):
        p, sel_union = i - 1, " UNION ALL ".join(
            f"SELECT id FROM s{j}" for j in range(1, i))
        parts += [
            f"g{i} AS (SELECT h.id, CAST(coalesce(n.gain, 0) AS BIGINT)"
            f" AS gain FROM hs h LEFT JOIN ("
            f"SELECT e.id, count(*) AS gain FROM ex e "
            f"ANTI JOIN c{p} c ON e.tok = c.tok GROUP BY e.id) n "
            f"ON h.id = n.id WHERE h.id NOT IN ({sel_union})),",
            f"s{i} AS MATERIALIZED (SELECT id, gain FROM g{i} "
            f"ORDER BY gain DESC, id LIMIT 1),",
            f"c{i} AS MATERIALIZED (SELECT tok FROM c{p} UNION "
            f"SELECT e.tok FROM ex e JOIN s{i} ON e.id = s{i}.id),",
        ]
    levels = " UNION ALL ".join(
        f"SELECT {j} AS rank, id, gain FROM s{j}" for j in range(1, k + 1))
    parts.append(
        f"picks AS ({levels}) "
        f"SELECT CAST(rank AS BIGINT) AS rank, id AS {id_col}, gain, "
        f"CAST(sum(gain) OVER (ORDER BY rank) AS BIGINT) "
        f"AS covered_total FROM picks")
    return "\n".join(parts)


def _dist2(vec_col, center: list[int]):
    """Exact integer squared L2 between a fix-point long-array column
    and a literal center (JVM array expressions; d·1 ops per row)."""
    c = F.lit(center).cast("array<bigint>")
    return F.aggregate(
        F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def k_center_coreset(vecs: DataFrame, k: int, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     scale: int = 10_000) -> DataFrame:
    """Gonzalez farthest-first traversal: a k-point coreset whose
    max-min radius is within 2× of the optimal k-center cover — the
    standard geometric "spread" selection (active-learning seeds,
    IVF/PQ training samples, outlier-inclusive eval panels), the
    complement of :func:`greedy_max_cover`'s lexical spread.

    Seed = lowest id (deterministic); each later round picks the point
    FARTHEST from its nearest selected center, ties on ascending id.
    Returns ``min(k, n)`` rows ``(rank, id, dist_sq)`` — ``dist_sq``
    the pick's exact fix-point squared distance to the nearest earlier
    center (NULL for the seed); the sequence doubles as the coverage-
    radius decay curve.

    Scale shape: vectors fix-point once (round(x·scale), exact long
    arrays, lineage-truncated), then the classic incremental trick —
    one ``least(mind, dist²-to-newest-center)`` column update + one
    distributed TakeOrdered(1) per round, so each round costs d ops
    per row against ONE broadcast center literal (never k·d), k rounds
    total, k one-row collects, zero joins. int64 headroom:
    d·(2·scale·‖x‖_∞)² per distance — ~2.6e10 for unit-norm d=64.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = vecs.sparkSession
    xi = checkpoint_df(
        vecs.select(
            F.col(id_col).alias("id"),
            F.transform(vec_col,
                        lambda x: F.round(x.cast("double") * scale)
                        .cast("long")).alias("v")),
        eager=False)
    seed_rows = xi.orderBy("id").limit(1).collect()
    if not seed_rows:
        return spark.createDataFrame(
            [], f"rank long, {id_col} long, dist_sq long")
    seed = seed_rows[0]
    out: list[tuple] = [(1, seed["id"], None)]
    cur = xi.filter(F.col("id") != seed["id"]).withColumn(
        "mind", _dist2(F.col("v"), list(seed["v"])))
    for rank in range(2, k + 1):
        pick_rows = (cur.orderBy(F.desc("mind"), F.asc("id"))
                     .limit(1).collect())
        if not pick_rows:
            break
        p = pick_rows[0]
        out.append((rank, p["id"], p["mind"]))
        cur = checkpoint_df(
            cur.filter(F.col("id") != p["id"]).withColumn(
                "mind", F.least("mind", _dist2(F.col("v"),
                                               list(p["v"])))),
            eager=False)
    return spark.createDataFrame(
        out, f"rank long, {id_col} long, dist_sq long")


def k_center_coreset_sql(table: str, k: int, vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         scale: int = 10_000) -> str:
    """DuckDB twin of :func:`k_center_coreset` — the k rounds unrolled
    as materialized chained CTEs over the same fix-point integers."""
    def d2(a: str, b: str) -> str:
        return (f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
                f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) "
                f"AS BIGINT)")

    parts = [
        f"WITH xi AS MATERIALIZED (SELECT {id_col} AS id, "
        f"list_transform(range(1, len({vec_col}) + 1), "
        f"i -> CAST(round(CAST({vec_col}[i] AS DOUBLE) * {scale}) "
        f"AS BIGINT)) AS v FROM {table}),",
        "s1 AS MATERIALIZED (SELECT id, v FROM xi ORDER BY id LIMIT 1),",
        f"m1 AS MATERIALIZED (SELECT x.id, x.v, {d2('x.v', 's.v')} "
        "AS mind FROM xi x, s1 s WHERE x.id <> s.id),",
    ]
    for i in range(2, k + 1):
        p = i - 1
        parts += [
            f"s{i} AS MATERIALIZED (SELECT id, v, mind FROM m{p} "
            f"ORDER BY mind DESC, id LIMIT 1),",
            f"m{i} AS MATERIALIZED (SELECT m.id, m.v, "
            f"least(m.mind, {d2('m.v', 's.v')}) AS mind "
            f"FROM m{p} m, s{i} s WHERE m.id <> s.id),",
        ]
    levels = " UNION ALL ".join(
        [f"SELECT 1 AS rank, id, CAST(NULL AS BIGINT) AS dist_sq FROM s1"]
        + [f"SELECT {j}, id, mind FROM s{j}" for j in range(2, k + 1)])
    parts.append(
        f"picks AS ({levels}) "
        f"SELECT CAST(rank AS BIGINT) AS rank, id AS {id_col}, "
        f"CAST(dist_sq AS BIGINT) AS dist_sq FROM picks")
    return "\n".join(parts)
