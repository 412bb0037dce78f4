"""Submodular (greedy max-cover) diversity selection.

Picking a small, maximally-diverse subset of a corpus — seed sets for
active learning, eval-slice curation, dedup-aware "show me what's in
here" sampling — is coverage maximization: choose k documents whose
shingle sets jointly cover as much of the corpus vocabulary as
possible. Coverage is submodular, so the greedy sweep (pick the doc
with the largest marginal gain, k times) carries the classic
(1 − 1/e) optimality guarantee (Nemhauser/Wolsey/Fisher 1978) — the
standard algorithm for data-subset selection.

Scale shape: the shingle table is derived ONCE (sorted 60-bit md5-long
arrays — the PPJoin token-set representation, ``dedup.hashed_shingles``)
and lineage-truncated; each of the k rounds is one distributed
TakeOrdered(1) over ``size(array_except(hs, covered))`` — a JVM array
expression against a broadcast literal of the shingles covered so far
(bounded by the k selected docs' sets, driver metadata). k rounds ⇒
k corpus passes and k one-row collects; no pair joins, no shuffles
beyond the scan. Ties break on ascending id; selection stops early
only when the corpus is exhausted (zero-gain picks still select, so
exactly ``min(k, |docs|)`` rows come back — the deterministic contract
the SQL twin encodes level by level).

Exactness: gains are integer set sizes over the identical hash
universe on both engines (``md5_long`` / ``md5_long_sql``), so the
pick sequence is bit-reproducible. LLM-pipeline extension (no
reference counterpart); family: sampling/selection.
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
    the running union size."""
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = docs.sparkSession
    hs = checkpoint_df(
        docs.select(F.col(id_col).alias("id"),
                    hashed_shingles(text_col, shingle_n).alias("hs")),
        eager=False)  # k rounds re-read it

    covered: set[int] = set()
    selected: list = []
    out: list[tuple] = []
    for rank in range(1, k + 1):
        rem = hs.filter(~F.col("id").isin(selected)) if selected else hs
        cov_lit = F.lit(sorted(covered)).cast("array<bigint>")
        pick = (rem.select(
            "id", F.size(F.array_except("hs", cov_lit)).alias("gain"),
            "hs")
            .orderBy(F.desc("gain"), F.asc("id")).limit(1).collect())
        if not pick:
            break
        row = pick[0]
        covered.update(row["hs"])
        selected.append(row["id"])
        out.append((rank, row["id"], row["gain"], len(covered)))
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
