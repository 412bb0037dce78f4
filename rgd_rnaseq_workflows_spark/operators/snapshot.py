"""Corpus snapshot diffing — the dataset-versioning audit between two
releases of a training corpus (what changed between crawl v1 and v2,
which shards need re-tokenizing, did a "small metadata fix" silently
rewrite half the text).

Design: compare content FINGERPRINTS (md5 of the text), never the text
itself — the join moves 16 bytes per doc, not documents. The diff is a
single full-outer shuffle join on the document key; on a 100 TB lake
both snapshots would be bucketed by the key and the join runs
zero-exchange (tests/test_bucketing.py demonstrates the co-located
form). Fingerprints are md5, so any engine (and the DuckDB oracle)
reproduces them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document change labels between two corpus snapshots:
    ``added`` (only in new), ``removed`` (only in old), ``modified``
    (same id, different content hash), ``unchanged``. Returns
    (id, change) — aggregate downstream as needed."""
    fa = old.select(F.col(id_col).alias("id"),
                    F.md5(F.col(text_col)).alias("_fa"))
    fb = new.select(F.col(id_col).alias("id"),
                    F.md5(F.col(text_col)).alias("_fb"))
    j = fa.join(fb, "id", "full_outer")
    change = (F.when(F.col("_fa").isNull(), F.lit("added"))
              .when(F.col("_fb").isNull(), F.lit("removed"))
              .when(F.col("_fa") != F.col("_fb"), F.lit("modified"))
              .otherwise(F.lit("unchanged")))
    return j.select("id", change.alias("change"))


def snapshot_diff_report(old: DataFrame, new: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Aggregate diff: (change, n_docs)."""
    return (snapshot_diff(old, new, id_col, text_col)
            .groupBy("change").agg(F.count("*").alias("n_docs")))


def snapshot_diff_report_sql(old_src: str, new_src: str,
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """DuckDB twin (md5 is the portable fingerprint family)."""
    return f"""
WITH fa AS (SELECT {id_col} AS id, md5({text_col}) AS fa FROM {old_src}),
fb AS (SELECT {id_col} AS id, md5({text_col}) AS fb FROM {new_src}),
j AS (
  SELECT CASE WHEN fa.fa IS NULL THEN 'added'
              WHEN fb.fb IS NULL THEN 'removed'
              WHEN fa.fa <> fb.fb THEN 'modified'
              ELSE 'unchanged' END AS change
  FROM fa FULL OUTER JOIN fb ON fa.id = fb.id)
SELECT change, count(*) AS n_docs FROM j GROUP BY change
"""


def snapshot_apply(base: DataFrame, changes: DataFrame,
                   id_col: str = "doc_id",
                   op_col: str = "op") -> DataFrame:
    """MERGE INTO semantics without a table format: apply a changeset
    (``op`` ∈ upsert|delete, plus the full row payload for upserts) to a
    base snapshot and return the next snapshot.

    Pure DataFrame shape: one full-outer join on the key —
    change-side wins on conflict (upsert), delete drops, absent keys
    pass through. On a bucketed lake both sides co-locate and the merge
    runs zero-exchange; the row payload moves only for changed keys if
    the caller projects base down to (key, payload) columns it needs.

    ``changes`` must carry ``id_col``, ``op_col``, and the same payload
    columns as ``base`` (values ignored for deletes).
    """
    payload = [c for c in base.columns if c != id_col]
    missing = [c for c in payload + [id_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"changeset missing columns: {missing}")
    # NULL ops must fail too: `~isin` is NULL (not true) for NULL, and
    # a NULL-op row would otherwise slip past and emit an all-NULL
    # payload via the keep predicate below.
    bad = changes.filter(F.col(op_col).isNull()
                         | ~F.col(op_col).isin("upsert", "delete")).limit(1)
    if bad.count():
        raise ValueError(f"unknown {op_col} value in changeset")
    b = base.select(F.col(id_col).alias("_id"),
                    *[F.col(c).alias(f"_b_{c}") for c in payload])
    c = changes.select(F.col(id_col).alias("_id"),
                       F.col(op_col).alias("_op"),
                       *[F.col(x).alias(f"_c_{x}") for x in payload])
    j = b.join(c, "_id", "full_outer")
    keep = F.col("_op").isNull() | (F.col("_op") == "upsert")
    picked = [F.when(F.col("_op") == "upsert", F.col(f"_c_{x}"))
              .otherwise(F.col(f"_b_{x}")).alias(x) for x in payload]
    return (j.filter(keep)
            .select(F.col("_id").alias(id_col), *picked))


def snapshot_apply_sql(base_src: str, changes_src: str,
                       payload: tuple[str, ...],
                       id_col: str = "doc_id", op_col: str = "op") -> str:
    """DuckDB twin of :func:`snapshot_apply`."""
    pick = ", ".join(
        f"CASE WHEN c.{op_col} = 'upsert' THEN c.{x} ELSE b.{x} END AS {x}"
        for x in payload)
    return f"""
SELECT coalesce(b.{id_col}, c.{id_col}) AS {id_col}, {pick}
FROM {base_src} b FULL OUTER JOIN {changes_src} c
  ON b.{id_col} = c.{id_col}
WHERE c.{op_col} IS NULL OR c.{op_col} = 'upsert'"""
