"""URL canonicalization + canonical-URL dedup — crawl hygiene.

The FIRST dedup pass every crawl pipeline runs (before any content
hashing): the same page is fetched as ``http://Example.COM:80/p/1``,
``https://example.com/p/1?utm_source=x``, ``…/p/1/`` and
``…/p/1#section`` — string-distinct URLs, one resource. Canonicalizing
and grouping removes refetch duplicates for the cost of one projection
plus one groupBy, orders of magnitude cheaper than MinHash on the
bodies (which still runs afterwards, for cross-URL duplicates).

Canonical form (the conservative subset of RFC 3986 §6 normalization
plus the universal crawl conventions — semantics-preserving for the
overwhelming majority of sites):

1. drop the fragment (``#…`` is client-side only);
2. lowercase the scheme and host; strip a leading ``www.``;
3. drop the default port (``:80`` for http, ``:443`` for https);
   non-default ports are kept;
4. strip trailing slashes from the path; an empty path becomes ``/``;
5. drop tracking parameters (``utm_*``), sort the remaining query
   parameters bytewise, and rejoin — parameter ORDER is almost never
   semantic, tracking params never are.

Scheme is NOT collapsed (http and https can serve different content)
and other query params are kept verbatim — canonicalization must never
merge two genuinely different resources.

Everything is built from string/array built-ins (split_part, trim,
array_sort, higher-order filter — whole-stage codegen end to end; zero
Python in the path), with a DuckDB CTE twin computing the identical
steps so the registry value-oracle pins every rule including the edge
cases (no query, no path, multiple trailing slashes, bare host).

Scale shape: canonicalization is a stateless projection (no shuffle);
the dedup report is ONE map-side-combined groupBy on the canonical
string. At 100 TB the groupBy key is the canonical URL — high
cardinality, near-uniform (hash partitioning; no skew salting needed
because no single URL repeats at corpus scale).

Reference scope note: the reference pipeline has no crawl surface;
LLM-pipeline extension family (dedup modality: refetch-duplicate
removal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canonical_url") -> DataFrame:
    """Add ``out_col`` = the canonical form of ``url_col``. Pure
    projection — intermediate columns are dropped before returning.

    Contract: inputs are absolute http(s) URLs (the crawl-frontier
    shape). A string without ``://`` still canonicalizes
    deterministically (the whole string is read as a scheme) and the
    DuckDB twin agrees, but the result is not meaningful — filter
    non-absolute rows upstream if the source is dirty."""
    # split_part is only safe for the FIRST piece; every "rest of the
    # string" extraction is position-based (substring past the first
    # delimiter) so a second '://' or '?' deeper in the URL — redirect
    # targets like /r?to=https://x.com — is preserved verbatim rather
    # than truncated (which would merge genuinely different resources)
    d = (df.withColumn("_nofrag", F.split_part(F.col(url_col),
                                               F.lit("#"), F.lit(1))))
    d = (d.withColumn("_scheme0", F.split_part(F.col("_nofrag"),
                                               F.lit("://"), F.lit(1)))
         .withColumn("_rest", F.expr(
             "substring(_nofrag, length(_scheme0) + 4)"))
         .withColumn("_scheme", F.lower(F.col("_scheme0"))))
    # the authority ends at the first '/' OR '?' — a bare host?query
    # (https://example.com?q=Paris) has an empty path and a real query,
    # so the query must NOT fold into the lowercased host. Offsets are
    # taken on the PRE-lowercase string (Unicode lowercasing can change
    # length, e.g. U+0130) and lowercasing is applied afterwards.
    # least() skips NULLs identically in Spark and DuckDB.
    d = (d.withColumn("_hpend", F.expr(
             "least(nullif(instr(_rest, '/'), 0), "
             "nullif(instr(_rest, '?'), 0))"))
         .withColumn("_hp", F.lower(F.expr(
             "case when _hpend is null then _rest "
             "else substring(_rest, 1, _hpend - 1) end")))
         .withColumn("_pathq", F.expr(
             "case when _hpend is null then '' "
             "else substring(_rest, _hpend) end")))
    d = (d.withColumn("_host0", F.split_part(F.col("_hp"), F.lit(":"),
                                             F.lit(1)))
         .withColumn("_host", F.regexp_replace(F.col("_host0"),
                                               "^www\\.", ""))
         .withColumn("_port", F.expr(
             "substring(_hp, length(_host0) + 2)")))
    default_port = (
        (F.col("_port") == "")
        | ((F.col("_scheme") == "http") & (F.col("_port") == "80"))
        | ((F.col("_scheme") == "https") & (F.col("_port") == "443")))
    d = d.withColumn("_hostout", F.when(
        default_port, F.col("_host")).otherwise(
        F.concat(F.col("_host"), F.lit(":"), F.col("_port"))))
    d = (d.withColumn("_path", F.split_part(F.col("_pathq"), F.lit("?"),
                                            F.lit(1)))
         .withColumn("_q", F.expr(
             "substring(_pathq, length(_path) + 2)")))
    d = d.withColumn("_pathc", F.expr(
        "case when trim(TRAILING '/' FROM _path) = '' then '/' "
        "else trim(TRAILING '/' FROM _path) end"))
    keep = F.filter(
        F.split(F.col("_q"), "&"),
        lambda x: (x != "") & ~x.startswith("utm_"))
    d = d.withColumn("_qc", F.array_join(F.array_sort(keep), "&"))
    canon: Column = F.concat(
        F.col("_scheme"), F.lit("://"), F.col("_hostout"),
        F.col("_pathc"),
        F.when(F.col("_qc") == "", F.lit(""))
        .otherwise(F.concat(F.lit("?"), F.col("_qc"))))
    return (d.withColumn(out_col, canon)
            .drop("_nofrag", "_scheme0", "_scheme", "_rest", "_hpend",
                  "_hp", "_host0", "_pathq", "_host", "_port",
                  "_hostout", "_path", "_q", "_pathc", "_qc"))


def canonical_url_sql(table: str, url_expr: str = "url",
                      id_cols: str = "doc_id") -> str:
    """DuckDB subquery computing the identical canonicalization —
    SELECT ``{id_cols}``, canonical_url FROM the given table/CTE.
    Every step mirrors :func:`with_canonical_url` operation for
    operation (split_part / trim / list_sort semantics agree on
    ASCII)."""
    return f"""
SELECT {id_cols}, scheme || '://' || hostout || pathc ||
       CASE WHEN qc = '' THEN '' ELSE '?' || qc END AS canonical_url
FROM (
  SELECT {id_cols}, scheme, hostout,
         CASE WHEN rtrim(path, '/') = '' THEN '/'
              ELSE rtrim(path, '/') END AS pathc,
         -- coalesce: DuckDB's array_to_string over an empty list is
         -- NULL where Spark's array_join is '' — align on ''
         coalesce(array_to_string(list_sort(list_filter(
           string_split(q, '&'),
           x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '')
           AS qc
  FROM (
    SELECT {id_cols}, scheme,
           CASE WHEN port = ''
                  OR (scheme = 'http' AND port = '80')
                  OR (scheme = 'https' AND port = '443')
                THEN host
                ELSE host || ':' || port END AS hostout,
           split_part(pathq, '?', 1) AS path,
           -- position-based: later '?'s remain part of the query
           substring(pathq, length(split_part(pathq, '?', 1)) + 2) AS q
    FROM (
      SELECT {id_cols}, scheme,
             regexp_replace(split_part(hp, ':', 1), '^www\\.', '')
               AS host,
             -- position-based: a second ':' stays in the port string
             substring(hp, length(split_part(hp, ':', 1)) + 2) AS port,
             pathq
      FROM (
        -- authority ends at the first '/' OR '?' (bare host?query has
        -- an empty path); offsets taken pre-lowercase, lowered after
        SELECT {id_cols},
               lower(scheme0) AS scheme,
               lower(CASE WHEN hpend IS NULL THEN rest
                          ELSE substring(rest, 1, hpend - 1) END) AS hp,
               CASE WHEN hpend IS NULL THEN ''
                    ELSE substring(rest, hpend) END AS pathq
        FROM (
        SELECT {id_cols}, scheme0, rest,
               least(nullif(instr(rest, '/'), 0),
                     nullif(instr(rest, '?'), 0)) AS hpend
        FROM (
          -- position-based rest: a second '://' (redirect target in a
          -- query param) is preserved, never truncated
          SELECT {id_cols}, scheme0,
                 substring(nofrag, length(scheme0) + 4) AS rest
          FROM (
            SELECT {id_cols},
                   split_part({url_expr}, '#', 1) AS nofrag,
                   split_part(split_part({url_expr}, '#', 1), '://', 1)
                     AS scheme0
            FROM {table})))))))
"""


def url_dedup_report(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """Group documents by canonical URL: per canonical —
    ``n_docs`` (refetch multiplicity), ``n_distinct_raw`` (how many
    string-distinct raw spellings collapsed), ``keeper_id`` (min id —
    the deterministic keep-first rule the exact-dedup family uses).
    One projection + one map-side-combined groupBy."""
    return (with_canonical_url(df, url_col)
            .groupBy("canonical_url")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct(url_col).alias("n_distinct_raw"),
                 F.min(id_col).alias("keeper_id")))
