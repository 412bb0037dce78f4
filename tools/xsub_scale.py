"""100x scale row for exact duplicated-substring dedup (round 9).

Documents-only salted replica (the scale_sweep.py recipe: per-replica
deterministic token salting, stopwords verbatim, doc_id offset): every
replica reproduces the base corpus's exact-window repeat structure
under its own salted vocabulary, so duplicate mass grows LINEARLY with
the corpus — no cross-replica windows, no quadratic blowup, which is
what a real 100 TB crawl looks like (dup rate roughly stable as the
corpus grows).

Usage: python tools/xsub_scale.py [--rep 100] [--window 8]
Prints one alpha row; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 100_000_000


def build_docs_replica(src: str, dst: str, rep: int) -> None:
    import duckdb

    from rgd_rnaseq_workflows_spark.functions.text import STOPWORDS
    words = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_arr = "[" + ", ".join("'" + w.replace("'", "''") + "'"
                               for w in words) + "]"
    con = duckdb.connect()
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    con.execute(f"""
COPY (
  SELECT doc_id + r.i * {KEY_OFFSET} AS doc_id, lang, source,
         CASE WHEN r.i = 0 THEN text ELSE array_to_string(
           list_transform(string_split(text, ' '), w ->
             CASE WHEN list_contains({stop_arr}, w) THEN w
                  ELSE substr(md5(w || ':' || r.i), 1,
                              greatest(length(w), 1)) END), ' ')
         END AS text
  FROM '{src}/documents.parquet', range({rep}) r(i)
) TO '{dst}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
    print(f"[replica] documents x{rep}: {n} rows", file=sys.stderr)


def wall(spark, path: str, window: int) -> float:
    from pyspark.sql import functions as F

    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        exact_substring_accounting)
    docs = spark.read.parquet(path).select("doc_id", "text")
    t0 = time.time()
    (exact_substring_accounting(docs, window)
     .write.format("noop").mode("overwrite").save())
    return round(time.time() - t0, 2)


def calib_wall(spark, path: str) -> float:
    from rgd_rnaseq_workflows_spark.operators.exact_substrings import (
        exact_substring_calibration)
    docs = spark.read.parquet(path).select("doc_id", "text")
    t0 = time.time()
    (exact_substring_calibration(docs, (4, 8, 16))
     .write.format("noop").mode("overwrite").save())
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=100)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--out", default="/tmp/xsub_scale")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--calibration", action="store_true",
                    help="also sweep the one-ladder calibration report")
    args = ap.parse_args()

    base = os.path.join(args.out, "docs_1x.parquet")
    big = os.path.join(args.out, f"docs_{args.rep}x.parquet")
    if not args.skip_build:
        os.makedirs(args.out, exist_ok=True)
        build_docs_replica(args.sf_dir, base, 1)
        build_docs_replica(args.sf_dir, big, args.rep)

    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("xsub_scale")
    spark.sparkContext.setLogLevel("ERROR")
    wall(spark, base, args.window)            # warm JVM/codegen
    t1 = wall(spark, base, args.window)
    tn = wall(spark, big, args.window)
    alpha = math.log(tn / t1) / math.log(args.rep)
    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha |")
    print("|---|---|---|---|")
    print(f"| dedup_exact_substrings (L={args.window}) "
          f"| {t1} | {tn} | {alpha:.2f} |")
    if args.calibration:
        calib_wall(spark, base)
        c1 = calib_wall(spark, base)
        cn = calib_wall(spark, big)
        ca = math.log(cn / c1) / math.log(args.rep)
        print(f"| dedup_exact_substr_calibration (one-ladder) "
              f"| {c1} | {cn} | {ca:.2f} |")


if __name__ == "__main__":
    main()
