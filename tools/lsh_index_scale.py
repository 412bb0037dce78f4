"""100x scale row for the persisted-LSH probe path (round 9).

Reuses the salted documents replica (tools/xsub_scale.py --out
/tmp/xsub_scale): the index is built once per scale; the measured row
is the single-document PROBE — an OR-of-(band, bucket) predicate over
the banded layout, so directory pruning keeps it to one directory per
band and the bucket-sorted files let parquet footers skip row groups.
Probe wall should stay ~flat as the lake grows 100x.

Usage: python tools/lsh_index_scale.py [--rep 100]
Prints one alpha row; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_wall(spark, idx: str, text: str) -> float:
    from rgd_rnaseq_workflows_spark.operators.lsh_index import (
        probe_lsh_index)
    t0 = time.time()
    (probe_lsh_index(spark, idx, text)
     .write.format("noop").mode("overwrite").save())
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/xsub_scale",
                    help="xsub_scale replica dir (docs_1x/docs_<rep>x)")
    ap.add_argument("--rep", type=int, default=100)
    args = ap.parse_args()

    base = os.path.join(args.out, "docs_1x.parquet")
    big = os.path.join(args.out, f"docs_{args.rep}x.parquet")
    if not (os.path.exists(base) and os.path.exists(big)):
        raise SystemExit("replica missing — run tools/xsub_scale.py "
                         "first (it builds docs_1x/docs_100x)")

    from rgd_rnaseq_workflows_spark.operators.lsh_index import (
        write_lsh_index)
    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("lsh_index_scale")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[str, float] = {}
    for tag, src in (("1x", base), (f"{args.rep}x", big)):
        docs = spark.read.parquet(src).select("doc_id", "text")
        idx = os.path.join(args.out, f"lsh_{tag}")
        t0 = time.time()
        write_lsh_index(docs, idx)
        print(f"[build] {tag}: {time.time() - t0:.1f}s", file=sys.stderr)
        qtext = docs.filter("doc_id = 7").head()["text"]
        probe_wall(spark, idx, qtext)           # warm
        walls[tag] = probe_wall(spark, idx, qtext)

    t1, tn = walls["1x"], walls[f"{args.rep}x"]
    alpha = math.log(tn / t1) / math.log(args.rep)
    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha |")
    print("|---|---|---|---|")
    print(f"| lsh_index_probe (persisted) | {t1} | {tn} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
