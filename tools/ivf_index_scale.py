"""100x scale row for the persisted-IVF probe path (VERDICT r8 task 3).

Reuses the margin-family replica (tools/margin_scale.py --out
/tmp/margin_scale: replica-scoped labels, rotated embeddings), so the
coarse cluster CARDINALITY tracks the corpus (kc ∝ N — the production
IVF sizing rule) while list size stays base-sized. The index is written
once per scale (labels are the coarse assignment); the measured row is
the PROBE: centroid rank (kc×dims metadata) + directory-pruned scan of
nprobe lists + exact cosine top-k — list size is constant, so the probe
should be ~flat (alpha << 1) even as the lake grows 100x.

Usage: python tools/ivf_index_scale.py [--rep 100] [--out /tmp/margin_scale]
Prints one alpha row; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_wall(spark, idx: str, qvec: list[float], k: int,
               nprobe: int) -> float:
    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        ivf_index_topk)
    t0 = time.time()
    (ivf_index_topk(spark, idx, qvec, k=k, nprobe=nprobe)
     .write.format("noop").mode("overwrite").save())
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/margin_scale",
                    help="margin_scale replica dir (emb_1x/emb_<rep>x)")
    ap.add_argument("--rep", type=int, default=100)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    base = os.path.join(args.out, "emb_1x.parquet")
    big = os.path.join(args.out, f"emb_{args.rep}x.parquet")
    if not (os.path.exists(base) and os.path.exists(big)):
        raise SystemExit("replica missing — run tools/margin_scale.py "
                         "first (it builds emb_1x/emb_100x)")

    from rgd_rnaseq_workflows_spark.operators.ivf_index import (
        write_ivf_index)
    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("ivf_index_scale")
    spark.sparkContext.setLogLevel("ERROR")

    walls: dict[str, float] = {}
    for tag, src in (("1x", base), (f"{args.rep}x", big)):
        emb = spark.read.parquet(src)
        idx = os.path.join(args.out, f"ivf_{tag}")
        t0 = time.time()
        write_ivf_index(emb, idx)
        print(f"[build] {tag}: {time.time() - t0:.1f}s", file=sys.stderr)
        qvec = [float(x) for x in
                emb.filter("vec_id = 0").head()["embedding"]]
        probe_wall(spark, idx, qvec, args.k, args.nprobe)  # warm
        walls[tag] = probe_wall(spark, idx, qvec, args.k, args.nprobe)

    t1, tn = walls["1x"], walls[f"{args.rep}x"]
    alpha = math.log(tn / t1) / math.log(args.rep)
    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha |")
    print("|---|---|---|---|")
    print(f"| ivf_index_probe (persisted, nprobe={args.nprobe}) "
          f"| {t1} | {tn} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
