"""100x scale rows for the round-9 second-wave capabilities:
persisted BM25 probe, Kneser-Ney perplexity, canonical-URL dedup.

Reuses the salted documents replica (tools/xsub_scale.py recipe —
per-replica token salting keeps per-replica structure, linear dup
mass). Expectations:

- bm25_index_probe: the index is built once per scale; the probe scan
  is the query terms' posting lists only (directory + footer pruning).
  Stopword-free query terms are salted per replica, so each term's
  posting list does NOT grow with the lake; STOPWORD terms are kept
  verbatim by the salter and their lists grow 100x — we probe one of
  each and report both (the honest pair: rare-term probes stay flat,
  stopword probes pay their own posting mass and nothing else).
- quality_kn_perplexity: corpus-scale train + score (one explode, one
  LM groupBy, one score join) — expect sublinear alpha from fixed
  overheads, near-linear asymptote.
- dedup_url_canonical: projection + one groupBy — scan-bound.

Usage: python tools/r9b_scale.py [--rep 100] [--skip-build]
Prints alpha rows; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xsub_scale import build_docs_replica  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def kn_wall(spark, path: str) -> float:
    from rgd_rnaseq_workflows_spark.operators.quality import kn_lm_report
    docs = spark.read.parquet(path).select("doc_id", "text")
    return _noop(kn_lm_report(docs))


def url_wall(spark, path: str) -> float:
    from rgd_rnaseq_workflows_spark.operators.urls import url_dedup_report
    from rgd_rnaseq_workflows_spark.registry import _url_spike_col
    docs = (spark.read.parquet(path)
            .select("doc_id", _url_spike_col().alias("url")))
    return _noop(url_dedup_report(docs))


def bm25_probe_wall(spark, idx: str, query: str) -> float:
    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        bm25_index_topk)
    return _noop(bm25_index_topk(spark, idx, query, k=10))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=100)
    ap.add_argument("--out", default="/tmp/xsub_scale")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    base = os.path.join(args.out, "docs_1x.parquet")
    big = os.path.join(args.out, f"docs_{args.rep}x.parquet")
    if not args.skip_build and not (os.path.exists(base)
                                    and os.path.exists(big)):
        os.makedirs(args.out, exist_ok=True)
        build_docs_replica(args.sf_dir, base, 1)
        build_docs_replica(args.sf_dir, big, args.rep)

    from rgd_rnaseq_workflows_spark.operators.inverted_index import (
        write_inverted_index)
    from rgd_rnaseq_workflows_spark.session import get_spark
    spark = get_spark("r9b_scale")
    spark.sparkContext.setLogLevel("ERROR")

    rows: list[tuple[str, float, float]] = []

    # --- persisted BM25 probe -------------------------------------------------
    probes: dict[str, dict[str, float]] = {"rare": {}, "stopword": {}}
    for tag, src in (("1x", base), (f"{args.rep}x", big)):
        docs = spark.read.parquet(src).select("doc_id", "text")
        idx = os.path.join(args.out, f"inv_{tag}")
        t0 = time.time()
        write_inverted_index(docs, idx)
        print(f"[build] inverted {tag}: {time.time() - t0:.1f}s",
              file=sys.stderr)
        # rare: salted content words from one base doc (replica-local
        # posting lists); stopword: verbatim across every replica
        text = docs.filter("doc_id = 7").head()["text"].split()
        rare_q = " ".join(w for w in text if len(w) > 3)[:80]
        bm25_probe_wall(spark, idx, rare_q)                  # warm
        probes["rare"][tag] = bm25_probe_wall(spark, idx, rare_q)
        probes["stopword"][tag] = bm25_probe_wall(spark, idx,
                                                  "the a of and")
    for kind in ("rare", "stopword"):
        rows.append((f"bm25_index_probe ({kind} terms)",
                     probes[kind]["1x"], probes[kind][f"{args.rep}x"]))

    # --- KN perplexity + URL dedup --------------------------------------------
    kn_wall(spark, base)                                     # warm
    rows.append(("quality_kn_perplexity", kn_wall(spark, base),
                 kn_wall(spark, big)))
    url_wall(spark, base)                                    # warm
    rows.append(("dedup_url_canonical", url_wall(spark, base),
                 url_wall(spark, big)))

    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha |")
    print("|---|---|---|---|")
    for name, t1, tn in rows:
        alpha = math.log(tn / t1) / math.log(args.rep)
        print(f"| {name} | {t1} | {tn} | {alpha:.2f} |")


if __name__ == "__main__":
    main()
