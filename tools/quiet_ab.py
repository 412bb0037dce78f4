"""Focused per-query timing: bench.py's methodology (noop sink, median
of N passes) restricted to a named query list, with the ambient-noise
sentinel re-timed immediately BEFORE every timed run so each number is
level-qualified.

Usage: python tools/quiet_ab.py [--passes N] [--sf DIR] query [query ...]

Prints one JSON line {"sentinel_median":..., "queries": {name: median},
"runs": {...}, "sentinel_runs": [...]}  — same fields as bench.py where
they overlap, so bench_regress.py can diff the output directly.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rgd_rnaseq_workflows_spark.registry import REGISTRY  # noqa: E402
from rgd_rnaseq_workflows_spark.session import get_spark  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    unknown = [q for q in args.queries if q not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("quiet-ab")
    # same warmups as bench.py: codegen path + Python-worker path
    _noop(REGISTRY["q1_pricing_summary"].fn(spark, args.sf))
    from pyspark.sql.functions import pandas_udf as _pudf
    _warm = _pudf(lambda s: s, "long")
    _noop(spark.range(32).select(_warm("id").alias("x")))

    sentinel = REGISTRY["q1_pricing_summary"]
    sent_runs: list[float] = []
    runs: dict[str, list[float]] = {q: [] for q in args.queries}
    for _ in range(args.passes):
        for name in args.queries:
            gc.collect()
            t0 = time.perf_counter()
            _noop(sentinel.fn(spark, args.sf))
            sent_runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(f"quiet_ab: {name}")
            t0 = time.perf_counter()
            _noop(REGISTRY[name].fn(spark, args.sf))
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sentinel_median": round(statistics.median(sent_runs), 3),
        "sentinel_runs": sent_runs,
        "queries": {q: round(statistics.median(r), 3)
                    for q, r in runs.items()},
        "runs": runs,
        "sf": args.sf.rstrip("/").rsplit("sf", 1)[-1],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
