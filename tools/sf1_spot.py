"""sf1 spot-bench — scale evidence at a real SF (r11-verdict task 2).

At sf0.1 every query wall is 2-6 s and overhead-dominated (job launch,
codegen, checkpoint materialization), so the driver's 8-vs-32-core
scaling block shows ratios ~1 and cannot demonstrate scale-safety.
This tool builds the deterministic 10x replica of sf0.1 (~sf1, the
``scale_sweep`` builder: shape-preserving, no artificial hot keys,
planted duplicate structure grows linearly) and times the N most
expensive queries at 32 and 8 cores with the quiet_ab methodology
(noop sink, sentinel-qualified, median of --passes).

Usage:
  python tools/sf1_spot.py [--out /tmp/scale10] [--top 15] [--passes 2]
      [--skip-build] [--queries q1 q2 ...]

Prints one JSON line:
  {"sf": "1 (10x sf0.1 replica)", "cpus_main": 32, "cpus_low": 8,
   "queries": {name: {"t32": s, "t8": s, "ratio": t8/t32}},
   "sentinel32": ..., "sentinel8": ...}

ratio ≈ 1 at this SF means the query is still overhead/serial-bound;
shuffle/compute-bound queries should show ratio ≥ 2 on 4x the cores.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def _top_queries(n: int) -> list[str]:
    """The n slowest production queries from the latest local bench."""
    for rec in ("BENCH_local_r12_before.json", "BENCH_local_last.json"):
        path = os.path.join(REPO, rec)
        if os.path.exists(path):
            with open(path) as fh:
                q = json.load(fh)["queries"]
            return sorted((x for x in q if q[x] > 0),
                          key=lambda x: -q[x])[:n]
    raise SystemExit("no local bench record found; run bench.py first")


def _quiet_ab(sf_dir: str, cpus: int, passes: int,
              queries: list[str]) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "quiet_ab.py"),
         "--passes", str(passes), "--sf", sf_dir, *queries],
        env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    if not args.skip_build:
        from scale_sweep import build_replica
        build_replica(args.sf_dir, args.out, args.rep)

    queries = args.queries or _top_queries(args.top)
    print(f"[sf1_spot] {len(queries)} queries at 32 cores ...",
          file=sys.stderr)
    r32 = _quiet_ab(args.out, 32, args.passes, queries)
    print("[sf1_spot] ... and at 8 cores", file=sys.stderr)
    r8 = _quiet_ab(args.out, 8, args.passes, queries)

    per = {}
    for q in queries:
        t32, t8 = r32["queries"].get(q), r8["queries"].get(q)
        per[q] = {"t32": t32, "t8": t8,
                  "ratio": round(t8 / t32, 2) if t32 and t8 else None}
    print(json.dumps({
        "sf": f"{args.rep}x of {args.sf_dir}",
        "cpus_main": 32, "cpus_low": 8, "passes": args.passes,
        "sentinel32": r32["sentinel_median"],
        "sentinel8": r8["sentinel_median"],
        "queries": per,
    }))


if __name__ == "__main__":
    main()
