"""10x scale sweep for the FULL query bench.

Builds a deterministic 10x replica of an sf directory (default sf0.1),
runs ``bench.py`` at 1x and 10x, and prints per-query scaling exponents
alpha = log(t10/t1) / log(10)  (1.0 = linear, <1 sublinear, >1 super).

Replication preserves workload SHAPE, not just row count:
- fixed dims (region, nation) stay fixed — TPC-H scaling semantics;
- every key family gets a per-replica offset, so joins stay consistent
  and key cardinality grows 10x (no artificial hot keys);
- document text in replicas >0 has every NON-STOPWORD token replaced by
  a same-length md5-derived token: language-ID, stopword/quality ratios
  and token-length stats are preserved, while shingle sets are disjoint
  across replicas — the planted duplicate structure is replicated
  per-replica (pairs grow ~10x linearly, never 45x quadratically);
- embeddings are dimension-rotated per replica (norms preserved,
  directions distinct — within-replica geometry identical to base).

Usage: python tools/scale_sweep.py [--sf-dir /root/testdata/sf0.1]
           [--rep 10] [--out /tmp/scale10]
Prints the table; paste into NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 100_000_000            # > any base-table key at sf<=1

# key columns to offset per replica, per table (join families stay
# consistent: lineitem.l_orderkey tracks orders.o_orderkey, etc.)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def _stopword_array() -> str:
    from rgd_rnaseq_workflows_spark.functions.text import STOPWORDS
    words = sorted({w for ws in STOPWORDS.values() for w in ws})
    return "[" + ", ".join("'" + w.replace("'", "''") + "'"
                           for w in words) + "]"


def build_replica(src: str, dst: str, rep: int) -> None:
    import duckdb
    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)
    stop_arr = _stopword_array()
    for t in FIXED_DIMS:
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                    f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    for t, keys in KEYED.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.i * {KEY_OFFSET} AS {c}")
            elif t == "documents" and c == "text":
                # same-length salted tokens; stopwords survive verbatim
                sel.append(
                    "CASE WHEN r.i = 0 THEN text ELSE array_to_string("
                    "list_transform(string_split(text, ' '), w -> "
                    f"CASE WHEN list_contains({stop_arr}, w)"
                    " THEN w ELSE substr(md5(w || ':' || r.i), 1, "
                    "greatest(length(w), 1)) END), ' ') END AS text")
            elif t == "documents" and c == "n_chars":
                sel.append("n_chars")   # recomputed below from text
            elif t == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN r.i = 0 THEN embedding ELSE "
                    "CAST(list_concat(embedding[(r.i + 1):], "
                    "embedding[1:r.i]) AS FLOAT[]) END AS embedding")
            else:
                sel.append(c)
        q = (f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
             f"range({rep}) r(i)")
        if t == "documents":
            q = (f"SELECT * REPLACE (length(text) AS n_chars) "
                 f"FROM ({q})")
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'") \
            .fetchone()[0]
        print(f"[replica] {t}: {n} rows", file=sys.stderr)


def run_bench(sf_dir: str) -> dict:
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, check=True)
    # bench's final stdout line is the recorder-friendly COMPACT record
    # (slowest queries only); the sweep needs every query — read the
    # full record bench writes alongside itself
    with open(os.path.join(repo, "BENCH_local_last.json")) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    if not args.skip_build:
        build_replica(args.sf_dir, args.out, args.rep)
    print("[bench] 1x ...", file=sys.stderr)
    b1 = run_bench(args.sf_dir)
    print("[bench] 10x ...", file=sys.stderr)
    b10 = run_bench(args.out)

    rows = []
    for name, t1 in b1["queries"].items():
        t10 = b10["queries"].get(name)
        if t10 is None or t1 <= 0 or t10 <= 0:
            rows.append((name, t1, t10, None, "ERROR" if (t10 or 0) < 0
                         else "missing"))
            continue
        alpha = math.log(t10 / t1) / math.log(args.rep)
        note = "overhead-bound" if t1 < 0.5 else ""
        rows.append((name, t1, t10, alpha, note))
    rows.sort(key=lambda r: -(r[3] or -9))
    print(f"\n| query | t_1x (s) | t_{args.rep}x (s) | alpha | note |")
    print("|---|---|---|---|---|")
    for name, t1, t10, alpha, note in rows:
        a = f"{alpha:.2f}" if alpha is not None else "—"
        print(f"| {name} | {t1} | {t10} | {a} | {note} |")
    print(f"\ntotals: 1x={b1['value']}s {args.rep}x={b10['value']}s "
          f"ratio={b10['value'] / b1['value']:.2f}")


if __name__ == "__main__":
    main()
