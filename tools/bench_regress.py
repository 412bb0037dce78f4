"""Per-query median regression gate between two bench JSONs.

Both files are `bench.py` output ({"queries": {name: median_sec}, ...}).
Flags queries whose median moved more than --threshold (default 25% —
ambient variance on this box is ±15%, see NOTES.md) in either direction;
regressions are the gate, improvements are listed for the record.

Usage: python tools/bench_regress.py OLD.json NEW.json [--threshold 0.25]
Exit code 1 when any regression exceeds the threshold (absolute medians
under 0.3 s are ignored — sub-JIT-noise).
"""

from __future__ import annotations

import argparse
import json


def compare(old: dict, new: dict, threshold: float,
            min_sec: float = 0.3) -> tuple[list, list, list]:
    """Returns (regressions, improvements, only_in_one) rows of
    (name, old_median, new_median, ratio)."""
    regs, imps, missing = [], [], []
    oq, nq = old["queries"], new["queries"]
    for name in sorted(set(oq) | set(nq)):
        if name not in oq or name not in nq:
            missing.append((name, oq.get(name), nq.get(name), None))
            continue
        a, b = oq[name], nq[name]
        if a <= 0 or b <= 0:
            missing.append((name, a, b, None))
            continue
        ratio = b / a
        if max(a, b) < min_sec:
            continue
        if ratio > 1 + threshold:
            regs.append((name, a, b, ratio))
        elif ratio < 1 - threshold:
            imps.append((name, a, b, ratio))
    regs.sort(key=lambda r: -r[3])
    imps.sort(key=lambda r: r[3])
    return regs, imps, missing


def driver_delta(driver_path: str, local_path: str,
                 threshold: float = 0.3, min_sec: float = 0.3) -> int:
    """Driver-vs-local reconciliation for ONE round: the driver's
    BENCH_r{N}.json (its compact line carries the slowest ~50 query
    medians) against the builder's BENCH_local_r{N}.json. The
    aggregate totals historically agree within ~4%; this per-query
    table is so a driver-side-only regression can't hide inside that
    aggregate — paste it into NOTES each round."""
    drec = json.load(open(driver_path))
    dq = (drec.get("parsed") or {}).get("queries") or drec.get(
        "queries") or {}
    lq = json.load(open(local_path))["queries"]
    common = sorted(set(dq) & set(lq))
    rows = []
    for name in common:
        a, b = lq[name], dq[name]
        if a <= 0 or b <= 0:
            continue
        rows.append((name, a, b, b / a))
    flagged = [r for r in rows
               if max(r[1], r[2]) >= min_sec
               and (r[3] > 1 + threshold or r[3] < 1 / (1 + threshold))]
    flagged.sort(key=lambda r: -abs(r[3] - 1))
    tot_l = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    print(f"driver/local reconciliation: {len(rows)} common queries, "
          f"local={tot_l:.1f}s driver={tot_d:.1f}s "
          f"({tot_d / tot_l:.2f}x), {len(flagged)} outliers "
          f"(>|{threshold:.0%}| at >= {min_sec}s)")
    print("\n| query | local (s) | driver (s) | driver/local |")
    print("|---|---|---|---|")
    for name, a, b, r in (flagged or rows[:0]):
        print(f"| {name} | {a} | {b} | {r:.2f} |")
    if not flagged:
        print("| (none flagged) | — | — | — |")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--driver-delta", action="store_true",
                    help="OLD is the builder's BENCH_local_r{N}.json, "
                         "NEW the driver's BENCH_r{N}.json: print the "
                         "per-query reconciliation table instead of "
                         "the cross-round regression gate")
    args = ap.parse_args()
    if args.driver_delta:
        return driver_delta(args.new, args.old,
                            threshold=max(args.threshold, 0.3))
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    regs, imps, missing = compare(old, new, args.threshold)

    def table(rows, title):
        if not rows:
            return
        print(f"\n{title}")
        print("| query | old (s) | new (s) | ratio |")
        print("|---|---|---|---|")
        for name, a, b, r in rows:
            rs = f"{r:.2f}" if r else "—"
            print(f"| {name} | {a} | {b} | {rs} |")

    table(regs, f"REGRESSIONS (> {args.threshold:.0%} median)")
    table(imps, f"improvements (> {args.threshold:.0%} median)")
    if missing:
        print(f"\nnot comparable: {[m[0] for m in missing]}")
    common = [n for n in old["queries"] if n in new["queries"]]
    tot_old = sum(old["queries"][n] for n in common
                  if old["queries"][n] > 0)
    tot_new = sum(new["queries"][n] for n in common
                  if new["queries"][n] > 0)
    print(f"\ncommon-query totals: old={tot_old:.1f}s new={tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x), {len(common)} queries; "
          f"{len(regs)} regressions, {len(imps)} improvements")
    return 1 if regs else 0


if __name__ == "__main__":
    raise SystemExit(main())
