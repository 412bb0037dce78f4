"""Mechanical enforcement of the correctness-window rotation invariant.

The driver records a bounded window (the first ``WINDOW`` names of
``registry.queries()``) per round in ``CORRECTNESS_r{N}.json``.  The standing
rule (NOTES "Round-7 handoff — REVISED") is that every registry query must
carry a green driver row at most ``MAX_AGE`` rounds old; with more queries
than ``2 * WINDOW`` a strict 2-round freshness is arithmetically impossible,
so the invariant is: *after the upcoming round stamps the current window
head, no query's newest green row may be older than ``MAX_AGE`` rounds*, and
queries that have never had a driver row must sit ahead of every stamped
query in the window so they accumulate evidence at the first opportunity.

Run standalone (``python tools/rotation_check.py``) or via the pytest
wrapper in ``tests/test_rotation.py``.  Exit code 1 + a per-query message on
any violation.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

WINDOW = 50
MAX_AGE = 3

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_latest_green(repo: str = REPO) -> tuple[dict[str, int], int]:
    """Newest round with a fully-green driver row per query, and the max
    recorded round.  A row is green when rows+schema match with no error
    (hash_match may be absent for rows-only checks)."""
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if (rec.get("rows_match") and rec.get("schema_match")
                    and not rec.get("err")):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def check(ordered: list[str], latest: dict[str, int], max_round: int,
          window: int = WINDOW, max_age: int = MAX_AGE) -> list[str]:
    """Return violation messages simulating the NEXT round's recording."""
    nxt = max_round + 1
    head = set(ordered[:window])
    problems: list[str] = []
    # 1. any query whose evidence would age past max_age must be in-window
    for name in ordered:
        stamped = latest.get(name)
        if stamped is None:
            continue
        age_after = nxt - stamped
        if age_after > max_age and name not in head:
            problems.append(
                f"{name}: newest green row r{stamped} is {age_after} rounds "
                f"old after r{nxt} and it is outside the {window}-row window")
    # 2. never-stamped queries must precede every stamped query in the head
    first_stamped_pos = next(
        (i for i, n in enumerate(ordered) if n in latest), len(ordered))
    for i, name in enumerate(ordered):
        if name not in latest and i > first_stamped_pos and i < window:
            problems.append(
                f"{name}: never driver-stamped but ordered at {i}, after "
                f"stamped query {ordered[first_stamped_pos]!r} at "
                f"{first_stamped_pos} — unstamped queries lead the window")
        if name not in latest and i >= window:
            # landed after the window was full this round: allowed, but only
            # while the overflow is smaller than the window (it drains next
            # round); flag if the head has stamped rows younger than max_age
            # that could have yielded the slot.
            for j, other in enumerate(ordered[:window]):
                if latest.get(other) is not None and \
                        (max_round + 1) - latest[other] < max_age:
                    problems.append(
                        f"{name}: no driver row and outside the window, while "
                        f"{other!r} (pos {j}, green r{latest[other]}) occupies "
                        f"a slot with {max_age - ((max_round + 1) - latest[other])} "
                        f"round(s) of slack")
                    break
    return problems


def plan_next_window(ordered: list[str], latest: dict[str, int],
                     max_round: int, window: int = WINDOW) -> list[str]:
    """Suggested head for the NEXT round's window: never-stamped
    queries first (registration order), then stamped queries
    oldest-evidence-first (ties by registry order)."""
    never = [n for n in ordered if n not in latest]
    pos = {n: i for i, n in enumerate(ordered)}
    stamped = sorted((n for n in ordered if n in latest),
                     key=lambda n: (latest[n], pos[n]))
    return (never + stamped)[:window]


def main() -> int:
    sys.path.insert(0, REPO)
    from rgd_rnaseq_workflows_spark import registry
    ordered = list(registry.queries())
    latest, max_round = load_latest_green()
    if not max_round:
        print("rotation_check: no CORRECTNESS_r*.json found — nothing to do")
        return 0
    if len(sys.argv) > 1 and sys.argv[1] == "--plan":
        for name in plan_next_window(ordered, latest, max_round):
            print(name)
        return 0
    problems = check(ordered, latest, max_round)
    never = [n for n in ordered if n not in latest]
    print(f"rotation_check: {len(ordered)} queries, newest record r{max_round}, "
          f"{len(never)} never stamped, window={WINDOW}, max_age={MAX_AGE}")
    for p in problems:
        print("VIOLATION:", p)
    if not problems:
        print("rotation_check: OK — no query ages past the invariant after "
              f"r{max_round + 1} records the current window head")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
