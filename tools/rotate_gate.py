"""Compute the next round's `_GATE_PRIORITY` rotation from the driver's
CORRECTNESS_r*.json artifacts.

The correctness driver walks ``queries()`` in order under a time budget,
so only the first ~50 registry entries earn a driver-green row per
round. This tool makes the rotation mechanical:

    python tools/rotate_gate.py            # report coverage + plan
    python tools/rotate_gate.py --emit     # print the Python list body

Policy (COVERAGE.md "rotation notes"): the 13 ``ref_*`` parity rows stay
pinned first every round (they must stay driver-green); then every query
that has NEVER been green in any archived CORRECTNESS_r*.json, ordered
cheapest-first so a time-budgeted gate certifies as many as possible
(cost proxy: previous bench/oracle wall time is unavailable here, so the
order falls back to declaration order — cheap scalar/agg families were
declared early); already-green queries trail in declaration order.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark.queries import oracle_sql, queries, registry  # noqa: E402


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green() -> dict[str, list[str]]:
    """query name → rounds in which the driver recorded it green.

    A row counts as green only when rows AND schema matched, the value
    hash did not mismatch (``None`` = rows-only check, still counts),
    and no error was recorded.
    """
    green: dict[str, list[str]] = {}
    paths = sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        print(f"WARNING: no CORRECTNESS_r*.json artifacts under {REPO_ROOT}; "
              "every query will look never-green", file=sys.stderr)
    for path in paths:
        rnd = os.path.basename(path)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for name, row in data.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            if ok:
                green.setdefault(name, []).append(rnd)
    return green


def main() -> int:
    emit = "--emit" in sys.argv
    timings: dict[str, float] = {}
    default_timings = os.path.join(REPO_ROOT, "tools", "gate_timings.json")
    if "--timings" not in sys.argv and os.path.exists(default_timings):
        # committed profile from the latest round's measurement loop —
        # refresh with --timings FILE when queries change materially
        timings = json.load(open(default_timings))
    if "--timings" in sys.argv:
        # JSON {query: seconds} from a local profile run; the
        # never-checked block is then ordered cheapest-first by MEASURED
        # cost, so the driver's time budget certifies the maximum count.
        tpath = sys.argv[sys.argv.index("--timings") + 1]
        timings = json.load(open(tpath))
    green = driver_green()
    names = [q.name for q in registry()]
    # Justified rows-only queries (no oracle_sql twin) can only ever earn
    # a `no_oracle` driver row — they'd burn a certifiable window slot
    # every round without ever turning green (VERDICT r4 "What's wrong"
    # #1). Pin them to the very tail, behind already-green entries.
    rows_only = set(queries()) - set(oracle_sql())
    refs = [n for n in names if n.startswith("ref_")]
    never = [n for n in names
             if n not in green and not n.startswith("ref_")
             and n not in rows_only]
    checked = [n for n in names if n in green and not n.startswith("ref_")]
    tail = [n for n in names
            if n in rows_only and n not in green and not n.startswith("ref_")]
    if timings:
        pos = {n: i for i, n in enumerate(never)}
        never.sort(key=lambda n: (timings.get(n, 999.0), pos[n]))

    print(f"declared: {len(names)}")
    print(f"driver-green somewhere: {len(green)}")
    print(f"never driver-checked (non-ref, certifiable): {len(never)}")
    print(f"rows-only pinned to tail: {len(tail)}")
    rotation = refs + never + checked + tail
    if emit:
        print("\n_GATE_PRIORITY = [")
        for n in rotation:
            print(f'    "{n}",')
        print("]")
    else:
        window = rotation[:50]
        certified = sum(1 for n in window if n not in green)
        print(f"\nnext-round ~50-query window would newly certify "
              f"{certified} queries:")
        for n in window:
            tag = "NEW" if n not in green else "re"
            print(f"  {tag:3} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
