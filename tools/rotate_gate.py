"""Compute the next round's `_GATE_PRIORITY` rotation from the driver's
CORRECTNESS_r*.json artifacts.

The correctness driver walks ``queries()`` in order under a time budget,
so only the first ~50 registry entries earn a driver-green row per
round. This tool makes the rotation mechanical:

    python tools/rotate_gate.py            # report coverage + plan
    python tools/rotate_gate.py --emit     # print the Python list body

Policy (VERDICT r8 "Next round #2" — freshness rotation): the 15
``ref_*`` parity rows are pinned first (they must stay driver-green);
then the two permanent regression sentinels
(`stream_late_data_accounting`, `tpch_q12_late_priority` — the restated
ex-red rows); then every certifiable oracled query ordered by the round
of its LATEST driver-green row, oldest first (never-green first of
all), so each ~50-row window refreshes the stalest certifications.
Within a staleness tier, cheapest-first when a timings profile exists
(tools/gate_timings.json) so the time-budgeted gate certifies the
maximum count. Justified rows-only queries pin to the very tail — they
can only ever earn a `no_oracle` row and would burn a certifiable slot.

r12 ONE-ROUND AMENDMENT (VERDICT r11 "Next round #1" — the burn-down
bar "stale tail ≤ 30 with r3 fully cleared" needs ~43 refresh slots,
which is arithmetically impossible inside a 50-row window with 15
refs pinned): ``--no-ref-pin`` drops the ref pins into the staleness
body for THIS round only — they are all r11-green, so they sort to
the back and sit out exactly one window; r13 re-pins them. RECERT
pins queries whose FIXTURE OR ORACLE changed this round (their old
green rows certify the old semantics): r12 = the two robots-wildcard
queries.

r13 ONE-ROUND AMENDMENT (VERDICT r12 "Next round #1" — the final
burn-down bar "r4 band empty AND tail ≤ 14 all-r5" needs 30 r4 + 20
r5 = EXACTLY 50 slots, leaving zero room for pins or for this round's
new queries): ``--pure-refresh`` drops EVERY pin (refs, sentinels,
recerts) into the staleness body and sorts never-green queries LAST
instead of first — the r13-new queries are already hash-checked by
the judge's independent 304-query oracle sweep and enter the driver
window in r14 as the stalest (never-green) rows. The refs are
r11-green and re-pin in r14.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark.queries import oracle_sql, queries, registry  # noqa: E402


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SENTINELS = ["stream_late_data_accounting", "tpch_q12_late_priority"]

# queries whose fixture or oracle changed this round: their historical
# green rows certify the OLD semantics, so they re-certify now even
# though they aren't stale by round number (r12: robots wildcard rules)
RECERT = ["text_robots_filter", "pipeline_crawl_admission"]


def last_green() -> dict[str, int]:
    """query name → round number of its latest driver-green row.

    A row counts as green only when rows AND schema matched, the value
    hash did not mismatch (``None`` = rows-only check, still counts),
    and no error was recorded.
    """
    latest: dict[str, int] = {}
    paths = sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        print(f"WARNING: no CORRECTNESS_r*.json artifacts under {REPO_ROOT}; "
              "every query will look never-green", file=sys.stderr)
    for path in paths:
        try:
            rnd = int(os.path.basename(path).split("_r")[-1].split(".")[0])
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
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> int:
    emit = "--emit" in sys.argv
    timings: dict[str, float] = {}
    default_timings = os.path.join(REPO_ROOT, "tools", "gate_timings.json")
    if "--timings" in sys.argv:
        tpath = sys.argv[sys.argv.index("--timings") + 1]
        timings = json.load(open(tpath))
    elif os.path.exists(default_timings):
        # committed profile from the latest round's measurement loop —
        # refresh with --timings FILE when queries change materially
        timings = json.load(open(default_timings))
    no_ref_pin = "--no-ref-pin" in sys.argv
    pure_refresh = "--pure-refresh" in sys.argv
    latest = last_green()
    names = [q.name for q in registry()]
    pos = {n: i for i, n in enumerate(names)}
    rows_only = set(queries()) - set(oracle_sql())
    refs = ([] if (no_ref_pin or pure_refresh)
            else [n for n in names if n.startswith("ref_")])
    sentinels = [] if pure_refresh else [n for n in SENTINELS if n in pos]
    recert = [] if pure_refresh else [n for n in RECERT if n in pos]
    head = set(refs) | set(sentinels) | set(recert)
    body = [n for n in names
            if n not in head and n not in rows_only]
    # staleness first, then cheap-first within a tier, then declaration
    # order for stability. Never-green queries (round 0) sort FIRST by
    # default (they need their first cert most), LAST under
    # --pure-refresh (the r13 burn-down arithmetic has no slot for
    # them; they re-enter as the stalest rows next round).
    never_rank = 9999 if pure_refresh else 0
    body.sort(key=lambda n: (latest.get(n, never_rank),
                             timings.get(n, 999.0), pos[n]))
    tail = [n for n in names
            if n in rows_only and n not in head]

    print(f"declared: {len(names)}")
    print(f"driver-green somewhere: {sum(1 for n in names if n in latest)}")
    print(f"never driver-green (certifiable): "
          f"{sum(1 for n in body if n not in latest)}")
    print(f"rows-only pinned to tail: {len(tail)}")
    rotation = refs + sentinels + recert + body + tail
    assert len(rotation) == len(set(rotation)) == len(names)
    if emit:
        print("\n_GATE_PRIORITY = [")
        for n in rotation:
            print(f'    "{n}",')
        print("]")
    else:
        window = rotation[:50]
        fresh = sum(1 for n in window if latest.get(n, 0) < max(latest.values(), default=0))
        print(f"\nnext-round ~50-query window refreshes {fresh} stale rows:")
        for n in window:
            print(f"  r{latest.get(n, 0):<2} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
