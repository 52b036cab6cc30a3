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
ex-red rows); then any RECERT pins (queries whose fixture or oracle
semantics changed this round — their historical green rows certify the
OLD semantics); then every certifiable oracled query ordered by the
round of its LATEST driver-green row, oldest first (never-green first
of all, they need their first certification most), so each ~50-row
window refreshes the stalest certifications. Within a staleness tier,
cheapest-first when a timings profile exists
(tools/gate_timings.json) so the time-budgeted gate certifies the
maximum count. Justified rows-only queries pin to the very tail — they
can only ever earn a `no_oracle` row and would burn a certifiable slot.

STRUCTURAL INVARIANTS (VERDICT r13 "Next round #2" — no flag can relax
these; they are assertions, not options). History: r12 ran with
``--no-ref-pin`` and r13 with ``--pure-refresh`` — one-round amendments
that emptied the window of parity canaries and (r13) deferred
never-green rows, justified by burn-down arithmetic and pre-declared,
but structurally dangerous: two consecutive rounds shipped without a
single driver-certified ``ref_*`` parity row, so a parity regression
would have been caught only by the local sweep. Both flags are now
DELETED. Every emitted rotation must satisfy, inside the first
``WINDOW`` rows:

  1. at least ``MIN_REF_CANARIES`` (3) of the CHEAPEST ``ref_*`` parity
     rows — a window can never again ship with zero parity canaries;
  2. every never-driver-green certifiable query — a new query enters
     the driver gate on its FIRST post-registration round, always;
  3. both permanent regression sentinels.

If pins + never-green rows ever exceed the window, this tool FAILS
LOUDLY instead of silently deferring — splitting across rounds is a
human decision that must be made by editing the policy here, in a
commit, with the reasoning in the docstring.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark.queries import oracle_sql, queries, registry  # noqa: E402


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WINDOW = 50  # the driver's per-round certification budget, ~rows
MIN_REF_CANARIES = 3

SENTINELS = ["stream_late_data_accounting", "tpch_q12_late_priority"]

# Queries whose fixture or oracle changed this round: their historical
# green rows certify the OLD semantics, so they re-certify now even
# though they aren't stale by round number. r12 = the two
# robots-wildcard queries (long since re-certified); r14 = none — the
# r14 warc reader changes (single-segment chains, header-field ceiling
# parity, streaming-tail walker) altered no fixture bytes and no oracle.
RECERT: list[str] = []


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


def _load_timings(argv: list[str]) -> dict[str, float]:
    default_timings = os.path.join(REPO_ROOT, "tools", "gate_timings.json")
    if "--timings" in argv:
        return json.load(open(argv[argv.index("--timings") + 1]))
    if os.path.exists(default_timings):
        # committed profile from the latest round's measurement loop —
        # refresh with --timings FILE when queries change materially
        return json.load(open(default_timings))
    return {}


def compute_rotation(latest: dict[str, int] | None = None,
                     timings: dict[str, float] | None = None) -> list[str]:
    """The full registry order for ``_GATE_PRIORITY`` — pins, staleness
    body, rows-only tail — with the structural invariants asserted.
    Importable (tests/test_registry.py re-runs it against the live
    artifacts every pytest run, so a rotation the tool would reject can
    never sit committed unnoticed)."""
    if latest is None:
        latest = last_green()
    if timings is None:
        timings = _load_timings([])
    names = [q.name for q in registry()]
    pos = {n: i for i, n in enumerate(names)}
    rows_only = set(queries()) - set(oracle_sql())
    # refs pinned cheapest-first so a time-budget truncation inside the
    # pin block still certifies the maximum parity count
    refs = sorted([n for n in names if n.startswith("ref_")],
                  key=lambda n: (timings.get(n, 999.0), pos[n]))
    sentinels = [n for n in SENTINELS if n in pos]
    recert = [n for n in RECERT if n in pos]
    head = set(refs) | set(sentinels) | set(recert)
    body = [n for n in names if n not in head and n not in rows_only]
    # staleness first (never-green rank 0 — they sort FIRST, always),
    # then cheap-first within a tier, then declaration order
    body.sort(key=lambda n: (latest.get(n, 0), timings.get(n, 999.0), pos[n]))
    tail = [n for n in names if n in rows_only and n not in head]
    rotation = refs + sentinels + recert + body + tail
    assert len(rotation) == len(set(rotation)) == len(names)

    # ---- structural invariants (no flag can relax these) ----
    window = set(rotation[:WINDOW])
    n_refs_in_window = sum(1 for n in window if n.startswith("ref_"))
    if refs and n_refs_in_window < min(MIN_REF_CANARIES, len(refs)):
        raise AssertionError(
            f"rotation window holds {n_refs_in_window} ref_* parity "
            f"canaries, policy floor is {MIN_REF_CANARIES}")
    missing_sent = [n for n in sentinels if n not in window]
    if missing_sent:
        raise AssertionError(
            f"regression sentinels outside the window: {missing_sent}")
    never_green = [n for n in body if n not in latest]
    overflow = [n for n in never_green if n not in window]
    if overflow:
        raise AssertionError(
            f"{len(overflow)} never-driver-green certifiable queries "
            f"fall outside the {WINDOW}-row window: {overflow} — pins + "
            f"never-green exceed the driver budget; splitting across "
            f"rounds is a policy edit, not a flag")
    return rotation


def main() -> int:
    emit = "--emit" in sys.argv
    latest = last_green()
    timings = _load_timings(sys.argv)
    rotation = compute_rotation(latest, timings)
    names = [q.name for q in registry()]
    rows_only = set(queries()) - set(oracle_sql())
    body_names = [n for n in rotation if n not in rows_only]

    print(f"declared: {len(names)}")
    print(f"driver-green somewhere: {sum(1 for n in names if n in latest)}")
    print(f"never driver-green (certifiable): "
          f"{sum(1 for n in body_names if n not in latest)}")
    print(f"rows-only pinned to tail: {len(rows_only)}")
    if emit:
        print("\n_GATE_PRIORITY = [")
        for n in rotation:
            print(f'    "{n}",')
        print("]")
    else:
        window = rotation[:WINDOW]
        fresh = sum(1 for n in window
                    if latest.get(n, 0) < max(latest.values(), default=0))
        print(f"\nnext-round ~{WINDOW}-query window refreshes "
              f"{fresh} stale rows:")
        for n in window:
            print(f"  r{latest.get(n, 0):<2} {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
