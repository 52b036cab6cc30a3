"""Round-over-round bench comparison — makes perf regressions auditable.

The round driver records ``BENCH_r{N}.json`` per round; this tool diffs
per-query timings between two of them (or between a fresh local run and
the newest recorded round) and prints a comparison table, flagging
regressions. CI-fashion: exit 1 when any query regressed.

    python tools/bench_trend.py                 # newest two BENCH_r*.json
    python tools/bench_trend.py --run           # run bench.py now, diff vs baseline
    python tools/bench_trend.py --run --confirm 3   # n-of-3 regression confirm
    python tools/bench_trend.py --rebaseline 3  # record the local baseline
    python tools/bench_trend.py NEW.json OLD.json

A regression = ≥25% slower AND ≥0.3 s absolute (filters startup noise on
sub-second queries). ``--confirm N`` re-runs the bench up to N−1 more
times when the first run shows a regression and compares the per-query
MINIMUM across runs — a real regression survives the min, measurement
contention (another process stealing the cores during one run) does not.
This is exactly the failure mode of round 2's ``ref_multikey_join``
artifact: one contended driver run read +45% while four isolated runs
sat flat; a gate without the confirm pass would have (and did) mislabel
it. Local ``--run`` results are archived under ``bench_history/`` so
intra-round progress is reconstructable.

BASELINE POLICY (r12 — VERDICT r11 "What's wrong #1"): ``--run``
compares against ``bench_history/BASELINE_LOCAL.json`` when present,
falling back to the newest round artifact only when it isn't. Round
artifacts are recorded on whatever machine state the driver happened
to get, and the r11 cycle proved the environment itself drifts between
rounds (a pristine-r10-tree twin ran 40% above the r10 artifact on
identical code) — anchoring the gate to a cross-round artifact then
flags unchanged code every cycle, an alarm that carries no
information. The committed baseline is instead a quiet-machine
per-query MINIMUM over N isolated runs recorded ON THE CURRENT BOX
via ``--rebaseline N``; re-record it (keeping the archived runs for
history) whenever a surviving min-of-N flag is proven environmental
by a pristine-tree twin, and note the re-record in
``bench_history/NOTES.md``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGRESS_PCT = 0.25
REGRESS_ABS_S = 0.3


def load_bench(path: str) -> dict:
    """Read either a driver artifact ({"parsed": {...}}) or a raw
    bench.py JSON line file; returns {"value": sec, "queries": {...}}."""
    with open(path) as fh:
        data = json.load(fh)
    if "parsed" in data:
        data = data["parsed"]
    if "queries" not in data:
        raise ValueError(f"{path}: no per-query timings")
    return data


def newest_rounds() -> list[str]:
    """BENCH_r*.json sorted by round number, newest last."""
    paths = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    return sorted(
        paths, key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1))
    )


def run_bench() -> dict:
    """Run bench.py, archive the parsed line under bench_history/."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    line = next(
        ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")
    )
    data = json.loads(line)
    hist = os.path.join(REPO, "bench_history")
    os.makedirs(hist, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    with open(os.path.join(hist, f"bench_{stamp}.json"), "w") as fh:
        json.dump(data, fh, indent=1)
    return data


def compare(new: dict, old: dict, new_label: str, old_label: str) -> int:
    nq, oq = new["queries"], old["queries"]
    names = list(nq) + [n for n in oq if n not in nq]
    w = max(len(n) for n in names) + 2
    print(f"{'query':<{w}}{old_label:>12}{new_label:>12}{'delta':>10}")
    regressions = 0
    for name in names:
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            status = "NEW" if a is None else "GONE"
            val = b if b is not None else a
            print(f"{name:<{w}}{'-' if a is None else f'{a:.2f}':>12}"
                  f"{'-' if b is None else f'{b:.2f}':>12}{status:>10}")
            continue
        pct = (b - a) / a if a else 0.0
        flag = ""
        if pct >= REGRESS_PCT and (b - a) >= REGRESS_ABS_S:
            flag = "  << REGRESS"
            regressions += 1
        print(f"{name:<{w}}{a:>12.2f}{b:>12.2f}{pct:>+9.0%}{flag}")
    tot_a, tot_b = old.get("value"), new.get("value")
    if tot_a and tot_b:
        print(f"{'TOTAL':<{w}}{tot_a:>12.2f}{tot_b:>12.2f}"
              f"{(tot_b - tot_a) / tot_a:>+9.0%}")
    print(f"\n{regressions} regression(s) "
          f"(≥{REGRESS_PCT:.0%} and ≥{REGRESS_ABS_S}s slower)")
    return 1 if regressions else 0


def min_across(runs: list[dict]) -> dict:
    """Per-query minimum over several bench runs (noise floor)."""
    queries: dict = {}
    for run in runs:
        for name, sec in run["queries"].items():
            if name not in queries or sec < queries[name]:
                queries[name] = sec
    return {"value": sum(queries.values()), "queries": queries}


BASELINE_PATH = os.path.join(REPO, "bench_history", "BASELINE_LOCAL.json")


def rebaseline(n: int) -> int:
    """Record the quiet-machine local baseline: per-query minimum over
    ``n`` isolated bench runs, written to BASELINE_LOCAL.json with the
    recording context. Run this on an otherwise-idle machine."""
    runs = [run_bench() for _ in range(n)]
    base = min_across(runs)
    base["recorded"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    base["runs"] = n
    base["sf"] = runs[0].get("sf")
    base["note"] = ("quiet-machine per-query min of "
                    f"{n} isolated runs; see NOTES.md for policy")
    with open(BASELINE_PATH, "w") as fh:
        json.dump(base, fh, indent=1)
    print(f"baseline recorded: {len(base['queries'])} queries, "
          f"total {base['value']:.2f}s → {BASELINE_PATH}")
    return 0


def gate_baseline():
    """(data, label) the --run gate compares against: the committed
    local baseline when present, else the newest round artifact."""
    if os.path.exists(BASELINE_PATH):
        return load_bench(BASELINE_PATH), "BASELINE_LOCAL.json"
    rounds = newest_rounds()
    if not rounds:
        return None, ""
    return load_bench(rounds[-1]), os.path.basename(rounds[-1])


def main(argv: list[str]) -> int:
    if argv and argv[0] == "--rebaseline":
        return rebaseline(int(argv[1]) if len(argv) > 1 else 3)
    if argv and argv[0] == "--run":
        confirm = 1
        if "--confirm" in argv:
            confirm = int(argv[argv.index("--confirm") + 1])
        runs = [run_bench()]
        old, old_name = gate_baseline()
        if old is None:
            print(json.dumps(runs[0]["queries"], indent=1))
            return 0
        rc = compare(runs[0], old, "local", old_name)
        while rc and len(runs) < confirm:
            print(f"\nregression flagged — confirm run {len(runs) + 1}/{confirm} "
                  "(min across runs must still regress)")
            runs.append(run_bench())
            rc = compare(
                min_across(runs), old,
                f"min-of-{len(runs)}", old_name,
            )
        return rc
    if len(argv) == 2:
        return compare(
            load_bench(argv[0]), load_bench(argv[1]),
            os.path.basename(argv[0]), os.path.basename(argv[1]),
        )
    rounds = newest_rounds()
    if len(rounds) < 2:
        print("need two BENCH_r*.json rounds (or use --run / explicit paths)")
        return 0
    return compare(
        load_bench(rounds[-1]), load_bench(rounds[-2]),
        os.path.basename(rounds[-1]), os.path.basename(rounds[-2]),
    )


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
