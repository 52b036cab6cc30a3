"""Static fragility gate over every ``oracle_sql()`` string.

The round driver runs the DuckDB oracles under a DuckDB build we cannot
pin (and this container cannot install a second version to diff
against), so cross-version value drift only surfaces as a driver-red
hash row one round later. Both r6 reds came from constructs this tool
detects:

* ``TIMESTAMP '...' / DATE '...'`` literals combined with ``+ INTERVAL``
  arithmetic (tpch_q12_late_priority) — restate as integer epoch-µs.
* ``round()`` over a floating division (stream_late_data_accounting's
  ``late_pct``) — restate as exact integer/decimal arithmetic when the
  operands are small-denominator rationals that can land on 6dp ties.
* ``exp()`` — not correctly-rounded, engine/libm dependent; use the
  algebraic sigmoid ``z/(1+|z|)`` or allowlist with evidence.
* ``now()/current_*/random()`` — nondeterministic, never acceptable.

Existing uses that have earned driver-green rows across rounds are
frozen in ``tools/oracle_fragility_allow.json``; the gate fails ONLY on
new, un-reviewed uses. To accept a new use after review, add
``"query_name": ["construct", ...]`` to the allowlist with a round of
driver evidence.

    python tools/oracle_fragility.py           # gate (exit 1 on new hits)
    python tools/oracle_fragility.py --refresh # rewrite allowlist (review!)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark.queries import oracle_sql  # noqa: E402

ALLOW_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "oracle_fragility_allow.json")


def _round_over_division(sql: str) -> bool:
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg = sql[m.end() : i - 1]
        if "/" in arg.replace("//", ""):
            return True
    return False


def _literal_arithmetic(sql: str) -> bool:
    # TIMESTAMP/DATE literal with +/- applied to it (arithmetic), as
    # opposed to a pure comparison bound, which parses unambiguously
    pat = r"(TIMESTAMP|DATE)\s*'[^']*'\s*[+-]|[+-]\s*(TIMESTAMP|DATE)\s*'"
    return re.search(pat, sql, re.I) is not None


CONSTRUCTS = {
    "interval": lambda s: re.search(r"\bINTERVAL\b", s, re.I) is not None,
    "literal_arithmetic": _literal_arithmetic,
    "round_over_division": _round_over_division,
    "exp": lambda s: re.search(r"\bexp\s*\(", s, re.I) is not None,
    "nondeterminism": lambda s: re.search(
        r"\b(now\s*\(\)|current_date|current_timestamp|random\s*\()", s, re.I
    )
    is not None,
}

# nondeterminism is never allowlistable
NEVER_ALLOW = {"nondeterminism"}


def scan() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name, sql in oracle_sql().items():
        hits = [k for k, f in CONSTRUCTS.items() if f(sql)]
        if hits:
            out[name] = hits
    return out


def main() -> int:
    hits = scan()
    if "--refresh" in sys.argv:
        frozen = {
            n: [h for h in hs if h not in NEVER_ALLOW]
            for n, hs in sorted(hits.items())
        }
        frozen = {n: hs for n, hs in frozen.items() if hs}
        json.dump(frozen, open(ALLOW_PATH, "w"), indent=1)
        print(f"allowlist refreshed: {len(frozen)} queries -> {ALLOW_PATH}")
        return 0
    allow: dict[str, list[str]] = {}
    if os.path.exists(ALLOW_PATH):
        allow = json.load(open(ALLOW_PATH))
    bad = 0
    for name, hs in sorted(hits.items()):
        new = [h for h in hs if h in NEVER_ALLOW or h not in allow.get(name, [])]
        if new:
            bad += 1
            print(f"FRAGILE {name}: {', '.join(new)}")
    # stale allowlist rows are informational only
    for name in sorted(set(allow) - set(hits)):
        print(f"note: allowlist row no longer needed: {name}")
    if bad:
        print(f"\n{bad} query(ies) use un-reviewed version-fragile oracle "
              "constructs. Restate in engine-exact integer/decimal form "
              "(see MEMORY: oracle-exactness-tricks) or, with driver-green "
              "evidence, add to tools/oracle_fragility_allow.json.")
        return 1
    print(f"oracle fragility gate: {len(hits)} allowlisted, 0 new")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
