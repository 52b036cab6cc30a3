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


# Output-type gate: the driver's result normalizer is only *proven* (by
# 280 driver-green rows across r1-r7) on these DuckDB output types. The
# only two driver-red/locally-green rows in seven rounds were exactly the
# only two driver-checked oracles surfacing a raw HUGEINT column (DuckDB's
# sum(int) result type) — our fetchall() sees a Python int, but a
# pandas/arrow fetch renders HUGEINT as float64/decimal128, a different
# normalized string than Spark's BIGINT. DECIMAL outputs have never been
# surfaced by a green row either, so they are gated too: CAST aggregates
# to BIGINT (exact integers) or DOUBLE (the decimal-sum idiom).
SAFE_OUTPUT_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                     "VARCHAR", "BOOLEAN"}


def scan_output_types(sf_dir: str) -> dict[str, list[str]]:
    """Bind every oracle in DuckDB and flag unproven OUTPUT column types.

    Binding only (``duckdb.sql`` plans without executing), so this is
    cheap; it needs the testdata views for schema resolution.
    """
    import duckdb

    from sql_query_engine_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    out: dict[str, list[str]] = {}
    for name, sql in oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception as ex:  # binding failure surfaces in check_oracle
            out[name] = [f"bind-error: {str(ex)[:80]}"]
            continue
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t) for t in rel.types))
            if str(t).split("(")[0] not in SAFE_OUTPUT_TYPES
        ]
        if bad:
            out[name] = bad
    return out


def scan() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name, sql in oracle_sql().items():
        hits = [k for k, f in CONSTRUCTS.items() if f(sql)]
        if hits:
            out[name] = hits
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    type_hits = scan_output_types(sf_dir) if os.path.isdir(sf_dir) else {}
    # (probe_hugeint_canary — the one sanctioned HUGEINT surface — lives
    # in the probe registry, outside oracle_sql(), so no exception here.)
    for name, cols in sorted(type_hits.items()):
        print(f"UNSAFE-OUTPUT-TYPE {name}: {', '.join(cols)}")
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
    if bad or type_hits:
        if bad:
            print(f"\n{bad} query(ies) use un-reviewed version-fragile "
                  "oracle constructs. Restate in engine-exact "
                  "integer/decimal form (see MEMORY: "
                  "oracle-exactness-tricks) or, with driver-green "
                  "evidence, add to tools/oracle_fragility_allow.json.")
        if type_hits:
            print(f"\n{len(type_hits)} oracle(s) surface output types the "
                  "driver normalizer has never green-lit (HUGEINT/DECIMAL/"
                  "…): CAST integer aggregates to BIGINT, decimal sums to "
                  "DOUBLE.")
        return 1
    print(f"oracle fragility gate: {len(hits)} allowlisted, 0 new; "
          "output types all driver-safe")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
