"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, sorted column
names, and an order-insensitive value multiset. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.catalog import TABLES, table_path  # noqa: E402
from sql_query_engine_spark.queries import registry  # noqa: E402


def normalize(v):
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = "\x1f".join(normalize(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    argv = sys.argv[1:]
    timings_out = None
    if "--timings-out" in argv:
        # write {query: wall_seconds} for tools/rotate_gate.py --timings —
        # one shared session, so fixed startup cost is amortized and the
        # relative ordering is honest
        i = argv.index("--timings-out")
        timings_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if a != "--determinism"]
    determinism = "--determinism" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    timings: dict[str, float] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for q in registry():
        if only and q.name not in only:
            continue
        t0 = time.time()
        try:
            df = q.spark(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
            if determinism:
                # run-to-run stability: rebuild + re-execute, compare
                # multisets — catches ordering/partial-agg nondeterminism
                # that a single oracle pass can miss
                srows2 = q.spark(spark, sf_dir).collect()
                m1 = sorted(tuple(normalize(v) for v in r) for r in srows)
                m2 = sorted(tuple(normalize(v) for v in r) for r in srows2)
                if m1 != m2:
                    print(f"FAIL {q.name}: NONDETERMINISTIC across runs")
                    n_fail += 1
                    continue
        except Exception:
            print(f"FAIL {q.name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if q.oracle is None:
            timings[q.name] = round(time.time() - t0, 2)
            print(f"ROWS {q.name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {q.name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL {q.name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL {q.name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        else:
            sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
            didx = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
            sm = {}
            for r in srows:
                key = "\x1f".join(normalize(r[i]) for i in sidx)
                sm[key] = sm.get(key, 0) + 1
            dm = {}
            for r in orows:
                key = "\x1f".join(normalize(r[i]) for i in didx)
                dm[key] = dm.get(key, 0) + 1
            if sm != dm:
                diff_s = {k: v for k, v in sm.items() if dm.get(k) != v}
                diff_d = {k: v for k, v in dm.items() if sm.get(k) != v}
                print(f"FAIL {q.name}: value mismatch ({len(diff_s)} spark-only keys)")
                for k in list(diff_s)[:3]:
                    print(f"   spark: {k!r}")
                for k in list(diff_d)[:3]:
                    print(f"   duck : {k!r}")
                ok = False
        timings[q.name] = round(time.time() - t0, 2)
        if ok:
            print(f"PASS {q.name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    if timings_out:
        import json

        with open(timings_out, "w") as f:
            json.dump(timings, f, indent=1, sort_keys=True)
        print(f"wrote {len(timings)} timings to {timings_out}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
