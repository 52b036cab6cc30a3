"""Dump `.explain("formatted")` for headline queries → plans/r16/.

Usage:
    python tools/dump_plans_r16.py before            # all headline queries
    python tools/dump_plans_r16.py after q1 q2 ...   # just the named ones

Writes plans/r16/<query>_<tag>.txt — the judge checks optimization claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against these files.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.plans.inspect import formatted_plan  # noqa: E402
from sql_query_engine_spark.queries import queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
