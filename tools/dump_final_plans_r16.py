"""Dump the POST-EXECUTION adaptive plan (isFinalPlan=true, with
ReusedExchange / AQEShuffleRead nodes) for named queries → plans/r16/
<query>_after_executed.txt. The static explain() cannot show AQE stage
reuse; the judge checks reuse claims against these.

Usage: python tools/dump_final_plans_r16.py q1 q2 ...
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.queries import queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    out_dir = os.path.join(REPO, "plans", "r16")
    spark = get_spark("final-plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        # execute THE DATAFRAME'S OWN QueryExecution (collect, not
        # count — count wraps a fresh aggregation plan) so explain
        # shows the finalized adaptive plan
        df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_after_executed.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
